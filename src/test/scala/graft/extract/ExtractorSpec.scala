package graft.extract

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.corpus.SyntheticCorpus
import graft.model._
import graft.model.Extraction._
import graft.model.Positional._

/** Golden-fixture extraction parity with the reference's
  * ScrapingTransformerTest.fess_codelibs_org (assertions at :26-33, property
  * rules at :43-47): 27 sidebar items, section1.title "What is Fess?",
  * section1.body size 2, section2.title "Features", section2.body size 12.
  */
class ExtractorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** PageDocs → FetchResult-shaped DataFrame (synthetic fetch). */
  def fetchedOf(pages: Seq[PageDoc]): DataFrame =
    spark.createDataset(pages).toDF()
      .select(
        col("doc_id").as("url"),
        lit(null).cast("string").as("parentUrl"),
        lit(0).as("depth"),
        xxhash64(col("doc_id")).as("urlHash"),
        lit("GET").as("method"),
        lit("text/html").as("mimeType"),
        lit("UTF-8").as("charSet"),
        lit(200).as("httpStatusCode"),
        lit(1234L).as("contentLength"),
        lit(7L).as("executionTime"),
        col("lastModified"),
        col("spans"))

  val goldenConfig = CrawlConfig(
    sessionId = "golden",
    seeds = Seq(SyntheticCorpus.GoldenUrl),
    rules = Seq(ScrapingRule(
      urlPattern = ".*fess.*",
      properties = Seq(
        PropertyRule("nav.sideMenus", SpanText("nav-li"), isArray = true, trimSpaces = true),
        PropertyRule("section1.title", SpanText("h2", Some(Eq(0))), trimSpaces = true),
        PropertyRule("section1.body", SpanText("p", Some(Lt(2))), isArray = true, trimSpaces = true),
        PropertyRule("section2.title", SpanText("h2", Some(Eq(1))), trimSpaces = true),
        PropertyRule("section2.body", SpanText("li", Some(Lt(12))), isArray = true, trimSpaces = true)))))

  test("golden fixture extracts the reference's exact values") {
    val out = Extractor.extract(fetchedOf(Seq(SyntheticCorpus.goldenPage)), goldenConfig)
    val rows = out.collect()
    assert(rows.length == 1)
    val r = rows(0)
    val nav = r.getAs[Row]("nav")
    assert(nav.getAs[scala.collection.Seq[String]]("sideMenus").size == 27)
    assert(nav.getAs[scala.collection.Seq[String]]("sideMenus").head == "Menu 1")
    val s1 = r.getAs[Row]("section1")
    assert(s1.getAs[String]("title") == "What is Fess?")
    assert(s1.getAs[scala.collection.Seq[String]]("body").size == 2)
    assert(s1.getAs[scala.collection.Seq[String]]("body").head ==
      "Fess is very powerful and easily deployable Enterprise Search Server.")
    val s2 = r.getAs[Row]("section2")
    assert(s2.getAs[String]("title") == "Features")
    assert(s2.getAs[scala.collection.Seq[String]]("body").size == 12)
    // metadata projection (P6)
    assert(r.getAs[String]("url") == "http://fess.codelibs.example")
    assert(r.getAs[Int]("httpStatusCode") == 200)
  }

  test("no-rule pages are skipped (P4) and children use U2 semantics") {
    val cfg = goldenConfig.copy(rules = Seq(ScrapingRule(urlPattern = ".*nomatch.*")))
    val out = Extractor.extract(fetchedOf(Seq(SyntheticCorpus.goldenPage)), cfg)
    assert(out.count() == 0)
    // matching rule: default children = a hrefs, self/dup removed
    val out2 = Extractor.extract(fetchedOf(Seq(SyntheticCorpus.goldenPage)), goldenConfig)
    val children = out2.select("children").as[Seq[String]].head()
    assert(children == Seq("http://fess.codelibs.example/docs/"))
  }

  test(":eq out of range yields empty (jsoup empty Elements analog)") {
    val cfg = goldenConfig.copy(rules = Seq(goldenConfig.rules.head.copy(properties = Seq(
      PropertyRule("missing", SpanText("h2", Some(Eq(99)))),
      PropertyRule("tail", SpanText("h2", Some(Gt(1))), isArray = true)))))
    val r = Extractor.extract(fetchedOf(Seq(SyntheticCorpus.goldenPage)), cfg).collect()(0)
    assert(r.getAs[String]("missing") == "") // join of empty list
    assert(r.getAs[scala.collection.Seq[String]]("tail") == Seq("News", "Download"))
  }

  test("zip-explode ([] group, X4): rows = max list size, scalars at position 0") {
    val cfg = goldenConfig.copy(rules = Seq(goldenConfig.rules.head.copy(properties = Seq(
      PropertyRule("[]feature", SpanText("li"), isArray = true),
      PropertyRule("[]para", SpanText("p"), isArray = true),
      PropertyRule("[]label", Value(Seq("fess page"))),
      PropertyRule("title", SpanText("title"))))))
    val out = Extractor.extract(fetchedOf(Seq(SyntheticCorpus.goldenPage)), cfg)
      .orderBy("position")
    val rows = out.collect()
    assert(rows.length == 12) // max(12 li, 4 p)
    assert(rows.map(_.getAs[Int]("position")).toSeq == (0 until 12))
    // per-position elements, null beyond each list's length
    assert(rows(0).getAs[String]("feature") == "Feature 1")
    assert(rows(3).getAs[String]("para") == "Download the latest Fess.")
    assert(rows(4).getAs[String]("para") == null)
    // non-list group member only on first row (ScrapingTransformer.java:589-595)
    assert(rows(0).getAs[String]("label") == "fess page")
    assert(rows(1).getAs[String]("label") == null)
    // non-group scalar copied to every row
    assert(rows.forall(_.getAs[String]("title") ==
      "Open Source Enterprise Search Server: Fess"))
  }

  test("is_distinct preserves first-occurrence order (A1) and F2 null-join quirk") {
    val page = PageDoc("http://t/x", "t", 0L, Seq(
      Span("w", "b", null, 0), Span("w", "a", null, 1), Span("w", "b", null, 2),
      Span("w", null, null, 3), Span("w", "c", null, 4)))
    val cfg = CrawlConfig(sessionId = "t", seeds = Seq(), rules = Seq(ScrapingRule(
      urlPattern = ".*",
      properties = Seq(
        PropertyRule("d", SpanText("w"), isArray = true, isDistinct = true),
        PropertyRule("joined", SpanText("w"))))))
    val r = Extractor.extract(fetchedOf(Seq(page)), cfg).collect()(0)
    // array_distinct keeps first occurrence; null is a distinct value
    assert(r.getAs[scala.collection.Seq[String]]("d") == Seq("b", "a", null, "c"))
    // String.join renders nulls as "null" (ScrapingTransformer.java:275)
    assert(r.getAs[String]("joined") == "b a b null c")
  }

  test("property: zip-explode rows = max(list sizes, 1) with aligned elements (X4)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val tok = Gen.choose('a', 'z').map(c => s"w$c")
    val listGen = Gen.choose(0, 6).flatMap(n => Gen.listOfN(n, tok))
    val pagesGen = Gen.listOfN(120, Gen.zip(listGen, listGen))
    val cases = pagesGen.apply(Gen.Parameters.default, Seed(7L)).get
    val pages = cases.zipWithIndex.map { case ((a, b), i) =>
      PageDoc(s"http://t/p$i", "t", 0L,
        a.zipWithIndex.map { case (t, o) => Span("p", t, null, o) } ++
          b.zipWithIndex.map { case (t, o) => Span("li", t, null, a.size + o) })
    }
    val cfg = CrawlConfig(sessionId = "prop", seeds = Seq(), rules = Seq(ScrapingRule(
      urlPattern = ".*",
      properties = Seq(
        PropertyRule("[]g.a", SpanText("p"), isArray = true),
        PropertyRule("[]g.b", SpanText("li"), isArray = true)))))
    val byUrl = Extractor.extract(fetchedOf(pages), cfg)
      .select(col("url"), col("position"), col("g.a").as("ga"), col("g.b").as("gb"))
      .collect().groupBy(_.getString(0))
    cases.zipWithIndex.foreach { case ((a, b), i) =>
      val rows = byUrl(s"http://t/p$i").sortBy(_.getInt(1))
      assert(rows.length == math.max(math.max(a.size, b.size), 1),
        s"case $i: |a|=${a.size} |b|=${b.size}")
      rows.zipWithIndex.foreach { case (r, p) =>
        assert(r.getString(2) == a.lift(p).orNull, s"case $i a[$p]")
        assert(r.getString(3) == b.lift(p).orNull, s"case $i b[$p]")
      }
    }
  }

  test("named transforms (X1) apply per element") {
    val cfg = goldenConfig.copy(rules = Seq(goldenConfig.rules.head.copy(properties = Seq(
      PropertyRule("flags", SpanText("p"), isArray = true,
        transform = Some(NamedTransform.ContainsFlag("Fess"))),
      PropertyRule("upper", SpanText("h2", Some(Eq(1))),
        transform = Some(NamedTransform.Upper))))))
    val r = Extractor.extract(fetchedOf(Seq(SyntheticCorpus.goldenPage)), cfg).collect()(0)
    assert(r.getAs[scala.collection.Seq[String]]("flags") == Seq("true", "true", "true", "true"))
    assert(r.getAs[String]("upper") == "FEATURES")
  }

  test("multi-step query navigation (SpanPath) scopes children per section with null placeholders") {
    // golden page sections: "What is Fess?" (2 p), "Features" (0 p, 12 li),
    // "News" (1 p), "Download" (1 p) — ScrapingTransformer.java:442-463
    val cfg = goldenConfig.copy(rules = Seq(goldenConfig.rules.head.copy(properties = Seq(
      PropertyRule("secp", SpanPath("h2", "p"), isArray = true),
      PropertyRule("secli", SpanPath("h2", "li"), isArray = true),
      PropertyRule("firstli", SpanPath("h2", "li", "text", Some(Eq(0))), isArray = true),
      PropertyRule("flat", SpanPath("h2", "p"))))))
    val r = Extractor.extract(fetchedOf(Seq(SyntheticCorpus.goldenPage)), cfg).collect()(0)
    // empty "Features" region → ONE null placeholder (array alignment quirk)
    assert(r.getAs[scala.collection.Seq[String]]("secp") == Seq(
      "Fess is very powerful and easily deployable Enterprise Search Server.",
      "You can install and run Fess quickly on any platforms.",
      null, "Fess 9.1 released.", "Download the latest Fess."))
    val li = r.getAs[scala.collection.Seq[String]]("secli")
    assert(li.length == 15 && li.head == null &&
      li(1) == "Feature 1" && li(12) == "Feature 12" &&
      li(13) == null && li(14) == null, li.toString)
    // positional applies PER REGION (the reference's per-step :eq)
    assert(r.getAs[scala.collection.Seq[String]]("firstli") ==
      Seq(null, "Feature 1", null, null))
    // non-array: flat join, no placeholders
    assert(r.getAs[String]("flat") ==
      "Fess is very powerful and easily deployable Enterprise Search Server. " +
        "You can install and run Fess quickly on any platforms. " +
        "Fess 9.1 released. Download the latest Fess.")
  }

  test("custom registered transform (X1 escape hatch) mirrors the reference script example") {
    // reference README.md:396-410: "flag": { "text": "body",
    //   "script": "value.indexOf('Elasticsearch') > 0 ? 'yes' : 'no';" }
    // — the same conditional registered as a named Column => Column
    TransformRegistry.register("es_flag",
      x => when(x.contains("Elasticsearch"), "yes").otherwise("no"))
    try {
      val cfg = goldenConfig.copy(rules = Seq(goldenConfig.rules.head.copy(properties = Seq(
        PropertyRule("flag", SpanText("p"), isArray = true,
          transform = Some(NamedTransform.Custom("es_flag")))))))
      val r = Extractor.extract(fetchedOf(Seq(SyntheticCorpus.goldenPage)), cfg).collect()(0)
      assert(r.getAs[scala.collection.Seq[String]]("flag") == Seq("no", "no", "no", "no"))
      // unregistered ref fails at plan-compile time with the names listed
      val bad = goldenConfig.copy(rules = Seq(goldenConfig.rules.head.copy(properties = Seq(
        PropertyRule("flag", SpanText("p"),
          transform = Some(NamedTransform.Custom("nope")))))))
      val e = intercept[IllegalArgumentException](
        Extractor.extract(fetchedOf(Seq(SyntheticCorpus.goldenPage)), bad))
      assert(e.getMessage.contains("nope") && e.getMessage.contains("es_flag"))
    } finally TransformRegistry.unregister("es_flag")
  }

  test("first matching rule wins (P3 when-chain order)") {
    val cfg = goldenConfig.copy(rules = Seq(
      ScrapingRule(".*codelibs.*", properties = Seq(PropertyRule("which", Value(Seq("first"))))),
      ScrapingRule(".*fess.*", properties = Seq(PropertyRule("which", Value(Seq("second")))))))
    val r = Extractor.extract(fetchedOf(Seq(SyntheticCorpus.goldenPage)), cfg).collect()(0)
    assert(r.getAs[String]("which") == "first")
  }

  test("html:false rule setting skips DOM-derived properties (ScrapingTransformer.java:205-212)") {
    // the reference parses no DOM when settings.html=false: css-query
    // properties stay empty (scalar → "" via String.join, array → []),
    // value/source properties — which read config literals / the raw body,
    // not the DOM — still emit, and no child links are extracted
    val cfg = CrawlConfig(
      sessionId = "nohtml", seeds = Seq(),
      rules = Seq(ScrapingRule(
        urlPattern = ".*fess.*",
        settings = Map("html" -> "false"),
        properties = Seq(
          PropertyRule("title", SpanText("h2", Some(Eq(0))), trimSpaces = true),
          PropertyRule("items", SpanText("nav-li"), isArray = true),
          PropertyRule("tag", Value(Seq("graft"))),
          PropertyRule("src", Source)))))
    val out = Extractor.extract(fetchedOf(Seq(SyntheticCorpus.goldenPage)), cfg)
    val r = out.collect()(0)
    assert(r.getAs[String]("title") == "")
    assert(r.getAs[scala.collection.Seq[String]]("items").isEmpty)
    assert(r.getAs[String]("tag") == "graft")
    assert(r.getAs[String]("src").nonEmpty)
    assert(r.getAs[scala.collection.Seq[String]]("children").isEmpty)
    // default (no settings): the SAME rule extracts and emits children
    val withHtml = cfg.copy(rules = cfg.rules.map(_.copy(settings = Map.empty)))
    val r2 = Extractor.extract(fetchedOf(Seq(SyntheticCorpus.goldenPage)), withHtml).collect()(0)
    assert(r2.getAs[String]("title") == "What is Fess?")
    assert(r2.getAs[scala.collection.Seq[String]]("items").nonEmpty)
  }

  test("custom expressions compile under CODEGEN_ONLY (no interpreted fallback)") {
    // regression: a companion helper shadowed by an inherited TreeNode method
    // loses its static forwarder, janino fails, and Spark silently drops the
    // whole extraction to interpreted eval — correctness survives, the
    // codegen hot path doesn't.
    // generate + janino-compile the projection code directly — the query
    // path masks compile failures with interpreted fallback regardless of
    // spark.sql.codegen.fallback / factoryMode
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.types._
    val spanType = ArrayType(StructType(Seq(
      StructField("kind", StringType), StructField("text", StringType),
      StructField("media_ref", StringType), StructField("offset", IntegerType))))
    val exprs = Seq(
      graft.functions.SpanField(BoundReference(0, spanType, nullable = true),
        "p", "text", trimSpaces = true),
      graft.functions.CanonicalizeUrl(BoundReference(1, StringType, nullable = true)),
      graft.functions.HostOf(BoundReference(1, StringType, nullable = true)))
    val proj = GenerateUnsafeProjection.generate(exprs) // throws on janino failure
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      null, org.apache.spark.unsafe.types.UTF8String.fromString("HTTP://X.com:80/a/")))
    assert(proj(row).getUTF8String(1).toString == "http://x.com/a")
  }
}
