package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Specs for the round-5 recipe/correlation additions: bucketed interval
  * join, keyset-paged composite aggregation, n-gram stats + collocation
  * lift, epoch-weighted mixture materialization, trigram wildcard search.
  */
class IntervalJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(us: Long) = {
    val t = new java.sql.Timestamp(us / 1000)
    t.setNanos(((us % 1000000) * 1000).toInt)
    t
  }

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.select("l_id", "r_id", "delta_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("inclusive window bounds: r==l and r==l+Δ match, l+Δ+1µs does not") {
    val w = 10L // seconds
    val l = Seq((1L, ts(100L * 1000000))).toDF("l_id", "ts")
    val r = Seq(
      (10L, ts(100L * 1000000)),          // delta 0 → match
      (11L, ts(110L * 1000000)),          // delta == Δ → match (inclusive)
      (12L, ts(110L * 1000000 + 1)),      // Δ + 1 µs → no
      (13L, ts(100L * 1000000 - 1))       // before left → no
    ).toDF("r_id", "ts")
    val got = pairs(EventOps.intervalJoin(l, r, w))
    assert(got == Set((1L, 10L, 0L), (1L, 11L, 10000000L)))
  }

  test("property: bucketed equals naive on random logs, keyless and keyed") {
    val rnd = new scala.util.Random(42)
    val lRows = (0L until 200L).map(i =>
      (i, rnd.nextInt(5).toLong, ts(rnd.nextInt(5000).toLong * 100000)))
    val rRows = (0L until 300L).map(i =>
      (i, rnd.nextInt(5).toLong, ts(rnd.nextInt(5000).toLong * 100000)))
    val l = lRows.toDF("l_id", "host", "ts").repartition(7)
    val r = rRows.toDF("r_id", "host", "ts").repartition(5)
    for (keys <- Seq(Nil, Seq("host"))) {
      val fast = pairs(EventOps.intervalJoin(l, r, 30L, keys))
      val naive = pairs(EventOps.intervalJoinNaive(l, r, 30L, keys))
      assert(fast == naive, s"keys=$keys")
      assert(fast.nonEmpty)
    }
  }

  test("no duplicate pairs from the two probe buckets") {
    // right event exactly on a bucket boundary relative to the left
    val l = Seq((1L, ts(0L))).toDF("l_id", "ts")
    val r = Seq((2L, ts(10L * 1000000))).toDF("r_id", "ts")
    val got = EventOps.intervalJoin(l, r, 10L).collect()
    assert(got.length == 1)
  }
}

class CompositeAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val rows = (0L until 500L).map { i =>
    (s"h${i % 7}", s"p${i % 3}", i)
  }.toDF("host", "path", "id")

  test("paging through all pages reproduces the full group-by, in key order") {
    val full = rows.groupBy("host", "path").count()
      .orderBy("host", "path")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    var after: Seq[String] = Nil
    var got = Vector.empty[(String, String, Long)]
    var page = EventOps.compositeAgg(rows, Seq("host", "path"), 4, after).collect()
    while (page.nonEmpty) {
      got ++= page.map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      after = Seq(page.last.getString(0), page.last.getString(1))
      page = EventOps.compositeAgg(rows, Seq("host", "path"), 4, after).collect()
    }
    assert(got.toSeq == full.toSeq)
  }

  test("keyset cursor is strict: the after-key group itself is excluded") {
    val p = EventOps.compositeAgg(rows, Seq("host", "path"), 100,
      Seq("h3", "p1")).collect().map(r => (r.getString(0), r.getString(1)))
    assert(!p.contains(("h3", "p1")))
    assert(p.contains(("h3", "p2")) && p.contains(("h4", "p0")))
    assert(!p.contains(("h2", "p2")))
  }
}

class NgramCollocSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ngramCounts: hand-checked windows, minCount floor, short docs") {
    val docs = Seq(
      (1L, "a b c a b"),
      (2L, "a b x"),
      (3L, "z")                 // shorter than n → no bigrams
    ).toDF("doc_id", "text")
    val got = TextOps.ngramCounts(docs, 2, minCount = 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("a b" -> 3L, "b c" -> 1L, "c a" -> 1L, "b x" -> 1L))
    val floored = TextOps.ngramCounts(docs, 2, minCount = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(floored == Map("a b" -> 3L))
  }

  test("collocations: the repeated phrase wins and lift ticks are exact") {
    // 10 docs "new york", 10 docs of scattered fillers; every token count ≥ 5
    val docs = ((0 until 10).map(i => (i.toLong, "new york")) ++
      (10 until 20).map(i => (i.toLong, "the cat the dog"))).toDF("doc_id", "text")
    val got = TextOps.collocations(docs, k = 3, minCount = 5).collect()
    val top = got.minBy(_.getAs[Int]("rank"))
    assert(top.getAs[String]("bigram") == "new york")
    // Nu = 10*2 + 10*4 = 60, Nb = 10*1 + 10*3 = 40
    // c_xy = 10, cx = cy = 10 → floor(1e6*10*60*60 / (40*10*10)) = 9_000_000
    assert(top.getAs[Long]("lift_ticks") == 9000000L)
  }
}

class EpochMixtureSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val docs = (0L until 3000L).map { i =>
    (i, if (i < 1000) "wiki" else if (i < 2000) "cc" else "code")
  }.toDF("doc_id", "domain")

  test("integer weights replicate exactly; zero drops; default applies") {
    val out = Sampling.epochMixture(docs, "doc_id", "domain",
      Map("wiki" -> 3.0, "cc" -> 0.0), defaultEpochs = 1.0)
    val byDomain = out.groupBy("domain").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(byDomain == Map("wiki" -> 3000L, "code" -> 1000L))
    // copy_idx distinguishes replicas
    val idx = out.filter($"domain" === "wiki").groupBy("copy_idx").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(idx == Map(0L -> 1000L, 1L -> 1000L, 2L -> 1000L))
  }

  test("fractional weight: copies in {floor, floor+1}, share ≈ frac, deterministic") {
    val out = Sampling.epochMixture(docs, "doc_id", "domain", Map("wiki" -> 1.5),
      defaultEpochs = 0.0)
    val perDoc = out.groupBy("doc_id").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(perDoc.values.forall(c => c == 1L || c == 2L))
    val extra = perDoc.values.count(_ == 2L)
    assert(extra > 400 && extra < 600, s"extra=$extra")  // ≈ 0.5 of 1000
    // identical under repartitioning (pure function of the id)
    val again = Sampling.epochMixture(docs.repartition(13), "doc_id", "domain",
      Map("wiki" -> 1.5), defaultEpochs = 0.0)
      .groupBy("doc_id").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(again == perDoc)
  }

  test("mixtureToTarget: exact-rational weights hit the ppm targets; non-targets drop") {
    // 10 whitespace tokens per doc, three equal strata of 300 docs
    val corpus = (0L until 900L).map { i =>
      val src = if (i < 300) "wiki" else if (i < 600) "cc" else "code"
      (i, src, Seq.fill(10)("w").mkString(" "))
    }.toDF("doc_id", "source", "text")
    // budget 12000, 50/50 → each target stratum wants 6000 of its 3000
    // tokens → weight exactly 2.0 → two copies of every doc, code dropped
    val out = Sampling.mixtureToTarget(corpus, "doc_id", "source",
      Map("wiki" -> 500000L, "cc" -> 500000L), tokenBudget = 12000L)
    val byS = out.groupBy("source").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(byS == Map("wiki" -> 600L, "cc" -> 600L))
    // budget 9000 → weight 1.5: copies in {1,2}, extras ≈ half the docs,
    // and achieved tokens within bucket quantization of the target
    val out2 = Sampling.mixtureToTarget(corpus, "doc_id", "source",
      Map("wiki" -> 500000L, "cc" -> 500000L), tokenBudget = 9000L)
    val perDoc = out2.filter($"source" === "wiki").groupBy("doc_id").count()
      .collect().map(r => r.getLong(1))
    assert(perDoc.forall(c => c == 1L || c == 2L))
    val wikiTokens = out2.filter($"source" === "wiki").count() * 10
    assert(math.abs(wikiTokens - 4500L) <= 4500 / 10,
      s"achieved $wikiTokens vs target 4500")
    // deterministic under repartitioning
    val again = Sampling.mixtureToTarget(corpus.repartition(11), "doc_id",
      "source", Map("wiki" -> 500000L, "cc" -> 500000L), tokenBudget = 9000L)
    assert(again.count() == out2.count())
  }

  test("extra-copy sets nest as the weight grows") {
    def kept(w: Double) = Sampling.epochMixture(docs, "doc_id", "domain",
      Map("wiki" -> w), defaultEpochs = 0.0)
      .filter($"copy_idx" === 1L).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val a = kept(1.25); val b = kept(1.75)
    assert(a.subsetOf(b) && a.nonEmpty && b.size > a.size)
  }
}

class IvfIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("indexed IVF top-k equals the inline form; probes prune at the partition level") {
    val rnd = new scala.util.Random(11)
    val embs = (0L until 300L).map { i =>
      (i, Seq.fill(8)(rnd.nextFloat() * 2 - 1))
    }.toDF("vec_id", "embedding")
    val cents = Similarity.ivfTrain(embs, nCentroids = 6, iters = 1)
    val q = embs.filter($"vec_id" === 7L)
      .select(org.apache.spark.sql.functions.transform($"embedding",
        x => x.cast("double"))).head().getSeq[Double](0)
    val path = TestSpark.tmpDir("ivf-idx")
    val idx = Similarity.buildIvfIndex(embs, cents, path)
    val qq = Similarity.ivfTopKIndexed(idx, q, cents, k = 10, nProbe = 2)
    val got = qq.select("vec_id").collect().map(_.getLong(0)).toSeq
    val inline = Similarity.ivfTopK(Similarity.ivfAssign(embs, cents), q,
      cents, k = 10, nProbe = 2)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(got == inline && got.nonEmpty)
    // probe filter prunes at the partition level — the scan carries a
    // PartitionFilters entry on centroid, no per-row assignment expression
    val plan = qq.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("centroid"), plan)
    assert("PartitionFilters: \\[[^\\]]*centroid".r.findFirstIn(plan).isDefined, plan)
  }
}

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(us: Long) = {
    val t = new java.sql.Timestamp(us / 1000)
    t.setNanos(((us % 1000000) * 1000).toInt)
    t
  }

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.select("l_id", "r_id", "lag_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("picks the latest at-or-before right event; unmatched lefts drop") {
    val l = Seq((1L, 9L, ts(100000000L)), (2L, 9L, ts(5L))).toDF("l_id", "k", "ts")
    val r = Seq(
      (10L, 9L, ts(40000000L)),
      (11L, 9L, ts(99999999L)),  // latest before l=1
      (12L, 9L, ts(100000001L)), // after → never
      (13L, 8L, ts(50L))         // other key
    ).toDF("r_id", "k", "ts")
    val got = rowsOf(EventOps.asOfJoin(l, r, Seq("k")))
    // l=2 has no at-or-before match → dropped (inner semantics)
    assert(got == Set((1L, 11L, 1L)))
  }

  test("equal-ts right matches its left; right-ts ties break to larger id in both forms") {
    val l = Seq((1L, 0L, ts(100L))).toDF("l_id", "k", "ts")
    val r = Seq((10L, 0L, ts(100L)), (11L, 0L, ts(100L))).toDF("r_id", "k", "ts")
    assert(rowsOf(EventOps.asOfJoin(l, r, Seq("k"))) == Set((1L, 11L, 0L)))
    assert(rowsOf(EventOps.asOfJoinBucketed(l, r, Seq("k"), 60L)) ==
      Set((1L, 11L, 0L)))
  }

  test("property: bucketed equals horizoned windowed form on random keyed logs") {
    val rnd = new scala.util.Random(7)
    val l = (0L until 300L).map(i =>
      (i, rnd.nextInt(6).toLong, ts(rnd.nextInt(5000).toLong * 100000)))
      .toDF("l_id", "k", "ts").repartition(7)
    val r = (0L until 200L).map(i =>
      (i, rnd.nextInt(6).toLong, ts(rnd.nextInt(5000).toLong * 100000)))
      .toDF("r_id", "k", "ts").repartition(5)
    for (h <- Seq(30L, 120L, 1000L)) {
      val fast = rowsOf(EventOps.asOfJoinBucketed(l, r, Seq("k"), h))
      val slow = rowsOf(EventOps.asOfJoin(l, r, Seq("k"), horizonSeconds = h))
      assert(fast == slow, s"h=$h")
      assert(fast.nonEmpty, s"h=$h")
    }
  }

  test("null keys never match — plain and bucketed forms agree (ADVICE r5)") {
    // SQL join semantics (and the DuckDB ASOF oracle's `l.k = r.k`): a null
    // key matches nothing. The plain form's Window.partitionBy would GROUP
    // null keys without the explicit filter — this pins the alignment.
    val l = Seq((1L, Option(0L), ts(100L)), (2L, Option.empty[Long], ts(100L)))
      .toDF("l_id", "k", "ts")
    val r = Seq((10L, Option(0L), ts(50L)), (11L, Option.empty[Long], ts(50L)))
      .toDF("r_id", "k", "ts")
    val plain = rowsOf(EventOps.asOfJoin(l, r, Seq("k"), horizonSeconds = 60L))
    val bucketed = rowsOf(EventOps.asOfJoinBucketed(l, r, Seq("k"), 60L))
    assert(plain == Set((1L, 10L, 50L)), plain)
    assert(bucketed == plain)
  }

  test("horizon bound is inclusive: a match exactly horizon back survives") {
    val l = Seq((1L, 0L, ts(60000000L))).toDF("l_id", "k", "ts")
    val r = Seq((10L, 0L, ts(0L))).toDF("r_id", "k", "ts")
    assert(rowsOf(EventOps.asOfJoin(l, r, Seq("k"), horizonSeconds = 60L)) ==
      Set((1L, 10L, 60000000L)))
    assert(rowsOf(EventOps.asOfJoinBucketed(l, r, Seq("k"), 60L)) ==
      Set((1L, 10L, 60000000L)))
    // one µs past the horizon → dropped by both
    val lEdge = Seq((1L, 0L, ts(60000001L))).toDF("l_id", "k", "ts")
    assert(rowsOf(EventOps.asOfJoin(lEdge, r, Seq("k"), horizonSeconds = 60L)).isEmpty)
    assert(rowsOf(EventOps.asOfJoinBucketed(lEdge, r, Seq("k"), 60L)).isEmpty)
  }
}

class WildcardSearchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val docs = {
    val rnd = new scala.util.Random(7)
    val words = Seq("crawl", "spark", "needle", "haystack", "engine", "nee",
      "needlework", "dle", "need")
    (0L until 400L).map { i =>
      (i, Seq.fill(6)(words(rnd.nextInt(words.length))).mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("equals the naive contains scan, incl. substring-of-word matches") {
    val got = SearchOps.wildcardSearch(docs, "needle")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val naive = docs.filter(contains(lower($"text"), lit("needle")))
      .collect().map(_.getLong(0)).toSet
    assert(got == naive && got.nonEmpty)
    // "needlework" docs match "needle"; docs with only "need"/"nee" don't
  }

  test("case-insensitive and multi-token needles") {
    val d = Seq((1L, "The Quick Brown fox"), (2L, "quick brow"), (3L, "brown fox"))
      .toDF("doc_id", "text")
    val got = SearchOps.wildcardSearch(d, "Brown Fox")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 3L))
  }

  test("short needle falls back to the direct scan") {
    val d = Seq((1L, "ab cd"), (2L, "xy")).toDF("doc_id", "text")
    val got = SearchOps.wildcardSearch(d, "ab")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L))
  }

  test("indexed form equals inline; the gram IN-list prunes the index scan") {
    val path = TestSpark.tmpDir("tri-idx")
    val idx = SearchOps.buildTrigramIndex(docs, "tri_wc", path, nBuckets = 8)
    try {
      val q = SearchOps.wildcardSearchIndexed(docs, idx, "needle")
      val got = q.select("doc_id").collect().map(_.getLong(0)).toSet
      val inline = SearchOps.wildcardSearch(docs, "needle")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got == inline && got.nonEmpty)
      // mechanism 1 (default): the IN-list reaches the parquet scan as a
      // pushed filter over gram-sorted files
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters") && plan.contains("In(gram"), plan)
      // mechanism 2: with auto-bucketed-scan pinned off, the same query
      // bucket-prunes — reads a strict subset of the 8 buckets
      val prev = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      try {
        val planB = SearchOps.wildcardSearchIndexed(docs, idx, "needle")
          .queryExecution.executedPlan.toString
        val sel = "SelectedBucketsCount: (\\d+) out of 8".r
          .findFirstMatchIn(planB).map(_.group(1).toInt)
        assert(sel.exists(_ < 8), planB)
      } finally spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", prev)
    } finally graft.sources.BucketedStore.drop(spark, "tri_wc_tri")
  }
}
