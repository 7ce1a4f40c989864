package graft.frontier

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class UrlParamsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("mine: varying-no-effect param is insignificant, content param is not") {
    // sess varies 3 ways with one hash per page -> insignificant
    // id varies across pages with distinct hashes -> significant
    // v never varies -> inconclusive (false)
    val pages = (for (id <- 0 until 4; s <- 0 until 3) yield
      (s"http://a.example.com/p?id=$id&sess=$s&v=1", id.toLong))
      .toDF("url", "content_hash")
    val got = UrlParams.mine(pages).collect()
      .map(r => r.getString(1) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got("sess") == ((4L, 4L, true)))   // 4 witness groups, all varied
    assert(got("id") == ((3L, 3L, false)))    // hash follows id
    assert(got("v") == ((12L, 0L, false)))    // never varied -> no evidence
  }

  test("mine: verdicts are per host; one dirty witness flips to significant") {
    val clean = (for (s <- 0 until 3) yield
      (s"http://a.example.com/p?x=$s", 7L))
    val dirty = (for (s <- 0 until 3) yield
      (s"http://b.example.com/p?x=$s", 7L + s % 2)) // x sometimes matters
    val got = UrlParams.mine((clean ++ dirty).toDF("url", "content_hash"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getBoolean(4))
      .toMap
    assert(got(("a.example.com", "x")))
    assert(!got(("b.example.com", "x")))
  }

  test("mine: param order does not split witness groups") {
    val pages = Seq(
      ("http://a.example.com/p?a=1&b=1", 5L),
      ("http://a.example.com/p?b=2&a=1", 5L)) // same residual for b
      .toDF("url", "content_hash")
    val got = UrlParams.mine(pages).collect()
      .map(r => r.getString(1) -> ((r.getLong(2), r.getBoolean(4)))).toMap
    assert(got("b") == ((1L, true))) // one witness group, varied, same hash
  }

  test("normalize drops learned params, collapses aliases, leaves the rest") {
    val pages = (for (id <- 0 until 3; s <- 0 until 3) yield
      (s"http://a.example.com/p?id=$id&sess=$s", id.toLong))
      .toDF("url", "content_hash")
    val rules = UrlParams.mine(pages)
    val out = UrlParams.normalize(pages.select("url"), rules)
    assert(out.columns.contains("url_normalized"))
    val norm = out.select("url_normalized").distinct().as[String]
      .collect().sorted
    assert(norm.toSeq == (0 until 3)
      .map(i => s"http://a.example.com/p?id=$i"))
    // an unknown host and a bare URL pass through untouched
    val other = Seq("http://z.example.com/p?sess=1", "http://a.example.com/q")
      .toDF("url")
    val kept = UrlParams.normalize(other, rules)
      .select("url_normalized").as[String].collect().toSet
    assert(kept == Set("http://z.example.com/p?sess=1",
      "http://a.example.com/q"))
  }

  test("mine is invariant under input partitioning") {
    val pages = (for (id <- 0 until 40; s <- 0 until 3) yield
      (s"http://h${id % 4}.example.com/p?id=$id&sess=$s", id.toLong))
      .toDF("url", "content_hash")
    val a = UrlParams.mine(pages).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getBoolean(4)).toMap
    val b = UrlParams.mine(pages.repartition(13)).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getBoolean(4)).toMap
    assert(a == b && a.keys.count(_._2 == "sess") == 4)
  }
}
