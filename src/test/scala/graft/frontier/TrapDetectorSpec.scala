package graft.frontier

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class TrapDetectorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("flagUrls: depth and the path-repetition rule") {
    val urls = Seq(
      "http://a.example.com",                      // depth 0
      "http://a.example.com/x/y/z?q=1#f",          // depth 3, clean
      "http://a.example.com/cal/cal/cal/page",     // cal x3 -> trap
      "http://a.example.com/cal/x/cal/y/cal",      // non-consecutive x3 -> trap
      "http://a.example.com/cal/x/cal",            // only x2 -> clean
      "http://a.example.com/a/b/a/b/a/b"           // a x3 (and b x3) -> trap
    ).toDF("url")
    val got = TrapDetector.flagUrls(urls).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got("http://a.example.com") == ((0L, false)))
    assert(got("http://a.example.com/x/y/z?q=1#f") == ((3L, false)))
    assert(got("http://a.example.com/cal/cal/cal/page") == ((4L, true)))
    assert(got("http://a.example.com/cal/x/cal/y/cal") == ((5L, true)))
    assert(got("http://a.example.com/cal/x/cal") == ((3L, false)))
    assert(got("http://a.example.com/a/b/a/b/a/b") == ((6L, true)))
  }

  test("hostStats: growing URL space is suspect, thinning one is not") {
    // trap host: 1 url at depth 1, 2 at depth 2, ... 8 at depth 8 (growing)
    val trap = (1 to 8).flatMap(d => (0 until d).map(i =>
      s"http://trap.example.com/${(1 to d).map("s" + _).mkString("/")}x$i"))
    // real host: 8 at depth 1, 4 at depth 2, 2 at depth 3 (thinning)
    val real = Seq.tabulate(8)(i => s"http://real.example.com/p$i") ++
      Seq.tabulate(4)(i => s"http://real.example.com/d/p$i") ++
      Seq.tabulate(2)(i => s"http://real.example.com/d/e/p$i")
    val got = TrapDetector.hostStats((trap ++ real).toDF("url"),
        minDepth = 6).collect()
      .map(r => r.getString(0) -> r).toMap
    val t = got("trap.example.com")
    assert(t.getAs[Long]("urls") == 36L &&
      t.getAs[Long]("max_depth") == 8L &&
      t.getAs[Boolean]("trap_suspect"))
    val r = got("real.example.com")
    assert(r.getAs[Long]("urls") == 14L &&
      !r.getAs[Boolean]("trap_suspect") &&
      r.getAs[Long]("repeat_urls") == 0L)
  }

  test("hostStats: a single repetition hit marks the host regardless of shape") {
    val urls = Seq(
      "http://a.example.com/p1",
      "http://a.example.com/loop/loop/loop").toDF("url")
    val got = TrapDetector.hostStats(urls).collect()
    assert(got.length == 1 && got.head.getAs[Boolean]("trap_suspect") &&
      got.head.getAs[Long]("repeat_urls") == 1L)
  }

  test("flags are invariant under input partitioning") {
    val urls = (0 until 500).map { i =>
      if (i % 7 == 0) s"http://h${i % 5}.example.com/c/c/c/p$i"
      else s"http://h${i % 5}.example.com/a$i/b$i"
    }.toDF("url")
    val a = TrapDetector.hostStats(urls).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val b = TrapDetector.hostStats(urls.repartition(13)).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(a == b && a.size == 5)
  }
}
