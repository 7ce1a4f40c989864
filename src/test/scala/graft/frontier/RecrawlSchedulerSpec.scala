package graft.frontier

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class RecrawlSchedulerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val DAY = 86400000000L

  test("schedule: streaks, resets, and exponential backoff are exact") {
    // urls: a never changes after first fetch; b changes every fetch;
    // c changes at fetch 3 of 4 (streak 1)
    val hist = Seq(
      ("a", 0L * DAY, 1L), ("a", 1L * DAY, 1L), ("a", 2L * DAY, 1L), ("a", 3L * DAY, 1L),
      ("b", 0L * DAY, 1L), ("b", 1L * DAY, 2L), ("b", 2L * DAY, 3L),
      ("c", 0L * DAY, 1L), ("c", 1L * DAY, 1L), ("c", 2L * DAY, 9L), ("c", 3L * DAY, 9L)
    ).toDF("url", "fetch_us", "content_hash")
    val got = RecrawlScheduler.schedule(hist, baseIntervalUs = DAY).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("a") == ((4L, 3 * DAY, 3L, 3 * DAY + 8 * DAY)))   // 2^3
    assert(got("b") == ((3L, 2 * DAY, 0L, 2 * DAY + DAY)))       // change resets
    assert(got("c") == ((4L, 3 * DAY, 1L, 3 * DAY + 2 * DAY)))   // 2^1
  }

  test("schedule: maxExp caps the backoff and single-fetch URLs back off once") {
    val hist = (0L until 10L).map(i => ("a", i * DAY, 7L))
      .toDF("url", "fetch_us", "content_hash")
      .unionByName(Seq(("s", 5L * DAY, 1L)).toDF("url", "fetch_us", "content_hash"))
    val got = RecrawlScheduler.schedule(hist, baseIntervalUs = DAY, maxExp = 3)
      .collect().map(r => r.getString(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(got("a") == ((9L, 9 * DAY + 8 * DAY)))  // capped at 2^3
    assert(got("s") == ((0L, 5 * DAY + DAY)))      // first fetch = changed
  }

  test("withSitemapHints: fresh hint is due now, stale/no hint keeps schedule") {
    val hist = Seq(
      ("a", 0L * DAY, 1L), ("a", 1L * DAY, 1L), ("a", 2L * DAY, 1L),
      ("b", 0L * DAY, 1L), ("b", 1L * DAY, 1L),
      ("c", 0L * DAY, 1L), ("c", 1L * DAY, 1L)
    ).toDF("url", "fetch_us", "content_hash")
    // a: hint newer than last fetch (2*DAY) -> due now at last_fetch_us
    // b: hint OLDER than last fetch -> untouched
    // c: no hint -> untouched
    val hints = Seq(("a", 5L * DAY), ("b", 0L * DAY))
      .toDF("url", "lastmod_us")
    val sched = RecrawlScheduler.schedule(hist, baseIntervalUs = DAY)
    val got = RecrawlScheduler.withSitemapHints(sched, hints).collect()
      .map(r => r.getString(0) -> ((r.getLong(4), r.getBoolean(5)))).toMap
    assert(got("a") == ((2 * DAY, true)))            // short-circuited
    assert(got("b") == ((1 * DAY + 2 * DAY, false))) // streak 1 -> 2^1
    assert(got("c") == ((1 * DAY + 2 * DAY, false)))
  }

  test("schedule is invariant under input partitioning") {
    val hist = (0L until 5000L)
      .map(i => (s"u${i % 97}", i * 1000L, (i % 97) * 10 + i / 997))
      .toDF("url", "fetch_us", "content_hash")
    val a = RecrawlScheduler.schedule(hist, 1000000L).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    val b = RecrawlScheduler.schedule(hist.repartition(13), 1000000L).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(a == b && a.size == 97)
  }
}
