package graft.frontier

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.UrlOps

class SeenSetSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def urlsDf(urls: Seq[String]) =
    urls.toDF("url").withColumn("urlHash", xxhash64(col("url")))

  val seenUrls = (0 until 2000).map(i => s"http://h${i % 7}.example.com/page/$i")
  val candUrls = (1500 until 3000).map(i => s"http://h${i % 7}.example.com/page/$i")
  val trulyNew = candUrls.toSet -- seenUrls.toSet

  test("bloom path never drops a truly-new URL and equals the exact anti-join") {
    val seen = urlsDf(seenUrls)
    val cand = urlsDf(candUrls).persist() // bloom routing requires materialized input
    val viaBloom = SeenSet.filterNew(cand, seen, seenUrls.size.toLong,
      maxBloomItems = 1000000L, fpp = 0.3) // high fpp to force exact-join fallbacks
    val got = viaBloom.select("url").collect().map(_.getString(0)).toSet
    assert(got == trulyNew)

    val viaExact = SeenSet.filterNew(cand, seen, seenUrls.size.toLong, maxBloomItems = 0L)
    assert(viaExact.select("url").collect().map(_.getString(0)).toSet == trulyNew)
    cand.unpersist()
  }

  test("unpersisted candidates fall back to the plain anti-join (no recompute)") {
    val seen = urlsDf(seenUrls)
    val cand = urlsDf(candUrls) // not persisted → plain path
    val got = SeenSet.filterNew(cand, seen, seenUrls.size.toLong)
      .select("url").collect().map(_.getString(0)).toSet
    assert(got == trulyNew)
  }

  test("range-partitioned bloom path equals the exact anti-join (10^10 route)") {
    import graft.model.FrontierEntry
    def entries(urls: Seq[String]) = urls.map(u =>
      FrontierEntry(u, UrlOps.urlHash(u), UrlOps.host(u), 1, "p"))
    val seen = urlsDf(seenUrls)
    val cand = spark.createDataset(entries(candUrls))(
      org.apache.spark.sql.Encoders.product[FrontierEntry]).persist()
    // urlsDf hashes with xxhash64(col) == UrlOps.urlHash — same function
    val got = SeenSet.filterNewRangePartitioned(cand, seen, seenUrls.size.toLong,
      nRanges = 8, fpp = 0.2) // high fpp: force plenty of exact-join fallthrough
      .collect().map(_.url).toSet
    assert(got == trulyNew)
    // ranges with no seen rows must still pass candidates through
    val gotManyRanges = SeenSet.filterNewRangePartitioned(cand, seen,
      seenUrls.size.toLong, nRanges = 512)
      .collect().map(_.url).toSet
    assert(gotManyRanges == trulyNew)
    cand.unpersist()
  }

  test("hash collisions do not conflate distinct urls (url participates in the join)") {
    // two distinct urls forced onto the same hash value
    val seen = Seq(("http://a/1", 99L)).toDF("url", "urlHash")
    val cand = Seq(("http://b/2", 99L)).toDF("url", "urlHash")
    val out = SeenSet.filterNew(cand, seen, 1L, maxBloomItems = 0L)
    assert(out.count() == 1) // same hash, different url => still new
  }

  test("politeness claim: per-host budget + canonical order + global cap") {
    val rows = (0 until 500).map { i =>
      val url = s"http://h${i % 5}.example.com/page/$i"
      (url, UrlOps.urlHash(url), s"h${i % 5}.example.com", i % 3, "p")
    }
    val frontier = rows.toDF("url", "urlHash", "host", "depth", "parentUrl")
    val claimed = Politeness.claim(frontier, hostBudget = 4, remaining = 12, saltBuckets = 4)
      .collect()
    assert(claimed.length == 12)
    val byHost = claimed.groupBy(_.getString(2))
    byHost.values.foreach(c => assert(c.length <= 4))
    // claimed = globally first 12 of the per-host-top-4 set in canonical order
    val perHostTop = rows.groupBy(_._3).values.flatMap(
      _.sortBy(r => (r._4, r._2, r._1)).take(4)).toSeq
    val expected = perHostTop.sortBy(r => (r._4, r._2, r._1)).take(12).map(_._1).toSet
    assert(claimed.map(_.getString(0)).toSet == expected)
  }

  test("snapshot table: append/full commits, versioned reads, resume metadata") {
    val dir = TestSpark.tmpDir("snap")
    val t = new SnapshotTable(dir, spark)
    assert(t.isEmpty)
    t.commitAppend(Seq(1, 2, 3).toDF("v"), Map("round" -> "1"))
    t.commitAppend(Seq(4, 5).toDF("v"), Map("round" -> "2"))
    assert(t.rowsOf(t.currentVersion) == 5)
    assert(t.read().count() == 5)
    assert(t.metric(t.currentVersion, "round").contains("2"))
    t.commitFull(Seq(9).toDF("v"), Map("round" -> "3"))
    assert(t.read().count() == 1)
    assert(t.readVersion(1).count() == 5) // time travel to snapshot 1
    t.drop()
  }
}
