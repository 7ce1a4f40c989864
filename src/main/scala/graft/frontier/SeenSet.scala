package graft.frontier

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** URL-seen filtering (J1) — the rebuild of fess-crawler's ES-backed
  * `EsUrlFilterService`/duplicate-id queue insert (RiverWeb.java:392-398).
  *
  * Source of truth is an EXACT `left_anti` join on `(urlHash, url)` — the
  * full URL participates because xxhash64 collides a handful of times at
  * 10^10 URLs (n²/2^65 ≈ 2.7), and the north rule demands exact seen-set
  * membership. The Bloom filter is ONLY a router (SURVEY.md §7.5.3):
  * `mightContain == false` proves a URL is new and skips the join;
  * `true` falls through to the exact anti-join. A false positive therefore
  * costs a join probe, never a dropped URL.
  *
  * Scale path: below `maxBloomItems` the filter is built with
  * `df.stat.bloomFilter` and broadcast (~1.2 GB at 1e9 items / 3% fpp is
  * the practical ceiling); above it we skip the prefilter and rely on the
  * shuffle hash anti-join (AQE-sized, co-partitioned on urlHash). A
  * per-hash-range partitioned bloom is the documented 10^10 upgrade.
  */
object SeenSet {

  /** Rows of `candidates` whose (urlHash, url) is NOT in `seen`.
    * Both inputs must carry `urlHash: long` and `url: string`.
    *
    * @param seenCount rows in `seen` (caller tracks it; avoids a count job)
    */
  def filterNew(
      candidates: DataFrame,
      seen: DataFrame,
      seenCount: Long,
      maxBloomItems: Long = 50000000L,
      fpp: Double = 0.03): DataFrame = {

    if (seenCount == 0) return candidates

    // The two bloom branches (definitely-new ∪ maybe-seen⋈seen) each scan
    // `candidates`; routing only pays when that input is materialized
    // (persisted by the caller, or a table scan). Otherwise the recompute
    // costs more than the anti-join saves — fall through to the plain join.
    val materialized =
      candidates.storageLevel.useMemory || candidates.storageLevel.useDisk

    if (materialized && seenCount <= maxBloomItems) {
      val bloom: BloomFilter =
        seen.stat.bloomFilter("urlHash", math.max(seenCount, 1000L), fpp)
      val bc = candidates.sparkSession.sparkContext.broadcast(bloom)
      val mightContain = udf((h: Long) => bc.value.mightContainLong(h))
      val routed = candidates.withColumn("__maybeSeen", mightContain(col("urlHash")))
      val definitelyNew = routed.filter(!col("__maybeSeen")).drop("__maybeSeen")
      val maybeSeen = routed.filter(col("__maybeSeen")).drop("__maybeSeen")
      definitelyNew.unionByName(
        maybeSeen.join(seen.select("urlHash", "url"), Seq("urlHash", "url"), "left_anti"))
    } else {
      candidates.join(seen.select("urlHash", "url"), Seq("urlHash", "url"), "left_anti")
    }
  }
}
