package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed persistent layout for the engine's RECURRING join keys — the
  * storage-side answer to the per-round exchanges that dominate a long
  * crawl (reference: every RiverWeb round re-checks its ES seen-index,
  * RiverWeb.java:183-195; here the J1 seen anti-join and J2 incremental
  * as-of lookup re-shuffle the frontier on `urlHash` EVERY round).
  *
  * `bucketBy(n, key)` + `sortBy(key)` at write time records the hash
  * layout in the catalog; Spark then plans joins between two tables
  * bucketed on the same key with the SAME bucket count as sort-merge
  * joins with ZERO ShuffleExchange on either side (and no per-task sort
  * when sortBy matches) — the shuffle is paid once at write, amortized
  * over every subsequent round. At 10^10 seen URLs that converts the
  * per-round O(seen) exchange into O(0): each round's candidate batch is
  * the only side that moves.
  *
  * Bucket-count choice at 100 TB: buckets are the join's parallelism
  * ceiling (one task per bucket), so size them like shuffle partitions —
  * table_bytes / ~256 MB, rounded to a power of two (e.g. 2^17 for a
  * 32 TB seen set). Bucketing metadata lives in the session catalog;
  * on a cluster this is the Hive/Iceberg metastore entry, and
  * [[graft.frontier.SnapshotTable]]'s manifest plays the same role for
  * path-based snapshots (its `urlHash`-partitioned write order is
  * bucket-shaped but catalog-less, so Spark cannot prove it — this
  * helper IS the proof path when a catalog is available).
  *
  * Tests must route writes through an explicit `path` (external table)
  * so nothing lands in the default warehouse under the repo root.
  */
object BucketedStore {

  /** Write `df` as a bucketed external table (overwrite). */
  def write(df: DataFrame, table: String, path: String, nBuckets: Int,
      key: String, sortKeys: Seq[String] = Nil): Unit = {
    val sorted = if (sortKeys.isEmpty) Seq(key) else sortKeys
    df.write
      .mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(nBuckets, key)
      .sortBy(sorted.head, sorted.tail: _*)
      .saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  def drop(spark: SparkSession, table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
}
