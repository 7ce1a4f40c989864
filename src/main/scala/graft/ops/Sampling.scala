package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and splitting for training-data pipelines:
  * hash-bucket a stable id and threshold the bucket — reproducible across
  * runs, cluster sizes, and partitionings (no `rand()`), and a pure
  * map-side projection (no shuffle, no state).
  *
  * The bucket hash is Knuth's multiplicative scheme over the numeric id
  * (`(id · 2654435761) mod 2^32`, then mod `Buckets`) — chosen over
  * xxhash64 because the arithmetic is expressible in ANSI SQL, so every
  * split/sample is DuckDB-oracle-checkable end to end. 10^4 buckets bound
  * the split-fraction granularity at 0.01%.
  */
object Sampling {

  val Buckets = 10000

  /** stable bucket in [0, Buckets) for a numeric id column. */
  def bucketOf(id: Column): Column =
    pmod(pmod(id.cast("long") * 2654435761L, lit(4294967296L)), lit(Buckets))

  /** Add a `split` column assigning each row to the first label whose
    * cumulative weight covers its bucket — e.g.
    * `Seq("train" -> 0.98, "val" -> 0.01, "test" -> 0.01)`. Weights are
    * taken as fractions of [[Buckets]] (floor), remainder goes to the last
    * label, so the assignment is exact integer arithmetic.
    */
  def deterministicSplit(df: DataFrame, idCol: String,
      weights: Seq[(String, Double)]): DataFrame = {
    require(weights.nonEmpty && math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      "split weights must sum to 1")
    val bounds = weights.init.scanLeft(0L) {
      case (acc, (_, w)) => acc + math.floor(w * Buckets).toLong
    }.tail
    val b = bucketOf(col(idCol))
    val branches = weights.init.zip(bounds).foldLeft(Option.empty[Column]) {
      case (acc, ((label, _), hi)) =>
        Some(acc.fold(when(b < hi, label))(_.when(b < hi, label)))
    }
    df.withColumn("split",
      branches.fold(lit(weights.last._1): Column)(_.otherwise(weights.last._1)))
  }

  /** Keep a per-stratum deterministic fraction of rows (e.g. downsample
    * per language): row kept iff its bucket < fraction·Buckets for its
    * stratum; strata absent from `fractions` fall back to `defaultFraction`.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 1.0): DataFrame = {
    val thresholds = fractions.toSeq.sortBy(_._1).foldLeft(Option.empty[Column]) {
      case (acc, (stratum, f)) =>
        val hit = col(strataCol) === stratum
        val th = lit(math.floor(f * Buckets).toLong)
        Some(acc.fold(when(hit, th))(_.when(hit, th)))
    }
    val th = thresholds.fold(lit(math.floor(defaultFraction * Buckets).toLong): Column)(
      _.otherwise(math.floor(defaultFraction * Buckets).toLong))
    df.filter(bucketOf(col(idCol)) < th)
  }
}
