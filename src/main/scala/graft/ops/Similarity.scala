package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`vec_id, embedding: array<float>`).
  *
  * Baseline: brute-force cosine top-k — one corpus scan, dot products inside
  * whole-stage codegen (`zip_with` + `aggregate`), global
  * TakeOrderedAndProject for the top-k (no full sort materialization).
  *
  * Scale path: deterministic random-hyperplane LSH — `nBits` sign
  * projections bucket the corpus; a query probes only its bucket (and
  * optionally multi-probe neighbors), then re-ranks exactly. Bucketing is a
  * single hash shuffle; at 100 TB the bucketed table is written once and
  * partition-pruned per query.
  */
object Similarity {

  /** elementwise-double view of a float vector column. */
  private def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2norm(v: Column): Column =
    sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x * x))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))

  /** Brute-force cosine top-k for one query vector. Deterministic total
    * order: (rounded cosine desc, vec_id asc).
    */
  def bruteForceTopK(
      embeddings: DataFrame,
      query: Seq[Double],
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = typedLit(query)
    embeddings
      .select(col(idCol),
        round(cosine(asDouble(col(vecCol)), q), 6).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** Deterministic pseudo-gaussian hyperplanes: component c of plane b is
    * derived from mix64(seed, b·dim+c), mapped to (-1, 1). Public-knowledge
    * construction (random projection LSH, Charikar 2002).
    */
  def hyperplanes(nBits: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] =
    Array.tabulate(nBits) { b =>
      Array.tabulate(dim) { c =>
        val h = graft.corpus.SyntheticCorpus.mix64(seed + b.toLong * dim + c)
        (h.toDouble / Long.MaxValue.toDouble)
      }
    }

  /** sign-projection bucket id (0 .. 2^nBits-1) for a vector column. */
  def lshBucket(v: Column, planes: Array[Array[Double]]): Column = {
    val vd = asDouble(v)
    planes.zipWithIndex.map { case (p, b) =>
      when(dot(vd, typedLit(p.toSeq)) > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Bucket the corpus once (the write-once side of the scale path). */
  def lshBuckets(embeddings: DataFrame, nBits: Int, dim: Int,
      vecCol: String = "embedding", seed: Long = 42L): DataFrame =
    embeddings.withColumn("bucket", lshBucket(col(vecCol), hyperplanes(nBits, dim, seed)))

  /** LSH-accelerated top-k: probe the query's bucket plus all buckets within
    * `probeHamming` bit flips, re-rank exactly by cosine. Recall grows with
    * probes; correctness of returned distances is exact.
    */
  def lshTopK(
      bucketed: DataFrame,
      query: Seq[Double],
      k: Int,
      nBits: Int,
      probeHamming: Int = 1,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(nBits, query.size, seed)
    val qBucket = planes.zipWithIndex.map { case (p, b) =>
      val d = p.zip(query).map { case (x, y) => x * y }.sum
      if (d > 0) 1L << b else 0L
    }.sum
    val probes: Seq[Long] =
      if (probeHamming <= 0) Seq(qBucket)
      else qBucket +: (0 until nBits).map(b => qBucket ^ (1L << b))
    val cand = bucketed.filter(col("bucket").isInCollection(probes))
    bruteForceTopK(cand, query, k, idCol, vecCol)
  }
}
