package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics for crawl prioritization. The reference crawls in
  * plain breadth-first order (`RiverWeb.java:434-439` walks depth levels);
  * at web scale a crawler ranks its frontier by link authority so the
  * politeness-limited fetch budget goes to the pages that matter — this is
  * the standard PageRank construction (Page et al. 1999, public), made
  * engine- and cluster-size-invariant by running entirely in integers.
  */
object GraphOps {

  /** PageRank over an edge list, in exact integer arithmetic.
    *
    * Ranks carry `rankScale` total mass (default 10¹²): every node starts
    * at ⌊scale/N⌋; each iteration a node sends ⌊rank/out-degree⌋ to every
    * out-neighbor and collects ⌊(1−d)·scale/N⌋ + ⌊d·Σ inbound⌋ with
    * d = `dampNum/dampDen` (default 17/20 = 0.85). All divisions are
    * floors over values < 2⁵³, so the double-backed floor is EXACT, and
    * per-node inbound sums are integer sums — order-invariant across
    * partitionings, bit-identical at any cluster size (a double-weighted
    * PageRank is not: its per-iteration float sums depend on merge order).
    * Exactness holds while `rankScale · dampNum < 2⁵²` — every floor's
    * numerator stays double-exact, and any non-exact quotient is a rational
    * ≥ 1/(dampDen·N) away from an integer, far beyond the ~2⁻⁵² division
    * rounding.
    * Mass lost to floors and dangling nodes is not redistributed (the
    * simple public variant); ranking order is what frontier prioritization
    * consumes and floors only ever shave < out-degree ticks per node.
    *
    * Scale shape per iteration: one shuffle keyed on the edge source (the
    * rank join — edges pre-partitioned once and persisted so iterations
    * reuse the layout) and one keyed on the destination with map-side
    * partial sums. Ranks are one row per node — orders smaller than the
    * edge list. `localCheckpoint` per iteration truncates the
    * self-referential lineage exactly as [[Dedup.connectedComponents]].
    * Returns (node, rank).
    */
  def pageRank(edges: DataFrame, iterations: Int,
      srcCol: String = "src", dstCol: String = "dst",
      rankScale: Long = 1000000000000L,
      dampNum: Int = 17, dampDen: Int = 20): DataFrame = {
    require(iterations >= 0, "iterations must be non-negative")
    // persist AFTER repartitioning on src: the cached scan reports
    // hashpartitioning(src), so every iteration's rank join reuses the
    // layout instead of re-shuffling the (large) edge side
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().repartition(col("src")).persist()
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct().persist()
    val outDeg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("__deg")).persist()
    val nDf = nodes.agg(count(lit(1)).as("__n"))
    // teleport share ⌊(1−d)·scale/N⌋, start rank ⌊scale/N⌋ — both exact
    val base = floor(lit(rankScale.toDouble) * (dampDen - dampNum) /
      (lit(dampDen) * col("__n"))).cast("long")
    var ranks = nodes.crossJoin(broadcast(nDf))
      .select(col("node"),
        floor(lit(rankScale.toDouble) / col("__n")).cast("long").as("rank"))
      .localCheckpoint(true)
    for (_ <- 0 until iterations) {
      val inbound = e
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(outDeg.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          floor(col("rank") / col("__deg")).cast("long").as("__c"))
        .groupBy("node").agg(sum("__c").as("__in"))
      ranks = nodes.crossJoin(broadcast(nDf))
        .join(inbound, Seq("node"), "left")
        .select(col("node"),
          (base + floor(lit(dampNum) * coalesce(col("__in"), lit(0L)) /
            lit(dampDen)).cast("long")).as("rank"))
        .localCheckpoint(true)
    }
    e.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    outDeg.unpersist(blocking = false)
    ranks
  }
}
