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

  /** Inbound anchor-text aggregation — the classic web-search link signal
    * (anchor text describes the TARGET better than the target's own words;
    * Brin & Page 1998 §2.2, public): per link target, the inlink count,
    * the distinct-source count, and the most frequent anchor text with its
    * frequency.
    *
    * The mode ("most frequent text") is computed as a TWO-LEVEL aggregate —
    * count per (target, text), then max per target — never a per-target
    * sort or `collect_list`: both exchanges carry map-side partials and
    * per-group state is one row, so a target with a billion inlinks costs
    * a streaming reduce, not a buffered array (the funnel lesson). Ties
    * break deterministically to the lexicographically greatest text via a
    * zero-padded `count|text` sort key — the same trick is replayable in
    * ANSI SQL, which a float-scored or hash-tied arg_max is not. The
    * distinct-source count is exact and shares the target-keyed exchange.
    *
    * Returns (dstCol, inlinks, sources, top_anchor, top_cnt).
    */
  def anchorStats(links: DataFrame, srcCol: String = "src",
      dstCol: String = "dst", textCol: String = "anchor"): DataFrame = {
    val key = max(concat(lpad(col("__cnt").cast("string"), 12, "0"),
      lit("|"), col(textCol))).as("__k")
    val top = links.groupBy(col(dstCol), col(textCol))
      .agg(count(lit(1)).as("__cnt"))
      .groupBy(col(dstCol)).agg(key)
    links.groupBy(col(dstCol))
      .agg(count(lit(1)).as("inlinks"),
        count_distinct(col(srcCol)).as("sources"))
      .join(top, Seq(dstCol))
      .select(col(dstCol), col("inlinks"), col("sources"),
        col("__k").substr(lit(14), length(col("__k"))).as("top_anchor"),
        substring(col("__k"), 1, 12).cast("long").as("top_cnt"))
  }

  /** Collapse a URL-level link graph to a host-level graph — the standard
    * first step of site-authority analytics (a crawler budgets per HOST:
    * the reference's politeness interval is host-keyed,
    * `RiverWeb.java:320-323`, and so is this engine's claim window). Each
    * output row is one (src_host, dst_host) edge with its URL-edge count
    * and its distinct-source-page count; intra-host edges are dropped by
    * default (navigation chrome dominates them and they carry no
    * cross-site authority — Kleinberg 1999 §2 makes the same cut).
    *
    * Scale shape: one exchange keyed on (src_host, dst_host) with map-side
    * partial counts; the distinct-page count shares that exchange (exact
    * distinct inside the pair group, whose fan-in is bounded by the
    * src host's page count, not the corpus). The output is hosts², orders
    * smaller than the URL edge list — the whole point: downstream
    * [[pageRank]]/[[hits]] iterate over the collapsed graph.
    *
    * Returns (src_host, dst_host, weight, src_pages).
    */
  def hostGraph(links: DataFrame, srcCol: String = "src",
      dstCol: String = "dst", keepIntraHost: Boolean = false): DataFrame = {
    val withHosts = links.select(
      graft.model.UrlOps.hostCol(col(srcCol)).as("src_host"),
      graft.model.UrlOps.hostCol(col(dstCol)).as("dst_host"),
      col(srcCol).as("__src"))
    val cross = if (keepIntraHost) withHosts
                else withHosts.filter(col("src_host") =!= col("dst_host"))
    cross.groupBy("src_host", "dst_host")
      .agg(count(lit(1)).as("weight"),
        count_distinct(col("__src")).as("src_pages"))
  }

  /** HITS hubs-and-authorities (Kleinberg 1999, public), made engine- and
    * cluster-size-invariant the same way as [[pageRank]]: pure integer
    * arithmetic. Every node starts with hub = `scale`; each iteration
    * computes authority(v) = Σ hub(u) over in-edges, then
    * hub(u) = Σ authority(v) over out-edges — integer sums only, so the
    * result is order-invariant across partitionings and replayable
    * bit-for-bit by any BIGINT engine. The classic L²-normalisation is
    * deliberately dropped: it rescales every score by the same factor per
    * iteration, so the RANKING — what frontier prioritisation consumes —
    * is unchanged, and keeping the iteration division-free is what makes
    * it exact. The trade is an overflow bound instead of a norm: scores
    * grow by ≤ max-degree² per iteration, so `scale · maxDeg^(2·iters)`
    * must stay < 2⁶³ (e.g. deg ≤ 10⁴ allows 3 iterations at scale 10³ —
    * ample for host graphs, which is what this is for; assert with
    * `maxDegCheck`).
    *
    * Scale shape per iteration: one shuffle keyed on the edge destination
    * (authority sums) and one on the source (hub sums), both with
    * map-side partials; edges are de-duplicated, pre-partitioned on src
    * once and persisted so every iteration reuses the layout, and
    * `localCheckpoint` truncates the self-referential lineage per
    * iteration exactly as [[pageRank]]. Scores are one row per node.
    *
    * Returns (node, authority, hub) — authority/hub 0 for nodes with no
    * in-/out-edges.
    */
  def hits(edges: DataFrame, iterations: Int = 2,
      srcCol: String = "src", dstCol: String = "dst",
      scale: Long = 1000L, maxDegCheck: Boolean = true): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().repartition(col("src")).persist()
    if (maxDegCheck) {
      // growth per iteration is indeg-bound (authority) then outdeg-bound
      // (hub), so the bound uses the max over BOTH degree directions
      val degRow = e.groupBy("src").agg(count(lit(1)).as("d"))
        .select("d")
        .unionByName(e.groupBy("dst").agg(count(lit(1)).as("d")).select("d"))
        .agg(max("d")).first()
      val maxDeg = if (degRow.isNullAt(0)) 1L else math.max(1L, degRow.getLong(0))
      val bound = BigInt(math.max(1L, scale)) * BigInt(maxDeg).pow(2 * iterations)
      require(bound < (BigInt(1) << 62),
        s"hits overflow bound: scale=$scale * maxDeg=$maxDeg ^ ${2 * iterations} exceeds 2^62")
    }
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct().persist()
    var hubs = nodes.select(col("node"), lit(scale).as("hub"))
      .localCheckpoint(true)
    var auths: DataFrame = null
    for (_ <- 0 until iterations) {
      val aSum = e.join(hubs.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node")).agg(sum("hub").as("__a"))
      auths = nodes.join(aSum, Seq("node"), "left")
        .select(col("node"), coalesce(col("__a"), lit(0L)).as("authority"))
        .localCheckpoint(true)
      val hSum = e.join(auths.withColumnRenamed("node", "dst"), "dst")
        .groupBy(col("src").as("node")).agg(sum("authority").as("__h"))
      hubs = nodes.join(hSum, Seq("node"), "left")
        .select(col("node"), coalesce(col("__h"), lit(0L)).as("hub"))
        .localCheckpoint(true)
    }
    val out = auths.join(hubs, Seq("node"))
      .select(col("node"), col("authority"), col("hub"))
    e.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    out
  }
}
