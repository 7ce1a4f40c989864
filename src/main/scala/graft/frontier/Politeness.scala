package graft.frontier

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Politeness claim (W2/Z1) — the reference's time-based per-thread pacing
  * (WebRiverIntervalController.java:5-13, RiverWeb.java:437-439) translated
  * into the testable per-round invariant: at most `hostBudget` fetches per
  * host per round, claimed in the canonical crawl order
  * `(depth asc, urlHash asc, url asc)` (BFS within-depth, W1), then globally
  * capped by the remaining `max_access_count` budget (A2/Z4).
  *
  * Skew: hosts are zipf-distributed (BASELINE.md), so a naive
  * `Window.partitionBy(host)` funnels the hottest host's 10^8 frontier rows
  * through one partition. We rank in two phases:
  *   1. per (host, salt) top-`hostBudget`, salt = pmod(urlHash, saltBuckets)
  *      — bounded partitions regardless of skew;
  *   2. exact per-host top-`hostBudget` over the ≤ saltBuckets·budget
  *      survivors — tiny by construction.
  * The true per-host top-k is always contained in the union of per-salt
  * top-ks, so phase 2 is exact.
  */
object Politeness {

  val OrderCols = Seq("depth", "urlHash", "url")

  /** Claim up to `hostBudget` rows per host and `remaining` rows overall,
    * in the canonical BFS order (depth, urlHash, url).
    */
  def claim(
      frontier: DataFrame,
      hostBudget: Int,
      remaining: Long,
      saltBuckets: Int = 16): DataFrame =
    claimOrdered(frontier,
      Seq(col("depth").asc, col("urlHash").asc, col("url").asc),
      hostBudget, remaining, saltBuckets)

  /** Priority-aware claim — frontier prioritization, the reason a crawler
    * computes link authority at all (see [[graft.ops.GraphOps.pageRank]]):
    * under a politeness-limited fetch budget, high-`priorityCol` URLs are
    * claimed first (descending), ties broken by the canonical BFS order so
    * the claim stays fully deterministic. The caller attaches the priority
    * column (typically a broadcast join against the node-count-sized rank
    * table — ranks are one row per node, orders smaller than the
    * frontier). Identical two-phase salted shape as [[claim]]: the
    * per-salt-top-k ⊇ per-host-top-k containment argument holds for ANY
    * total order, so the skew bound and exactness carry over unchanged.
    */
  def claimPrioritized(
      frontier: DataFrame,
      hostBudget: Int,
      remaining: Long,
      saltBuckets: Int = 16,
      priorityCol: String = "priority"): DataFrame =
    claimOrdered(frontier,
      Seq(col(priorityCol).desc, col("depth").asc, col("urlHash").asc,
        col("url").asc),
      hostBudget, remaining, saltBuckets)

  /** Per-host budget overrides (robots.txt Crawl-delay, Z1/Z2): hosts in
    * `hostBudgets` ("host", "budget") claim at most min(budget,
    * hostBudget) rows this round; absent hosts get the default. The
    * override table is one row per DISTINCT host with a delay directive —
    * orders smaller than the frontier — so it rides in as a broadcast
    * left join ahead of the same two-phase salted windows (the
    * containment argument is per host, each with its own k, so exactness
    * and the skew bound carry over unchanged). A budget ≤ 0 claims
    * nothing from that host.
    */
  def claimWithHostBudgets(
      frontier: DataFrame,
      hostBudget: Int,
      hostBudgets: DataFrame,
      remaining: Long,
      saltBuckets: Int = 16): DataFrame = {
    val joined = frontier.join(
      broadcast(hostBudgets.select(col("host"), col("budget").as("__hb"))),
      Seq("host"), "left")
    claimOrdered(joined,
      Seq(col("depth").asc, col("urlHash").asc, col("url").asc),
      hostBudget, remaining, saltBuckets,
      budget = coalesce(least(col("__hb"), lit(hostBudget)), lit(hostBudget)))
      .drop("__hb")
  }

  private def claimOrdered(
      frontier: DataFrame,
      order: Seq[org.apache.spark.sql.Column],
      hostBudget: Int,
      remaining: Long,
      saltBuckets: Int,
      budget: org.apache.spark.sql.Column = null): DataFrame = {
    val budgetExpr = Option(budget).getOrElse(lit(hostBudget))

    val phase2 = Window.partitionBy(col("host")).orderBy(order: _*)

    // saltBuckets <= 1 degenerates both phases to the same per-host
    // window — skip phase 1 outright (ONE exchange + sort instead of
    // two). Callers route here when the frontier is small enough that a
    // single host owning every row is still one trivial sort task
    // (CrawlSession gates on the known frontier row count — no extra
    // job); the salted two-phase stays the default for any frontier
    // where a hot host could be a real partition.
    val perHost = (if (saltBuckets <= 1) frontier
      else {
        val phase1 = Window
          .partitionBy(col("host"), pmod(col("urlHash"), lit(saltBuckets)))
          .orderBy(order: _*)
        frontier
          .withColumn("__r1", row_number().over(phase1))
          .filter(col("__r1") <= budgetExpr)
          .drop("__r1")
      })
      .withColumn("__r2", row_number().over(phase2))
      .filter(col("__r2") <= budgetExpr)
      .drop("__r2")

    // global budget cap in canonical order — planned as
    // TakeOrderedAndProject (no full global sort materialization). When
    // `remaining` exceeds Int.MaxValue the cap is skipped: a single round
    // cannot claim 2^31 rows through per-host budgets, and limit()/
    // TakeOrderedAndProject are Int-bounded anyway — overshoot is bounded
    // by one round and the loop's budget check ends the crawl at the next
    // round boundary (same at-most-one-overshoot the reference's
    // CrawlerContext counter gives its threads).
    if (remaining > Int.MaxValue.toLong) perHost
    else perHost.orderBy(order: _*).limit(remaining.toInt)
  }
}
