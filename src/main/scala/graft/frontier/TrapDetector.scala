package graft.frontier

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spider-trap defense — flag URLs and hosts that generate unbounded URL
  * spaces (calendar pages, self-linking path loops, session mazes) before
  * they drain the politeness-limited fetch budget.
  *
  * The reference bounds traps only indirectly (depth + access-count budgets,
  * `RiverWeb.java:326-383`); a trap host still consumes its whole budget.
  * Public crawler practice adds two cheap structural signals:
  *   - Heritrix's path-repetition rule: a path where one segment repeats
  *     more than k times (/cal/cal/cal/…) is a loop, skip it;
  *   - IRLbot-style host budgets from URL-space shape: a host whose URL
  *     count keeps GROWING with path depth is minting URLs, not hosting
  *     documents (real sites thin out with depth).
  *
  * Scale shape: the per-URL rule is pure map-side array built-ins (split +
  * array_sort + an exists over offset pairs — codegen, no UDF). The host
  * aggregate is two bounded-key exchanges: (host, depth) then host, both
  * orders smaller than the URL universe.
  */
object TrapDetector {

  /** Path segments of a URL (everything after the authority, before ?/#),
    * empty segments dropped. */
  private def segmentsOf(url: Column): Column =
    filter(
      split(substring_index(substring_index(
        substring_index(url, "://", -1), "?", 1), "#", 1), "/"),
      s => length(s) > 0)

  /** True when any single path segment occurs MORE than `maxRepeat` times.
    * Trick: in the sorted segment array, some value has multiplicity >
    * maxRepeat iff positions i and i+maxRepeat hold the same value for
    * some i — one pass, no per-segment map. The first array slot is the
    * host (split of "host/path"), harmless: a host cannot equal enough
    * path segments unless the path genuinely loops on it.
    */
  def pathRepeats(url: Column, maxRepeat: Int = 2): Column = {
    val sorted = array_sort(segmentsOf(url))
    when(size(sorted) <= maxRepeat, lit(false)).otherwise(
      exists(sequence(lit(1), size(sorted) - lit(maxRepeat)),
        i => element_at(sorted, i) === element_at(sorted, i + maxRepeat)))
  }

  /** Per-URL trap flags: (url, path_depth, trap_repeat). Map-side only —
    * compose it into the frontier's candidate filter like the robots gate.
    */
  def flagUrls(urls: DataFrame, urlCol: String = "url",
      maxRepeat: Int = 2): DataFrame =
    urls.withColumn("path_depth",
        (size(segmentsOf(col(urlCol))) - lit(1)).cast("long"))
      .withColumn("trap_repeat", pathRepeats(col(urlCol), maxRepeat))

  /** Host-level URL-space shape: for each host, total URLs, max path
    * depth, URLs flagged by the repetition rule, and `growing_depths` —
    * the number of depth steps d→d+1 where the URL count did NOT shrink.
    * `trap_suspect` = repetition hits, or a deep URL space that keeps
    * growing (depth ≥ minDepth and every observed step non-shrinking).
    */
  def hostStats(urls: DataFrame, urlCol: String = "url",
      maxRepeat: Int = 2, minDepth: Int = 6): DataFrame = {
    val flagged = flagUrls(urls, urlCol, maxRepeat)
      .select(graft.model.UrlOps.hostCol(col(urlCol)).as("host"),
        col("path_depth"), col("trap_repeat"))
    val byDepth = flagged.groupBy("host", "path_depth")
      .agg(count(lit(1)).as("__n"),
        sum(col("trap_repeat").cast("long")).as("__rep"))
    byDepth
      .withColumn("__next", lead(col("__n"), 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("host").orderBy("path_depth")))
      .groupBy("host")
      .agg(sum(col("__n")).as("urls"),
        max(col("path_depth")).as("max_depth"),
        sum(col("__rep")).as("repeat_urls"),
        sum(when(col("__next") >= col("__n"), 1L).otherwise(0L))
          .as("growing_depths"),
        count(when(col("__next").isNotNull, lit(1))).as("depth_steps"))
      .withColumn("trap_suspect",
        col("repeat_urls") > 0 ||
          (col("max_depth") >= minDepth &&
            col("depth_steps") > 0 &&
            col("growing_depths") === col("depth_steps")))
  }
}
