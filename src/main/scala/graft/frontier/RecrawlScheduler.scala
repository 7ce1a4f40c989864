package graft.frontier

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Adaptive recrawl scheduling — decide WHEN to refetch each known URL from
  * its own change history. The reference recrawls on a fixed config
  * `interval` for every URL (`RiverWeb.java:326-331` schedules the whole
  * river on one cron interval); at web scale a fixed interval wastes the
  * politeness-limited fetch budget on pages that never change and goes
  * stale on pages that always do. The standard fix (Cho & Garcia-Molina
  * 2003, public) is per-URL exponential backoff: each consecutive
  * unchanged fetch doubles the revisit interval, any observed change
  * resets it.
  */
object RecrawlScheduler {

  /** Per-URL next-fetch times from a fetch history of
    * (url, fetch-timestamp µs, content hash).
    *
    * A fetch "changed" if its hash differs from the previous fetch's hash
    * (the first fetch of a URL always counts as changed — new content).
    * `unchanged_streak` is the number of fetches after the most recent
    * changed one, and the next visit is scheduled at
    * `last_fetch + baseIntervalUs · 2^min(streak, maxExp)` — all integer
    * arithmetic, so the schedule is engine- and cluster-size-invariant.
    *
    * Scale shape: ONE exchange keyed on url — the change-marking window
    * and the per-url aggregate share the same hash partitioning, so
    * Catalyst reuses the exchange. The window's per-group state is the
    * URL's OWN fetch history, bounded by revisit counts (a few dozen rows
    * even for a daily-crawled URL over a year), never by corpus size — the
    * bounded-group argument that lets a per-key sort survive 100×, unlike
    * a per-event-type sort (see EventOps.valueQuantiles' histogram path
    * for the unbounded case). The streak is derived from the max changed
    * row-number, not a trailing scan, so the aggregate carries map-side
    * partials.
    *
    * Returns (url, fetches, last_fetch_us, unchanged_streak,
    * next_fetch_us).
    */
  def schedule(history: DataFrame, baseIntervalUs: Long,
      maxExp: Int = 6, urlCol: String = "url", tsCol: String = "fetch_us",
      hashCol: String = "content_hash"): DataFrame = {
    require(baseIntervalUs > 0 && maxExp >= 0 && maxExp < 50,
      "baseIntervalUs must be positive and maxExp in [0, 50)")
    val w = Window.partitionBy(col(urlCol)).orderBy(col(tsCol))
    val marked = history.select(
        col(urlCol).as("url"), col(tsCol).as("fetch_us"),
        col(hashCol).as("__h"))
      .withColumn("__idx", row_number().over(w).cast("long"))
      .withColumn("__chg",
        col("__idx") === 1L || col("__h") =!= lag(col("__h"), 1).over(w))
    marked.groupBy("url")
      .agg(count(lit(1)).as("fetches"),
        max(col("fetch_us")).as("last_fetch_us"),
        (count(lit(1)) -
          max(when(col("__chg"), col("__idx")))).as("unchanged_streak"))
      .withColumn("next_fetch_us",
        col("last_fetch_us") + lit(baseIntervalUs) *
          expr(s"shiftleft(CAST(1 AS BIGINT), " +
            s"CAST(least(unchanged_streak, $maxExp) AS INT))"))
  }

  /** Sitemap lastmod override (sitemaps.org semantics, the hint the
    * reference's SitemapsRule pages carry): a URL whose sitemap-advertised
    * last-modification is NEWER than our last fetch is due NOW — the hint
    * short-circuits the exponential backoff, because the site just told us
    * the page changed. URLs without a hint (or with a stale hint) keep
    * their [[schedule]] time. One equi-join on url — both sides already
    * hash-partition on it, and a sitemap hint table is orders smaller than
    * the URL universe, so Spark broadcasts it when it fits. Adds
    * `sitemap_due` and rewrites `next_fetch_us` to `last_fetch_us`
    * (immediately due) for hinted-fresh URLs.
    */
  def withSitemapHints(schedule: DataFrame, hints: DataFrame,
      urlCol: String = "url", lastmodCol: String = "lastmod_us"): DataFrame =
    schedule
      .join(hints.select(col(urlCol).as("url"), col(lastmodCol).as("__lm")),
        Seq("url"), "left")
      .withColumn("sitemap_due",
        coalesce(col("__lm") > col("last_fetch_us"), lit(false)))
      .withColumn("next_fetch_us",
        when(col("sitemap_due"), col("last_fetch_us"))
          .otherwise(col("next_fetch_us")))
      .drop("__lm")
}
