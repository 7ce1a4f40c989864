package graft.frontier

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL query-parameter significance mining — learn, per host, which query
  * parameters do NOT affect page content (session ids, tracking tags), then
  * rewrite URLs to drop them so the seen-set and frontier collapse aliases.
  *
  * The reference crawls every distinct URL string it discovers
  * (`RwCrawlerThread`/fess-crawler UrlQueue key on the raw URL); a session
  * parameter therefore multiplies its fetch volume by the number of session
  * ids observed. The standard fix is rule mining over (url, content-hash)
  * pairs (Dasgupta et al., "De-duping URLs via rewrite rules", KDD 2008,
  * public): hold the rest of the URL fixed, vary one parameter — if the
  * content hash never changes across its values, the parameter is
  * content-insignificant for that host.
  *
  * Scale shape: two bounded-key exchanges. The witness-group exchange keys
  * on (host, param, residual-URL) — group size is the number of observed
  * values for ONE parameter on ONE page, bounded by crawl-revisit counts,
  * never corpus size; the verdict exchange keys on (host, param), a set
  * orders smaller than the URL universe. The per-URL parse/explode is pure
  * map-side built-ins (split / array_sort / array_remove), and the fan-out
  * is the URL's own parameter count (single digits), so the exchanges carry
  * ~#params × |corpus| slim rows. Everything downstream of the verdict is a
  * broadcast.
  */
object UrlParams {

  /** One row per (url, "k=v" occurrence) with the parameter key, its value,
    * and the residual URL (base + the OTHER sorted parameters) — the
    * mining witness key. Parameters are sorted so the residual is
    * order-insensitive ("?a=1&b=2" and "?b=2&a=1" witness each other).
    */
  private def explodeParams(pages: DataFrame, urlCol: String): DataFrame =
    pages
      .withColumn("__base", substring_index(col(urlCol), "?", 1))
      .withColumn("__q",
        when(instr(col(urlCol), "?") > 0,
          expr(s"substring(`$urlCol`, instr(`$urlCol`, '?') + 1)"))
          .otherwise(lit("")))
      .withColumn("__kvs",
        array_sort(filter(split(col("__q"), "&"), kv => length(kv) > 0)))
      .withColumn("__kv", explode(col("__kvs")))
      .withColumn("param", substring_index(col("__kv"), "=", 1))
      .withColumn("__v",
        when(instr(col("__kv"), "=") > 0,
          expr("substring(__kv, instr(__kv, '=') + 1)")).otherwise(lit("")))
      .withColumn("residual",
        concat(col("__base"), lit("?"),
          array_join(array_remove(col("__kvs"), col("__kv")), "&")))

  /** Mine per-(host, param) significance verdicts from observed
    * (url, content-hash) pages.
    *
    * A witness group is (host, param, residual): URLs identical except for
    * this parameter's value. A parameter is `insignificant` when at least
    * one witness group saw it vary (>1 distinct value) AND every varying
    * group kept a single distinct content hash. A parameter that never
    * varied is inconclusive (insignificant = false — never drop without
    * evidence).
    *
    * Returns (host, param, witness_groups, varied_groups, insignificant).
    *
    * The verdicts only ever ask "more than one distinct value?" and
    * "exactly one distinct hash?", so the group pass compares min/max
    * instead of exact `countDistinct` — that keeps the aggregation a
    * plain two-exchange hash agg (an exact two-column distinct would add
    * an Expand + a third exchange carrying every (value, hash) pair).
    */
  def mine(pages: DataFrame, urlCol: String = "url",
      hashCol: String = "content_hash"): DataFrame =
    explodeParams(pages.select(col(urlCol), col(hashCol)), urlCol)
      .select(graft.model.UrlOps.hostCol(col(urlCol)).as("host"),
        col("param"), col("residual"), col("__v"), col(hashCol).as("__h"))
      .groupBy("host", "param", "residual")
      .agg((min(col("__v")) =!= max(col("__v"))).as("__varied"),
        (min(col("__h")) === max(col("__h"))).as("__oneHash"))
      .groupBy("host", "param")
      .agg(count(lit(1)).as("witness_groups"),
        sum(when(col("__varied"), 1L).otherwise(0L)).as("varied_groups"),
        min(when(col("__varied"), col("__oneHash").cast("int")))
          .as("__allSame"))
      .withColumn("insignificant",
        col("varied_groups") > 0 && col("__allSame") === 1)
      .drop("__allSame")

  /** Rewrite URLs by dropping the parameters [[mine]] proved insignificant
    * for their host. The rules side collapses to one row per host (a set of
    * bad params — orders smaller than the URL universe), so the join
    * broadcasts; the rewrite itself is a map-side higher-order filter over
    * the parsed parameter list. URLs whose every parameter is dropped lose
    * the '?' entirely. Adds `url_normalized`; feed THAT to the seen-set /
    * frontier key to collapse aliases before they are fetched.
    */
  def normalize(urls: DataFrame, rules: DataFrame,
      urlCol: String = "url"): DataFrame = {
    val bad = rules.filter(col("insignificant"))
      .groupBy("host").agg(collect_set(col("param")).as("__bad"))
    urls
      .withColumn("__host", graft.model.UrlOps.hostCol(col(urlCol)))
      .join(broadcast(bad), col("__host") === bad("host"), "left")
      .drop("host")
      .withColumn("__base", substring_index(col(urlCol), "?", 1))
      .withColumn("__q",
        when(instr(col(urlCol), "?") > 0,
          expr(s"substring(`$urlCol`, instr(`$urlCol`, '?') + 1)"))
          .otherwise(lit("")))
      .withColumn("__kept",
        filter(array_sort(filter(split(col("__q"), "&"), kv => length(kv) > 0)),
          kv => !array_contains(
            coalesce(col("__bad"), typedLit(Seq.empty[String])),
            substring_index(kv, "=", 1))))
      .withColumn("url_normalized",
        when(size(col("__kept")) > 0,
          concat(col("__base"), lit("?"), array_join(col("__kept"), "&")))
          .otherwise(col("__base")))
      .drop("__host", "__bad", "__base", "__q", "__kept")
  }
}
