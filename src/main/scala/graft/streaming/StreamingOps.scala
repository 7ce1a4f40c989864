package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

import graft.extract.Extractor
import graft.model.{CrawlConfig, FrontierEntry}

/** Structured-Streaming forms of the engine's data-plane operators — the
  * continuous analog of the batch round loop for deployments where pages
  * arrive as a stream (the reference's daemon mode, RiverWeb.java:163-223,
  * generalized from job polling to record streams).
  *
  * Everything here reuses the SAME config-compiled expressions as the batch
  * path ([[Extractor]]), so batch/streaming parity is structural: one plan
  * compiler, two execution modes. Tests assert streaming output equality
  * with the batch pipeline on identical input.
  */
object StreamingOps {

  /** the corpus/pages schema (input_hint shape + fetch metadata). */
  val pageSchema: StructType = new StructType()
    .add("doc_id", StringType)
    .add("host", StringType)
    .add("lastModified", LongType)
    .add("spans", ArrayType(new StructType()
      .add("kind", StringType)
      .add("text", StringType)
      .add("media_ref", StringType)
      .add("offset", IntegerType, nullable = false)))

  /** Pages-on-arrival → extracted documents: `readStream` over a pages
    * directory through the config-compiled extraction (stateless — plans
    * identically to the batch hot path, whole-stage codegen included).
    */
  def extractStream(spark: SparkSession, pagesDir: String,
      config: CrawlConfig): DataFrame = {
    val pages = spark.readStream.schema(pageSchema).parquet(pagesDir)
    Extractor.extract(fetchShape(pages), config)
  }

  /** PageDoc-shaped stream/frame → FetchResult shape (synthetic fetch,
    * same projection the batch round uses).
    */
  def fetchShape(pages: DataFrame): DataFrame = pages.select(
    col("doc_id").as("url"),
    lit(null).cast("string").as("parentUrl"),
    lit(0).as("depth"),
    xxhash64(col("doc_id")).as("urlHash"),
    lit("GET").as("method"),
    lit("text/html").as("mimeType"),
    lit("UTF-8").as("charSet"),
    lit(200).as("httpStatusCode"),
    lit(0L).as("contentLength"),
    lit(0L).as("executionTime"),
    col("lastModified"),
    col("spans"))

  /** Streaming URL-seen dedup (J1's continuous form): exact, stateful
    * `dropDuplicates` on (urlHash, url) — the state store IS the seen set,
    * hash-partitioned by key exactly like the batch anti-join's shuffle.
    * State grows without bound by design (a crawl never forgets a URL);
    * bound it with a watermarked variant when the domain allows re-crawl
    * after an event-time horizon.
    */
  def dedupStream(candidates: DataFrame): DataFrame =
    candidates.dropDuplicates("urlHash", "url")

  /** The bounded-state variant [[dedupStream]]'s docstring promises: URL
    * dedup with an event-time horizon — a URL seen again AFTER the
    * watermark has moved past its first sighting by `horizon` is admitted
    * again (the re-crawl-after-TTL semantics of Z7's incremental mode,
    * expressed in state). `dropDuplicatesWithinWatermark` keeps a key's
    * state only until the watermark passes its event time + delay, so the
    * state store is bounded by horizon × arrival rate instead of the
    * crawl's full URL history — the streaming analog of expiring
    * seen-set snapshots ([[graft.frontier.FrontierStore]] GC). Within the
    * horizon the dedup is exact (the spec pins in-horizon duplicates
    * dropped across micro-batches and post-horizon re-admission). Note
    * state eviction LAGS the watermark by one micro-batch — cleanup runs
    * at batch end with that batch's watermark — so re-admission begins
    * one batch after the horizon passes, never early (the safe side for
    * a politeness-bounded crawl).
    */
  def dedupStreamBounded(candidates: DataFrame, horizon: String,
      tsCol: String = "lastModified"): DataFrame =
    candidates
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("urlHash", "url")

  /** Watermarked tumbling-window fetch metrics per host (the crawl-rate
    * dashboards the reference keeps in ES): event-time windows + watermark
    * so state for closed windows is evicted.
    */
  def hostWindowCounts(
      fetches: DataFrame,
      windowLen: String = "10 seconds",
      watermarkDelay: String = "30 seconds"): DataFrame =
    fetches
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLen), col("host"))
      .agg(count(lit(1)).as("fetches"))
      .select(col("window.start").as("window_start"), col("host"), col("fetches"))

  /** Streaming hopping-window rollup — the continuous form of
    * [[graft.ops.EventOps.hoppingWindowCounts]]: the identical
    * two-argument `window` (each event in window/slide overlapping
    * windows, a bounded fan-out) plus an event-time watermark so closed
    * windows emit in append mode and their state evicts. Output matches
    * the batch operator row-for-row on the same closed input (parity
    * spec) — one sliding-window semantics, two execution modes.
    */
  def hoppingWindowStream(events: DataFrame, windowSeconds: Long,
      slideSeconds: Long, watermarkDelay: String = "30 seconds",
      typeCol: String = "event_type", tsCol: String = "ts",
      valueCol: String = "value"): DataFrame = {
    require(windowSeconds > 0 && slideSeconds > 0 &&
      windowSeconds % slideSeconds == 0,
      "slide must be a positive divisor of the window")
    events
      .withColumn(tsCol, col(tsCol).cast("timestamp"))
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), s"$windowSeconds seconds",
        s"$slideSeconds seconds").as("__w"), col(typeCol))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col(valueCol) * 100 + 0.5).cast("long")).as("sum_cents"))
      .select(unix_micros(col("__w.start")).as("window_start_us"),
        col(typeCol), col("n_events"), col("sum_cents"))
  }

  /** Streaming gap sessionization — the continuous form of
    * [[graft.ops.EventOps.sessionize]]: the IDENTICAL `session_window`
    * construct plus an event-time watermark, so closed sessions emit in
    * append mode once the watermark passes their end and per-user open
    * sessions are the only state held. Output schema and µs-exact bounds
    * match the batch operator row-for-row on the same closed input (the
    * parity spec asserts equality), which is the point: one sessionization
    * semantics, two execution modes.
    */
  def sessionizeStream(events: DataFrame, gapSeconds: Long = 1800L,
      watermarkDelay: String = "30 seconds",
      userCol: String = "user_id", tsCol: String = "ts"): DataFrame =
    // ONE definition of the sessionization plan: delegate to the batch
    // operator, inserting only the watermark (identity is structural, not
    // maintained by a hand-copied plan)
    graft.ops.EventOps.sessionize(
      events.withColumn(tsCol, col(tsCol).cast("timestamp"))
        .withWatermark(tsCol, watermarkDelay),
      gapSeconds, userCol, tsCol)

  /** Streaming percolation — continuous alerting on newly crawled docs
    * (the ES percolator run at index time): each micro-batch's documents
    * are matched against the stored query catalog and (doc, query) alert
    * rows emit IN APPEND MODE, because the inline percolation form is
    * stateless map-side work (catalog folded into the plan, zero
    * exchange, no aggregation state). ONE definition of the matching
    * semantics: delegates to [[graft.ops.SearchOps.percolateInline]],
    * whose equality with the exchange-based batch [[graft.ops.SearchOps
    * .percolate]] is the parity spec.
    */
  def percolateStream(docs: DataFrame, queries: Seq[(String, Seq[String])],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    graft.ops.SearchOps.percolateInline(docs, queries, idCol, textCol)

  /** Streaming time-bounded correlation — the continuous form of
    * [[graft.ops.EventOps.intervalJoin]]: the SAME Δ-bucket equi-join
    * construction (Spark rejects stream-stream joins without an equality
    * predicate, so the batch rewrite is not an optimization here — it is
    * the only admissible shape), with both event-time columns watermarked
    * and the range condition kept DIRECTLY on those raw timestamp columns
    * (not on derived µs integers — state cleanup reasons over watermarked
    * event-time attributes). The symmetric hash join uses watermark +
    * range to evict state: left rows age out `windowSeconds` past the
    * watermark, right rows at the watermark, so state is bounded by
    * (window + delay) × arrival rate — the streaming analog of the batch
    * form's bounded buckets. Matches emit in append mode as soon as both
    * sides arrive (inner join — no flush sentinel needed). Output schema
    * and µs-exact bounds match the batch operator row-for-row on the same
    * closed input (parity spec).
    */
  def intervalJoinStream(left: DataFrame, right: DataFrame,
      windowSeconds: Long, watermarkDelay: String = "30 seconds",
      lIdCol: String = "l_id", rIdCol: String = "r_id",
      tsCol: String = "ts"): DataFrame = {
    val w = windowSeconds * 1000000L
    val l = left.select(col(lIdCol), col(tsCol).cast("timestamp").as("__lts"))
      .withWatermark("__lts", watermarkDelay)
      .withColumn("__probe", explode(array(lit(0L), lit(1L))))
      .withColumn("__lb", expr(s"unix_micros(__lts) div ${w}L") + col("__probe"))
      .drop("__probe")
    val r = right.select(col(rIdCol), col(tsCol).cast("timestamp").as("__rts"))
      .withWatermark("__rts", watermarkDelay)
      .withColumn("__rb", expr(s"unix_micros(__rts) div ${w}L"))
    l.join(r,
      col("__lb") === col("__rb") &&
        col("__rts") >= col("__lts") &&
        col("__rts") <= col("__lts") + expr(s"INTERVAL $windowSeconds SECONDS"))
      .select(col(lIdCol), col(rIdCol),
        unix_micros(col("__lts")).as("l_us"),
        unix_micros(col("__rts")).as("r_us"),
        (unix_micros(col("__rts")) - unix_micros(col("__lts"))).as("delta_us"))
  }

  /** Streaming keyed as-of join under a lookback horizon: each left event
    * to the LATEST same-key right event at-or-before it, at most
    * `horizonSeconds` back — [[graft.ops.EventOps.asOfJoinBucketed]]'s
    * semantics as a continuous query. Two chained stateful operators:
    * the batch Δ-bucket equi-join construction (Δ = the horizon; the
    * equality key Spark REQUIRES for stream-stream joins, range bounds on
    * the raw watermarked timestamps so the symmetric hash join evicts
    * state at horizon × arrival rate), then an append-mode max-by
    * aggregation keyed on the left event — its group key includes the
    * watermarked left timestamp, so a left event's candidate set closes
    * and emits exactly when the watermark passes it, and aggregation
    * state is bounded by in-flight lefts × candidate maxima (one struct
    * per left event, not the candidate list). Right-side longs leave the
    * join as plain µs columns so the aggregation sees ONE event-time
    * column. Parity spec: equals the batch bucketed form on the same
    * closed input.
    */
  def asOfJoinStream(left: DataFrame, right: DataFrame,
      keyCols: Seq[String], horizonSeconds: Long,
      watermarkDelay: String = "30 seconds",
      lIdCol: String = "l_id", rIdCol: String = "r_id",
      tsCol: String = "ts"): DataFrame = {
    require(keyCols.nonEmpty, "asOfJoinStream needs at least one key column")
    require(horizonSeconds > 0, "horizonSeconds must be positive")
    val d = horizonSeconds * 1000000L
    val l = left.select(
        keyCols.map(col) ++ Seq(col(lIdCol),
          col(tsCol).cast("timestamp").as("__lts")): _*)
      .withWatermark("__lts", watermarkDelay)
      .withColumn("__probe", explode(array(lit(-1L), lit(0L))))
      .withColumn("__lb", expr(s"unix_micros(__lts) div ${d}L") + col("__probe"))
      .drop("__probe")
    val r = right.select(
        keyCols.map(c => col(c).as(s"__rk_$c")) ++ Seq(col(rIdCol),
          col(tsCol).cast("timestamp").as("__rts")): _*)
      .withWatermark("__rts", watermarkDelay)
      .withColumn("__rb", expr(s"unix_micros(__rts) div ${d}L"))
    val keyEq = keyCols.map(c => col(c) === col(s"__rk_$c")).reduce(_ && _)
    val joined = l.join(r,
      keyEq && col("__lb") === col("__rb") &&
        col("__rts") <= col("__lts") &&
        col("__rts") >= col("__lts") - expr(s"INTERVAL $horizonSeconds SECONDS"))
      // strip the right event-time attribute NOW (plain µs long): the
      // downstream aggregation must see exactly one event-time column
      .select(keyCols.map(col) ++ Seq(col(lIdCol), col("__lts"),
        unix_micros(col("__rts")).as("__r_us"), col(rIdCol)): _*)
    joined
      .groupBy(keyCols.map(col) ++ Seq(col(lIdCol), col("__lts")): _*)
      .agg(max(struct(col("__r_us").as("r_us"), col(rIdCol).as("r_id")))
        .as("__m"))
      .select(keyCols.map(col) ++ Seq(col(lIdCol),
        col(s"__m.r_id").as(rIdCol),
        unix_micros(col("__lts")).as("l_us"),
        col("__m.r_us").as("r_us"),
        (unix_micros(col("__lts")) - col("__m.r_us")).as("lag_us")): _*)
  }

  /** Cumulative per-host politeness gate (W2/Z1's continuous form): admit at
    * most `hostBudget` URLs per host over the stream's lifetime, tracked in
    * keyed state across micro-batches via flatMapGroupsWithState. Within a
    * micro-batch, admission follows the canonical order (depth, urlHash,
    * url) — the group iterator is sorted in-memory per host, which is
    * bounded by the per-batch per-host candidate count.
    */
  def politenessGate(candidates: Dataset[FrontierEntry],
      hostBudget: Int): Dataset[FrontierEntry] = {
    import candidates.sparkSession.implicits._
    candidates
      .groupByKey(_.host)
      .flatMapGroupsWithState[Long, FrontierEntry](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, it: Iterator[FrontierEntry], state: GroupState[Long]) =>
          val used = state.getOption.getOrElse(0L)
          val room = math.max(hostBudget - used, 0L).toInt
          val admitted = it.toSeq
            .sortBy(e => (e.depth, e.urlHash, e.url))
            .take(room)
          state.update(used + admitted.size)
          admitted.iterator
      }
  }
}
