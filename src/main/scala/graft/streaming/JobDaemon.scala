package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{StringType, StructType}

import graft.crawl.{CrawlHooks, CrawlSession}
import graft.model.ConfigLoader

/** Z8: continuous queue-daemon mode — the reference's thread-pool poll loop
  * over a job index (RiverWeb.java:163-223) re-expressed as Structured
  * Streaming over a job-queue directory:
  *
  *   - one JSON file = one enqueued job `{config_id, session_id,
  *     config_json}` (the ES `.river_web` queue doc analog);
  *   - the file source's checkpointed offsets ARE the exactly-once claim
  *     (S3): a job file is processed in exactly one micro-batch, the
  *     streaming analog of the reference's delete-by-id claim
  *     (RiverWeb.java:183-195);
  *   - within a micro-batch jobs run in randomized order with a
  *     deterministic seed (S2/T1: `functionScore(random(...))` poll order,
  *     RiverWeb.java:175-182), `queue.parsing.size` chunking preserved as
  *     processing order;
  *   - each job is a full [[CrawlSession]] crawl (§3.2: job → crawl()).
  *
  * Idle shutdown (Z5): in continuous mode a watchdog thread stops the
  * query once no job has arrived for `queueTimeoutMs` — the reference's
  * `--queue-timeout` wall-clock self-termination (RiverWeb.java:68-69,
  * 171-172, default 5 min). AvailableNow runs terminate on drain anyway.
  */
final class JobDaemon(
    spark: SparkSession,
    corpus: DataFrame,
    robots: DataFrame,
    workDir: String,
    queueDir: String,
    checkpointDir: String,
    queueParsingSize: Int = 20,
    queueTimeoutMs: Long = 300000L, // Z5 --queue-timeout default 5 min
    hooks: CrawlHooks = CrawlHooks()) {

  val jobSchema: StructType = new StructType()
    .add("config_id", StringType)
    .add("session_id", StringType)
    .add("config_json", StringType)

  @volatile private var completedJobs: List[(String, Long)] = Nil
  @volatile private var lastActivity: Long = 0L
  // true while foreachBatch is executing jobs: the idle watchdog must never
  // stop the query mid-job, however long one job runs — "idle" means no
  // batch is running AND none has arrived for queueTimeoutMs (the
  // reference's --queue-timeout counts poll idleness, not job runtime).
  @volatile private var busy: Boolean = false
  // true once ANY micro-batch has completed: the reference polls the queue
  // immediately at startup, so a job already enqueued MUST be claimed even
  // if stream initialization outlives the idle timeout on a loaded box —
  // the watchdog may only fire before the first poll when the queue
  // directory is genuinely empty.
  @volatile private var anyBatchDone: Boolean = false

  /** (config_id, totalClaimed) per completed job, in processing order. */
  def completed: Seq[(String, Long)] = completedJobs.reverse

  def start(availableNow: Boolean = true): StreamingQuery = {
    val stream = spark.readStream.schema(jobSchema).json(queueDir)
    val writer = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        busy = true
        try {
          val jobs = batch
            .orderBy(rand(42), col("config_id")) // S2 randomized poll order
            .collect()
          if (jobs.nonEmpty) lastActivity = System.currentTimeMillis()
          jobs.grouped(queueParsingSize).foreach { chunk => // poll batch of 20
            chunk.foreach { row =>
              // a malformed job must not kill the daemon — the reference
              // catches per job and keeps polling (RiverWeb.java:196-203)
              try {
                val configId = row.getAs[String]("config_id")
                val configJson = row.getAs[String]("config_json")
                require(configJson != null && configJson.nonEmpty, "missing config_json")
                val sessionId = Option(row.getAs[String]("session_id"))
                  .filter(_.nonEmpty)
                  .getOrElse(java.util.UUID.randomUUID().toString)
                val cfg = ConfigLoader.fromJson(configJson, sessionId)
                val session = new CrawlSession(spark, cfg, corpus, robots, workDir,
                  recordOrder = false, hooks = hooks)
                val result = session.run()
                completedJobs = (configId, result.totalClaimed) :: completedJobs
              } catch {
                case e: Exception =>
                  System.err.println(s"[daemon] skipping bad job ${row}: ${e.getMessage}")
              }
              // refresh per JOB, not per chunk: a single job longer than
              // queueTimeoutMs must not leave lastActivity stale
              lastActivity = System.currentTimeMillis()
            }
          }
        } finally {
          lastActivity = System.currentTimeMillis()
          anyBatchDone = true
          busy = false
        }
      }
    val query =
      (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
    if (!availableNow && queueTimeoutMs > 0) {
      // Z5 wall-clock idle self-termination (--queue-timeout)
      lastActivity = System.currentTimeMillis()
      val started = System.currentTimeMillis()
      val watchdog = new Thread(() => {
        try {
          while (query.isActive) {
            Thread.sleep(math.max(math.min(queueTimeoutMs / 4, 1000L), 10L))
            // before the first completed poll, only an EMPTY queue counts
            // as idle (a pre-enqueued job must be claimed however slow
            // stream init is); afterwards, plain poll-idleness applies.
            // "Empty" mirrors FileStreamSource's listing: only regular
            // files not starting with '.' or '_' are jobs the source will
            // ever process — a stray _SUCCESS/dotfile/subdir must not hold
            // the daemon open forever.
            def queueEmpty: Boolean =
              try {
                val s = java.nio.file.Files.list(java.nio.file.Paths.get(queueDir))
                try !s.anyMatch { p =>
                  val n = p.getFileName.toString
                  !n.startsWith(".") && !n.startsWith("_") &&
                    java.nio.file.Files.isRegularFile(p)
                } finally s.close()
              } catch { case _: java.io.IOException => true }
            // the startup grace is CAPPED: if a job file is enqueued but the
            // stream never completes a batch (checkpoint corruption, source
            // failure), fall back to plain poll-idleness after
            // StartupGraceTimeouts×queueTimeoutMs so Z5 self-termination is
            // never disabled forever
            val graceOver = System.currentTimeMillis() - started >
              JobDaemon.StartupGraceTimeouts * queueTimeoutMs
            if (query.isActive && !busy && (anyBatchDone || queueEmpty || graceOver) &&
                System.currentTimeMillis() - lastActivity > queueTimeoutMs)
              query.stop()
          }
        } catch { case _: InterruptedException => () }
      }, "graft-daemon-idle-watchdog")
      watchdog.setDaemon(true)
      watchdog.start()
    }
    query
  }
}

object JobDaemon {
  /** Startup-grace ceiling for the idle watchdog, in units of
    * `queueTimeoutMs`: with a pre-enqueued job but no completed batch yet,
    * the daemon waits at most this many timeouts for stream initialization
    * before plain poll-idleness applies again (a wedged source must not
    * disable Z5 self-termination forever).
    */
  private[streaming] val StartupGraceTimeouts = 20L
}
