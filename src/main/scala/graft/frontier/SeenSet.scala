package graft.frontier

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.model.FrontierEntry

/** URL-seen filtering (J1) — the rebuild of fess-crawler's ES-backed
  * `EsUrlFilterService`/duplicate-id queue insert (RiverWeb.java:392-398).
  *
  * Source of truth is an EXACT `left_anti` join on `(urlHash, url)` — the
  * full URL participates because xxhash64 collides a handful of times at
  * 10^10 URLs (n²/2^65 ≈ 2.7), and the north rule demands exact seen-set
  * membership. The Bloom filter is ONLY a router (SURVEY.md §7.5.3):
  * `mightContain == false` proves a URL is new and skips the join;
  * `true` falls through to the exact anti-join. A false positive therefore
  * costs a join probe, never a dropped URL.
  *
  * Scale path: below `maxBloomItems` the filter is built with
  * `df.stat.bloomFilter` and broadcast (~1.2 GB at 1e9 items / 3% fpp is
  * the practical ceiling); above it we skip the prefilter and rely on the
  * shuffle hash anti-join (AQE-sized, co-partitioned on urlHash). A
  * per-hash-range partitioned bloom is the documented 10^10 upgrade.
  */
object SeenSet {

  /** Rows of `candidates` whose (urlHash, url) is NOT in `seen`.
    * Both inputs must carry `urlHash: long` and `url: string`.
    *
    * @param seenCount rows in `seen` (caller tracks it; avoids a count job)
    */
  def filterNew(
      candidates: DataFrame,
      seen: DataFrame,
      seenCount: Long,
      maxBloomItems: Long = 50000000L,
      fpp: Double = 0.03,
      prebuiltBloom: Option[BloomFilter] = None): DataFrame = {

    if (seenCount == 0) return candidates

    // Join-strategy pick (guide §3.1): the exact anti-join's default plan
    // is sort-merge — BOTH multi-million-row sides exchanged AND sorted.
    // The seen side builds a fine per-partition hash table instead while
    // seenCount/partition stays modest, and the candidates side then needs
    // only its exchange (whose partitioning the upstream url-dedup groupBy
    // already established — zero extra work on the stream side). Gated
    // ADAPTIVELY on rows per shuffle partition (~60 B/row ⇒ ≤60 MB build
    // per task at the cap), so a 10^10-row seen set on any partition count
    // falls back to sort-merge and its graceful spill.
    val shufflePartitions =
      candidates.sparkSession.sessionState.conf.numShufflePartitions
    def seenSide(df: DataFrame): DataFrame =
      if (seenCount <= ShuffledHashRowsPerPartition * shufflePartitions)
        df.hint("shuffle_hash")
      else df

    // The two bloom branches (definitely-new ∪ maybe-seen⋈seen) each scan
    // `candidates`; routing only pays when that input is materialized
    // (persisted by the caller, or a table scan). Otherwise the recompute
    // costs more than the anti-join saves — fall through to the plain join.
    val materialized =
      candidates.storageLevel.useMemory || candidates.storageLevel.useDisk

    if (materialized && (prebuiltBloom.isDefined || seenCount <= maxBloomItems)) {
      // prebuilt filter (incrementally maintained by the caller — see
      // [[IncrementalSeenBloom]]) skips the O(|seen|) per-round build scan
      val bloom: BloomFilter = prebuiltBloom.getOrElse(
        seen.stat.bloomFilter("urlHash", math.max(seenCount, 1000L), fpp))
      // native codegen probe (Spark's own runtime-row-filtering expression;
      // same sketch serialization) — keeps the route inside whole-stage
      // codegen instead of a ScalaUDF break; the literal rides the task
      // binary, which Spark torrent-broadcasts once per stage
      val bytes = { val bos = new ByteArrayOutputStream(); bloom.writeTo(bos); bos.toByteArray }
      val mightContain = {
        import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
        import org.apache.spark.sql.graftbridge.ColumnBridge
        ColumnBridge.column(BloomFilterMightContain(
          Literal.create(bytes, org.apache.spark.sql.types.BinaryType),
          ColumnBridge.expression(col("urlHash"))))
      }
      val routed = candidates.withColumn("__maybeSeen", mightContain)
      val definitelyNew = routed.filter(!col("__maybeSeen")).drop("__maybeSeen")
      val maybeSeen = routed.filter(col("__maybeSeen")).drop("__maybeSeen")
      definitelyNew.unionByName(
        maybeSeen.join(seenSide(seen.select("urlHash", "url")),
          Seq("urlHash", "url"), "left_anti"))
    } else {
      candidates.join(seenSide(seen.select("urlHash", "url")),
        Seq("urlHash", "url"), "left_anti")
    }
  }

  /** Build-side rows per shuffle partition below which the exact anti-join
    * hints SHUFFLE_HASH instead of sort-merge (the build must fit in task
    * memory — SHJ does not spill its hash table; ~60 B/row ⇒ ~60 MB/task
    * at the cap). Scales with the session's partition count, never a
    * local-mode constant.
    */
  val ShuffledHashRowsPerPartition: Long = 1000000L

  /** The 10^10 upgrade path (SURVEY.md §7.5.3, DESIGN.md): hash-range-
    * partitioned bloom routing. A single broadcast bloom caps at ~1e9 items
    * (~1.2 GB at 3% fpp); beyond that, partition the seen set into
    * `nRanges` ranges by `pmod(urlHash, nRanges)`, build one bloom PER
    * RANGE in parallel (one shuffle of seen hashes), and `cogroup`
    * candidates with their range's bloom — each task deserializes the
    * blooms for its ranges once, never per row, and nothing is broadcast
    * through the driver.
    *
    * Routing contract is identical to [[filterNew]]: `mightContain=false`
    * proves newness (skips the exact join); `true` falls through to the
    * exact `(urlHash, url)` anti-join. A false positive costs a probe,
    * never a URL. When the crawl is in expansion phase (most candidates
    * genuinely new) the exact join shrinks to the fpp + true-dup fraction;
    * in a mature crawl (most candidates already seen) routing cannot help —
    * a bloom can only prove absence — so the caller picks the path per
    * round from the new-URL ratio of the previous round.
    *
    * Candidates must be materialized (persisted) by the caller: the routed
    * set feeds two branches, exactly like [[filterNew]].
    *
    * Returns the filtered entries plus a `release` handle that unpersists
    * the internally cached routed set — the CALLER invokes it after
    * materializing the result (leaving it cached leaks one MEMORY_AND_DISK
    * dataset per crawl round; disk-spilled blocks are not reclaimed by the
    * memory LRU, which starves a long-running daemon).
    */
  def filterNewRangePartitioned(
      candidates: Dataset[FrontierEntry],
      seen: DataFrame,
      seenCount: Long,
      nRanges: Int,
      fpp: Double = 0.03): (Dataset[FrontierEntry], () => Unit) = {
    val spark = candidates.sparkSession
    import spark.implicits._

    def rangeOf(h: Long): Int = (((h % nRanges) + nRanges) % nRanges).toInt
    val perRange = math.max(seenCount / nRanges * 2, 1000L)

    // one bloom per hash range, built where the data lives
    val blooms: Dataset[(Int, Array[Byte])] = seen
      .select(col("urlHash")).as[Long]
      .groupByKey(rangeOf)
      .mapGroups { (r, hashes) =>
        val bf = BloomFilter.create(perRange, fpp)
        hashes.foreach(bf.putLong)
        val out = new ByteArrayOutputStream()
        bf.writeTo(out)
        (r, out.toByteArray)
      }

    // route candidates against their range's bloom (co-grouped shuffle —
    // bloom bytes deserialize once per range per task). Persisted: the
    // routed set feeds both output branches, and without it the cogroup
    // (bloom build shuffle included) would execute twice; the returned
    // release handle unpersists it once the caller has materialized.
    val routed: Dataset[(FrontierEntry, Boolean)] = candidates
      .groupByKey(c => rangeOf(c.urlHash))
      .cogroup(blooms.groupByKey(_._1)) { (_, candIt, bloomIt) =>
        bloomIt.toSeq.headOption match {
          case None => candIt.map(c => (c, false)) // empty range: all new
          case Some((_, bytes)) =>
            val bf = BloomFilter.readFrom(new ByteArrayInputStream(bytes))
            candIt.map(c => (c, bf.mightContainLong(c.urlHash)))
        }
      }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val definitelyNew = routed.filter(!_._2).map(_._1)
    val maybeSeen = routed.filter(_._2).map(_._1)
    val seenNarrow = seen.select("urlHash", "url")
    val seenBuild =
      if (seenCount <= ShuffledHashRowsPerPartition *
          spark.sessionState.conf.numShufflePartitions)
        seenNarrow.hint("shuffle_hash")
      else seenNarrow
    val maybeNew = maybeSeen.toDF()
      .join(seenBuild, Seq("urlHash", "url"), "left_anti")
      .select("url", "urlHash", "host", "depth", "parentUrl")
      .as[FrontierEntry]
    (definitelyNew.union(maybeNew), () => { routed.unpersist(); () })
  }
}

/** Incrementally maintained seen-set Bloom router (the fix for the
  * per-round O(|seen|) `stat.bloomFilter` rebuild — a crawl's cumulative
  * routing cost was quadratic in rounds).
  *
  * The seen table grows by append-only delta segments; this keeps ONE
  * filter of fixed capacity and merges in a per-NEW-SEGMENT bloom at each
  * advance (`mergeInPlace` requires identical sizing, hence the fixed
  * capacity). When the seen count outgrows the capacity the filter is
  * rebuilt at 4× from a full scan — geometric growth, so total rebuild
  * cost over a crawl is O(N), not O(N·rounds). Overflow between rebuilds
  * only degrades fpp (more join probes), never correctness: a bloom OR
  * has no false negatives, and `mightContain=true` falls through to the
  * exact anti-join.
  *
  * The filter is persisted as a sidecar (`$root/bloom.current`) keyed by
  * the covered snapshot version, so a resumed crawl reloads it instead of
  * rescanning the seen table.
  */
final class IncrementalSeenBloom(table: SnapshotTable, fpp: Double = 0.03) {

  private var filter: Option[BloomFilter] = None
  private var capacity: Long = 0L
  private var coveredVersion: Long = -1L
  private var coveredSegments: Set[String] = Set.empty

  private def sidecar = java.nio.file.Paths.get(table.root, "bloom.current")

  /** Bloom covering seen snapshot `v` (with `rows` live rows), advancing the
    * cached filter over only the NEW segments since the last call.
    */
  def forVersion(v: Long, rows: Long): BloomFilter = {
    if (coveredVersion == v && filter.isDefined) return filter.get
    if (filter.isEmpty) loadSidecar()
    val segs = table.segmentsOf(v)
    val canAdvance = filter.isDefined && rows <= capacity &&
      coveredSegments.subsetOf(segs.toSet)
    if (canAdvance) {
      val f = filter.get
      segs.filterNot(coveredSegments).foreach { seg =>
        // skip empty segments (a round can add 0 new URLs):
        // stat.bloomFilter NPEs on zero-row input. Count from the parquet
        // footers — segment entries may be shared-ref absolute dirs whose
        // name is not a version number.
        if (table.segmentRows(seg) > 0L) f.mergeInPlace(segmentBloom(seg))
      }
    } else {
      capacity = math.max(4 * rows, 1L << 16)
      filter = Some(table.readVersion(v).stat.bloomFilter("urlHash", capacity, fpp))
    }
    coveredVersion = v
    coveredSegments = segs.toSet
    saveSidecar()
    filter.get
  }

  private def segmentBloom(seg: String): BloomFilter =
    table.readSegment(seg).stat.bloomFilter("urlHash", capacity, fpp)

  // sidecar layout: version line, capacity line, segment list line, then the
  // serialized filter. Best-effort on both ends — a missing/corrupt sidecar
  // just means one rebuild scan.
  private def saveSidecar(): Unit =
    try {
      val tmp = java.nio.file.Paths.get(table.root, ".bloom.tmp")
      val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
        java.nio.file.Files.newOutputStream(tmp)))
      try {
        out.writeLong(coveredVersion)
        out.writeLong(capacity)
        out.writeUTF(coveredSegments.toSeq.sorted.mkString(","))
        filter.get.writeTo(out)
      } finally out.close()
      java.nio.file.Files.move(tmp, sidecar,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } catch { case _: java.io.IOException => () }

  private def loadSidecar(): Unit =
    try {
      if (!java.nio.file.Files.exists(sidecar)) return
      val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
        java.nio.file.Files.newInputStream(sidecar)))
      try {
        coveredVersion = in.readLong()
        capacity = in.readLong()
        coveredSegments = in.readUTF().split(",").filter(_.nonEmpty).toSet
        filter = Some(BloomFilter.readFrom(in))
      } finally in.close()
    } catch { case _: java.io.IOException =>
      filter = None; coveredVersion = -1L; coveredSegments = Set.empty
    }
}
