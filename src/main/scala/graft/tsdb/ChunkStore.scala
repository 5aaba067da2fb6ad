package graft.tsdb

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Time-chunked sample storage — the reference's chunk lifecycle
  * (src/db.rs:100-110 chunk dirs, :265-303 swap, src/chunk/chunk.rs)
  * mapped to its Spark-native equivalent:
  *
  *  - a chunk = a parquet partition `chunk=<hour-bucket>`; the
  *    reference's range-overlap chunk pruning (db.rs:236
  *    `is_with_range`) becomes Catalyst partition pruning on the
  *    `chunk` directory column — metadata-only, scales to 100 TB;
  *  - "closing" a chunk (reference: compress on swap,
  *    src/chunk/chunk.rs `close`) = rewriting its rows as one Gorilla
  *    payload per series ([[Gorilla.pack]]) plus a per-chunk series
  *    catalog (series_id → labels), mirroring the reference's
  *    per-chunk indexer (src/indexer/sled_indexer.rs mappings 1-3);
  *  - queries federate live ∪ closed chunks and merge per series —
  *    the reference's read path walks the current chunk then the
  *    secondary chunks and merges by label set (db.rs:205-263).
  *
  * Appends are per-chunk parquet writes: on a cluster each micro-batch
  * lands in its hour partition and never rewrites history.
  */
final class ChunkStore(spark: SparkSession, val path: String, chunkMs: Long = 3600000L,
                       filesPerChunkPerAppend: Int = 8,
                       rollupOnClose: Boolean = false) {
  // rollups are hourly; a chunk that does not contain WHOLE hourly
  // buckets (sub-hour or non-divisor chunkMs) would split one bucket
  // across chunk partitions — queryRollup drops the chunk column, so
  // consumers would see multiple conflicting partial rows per
  // (series, bucket). Refuse at construction, not at first read.
  require(!rollupOnClose || (chunkMs >= 3600000L && chunkMs % 3600000L == 0L),
    s"rollupOnClose requires chunkMs to be a whole multiple of one hour " +
      s"(got $chunkMs ms): hourly rollup buckets must not straddle chunks")
  /** Chunk grain in microseconds — public so cadence decisions made
    * OUTSIDE the store (the streaming sink's retire check) can align
    * with the real chunk boundaries instead of assuming 1h. */
  val chunkUs: Long = chunkMs * 1000
  private val livePath = s"$path/live"
  private val closedPath = s"$path/closed"
  private val catalogPath = s"$path/closed_catalog"
  private val retentionPath = s"$path/_retention"
  private val rawRetentionPath = s"$path/_raw_retention"
  private val rollupPath = s"$path/rollup"

  /** Per-(chunk, series) hourly rollup of a raw sample frame — the
    * [[TsOps.downsample]] aggregate shape, keyed by the source chunk
    * so the write partitions align with the store layout. The
    * constructor guarantees chunkMs is a whole multiple of one hour,
    * so every bucket lives entirely inside one chunk and each
    * (series, bucket) emits exactly one row. */
  private def rollup1h(rows: DataFrame): DataFrame = {
    val bucketUs = 3600000000L
    rows
      .groupBy(col("chunk"), col("series_id"),
        (expr(s"ts_us div $bucketUs") * 3600000L).as("bucket_ms"))
      .agg(
        count(lit(1)).as("n_points"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        TsOps.exactSum(col("value"), 2).as("sum_value"),
        // per-bucket first/last sample (the Thanos-downsampling
        // counter aggregates): struct order (ts, event_id, value) is
        // the engine's sample total order, so rate/increase/delta can
        // serve decode-free from rollups — first/last over a union of
        // whole buckets equals the raw window's first/last exactly
        min(struct(col("ts_us"), col("event_id"), col("value"))).as("first_point"),
        max(struct(col("ts_us"), col("event_id"), col("value"))).as("last_point"))
      .withColumn("avg_value", col("sum_value") / col("n_points"))
  }

  /** Matcher + range query over the AT-REST ROLLUPS (closed chunks
    * only): chunk-range partition pruning, matcher resolution against
    * the per-chunk catalog, and no payload decode at all — the serving
    * path for dashboard/alert ranges where per-sample resolution is
    * not needed. Bucket bounds are inclusive of any bucket overlapping
    * [startUs, endUs]. */
  def queryRollup(ms: Seq[Matcher], startUs: Long, endUs: Long): DataFrame = {
    assertNoPendingClosedSwap()
    require(exists(rollupPath),
      s"ChunkStore at $path has no rollups — they are written on chunk close " +
        "when the store is built with rollupOnClose=true; for raw-resolution " +
        "data use queryAll")
    // mixed-generation guard: a store whose chunks were closed BEFORE
    // rollupOnClose was enabled has closed payloads with no rollup
    // partition — serving the range would silently omit that history
    // (the same silent-partial-answer class the MinhashStore parameter
    // stamp exists to prevent). Both id sets are directory listings,
    // never a Spark job, so the check is O(chunks) metadata.
    val missing = closedChunkIds()
      .filter(c => c >= startUs / chunkUs && c <= endUs / chunkUs)
      .diff(rollupChunkIdsListed())
    if (missing.nonEmpty)
      throw new IllegalStateException(
        s"ChunkStore at $path: closed chunks ${missing.toSeq.sorted.mkString(",")} " +
          "in the query range have no rollups (closed before rollupOnClose was " +
          "enabled) — run backfillRollups() once, or query raw via queryAll")
    val inRange = (df: DataFrame) =>
      df.filter(col("chunk") >= startUs / chunkUs && col("chunk") <= endUs / chunkUs)
    val cat = inRange(readChunked(catalogPath))
      .filter(Matcher.all(ms))
      .select("chunk", "series_id")
    inRange(readChunked(rollupPath))
      .join(cat, Seq("chunk", "series_id"), "left_semi")
      .filter(col("bucket_ms") * 1000 >= (startUs / 3600000000L) * 3600000000L &&
        col("bucket_ms") * 1000 <= endUs)
      .drop("chunk")
  }

  /** All store METADATA probes (layout guard, closed-id set, raw-dir
    * cleanup) go through the Hadoop FileSystem of `path`, never
    * java.io.File — a java.io probe silently answers "nothing there"
    * for s3a:///hdfs:// paths, which would disable the guards exactly
    * where the 100 TB framing needs them. */
  private def hfs: org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def exists(p: String): Boolean =
    hfs.exists(new org.apache.hadoop.fs.Path(p))

  private def listNames(dir: String): Seq[String] = {
    val fs = hfs
    val hp = new org.apache.hadoop.fs.Path(dir)
    if (!fs.exists(hp)) Seq.empty
    else fs.listStatus(hp).map(_.getPath.getName).toSeq
  }

  /** Chunk-grain upper bound of stored data — the exclusive end of
    * the newest chunk (live or closed), from directory listings only
    * (never a Spark job). The alerting read side uses it as the
    * default "now" so rule evaluation is DATA-driven, not wall-clock
    * driven (the closeChunksBelow design decision, applied to
    * serving). */
  def dataHorizonUs: Option[Long] = {
    val ids = closedChunkIds() ++ liveChunkIdsListed()
    if (ids.isEmpty) None else Some((ids.max + 1) * chunkUs)
  }

  /** Chunk-partition count across live ∪ closed ∪ rollup-only — a
    * directory listing (the tsdb-status surface). */
  def chunkCount: Long =
    (closedChunkIds() ++ liveChunkIdsListed() ++ rollupChunkIdsListed()).size.toLong

  /** Chunk-grain data bounds in MILLISECONDS (the Prometheus
    * tsdb-status shape): start of the oldest chunk, exclusive end of
    * the newest; (0, 0) when empty. Rollup-only chunks (tiered
    * retention) count — their history still serves. */
  def dataBoundsMs: (Long, Long) = {
    val ids = closedChunkIds() ++ liveChunkIdsListed() ++ rollupChunkIdsListed()
    if (ids.isEmpty) (0L, 0L)
    else (ids.min * chunkUs / 1000, (ids.max + 1) * chunkUs / 1000)
  }

  /** Timestamp of the newest SAMPLE (live or closed) — one bounded
    * Spark job over the newest chunk only. The serving default
    * [[dataHorizonUs]] is chunk-grain: on coarse chunks (e.g. daily)
    * the newest sample can sit hours below the chunk ceiling, so an
    * instant-vector default of horizon + 5m lookback federates an
    * empty page. Endpoints that need "the data's now" use this
    * instead; cost is one chunk's scan (decode only if that chunk is
    * closed), acceptable at request rate. */
  def newestSampleTsUs: Option[Long] = newestTsCache.getOrElse {
    val closedIds = closedChunkIds()
    val liveIds = liveChunkIdsListed()
    val ids = closedIds ++ liveIds
    val v =
      if (ids.isEmpty) None
      else {
        val c = ids.max
        val rows =
          if (liveIds.contains(c) && !closedIds.contains(c))
            live().filter(col("chunk") === c)
          else readClosed(c)
        val m = rows.agg(max(col("ts_us"))).collect()(0)
        if (m.isNullAt(0)) dataHorizonUs else Some(m.getLong(0))
      }
    newestTsCache = Some(v)
    v
  }

  // cached newest-sample answer (review fix: an uncached scan made
  // every ?time=-less serving request pay a newest-chunk decode);
  // every mutating verb that can move the newest sample clears it
  @volatile private var newestTsCache: Option[Option[Long]] = None

  /** Memoized [[catalog]] frame — the label index a resident TSDB keeps
    * hot next to the data. Every remote-read/scrape request re-derived
    * the store-wide distinct (~0.6 s per HTTP request at sf0.1, ×4
    * federation slices per read); one persisted frame per instance
    * serves them all. MUST be dropped on any mutation: beyond staleness,
    * the cached plan pins a live-file listing, so a close/compact that
    * deletes those directories would make a stale handle unreadable.
    * Bench's family-boundary clearCache() only drops the cached DATA —
    * the storageLevel==NONE re-mark on next use repopulates one entry
    * (the attachMediaMemo discipline).
    *
    * SINGLE-WRITER ASSUMPTION (r13; VERDICT r12 #8): the cache is
    * per-INSTANCE, so a mutation through a *second* ChunkStore
    * constructed on the same path is invisible to this instance's
    * cached catalog until this instance itself mutates. Every gated
    * flow honors this — cloneTo/snapshot targets get fresh instances
    * whose first catalog() builds fresh, and no declared path routes
    * writes to one store through two live handles. A multi-writer
    * deployment must key invalidation on a path-scoped epoch instead
    * (compare an epoch file's mtime before serving the memo). */
  @volatile private var catalogCache: Option[DataFrame] = None

  private def invalidateCatalog(): Unit = {
    catalogCache.foreach(df =>
      try df.unpersist(false) catch { case _: Throwable => () })
    catalogCache = None
  }

  /** Live chunk ids from the partition DIRECTORY NAMES (both
    * layouts) — a metadata listing, never a Spark job. */
  private def liveChunkIdsListed(): Set[Long] = {
    val tops = listNames(livePath)
    val chunkDirs =
      if (tops.exists(_.startsWith("batch=")))
        tops.filter(_.startsWith("batch=")).flatMap(b => listNames(s"$livePath/$b"))
      else tops
    chunkDirs.filter(_.startsWith("chunk="))
      .map(_.stripPrefix("chunk=").toLong).toSet
  }

  /** Delete the RAW live directories of the given chunks (both
    * layouts) — the final step of compaction. Invalidates the
    * memoized catalog itself: closeChunksBelow's HEAL branch calls
    * this directly (closeChunks returns early on an empty set and
    * never reaches its own invalidation), and a cached catalog plan
    * pinning the just-deleted live files would fail any later
    * recompute with FileNotFoundException. */
  private def deleteLiveChunkDirs(chunks: Set[Long]): Unit = {
    if (chunks.isEmpty) return
    val fs = hfs
    val names = chunks.map(c => s"chunk=$c")
    val tops = listNames(livePath)
    val targets =
      if (tops.exists(_.startsWith("batch=")))
        tops.filter(_.startsWith("batch=")).flatMap(b => names.map(n => s"$livePath/$b/$n"))
      else names.map(n => s"$livePath/$n").toSeq
    var deleted = false
    targets.foreach { t =>
      val hp = new org.apache.hadoop.fs.Path(t)
      if (fs.exists(hp)) { fs.delete(hp, true); deleted = true }
    }
    if (deleted) invalidateCatalog()
  }

  /** Append samples (from [[Series.samples]]), routed to their chunk.
    * Points with a non-positive timestamp are dropped — the
    * reference's ingest guard (db.rs:183-186 rejects ts=0 and
    * out-of-chunk points). Points addressed to an already-CLOSED
    * chunk are dropped too: rows landing in `live` after their chunk
    * was Gorilla-packed would be invisible to queryAll (which reads
    * the closed payload for those chunk ids) — the reference rejects
    * out-of-chunk appends at ingest for the same reason; streaming
    * callers bound this case with a close lag ≥ their watermark. */
  def append(samples: DataFrame): Unit = {
    assertLayout(batchScoped = false)
    clustered(guardedRouted(samples))
      .write.mode("append").partitionBy("chunk").parquet(livePath)
    newestTsCache = None
    invalidateCatalog()
  }

  /** Direct appends write `live/chunk=…`, streaming batch appends
    * write `live/batch=…/chunk=…` — parquet partition discovery
    * cannot mix directory depths under one root, so the first read
    * after mixing them would fail confusingly. Refuse at write time
    * instead, with a message that names the rule: one ingest mode per
    * store path. */
  private def assertLayout(batchScoped: Boolean): Unit = {
    val tops = listNames(livePath)
    val clash = if (batchScoped) "chunk=" else "batch="
    if (tops.exists(_.startsWith(clash)))
      throw new IllegalStateException(
        s"ChunkStore at $path already has ${clash.dropRight(1)}-rooted live data: " +
          "direct append() and streaming appendBatch() cannot share one store " +
          "(mixed partition-directory depths are unreadable); use one ingest mode per path")
  }

  /** Shared ingest guard + chunk routing (see [[append]] scaladoc).
    * Chunks below the retention horizon are dropped at ingest too: a
    * late append of already-retired history would otherwise resurface
    * in live and linger forever (the retired chunk is no longer in the
    * closed-id set, so only the horizon can exclude it). */
  private def guardedRouted(samples: DataFrame): DataFrame = {
    val closed = closedChunkIds()
    val aboveHorizon = routedAboveHorizon(samples)
    if (closed.isEmpty) aboveHorizon
    else aboveHorizon.filter(!col("chunk").isInCollection(closed))
  }

  /** Chunk routing + the ingest-time horizon guards, WITHOUT the
    * closed-chunk drop — the shared first half of [[guardedRouted]]
    * (normal ingest, which must not write under a packed chunk) and
    * [[backfill]] (which merges into packed chunks deliberately).
    * Both horizons exclude here: fully-retired history AND raw-retired
    * history (a late raw row below the raw horizon would re-close its
    * chunk and clobber the historical rollup with a rollup of just
    * itself). */
  private def routedAboveHorizon(samples: DataFrame): DataFrame = {
    val routed = samples
      .filter(col("ts_us") > 0)
      .withColumn("chunk", expr(s"ts_us div $chunkUs"))
    val horizon = (retainedFrom().toSeq ++ rawRetainedFrom().toSeq)
      .reduceOption((a: Long, b: Long) => math.max(a, b))
    horizon match {
      case Some(limit) => routed.filter(col("chunk") >= limit)
      case None => routed
    }
  }

  /** First retained chunk id (exclusive retention horizon), persisted
    * as one-line store metadata so the guard survives restarts. */
  @volatile private var retentionCache: Option[Option[Long]] = None

  private def retainedFrom(): Option[Long] = retentionCache.getOrElse {
    val v =
      if (!exists(retentionPath)) None
      else {
        val in = hfs.open(new org.apache.hadoop.fs.Path(retentionPath))
        try Some(new String(in.readAllBytes(), "UTF-8").trim.toLong)
        finally in.close()
      }
    retentionCache = Some(v)
    v
  }

  /** First chunk id that still has RAW payloads (exclusive raw-tier
    * retention horizon — [[retireRaw]]); same one-line persistence. */
  @volatile private var rawRetentionCache: Option[Option[Long]] = None

  private def rawRetainedFrom(): Option[Long] = rawRetentionCache.getOrElse {
    val v =
      if (!exists(rawRetentionPath)) None
      else {
        val in = hfs.open(new org.apache.hadoop.fs.Path(rawRetentionPath))
        try Some(new String(in.readAllBytes(), "UTF-8").trim.toLong)
        finally in.close()
      }
    rawRetentionCache = Some(v)
    v
  }

  /** Closed-tier reads refuse while an interrupted delete/restore
    * swap is pending — partitions may be mid-move; re-running the
    * interrupted verb heals (the live-tier `_compact_pending` rule,
    * applied to the closed tier). */
  private def assertNoPendingClosedSwap(): Unit = {
    require(!exists(s"$path/$DeletePendingMarker"),
      s"ChunkStore at $path: a series deletion was interrupted mid-swap — " +
        "re-run deleteSeries (any arguments) or touch the store with the same " +
        "verb to heal before reading the closed tier")
    require(!exists(s"$path/$RestorePendingMarker"),
      s"ChunkStore at $path: a snapshot restore was interrupted mid-swap — " +
        "re-run restoreSnapshot to heal before reading the closed tier")
  }

  /** Raw ranges below this refuse with a pointer to the rollup tier. */
  private def assertRawServable(startUs: Long): Unit =
    rawRetainedFrom().foreach { limit =>
      if (startUs / chunkUs < limit)
        throw new IllegalStateException(
          s"ChunkStore at $path: raw payloads before chunk $limit " +
            s"(ts < ${limit * chunkUs}us) were retired to the rollup tier (retireRaw) — " +
            "serve that range with queryRollup, or start the raw query at or after the horizon")
    }

  /** Retention enforcement — drop ALL data in chunks that end strictly
    * below `beforeUs` (Prometheus-style retention.time; a store that
    * only grows is not deployable at 100 TB/day). Deletion is
    * per-chunk PARTITION-DIRECTORY removal — a metadata operation,
    * never a data rewrite: the chunk is the retention grain by design,
    * the same property that makes pruning free. Closed chunks drop
    * payload + catalog partitions; raw live dirs below the horizon
    * drop too. The horizon persists (`_retention`, monotone max) so
    * the ingest guard keeps retired history out across restarts.
    * Returns the retired chunk ids. */
  def retire(beforeUs: Long): Set[Long] = {
    val limit = beforeUs / chunkUs // chunks < limit end at or below beforeUs
    val newLimit = retainedFrom().fold(limit)(math.max(_, limit))
    val fs = hfs
    val out = fs.create(new org.apache.hadoop.fs.Path(retentionPath), true)
    try out.write(newLimit.toString.getBytes("UTF-8")) finally out.close()
    retentionCache = Some(Some(newLimit))
    // raw-retired chunks are absent from the closed-id set but still
    // hold catalog/rollup partitions — full retirement must drop those
    // too, so the id set unions the rollup-tier listing
    val closedBelow = (closedChunkIds() ++ rollupChunkIdsListed()).filter(_ < newLimit)
    closedBelow.foreach { c =>
      Seq(s"$closedPath/chunk=$c", s"$catalogPath/chunk=$c",
        s"$rollupPath/chunk=$c").foreach { p =>
        val hp = new org.apache.hadoop.fs.Path(p)
        if (fs.exists(hp)) fs.delete(hp, true)
      }
    }
    val liveBelow = liveChunkIdsListed().filter(_ < newLimit)
    deleteLiveChunkDirs(liveBelow)
    // roots left without any chunk partition are removed entirely: an
    // empty parquet root fails schema inference on the next read, and
    // a fully-retired store must read like a fresh one
    listNames(livePath).filter(_.startsWith("batch=")).foreach { b =>
      if (!listNames(s"$livePath/$b").exists(_.startsWith("chunk=")))
        fs.delete(new org.apache.hadoop.fs.Path(s"$livePath/$b"), true)
    }
    Seq(closedPath, catalogPath, rollupPath, livePath).foreach { dir =>
      if (exists(dir) && !listNames(dir).exists(n =>
        n.startsWith("chunk=") || n.startsWith("batch=")))
        fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    }
    closedIdsCache = None // retired ids must leave the ingest guard
    newestTsCache = None
    invalidateCatalog()
    closedBelow ++ liveBelow
  }

  /** TIERED retention (the Thanos/Prometheus long-retention model —
    * raw for days, downsampled for years): drop the RAW Gorilla
    * payloads of closed chunks ending strictly below `beforeUs` while
    * KEEPING their catalog and hourly rollups, so [[queryRollup]] and
    * the metadata APIs keep serving the whole history at 1/360th the
    * bytes. Raw reads ([[queryAll]]/[[queryClosed]]) that dip below
    * the horizon refuse LOUDLY with a pointer to the rollup tier —
    * the payload dirs are gone, and silently-empty would read as
    * no-data. Appends below the horizon drop at ingest (a late raw
    * row would re-close the chunk and clobber the historical rollup
    * with a rollup of just itself). Refuses when the range covers
    * live chunks (close first) or chunks without rollups (backfill
    * first) — dropping raw without a rollup would be data LOSS, not
    * tiering. Horizon persists (`_raw_retention`, monotone max).
    * Returns the raw-retired chunk ids. */
  def retireRaw(beforeUs: Long): Set[Long] = {
    require(rollupOnClose || exists(rollupPath),
      "retireRaw needs the rollup tier — build the store with rollupOnClose=true " +
        "(or backfillRollups) so the history stays servable")
    val limit = beforeUs / chunkUs
    val newLimit = rawRetainedFrom().fold(limit)(math.max(_, limit))
    val closedIds = closedChunkIds()
    val liveBelow = liveChunkIdsListed().diff(closedIds).filter(_ < newLimit)
    if (liveBelow.nonEmpty)
      throw new IllegalStateException(
        s"retireRaw range covers live (not yet closed) chunks " +
          s"${liveBelow.toSeq.sorted.mkString(",")} — close them first (closeChunksBelow)")
    val closedBelow = closedIds.filter(_ < newLimit)
    val noRollup = closedBelow.diff(rollupChunkIdsListed())
    if (noRollup.nonEmpty)
      throw new IllegalStateException(
        s"retireRaw would DROP chunks ${noRollup.toSeq.sorted.mkString(",")} outright — " +
          "they have no rollups (closed before rollupOnClose); run backfillRollups() first")
    val fs = hfs
    val out = fs.create(new org.apache.hadoop.fs.Path(rawRetentionPath), true)
    try out.write(newLimit.toString.getBytes("UTF-8")) finally out.close()
    rawRetentionCache = Some(Some(newLimit))
    closedBelow.foreach { c =>
      val hp = new org.apache.hadoop.fs.Path(s"$closedPath/chunk=$c")
      if (fs.exists(hp)) fs.delete(hp, true)
    }
    if (exists(closedPath) && !listNames(closedPath).exists(_.startsWith("chunk=")))
      fs.delete(new org.apache.hadoop.fs.Path(closedPath), true)
    closedIdsCache = None
    newestTsCache = None
    invalidateCatalog()
    closedBelow
  }

  /** Idempotent per-micro-batch append for streaming sinks: batch
    * `batchId`'s rows land under `live/batch=<id>/chunk=…` with
    * OVERWRITE scoped to the batch directory. foreachBatch is
    * at-least-once — after a crash between sink commit and offset
    * commit, Structured Streaming REPLAYS the batch (same batchId,
    * same rows for a deterministic source); the overwrite rewrites the
    * identical directory instead of double-appending, which is what
    * makes the checkpoint the WAL: replay converges to exactly-once.
    * One streaming query (one checkpoint) per store path — a fresh
    * checkpoint restarts batch ids at 0 and would overwrite history. */
  def appendBatch(samples: DataFrame, batchId: Long): Unit = {
    assertLayout(batchScoped = true)
    // persisted: the emptiness probe and the write share one
    // evaluation of the batch's upstream (which may include e.g. the
    // remote-write proto decode) instead of running it twice
    val guarded = guardedRouted(samples).persist()
    try {
      // watermark-only triggers deliver EMPTY micro-batches; writing
      // one would create a file-less batch directory, and if it is the
      // store's FIRST it breaks schema inference for every later read
      if (!guarded.isEmpty)
        clustered(guarded)
          .write.mode("overwrite").partitionBy("chunk")
          .parquet(s"$livePath/batch=$batchId")
    } finally guarded.unpersist(blocking = false)
    newestTsCache = None
    invalidateCatalog()
  }

  /** Cluster on (chunk, salt-of-series) before a partitioned write:
    * `chunk` alone is a low-cardinality hash key that collapses a
    * day's ingest into ONE task per chunk (the write-path scale
    * killer at 100 TB/day); the salt spreads each chunk over up to
    * `filesPerChunkPerAppend` tasks while keeping the small-files
    * discipline (≤ salts files per chunk per append, never
    * tasks × chunks). Explicit numPartitions pins the exchange so
    * AQE can't coalesce a small batch back into one write task. */
  private def clustered(df: DataFrame): DataFrame =
    df.repartition(spark.sparkContext.defaultParallelism, col("chunk"),
      pmod(hash(col("series_id")), lit(filesPerChunkPerAppend)))

  /** Partition-directory columns come back as the narrowest inferred
    * type — normalize `chunk` to long so range/set predicates match. */
  private def readChunked(p: String): DataFrame =
    spark.read.parquet(p).withColumn("chunk", col("chunk").cast("long"))

  /** Live rows. Under the streaming layout rows sit in
    * `batch=<id>/chunk=<id>` partitions; the batch id is a sink
    * bookkeeping column, dropped here so both layouts query alike
    * (chunk stays a partition column either way — pruning holds). */
  def live(): DataFrame = {
    require(!exists(s"$path/_compact_pending"),
      s"ChunkStore at $path: a live compaction was interrupted mid-swap — " +
        "chunk directories may be missing rows; run compactLive() again to heal")
    require(!exists(s"$path/_batch_compact_pending"),
      s"ChunkStore at $path: a batch compaction was interrupted mid-swap — " +
        "batch directories may be missing rows; run compactBatches() again to heal")
    readChunked(livePath).drop("batch")
  }

  /** Compact the LIVE tier: every append leaves up to
    * `filesPerChunkPerAppend` files per chunk, so at daily-ingest
    * cadence a not-yet-closed chunk accumulates appends × that many
    * small parquet files — the classic ingest tax. This rewrites each
    * live chunk directory down to ONE append's worth of files (the
    * same `clustered` salt discipline, so write parallelism per chunk
    * is preserved), leaving query results unchanged. Direct-append
    * layout only: the streaming layout's batch=<id> scoping IS the
    * checkpoint's replay idempotence (a replayed batch overwrites its
    * own directory), so merging those directories would turn an
    * at-least-once replay into duplicated rows — streaming stores
    * compact via the close path instead, which Gorilla-packs whole
    * chunks out of the live tier. The staged-swap protocol mirrors
    * IvfStore.rebuild: reads refuse while `_compact_pending` exists
    * (a crash mid-swap can leave a chunk directory mid-rename), and
    * re-running compactLive() first completes the interrupted swap
    * from the intact staging copy. */
  def compactLive(): Unit = {
    assertLayout(batchScoped = false)
    val staging = s"$path/live_compact"
    val marker = new org.apache.hadoop.fs.Path(path, "_compact_pending")
    val fs = hfs
    if (fs.exists(marker)) { completeCompactSwap(fs, staging, marker); return }
    if (liveChunkIdsListed().isEmpty) return
    fs.delete(new org.apache.hadoop.fs.Path(staging), true)
    clustered(live())
      .write.mode("overwrite").partitionBy("chunk").parquet(staging)
    fs.create(marker, true).close()
    completeCompactSwap(fs, staging, marker)
  }

  /** Idempotent-resumable second half of [[compactLive]]: swap every
    * staged chunk directory into the live tier, then clear staging and
    * the marker. Safe to re-run from any crash point — a staged dir
    * still present means its swap has not completed (the compacted
    * copy and the original hold identical rows, so completing is
    * always correct). */
  private def completeCompactSwap(fs: org.apache.hadoop.fs.FileSystem,
                                  staging: String,
                                  marker: org.apache.hadoop.fs.Path): Unit = {
    listNames(staging).filter(_.startsWith("chunk=")).foreach { d =>
      val liveDir = new org.apache.hadoop.fs.Path(s"$livePath/$d")
      fs.delete(liveDir, true)
      if (!fs.rename(new org.apache.hadoop.fs.Path(s"$staging/$d"), liveDir))
        throw new java.io.IOException(s"compact swap failed for $d")
    }
    fs.delete(new org.apache.hadoop.fs.Path(staging), true)
    fs.delete(marker, false)
    invalidateCatalog() // live directories were just swapped out
  }

  /** Compact the STREAMING live tier: merge every `batch=<id>`
    * directory with id strictly below `upToBatchId` — including the
    * output of earlier compactions, which carry NEGATIVE ids — into
    * one consolidated `batch=-<upToBatchId>` directory (≤ salts files
    * per chunk, the same `clustered` write discipline as an append).
    *
    * Why this is replay-safe where a blanket merge is not: foreachBatch
    * is at-least-once, but Structured Streaming runs batch N only after
    * batch N-1's offsets committed — the ONLY batch that can ever
    * replay is the current one. Merging strictly-below-current batch
    * directories therefore never collides with a replayed overwrite,
    * and the negative target id can never be issued to a real batch.
    * A replayed batch that re-triggers the same horizon finds a single
    * mergeable directory and no-ops.
    *
    * Crash protocol (the IvfStore/compactLive staged-swap family): the
    * consolidated copy is fully written to staging first; the
    * `_batch_compact_pending` marker records the source directories +
    * target name; reads refuse while the marker exists; re-running
    * completes the interrupted swap (delete remaining sources, rename
    * staging to target) from the intact staging copy. */
  def compactBatches(upToBatchId: Long): Unit = {
    assertLayout(batchScoped = true)
    val fs = hfs
    val staging = s"$path/batch_compact"
    val marker = new org.apache.hadoop.fs.Path(path, "_batch_compact_pending")
    if (fs.exists(marker)) { completeBatchCompactSwap(fs, staging, marker); return }
    val sources = listNames(livePath).filter(_.startsWith("batch="))
      .filter(_.stripPrefix("batch=").toLong < upToBatchId).sorted
    if (sources.size <= 1) return // nothing to merge (or already compacted)
    fs.delete(new org.apache.hadoop.fs.Path(staging), true)
    val rows = spark.read.option("basePath", livePath)
      .parquet(sources.map(s => s"$livePath/$s"): _*)
      .withColumn("chunk", col("chunk").cast("long"))
      .drop("batch")
    clustered(rows).write.mode("overwrite").partitionBy("chunk").parquet(staging)
    val target = s"batch=-$upToBatchId"
    val out = fs.create(marker, true)
    try out.write((target +: sources).mkString("\n").getBytes("UTF-8"))
    finally out.close()
    completeBatchCompactSwap(fs, staging, marker)
  }

  /** Idempotent-resumable second half of [[compactBatches]]: the
    * marker's first line is the target directory, the rest are the
    * merged sources. Delete any source still present, swap staging
    * into the target if it has not landed yet, clear the marker. Safe
    * from any crash point — staging and the sources hold identical
    * rows, so whichever copy survives is complete. */
  private def completeBatchCompactSwap(fs: org.apache.hadoop.fs.FileSystem,
                                       staging: String,
                                       marker: org.apache.hadoop.fs.Path): Unit = {
    val lines = {
      val in = fs.open(marker)
      try new String(in.readAllBytes(), "UTF-8").split("\n").toSeq
      finally in.close()
    }
    val (target, sources) = (lines.head, lines.tail)
    sources.foreach { s =>
      val hp = new org.apache.hadoop.fs.Path(s"$livePath/$s")
      if (fs.exists(hp)) fs.delete(hp, true)
    }
    val stagingPath = new org.apache.hadoop.fs.Path(staging)
    if (fs.exists(stagingPath)) {
      val targetPath = new org.apache.hadoop.fs.Path(s"$livePath/$target")
      fs.delete(targetPath, true) // a half-renamed target re-swaps whole
      if (!fs.rename(stagingPath, targetPath))
        throw new java.io.IOException(s"batch-compact swap failed for $target")
    }
    fs.delete(marker, false)
    invalidateCatalog() // live directories were just swapped out
  }

  /** Store-wide series catalog (series_id → label set): live rows'
    * labels ∪ the closed chunks' per-chunk catalogs — the reference
    * indexer's id→labels mapping across both tiers. */
  def catalog(): DataFrame = catalogCache match {
    case Some(df) =>
      if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df
    case None =>
      val df = buildCatalog()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      catalogCache = Some(df)
      df
  }

  private def buildCatalog(): DataFrame = {
    val liveCat =
      if (liveChunkIdsListed().isEmpty) None // fully compacted: no raw files left
      else Some(live().select("series_id", "event_type", "user_id"))
    val closedCat =
      if (!exists(catalogPath)) None
      else Some(readChunked(catalogPath).select("series_id", "event_type", "user_id"))
    (liveCat, closedCat) match {
      case (Some(a), Some(b)) => a.unionByName(b).distinct()
      case (Some(a), None) => a.distinct()
      case (None, Some(b)) => b.distinct()
      case _ => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("series_id", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType))))
    }
  }

  /** The catalog restricted to series with data in chunks overlapping
    * [startUs, endUs] — the Prometheus series/labels metadata APIs'
    * time bound. Both tiers are chunk-partitioned, so the bound is
    * partition pruning on each side; chunk grain is the resolution
    * (a series is "active" if its CHUNK overlaps, as in Prometheus's
    * block-grain series listing). */
  def catalogInRange(startUs: Long, endUs: Long): DataFrame = {
    val lo = startUs / chunkUs
    val hi = endUs / chunkUs
    val inRange = (df: DataFrame) => df.filter(col("chunk") >= lo && col("chunk") <= hi)
    val liveCat =
      if (liveChunkIdsListed().isEmpty) None
      else Some(inRange(live()).select("series_id", "event_type", "user_id"))
    val closedCat =
      if (!exists(catalogPath)) None
      else Some(inRange(readChunked(catalogPath)).select("series_id", "event_type", "user_id"))
    (liveCat, closedCat) match {
      case (Some(a), Some(b)) => a.unionByName(b).distinct()
      case (Some(a), None) => a.distinct()
      case (None, Some(b)) => b.distinct()
      case _ => catalog().limit(0)
    }
  }

  private def hasClosed: Boolean = exists(closedPath)

  /** Closed-chunk id set, from the partition DIRECTORY NAMES (a
    * single metadata listing — never a parquet scan) and cached on
    * the instance: the ingest guard consults it on every append, and
    * a streaming sink appends continuously. Invalidated by
    * closeChunks; one writer per store path (the streaming sink's
    * contract already), so external closers aren't a concern. */
  @volatile private var closedIdsCache: Option[Set[Long]] = None

  private def closedChunkIds(): Set[Long] = closedIdsCache.getOrElse {
    val ids = listNames(closedPath)
      .filter(_.startsWith("chunk="))
      .map(_.stripPrefix("chunk=").toLong).toSet
    closedIdsCache = Some(ids)
    ids
  }

  /** Matcher + range query over live chunks only. The chunk bounds
    * filter is on the partition column → partition pruning (the
    * reference's `is_with_range` scan skip); the ts filter pushes
    * into parquet. */
  def query(ms: Seq[Matcher], startUs: Long, endUs: Long): DataFrame =
    TsOps.rangeQuery(
      live().filter(col("chunk") >= startUs / chunkUs && col("chunk") <= endUs / chunkUs),
      ms, startUs, endUs)

  /** Close one chunk: Gorilla-pack its series into the closed store
    * and record the chunk's series catalog (id → labels) so closed
    * chunks remain label-queryable without the raw rows. */
  def closeChunk(chunk: Long): Unit = closeChunks(Seq(chunk))

  /** Close a SET of chunks in two partitioned jobs (pack + catalog),
    * not a per-chunk driver loop — a background swap that has fallen
    * behind (or a bench building history) closes a day in one pass.
    * `partitionOverwriteMode=dynamic` scopes the overwrite to exactly
    * the chunk partitions being (re)closed: idempotent re-close,
    * never wiping previously closed chunks (a static-mode root
    * overwrite+partitionBy would). */
  def closeChunks(chunks: Seq[Long]): Unit = {
    if (chunks.isEmpty) return
    val rows = live().filter(col("chunk").isInCollection(chunks))
    // CATALOG first, payload second: the closed-id set (and queryAll's
    // live-branch exclusion) keys on the PAYLOAD directories, so a
    // crash between the two writes leaves a catalog without payloads —
    // harmless (the semi-join finds no payload rows, the raw rows
    // still serve from live) and self-healing (the chunk is still a
    // close candidate and the dynamic overwrite rewrites both).
    // Payload-first would instead hide the raw rows while the catalog
    // needed to read the payloads is missing.
    rows.select("chunk", "series_id", "event_type", "user_id").distinct()
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("chunk").parquet(catalogPath)
    // rollups at rest (Prometheus recording rules / Thanos
    // downsampling): each closing chunk also writes its per-series
    // hourly min/max/count/exact-sum — dashboards and alert ranges
    // then serve from ~1 row per series-hour WITHOUT a Gorilla decode.
    // OPT-IN (rollupOnClose), like recording rules themselves: the
    // extra write job per close is the trade for decode-free range
    // serving. Written before the payload for the same crash reason
    // as the catalog: a rollup without its payload is unreachable
    // garbage that the self-healing re-close rewrites.
    if (rollupOnClose)
      rollup1h(rows)
        .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        .partitionBy("chunk").parquet(rollupPath)
    Gorilla.packWithChunk(rows)
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("chunk").parquet(closedPath)
    closedIdsCache = None // the guard must see the newly closed ids
    invalidateCatalog() // the cached plan pins the pre-close live files
    // compaction COMPLETES by dropping the raw rows: without this the
    // store keeps raw + compressed copies of all history forever. A
    // crash before the delete only wastes space (closed ids exclude
    // the raw rows from every query); closeChunksBelow heals it.
    deleteLiveChunkDirs(chunks.toSet)
  }

  /** Close every live chunk that ends strictly below `tsUs` and is not
    * yet closed — the reference's background chunk swap (db.rs:265-303)
    * driven by data progress. Chunk ids are bounded (one per elapsed
    * hour), so the driver-side id list is fine at any data scale. */
  def closeChunksBelow(tsUs: Long): Unit = {
    val limit = tsUs / chunkUs // chunks < limit are entirely below tsUs
    val already = closedChunkIds()
    val liveIds = liveChunkIdsListed()
    // heal: raw dirs of chunks that finished closing but crashed
    // before their cleanup (their rows are query-invisible already)
    deleteLiveChunkDirs(liveIds.intersect(already))
    closeChunks(liveIds.filter(_ < limit).diff(already).toSeq.sorted)
  }

  /** Rollup partition ids from the directory names — a metadata
    * listing, never a Spark job (same idiom as liveChunkIdsListed). */
  private def rollupChunkIdsListed(): Set[Long] =
    listNames(rollupPath).filter(_.startsWith("chunk="))
      .map(_.stripPrefix("chunk=").toLong).toSet

  /** Write the missing rollup partitions for chunks that were closed
    * before rollupOnClose was enabled: decode only those payloads,
    * re-derive the chunk id from the timestamp (routing used the same
    * division), and dynamic-overwrite per chunk partition — idempotent
    * like closeChunks, so a crash mid-backfill just re-runs. */
  def backfillRollups(): Unit = {
    val missing = closedChunkIds().diff(rollupChunkIdsListed())
    if (missing.isEmpty) return
    val payloads = readChunked(closedPath)
      .filter(col("chunk").isInCollection(missing))
    rollup1h(Gorilla.unpack(payloads)
      .withColumn("chunk", expr(s"ts_us div $chunkUs")))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("chunk").parquet(rollupPath)
  }

  /** Read a closed chunk back as samples (decode + explode). */
  def readClosed(chunk: Long): DataFrame =
    Gorilla.unpack(spark.read.parquet(closedPath).filter(col("chunk") === chunk))

  // ─────────────────── snapshots (admin backup verb) ───────────────────

  private def snapshotsRoot = s"$path/snapshots"
  private val SnapTiers = Seq("closed", "closed_catalog", "rollup")

  /** Parallel tree copy for the snapshot/restore verbs. The closed
    * tier at production scale is the BULK of the store, and a
    * sequential driver loop of FileUtil.copy is days of
    * single-threaded byte shoveling at 100 TB — Prometheus snapshots
    * hardlink blocks precisely to avoid the copy entirely. So:
    * every file under every (src, dst) pair becomes one task on a
    * bounded pool (copy wall time scales with cores / FS parallelism,
    * not chunk count), and on a local filesystem each task HARDLINKS
    * instead of copying (the closed tier is immutable parquet and all
    * mutation verbs swap whole files, so shared inodes are safe — the
    * Prometheus block-snapshot trick; falls back to a byte copy if the
    * link fails, e.g. cross-device). Directories materialize even when
    * empty so the staged-swap renames stay checked. Failures propagate
    * — a half-copied staging dir is invisible by construction (dot-temp
    * / staging, renamed only after success). */
  private def copyTreesParallel(fs: org.apache.hadoop.fs.FileSystem,
                                pairs: Seq[(org.apache.hadoop.fs.Path, org.apache.hadoop.fs.Path)],
                                conf: org.apache.hadoop.conf.Configuration): Unit = {
    import org.apache.hadoop.fs.Path
    val local = fs.getScheme == "file"
    val tasks = Seq.newBuilder[(Path, Path)]
    val dirs = scala.collection.mutable.LinkedHashSet.empty[Path]
    pairs.foreach { case (src0, dst) =>
      if (local) {
        // java.nio end to end on the local scheme: Hadoop's local
        // FileStatus loads permissions through heavyweight calls, and
        // one per file turned the enumeration itself into the
        // bottleneck (measured: the walk, not the copy, owned the wall)
        val sp = java.nio.file.Paths.get(src0.toUri.getPath match {
          case "" => src0.toString; case p => p })
        if (java.nio.file.Files.isRegularFile(sp)) {
          dirs += dst.getParent; tasks += ((src0, dst))
        } else if (java.nio.file.Files.isDirectory(sp)) {
          dirs += dst // materialize even when empty: staged-swap renames stay checked
          val walk = java.nio.file.Files.walk(sp)
          try walk.forEach { p =>
            if (java.nio.file.Files.isRegularFile(p)) {
              val rel = sp.relativize(p).toString
              // Hadoop's checksum shadow files (".name.crc") regenerate
              // on write and never existed for hardlinked data; skip
              // exactly that pattern — a blanket dot-file skip would
              // silently drop any legitimate dot-file from snapshots
              // while the remote-FS branch copies it (ADVICE r11)
              val fn = p.getFileName.toString
              if (!(fn.startsWith(".") && fn.endsWith(".crc"))) {
                val d = new Path(dst, rel)
                dirs += d.getParent
                tasks += ((new Path(p.toUri), d))
              }
            }
          } finally walk.close()
        }
      } else {
        // remote FS: one getFileStatus doubles as the existence check
        val stOpt = try Some(fs.getFileStatus(src0)) catch {
          case _: java.io.FileNotFoundException => None
        }
        stOpt.foreach { st0 =>
          if (st0.isFile) { dirs += dst.getParent; tasks += ((fs.makeQualified(src0), dst)) }
          else {
            val src = fs.makeQualified(src0)
            dirs += dst
            val it = fs.listFiles(src, true)
            while (it.hasNext) {
              val f = it.next()
              val rel = src.toUri.relativize(f.getPath.toUri).getPath
              val d = new Path(dst, rel)
              dirs += d.getParent
              tasks += ((f.getPath, d))
            }
          }
        }
      }
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(16, Runtime.getRuntime.availableProcessors())))
    try {
      // directory creation first, deduped and parallel: Hadoop's local
      // mkdirs is a heavyweight call (permission handling), and one
      // sequential mkdirs per chunk partition was the measured
      // bottleneck — java.nio createDirectories on the local scheme is
      // a plain syscall
      val dirFts = dirs.toSeq.filter(_ != null).map { d =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit =
            if (local)
              java.nio.file.Files.createDirectories(
                java.nio.file.Paths.get(d.toUri.getPath))
            else fs.mkdirs(d)
        })
      }
      dirFts.foreach(_.get())
      val fts = tasks.result().map { case (s, d) =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = {
            val linked = local && {
              try {
                java.nio.file.Files.createLink(
                  java.nio.file.Paths.get(d.toUri.getPath),
                  java.nio.file.Paths.get(s.toUri.getPath))
                true
              } catch { case _: Exception => false }
            }
            if (!linked)
              org.apache.hadoop.fs.FileUtil.copy(fs, s, fs, d, false, conf)
          }
        })
      }
      fts.foreach(_.get()) // propagate the first failure
    } finally pool.shutdown()
  }

  /** Point-in-time SNAPSHOT of the closed tier (Prometheus's
    * `POST /api/v1/admin/tsdb/snapshot`, the backup half of the admin
    * family deleteSeries opened): the closed-chunk id set is pinned
    * FIRST, then exactly those partition directories of
    * closed/catalog/rollup copy into `snapshots/<name>/` (staged under
    * a dot-temp dir, renamed into place — a crashed snapshot leaves
    * only an ignorable temp, never a half-visible name). The closed
    * tier is immutable parquet, so the copy is pure file I/O — no
    * decode, no Spark job; chunks closed AFTER the pin are simply not
    * part of this snapshot. A snapshot directory is itself a valid
    * closed-only store rooted at `snapshots/<name>` ([[openSnapshot]]),
    * and [[restoreSnapshot]] swaps it back wholesale. Returns the
    * snapshot name. */
  /** Clone this store's ENTIRE tree to `destPath` and open a store
    * there — the staging/dev-store verb: a full-fidelity copy at
    * metadata cost on the local scheme (hardlinks — every tier's
    * files are immutable once written and every mutation verb
    * REPLACES files via staged swap rather than editing in place, so
    * links are as safe here as in the snapshot copy; byte-copy on
    * remote schemes). Covers live + closed + catalog + rollup +
    * retention metadata; `snapshots/` stays behind (a clone is a
    * working copy, not a backup of backups). Refuses mid-swap trees —
    * a clone of a half-swapped store would freeze the corruption. */
  def cloneTo(destPath: String): ChunkStore = {
    assertNoPendingClosedSwap()
    require(!exists(s"$path/_compact_pending") && !exists(s"$path/_batch_compact_pending"),
      s"ChunkStore at $path: a compaction was interrupted mid-swap — heal before cloning")
    val fs = hfs
    val dest = new org.apache.hadoop.fs.Path(destPath)
    require(!fs.exists(dest) || fs.listStatus(dest).isEmpty,
      s"cloneTo destination $destPath is not empty")
    val children = listNames(path).filterNot(_ == "snapshots")
    copyTreesParallel(fs,
      children.map(c => (new org.apache.hadoop.fs.Path(s"$path/$c"),
        new org.apache.hadoop.fs.Path(s"$destPath/$c"))),
      spark.sparkContext.hadoopConfiguration)
    new ChunkStore(spark, destPath, chunkMs, filesPerChunkPerAppend, rollupOnClose)
  }

  def snapshot(name: Option[String] = None): String = {
    // union with the rollup listing: a tiered store's raw-retired
    // chunks live only as catalog+rollup partitions, and a backup
    // that silently dropped them would lose the long-retention tier
    val ids = closedChunkIds() ++ rollupChunkIdsListed()
    require(ids.nonEmpty,
      "nothing closed to snapshot — the snapshot verb covers the closed tier; run closeChunksBelow first")
    val snapName = name.getOrElse {
      val t = java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmssX")
        .withZone(java.time.ZoneOffset.UTC).format(java.time.Instant.now())
      s"$t-${java.util.UUID.randomUUID().toString.take(8)}"
    }
    require(snapName.matches("[A-Za-z0-9._-]+"),
      s"snapshot name '$snapName' — use only [A-Za-z0-9._-]")
    val fs = hfs
    val dest = new org.apache.hadoop.fs.Path(s"$snapshotsRoot/$snapName")
    require(!fs.exists(dest), s"snapshot $snapName already exists")
    val tmp = new org.apache.hadoop.fs.Path(s"$snapshotsRoot/.tmp-$snapName")
    fs.delete(tmp, true)
    val conf = spark.sparkContext.hadoopConfiguration
    copyTreesParallel(fs,
      (for (tier <- SnapTiers; c <- ids.toSeq) yield
        (new org.apache.hadoop.fs.Path(s"$path/$tier/chunk=$c"),
          new org.apache.hadoop.fs.Path(s"$tmp/$tier/chunk=$c"))) ++
        (for ((rp, nm) <- Seq(retentionPath -> "_retention", rawRetentionPath -> "_raw_retention"))
          yield (new org.apache.hadoop.fs.Path(rp),
            new org.apache.hadoop.fs.Path(s"$tmp/$nm"))),
      conf)
    val manifest =
      s"""{"name":"$snapName","chunks":[${ids.toSeq.sorted.mkString(",")}],""" +
        s""""chunk_ms":$chunkMs,"created_ms":${System.currentTimeMillis()}}"""
    val out = fs.create(new org.apache.hadoop.fs.Path(tmp, "manifest.json"), true)
    try out.write(manifest.getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp, dest))
      throw new java.io.IOException(s"snapshot rename failed for $snapName")
    snapName
  }

  /** Snapshot names present under this store, sorted. */
  def listSnapshots(): Seq[String] =
    listNames(snapshotsRoot).filterNot(_.startsWith(".")).sorted

  /** Open a snapshot as a READ-ONLY closed-only store (same chunk
    * grain; rollup serving iff the snapshot carries rollups). */
  def openSnapshot(name: String): ChunkStore = {
    require(exists(s"$snapshotsRoot/$name"), s"no snapshot named $name under $snapshotsRoot")
    new ChunkStore(spark, s"$snapshotsRoot/$name", chunkMs = chunkUs / 1000,
      rollupOnClose = rollupOnClose)
  }

  /** Restore the closed tier WHOLESALE from a snapshot: every closed/
    * catalog/rollup partition currently in the store is replaced by
    * the snapshot's set (chunks closed after the snapshot are dropped —
    * that is what restoring a backup means; live raw chunks are left
    * untouched). Same staged discipline as [[deleteSeries]]: the copy
    * lands in a staging dir first, then whole tier directories swap. */
  def restoreSnapshot(name: String): Unit = {
    val snapDir = s"$snapshotsRoot/$name"
    require(exists(snapDir), s"no snapshot named $name under $snapshotsRoot")
    val fs = hfs
    val conf = spark.sparkContext.hadoopConfiguration
    // a predecessor that crashed after its commit marker: complete it
    // first (its staging holds the only copy of some tiers)
    val pending = new org.apache.hadoop.fs.Path(path, RestorePendingMarker)
    if (fs.exists(pending)) completeRestoreSwap(fs, pending)
    val staging = new org.apache.hadoop.fs.Path(s"$path/_restore_staging")
    fs.delete(staging, true)
    val RetentionFiles = Seq("_retention", "_raw_retention")
    copyTreesParallel(fs,
      (SnapTiers ++ RetentionFiles).map(e =>
        (new org.apache.hadoop.fs.Path(s"$snapDir/$e"),
          new org.apache.hadoop.fs.Path(staging, e))),
      conf)
    // the marker records what must be REMOVED WITHOUT REPLACEMENT —
    // tiers and retention markers the snapshot does not carry (review
    // fix: restore previously left the store's retention horizons
    // pointing at tier states the restored data no longer has, so the
    // serving guards refused data the store actually held)
    val removeOnly = (SnapTiers ++ RetentionFiles)
      .filterNot(e => fs.exists(new org.apache.hadoop.fs.Path(s"$snapDir/$e")))
    val mOut = fs.create(pending, true)
    try mOut.write(removeOnly.mkString("\n").getBytes("UTF-8")) finally mOut.close()
    completeRestoreSwap(fs, pending)
  }

  /** Idempotent-resumable second half of [[restoreSnapshot]] (the
    * [[completeDeleteSwap]] shape at whole-tier grain): staged tiers
    * and retention markers swap in with checked renames, the marker's
    * remove list drops what the snapshot does not carry, then staging
    * and the marker clear and every serving cache resets. */
  private def completeRestoreSwap(fs: org.apache.hadoop.fs.FileSystem,
                                  marker: org.apache.hadoop.fs.Path): Unit = {
    val staging = s"$path/_restore_staging"
    val removeOnly = {
      val in = fs.open(marker)
      try new String(in.readAllBytes(), "UTF-8").split("\n").filter(_.nonEmpty).toSeq
      finally in.close()
    }
    for (e <- SnapTiers ++ Seq("_retention", "_raw_retention")) {
      val staged = new org.apache.hadoop.fs.Path(s"$staging/$e")
      val live = new org.apache.hadoop.fs.Path(s"$path/$e")
      if (fs.exists(staged)) {
        fs.delete(live, true)
        if (!fs.rename(staged, live))
          throw new java.io.IOException(s"restore swap failed for $e")
      }
    }
    removeOnly.foreach(e =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/$e"), true))
    fs.delete(new org.apache.hadoop.fs.Path(staging), true)
    fs.delete(marker, false)
    closedIdsCache = None
    newestTsCache = None
    invalidateCatalog()
    retentionCache = None
    rawRetentionCache = None
  }

  private val RestorePendingMarker = "_restore_pending"

  /** Matcher + range query over CLOSED chunks: prune by chunk range,
    * resolve matchers against the per-chunk catalog (label filters run
    * on the small catalog, never on decoded samples), decode only the
    * payloads of matching series. */
  def queryClosed(ms: Seq[Matcher], startUs: Long, endUs: Long): DataFrame = {
    assertRawServable(startUs)
    assertNoPendingClosedSwap()
    val inRange = (df: DataFrame) =>
      df.filter(col("chunk") >= startUs / chunkUs && col("chunk") <= endUs / chunkUs)
    val cat = inRange(readChunked(catalogPath))
      .filter(Matcher.all(ms))
      .select("chunk", "series_id")
    val payloads = inRange(readChunked(closedPath))
      .join(cat, Seq("chunk", "series_id"), "left_semi")
    Gorilla.unpack(payloads)
      .filter(col("ts_us") >= startUs && col("ts_us") <= endUs)
  }

  /** Matcher + range query returning ENCODED per-(series, chunk)
    * payloads — the STREAMED remote-read serving tier (the reference
    * proto declares `accepted_response_types`,
    * /root/reference/src/proto/remote.rs:228; this is the
    * Thanos-style chunked answer to it). Closed Gorilla payloads ship
    * EXACTLY as they sit at rest — zero decode, zero re-encode, the
    * whole point of streaming from a chunked store — and live raw
    * rows pack per (series, chunk) on the executors with the same
    * codec a close would apply. CLOSED boundary chunks may carry
    * samples outside [startUs, endUs]: chunk grain is the wire
    * contract and the client trims after decode (the Prometheus
    * streamed-read rule — servers send whole chunks). Output:
    * (series_id, chunk, payload). */
  def queryEncoded(ms: Seq[Matcher], startUs: Long, endUs: Long): DataFrame = {
    assertNoPendingClosedSwap()
    assertRawServable(startUs)
    val inRange = (df: DataFrame) =>
      df.filter(col("chunk") >= startUs / chunkUs && col("chunk") <= endUs / chunkUs)
    val closedIds = closedChunkIds()
    val closedPart: Option[DataFrame] =
      if (!hasClosed) None
      else {
        val cat = inRange(readChunked(catalogPath))
          .filter(Matcher.all(ms))
          .select("chunk", "series_id")
        Some(inRange(readChunked(closedPath))
          .join(cat, Seq("chunk", "series_id"), "left_semi")
          .select("series_id", "chunk", "payload"))
      }
    val livePart: Option[DataFrame] =
      if (liveChunkIdsListed().forall(closedIds)) None
      else Some(Gorilla.packWithChunk(
        TsOps.rangeQuery(
            inRange(live()).filter(!col("chunk").isInCollection(closedIds)),
            ms, startUs, endUs)
          .select(col("series_id"), col("ts_us"), col("value"),
            expr(s"ts_us div $chunkUs").as("chunk"))))
    (closedPart, livePart) match {
      case (Some(a), Some(b)) => a.unionByName(b)
      case (Some(a), None) => a
      case (None, Some(b)) => b
      case _ => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("series_id",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("chunk",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("payload",
            org.apache.spark.sql.types.BinaryType))))
    }
  }

  /** Prometheus's admin deletion verb (POST /api/v1/admin/tsdb/
    * delete_series): drop every sample of the matched series inside
    * [startUs, endUs] from the CLOSED tier, rewriting the affected
    * chunks' payloads, catalog and rollups from the surviving
    * samples. Only matched series' payloads decode/re-pack; untouched
    * series' payloads and rollup rows carry over byte-identical. A
    * chunk left with no samples loses its partition directories
    * entirely (dynamic overwrite cannot erase a partition that
    * produces no rows). Closed-tier only: a range touching
    * not-yet-closed chunks refuses with a typed error directing
    * closeChunksBelow — the head-block analog of Prometheus, where
    * live deletions are tombstones that only compaction
    * materializes. Idempotent (re-running the same delete rewrites
    * the same survivors). Staged: survivors are fully written to a
    * staging area (breaking lineage from the directories being
    * replaced) before any partition swap, so a crash leaves each
    * partition wholly old or wholly new, never half-overwritten; an
    * interrupted delete re-runs to heal, exactly like Prometheus's
    * delete_series + clean_tombstones pair. */
  def deleteSeries(ms: Seq[Matcher], startUs: Long, endUs: Long): Unit = {
    require(ms.nonEmpty,
      "delete_series needs at least one matcher — refusing to delete the whole store implicitly")
    // a predecessor that crashed AFTER its commit marker left a swap
    // whose only copy of some partitions is the staging area —
    // complete it FIRST, before any directory listing informs this
    // run's chunk math (an early empty-affected return must not skip
    // the heal)
    locally {
      val fs0 = hfs
      val pending = new org.apache.hadoop.fs.Path(path, DeletePendingMarker)
      if (fs0.exists(pending)) completeDeleteSwap(fs0, pending)
    }
    val lo = startUs / chunkUs
    val hi = endUs / chunkUs
    val closedIds = closedChunkIds()
    val affected = closedIds.filter(c => c >= lo && c <= hi)
    val liveOnly = liveChunkIdsListed().filter(c => c >= lo && c <= hi).diff(closedIds)
    if (liveOnly.nonEmpty)
      throw new IllegalStateException(
        s"delete_series range touches live (not yet closed) chunks " +
          s"${liveOnly.toSeq.sorted.mkString(",")} — close them first " +
          "(closeChunksBelow); live deletion is the head-block case Prometheus tombstones")
    // raw-retired chunks live only as catalog+rollup partitions — this
    // verb rewrites from raw payloads, so the matched samples in that
    // range CANNOT be deleted here and silently skipping them would
    // leave the "deleted" series serving from the rollup tier (the
    // privacy-delete footgun). Refuse with the working alternatives.
    rawRetainedFrom().foreach { rawLimit =>
      if (lo < rawLimit)
        throw new IllegalStateException(
          s"delete_series range dips below the raw retention horizon (chunk $rawLimit): " +
            "those chunks hold only rollups, which this verb cannot rewrite — " +
            "retire(beforeUs) the rollup-only history, or start the delete at the horizon")
    }
    if (affected.isEmpty) return
    val inAffected = (df: DataFrame) => df.filter(col("chunk").isInCollection(affected))
    val cat = inAffected(readChunked(catalogPath))
    val doomed = cat.filter(Matcher.all(ms)).select("chunk", "series_id")
    val payloads = inAffected(readChunked(closedPath))
    val untouched = payloads.join(doomed, Seq("chunk", "series_id"), "left_anti")
      .select("series_id", "chunk", "payload")
    // matched series: decode, drop the range, re-pack the survivors
    // (chunk re-derives from ts — samples never cross their chunk)
    val surviving = Gorilla.unpack(
        payloads.join(doomed, Seq("chunk", "series_id"), "left_semi"))
      .filter(!(col("ts_us") >= startUs && col("ts_us") <= endUs))
      .withColumn("chunk", expr(s"ts_us div $chunkUs"))
    val newPayloads = untouched
      .unionByName(Gorilla.packWithChunk(surviving)
        .select("series_id", "chunk", "payload"))
    // STAGE: every rewritten frame lands in a staging area first, with
    // all reads of the live directories completing before any of them
    // is touched. The previous persist-then-dynamic-overwrite shape
    // read and overwrote the SAME paths with only an in-memory cache
    // between them — cache eviction (or executor loss) mid-write would
    // recompute survivors from a half-overwritten source. Staging makes
    // the overwrite a pure directory swap of already-durable data: a
    // crash before any swap leaves the store untouched (stale staging
    // is discarded on the next attempt), a crash mid-swap leaves whole
    // partitions either old or new — and re-running the same delete
    // heals either state (old partitions re-delete, new ones have
    // nothing left to match).
    val staging = s"$path/_delete_staging"
    val stagedClosed = s"$staging/closed"
    val stagedCatalog = s"$staging/closed_catalog"
    val stagedRollup = s"$staging/rollup"
    val fs = hfs
    fs.delete(new org.apache.hadoop.fs.Path(staging), true)
    newPayloads.write.partitionBy("chunk").parquet(stagedClosed)
    // survivors re-read FROM STAGING — downstream derivations depend
    // on durable bytes, not on lineage over the directories the swap
    // is about to replace
    val stagedPayloads = readChunked(stagedClosed)
    // catalog = surviving series per chunk, labels from the old rows
    stagedPayloads.select("chunk", "series_id").distinct()
      .join(cat, Seq("chunk", "series_id"))
      .select("chunk", "series_id", "event_type", "user_id")
      .write.partitionBy("chunk").parquet(stagedCatalog)
    val withRollups = rollupOnClose && exists(rollupPath)
    if (withRollups) {
      // affected chunks' rollups rebuild WHOLESALE from the staged
      // survivors rather than keep-untouched ∪ recompute-matched: the
      // split depends on re-deriving `doomed` from the catalog, which
      // a crash between the catalog swap and the rollup swap has
      // already emptied — a re-run would then carry stale rollup rows
      // for deleted samples. A full rebuild is a pure function of the
      // staged payloads, so every crash state heals. Cost: decoding
      // untouched series' payloads too, but only within the affected
      // chunk range (deletes are a rare, range-scoped admin verb).
      // event_id surrogate — sample timestamps are unique per series,
      // so first/last struct order never consults it.
      rollup1h(
        Gorilla.unpack(stagedPayloads)
          .withColumn("chunk", expr(s"ts_us div $chunkUs"))
          .withColumn("event_id", lit(0L)))
        .write.partitionBy("chunk").parquet(stagedRollup)
    }
    // COMMIT MARKER then SWAP (the compactLive `_pending` protocol —
    // review fix: the bare delete-then-rename loop had a per-chunk
    // crash window where the only copy of a partition sat in staging,
    // which the next attempt's stale-staging discard would destroy).
    // The marker records the (tier, chunk) partitions that must be
    // REMOVED WITHOUT REPLACEMENT (zero-survivor chunks); everything
    // else the completion pass derives from the staged directories
    // themselves, so from this point the swap is redoable from disk
    // alone: closed-tier reads refuse while the marker exists, and
    // the next deleteSeries call completes the pending swap first.
    val removeOnly = for {
      (name, src) <- Seq("closed" -> stagedClosed, "closed_catalog" -> stagedCatalog) ++
        (if (withRollups) Seq("rollup" -> stagedRollup) else Nil)
      c <- affected.toSeq.sorted
      if !fs.exists(new org.apache.hadoop.fs.Path(s"$src/chunk=$c"))
    } yield s"$name/chunk=$c"
    val marker = new org.apache.hadoop.fs.Path(path, DeletePendingMarker)
    val mOut = fs.create(marker, true)
    try mOut.write(removeOnly.mkString("\n").getBytes("UTF-8")) finally mOut.close()
    completeDeleteSwap(fs, marker)
  }

  private val DeletePendingMarker = "_delete_pending"

  /** Idempotent-resumable second half of [[deleteSeries]] (the
    * [[compactLive]] completion shape): staged partition dirs swap in
    * (payloads before catalog — a crash between them leaves the
    * catalog still naming the doomed series so a re-run can
    * re-match; the reverse order would orphan payload rows), the
    * marker's remove-without-replacement list drops zero-survivor
    * partitions, then staging and the marker clear. Safe from any
    * crash point: a staged dir still present means its swap has not
    * completed; a swapped partition leaves no staged dir and is never
    * touched again. */
  private def completeDeleteSwap(fs: org.apache.hadoop.fs.FileSystem,
                                 marker: org.apache.hadoop.fs.Path): Unit = {
    val staging = s"$path/_delete_staging"
    val removeOnly = {
      val in = fs.open(marker)
      try new String(in.readAllBytes(), "UTF-8").split("\n").filter(_.nonEmpty).toSeq
      finally in.close()
    }
    for ((name, liveRoot) <- Seq("closed" -> closedPath,
           "closed_catalog" -> catalogPath, "rollup" -> rollupPath);
         d <- listNames(s"$staging/$name").filter(_.startsWith("chunk="))) {
      val liveDir = new org.apache.hadoop.fs.Path(s"$liveRoot/$d")
      fs.delete(liveDir, true)
      if (!fs.rename(new org.apache.hadoop.fs.Path(s"$staging/$name/$d"), liveDir))
        throw new java.io.IOException(s"delete swap failed for $name/$d")
    }
    removeOnly.foreach(rel =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/$rel"), true))
    fs.delete(new org.apache.hadoop.fs.Path(staging), true)
    fs.delete(marker, false)
    closedIdsCache = None
    newestTsCache = None
    invalidateCatalog()
  }

  /** Prometheus-style BACKFILL / out-of-order ingest (the capability
    * Prometheus grew as the OOO window + `promtool tsdb
    * create-blocks-from`; the reference's db.rs ingest guard simply
    * rejects out-of-chunk appends — this verb is the recovery path for
    * exactly those rejects). Samples routed to live or not-yet-seen
    * chunks take the NORMAL append path; samples routed to
    * already-CLOSED chunks merge into the at-rest tier by rewriting
    * only the receiving (chunk, series) payloads — untouched series'
    * payloads carry over byte-identical, new series join the chunk
    * catalog, and affected chunks' rollups rebuild wholesale from the
    * staged survivors (a pure function of staged bytes, so every crash
    * state heals — the [[deleteSeries]] argument). In the closed-chunk
    * merge exact duplicate samples collapse, so re-running the same
    * backfill of late data is a no-op; rows routed to live follow
    * plain [[append]] semantics (at-least-once, deduplicated only by
    * the caller), same as any other ingest.
    * The whole closed-tier rewrite rides the [[deleteSeries]]
    * staged-swap + commit-marker protocol: a crash before the marker
    * leaves the store untouched, a crash after it is completed by the
    * next backfill/delete call (reads refuse while pending). Horizon
    * guards apply unchanged: history below the retention or
    * raw-retention horizon drops at ingest (same rationale as
    * [[append]] — it could only resurface or clobber rollups).
    * Scale shape: the rewrite decodes only the (chunk, series) pairs
    * that actually receive late rows, the merge/distinct shuffles only
    * the affected chunks' samples, and the staged write is
    * partition-parallel per chunk — cost is proportional to the late
    * data's chunk footprint, never the store. */
  def backfill(samples: DataFrame): Unit = {
    locally {
      val fs0 = hfs
      val pending = new org.apache.hadoop.fs.Path(path, DeletePendingMarker)
      if (fs0.exists(pending)) completeDeleteSwap(fs0, pending)
    }
    assertLayout(batchScoped = false)
    val routed = routedAboveHorizon(samples)
    val closedIds = closedChunkIds()
    val fresh =
      if (closedIds.isEmpty) routed
      else routed.filter(!col("chunk").isInCollection(closedIds))
    clustered(fresh)
      .write.mode("append").partitionBy("chunk").parquet(livePath)
    newestTsCache = None
    invalidateCatalog()
    if (closedIds.isEmpty) return
    // persisted for the verb's duration: the affected-chunk collect,
    // the touched semi/anti joins and both unions below each re-ran
    // the source scan + routing otherwise (5 passes; r12 optimization)
    val late = routed.filter(col("chunk").isInCollection(closedIds))
      .select("series_id", "event_type", "user_id", "chunk", "ts_us", "value")
      .persist()
    // chunk-grain metadata: the distinct chunk ids receiving late rows
    val affected = late.select("chunk").distinct()
      .collect().map(_.getLong(0)).toSet
    if (affected.isEmpty) return
    val inAffected = (df: DataFrame) => df.filter(col("chunk").isInCollection(affected))
    val touched = late.select("chunk", "series_id").distinct()
    val payloads = inAffected(readChunked(closedPath))
    val untouched = payloads.join(touched, Seq("chunk", "series_id"), "left_anti")
      .select("series_id", "chunk", "payload")
    // receiving series: decode, union the late rows, collapse exact
    // duplicates (idempotence), re-pack (chunk re-derives from ts —
    // samples never cross their chunk)
    val merged = Gorilla.unpack(
        payloads.join(touched, Seq("chunk", "series_id"), "left_semi"))
      .withColumn("chunk", expr(s"ts_us div $chunkUs"))
      .select("series_id", "chunk", "ts_us", "value")
      .unionByName(late.select("series_id", "chunk", "ts_us", "value"))
      .distinct()
    val newPayloads = untouched
      .unionByName(Gorilla.packWithChunk(merged)
        .select("series_id", "chunk", "payload"))
    val staging = s"$path/_delete_staging"
    val stagedClosed = s"$staging/closed"
    val stagedCatalog = s"$staging/closed_catalog"
    val stagedRollup = s"$staging/rollup"
    val fs = hfs
    fs.delete(new org.apache.hadoop.fs.Path(staging), true)
    newPayloads.write.partitionBy("chunk").parquet(stagedClosed)
    val stagedPayloads = readChunked(stagedClosed)
    // catalog = staged series per chunk, labels from the old catalog
    // rows ∪ the late rows' own labels (a backfilled series may be NEW
    // to its chunk); label tuples determine series_id, so the
    // union-distinct is exactly one row per (chunk, series)
    val labels = inAffected(readChunked(catalogPath))
      .select("chunk", "series_id", "event_type", "user_id")
      .unionByName(late.select("chunk", "series_id", "event_type", "user_id"))
      .distinct()
    stagedPayloads.select("chunk", "series_id").distinct()
      .join(labels, Seq("chunk", "series_id"))
      .write.partitionBy("chunk").parquet(stagedCatalog)
    val withRollups = rollupOnClose && exists(rollupPath)
    if (withRollups) {
      // wholesale rebuild from staged payloads — the deleteSeries
      // crash-state argument; event_id surrogate as there (sample
      // timestamps are unique per series)
      rollup1h(
        Gorilla.unpack(stagedPayloads)
          .withColumn("chunk", expr(s"ts_us div $chunkUs"))
          .withColumn("event_id", lit(0L)))
        .write.partitionBy("chunk").parquet(stagedRollup)
    }
    // commit marker then swap — backfill never empties a partition, so
    // the remove-without-replacement list is empty; the completion
    // pass derives everything else from the staged directories
    val marker = new org.apache.hadoop.fs.Path(path, DeletePendingMarker)
    val mOut = fs.create(marker, true)
    try mOut.write(Array.emptyByteArray) finally mOut.close()
    late.unpersist(false) // every staged write above has materialized
    completeDeleteSwap(fs, marker)
  }

  /** Federated query: closed chunks (compressed) ∪ live chunks not
    * yet closed — the reference's merge across current + secondary
    * chunks. */
  def queryAll(ms: Seq[Matcher], startUs: Long, endUs: Long): DataFrame = {
    assertNoPendingClosedSwap() // before hasClosed — a mid-swap crash can
    // leave the whole closed dir in staging, which would misread as live-only
    assertRawServable(startUs)
    if (!hasClosed) return query(ms, startUs, endUs)
    val closedIds = closedChunkIds()
    // fully compacted stores have no raw files left — reading the
    // empty live root would fail schema inference, and lingering raw
    // dirs of closed chunks are excluded anyway
    val liveIds = liveChunkIdsListed()
    if (liveIds.forall(closedIds)) return queryClosed(ms, startUs, endUs)
    val liveOnly = TsOps.rangeQuery(
      live()
        .filter(col("chunk") >= startUs / chunkUs && col("chunk") <= endUs / chunkUs)
        .filter(!col("chunk").isInCollection(closedIds)),
      ms, startUs, endUs)
    liveOnly.unionByName(queryClosed(ms, startUs, endUs))
  }
}
