package graft

import graft.tsdb._
import org.apache.spark.sql.functions._
import java.nio.file.Files

class ChunkStoreSpec extends SparkSpec {
  import spark.implicits._

  test("append → query prunes partitions and trims range; close → gorilla readback") {
    val dir = Files.createTempDirectory("graft_chunks").toString
    val store = new ChunkStore(spark, dir)
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    val samples = Series.samples(events)
    store.append(samples)

    // chunk column materialized as partition dirs
    val chunks = store.live().select("chunk").distinct().count()
    assert(chunks > 100) // a month of hourly chunks

    val t1 = 1704412800000000L
    val t2 = 1704499200000000L // one day
    val got = store.query(Seq(MatchEq("event_type", "purchase")), t1, t2)
    val expect = samples.filter($"event_type" === "purchase" &&
      $"ts_us" >= t1 && $"ts_us" <= t2).count()
    assert(got.count() == expect && expect > 0)

    // partition pruning visible in the plan
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || plan.contains("chunk"), plan.take(500))

    // close one chunk and read it back losslessly — snapshot the raw
    // rows FIRST: compaction completes by deleting them from live
    val someChunk = store.live().select("chunk").distinct().as[Long].head()
    val b = store.live().filter($"chunk" === someChunk)
      .orderBy("series_id", "ts_us").select("series_id", "ts_us", "value")
      .as[(String, Long, Double)].collect().toSeq
    store.closeChunk(someChunk)
    val a = store.readClosed(someChunk)
      .orderBy("series_id", "ts_us").select("series_id", "ts_us", "value")
      .as[(String, Long, Double)].collect().toSeq
    assert(a == b && a.nonEmpty)
    // the raw copy is GONE (no raw+compressed double storage), and
    // the federated query still serves every sample exactly once
    assert(!new java.io.File(s"$dir/live/chunk=$someChunk").exists())
    assert(store.live().filter($"chunk" === someChunk).count() == 0)
  }

  test("rollups at rest: closed chunks answer ranges without payload decode") {
    val dir = Files.createTempDirectory("graft_chunks_ru").toString
    val store = new ChunkStore(spark, dir, chunkMs = 86400000L, // daily chunks, hourly rollups
      rollupOnClose = true)
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    val samples = Series.samples(events)
    store.append(samples)
    val t1 = 1704412800000000L // 2024-01-05
    val t2 = t1 + 2L * 86400000000L
    // queryRollup before any close refuses with a pointer to the rule
    val err = intercept[IllegalArgumentException] { store.queryRollup(Nil, t1, t2) }
    assert(err.getMessage.contains("rollup"), err.getMessage)
    store.closeChunksBelow(t2 + 86400000000L)

    val got = store.queryRollup(Seq(MatchEq("event_type", "purchase")), t1, t2)
      .select("series_id", "bucket_ms", "n_points", "min_value", "max_value", "sum_value", "avg_value")
      .as[(String, Long, Long, Double, Double, Double, Double)].collect().toSet
    // oracle: downsample of the RAW samples at BUCKET grain — rollup
    // bounds snap to the hour (a pre-aggregate cannot split a bucket),
    // so the comparable raw set is every sample whose bucket START
    // falls inside the range
    val expect = graft.tsdb.TsOps.downsample(
      samples.filter($"event_type" === "purchase")
        .filter(expr("ts_us div 3600000000") * 3600000000L >= (t1 / 3600000000L) * 3600000000L &&
          expr("ts_us div 3600000000") * 3600000000L <= t2))
      .select("series_id", "bucket_ms", "n_points", "min_value", "max_value", "sum_value", "avg_value")
      .as[(String, Long, Long, Double, Double, Double, Double)].collect().toSet
    assert(got == expect && got.nonEmpty, s"got=${got.size} expect=${expect.size}")

    // the rollup plan touches neither the gorilla payloads nor live raw
    val plan = store.queryRollup(Nil, t1, t2).queryExecution.executedPlan.toString
    assert(!plan.contains("/closed/") && !plan.contains("/live"), plan.take(800))

    // retire drops rollups with their chunks
    store.retire(t2 + 86400000000L * 2)
    assert(!new java.io.File(s"$dir/rollup").exists())
  }

  test("retire drops chunks below the horizon, persists it, and guards re-ingest") {
    val dir = Files.createTempDirectory("graft_chunks_ret").toString
    val store = new ChunkStore(spark, dir, chunkMs = 3600000L)
    val h0 = 1704067200000000L // 2024-01-01 00:00 UTC (us)
    def row(i: Int, tsUs: Long) =
      ("s" + (i % 3), "click", (i % 3).toLong, tsUs, i.toDouble, i.toLong)
    // three hours of data; close the first two, keep hour 2 live
    val rows = (0 until 30).map(i => row(i, h0 + (i % 3) * 3600000000L + (i / 3) * 60000000L))
    store.append(rows.toDF("series_id", "event_type", "user_id", "ts_us", "value", "event_id"))
    store.closeChunksBelow(h0 + 2 * 3600000000L)

    // retention horizon = start of hour 1: hour 0 (closed) retires
    val retired = store.retire(h0 + 3600000000L)
    assert(retired == Set(h0 / 3600000000L), s"retired=$retired")
    val all = store.queryAll(Nil, h0, h0 + 3 * 3600000000L)
    assert(all.count() == 20) // hours 1 and 2 survive
    assert(all.agg(min($"ts_us")).as[Long].head() >= h0 + 3600000000L)

    // late append below the horizon is dropped at ingest (the
    // persisted horizon, not the closed-id set, excludes it) — also
    // across a RESTART (fresh store instance, same path)
    val reopened = new ChunkStore(spark, dir, chunkMs = 3600000L)
    reopened.append(Seq(row(99, h0 + 60000000L))
      .toDF("series_id", "event_type", "user_id", "ts_us", "value", "event_id"))
    assert(reopened.queryAll(Nil, h0, h0 + 3 * 3600000000L).count() == 20)

    // horizon is monotone: retiring at an EARLIER time cannot undo it
    reopened.retire(h0)
    assert(reopened.queryAll(Nil, h0, h0 + 3 * 3600000000L).count() == 20)

    // full retirement leaves a readable (fresh-like) store
    reopened.retire(h0 + 10 * 3600000000L)
    assert(!new java.io.File(s"$dir/closed").exists())
    assert(!new java.io.File(s"$dir/live").exists())
  }

  test("append drops non-positive timestamps (reference ingest guard)") {
    val dir = Files.createTempDirectory("graft_chunks_ts0").toString
    val store = new ChunkStore(spark, dir)
    val s = Seq(
      ("a", "click", 1L, 0L, 1.0, 1L),      // ts=0 → dropped (db.rs:183-186)
      ("a", "click", 1L, -5L, 2.0, 2L),     // negative → dropped
      ("a", "click", 1L, 1704067200000000L, 3.0, 3L))
      .toDF("series_id", "event_type", "user_id", "ts_us", "value", "event_id")
    store.append(s)
    assert(store.live().count() == 1)
    assert(store.live().select("value").as[Double].head() == 3.0)
  }

  test("append spreads ONE chunk across multiple tasks/files, bounded count") {
    val dir = Files.createTempDirectory("graft_chunks_par").toString
    val store = new ChunkStore(spark, dir)
    // 10k points from 64 series, ALL inside one hour chunk — the case
    // where repartition(chunk) alone would collapse the write to one
    // task (the 100 TB/day write-path killer)
    val base = 1704067200000000L
    val s = spark.range(0, 10000).select(
      concat(lit("s"), $"id" % 64).as("series_id"),
      lit("click").as("event_type"),
      ($"id" % 7).as("user_id"),
      (lit(base) + $"id" * 1000L).as("ts_us"),
      ($"id" * 1.0).as("value"),
      $"id".as("event_id"))
    store.append(s)
    val chunkDir = new java.io.File(s"$dir/live/chunk=${base / 3600000000L}")
    assert(chunkDir.exists(), s"missing ${chunkDir}")
    val files = chunkDir.listFiles().count(_.getName.endsWith(".parquet"))
    // parallel (salted) write, still bounded small-files discipline
    assert(files > 1, s"one-task write: $files file(s)")
    assert(files <= 8, s"small-files blowout: $files files")
    assert(store.live().count() == 10000)
  }

  test("append into an already-closed chunk is dropped (late-data guard)") {
    val dir = Files.createTempDirectory("graft_chunks_late").toString
    val store = new ChunkStore(spark, dir)
    val h0 = 1704067200000000L            // chunk A start
    val h1 = h0 + 3600L * 1000000         // chunk B start
    def ev(ts: Long, v: Double, id: Long) =
      ("sA", "click", 1L, ts, v, id)
    val batch1 = Seq(ev(h0 + 1, 1.0, 1L), ev(h1 + 1, 2.0, 2L))
      .toDF("series_id", "event_type", "user_id", "ts_us", "value", "event_id")
    store.append(batch1)
    store.closeChunk(h0 / 3600000000L)
    // late batch: one point addressed to the CLOSED chunk A (must be
    // dropped — it would be invisible to queryAll otherwise), one to
    // the still-live chunk B (must land)
    val batch2 = Seq(ev(h0 + 2, 3.0, 3L), ev(h1 + 2, 4.0, 4L))
      .toDF("series_id", "event_type", "user_id", "ts_us", "value", "event_id")
    store.append(batch2)
    val got = store.queryAll(Seq.empty, h0, h1 + 3600L * 1000000)
      .select("value").as[Double].collect().sorted.toSeq
    assert(got == Seq(1.0, 2.0, 4.0), s"got $got")
  }

  test("mixing direct and batch-scoped appends on one store is refused at write time") {
    val dir = Files.createTempDirectory("graft_chunks_mix").toString
    val store = new ChunkStore(spark, dir)
    val s = Seq(("sA", "click", 1L, 1704067200000001L, 1.0, 1L))
      .toDF("series_id", "event_type", "user_id", "ts_us", "value", "event_id")
    store.append(s)
    // the two layouts put chunk= at different directory depths —
    // partition discovery cannot read the union, so refuse up front
    val e = intercept[IllegalStateException] { store.appendBatch(s, 0L) }
    assert(e.getMessage.contains("one ingest mode"))
    val dir2 = Files.createTempDirectory("graft_chunks_mix2").toString
    val store2 = new ChunkStore(spark, dir2)
    store2.appendBatch(s, 0L)
    intercept[IllegalStateException] { store2.append(s) }
  }

  test("federated queryAll == live-only answer after a chunk is closed") {
    val dir = Files.createTempDirectory("graft_chunks2").toString
    val store = new ChunkStore(spark, dir)
    val samples = Series.samples(spark.read.parquet(s"$sfDir/events.parquet"))
    store.append(samples)

    val t1 = 1704067200000000L            // 2024-01-01 00:00
    val t2 = t1 + 48L * 3600 * 1000000    // two days
    val ms = Seq(MatchRe("event_type", "^(click|view)$"))
    val expect = samples
      .filter($"event_type".rlike("^(click|view)$") && $"ts_us" >= t1 && $"ts_us" <= t2)
      .select("series_id", "ts_us", "value")
      .as[(String, Long, Double)].collect().sorted.toSeq
    assert(expect.nonEmpty)

    // close the first two hour-chunks, then federate
    store.live().select("chunk").distinct().orderBy("chunk").as[Long].take(2)
      .foreach(store.closeChunk)
    val got = store.queryAll(ms, t1, t2)
      .select("series_id", "ts_us", "value")
      .as[(String, Long, Double)].collect().sorted.toSeq
    assert(got == expect)

    // matcher filtering happens on the closed catalog: a non-matching
    // label returns nothing from closed chunks
    assert(store.queryClosed(Seq(MatchEq("event_type", "nope")), t1, t2).count() == 0)
  }

  test("compactLive bounds files per chunk, results unchanged; interrupted swap heals") {
    val dir = Files.createTempDirectory("graft_chunks_cpt").toString
    val store = new ChunkStore(spark, dir, filesPerChunkPerAppend = 2)
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    val t1 = 1704067200000000L
    val samples = Series.samples(events)
      .filter($"ts_us" >= t1 && $"ts_us" < t1 + 6L * 3600 * 1000000)
    // five appends into the same hour chunks: files accumulate per append
    (0 until 5).foreach(i => store.append(samples.filter($"user_id" % 5 === i)))
    def filesPerChunk(): Map[String, Int] =
      new java.io.File(s"$dir/live").listFiles().filter(_.getName.startsWith("chunk="))
        .map(d => d.getName -> d.listFiles().count(_.getName.endsWith(".parquet")))
        .toMap
    val before = filesPerChunk()
    assert(before.values.max > 2, s"expected accumulation, got $before")
    val rowsBefore = store.live().orderBy("series_id", "ts_us")
      .select("series_id", "ts_us", "value")
      .as[(String, Long, Double)].collect().toSeq
    store.compactLive()
    // one append's worth of files per chunk, identical rows
    val after = filesPerChunk()
    assert(after.keySet == before.keySet && after.values.max <= 2,
      s"$before -> $after")
    val rowsAfter = store.live().orderBy("series_id", "ts_us")
      .select("series_id", "ts_us", "value")
      .as[(String, Long, Double)].collect().toSeq
    assert(rowsAfter == rowsBefore)
    // interrupted-swap drill: with the marker on disk every raw read
    // refuses; re-running compactLive completes the swap and heals
    new java.io.File(dir, "_compact_pending").createNewFile()
    val err = intercept[IllegalArgumentException] { store.live().count() }
    assert(err.getMessage.contains("compact"), err.getMessage)
    store.compactLive()
    assert(store.live().count() == rowsBefore.size)
  }

  test("deleteSeries: range-scoped closed-tier deletion rewrites payloads/catalog/rollups; empty chunks vanish; live refuses") {
    val h = 3600000000000L // ns
    val t0 = 1704067200000000L
    val t0n = t0 * 1000L
    val ev = Seq(
      // click/u1 in chunks (days) 0, 1, 2; purchase/u1 in day 1
      (1L, t0n + 1L * h, 1L, "click", 10.0),
      (2L, t0n + 25L * h, 1L, "click", 20.0),
      (3L, t0n + 49L * h, 1L, "click", 40.0),
      (4L, t0n + 26L * h, 1L, "purchase", 100.0),
      // a series that exists ONLY in day 1 and only as click/u2
      (5L, t0n + 27L * h, 2L, "click", 5.0),
      // day 5 stays LIVE (not closed)
      (6L, t0n + 121L * h, 1L, "click", 7.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val dir = Files.createTempDirectory("graft_delete").toString
    val store = new ChunkStore(spark, dir, chunkMs = 86400000L, rollupOnClose = true)
    store.append(Series.samples(ev))
    store.closeChunksBelow(t0 + 96L * 3600000000L) // close days 0..3
    val dayUs = 86400000000L
    // a range touching the live day-5 chunk refuses with direction
    val live = intercept[IllegalStateException](
      store.deleteSeries(Seq(MatchEq("event_type", "click")), t0, t0 + 200L * 3600000000L))
    assert(live.getMessage.contains("close"), live.getMessage)
    // delete clicks in day 1 only
    store.deleteSeries(Seq(MatchEq("event_type", "click")), t0 + dayUs, t0 + 2 * dayUs - 1)
    val left = store.queryAll(Nil, t0, t0 + 4 * dayUs)
      .select("ts_us", "value").as[(Long, Double)].collect().toSet
    // day-1 clicks (20.0, 5.0) gone; day-0/2 clicks + day-1 purchase stay
    assert(left == Set((t0 + 1L * 3600000000L, 10.0),
      (t0 + 49L * 3600000000L, 40.0), (t0 + 26L * 3600000000L, 100.0)), left)
    // catalog: click/u2 existed only in day 1 — its catalog rows are gone
    assert(store.catalog().filter(col("user_id") === 2L).count() == 0)
    // rollups stay consistent: the guard sees no missing chunks and
    // the decode-free tier serves the post-delete truth
    val roll = store.queryRollup(Seq(MatchEq("event_type", "click")), t0, t0 + 3 * dayUs)
    assert(roll.agg(sum(col("sum_value"))).collect()(0).getDouble(0) == 50.0)
    // idempotent: re-running the same delete changes nothing
    store.deleteSeries(Seq(MatchEq("event_type", "click")), t0 + dayUs, t0 + 2 * dayUs - 1)
    assert(store.queryAll(Nil, t0, t0 + 4 * dayUs).count() == 3)
    // matcher-less deletion refuses
    intercept[IllegalArgumentException](store.deleteSeries(Nil, t0, t0 + dayUs))
  }

  test("retireRaw: payloads drop, rollups serve, raw reads refuse loudly, guards hold across restart") {
    val h = 3600000000000L // ns
    val t0 = 1704067200000000L
    val t0n = t0 * 1000L
    val dayUs = 86400000000L
    val ev = Seq(
      (1L, t0n + 1L * h, 1L, "click", 10.0),
      (2L, t0n + 25L * h, 1L, "click", 20.0),
      (3L, t0n + 49L * h, 1L, "click", 40.0),
      (4L, t0n + 26L * h, 1L, "purchase", 100.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val dir = Files.createTempDirectory("graft_tiered").toString
    val store = new ChunkStore(spark, dir, chunkMs = 86400000L, rollupOnClose = true)
    store.append(Series.samples(ev))
    // live chunks below the horizon refuse (close first)
    val liveErr = intercept[IllegalStateException](store.retireRaw(t0 + 4 * dayUs))
    assert(liveErr.getMessage.contains("close"), liveErr.getMessage)
    store.closeChunksBelow(t0 + 96L * 3600000000L)
    val c0 = t0 / dayUs
    // raw-retire days 0 and 1
    val retired = store.retireRaw(t0 + 2 * dayUs)
    assert(retired == Set(c0, c0 + 1), retired)
    // payload dirs GONE; catalog and rollup partitions SURVIVE
    assert(!new java.io.File(s"$dir/closed/chunk=$c0").exists())
    assert(new java.io.File(s"$dir/closed_catalog/chunk=$c0").exists())
    assert(new java.io.File(s"$dir/rollup/chunk=$c0").exists())
    // rollup tier serves the WHOLE history, including retired days
    val roll = store.queryRollup(Seq(MatchEq("event_type", "click")), t0, t0 + 3 * dayUs)
    assert(roll.agg(sum(col("sum_value"))).collect()(0).getDouble(0) == 70.0)
    // raw reads dipping below the horizon refuse with direction...
    val err = intercept[IllegalStateException](store.queryAll(Nil, t0, t0 + 3 * dayUs).count())
    assert(err.getMessage.contains("queryRollup"), err.getMessage)
    // ...while raw reads at or after it still serve
    assert(store.queryAll(Nil, t0 + 2 * dayUs, t0 + 3 * dayUs).count() == 1)
    // late append below the raw horizon drops at ingest, ACROSS RESTART
    val reopened = new ChunkStore(spark, dir, chunkMs = 86400000L, rollupOnClose = true)
    reopened.append(Seq((9L, t0n + 2L * h, 1L, "click", 99.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .transform(Series.samples))
    assert(!new java.io.File(s"$dir/live/chunk=$c0").exists(),
      "a late raw row below the raw horizon must not resurface")
    // snapshot of a tiered store carries the rollup-only chunks and
    // the raw horizon; the opened snapshot refuses raw reads the same
    reopened.snapshot(Some("tiered"))
    val snap = reopened.openSnapshot("tiered")
    assert(snap.queryRollup(Seq(MatchEq("event_type", "click")), t0, t0 + 3 * dayUs)
      .agg(sum(col("sum_value"))).collect()(0).getDouble(0) == 70.0)
    // delete_series dipping below the raw horizon refuses — silently
    // skipping the rollup-only chunks would leave "deleted" series
    // serving from the rollup tier (the privacy-delete footgun)
    val del = intercept[IllegalStateException](
      reopened.deleteSeries(Seq(MatchEq("event_type", "click")), t0, t0 + 3 * dayUs))
    assert(del.getMessage.contains("rollup"), del.getMessage)
    // full retirement still removes the rollup-only partitions
    reopened.retire(t0 + dayUs)
    assert(!new java.io.File(s"$dir/rollup/chunk=$c0").exists())
    assert(!new java.io.File(s"$dir/closed_catalog/chunk=$c0").exists())
  }

  test("cloneTo: a hardlink clone mutates independently of its source") {
    val h = 3600000000000L
    val t0 = 1704067200000000L
    val ev = Seq(
      (1L, t0 * 1000 + 1L * h, 1L, "click", 10.0),
      (2L, t0 * 1000 + 25L * h, 1L, "click", 20.0),
      (3L, t0 * 1000 + 26L * h, 2L, "view", 5.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val srcDir = Files.createTempDirectory("graft_clone_src").toString
    val src = new ChunkStore(spark, srcDir, chunkMs = 86400000L)
    src.append(Series.samples(ev))
    src.closeChunksBelow(t0 + 96L * 3600000000L)
    val dstDir = Files.createTempDirectory("graft_clone_dst").toString + "/store"
    val clone = src.cloneTo(dstDir)
    def rows(s: ChunkStore) = s.queryAll(Nil, t0, t0 + 4L * 86400000000L)
      .select("ts_us", "value").as[(Long, Double)].collect().toSet
    val before = rows(src)
    assert(rows(clone) == before, "clone must serve the source's truth")
    // mutate the CLONE: the delete's staged swap unlinks hardlinked
    // files rather than editing them, so the source must not move
    clone.deleteSeries(Seq(MatchEq("event_type", "click")), t0, t0 + 4L * 86400000000L)
    assert(rows(clone).size == 1)
    assert(rows(src) == before, "mutating the clone leaked into the source")
    // and the other direction: mutating the source leaves the clone be
    src.deleteSeries(Seq(MatchEq("event_type", "view")), t0, t0 + 4L * 86400000000L)
    assert(rows(clone).size == 1 && rows(src).size == 2)
    // non-empty destination refuses
    intercept[IllegalArgumentException](src.cloneTo(dstDir))
  }

  test("snapshot → delete → restore round-trip; snapshots are readable stores; stale temp ignored") {
    val h = 3600000000000L // ns
    val t0 = 1704067200000000L
    val t0n = t0 * 1000L
    val dayUs = 86400000000L
    val ev = Seq(
      (1L, t0n + 1L * h, 1L, "click", 10.0),
      (2L, t0n + 25L * h, 1L, "click", 20.0),
      (3L, t0n + 49L * h, 1L, "click", 40.0),
      (4L, t0n + 26L * h, 1L, "purchase", 100.0),
      (5L, t0n + 27L * h, 2L, "click", 5.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val dir = Files.createTempDirectory("graft_snapshot").toString
    val store = new ChunkStore(spark, dir, chunkMs = 86400000L, rollupOnClose = true)
    // nothing closed yet → snapshot refuses with direction
    store.append(Series.samples(ev))
    val empty = intercept[IllegalArgumentException](store.snapshot())
    assert(empty.getMessage.contains("close"), empty.getMessage)
    store.closeChunksBelow(t0 + 96L * 3600000000L)
    def allRows(s: ChunkStore): Set[(Long, Double)] =
      s.queryAll(Nil, t0, t0 + 4 * dayUs)
        .select("ts_us", "value").as[(Long, Double)].collect().toSet
    val before = allRows(store)
    assert(before.size == 5)

    // a crashed predecessor's temp dir is invisible to the verb
    new java.io.File(dir, "snapshots/.tmp-dead").mkdirs()
    // the dot-file skip is EXACTLY Hadoop's ".name.crc" checksum-shadow
    // pattern: a legitimate dot-file under the closed tree must survive
    // the snapshot copy (ADVICE r11: the blanket dot-skip silently
    // dropped it while the remote-FS branch copied it)
    // (the snapshot copies chunk-partition subtrees, so the planted
    // files go INSIDE one chunk dir — a tree-root file is outside the
    // verb's grain by design)
    val chunkDir = new java.io.File(dir, "closed").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("chunk=")).head
    val dotKeep = new java.io.File(chunkDir, ".meta-marker")
    java.nio.file.Files.write(dotKeep.toPath, "keep me".getBytes("UTF-8"))
    val crcSkip = new java.io.File(chunkDir, ".part-0.crc")
    java.nio.file.Files.write(crcSkip.toPath, Array[Byte](1, 2, 3))
    val snap = store.snapshot(Some("pre-delete"))
    assert(snap == "pre-delete" && store.listSnapshots() == Seq("pre-delete"))
    val snapChunk = new java.io.File(
      s"$dir/snapshots/pre-delete/closed/${chunkDir.getName}")
    assert(new java.io.File(snapChunk, ".meta-marker").exists(),
      "legitimate dot-file vanished from the snapshot copy")
    assert(!new java.io.File(snapChunk, ".part-0.crc").exists(),
      "Hadoop checksum shadow must stay skipped")
    dotKeep.delete(); crcSkip.delete() // keep the rest of the drill byte-clean
    intercept[IllegalArgumentException](store.snapshot(Some("pre-delete"))) // duplicate
    intercept[IllegalArgumentException](store.snapshot(Some("../escape"))) // hostile name

    // mutate the store: delete all day-1 clicks
    store.deleteSeries(Seq(MatchEq("event_type", "click")), t0 + dayUs, t0 + 2 * dayUs - 1)
    assert(allRows(store).size == 3)

    // the snapshot still holds the pre-delete truth, as a plain
    // closed-only store — raw queries AND the rollup tier
    val snapStore = store.openSnapshot("pre-delete")
    assert(allRows(snapStore) == before)
    val roll = snapStore.queryRollup(Seq(MatchEq("event_type", "click")), t0, t0 + 3 * dayUs)
    assert(roll.agg(sum(col("sum_value"))).collect()(0).getDouble(0) == 75.0)

    // restore: the store serves the pre-delete truth again
    store.restoreSnapshot("pre-delete")
    assert(allRows(store) == before)
    assert(store.queryRollup(Seq(MatchEq("event_type", "click")), t0, t0 + 3 * dayUs)
      .agg(sum(col("sum_value"))).collect()(0).getDouble(0) == 75.0)
    // unknown snapshot refuses
    intercept[IllegalArgumentException](store.restoreSnapshot("nope"))

    // restore resets the RETENTION GUARDS to the snapshot's state
    // (review fix): raw-retire AFTER the snapshot, then restore — the
    // payloads are back AND the raw horizon is gone, so raw reads
    // serve instead of refusing data the store actually holds
    store.closeChunksBelow(t0 + 96L * 3600000000L)
    store.retireRaw(t0 + 2 * dayUs)
    intercept[IllegalStateException](store.queryAll(Nil, t0, t0 + 4 * dayUs).count())
    store.restoreSnapshot("pre-delete")
    assert(allRows(store) == before)
    // a marker-crash mid-restore heals on re-run and reads refuse
    // meanwhile (the _delete_pending discipline, restore flavor):
    // simulate the worst state — a tier moved out with only the
    // staging copy on disk
    new java.io.File(s"$dir/_restore_staging").mkdirs()
    assert(new java.io.File(s"$dir/closed")
      .renameTo(new java.io.File(s"$dir/_restore_staging/closed")))
    Files.write(new java.io.File(dir, "_restore_pending").toPath, Array.empty[Byte])
    val g2 = intercept[IllegalArgumentException](
      store.queryAll(Nil, t0, t0 + 4 * dayUs).count())
    assert(g2.getMessage.contains("restore"), g2.getMessage)
    store.restoreSnapshot("pre-delete")
    assert(allRows(store) == before)
    assert(!new java.io.File(dir, "_restore_pending").exists())
  }

  test("backfill: late rows merge into closed chunks (payloads, catalog growth, rollups); fresh rows go live; dup collapse; untouched payloads byte-identical; heal") {
    val h = 3600000000000L // ns
    val t0 = 1704067200000000L
    val t0n = t0 * 1000L
    val dayUs = 86400000000L
    val ev = Seq(
      (1L, t0n + 1L * h, 1L, "click", 10.0),     // day0  series A
      (2L, t0n + 25L * h, 1L, "click", 20.0),    // day1  A
      (3L, t0n + 49L * h, 1L, "click", 40.0),    // day2  A
      (4L, t0n + 26L * h, 1L, "purchase", 100.0) // day1  B (stays untouched)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val dir = Files.createTempDirectory("graft_backfill").toString
    val store = new ChunkStore(spark, dir, chunkMs = 86400000L, rollupOnClose = true)
    store.append(Series.samples(ev))
    store.closeChunksBelow(t0 + 72L * 3600000000L) // chunks day0..day2 closed

    val bId = store.catalog().filter(col("event_type") === "purchase")
      .select("series_id").as[String].head()
    def bPayload(): Array[Byte] = spark.read.parquet(s"$dir/closed")
      .filter(col("series_id") === bId).select("payload")
      .as[Array[Byte]].head()
    val bBefore = bPayload()

    val lateClosed = Seq(
      (10L, t0n + 30L * h, 1L, "click", 21.0), // existing series, closed day1
      (11L, t0n + 2L * h, 2L, "click", 7.0),   // NEW series C into closed day0
      (12L, t0n + 25L * h, 1L, "click", 20.0), // exact duplicate of event 2 — must collapse
      (14L, 0L, 1L, "click", 1.0)              // non-positive ts — ingest guard drops
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val lateFresh = Seq(
      (13L, t0n + 121L * h, 1L, "click", 99.0) // day5 — not closed, must route to live
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    store.backfill(Series.samples(lateClosed.unionByName(lateFresh)))

    val got = store.queryAll(Nil, t0, t0 + 10 * dayUs)
      .select("ts_us", "value").as[(Long, Double)].collect().toSet
    val hUs = 3600000000L
    assert(got == Set(
      (t0 + 1L * hUs, 10.0), (t0 + 25L * hUs, 20.0), (t0 + 49L * hUs, 40.0),
      (t0 + 26L * hUs, 100.0), (t0 + 30L * hUs, 21.0), (t0 + 2L * hUs, 7.0),
      (t0 + 121L * hUs, 99.0)), got)

    // catalog grew the new series in its closed chunk
    assert(store.catalog().filter(col("user_id") === 2L).count() == 1)
    // fresh row sits in LIVE (day5 chunk dir), not a rewritten closed chunk
    assert(new java.io.File(s"$dir/live/chunk=${(t0 + 121L * hUs) / dayUs}").exists())
    // rollups of the affected chunks rebuilt: full-range sum includes late rows once
    val roll = store.queryRollup(Nil, t0, t0 + 3 * dayUs - 1)
    assert(roll.agg(sum(col("sum_value"))).collect()(0).getDouble(0) == 198.0)
    // untouched series' payload carried over byte-identical
    assert(java.util.Arrays.equals(bBefore, bPayload()))

    // idempotence of the closed merge: same late data again changes nothing
    store.backfill(Series.samples(lateClosed))
    assert(store.queryAll(Nil, t0, t0 + 10 * dayUs).count() == 7)

    // interrupted-swap heal: marker present → reads refuse; the next
    // backfill completes the pending swap before its own work
    val c1 = (t0 + dayUs) / dayUs
    new java.io.File(s"$dir/_delete_staging/closed").mkdirs()
    assert(new java.io.File(s"$dir/closed/chunk=$c1")
      .renameTo(new java.io.File(s"$dir/_delete_staging/closed/chunk=$c1")))
    Files.write(new java.io.File(dir, "_delete_pending").toPath, Array.empty[Byte])
    val gate = intercept[IllegalArgumentException](
      store.queryAll(Nil, t0, t0 + 4 * dayUs).count())
    assert(gate.getMessage.contains("interrupted"), gate.getMessage)
    store.backfill(Series.samples(lateClosed))
    assert(!new java.io.File(dir, "_delete_pending").exists())
    assert(store.queryAll(Nil, t0, t0 + 10 * dayUs).count() == 7)
    assert(!new java.io.File(dir, "_delete_staging").exists(),
      "staging area must be cleaned up after a completed backfill")
  }

  test("deleteSeries staged swap: stale staging discarded; every interrupted-swap state re-runs to a correct store") {
    val h = 3600000000000L // ns
    val t0 = 1704067200000000L
    val t0n = t0 * 1000L
    val dayUs = 86400000000L
    def freshStore(): (String, ChunkStore) = {
      val ev = Seq(
        (1L, t0n + 1L * h, 1L, "click", 10.0),
        (2L, t0n + 25L * h, 1L, "click", 20.0),
        (3L, t0n + 49L * h, 1L, "click", 40.0),
        (4L, t0n + 26L * h, 1L, "purchase", 100.0),
        (5L, t0n + 27L * h, 2L, "click", 5.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
      val dir = Files.createTempDirectory("graft_delete_swap").toString
      val store = new ChunkStore(spark, dir, chunkMs = 86400000L, rollupOnClose = true)
      store.append(Series.samples(ev))
      store.closeChunksBelow(t0 + 96L * 3600000000L)
      (dir, store)
    }
    def doDelete(s: ChunkStore): Unit =
      s.deleteSeries(Seq(MatchEq("event_type", "click")), t0 + dayUs, t0 + 2 * dayUs - 1)
    def assertHealthy(dir: String, s: ChunkStore): Unit = {
      val left = s.queryAll(Nil, t0, t0 + 4 * dayUs)
        .select("ts_us", "value").as[(Long, Double)].collect().toSet
      assert(left == Set((t0 + 1L * 3600000000L, 10.0),
        (t0 + 49L * 3600000000L, 40.0), (t0 + 26L * 3600000000L, 100.0)), left)
      assert(s.catalog().filter(col("user_id") === 2L).count() == 0)
      val roll = s.queryRollup(Seq(MatchEq("event_type", "click")), t0, t0 + 3 * dayUs)
      assert(roll.agg(sum(col("sum_value"))).collect()(0).getDouble(0) == 50.0)
      assert(!new java.io.File(dir, "_delete_staging").exists(),
        "staging area must be cleaned up after a completed delete")
    }

    // 1) a crashed predecessor's stale staging area (garbage content)
    //    is discarded, not merged, by the next attempt
    val (dirA, storeA) = freshStore()
    val stale = new java.io.File(dirA, "_delete_staging/closed/chunk=999")
    stale.mkdirs()
    Files.write(stale.toPath.resolve("junk.parquet"), Array[Byte](1, 2, 3))
    doDelete(storeA)
    assertHealthy(dirA, storeA)

    // 1b) commit-marker protocol (review fix): while _delete_pending
    //     exists, closed-tier reads refuse; the previously-FATAL state
    //     (old partition deleted, only copy in staging, marker set) is
    //     healed by the next deleteSeries call completing the swap
    //     BEFORE its own stale-staging discard
    val (dirM, storeM) = freshStore()
    doDelete(storeM)
    val c1m = (t0 + dayUs) / dayUs
    // simulate a crash mid-swap: the day-1 closed partition moved to
    // staging, marker present with nothing to remove-without-replace
    val stagedDir = new java.io.File(s"$dirM/_delete_staging/closed")
    stagedDir.mkdirs()
    assert(new java.io.File(s"$dirM/closed/chunk=$c1m")
      .renameTo(new java.io.File(s"$dirM/_delete_staging/closed/chunk=$c1m")))
    Files.write(new java.io.File(dirM, "_delete_pending").toPath, Array.empty[Byte])
    val gate = intercept[IllegalArgumentException](
      storeM.queryAll(Nil, t0, t0 + 4 * dayUs).count())
    assert(gate.getMessage.contains("interrupted"), gate.getMessage)
    doDelete(storeM) // completes the pending swap, then no-op re-delete
    assertHealthy(dirM, storeM)
    assert(!new java.io.File(dirM, "_delete_pending").exists())

    // 2) crash-state matrix: stage completed, swap interrupted after
    //    each tier of the day-1 chunk (payloads → catalog → rollup, the
    //    code's swap order). Build each state by snapshotting the
    //    pre-delete partition dirs, running the real delete, then
    //    restoring the not-yet-swapped tiers — re-running the SAME
    //    delete must heal every state.
    for (restoredTiers <- Seq(
        Seq("closed", "closed_catalog", "rollup"), // crashed before any swap of this chunk
        Seq("closed_catalog", "rollup"),           // payloads swapped, rest old
        Seq("rollup"))) {                          // payloads+catalog swapped, rollup old
      val (dir, store) = freshStore()
      val c1 = (t0 + dayUs) / dayUs // the day-1 chunk's absolute id
      val snap = Files.createTempDirectory("graft_delete_snap").toString
      for (t <- Seq("closed", "closed_catalog", "rollup")) {
        val src = new java.io.File(s"$dir/$t/chunk=$c1")
        assert(src.exists(), s"expected pre-delete $t/chunk=$c1")
        org.apache.commons.io.FileUtils.copyDirectory(src, new java.io.File(s"$snap/$t"))
      }
      doDelete(store)
      for (t <- restoredTiers) {
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$dir/$t/chunk=$c1"))
        org.apache.commons.io.FileUtils.copyDirectory(
          new java.io.File(s"$snap/$t"), new java.io.File(s"$dir/$t/chunk=$c1"))
      }
      doDelete(store) // the heal re-run
      assertHealthy(dir, store)
    }
  }
}
