package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental near-dup index at rest — dedup a NEW document batch
  * against an already-ingested corpus WITHOUT re-scanning it. A 100 TB
  * pipeline ingests incrementally; recomputing whole-corpus signatures
  * per arriving batch is the naive O(corpus/batch) tax this store
  * removes (the reference's analogue is its persistent label index:
  * ingest-time index maintenance so queries never rescan,
  * src/indexer/sled_indexer.rs).
  *
  * At rest (session-catalog bucketed tables, the [[graft.tsdb
  * .BucketedChunkTable]] pattern):
  *  - `<table>_bands` (band, band_hash, doc_id), bucketed by
  *    band_hash — the probe's candidate join reads the stored side in
  *    its bucket distribution (HashPartitioning(band_hash) satisfies
  *    the (band, band_hash) clustering), so only the NEW batch
  *    shuffles; the index side never does.
  *  - `<table>_sigs` (doc_id, m0..m{numPerm−1}), bucketed by doc_id —
  *    the estimate join against candidates is likewise stored-side
  *    shuffle-free.
  * Index size is numPerm longs + numPerm/bandSize band rows per doc —
  * ~2% of a 10 KB document; it grows with the corpus, the probe cost
  * grows with the BATCH (+ band-bucket collisions).
  *
  * The probe estimates Jaccard from signature agreement
  * (E[matching minhash components / numPerm] = J, Broder'97) — the
  * index never stores shingle sets, so verification is O(numPerm) per
  * candidate. Callers wanting exact verification re-read only the
  * candidate docs' texts (tiny next to the corpus).
  */
final class MinhashStore(spark: SparkSession, table: String, n: Int = 3,
                         numPerm: Int = 16, bandSize: Int = 4, nBuckets: Int = 8) {

  private def sigsTable = s"${table}_sigs"
  private def bandsTable = s"${table}_bands"

  private def paramProps: Seq[(String, String)] = Seq(
    "graft.minhash.n" -> n.toString,
    "graft.minhash.numPerm" -> numPerm.toString,
    "graft.minhash.bandSize" -> bandSize.toString,
    "graft.minhash.nBuckets" -> nBuckets.toString)

  /** Appending with DIFFERENT parameters than the index was built
    * with silently corrupts it — band hashes from another
    * (n, numPerm, bandSize) are incompatible, so probes would silently
    * miss dups in older generations. Every write stamps the params as
    * table properties; every append checks them (plus the physical
    * schema and bucket spec as a backstop) and fails loudly. */
  private def requireCompatible(): Unit = {
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(sigsTable))
    paramProps.foreach { case (k, v) =>
      meta.properties.get(k) match {
        case Some(existing) => require(existing == v,
          s"MinhashStore($table): existing index has $k=$existing, this store " +
            s"uses $v — append would mix incompatible generations (probes " +
            "silently miss older dups); recreate with mode=overwrite or match " +
            "the parameters")
        case None => throw new IllegalArgumentException(
          s"MinhashStore($table): existing index carries no $k stamp, so its " +
            "build parameters (shingle n, band size) cannot be verified — a " +
            "silent mismatch would corrupt the index and then stamp the NEW " +
            "parameters over the mix; rebuild with mode=overwrite")
      }
    }
    val existingPerm = meta.schema.fieldNames.count(_.matches("m\\d+"))
    require(existingPerm == numPerm,
      s"MinhashStore($table): existing sigs table has $existingPerm minhash " +
        s"columns, this store uses numPerm=$numPerm")
    meta.bucketSpec.foreach(b => require(b.numBuckets == nBuckets,
      s"MinhashStore($table): existing sigs table has ${b.numBuckets} buckets, " +
        s"this store uses nBuckets=$nBuckets"))
  }

  /** Index a document batch (doc_id, text). `append` adds a new
    * generation to the existing index. */
  def write(docs: DataFrame, mode: String = "append"): Unit = {
    if (mode == "append" && spark.catalog.tableExists(sigsTable)) requireCompatible()
    // persisted: both tables derive from one signature aggregation —
    // and bands MUST come from the batch frame, not a read-back of the
    // sigs table (an append would re-band every earlier generation)
    val sigs = Dedup.minhashSignatures(docs, n, numPerm).persist()
    sigs.write.mode(mode)
      .bucketBy(nBuckets, "doc_id")
      .format("parquet")
      .saveAsTable(sigsTable)
    Dedup.minhashBands(sigs, numPerm, bandSize)
      .write.mode(mode)
      .bucketBy(nBuckets, "band_hash")
      .format("parquet")
      .saveAsTable(bandsTable)
    sigs.unpersist()
    // stamp the build parameters so a later mismatched append fails
    // loudly in requireCompatible instead of corrupting the index
    val props = paramProps.map { case (k, v) => s"'$k'='$v'" }.mkString(", ")
    Seq(sigsTable, bandsTable).foreach(t =>
      spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES ($props)"))
  }

  def storedBands(): DataFrame = spark.table(bandsTable)
  def storedSignatures(): DataFrame = spark.table(sigsTable)

  /** Compact both index tables: every [[write]] append adds its own
    * files to each bucket, so at daily-ingest cadence the bucket dirs
    * accumulate files-per-generation (the parquet ingest tax — more
    * file handles and footer reads per probe, same rows). This
    * rewrites each table clustered to its bucket column (one task per
    * bucket → one file per bucket), preserves the bucket spec and the
    * parameter stamps, and swaps via catalog renames. Rows, buckets
    * and probe results are unchanged — only the file count drops.
    * The rename dance is metastore-atomic per statement but not
    * overall; a crash mid-swap leaves `<t>_precompact` (the original,
    * complete) and possibly `<t>_compacting` (the new copy) for
    * manual recovery — neither generation is ever mixed or lost. */
  def compact(): Unit = {
    require(spark.catalog.tableExists(sigsTable),
      s"MinhashStore($table): nothing to compact — no index tables exist")
    requireCompatible() // refuse to touch an index from another generation
    val props = paramProps.map { case (k, v) => s"'$k'='$v'" }.mkString(", ")
    Seq(sigsTable -> "doc_id", bandsTable -> "band_hash").foreach {
      case (t, bucketCol) =>
        val tmp = s"${t}_compacting"
        val old = s"${t}_precompact"
        spark.sql(s"DROP TABLE IF EXISTS $tmp")
        spark.sql(s"DROP TABLE IF EXISTS $old")
        // a writer killed between laying files and registering the
        // catalog entry leaves an ORPHAN location that DROP TABLE
        // can't see and the CREATE below trips over — clear it
        val warehouse = spark.conf.get("spark.sql.warehouse.dir")
        val hconf = spark.sparkContext.hadoopConfiguration
        val orphan = new org.apache.hadoop.fs.Path(s"$warehouse/$tmp")
        val ofs = orphan.getFileSystem(hconf)
        if (!spark.catalog.tableExists(tmp) && ofs.exists(orphan))
          ofs.delete(orphan, true)
        // repartition on the BUCKET-ID EXPRESSION, not the raw column:
        // the bucketed source scan claims HashPartitioning(bucketCol)
        // already, so a plain repartition(nBuckets, col) gets elided —
        // while the actual file-split scan layout mixes buckets per
        // task, yielding one file per (task, bucket) again (observed:
        // 14 files for 8 buckets). Keying the exchange on
        // pmod(hash(col), nBuckets) can't be elided, and since it is a
        // function of the bucket id, every bucket lands whole in one
        // task → exactly one file per non-empty bucket.
        spark.table(t)
          .repartition(nBuckets, pmod(hash(col(bucketCol)), lit(nBuckets)))
          .write.bucketBy(nBuckets, bucketCol).format("parquet").saveAsTable(tmp)
        spark.sql(s"ALTER TABLE $tmp SET TBLPROPERTIES ($props)")
        spark.sql(s"ALTER TABLE $t RENAME TO $old")
        spark.sql(s"ALTER TABLE $tmp RENAME TO $t")
        spark.sql(s"DROP TABLE $old")
    }
  }

  /** Near-dups of `newDocs` against the INDEX: (new_id, old_id,
    * n_agree, est_jaccard), est_jaccard ≥ `minEst`. Only the new
    * batch's signatures are computed; the corpus contributes its
    * stored tables in bucket order. */
  // the most recent probe's cached result: releasing it on the NEXT
  // probe bounds this store's cache footprint at ONE result frame
  // (batch-dup-sized) instead of one per call for the session lifetime
  @volatile private var lastProbeResult: Option[DataFrame] = None

  def probe(newDocs: DataFrame, minEst: Double = 0.5): DataFrame = {
    lastProbeResult.foreach(_.unpersist(blocking = false))
    // the batch signature frame persists only for the duration of this
    // call: the result (bounded by the batch's dup count) materializes
    // eagerly below, then the signatures release — a long-lived driver
    // probing many batches must not accumulate a cached sig frame per
    // batch for the session lifetime
    val newSigs = Dedup.minhashSignatures(newDocs, n, numPerm).persist()
    val newBands = Dedup.minhashBands(newSigs, numPerm, bandSize)
    val cand = newBands.as("q")
      .join(storedBands().as("s"),
        col("q.band_hash") === col("s.band_hash") &&
          col("q.doc_id") =!= col("s.doc_id"))
      .select(col("q.doc_id").as("new_id"), col("s.doc_id").as("old_id"))
      .distinct()
    val agree = (0 until numPerm)
      .map(i => when(col(s"q.m$i") === col(s"s.m$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    val out = cand
      .join(newSigs.as("q"), col("new_id") === col("q.doc_id"))
      .join(storedSignatures().as("s"), col("old_id") === col("s.doc_id"))
      .select(col("new_id"), col("old_id"), agree.as("n_agree"))
      .withColumn("est_jaccard", col("n_agree").cast("double") / numPerm)
      .filter(col("est_jaccard") >= minEst)
      .persist()
    out.count() // materialize so the batch signatures can release now
    newSigs.unpersist(blocking = false)
    lastProbeResult = Some(out)
    out
  }
}
