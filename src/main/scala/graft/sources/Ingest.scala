package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Alternative event sources. The reference ingests protobuf over
  * HTTP (Prometheus remote write, src/server.rs); a Spark library's
  * equivalent surface is schema-enforced readers for the common wire
  * dumps (JSON-lines, CSV) that feed the same normalization path
  * ([[graft.tsdb.Series.samples]]) as the parquet tables.
  */
object Ingest {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** JSON-lines events. Explicit schema: no sampling pass, no type
    * drift — at 100 TB a schema-inference pre-scan is a non-starter. */
  def eventsFromJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(eventSchema).json(path)

  def eventsFromCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(eventSchema)
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
      .csv(path)

  /** Streaming variant of the JSON source (file-arrival ingest). */
  def eventsStreamFromJsonl(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).json(dir)

  /** Wire-dump schema with event time as epoch MICROS — the format a
    * JSONL export should actually use: integer micros survive any
    * JSON writer/parser bit-exactly, where timestamp STRINGS invite
    * timezone/fraction-format drift between producers. */
  val eventMicrosSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts_us", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** Export events as JSON-lines with epoch-micros time (one pass,
    * normalizes any physical ts type through [[graft.tsdb.Series
    * .tsUs]]). Doubles survive the text hop losslessly — the writer
    * emits shortest-round-trip representations. */
  def writeJsonlMicros(events: DataFrame, path: String): Unit =
    events.select(
      org.apache.spark.sql.functions.col("event_id"),
      graft.tsdb.Series.tsUs(events).as("ts_us"),
      org.apache.spark.sql.functions.col("user_id"),
      org.apache.spark.sql.functions.col("event_type"),
      org.apache.spark.sql.functions.col("value"))
      .write.mode("overwrite").json(path)

  def eventsFromJsonlMicros(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(eventMicrosSchema).json(path)

  /** [[writeJsonlMicros]] with DETERMINISTIC corruption injected:
    * every record whose event_id ≡ 0 (mod `nth`) loses its last two
    * characters (the closing digit + brace — always invalid JSON).
    * The test harness for the PERMISSIVE ingest path: a real wire
    * feed always contains some malformed lines, and a loader that
    * aborts (FAILFAST) or silently drops them both lose data. */
  def writeJsonlCorrupted(events: DataFrame, path: String,
                          nth: Long = 10L): Unit =
    events.select(
      org.apache.spark.sql.functions.to_json(
        org.apache.spark.sql.functions.struct(
          org.apache.spark.sql.functions.col("event_id"),
          graft.tsdb.Series.tsUs(events).as("ts_us"),
          org.apache.spark.sql.functions.col("user_id"),
          org.apache.spark.sql.functions.col("event_type"),
          org.apache.spark.sql.functions.col("value"))).as("j"),
      org.apache.spark.sql.functions.col("event_id"))
      .select(org.apache.spark.sql.functions.when(
        org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.col("event_id"),
          org.apache.spark.sql.functions.lit(nth)) === 0,
        org.apache.spark.sql.functions.expr("substring(j, 1, length(j) - 2)"))
        .otherwise(org.apache.spark.sql.functions.col("j")).as("value"))
      .write.mode("overwrite").text(path)

  /** PERMISSIVE read of a possibly-corrupt JSONL feed: malformed
    * lines land with every data field NULL and the raw line in
    * `_corrupt` — nothing aborts, nothing silently drops, and the
    * corrupt mass is COUNTABLE (the dead-letter accounting a 100 TB
    * feed needs before anyone trusts its row counts). */
  def eventsFromJsonlPermissive(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(StructType(eventMicrosSchema.fields :+
        StructField("_corrupt", StringType)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)

  /** CSV sibling of [[writeJsonlMicros]] — the other wire dump every
    * pipeline eventually receives. Same epoch-micros discipline;
    * doubles survive the text hop via shortest-round-trip repr. */
  def writeCsvMicros(events: DataFrame, path: String): Unit =
    events.select(
      org.apache.spark.sql.functions.col("event_id"),
      graft.tsdb.Series.tsUs(events).as("ts_us"),
      org.apache.spark.sql.functions.col("user_id"),
      org.apache.spark.sql.functions.col("event_type"),
      org.apache.spark.sql.functions.col("value"))
      .write.mode("overwrite").option("header", "true").csv(path)

  def eventsFromCsvMicros(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(eventMicrosSchema).option("header", "true").csv(path)

  /** ORC wire hop — the second columnar at-rest format next to the
    * parquet mainline (exchange with Hive/Trino estates ships ORC).
    * Same micros discipline as the text hops: epoch-micros LONG time
    * (ORC's own timestamp semantics stay out of the gate), explicit
    * schema on read. Being binary-columnar the roundtrip is exact by
    * construction — the gate proves the plumbing (writer version,
    * schema binding, predicate-compatible layout), not float
    * formatting. */
  def writeOrcMicros(events: DataFrame, path: String): Unit =
    events.select(
      org.apache.spark.sql.functions.col("event_id"),
      graft.tsdb.Series.tsUs(events).as("ts_us"),
      org.apache.spark.sql.functions.col("user_id"),
      org.apache.spark.sql.functions.col("event_type"),
      org.apache.spark.sql.functions.col("value"))
      .write.mode("overwrite").orc(path)

  def eventsFromOrcMicros(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(eventMicrosSchema).orc(path)

  /** Schema-evolution read over a parquet lineage: older partitions
    * may lack columns that newer ones carry (a pipeline that added a
    * `props` field mid-history). `mergeSchema` unions the file
    * footers' schemas — a metadata-only operation — and fills missing
    * columns with null, so one scan spans the whole history without
    * rewriting old data. */
  def eventsEvolved(spark: SparkSession, paths: String*): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(paths: _*)
}
