package graft

import org.apache.spark.sql.SparkSession
import graft.tsdb._

/** TEMP dev probe — not part of the library surface (deleted before
  * round close). Splits promql_rollup into build vs serve. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val T0 = 1704067200000000L
    val T1 = 1704412800000000L
    def time[A](label: String)(f: => A): A = {
      val t = System.nanoTime(); val r = f
      println(f"SCRATCH $label: ${(System.nanoTime() - t) / 1e9}%.2f s"); r
    }
    // warmup
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    (1 to 2).foreach { i =>
      val store = time(s"build$i: new+append") {
        val st = new ChunkStore(spark,
          java.nio.file.Files.createTempDirectory("graft_scr").toString,
          chunkMs = 86400000L, filesPerChunkPerAppend = 2, rollupOnClose = true)
        st.append(Series.samples(spark.read.parquet(s"$dir/events.parquet")))
        st
      }
      time(s"build$i: close")(store.closeChunksBelow(T1))
      time(s"serve$i: queryRollup noop") {
        store.queryRollup(Seq(MatchEq("event_type", "view")), T0, T1 - 1)
          .write.format("noop").mode("overwrite").save()
      }
      time(s"serve$i: catalog noop") {
        store.catalog().write.format("noop").mode("overwrite").save()
      }
      time(s"serve$i: evalStoreRangeRollup") {
        graft.promql.PromQL.evalStoreRangeRollup(store,
          """sum by (event_type) (sum_over_time({event_type=~"view|click"}[12h]))""",
          T0 + 43200000000L, T0 + 259200000000L, 43200000000L)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
