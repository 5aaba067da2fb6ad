package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout engineering for multi-dimensional scan pruning — the
  * storage-side lever that makes a 100 TB table cheap to query on TWO
  * key dimensions at once. A table sorted by one key prunes min/max
  * file statistics on that key only; laid out along a Z-ORDER curve
  * (bit-interleave of both keys), every file covers a small RANGE OF
  * BOTH, so either predicate skips most files. The writer's recipe is
  * `repartitionByRange(zValue) + sortWithinPartitions(zValue)`; this
  * module computes the z-values and the evidence report that says
  * whether the layout would prune.
  *
  * Everything before the final span ratios is INTEGER arithmetic
  * (scaled 16-bit quantization by integer division, explicit
  * shift/mask interleave, z-prefix cells) — deterministic across
  * engines with no windows, no sort: one scalar max pass, one
  * map-side z computation, one cell aggregation. */
object Layout {

  /** Bit-interleave two 16-bit quantized columns into a 32-bit
    * z-value (x in odd bit positions, y in even). */
  def zInterleave(x16: Column, y16: Column): Column =
    (0 until 16).map { i =>
      (shiftright(x16, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))) +
        (shiftright(y16, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)))
    }.reduce(_ + _)

  /** Z-order layout evidence over key columns (xCol, yCol): quantize
    * each key to 16 bits by MIN-SHIFTED integer division against its
    * range+1 (so negative or offset key domains land in [0, 65535]
    * instead of scattering into wrong cells), interleave, cut the
    * z-space into 2^`log2Cells` prefix cells (the would-be files), and
    * report per-cell row counts plus min/max of BOTH raw keys and
    * their span fractions of the global ranges. Small span fractions
    * on BOTH columns = the pruning win; a single-key sort would show
    * ~1.0 on the other column. A constant key (gmax == gmin) reports
    * span 0.0 — fully pruned on that dim — rather than NaN.
    *
    * Key-range bound: the quantizer computes `(x - gmin) * 65536` in
    * BIGINT, so each key's span (gmax - gmin) must stay below 2^47
    * (~1.4e14); beyond that the multiply overflows. That covers every
    * surrogate/natural key a warehouse emits; wider domains should be
    * pre-bucketed before layout. */
  def zorderLayout(df: DataFrame, xCol: String, yCol: String,
                   log2Cells: Int = 6): DataFrame = {
    require(log2Cells >= 1 && log2Cells <= 16, "log2Cells in [1,16]")
    val ext = df.agg(
      max(col(xCol)).as("gmax_x"), min(col(xCol)).as("gmin_x"),
      max(col(yCol)).as("gmax_y"), min(col(yCol)).as("gmin_y"))
    df.select(col(xCol).as("x"), col(yCol).as("y"))
      .crossJoin(broadcast(ext))
      .withColumn("x16", expr(s"((x - gmin_x) * 65536) div (gmax_x - gmin_x + 1)"))
      .withColumn("y16", expr(s"((y - gmin_y) * 65536) div (gmax_y - gmin_y + 1)"))
      .withColumn("cell", shiftright(zInterleave(col("x16"), col("y16")),
        32 - log2Cells))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"),
        max(col("gmax_x")).as("gmax_x"), max(col("gmin_x")).as("gmin_x"),
        max(col("gmax_y")).as("gmax_y"), max(col("gmin_y")).as("gmin_y"))
      .select(col("cell"), col("n_rows"),
        col("min_x"), col("max_x"), col("min_y"), col("max_y"),
        when(col("gmax_x") > col("gmin_x"),
          (col("max_x") - col("min_x")).cast("double")
            / (col("gmax_x") - col("gmin_x")).cast("double"))
          .otherwise(lit(0.0)).as("x_span_frac"),
        when(col("gmax_y") > col("gmin_y"),
          (col("max_y") - col("min_y")).cast("double")
            / (col("gmax_y") - col("gmin_y")).cast("double"))
          .otherwise(lit(0.0)).as("y_span_frac"))
  }

  /** HILBERT-curve layout evidence — [[zorderLayout]]'s stronger
    * sibling: the Hilbert curve visits every cell of a 2^k × 2^k grid
    * through ADJACENT cells only (Z-order takes a long diagonal jump
    * between quadrant halves), so consecutive curve cells — the
    * would-be files — cover tighter key rectangles, which is strictly
    * better min/max pruning at the same file count.
    *
    * The cell id needs only the TOP k = log2Cells/2 levels of the
    * standard xy2d bit transform (Hamilton; each level contributes
    * 2 bits of curve index), so keys quantize straight to k bits and
    * the transform unrolls k ≤ 8 levels of pure integer column
    * arithmetic — bit test, conditional reflect, swap — chained
    * through per-level projections (LINEAR plan depth; inlining the
    * recursion as one expression tree would double per level). No
    * UDF, no window, no sort: the zorderLayout execution shape with a
    * different curve. `log2Cells` must be even (a Hilbert level is a
    * quadrant split — 2 bits). */
  def hilbertLayout(df: DataFrame, xCol: String, yCol: String,
                    log2Cells: Int = 6): DataFrame = {
    require(log2Cells >= 2 && log2Cells <= 16 && log2Cells % 2 == 0,
      "log2Cells even, in [2,16] — each Hilbert level is one quadrant split (2 bits)")
    val k = log2Cells / 2
    val n = 1L << k
    val ext = df.agg(
      max(col(xCol)).as("gmax_x"), min(col(xCol)).as("gmin_x"),
      max(col(yCol)).as("gmax_y"), min(col(yCol)).as("gmin_y"))
    var cur = df.select(col(xCol).as("x"), col(yCol).as("y"))
      .crossJoin(broadcast(ext))
      .withColumn("hx", expr(s"((x - gmin_x) * $n) div (gmax_x - gmin_x + 1)"))
      .withColumn("hy", expr(s"((y - gmin_y) * $n) div (gmax_y - gmin_y + 1)"))
      .withColumn("d", lit(0L))
    var s = n >> 1
    while (s > 0) {
      val rx = when(col("hx").bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L))
      val ry = when(col("hy").bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L))
      cur = cur
        .withColumn("rx", rx).withColumn("ry", ry)
        .withColumn("d", col("d") + lit(s * s) *
          (lit(3L) * col("rx")).bitwiseXOR(col("ry")))
        // rot(n, x, y, rx, ry): reflect when rx=1 inside ry=0, then swap
        .withColumn("nhx", when(col("ry") === 0,
          when(col("rx") === 1, lit(n - 1) - col("hy")).otherwise(col("hy")))
          .otherwise(col("hx")))
        .withColumn("nhy", when(col("ry") === 0,
          when(col("rx") === 1, lit(n - 1) - col("hx")).otherwise(col("hx")))
          .otherwise(col("hy")))
        .drop("hx", "hy", "rx", "ry")
        .withColumnRenamed("nhx", "hx").withColumnRenamed("nhy", "hy")
      s >>= 1
    }
    cur
      .groupBy(col("d").as("cell"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"),
        max(col("gmax_x")).as("gmax_x"), max(col("gmin_x")).as("gmin_x"),
        max(col("gmax_y")).as("gmax_y"), max(col("gmin_y")).as("gmin_y"))
      .select(col("cell"), col("n_rows"),
        col("min_x"), col("max_x"), col("min_y"), col("max_y"),
        when(col("gmax_x") > col("gmin_x"),
          (col("max_x") - col("min_x")).cast("double")
            / (col("gmax_x") - col("gmin_x")).cast("double"))
          .otherwise(lit(0.0)).as("x_span_frac"),
        when(col("gmax_y") > col("gmin_y"),
          (col("max_y") - col("min_y")).cast("double")
            / (col("gmax_y") - col("gmin_y")).cast("double"))
          .otherwise(lit(0.0)).as("y_span_frac"))
  }

  /** HASH-SHARD BALANCE audit — the pre-write check before committing
    * a partitioned layout (a skewed shard function turns one writer
    * task into the straggler that gates the whole 100 TB job; the
    * audit costs one aggregation, the bad layout costs hours). Keys
    * shard by the NATIVE Md5Prefix expression (codegen'd digest-prefix
    * — the oracle restates the composed hex-substring form it is
    * spec-pinned equal to), and each shard reports its count, share,
    * and χ²-term against the uniform expectation (total/nShards as
    * ONE fixed-shape double). Exact integers otherwise (§4). */
  def shardBalance(df: DataFrame, keyCol: String,
                   nShards: Int = 32): DataFrame = {
    require(nShards >= 2 && nShards <= 65536, s"nShards in [2, 65536], got $nShards")
    val sh = df
      .select(pmod(graft.functions.Md5Prefix(col(keyCol).cast("string"), 15),
        lit(nShards.toLong)).as("shard"))
      .groupBy(col("shard")).agg(count(lit(1)).as("n"))
    val total = sh.agg(sum(col("n")).as("total"))
    sh.crossJoin(broadcast(total))
      .withColumn("expected", col("total").cast("double") / lit(nShards))
      .select(col("shard"), col("n"),
        (col("n").cast("double") / col("total").cast("double")).as("share"),
        ((col("n").cast("double") - col("expected"))
          * (col("n").cast("double") - col("expected")) / col("expected"))
          .as("chi2_term"))
  }
}
