package graft

import graft.analytics.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zInterleave places x bits odd, y bits even") {
    val out = Seq((3L, 1L), (0L, 0L), (65535L, 0L), (0L, 65535L))
      .toDF("x", "y")
      .select(Layout.zInterleave(col("x"), col("y")).as("z"))
      .as[Long].collect().toSeq
    // x=0b11,y=0b01 → z=0b1011 = 11
    assert(out(0) == 11L, out)
    assert(out(1) == 0L)
    assert(out(2) == 0xAAAAAAAAL, s"all-x pattern: ${out(2).toHexString}")
    assert(out(3) == 0x55555555L, s"all-y pattern: ${out(3).toHexString}")
  }

  test("zorderLayout: cells partition the rows and bound BOTH key spans") {
    // a dense 64×64 grid of keys: with 64 z-cells each cell must cover
    // a 8×8-ish tile — both span fractions far below a linear layout's
    val rows = for (x <- 1L to 64L; y <- 1L to 64L) yield (x, y)
    val out = Layout.zorderLayout(rows.toDF("x", "y"), "x", "y")
    val stats = out.agg(sum(col("n_rows")), max(col("x_span_frac")),
        max(col("y_span_frac")), count(lit(1)))
      .as[(Long, Double, Double, Long)].head()
    assert(stats._1 == 64L * 64L, "cells must partition the rows")
    assert(stats._4 == 64L)
    assert(stats._2 <= 0.2 && stats._3 <= 0.2,
      s"a z-cell leaked across a wide key range: $stats")
  }

  test("zorderLayout: a single-key sort layout would NOT bound the other key") {
    // same grid laid out by x only (y ignored): per-file y span = full.
    // Checked through the same report by interleaving x with a constant
    val rows = for (x <- 1L to 64L; y <- 1L to 64L) yield (x, y, 1L)
    val linear = Layout.zorderLayout(rows.toDF("x", "y", "c")
      .select(col("x"), col("y"), col("c").as("yy")), "x", "x")
    // degenerate check via the real report: group the grid by x-cells only
    val byX = rows.toDF("x", "y", "c")
      .groupBy((col("x") * 64 / 65).cast("long").as("cell"))
      .agg(((max(col("y")) - min(col("y"))).cast("double") / 63.0).as("y_span"))
      .agg(min(col("y_span"))).as[Double].head()
    assert(byX == 1.0, "sanity: x-sorted files span the full y range")
    assert(linear.count() > 0)
  }
}
