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

  test("hilbertLayout: the curve is a real Hilbert curve — consecutive cells are grid-ADJACENT") {
    // a uniform 64×64 grid quantizes onto the 8×8 cell grid exactly;
    // the Hilbert property (what Z-order lacks) is that the curve
    // walks cell c → c+1 through a shared edge: |Δcx| + |Δcy| == 1
    // for ALL 63 transitions. Z-order fails this at every quadrant
    // boundary (its worst jump below spans half the grid).
    val rows = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val df = rows.toDF("x", "y")
    def centers(layout: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
      layout.select(col("cell"),
          ((col("min_x") + col("max_x")) / 2).cast("long").as("cx"),
          ((col("min_y") + col("max_y")) / 2).cast("long").as("cy"))
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val h = centers(Layout.hilbertLayout(df, "x", "y"))
    assert(h.size == 64 && h.map(_._1) == (0L until 64L))
    val hJumps = h.sliding(2).map { case Seq((_, x1, y1), (_, x2, y2)) =>
      math.abs(x2 - x1) / 8 + math.abs(y2 - y1) / 8 }.toSeq
    assert(hJumps.forall(_ == 1), s"non-adjacent hilbert transition: $hJumps")
    val z = centers(Layout.zorderLayout(df, "x", "y"))
    val zWorst = z.sliding(2).map { case Seq((_, x1, y1), (_, x2, y2)) =>
      math.abs(x2 - x1) / 8 + math.abs(y2 - y1) / 8 }.max
    assert(zWorst > 1, "sanity: z-order takes a non-adjacent jump somewhere")
    // same rows, same cell count, identical total coverage
    assert(z.size == 64)
  }
}
