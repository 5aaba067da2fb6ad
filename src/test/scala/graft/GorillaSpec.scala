package graft

import graft.tsdb.Gorilla
import org.scalatest.funsuite.AnyFunSuite

class GorillaSpec extends AnyFunSuite {

  test("roundtrip empty / single / constant") {
    assert(Gorilla.decode(Gorilla.encode(Seq.empty)) == IndexedSeq.empty)
    val one = Seq((1704067200000000L, 42.5))
    assert(Gorilla.decode(Gorilla.encode(one)) == one.toIndexedSeq)
    val const = (0 until 100).map(i => (1704067200000000L + i * 1000000L, 7.25))
    assert(Gorilla.decode(Gorilla.encode(const)) == const)
  }

  test("roundtrip special doubles") {
    val pts = Seq(
      (0L, 0.0), (1L, -0.0), (2L, Double.MaxValue), (3L, Double.MinPositiveValue),
      (10L, Double.PositiveInfinity), (11L, Double.NegativeInfinity), (100000L, 1e-300))
    assert(Gorilla.decode(Gorilla.encode(pts)) == pts.toIndexedSeq)
    // NaN: compare bit patterns (NaN != NaN)
    val nan = Seq((1L, Double.NaN), (2L, 1.0))
    val dec = Gorilla.decode(Gorilla.encode(nan))
    assert(java.lang.Double.doubleToRawLongBits(dec(0)._2) ==
      java.lang.Double.doubleToRawLongBits(Double.NaN))
    assert(dec(1) == ((2L, 1.0)))
  }

  test("roundtrip irregular deltas hitting every dod bucket") {
    val ts = Seq(0L, 10L, 20L, 21L, 100L, 400L, 3000L, 3001L, 9000000L, 9000001L)
    val pts = ts.zipWithIndex.map { case (t, i) => (t, i * 1.7 - 3) }
    assert(Gorilla.decode(Gorilla.encode(pts)) == pts.toIndexedSeq)
  }

  test("roundtrip property: 200 random sorted series (seeded)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 200) {
      val n = rnd.nextInt(300)
      var t = 1704067200000000L
      val pts = (0 until n).map { _ =>
        t += rnd.nextInt(10000000).toLong
        val v = rnd.nextInt(4) match {
          case 0 => rnd.nextDouble() * 2e9 - 1e9
          case 1 => rnd.nextDouble() * 10 - 5
          case 2 => Seq(0.0, 1.0, -1.0, 185.22)(rnd.nextInt(4))
          case _ => java.lang.Double.longBitsToDouble(rnd.nextLong()) // any bit pattern
        }
        (t, v)
      }.filterNot(p => p._2.isNaN)
      assert(Gorilla.decode(Gorilla.encode(pts)) == pts.toIndexedSeq)
    }
  }

  test("compression beats raw for regular series") {
    val pts = (0 until 10000).map(i => (1704067200000000L + i * 15000000L, 100.0))
    val enc = Gorilla.encode(pts)
    assert(enc.length < pts.length * 16 / 10,
      s"expected >10x compression on constant series, got ${pts.length * 16}B -> ${enc.length}B")
  }
}
