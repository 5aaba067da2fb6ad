package graft

import graft.vector.VectorOps
import org.apache.spark.sql.functions._

/** IVF-PQ residual ADC pinned against an INDEPENDENT plain-Scala
  * reference model (same id conventions, same micro-unit rounding,
  * loops instead of plans) plus the structural invariants an IVFADC
  * serving path must honor. */
class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random corpus: 24 vectors in R^8, fixed seed
  private val dim = 8
  private val nCells = 4
  private val kCodes = 4
  private val nQueries = 2
  private val m = 2
  private val subDim = dim / m
  private lazy val vecs: Map[Long, Array[Double]] = {
    val rnd = new scala.util.Random(42)
    (0L until 24L).map(i => i -> Array.fill(dim)(rnd.nextDouble() * 2 - 1)).toMap
  }
  private lazy val corpus =
    vecs.toSeq.sortBy(_._1).toDF("vec_id", "v")

  private def r6(x: Double): Long =
    java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()
  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }; s
  }
  private def cos6(a: Array[Double], b: Array[Double]): Long =
    r6(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))
  private def d2u(a: Array[Double], b: Array[Double]): Long =
    r6(dot(a, a) + dot(b, b) - 2.0 * dot(a, b))
  private def sub(v: Array[Double], s: Int): Array[Double] =
    v.slice(s * subDim, (s + 1) * subDim)

  /** The reference model: assign, residual-encode, probe, per-cell
    * tables, ADC, rank — nested loops, no Spark. */
  private def reference(k: Int, nProbe: Int): Seq[(Long, Long, Double, Long)] = {
    val cents = (0L until nCells.toLong).map(i => i -> vecs(i)).toMap
    def assign(v: Array[Double]): Long =
      cents.toSeq.map { case (c, cv) => (cos6(v, cv), c) }
        .maxBy { case (cs, c) => (cs, -c) }._2
    val cell = vecs.map { case (id, v) => id -> assign(v) }
    val resid = vecs.map { case (id, v) =>
      id -> v.zip(cents(cell(id))).map { case (a, b) => a - b }
    }
    // codebook: residuals of ids [nCells, nCells+kCodes)
    val cb = (0 until kCodes).map { c =>
      c.toLong -> resid(nCells.toLong + c)
    }.toMap
    val codes = resid.map { case (id, r) =>
      id -> (0 until m).map { s =>
        cb.toSeq.map { case (c, cr) => (d2u(sub(r, s), sub(cr, s)), c) }
          .minBy { case (du, c) => (du, c) }._2
      }
    }
    val qLo = nCells + kCodes
    (qLo.toLong until (qLo + nQueries).toLong).flatMap { q =>
      val qv = vecs(q)
      val probed = cents.toSeq.map { case (c, cv) => (cos6(qv, cv), c) }
        .sortBy { case (cs, c) => (-cs, c) }.take(nProbe).map(_._2).toSet
      val cands = vecs.keys.filter(id => id != q && probed.contains(cell(id)))
      val scored = cands.map { id =>
        val qr = qv.zip(cents(cell(id))).map { case (a, b) => a - b }
        val micro = (0 until m).map { s =>
          d2u(sub(qr, s), sub(cb(codes(id)(s)), s))
        }.sum
        (id, micro)
      }.toSeq
      scored.sortBy { case (id, micro) => (micro, id) }.take(k)
        .zipWithIndex.map { case ((id, micro), i) =>
          (q, id, java.math.BigDecimal.valueOf(micro, 6).doubleValue(),
            (i + 1).toLong)
        }
    }
  }

  test("ivfPqTopK == the independent reference model (assign/encode/probe/ADC/rank)") {
    val k = 5
    val got = VectorOps.ivfPqTopK(corpus, nQueries, k, nCells, nProbe = 2,
        m, kCodes, dim)
      .select("q_id", "vec_id", "adc_dist", "rank")
      .as[(Long, Long, Double, Long)].collect()
      .sortBy(r => (r._1, r._4)).toSeq
    val expect = reference(k, nProbe = 2)
    assert(got == expect, s"\ngot    $got\nexpect $expect")
  }

  test("candidates come only from probed cells; full probe covers the corpus") {
    // nProbe = nCells: every non-query vector is a candidate, so each
    // query returns exactly min(k, 23) rows with dense ranks
    val all = VectorOps.ivfPqTopK(corpus, nQueries, 30, nCells,
        nProbe = nCells, m, kCodes, dim)
      .groupBy("q_id").agg(count(lit(1)).as("n"), max("rank").as("mx"))
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(all == Seq((8L, 23L, 23L), (9L, 23L, 23L)))
    // nProbe = 1: strictly fewer candidates than the full probe, and
    // each returned vec sits in the query's single nearest cell (the
    // reference model's probe set)
    val one = VectorOps.ivfPqTopK(corpus, nQueries, 30, nCells,
        nProbe = 1, m, kCodes, dim)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSeq
    val ref = reference(30, nProbe = 1).map(r => (r._1, r._2)).toSet
    assert(one.nonEmpty && one.size < 2 * 23 && one.toSet == ref)
  }
}
