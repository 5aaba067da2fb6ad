package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Federation, RemoteRead, RemoteWrite}

/** Hostile-input fuzz for the two NETWORK-SUPPLIED decode surfaces the
  * r9 pull ecosystem opened: the text-exposition parser (bytes from
  * scrape targets / federation peers) and the remote-read RESPONSE
  * decoder (bytes from remote stores). The PromQL parser's r9 fuzz
  * found three real hostile-input bugs; these surfaces now take the
  * same class of traffic, so they get the same contract pinned:
  * every mutated/random input either parses or raises one of the
  * surface's TYPED errors — never a hang, an unclassified exception,
  * an unbounded allocation, or a silently half-parsed sample landing
  * under the wrong series id.
  *
  * No SparkSession needed: both surfaces are plain-JVM parsers (the
  * distributed part of federation is the slice fan-out, not the
  * per-page decode).
  */
class FedFuzzSpec extends AnyFunSuite {

  private val defaultTs = 1704067200000000L

  /** The exposition surface's typed-error contract: IOException for
    * malformed pages (the parser's own loud error), NumberFormat /
    * IllegalArgument for hostile numerics (value or timestamp
    * overflow through the JDK parsers). Anything else is a bug. */
  private def checkExposition(page: String): Unit =
    try { Federation.parseExposition(page, defaultTs).foreach(_ => ()); () }
    catch {
      case _: java.io.IOException => ()
      case _: IllegalArgumentException => () // includes NumberFormatException
      case e: Throwable =>
        fail(s"unexpected ${e.getClass.getName}: ${e.getMessage} on page " +
          s"'${page.take(80).replace("\n", "\\n")}'")
    }

  private val validPage =
    """# HELP http_requests_total requests
      |# TYPE http_requests_total counter
      |http_requests_total{method="get",code="200"} 1027 1395066363
      |http_requests_total{method="post",code="200"} 3 1395066363
      |msdos_file_access_time{path="C:\\DIR\\FILE.TXT",error="Cannot find file:\n\"FILE.TXT\""} 1.458255915e9
      |metric_without_labels 12.47
      |something_weird{problem="division by zero"} +Inf -3982045
      |no_timestamp_metric{a="b"} NaN
      |""".stripMargin

  test("exposition fuzz: 1000+ random and mutated pages never hang, never escape the typed errors") {
    // the valid page parses in full (sanity before mutating it)
    assert(Federation.parseExposition(validPage, defaultTs).size == 6)

    val rnd = new scala.util.Random(1042)
    // 1) raw random text (hostile non-exposition pages)
    val alphabet = "abz_:{}=\",\\ \n\t0129.+-eEINf#"
    for (_ <- 0 until 400) {
      val page = (0 until rnd.nextInt(120)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      checkExposition(page)
    }
    // 2) single-char mutations of the valid page — quotes, escapes,
    //    braces, separators and digits all get corrupted somewhere
    for (_ <- 0 until 500) {
      val chars = validPage.toCharArray
      chars(rnd.nextInt(chars.length)) = alphabet(rnd.nextInt(alphabet.length))
      checkExposition(new String(chars))
    }
    // 3) random binary bytes decoded as UTF-8 (a scrape target serving
    //    a gzip page or an image under a /metrics route)
    for (_ <- 0 until 200) {
      val b = new Array[Byte](rnd.nextInt(150))
      rnd.nextBytes(b)
      checkExposition(new String(b, "UTF-8"))
    }
  }

  test("exposition hostile numerics and structure: typed refusals, no silent half-parse") {
    // timestamp overflow: 20 digits pass the regex, overflow Long.parse
    checkExposition("m 1 99999999999999999999")
    intercept[Throwable](Federation.parseExposition(
      "m 1 99999999999999999999", defaultTs).toList)
    // label section with residue (unquoted value) must refuse the LINE,
    // not drop the pair — a dropped pair lands the sample under the
    // wrong canonical series id
    val e = intercept[java.io.IOException](Federation.parseExposition(
      "m{a=unquoted,b=\"ok\"} 1", defaultTs).toList)
    assert(e.getMessage.contains("label"), e.getMessage)
    // unterminated quote: same loud refusal
    intercept[java.io.IOException](Federation.parseExposition(
      "m{a=\"never closed} 1", defaultTs).toList)
    // a stray token after the label section
    intercept[java.io.IOException](Federation.parseExposition(
      "m{a=\"x\" junk} 1", defaultTs).toList)
    // garbage value is a refusal, not 0.0
    intercept[Throwable](Federation.parseExposition("m ,,, ", defaultTs).toList)
    // a 1 MB single-line page parses (bounded by input size) — size is
    // not a parser failure mode
    val big = "m{k=\"" + "v" * 1000000 + "\"} 1\n"
    assert(Federation.parseExposition(big, defaultTs).size == 1)
  }

  test("remote-read response decoder fuzz: random, mutated and snappy-corrupt payloads stay typed") {
    val rnd = new scala.util.Random(77)
    def check(b: Array[Byte]): Unit =
      try { RemoteRead.decodeResponse(b); () } catch {
        case _: IllegalArgumentException => () // the wire's typed decode error
        case e: Throwable =>
          fail(s"unexpected ${e.getClass.getName}: ${e.getMessage}")
      }
    // raw random buffers straight into the snappy+proto stack
    for (_ <- 0 until 400) {
      val b = new Array[Byte](rnd.nextInt(160))
      rnd.nextBytes(b)
      check(b)
    }
    // single-byte mutations of a VALID response payload
    val good = RemoteRead.encodeResponse(Seq(Seq(
      (Map("event_type" -> "click", "user_id" -> "1"),
        Seq((1704067200000L, 1.5), (1704067260000L, 2.5))))))
    var survived = 0
    for (_ <- 0 until 600) {
      val b = good.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      try { RemoteRead.decodeResponse(b); survived += 1 } catch {
        case _: IllegalArgumentException => ()
        case e: Throwable =>
          fail(s"unexpected ${e.getClass.getName}: ${e.getMessage}")
      }
    }
    // snappy is checksummed enough that SOME mutations die there, and
    // proto skip-fields let SOME survive — both paths must be exercised
    assert(survived > 0 && survived < 600, s"survived=$survived")
    // hostile uncompressed-length header: refused by the cap before any
    // giant allocation (same contract as the write path)
    val hostile = Array[Byte](-1, -1, -1, 127) // varint ~268M+ claimed length
    intercept[IllegalArgumentException](RemoteRead.decodeResponse(hostile))
  }
}
