package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the first `nHexDigits` hex digits of
  * md5(input) as an unsigned LONG — bit-identical to
  * `conv(substring(md5(x), 1, n), 16, 10)`, the engine-wide "numeric
  * hash for LONG-keyed shuffles" idiom (minhash shingle hash, document
  * fingerprint, KMV sample hash).
  *
  * The composed form materializes a 32-char hex string per row, slices
  * it, and re-parses the slice through base conversion — three string
  * allocations to extract bits the digest already holds. This
  * expression reads the nibbles straight off the digest bytes: one
  * MessageDigest (held in codegen mutable state, reset per row), zero
  * string traffic. It replaces the idiom ONLY where the hash value is
  * consumed numerically; string hashes that are stored or joined at
  * rest (MinhashStore band_hash) keep their md5-hex form — an at-rest
  * format is a compatibility contract, not a hot path.
  *
  * `nHexDigits` ≤ 15 so the value stays non-negative in a LONG (the
  * oracle's DuckDB conv() parses the same digits unsigned).
  */
case class Md5Prefix(child: Expression, nHexDigits: Int) extends UnaryExpression {
  require(nHexDigits > 0 && nHexDigits <= 15, s"nHexDigits=$nHexDigits not in [1,15]")

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix"

  // ThreadLocal, not a shared instance: MessageDigest is stateful, and
  // while Spark deserializes one plan per task today, a driver-side
  // same-instance eval from two threads would corrupt hashes silently.
  // Spark's own digest expressions allocate defensively for this reason.
  @transient private lazy val md =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  override def nullSafeEval(input: Any): Any = {
    val digest = md.get()
    digest.reset()
    val d = digest.digest(input.asInstanceOf[UTF8String].getBytes)
    var v = 0L
    var i = 0
    while (i < nHexDigits) {
      val b = d(i / 2) & 0xff
      v = (v << 4) | (if (i % 2 == 0) b >>> 4 else b & 0xf)
      i += 1
    }
    v
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mdRef = ctx.addMutableState("java.security.MessageDigest", "md5prefixMd",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }
              |""".stripMargin)
    nullSafeCodeGen(ctx, ev, a => {
      val d = ctx.freshName("digest")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      s"""
         |$mdRef.reset();
         |byte[] $d = $mdRef.digest($a.getBytes());
         |long ${ev.value}Acc = 0L;
         |for (int $i = 0; $i < $nHexDigits; $i++) {
         |  int $b = $d[$i / 2] & 0xff;
         |  ${ev.value}Acc = (${ev.value}Acc << 4) | (($i % 2 == 0) ? ($b >>> 4) : ($b & 0xf));
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Prefix {
  /** Column-API entry point; input is cast to string like md5() would. */
  def apply(c: Column, nHexDigits: Int): Column =
    GraftShim.column(Md5Prefix(GraftShim.expression(c.cast("string")), nHexDigits))
}
