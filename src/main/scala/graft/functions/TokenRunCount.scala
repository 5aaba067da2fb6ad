package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: number of maximal `[a-z0-9]+` runs in a
  * string — the token count, without the regex engine.
  *
  * `size(regexp_extract_all(lower(text), '[a-z0-9]+'))` materializes
  * every token as a fresh UTF8String inside an array just to take its
  * length (and Spark's `regexp_count` is RuntimeReplaceable to exactly
  * that plan). Token counting sits in the hottest corpus scans
  * (quality gates, corpus rollups, length calibration), where the only
  * thing needed is the COUNT — this expression is one branch-light
  * byte scan, zero allocation, inside whole-stage codegen.
  *
  * Exact equivalence with the regex on the SAME (already-lowercased)
  * input is structural: the matched class is pure ASCII, and UTF-8
  * multi-byte sequences never contain ASCII-range bytes (lead bytes
  * ≥ 0xC2, continuations 0x80-0xBF), so counting maximal ASCII-alnum
  * BYTE runs equals counting the regex's character runs on any input,
  * unicode included. Callers pass `lower(text)` (see
  * [[graft.text.TextOps.tokenCount]]) so the oracle restatement stays
  * `len(regexp_extract_all(lower(text), '[a-z0-9]+'))`.
  */
case class TokenRunCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "token_run_count"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var count = 0L
    var inRun = false
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      val alnum = (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')
      if (alnum && !inRun) count += 1
      inRun = alnum
      i += 1
    }
    count
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val bts = ctx.freshName("bts")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val inRun = ctx.freshName("inRun")
      val alnum = ctx.freshName("alnum")
      s"""
         |byte[] $bts = $a.getBytes();
         |long ${ev.value}Acc = 0L; boolean $inRun = false;
         |for (int $i = 0; $i < $bts.length; $i++) {
         |  byte $b = $bts[$i];
         |  boolean $alnum = ($b >= 'a' && $b <= 'z') || ($b >= '0' && $b <= '9');
         |  if ($alnum && !$inRun) ${ev.value}Acc++;
         |  $inRun = $alnum;
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenRunCount {
  /** Column-API entry point over an ALREADY-LOWERCASED string. */
  def apply(text: Column): Column =
    GraftShim.column(TokenRunCount(GraftShim.expression(text)))
}
