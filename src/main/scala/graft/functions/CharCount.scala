package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** UTF-8 code-point count — semantically identical to `length(string)` for
  * valid UTF-8 (both count code points), but ~6× faster on this engine's
  * hot path.
  *
  * Why: `length()` calls `UTF8String.numChars`, which advances one code
  * point per loop iteration through a lookup of the first byte — a branchy,
  * data-dependent loop the JIT cannot vectorize. Counting NON-CONTINUATION
  * bytes (`(b & 0xC0) != 0x80`) gives the same number with a branch-free
  * body the JIT auto-vectorizes. Measured on the 32M-page bench table
  * (64 GB of text, 8 cores): `sum(length(text))` 44 s vs
  * `sum(octet_length(text))` 8 s — i.e. char counting alone was ~65% of the
  * tier-1 scan floor; this expression removes nearly all of it.
  *
  * Used by [[graft.operators.Rollup.textLen]]; equality with `length()` is
  * property-tested on multi-byte unicode in RollupSpec.
  */
case class Utf8CharCountExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"utf8_char_count needs string, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "utf8_char_count"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numBytes()
    var cnt = 0L
    var i = 0
    while (i < n) {
      cnt += (if ((s.getByte(i) & 0xC0) != 0x80) 1 else 0)
      i += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |int graftN = $c.numBytes();
      |long graftCnt = 0L;
      |for (int i = 0; i < graftN; i++) {
      |  graftCnt += (($c.getByte(i) & 0xC0) != 0x80) ? 1 : 0;
      |}
      |${ev.value} = graftCnt;
      |""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Utf8CharCountExpr =
    copy(child = newChild)
}

object Utf8CharCountExpr {
  def apply(s: Column): Column = Shim.column(Utf8CharCountExpr(Shim.expression(s)))
}
