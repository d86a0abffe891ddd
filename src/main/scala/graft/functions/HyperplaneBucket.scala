package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native Catalyst expression for the sign-LSH bucket of a float-vector
  * column against a fixed set of ±1 hyperplanes: bit j of the result is 1
  * iff Σ_d signs(j)(d)·v(d) ≥ 0, the sum accumulated left-to-right in double
  * precision from 0.0 — bit-identical to DuckDB's sequential
  * `list_dot_product`, so the oracle derives the same buckets.
  *
  * Why a custom Expression (SURVEY.md §2.11 preference order): the
  * declarative formulations both lose —
  *   - `aggregate(zip_with(v, lit(signs), *), 0.0, +)`: higher-order
  *     functions are CodegenFallback, interpreted per element;
  *   - unrolling `element_at` sums: bits×dim literal nodes per call (512 at
  *     8×64), and the LSH self-join duplicates that subtree 4-6× in the
  *     plan — measured 42 s of analysis/codegen for a 1000-row input.
  * This node is ONE reference-carrying expression: compact to analyze, and
  * `doGenCode` emits a tight primitive loop inside whole-stage codegen.
  */
case class HyperplaneBucketExpr(child: Expression, signs: Array[Array[Double]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_bucket needs array<float>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_bucket"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var bucket = 0L
    var j = 0
    while (j < signs.length) {
      val sj = signs(j)
      var p = 0.0
      var d = 0
      while (d < sj.length) { p += sj(d) * arr.getFloat(d); d += 1 }
      if (p >= 0.0) bucket |= (1L << j)
      j += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("signs", signs, "double[][]")
    nullSafeCodeGen(ctx, ev, c => s"""
      |long graftBucket = 0L;
      |for (int j = 0; j < $signsRef.length; j++) {
      |  double[] sj = $signsRef[j];
      |  double p = 0.0;
      |  for (int d = 0; d < sj.length; d++) { p += sj[d] * (double) $c.getFloat(d); }
      |  if (p >= 0.0) graftBucket |= (1L << j);
      |}
      |${ev.value} = graftBucket;
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucketExpr =
    copy(child = newChild)
}

object HyperplaneBucketExpr {
  def apply(v: Column, signs: Seq[Seq[Double]]): Column =
    Shim.column(
      HyperplaneBucketExpr(Shim.expression(v), signs.map(_.toArray).toArray))
}
