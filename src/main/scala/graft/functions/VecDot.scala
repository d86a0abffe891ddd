package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd dot product over two float/double arrays — the hot
  * kernel of every vector-similarity operator in [[graft.operators.Similarity]].
  *
  * Semantics are BIT-IDENTICAL to the declarative HOF formulation
  * `aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0.0, +)`:
  * each element is widened to double BEFORE the multiply, terms accumulate
  * left-to-right from 0.0 (oracle-identical order), NULL if either array
  * is NULL, lengths differ (zip_with's null padding poisons the HOF sum),
  * or any element is NULL. Parity is property-tested in
  * DedupSimilaritySpec.
  *
  * Why native: higher-order functions run INTERPRETED inside codegen'd
  * stages — per pair the HOF allocates a lambda frame per element and
  * boxes every term. On the 2k×2k reciprocal-best-match self-join (4M
  * pairs × 64 dims) the HOF formulation measured 192 s (3 HOFs/pair) /
  * 43 s (1 HOF/pair); this expression is a tight primitive loop the JIT
  * can unroll.
  */
case class FloatDotExpr(left: Expression, right: Expression) extends BinaryExpression {

  private def ok(t: DataType) = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot needs array<float|double> args, got ${left.dataType.catalogString}, " +
        s"${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  private def elemIsDouble(t: DataType): Boolean =
    t.asInstanceOf[ArrayType].elementType == DoubleType

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null
    val ad = elemIsDouble(left.dataType)
    val bd = elemIsDouble(right.dataType)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (ad) a.getDouble(i) else a.getFloat(i).toDouble
      val y = if (bd) b.getDouble(i) else b.getFloat(i).toDouble
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aGet = if (elemIsDouble(left.dataType)) "getDouble" else "getFloat"
    val bGet = if (elemIsDouble(right.dataType)) "getDouble" else "getFloat"
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |int graftN = $a.numElements();
      |if ($b.numElements() != graftN) {
      |  ${ev.isNull} = true;
      |} else {
      |  double graftAcc = 0.0;
      |  for (int i = 0; i < graftN; i++) {
      |    if ($a.isNullAt(i) || $b.isNullAt(i)) { ${ev.isNull} = true; break; }
      |    graftAcc += (double) $a.$aGet(i) * (double) $b.$bGet(i);
      |  }
      |  if (!${ev.isNull}) { ${ev.value} = graftAcc; }
      |}
      |""".stripMargin)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): FloatDotExpr =
    copy(left = newLeft, right = newRight)
}

object FloatDotExpr {
  def apply(a: Column, b: Column): Column =
    Shim.column(FloatDotExpr(Shim.expression(a), Shim.expression(b)))
}
