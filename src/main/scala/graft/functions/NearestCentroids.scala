package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native Catalyst expression for IVF coarse quantization: the `nProbe` ids
  * of the centroids most cosine-similar to a float-vector column, ordered by
  * similarity desc (ties → smaller centroid id). Centroids are plan-time
  * constants (collected driver-side — they are `nlist` vectors, tiny), so
  * the whole scan stays one narrow codegen'd pass with no join.
  *
  * Cross-engine parity contract: cosine accumulates left-to-right in double
  * precision from 0.0 (DuckDB `list_dot_product` order); a zero-norm vector
  * or centroid scores -inf (DuckDB's NULL cosine sorts last under ORDER BY
  * DESC, and the shared cid-asc tie-break makes the argmax identical).
  */
case class NearestCentroidsExpr(child: Expression, cids: Array[Long],
                                centroids: Array[Array[Double]], nProbe: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroids needs array<float>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "nearest_centroids"

  /** cos(v, centroid i); -inf when either norm is 0. */
  private def cos(arr: ArrayData, i: Int): Double = {
    val c = centroids(i)
    var dot = 0.0; var nv = 0.0; var nc = 0.0
    var d = 0
    while (d < c.length) {
      val x = arr.getFloat(d).toDouble
      dot += x * c(d); nv += x * x; nc += c(d) * c(d)
      d += 1
    }
    val nn = math.sqrt(nv) * math.sqrt(nc)
    if (nn > 0) dot / nn else Double.NegativeInfinity
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = centroids.length
    val sims = Array.tabulate(n)(i => cos(arr, i))
    val order = (0 until n).sortBy(i => (-sims(i), cids(i)))
    new GenericArrayData(order.take(nProbe).map(cids).toArray)
  }

  // interpreted eval is fine here: the expression is evaluated once per row
  // and the work (nlist × dim flops) dwarfs the eval-dispatch overhead that
  // motivated HyperplaneBucketExpr's codegen; CodegenFallback keeps it simple
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("nce", this, classOf[NearestCentroidsExpr].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.evalArray($c);")
  }

  /** Codegen entry point (public so generated code can call it). */
  def evalArray(arr: ArrayData): ArrayData = nullSafeEval(arr).asInstanceOf[ArrayData]

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidsExpr =
    copy(child = newChild)
}

object NearestCentroidsExpr {
  def apply(v: Column, cids: Seq[Long], centroids: Seq[Array[Float]], nProbe: Int): Column =
    Shim.column(NearestCentroidsExpr(Shim.expression(v), cids.toArray,
      centroids.map(_.map(_.toDouble)).toArray, nProbe))
}
