package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Full MinHash signature in ONE native pass over the shingle array.
  *
  * Element i (1-based via `element_at`) = min over shingles of
  * `md5Long("i:" ++ shingle)` — identical to the declarative
  * `array_min(transform(sh, s => md5LongSeeded(i, s)))` per column
  * ([[graft.operators.Dedup.minhashSignature]]), including the 60-bit
  * (first 15 hex digits) value and UTF-8 byte-concatenation of the seed
  * prefix. Returns null when the shingle array is empty (array_min of an
  * empty transform is null) or the input is null.
  *
  * Why native: the declarative form evaluates k independent `transform`
  * lambdas, each allocating a seed-concat string, a 32-char hex string and
  * a conv() parse per shingle — 3k allocations per shingle. Here the seed
  * prefixes are precomputed byte arrays, one thread-local digest is reused
  * across all k·|shingles| updates, and the k running minimums live in a
  * primitive array.
  */
case class MinHashSigExpr(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig needs array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinHashHelper.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.MinHashHelper.compute($c, $k);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

object MinHashSigExpr {
  def apply(shingles: Column, k: Int): Column =
    Shim.column(MinHashSigExpr(Shim.expression(shingles), k))
}

/** Static helper invoked from generated code. */
object MinHashHelper {

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  // "0:".."63:" prefix bytes, lazily extended for larger k
  @volatile private var prefixes: Array[Array[Byte]] = Array.tabulate(16)(i => s"$i:".getBytes("UTF-8"))
  private def prefix(i: Int): Array[Byte] = {
    if (i >= prefixes.length)
      synchronized { if (i >= prefixes.length)
        prefixes = Array.tabulate(math.max(i + 1, prefixes.length * 2))(j => s"$j:".getBytes("UTF-8")) }
    prefixes(i)
  }

  /** k minima of the seeded 60-bit hashes; null for an empty array. */
  def compute(shingles: ArrayData, k: Int): ArrayData = {
    val n = shingles.numElements()
    if (n == 0) return null
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val md = digests.get()
    var s = 0
    var nonNull = 0
    while (s < n) {
      if (shingles.isNullAt(s)) { s += 1 } // declarative form: md5(null)=null, skipped by array_min
      else {
      nonNull += 1
      val bytes = shingles.getUTF8String(s).getBytes
      var i = 0
      while (i < k) {
        md.reset()
        md.update(prefix(i))
        md.update(bytes)
        val d = md.digest()
        val h = (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
                 ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
                 ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
                 ((d(6) & 0xffL) << 8)  |  (d(7) & 0xffL)) >>> 4
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      s += 1
      }
    }
    if (nonNull == 0) return null // all-null elements: array_min over nulls is null
    new GenericArrayData(mins)
  }
}
