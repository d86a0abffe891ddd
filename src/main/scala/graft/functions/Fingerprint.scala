package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Bottom-k winnowing fingerprint as ONE native pass over the UTF-8 bytes.
  *
  * Semantics (the oracle contract, identical to the declarative HOF
  * formulation it replaces — see [[graft.operators.TextAnalysis.fingerprint]]):
  * the k smallest DISTINCT values of `md5Long(text.substr(i, n))` over every
  * n-CHARACTER window of the text, ascending; null when the text has fewer
  * than n characters. `md5Long(s)` = first 15 hex digits of md5 = top 60
  * bits of the digest of the window's UTF-8 bytes.
  *
  * Why native: the HOF pipeline (`transform(sequence(...), i =>
  * conv(substring(md5(substr(text,i,n)),1,15),16,10))` + `array_sort` +
  * `array_distinct` + `slice`) allocates ~4 intermediate strings per window
  * plus the full hash array per row — ~100M windows on the sf0.1 corpus,
  * 15 s warm at 32 cores, all constant-factor overhead around the digest.
  * This expression walks code-point boundaries once, reuses a thread-local
  * MessageDigest, keeps the running bottom-k in a k-length insertion array,
  * and allocates only the final k-element result — same answer, ~5× less
  * work per window (measured in BENCH: q42 15.3 s → see commit).
  */
case class FingerprintExpr(child: Expression, k: Int, n: Int) extends UnaryExpression {

  // fail at construction, not with an ArrayIndexOutOfBounds inside codegen:
  // FingerprintHelper.compute assumes k >= 1 (bottom(filled-1) read) and
  // allocates Array(k)/windows of n
  require(k >= 1, s"fingerprint k must be >= 1, got $k")
  require(n >= 1, s"fingerprint window n must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"fingerprint needs string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "bottomk_fingerprint"

  override protected def nullSafeEval(input: Any): Any =
    FingerprintHelper.compute(input.asInstanceOf[UTF8String], k, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.FingerprintHelper.compute($c, $k, $n);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): FingerprintExpr =
    copy(child = newChild)
}

object FingerprintExpr {
  def apply(text: Column, k: Int, n: Int): Column =
    Shim.column(FingerprintExpr(Shim.expression(text), k, n))
}

/** Static helpers invoked from generated code (top-level object → static
  * forwarders; callable from Janino without Scala module plumbing).
  */
object FingerprintHelper {

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Bottom-k distinct 60-bit window hashes, ascending; null if < n chars. */
  def compute(text: UTF8String, k: Int, n: Int): ArrayData = {
    val bytes = text.getBytes // copy only when not array-backed at offset
    val len = bytes.length
    // code-point start offsets (number of chars = number of non-continuation bytes)
    var chars = 0
    var i = 0
    while (i < len) {
      if ((bytes(i) & 0xC0) != 0x80) chars += 1
      i += 1
    }
    if (chars < n) return null
    val starts = new Array[Int](chars + 1)
    var c = 0
    i = 0
    while (i < len) {
      if ((bytes(i) & 0xC0) != 0x80) { starts(c) = i; c += 1 }
      i += 1
    }
    starts(chars) = len

    val md = digests.get()
    // running bottom-k distinct, sorted ascending in a k-length array
    val bottom = new Array[Long](k)
    var filled = 0
    var w = 0
    val nWindows = chars - n + 1
    while (w < nWindows) {
      md.reset()
      md.update(bytes, starts(w), starts(w + n) - starts(w))
      val d = md.digest()
      // first 15 hex digits = top 60 bits of the digest, big-endian
      val h = (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
               ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
               ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
               ((d(6) & 0xffL) << 8)  |  (d(7) & 0xffL)) >>> 4
      // insert if smaller than current max and not already present
      if (filled < k || h < bottom(filled - 1)) {
        var p = 0
        while (p < filled && bottom(p) < h) p += 1
        if (p == filled || bottom(p) != h) { // distinct
          val upto = if (filled < k) filled else k - 1
          var q = upto
          while (q > p) { bottom(q) = bottom(q - 1); q -= 1 }
          bottom(p) = h
          if (filled < k) filled += 1
        }
      }
      w += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(bottom, filled))
  }
}
