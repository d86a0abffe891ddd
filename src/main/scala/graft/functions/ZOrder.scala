package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for write-time data clustering — the
  * standard lakehouse layout technique (public: Morton 1966; Z-ordering as
  * used by Iceberg/Delta table optimizers) realized as pure codegen'd
  * integer bit arithmetic, no UDF.
  *
  * Why: the tier store partitions by (day, host_bucket), but WITHIN a
  * partition parquet prunes by row-group min/max. A file sorted by one
  * column alone gives tight ranges on that column and useless ones on the
  * other; sorting by the interleaved key gives every row group a bounded
  * range on BOTH dimensions, so two-dimensional point/range reads (one
  * host over one hour; one bucket across hosts) prune row groups instead
  * of scanning the partition. Usage is one narrow projection before the
  * write sort:
  * {{{
  *   df.withColumn("z", ZOrder.interleave(col("host_bucket"), col("minute")))
  *     .sortWithinPartitions("z")
  * }}}
  *
  * [[interleave]] packs two 32-bit non-negative ints into one 64-bit key
  * (a in even bits, b in odd bits) with the classic magic-mask spreading —
  * five shift-or-mask steps per operand, all `Column` arithmetic. The q197
  * oracle replays the identical steps in SQL; ZOrderSpec pins the
  * bit-exact roundtrip and the locality property (2^k-aligned boxes are
  * contiguous key ranges).
  */
object ZOrder {

  /** Spread the low 32 bits of x to the even bit positions of a long. */
  private def spread(x: Column): Column = {
    val masks = Seq(
      (16, 0x0000FFFF0000FFFFL),
      (8, 0x00FF00FF00FF00FFL),
      (4, 0x0F0F0F0F0F0F0F0FL),
      (2, 0x3333333333333333L),
      (1, 0x5555555555555555L))
    masks.foldLeft(x.bitwiseAND(lit(0xFFFFFFFFL))) { case (c, (s, m)) =>
      (c.bitwiseOR(shiftleft(c, s))).bitwiseAND(lit(m))
    }
  }

  /** Morton key of two non-negative ints < 2^31: a on even bits, b on odd.
    * Monotone in each argument with the other fixed; 2^k-aligned square
    * boxes map to contiguous key ranges (the locality property row-group
    * pruning relies on).
    */
  def interleave(a: Column, b: Column): Column =
    spread(a.cast("long")).bitwiseOR(shiftleft(spread(b.cast("long")), 1))

  /** Inverse of [[spread]] — test/debug surface for the roundtrip spec. */
  private[graft] def compact32(z: Long): Long = {
    var x = z & 0x5555555555555555L
    x = (x | (x >> 1)) & 0x3333333333333333L
    x = (x | (x >> 2)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x >> 4)) & 0x00FF00FF00FF00FFL
    x = (x | (x >> 8)) & 0x0000FFFF0000FFFFL
    x = (x | (x >> 16)) & 0x00000000FFFFFFFFL
    x
  }

  /** JVM-side deinterleave: (a, b) back from a Morton key. */
  private[graft] def deinterleave(z: Long): (Long, Long) =
    (compact32(z), compact32(z >>> 1))
}
