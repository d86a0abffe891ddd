package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward, inclusive) join: attach to every left row the most
  * recent right row with the same keys and `right.ts <= left.ts`.
  *
  * The reference joins feature frames back onto the sample frame strictly on
  * exact (hierarchy, datetime) keys (/root/reference/forecastframe/utilities.py
  * `_join_on_index` pattern); an as-of join is the generalization a
  * time-series engine needs when the two sides tick at different rates
  * (events vs dimension snapshots, trades vs quotes).
  *
  * Scale design — NOT a range join. The naive formulations die at 100 TB:
  *   - `l JOIN r ON l.k = r.k AND r.ts <= l.ts` + argmax explodes to
  *     |l_k|×|r_k| rows per key before pruning;
  *   - a broadcast range join requires the right side to fit in memory.
  * Instead: tag both sides, UNION them (column-aligned), and LOCF the right
  * side's row — as ONE struct, so all attached columns always come from the
  * SAME matched row even when some of its fields are null — forward over a
  * single window partitioned by the keys and ordered by (ts, side-tag).
  * That is ONE shuffle on the join keys, the same cost as an equi-join,
  * regardless of how unaligned the timestamps are. Ties
  * (right.ts == left.ts): the right row sorts first (tag 0 < 1), so an
  * exactly-simultaneous snapshot IS visible to the left row — inclusive
  * semantics, matching DuckDB `ASOF JOIN ... ON l.ts >= r.ts`.
  *
  * Skew: a hot key concentrates one window partition; for a known-hot
  * domain pre-split by coarse time range and carry the last struct across
  * chunk boundaries (the window is order-local). Documented, not automatic.
  */
object AsOf {

  /** @param left      probe side (keeps all rows, all columns)
    * @param right     reference side; only `keyCols ++ rightTs ++ valueCols`
    *                  are consulted
    * @param keyCols   equi-join keys present on both sides
    * @param leftTs    left timestamp column name
    * @param rightTs   right timestamp column name
    * @param valueCols right-side columns to attach (null when no right row
    *                  is at-or-before the left timestamp)
    * @return left rows + `matched_ts` (the right timestamp that supplied the
    *         values, null when none) + `valueCols`
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTs: String, rightTs: String,
               valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "asofJoin needs at least one value column")
    val leftCols = left.columns.toSeq
    require(!leftCols.contains("matched_ts"),
      "left side already has a matched_ts column")

    // Align both sides to one schema: left payload columns are null on right
    // rows and vice versa; `_t` is the common event time; `_side` breaks ties
    // so a right row at the same instant is already visible (inclusive).
    // `_r` packs the entire attachable right row into one nullable struct.
    val rStruct = struct((col(rightTs).as("matched_ts") +:
      valueCols.map(col)): _*)
    val rStructType = right.select(rStruct.as("_r")).schema("_r").dataType

    val l = left
      .withColumn("_t", col(leftTs))
      .withColumn("_side", lit(1))
      .withColumn("_r", lit(null).cast(rStructType))
    val r = right
      .withColumn("_t", col(rightTs))
      .withColumn("_side", lit(0))
      .withColumn("_r", rStruct)
      .select(leftCols.map(c => if (keyCols.contains(c)) col(c)
          else lit(null).cast(left.schema(c).dataType).as(c))
        ++ Seq(col("_t"), col("_side"), col("_r")): _*)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++ (col("_m.matched_ts").as("matched_ts") +:
        valueCols.map(c => col(s"_m.$c").as(c))): _*)
  }
}
