package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Ordinal categorical encode/decode — the reference's dictionary encoding
  * (`/root/reference/forecastframe/transform.py:367-428`: dictionary = the
  * column's distinct values ordered ascending, code = dense 0-based
  * position; decode maps codes back through the saved dictionary).
  *
  * Scale design: the dictionary is built WITHOUT a global single-task
  * window. `row_number().over(Window.orderBy(c))` — the obvious
  * formulation — funnels the whole distinct set through ONE task, which is
  * fine for a categorical domain but dies first when someone points it at a
  * high-cardinality column. Here the distinct set is range-partition
  * SORTED (parallel) and numbered with `zipWithIndex` — a narrow two-pass
  * over the sorted partitions (one lightweight job to count per-partition
  * sizes, then offset-adds). Every stage is distributed; the only
  * cardinality bound is what a join dictionary inherently costs.
  */
object Encoding {

  /** Dictionary frame `(value_col, code: long)` — codes are the dense
    * 0-based ascending rank of the distinct values (nulls excluded, like the
    * reference's dict built from observed category values).
    */
  def fitOrdinal(df: DataFrame, c: String): DataFrame = {
    val spark = df.sparkSession
    val distinct = df.select(col(c)).filter(col(c).isNotNull).distinct().sort(col(c))
    val schema = distinct.schema.add("code", LongType, nullable = false)
    // RDD zipWithIndex is the one licensed RDD drop-down (SURVEY §2.11 "only
    // where Catalyst can't express it"): no Catalyst operator yields a
    // partition-parallel dense global rank without a single-task exchange.
    // sort() gives range partitioning, so per-partition index + partition
    // offset IS the global ascending rank.
    val rdd = distinct.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    spark.createDataFrame(rdd, schema)
  }

  /** Attach `<c>_code` by joining the dictionary (broadcast when it is small
    * enough — Spark's auto-broadcast threshold applies; pass
    * `broadcast(dict)` for an explicit hint). Unseen values get null codes.
    */
  def encodeOrdinal(df: DataFrame, c: String, dict: DataFrame): DataFrame =
    df.join(dict.withColumnRenamed("code", s"${c}_code"), Seq(c), "left")

  /** Map `codeCol` back to the categorical value as `<codeCol>_decoded`. */
  def decodeOrdinal(df: DataFrame, codeCol: String, c: String, dict: DataFrame): DataFrame =
    df.join(
      dict.select(col("code").as(codeCol), col(c).as(s"${codeCol}_decoded")),
      Seq(codeCol), "left")
}
