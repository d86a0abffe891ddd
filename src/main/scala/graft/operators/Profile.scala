package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataframe profiling — the reference's `describe()` summary
  * (/root/reference/forecastframe/interpret.py:172-177: count/mean/std/min/
  * p25/p50/p75/max per numeric column).
  *
  * One aggregation pass computes every stat for every column (8·|cols|
  * aggregate expressions in a single job — percentiles exact, not the
  * approximate ones `Dataset.summary()` uses); the single result row is then
  * exploded to the pandas-shaped (column, stat...) layout. At 100 TB this is
  * one scan + one 1-row reduce, no shuffle of data rows.
  */
object Profile {

  def describe(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      val x = col(c).cast("double")
      Seq(
        count(x).as(s"${c}__count"),
        avg(x).as(s"${c}__mean"),
        stddev_samp(x).as(s"${c}__std"),
        min(x).as(s"${c}__min"),
        percentile(x, lit(0.25)).as(s"${c}__p25"),
        percentile(x, lit(0.5)).as(s"${c}__p50"),
        percentile(x, lit(0.75)).as(s"${c}__p75"),
        max(x).as(s"${c}__max"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val structs = array(cols.map { c =>
      struct(lit(c).as("column"),
        col(s"${c}__count").as("count"), col(s"${c}__mean").as("mean"),
        col(s"${c}__std").as("std"), col(s"${c}__min").as("min"),
        col(s"${c}__p25").as("p25"), col(s"${c}__p50").as("p50"),
        col(s"${c}__p75").as("p75"), col(s"${c}__max").as("max"))
    }: _*)
    row.select(explode(structs).as("d")).select("d.*")
  }
}
