package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** URL path-prefix tree aggregation: roll a slash-delimited path column up
  * to every ancestor prefix in one pass — the site-map / storage-explorer
  * query ("how many pages and bytes under /a, /a/b, /a/b/c …") that a
  * fixed-column hierarchy rollup cannot express because path depth varies
  * per row.
  *
  * Plan: split once, explode a LITERAL depth sequence 1..maxDepth (a
  * literal, not a computed array — CollapseProject would otherwise inline
  * the whole split into the Generate, re-splitting per depth; measured
  * pitfall recorded in the verify recipe), cut each prefix with `slice`,
  * then ONE map-side-combined groupBy(depth, prefix). Output size is at
  * most maxDepth × rows before aggregation — linear, no joins, no windows.
  * Deeper-than-maxDepth segments aggregate into their depth-maxDepth
  * ancestor (the tree is truncated, not dropped).
  */
object PathTree {

  /** Aggregate `weightCol` (count + sum) under every path prefix of depth
    * 1..maxDepth. Leading '/' is tolerated; empty segments are dropped.
    * Returns (depth, prefix, cnt, w_sum) with prefix = "/seg1/…/segd".
    */
  def prefixRollup(df: DataFrame, pathCol: String, maxDepth: Int,
                   weightCol: String): DataFrame = {
    require(maxDepth >= 1, s"maxDepth must be >= 1, got $maxDepth")
    val segs = filter(split(col(pathCol), "/"), s => s =!= "")
    df.select(segs.as("_segs"), size(segs).as("_n"), col(weightCol).as("_w"))
      .select(col("_segs"), col("_n"), col("_w"),
        explode(sequence(lit(1), lit(maxDepth))).as("depth"))
      .filter(col("depth") <= col("_n"))
      .select(col("depth"),
        concat(lit("/"), concat_ws("/", slice(col("_segs"), lit(1), col("depth")))).as("prefix"),
        col("_w"))
      .groupBy("depth", "prefix")
      .agg(count(lit(1)).as("cnt"), sum(col("_w")).as("w_sum"))
  }
}
