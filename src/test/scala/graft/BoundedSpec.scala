package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Bounded

/** The bounded-input gate must actually fire: these tests pin the
  * raise/pass behavior directly and prove the filter placement survives
  * aggressive column pruning (the failure mode a guarded output column
  * has — if a future Spark version folds IsNull(assert_true(...)), these
  * go red before any operator silently loses its guard).
  */
class BoundedSpec extends SparkSuite {
  import spark.implicits._

  private def raises(body: => Unit): Boolean =
    try { body; false } catch {
      case e: Throwable =>
        Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
          .exists(_.getMessage match {
            case null => false
            case m => m.contains("single-task window bound")
          })
    }

  test("gate passes within the bound, raises beyond it — in a filter") {
    val df = (1 to 50).map(i => ("k", i)).toDF("k", "v")
      .withColumn("_n", count(lit(1)).over(Window.partitionBy()))
    // within bound: all rows pass through
    assert(df.filter(Bounded.gate(col("_n"), 50L, "specOp")).count() === 50L)
    // beyond bound: the job fails with the gate's message
    assert(raises(df.filter(Bounded.gate(col("_n"), 49L, "specOp")).count()),
      "gate must raise when the count exceeds maxPoints")
  }

  test("gate raises inside a when()-guarded ESSENTIAL column") {
    val df = (1 to 20).map(i => ("k", i)).toDF("k", "v")
      .withColumn("_n", count(lit(1)).over(Window.partitionBy()))
      .withColumn("out",
        when(Bounded.gate(col("_n"), 10L, "specOp"), col("v") * 2))
    assert(raises(df.select("out").collect()),
      "consuming the guarded column must evaluate the gate")
  }

  test("filter-placed gate survives column pruning (select of an unrelated column)") {
    val df = (1 to 20).map(i => ("k", i)).toDF("k", "v")
      .withColumn("_n", count(lit(1)).over(Window.partitionBy()))
      .filter(Bounded.gate(col("_n"), 10L, "specOp"))
    // project AWAY everything the gate references: the Filter still runs
    assert(raises(df.select("k").collect()),
      "a pruning select must not optimize the gate filter away")
  }

  test("imrChart / ewmaChart enforce their bounds at runtime") {
    import graft.operators.Spc
    def series(n: Int) = (1 to n)
      .map(i => ("k", new java.sql.Timestamp(i * 1000L), i.toDouble))
      .toDF("k", "t", "v")
    // small series: both run clean
    assert(Spc.imrChart(series(50), "t", "v").count() === 1L)
    assert(Spc.ewmaChart(series(50), "t", "v", lambda = 0.2, l = 3.0)
      .count() === 1L)
    // ewmaChart's O(n²) cap is 20k — exceed it and the gate must fire
    // before the quadratic join result is consumed
    assert(raises(Spc.ewmaChart(series(20001), "t", "v", 0.2, 3.0).count()),
      "ewmaChart must refuse > 20k points")
  }
}
