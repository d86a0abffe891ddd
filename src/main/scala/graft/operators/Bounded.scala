package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The engine-wide bounded-input contract for SINGLE-TASK realizations.
  *
  * Some statistics are global by definition (a grand median, pooled rank
  * sums, one fitted curve, one ln-factorial table): their natural Spark
  * plan funnels every row through ONE unpartitioned-window/sort task.
  * That is the correct plan — but only under the documented contract that
  * the input is a bounded aggregate (tier-rolled series, arm summaries,
  * bucket counts), never a raw event stream. [[gate]] enforces that
  * contract IN-PLAN: it rides a count expression the query already
  * evaluates (no extra driver-side action, unlike
  * [[Robust.kendallTau]]'s collect-based gate, which exists because its
  * O(n²) join must be stopped BEFORE it is planned) and raises a clear
  * error instead of letting one task OOM an executor at cluster scale.
  */
object Bounded {

  /** Default max rows through one global-sort task: ~4M slim rows is
    * O(100 MB) of sort buffer — survivable on any sanely-sized executor,
    * far past the aggregated-grain inputs these operators are for. */
  val DefaultMaxPoints = 4000000L

  /** Boolean guard column: `true` while `nCol` (a total-count column the
    * plan already computes, e.g. `count(*) over ()`) is within
    * `maxPoints`; RAISES with an actionable message once any row observes
    * a larger count. PLACEMENT RULE: prefer `.filter(Bounded.gate(...))`
    * (or `gate && cond` inside an existing filter) — a Filter node
    * survives any downstream column pruning. Wrap an output column with
    * `when(gate, expr)` ONLY when the frame is row-level with a window
    * count (filters cannot contain window expressions) — and then only
    * on a column every contract output depends on, so pruning cannot
    * drop the guard with it. */
  def gate(nCol: Column, maxPoints: Long, what: String): Column =
    assert_true(nCol <= lit(maxPoints),
      lit(s"$what: input exceeds the single-task window bound of " +
        s"$maxPoints rows — this operator sorts/folds ALL rows in one " +
        s"task by design; feed a tier-aggregated or sampled series")).isNull
}
