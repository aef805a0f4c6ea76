package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{LocalTableScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec, ShuffleQueryStageExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec

/** Physical-plan walking shared by [[PlanBudgetSpec]] and the
  * [[PlanBudgetProbe]] diagnostic — the executable form of the PLANS.md
  * audit. The walker descends through AQE wrappers and reused
  * exchanges so the same counts come out whether a plan has been
  * adaptively re-planned or not (the [[BridgeContractSpec]]
  * convention). */
object PlanWalk {

  /** All plan nodes, descending through AQE wrappers and exchanges.
    * ReusedExchangeExec is NOT descended into for counting purposes —
    * a reused exchange re-reads shuffle files, it does not re-shuffle,
    * so its subtree must not double-count (mirrors how PLANS.md counts
    * "exchanges the data actually pays for"). */
  def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case _: ReusedExchangeExec => Seq.empty
      case other => other.children
    }
    p +: kids.flatMap(allNodes)
  }

  /** Data-scale shuffles the plan pays for: ShuffleExchangeExec nodes
    * (or their AQE stage form), excluding reused ones. Broadcast
    * exchanges are deliberately NOT counted — shipping a dim/spine
    * once per executor is the cheap path the budget is steering
    * toward. */
  def shuffleCount(p: SparkPlan): Int = allNodes(p).count {
    case _: ShuffleExchangeExec => true
    case s: ShuffleQueryStageExec => !s.plan.isInstanceOf[ReusedExchangeExec]
    case _ => false
  }

  /** True iff every leaf of the subtree is a literal in-memory table
    * or a driver-built `spark.range` — a spine (probability grid, side
    * labels, Fenwick bucket grid), bounded by construction, never
    * corpus data. */
  def localOnlyLeaves(p: SparkPlan): Boolean =
    allNodes(p).filter(_.children.isEmpty).forall {
      case _: LocalTableScanExec => true
      case _: org.apache.spark.sql.execution.RangeExec => true
      case a: AdaptiveSparkPlanExec => localOnlyLeaves(a.executedPlan)
      case _ => false
    }

  /** True iff the subtree provably outputs at most ONE row: a global
    * (no-grouping-key) aggregate, possibly under narrow projections —
    * the "grand total" frames the library pairs up before broadcasting
    * the result onward. */
  def oneRowOutput(p: SparkPlan): Boolean = {
    def strip(q: SparkPlan): SparkPlan = q match {
      case pr: org.apache.spark.sql.execution.ProjectExec => strip(pr.child)
      case s: org.apache.spark.sql.execution.SortExec => strip(s.child)
      case other => other
    }
    strip(p) match {
      case a: BaseAggregateExec => a.groupingExpressions.isEmpty
      case _ => false
    }
  }

  /** True iff the subtree aggregates by the bridge's `__pid` partition
    * id somewhere on the way to its leaves — the prefix machinery's
    * offsets frame, whose cardinality is the PARTITION COUNT (the
    * documented per-partition-totals spine), not the corpus. */
  def hasPidAggregate(p: SparkPlan): Boolean =
    allNodes(p).exists {
      case a: BaseAggregateExec =>
        a.groupingExpressions.exists(_.references.exists(
          _.name == "__pid"))
      case _ => false
    }

  /** CARTESIAN products over unbounded input — the one join shape
    * with no 100 TB story. Legal bounded shapes: (a) all leaves are
    * driver-built spines (|ps|·2 quantile grids, Fenwick bucket
    * ranges); (b) every side is a one-row global aggregate (grand
    * totals paired before broadcast). Anything else — a corpus scan on
    * either side with more than one row — is a missing-broadcast-hint
    * bug. */
  def unboundedCartesians(p: SparkPlan): Seq[SparkPlan] =
    allNodes(p).filter {
      case c: CartesianProductExec =>
        !(localOnlyLeaves(c) ||
          c.children.forall(ch => oneRowOutput(ch) || localOnlyLeaves(ch)))
      case _ => false
    }

  /** Unpartitioned window operators over UNBOUNDED input —
    * `Window.orderBy` with no partitionBy moves all its input to one
    * task, so it is corpus-scale poison unless the input is already
    * bounded: either literal-local, or the prefix machinery's
    * `groupBy(__pid)` per-partition-totals frame (≤ one row per input
    * partition, the documented bridge shape). Exported plans keep
    * exactly zero of the unbounded kind (spearmanRowWindow, the one
    * library site, is a test-only bit-equality reference). */
  def unboundedUnpartWindows(p: SparkPlan): Seq[SparkPlan] =
    allNodes(p).filter {
      case w: WindowExec if w.partitionSpec.isEmpty =>
        !(localOnlyLeaves(w.child) || hasPidAggregate(w.child))
      case _ => false
    }

  case class Budget(shuffles: Int, unboundedCartesians: Int,
                    unboundedUnpartWindows: Int)

  def measure(df: DataFrame): Budget = {
    val p = df.queryExecution.executedPlan
    Budget(shuffleCount(p), unboundedCartesians(p).size,
      unboundedUnpartWindows(p).size)
  }

  /** Run `body` with auto-broadcast DISABLED — the 100 TB simulation:
    * at petabyte scale no join side fits any threshold, so the only
    * broadcasts left are the ones the library EXPLICITLY hints
    * (spines, dims, one-row totals). Under this conf a dropped
    * `broadcast()` hint becomes a visible extra shuffle (or a
    * cartesian) at sf0.001, instead of being silently rescued by the
    * 10 MB default threshold. */
  def withNoAutoBroadcast[T](spark: org.apache.spark.sql.SparkSession)(
      body: => T): T = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "-1")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}

/** Prints the measured plan budget for every bench headline query at
  * sf0.001 under the no-auto-broadcast regime — regenerate the
  * [[PlanBudgetSpec]] ceiling table with
  * `sbt "Test/runMain graft.PlanBudgetProbe"` after a deliberate plan
  * change. */
object PlanBudgetProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    PlanWalk.withNoAutoBroadcast(spark) {
      SparkEntry.benchQueries.foreach { name =>
        val r =
          try {
            val b = PlanWalk.measure(SparkEntry.queries(name)(spark, dir))
            f"""shuffles=${b.shuffles}%2d unboundedCartesians=${
              b.unboundedCartesians} unboundedUnpartWindows=${
              b.unboundedUnpartWindows}"""
          } catch { case e: Throwable => s"FAILED: ${e.getMessage}" }
        println(f"[planbudget] $name%-28s $r")
      }
    }
  }
}
