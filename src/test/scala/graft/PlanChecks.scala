package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, ShuffleQueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Shared plan assertions for specs. AQE wraps plans that contain an
  * exchange in AdaptiveSparkPlanExec — a LEAF node — so a naive
  * `executedPlan.collect { case e: ShuffleExchangeExec => }` is vacuous
  * in exactly the regression case a no-shuffle assertion exists to
  * catch. Unwrap the adaptive plan and match both raw exchanges and the
  * query-stage wrappers AQE rewrites them into. */
object PlanChecks {

  def shuffles(df: DataFrame): Seq[SparkPlan] = {
    val p = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    p.collect {
      case e: ShuffleExchangeLike => e: SparkPlan
      case q: ShuffleQueryStageExec => q: SparkPlan
    }
  }
}
