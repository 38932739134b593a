package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession}

/** The one `private[sql]` doorway the engine needs: turning a custom
  * LogicalPlan node ([[graft.plans.AsofJoinPlan]]) into a DataFrame.
  * `Dataset.ofRows` is package-private to org.apache.spark.sql, so
  * this bridge lives under that package — the standard pattern for
  * Spark extension libraries that add whole-operator plan nodes (the
  * injected strategy/rule APIs are public; the plan-to-DataFrame hop
  * is not). Nothing else may go through here: keep the engine's Spark
  * surface otherwise public-API-only.
  */
object PlanBridge {
  def ofRows(s: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(s, plan)
}
