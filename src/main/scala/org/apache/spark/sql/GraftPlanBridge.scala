package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to the sql-private LogicalPlan→DataFrame constructor — how
  * a third-party whole-operator plan (graft.plans.TopKPerGroupPlan)
  * surfaces a DataFrame API in Spark 4's classic session. */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
