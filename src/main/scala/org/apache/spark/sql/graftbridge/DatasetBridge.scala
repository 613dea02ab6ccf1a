package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession}

/** Bridge to the `private[sql]` Dataset.ofRows constructor so a custom
  * LogicalPlan node (graft.plans.AsofJoinPlan) can be wrapped back into a
  * public DataFrame. Same shim pattern as [[ColumnBridge]]. */
object DatasetBridge {
  def ofRows(session: org.apache.spark.sql.SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(session.asInstanceOf[SparkSession], plan)
}
