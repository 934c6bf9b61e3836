package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal accessor into `private[sql]` Spark API: builds a DataFrame
  * from a LogicalPlan (used by graft.sql.GraftSql to execute the query
  * part of parsed INSERT/MERGE statements). Standard extension-library
  * technique — `private[sql]` members are public in bytecode and this
  * object lives in the sql package to access them directly. */
object GraftShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
