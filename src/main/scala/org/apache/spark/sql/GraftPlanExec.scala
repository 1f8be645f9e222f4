package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `Dataset.ofRows` (private[sql]) so the engine can execute a
  * parsed LogicalPlan it has transformed — used to thread the hidden
  * `__seq` provenance column through stateless query chains, preserving
  * input arrival order in emitted offsets (the reference engine emits map
  * results in stream order; sorting by value columns would not match and
  * breaks ties nondeterministically).
  */
object GraftPlanExec {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Wrap a raw Catalyst Expression as a Column (private[sql] in classic). */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  /** Unwrap a Column to its Catalyst Expression. */
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)

  /** Create a DataFrame over an RDD of InternalRow without the external-Row
    * round trip (`internalCreateDataFrame` is private[sql]) — keeps
    * RDD-level passes like the offset assigner's prefix-sum inside
    * Tungsten's unsafe representation.
    */
  def ofInternalRows(
      spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession].internalCreateDataFrame(rdd, schema)
}
