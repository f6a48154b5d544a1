package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's private[sql] Column <-> Expression converters
  * (Spark 4 moved Column to sql-api and hid the catalyst constructor).
  * Lives in the org.apache.spark.sql namespace solely to satisfy the
  * access qualifier; no Spark internals are modified.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a custom LogicalPlan as a DataFrame (classic Dataset.ofRows). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Logical plan of a DataFrame. */
  def logicalPlan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].logicalPlan

  /** Drain the async listener bus (private[spark]) so listener-observed
    * task metrics are complete before a test asserts on them. */
  def waitListenerBus(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** Unpersist every checkpoint/scan RDD a DataFrame's plan holds
    * (LogicalRDD leaves — the backing blocks of `localCheckpoint`ed
    * tables). A session cache that holds a checkpoint-backed DataFrame
    * releases its blocks DETERMINISTICALLY through this instead of
    * waiting for the ContextCleaner's GC-driven sweep, which can run
    * after a leak check has already counted the blocks. */
  def unpersistCheckpoints(df: org.apache.spark.sql.DataFrame): Unit =
    logicalPlan(df).collect {
      case r: org.apache.spark.sql.execution.LogicalRDD =>
        r.rdd.unpersist(blocking = false)
    }
}
