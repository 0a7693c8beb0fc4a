package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to the `private[sql]` Column↔Expression converters —
  * the standard pattern for libraries contributing native Catalyst
  * expressions (Spark's own `classic.ExpressionUtils`). */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Block until the shared listener bus has delivered every queued
    * event (`private[spark]` API). CacheScope drains before registering
    * a cache so the still-in-flight completion event of an action that
    * finished moments ago cannot release the new registration before
    * the caller's own action ever runs. */
  def drainListenerBus(spark: SparkSession): Unit =
    try spark.sparkContext.listenerBus.waitUntilEmpty()
    catch { // best-effort: a saturated bus degrades to the old race,
      case _: java.util.concurrent.TimeoutException => () // never an error
    }
}
