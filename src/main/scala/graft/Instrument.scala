package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}

/** Plan instrumentation: turn an executed DataFrame's SQL metrics into
  * the numbers an operator owner watches at 100 TB — how many shuffles
  * ran, how many bytes/records crossed the wire, how many rows left
  * the scans. PlanSpec pins plan SHAPES; these helpers measure the
  * actual traffic, so claims like "zero-shuffle sampling" or
  * "broadcast beats shuffle here" are asserted as numbers
  * (InstrumentSpec), not read off a plan string.
  *
  * Works on the FINAL adaptive plan: call after an action, or use
  * [[collectWithPlan]] which runs one and returns both.
  */
object Instrument {

  /** The final physical plan, descending through AQE wrappers. */
  def finalPlan(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }

  /** All nodes of the final plan. AQE materializes exchanges inside
    * QueryStageExec LEAF nodes, so a plain collect stops right before
    * every exchange — descend into stages (and nested AQE plans)
    * explicitly. */
  private def nodes(plan: SparkPlan): Seq[SparkPlan] =
    plan.collect { case p => p }.flatMap { p =>
      // scalar/IN/DPP subqueries run their own plans (and shuffles)
      // outside the main tree — without this they'd be invisible here
      val subs = p.subqueries.flatMap(nodes)
      (p match {
        case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          q +: nodes(q.plan)
        case other => Seq(other)
      }) ++ subs
    }.distinct

  final case class ShuffleStats(
      shuffles: Int, bytesWritten: Long, recordsWritten: Long,
      broadcasts: Int, broadcastRows: Long)

  /** Exchange accounting for an already-executed DataFrame. */
  def shuffleStats(df: DataFrame): ShuffleStats = {
    val ns = nodes(finalPlan(df))
    val ex = ns.collect { case s: ShuffleExchangeLike => s }
    val bc = ns.collect { case b: BroadcastExchangeLike => b }
    def m(p: SparkPlan, key: String): Long =
      p.metrics.get(key).map(_.value).filter(_ > 0).getOrElse(0L)
    ShuffleStats(
      shuffles = ex.size,
      bytesWritten = ex.map(m(_, "shuffleBytesWritten")).sum,
      recordsWritten = ex.map(m(_, "shuffleRecordsWritten")).sum,
      broadcasts = bc.size,
      broadcastRows = bc.map(m(_, "numOutputRows")).sum)
  }

  /** Run the query (collect) and return rows plus exchange stats. */
  def collectWithPlan(df: DataFrame): (Array[org.apache.spark.sql.Row], ShuffleStats) = {
    val rows = df.collect()
    (rows, shuffleStats(df))
  }

  /** numOutputRows of every join operator in an already-executed
    * plan — probe-cost accounting for intersection chains
    * (PhraseIndexSpec pins the rarest-first min-df bound with it). */
  def joinOutputRows(df: DataFrame): Seq[Long] =
    nodes(finalPlan(df)).collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec =>
        j.metrics.get("numOutputRows").map(_.value).getOrElse(0L)
    }
}
