package graft

import org.apache.spark.sql.functions._

/** Dev tool: q263's declared plan is a LocalTableScan (the ablation
  * fold runs on the driver over 3×10 collected rows), so the plan
  * evidence for the r14 single-action rewrite is the INTERNAL union
  * plan this dumps — the one action the query now runs. */
object Q263InternalPlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val docs = Tables.documentsDist(spark, d)
    println("=== q263 internal union (single action, r14) ===")
    TextAnalysis.PassageSizeGrid.map { sz =>
      TextAnalysis.maxPassageDf(docs, sz)
        .select(lit(sz).as("psize"), col("doc_id"), col("score_micro"))
    }.reduce(_.unionAll(_)).explain("formatted")
    spark.stop()
  }
}
