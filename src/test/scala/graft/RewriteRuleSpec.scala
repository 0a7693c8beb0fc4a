package graft

import graft.plans.RewriteHofDotProduct
import org.apache.spark.sql.functions._

/** The optimizer rule turns user-written HOF dot products into the
  * native kernel, without changing values. */
class RewriteRuleSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("HOF dot-product pattern rewrites to graft_dot and values are unchanged") {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ RewriteHofDotProduct
    try {
      val e = Tables.embeddings(spark, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val hof = e.select(col("vec_id"), Similarity.dotHof(col("v"), col("v")).as("nn"))
      assert(hof.queryExecution.optimizedPlan.toString.contains("graft_dot"))
      // values identical to the explicitly-native path
      val native = e.select(col("vec_id"), Similarity.dot(col("v"), col("v")).as("nn"))
      assert(hof.exceptAll(native).isEmpty && native.exceptAll(hof).isEmpty)
    } finally spark.experimental.extraOptimizations = prev
  }

  test("non-matching folds are left alone (sum of squares is not a dot product)") {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ RewriteHofDotProduct
    try {
      val e = Tables.embeddings(spark, d)
        .select(col("embedding").cast("array<double>").as("v"))
      val sumsq = e.select(
        aggregate(col("v"), lit(0.0d), (acc, x) => acc + x * x).as("s"))
      assert(!sumsq.queryExecution.optimizedPlan.toString.contains("graft_dot"))
      assert(sumsq.count() > 0)
    } finally spark.experimental.extraOptimizations = prev
  }
}
