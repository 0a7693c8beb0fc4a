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

  test("rewrite preserves NULL semantics on ragged and null-element arrays") {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ RewriteHofDotProduct
    try {
      import spark.implicits._
      // (equal, ragged, null-element, null-array) cases
      val df = Seq(
        (Some(Seq[java.lang.Double](1.0, 2.0)), Some(Seq[java.lang.Double](3.0, 4.0))),
        (Some(Seq[java.lang.Double](1.0, 2.0, 5.0)), Some(Seq[java.lang.Double](3.0, 4.0))),
        (Some(Seq[java.lang.Double](1.0, null)), Some(Seq[java.lang.Double](3.0, 4.0))),
        (None, Some(Seq[java.lang.Double](3.0, 4.0)))
      ).toDF("a", "b")
      def vals(c: org.apache.spark.sql.Column): Seq[Any] =
        df.select(c.as("s")).collect().toSeq
          .map(r => if (r.isNullAt(0)) null else r.getDouble(0))
      val hof = vals(Similarity.dotHof(col("a"), col("b")))
      val native = vals(Similarity.dot(col("a"), col("b")))
      // the kernel mirrors zip_with/aggregate null semantics exactly,
      // which is what makes the session-wide rewrite safe on any input
      assert(native == hof)
      assert(hof(0) == 11.0)
      assert(hof(1) == null) // ragged → null, never a garbage read
      assert(hof(2) == null) // null element poisons the sum
      assert(hof(3) == null) // null array propagates
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
