package graft

import graft.operators.Bucketing
import org.apache.spark.sql.functions._

/** Bucketed co-located join: the write-once pre-shuffle eliminates the
  * join exchange AND the join sort; results identical to the plain join. */
class BucketingSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("bucketed orders ⋈ customer: SortMergeJoin with no Exchange, same result") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_buckets").toString
    Bucketing.writeBucketed(Tables.orders(spark, d), "orders_bucketed",
      "o_custkey", buckets = 8, path = tmp)
    Bucketing.writeBucketed(Tables.customer(spark, d), "customer_bucketed",
      "c_custkey", buckets = 8, path = tmp)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val q = Bucketing.colocatedOrdersPerCustomer(spark)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      // the join reads bucketed layout directly: no shuffle anywhere
      // before the final group-by... and the group-by on the bucket key
      // reuses the bucketing too — the ONLY exchange allowed is the
      // final orderBy's range partitioning
      val exchanges = "Exchange [a-z]+partitioning".r.findAllIn(plan).toSeq
      assert(exchanges.forall(_.contains("rangepartitioning")), plan)
      // bucket-side sort order satisfies the SMJ requirement: no Sort
      // between the scans and the join (the only sorts serve the output
      // orderBy)
      assert("SortMergeJoin".r.findAllIn(plan).size == 1)

      // values: identical to the plain unbucketed join
      val plain = Tables.orders(spark, d)
        .join(Tables.customer(spark, d), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("total"))
      assert(q.exceptAll(plain).isEmpty && plain.exceptAll(q).isEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS customer_bucketed")
    }
  }
}
