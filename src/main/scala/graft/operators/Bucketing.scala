package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed-table co-located joins — the zero-shuffle repeated-join
  * story at 100 TB.
  *
  * A fact⋈fact equi-join shuffles both sides every query. Bucketing
  * pre-shuffles ONCE at write time: both tables hash-partitioned into
  * the same bucket count on the join key and sorted within buckets, so
  * every later join on that key plans as a SortMergeJoin with NO
  * Exchange and NO per-bucket Sort on either side (pinned in
  * BucketingSpec). This is the storage-layout analog of the
  * repartition/broadcast decisions the per-query operators make — paid
  * once at ingest, amortized over every downstream join/aggregation on
  * the key.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted table (external at `path`). */
  def writeBucketed(df: DataFrame, name: String, key: String, buckets: Int,
      path: String): Unit =
    df.write.mode("overwrite")
      .option("path", s"$path/$name")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(name)

  /** orders ⋈ customer on custkey, both sides bucketed: per-customer
    * order rollup with no join-side exchange. */
  def colocatedOrdersPerCustomer(spark: SparkSession): DataFrame =
    spark.table("orders_bucketed")
      .join(spark.table("customer_bucketed"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(col("c_custkey"))
}
