package graft

import org.apache.spark.sql.functions._

/** Storage-layout scale story, part 2 (part 1 = BucketingSpec): a fact
  * table written partitioned by day answers day-filtered queries by
  * reading ONLY the matching directories — the plan must show the
  * partition filter with everything else pruned. At 100 TB this is the
  * difference between scanning a day and scanning a year. */
class PartitioningSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("day-partitioned events: day filter prunes to a single partition") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_part").toString
    val ev = Tables.eventsNs(spark, d)
      .withColumn("day", expr("ts div 86400000000000")) // epoch-day from nanos
    ev.write.mode("overwrite").partitionBy("day").parquet(tmp)

    // partition-dir values are re-inferred at read (int here) — cast
    val days = spark.read.parquet(tmp).select(col("day").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted
    assert(days.length > 1, "fixture spans one day; pick a different partition key")

    val q = spark.read.parquet(tmp).filter(col("day") === days.head)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val plan = q.queryExecution.executedPlan.toString
    // the filter is a partition filter (directory pruning)...
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains(s"(day = ${days.head})") ||
      plan.contains(s"day#") && plan.contains(s"= ${days.head}"), plan)
    // ...and only the one matching directory is read
    val scanned = q.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(!scanned.contains(s"day=${days.last}"), "pruned partition still in scan")

    // values agree with filtering the unpartitioned table
    val expect = ev.filter(col("day") === days.head)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    assert(q.exceptAll(expect).isEmpty && expect.exceptAll(q).isEmpty)
  }
}
