package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning — the mechanism that lets a
  * selective dimension predicate prune the FACT scan at runtime on a
  * real cluster (Spark injects a bloom filter built from the filtered
  * creation side into the application side of the shuffle join).
  * Off by default; this pins that the engine's query shapes are
  * eligible when it's enabled, so a 100 TB deployment can turn it on
  * and get scan-side pruning for free. */
class RuntimeFilterSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.01"

  test("selective dim filter injects a bloom probe on the fact side of a shuffle join") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // test tables are far below the production-sized default
      // thresholds; drop them so the injection logic runs here
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
      val o = Tables.orders(spark, d).filter(col("o_totalprice") > 400000)
      val l = Tables.lineitem(spark, d)
      val j = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"), plan.take(4000))
      // and the probe sits on the lineitem (application) scan side
      assert(plan.indexOf("might_contain") < plan.indexOf("lineitem"), "probe not on fact side")
      // value sanity: identical result with the filter off
      val expected = {
        conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      }
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      val got = j.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected && got.nonEmpty)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
