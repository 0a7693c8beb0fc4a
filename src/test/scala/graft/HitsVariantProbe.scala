package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev throwaway: A/B q303 HITS variants at sf0.1. */
object HitsVariantProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.memory.fraction", SessionTuning.memoryFractionConf)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[hits] $name%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s (n=$n)")
      spark.catalog.clearCache()
    }
    def run(round: DataFrame => DataFrame, cacheE: Boolean): Long = {
      val li = Tables.lineitem(spark, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
      val os = Tables.orders(spark, d)
        .select(col("o_orderkey").as("ok2"), col("o_custkey").as("c"))
      val e0 = li.join(os, col("ok") === col("ok2"))
        .select(col("c"), col("p")).distinct()
      val e = if (cacheE) CacheScope.cached(e0) else e0
      var a = round(e.groupBy(col("p"))
        .agg(expr("CAST(count(1) AS DECIMAL(38,0))").as("a")))
      var h = round(e.join(a, "p").groupBy(col("c"))
        .agg(sum(col("a")).as("h")))
      for (_ <- 2 to Graph.HitsIters) {
        a = round(e.join(h, "c").groupBy(col("p"))
          .agg(sum(col("h")).as("a")))
        h = round(e.join(a, "p").groupBy(col("c"))
          .agg(sum(col("a")).as("h")))
      }
      val af = CacheScope.cached(a)
      val hf = CacheScope.cached(h)
      val at = af.agg(sum(col("a")).as("ta"))
      val ht = hf.agg(sum(col("h")).as("th"))
      val degP = e.groupBy(col("p")).agg(count(lit(1)).as("degree"))
      val degC = e.groupBy(col("c")).agg(count(lit(1)).as("degree"))
      val auth = af.join(degP, "p").crossJoin(broadcast(at))
        .select(lit("auth").as("node_type"), col("p").as("node"),
          col("degree"), expr("CAST((1000000 * a) div ta AS BIGINT)")
            .as("score_ppm"))
      val hub = hf.join(degC, "c").crossJoin(broadcast(ht))
        .select(lit("hub").as("node_type"), col("c").as("node"),
          col("degree"), expr("CAST((1000000 * h) div th AS BIGINT)")
            .as("score_ppm"))
      auth.unionAll(hub).orderBy(col("node_type"), col("node")).count()
    }
    for (i <- 1 to 2) {
      t(s"V0 current (e cached, rounds cached) $i")(run(Recurrence.round, cacheE = true))
      t(s"V1 e cached, rounds plain            $i")(run(identity, cacheE = true))
      t(s"V2 e plain, rounds plain             $i")(run(identity, cacheE = false))
      t(s"V3 e plain, rounds cached            $i")(run(Recurrence.round, cacheE = false))
    }
    spark.stop()
  }
}
