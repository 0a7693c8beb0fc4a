package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev throwaway: same-session A/B of q303 with the inline
  * join+distinct edge relation (r13) vs the persisted salted stage
  * (r14). `sbt "Test/runMain graft.HitsStageABProbe"`. */
object HitsStageABProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "3").toInt
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

    def hitsWith(e: DataFrame): DataFrame = {
      var a = e.groupBy(col("p"))
        .agg(expr("CAST(count(1) AS DECIMAL(38,0))").as("a"))
      var h = e.join(a, "p").groupBy(col("c"))
        .agg(sum(col("a")).as("h"))
      for (_ <- 2 to Graph.HitsIters) {
        a = e.join(h, "c").groupBy(col("p"))
          .agg(sum(col("h")).as("a"))
        h = e.join(a, "p").groupBy(col("c"))
          .agg(sum(col("a")).as("h"))
      }
      val af = CacheScope.cached(a)
      val hf = CacheScope.cached(h)
      val at = af.agg(sum(col("a")).as("ta"))
      val ht = hf.agg(sum(col("h")).as("th"))
      val degP = e.groupBy(col("p")).agg(count(lit(1)).as("degree"))
      val degC = e.groupBy(col("c")).agg(count(lit(1)).as("degree"))
      val auth = af.join(degP, "p").crossJoin(broadcast(at))
        .select(lit("auth").as("node_type"), col("p").as("node"),
          col("degree"), expr("CAST((1000000 * a) div ta AS BIGINT)").as("score_ppm"))
      val hub = hf.join(degC, "c").crossJoin(broadcast(ht))
        .select(lit("hub").as("node_type"), col("c").as("node"),
          col("degree"), expr("CAST((1000000 * h) div th AS BIGINT)").as("score_ppm"))
      auth.unionAll(hub).orderBy(col("node_type"), col("node"))
    }
    def oldE(): DataFrame = {
      val li = Tables.lineitem(spark, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
      val os = Tables.orders(spark, d)
        .select(col("o_orderkey").as("ok2"), col("o_custkey").as("c"))
      CacheScope.cached(li.join(os, col("ok") === col("ok2"))
        .select(col("c"), col("p")).distinct())
    }

    def time(name: String, mk: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      val n = mk().count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"[hitsab] $name: $dt%.2f s ($n rows)")
      dt
    }
    time("warmup_old", () => hitsWith(oldE()))
    time("warmup_new", () => hitsWith(Graph.custPartEdges(spark, d)))
    val olds = collection.mutable.ArrayBuffer[Double]()
    val news = collection.mutable.ArrayBuffer[Double]()
    for (i <- 1 to passes) {
      olds += time(s"old pass$i", () => hitsWith(oldE()))
      news += time(s"new pass$i", () => hitsWith(Graph.custPartEdges(spark, d)))
    }
    println(f"[hitsab] OLD min=${olds.min}%.2f s  NEW min=${news.min}%.2f s")
    spark.stop()
  }
}
