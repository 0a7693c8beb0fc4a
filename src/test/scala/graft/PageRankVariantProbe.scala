package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev throwaway: A/B q126 pagerank plan variants at sf0.1 to
  * attribute the ~2 s round-1 premium (cache materialization vs join
  * shape vs scan). */
object PageRankVariantProbe {
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
    // warm salted stage
    Graph.tradeArcs(spark, d).count()
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[prv] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s (n=$n)")
      spark.catalog.clearCache()
    }
    def rounds(ed: DataFrame, deg: DataFrame): Long = {
      var rank = deg.select(col("src").as("node"), lit(1000000L).as("r"))
      for (_ <- 1 to Graph.PageRankIters) {
        rank = Recurrence.round(ed.join(rank, col("src") === col("node"))
          .groupBy(col("dst"))
          .agg(expr("150000 + (850 * sum(r div outdeg)) div 1000").as("r"))
          .select(col("dst").as("node"), col("r")))
      }
      rank.select(col("node"), col("r").as("rank_micro"))
        .orderBy(col("node")).count()
    }
    for (i <- 1 to 2) {
      t(s"V0 current (e cached, ed cached) $i") {
        val e = CacheScope.cached(Graph.tradeArcs(spark, d))
        val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
        rounds(CacheScope.cached(e.join(deg, "src")), deg)
      }
      t(s"V1 e plain, ed cached          $i") {
        val e = Graph.tradeArcs(spark, d)
        val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
        rounds(CacheScope.cached(e.join(deg, "src")), deg)
      }
      t(s"V2 e plain, ed plain           $i") {
        val e = Graph.tradeArcs(spark, d)
        val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
        rounds(e.join(deg, "src"), deg)
      }
      t(s"V3 no Recurrence truncation    $i") {
        val e = Graph.tradeArcs(spark, d)
        val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
        val ed = CacheScope.cached(e.join(deg, "src"))
        var rank = deg.select(col("src").as("node"), lit(1000000L).as("r"))
        for (_ <- 1 to Graph.PageRankIters) {
          rank = ed.join(rank, col("src") === col("node"))
            .groupBy(col("dst"))
            .agg(expr("150000 + (850 * sum(r div outdeg)) div 1000").as("r"))
            .select(col("dst").as("node"), col("r"))
        }
        rank.select(col("node"), col("r").as("rank_micro"))
          .orderBy(col("node")).count()
      }
      t(s"V4 bcast rank hint             $i") {
        val e = Graph.tradeArcs(spark, d)
        val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
        val ed = CacheScope.cached(e.join(deg, "src"))
        var rank = deg.select(col("src").as("node"), lit(1000000L).as("r"))
        for (_ <- 1 to Graph.PageRankIters) {
          rank = Recurrence.round(ed.join(broadcast(rank), col("src") === col("node"))
            .groupBy(col("dst"))
            .agg(expr("150000 + (850 * sum(r div outdeg)) div 1000").as("r"))
            .select(col("dst").as("node"), col("r")))
        }
        rank.select(col("node"), col("r").as("rank_micro"))
          .orderBy(col("node")).count()
      }
    }
    spark.stop()
  }
}
