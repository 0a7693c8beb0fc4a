package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev throwaway (`sbt "Test/runMain graft.GraphPhaseProbe"`): phase
  * timings inside the q126/q311-family recurrences at sf0.1 — arc
  * read, degree fold, per-round cost as rounds accumulate — so the
  * 6-10 s bench times are attributable to a phase. */
object GraphPhaseProbe {
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
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[gphase] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    // warm the salted arc stage
    t("q131 bfs (warms salted stage)") {
      SparkEntry.queries("q131_bfs_distances")(spark, d).count()
    }
    spark.catalog.clearCache()
    t("arcs read+count") {
      println("  arcs=" + Graph.tradeArcs(spark, d).count())
    }
    for (rounds <- Seq(0, 1, 3, 5)) {
      val t0 = System.nanoTime()
      val e = CacheScope.cached(Graph.tradeArcs(spark, d))
      val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      val ed = CacheScope.cached(e.join(deg, "src"))
      var rank = deg.select(col("src").as("node"), lit(1000000L).as("r"))
      for (_ <- 1 to rounds) {
        rank = Recurrence.round(ed.join(rank, col("src") === col("node"))
          .groupBy(col("dst"))
          .agg(expr("150000 + (850 * sum(r div outdeg)) div 1000").as("r"))
          .select(col("dst").as("node"), col("r")))
      }
      val n = rank.select(col("node"), col("r").as("rank_micro"))
        .orderBy(col("node")).count()
      println(f"[gphase] pagerank rounds=$rounds n=$n ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      spark.catalog.clearCache()
    }
    for (i <- 1 to 2) {
      t(s"q126 full pass$i") {
        println("  n=" + SparkEntry.queries("q126_pagerank")(spark, d).count())
      }
      spark.catalog.clearCache()
    }
    for (i <- 1 to 2) {
      t(s"q311 full pass$i") {
        println("  n=" + SparkEntry.queries("q311_harmonic_closeness")(spark, d).count())
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
