package graft

import org.apache.spark.sql.SparkSession

/** Dev throwaway (`sbt "Test/runMain graft.Q250ABProbe"`): times the
  * declared aHash-pair consumers (q245 presentation, q250 clusters)
  * with Bench's methodology for the same-host A/B around the r14
  * combinations-explode rewrite of aHashPairsDf. */
object Q250ABProbe {
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
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[ab3] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s ($n rows)")
      spark.catalog.clearCache()
    }
    for (pass <- 1 to 3) {
      time(s"q245 pass$pass count")(
        Multimodal.imageAHashNearDup(spark, d).count())
      time(s"q250 pass$pass count")(
        Multimodal.mediaDupClusters(spark, d).count())
    }
    spark.stop()
  }
}
