package graft

import org.apache.spark.sql.SparkSession

/** Dev throwaway: wall-clock for the declared q290 path around the r14
  * concurrent-grid change (Bench methodology: count + clearCache). */
object Q290WallProbe {
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
    for (pass <- 1 to 4) {
      val t0 = System.nanoTime()
      val n = Dedup.shingleSizeAblation(spark, d).count()
      println(f"[ab4] q290 pass$pass ${(System.nanoTime() - t0) / 1e9}%8.2f s ($n rows)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
