package graft

import org.apache.spark.sql.SparkSession

/** Dev throwaway (`sbt "Test/runMain graft.Q263Q257ABProbe"`): times
  * the DECLARED q263/q257 query paths with Bench's own methodology
  * (count + clearCache between passes) for a same-host before/after
  * pair around the r14 rewrites. */
object Q263Q257ABProbe {
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
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[ab] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      spark.catalog.clearCache()
    }
    for (pass <- 1 to 3) {
      time(s"q263 pass$pass count") {
        val n = TextAnalysis.passageSizeAblation(spark, d).count()
        println(s"[ab]   q263 rows=$n")
      }
      time(s"q257 pass$pass count") {
        val n = Similarity.bitextMargin(spark, d).count()
        println(s"[ab]   q257 rows=$n")
      }
    }
    spark.stop()
  }
}
