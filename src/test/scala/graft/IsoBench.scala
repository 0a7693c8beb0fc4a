package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (not in the suite): time named queries in ISOLATION — a
  * fresh-session, N-pass minimum per query — to separate "the plan got
  * slower" from "the 189-query bench suite got slower around it"
  * (cache eviction, JVM heap pressure, codegen cache churn).
  *
  *   sbt "Test/runMain graft.IsoBench q119_winnow_overlap q118_winnowing"
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_PASSES (default 3).
  */
object IsoBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "3").toInt
    val b0 = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
    // heap-invariant memory budget (see SessionTuning); env overrides
    // for A/B experiments
    val b = b0.config("spark.memory.fraction",
      sys.env.getOrElse("SPARK_GRAFT_MEM_FRACTION",
        SessionTuning.memoryFractionConf))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    val names = if (args.nonEmpty) args.toSeq else Seq("q119_winnow_overlap")
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      val times = (1 to passes).map { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        println(f"[iso] $name pass$i: $dt%.3f s ($n rows)")
        dt
      }
      println(f"[iso] $name min=${times.min}%.3f s over $passes passes")
    }
    spark.stop()
  }
}
