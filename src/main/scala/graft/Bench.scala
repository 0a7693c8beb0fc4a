package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: JIT/codegen bootstrap + parquet footer caches, so the
    // first measured query doesn't absorb session startup
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    def pass(): Seq[(String, Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        val dt = (System.nanoTime() - t0) / 1e9
        // queries that persist intermediates (LSH signature sets etc.)
        // must not charge their memory to later queries
        spark.catalog.clearCache()
        name -> dt
      }
    // two passes, per-query minimum: robust to transient host
    // contention without hiding real costs. Skip the second pass when
    // the first already took long (big SF or sustained contention) so
    // total bench time stays bounded.
    val p1 = pass()
    val results =
      (if (p1.map(_._2).sum < 300.0) (p1 ++ pass()) else p1)
        .groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (name, ts) => name -> ts.map(_._2).min }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
