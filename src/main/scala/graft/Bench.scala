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
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: JIT/codegen bootstrap + parquet footer caches, so the
    // first measured query doesn't absorb session startup
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    val failures = scala.collection.mutable.Map.empty[String, String]
    def time(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable =>
          // a crashing query must not masquerade as a fast one: record
          // the failure and report NaN, never the time-to-crash
          failures(name) = e.getClass.getSimpleName + ": " + String.valueOf(e.getMessage).take(200)
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // queries that persist intermediates (LSH signature sets etc.)
      // must not charge their memory to later queries
      spark.catalog.clearCache()
      dt
    }
    // two passes, per-query minimum: robust to transient host
    // contention without hiding real costs. The second pass is skipped
    // PER QUERY only when that query's first pass already exceeded the
    // bound (genuinely big at this SF) — a contended first pass can
    // never lock itself in as the recorded number.
    val secondPassBound = 60.0
    val sorted = SparkEntry.queries.toSeq.sortBy(_._1)
    val p1 = sorted.map { case (name, fn) => name -> time(name, fn) }
    val p2 = sorted.collect {
      case (name, fn) if p1.toMap.apply(name) < secondPassBound && !failures.contains(name) =>
        name -> time(name, fn)
    }
    val results = (p1 ++ p2)
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (name, ts) => name -> ts.map(_._2).min }
    val qs = results.map { case (k, v) =>
      s"\"" + k + "\":" + (if (failures.contains(k)) "null" else v.toString)
    }.mkString("{", ",", "}")
    val total = results.collect { case (k, v) if !failures.contains(k) => v }.sum
    val fj = failures.toSeq.sortBy(_._1).map { case (k, m) =>
      s"\"" + k + "\":\"" + m.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failures":$fj,"sf":"$sfDir"}""")
    spark.stop()
  }
}
