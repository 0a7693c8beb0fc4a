package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev throwaway (`sbt "Test/runMain graft.TruncateABProbe"`): price
  * the three lineage-truncation disciplines on an edge-sized persisted
  * relation — (a) truncate = createDataFrame(df.rdd, schema) reading
  * through the cache (pays InternalRow↔Row per consumer), (b) reading
  * the persisted DataFrame directly (columnar InMemoryTableScan, no
  * conversion, but lineage NOT cut for the planner), (c)
  * localCheckpoint(true) (lineage cut, InternalRow blocks, no
  * conversion). Consumer = the k-truss round shape: filter + count,
  * and a self-join. */
object TruncateABProbe {
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
    val edges0 = Graph.coPurchaseEdges(spark, d)
    // an edge-sized 3-col relation like the k-truss support
    val supPlan = edges0.select(col("p1"), col("p2"),
      (col("p1") % 7).as("s"))

    def consume(name: String, sup: DataFrame): Unit = {
      val ts = (1 to 3).map { i =>
        val t0 = System.nanoTime()
        sup.filter(col("s") < 3).count()
        sup.filter(col("s") >= 3)
          .groupBy(col("p1")).agg(count(lit(1)).as("n"))
          .agg(sum(col("n"))).head()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[truncab] $name reads min=${ts.min}%.2f s (${ts.map(t => f"$t%.2f").mkString(",")})")
    }

    // (a) persist+count+truncate
    var t0 = System.nanoTime()
    val p = supPlan.persist(); p.count()
    val viaTruncate = spark.createDataFrame(p.rdd, p.schema)
    println(f"[truncab] setup truncate: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    consume("truncate(df.rdd)", viaTruncate)
    consume("persisted direct", p)
    // (c) localCheckpoint
    t0 = System.nanoTime()
    val lc = supPlan.localCheckpoint(true)
    println(f"[truncab] setup localCheckpoint: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    consume("localCheckpoint", lc)
    consume("truncate again", viaTruncate)
    consume("localCheckpoint again", lc)
    p.unpersist()
    spark.stop()
  }
}
