package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev throwaway (`sbt "Test/runMain graft.Q290PhaseProbe"`): q290
  * shingle-ablation phase timings per grid point (shingle pass, df
  * agg, pair self-join) and a same-session A/B of the pair stats via
  * the equi-self-join (r13) vs combinations-explode over per-gram doc
  * arrays (r14 candidate). Verifies identical (within, cross) counts
  * per grid point before timing. */
object Q290PhaseProbe {
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
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[q290] $name%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    def gFor(n: Int): DataFrame = Tables.documentsDist(spark, d)
      .select(col("doc_id"), col("source"),
        explode(graft.functions.GraftFunctions.shingleHashes(
          split(col("text"), " "), n)).as("h"))

    def pairJoin(gi: DataFrame) =
      gi.as("a").join(gi.as("b"),
          col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
          (col("a.source") === col("b.source")).as("same"))
        .distinct()
        .agg(sum(when(col("same"), 1L).otherwise(0L)),
          sum(when(!col("same"), 1L).otherwise(0L))).head()

    def pairExplode(gi: DataFrame) = {
      val byGram = gi.groupBy(col("h"))
        .agg(sort_array(collect_list(struct(col("doc_id"), col("source"))))
          .as("ds"))
        .filter(size(col("ds")) >= 2)
      byGram
        .select(col("ds"), posexplode(col("ds")).as(Seq("i", "a")))
        .select(col("a"),
          explode(slice(col("ds"), col("i") + lit(2),
            size(col("ds")) - col("i") - lit(1))).as("b"))
        .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
          (col("a.source") === col("b.source")).as("same"))
        .distinct()
        .agg(sum(when(col("same"), 1L).otherwise(0L)),
          sum(when(!col("same"), 1L).otherwise(0L))).head()
    }

    for (n <- Dedup.AblationNs) {
      val g = gFor(n).persist()
      t(s"n=$n shingle pass persist+count")(g.count())
      val dfRel = g.groupBy(col("h")).agg(count(lit(1)).as("df")).persist()
      t(s"n=$n df agg persist+count")(dfRel.count())
      t(s"n=$n df stats head")(dfRel.agg(count(lit(1)),
        sum(when(col("df") > Dedup.AblationDfCap, 1L).otherwise(0L))).head())
      val kept = dfRel.filter(col("df") <= Dedup.AblationDfCap).select(col("h"))
      val gi = g.join(kept, "h")
      val rJ = t(s"n=$n pair self-join stats")(pairJoin(gi))
      val rE = t(s"n=$n pair explode stats")(pairExplode(gi))
      println(s"[q290] n=$n join=(${rJ.getLong(0)},${rJ.getLong(1)}) " +
        s"explode=(${rE.getLong(0)},${rE.getLong(1)})")
      assert(rJ.getLong(0) == rE.getLong(0) && rJ.getLong(1) == rE.getLong(1))
      // second timing pass, reversed order
      t(s"n=$n pair explode again")(pairExplode(gi))
      t(s"n=$n pair self-join again")(pairJoin(gi))
      g.unpersist(); dfRel.unpersist()
    }
    spark.stop()
  }
}
