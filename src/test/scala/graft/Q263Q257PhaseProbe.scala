package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev throwaway (`sbt "Test/runMain graft.Q263Q257PhaseProbe"`):
  * per-stage timings for the two top-profile queries the r13 round
  * left unexamined — q263 passage-size ablation (3 maxPassage
  * instances) and q257 bitext margin (LSH candidates + margin
  * windows). */
object Q263Q257PhaseProbe {
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
      println(f"[q2xx] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // ---- q263: one maxPassage instance per grid size ----------------
    for (pass <- 1 to 2) {
      for (sz <- TextAnalysis.PassageSizeGrid)
        t(s"q263 pass$pass maxPassage(sz=$sz) collect")(
          TextAnalysis.maxPassageDf(Tables.documentsDist(spark, d), sz)
            .select(col("doc_id"), col("score_micro")).collect())
      spark.catalog.clearCache()
    }

    // ---- q257: stage decomposition ----------------------------------
    import org.apache.spark.sql.expressions.Window
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    for (pass <- 1 to 2) {
      val emb = Tables.embeddings(spark, d)
      val docs = Tables.documentsDist(spark, d)
      val lang = docs.select(col("doc_id"), col("lang"))
      val e = Similarity.withNorm(emb)
        .join(lang, col("vec_id") === col("doc_id")).drop("doc_id")
        .withColumn("buckets", Similarity.lshBuckets(col("v")))
      val eP = e.persist()
      t(s"q257 pass$pass e persist+count")(eP.count())
      val ball = eP.select(col("vec_id"), col("lang"),
        posexplode(col("buckets")).as(Seq("t", "bucket")))
      val hot = ball.groupBy(col("t"), col("bucket"))
        .agg(count(lit(1)).as("n")).filter(col("n") > Similarity.BitextBucketCap)
        .select(col("t"), col("bucket"))
      val b = ball.join(hot, Seq("t", "bucket"), "left_anti")
      val cand = b.as("x")
        .join(b.as("y"),
          col("x.t") === col("y.t") && col("x.bucket") === col("y.bucket") &&
            col("x.vec_id") < col("y.vec_id") &&
            col("x.lang") =!= col("y.lang"))
        .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
        .distinct()
      val candP = cand.persist()
      t(s"q257 pass$pass candidates persist+count")(println(
        s"[q2xx]   n_cand=${candP.count()}"))
      val scored = candP
        .join(eP.select(col("vec_id").as("vec_a"), col("v").as("va"),
          col("nn").as("na2"), col("lang").as("lang_a")), "vec_a")
        .join(eP.select(col("vec_id").as("vec_b"), col("v").as("vb"),
          col("nn").as("nb2"), col("lang").as("lang_b")), "vec_b")
        .withColumn("c_ppm",
          floor(lit(1000000.0d) *
            Similarity.cosine(col("va"), col("vb"), col("na2"), col("nb2")))
            .cast("long"))
        .select(col("vec_a"), col("vec_b"), col("lang_a"), col("lang_b"),
          col("c_ppm"))
      val scoredP = scored.persist()
      t(s"q257 pass$pass scored (cosine) persist+count")(scoredP.count())
      val nbrs = scoredP.select(col("vec_a").as("vid"),
          col("vec_b").as("partner"), col("c_ppm"))
        .unionAll(scoredP.select(col("vec_b").as("vid"),
          col("vec_a").as("partner"), col("c_ppm")))
      val w = Window.partitionBy(col("vid"))
        .orderBy(col("c_ppm").desc, col("partner"))
      val hood = nbrs.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= Similarity.BitextK)
        .groupBy(col("vid"))
        .agg(sum(col("c_ppm")).as("s"), count(lit(1)).as("n"))
      t(s"q257 pass$pass hood window (noop)")(noop(hood))
      val fin = scoredP
        .join(hood.select(col("vid").as("vec_a"), col("s").as("sa"),
          col("n").as("na")), "vec_a")
        .join(hood.select(col("vid").as("vec_b"), col("s").as("sb"),
          col("n").as("nb")), "vec_b")
        .filter(col("sa") + col("sb") > 0L)
        .withColumn("margin_milli",
          expr("(1000 * c_ppm * (na + nb)) div (sa + sb)"))
        .filter(col("margin_milli") >= Similarity.BitextMarginMilli)
      t(s"q257 pass$pass final joins (noop)")(noop(fin))
      eP.unpersist(); candP.unpersist(); scoredP.unpersist()
      t(s"q257 pass$pass FULL query count")(
        Similarity.bitextMargin(spark, d).count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
