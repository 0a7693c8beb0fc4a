package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev probe (`sbt "Test/runMain graft.CoreScalingProbe"`): the
  * parallelism datapoint VERDICT r13 asked for. sf0.1 is overhead-bound
  * (the r13 scaling block's 8-core total BEAT the 32-core total: the
  * per-query ~1 s plan/codegen floor swamps data parallelism at ~15 MB
  * inputs), so core ratios are measured here at the 10× ScaleProbe
  * corpora instead. One JVM, two sequential sessions: local[32] first,
  * local[8] second — shared JIT warmth favors the SECOND (8-core) leg,
  * which biases the t8/t32 ratio DOWN, i.e. against the parallelism
  * claim. shuffle.partitions = cores, Bench's own convention. */
object CoreScalingProbe {
  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.memory.fraction", SessionTuning.memoryFractionConf)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val only = if (args.isEmpty) Set.empty[String] else args.toSet
    val t = sys.props("java.io.tmpdir")
    val d10docs = s"$t/graft-scale-10x"
    val d10graph = s"$t/graft-scale-graph10x"
    val d10vec = s"$t/graft-scale-vec10x"
    locally {
      val s = session(32)
      ScaleProbeCorpora.ensure(s)
      s.stop()
    }
    val targets: Seq[(String, (SparkSession, String) => DataFrame, String)] =
      Seq(
        ("q192_sparse_cosine", TextAnalysis.sparseCosineTopK _, d10docs),
        ("q126_pagerank", Graph.pageRank _, d10graph),
        ("q311_harmonic_closeness", Graph.harmonicCloseness _, d10graph),
        ("q258_ktruss", Graph.kTruss _, d10graph),
        ("q161_coreset_select", Similarity.coresetSelect _, d10vec),
        ("q163_label_prop", Graph.labelProp _, d10graph),
        ("q290_shingle_ablation", Dedup.shingleSizeAblation _, d10docs),
        ("q303_hits_bipartite", Graph.hitsBipartite _, d10graph),
        ("q257_bitext_margin", Similarity.bitextMargin _,
          "/root/testdata/sf0.1"),
        ("q263_passage_ablation", TextAnalysis.passageSizeAblation _,
          d10docs))
        .filter { case (n, _, _) => only.isEmpty || only.exists(n.contains) }
    def leg(cores: Int): Map[String, Double] = {
      val spark = session(cores)
      // session warmup so the first query doesn't absorb codegen boot
      try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
      val res = targets.map { case (name, fn, d) =>
        val ts = (1 to 2).map { i =>
          val t0 = System.nanoTime()
          val n = fn(spark, d).count()
          val dt = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache()
          println(f"[cores] $name%-26s c$cores%-3d pass$i ${dt}%8.2f s ($n rows)")
          dt
        }
        name -> ts.min
      }.toMap
      spark.stop()
      res
    }
    val t32 = leg(32)
    val t8 = leg(8)
    println(targets.map { case (name, _, _) =>
      val r = t8(name) / t32(name)
      f"$name%-26s t32=${t32(name)}%7.2f  t8=${t8(name)}%7.2f  t8/t32=${r}%5.2f (linear 4.0)"
    }.mkString("[cores] summary:\n  ", "\n  ", ""))
  }
}
