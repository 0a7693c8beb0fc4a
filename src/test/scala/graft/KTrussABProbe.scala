package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev throwaway: same-session interleaved A/B of the r13 kTruss loop
  * (5 driver actions per round, keep-list of every round's support)
  * against the shipped r14 loop (2 actions per round, peel-row
  * persists). `sbt "Test/runMain graft.KTrussABProbe"`. */
object KTrussABProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "3").toInt
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

    // ---- the r13 kTruss, verbatim ----------------------------------
    def ktOld(): DataFrame = {
      val thr = (Graph.KTrussK - 2).toLong
      def truncate(df: DataFrame): DataFrame =
        spark.createDataFrame(df.rdd, df.schema)
      def incidence(t: DataFrame): DataFrame =
        t.select(col("a"), col("b"), col("c"), explode(array(
          struct(least(col("a"), col("b")).as("p1"), greatest(col("a"), col("b")).as("p2")),
          struct(least(col("b"), col("c")).as("p1"), greatest(col("b"), col("c")).as("p2")),
          struct(least(col("a"), col("c")).as("p1"), greatest(col("a"), col("c")).as("p2"))))
          .as("e"))
          .select(col("a"), col("b"), col("c"), col("e.p1"), col("e.p2"))
      def degreesOf(edges: DataFrame): DataFrame =
        edges.select(col("p1").as("node"))
          .unionAll(edges.select(col("p2").as("node")))
          .groupBy(col("node")).agg(count(lit(1)).as("dg"))
      def supportOf(edges: DataFrame, tris: DataFrame): DataFrame =
        edges.join(
          tris.select(explode(array(
              struct(least(col("a"), col("b")).as("p1"), greatest(col("a"), col("b")).as("p2")),
              struct(least(col("b"), col("c")).as("p1"), greatest(col("b"), col("c")).as("p2")),
              struct(least(col("a"), col("c")).as("p1"), greatest(col("a"), col("c")).as("p2"))))
              .as("e"))
            .groupBy(col("e.p1").as("p1"), col("e.p2").as("p2"))
            .agg(count(lit(1)).as("s0")),
          Seq("p1", "p2"), "left")
        .select(col("p1"), col("p2"), coalesce(col("s0"), lit(0L)).as("s"))
      def orientedTri(edges: DataFrame, deg: DataFrame): DataFrame = {
        val dl = deg.select(col("node").as("p1"), col("dg").as("dg1"))
        val dr = deg.select(col("node").as("p2"), col("dg").as("dg2"))
        val lt = struct(col("dg1"), col("p1")) < struct(col("dg2"), col("p2"))
        val oriented = CacheScope.cached(edges.join(dl, "p1").join(dr, "p2")
          .select(
            when(lt, col("p1")).otherwise(col("p2")).as("src"),
            when(lt, col("p2")).otherwise(col("p1")).as("dst")))
        val adj = oriented.groupBy(col("src"))
          .agg(collect_list(col("dst")).as("ns"))
        oriented
          .join(adj.select(col("src").as("j1"), col("ns").as("na")), col("src") === col("j1"))
          .join(adj.select(col("src").as("j2"), col("ns").as("nb")), col("dst") === col("j2"))
          .select(col("src").as("a"), col("dst").as("b"),
            explode(array_intersect(col("na"), col("nb"))).as("c"))
      }
      val edges0 = Graph.coPurchaseEdges(spark, d)
      var supP = supportOf(edges0, orientedTri(edges0, degreesOf(edges0))).persist()
      supP.count()
      var keep = List[DataFrame](supP)
      var sup = truncate(supP)
      var aliveP: DataFrame = null
      var alive: DataFrame = null
      var peels = Vector.empty[DataFrame]
      var r = 1
      var converged = false
      while (r <= Graph.KTrussRounds && !converged) {
        val out = sup.filter(col("s") < thr)
          .select(col("p1"), col("p2"), lit(r.toLong).as("peel_round"),
            col("s").as("support"))
        converged = out.isEmpty
        if (!converged) {
          peels :+= out
          val peeledP = sup.filter(col("s") < thr)
            .select(col("p1"), col("p2")).persist()
          val nPeeled = peeledP.count()
          val survP = sup.filter(col("s") >= thr)
            .select(col("p1"), col("p2")).persist()
          val nSurv = survP.count()
          val surv = truncate(survP)
          if (alive == null || nPeeled >= nSurv) {
            val nextAliveP = orientedTri(surv, degreesOf(surv)).persist()
            nextAliveP.count()
            if (aliveP != null) aliveP.unpersist()
            aliveP = nextAliveP
            alive = truncate(nextAliveP)
            val nextSupP = supportOf(surv, alive).persist()
            nextSupP.count()
            keep ::= nextSupP
            supP = nextSupP
            sup = truncate(nextSupP)
          } else {
            val peeled = truncate(peeledP)
            val deadP = incidence(alive).join(peeled, Seq("p1", "p2"))
              .select(col("a"), col("b"), col("c")).distinct()
              .persist()
            deadP.count()
            val dead = truncate(deadP)
            val dec = incidence(dead).groupBy(col("p1"), col("p2"))
              .agg(count(lit(1)).as("dcnt"))
            val nextSupP = sup.filter(col("s") >= thr)
              .join(dec, Seq("p1", "p2"), "left")
              .select(col("p1"), col("p2"),
                (col("s") - coalesce(col("dcnt"), lit(0L))).as("s"))
              .persist()
            nextSupP.count()
            keep ::= nextSupP
            val nextAliveP = alive.join(dead, Seq("a", "b", "c"), "left_anti")
              .persist()
            nextAliveP.count()
            aliveP.unpersist(); deadP.unpersist()
            aliveP = nextAliveP
            alive = truncate(nextAliveP)
            supP = nextSupP
            sup = truncate(nextSupP)
          }
          peeledP.unpersist(); survP.unpersist()
        }
        r += 1
      }
      if (aliveP != null) aliveP.unpersist()
      keep.foreach(CacheScope.adopt)
      val core = (if (converged) sup.filter(col("s") >= thr) else sup)
        .select(col("p1"), col("p2"), lit(0L).as("peel_round"),
          col("s").as("support"))
      (peels :+ core).reduce(_ unionAll _)
        .orderBy(col("p1"), col("p2"))
    }

    def time(name: String, mk: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      val n = mk().count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"[ktab] $name: $dt%.2f s ($n rows)")
      dt
    }
    // warmup both
    time("warmup_old", () => ktOld())
    time("warmup_new", () => Graph.kTruss(spark, d))
    val olds = collection.mutable.ArrayBuffer[Double]()
    val news = collection.mutable.ArrayBuffer[Double]()
    for (i <- 1 to passes) {
      olds += time(s"old pass$i", () => ktOld())
      news += time(s"new pass$i", () => Graph.kTruss(spark, d))
    }
    println(f"[ktab] OLD min=${olds.min}%.2f s  NEW min=${news.min}%.2f s")
    spark.stop()
  }
}
