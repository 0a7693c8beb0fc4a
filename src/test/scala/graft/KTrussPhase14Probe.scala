package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev throwaway (`sbt "Test/runMain graft.KTrussPhase14Probe"`):
  * phase timings inside the CURRENT (r13-final) k-truss at sf0.1 —
  * the fused round-1 support decomposed into its stages (leaf scan,
  * degree agg, orientation joins, adjacency collect, intersect+explode
  * enumeration, the support agg+join) plus each later round's arm —
  * so round-14 attacks the measured phase, not the guessed one.
  * Intermediates are timed with the noop sink (guide §1.4) so column
  * pruning can't fake a number. */
object KTrussPhase14Probe {
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
      println(f"[kt14] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val edges0 = Graph.coPurchaseEdges(spark, d)
    t("leaf edge scan (noop)")(noop(edges0))
    def degreesOf(edges: DataFrame): DataFrame =
      edges.select(col("p1").as("node"))
        .unionAll(edges.select(col("p2").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("dg"))
    t("degree agg (noop)")(noop(degreesOf(edges0)))

    val deg = degreesOf(edges0)
    val dl = deg.select(col("node").as("p1"), col("dg").as("dg1"))
    val dr = deg.select(col("node").as("p2"), col("dg").as("dg2"))
    val lt = struct(col("dg1"), col("p1")) < struct(col("dg2"), col("p2"))
    def orientedMk(): DataFrame = edges0.join(dl, "p1").join(dr, "p2")
      .select(
        when(lt, col("p1")).otherwise(col("p2")).as("src"),
        when(lt, col("p2")).otherwise(col("p1")).as("dst"))
    t("oriented build (noop)")(noop(orientedMk()))
    val oriented = orientedMk()
    val adj = oriented.groupBy(col("src"))
      .agg(collect_list(col("dst")).as("ns"))
    t("adjacency collect (noop)")(noop(adj))
    val joined = oriented
      .join(adj.select(col("src").as("j1"), col("ns").as("na")),
        col("src") === col("j1"))
      .join(adj.select(col("src").as("j2"), col("ns").as("nb")),
        col("dst") === col("j2"))
    t("oriented+2 adj joins (noop)")(noop(joined.select(col("src"), col("dst"),
      size(col("na")).as("x"), size(col("nb")).as("y"))))
    val tris = joined.select(col("src").as("a"), col("dst").as("b"),
      explode(array_intersect(col("na"), col("nb"))).as("c"))
    t("full enumerate (noop)")(noop(tris))

    def supportOf(edges: DataFrame, tr: DataFrame): DataFrame =
      edges.join(
        tr.select(explode(array(
            struct(least(col("a"), col("b")).as("p1"), greatest(col("a"), col("b")).as("p2")),
            struct(least(col("b"), col("c")).as("p1"), greatest(col("b"), col("c")).as("p2")),
            struct(least(col("a"), col("c")).as("p1"), greatest(col("a"), col("c")).as("p2"))))
            .as("e"))
          .groupBy(col("e.p1").as("p1"), col("e.p2").as("p2"))
          .agg(count(lit(1)).as("s0")),
        Seq("p1", "p2"), "left")
      .select(col("p1"), col("p2"), coalesce(col("s0"), lit(0L)).as("s"))

    // ---- the real query end to end, phase-logged --------------------
    val thr = (Graph.KTrussK - 2).toLong
    def truncate(df: DataFrame): DataFrame =
      spark.createDataFrame(df.rdd, df.schema)
    def incidence(tr: DataFrame): DataFrame =
      tr.select(col("a"), col("b"), col("c"), explode(array(
        struct(least(col("a"), col("b")).as("p1"), greatest(col("a"), col("b")).as("p2")),
        struct(least(col("b"), col("c")).as("p1"), greatest(col("b"), col("c")).as("p2")),
        struct(least(col("a"), col("c")).as("p1"), greatest(col("a"), col("c")).as("p2"))))
        .as("e"))
        .select(col("a"), col("b"), col("c"), col("e.p1"), col("e.p2"))
    def orientedTri(edges: DataFrame): DataFrame = {
      val dg = degreesOf(edges)
      val l = dg.select(col("node").as("p1"), col("dg").as("dg1"))
      val r = dg.select(col("node").as("p2"), col("dg").as("dg2"))
      val c = struct(col("dg1"), col("p1")) < struct(col("dg2"), col("p2"))
      val o = CacheScope.cached(edges.join(l, "p1").join(r, "p2")
        .select(when(c, col("p1")).otherwise(col("p2")).as("src"),
          when(c, col("p2")).otherwise(col("p1")).as("dst")))
      val a2 = o.groupBy(col("src")).agg(collect_list(col("dst")).as("ns"))
      o.join(a2.select(col("src").as("j1"), col("ns").as("na")), col("src") === col("j1"))
        .join(a2.select(col("src").as("j2"), col("ns").as("nb")), col("dst") === col("j2"))
        .select(col("src").as("a"), col("dst").as("b"),
          explode(array_intersect(col("na"), col("nb"))).as("c"))
    }

    val tTotal0 = System.nanoTime()
    var supP = supportOf(edges0, orientedTri(edges0)).persist()
    t("r1 fused support persist+count")(supP.count())
    var keep = List[DataFrame](supP)
    var sup = truncate(supP)
    var aliveP: DataFrame = null
    var alive: DataFrame = null
    var r = 1
    var converged = false
    while (r <= Graph.KTrussRounds && !converged) {
      val out = sup.filter(col("s") < thr)
      converged = t(s"r$r converged isEmpty")(out.isEmpty)
      if (!converged) {
        val peeledP = sup.filter(col("s") < thr)
          .select(col("p1"), col("p2")).persist()
        val nPeeled = t(s"r$r peeled count")(peeledP.count())
        val survP = sup.filter(col("s") >= thr)
          .select(col("p1"), col("p2")).persist()
        val nSurv = t(s"r$r surv count")(survP.count())
        println(s"[kt14] r$r peeled=$nPeeled surv=$nSurv arm=" +
          (if (alive == null || nPeeled >= nSurv) "REBUILD" else "DELTA"))
        val surv = truncate(survP)
        if (alive == null || nPeeled >= nSurv) {
          val nextAliveP = orientedTri(surv).persist()
          t(s"r$r rebuild enumerate")(nextAliveP.count())
          if (aliveP != null) aliveP.unpersist()
          aliveP = nextAliveP
          alive = truncate(nextAliveP)
          val nextSupP = supportOf(surv, alive).persist()
          t(s"r$r rebuild support")(nextSupP.count())
          keep ::= nextSupP
          supP = nextSupP
          sup = truncate(nextSupP)
        } else {
          val peeled = truncate(peeledP)
          val deadP = incidence(alive).join(peeled, Seq("p1", "p2"))
            .select(col("a"), col("b"), col("c")).distinct()
            .persist()
          t(s"r$r dead triples")(deadP.count())
          val dead = truncate(deadP)
          val dec = incidence(dead).groupBy(col("p1"), col("p2"))
            .agg(count(lit(1)).as("dcnt"))
          val nextSupP = sup.filter(col("s") >= thr)
            .join(dec, Seq("p1", "p2"), "left")
            .select(col("p1"), col("p2"),
              (col("s") - coalesce(col("dcnt"), lit(0L))).as("s"))
            .persist()
          t(s"r$r delta support")(nextSupP.count())
          keep ::= nextSupP
          val nextAliveP = alive.join(dead, Seq("a", "b", "c"), "left_anti")
            .persist()
          t(s"r$r alive anti-join")(nextAliveP.count())
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
    val core = (if (converged) sup.filter(col("s") >= thr) else sup)
      .select(col("p1"), col("p2"), lit(0L).as("peel_round"), col("s").as("support"))
    val n = t("terminal orderBy+count")(core.orderBy(col("p1"), col("p2")).count())
    println(f"[kt14] TOTAL ${(System.nanoTime() - tTotal0) / 1e9}%.2f s (core rows $n)")
    keep.foreach(_.unpersist())
    spark.stop()
  }
}
