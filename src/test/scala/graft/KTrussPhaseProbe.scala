package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev throwaway (`sbt "Test/runMain graft.KTrussPhaseProbe"`): phase
  * timings inside the r13 incremental k-truss at sf0.1 — round-1 wedge
  * enumeration + triple persist, round-1 support, and each later
  * round's dead/dec/anti chain — so the incremental rewrite's win (or
  * regression) is attributable to a phase, not guessed. */
object KTrussPhaseProbe {
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
      println(f"[ktphase] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val thr = (Graph.KTrussK - 2).toLong
    def truncate(df: org.apache.spark.sql.DataFrame) =
      spark.createDataFrame(df.rdd, df.schema)
    def incidence(tr: org.apache.spark.sql.DataFrame) =
      tr.select(col("a"), col("b"), col("c"), explode(array(
        struct(least(col("a"), col("b")).as("p1"), greatest(col("a"), col("b")).as("p2")),
        struct(least(col("b"), col("c")).as("p1"), greatest(col("b"), col("c")).as("p2")),
        struct(least(col("a"), col("c")).as("p1"), greatest(col("a"), col("c")).as("p2"))))
        .as("e"))
        .select(col("a"), col("b"), col("c"), col("e.p1"), col("e.p2"))

    val edgesP = Graph.coPurchaseEdges(spark, d).persist()
    t("edges persist")(edgesP.count())
    val edges0 = truncate(edgesP)
    val deg = edges0.select(col("p1").as("node"))
      .unionAll(edges0.select(col("p2").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("dg"))
    val dl = deg.select(col("node").as("p1"), col("dg").as("dg1"))
    val dr = deg.select(col("node").as("p2"), col("dg").as("dg2"))
    val lt = struct(col("dg1"), col("p1")) < struct(col("dg2"), col("p2"))
    val oriented = CacheScope.cached(edges0.join(dl, "p1").join(dr, "p2")
      .select(
        when(lt, col("p1")).otherwise(col("p2")).as("src"),
        when(lt, col("p2")).otherwise(col("p1")).as("dst"),
        when(lt, col("dg2")).otherwise(col("dg1")).as("dd")))
    val o1 = oriented.select(col("src").as("a"), col("dst").as("b"), col("dd").as("db"))
    val o2 = oriented.select(col("src").as("a2"), col("dst").as("c"), col("dd").as("dc"))
    var aliveP = o1.join(o2,
        col("a") === col("a2") &&
          struct(col("db"), col("b")) < struct(col("dc"), col("c")))
      .join(oriented.select(col("src").as("b"), col("dst").as("c")), Seq("b", "c"))
      .select(col("a"), col("b"), col("c"))
      .persist()
    val nTris = t("r1 wedge join + persist")(aliveP.count())
    println(s"[ktphase] triangles = $nTris")
    var alive = truncate(aliveP)
    var supP = edges0.join(
        incidence(alive).groupBy(col("p1"), col("p2")).agg(count(lit(1)).as("s0")),
        Seq("p1", "p2"), "left")
      .select(col("p1"), col("p2"), coalesce(col("s0"), lit(0L)).as("s"))
      .persist()
    t("r1 support agg")(supP.count())
    var sup = truncate(supP)
    edgesP.unpersist()
    var r = 1
    var converged = false
    while (r <= Graph.KTrussRounds && !converged) {
      val peeledP = sup.filter(col("s") < thr).select(col("p1"), col("p2")).persist()
      val nPeel = t(s"r$r peel count")(peeledP.count())
      println(s"[ktphase] r$r peeled = $nPeel")
      converged = nPeel == 0
      if (!converged) {
        val peeled = truncate(peeledP)
        val deadP = incidence(alive).join(peeled, Seq("p1", "p2"))
          .select(col("a"), col("b"), col("c")).distinct().persist()
        val nDead = t(s"r$r dead triples")(deadP.count())
        println(s"[ktphase] r$r dead = $nDead")
        val dead = truncate(deadP)
        val dec = incidence(dead).groupBy(col("p1"), col("p2"))
          .agg(count(lit(1)).as("dcnt"))
        val nextSupP = sup.filter(col("s") >= thr)
          .join(dec, Seq("p1", "p2"), "left")
          .select(col("p1"), col("p2"),
            (col("s") - coalesce(col("dcnt"), lit(0L))).as("s"))
          .persist()
        t(s"r$r next support")(nextSupP.count())
        val nextAliveP = alive.join(dead, Seq("a", "b", "c"), "left_anti").persist()
        t(s"r$r alive anti-join")(nextAliveP.count())
        aliveP.unpersist(); deadP.unpersist(); peeledP.unpersist()
        supP.unpersist()
        aliveP = nextAliveP; alive = truncate(nextAliveP)
        supP = nextSupP; sup = truncate(nextSupP)
      }
      r += 1
    }
    spark.stop()
  }
}
