package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev throwaway (`sbt "Test/runMain graft.KTrussWedgeProbe"`): explain
  * + A/B the k-truss round-1 triangle enumeration variants at sf0.1 —
  * where the 19.8 s bench time concentrates (10.75 s measured in
  * KTrussPhaseProbe). Variants: current plan, broadcast-closing-side,
  * int-typed nodes. */
object KTrussWedgeProbe {
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
      println(f"[wedge] $name%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val edges0 = Graph.coPurchaseEdges(spark, d)
    println(s"[wedge] edges = ${edges0.count()}")
    val deg0 = edges0.select(col("p1").as("node"))
      .unionAll(edges0.select(col("p2").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("dg"))
    println(s"[wedge] nodes = ${deg0.count()}")

    def trisCurrent(): DataFrame = {
      val deg = deg0
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
      o1.join(o2,
          col("a") === col("a2") &&
            struct(col("db"), col("b")) < struct(col("dc"), col("c")))
        .join(oriented.select(col("src").as("b"), col("dst").as("c")), Seq("b", "c"))
        .select(col("a"), col("b"), col("c"))
    }

    def trisBcast(): DataFrame = {
      val deg = deg0
      val dl = broadcast(deg.select(col("node").as("p1"), col("dg").as("dg1")))
      val dr = broadcast(deg.select(col("node").as("p2"), col("dg").as("dg2")))
      val lt = struct(col("dg1"), col("p1")) < struct(col("dg2"), col("p2"))
      val oriented = CacheScope.cached(edges0.join(dl, "p1").join(dr, "p2")
        .select(
          when(lt, col("p1")).otherwise(col("p2")).as("src"),
          when(lt, col("p2")).otherwise(col("p1")).as("dst"),
          when(lt, col("dg2")).otherwise(col("dg1")).as("dd")))
      val o1 = oriented.select(col("src").as("a"), col("dst").as("b"), col("dd").as("db"))
      val o2 = oriented.select(col("src").as("a2"), col("dst").as("c"), col("dd").as("dc"))
      o1.join(o2,
          col("a") === col("a2") &&
            struct(col("db"), col("b")) < struct(col("dc"), col("c")))
        .join(broadcast(oriented.select(col("src").as("b"), col("dst").as("c"))),
          Seq("b", "c"))
        .select(col("a"), col("b"), col("c"))
    }

    // adjacency-intersection enumeration: same oriented triangle set,
    // but the 36M-row wedge SMJ becomes two keyed joins of the 1.2M
    // oriented edges against the 20k adjacency arrays + a per-row
    // array_intersect — same shuffle BYTES (sum outdeg per edge), far
    // fewer shuffle ROWS.
    def trisAdj(): DataFrame = {
      val deg = deg0
      val dl = deg.select(col("node").as("p1"), col("dg").as("dg1"))
      val dr = deg.select(col("node").as("p2"), col("dg").as("dg2"))
      val lt = struct(col("dg1"), col("p1")) < struct(col("dg2"), col("p2"))
      val oriented = CacheScope.cached(edges0.join(dl, "p1").join(dr, "p2")
        .select(
          when(lt, col("p1")).otherwise(col("p2")).as("src"),
          when(lt, col("p2")).otherwise(col("p1")).as("dst")))
      val adj = oriented.groupBy(col("src"))
        .agg(collect_list(col("dst")).as("ns"))
      oriented
        .join(adj.select(col("src").as("j1"), col("ns").as("na")),
          col("src") === col("j1"))
        .join(adj.select(col("src").as("j2"), col("ns").as("nb")),
          col("dst") === col("j2"))
        .select(col("src").as("a"), col("dst").as("b"),
          explode(array_intersect(col("na"), col("nb"))).as("c"))
    }

    // fused SUPPORT count (no triple materialization): triangles
    // exploded to canonical edges and hash-agged in the same lazy plan
    def supportFused(tris: () => DataFrame): DataFrame = {
      val t3 = tris()
      t3.select(explode(array(
          struct(least(col("a"), col("b")).as("p1"), greatest(col("a"), col("b")).as("p2")),
          struct(least(col("b"), col("c")).as("p1"), greatest(col("b"), col("c")).as("p2")),
          struct(least(col("a"), col("c")).as("p1"), greatest(col("a"), col("c")).as("p2"))))
          .as("e"))
        .groupBy(col("e.p1"), col("e.p2")).agg(count(lit(1)).as("s0"))
    }

    val which = args.headOption.getOrElse("all")
    if (which == "explain") {
      println("===== current =====")
      trisCurrent().explain("formatted")
      println("===== adj =====")
      trisAdj().explain("formatted")
      spark.catalog.clearCache()
    } else {
      for (i <- 1 to 2) {
        t(s"current pass$i")(println("  n=" + trisCurrent().count()))
        spark.catalog.clearCache()
        t(s"bcast   pass$i")(println("  n=" + trisBcast().count()))
        spark.catalog.clearCache()
        t(s"adj     pass$i")(println("  n=" + trisAdj().count()))
        spark.catalog.clearCache()
        t(s"supportFused(adj) pass$i")(println("  n=" + supportFused(() => trisAdj()).count()))
        spark.catalog.clearCache()
        t(s"supportFused(cur) pass$i")(println("  n=" + supportFused(() => trisCurrent()).count()))
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
