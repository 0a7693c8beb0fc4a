package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev throwaway (`sbt "Test/runMain graft.KTrussSupportProbe"`):
  * A/B the r13 fused round-1 k-truss support (3 exploded edges per
  * triangle into the agg) against the r14 candidates —
  * 2-edges-per-triangle + base-edge intersection-size counting, with
  * and without INT-narrowed node ids — on the same session, min-of-N,
  * persist+count exactly like the real round (so column pruning can't
  * fake a win). Verifies all variants produce the identical support
  * multiset before timing. */
object KTrussSupportProbe {
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

    val edges0 = Graph.coPurchaseEdges(spark, d)
    def degreesOf(edges: DataFrame): DataFrame =
      edges.select(col("p1").as("node"))
        .unionAll(edges.select(col("p2").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("dg"))

    // ---- variant builders ------------------------------------------
    // orientedJoined: the oriented edge relation with both adjacency
    // arrays attached (shared shape across variants)
    def orientedJoined(narrow: Boolean): DataFrame = {
      val e = if (narrow)
        edges0.select(col("p1").cast("int").as("p1"), col("p2").cast("int").as("p2"))
      else edges0
      val deg = degreesOf(e)
      val dl = deg.select(col("node").as("p1"), col("dg").as("dg1"))
      val dr = deg.select(col("node").as("p2"), col("dg").as("dg2"))
      val lt = struct(col("dg1"), col("p1")) < struct(col("dg2"), col("p2"))
      val oriented = e.join(dl, "p1").join(dr, "p2")
        .select(
          when(lt, col("p1")).otherwise(col("p2")).as("src"),
          when(lt, col("p2")).otherwise(col("p1")).as("dst"))
      val adj = oriented.groupBy(col("src"))
        .agg(collect_list(col("dst")).as("ns"))
      oriented
        .join(adj.select(col("src").as("j1"), col("ns").as("na")),
          col("src") === col("j1"))
        .join(adj.select(col("src").as("j2"), col("ns").as("nb")),
          col("dst") === col("j2"))
        .select(col("src"), col("dst"),
          array_intersect(col("na"), col("nb")).as("inter"))
    }

    // like orientedJoined but keeps sink-dst edges (left join + empty
    // intersect), so the base row covers EVERY edge
    def orientedJoinedL(narrow: Boolean): DataFrame = {
      val e = if (narrow)
        edges0.select(col("p1").cast("int").as("p1"), col("p2").cast("int").as("p2"))
      else edges0
      val deg = degreesOf(e)
      val dl = deg.select(col("node").as("p1"), col("dg").as("dg1"))
      val dr = deg.select(col("node").as("p2"), col("dg").as("dg2"))
      val lt = struct(col("dg1"), col("p1")) < struct(col("dg2"), col("p2"))
      val oriented = e.join(dl, "p1").join(dr, "p2")
        .select(
          when(lt, col("p1")).otherwise(col("p2")).as("src"),
          when(lt, col("p2")).otherwise(col("p1")).as("dst"))
      val adj = oriented.groupBy(col("src"))
        .agg(collect_list(col("dst")).as("ns"))
      oriented
        .join(adj.select(col("src").as("j1"), col("ns").as("na")),
          col("src") === col("j1"))
        .join(adj.select(col("src").as("j2"), col("ns").as("nb")),
          col("dst") === col("j2"), "left")
        .select(col("src"), col("dst"),
          coalesce(array_intersect(col("na"), col("nb")),
            array().cast("array<bigint>")).as("inter"))
    }

    // A: current shipped shape — explode to triangles, then 3 canonical
    // edges per triangle into the agg (supportOf(orientedTriangles))
    def variantA(): DataFrame = {
      val tris = orientedJoined(narrow = false)
        .select(col("src").as("a"), col("dst").as("b"),
          explode(col("inter")).as("c"))
      edges0.join(
        tris.select(explode(array(
            struct(least(col("a"), col("b")).as("p1"), greatest(col("a"), col("b")).as("p2")),
            struct(least(col("b"), col("c")).as("p1"), greatest(col("b"), col("c")).as("p2")),
            struct(least(col("a"), col("c")).as("p1"), greatest(col("a"), col("c")).as("p2"))))
            .as("e"))
          .groupBy(col("e.p1").as("p1"), col("e.p2").as("p2"))
          .agg(count(lit(1)).as("s0")),
        Seq("p1", "p2"), "left")
      .select(col("p1"), col("p2"), coalesce(col("s0"), lit(0L)).as("s"))
    }

    // B: base-edge count = size(inter) rides the edge row (weight w);
    // explode emits only the OTHER TWO edges per triangle (w = 1);
    // one union into the same hash-agg (sum instead of count)
    def variantB(narrow: Boolean): DataFrame = {
      val oj = orientedJoined(narrow)
      val base = oj.select(
        least(col("src"), col("dst")).as("p1"),
        greatest(col("src"), col("dst")).as("p2"),
        size(col("inter")).cast("long").as("w"))
      val others = oj
        .select(col("src"), col("dst"), explode(col("inter")).as("c"))
        .select(explode(array(
          struct(least(col("src"), col("c")).as("p1"), greatest(col("src"), col("c")).as("p2")),
          struct(least(col("dst"), col("c")).as("p1"), greatest(col("dst"), col("c")).as("p2"))))
          .as("e"))
        .select(col("e.p1").as("p1"), col("e.p2").as("p2"), lit(1L).as("w"))
      val agg = base.unionAll(others)
        .groupBy(col("p1"), col("p2")).agg(sum(col("w")).as("s0"))
      val aggL =
        if (narrow) agg.select(col("p1").cast("long").as("p1"),
          col("p2").cast("long").as("p2"), col("s0"))
        else agg
      edges0.join(aggL, Seq("p1", "p2"), "left")
        .select(col("p1"), col("p2"), coalesce(col("s0"), lit(0L)).as("s"))
    }

    // D: 3-edge explode as today, but the agg is SEEDED with one w=0
    // row per edge — no left join back onto edges at all
    def variantD(): DataFrame = {
      val tris = orientedJoined(narrow = false)
        .select(col("src").as("a"), col("dst").as("b"),
          explode(col("inter")).as("c"))
      val rows = tris.select(explode(array(
          struct(least(col("a"), col("b")).as("p1"), greatest(col("a"), col("b")).as("p2")),
          struct(least(col("b"), col("c")).as("p1"), greatest(col("b"), col("c")).as("p2")),
          struct(least(col("a"), col("c")).as("p1"), greatest(col("a"), col("c")).as("p2"))))
          .as("e"))
        .select(col("e.p1").as("p1"), col("e.p2").as("p2"), lit(1L).as("w"))
      edges0.select(col("p1"), col("p2"), lit(0L).as("w"))
        .unionAll(rows)
        .groupBy(col("p1"), col("p2")).agg(sum(col("w")).as("s"))
        .select(col("p1"), col("p2"), col("s"))
    }

    // E: single enumeration pass — per oriented edge one array of
    // (p1,p2,w) structs: the base row w=|inter| (covers every edge,
    // incl. 0-support) plus 2 w=1 rows per triangle; one explode, one
    // hash-agg, no join, no union
    def variantE(): DataFrame = {
      val oj = orientedJoinedL(narrow = false)
      oj.select(explode(concat(
          array(struct(
            least(col("src"), col("dst")).as("p1"),
            greatest(col("src"), col("dst")).as("p2"),
            size(col("inter")).cast("long").as("w"))),
          flatten(transform(col("inter"), c => array(
            struct(least(col("src"), c).as("p1"),
              greatest(col("src"), c).as("p2"), lit(1L).as("w")),
            struct(least(col("dst"), c).as("p1"),
              greatest(col("dst"), c).as("p2"), lit(1L).as("w")))))))
          .as("e"))
        .groupBy(col("e.p1").as("p1"), col("e.p2").as("p2"))
        .agg(sum(col("e.w")).as("s"))
        .select(col("p1"), col("p2"), col("s"))
    }

    // ---- verify identical output multiset --------------------------
    val a = variantA()
    for ((nm, v) <- Seq("B" -> variantB(false), "Bnarrow" -> variantB(true),
        "D" -> variantD(), "E" -> variantE())) {
      val diff = a.unionAll(v).groupBy(col("p1"), col("p2"), col("s"))
        .agg(count(lit(1)).as("n")).filter(col("n") =!= 2).count()
      println(s"[ktsup] variant $nm vs A: diff rows = $diff")
      assert(diff == 0L, s"variant $nm disagrees with A")
    }
    spark.catalog.clearCache()

    // ---- time: persist + count, like the real round ----------------
    def time(name: String, mk: () => DataFrame): Unit = {
      val ts = (1 to passes).map { i =>
        val t0 = System.nanoTime()
        val p = mk().persist()
        p.count()
        val dt = (System.nanoTime() - t0) / 1e9
        p.unpersist(true)
        spark.catalog.clearCache()
        println(f"[ktsup] $name pass$i: $dt%.2f s")
        dt
      }
      println(f"[ktsup] $name min=${ts.min}%.2f s")
    }
    time("A_current3x", () => variantA())
    time("D_3x_seeded_nojoin", () => variantD())
    time("E_1pass_base_nojoin", () => variantE())
    // interleave to de-noise
    time("A_current3x_again", () => variantA())
    time("E_again", () => variantE())
    spark.stop()
  }
}
