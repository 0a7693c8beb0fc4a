package graft

import org.apache.spark.sql.functions._

/** Round-10 batch f: q286 price-quantity elasticity, q287
  * dedup-corrected temperature mixture, q288 ABC classes —
  * straight-Scala BigInt recomputes plus the composition and
  * class-boundary certificates. */
class NewOpsRound10fSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  private def brandMonths: Map[(String, Long), (Long, Long)] =
    spark.read.parquet(s"$d/lineitem.parquet")
      .join(spark.read.parquet(s"$d/part.parquet"),
        col("l_partkey") === col("p_partkey"))
      .selectExpr("p_brand AS brand",
        "CAST(year(l_shipdate) * 12 + month(l_shipdate) - 1 AS BIGINT) AS m",
        "CAST(round(l_extendedprice * 100) AS BIGINT) AS cents",
        "CAST(l_quantity AS BIGINT) AS qty")
      .groupBy("brand", "m")
      .agg(sum("cents").as("rev"), sum("qty").as("qty")).collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      .toMap

  test("q286 elasticity ≡ local BigInt OLS; slope sign matches covariance") {
    val exp = brandMonths.groupBy(_._1._1).map { case (b, cells) =>
      val pts = cells.values.map { case (rev, qty) => (rev / qty, qty) }.toSeq
      val n = BigInt(pts.length)
      val sx = BigInt(pts.map(_._1).sum); val sy = BigInt(pts.map(_._2).sum)
      val sxy = pts.map { case (x, y) => BigInt(x) * y }.sum
      val sxx = pts.map { case (x, _) => BigInt(x) * x }.sum
      val syy = pts.map { case (_, y) => BigInt(y) * y }.sum
      val num = n * sxy - sx * sy
      val dx = n * sxx - sx * sx; val dy = n * syy - sy * sy
      val slope =
        if (dx == 0) 0L
        else if (num >= 0) (BigInt(1000000) * num / dx).toLong
        else -(BigInt(1000000) * (-num) / dx).toLong
      val r2 =
        if (dx == 0 || dy == 0) 0L
        else if (num >= 0) (BigInt(1000000) * num * num / (dx * dy)).toLong
        else -(BigInt(1000000) * num * num / (dx * dy)).toLong
      (b, n.toLong, slope, r2)
    }.toSeq.sortBy(_._1)
    val got = Queries.priceElasticity(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got == exp)
    // sign consistency: slope and r² carry the same sign by definition
    assert(got.forall(t => t._3.sign * t._4.sign >= 0))
  }

  test("q287 mixture ≡ local recompute; duplicated sources are discounted") {
    val labels = Dedup.nearDupClusters(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ", -1).length.toLong))
    def isqrt(n: Long): Long = {
      var s = math.floor(math.sqrt(n.toDouble)).toLong
      if (s * s > n) s -= 1
      if ((s + 1) * (s + 1) <= n) s + 1 else s
    }
    val ag = docs.groupBy(_._2).map { case (src, g) =>
      val raw = g.map(_._3).sum
      val eff = g.map(t => 1000L * t._3 / labels(t._1)).sum
      (src, raw, eff / 1000L, eff / raw, isqrt(eff / 1000L))
    }.toSeq.sortBy(_._1)
    val tw = ag.map(_._5).sum
    val exp = ag.map { case (src, raw, eff, disc, w) =>
      (src, raw, eff, disc, w, 1000L * w / tw)
    }
    val got = Curation.effectiveTemperatureMix(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got == exp)
    // the correction bites: some source loses ≥ 2% of its supply to
    // dup discounting (the corpus plants near-dups), and none gains
    assert(got.forall(_._4 <= 1000L))
    assert(got.exists(_._4 <= 980L))
  }

  test("q288 ABC ≡ local recompute; A captures ≥ 800‰ where it closes") {
    val pr = spark.read.parquet(s"$d/lineitem.parquet")
      .join(spark.read.parquet(s"$d/part.parquet"),
        col("l_partkey") === col("p_partkey"))
      .selectExpr("p_brand AS brand", "l_partkey AS pk",
        "CAST(round(l_extendedprice * 100) AS BIGINT) AS cents")
      .groupBy("brand", "pk").agg(sum("cents").as("rev")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val (aBar, bBar) = Queries.AbcBarsPm
    val exp = pr.groupBy(_._1).flatMap { case (b, g) =>
      val sorted = g.sortBy(t => (-t._3, t._2))
      val tot = sorted.map(_._3).sum
      var cum = 0L
      val classed = sorted.map { case (_, _, rev) =>
        val prevPm = 1000L * cum / tot
        cum += rev
        val cls = if (prevPm < aBar) "A" else if (prevPm < bBar) "B" else "C"
        (cls, rev)
      }
      classed.groupBy(_._1).map { case (cls, rows) =>
        (b, cls, rows.length.toLong, rows.map(_._2).sum,
          1000L * rows.map(_._2).sum / tot)
      }
    }.toSeq.sortBy(t => (t._1, t._2))
    val got = Queries.abcClasses(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got == exp)
    // boundary certificate: wherever B exists, the A class closed at
    // or past the 800‰ bar (A share + one part's worth ≥ 800‰ means
    // prev_pm of the first B row was ≥ 800‰ by the class rule)
    val byBrand = got.groupBy(_._1)
    byBrand.foreach { case (_, rows) =>
      val a = rows.find(_._2 == "A").map(_._5).getOrElse(0L)
      if (rows.exists(_._2 == "B")) assert(a >= aBar)
    }
    // prefix dominance (true for ANY top-sorted prefix): A's value
    // share is never below its part-count share — on this synthetic
    // near-uniform revenue the gap is small, on a Pareto catalog it is
    // the whole point of the cut
    byBrand.foreach { case (_, rows) =>
      val total = rows.map(_._3).sum
      rows.find(_._2 == "A").foreach { a =>
        assert(a._5 * total >= 1000L * a._3 - total)
      }
    }
  }
}
