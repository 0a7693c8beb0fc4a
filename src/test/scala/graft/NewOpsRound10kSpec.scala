package graft

import org.apache.spark.sql.functions._

/** Round-10 batch k: q300 vocabulary saturation, q301 CUSUM
  * changepoint, q302 Mann-Whitney rank-sum, q303 bipartite HITS —
  * from-scratch local recomputes plus the statistical certificates
  * each estimator owes (estimator ≥ observed, deviation endpoints,
  * effect-size symmetry, HITS mass conservation). */
class NewOpsRound10kSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("q300 ≡ local recompute; Chao1 ≥ observed types; coverage bounds") {
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val exp = docs.groupBy(_._1).map { case (src, g) =>
      val toks = g.flatMap(_._2.split(" ", -1))
      val counts = toks.groupBy(identity).map(_._2.length)
      val n = toks.length.toLong
      val types = counts.size.toLong
      val f1 = counts.count(_ == 1).toLong
      val f2 = counts.count(_ == 2).toLong
      val chao1 = types + (f1 * (f1 - 1)) / (2 * (f2 + 1))
      (src, n, types, f1, f2, chao1, 1000000L * f1 / n,
        1000000L - 1000000L * f1 / n, 1000L * types / chao1)
    }.toSeq.sortBy(_._1)
    val got = TextAnalysis.vocabSaturation(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)))
    assert(got == exp)
    got.foreach { t =>
      assert(t._6 >= t._3, "Chao1 is a lower bound ESTIMATE but never " +
        "below the OBSERVED richness")
      assert(t._9 >= 0L && t._9 <= 1000L)
      assert(t._7 + t._8 == 1000000L)
    }
  }

  test("q301 ≡ local recompute; endpoints have zero deviation; cut maximizes") {
    val ev = Tables.eventsNs(spark, d)
      .selectExpr("event_type", "ts div 86400000000000 AS day").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val exp = ev.groupBy(_._1).map { case (et, g) =>
      val days = g.groupBy(_._2).map { case (day, h) => (day, h.length.toLong) }
        .toSeq.sortBy(_._1)
      val n = days.length.toLong
      val total = days.map(_._2).sum
      val cums = days.zipWithIndex.map { case ((day, c), i) =>
        val k = i + 1L
        val s = days.take(i + 1).map(_._2).sum
        (day, k, s, math.abs(n * s - k * total))
      }
      val best = cums.minBy { case (day, _, _, dev) => (-dev, day) }
      val (day, k, s, dev) = best
      (et, n, total, day, k, dev, 1000L * dev / (n * total),
        1000L * s / k,
        if (k < n) Some(1000L * (total - s) / (n - k)) else None)
    }.toSeq.sortBy(_._1)
    val got = Queries.cusumChangepoint(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        if (r.isNullAt(8)) None else Some(r.getLong(8))))
    assert(got == exp)
    // the CUSUM walk starts and ends at zero: a cut at k = n has dev 0,
    // so any nonzero max lands strictly inside the series
    got.filter(_._6 > 0L).foreach(t => assert(t._5 < t._2))
  }

  test("q302 ≡ local recompute; swapping samples mirrors the effect size") {
    val rows = spark.read.parquet(s"$d/lineitem.parquet")
      .join(spark.read.parquet(s"$d/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .selectExpr("o_orderpriority AS priority",
        "CAST(datediff(l_shipdate, o_orderdate) AS BIGINT) AS lag",
        "CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END AS ret")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def stats(g: Seq[(Long, Long)]): (Long, Long, Long, Option[Long],
        Long, Option[Long]) = {
      // g = (lag, ret); histogram Mann-Whitney over the lag grid
      val hist = g.groupBy(_._1).map { case (lag, h) =>
        (lag, h.count(_._2 == 1L).toLong, h.count(_._2 == 0L).toLong)
      }.toSeq.sortBy(_._1)
      val n1 = hist.map(_._2).sum
      val n2 = hist.map(_._3).sum
      var blt = 0L
      var u2 = 0L
      var ties3 = BigInt(0)
      hist.foreach { case (_, a, b) =>
        u2 += a * (2 * blt + b)
        val t = a + b
        ties3 += BigInt(t) * t * t - t
        blt += b
      }
      val n = n1 + n2
      val dev2 = u2 - n1 * n2
      val cles = if (n1 > 0 && n2 > 0)
        Some(1000000L * u2 / (2 * n1 * n2)) else None
      val den = BigInt(n1) * n2 * ((BigInt(n) * n * n - n) - ties3)
      val z2 = if (den > 0)
        Some((BigInt(3000) * dev2 * dev2 * n * (n - 1) / den).toLong)
      else None
      (n1, n2, u2, cles, dev2, z2)
    }
    val exp = rows.groupBy(_._1).map { case (p, g) =>
      val (n1, n2, u2, cles, dev2, z2) = stats(g.map(t => (t._2, t._3)))
      (p, n1, n2, u2, cles, dev2, z2)
    }.toSeq.sortBy(_._1)
    val got = Queries.rankSumShipLag(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getLong(5),
        if (r.isNullAt(6)) None else Some(r.getLong(6))))
    assert(got == exp)
    // U-statistic identity: 2U(ret) + 2U(kept) = 2·n1·n2, so the two
    // common-language effect sizes mirror around 500000 (floor slack 1)
    rows.groupBy(_._1).foreach { case (_, g) =>
      val fwd = stats(g.map(t => (t._2, t._3)))
      val rev = stats(g.map(t => (t._2, 1L - t._3)))
      assert(fwd._3 + rev._3 == 2 * fwd._1 * fwd._2)
      for (a <- fwd._4; b <- rev._4) assert(math.abs(a + b - 1000000L) <= 1L)
      // the doubled deviation flips sign, the z² is direction-free
      assert(fwd._5 == -rev._5)
      assert(fwd._6 == rev._6)
    }
  }

  test("q303 ≡ local recompute; ppm shares conserve mass per side") {
    val edges = spark.read.parquet(s"$d/lineitem.parquet")
      .join(spark.read.parquet(s"$d/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    var h = edges.map(_._1).distinct.map(c => c -> BigInt(1)).toMap
    var a = Map.empty[Long, BigInt]
    for (_ <- 1 to Graph.HitsIters) {
      a = edges.groupBy(_._2).map { case (p, g) =>
        p -> g.map(e => h(e._1)).sum
      }
      h = edges.groupBy(_._1).map { case (c, g) =>
        c -> g.map(e => a(e._2)).sum
      }
    }
    val ta = a.values.sum
    val th = h.values.sum
    val degP = edges.groupBy(_._2).map { case (p, g) => p -> g.length.toLong }
    val degC = edges.groupBy(_._1).map { case (c, g) => c -> g.length.toLong }
    val exp = (a.toSeq.map { case (p, s) =>
      ("auth", p, degP(p), (BigInt(1000000) * s / ta).toLong)
    } ++ h.toSeq.map { case (c, s) =>
      ("hub", c, degC(c), (BigInt(1000000) * s / th).toLong)
    }).sortBy(t => (t._1, t._2))
    val got = Graph.hitsBipartite(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got == exp)
    // each side's ppm shares rebuild the whole (floor loss < |nodes|)
    Seq("auth", "hub").foreach { side =>
      val s = got.filter(_._1 == side)
      assert(s.map(_._4).sum > 1000000L - s.length &&
        s.map(_._4).sum <= 1000000L)
    }
  }
}
