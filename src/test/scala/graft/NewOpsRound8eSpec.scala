package graft

/** Independent recomputes for the fifth round-8 batch (q233-q236):
  * plain Scala folds over collected rows (no Spark SQL on the expected
  * side), BigInt wherever the operator routes DECIMAL(38,0)/HUGEINT,
  * brute-force formulas where the engine uses a smarter plan (the
  * O(n²) dominance scan vs q234's sort-based skyline; the all-pairs
  * slope list vs q235's deterministic rank pick). */
class NewOpsRound8eSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  /** (brand, month) -> revenue cents, assembled from separately
    * collected fact and dimension tables (Scala-side join). */
  private def brandMonthRev: Map[(String, Long), Long] = {
    val brand = spark.read.parquet(s"$d/part.parquet")
      .selectExpr("p_partkey", "p_brand").collect().toSeq
      .map(r => (r.getLong(0), r.getString(1))).toMap
    spark.read.parquet(s"$d/lineitem.parquet")
      .selectExpr("l_partkey",
        "CAST(year(l_shipdate) * 12 + month(l_shipdate) - 1 AS BIGINT)",
        "CAST(round(l_extendedprice * 100) AS BIGINT)")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(x => brand.contains(x._1))
      .groupBy(x => (brand(x._1), x._2)).view
      .mapValues(_.map(_._3).sum).toMap
  }

  test("q233 seasonal index ≡ local centered-year fold") {
    val bm = brandMonthRev
    val exp = bm.toSeq.flatMap { case ((b, m), rev) =>
      val win = (m - 6 to m + 5).flatMap(mm => bm.get((b, mm)))
      if (win.size == 12) {
        val s = win.map(BigInt(_)).sum
        Some((b, m, rev, (s / 12).toLong,
          ((BigInt(12000) * rev) / s).toLong))
      } else None
    }.sortBy(x => (x._1, x._2))
    val got = Queries.seasonalIndex(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got == exp)
    // seasonality registers in both directions and the filter bites
    assert(exp.exists(_._5 > 1000) && exp.exists(_._5 < 1000))
    assert(exp.size < bm.size)
  }

  test("q234 supplier skyline ≡ local O(n²) dominance scan") {
    val oday = spark.read.parquet(s"$d/orders.parquet")
      .selectExpr("o_orderkey",
        "CAST(datediff(o_orderdate, DATE '1970-01-01') AS BIGINT)")
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1))).toMap
    val sup = spark.read.parquet(s"$d/lineitem.parquet")
      .selectExpr("l_orderkey", "l_suppkey",
        "CAST(round(l_extendedprice * 100) AS BIGINT)",
        "CAST(round(l_quantity) AS BIGINT)",
        "CAST(datediff(l_shipdate, DATE '1970-01-01') AS BIGINT)")
      .collect().toSeq
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4) - oday(r.getLong(0))))
      .groupBy(_._1).toSeq.map { case (sk, xs) =>
        val lagSum = 1000L * xs.map(_._4).sum
        // sign-decomposed like the operator (per-line lags go negative
        // in the corpus tail; supplier SUMS may too at other SFs)
        val lag = if (lagSum >= 0) Math.floorDiv(lagSum, xs.size.toLong)
                  else -Math.floorDiv(-lagSum, xs.size.toLong)
        (sk, Math.floorDiv(1000L * xs.map(_._2).sum, xs.map(_._3).sum),
          lag, xs.size.toLong)
      }
    val exp = sup.filter { a =>
      !sup.exists(b => b._2 <= a._2 && b._3 <= a._3 &&
        (b._2 < a._2 || b._3 < a._3))
    }.sortBy(_._1)
    val got = Queries.supplierSkyline(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got == exp)
    // the frontier is a genuine frontier: strictly decreasing lag as
    // price rises, and it prunes most suppliers
    val byPrice = exp.sortBy(x => (x._2, x._3))
    assert(byPrice.sliding(2).forall {
      case Seq(p, q) => p._2 < q._2 == p._3 > q._3 || p._2 == q._2
      case _ => true
    })
    assert(exp.size < sup.size)
  }

  test("q235 Theil-Sen trend ≡ local all-pairs median") {
    val bm = brandMonthRev
    val exp = bm.keys.map(_._1).toSeq.distinct.map { b =>
      val ms = bm.collect { case ((`b`, m), r) => (m, r) }.toSeq.sortBy(_._1)
      val slopes = for {
        (m1, r1) <- ms; (m2, r2) <- ms if m2 > m1
      } yield {
        val s =
          if (r2 >= r1) (BigInt(1000) * (r2 - r1)) / (m2 - m1)
          else -((BigInt(1000) * (r1 - r2)) / (m2 - m1))
        (s.toLong, m1, m2)
      }
      val sorted = slopes.sortBy(identity)
      val med = sorted((sorted.size + 1) / 2 - 1)._1
      (b, ms.size.toLong, slopes.size.toLong, med)
    }.sortBy(_._1)
    val got = Queries.theilSenTrend(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got == exp)
    // trends disagree across brands (the median is doing work)
    assert(exp.map(_._4).distinct.size > 1)
  }

  test("q236 nDCG ≡ local graded-discount fold") {
    val disc = Map(1L -> 1000000L, 2L -> 630929L, 3L -> 500000L,
      4L -> 430676L, 5L -> 386852L)
    def lst(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
      df.selectExpr("q_id", "neighbor_id", "rank").collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ex = lst(Similarity.bruteForceTopK(spark, d))
    val gain = ex.map { case (q, n, rk) =>
      ((q, n), if (rk == 1L) 3L else if (rk <= 3L) 2L else 1L)
    }.toMap
    val idcg = ex.groupBy(_._1).view.mapValues(
      _.map { case (q, n, rk) => gain((q, n)) * disc(rk) }.sum).toMap
    def dcg(ap: Seq[(Long, Long, Long)]): Map[Long, Long] =
      ap.groupBy(_._1).view.mapValues(
        _.map { case (q, n, rk) => gain.getOrElse((q, n), 0L) * disc(rk) }
          .sum).toMap
    val dl = dcg(lst(Similarity.lshTopK(spark, d)))
    val d8 = dcg(lst(Similarity.int8TopK(spark, d)))
    val exp = idcg.toSeq.sortBy(_._1).map { case (q, i) =>
      val l = dl.getOrElse(q, 0L); val e8 = d8.getOrElse(q, 0L)
      (q, i, l, if (dl.contains(q)) 1000L * l / i else 0L,
        e8, if (d8.contains(q)) 1000L * e8 / i else 0L)
    }
    val got = Similarity.ndcgEval(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got == exp)
    // every exact list has 5 rows → iDCG is the fixed gain·discount sum
    assert(exp.forall(_._2 == 6079386L))
    // nDCG is a proper normalized score and the indexes aren't perfect
    // everywhere (otherwise the metric isn't separating the paths)
    assert(exp.forall(x => x._4 <= 1000L && x._6 <= 1000L))
    assert(exp.exists(x => x._4 < 1000L || x._6 < 1000L))
  }
}
