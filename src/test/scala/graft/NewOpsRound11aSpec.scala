package graft

import org.apache.spark.sql.functions._

/** Round-11 batch a: the ordinal/rank test battery (q319 Kruskal–
  * Wallis, q320 runs test, q321 Cochran–Armitage trend, q322 Spearman)
  * plus q323 distance contrast, q324 supply HHI, q325 order bursts —
  * local BigInt recomputes and the tests' own invariances (label-flip
  * symmetry of the runs z², weight-reversal antisymmetry of the trend
  * statistic, mass conservation of the islands histogram). */
class NewOpsRound11aSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  private def lagRows() = spark.read.parquet(s"$d/lineitem.parquet")
    .join(spark.read.parquet(s"$d/orders.parquet"),
      col("l_orderkey") === col("o_orderkey"))
    .selectExpr("o_orderpriority AS priority",
      "CAST(datediff(l_shipdate, o_orderdate) AS BIGINT) AS lag",
      "CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END AS ret")
    .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

  test("q319 ≡ local doubled-rank recompute; H ≥ 0 and H_c ≥ H") {
    val rows = lagRows()
    val byLag = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    var cum = 0L
    var tie = BigInt(0)
    val dr = scala.collection.mutable.Map.empty[Long, Long]
    byLag.keys.toSeq.sorted.foreach { v =>
      val t = byLag(v)
      dr(v) = 2 * cum + t + 1
      tie += BigInt(t) * t * t - t
      cum += t
    }
    val n = BigInt(cum)
    val groups = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (p, g) =>
      (p, g.length.toLong, g.map(t => BigInt(dr(t._2))).sum)
    }
    val cSum = groups.map { case (_, nj, s2) => BigInt(1000000) * s2 * s2 / nj }.sum
    val num = (BigInt(3) * cSum - BigInt(3000000) * n * (n + 1) * (n + 1)).max(0)
    val h = (num / (BigInt(1000) * n * (n + 1))).toLong
    val n3n = n * n * n - n
    val hc = if (n3n > tie) Some((BigInt(h) * n3n / (n3n - tie)).toLong) else None
    val exp = groups.map { case (p, nj, s2) =>
      (p, nj, s2.toLong, (BigInt(500) * s2 / nj).toLong, h, hc,
        (groups.size - 1).toLong)
    }
    val got = Queries.kruskalWallisLag(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), if (r.isNullAt(5)) None else Some(r.getLong(5)),
        r.getLong(6)))
    assert(got == exp && got.nonEmpty)
    assert(h >= 0L)
    hc.foreach(c => assert(c >= h)) // tie correction only inflates
  }

  test("q320 ≡ local recompute; z² symmetric under above/below flip") {
    val days = spark.read.parquet(s"$d/orders.parquet")
      .groupBy(col("o_orderdate")).agg(count(lit(1)).as("c"))
      .orderBy(col("o_orderdate")).collect().map(_.getLong(1))
    val nd = days.length.toLong
    val s = days.sum
    val signs = days.flatMap { c =>
      val l = BigInt(nd) * c
      if (l > s) Some(1) else if (l < s) Some(0) else None
    }
    val n1 = signs.count(_ == 1).toLong
    val n2 = signs.count(_ == 0).toLong
    val nn = n1 + n2
    val runs = if (signs.isEmpty) 0L
      else 1L + signs.sliding(2).count(p => p.length == 2 && p(0) != p(1))
    val dev = BigInt(runs - 1) * nn - BigInt(2) * n1 * n2
    val den = BigInt(2) * n1 * n2 * (BigInt(2) * n1 * n2 - nn)
    val z2 = if (den > 0) Some((BigInt(1000) * dev * dev * (nn - 1) / den).toLong)
      else None
    val r = Queries.runsTestDaily(spark, d).collect()(0)
    assert(r.getLong(0) == nd && r.getLong(1) == n1 && r.getLong(2) == n2)
    assert(r.getLong(3) == nn && r.getLong(4) == runs)
    assert((if (r.isNullAt(6)) None else Some(r.getLong(6))) == z2)
    assert(r.getLong(7) == dev.signum.toLong)
    // flipping which side is "above" leaves runs, |dev|, z² unchanged
    val flipped = signs.map(1 - _)
    val runsF = if (flipped.isEmpty) 0L
      else 1L + flipped.sliding(2).count(p => p.length == 2 && p(0) != p(1))
    assert(runsF == runs)
  }

  test("q321 ≡ local recompute; weight reversal flips trend, keeps z²") {
    val rows = lagRows()
    def stat(wOf: String => Long) = {
      val g = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (p, xs) =>
        (p, wOf(p), xs.length.toLong, xs.count(_._3 == 1L).toLong)
      }
      val n = BigInt(g.map(_._3).sum)
      val r = BigInt(g.map(_._4).sum)
      val swx = g.map(t => BigInt(t._2) * t._4).sum
      val swn = g.map(t => BigInt(t._2) * t._3).sum
      val sw2n = g.map(t => BigInt(t._2) * t._2 * t._3).sum
      val tc = n * swx - r * swn
      val vn = (r * (n - r) * (n * sw2n - swn * swn)) / n
      (g, tc, if (vn > 0) Some((BigInt(1000) * tc * tc / vn).toLong) else None)
    }
    val (g, tc, z2) = stat(_.take(1).toLong)
    val exp = g.map { case (p, w, nj, xj) =>
      (p, w, nj, xj, 1000L * xj / nj, z2, tc.signum.toLong)
    }
    val got = Queries.trendTestReturns(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), if (r.isNullAt(5)) None else Some(r.getLong(5)),
        r.getLong(6)))
    assert(got == exp && got.nonEmpty)
    // reversing the ordinal direction w -> 6 - w negates T exactly
    val (_, tcR, z2R) = stat(p => 6L - p.take(1).toLong)
    assert(tcR == -tc && z2R == z2)
  }

  test("q322 ≡ local recompute; self-correlation is exactly +1") {
    val days = spark.read.parquet(s"$d/orders.parquet")
      .groupBy(col("o_orderdate")).agg(count(lit(1)).as("x"),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("y"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    def dranks(vs: Array[Long]): Array[BigInt] = {
      val byV = vs.groupBy(identity).view.mapValues(_.length.toLong).toMap
      var cum = 0L
      val dr = scala.collection.mutable.Map.empty[Long, BigInt]
      byV.keys.toSeq.sorted.foreach { v =>
        dr(v) = BigInt(2 * cum + byV(v) + 1); cum += byV(v)
      }
      vs.map(dr)
    }
    def rho2(xs: Array[Long], ys: Array[Long]): Option[Long] = {
      val dx = dranks(xs); val dy = dranks(ys)
      val n = BigInt(xs.length)
      val cov = n * dx.zip(dy).map { case (a, b) => a * b }.sum - dx.sum * dy.sum
      val vx = n * dx.map(a => a * a).sum - dx.sum * dx.sum
      val vy = n * dy.map(a => a * a).sum - dy.sum * dy.sum
      if (vx > 0 && vy > 0)
        Some((BigInt(cov.signum) * (BigInt(1000000) * cov * cov / (vx * vy))).toLong)
      else None
    }
    val exp = rho2(days.map(_._1), days.map(_._2))
    val r = Queries.spearmanDaily(spark, d).collect()(0)
    assert(r.getLong(0) == days.length.toLong)
    assert((if (r.isNullAt(2)) None else Some(r.getLong(2))) == exp)
    // a variable against itself: cov = vx = vy, rho² = 10⁶ exactly
    assert(rho2(days.map(_._1), days.map(_._1)) == Some(1000000L))
    exp.foreach(v => assert(math.abs(v) <= 1000000L))
  }

  test("q323 ≡ brute-force recompute; mean:min ratio at least 1000") {
    val vecs = spark.read.parquet(s"$d/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1000000.0).toLong).toArray)
      .toMap
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val exp = vecs.keys.filter(_ % Similarity.PurityStride == 0L).toSeq.sorted.map { q =>
      val ds = vecs.collect { case (id, v) if id != q => d2(vecs(q), v) }.toSeq
      val n = ds.length.toLong
      val sum = ds.map(BigInt(_)).sum
      val (mn, mx) = (ds.min, ds.max)
      (q, n, mn, mx,
        if (sum > 0) Some((BigInt(1000) * (mx - mn) * n / sum).toLong) else None,
        if (mn > 0) Some((BigInt(1000) * sum / (BigInt(n) * mn)).toLong) else None)
    }
    val got = Similarity.distanceContrast(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5))))
    assert(got == exp && got.nonEmpty)
    // the mean can never undercut the minimum
    got.foreach(t => t._6.foreach(m => assert(m >= 1000L)))
  }

  test("q324 ≡ local recompute; HHI bounded by top share and 1/n floor") {
    val rev = spark.read.parquet(s"$d/lineitem.parquet")
      .join(spark.read.parquet(s"$d/supplier.parquet"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey").cast("long").as("nk"), col("s_suppkey"))
      .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("r"))
      .collect().map(r => (r.getLong(0),
        r.getAs[Number](1).longValue, r.getLong(2)))
    val names = spark.read.parquet(s"$d/nation.parquet")
      .selectExpr("CAST(n_nationkey AS BIGINT)", "n_name")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val exp = rev.groupBy(_._1).map { case (nk, g) =>
      val tot = g.map(_._3).sum
      val rr = g.map(t => BigInt(t._3) * t._3).sum
      val hhi = (BigInt(1000000) * rr / (BigInt(tot) * tot)).toLong
      (names(nk), g.length.toLong, tot, hhi,
        (BigInt(1000000) * g.map(_._3).max / tot).toLong,
        if (hhi > 0) Some(1000000000L / hhi) else None)
    }.toSeq.sortBy(_._1)
    val got = Queries.supplyHhi(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), if (r.isNullAt(5)) None else Some(r.getLong(5))))
    assert(got == exp && got.nonEmpty)
    got.foreach { t =>
      assert(t._4 <= t._5, s"${t._1}: hhi ${t._4} > top share ${t._5}")
      assert(t._4 >= 1000000L / t._2 - 1, s"${t._1}: hhi below equal-share floor")
    }
  }

  test("q325 ≡ local islands recompute; burst mass conserves order count") {
    val orders = spark.read.parquet(s"$d/orders.parquet")
      .selectExpr("o_custkey",
        "CAST(datediff(o_orderdate, DATE '1970-01-01') AS BIGINT) AS day",
        "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val seg = spark.read.parquet(s"$d/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val bursts = orders.groupBy(_._1).toSeq.flatMap { case (ck, os) =>
      val sorted = os.sortBy(t => (t._2, t._3))
      val lens = scala.collection.mutable.ArrayBuffer.empty[Long]
      var cur = 0L
      var prev: Option[Long] = None
      sorted.foreach { t =>
        val day = t._2
        if (prev.forall(p => day - p > Queries.BurstGapDays)) {
          if (cur > 0) lens += cur
          cur = 0L
        }
        cur += 1
        prev = Some(day)
      }
      if (cur > 0) lens += cur
      lens.map(l => (seg(ck), l, ck))
    }
    val exp = bursts.groupBy(t => (t._1, t._2)).map { case ((s, l), g) =>
      (s, l, g.size.toLong, g.map(_._3).distinct.size.toLong)
    }.toSeq.sortBy(t => (t._1, t._2))
    val got = Queries.orderBursts(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got == exp && got.nonEmpty)
    // every order is in exactly one burst
    assert(got.map(t => t._2 * t._3).sum == orders.length.toLong)
  }
}
