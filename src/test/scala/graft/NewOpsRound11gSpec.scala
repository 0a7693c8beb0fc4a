package graft

import org.apache.spark.sql.functions._

/** Round-11 batch g: q340 revenue concentration, q341 difference-in-
  * differences, q342 power analysis — local recomputes plus the
  * statistics' identities (Lorenz cumulative monotone to 1000, DiD
  * antisymmetric under group swap, required n shrinks as the
  * detectable delta grows). */
class NewOpsRound11gSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("q340 ≡ local ntile recompute; cumulative share monotone to 1000") {
    val cust = spark.read.parquet(s"$d/orders.parquet")
      .groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
      .join(spark.read.parquet(s"$d/customer.parquet"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_custkey"), col("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val exp = cust.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (s, g) =>
      val sorted = g.sortBy(t => (-t._3, t._2))
      val n = sorted.length
      // SQL ntile: first (n % 10) tiles get one extra row
      val base = n / 10
      val extra = n % 10
      val tiles = sorted.zipWithIndex.map { case (t, i) =>
        val cut = extra * (base + 1)
        val tile = if (i < cut) i / (base + 1) + 1
          else (i - cut) / base + extra + 1
        (tile.toLong, t._3)
      }
      val byTile = tiles.groupBy(_._1).toSeq.sortBy(_._1)
      val tot = g.map(_._3).sum
      var cum = 0L
      byTile.map { case (dec, rows) =>
        val cents = rows.map(_._2).sum
        cum += cents
        (s, dec, rows.length.toLong, cents, 1000L * cents / tot,
          1000L * cum / tot)
      }
    }
    val got = Queries.revenueConcentration(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got == exp && got.nonEmpty)
    got.groupBy(_._1).foreach { case (_, g) =>
      val cums = g.sortBy(_._2).map(_._6)
      assert(cums == cums.sorted && cums.last == 1000L)
      // the top decile carries at least an equal share
      assert(g.minBy(_._2)._5 >= 100L)
    }
  }

  test("q341 ≡ local 2x2 recompute; DiD antisymmetric under group swap") {
    val rows = spark.read.parquet(s"$d/lineitem.parquet")
      .join(spark.read.parquet(s"$d/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .selectExpr(
        "CASE WHEN CAST(substring(o_orderpriority, 1, 1) AS INT) <= 2" +
          " THEN 1L ELSE 0L END AS grp",
        s"CASE WHEN l_shipdate < TIMESTAMP '${Queries.PeriodSplitDate}'" +
          " THEN 0L ELSE 1L END AS period",
        "CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END AS ret")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def fold(rs: Seq[(Long, Long, Long)]) = {
      val cells = rs.groupBy(t => (t._1, t._2)).toSeq.sortBy(_._1)
        .map { case ((g, p), xs) =>
          val n = xs.length.toLong
          val x = xs.count(_._3 == 1L).toLong
          (g, p, n, x, 1000000L * x / n,
            (BigInt(1000000000000L) * x * (n - x) /
              (BigInt(n) * n * n)).toLong)
        }
      def rate(g: Long, p: Long) =
        cells.find(c => c._1 == g && c._2 == p).map(_._5).getOrElse(0L)
      val did = (rate(1, 1) - rate(1, 0)) - (rate(0, 1) - rate(0, 0))
      val varSum = cells.map(_._6).sum
      val z2 = if (varSum > 0 && cells.map(_._3).min > 0)
        Some((BigInt(1000) * did * did / varSum).toLong) else None
      (cells, did, z2)
    }
    val (cells, did, z2) = fold(rows.toSeq)
    val exp = cells.map(c => (c._1, c._2, c._3, c._4, c._5, did, z2))
    val got = Queries.didReturns(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5),
        if (r.isNullAt(6)) None else Some(r.getLong(6))))
    assert(got == exp && got.size == 4)
    // swapping which group is "treated" negates DiD, keeps z²
    val (_, didS, z2S) = fold(rows.toSeq.map(t => (1L - t._1, t._2, t._3)))
    assert(didS == -did && z2S == z2)
  }

  test("q342 ≡ local sizing recompute; required n shrinks with delta") {
    val g = spark.read.parquet(s"$d/lineitem.parquet")
      .join(spark.read.parquet(s"$d/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(expr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT)").as("w"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END")).as("x"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val z2 = (Queries.PowerZAlphaMilli + Queries.PowerZBetaMilli) *
      (Queries.PowerZAlphaMilli + Queries.PowerZBetaMilli)
    def req(p1: Long, p2: Long): Option[Long] =
      if (p1 == p2) None
      else {
        val v = BigInt(p1) * (1000000L - p1) + BigInt(p2) * (1000000L - p2)
        val d2 = BigInt(p1 - p2) * (p1 - p2) * 1000000L
        Some(((BigInt(z2) * v + d2 - 1) / d2).toLong)
      }
    val exp = g.toSeq.sliding(2).collect { case Seq(a, b) =>
      val pa = 1000000L * a._3 / a._2
      val pb = 1000000L * b._3 / b._2
      val nr = req(pa, pb)
      (a._1, b._1, a._2, b._2, pa, pb, pa - pb, nr,
        nr.map(r => if (math.min(a._2, b._2) >= r) 1L else 0L))
    }.toSeq
    val got = Queries.powerSampleSize(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6),
        if (r.isNullAt(7)) None else Some(r.getLong(7)),
        if (r.isNullAt(8)) None else Some(r.getLong(8))))
    assert(got == exp && got.nonEmpty)
    // monotonicity of the formula itself: doubling delta quarters n up
    // to the (small) variance drift of the second rate
    val n1 = req(500000L, 510000L).get
    val n2 = req(500000L, 520000L).get
    assert(n2 < n1 && n1 < 4L * n2 + n2 / 50L)
  }
}
