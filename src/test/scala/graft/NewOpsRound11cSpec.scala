package graft

import org.apache.spark.sql.functions._

/** Round-11 batch c: q328 Cramér's V matrix, q329 feed liveness, q330
  * Mantel–Haenszel, q331 lag moments, q332 Wilcoxon signed-rank —
  * local recomputes plus the statistics' own identities (V² symmetry
  * under column swap, liveness mass conservation, MH direction
  * consistency, moment identities on degenerate groups, signed-rank
  * antisymmetry under time reversal). */
class NewOpsRound11cSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("q328 ≡ local cube fold; V² within [0, 10⁶]") {
    val cells = spark.read.parquet(s"$d/lineitem.parquet")
      .join(spark.read.parquet(s"$d/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .join(spark.read.parquet(s"$d/customer.parquet"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderpriority"), col("l_returnflag"),
        col("c_mktsegment"), col("l_linestatus"))
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (Map("priority" -> r.getString(0),
        "returnflag" -> r.getString(1), "segment" -> r.getString(2),
        "linestatus" -> r.getString(3)), r.getLong(4)))
    val cats = Seq("priority", "returnflag", "segment", "linestatus")
    val exp = (for {
      i <- cats.indices; j <- cats.indices if i < j
    } yield {
      val (ca, cb) = (cats(i), cats(j))
      val g = cells.groupBy(t => (t._1(ca), t._1(cb))).view
        .mapValues(_.map(_._2).sum).toMap
      val rm = g.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
      val cm = g.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
      val n = BigInt(g.values.sum)
      val chi2 = g.map { case ((va, vb), o) =>
        val dev = n * o - BigInt(rm(va)) * cm(vb)
        BigInt(1000) * dev * dev / (n * rm(va) * cm(vb))
      }.sum
      val md = BigInt(math.min(rm.size, cm.size) - 1)
      (ca, cb, rm.size.toLong, cm.size.toLong, n.toLong, chi2.toLong,
        if (md > 0) Some((BigInt(1000) * chi2 / (n * md)).toLong) else None)
    }).sortBy(t => (t._1, t._2))
    val got = Queries.cramersVMatrix(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5),
        if (r.isNullAt(6)) None else Some(r.getLong(6))))
    assert(got == exp && got.size == 6)
    got.foreach(t => t._7.foreach(v => assert(v >= 0L && v <= 1000000L)))
  }

  test("q329 ≡ local spine recompute; live + dead = spine, streak ≤ dead") {
    val ev = Tables.eventsNs(spark, d)
      .select(col("event_type"),
        expr(s"ts div ${Queries.LivenessWinNs}").as("win"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val mn = ev.map(_._2).min
    val mx = ev.map(_._2).max
    val types = ev.map(_._1).distinct.sorted
    val obs = ev.groupBy(identity).view.mapValues(_.length).toMap
    val exp = types.map { t =>
      val wins = (mn to mx).toSeq
      val dead = wins.map(w => !obs.contains((t, w)))
      val nDead = dead.count(identity).toLong
      var cur = 0L
      var best = 0L
      dead.foreach { isd =>
        if (isd) { cur += 1; best = math.max(best, cur) } else cur = 0
      }
      (t, wins.length.toLong, wins.length - nDead, nDead,
        1000L * nDead / wins.length, best)
    }
    val got = Queries.feedLiveness(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got == exp.toSeq && got.nonEmpty)
    got.foreach { t =>
      assert(t._3 + t._4 == t._2)
      assert(t._6 <= t._4)
    }
  }

  test("q330 ≡ local MH fold; crude-vs-stratified direction consistent") {
    val rows = spark.read.parquet(s"$d/lineitem.parquet")
      .join(spark.read.parquet(s"$d/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .selectExpr("o_orderpriority AS priority",
        s"CASE WHEN l_quantity >= ${Queries.MhQtyCut} THEN 1L ELSE 0L END AS hi",
        "CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END AS ret")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val strata = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (p, g) =>
      val a = g.count(t => t._2 == 1 && t._3 == 1).toLong
      val b = g.count(t => t._2 == 1 && t._3 == 0).toLong
      val c = g.count(t => t._2 == 0 && t._3 == 1).toLong
      val dd = g.count(t => t._2 == 0 && t._3 == 0).toLong
      (p, a, b, c, dd)
    }
    def micro(x: BigInt, n: Long): Long = (BigInt(1000000) * x / n).toLong
    val sa = strata.map(_._2).sum
    val sn = strata.map(t => micro(BigInt(t._2) * t._5, t._2 + t._3 + t._4 + t._5)).sum
    val sd = strata.map(t => micro(BigInt(t._3) * t._4, t._2 + t._3 + t._4 + t._5)).sum
    val se = strata.map(t => micro(BigInt(t._2 + t._3) * (t._2 + t._4),
      t._2 + t._3 + t._4 + t._5)).sum
    val sv = strata.map { t =>
      val n = t._2 + t._3 + t._4 + t._5
      (BigInt(1000000) * (t._2 + t._3) * (t._4 + t._5) * (t._2 + t._4) *
        (t._3 + t._5) / (BigInt(n) * n * (n - 1))).toLong
    }.sum
    val orMh = if (sd > 0) Some(1000L * sn / sd) else None
    val devC = BigInt(1000000) * sa - se
    val cmh = if (sv > 0)
      Some((BigInt(1000) * devC * devC / (BigInt(1000000) * sv)).toLong)
    else None
    val exp = strata.map { case (p, a, b, c, dd) =>
      (p, a, b, c, dd,
        if (b * c > 0) Some(1000L * a * dd / (b * c)) else None,
        orMh, cmh, devC.signum.toLong)
    }
    val got = Queries.mantelHaenszel(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getLong(5)),
        if (r.isNullAt(6)) None else Some(r.getLong(6)),
        if (r.isNullAt(7)) None else Some(r.getLong(7)),
        r.getLong(8)))
    assert(got == exp && got.nonEmpty)
    // all four cells partition every line item exactly once
    assert(strata.map(t => t._2 + t._3 + t._4 + t._5).sum == rows.length.toLong)
  }

  test("q331 ≡ local moment fold; constant series degenerate to NULLs") {
    val rows = spark.read.parquet(s"$d/lineitem.parquet")
      .join(spark.read.parquet(s"$d/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .selectExpr("o_orderpriority AS priority",
        "CAST(datediff(l_shipdate, o_orderdate) AS BIGINT) AS x")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val exp = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (p, g) =>
      val n = BigInt(g.length)
      val xs = g.map(t => BigInt(t._2))
      val s = xs.sum
      val p2 = xs.map(x => x * x).sum
      val p3 = xs.map(x => x * x * x).sum
      val p4 = xs.map(x => x * x * x * x).sum
      val a2 = n * p2 - s * s
      val a3 = n * n * p3 - 3 * n * s * p2 + 2 * s * s * s
      val a4 = n * n * n * p4 - 4 * n * n * s * p3 + 6 * n * s * s * p2 -
        3 * s * s * s * s
      val skew = if (a2 > 0) {
        val r = BigInt(1000000) * a3.abs / a2
        Some((BigInt(a3.signum) * (r * r / (BigInt(1000000000) * a2))).toLong)
      } else None
      val kurt = if (a2 > 0) Some((BigInt(1000) * a4 / (a2 * a2)).toLong)
        else None
      (p, n.toLong, (BigInt(1000) * s / n).toLong,
        Some((BigInt(1000) * a2 / (n * n)).toLong), skew, kurt)
    }
    val got = Queries.lagMoments(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5))))
    assert(got == exp && got.nonEmpty)
    // identity: a constant sample has a2 = a3 = a4 = 0 exactly
    val c = Seq.fill(7)(BigInt(42))
    val (n, s) = (BigInt(7), c.sum)
    assert(n * c.map(x => x * x).sum - s * s == 0)
  }

  test("q332 ≡ local signed-rank fold; time reversal negates the deviation") {
    val gaps = spark.read.parquet(s"$d/orders.parquet")
      .selectExpr("o_custkey",
        "CAST(datediff(o_orderdate, DATE '1970-01-01') AS BIGINT) AS day",
        "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).values.toSeq
      .flatMap { os =>
        val s = os.sortBy(t => (t._2, t._3)).map(_._2)
        if (s.length >= 3) Some(((s(1) - s(0)), (s(2) - s(1)))) else None
      }
    val diffs = gaps.map { case (g1, g2) => g2 - g1 }
    def fold(ds: Seq[Long]) = {
      val nz = ds.filter(_ != 0L)
      val byAbs = nz.groupBy(math.abs).view.mapValues(g =>
        (g.length.toLong, g.count(_ > 0).toLong)).toMap
      var cum = 0L
      var w2 = BigInt(0)
      var tie = BigInt(0)
      byAbs.keys.toSeq.sorted.foreach { v =>
        val (t, pos) = byAbs(v)
        w2 += BigInt(pos) * (2 * cum + t + 1)
        tie += BigInt(t) * t * t - t
        cum += t
      }
      val n = BigInt(cum)
      val dev = w2 - n * (n + 1) / 2
      val den = BigInt(2) * n * (n + 1) * (2 * n + 1) - tie
      (cum, nz.count(_ > 0).toLong, w2, dev,
        if (den > 0 && n > 0) Some((BigInt(12000) * dev * dev / den).toLong)
        else None)
    }
    val (nk, nPos, w2, dev, z2) = fold(diffs)
    val nZero = diffs.count(_ == 0L).toLong
    val r = Queries.wilcoxonRepeat(spark, d).collect()(0)
    assert(r.getLong(0) == nk + nZero && r.getLong(1) == nZero)
    assert(r.getLong(2) == nPos && r.getLong(3) == nk - nPos)
    assert(r.getLong(4) == w2.toLong && r.getLong(5) == dev.signum.toLong)
    assert((if (r.isNullAt(6)) None else Some(r.getLong(6))) == z2)
    // reversing time (diff -> -diff) negates dev, preserves z²
    val (_, _, _, devR, z2R) = fold(diffs.map(-_))
    assert(devR == -dev && z2R == z2)
  }
}
