package graft

import org.apache.spark.sql.functions._

/** Round-10 batch l: q304 chi-square independence, q305 event
  * overdispersion, q306 median bootstrap — local recomputes plus the
  * identities each statistic owes (margin reconstruction, Poisson
  * fixture calibration, band-brackets-median coverage). */
class NewOpsRound10lSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  private val P = 1000000007L
  private def polyhash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) { h = (h * 131L + s.charAt(i)) % P; i += 1 }
    h
  }

  test("q304 ≡ local recompute; contributions sum; margins rebuild n") {
    val rows = spark.read.parquet(s"$d/lineitem.parquet")
      .join(spark.read.parquet(s"$d/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"), col("l_returnflag")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val cells = rows.groupBy(identity).map { case ((p, f), g) =>
      (p, f, g.length.toLong)
    }.toSeq
    val n = cells.map(_._3).sum
    val rTot = cells.groupBy(_._1).map { case (p, g) => p -> g.map(_._3).sum }
    val cTot = cells.groupBy(_._2).map { case (f, g) => f -> g.map(_._3).sum }
    val (r, c) = (rTot.size.toLong, cTot.size.toLong)
    val contribs = cells.map { case (p, f, o) =>
      val res = BigInt(n) * o - BigInt(rTot(p)) * cTot(f)
      ((p, f), (o, 1000L * rTot(p) * cTot(f) / n,
        (1000 * res * res / (BigInt(n) * rTot(p) * cTot(f))).toLong))
    }.toMap
    val chisq = contribs.values.map(_._3).sum
    val exp = contribs.toSeq.map { case ((p, f), (o, e, cm)) =>
      (p, f, o, e, cm, chisq, (r - 1) * (c - 1),
        1000L * chisq / (n * (math.min(r, c) - 1)))
    }.sortBy(t => (t._1, t._2))
    val got = Queries.chisqIndependence(spark, d).collect().toSeq
      .map(x => (x.getString(0), x.getString(1), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getLong(5), x.getLong(6), x.getLong(7)))
    assert(got == exp)
    // expected counts rebuild n per row-margin (floor slack < c cells)
    rTot.foreach { case (p, rt) =>
      val es = got.filter(_._1 == p).map(_._4).sum
      assert(es <= 1000L * rt && es > 1000L * rt - c)
    }
  }

  test("q305 ≡ local recompute; constant fixture reads under-dispersed") {
    val ev = Tables.eventsNs(spark, d)
      .selectExpr("event_type", "ts div 86400000000000 AS day").collect()
      .map(x => (x.getString(0), x.getLong(1)))
    val exp = ev.groupBy(_._1).map { case (et, g) =>
      val counts = g.groupBy(_._2).map(_._2.length.toLong).toSeq
      val nd = counts.length.toLong
      val total = counts.sum
      val sumsq = counts.map(x => x * x).sum
      val num = nd * sumsq - total * total
      val vmr = if (nd > 1) Some(1000L * num / ((nd - 1) * total)) else None
      val resid = BigInt(num) - BigInt(nd - 1) * total
      val flag = if (resid * resid > BigInt(18) * (nd - 1) * total * total &&
        num > (nd - 1) * total) 1L else 0L
      (et, nd, total, vmr, 1000L * num / total, flag)
    }.toSeq.sortBy(_._1)
    val got = Queries.eventOverdispersion(spark, d).collect().toSeq
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        if (x.isNullAt(3)) None else Some(x.getLong(3)), x.getLong(4),
        x.getLong(5)))
    assert(got == exp)
    // calibration fixture: a perfectly constant series is maximally
    // under-dispersed (VMR 0, never burst-flagged); a one-spike series
    // over enough flat days crosses the 3-sigma bar
    def local(counts: Seq[Long]): (Long, Long) = {
      val nd = counts.length.toLong
      val total = counts.sum
      val sumsq = counts.map(x => x * x).sum
      val num = nd * sumsq - total * total
      val resid = BigInt(num) - BigInt(nd - 1) * total
      (1000L * num / ((nd - 1) * total),
        if (resid * resid > BigInt(18) * (nd - 1) * total * total &&
          num > (nd - 1) * total) 1L else 0L)
    }
    assert(local(Seq.fill(30)(7L)) == (0L, 0L))
    val (vmrSpike, flagSpike) = local(Seq.fill(29)(1L) :+ 1000L)
    assert(vmrSpike > 1000L && flagSpike == 1L)
  }

  test("q306 ≡ local recompute; band brackets the point median") {
    val orders = spark.read.parquet(s"$d/orders.parquet")
      .selectExpr("o_custkey", "o_orderkey", "CAST(o_orderdate AS DATE) od")
      .collect().map(x => (x.getLong(0), x.getLong(1),
        x.getDate(2).toLocalDate))
    val segOf = spark.read.parquet(s"$d/customer.parquet")
      .select("c_custkey", "c_mktsegment").collect()
      .map(x => (x.getLong(0), x.getString(1))).toMap
    val gaps = orders.groupBy(_._1).toSeq.flatMap { case (ck, g) =>
      val sorted = g.sortBy(o => (o._3.toEpochDay, o._2))
      if (sorted.length < 2) None
      else Some((segOf(ck), ck,
        sorted(1)._3.toEpochDay - sorted.head._3.toEpochDay))
    }
    def wMedian(hist: Seq[(Long, Long)]): Option[Long] = {
      val tw = hist.map(_._2).sum
      if (tw == 0) None
      else {
        var cum = 0L
        hist.sortBy(_._1).collectFirst {
          case (gap, c) if { cum += c; cum >= (tw + 1) / 2 } => gap
        }
      }
    }
    val exp = gaps.groupBy(_._1).map { case (seg, g) =>
      val medians = (0 until Queries.BootstrapB).flatMap { b =>
        val hist = g.map { case (_, ck, gap) =>
          (gap, java.lang.Long.bitCount(polyhash(s"$ck:$b") % 16).toLong)
        }.groupBy(_._1).map { case (gap, h) => (gap, h.map(_._2).sum) }.toSeq
        wMedian(hist).map(m => (m, b.toLong))
      }.sorted
      def at(rn: Int): Option[Long] =
        if (medians.length >= rn) Some(medians(rn - 1)._1) else None
      val point = wMedian(g.groupBy(_._3).map { case (gap, h) =>
        (gap, h.length.toLong)
      }.toSeq).get
      val lo = at(2)
      val hi = at(Queries.BootstrapB - 1)
      (seg, g.length.toLong, point, lo, hi,
        for (a <- hi; b <- lo) yield a - b)
    }.toSeq.sortBy(_._1)
    val got = Queries.bootstrapMedianCi(spark, d).collect().toSeq
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        if (x.isNullAt(3)) None else Some(x.getLong(3)),
        if (x.isNullAt(4)) None else Some(x.getLong(4)),
        if (x.isNullAt(5)) None else Some(x.getLong(5))))
    assert(got == exp)
    // a mean-2 weighted resample of its own data brackets the point
    // median (rank statistics move in whole histogram bins)
    got.foreach { t =>
      for (lo <- t._4; hi <- t._5) assert(lo <= t._3 && hi >= t._3)
    }
  }
}
