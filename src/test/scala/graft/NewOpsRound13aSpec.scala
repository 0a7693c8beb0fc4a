package graft

import org.apache.spark.sql.functions._

/** Round-13 batch a: q349 Benjamini–Hochberg FDR over the per-nation
  * return-rate chi-square battery, q350 exact Shapley channel
  * attribution — local recomputes plus the structural invariances each
  * must satisfy (BH monotonicity of the rejection set; Shapley
  * efficiency: Σφ = v(full) − v(∅) exactly in the ×6 fixed point). */
class NewOpsRound13aSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("q349 ≡ local BH recompute; rejection set is a p-value prefix") {
    val li = spark.read.parquet(s"$d/lineitem.parquet")
      .selectExpr("l_suppkey", "CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END r")
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val su = spark.read.parquet(s"$d/supplier.parquet")
      .selectExpr("s_suppkey", "CAST(s_nationkey AS BIGINT)")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    val byNation = li.groupBy(x => su(x._1)).view
      .mapValues(xs => (xs.size.toLong, xs.map(_._2).sum)).toMap
    val nn = BigInt(byNation.values.map(_._1).sum)
    val rr = BigInt(byNation.values.map(_._2).sum)
    val m = byNation.size.toLong
    def isq(x: Long): Long = {
      var s = math.sqrt(x.toDouble).toLong
      while (s > 0 && s * s > x) s -= 1
      while ((s + 1) * (s + 1) <= x) s += 1
      s
    }
    val scored = byNation.toSeq.map { case (nk, (n, r)) =>
      val den = BigInt(n) * (nn - n) * rr * (nn - rr)
      val chi2m = if (den == 0) 0L
        else ((BigInt(1000) * nn * (BigInt(r) * nn - BigInt(n) * rr).pow(2)) / den).toLong
      val zc = math.min(isq(1000L * chi2m), 6000L)
      val t = 1000000L + 196854L * zc / 1000L + 115194L * zc * zc / 1000000L +
        344L * zc * zc * zc / 1000000000L +
        (BigInt(19527) * zc * zc * zc * zc / BigInt(1000000000000L)).toLong
      (nk, n, r, chi2m, (BigInt(10).pow(30) / BigInt(t).pow(4)).toLong)
    }
    val ranked = scored.sortBy(x => (x._5, x._1)).zipWithIndex
      .map { case ((nk, n, r, c, p), i) => (nk, n, r, c, p, i + 1L) }
    val kstar = ranked.collect {
      case (_, _, _, _, p, i) if BigInt(m) * p <= BigInt(50000) * i => i
    }.foldLeft(0L)(math.max)
    val exp = ranked
      .map { case (nk, n, r, c, p, i) =>
        (nk, n, r, c, p, i, if (i <= kstar) 1L else 0L)
      }.sortBy(_._1)
    val got = Queries.fdrReturns(spark, d).collect().toSeq.map(x =>
      (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getLong(5), x.getLong(6)))
    assert(got == exp)
    // BH structure: rejections are exactly the p-rank prefix 1..k*,
    // and every rejected p is ≤ every accepted p
    val rej = got.filter(_._7 == 1L)
    assert(rej.map(_._6).sorted == (1L to rej.size.toLong))
    if (rej.nonEmpty && rej.size < got.size)
      assert(rej.map(_._5).max <= got.filter(_._7 == 0L).map(_._5).min)
    // p-values are valid ppm and monotone in rank
    assert(got.forall(x => x._5 >= 0L && x._5 <= 1000000L))
    assert(got.sortBy(_._6).map(_._5) == got.map(_._5).sorted)
  }

  test("q350 ≡ local Shapley recompute; efficiency axiom holds in x6 units") {
    // Tables.eventsNs normalizes ts to BIGINT epoch-nanos whatever the
    // physical parquet type (TIMESTAMP_NTZ at this SF)
    val ev = Tables.eventsNs(spark, d)
      .selectExpr("user_id", "event_type", "CAST(ts AS BIGINT) tns")
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
    val wkOf = (t: Long) => t / 86400000000000L / 7L
    val firstP = ev.filter(_._2 == "purchase")
      .groupBy(e => (e._1, wkOf(e._3))).view.mapValues(_.map(_._3).min).toMap
    val bits = Map("click" -> 1, "view" -> 2, "signup" -> 4)
    // .toSeq BEFORE map: mapping the Map to (mask, conv) pairs would
    // re-form a Map keyed by mask and silently dedup the windows
    val windows = ev.groupBy(e => (e._1, wkOf(e._3))).toSeq.map { case (uw, es) =>
      val pts = firstP.get(uw)
      val mask = es.filter(e => bits.contains(e._2) &&
        pts.forall(e._3 < _)).map(e => bits(e._2)).foldLeft(0)(_ | _)
      (mask, if (pts.isDefined) 1L else 0L)
    }.toSeq
    val cnt = Array.fill(8)(0L); val cv = Array.fill(8)(0L)
    windows.foreach { case (mk, cf) => cnt(mk) += 1; cv(mk) += cf }
    def rate(s: Int): Long = {
      val ts = (0 until 8).filter(t => (t & ~s) == 0)
      val n = ts.map(cnt).sum
      if (n == 0) 0L else 1000000L * ts.map(cv).sum / n
    }
    val w6 = Array(2L, 1L, 2L)
    val exp = Seq(1 -> "click", 4 -> "signup", 2 -> "view").map { case (b, nm) =>
      val phi6 = (0 until 8).filter(s => (s & b) == 0)
        .map(s => w6(Integer.bitCount(s)) * (rate(s | b) - rate(s))).sum
      val ex = (0 until 8).filter(t => (t & b) != 0)
      (nm, ex.map(cnt).sum, ex.map(cv).sum, phi6)
    }.sortBy(_._1)
    val got = Queries.shapleyAttribution(spark, d).collect().toSeq.map(x =>
      (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(got == exp)
    // efficiency: Σφ·6⁻¹ = v(grand) − v(∅) exactly in sixths — the
    // axiom that distinguishes Shapley from q175's heuristics
    assert(got.map(_._4).sum == 6L * (rate(7) - rate(0)))
  }
}
