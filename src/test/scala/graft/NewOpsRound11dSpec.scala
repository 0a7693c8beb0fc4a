package graft

import org.apache.spark.sql.functions._

/** Round-11 batch d: q333 Friedman weekday test, q334 as-of join with
  * staleness tolerance — local recomputes plus invariances (block
  * permutation leaves Q fixed; the tolerance only ever NULLs q44
  * matches, never invents or reroutes one). */
class NewOpsRound11dSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("q333 ≡ local block-rank recompute; block shuffle leaves Q fixed") {
    val days = spark.read.parquet(s"$d/orders.parquet")
      .selectExpr("CAST(datediff(o_orderdate, DATE '1970-01-01') AS BIGINT) AS dy")
      .collect().map(_.getLong(0))
    val cnt = days.groupBy(dy => (dy / 7, dy % 7)).view.mapValues(_.length.toLong).toMap
    val w0 = days.map(_ / 7).min + 1
    val w1 = days.map(_ / 7).max - 1
    def blockRanks(vals: Seq[Long]): Seq[Long] = vals.map { v =>
      val below = vals.count(_ < v).toLong
      val ties = vals.count(_ == v).toLong
      2 * below + ties + 1
    }
    val weeks = (w0 to w1).toSeq
    val perBlock = weeks.map { w =>
      val vals = (0L to 6L).map(dw => cnt.getOrElse((w, dw), 0L))
      blockRanks(vals)
    }
    val rankSum = (0 until 7).map(j => perBlock.map(_(j)).sum)
    val b = weeks.length.toLong
    val num = rankSum.map(r => BigInt(r - b * 8) * (r - b * 8)).sum
    val sdr2 = perBlock.flatten.map(r => BigInt(r) * r).sum
    val den = sdr2 - BigInt(b) * 7 * 64
    val q = if (den > 0) Some((BigInt(6000) * num / den).toLong) else None
    val exp = (0 until 7).map { j =>
      (j.toLong, b, rankSum(j), BigInt(500) * rankSum(j) / b, q, 6L)
    }
    val got = Queries.friedmanDow(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), BigInt(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getLong(5)))
    assert(got == exp && got.size == 7)
    // permuting whole blocks can't change any rank sum (ranks are
    // within-block): recompute with weeks reversed
    val rankSumR = (0 until 7).map(j => perBlock.reverse.map(_(j)).sum)
    assert(rankSumR == rankSum)
  }

  test("q334 ≡ local tolerance recompute; TTL only ever NULLs q44 matches") {
    val ev = Tables.eventsNs(spark, d)
      .filter(col("event_type").isin("click", "view"))
      .select(col("event_type"), col("user_id"),
        expr("ts div 1000").as("tus"), col("event_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val views = ev.filter(_._1 == "view").groupBy(_._2).view
      .mapValues(_.map(t => (t._3, t._4)).sortBy(identity)).toMap
    val exp = ev.filter(_._1 == "click").sortBy(_._4).map { c =>
      val prior = views.getOrElse(c._2, Array.empty[(Long, Long)])
        .filter(_._1 <= c._3)
      if (prior.isEmpty) (c._4, c._2, c._3, None, None, None, -1L)
      else {
        val (vts, vid) = prior.max
        val gap = c._3 - vts
        if (gap <= operators.TemporalJoins.AsofToleranceUs)
          (c._4, c._2, c._3, Some(vid), Some(vts), Some(gap), 1L)
        else (c._4, c._2, c._3, None, None, None, 0L)
      }
    }.toSeq
    val got = operators.TemporalJoins.asofJoinTolerance(spark, d)
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5)),
        r.getLong(6)))
    assert(got == exp && got.nonEmpty)
    // against q44: same clicks, and a fresh match (matched = 1) must
    // carry exactly q44's view; a stale one (0) must have had a q44
    // match the TTL discarded
    val base = operators.TemporalJoins.asofJoin(spark, d).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toMap
    assert(got.map(_._1).toSet == base.keySet)
    got.foreach { t =>
      if (t._7 == 1L) assert(t._4 == base(t._1))
      else { assert(t._4.isEmpty); if (t._7 == 0L) assert(base(t._1).nonEmpty) }
    }
  }
}
