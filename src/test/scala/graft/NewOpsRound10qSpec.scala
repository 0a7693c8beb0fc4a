package graft

import org.apache.spark.sql.functions._

/** Round-10 batch q: q315 two-proportion return-rate drift, q316 part
  * price dispersion — local recomputes plus the test identities
  * (period-swap symmetry of z²; single-quote parts disperse 0). */
class NewOpsRound10qSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("q315 ≡ local recompute; z² is symmetric under period swap") {
    val rows = spark.read.parquet(s"$d/lineitem.parquet")
      .join(spark.read.parquet(s"$d/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .selectExpr("o_orderpriority AS priority",
        s"CASE WHEN l_shipdate < TIMESTAMP '${Queries.PeriodSplitDate}'" +
          " THEN 1L ELSE 0L END AS early",
        "CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END AS ret")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def z2(na: Long, xa: Long, nb: Long, xb: Long): Option[Long] = {
      val den = BigInt(na) * nb * (xa + xb) * (na + nb - xa - xb)
      if (den > 0) {
        val num = BigInt(xa) * nb - BigInt(xb) * na
        Some((BigInt(1000) * num * num * (na + nb) / den).toLong)
      } else None
    }
    val exp = rows.groupBy(_._1).map { case (p, g) =>
      val na = g.count(_._2 == 1L).toLong
      val xa = g.count(t => t._2 == 1L && t._3 == 1L).toLong
      val nb = g.count(_._2 == 0L).toLong
      val xb = g.count(t => t._2 == 0L && t._3 == 1L).toLong
      (p, na, xa, nb, xb, 1000L * xa / na, 1000L * xb / nb,
        1000L * xa / na - 1000L * xb / nb, z2(na, xa, nb, xb))
    }.toSeq.sortBy(_._1)
    val got = Queries.returnRateDrift(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        if (r.isNullAt(8)) None else Some(r.getLong(8))))
    assert(got == exp)
    // the statistic doesn't care which period is called A
    exp.foreach { t =>
      assert(z2(t._2, t._3, t._4, t._5) == z2(t._4, t._5, t._2, t._3))
    }
  }

  test("q316 ≡ local recompute; single-quote parts disperse exactly 0") {
    val rows = spark.read.parquet(s"$d/lineitem.parquet")
      .selectExpr("l_partkey", "l_suppkey",
        "CAST(round(l_extendedprice * 100) AS BIGINT)" +
          " div CAST(l_quantity AS BIGINT) AS unit_cents")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val exp = rows.groupBy(_._1).map { case (pk, g) =>
      val n = g.length.toLong
      val s = g.map(_._3).sum
      val q = g.map(t => BigInt(t._3) * t._3).sum
      val cv2 =
        if (s > 0) Some((BigInt(1000000) * (n * q - BigInt(s) * s) /
          (BigInt(s) * s)).toLong)
        else None
      val mn = g.map(_._3).min
      val mx = g.map(_._3).max
      (pk, n, g.map(_._2).distinct.length.toLong, mn, mx, cv2,
        if (mn > 0) Some(1000L * (mx - mn) / mn) else None)
    }.toSeq
      .sortBy(t => (-t._6.getOrElse(Long.MinValue), t._1))
      .take(Queries.PriceDispersionTopK)
    val got = Queries.priceDispersion(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getLong(5)),
        if (r.isNullAt(6)) None else Some(r.getLong(6))))
    assert(got == exp)
    // any part with one quote has CV² = 0 by the moment identity
    rows.groupBy(_._1).filter(_._2.length == 1).take(5).foreach { case (_, g) =>
      val s = g.head._3
      assert(BigInt(1) * g.head._3 * g.head._3 - BigInt(s) * s == 0)
    }
    got.foreach(t => t._6.foreach(c => assert(c >= 0L)))
  }
}
