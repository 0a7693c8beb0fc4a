package graft

import org.apache.spark.sql.functions._

/** Round-10 batch p: q313 importance-weight effective sample size,
  * q314 label-centroid confusability — local recomputes (q313 layers
  * on the pinned q129 weight relation, the q309 discipline) plus the
  * estimator identities (ESS = 1000 iff uniform; Cauchy-Schwarz
  * bounds cos² by 10⁶). */
class NewOpsRound10pSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("q313 ≡ local recompute over pinned weights; uniform weights → 1000") {
    val w = Curation.importanceWeights(spark, d)
      .select("doc_id", "affinity_milli").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val srcOf = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    def kish(ws: Seq[Long]): (Long, Long, Long, Option[Long], Option[Long]) = {
      val n = ws.length.toLong
      val sw = ws.sum
      val sww = ws.map(x => BigInt(x) * x).sum
      val ess = if (sww > 0)
        Some((BigInt(1000) * sw * sw / (BigInt(n) * sww)).toLong) else None
      val share = if (sw > 0) Some(1000L * ws.max / sw) else None
      (n, sw, ws.max, ess, share)
    }
    val exp = w.groupBy(t => srcOf(t._1)).map { case (s, g) =>
      val (n, sw, wmax, ess, share) = kish(g.map(_._2))
      (s, n, sw, wmax, ess, share)
    }.toSeq.sortBy(_._1)
    val got = Curation.importanceEss(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5))))
    assert(got == exp)
    // identity: uniform weights give exactly ESS/n = 1000
    assert(kish(Seq.fill(17)(42L))._4.contains(1000L))
    // a single dominant weight collapses the effective size
    val (_, _, _, essDom, _) = kish(Seq.fill(99)(1L) :+ 100000L)
    assert(essDom.exists(_ < 20L))
    got.foreach(t => t._5.foreach(e => assert(e >= 1L && e <= 1000L)))
  }

  test("q314 ≡ local recompute; Cauchy-Schwarz bounds cos² by 1e6") {
    val rows = spark.read.parquet(s"$d/embeddings.parquet")
      .selectExpr("CAST(label AS BIGINT) AS label",
        "CAST(embedding AS ARRAY<DOUBLE>)").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val dim = rows.head._2.length
    val cents = rows.groupBy(_._1).map { case (lbl, g) =>
      lbl -> (0 until dim).map { i =>
        val vms = g.map(t => math.floor(t._2(i) * 1000000.0).toLong)
        math.floor(vms.sum.toDouble / vms.length).toLong
      }.toArray
    }
    val labels = cents.keys.toSeq.sorted
    val exp = (for {
      a <- labels; b <- labels if a < b
    } yield {
      val (ca, cb) = (cents(a), cents(b))
      val dot = (0 until dim).map(i => ca(i) * cb(i)).sum
      val na = ca.map(x => x * x).sum
      val nb = cb.map(x => x * x).sum
      val d2 = (0 until dim).map(i => (ca(i) - cb(i)) * (ca(i) - cb(i))).sum
      val mag = BigInt(1000000) * dot * dot / (BigInt(na) * nb)
      (a, b, (if (dot >= 0) mag else -mag).toLong, d2)
    }).sortBy(t => (t._1, t._2))
    val got = Similarity.labelConfusability(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got == exp)
    got.foreach(t => assert(t._3.abs <= 1000000L,
      "Cauchy-Schwarz: |cos²| ≤ 1e6"))
  }
}
