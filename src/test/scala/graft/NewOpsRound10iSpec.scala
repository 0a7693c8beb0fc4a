package graft

import org.apache.spark.sql.functions._

/** Round-10 batch i: q295 dimension label-informativeness and q296
  * clustering-label Rand index — local BigInt recomputes plus the
  * spread-decomposition and index-range certificates. */
class NewOpsRound10iSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  private def labeled: Array[(Long, Array[Long])] =
    spark.read.parquet(s"$d/embeddings.parquet")
      .selectExpr("label", "CAST(embedding AS ARRAY<DOUBLE>)").collect()
      .map(r => (r.getInt(0).toLong,
        r.getSeq[Double](1).toArray.map(v => math.floor(v * 1000000.0).toLong)))

  test("q295 informativeness ≡ local BigInt recompute; spreads decompose") {
    val rows = labeled
    val dim = rows.head._2.length
    val exp = (0 until dim).map { dd =>
      val pts = rows.map { case (l, v) => (l, v(dd)) }
      val n = BigInt(pts.length)
      val s = BigInt(pts.map(_._2).sum)
      val q = pts.map(p => BigInt(p._2) * p._2).sum
      val tp = n * q - s * s
      val byL = pts.groupBy(_._1)
      val wp = byL.values.map { g =>
        val nl = BigInt(g.length)
        val sl = BigInt(g.map(_._2).sum)
        val ql = g.map(p => BigInt(p._2) * p._2).sum
        nl * ql - sl * sl
      }.sum
      val wpairs = BigInt(byL.values.map(g =>
        g.length.toLong * (g.length - 1)).sum)
      val ratio =
        if (tp == 0 || wpairs == 0) 0L
        else (BigInt(1000000) * wp * (n * (n - 1)) / (tp * wpairs)).toLong
      // within-pair spread never exceeds total-pair spread mass-wise
      assert(wp >= 0 && tp >= wp)
      (dd.toLong, n.toLong, wp.toLong, tp.toLong, ratio)
    }
    val got = Similarity.dimLabelInformativeness(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got == exp)
  }

  test("q296 Rand ≡ local recompute from the q136 assignment; RI ∈ [0, 1e6]") {
    val assign = Similarity.kmeansEmbed(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val lab = labeled
    val ids = spark.read.parquet(s"$d/embeddings.parquet")
      .select("vec_id", "label").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong))
    val cells = ids.groupBy { case (v, l) => (assign(v), l) }
      .map { case (k, g) => k -> g.length.toLong }
    val n = ids.length.toLong
    val sij = cells.values.map(c => c * (c - 1)).sum
    val sa = cells.groupBy(_._1._1).values
      .map(g => { val a = g.map(_._2).sum; a * (a - 1) }).sum
    val sb = cells.groupBy(_._1._2).values
      .map(g => { val b = g.map(_._2).sum; b * (b - 1) }).sum
    val rand = 1000000L * (n * (n - 1) + 2 * sij - sa - sb) / (n * (n - 1))
    val exp = (n, cells.keySet.map(_._1).size.toLong,
      cells.keySet.map(_._2).size.toLong, sij, sa, sb, rand)
    val got = Similarity.clusterLabelRand(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got == Seq(exp))
    assert(rand >= 0L && rand <= 1000000L)
  }
}
