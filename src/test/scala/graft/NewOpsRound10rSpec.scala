package graft

import org.apache.spark.sql.functions._

/** Round-10 batch r: q317 label norm-bias audit, q318 duplication
  * size spectrum — local recomputes (q318 layers on the pinned q49
  * labels, the q309 discipline) plus the mass-conservation
  * certificates. */
class NewOpsRound10rSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("q317 ≡ local recompute; weighted bias ratios average to 1000") {
    val rows = spark.read.parquet(s"$d/embeddings.parquet")
      .selectExpr("CAST(label AS BIGINT) AS label",
        "CAST(embedding AS ARRAY<DOUBLE>)").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val n2s = rows.map { case (lbl, v) =>
      var s = 0.0
      var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      (lbl, math.floor(1000000.0 * s).toLong)
    }
    val nt = n2s.length.toLong
    val st = n2s.map(_._2).sum
    val exp = n2s.groupBy(_._1).map { case (lbl, g) =>
      val n = g.length.toLong
      val s2 = g.map(_._2).sum
      (lbl, n, s2 / n, g.map(_._2).min, g.map(_._2).max,
        (BigInt(1000) * s2 * nt / (BigInt(n) * st)).toLong)
    }.toSeq.sortBy(_._1)
    val got = Similarity.labelNormBias(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got == exp)
    // identity: the n-weighted mean of the bias ratios is the corpus
    // mean over itself — 1000 up to per-label floor loss
    val wavg = got.map(t => t._2 * t._6).sum / nt
    assert(wavg <= 1000L && wavg > 1000L - got.length)
  }

  test("q318 ≡ local recompute over pinned labels; shares conserve mass") {
    val labels = Dedup.nearDupClusters(spark, d)
      .select("doc_id", "cluster_id", "cluster_n").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ntok = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).length.toLong))
      .toMap
    val td = labels.length.toLong
    val tt = labels.map(l => ntok(l._1)).sum
    val exp = labels.groupBy(_._3).map { case (k, g) =>
      (k, g.map(_._2).distinct.length.toLong, g.length.toLong,
        1000L * g.length / td, g.map(l => ntok(l._1)).sum,
        1000L * g.map(l => ntok(l._1)).sum / tt)
    }.toSeq.sortBy(_._1)
    val got = Dedup.dupSizeSpectrum(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got == exp)
    // conservation: cluster sizes × counts rebuild the doc total, and
    // the permille shares rebuild the whole within floor slack
    assert(got.map(t => t._1 * t._2).sum == td)
    assert(got.map(_._4).sum > 1000L - got.length && got.map(_._4).sum <= 1000L)
  }
}
