package graft

import org.apache.spark.sql.functions._

/** Round-9 batch c: q250 media dup clusters (CC over the aHash pair
  * graph), q251 reciprocal-rank fusion, q252 pairwise-source linear
  * MMD² drift. Local recomputes (union-find, rank folding, BigInt
  * moment arithmetic) plus structural certificates. */
class NewOpsRound9cSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.01"

  /** Local aHash (the NewOpsRound9Spec model, repeated here so this
    * suite stands alone): 64-bit hash as (hi, lo). */
  private def localAHash(text: String): Option[(Long, Long)] = {
    val n = text.length - 64
    if (n < 64) return None
    val bsum = new Array[Long](64); val bcnt = new Array[Long](64)
    for (p <- 0 until n) {
      val blk = ((64L * p) / n).toInt
      bsum(blk) += text.charAt(64 + p).toLong; bcnt(blk) += 1
    }
    val tot = bsum.sum
    var lo = 0L; var hi = 0L
    for (b <- 0 until 64) {
      val bit = if (bsum(b) * n >= tot * bcnt(b)) 1L else 0L
      if (b < 32) lo |= bit << b else hi |= bit << (b - 32)
    }
    Some((hi, lo))
  }

  test("q250 media clusters ≡ local union-find over local pairs") {
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val sigs = docs.flatMap { case (id, t) => localAHash(t).map(h => (id, h)) }
    val pairs = for {
      (a, (ahi, alo)) <- sigs; (b, (bhi, blo)) <- sigs if a < b
      dist = java.lang.Long.bitCount(ahi ^ bhi) +
        java.lang.Long.bitCount(alo ^ blo)
      if dist <= Multimodal.AHashRadius
    } yield (a, b, dist.toLong)
    // union-find with path compression
    val parent = scala.collection.mutable.Map(sigs.map(s => s._1 -> s._1): _*)
    def find(x: Long): Long = {
      var r = x; while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    pairs.foreach { case (a, b, _) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val byCluster = sigs.map(_._1).groupBy(find)
    val edgeStats = pairs.groupBy(p => find(p._1))
    val exp = byCluster.filter(_._2.length >= 2).toSeq.map {
      case (root, members) =>
        val es = edgeStats(root)
        (members.min, members.length.toLong, es.length.toLong,
          es.count(_._3 == 0L).toLong, es.map(_._3).max)
    }.sortBy(_._1)
    val got = Multimodal.mediaDupClusters(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got == exp)
    assert(exp.nonEmpty, "the gate corpus must carry media clusters")
    // structural certificates
    got.foreach { case (_, n, e, x, mx) =>
      assert(e <= n * (n - 1) / 2 && x <= e && mx <= Multimodal.AHashRadius)
    }
  }

  test("q251 RRF ≡ local rank folding of the two paths") {
    def ranks(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
      df.select("q_id", "neighbor_id", "rank").collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val votes = (ranks(Similarity.lshTopK(spark, d)) ++
      ranks(Similarity.int8TopK(spark, d)))
      .map { case (q, n, r) => ((q, n), Similarity.RrfDiscounts(r.toInt - 1)) }
    val fused = votes.groupBy(_._1).map { case ((q, n), vs) =>
      (q, n, vs.map(_._2).sum, vs.size.toLong)
    }
    val exp = fused.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (_, rows) =>
        rows.toSeq.sortBy(t => (-t._3, t._2)).take(5).zipWithIndex
          .map { case ((q, n, v, p), i) => (q, (i + 1).toLong, n, v, p) }
    }
    val got = Similarity.rrfFusion(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got == exp)
    // a neighbor both paths agree on must carry two votes somewhere
    assert(got.exists(_._5 == 2L), "paths never agreeing would be a bug")
    // and the discounts are the hardcoded 10^6/(60+r) constants
    assert(Similarity.RrfDiscounts == Seq(16393L, 16129L, 15873L, 15625L, 15384L))
  }

  test("q252 MMD drift ≡ local BigInt recompute") {
    val src = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val vecs = spark.read.parquet(s"$d/embeddings.parquet")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>)").collect()
      .toSeq.map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .filter(_._2.map(math.abs).max > 0)
      .flatMap { case (id, v) => src.get(id).map(s => (s, v)) }
    val quant = vecs.map { case (s, v) =>
      val sc = 127.0 / v.map(math.abs).max
      (s, v.map(x =>
        if (x >= 0) math.floor(math.abs(x * sc) + 0.5).toLong
        else -math.floor(math.abs(x * sc) + 0.5).toLong))
    }
    val bySrc = quant.groupBy(_._1)
    val sums = bySrc.map { case (s, vs) =>
      s -> (vs.size.toLong,
        Array.tabulate(64)(i => vs.map(_._2(i)).sum))
    }
    val srcs = sums.keys.toSeq.sorted
    val exp = (for {
      i <- srcs.indices; j <- (i + 1) until srcs.length
      (sa, sb) = (srcs(i), srcs(j))
      (na, va) = sums(sa); (nb, vb) = sums(sb)
    } yield {
      val d2 = (0 until 64).map { k =>
        val diff = BigInt(nb) * va(k) - BigInt(na) * vb(k)
        diff * diff
      }.sum
      val mmd = (BigInt(1000) * d2) /
        (BigInt(na) * na * nb * nb)
      (sa, sb, na, nb, mmd.toLong)
    }).sortBy(t => (t._1, t._2))
    val got = Similarity.sourceEmbeddingDrift(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got == exp)
    assert(got.size == srcs.length * (srcs.length - 1) / 2)
    got.foreach { case (_, _, _, _, m) => assert(m >= 0) }
  }
}
