package graft

import org.apache.spark.sql.functions._

/** Round-10 batch n: q309 dedup-corrected BM25, q310 l-diversity /
  * t-closeness audit — local recomputes (q309 layers on the
  * spec-pinned q49 label relation, the q278 discipline) plus the
  * degenerate-case certificates (singleton labels collapse the two
  * scores; TV distance bounds). */
class NewOpsRound10nSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  private def bm25Local(docs: Seq[(Long, Array[String])],
      clusterOf: Map[Long, Long]): Seq[(Long, Long, Long, Long, Long, Long)] = {
    val terms = Seq("hash", "join", "vector")
    val pd = docs.map { case (id, tk) =>
      (id, clusterOf(id), tk.length.toLong,
        terms.map(w => tk.count(_ == w).toLong))
    }
    val nDocs = pd.length.toLong
    val nClusters = pd.map(_._2).distinct.length.toLong
    val nTokens = pd.map(_._3).sum
    val dfr = terms.indices.map(i => pd.count(_._4(i) > 0).toLong)
    val dfc = terms.indices.map(i =>
      pd.filter(_._4(i) > 0).map(_._2).distinct.length.toLong)
    val avgdl = 1000L * nTokens / nDocs
    def score(n: Long, df: Seq[Long], tfs: Seq[Long], norm: Long): Long =
      terms.indices.map { i =>
        val idf = (1000L * (2 * (n - df(i)) + 1)) / (2 * df(i) + 1)
        val tfq = (tfs(i) * 2200000000L) / (tfs(i) * 1000 + (1200 * norm) / 1000)
        idf * tfq / 1000
      }.sum
    pd.map { case (id, cid, dl, tfs) =>
      val norm = 250 + (750000 * dl) / avgdl
      val raw = score(nDocs, dfr, tfs, norm)
      val ded = score(nClusters, dfc, tfs, norm)
      (id, cid, dl, raw, ded, ded - raw)
    }.filter(_._5 > 0)
      .sortBy(t => (-t._5, t._1)).take(10)
  }

  test("q309 ≡ local recompute over pinned labels; singleton labels collapse") {
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val clusterOf = Dedup.nearDupClusters(spark, d)
      .select("doc_id", "cluster_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val exp = bm25Local(docs.toSeq, clusterOf)
    val got = TextAnalysis.bm25DedupCorrected(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got == exp)
    // degenerate certificate: with every doc its own cluster the two
    // scores are IDENTICAL — the correction is pure duplication signal
    val solo = bm25Local(docs.toSeq, docs.map(t => t._1 -> t._1).toMap)
    solo.foreach(t => assert(t._4 == t._5 && t._6 == 0L))
  }

  test("q310 ≡ local recompute; TV distance bounded and zero iff proportional") {
    val rows = spark.read.parquet(s"$d/documents.parquet")
      .selectExpr("lang",
        s"CAST(size(split(text, ' ')) AS BIGINT) div ${Curation.AnonBucketTokens} AS b",
        "source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val n = rows.length.toLong
    val srcTot = rows.groupBy(_._3).map { case (s, g) => s -> g.length.toLong }
    val exp = rows.groupBy(t => (t._1, t._2)).map { case ((lang, b), g) =>
      val ng = g.length.toLong
      val bySrc = g.groupBy(_._3).map { case (s, h) => s -> h.length.toLong }
      val l = bySrc.size.toLong
      val modal = bySrc.values.max
      val tNum = srcTot.map { case (s, ns) =>
        math.abs(bySrc.getOrElse(s, 0L) * n - ns * ng)
      }.sum
      (lang, b, ng, l, 1000L * modal / ng, 1000L * tNum / (2 * ng * n),
        if (ng < Curation.AnonK) 1L else 0L,
        if (l < Curation.LDiversityL) 1L else 0L)
    }.toSeq.sortBy(t => (t._1, t._2))
    val got = Curation.lDiversityAudit(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(got == exp)
    got.foreach { t =>
      assert(t._6 >= 0L && t._6 <= 1000L, "TV distance is a permille")
      assert(t._5 * t._4 >= 1000L, "modal share ≥ 1/l")
    }
    // zero-distance certificate: a synthetic group drawn exactly
    // proportional to the corpus has t = 0
    val corpus = Seq(("a", 30L), ("b", 20L), ("c", 10L))
    val cn = corpus.map(_._2).sum
    val grpProp = corpus.map { case (s, ns) => s -> (ns / 10) }.toMap
    val gn = grpProp.values.sum
    val t0 = corpus.map { case (s, ns) =>
      math.abs(grpProp(s) * cn - ns * gn)
    }.sum
    assert(t0 == 0L)
  }
}
