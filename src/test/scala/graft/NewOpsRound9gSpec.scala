package graft

import org.apache.spark.sql.functions._

/** Round-9 batch g: q263 passage-size ablation, q264 frame-sequence
  * containment, q265 lexical+dense RRF hybrid. Local models are
  * independent straight-Scala (parameterized BM25 windows, a
  * from-scratch frame aHash with BigInt threshold compares, a full
  * shingle/cosine/RRF recompute); q264 additionally carries the
  * planted re-cut fixture, since exact frame-hash collisions are
  * corpus-rare by construction (none at sf0.01, 3 pairs at sf0.1). */
class NewOpsRound9gSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.01"
  private val terms = Seq("hash", "join", "vector")

  // parameterized local max-passage BM25 (the 9e model with stride =
  // size/2 threaded through)
  private def localTops(docs: Array[(Long, String)], psize: Int)
      : Seq[(Long, Long)] = {
    val stride = psize / 2
    val tk = docs.map { case (id, t) => (id, t.split(" ", -1)) }
    val nDocs = tk.length.toLong
    val df = terms.map(w => w -> tk.count(_._2.contains(w)).toLong).toMap
    final case class P(id: Long, w: Long, pl: Long, tf: Map[String, Long])
    val passages = tk.flatMap { case (id, ts) =>
      ts.zipWithIndex
        .flatMap { case (tok, p) =>
          Seq((p / stride).toLong, (p / stride).toLong - 1).filter(_ >= 0)
            .map(w => (w, tok))
        }
        .groupBy(_._1).toSeq.map { case (w, rows) =>
          P(id, w, rows.length.toLong,
            terms.map(t => t -> rows.count(_._2 == t).toLong).toMap)
        }
    }
    val nPass = passages.length.toLong
    val avgplMilli = 1000L * passages.map(_.pl).sum / nPass
    def score(p: P): Long = {
      val norm = 250L + 750000L * p.pl / avgplMilli
      terms.map { w =>
        val idf = (1000L * (2L * (nDocs - df(w)) + 1L)) / (2L * df(w) + 1L)
        (idf * ((p.tf(w) * 2200000000L) /
          (p.tf(w) * 1000L + (1200L * norm) / 1000L))) / 1000L
      }.sum
    }
    passages.map(p => (p, score(p))).filter(_._2 > 0)
      .groupBy(_._1.id).toSeq
      .map { case (id, rows) => (id, rows.map(_._2).max) }
      .sortBy { case (id, s) => (-s, id) }.take(10)
  }

  test("q263 ablation ≡ local parameterized model") {
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val tops = TextAnalysis.PassageSizeGrid
      .map(sz => sz -> localTops(docs, sz)).toMap
    val base = tops(TextAnalysis.PassageSize).map(_._1).zipWithIndex.toMap
    val exp = TextAnalysis.PassageSizeGrid.map { sz =>
      val ds = tops(sz).map(_._1)
      val common = ds.zipWithIndex.filter { case (id, _) => base.contains(id) }
      (sz.toLong, ds.headOption.getOrElse(-1L),
        tops(sz).headOption.map(_._2).getOrElse(0L),
        common.length.toLong,
        common.map { case (id, r) => math.abs(r.toLong - base(id).toLong) }.sum)
    }
    val got = TextAnalysis.passageSizeAblation(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got == exp)
    // the anchor row is self-comparison: full overlap, zero displacement
    val anchor = got.find(_._1 == TextAnalysis.PassageSize.toLong).get
    assert(anchor._4 == 10L && anchor._5 == 0L)
  }

  // independent frame-hash model: block sums + BigInt mean compare
  private def localFrameHashes(text: String): Seq[Long] = {
    val nPix = text.length - 64
    val flen = nPix / Multimodal.FrameCount
    if (flen < 64) return Nil
    (0 until Multimodal.FrameCount).map { f =>
      val px = (0 until flen).map(p => text.charAt(64 + f * flen + p).toLong)
      val bs = new Array[Long](64); val bc = new Array[Long](64)
      px.zipWithIndex.foreach { case (v, p) =>
        val blk = (64 * p / flen); bs(blk) += v; bc(blk) += 1
      }
      val tot = bs.sum
      (0 until 64).foldLeft(0L) { (acc, b) =>
        if (BigInt(bs(b)) * flen >= BigInt(tot) * bc(b)) acc | (1L << b)
        else acc
      }
    }
  }

  test("q264 frame containment ≡ local frame-hash model (corpus)") {
    // sf0.1: the smallest corpus where frame-hash collisions actually
    // occur (3 pairs) — at sf0.01 the equality would be vacuous
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val fh = docs.map { case (id, t) => id -> localFrameHashes(t).distinct }
      .filter(_._2.nonEmpty)
    val dfh = fh.flatMap(_._2).groupBy(identity).view.mapValues(_.size).toMap
    val idx = fh.map { case (id, hs) =>
      id -> hs.filter(h => dfh(h) <= Multimodal.FrameDfCap) }.toMap
    val sz = fh.toMap
    val ids = fh.map(_._1).sorted
    val exp = (for {
      a <- ids; b <- ids if a < b
      shared = (idx(a).toSet & idx(b).toSet).size.toLong if shared >= 2
    } yield (a, b, shared,
      1000L * shared / math.min(sz(a).length, sz(b).length)))
      .sortBy(t => (t._1, t._2))
    val got = Multimodal.frameSeqContainment(spark, "/root/testdata/sf0.1")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got == exp.toSeq)
    assert(got.nonEmpty, "sf0.1 must exercise real frame collisions")
  }

  test("q264 planted re-cut fixture: one replaced frame keeps 3/4 containment") {
    import spark.implicits._
    def block(seed: Int): String = {
      val r = new scala.util.Random(seed)
      Array.fill(80)((33 + r.nextInt(90)).toChar).mkString
    }
    val header = "h" * 64
    val f1 = block(1); val f2 = block(2); val f3 = block(3); val f4 = block(4)
    val a = header + f1 + f2 + f3 + f4
    val b = header + f1 + f2 + block(9) + f4 // one segment re-cut
    val c = header + block(5) + block(6) + block(7) + block(8) // unrelated
    val docs = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val got = Multimodal.frameSeqContainmentDf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 2L, 3L, 750L)),
      s"re-cut pair must keep 3 of 4 frames: ${got.toSeq}")
  }

  test("q265 hybrid ≡ full local lexical+dense RRF recompute") {
    def ph(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 131L + c.toLong) % 1000000007L)
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val sh: Map[Long, Set[Long]] = docs.map { case (id, t) =>
      val tk = t.split(" ", -1)
      id -> tk.sliding(3).filter(_.length == 3)
        .map(w => ph(w.mkString(" "))).toSet
    }.filter(_._2.nonEmpty).toMap
    val qids = sh.keys.filter(_ < 10).toSeq.sorted
    // only pairs with shared shingles exist in the operator's
    // inverted-index relation — cm = 0 partners never rank
    val lex = qids.flatMap { q =>
      sh.toSeq.filter(_._1 != q).flatMap { case (id, s2) =>
        val cm = (sh(q) & s2).size
        if (cm == 0) None
        else Some((id, cm.toDouble / (sh(q).size + s2.size - cm)))
      }.sortBy { case (id, j) => (-j, id) }.take(5).zipWithIndex
        .map { case ((id, _), i) => (q, id, i + 1) }
    }
    val emb = spark.read.parquet(s"$d/embeddings.parquet").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val byId = emb.toMap
    val dense = emb.map(_._1).filter(_ < 10).sorted.flatMap { q =>
      emb.filter(_._1 != q).map { case (id, v) =>
        (id, dot(byId(q), v) / math.sqrt(dot(byId(q), byId(q)) * dot(v, v)))
      }.sortBy { case (id, c) => (-c, id) }.take(5).zipWithIndex
        .map { case ((id, _), i) => (q, id, i + 1) }
    }
    val disc = Similarity.RrfDiscounts
    val votes = (lex ++ dense).map { case (q, id, r) => (q, id, disc(r - 1)) }
    val exp = votes.groupBy(v => (v._1, v._2)).toSeq
      .map { case ((q, id), vs) =>
        (q, id, vs.map(_._3).sum, vs.length.toLong) }
      .groupBy(_._1).toSeq.flatMap { case (q, rows) =>
        rows.sortBy { case (_, id, rrf, _) => (-rrf, id) }.take(5).zipWithIndex
          .map { case ((_, id, rrf, np), i) => (q, (i + 1).toLong, id, rrf, np) }
      }.sortBy(t => (t._1, t._2))
    val got = Similarity.hybridMoreLikeThis(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got == exp)
    // both channels contribute: some fused rows are dual-path, and a
    // dual-path row always outranks a single vote of the same rank
    assert(got.exists(_._5 == 2L))
  }
}
