package graft

import org.apache.spark.sql.functions._

/** Round-9 batch f: q260 Zipf rank spectrum, q261 split-conformal
  * quality calibration, q262 IVF nprobe recall curve. q260/q261 are
  * recomputed from raw parquet by independent local models; q262 is
  * recomputed by set algebra over the two already-verified operators
  * it composes (the q255/q259 discipline) plus the nested-candidate
  * monotonicity certificate. */
class NewOpsRound9fSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.01"

  test("q260 zipf spectrum ≡ local token-frequency model") {
    val toks = spark.read.parquet(s"$d/documents.parquet")
      .select("text").collect().flatMap(_.getString(0).split(" ", -1))
    val freq = toks.groupBy(identity).map { case (w, g) => (w, g.length.toLong) }
    val tot = freq.values.sum
    val top = freq.toSeq.sortBy { case (w, c) => (-c, w) }
      .take(TextAnalysis.ZipfTopN).map(_._2)
    val cum = top.scanLeft(0L)(_ + _).drop(1)
    val exp = (0 to 9).map(i => 1 << i).filter(_ <= top.length).map { r =>
      val f2 = if (2 * r <= top.length) Some(top(2 * r - 1)) else None
      (r.toLong, top(r - 1), f2, f2.map(v => 1000L * v / top(r - 1)),
        1000L * cum(r - 1) / tot)
    }
    val got = TextAnalysis.zipfSpectrum(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getLong(4)))
    assert(got == exp)
    // shape: head share strictly increases along the grid; ranks
    // beyond the vocabulary are absent rather than fabricated
    assert(got.map(_._5) == got.map(_._5).sorted)
    assert(got.nonEmpty)
  }

  test("q261 conformal calibration ≡ local order-statistic model + rank certificate") {
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val stop = Set("the", "a", "of", "and", "is", "to", "in")
    def q(text: String): Long = {
      val tk = text.split(" ", -1)
      val nTok = tk.length.toLong
      val nUniq = tk.distinct.length.toLong
      val nStop = tk.count(stop).toLong
      500L * nUniq / nTok + 200L * nStop / nTok +
        300L * math.min(nTok, 200L) / 200L
    }
    // the salted content-hash split (id parity would put every source
    // wholly in one half on this corpus — source = doc_id mod 20)
    def ph(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 131L + c.toLong) % 1000000007L)
    val scored = docs.map { case (_, src, t) =>
      (src, q(t), ph("cal:" + t) % 2 == 0) }
    // sources whose docs all landed in the calibration half have no
    // graded rows — the operator groups the TEST half, so they are
    // absent from its output by construction
    val exp = scored.groupBy(_._1).toSeq
      .filter { case (_, rows) => rows.exists(!_._3) }
      .map { case (src, rows) =>
        val cal = rows.filter(_._3).map(_._2).sorted
        val test = rows.filter(!_._3).map(_._2)
        val k = (cal.length + 1) / 10
        val thr = if (k > 0) Some(cal(k - 1)) else None
        val kept = test.count(s => thr.forall(s >= _)).toLong
        (src, cal.length.toLong, test.length.toLong, thr,
          1000L * kept / test.length)
      }.sortBy(_._1)
    val got = Curation.conformalQuality(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getLong(4)))
    assert(got == exp)
    // order-statistic certificate on the operator's own output: the
    // threshold is EXACTLY the k-th smallest calibration score —
    // fewer than k cal scores sit at or below any smaller value
    exp.foreach { case (src, nCal, _, thr, _) =>
      val cal = scored.filter(r => r._1 == src && r._3).map(_._2).sorted
      val k = ((nCal + 1) / 10).toInt
      thr.foreach { t =>
        assert(cal.count(_ <= t) >= k && cal.count(_ < t) <= k - 1)
      }
    }
    // most sources calibrate; a source too small to calibrate
    // (n_cal ≤ 9 ⇒ k = 0) must keep EVERYTHING — coverage exactly
    // 1000 through the NULL-threshold path, in both engines
    assert(got.exists(_._4.isDefined))
    assert(got.filter(_._4.isEmpty).forall(_._5 == 1000L))
  }

  test("q262 probe curve ≡ set algebra over q26/q33 + nested-candidate monotonicity") {
    val gt = Similarity.bruteForceTopK(spark, d)
      .select("q_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exp = Similarity.IvfProbeGrid.map { np =>
      val ivf = Similarity.ivfTopK(spark, d, nprobe = np)
        .select("q_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val hits = (gt & ivf).size.toLong
      (np.toLong, gt.size.toLong, hits, 1000L * hits / gt.size)
    }
    val got = Similarity.ivfProbeCurve(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got == exp)
    // nested candidate sets ⇒ recall is monotone nondecreasing in
    // nprobe: a truth vector (global top-5) is beaten by ≤ 4 vectors
    // ANYWHERE, so whenever its cell is probed it makes the IVF top-5
    assert(got.map(_._4) == got.map(_._4).sorted)
    assert(got.last._4 >= got.head._4)
  }
}
