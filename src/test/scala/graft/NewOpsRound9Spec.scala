package graft

import org.apache.spark.sql.functions._

/** Round-9 additions: q244 spectral spread (λ₂ via exact deflation +
  * participation ratio), q245 image aHash near-dup, q246 audio
  * band-energy near-dup. Each is pinned against an INDEPENDENT local
  * recompute (straight Scala loops, no Spark), plus property
  * certificates a shared-recurrence bug could not fake — and for the
  * perceptual hashes, planted near-dup fixtures proving the banding
  * finds what it must and skips what it must not. */
class NewOpsRound9Spec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"
  private val dim = 64

  /** The corpus int8 Gram recomputed locally (the 8g-spec fold). */
  private lazy val localGram: Array[Array[BigInt]] = {
    val vecs = spark.read.parquet(s"$d/embeddings.parquet")
      .selectExpr("CAST(embedding AS ARRAY<DOUBLE>)").collect().toSeq
      .map(_.getSeq[Double](0).toArray)
      .filter(v => v.map(math.abs).max > 0)
    val quant = vecs.map { v =>
      val sc = 127.0 / v.map(math.abs).max
      v.map(x =>
        if (x >= 0) math.floor(math.abs(x * sc) + 0.5).toLong
        else -math.floor(math.abs(x * sc) + 0.5).toLong)
    }
    Array.tabulate(dim, dim) { (i, j) =>
      quant.map(q => BigInt(q(i)) * q(j)).sum
    }
  }

  test("q244 spectral spread ≡ local deflated recompute + certificates") {
    val gram = localGram
    def matVec(v: Array[BigInt]): Array[BigInt] =
      Array.tabulate(dim)(i => (0 until dim).map(j => gram(i)(j) * v(j)).sum)
    def rescale(w: Array[BigInt], m: BigInt): Array[BigInt] =
      w.map(x =>
        if (x.signum >= 0) (BigInt(1000) * x) / m
        else -((BigInt(1000) * -x) / m))
    // top eigenpair — the q240 recurrence
    var v1 = Array.fill(dim)(BigInt(1000))
    for (_ <- 1 to Similarity.PowerRounds)
      { val w = matVec(v1); v1 = rescale(w, w.map(_.abs).max) }
    val gv1 = matVec(v1)
    val num1 = (0 until dim).map(i => v1(i) * gv1(i)).sum
    val den1 = v1.map(x => x * x).sum
    // deflated: project out v1 after every matvec (and at the start)
    def projRescale(u: Array[BigInt]): Array[BigInt] = {
      val dot = (0 until dim).map(i => v1(i) * u(i)).sum
      val p = Array.tabulate(dim)(i => u(i) * den1 - dot * v1(i))
      rescale(p, p.map(_.abs).max.max(BigInt(1)))
    }
    var x = projRescale(Array.fill(dim)(BigInt(1000)))
    for (_ <- 1 to Similarity.PowerRounds) x = projRescale(matVec(x))
    val gx = matVec(x)
    val num2 = (0 until dim).map(i => x(i) * gx(i)).sum
    val den2 = x.map(t => t * t).sum
    val trace = (0 until dim).map(i => gram(i)(i)).sum
    val fro = (for (i <- 0 until dim; j <- 0 until dim)
      yield gram(i)(j) * gram(i)(j)).sum
    assert(den2 != 0, "sf0.001 corpus must not be rank-1")
    // sorted presentation (the operator's contract): both quotients
    // are lower bounds on λ1; the larger is the better λ1 estimate
    val q1 = (BigInt(1000) * num1) / den1
    val q2 = (BigInt(1000) * num2) / den2
    val defLarger = num2 * den1 > num1 * den2
    val expL1 = if (defLarger) q2 else q1
    val expL2 = if (defLarger) q1 else q2
    val expRatio =
      if (defLarger) (BigInt(1000) * num1 * den2) / (den1 * num2)
      else (BigInt(1000) * num2 * den1) / (den2 * num1)
    val expPr = (BigInt(1000) * trace * trace) / fro
    val got = Similarity.spectralSpread(spark, d).collect()
    assert(got.length == 1)
    val r = got(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) ==
      (trace.toLong, expL1.toLong, expL2.toLong, expRatio.toLong,
        expPr.toLong))
    // CERTIFICATES, independent of the shared recurrence shape:
    // (1) sorted PSD quotients: 0 ≤ λ2 ≤ λ1, and the gap ratio is a
    // permille in [0, 1000]
    assert(expL2 >= 0 && expL2 <= expL1)
    assert(expRatio >= 0 && expRatio <= 1000)
    // (2) the deflated iterate is (near-)orthogonal to v1: the exact
    // projection zeroes v1ᵀp; integer rescale floors each component by
    // < 1 ulp, so |v1ᵀx| ≤ Σ|v1_i| ≤ 64·1000 — tiny against the
    // ~64·10⁶ scale of an aligned dot product
    val v1x = (0 until dim).map(i => v1(i) * x(i)).sum
    assert(v1x.abs <= BigInt(64000))
    // (3) participation ratio is bounded by [1, d] (milli: [1000, d·1000])
    assert(expPr >= 1000 && expPr <= BigInt(1000L * dim))
    // (4) trace = Σλ ≥ λ1 estimate (any PSD matrix)
    assert(BigInt(1000) * trace >= expL1)
  }

  /** Local aHash of one virtual payload: 64-bit hash as (hi, lo), or
    * None when the pixel grid can't fill. Mirrors the q245 contract. */
  private def localAHash(text: String): Option[(Long, Long)] = {
    val n = text.length - 64
    if (n < 64) return None
    val px = (0 until n).map(p => text.charAt(64 + p).toLong)
    val bsum = new Array[Long](64); val bcnt = new Array[Long](64)
    for (p <- 0 until n) {
      val blk = ((64L * p) / n).toInt
      bsum(blk) += px(p); bcnt(blk) += 1
    }
    val tot = bsum.sum
    var lo = 0L; var hi = 0L
    for (b <- 0 until 64) {
      val bit = if (bsum(b) * n >= tot * bcnt(b)) 1L else 0L
      if (b < 32) lo |= bit << b else hi |= bit << (b - 32)
    }
    Some((hi, lo))
  }

  // the corpus identity tests run at sf0.01: the radius-9 ball is
  // empty on the sf0.001 corpus (min observed aHash distance there is
  // 12), and empty ≡ empty proves nothing — the larger corpus has
  // real pairs, so the equality is evidence
  private val d01 = "/root/testdata/sf0.01"

  test("q245 aHash near-dup ≡ local all-pairs (banding is lossless)") {
    val docs = spark.read.parquet(s"$d01/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val sigs = docs.flatMap { case (id, t) =>
      localAHash(t).map(h => (id, h._1, h._2))
    }
    val exp = (for {
      (a, ahi, alo) <- sigs; (b, bhi, blo) <- sigs if a < b
      dist = java.lang.Long.bitCount(ahi ^ bhi) +
        java.lang.Long.bitCount(alo ^ blo)
      if dist <= Multimodal.AHashRadius
    } yield (a, b, dist.toLong)).toSeq.sorted
    val got = Multimodal.imageAHashNearDup(spark, d01).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(got == exp)
    assert(exp.nonEmpty, "the radius must fire on the gate corpus")
    assert(sigs.length > 100, "corpus must exercise the hash broadly")
  }

  test("q245 planted fixtures: noisy copy found, unrelated not") {
    import spark.implicits._
    val hdr = "H" * 64
    // a "bright-left, dark-right" image and a copy with per-pixel noise
    // that preserves each cell's side of the mean; plus an inverted
    // (dark-left) image that flips every bit of the hash
    val base = hdr + ("z" * 320) + ("!" * 320)
    val noisy = hdr + ("y" * 320) + ("\"" * 320)
    val inverted = hdr + ("!" * 320) + ("z" * 320)
    val docs = Seq((1L, base), (2L, noisy), (3L, inverted))
      .toDF("doc_id", "text")
    val got = Multimodal.imageAHashNearDupDf(docs).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got == Seq((1L, 2L, 0L)))
    // sanity on the local model too: identical geometry → same hash,
    // inversion → Hamming 64
    val (h1, l1) = localAHash(base).get
    val (h2, l2) = localAHash(noisy).get
    val (h3, l3) = localAHash(inverted).get
    assert((h1, l1) == (h2, l2))
    assert(java.lang.Long.bitCount(h1 ^ h3) +
      java.lang.Long.bitCount(l1 ^ l3) == 64)
  }

  /** Local band-energy hash of one virtual-PCM payload (q246). */
  private def localEnergyHash(text: String): Option[Long] = {
    val ns = math.max(text.length - 64, 0) / 2
    if (ns < 32) return None
    val e = new Array[BigInt](32); val bcnt = new Array[Long](32)
    for (b <- 0 until 32) e(b) = BigInt(0)
    for (k <- 0 until ns) {
      val raw = text.charAt(64 + 2 * k).toLong +
        256L * text.charAt(65 + 2 * k).toLong
      val v = if (raw >= 32768L) raw - 65536L else raw
      val band = ((32L * k) / ns).toInt
      e(band) += BigInt(v) * BigInt(v); bcnt(band) += 1
    }
    val tot = e.sum
    var s = 0L
    for (b <- 0 until 32)
      if (e(b) * ns >= tot * bcnt(b)) s |= 1L << b
    Some(s)
  }

  test("q246 energy near-dup ≡ local all-pairs (banding is lossless)") {
    val docs = spark.read.parquet(s"$d01/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val sigs = docs.flatMap { case (id, t) =>
      localEnergyHash(t).map(h => (id, h))
    }
    val exp = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      dist = java.lang.Long.bitCount(sa ^ sb)
      if dist <= Multimodal.EnergyRadius
    } yield (a, b, dist.toLong)).toSeq.sorted
    val got = Multimodal.audioEnergyNearDup(spark, d01).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(got == exp)
    assert(exp.nonEmpty, "the radius must fire on the gate corpus")
    assert(sigs.length > 100)
  }
  test("q246 signed PCM decode: high-byte chars take the negative branch") {
    import spark.implicits._
    val hdr = "H" * 64
    // The discriminating construction: "a\u00ff" pairs decode SIGNED to
    // the tiny sample \u2212159 (97 + 256\u00b7255 \u2212 65536) but would read
    // UNSIGNED as a huge +65377 \u2014 quiet under two's complement, the
    // loudest thing in the track without it. t1 = negQuiet+loud and
    // t2 = posQuiet+loud have the SAME signed envelope (quiet-then-
    // loud \u2192 pair at distance 0) but OPPOSITE unsigned envelopes (an
    // unsigned decode would move t1's set bits to the head bands and
    // break the pair) \u2014 so the expected output pins the signed branch
    // itself, not just the band geometry.
    val negQuiet = "a\u00ff" * 40 // signed \u2212159 each; unsigned +65377
    val posQuiet = "  " * 40 // +8224 each \u2014 quiet either way
    val loud = "b" * 40 //      +25186 each \u2014 loud either way
    val t1 = hdr + negQuiet + loud
    val t2 = hdr + posQuiet + loud
    val t3 = hdr + loud + negQuiet // loud-then-quiet under signed
    val docs = Seq((1L, t1), (2L, t2), (3L, t3)).toDF("doc_id", "text")
    val got = Multimodal.audioEnergyNearDupDf(docs).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val s1 = localEnergyHash(t1).get
    val s2 = localEnergyHash(t2).get
    val s3 = localEnergyHash(t3).get
    assert(s1 == s2, "negative-quiet \u2261 positive-quiet under signed decode")
    assert(java.lang.Long.bitCount(s1 ^ s3) > Multimodal.EnergyRadius,
      "swapped halves must be far")
    val expPairs = (for {
      (a, sa) <- Seq((1L, s1), (2L, s2), (3L, s3))
      (b, sb) <- Seq((1L, s1), (2L, s2), (3L, s3)) if a < b
      dist = java.lang.Long.bitCount(sa ^ sb)
      if dist <= Multimodal.EnergyRadius
    } yield (a, b, dist.toLong)).sorted
    assert(got.sorted == expPairs && expPairs == Seq((1L, 2L, 0L)))
  }
}
