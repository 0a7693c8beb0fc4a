package graft

import org.apache.spark.sql.functions._

/** Curation operators (stratified sampling, window packing) on sf0.001 —
  * value-level properties beyond the DuckDB parity gate (q50/q51). */
case class LDoc(doc_id: Long, lang: String, text: String)
case class LEvt(event_id: Long, event_type: String, props: String)

class CurationSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("stratified sample: keys in range, rates respected, deterministic") {
    val out = Curation.stratifiedSample(spark, d).collect()
    assert(out.nonEmpty)
    val rates = Map("en" -> 250L, "de" -> 800L, "es" -> 800L, "fr" -> 800L, "zh" -> 800L)
    out.foreach { r =>
      val (lang, skey) = (r.getString(1), r.getLong(2))
      assert(skey >= 0L && skey < 1000L)
      assert(skey < rates(lang)) // membership is exactly the hash cut
    }
    // content-keyed ⇒ bit-identical on re-run
    val again = Curation.stratifiedSample(spark, d).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
    // the en stratum is actually downsampled vs its 80% siblings:
    // observed keep-rate must be closer to 25% than to 80%
    val en = out.count(_.getString(1) == "en").toDouble
    val enTotal = Tables.documents(spark, d).filter(col("lang") === "en").count().toDouble
    assert(en / enTotal < 0.55, s"en keep-rate ${en / enTotal}")
  }

  test("sampling cut runs unchanged on a stream and matches the batch set") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sc = spark.sqlContext
    val docs = Tables.documents(spark, d)
      .select("doc_id", "lang", "text").as[LDoc].collect().toSeq
    val mem = MemoryStream[LDoc]
    val q = Curation.sampleCut(mem.toDF())
      .writeStream.format("memory").queryName("sample_out")
      .outputMode(OutputMode.Append).start()
    try {
      val (a, b) = docs.splitAt(docs.size / 2)
      mem.addData(a: _*); q.processAllAvailable()
      mem.addData(b: _*); q.processAllAvailable()
      val stream = spark.table("sample_out").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val batch = Curation.stratifiedSample(spark, d).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(stream == batch && batch.nonEmpty)
    } finally q.stop()
  }

  test("upweighting: copy counts hit the integer/fractional split per language") {
    val rows = Curation.upsample(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val copies = rows.groupBy(t => (t._1, t._2)).map { case ((id, lang), cs) =>
      // copy_id is a dense 1..n sequence
      assert(cs.map(_._3).sorted.toSeq == (1L to cs.size).toSeq, s"doc $id")
      (lang, cs.size)
    }.toSeq
    // every doc of an integer-weight language appears exactly w times
    copies.filter(_._1 == "en").foreach { case (_, n) => assert(n == 1) }
    // fractional weights: count ∈ {floor, floor+1} and the mean lands
    // between them (de: 2.5 ⇒ 2 or 3 copies)
    val de = copies.filter(_._1 == "de").map(_._2)
    assert(de.forall(n => n == 2 || n == 3))
    val zh = copies.filter(_._1 == "zh").map(_._2)
    assert(zh.forall(_ == 1)) // 0.7: kept docs appear once, rest dropped
    val zhTotal = Tables.documents(spark, d).filter(col("lang") === "zh").count()
    assert(zh.size < zhTotal) // some zh docs actually dropped
    // deterministic on re-run
    val again = Curation.upsample(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.toSeq == again.toSeq)
  }

  test("window packing: offsets within budget, windows advance with the token stream") {
    val rows = Curation.packWindows(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val nDocs = Tables.documents(spark, d).count()
    assert(rows.length == nDocs)
    rows.foreach { case (_, _, _, _, off) => assert(off >= 0L && off < Curation.WindowBudget) }
    // recompute the concat-and-chunk assignment locally per language
    rows.groupBy(_._2).foreach { case (_, docs) =>
      var cum = 0L
      docs.sortBy(_._1).foreach { case (id, _, nTok, win, off) =>
        assert(win == cum / Curation.WindowBudget, s"doc $id window")
        assert(off == cum % Curation.WindowBudget, s"doc $id offset")
        cum += nTok
      }
    }
  }

  test("q96 quality classifier: deterministic scores that separate the weak labels") {
    val a = Curation.qualityClassifier(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val b = Curation.qualityClassifier(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // LBFGS is deterministic but gradient partials merge in task-
    // completion order: scores are reproducible to float-merge
    // tolerance (post-round ±2e-6), not byte-identical under load
    assert(a.nonEmpty && a.length == b.length)
    assert(a.map(t => (t._1, t._2)).toSeq == b.map(t => (t._1, t._2)).toSeq)
    a.zip(b).foreach { case ((id, _, pa), (_, _, pb)) =>
      assert(math.abs(pa - pb) <= 2e-6, s"doc $id: $pa vs $pb")
    }
    // full corpus scored, probabilities well-formed
    assert(a.length == Tables.documents(spark, d).count())
    assert(a.forall(t => t._3 >= 0.0 && t._3 <= 1.0))
    // the model must at least recover its own training signal: mean
    // score of heuristic-keep docs clearly above heuristic-fail docs
    val keep = a.filter(_._2 == 1L).map(_._3)
    val fail = a.filter(_._2 == 0L).map(_._3)
    assert(keep.nonEmpty && fail.nonEmpty)
    val gap = keep.sum / keep.length - fail.sum / fail.length
    assert(gap > 0.2, s"separation gap $gap")
  }

  test("source overlap matches an exact local vocabulary-Jaccard recompute") {
    val vocab = Tables.documents(spark, d).select("source", "text").collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.flatMap(_.getString(1).split(" ", -1)).toSet).toMap
    val expect = (for {
      a <- vocab.keys; b <- vocab.keys if a < b
      inter = (vocab(a) & vocab(b)).size.toLong if inter > 0
    } yield (a, b, inter, vocab(a).size.toLong, vocab(b).size.toLong,
        1000L * inter / (vocab(a).size + vocab(b).size - inter))).toSet
    val got = Curation.sourceOverlap(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(got == expect && got.nonEmpty)
  }

  test("length drift: permille CDFs match a local recompute, end at 1000, drift is |Δ|") {
    val toks = Tables.documents(spark, d).select("source", "text").collect()
      .map(r => (r.getString(0).drop(3).toInt >= 15,
        r.getString(1).split(" ", -1).length.toLong / 10L))
    def cdf(side: Boolean) = {
      val counts = toks.filter(_._1 == side).groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val total = counts.values.sum
      (counts, total)
    }
    val (oldC, oldT) = cdf(false)
    val (newC, newT) = cdf(true)
    val rows = Curation.lengthDrift(spark, d).collect()
    var (cumO, cumN) = (0L, 0L)
    rows.foreach { r =>
      val b = r.getLong(0)
      cumO += oldC.getOrElse(b, 0L); cumN += newC.getOrElse(b, 0L)
      assert(r.getLong(1) == oldC.getOrElse(b, 0L) && r.getLong(2) == newC.getOrElse(b, 0L))
      assert(r.getLong(3) == cumO * 1000L / oldT && r.getLong(4) == cumN * 1000L / newT)
      assert(r.getLong(5) == math.abs(r.getLong(3) - r.getLong(4)))
    }
    assert(rows.last.getLong(3) == 1000L && rows.last.getLong(4) == 1000L)
  }

  test("length drift fails loudly when a split side is empty — never silent-null calm") {
    import spark.implicits._
    val onlyCorpus = Seq((1L, "src01", "a b c d e"), (2L, "src02", "f g h i j"))
      .toDF("doc_id", "source", "text")
    val e = intercept[Exception](Curation.lengthDriftDf(onlyCorpus).collect())
    assert(e.getMessage.contains("arriving-batch") ||
      String.valueOf(e.getCause).contains("arriving-batch"), e.toString)
  }

  test("mixture plan: feasible, share-exact, and the binding language runs near rate 1000") {
    val rows = Curation.mixturePlan(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.length == 5)
    val budget = rows.map { case (_, nt, sh, _, _) => nt * 1000L / sh }.min
    rows.foreach { case (lang, nTok, share, rate, planned) =>
      assert(planned <= nTok, s"$lang plans more tokens than it has")
      assert(planned == budget * share / 1000L, s"$lang share not exact")
      assert(rate >= 0L && rate <= 1000L)
      // rate reproduces the plan (floor arithmetic both ways)
      assert(rate == math.min(1000L, planned * 1000L / nTok))
    }
    // The language whose inventory binds the budget samples near full
    // rate — NOT exactly 1000: the double floor (budget, then planned)
    // loses up to (share_pm+1000)/1000 tokens, so the provable bound is
    // rate ≥ 1000 − ceil((share_pm+1000)/n_tokens). Asserting the
    // derived bound (not a hard-coded 999) keeps the pin valid on a
    // tiny corpus while collapsing to ≥ 999 whenever
    // n_tokens ≥ share_pm + 1000 (true at every test SF).
    val binding = rows.minBy { case (_, nt, sh, _, _) => nt * 1000L / sh }
    val (bLang, bTok, bShare, bRate, _) = binding
    val slack = (bShare + 1000L + bTok - 1L) / bTok // ceil((share+1000)/n)
    assert(bRate >= 1000L - slack,
      s"binding language $bLang rate $bRate below provable bound ${1000L - slack}")
    assert(bTok >= bShare + 1000L && bRate >= 999L,
      s"test corpus is large enough that the bound must collapse to 999: $binding")
  }

  test("sample estimate: exact local recompute and bounded estimation error") {
    val got = Curation.sampleEstimate(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.nonEmpty)
    // the estimator reproduces its own arithmetic exactly
    got.foreach { case (_, pm, n, tok, estD, estT) =>
      assert(estD == n * 1000L / pm && estT == tok * 1000L / pm)
    }
    // Horvitz–Thompson consistency: the hash cut approximates the rate,
    // so estimates land near the true per-language inventory
    val truth = Tables.documents(spark, d).select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1).length.toLong))
      .groupBy(_._1).view
      .mapValues(v => (v.size.toLong, v.map(_._2).sum)).toMap
    // relative error of a rate-r hash cut concentrates like
    // 1/sqrt(n_sampled); 4 sigmas is a deterministic-corpus-safe bound
    got.foreach { case (lang, _, n, _, estD, estT) =>
      val (td, tt) = truth(lang)
      val bound = math.max(0.05, 4.0 / math.sqrt(n.toDouble))
      assert(math.abs(estD - td).toDouble / td <= bound,
        s"$lang est_docs $estD vs true $td beyond $bound")
      assert(math.abs(estT - tt).toDouble / tt <= bound,
        s"$lang est_tokens $estT vs true $tt beyond $bound")
    }
  }

  test("eval carve: exact-k strata, window-free plan, deterministic under re-run") {
    val df = Curation.evalCarve(spark, d)
    // the scale claim: the carve is the bounded-heap aggregate, not a
    // per-stratum row_number sort — no Window operator may appear
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"evalCarve planned a window sort:\n$plan")
    val rows = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // per stratum: ranks are 1..k', k' ≤ 50, hash-ascending with
    // doc_id tie-break
    rows.groupBy(_._1).foreach { case (src, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq)
      assert(sorted.length <= 50)
      assert(sorted.map(x => (x._4, x._3)).sliding(2).forall(w =>
        w.length < 2 || (w(0)._1 < w(1)._1 ||
          (w(0)._1 == w(1)._1 && w(0)._2 < w(1)._2))),
        s"stratum $src not (hash, doc_id)-ordered")
    }
    assert(rows.toSeq == Curation.evalCarve(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq)
  }

  test("q134 quality calibration ≡ local rank recompute; endpoints and uniformity hold") {
    val stop = Set("the", "a", "of", "and", "is", "to", "in")
    val docs = Tables.documents(spark, d)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ").toSeq))
    val scored = docs.toSeq.map { case (id, src, tk) =>
      val (n, u, s) = (tk.size.toLong, tk.distinct.size.toLong,
        tk.count(stop).toLong)
      (id, src, 500 * u / n + 200 * s / n + 300 * math.min(n, 200) / 200)
    }
    val exp = scored.groupBy(_._2).flatMap { case (_, g) =>
      val sorted = g.sortBy(x => (x._3, x._1))
      val n = sorted.size.toLong
      sorted.zipWithIndex.map { case ((id, src, sc), i) =>
        (id, src, sc, if (n > 1) 1000 * i / (n - 1) else 500L)
      }
    }.toSeq.sortBy(_._1)
    val got = Curation.qualityCalibration(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == exp)
    assert(got.nonEmpty)
    // calibration makes sources comparable: every multi-doc source
    // spans the full [0, 1000] permille range
    got.groupBy(_._2).filter(_._2.size > 1).foreach { case (src, g) =>
      assert(g.map(_._4).min == 0L && g.map(_._4).max == 1000L,
        s"source $src not calibrated to the full range")
    }
  }

  test("q135 DSIR selection ≡ acceptance rule over q129's weights; deterministic") {
    import org.apache.spark.unsafe.types.UTF8String
    val weights = Curation.importanceWeights(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // independent acceptance recompute: salted id-hash uniform vs
    // min(affinity, 1000), exactly the documented rule
    val exp = weights.flatMap { case (id, n, w) =>
      val u = graft.functions.PolyHashExpr.hash(
        UTF8String.fromString(s"sel:$id")) % 1000L
      if (u < math.min(w, 1000L)) Some((id, n, w, u)) else None
    }.toSeq.sortBy(_._1)
    val got = Curation.dsirSelect(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == exp)
    // the selection is a real cut, not pass-all or pass-none
    assert(got.nonEmpty && got.size < weights.length)
    // re-run is bit-identical (no RNG state anywhere)
    val again = Curation.dsirSelect(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(again == got)
  }

  test("q137 length buckets ≡ local histogram; waste/fill identities hold") {
    val lens = Tables.documents(spark, d).select("text").collect()
      .map(_.getString(0).split(" ").length.toLong)
    val exp = lens.groupBy(_ / 64).toSeq.map { case (b, g) =>
      val (n, s, m) = (g.size.toLong, g.sum, g.max)
      (b, b * 64, n, s, m, n * m - s, 1000 * s / (n * m))
    }.sortBy(_._1)
    val got = Curation.lengthBuckets(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == exp)
    // bucket invariants: every max is inside its bucket's 64-token
    // range, and fill can never exceed 1000 permille
    got.foreach { case (b, lo, _, _, m, waste, fill) =>
      assert(lo == b * 64 && m >= lo && m < lo + 64)
      assert(fill > 0L && fill <= 1000L && waste >= 0L)
    }
    assert(got.map(_._3).sum == lens.length.toLong) // partition of the corpus
  }

  test("pii scrub cut runs unchanged on a stream and matches the batch rows") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sc = spark.sqlContext
    val evs = Tables.events(spark, d)
      .select("event_id", "event_type", "props").as[LEvt].collect().toSeq
    val mem = MemoryStream[LEvt]
    val q = Curation.scrubCut(mem.toDF())
      .writeStream.format("memory").queryName("scrub_out")
      .outputMode(OutputMode.Append).start()
    try {
      val (a, b) = evs.splitAt(evs.size / 2)
      mem.addData(a: _*); q.processAllAvailable()
      mem.addData(b: _*); q.processAllAvailable()
      val stream = spark.table("scrub_out").collect().map(_.toString).sorted.toSeq
      val batch = Curation.piiScrubDf(Tables.events(spark, d)).collect()
        .map(_.toString).sorted.toSeq
      assert(stream == batch && batch.nonEmpty)
    } finally q.stop()
  }

  test("q151 length percentiles ≡ local sorted-rank recompute") {
    val byLang = Tables.documents(spark, d).select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1).length.toLong))
      .groupBy(_._1)
    val exp = byLang.toSeq.map { case (lang, g) =>
      val ls = g.map(_._2).sorted
      def pk(k: Long): Long = ls(((ls.length * k + 99) / 100 - 1).toInt)
      (lang, ls.length.toLong, ls.head, ls.last, pk(50), pk(90), pk(99))
    }.sortBy(_._1)
    val got = Curation.lengthPercentiles(spark, d).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == exp && got.nonEmpty)
    got.foreach { case (_, n, mn, mx, p50, p90, p99) =>
      assert(n > 0 && mn <= p50 && p50 <= p90 && p90 <= p99 && p99 <= mx)
    }
  }

  test("q152 leak-safe split: clusters never straddle; ≡ recompute from the gated plans") {
    val labels = Dedup.nearDupClusters(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val split = Curation.splitAssign(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(2))).toMap
    val exp = labels.map { case (id, cid, cn) =>
      val fin = split(cid)
      (id, split(id), cid, cn, fin, if (split(id) != fin) 1L else 0L)
    }.sortBy(_._1).toSeq
    val got = Curation.leakSafeSplit(spark, d).collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getLong(5))).toSeq
    assert(got == exp && got.nonEmpty)
    // the leakage invariant: one split per cluster, exactly the
    // representative's; singletons never move
    got.groupBy(_._3).values.foreach { g =>
      assert(g.map(_._5).distinct.size == 1)
      if (g.size == 1) assert(g.head._6 == 0L)
    }
    assert(got.forall(r => (r._6 == 1L) == (r._2 != r._5)))
  }

  test("q154 canonical docs ≡ local best-quality recompute over the gated clusters") {
    val stop = Set("the", "a", "of", "and", "is", "to", "in")
    val score = Tables.documents(spark, d)
      .select("doc_id", "n_chars", "text").collect()
      .map { r =>
        val tk = r.getString(2).split(" ", -1)
        val (nTok, nUniq) = (tk.length.toLong, tk.distinct.length.toLong)
        val sc = 500 * nUniq / nTok + 200 * tk.count(stop).toLong / nTok +
          300 * math.min(nTok, 200L) / 200
        r.getLong(0) -> (r.getLong(1), sc)
      }.toMap
    val labels = Dedup.nearDupClusters(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val exp = labels.groupBy(_._2).toSeq.map { case (cid, g) =>
      val members = g.map(_._1)
      val best = members.minBy(id => (-score(id)._2, id))
      val chars = members.map(score(_)._1).sum
      (cid, best, score(best)._2, members.size.toLong,
        members.size - 1L, chars - score(best)._1)
    }.sortBy(_._1)
    val got = Curation.canonicalDocs(spark, d).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == exp && got.nonEmpty)
    // clusters partition the corpus; singletons save nothing
    assert(got.map(_._4).sum == labels.length.toLong)
    got.filter(_._4 == 1L).foreach(r => assert(r._5 == 0L && r._6 == 0L))
    assert(got.exists(_._5 > 0L)) // the planted near-dups DO collapse
  }

  test("q144 pii scrub: seeded cascade redacts exactly; corpus counts sane") {
    import spark.implicits._
    val rows = Seq(
      (1L, "signup", """{"email": "alice.smith+x@mail.example.com"}"""),
      (2L, "login", """{"ip": "10.0.255.7", "port": 8080}"""),
      (3L, "call", """{"phone": "415-555-1234"}"""),
      (4L, "misc", """{"k": 7, "v": 42}"""),
      (5L, "mix", """{"e": "b@c.io", "ip": "1.2.3.4", "t": "555-111-2222 9"}"""))
      .toDF("event_id", "event_type", "props")
    val got = Curation.piiScrubDf(rows).collect().map(r =>
      (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getLong(6), r.getString(7))).toSeq
    // chars_redacted recomputed by the same Java regex engine the plan
    // compiles to (the RE2 side is held by the driver oracle)
    def strip(s: String): Long =
      (s.length - s.replaceAll(Curation.PiiEmailRe, "")
        .replaceAll(Curation.PiiIpRe, "").replaceAll(Curation.PiiPhoneRe, "")
        .replaceAll(Curation.PiiNumRe, "").length).toLong
    val props = rows.collect().map(r => (r.getLong(0), r.getString(2))).toMap
    val exp = Seq(
      (1L, 1L, 0L, 0L, 0L, strip(props(1L)), """{"email": "<EMAIL>"}"""),
      (2L, 0L, 1L, 0L, 1L, strip(props(2L)), """{"ip": "<IP>", "port": <NUM>}"""),
      (3L, 0L, 0L, 1L, 0L, strip(props(3L)), """{"phone": "<PHONE>"}"""),
      (4L, 0L, 0L, 0L, 1L, strip(props(4L)), """{"k": 7, "v": <NUM>}"""),
      (5L, 1L, 1L, 1L, 0L, strip(props(5L)),
        """{"e": "<EMAIL>", "ip": "<IP>", "t": "<PHONE> 9"}"""))
    assert(got == exp)
    // the synthetic event stream carries digit runs but no contact PII
    val corpus = Curation.piiScrub(spark, d).collect()
    assert(corpus.forall(r => r.getLong(2) == 0 && r.getLong(3) == 0 && r.getLong(4) == 0))
    assert(corpus.map(_.getLong(5)).sum > 0) // digit runs redacted
    assert(corpus.map(_.getLong(6)).sum > 0)
  }

  test("q147 source caps ≡ local top-15-by-quality recompute (cap binds at sf0.01)") {
    val d01 = "/root/testdata/sf0.01"
    val stop = Set("the", "a", "of", "and", "is", "to", "in")
    val docs = Tables.documents(spark, d01)
      .select("doc_id", "source", "n_chars", "text").collect()
      .map { r =>
        val tk = r.getString(3).split(" ", -1)
        val (nTok, nUniq) = (tk.length.toLong, tk.distinct.length.toLong)
        val nStop = tk.count(stop).toLong
        val score = 500 * nUniq / nTok + 200 * nStop / nTok +
          300 * math.min(nTok, 200L) / 200
        (r.getLong(0), r.getString(1), r.getLong(2), score)
      }
    val exp = docs.groupBy(_._2).toSeq.map { case (src, g) =>
      val kept = g.sortBy(x => (-x._4, x._1)).take(Curation.SourceCap)
      (src, g.size.toLong, kept.size.toLong, (g.size - kept.size).toLong,
        g.map(_._3).sum, kept.map(_._3).sum,
        1000L * kept.size / g.size, kept.map(_._4).min)
    }.sortBy(_._1)
    val got = Curation.sourceCaps(spark, d01).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(got == exp && got.nonEmpty)
    assert(got.exists(_._4 > 0)) // at sf0.01 at least one source overflows the cap
    got.foreach { case (_, n, k, _, tot, keptC, ret, _) =>
      assert(k <= Curation.SourceCap && k <= n && keptC <= tot && ret <= 1000)
    }
  }

  test("q157 temperature mix ≡ local recompute; isqrt exact on adversarial values") {
    def isqrt(n: Long): Long = {
      var s = math.floor(math.sqrt(n.toDouble)).toLong
      if (s * s > n) s -= 1
      if ((s + 1) * (s + 1) <= n) s += 1
      s
    }
    // the correction handles both sqrt rounding directions: perfect
    // squares, their neighbors, and values where floor(sqrt) seeds off
    // by one (k² − 1 above 2^53 rounds UP in double — the 94906265
    // row). Domain is token counts (≲10¹³ at 100 TB); values near
    // isqrt(Long.Max)² are out of contract ((s+1)² would overflow).
    for (k <- Seq(1L, 2L, 3L, 1000L, 94906265L, 3000000000L); n <- Seq(k * k - 1, k * k, k * k + 1))
      if (n >= 0) {
        val s = isqrt(n)
        assert(s * s <= n && (s + 1) * (s + 1) > n, s"isqrt($n)")
      }
    val inv = Tables.documents(spark, d).select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1).length.toLong))
      .groupBy(_._1).map { case (s, xs) => (s, xs.map(_._2).sum) }.toSeq.sortBy(_._1)
    val tw = inv.map { case (_, n) => isqrt(n) }.sum
    val tn = inv.map(_._2).sum
    val exp = inv.map { case (s, n) =>
      val w = isqrt(n)
      val drawn = Math.floorDiv(tn * w, tw)
      (s, n, w, Math.floorDiv(1000L * w, tw), drawn, Math.floorDiv(1000L * drawn, n))
    }
    val got = Curation.temperatureMix(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == exp && got.nonEmpty)
    // floor shares sum to ≤1000; share ordering follows inventory
    // ordering (isqrt and floor-div are monotone); and tempering
    // compresses RELATIVE spread: max/min weight ratio ≤ the token
    // ratio (strictly, w²  bounds: w_max² ≤ n_max+... use exact form)
    assert(got.map(_._4).sum <= 1000)
    val byN = got.sortBy(_._2)
    assert(byN.map(_._3) == byN.map(_._3).sorted) // weight monotone in n
    val (wMax, wMin) = (got.map(_._3).max, got.map(_._3).min)
    val (nMax, nMin) = (got.map(_._2).max, got.map(_._2).min)
    // isqrt(a)/isqrt(b) ≤ a/b for a ≥ b ≥ 1 up to the floor unit:
    // exact integer form w_max² · n_min ≤ (n_max) · (w_min+1)²
    assert(wMax * wMax * nMin <= nMax * (wMin + 1) * (wMin + 1))
  }

  test("q165 snapshot diff ≡ local distinct-content set algebra; identities hold") {
    def h(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 131 + c.toLong) % 1000000007L)
    val docs = Tables.documents(spark, d)
      .select("lang", "source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).drop(3).toInt >= 15,
        h(r.getString(2))))
    val langs = docs.map(_._1).distinct.sorted
    val exp = langs.map { l =>
      val old = docs.collect { case (`l`, false, hh) => hh }.toSet
      val neu = docs.collect { case (`l`, true, hh) => hh }.toSet
      val (added, removed, common) =
        ((neu -- old).size.toLong, (old -- neu).size.toLong, (old & neu).size.toLong)
      (l, old.size.toLong, neu.size.toLong, added, removed, common,
        if (neu.nonEmpty) Some(1000L * added / neu.size) else None,
        if (old.nonEmpty) Some(1000L * removed / old.size) else None)
    }.toSeq
    val got = Curation.snapshotDiff(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5),
        if (r.isNullAt(6)) None else Some(r.getLong(6)),
        if (r.isNullAt(7)) None else Some(r.getLong(7)))).toSeq
    assert(got == exp && got.nonEmpty)
    // set identities: old = removed + common, new = added + common
    got.foreach { case (_, no, nn, a, rm, c, _, _) =>
      assert(no == rm + c && nn == a + c) }
  }

  test("q159 vocab growth ≡ local recompute; curves are monotone and Heaps-concave") {
    val docs = Tables.documents(spark, d).select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val mx = docs.map(_._1).max
    def bucket(id: Long): Long = math.min(19L, (id * 20L) / (mx + 1L))
    val occ = docs.flatMap { case (id, lang, text) =>
      text.split(" ", -1).map(t => (lang, bucket(id), t)) }
    val vol = occ.groupBy { case (l, b, _) => (l, b) }.map { case (k, xs) => (k, xs.length.toLong) }
    val fresh = occ.groupBy { case (l, _, t) => (l, t) }.toSeq
      .map { case ((l, _), xs) => (l, xs.map(_._2).min) }
      .groupBy(identity).map { case ((l, b), xs) => ((l, b), xs.size.toLong) }
    val exp = vol.keys.toSeq.sorted.map { case (l, b) =>
      val nt = fresh.getOrElse((l, b), 0L)
      val cumT = fresh.filter { case ((fl, fb), _) => fl == l && fb <= b }.values.sum
      val cumK = vol.filter { case ((vl, vb), _) => vl == l && vb <= b }.values.sum
      (l, b, nt, vol((l, b)), cumT, cumK)
    }
    val got = TextAnalysis.vocabGrowth(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == exp && got.nonEmpty)
    // per lang: cum curves are non-decreasing, and type growth is
    // concave-ish in the aggregate (last-slice new types below the
    // first slice's — the mined-out signal on a closed vocabulary)
    got.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._5) == sorted.map(_._5).sorted)
      assert(sorted.map(_._6) == sorted.map(_._6).sorted)
      assert(sorted.last._3 <= sorted.head._3)
    }
  }
}
