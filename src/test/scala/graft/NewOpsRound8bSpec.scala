package graft

/** Independent recomputes for the second round-8 batch (q218-q222):
  * plain Scala over raw parquet rows (q221 recomposes from q49's
  * already-verified output, the q209 precedent), exact integer
  * arithmetic in BigInt where the operators use DECIMAL/HUGEINT.
  */
class NewOpsRound8bSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  private val stops = Set("the", "a", "of", "and", "is", "to", "in")

  private def docs: Seq[(Long, String, Array[String])] =
    spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "source", "text").collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ", -1)))

  private def qMilli(tk: Array[String]): Long = {
    val n = tk.length.toLong
    500 * tk.distinct.length / n + 200 * tk.count(stops) / n +
      300 * math.min(n, 200L) / 200
  }

  test("q218 spearman ≡ local doubled-rank BigInt moments") {
    val xs = docs.map(t => (t._3.length.toLong, qMilli(t._3)))
    def ranks(vs: Seq[Long]): Map[Long, Long] = {
      val hist = vs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val sorted = hist.keys.toSeq.sorted
      var before = 0L
      sorted.map { v =>
        val r = (v, 2 * before + hist(v) + 1); before += hist(v); r
      }.toMap
    }
    val (rx, ry) = (ranks(xs.map(_._1)), ranks(xs.map(_._2)))
    val pts = xs.map { case (x, y) => (BigInt(rx(x)), BigInt(ry(y))) }
    val n = BigInt(pts.size)
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(t => t._1 * t._2).sum
    val sxx = pts.map(t => t._1 * t._1).sum
    val syy = pts.map(t => t._2 * t._2).sum
    val num = n * sxy - sx * sy
    val den = (n * sxx - sx * sx) * (n * syy - sy * sy)
    val exp = if (den == 0) None
      else Some(((if (num < 0) -BigInt(1) else BigInt(1)) *
        (BigInt(1000) * num * num / den)).toLong)
    val row = Curation.lengthQualityCorr(spark, d).collect().head
    assert(row.getLong(0) == pts.size.toLong)
    val got = if (row.isNullAt(1)) None else Some(row.getLong(1))
    assert(got == exp)
    // on this corpus the unique-token ratio dominates and ANTI-
    // correlates with length (longer word salad repeats more), so the
    // audit must report a real NEGATIVE rank correlation — and one far
    // from |1|, the evidence the score carries non-length signal
    assert(exp.exists(v => v < -50 && v > -950))
  }

  test("q219 KS ≡ local per-source CDF max-gap") {
    val xs = docs.map(t => (t._2, t._3.length.toLong))
    val nAll = xs.size.toLong
    val grid = xs.map(_._2).distinct.sorted
    val exp = xs.groupBy(_._1).toSeq.sortBy(_._1).map { case (s, ss) =>
      val nS = ss.size.toLong; val nR = nAll - nS
      val hS = ss.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val hA = xs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      var (cumS, cumA) = (0L, 0L)
      var best = (BigInt(-1), 0L)
      grid.foreach { g =>
        cumS += hS.getOrElse(g, 0L); cumA += hA(g)
        val gap = (BigInt(cumS) * nR - BigInt(cumA - cumS) * nS).abs
        if (gap > best._1 && gap > 0) best = (gap, g)
      }
      (s, nS, (BigInt(1000) * best._1 / (BigInt(nS) * nR)).toLong, best._2)
    }
    val got = Curation.sourceLengthDrift(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got == exp)
    assert(exp.exists(_._3 > 0))
  }

  test("q220 vocab overlap ≡ local set jaccard") {
    val vocab = docs.groupBy(_._2).view
      .mapValues(_.flatMap(_._3).toSet).toMap
    val srcs = vocab.keys.toSeq.sorted
    val exp = (for {
      a <- srcs; b <- srcs if a < b
      cm = (vocab(a) intersect vocab(b)).size.toLong if cm > 0
    } yield {
      val (va, vb) = (vocab(a).size.toLong, vocab(b).size.toLong)
      (a, b, va, vb, cm, 1000 * cm / (va + vb - cm))
    }).sortBy(t => (t._1, t._2))
    val got = TextAnalysis.sourceVocabOverlap(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got == exp)
    // the synthetic corpus shares a core vocabulary across sources
    assert(exp.nonEmpty && exp.exists(_._6 > 100))
  }

  test("q221 yield ≡ recompute from q49's verified labels") {
    val labels = Dedup.nearDupClusters(spark, d)
      .select("doc_id", "cluster_n").collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val exp = docs.groupBy(_._2).toSeq.sortBy(_._1).map { case (s, ds) =>
      val toks = ds.map(t => (t._3.length.toLong, labels(t._1)))
      val raw = toks.map(_._1).sum
      val eff = toks.map { case (n, cn) => 1000 * n / cn }.sum
      (s, ds.size.toLong, raw, toks.count(_._2 > 1).toLong, eff, eff / raw)
    }
    val got = Dedup.dedupYield(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got == exp)
    // duplication exists, so some source must yield below 1000 permille
    assert(exp.exists(_._6 < 1000))
  }

  test("q222 bucket balance ≡ local minhash band replay") {
    val P = 1000000007L
    def ph(t: String): Long =
      t.foldLeft(0L)((a, c) => (a * 131 + c.toLong) % P)
    val bandRows = docs.flatMap { case (id, _, tk) =>
      val sh = (0 to tk.length - 3)
        .map(i => ph(tk.slice(i, i + 3).mkString(" "))).distinct
      if (sh.isEmpty) Nil
      else (0 until 4).map { b =>
        val ms = (b * 4 until b * 4 + 4).map { j =>
          sh.map(h => ((2 * j + 1) * h + 12345 + 7919 * j) % P).min
        }
        val key = ms.foldLeft(0L)((a, m) => (a * 131 + m) % P)
        (b.toLong, key)
      }
    }
    val exp = bandRows.groupBy(_._1).toSeq.sortBy(_._1).map { case (b, xs) =>
      val sizes = xs.groupBy(_._2).values.map(_.size.toLong).toSeq
      (b, sizes.size.toLong, sizes.max, sizes.count(_ == 1).toLong,
        sizes.map(n => n * (n - 1) / 2).sum)
    }
    val got = Dedup.lshBucketBalance(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got == exp)
    // near-dups exist, so some band must have a non-singleton bucket
    assert(exp.exists(_._5 > 0))
  }
}
