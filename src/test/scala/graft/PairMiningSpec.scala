package graft

/** Independent driver-side recomputes for q172-q174: each distributed
  * result must equal a from-scratch local implementation — plain Scala
  * collections, the same exact arithmetic, no shared code with the
  * operators under test.
  */
class PairMiningSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("q172 mutual-NN ≡ local per-cell argmax + reciprocity filter") {
    // read the SAME persisted cells the operator probes (the clustering
    // itself is pinned by KmeansSpec/IvfIndex specs); recompute the
    // within-cell top-1 and the mutual filter from scratch
    val (_, corpus) = IvfIndex.buildOrLoad(spark, d, nlist = 16)
    val rows = corpus.collect().map { r =>
      (r.getLong(r.fieldIndex("vec_id")),
        r.getSeq[Double](r.fieldIndex("v")).toArray,
        r.getInt(r.fieldIndex("cell")))
    }
    def dotSeq(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    val top1: Map[Long, (Long, Double, Int)] =
      rows.groupBy(_._3).toSeq.flatMap { case (_, cell) =>
        cell.toSeq.flatMap { case (id, v, c) =>
          val others = cell.filter(_._1 != id)
          if (others.isEmpty) Seq.empty
          else {
            val scored = others.map { case (oid, ov, _) =>
              (dotSeq(v, ov) / math.sqrt(dotSeq(v, v) * dotSeq(ov, ov)), oid)
            }
            // (score desc, id asc) — TopKByScore order
            val best = scored.minBy { case (s, oid) => (-s, oid) }
            Seq(id -> (best._2, best._1, c))
          }
        }
      }.toMap
    val exp = top1.toSeq.collect {
      case (a, (b, cos, cell)) if a < b &&
        top1.get(b).exists(_._1 == a) =>
        (a, b, cell, BigDecimal(cos).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy(_._1)
    val got = Similarity.mutualNn(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(got == exp && got.nonEmpty)
    // reciprocity is strict: no vector may appear in two pairs
    val ids = got.flatMap(p => Seq(p._1, p._2))
    assert(ids.distinct.size == ids.size)
  }

  private lazy val docRows: Seq[(Long, String, Long, Array[String])] =
    spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "lang", "n_chars", "text").collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3).split(" ", -1)))

  test("q173 rank fusion ≡ local min-ranks summed") {
    val m = docRows.map { case (id, lang, nc, tk) =>
      (id, lang, tk.length.toLong, tk.distinct.length.toLong, nc)
    }
    def minRank(vals: Seq[(Long, Long)]): Map[Long, Long] = {
      // (doc_id, value) -> 1 + count of strictly larger values
      val counts = vals.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      vals.map { case (id, v) =>
        id -> (1L + counts.filter(_._1 > v).values.sum)
      }.toMap
    }
    val exp = m.groupBy(_._2).flatMap { case (_, docs) =>
      val rTok = minRank(docs.map(t => (t._1, t._3)))
      val rTyp = minRank(docs.map(t => (t._1, t._4)))
      val rChr = minRank(docs.map(t => (t._1, t._5)))
      docs.map { case (id, lang, nt, ny, nc) =>
        (id, lang, nt, ny, nc, rTok(id), rTyp(id), rChr(id),
          rTok(id) + rTyp(id) + rChr(id))
      }
    }.toSeq.sortBy(_._1)
    val got = Curation.rankFusion(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)))
    assert(got == exp && got.nonEmpty)
  }

  test("q174 winsorize ≡ local clip at rank-picked p05/p95") {
    val exp = docRows.groupBy(_._2).map { case (lang, docs) =>
      val lens = docs.map(_._4.length.toLong).sorted
      val n = lens.size.toLong
      def pick(k: Long): Long = lens(((n * k + 99) / 100 - 1).toInt)
      val (lo, hi) = (pick(5), pick(95))
      val clipped = lens.map(v => math.max(lo, math.min(hi, v)))
      (lang, n, lo, hi,
        lens.count(_ < lo).toLong, lens.count(_ > hi).toLong,
        lens.sum / n, clipped.sum / n)
    }.toSeq.sortBy(_._1)
    val got = Curation.winsorizedStats(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(got == exp && got.nonEmpty)
    // winsorized mean is a real clip: bounded by the clip bounds
    assert(got.forall(t => t._8 >= t._3 && t._8 <= t._4))
  }
}
