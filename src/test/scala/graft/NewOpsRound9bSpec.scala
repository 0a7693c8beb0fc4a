package graft

import org.apache.spark.sql.functions._

/** Round-9 batch b: q247 metadata-filtered exact top-k and q248 the
  * post-filtered LSH audit. Both pinned against independent local
  * recomputes (straight Scala doubles with the same sequential-fold
  * dot-product order as the native kernel), plus the consistency
  * certificates that tie the audit's columns to each other. */
class NewOpsRound9bSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  /** (vec_id, vector, source) for every doc-aligned embedding. */
  private lazy val corpus: Seq[(Long, Array[Double], String)] = {
    val src = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    spark.read.parquet(s"$d/embeddings.parquet")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>)").collect()
      .toSeq.flatMap { r =>
        src.get(r.getLong(0)).map(s =>
          (r.getLong(0), r.getSeq[Double](1).toArray, s))
      }
  }

  private def dotSeq(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }

  /** Local exact filtered top-5 per query (source must differ). */
  private lazy val localExact: Map[Long, Seq[(Long, Double)]] = {
    val qs = corpus.filter(_._1 < 10)
    qs.map { case (qid, qv, qs_) =>
      val scored = corpus
        .filter { case (id, _, s) => id != qid && s != qs_ }
        .map { case (id, v, _) =>
          (id, dotSeq(qv, v) / math.sqrt(dotSeq(qv, qv) * dotSeq(v, v)))
        }
      qid -> scored.sortBy { case (id, c) => (-c, id) }.take(5)
    }.toMap
  }

  test("q247 filtered knn ≡ local recompute; filter actually binds") {
    val got = Similarity.filteredKnn(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val exp = localExact.toSeq.sortBy(_._1).flatMap { case (qid, top) =>
      top.zipWithIndex.map { case ((id, c), i) =>
        (qid, id, math.rint(c * 1e6) / 1e6, (i + 1).toLong)
      }
    }
    // compare ids/ranks exactly and cosines to the same 6-dp rounding
    assert(got.map(t => (t._1, t._2, t._4)) == exp.map(t => (t._1, t._2, t._4)))
    got.zip(exp).foreach { case (g, e) =>
      assert(math.abs(g._3 - e._3) < 1e-9, s"cosine mismatch at $g vs $e")
    }
    // the filter binds: at least one query's filtered list differs
    // from its unfiltered list (otherwise the predicate tested nothing)
    val unfiltered = Similarity.bruteForceTopK(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.map(t => (t._1, t._2)) != unfiltered,
      "cross-source filter must change at least one result")
  }

  test("q248 audit ≡ local recompute + internal consistency") {
    // local LSH buckets with the shared integer-plane arithmetic
    def buckets(v: Array[Double]): Seq[(Int, Long)] =
      (0 until 4).map { t =>
        val b = (0 until 4).map { r =>
          val proj = (0 until 64).map { i =>
            val w = if ((((t * 4 + r) * 64 + i).toLong * 2654435761L
              & 65536L) != 0L) 1.0 else -1.0
            w * v(i)
          }.sum
          if (proj > 0.0) 1L << r else 0L
        }.sum
        (t, b)
      }
    val sigs = corpus.map { case (id, v, s) => (id, s, buckets(v)) }
    val exp = corpus.filter(_._1 < 10).map { case (qid, qv, qsrc) =>
      val qb = buckets(qv).toSet
      val cands = sigs.filter { case (id, _, bs) =>
        id != qid && bs.exists(qb.contains)
      }
      val filtered = cands.filter(_._2 != qsrc)
      val byId = corpus.map(c => c._1 -> c._2).toMap
      val top = filtered.map { case (id, _, _) =>
        (id, dotSeq(qv, byId(id)) /
          math.sqrt(dotSeq(qv, qv) * dotSeq(byId(id), byId(id))))
      }.sortBy { case (id, c) => (-c, id) }.take(5).map(_._1).toSet
      val exactIds = localExact(qid).map(_._1).toSet
      // denominator = the ACTUAL exact-list size (the operator's
      // contract since the r9 advice fix), not the slot count 5 — on
      // this corpus every query has ≥5 cross-source neighbors so the
      // two agree; the planted starved-filter fixture below is where
      // they differ and the new semantics is discriminated.
      (qid, cands.size.toLong, filtered.size.toLong, top.size.toLong,
        1000L * top.intersect(exactIds).size / exactIds.size)
    }.sortBy(_._1)
    val got = Similarity.filteredLshAudit(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got == exp)
    // consistency certificates: filtered ⊆ raw candidates, the fill is
    // exactly min(5, filtered), recall is a permille
    got.foreach { case (q, nc, nf, fill, rec) =>
      assert(nf <= nc && fill == math.min(5L, nf) && rec >= 0 && rec <= 1000)
    }
    // the starvation signal exists on this corpus: at least one query
    // loses candidates to the filter
    assert(got.exists { case (_, nc, nf, _, _) => nf < nc })
  }

  test("q248 starved filter: recall divides by the ACTUAL exact-list size") {
    import spark.implicits._
    // Planted corpus where the cross-source truth set is SHORTER than
    // the 5 result slots: vectors 0..3 identical (0,1,2 in source a;
    // 3 in source b), 10/11 are distinct source-a fillers. Every
    // query in {0,1,2} has exactly ONE cross-source exact neighbor
    // (vector 3) — identical vectors share all LSH buckets, so the
    // index path finds it and recall must read 1000‰, not the 200‰
    // the old ⌊1000·hits/5⌋ denominator would report. Query 3's
    // truth set has the full 5, pinning the unstarved case in the
    // same frame.
    val tmp = java.nio.file.Files.createTempDirectory("graft_q248").toString
    val base = Array.tabulate(64)(i => if (i % 2 == 0) 1.0f else -1.0f)
    def filler(seed: Int): Array[Float] =
      Array.tabulate(64)(i =>
        (((i + 1) * (seed + 3) * 2654435761L >>> 16) % 17).toFloat - 8.0f)
    val vecs = Seq(
      (0L, base), (1L, base), (2L, base), (3L, base),
      (10L, filler(1)), (11L, filler(2)))
    vecs.toDF("vec_id", "embedding")
      .write.parquet(s"$tmp/embeddings.parquet")
    Seq((0L, "a"), (1L, "a"), (2L, "a"), (3L, "b"), (10L, "a"), (11L, "a"))
      .toDF("doc_id", "source")
      .write.parquet(s"$tmp/documents.parquet")
    val got = Similarity.filteredLshAudit(spark, tmp).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    val byQ = got.map(t => t._1 -> ((t._2, t._3))).toMap
    // queries 0,1,2: one-element truth set, found → full recall
    Seq(0L, 1L, 2L).foreach { q =>
      assert(byQ(q) == ((1L, 1000L)),
        s"query $q: expected (n_filled=1, recall_pm=1000), got ${byQ(q)}")
    }
    // query 3: five-element truth set {0,1,2,10,11}; the identical
    // vectors 0/1/2 collide into its buckets, the fillers need not —
    // recall = 1000·hits/5 exactly as before on unstarved queries
    val (fill3, rec3) = byQ(3L)
    assert(fill3 >= 3L && rec3 == 1000L * fill3 / 5L)
  }

  test("q249 MMR ≡ local greedy over the exact integer pool") {
    // int8 quantization + signed-square micro scores, straight Scala
    def quant(v: Array[Double]): Array[Long] = {
      val ma = v.map(math.abs).max
      val sc = 127.0 / ma
      v.map(x =>
        if (x >= 0) math.floor(math.abs(x * sc) + 0.5).toLong
        else -math.floor(math.abs(x * sc) + 0.5).toLong)
    }
    def idot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    def sq(dt: Long, an: Long, bn: Long): Long =
      if (dt >= 0) (1000000L * dt * dt) / (an * bn)
      else -((1000000L * dt * dt) / (an * bn))
    val vecs = corpus.filter(_._2.map(math.abs).max > 0)
      .map { case (id, v, _) => id -> quant(v) }
      .filter { case (_, q) => idot(q, q) > 0 }
    val byId = vecs.toMap
    val norms = vecs.map { case (id, q) => id -> idot(q, q) }.toMap
    val exp = vecs.filter(_._1 < 10).sortBy(_._1).flatMap { case (qid, qq) =>
      val qn = norms(qid)
      val pool = vecs.filter(_._1 != qid)
        .map { case (id, q) => (id, sq(idot(qq, q), qn, norms(id))) }
        .sortBy { case (id, s) => (-s, id) }.take(Similarity.MmrPool)
      val cands = scala.collection.mutable.Map(pool: _*)
      val selected = scala.collection.mutable.ArrayBuffer.empty[Long]
      (1 to Similarity.MmrK).flatMap { r =>
        if (cands.isEmpty) None
        else {
          val (id, srel, score) =
            if (r == 1) { val (i, s) = cands.minBy(t => (-t._2, t._1)); (i, s, s) }
            else cands.toSeq.map { case (i, s) =>
              val pen = selected.map(sid =>
                sq(idot(byId(sid), byId(i)), norms(sid), norms(i))).max
              (i, s, s - pen)
            }.minBy(t => (-t._3, t._1))
          selected += id; cands.remove(id)
          Some((qid, r.toLong, id, srel, score))
        }
      }
    }
    val got = Similarity.mmrDiversified(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got == exp)
    // diversification must BIND somewhere: at least one query's MMR
    // order differs from its plain relevance order (otherwise λ=½
    // tested nothing on this corpus)
    val relOrder = exp.groupBy(_._1).map { case (q, rows) =>
      q -> rows.sortBy(_._2).map(_._3)
    }
    val relTop = vecs.filter(_._1 < 10).map { case (qid, qq) =>
      val qn = norms(qid)
      qid -> vecs.filter(_._1 != qid)
        .map { case (id, q) => (id, sq(idot(qq, q), qn, norms(id))) }
        .sortBy { case (id, s) => (-s, id) }.take(Similarity.MmrK).map(_._1)
    }.toMap
    assert(relOrder.exists { case (q, mmr) => mmr != relTop(q) })
    // and scores are non-increasing within a query after rank 1
    exp.groupBy(_._1).values.foreach { rows =>
      val scores = rows.sortBy(_._2).drop(1).map(_._5)
      assert(scores.zip(scores.drop(1)).forall { case (a, b) => a >= b })
    }
  }
}
