package graft

import org.apache.spark.sql.functions._

/** Round-11 batch f: q337 code detection, q338 rare-word share, q339
  * props schema discovery — local recomputes plus structure (decision
  * rule replayed, rare mass ≤ total mass, key shares ≤ 1000). */
class NewOpsRound11fSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("q337 ≡ local rule recompute") {
    val ds = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"), col("n_chars"))
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    val kws = TextAnalysis.CodeKeywords.toSet
    val exp = ds.groupBy(_._1).toSeq.sortBy(_._1).map { case (s, g) =>
      val per = g.map { case (_, t, nc) =>
        val sym = t.count("{}();=<>".contains(_)).toLong
        val kw = t.split(" ", -1).count(kws).toLong
        val symPm = 1000L * sym / math.max(nc, 1L)
        (sym, nc, if (symPm >= 20L || kw >= 3L) 1L else 0L)
      }
      val nCode = per.map(_._3).sum
      val tSym = per.map(_._1).sum
      val tCh = per.map(_._2).sum
      (s, per.length.toLong, nCode, 1000L * nCode / per.length,
        1000L * tSym / math.max(tCh, 1L))
    }
    val got = TextAnalysis.codeDetect(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got == exp && got.nonEmpty)
  }

  test("q338 ≡ local df recompute; rare mass bounded by total mass") {
    val ds = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val tf = ds.flatMap { case (id, s, t) =>
      t.split(" ", -1).groupBy(identity).map { case (w, g) =>
        ((id, s, w), g.length.toLong)
      }
    }
    val df_ = tf.groupBy(_._1._3).view.mapValues(_.length.toLong).toMap
    val perDoc = tf.groupBy(t => (t._1._1, t._1._2)).toSeq
      .map { case ((_, s), g) =>
        val nTok = g.map(_._2).sum
        val nRare = g.filter(t => df_(t._1._3) <= TextAnalysis.RareDfMax)
          .map(_._2).sum
        (s, nTok, nRare, 1000L * nRare / nTok)
      }
    val exp = perDoc.groupBy(_._1).toSeq.sortBy(_._1).map { case (s, g) =>
      (s, g.length.toLong, g.map(_._2).sum, g.map(_._3).sum,
        1000L * g.map(_._3).sum / g.map(_._2).sum,
        1000L * g.count(_._4 > 100L) / g.length)
    }
    val got = TextAnalysis.rareWordShare(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got == exp && got.nonEmpty)
    got.foreach(t => assert(t._4 <= t._3))
  }

  test("q339 ≡ local key-walk recompute; shares ≤ 1000") {
    val ev = Tables.eventsNs(spark, d)
      .select(col("event_type"), col("props"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    def keysOf(js: String): Seq[String] = {
      // top-level keys of a flat JSON object: "key": — robust for the
      // generator's flat payloads (no nested objects in props)
      "\"([^\"]+)\"\\s*:".r.findAllMatchIn(js).map(_.group(1)).toSeq
    }
    val tot = ev.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val pres = ev.flatMap { case (t, p) => keysOf(p).map(k => (t, k)) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val exp = pres.keys.toSeq.sorted.map { case (t, k) =>
      val n = pres((t, k))
      val nk = pres.keys.count(_._1 == t).toLong
      (t, k, n, tot(t), 1000L * n / tot(t), nk)
    }
    val got = Queries.propsSchema(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got == exp && got.nonEmpty)
    got.foreach(t => assert(t._5 <= 1000L))
  }
}
