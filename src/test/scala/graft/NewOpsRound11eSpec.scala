package graft

import org.apache.spark.sql.functions._

/** Round-11 batch e: q335 out-of-orderness audit, q336 mutual-NN
  * component audit — local recomputes plus structure (watermark
  * bucket admits ≥ 99%, components partition the paired set, mutual
  * degree ≤ 1 forces path/pair components). */
class NewOpsRound11eSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("q335 ≡ local running-max recompute; P99 bucket admits ≥ 99%") {
    val ev = Tables.eventsNs(spark, d)
      .select(col("event_type"), col("event_id"), col("ts"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val exp = ev.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, g) =>
      val byArrival = g.sortBy(_._2)
      var hwm = Long.MinValue
      val lates = byArrival.map { e =>
        val l = if (hwm == Long.MinValue) 0L else math.max(hwm - e._3, 0L)
        hwm = math.max(hwm, e._3)
        l / 60000000000L
      }
      val n = lates.length.toLong
      val nLate = lates.count(_ > 0L).toLong
      val hist = lates.groupBy(identity).view.mapValues(_.length.toLong)
        .toSeq.sortBy(_._1)
      var cum = 0L
      val p99 = hist.collectFirst {
        case (b, c) if { cum += c; 100 * cum >= 99 * n } => b
      }.get
      (t, n, nLate, 1000L * nLate / n, lates.max, p99)
    }
    val got = Queries.oooLateness(spark, d).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got == exp && got.nonEmpty)
    // the reported watermark really admits >= 99% of each type
    exp.foreach { case (t, n, _, _, _, p99) =>
      val g = ev.filter(_._1 == t).sortBy(_._2)
      var hwm = Long.MinValue
      val admitted = g.count { e =>
        val l = if (hwm == Long.MinValue) 0L else math.max(hwm - e._3, 0L)
        hwm = math.max(hwm, e._3)
        l / 60000000000L <= p99
      }
      assert(100L * admitted >= 99L * n)
    }
  }

  test("q336 ≡ local union-find recompute; mutual degree ≤ 1 ⇒ pair components") {
    val pairs = Similarity.mutualNn(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val labels = Tables.embeddings(spark, d)
      .selectExpr("vec_id", "CAST(label AS BIGINT) AS label")
      .filter(col("label").isNotNull)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // mutual-NN degree ≤ 1: each vector appears in at most one pair
    val occur = pairs.flatMap(p => Seq(p._1, p._2))
    assert(occur.distinct.length == occur.length,
      "a vector in two mutual pairs is impossible (top-1 reciprocity)")
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      r
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val paired = occur.toSet
    val exp = labels.groupBy(_._2).toSeq.sortBy(_._1).map { case (l, g) =>
      val ids = g.map(_._1)
      val p = ids.filter(paired)
      val comps = p.groupBy(find)
      (l, ids.length.toLong, p.length.toLong, comps.size.toLong,
        if (comps.isEmpty) 0L else comps.values.map(_.length).max.toLong,
        1000L * (ids.length - p.length) / ids.length)
    }
    val got = Similarity.mutualNnComponents(spark, d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got == exp && got.nonEmpty)
    // degree ≤ 1 means every component among paired vectors has ≤ 2
    // members of any single label
    got.foreach(t => assert(t._5 <= 2L))
  }
}
