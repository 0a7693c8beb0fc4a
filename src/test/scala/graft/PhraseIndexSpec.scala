package graft

import org.apache.spark.sql.functions._

/** Probe-cost contract of the q187 phrase chain: rarest term first.
  *
  * The known skew of positional postings is the stop term — a
  * corpus-sized list that a phrase-order chain would use as its SEED,
  * making the first intermediate corpus-sized (the q123/q142 physics).
  * Rarest-first seeding bounds EVERY intermediate by the rarest term's
  * document frequency; the stop list only ever appears as the probe
  * side of a min-df-bounded join. Pinned two ways: the pure ordering
  * function, and the actual join numOutputRows on a synthetic hot-term
  * corpus where the naive order would blow up.
  */
class PhraseIndexSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("chainOrder: ascending df, position tie-break, missing term seeds first") {
    val dfs = Map("the" -> 900L, "zebra" -> 3L, "hash" -> 40L)
    assert(TextAnalysis.chainOrder(dfs, Seq("the", "zebra", "the")) ==
      Seq(("zebra", 1), ("the", 0), ("the", 2)))
    assert(TextAnalysis.chainOrder(dfs, Seq("hash", "the", "zebra")) ==
      Seq(("zebra", 2), ("hash", 0), ("the", 1)))
    // a term absent from the postings (df 0) empties the chain at its
    // cheapest point: it must seed
    assert(TextAnalysis.chainOrder(dfs, Seq("the", "ghost"))
      .head == ("ghost", 1))
    // equal dfs: phrase order is preserved (deterministic plans)
    assert(TextAnalysis.chainOrder(Map.empty, Seq("a", "b", "c")) ==
      Seq(("a", 0), ("b", 1), ("c", 2)))
  }

  test("hot-term phrase probe: every join output bounded by rarest-term df") {
    import spark.implicits._
    // 400 docs of "the the the …" (hot pairs everywhere), 2 docs ending
    // "… the the zebra" — the stop-term worst case for a seed choice
    val hot = (0L until 400L).flatMap(id =>
      (0 to 4).map(p => ("the", id, p.toLong)))
    val rare = Seq(("zebra", 1000L, 5L), ("zebra", 1001L, 5L)) ++
      Seq(1000L, 1001L).flatMap(id => (0 to 4).map(p => ("the", id, p.toLong)))
    val post = (hot ++ rare).toDF("term", "doc_id", "pos")
      .repartition(4, col("term"))
    val dfs = Map("the" -> (hot.size + 10).toLong, "zebra" -> 2L)

    val starts = TextAnalysis.phraseStarts(post, Seq("the", "the", "zebra"), dfs)
    val rows = starts.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(rows.toSeq == Seq((1000L, 3L), (1001L, 3L)))

    // the probe-cost bound: rarest-first keeps EVERY intermediate ≤
    // df(zebra); phrase order would emit ~1600 hot×hot pairs from the
    // first join alone
    val joins = Instrument.joinOutputRows(starts)
    assert(joins.nonEmpty)
    assert(joins.forall(_ <= dfs("zebra")),
      s"join outputs ${joins.mkString(",")} exceed min-df ${dfs("zebra")}")
  }

  test("rarest-first ≡ phrase-order on the real corpus (intersection is order-free)") {
    val post = PhraseIndex.buildOrLoad(spark, d)
    var hits = 0L
    TextAnalysis.SearchPhrases.foreach { ph =>
      val ws = ph.split(' ').toSeq
      val naive = ws.zipWithIndex.map { case (w, i) =>
        post.filter(col("term") === w)
          .select(col("doc_id"), (col("pos") - i.toLong).as("start"))
      }.reduce(_.join(_, Seq("doc_id", "start")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val dfs = post.filter(col("term").isin(ws.distinct: _*))
        .groupBy(col("term")).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val ordered = TextAnalysis.phraseStarts(post, ws, dfs)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(ordered == naive, s"phrase '$ph'")
      hits += ordered.size
    }
    assert(hits > 0)
  }

  test("tiered build: hot-term lists pack to df-bounded rows, union is value-identical") {
    import spark.implicits._
    // 50 docs all containing "the" 6 times (df 50), per-doc-unique
    // filler terms (df 1), "zebra" in 2 docs — with hotDf = 10 only
    // "the" must tier
    val docs = (0L until 50L).map { id =>
      val tail = if (id < 2) " zebra" else s" t$id"
      (id, s"the w$id the x$id the the the the" + tail)
    }.toDF("doc_id", "text")
    val out = java.nio.file.Files.createTempDirectory("graft-tier").toString
    PhraseIndex.buildInto(spark, docs, out, hotDf = 10L)

    val flat = spark.read.parquet(s"$out/postings")
    val packed = spark.read.parquet(s"$out/postings_hot")
    // the packed tier holds EXACTLY the hot terms, one row per (term,
    // doc): 50 rows for "the" — versus the 300 occurrence rows the
    // flat layout would carry
    assert(packed.select("term").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("the"))
    assert(packed.count() == 50L)
    assert(flat.filter(col("term") === "the").count() == 0L)
    assert(flat.filter(col("term") === "zebra").count() == 2L)
    // positions arrays are sorted (the pack is sort_array'd — parquet
    // delta-encodes them; a production build would store deltas)
    assert(packed.select("positions").collect()
      .forall(r => { val xs = r.getSeq[Long](0); xs == xs.sorted }))
    // the union view is value-identical to a direct posexplode
    val got = PhraseIndex.postingsAt(spark, out)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    val exp = docs.select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "term")))
      .collect().map(r => (r.getString(2), r.getLong(0), r.getInt(1).toLong))
      .sorted.toSeq
    assert(got == exp)
  }
}
