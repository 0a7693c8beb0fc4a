package graft

import graft.functions.{GraftFunctions, PolyHashExpr}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Native PolyHashExpr ≡ the higher-order-function spec, on real data,
  * on generated strings, and through the SQL registration path. */
class FunctionsSpec extends SparkSpec {

  test("native polyhash equals the HOF formulation on the corpus") {
    val d = "/root/testdata/sf0.001"
    val bad = Tables.documents(spark, d)
      .select(TextOps.polyHash(col("text")).as("a"), TextOps.polyHashHof(col("text")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(bad == 0)
  }

  test("property: native hash equals direct fold for arbitrary ASCII strings") {
    val gen = Gen.listOf(Gen.choose(32.toChar, 126.toChar)).map(_.mkString)
    (0 until 200).foreach { i =>
      val s = gen.apply(Gen.Parameters.default, Seed(i.toLong)).getOrElse("")
      val expected = s.foldLeft(0L)((acc, c) => (acc * 131 + c.toInt) % PolyHashExpr.P)
      assert(PolyHashExpr.hash(UTF8String.fromString(s)) == expected, s"for '$s'")
    }
  }

  test("non-ASCII falls back to code points") {
    val s = "héllo 世界"
    val cps = s.codePoints().toArray
    val expected = cps.foldLeft(0L)((acc, c) => (acc * 131 + c) % PolyHashExpr.P)
    assert(PolyHashExpr.hash(UTF8String.fromString(s)) == expected)
  }

  test("native vector/hash kernels equal their HOF twins on the corpus") {
    val d = "/root/testdata/sf0.001"
    import graft.functions.GraftFunctions._
    // dot product on embeddings
    val e = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    assert(e.select(dot(col("v"), col("v")).as("a"), Similarity.dotHof(col("v"), col("v")).as("b"))
      .filter(col("a") =!= col("b")).count() == 0)
    // shingle hash sets + minhashes on documents
    val t = TextOps.toks(col("text"))
    val both = Tables.documents(spark, d).select(
      TextOps.shingleHashSet(col("text"), 3).as("na"),
      TextOps.shingleHashSetHof(col("text"), 3).as("ha"))
    assert(both.filter(col("na") =!= col("ha")).count() == 0)
    assert(both.select(TextOps.minhashes(col("na"), 16).as("nm"),
        TextOps.minhashesHof(col("ha"), 16).as("hm"))
      .filter(col("nm") =!= col("hm")).count() == 0)
    // simhash bit-vote vs independent scala computation
    val th = transform(t, x => TextOps.polyHash(x))
    val sigs = Tables.documents(spark, d)
      .select(col("text"), bitvote32(th).as("sig")).collect()
    sigs.take(50).foreach { r =>
      val hashes = r.getString(0).split(" ").map(s =>
        s.foldLeft(0L)((acc, c) => (acc * 131 + c.toInt) % PolyHashExpr.P))
      val expected = (0 until 32).map { b =>
        val v = hashes.map(h => if (((h >> b) & 1L) == 1L) 1 else -1).sum
        if (v > 0) 1L << b else 0L
      }.sum
      assert(r.getLong(1) == expected)
    }
  }

  test("SQL registration: graft_polyhash callable from spark.sql") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT graft_polyhash('ab') h").head().getLong(0)
    assert(r == 97L * 131 + 98) // matches DuckDB list_reduce oracle value
  }

  test("SQL registration: the whole kernel family is SQL-callable") {
    GraftFunctions.register(spark)
    val r = spark.sql("""
      SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
             graft_bitvote32(array(3L)) AS bv,
             graft_minhashes(array(10L, 3L), 2) AS mh,
             graft_shinglehashes(array('ab', 'c', 'ab'), 2) AS sh
    """).head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getLong(1) == 3L) // single hash: its set bits win the vote
    // mh_j = min((2j+1)h + 12345 + 7919j) mod P over {10, 3}
    assert(r.getSeq[Long](2) == Seq(
      Seq(10L, 3L).map(h => (h + 12345L) % PolyHashExpr.P).min,
      Seq(10L, 3L).map(h => (3 * h + 12345L + 7919L) % PolyHashExpr.P).min))
    // 2-gram shingles of [ab, c, ab]: "ab c", "c ab" — distinct, in order
    def ph(s: String) = s.foldLeft(0L)((a, c) => (a * 131 + c.toInt) % PolyHashExpr.P)
    assert(r.getSeq[Long](3) == Seq(ph("ab c"), ph("c ab")))
    // non-constant k is rejected, not silently mis-planned
    val err = intercept[Exception](
      spark.sql("SELECT graft_minhashes(array(1L), CAST(rand() * 4 AS INT))").head())
    assert(err.getMessage.toLowerCase.contains("constant"))
  }

  test("SQL registration: the custom AGGREGATES are SQL-callable too") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq((1L, 5.0, 10L), (1L, 9.0, 11L), (1L, 9.0, 7L), (2L, 1.0, 20L))
      .toDF("g", "score", "id").createOrReplaceTempView("agg_in")
    // graft_topk: top-2 by score desc, id asc on ties
    val tk = spark.sql(
      "SELECT g, graft_topk(score, id, 2) t FROM agg_in GROUP BY g ORDER BY g")
      .collect().map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getDouble(0), x.getLong(1))))
    assert(tk.toSeq == Seq(1L -> Seq((9.0, 7L), (9.0, 11L)), 2L -> Seq((1.0, 20L))))
    // graft_cms + graft_cms_estimate round-trip: exact at this scale
    val est = spark.sql("""
      WITH sk AS (SELECT graft_cms(g, 64, 4) s FROM agg_in)
      SELECT graft_cms_estimate(s, 1L, 64, 4) e1,
             graft_cms_estimate(s, 2L, 64, 4) e2 FROM sk""").head()
    assert(est.getLong(0) == 3L && est.getLong(1) == 1L)
  }

  test("SQL graft_bloom/graft_might_contain: scalar-subquery probe is membership-correct") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq(1L, 2L, 3L).toDF("h").createOrReplaceTempView("bloom_in")
    Seq(1L, 2L, 4L, 9L).toDF("x").createOrReplaceTempView("bloom_probe")
    val out = spark.sql("""
      SELECT x, graft_might_contain(
        (SELECT graft_bloom(h, 100L, 8000L) FROM bloom_in), x) AS m
      FROM bloom_probe ORDER BY x""")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // members always hit (no false negatives)
    assert(out(1L) && out(2L))
    // at 8000 bits over 3 items the FP probability is ~1e-10: assert
    // the non-members miss
    assert(!out(4L) && !out(9L))
  }

  test("works inside higher-order lambdas (shingle hashing path)") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT transform(array('ab','c'), s -> graft_polyhash(s)) h").head().getSeq[Long](0)
    assert(r == Seq(97L * 131 + 98, 99L))
  }

  test("generator graft_shingle_stream: positional rows ≡ the array twin, SQL ≡ Column") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 50)
    // in-Spark twin built from existing pieces: slice the token array
    // per position and polyhash the joined window
    val t = split(col("text"), " ")
    val twin = docs
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(0), size(t) - 3),
          i => GraftFunctions.polyhash(concat_ws(" ", slice(t, i + 1, lit(3)))))))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("col").as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaColumn = docs
      .select(col("doc_id"),
        GraftFunctions.shingleStream(col("text"), 3).as(Seq("pos", "h")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaColumn == twin && viaColumn.nonEmpty)
    // the SQL registration path plans the same Generate
    GraftFunctions.register(spark)
    docs.createOrReplaceTempView("fs_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, graft_shingle_stream(text, 3) FROM fs_docs")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaSql == twin)
    // docs shorter than the window emit nothing, not an error
    import spark.implicits._
    assert(Seq("a b").toDF("text")
      .select(GraftFunctions.shingleStream(col("text"), 3).as(Seq("pos", "h")))
      .count() == 0L)
  }
}
