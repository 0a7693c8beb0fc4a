package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted positional POSTINGS index over `documents` — the build
  * side of TextAnalysis.phraseSearch (q187), factored into a salted
  * build-once stage (the DedupIndex/IvfIndex pattern: content-addressed
  * dir, `_SUCCESS` memo, build counter for specs).
  *
  * Positional retrieval is the operator BM25 (q114) cannot express:
  * "these words, ADJACENT, in this order". A bag-of-words index throws
  * the positions away at build time; phrase and proximity queries then
  * need a corpus rescan per query. This stage pays the posexplode once
  * per corpus version and persists (term, doc_id, pos) rows CLUSTERED
  * BY TERM — `repartition(term)` puts each term's postings in one file,
  * and the within-partition (term, doc_id, pos) sort gives parquet
  * row-group min/max stats that prune a probe's scan to just the
  * queried terms' row groups (the probe plan shows PushedFilters on
  * `term`). A phrase probe then reads |query terms| posting lists, not
  * the corpus.
  *
  * Shape at 100 TB: postings are ~tokens-count rows, but the probe-side
  * cost is driven by the DF of the queried terms only — the classic
  * inverted-index contract. Term-clustered layout means a hot term's
  * list is contiguous (sequential scan), and the adjacency self-joins
  * key on (doc_id, pos) — hash-partitionable, no broadcast of anything
  * corpus-sized. Stop-term lists are the known skew (same physics as
  * q123's df cap); a production build would tier them (positions
  * delta-packed per doc) — the relational shape here is the same.
  */
object PhraseIndex {
  import TextOps._

  /** Observability for specs: postings builds this JVM has run. */
  @volatile var builds: Int = 0

  private val Version = "0.0.1"

  def dir(spark: SparkSession, d: String): String =
    SaltedIndex.dir(spark, "postings", Version, s"$d/documents.parquet",
      Seq("corpus" -> d, "tok" -> "space"))

  /** (term, doc_id, pos) postings of the corpus — built once, then
    * loaded from the salted dir. pos is 0-based token position. */
  def buildOrLoad(spark: SparkSession, d: String): DataFrame = {
    val p = dir(spark, d)
    SaltedIndex.ensureBuilt(spark, p)(build(spark, d, p))
    spark.read.parquet(s"$p/postings")
  }

  private def build(spark: SparkSession, d: String, p: String): Unit = {
    Tables.documentsDist(spark, d)
      .select(col("doc_id"),
        posexplode(toks(col("text"))).as(Seq("pos", "term")))
      .select(col("term"), col("doc_id"), col("pos").cast("long").as("pos"))
      .repartition(col("term"))
      .sortWithinPartitions(col("term"), col("doc_id"), col("pos"))
      .write.mode("overwrite").parquet(s"$p/postings")
    builds += 1
    SaltedIndex.markSuccess(spark, p)
  }
}
