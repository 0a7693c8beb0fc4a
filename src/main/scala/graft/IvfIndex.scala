package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path

/** Persisted IVF (inverted-file) ANN index — the build side of
  * Similarity.ivfTopK, factored into a salted build-once stage.
  *
  * At 100 TB the index build (a distributed clustering pass + one
  * shuffle to cell-partition the corpus) is a pipeline stage you pay
  * once, not per query: queries only load centroids (tiny, broadcast)
  * and probe the cell-partitioned corpus. This object gives q33 exactly
  * that shape — the index directory is content-addressed by (corpus
  * path, nlist, seed, version) via the same lineage-salt scheme the
  * pb-etl stages use (pipeline.Salt), memoized by a `_SUCCESS` flag, so
  * a second invocation in any session runs ZERO clustering iterations
  * (asserted in DedupSpec via `kmeansFits`).
  *
  * Clustering is the DETERMINISTIC fixed-round integer Lloyd of q136
  * (Similarity.lloyd): first-nlist init, exact integer micro-unit
  * argmin, floor-mean update. That choice is what upgrades q33 from
  * rows-only to fully DuckDB-oracle-checked — the cells, the probe
  * selection, and the candidate scoring are all replayable in SQL,
  * which no seeded MLlib KMeans (k-means||, float accumulation order)
  * can offer. Centroids persist in exact micro-units (array<long>). */
object IvfIndex {

  /** Observability for specs: number of clustering fits this JVM has
    * run (name kept from the MLlim-KMeans era for spec stability). */
  @volatile var kmeansFits: Int = 0

  /** Lloyd assignment rounds (see Similarity.lloyd) — part of the
    * oracle contract: q33's oracle SQL chains exactly this many. */
  val Rounds = 2

  // 0.0.3: dropped the vestigial `seed` cache-key salt — the
  // deterministic first-nlist Lloyd has no randomization knob, and a
  // seed-salted dir would rebuild bit-identical indexes per seed. The
  // version bump relocates any pre-0.0.3 index.
  private val Version = "0.0.3"

  /** Corpus-proportional cell count: nlist = max(16, ⌈n / 125⌉), i.e.
    * a ~125-vector target cell. This is the "nlist ∝ n/targetCellSize"
    * contract the |cell|²-cost consumers (q115 SemDeDup, q172
    * mutual-NN) document: with FIXED nlist their per-cell self-joins
    * grow quadratically in corpus scale (the round-7 ScaleProbe
    * measured q172 at 14.7× wall for 10× data before this) — constant
    * CELL SIZE keeps total pair work linear. At every driver SF
    * (≤ 2000 vectors) this floors to 16, so the DuckDB oracles replay
    * unchanged; the knob only engages beyond them. One count() on the
    * vec table per call — footer-metadata cheap, and the index dir it
    * selects is the persisted salted stage. */
  def scaledNlist(spark: SparkSession, d: String): Int = {
    val n = Tables.embeddings(spark, d).count()
    math.max(16, ((n + 124) / 125).toInt)
  }

  /** Content-addressed index dir (SaltedIndex): corpus file stamps +
    * nlist + version — any change relocates the index. */
  def dir(spark: SparkSession, d: String, nlist: Int): String =
    SaltedIndex.dir(spark, "ivf", Version, s"$d/embeddings.parquet",
      Seq("corpus" -> d, "nlist" -> nlist.toString))

  def complete(spark: SparkSession, p: String): Boolean =
    SaltedIndex.complete(spark, p)

  /** (micro-unit centroids, cell-assigned corpus): built once, then
    * loaded from the salted dir. The corpus is written partitioned by
    * cell id — at scale a probe with a pushed `cell` filter reads
    * nprobe/nlist of the data. */
  def buildOrLoad(spark: SparkSession, d: String, nlist: Int)
      : (Seq[(Int, Array[Long])], DataFrame) = {
    val p = dir(spark, d, nlist)
    SaltedIndex.ensureBuilt(spark, p)(build(spark, d, nlist, p))
    val centroids = spark.read.parquet(s"$p/centroids")
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Long](1).toArray))
      .sortBy(_._1).toSeq
    (centroids, spark.read.parquet(s"$p/corpus"))
  }

  private def build(spark: SparkSession, d: String, nlist: Int,
      p: String): Unit = {
    val e0 = Tables.embeddings(spark, d)
    val (cent, asg) = Similarity.lloyd(e0, nlist, Rounds)
    kmeansFits += 1
    Similarity.withNorm(e0)
      .join(asg.select(col("vec_id"), col("cid").cast("int").as("cell")), "vec_id")
      .select(col("vec_id"), col("v"), col("nn"), col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$p/corpus")
    // (cell, cv): exact micro-unit centroid components in dim order
    cent.groupBy(col("cid").cast("int").as("cell"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, cm))), s -> s.cm)")
        .as("cv"))
      .coalesce(1).write.mode("overwrite").parquet(s"$p/centroids")
    SaltedIndex.markSuccess(spark, p)
  }
}
