package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path

/** Persisted product-quantization (PQ) index — the build side of
  * Similarity.pqTopK (q83), the memory-compression ANN path.
  *
  * The 64-dim vector splits into `m`=8 subvectors of 8 dims; each
  * subspace gets its own `ksub`=16-centroid KMeans codebook; a vector
  * is encoded as 8 small codes. At 100 TB that is the difference
  * between a scan of raw vectors (256 B/vector at float32) and a scan
  * of 8-byte codes (32×) with the codebooks (8·16·8 doubles, ~8 KB)
  * broadcast everywhere — the corpus bytes the ADC pass reads shrink by
  * the same factor the int8 path (q48) shrinks them by 4.
  *
  * Like IvfIndex, the build (8 seeded KMeans fits + one encode pass) is
  * a content-addressed salted stage paid once: the directory key covers
  * the corpus file stamps, (m, ksub, seed), and the index version, and
  * a `_SUCCESS` flag memoizes completion — a second invocation in any
  * session runs ZERO KMeans iterations (spec: `kmeansFits`).
  *
  * The codes table here also carries the raw vector and its norm so the
  * exact re-rank needs no second corpus join at this test scale; a
  * production layout keeps codes and raw vectors in separate tables and
  * fetches raw vectors for re-rank candidates only.
  */
object PqIndex {

  /** Observability for specs: number of KMeans fits this JVM has run. */
  @volatile var kmeansFits: Int = 0

  private val Version = "0.0.1"

  val M = 8     // subspaces
  val DSub = 8  // dims per subspace (M * DSub = 64)
  val KSub = 16 // centroids per subspace

  /** Content-addressed index dir (SaltedIndex): corpus file stamps +
    * (m, ksub, seed) + version — any change relocates the index. */
  def dir(spark: SparkSession, d: String, seed: Long): String =
    SaltedIndex.dir(spark, "pq", Version, s"$d/embeddings.parquet",
      Seq("corpus" -> d, "m" -> M.toString,
        "ksub" -> KSub.toString, "seed" -> seed.toString))

  def complete(spark: SparkSession, p: String): Boolean =
    SaltedIndex.complete(spark, p)

  /** (codebooks as (subspace, code, centroid), encoded corpus).
    * Codebooks are tiny (M·KSub rows) — always broadcast. */
  def buildOrLoad(spark: SparkSession, d: String, seed: Long)
      : (Seq[(Int, Int, Array[Double])], DataFrame) = {
    val p = dir(spark, d, seed)
    SaltedIndex.ensureBuilt(spark, p)(build(spark, d, seed, p))
    val books = spark.read.parquet(s"$p/codebooks")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
      .sortBy(t => (t._1, t._2)).toSeq
    (books, spark.read.parquet(s"$p/codes"))
  }

  private def build(spark: SparkSession, d: String, seed: Long, p: String): Unit = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    var e = Similarity.withNorm(Tables.embeddings(spark, d))
    for (s <- 0 until M)
      e = e.withColumn(s"fv$s",
        array_to_vector(slice(col("v"), s * DSub + 1, DSub)))
    e.cache()
    val fitted = (0 until M).map { s =>
      val km = new KMeans().setK(KSub).setSeed(seed + s)
        .setFeaturesCol(s"fv$s").setPredictionCol(s"code$s")
        .fit(e)
      kmeansFits += 1
      km
    }
    val encoded = fitted.zipWithIndex
      .foldLeft(e.toDF()) { case (df, (km, _)) => km.transform(df) }
      .select(col("vec_id"), col("v"), col("nn"),
        array((0 until M).map(s => col(s"code$s")): _*).as("codes"))
    encoded.write.mode("overwrite").parquet(s"$p/codes")
    val books = for {
      (km, s) <- fitted.zipWithIndex
      (c, i) <- km.clusterCenters.zipWithIndex
    } yield (s, i, c.toArray)
    spark.createDataFrame(books.toSeq).toDF("s", "c", "cv")
      .coalesce(1).write.mode("overwrite").parquet(s"$p/codebooks")
    e.unpersist()
    SaltedIndex.markSuccess(spark, p)
  }
}
