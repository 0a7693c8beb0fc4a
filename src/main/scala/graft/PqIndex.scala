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

  /** Observability for specs: number of clustering fits this JVM has
    * run (name kept from the MLlib-KMeans era for spec stability). */
  @volatile var kmeansFits: Int = 0

  // 0.0.3: dropped the vestigial `seed` cache-key salt (deterministic
  // first-KSub Lloyd has no randomization knob); the bump relocates
  // any pre-0.0.3 index.
  private val Version = "0.0.3"

  val M = 8      // subspaces
  val DSub = 8   // dims per subspace (M * DSub = 64)
  val KSub = 16  // centroids per subspace
  val Rounds = 2 // Lloyd assignment rounds (oracle contract, as IvfIndex)

  /** Content-addressed index dir (SaltedIndex): corpus file stamps +
    * (m, ksub) + version — any change relocates the index. */
  def dir(spark: SparkSession, d: String): String =
    SaltedIndex.dir(spark, "pq", Version, s"$d/embeddings.parquet",
      Seq("corpus" -> d, "m" -> M.toString, "ksub" -> KSub.toString))

  def complete(spark: SparkSession, p: String): Boolean =
    SaltedIndex.complete(spark, p)

  /** (codebooks as (subspace, code, micro-unit centroid), encoded
    * corpus). Codebooks are tiny (M·KSub rows) — always broadcast. */
  def buildOrLoad(spark: SparkSession, d: String)
      : (Seq[(Int, Int, Array[Long])], DataFrame) = {
    val p = dir(spark, d)
    SaltedIndex.ensureBuilt(spark, p)(build(spark, d, p))
    val books = spark.read.parquet(s"$p/codebooks")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Long](2).toArray))
      .sortBy(t => (t._1, t._2)).toSeq
    (books, spark.read.parquet(s"$p/codes"))
  }

  /** Per-subspace fixed-round integer Lloyd — the q136 recurrence with
    * `sub = pos div DSub` folded into every key, so all M codebooks
    * learn in ONE set of jobs (not M sequential fits). Same
    * determinism argument as IvfIndex: first-KSub init, exact integer
    * micro-unit argmin, floor-mean update — which is what upgrades
    * q83 from rows-only to fully oracle-checked. */
  private def build(spark: SparkSession, d: String, p: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(spark, d)
    // persisted for the whole (eager) build: every Lloyd round and the
    // final encode re-consume the exploded component relation — without
    // the cache each round would re-run the full posexplode chain
    val q = emb
      .select(col("vec_id"), posexplode(col("embedding").cast("array<double>")))
      .select(col("vec_id"), expr(s"cast(pos as bigint) div $DSub").as("sub"),
        col("pos").cast("long").as("pos"),
        floor(col("col") * lit(1000000.0d)).cast("long").as("vm"))
      .persist()
    // first-KSub seeds numbered 0..KSub-1 via a bounded collect (the
    // IVF-centroid idiom) — a no-partition row_number window would
    // plan the banned single-partition sort
    val seedIds = emb.select(col("vec_id")).orderBy(col("vec_id")).limit(KSub)
      .collect().map(_.getLong(0))
    val seeds = spark.createDataFrame(
        seedIds.zipWithIndex.toIndexedSeq.map { case (v, i) => (v, i.toLong) })
      .toDF("vec_id", "cid")
    var cent = q.join(broadcast(seeds), "vec_id")
      .select(col("sub"), col("cid"), col("pos"), col("vm").as("cm"))
    def assign(c: DataFrame): DataFrame = {
      val d2 = q.join(broadcast(c), Seq("sub", "pos"))
        .groupBy(col("vec_id"), col("sub"), col("cid"))
        .agg(sum((col("vm") - col("cm")) * (col("vm") - col("cm"))).as("d2"))
      d2.withColumn("rn", row_number().over(
          Window.partitionBy(col("vec_id"), col("sub")).orderBy(col("d2"), col("cid"))))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("sub"), col("cid"))
    }
    var asg = assign(cent)
    for (_ <- 2 to Rounds) {
      cent = q.join(asg, Seq("vec_id", "sub"))
        .groupBy(col("sub"), col("cid"), col("pos"))
        .agg(floor(sum(col("vm")) / count(lit(1))).cast("long").as("cm"))
      asg = assign(cent)
    }
    kmeansFits += 1
    val codes = asg
      .groupBy(col("vec_id"))
      .agg(expr("transform(array_sort(collect_list(struct(sub, cid))), s -> cast(s.cid as int))")
        .as("codes"))
    Similarity.withNorm(emb).join(codes, "vec_id")
      .select(col("vec_id"), col("v"), col("nn"), col("codes"))
      .write.mode("overwrite").parquet(s"$p/codes")
    // (s, c, cv): exact micro-unit centroid components in dim order
    cent.groupBy(col("sub").cast("int").as("s"), col("cid").cast("int").as("c"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, cm))), x -> x.cm)")
        .as("cv"))
      .coalesce(1).write.mode("overwrite").parquet(s"$p/codebooks")
    q.unpersist()
    SaltedIndex.markSuccess(spark, p)
  }
}
