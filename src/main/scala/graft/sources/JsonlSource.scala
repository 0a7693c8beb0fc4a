package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** JSONL (one JSON object per line) source/sink for the `documents`
  * corpus shape — the interchange format LLM training corpora actually
  * arrive in (Common Crawl derivatives, dataset dumps).
  *
  * Scale rules baked in: the schema is DECLARED, never inferred — at
  * 100 TB schema inference is a full extra pass over the corpus before
  * the first real scan; splittable compression keeps per-file
  * parallelism; malformed lines are dropped at the reader (a corpus
  * crawl always contains some) rather than failing the job or
  * poisoning downstream columns with nulls.
  */
object JsonlSource {

  // file sources surface every field nullable (a missing JSON key is
  // always representable), so the declared schema says so too
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("lang", StringType, nullable = true),
    StructField("source", StringType, nullable = true),
    StructField("n_chars", LongType, nullable = true)))

  /** Write a documents relation as gzip JSONL (gzip is fine for WRITE
    * sizing — each output file is one task; for re-READ parallelism a
    * production corpus uses many files, which `partitions` controls). */
  def writeDocuments(df: DataFrame, path: String, partitions: Int = 0): Unit = {
    val out = if (partitions > 0) df.repartition(partitions) else df
    out.write.mode("overwrite").option("compression", "gzip").json(path)
  }

  /** Read JSONL documents with the declared schema, dropping malformed
    * lines. */
  def readDocuments(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(documentsSchema)
      .option("mode", "DROPMALFORMED")
      .json(path)
}
