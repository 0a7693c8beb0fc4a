package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction — the table-maintenance pass every long-lived
  * 100 TB dataset needs: streaming sinks, incremental ingests, and
  * over-parallel writes leave directories with thousands of KB-sized
  * parquet files, and scan cost becomes dominated by per-file open/
  * footer overhead instead of bytes. Compaction rewrites a directory
  * to approximately `targetBytes`-sized files; with `sortCols` it
  * simultaneously restores a clustered layout (e.g. re-clustering by
  * the Z-order key from [[ZOrder]]) so data-skipping min/max ranges
  * stay tight after the rewrite.
  *
  * Plan shape: without sort a `coalesce` — file-count reduction with
  * NO shuffle (partitions are concatenated executor-locally); with
  * sort a range repartition + in-partition sort, the one shuffle that
  * buys back both layout and file sizing. Row content is never
  * changed — asserted in CompactionSpec.
  */
object Compaction {

  final case class Report(
      filesBefore: Int, filesAfter: Int,
      bytes: Long, targetFiles: Int)

  private def parquetFiles(spark: SparkSession, dir: String): Seq[(String, Long)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (dirs, files) = fs.listStatus(p).toSeq.partition(_.isDirectory)
    // a partitioned layout (key=value subdirs) must be compacted one
    // partition directory at a time — a flat rewrite here would
    // silently discard the partitioning
    require(dirs.forall(_.getPath.getName.startsWith("_")),
      s"$dir contains sub-directories — compact each partition directory instead")
    files
      .filter(s => s.getPath.getName.endsWith(".parquet"))
      .map(s => (s.getPath.toString, s.getLen))
  }

  /** Rewrite `inDir` into `outDir` targeting `targetBytes` per file.
    * Returns the before/after accounting the maintenance scheduler
    * logs (a production run compares `filesBefore/filesAfter` to
    * decide whether the rewrite was worth the IO). */
  /** The file-count reshaping alone (factored out so its plan is
    * testable): range-cluster when sorting, repartition when the
    * target needs MORE partitions than the scan produced (coalesce
    * can only merge), shuffle-free coalesce otherwise. */
  private[graft] def layout(df: org.apache.spark.sql.DataFrame,
      n: Int, sortCols: Seq[Column]): org.apache.spark.sql.DataFrame =
    if (sortCols.nonEmpty)
      df.repartitionByRange(n, sortCols: _*).sortWithinPartitions(sortCols: _*)
    else if (n > df.rdd.getNumPartitions) df.repartition(n)
    else df.coalesce(n)

  def compact(
      spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long, sortCols: Seq[Column] = Nil): Report = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val files = parquetFiles(spark, inDir)
    val bytes = files.map(_._2).sum
    // retention may have emptied the directory (only _SUCCESS left):
    // compaction of nothing is a no-op, not a crash
    if (files.isEmpty) return Report(0, 0, 0L, 0)
    val n = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    layout(spark.read.parquet(inDir), n, sortCols)
      .write.mode("overwrite").parquet(outDir)
    Report(files.size, parquetFiles(spark, outDir).size, bytes, n)
  }
}
