package graft.sources

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSource V2 connector: a deterministic synthetic `documents`
  * corpus generated in the executors — no files, no driver data. The
  * "custom connector" rung of the extension ladder (TableProvider →
  * Table → ScanBuilder → Batch → PartitionReader), with two production
  * behaviors implemented for real:
  *
  *  - COLUMN PRUNING pushdown (`SupportsPushDownRequiredColumns`): a
  *    projection reaches the reader, which then generates only the
  *    requested columns — observable in the BatchScan's ReadSchema and
  *    via `SynthDocs.lastReadSchema` (spec hook).
  *  - PARTITION PLANNING: `numPartitions` input splits, each an
  *    independent id range read in parallel — the connector contract
  *    that makes a source scale to a 1000-executor cluster.
  *
  * Rows are a seeded-LCG word salad keyed ONLY by (doc_id, seed), so
  * any split layout generates identical content — re-partitioning the
  * source never changes the corpus (the same content-determinism the
  * curation operators rely on). Usage:
  *
  * {{{
  * spark.read.format("graft.sources.SynthDocs")
  *   .option("n", "100000").option("seed", "7")
  *   .option("numPartitions", "32").load()
  * }}}
  */
class SynthDocs extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthDocs.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SynthDocsTable
}

object SynthDocs {
  val Schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))

  /** Observability for specs: the read schema the LAST scan planned
    * (proves projections reach the reader). */
  @volatile var lastReadSchema: StructType = Schema

  /** Observability for specs: the aggregates the LAST scan pushed
    * (empty = no pushdown), and a generation counter proving a pushed
    * aggregate touches ZERO corpus rows. */
  @volatile var lastPushedAggs: Seq[String] = Nil
  val rowsGenerated = new java.util.concurrent.atomic.LongAdder

  private val Langs = Array("en", "de", "es", "fr", "zh")
  private val Words = Array("the", "data", "join", "hash", "vector", "spark",
    "query", "plan", "scan", "merge", "of", "and", "a", "stream", "batch",
    "state", "index", "shuffle", "column", "row")

  /** Deterministic row content from (docId, seed) only. Pruning is
    * honored in the GENERATION too, not just the projection: the text
    * loop (the expensive part) runs only when `text`/`n_chars` is
    * requested. Safe because the words are the LAST consumers of the
    * LCG stream — skipping them cannot shift any earlier column's
    * draw, so a pruned read stays bit-consistent with a full one. */
  def genRow(docId: Long, seed: Long, cols: Seq[String]): Seq[Any] = {
    rowsGenerated.increment()
    var x = docId * 6364136223846793005L + seed * 1442695040888963407L + 1L
    def next(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; x }
    def pick(n: Int): Int = (math.floorMod(next(), n.toLong)).toInt
    val lang = Langs(pick(Langs.length))
    val source = s"src${pick(20)}"
    val nTok = 20 + pick(80)
    val text = if (cols.contains("text") || cols.contains("n_chars")) {
      val sb = new StringBuilder
      var i = 0
      while (i < nTok) {
        if (i > 0) sb.append(' ')
        sb.append(Words(pick(Words.length)))
        i += 1
      }
      sb.toString
    } else null
    cols.map {
      case "doc_id" => docId
      case "lang" => UTF8String.fromString(lang)
      case "source" => UTF8String.fromString(source)
      case "text" => UTF8String.fromString(text)
      case "n_chars" => text.length.toLong
    }
  }
}

// read options arrive at newScanBuilder, not the table — the table
// itself carries no state
private class SynthDocsTable extends Table with SupportsRead {
  override def name(): String = "graft_synth_docs"
  override def schema(): StructType = SynthDocs.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder = {
    val parts = o.getInt("numPartitions", 4)
    require(parts > 0, s"numPartitions must be positive, got $parts")
    val n = o.getLong("n", 1000L)
    require(n >= 0, s"n must be non-negative, got $n")
    // rowsPerBatch <= 0 would make the micro-batch stream's
    // latestOffset never advance — an infinite no-progress hang
    // instead of an error
    val rpb = o.getLong("rowsPerBatch", 100L)
    require(rpb > 0, s"rowsPerBatch must be positive, got $rpb")
    new SynthScanBuilder(n, o.getLong("seed", 42L), parts, rpb)
  }
}

/** The per-partition partial an accepted aggregate pushdown answers
  * STRUCTURALLY from the id range — no row generation at all. */
private sealed trait SynthAgg {
  def name: String
  def eval(start: Long, end: Long): Any // partial over [start, end)
}
private case object AggCountStar extends SynthAgg {
  def name = "COUNT(*)"; def eval(s: Long, e: Long): Any = e - s
}
private case object AggMinId extends SynthAgg {
  def name = "MIN(doc_id)"; def eval(s: Long, e: Long): Any = s
}
private case object AggMaxId extends SynthAgg {
  def name = "MAX(doc_id)"; def eval(s: Long, e: Long): Any = e - 1
}

private class SynthScanBuilder(n: Long, seed: Long, numParts: Int,
    rowsPerBatch: Long) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates
    with SupportsPushDownFilters {
  import org.apache.spark.sql.connector.expressions.NamedReference
  import org.apache.spark.sql.connector.expressions.aggregate._
  import org.apache.spark.sql.sources._

  private var required: StructType = SynthDocs.Schema
  private var pushed: Option[Seq[SynthAgg]] = None
  private var lo = 0L // narrowed id range [lo, hi) — FILTER pushdown
  private var hi = n
  private var accepted: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** doc_id range predicates narrow the GENERATED id range exactly —
    * ids are dense in [0, n), so [lo, hi) clamping IS the predicate;
    * accepted filters are fully handled (no post-scan re-evaluation),
    * which also lets a filtered aggregate keep its pushdown. Anything
    * over other columns stays residual for Spark to apply. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def long(v: Any): Option[Long] = v match {
      case l: Long => Some(l)
      case i: Int => Some(i.toLong)
      case _ => None
    }
    val (ours, residual) = filters.partition {
      case EqualTo("doc_id", v) => long(v).isDefined
      case GreaterThan("doc_id", v) => long(v).isDefined
      case GreaterThanOrEqual("doc_id", v) => long(v).isDefined
      case LessThan("doc_id", v) => long(v).isDefined
      case LessThanOrEqual("doc_id", v) => long(v).isDefined
      case _ => false
    }
    // saturating successor: v+1 on Long.MaxValue must not wrap to
    // MinValue (a wrapped lo un-narrows the range while the accepted
    // filter is never re-applied — silently wrong rows)
    def inc(v: Long): Long = if (v == Long.MaxValue) v else v + 1
    ours.foreach {
      case EqualTo(_, v) =>
        lo = math.max(lo, long(v).get); hi = math.min(hi, inc(long(v).get))
      case GreaterThan(_, v) => lo = math.max(lo, inc(long(v).get))
      case GreaterThanOrEqual(_, v) => lo = math.max(lo, long(v).get)
      case LessThan(_, v) => hi = math.min(hi, long(v).get)
      case LessThanOrEqual(_, v) => hi = math.min(hi, inc(long(v).get))
      case _ => ()
    }
    accepted = ours
    residual
  }
  override def pushedFilters(): Array[Filter] = accepted

  /** PARTIAL pushdown (Spark still plans its merge aggregate over the
    * per-split partials): ungrouped COUNT(*) / MIN(doc_id) /
    * MAX(doc_id) are pure id-range arithmetic, so an accepted query
    * generates ZERO rows — pushdown saves the corpus generation
    * itself, the DSv2 analog of a parquet footer's rowCount/min/max
    * statistics. Anything else (group-bys, aggregates over generated
    * columns) declines, and Spark falls back to the full scan. */
  override def pushAggregation(agg: Aggregation): Boolean = {
    if (agg.groupByExpressions.nonEmpty) return false
    def idCol(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
      e match {
        case nr: NamedReference => nr.fieldNames.toSeq == Seq("doc_id")
        case _ => false
      }
    val specs = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => Some(AggCountStar)
      case m: Min if idCol(m.column) => Some(AggMinId)
      case m: Max if idCol(m.column) => Some(AggMaxId)
      case _ => None
    }
    if (specs.isEmpty || specs.exists(_.isEmpty)) false
    else { pushed = Some(specs.flatten); true }
  }

  override def build(): Scan = {
    val (l, h) = (lo, math.max(lo, hi)) // empty range when contradictory
    pushed match {
      case Some(aggs) =>
        SynthDocs.lastPushedAggs = aggs.map(_.name)
        new SynthAggScan(l, h, numParts, aggs)
      case None =>
        SynthDocs.lastPushedAggs = Nil
        SynthDocs.lastReadSchema = required
        new SynthScan(l, h, seed, numParts, rowsPerBatch, required)
    }
  }
}

/** Pushed-aggregate scan: one partial row per input split, computed
  * from the split bounds alone (`genRow` never runs). MIN/MAX are
  * exact because ids are dense in the (possibly filter-narrowed)
  * [lo, hi) range. */
private class SynthAggScan(lo: Long, hi: Long, numParts: Int, aggs: Seq[SynthAgg])
    extends Scan with Batch {
  override def readSchema(): StructType =
    StructType(aggs.map(a => StructField(a.name, LongType, nullable = false)))
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    SynthReaders.split(lo, hi, numParts)
  override def createReaderFactory(): PartitionReaderFactory =
    new SynthAggReaderFactory(aggs)
}

/** Standalone so the task closure ships only the (serializable) agg
  * specs, never the Scan. */
private class SynthAggReaderFactory(aggs: Seq[SynthAgg])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val r = p.asInstanceOf[SynthRange]
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val go = !emitted; emitted = true; go }
      override def get(): InternalRow =
        InternalRow.fromSeq(aggs.map(_.eval(r.start, r.end)))
      override def close(): Unit = ()
    }
  }
}

private case class SynthRange(start: Long, end: Long) extends InputPartition

private object SynthReaders {
  def factory(seed: Long, cols: Seq[String]): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val r = p.asInstanceOf[SynthRange]
        new PartitionReader[InternalRow] {
          private var id = r.start - 1
          override def next(): Boolean = { id += 1; id < r.end }
          override def get(): InternalRow =
            InternalRow.fromSeq(SynthDocs.genRow(id, seed, cols))
          override def close(): Unit = ()
        }
      }
    }

  def split(start: Long, end: Long, numParts: Int): Array[InputPartition] = {
    val n = end - start
    val per = math.max(1L, (n + numParts - 1) / numParts)
    (start until end by per)
      .map(s => SynthRange(s, math.min(end, s + per)): InputPartition).toArray
  }
}

/** Micro-batch offsets are plain row counts: the corpus is an append-
  * only id range, so "offset" = next doc_id to emit. */
private case class SynthOffset(v: Long) extends Offset {
  override def json(): String = v.toString
}

private class SynthScan(lo: Long, hi: Long, seed: Long, numParts: Int,
    rowsPerBatch: Long, schema: StructType) extends Scan with Batch
    with SupportsReportStatistics {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    SynthReaders.split(lo, hi, numParts)

  /** Exact statistics to the optimizer (`SupportsReportStatistics`):
    * the row count IS the (filter-narrowed) id range, and bytes are a
    * per-row estimate over the pruned read schema — so Catalyst can
    * pick a broadcast join for a small or tightly-filtered synthetic
    * dim without any ANALYZE pass. Estimates honor BOTH pushdowns:
    * filters shrink rowCount, pruning shrinks bytes-per-row. */
  override def estimateStatistics(): Statistics = new Statistics {
    private val rows = math.max(0L, hi - lo)
    // avg word ~6 chars ×70 tokens when text rides along; small
    // fixed-width columns otherwise
    private val perRow: Long =
      schema.fieldNames.map {
        case "text" => 480L
        case "lang" | "source" => 8L
        case _ => 8L
      }.sum.max(1L)
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(
        if (rows > Long.MaxValue / perRow) Long.MaxValue else rows * perRow)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    SynthReaders.factory(seed, schema.fieldNames.toSeq)

  /** Streaming read: the same deterministic corpus arriving
    * `rowsPerBatch` ids per trigger — offsets are id watermarks,
    * restart-safe by construction (content is a pure function of
    * (doc_id, seed), so re-planning a committed range regenerates
    * byte-identical rows — the connector-side half of exactly-once). */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new MicroBatchStream
        with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
      import org.apache.spark.sql.connector.read.streaming.ReadLimit
      private var known = 0L
      private var drainAll = false
      override def prepareForTriggerAvailableNow(): Unit = drainAll = true
      override def initialOffset(): Offset = SynthOffset(lo)
      // SupportsAdmissionControl routes through the two-arg form; the
      // legacy no-arg variant must not be reachable
      override def latestOffset(): Offset =
        throw new UnsupportedOperationException("latestOffset(start, limit)")
      override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
        // advance from the CHECKPOINTED start, not this instance's
        // counter — on restart a fresh stream object sees start > 0
        // and must never report an end below it
        known = math.max(known, start.asInstanceOf[SynthOffset].v)
        // Trigger.AvailableNow drains the whole corpus; a normal
        // trigger releases rowsPerBatch ids per micro-batch
        known = if (drainAll) hi else math.min(hi, known + rowsPerBatch)
        SynthOffset(known)
      }
      override def reportLatestOffset(): Offset = SynthOffset(known)
      override def deserializeOffset(json: String): Offset =
        SynthOffset(json.toLong)
      override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
        SynthReaders.split(start.asInstanceOf[SynthOffset].v,
          end.asInstanceOf[SynthOffset].v, numParts)
      override def createReaderFactory(): PartitionReaderFactory =
        SynthReaders.factory(seed, schema.fieldNames.toSeq)
      override def commit(end: Offset): Unit = ()
      override def stop(): Unit = ()
    }
}
