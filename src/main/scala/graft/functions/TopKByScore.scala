package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Exact top-k (score, id) pairs per group as a TypedImperativeAggregate.
  *
  * The window formulation (`row_number over (partition by g order by
  * score desc)` then `filter rank <= k`) sorts EVERY candidate of a
  * group; this aggregate keeps a bounded k-element heap per group with
  * map-side partial aggregation — at 100 TB the difference between
  * shuffling all scored candidates and shuffling k rows per group per
  * partition. Deterministic order: higher score first, ties broken by
  * lower id (matching the q26 oracle's `ORDER BY c DESC, neighbor_id`).
  *
  * Output: array<struct<score:double, id:bigint>> best-first.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKByScore.Heap] {

  import TopKByScore.Heap

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType), StructField("id", LongType))),
    containsNull = false)
  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): Heap = new Heap(k)

  override def update(buf: Heap, input: InternalRow): Heap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(b1: Heap, b2: Heap): Heap = { b1.absorb(b2); b1 }

  override def eval(buf: Heap): Any = {
    val sorted = buf.toSortedPairs // best-first
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    })
  }

  override def serialize(buf: Heap): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val pairs = buf.toSortedPairs
    out.writeInt(pairs.length)
    pairs.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Heap = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val h = new Heap(k)
    var i = 0
    while (i < n) { h.offer(in.readDouble(), in.readLong()); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKByScore =
    copy(score = c(0), id = c(1))
}

object TopKByScore {
  /** Bounded worst-out heap: keeps the k best (score desc, id asc). */
  final class Heap(k: Int) {
    // "worst is max" ordering so the PriorityQueue head is the evictee
    private val ord: Ordering[(Double, Long)] = Ordering.fromLessThan { (a, b) =>
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    }
    private val pq = scala.collection.mutable.PriorityQueue.empty[(Double, Long)](ord)

    def offer(s: Double, i: Long): Unit = {
      if (pq.size < k) pq.enqueue((s, i))
      else if (ord.lt((s, i), pq.head)) { pq.dequeue(); pq.enqueue((s, i)) }
    }
    def absorb(other: Heap): Unit = other.pq.foreach(p => offer(p._1, p._2))
    def toSortedPairs: Array[(Double, Long)] =
      pq.toArray.sortBy(p => (-p._1, p._2))
  }

  def topk(score: Column, id: Column, k: Int): Column =
    GraftShim.column(
      TopKByScore(GraftShim.expression(score), GraftShim.expression(id), k)
        .toAggregateExpression())
}
