package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, GenericInternalRow, Literal, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: `top_k(ord, payload, k)` keeps the k
  * rows with the LARGEST `ord` per group and returns them as
  * `array<struct<ord double, payload ...>>` sorted descending.
  *
  * This is the scale-correct form of "top N per key". The window
  * encoding (`row_number() OVER (PARTITION BY key ORDER BY ord DESC)
  * <= k`, q11) must shuffle and sort EVERY row; `collect_list` +
  * `slice` must materialize every group in memory before truncating.
  * This aggregate holds a k-sized heap per group, participates in
  * map-side partial aggregation (the shuffle carries at most k rows
  * per group per map task, independent of group size), and merges
  * heaps on the reduce side — a hot key costs k·tasks rows in
  * flight, never the group's full population.
  *
  * Output is DETERMINISTIC under any partitioning: ties on `ord` are
  * broken by the serialized row bytes (an arbitrary but total and
  * partition-independent order), so repeated runs and AQE re-plans
  * return identical arrays. NaN orders above all values
  * (`java.lang.Double.compare` semantics); null `ord` rows are
  * skipped.
  */
case class TopKAgg(
    ord: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Heap] with BinaryLike[Expression] {

  require(k > 0, s"top_k needs k > 0, got $k")

  override def left: Expression = ord
  override def right: Expression = payload

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (ord.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"top_k ordinal must be DOUBLE (cast it), got ${ord.dataType.sql}")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("ord", DoubleType, nullable = false),
    StructField("payload", payload.dataType, payload.nullable))),
    containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "top_k"

  @transient private lazy val proj =
    UnsafeProjection.create(Array[DataType](DoubleType, payload.dataType))
  @transient private lazy val inputRow = new GenericInternalRow(2)

  override def createAggregationBuffer(): TopKAgg.Heap = new TopKAgg.Heap(k)

  override def update(buffer: TopKAgg.Heap, input: InternalRow): TopKAgg.Heap = {
    val o = ord.eval(input)
    // cheap pre-check on the dominant reject path: once the heap is
    // warm, most rows lose on ord alone — skip the projection/copy
    // allocation for them. Ties still project (the byte tie-break
    // needs the row).
    if (o != null && buffer.mightAccept(o.asInstanceOf[Double])) {
      inputRow.update(0, o)
      inputRow.update(1, payload.eval(input))
      buffer.offer(proj(inputRow).copy())
    }
    buffer
  }

  override def merge(buffer: TopKAgg.Heap, other: TopKAgg.Heap): TopKAgg.Heap = {
    other.rows.foreach(buffer.offer)
    buffer
  }

  override def eval(buffer: TopKAgg.Heap): Any =
    // an UnsafeRow over (double, payloadType) IS a valid struct value
    new GenericArrayData(buffer.sortedDesc.toArray[Any])

  override def serialize(buffer: TopKAgg.Heap): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.rows.foreach { r =>
      val b = r.getBytes
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Heap = {
    val in = ByteBuffer.wrap(bytes)
    val heap = new TopKAgg.Heap(k)
    var n = in.getInt
    while (n > 0) {
      val len = in.getInt
      val b = new Array[Byte](len)
      in.get(b)
      val row = new UnsafeRow(2)
      row.pointTo(b, len)
      heap.offer(row)
      n -= 1
    }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKAgg =
    copy(ord = newLeft, payload = newRight)
}

object TopKAgg {

  /** Total, partition-independent order: ord first, serialized row
    * bytes as the tie-break (arbitrary but deterministic). */
  private val byOrdAsc: Ordering[UnsafeRow] = (a: UnsafeRow, b: UnsafeRow) => {
    val c = java.lang.Double.compare(a.getDouble(0), b.getDouble(0))
    if (c != 0) c else compareBytes(a.getBytes, b.getBytes)
  }

  private def compareBytes(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    a.length - b.length
  }

  /** k-bounded min-heap: the head is the WORST retained row, evicted
    * whenever a better one arrives and the heap is full. */
  final class Heap(val k: Int) {
    // PriorityQueue dequeues its ordering's maximum; reversing makes
    // the head the minimum under byOrdAsc
    private val pq = mutable.PriorityQueue.empty[UnsafeRow](byOrdAsc.reverse)

    def offer(row: UnsafeRow): Unit =
      if (pq.size < k) pq.enqueue(row)
      else if (byOrdAsc.compare(row, pq.head) > 0) { pq.dequeue(); pq.enqueue(row) }

    /** False only when `ordVal` loses to the current worst retained
      * row on ord alone (strictly smaller) — the allocation-free
      * reject check. Equal ords return true (byte tie-break needs the
      * projected row). */
    def mightAccept(ordVal: Double): Boolean =
      pq.size < k || java.lang.Double.compare(ordVal, pq.head.getDouble(0)) >= 0

    def size: Int = pq.size
    def rows: Iterator[UnsafeRow] = pq.iterator
    def sortedDesc: Seq[UnsafeRow] = pq.toSeq.sorted(byOrdAsc.reverse)
  }

  /** SQL builder: `top_k(ord, payload, k)` with a foldable integer k;
    * the ordinal is cast to double. */
  def fromSeqTopK(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3, s"top_k requires 3 arguments, got ${exprs.length}")
    val k = exprs(2) match {
      case Literal(v: Int, IntegerType) => v
      case e if e.foldable && e.dataType == IntegerType =>
        e.eval().asInstanceOf[Int]
      case other => throw new IllegalArgumentException(
        s"top_k's k must be a foldable INT literal, got ${other.sql}")
    }
    TopKAgg(Cast(exprs(0), DoubleType), exprs(1), k)
  }

  /** Column API: `topK(ord, payload, k)` for `agg(...)`. */
  def topK(ord: Column, payload: Column, k: Int): Column =
    GraftBridge.column(
      TopKAgg(Cast(GraftBridge.expression(ord), DoubleType),
        GraftBridge.expression(payload), k).toAggregateExpression())
}
