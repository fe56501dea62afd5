package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, GenericInternalRow, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch aggregate:
  * `heavy_hitters(item, capacity)` summarizes a group's item stream
  * with at most `capacity` counters and evaluates to
  * `struct<err bigint, items array<struct<item string, count bigint>>>`
  * with items sorted (count desc, item asc).
  *
  * Guarantees (classic MG + the mergeable-summaries merge, Agarwal
  * et al., PODS'12) — they hold under ANY partitioning / merge order:
  *  - every reported `count` is a LOWER bound on the item's true
  *    group frequency, and true <= count + err (`err` accumulates
  *    every decrement through updates AND merges);
  *  - any item with true frequency > n/(capacity+1) is guaranteed
  *    retained;
  *  - if a group's distinct-item count never exceeds `capacity`, no
  *    decrement ever fires: `err = 0` and every count is EXACT — the
  *    regime q85's DuckDB oracle pins against plain GROUP BY counts.
  * In the approximate regime the retained counter VALUES legitimately
  * depend on arrival/merge order (inherent to MG); the spec asserts
  * the order-independent guarantees, not byte equality.
  *
  * Scale: the sketch form of "what dominates each group". Map-side
  * partial aggregation holds `capacity` counters per group per task,
  * the shuffle moves sketches instead of rows, and a merge is counter
  * addition plus one bounded decrement — a hot group costs
  * O(capacity), never its row count. The window/groupBy encodings of
  * the same question materialize or sort the full group. */
case class HeavyHittersAgg(
    item: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HeavyHittersAgg.Sketch] with UnaryLike[Expression] {

  require(capacity > 0, s"heavy_hitters needs capacity > 0, got $capacity")

  override def child: Expression = item

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (item.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"heavy_hitters item must be STRING (cast it), got ${item.dataType.sql}")

  override def dataType: DataType = StructType(Seq(
    StructField("err", LongType, nullable = false),
    StructField("items", ArrayType(StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("count", LongType, nullable = false))), containsNull = false),
      nullable = false)))

  override def nullable: Boolean = false
  override def prettyName: String = "heavy_hitters"

  override def createAggregationBuffer(): HeavyHittersAgg.Sketch =
    new HeavyHittersAgg.Sketch(capacity)

  override def update(buffer: HeavyHittersAgg.Sketch, input: InternalRow): HeavyHittersAgg.Sketch = {
    val v = item.eval(input)
    if (v != null) buffer.offer(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: HeavyHittersAgg.Sketch, other: HeavyHittersAgg.Sketch): HeavyHittersAgg.Sketch = {
    buffer.absorb(other)
    buffer
  }

  override def eval(buffer: HeavyHittersAgg.Sketch): Any = {
    val items = buffer.sorted.map { case (i, c) =>
      val r = new GenericInternalRow(2)
      r.update(0, UTF8String.fromString(i))
      r.update(1, c)
      r: Any
    }
    val out = new GenericInternalRow(2)
    out.update(0, buffer.err)
    out.update(1, new GenericArrayData(items.toArray))
    out
  }

  override def serialize(buffer: HeavyHittersAgg.Sketch): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buffer.err)
    out.writeInt(buffer.counters.size)
    buffer.counters.foreach { case (i, c) =>
      val b = i.getBytes("UTF-8")
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): HeavyHittersAgg.Sketch = {
    val in = ByteBuffer.wrap(bytes)
    val sk = new HeavyHittersAgg.Sketch(capacity)
    sk.err = in.getLong
    var n = in.getInt
    while (n > 0) {
      val len = in.getInt
      val b = new Array[Byte](len)
      in.get(b)
      sk.counters(new String(b, "UTF-8")) = in.getLong
      n -= 1
    }
    sk
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HeavyHittersAgg =
    copy(item = newChild)
}

object HeavyHittersAgg {

  /** The MG summary: at most `capacity` counters plus the cumulative
    * decrement total (`err` — the global undercount bound). */
  final class Sketch(val capacity: Int) {
    val counters: mutable.HashMap[String, Long] = mutable.HashMap.empty
    var err: Long = 0L

    def offer(item: String): Unit = counters.get(item) match {
      case Some(c) => counters(item) = c + 1
      case None if counters.size < capacity => counters(item) = 1L
      case None =>
        // decrement-all round: one unit of undercount for every
        // retained item AND the arriving one (which is dropped)
        err += 1
        val dead = mutable.ArrayBuffer.empty[String]
        counters.keysIterator.foreach { k =>
          val c = counters(k) - 1
          if (c <= 0) dead += k else counters(k) = c
        }
        dead.foreach(counters.remove)
    }

    /** Mergeable-summaries merge: add counters, then if over
      * capacity subtract the (capacity+1)-th largest value from all
      * and drop the non-positive — the bounded decrement that keeps
      * the error bound additive. */
    def absorb(other: Sketch): Unit = {
      err += other.err
      other.counters.foreach { case (i, c) =>
        counters(i) = counters.getOrElse(i, 0L) + c
      }
      if (counters.size > capacity) {
        val values = counters.values.toArray
        java.util.Arrays.sort(values)
        val m = values(values.length - capacity - 1) // (capacity+1)-th largest
        err += m
        val dead = mutable.ArrayBuffer.empty[String]
        counters.keysIterator.foreach { k =>
          val c = counters(k) - m
          if (c <= 0) dead += k else counters(k) = c
        }
        dead.foreach(counters.remove)
      }
    }

    def sorted: Seq[(String, Long)] =
      counters.toSeq.sortBy { case (i, c) => (-c, i) }
  }

  /** SQL builder: `heavy_hitters(item, capacity)` with a foldable
    * integer capacity; the item is cast to string. */
  def fromSeqHeavyHitters(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, s"heavy_hitters requires 2 arguments, got ${exprs.length}")
    val cap = exprs(1) match {
      case Literal(v: Int, IntegerType) => v
      case e if e.foldable && e.dataType == IntegerType => e.eval().asInstanceOf[Int]
      case other => throw new IllegalArgumentException(
        s"heavy_hitters' capacity must be a foldable INT literal, got ${other.sql}")
    }
    HeavyHittersAgg(Cast(exprs(0), StringType), cap)
  }

  /** Column API: `heavyHitters(item, capacity)` for `agg(...)`. */
  def heavyHitters(item: Column, capacity: Int): Column =
    GraftBridge.column(
      HeavyHittersAgg(Cast(GraftBridge.expression(item), StringType), capacity)
        .toAggregateExpression())
}
