package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items sketch: a mergeable heavy-hitter summary
  * as a custom Catalyst `TypedImperativeAggregate` — the approximate,
  * bounded-memory twin of the exact heavy-hitters groupBy (q47), the
  * way `graft_kmv` (q60) twins `approx_count_distinct` (q33) and the
  * percentile sketch (q93) twins exact percentiles (q41).
  *
  * Algorithm (Misra & Gries 1982; mergeability per Agarwal et al.,
  * "Mergeable Summaries", PODS'12): keep ≤ k counters. An unseen item
  * with all k counters busy decrements EVERY counter by 1 (dropping
  * zeros) instead of being stored. Merging adds counter maps, then
  * subtracts the (k+1)-th largest count from all and drops non-positive
  * counters, restoring the k bound.
  *
  * Guarantees, with `dec` = total decrement applied on any root-to-leaf
  * aggregation path and `n` = stream length:
  *  - every reported count ĉ satisfies ĉ ≤ c ≤ ĉ + dec (c = true count);
  *  - dec ≤ n / (k+1), so any item with c > n/(k+1) survives the sketch;
  *  - memory is O(k) per group at every stage (partial buffers, shuffle
  *    rows, final merge) — the 100-TB property the exact groupBy lacks
  *    when the item domain (corpus vocabulary) doesn't fit anywhere.
  *
  * The sketch contents depend on partitioning/merge order (like every
  * MG implementation), so the registered query (q105) is rows-only; the
  * BOUNDS are order-independent and spec-gated against the exact counts
  * (SketchBoundsSpec).
  *
  * Usage: `graft_freq(item STRING, k INT literal)
  *   → STRUCT<items: ARRAY<STRUCT<item, cnt>>, dec BIGINT, n BIGINT>`,
  * items sorted by (cnt DESC, item). Null items are ignored.
  */
case class FreqItemsSketch(
    child: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqItemsSketch.Buffer] {

  import FreqItemsSketch.Buffer

  lazy val k: Int = kExpr.eval(InternalRow.empty).asInstanceOf[Int]

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != StringType) {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a STRING item column, got ${child.dataType.sql}")
    } else if (kExpr.dataType != IntegerType || !kExpr.foldable) {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable INT k, got ${kExpr.sql}")
    } else if (kExpr.eval(InternalRow.empty) == null ||
        kExpr.eval(InternalRow.empty).asInstanceOf[Int] < 1) {
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires k >= 1")
    } else TypeCheckResult.TypeCheckSuccess
  }

  override def prettyName: String = "graft_freq"
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("items", ArrayType(StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))), containsNull = false),
      nullable = false),
    StructField("dec", LongType, nullable = false),
    StructField("n", LongType, nullable = false)))
  override def children: Seq[Expression] = Seq(child, kExpr)

  override def createAggregationBuffer(): Buffer = new Buffer()

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      buf.n += 1
      val cur = buf.counts.getOrElse(item, 0L)
      if (cur > 0L) buf.counts.update(item, cur + 1L)
      else if (buf.counts.size < k) buf.counts.update(item, 1L)
      else {
        // decrement-all: O(k), amortized O(1) per decremented unit
        buf.dec += 1L
        val dead = mutable.ArrayBuffer.empty[String]
        buf.counts.foreach { case (it, c) =>
          if (c == 1L) dead += it else buf.counts.update(it, c - 1L)
        }
        dead.foreach(buf.counts.remove)
      }
    }
    buf
  }

  override def merge(buf: Buffer, other: Buffer): Buffer = {
    buf.n += other.n
    buf.dec += other.dec
    other.counts.foreach { case (it, c) =>
      buf.counts.update(it, buf.counts.getOrElse(it, 0L) + c)
    }
    if (buf.counts.size > k) {
      // subtract the (k+1)-th largest count, drop non-positive
      val m = buf.counts.values.toArray.sortInPlace()(Ordering[Long].reverse).apply(k)
      buf.dec += m
      val dead = mutable.ArrayBuffer.empty[String]
      buf.counts.foreach { case (it, c) =>
        if (c <= m) dead += it else buf.counts.update(it, c - m)
      }
      dead.foreach(buf.counts.remove)
    }
    buf
  }

  override def eval(buf: Buffer): Any = {
    val sorted = buf.counts.toArray.sortBy { case (it, c) => (-c, it) }
    val rows = sorted.map { case (it, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(it), c))
    }
    new GenericInternalRow(Array[Any](
      new GenericArrayData(rows.asInstanceOf[Array[Any]]), buf.dec, buf.n))
  }

  override def serialize(buf: Buffer): Array[Byte] = {
    val entries = buf.counts.toArray
    val bytes = entries.map { case (it, _) => it.getBytes(StandardCharsets.UTF_8) }
    val size = 8 + 8 + 4 + entries.indices.map(i => 4 + bytes(i).length + 8).sum
    val bb = ByteBuffer.allocate(size)
    bb.putLong(buf.n).putLong(buf.dec).putInt(entries.length)
    entries.indices.foreach { i =>
      bb.putInt(bytes(i).length).put(bytes(i)).putLong(entries(i)._2)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Buffer()
    buf.n = bb.getLong
    buf.dec = bb.getLong
    val m = bb.getInt
    var i = 0
    while (i < m) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf.counts.update(new String(arr, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqItemsSketch =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

object FreqItemsSketch {
  /** n = items observed, dec = cumulative decrement (error bound). */
  final class Buffer {
    val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty
    var dec: Long = 0L
    var n: Long = 0L
  }
}
