package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** KMV (k-minimum-values) distinct sketch: a custom Catalyst
  * `TypedImperativeAggregate` that keeps the k smallest DISTINCT int64
  * hash values per group and returns them as a sorted ARRAY<BIGINT>.
  *
  * Why this sketch, next to the built-in HLL (`approx_count_distinct`,
  * q33): KMV over a deterministic portable hash (md5 → int64, the
  * engine's MinHash idiom) is ENGINE-REPRODUCIBLE — the k-min set is a
  * pure function of the input value set, independent of partitioning,
  * merge order, and engine, so the DuckDB oracle can hash-match the
  * whole sketch AND the derived estimate (q60). HLL buffers are
  * implementation-defined and only rows-only-checkable.
  *
  * Estimator (derived in the query, not here): with hashes uniform on
  * [0, H) and D = true distinct count, the k-th minimum h_k satisfies
  * E[D] ≈ (k−1)·H / h_k; below k the sketch IS the distinct set and the
  * estimate is exact.
  *
  * Scale shape: partial aggregation keeps ≤ k longs per group per
  * partition (bounded memory); the shuffle carries one ≤ k-element
  * array per group per map task; merge is a bounded set union — the
  * same decomposition HLL enjoys, with determinism on top. Update is
  * O(log k) via a sorted set, and values ≥ the current k-th minimum
  * are rejected in O(1) on the fast path once the buffer is full.
  *
  * Usage: `graft_kmv(hash_col BIGINT, k INT literal) → ARRAY<BIGINT>`.
  * Null inputs are ignored (count-distinct semantics).
  */
case class KmvDistinctSketch(
    child: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]] {

  lazy val k: Int = kExpr.eval(InternalRow.empty).asInstanceOf[Int]

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != LongType) {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BIGINT hash column, got ${child.dataType.sql}")
    } else if (kExpr.dataType != IntegerType || !kExpr.foldable) {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable INT k, got ${kExpr.sql}")
    } else if (kExpr.eval(InternalRow.empty) == null ||
        kExpr.eval(InternalRow.empty).asInstanceOf[Int] < 1) {
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires k >= 1")
    } else TypeCheckResult.TypeCheckSuccess
  }

  override def prettyName: String = "graft_kmv"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child, kExpr)

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  private def insert(buf: mutable.TreeSet[Long], v: Long): Unit = {
    if (buf.size < k) buf += v
    else if (v < buf.last && buf.add(v)) buf -= buf.last
  }

  override def update(buf: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: mutable.TreeSet[Long], other: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: mutable.TreeSet[Long]): Any =
    new GenericArrayData(buf.toArray) // TreeSet iterates ascending

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.TreeSet.empty[Long]
    var i = 0
    while (i < n) { buf += bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinctSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinctSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvDistinctSketch =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

object KmvDistinctSketch {
  /** Portable estimate H constant: hashes live in [0, 16^15) = [0, 2^60). */
  val HashRange: Double = 1152921504606846976.0 // 2^60, exact in double
}
