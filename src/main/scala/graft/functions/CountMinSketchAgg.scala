package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Count–min sketch (Cormode & Muthukrishnan 2005): a mergeable
  * fixed-memory frequency summary as a custom Catalyst
  * `TypedImperativeAggregate` — the point-FREQUENCY member of the sketch
  * family next to graft_kmv (distinct count), graft_freq (heavy-hitter
  * identity) and the percentile sketch (rank). d×w counters; an item
  * increments one counter per row i at column h_i(item); the estimate
  * for an item is the MIN over its d counters. Estimates never
  * UNDERestimate, and overestimate by more than εn = (e/w)·n with
  * probability at most δ = e^(−d) per the paper's bound.
  *
  * Why this one is ORACLE-EXACT where MG/HLL are rows-only: the buffer
  * is a pure counter matrix and merge is elementwise addition, so the
  * result is independent of partitioning and merge order — and the row
  * hashes are the repo's portable md5-affine family
  * (`conv(substring(md5(i || ':' || item), 1, 15), 16, 10) % w`, the
  * exact column expression used across the minhash/bucket machinery),
  * so DuckDB can rebuild the identical matrix with a GROUP BY over
  * (row, bucket) and replay every estimate hash-exact (q187).
  *
  * 100-TB shape: O(d·w) memory per group at every stage (partial
  * buffers, shuffle rows, final merge) regardless of the item domain —
  * the property the exact token groupBy lacks when the corpus
  * vocabulary doesn't fit anywhere. Merge-order independence also makes
  * it safe to persist and UNION across daily increments.
  *
  * Usage: `graft_cms(item STRING, d INT literal, w INT literal)
  *   → STRUCT<counts: ARRAY<BIGINT> (d·w, row-major), d INT, w INT,
  *            n BIGINT>`. Null items are ignored. Estimate lookup is
  * `min_i counts[i·w + h_i(item)]` — see `Queries.q187` for the column
  * form.
  */
case class CountMinSketchAgg(
    child: Expression,
    dExpr: Expression,
    wExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMinSketchAgg.Buffer] {

  import CountMinSketchAgg.{Buffer, bucket}

  lazy val d: Int = dExpr.eval(InternalRow.empty).asInstanceOf[Int]
  lazy val w: Int = wExpr.eval(InternalRow.empty).asInstanceOf[Int]

  override def checkInputDataTypes(): TypeCheckResult = {
    def lit(e: Expression): Option[Int] =
      if (e.dataType == IntegerType && e.foldable)
        Option(e.eval(InternalRow.empty)).map(_.asInstanceOf[Int])
      else None
    if (child.dataType != StringType) {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a STRING item column, got ${child.dataType.sql}")
    } else (lit(dExpr), lit(wExpr)) match {
      case (Some(dv), Some(wv)) if dv >= 1 && dv <= 16 && wv >= 1 &&
          wv <= (1 << 20) => TypeCheckResult.TypeCheckSuccess
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires 1 <= d <= 16 and 1 <= w <= 2^20")
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires foldable INT d and w, got ${dExpr.sql}, ${wExpr.sql}")
    }
  }

  override def prettyName: String = "graft_cms"
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("counts", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("d", IntegerType, nullable = false),
    StructField("w", IntegerType, nullable = false),
    StructField("n", LongType, nullable = false)))
  override def children: Seq[Expression] = Seq(child, dExpr, wExpr)

  override def createAggregationBuffer(): Buffer = new Buffer(d, w)

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      buf.n += 1L
      var i = 0
      while (i < d) {
        buf.counts(i * w + bucket(i, item, w)) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Buffer, other: Buffer): Buffer = {
    buf.n += other.n
    var i = 0
    while (i < buf.counts.length) {
      buf.counts(i) += other.counts(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Buffer): Any =
    new GenericInternalRow(Array[Any](
      new GenericArrayData(buf.counts.map(c => c: Any)), d, w, buf.n))

  override def serialize(buf: Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * buf.counts.length)
    bb.putLong(buf.n)
    buf.counts.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Buffer(d, w)
    buf.n = bb.getLong
    var i = 0
    while (i < buf.counts.length) {
      buf.counts(i) = bb.getLong
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinSketchAgg =
    copy(child = newChildren(0), dExpr = newChildren(1), wExpr = newChildren(2))
}

object CountMinSketchAgg {
  /** d·w row-major counter matrix + total item count. */
  final class Buffer(d: Int, w: Int) {
    val counts: Array[Long] = new Array[Long](d * w)
    var n: Long = 0L
  }

  /** Row-i bucket of `item`: the portable md5-affine hash — decimal value
    * of the first 15 hex digits (60 bits, exact in a long) of
    * `md5(i + ":" + item)`, mod w. Matches the column expression
    * `conv(substring(md5(concat(i, ':', item)), 1, 15), 16, 10) % w`
    * (Spark) and `sqlMd5Bucket` (DuckDB) digit for digit.
    */
  def bucket(i: Int, item: String, w: Int): Int = {
    val md = MessageDigest.getInstance("MD5")
    val dig = md.digest((i.toString + ":" + item).getBytes(StandardCharsets.UTF_8))
    // first 15 hex chars = high 7.5 bytes; fold digits like conv(_,16,10)
    var v = 0L
    var k = 0
    while (k < 15) {
      val b = dig(k / 2) & 0xff
      val nibble = if (k % 2 == 0) b >>> 4 else b & 0x0f
      v = (v << 4) | nibble
      k += 1
    }
    (v % w).toInt
  }
}
