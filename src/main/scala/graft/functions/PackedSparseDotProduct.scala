package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: sparse dot product over PACKED sparse
  * vectors — each element is `(key << 32) | weight` with key < 2^31 and
  * 0 <= weight < 2^32, arrays sorted ascending (thus sorted by key) with
  * unique keys. Returns Σ w1·w2 over matching keys as BIGINT (exact —
  * no IEEE accumulation).
  *
  * This is the TF-IDF cosine hot path: per candidate pair one fused
  * two-pointer walk, no per-pair map/hash-set allocation, codegen'd
  * inline. The packing keeps a sparse vector in ONE array column —
  * cache-friendly and shuffle-cheap (a struct<array,array> pays two
  * offsets + nulls per element).
  */
case class PackedSparseDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<BIGINT> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_packed_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var s = 0L
    while (i < nx && j < ny) {
      val kx = x.getLong(i) >>> 32
      val ky = y.getLong(j) >>> 32
      if (kx == ky) {
        s += (x.getLong(i) & 0xffffffffL) * (y.getLong(j) & 0xffffffffL)
        i += 1; j += 1
      } else if (kx < ky) i += 1
      else j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val kx = ctx.freshName("kx")
      val ky = ctx.freshName("ky")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0; int $j = 0; long $s = 0L;
         |while ($i < $nx && $j < $ny) {
         |  long $kx = $a.getLong($i) >>> 32;
         |  long $ky = $b.getLong($j) >>> 32;
         |  if ($kx == $ky) {
         |    $s += ($a.getLong($i) & 0xffffffffL) * ($b.getLong($j) & 0xffffffffL);
         |    $i++; $j++;
         |  } else if ($kx < $ky) { $i++; }
         |  else { $j++; }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PackedSparseDotProduct =
    copy(left = newLeft, right = newRight)
}
