package graft.functions

import org.apache.spark.sql.{AnalysisException, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: dot product of two ARRAY<DOUBLE> columns.
  *
  * The composable form — `aggregate(zip_with(a, b, _*_), 0d, _+_)` —
  * allocates an intermediate array and drives two lambda closures per
  * row; this expression is a single fused loop that whole-stage codegen
  * inlines (SURVEY.md §7.4 "custom codegen Expression" stretch item).
  * Same left-to-right accumulation order as the fold, so results are
  * identical — and exact when inputs are integer-valued (VectorOps
  * quantization).
  *
  * Null array elements are not supported (quantized embeddings are
  * null-free); a null on either side yields null (BinaryExpression's
  * null-safe contract).
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<DOUBLE> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Runtime registration — works on ANY session (including the
  * driver-owned Verify/Bench sessions built without
  * SparkSessionExtensions), unlike an extensions-injected function.
  */
object GraftFunctions {
  val DotName = "graft_dot"
  val SortedIntersectName = "graft_sorted_intersect_size"
  val IntersectSizeName = "graft_intersect_size"
  val PackedDotName = "graft_packed_dot"
  val KmvName = "graft_kmv"
  val FreqName = "graft_freq"
  val NfcName = "graft_nfc"
  val CmsName = "graft_cms"

  private def registerUnary(spark: SparkSession, name: String,
      clazz: Class[_], build: Expression => Expression): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident = FunctionIdentifier(name)
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(clazz.getName, name),
        (children: Seq[Expression]) => {
          if (children.length != 1) {
            throw new AnalysisException(
              errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
              messageParameters = Map(
                "functionName" -> name,
                "expectedNum" -> "1",
                "actualNum" -> children.length.toString,
                "docroot" -> "https://spark.apache.org/docs/latest"))
          }
          build(children.head)
        })
    }
  }

  private def registerBinary(spark: SparkSession, name: String,
      clazz: Class[_], build: (Expression, Expression) => Expression): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident = FunctionIdentifier(name)
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(clazz.getName, name),
        (children: Seq[Expression]) => {
          if (children.length != 2) {
            throw new AnalysisException(
              errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
              messageParameters = Map(
                "functionName" -> name,
                "expectedNum" -> "2",
                "actualNum" -> children.length.toString,
                "docroot" -> "https://spark.apache.org/docs/latest"))
          }
          build(children.head, children(1))
        })
    }
  }

  private def registerTernary(spark: SparkSession, name: String,
      clazz: Class[_],
      build: (Expression, Expression, Expression) => Expression): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident = FunctionIdentifier(name)
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(clazz.getName, name),
        (children: Seq[Expression]) => {
          if (children.length != 3) {
            throw new AnalysisException(
              errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
              messageParameters = Map(
                "functionName" -> name,
                "expectedNum" -> "3",
                "actualNum" -> children.length.toString,
                "docroot" -> "https://spark.apache.org/docs/latest"))
          }
          build(children.head, children(1), children(2))
        })
    }
  }

  def register(spark: SparkSession): Unit = {
    registerBinary(spark, DotName, classOf[ArrayDotProduct], ArrayDotProduct(_, _))
    registerBinary(spark, SortedIntersectName, classOf[SortedArrayIntersectSize],
      SortedArrayIntersectSize(_, _))
    registerBinary(spark, IntersectSizeName, classOf[ArrayIntersectCountDistinct],
      ArrayIntersectCountDistinct(_, _))
    registerBinary(spark, PackedDotName, classOf[PackedSparseDotProduct],
      PackedSparseDotProduct(_, _))
    registerBinary(spark, KmvName, classOf[KmvDistinctSketch],
      KmvDistinctSketch(_, _))
    registerBinary(spark, FreqName, classOf[FreqItemsSketch],
      FreqItemsSketch(_, _))
    registerUnary(spark, NfcName, classOf[NfcNormalize], NfcNormalize(_))
    registerTernary(spark, CmsName, classOf[CountMinSketchAgg],
      CountMinSketchAgg(_, _, _))
    // Parity with the GraftExtensions path: sessions registered at runtime
    // get the size(array_intersect) fusion too, not just the functions.
    val experimental = spark.experimental
    if (!experimental.extraOptimizations.contains(NativeSetOpsRule)) {
      experimental.extraOptimizations =
        experimental.extraOptimizations :+ NativeSetOpsRule
    }
  }
}
