package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions injector — the library-idiomatic way to load
  * the engine's native functions at session build time:
  *
  * {{{
  * spark.sql.extensions=graft.functions.GraftExtensions
  * }}}
  *
  * or `SparkSession.builder().withExtensions(new GraftExtensions()...)`.
  * Equivalent to the runtime [[GraftFunctions.register]] path (which the
  * operators call for sessions built without extensions, e.g. the
  * driver-owned Verify/Bench sessions): both converge on the same
  * expression builders, and both install [[NativeSetOpsRule]] — here via
  * `injectOptimizerRule`, there via `experimental.extraOptimizations` —
  * so plans are identical either way.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def unary(name: String, clazz: Class[_],
      build: Expression => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"$name requires exactly 1 argument, got ${children.length}")
        build(children.head)
      })

  private def binary(name: String, clazz: Class[_],
      build: (Expression, Expression) => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"$name requires exactly 2 arguments, got ${children.length}")
        build(children.head, children(1))
      })

  private def ternary(name: String, clazz: Class[_],
      build: (Expression, Expression, Expression) => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          s"$name requires exactly 3 arguments, got ${children.length}")
        build(children.head, children(1), children(2))
      })

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(binary(GraftFunctions.DotName,
      classOf[ArrayDotProduct], ArrayDotProduct(_, _)))
    ext.injectFunction(binary(GraftFunctions.SortedIntersectName,
      classOf[SortedArrayIntersectSize], SortedArrayIntersectSize(_, _)))
    ext.injectFunction(binary(GraftFunctions.IntersectSizeName,
      classOf[ArrayIntersectCountDistinct], ArrayIntersectCountDistinct(_, _)))
    ext.injectFunction(binary(GraftFunctions.PackedDotName,
      classOf[PackedSparseDotProduct], PackedSparseDotProduct(_, _)))
    ext.injectFunction(binary(GraftFunctions.KmvName,
      classOf[KmvDistinctSketch], KmvDistinctSketch(_, _)))
    ext.injectFunction(binary(GraftFunctions.FreqName,
      classOf[FreqItemsSketch], FreqItemsSketch(_, _)))
    ext.injectFunction(unary(GraftFunctions.NfcName,
      classOf[NfcNormalize], NfcNormalize(_)))
    ext.injectFunction(ternary(GraftFunctions.CmsName,
      classOf[CountMinSketchAgg], CountMinSketchAgg(_, _, _)))
    ext.injectOptimizerRule(_ => NativeSetOpsRule)
  }
}
