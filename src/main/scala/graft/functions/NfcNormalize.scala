package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode NFC normalization of a STRING
  * column (java.text.Normalizer, Form.NFC).
  *
  * Text pipelines canonicalize before hashing — the decomposed
  * `e + U+0301` and the precomposed `é` are the SAME text to a reader
  * but DIFFERENT bytes to every dedup/fingerprint operator upstream
  * (q20 exact dedup, q23 fingerprints, q24 MinHash). Spark has no
  * built-in normalization function, and a Scala UDF here would box
  * every row and block whole-stage codegen on the hottest column of a
  * crawl pipeline; this expression stays inside codegen and calls the
  * JDK normalizer directly.
  *
  * Fast path: `Normalizer.isNormalized` on the decoded string avoids
  * the rebuild allocation for the overwhelmingly-common already-NFC
  * case (ASCII is always NFC). Null in → null out (UnaryExpression's
  * null-safe contract). Oracle parity: DuckDB's `nfc_normalize` —
  * both implement Unicode Normalization Form C, so results are
  * byte-identical (q150).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${dt.sql}")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) {
      input
    } else {
      UTF8String.fromString(
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      s"""
         |java.lang.String $s = $c.toString();
         |if (java.text.Normalizer.isNormalized($s, java.text.Normalizer.Form.NFC)) {
         |  ${ev.value} = $c;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |    java.text.Normalizer.normalize($s, java.text.Normalizer.Form.NFC));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
