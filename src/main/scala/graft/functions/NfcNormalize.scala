package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}

/** `nfc_normalize(string)` → Unicode NFC canonical composition — the text-
  * normalization stage a web corpus runs before ANY hash-keyed operator
  * (exact dedup, shingles, fingerprints): the same visible text arrives
  * from the wild in composed ('á', U+00E1) and decomposed ('a'+U+0301)
  * forms, and every hash in the dedup block would treat them as different
  * documents. Spark has no NFC builtin (DuckDB ships `nfc_normalize`); a
  * Scala UDF here would fall out of whole-stage codegen for every
  * downstream text operator, so this is a native expression with a real
  * `doGenCode`.
  *
  * The kernel is `java.text.Normalizer` (the JDK's ICU-derived
  * implementation of UAX #15) with an ASCII fast path: `Normalizer
  * .isNormalized` is O(n) with no allocation, and real corpora are
  * overwhelmingly already-NFC, so the common row costs one scan and
  * returns the INPUT UTF8String (zero copies).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }

  /** Public for the generated code path (called through a reference obj). */
  def kernel(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nfcNormalize", this, classOf[NfcNormalize].getName)
    defineCodeGen(ctx, ev, c => s"$ref.kernel($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Column form: `nfc_normalize(text)`. */
  def apply(text: Column): Column =
    toColumn(NfcNormalize(toExpression(text)))
}
