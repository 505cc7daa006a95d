package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen'd expression — the canonical
  * first step of text-corpus cleanup (mojibake repair pipelines, C4/
  * Dolma-style normalization): the same user-visible string arrives
  * from different sources as composed (`é`) or decomposed (`e` +
  * U+0301) codepoints, and EVERY exact-match operator downstream —
  * content-hash dedup, line-level boilerplate removal, n-gram
  * decontamination, blocking keys — silently treats them as different
  * documents until they are canonicalized. Spark ships no normalizer;
  * DuckDB's `nfc_normalize` is the oracle twin.
  *
  * Semantics: `java.text.Normalizer.normalize(s, NFC)` (Unicode
  * canonical decomposition + canonical composition), null-in-null-out.
  * Two allocation-free fast paths cover the overwhelmingly common
  * rows: pure-ASCII input (`numBytes == numChars` — no scan beyond the
  * char count Spark caches nothing for, no String materialized) and
  * already-normalized input (`Normalizer.isNormalized`, a verify pass
  * that allocates nothing) both return the INPUT UTF8String untouched;
  * only genuinely denormalized rows pay the String round-trip.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects a string, got ${child.dataType.simpleString}")

  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(s: Any): Any =
    NfcNormalize.nfc(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)
}

object NfcNormalize {
  /** Static helper the generated code calls (the AffineGap /
    * DeleteNeighborhood pattern). Returns the input INSTANCE when no
    * normalization is needed.
    */
  def nfc(s: UTF8String): UTF8String = {
    if (s.numBytes() == s.numChars()) return s // pure ASCII: NFC by definition
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str,
      java.text.Normalizer.Form.NFC))
  }
}
