package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a Catalyst expression — the
  * canonicalization pass a text pipeline runs BEFORE exact dedup /
  * fingerprinting: the same visible text can arrive precomposed (é,
  * U+00E9) or decomposed (e + U+0301) depending on the source system, and
  * without canonical composition those are different bytes, different
  * md5s, different dedup classes — boilerplate survives dedup by
  * encoding accident (CCNet normalizes before everything for exactly
  * this reason).
  *
  * Spark ships no normalization builtin, so this wraps
  * `java.text.Normalizer` (ICU-grade, in the JDK — no new dependency)
  * with a `doGenCode` that keeps the call inside whole-stage codegen.
  * Cross-engine note: NFC is a Unicode-standard algorithm; the JDK and
  * DuckDB's utf8proc implement the same composition tables, which is what
  * lets the q144 oracle recompute results with `nfc_normalize` — the
  * gate would catch a divergence on the exercised sequences.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def prettyName: String = "nfc_normalize"
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"argument of $prettyName must be a string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Shared by interpreted eval and generated code. Fast path: NFC-check
    * the already-decoded string first — real corpora are overwhelmingly
    * already composed, and `isNormalized` is a table scan without the
    * rewrite allocation.
    */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
