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

/** Accent folding: NFD-decompose, drop ALL combining marks (Unicode
  * categories Mn, Mc, Me), recompose to NFC — "café"/"café" both →
  * "cafe". The aggressive sibling of [[NfcNormalize]]: NFC
  * canonicalizes byte variants of the SAME text; accent folding
  * additionally merges diacritic variants, the match-recall knob for
  * fuzzy dedup and search-index keys. Deliberately NOT transliteration:
  * ß, Ł, æ have no combining mark to drop and pass through.
  *
  * This is utf8proc's STRIPMARK recipe (what DuckDB's `strip_accents`
  * runs): all three mark categories strip — not just Mn — and the
  * result recomposes (Hangul's NFD jamo must recompose or the fold
  * CHANGES Korean text; caught by a 12k-code-point sweep against
  * DuckDB before this expression shipped). Honest caveat: engines agree
  * up to Unicode TABLE VINTAGE — marks added in Unicode 13+ (U+0B55,
  * U+0898…) strip under JDK 17 (Unicode 13 tables) but pass through
  * older utf8proc builds; the sweep found 39/12139 such code points,
  * none expressible in the gates' synthesized inputs.
  */
case class StripAccents(child: Expression) extends UnaryExpression {
  override def prettyName: String = "strip_accents"
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"argument of $prettyName must be a string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    StripAccents.strip(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.StripAccents.strip($c)")

  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}

object StripAccents {
  /** ASCII fast path (no decomposition can change pure ASCII), else
    * NFD → drop Mn/Mc/Me → NFC. Surrogate pairs go through
    * `Character.getType` via code points, not chars, so astral-plane
    * text is safe.
    */
  def strip(s: UTF8String): UTF8String = {
    val str = s.toString
    var ascii = true
    var i = 0
    while (ascii && i < str.length) { if (str.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (ascii) return s
    val d = Normalizer.normalize(str, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var j = 0
    while (j < d.length) {
      val cp = d.codePointAt(j)
      val t = Character.getType(cp)
      if (t != Character.NON_SPACING_MARK &&
          t != Character.COMBINING_SPACING_MARK &&
          t != Character.ENCLOSING_MARK)
        sb.appendCodePoint(cp)
      j += Character.charCount(cp)
    }
    UTF8String.fromString(Normalizer.normalize(sb.toString, Normalizer.Form.NFC))
  }
}
