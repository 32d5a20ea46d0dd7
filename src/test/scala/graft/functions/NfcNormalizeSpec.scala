package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class NfcNormalizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // decomposed forms written as explicit escapes — literal combining marks
  // in source risk being silently pre-composed by editors/tools
  private val eAcuteD = "e\u0301"   // e + COMBINING ACUTE
  private val eAcuteC = "\u00e9"
  private val nTildeD = "n\u0303"   // n + COMBINING TILDE
  private val nTildeC = "\u00f1"

  test("decomposed sequences compose to the precomposed code point") {
    val got = Seq(eAcuteD, nTildeD, "caf" + eAcuteD + nTildeD)
      .toDF("s").select(nfc_normalize($"s")).as[String].collect()
    assert(got.sameElements(Array(eAcuteC, nTildeC, "caf" + eAcuteC + nTildeC)))
  }

  test("already-NFC strings pass through unchanged (incl. plain ASCII)") {
    val in = Seq("hello world", eAcuteC + nTildeC, "")
    val got = in.toDF("s").select(nfc_normalize($"s")).as[String].collect()
    assert(got.toSeq == in)
  }

  test("null propagates; non-string input is rejected at analysis") {
    val nulls = Seq[Option[String]](None, Some(eAcuteC)).toDF("s")
      .select(nfc_normalize($"s")).as[Option[String]].collect()
    assert(nulls.sameElements(Array(None, Some(eAcuteC))))
    val err = intercept[Exception] {
      Seq(1).toDF("s").select(nfc_normalize($"s")).collect()
    }
    assert(err.getMessage.contains("nfc_normalize"))
  }

  test("strip_accents drops spacing/enclosing marks and recomposes (utf8proc STRIPMARK)") {
    // Devanagari vowel sign AA is category Mc — utf8proc strips it, so
    // must we; Hangul must survive UNCHANGED (NFD jamo recompose)
    val devanagari = "क" + "ा"  // ka + VOWEL SIGN AA (Mc)
    val enclosing = "a⃝"          // a + COMBINING ENCLOSING CIRCLE (Me)
    val hangul = "가각"       // 가각
    val got = Seq(devanagari, enclosing, hangul)
      .toDF("s").select(strip_accents($"s")).as[String].collect().toSeq
    assert(got == Seq("क", "a", hangul))
  }

  test("strip_accents folds diacritics but never transliterates") {
    val eszett = "straße"
    val lStroke = "Łódź" // Łódź: Ł has no mark, ó/ź do
    val got = Seq("caf" + eAcuteC, "caf" + eAcuteD, nTildeC + eAcuteC,
        eszett, lStroke, "plain ascii")
      .toDF("s").select(strip_accents($"s")).as[String].collect().toSeq
    assert(got == Seq("cafe", "cafe", "ne", eszett, "Łodz", "plain ascii"))
    // registered for SQL, and null-safe
    assert(spark.sql(s"SELECT strip_accents('$eAcuteD')").as[String].head() == "e")
    val nulls = Seq[Option[String]](None).toDF("s")
      .select(strip_accents($"s")).as[Option[String]].collect()
    assert(nulls.sameElements(Array(None)))
  }

  test("collapses encoding variants into one dedup class") {
    // the q144 scenario: same visible text, different bytes
    val n = Seq("caf" + eAcuteC, "caf" + eAcuteD).toDF("s")
      .select(md5(nfc_normalize($"s")).as("h"))
      .distinct().count()
    assert(n == 1)
    // and is registered for SQL use
    val viaSql = spark.sql(s"SELECT nfc_normalize('$eAcuteD')").as[String].head()
    assert(viaSql == eAcuteC)
  }
}
