package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The Gopher repetition table (repetitionStats, q166): hand-computed
  * fractions for every family — top-n-gram chars, duplicated-n-gram
  * chars, duplicate lines — plus the tie-break and degenerate-input
  * contracts. The corpus gate exercises the n-gram family on real data;
  * this spec pins the line family (the corpus has no newlines) and the
  * arithmetic definitions.
  */
class RepetitionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def stats(docs: (Long, String)*) =
    TextAnalysis.repetitionStats(
        docs.toSeq.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap

  test("top-2-gram fraction: repeated bigram dominates; keep flips") {
    // "a b a b a b": 6 nonws chars; "a b" occurs 3x (len 2), "b a" 2x
    val s = stats(1L -> "a b a b a b")
    val r = s(1L)
    assert(r.getAs[Double]("top2_frac") == 3 * 2 / 6.0)
    assert(!r.getAs[Boolean]("keep"), "top2 = 1.0 must fail the 0.20 cut")
  }

  test("dup-5-gram fraction: occurrences beyond the first count full length") {
    // "x y z w v a x y z w v": 11 tokens, 11 chars; ONLY "x y z w v"
    // repeats (2x, separated so no shifted gram repeats) -> (2-1) * 5
    val r = stats(1L -> "x y z w v a x y z w v")(1L)
    assert(r.getAs[Double]("dup5_frac") == 5 / 11.0)
    // back-to-back repetition: every shifted 5-gram repeats too, and the
    // documented non-union definition counts each full-length — the
    // fraction legitimately exceeds 1 ((3-1)*5 + 4*(2-1)*5 = 30 of 15)
    val loop = stats(2L -> ("x y z w v " * 3).trim)(2L)
    assert(loop.getAs[Double]("dup5_frac") == 30 / 15.0)
  }

  test("top tie-break: equal counts pick the lexicographically greatest gram") {
    // "bb bb a a": all three 2-grams occur once; winner "bb bb" (greatest),
    // 4 chars of 6 total. A length- or ascending-gram tie-break would give
    // a different fraction — the oracle's ORDER BY c DESC, gram DESC must
    // equal max(struct(c, gram)).
    val r = stats(1L -> "bb bb a a")(1L)
    assert(r.getAs[Double]("top2_frac") == 4 / 6.0)
  }

  test("line family: trimmed nonempty lines, duplicate and char fractions") {
    // lines: foo, bar, foo, baz (blank and whitespace-only dropped)
    val r = stats(1L -> "foo\nbar\nfoo\n\n   \nbaz")(1L)
    assert(r.getAs[Double]("dup_line_frac") == 1 / 4.0)
    assert(r.getAs[Double]("dup_line_char_frac") == 3 / 12.0)
    // (keep is false here — the 4-word doc fails the TOP2 cut, which is
    // exactly the conjunction doing its job)
    val bad = stats(2L -> "spam\nspam\nspam\nspam\nham")(2L)
    assert(bad.getAs[Double]("dup_line_frac") == 3 / 5.0)
    assert(!bad.getAs[Boolean]("keep"), "0.6 duplicate lines must fail")
  }

  test("degenerate docs: empty and sub-n texts report zero everywhere, keep") {
    val s = stats(1L -> "", 2L -> "hello", 3L -> "   ")
    s.values.foreach { r =>
      Seq("top2_frac", "top3_frac", "top4_frac", "dup5_frac", "dup10_frac",
        "dup_line_frac", "dup_line_char_frac").foreach { c =>
        assert(r.getAs[Double](c) == 0.0, s"$c must be 0.0 on degenerate docs")
      }
      assert(r.getAs[Boolean]("keep"))
    }
  }

  test("stateless per-row variant equals the grouped batch operator row for row") {
    val docs = Seq(
      1L -> "a b a b a b",
      2L -> "x y z w v a x y z w v",
      3L -> ("x y z w v " * 3).trim,
      4L -> "bb bb a a",
      5L -> "foo\nbar\nfoo\n\n   \nbaz",
      6L -> "", 7L -> "hello", 8L -> "   ",
      9L -> "q w e r t y u i o p q w e r t y u i o p").toDF("doc_id", "text")
    val batch = TextAnalysis.repetitionStats(docs, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val stateless = TextAnalysis
      .repetitionStatsStateless(docs, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(batch == stateless,
      "the streaming reformulation must be value-identical to the batch aggs")
  }

  test("streaming repetition filter: stream ≡ batch on the corpus") {
    val got = graft.streaming.StreamingIngest
      .streamRepetition(spark, TestSpark.sf, queryName = "rep_spec")
      .orderBy("doc_id").collect().toSeq
    val want = TextAnalysis.repetitionStats(
        graft.Tables.documents(spark, TestSpark.sf), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(got == want, "streamed verdicts must match the batch operator")
  }

  test("all nine n values populate independently") {
    // one doc with a repeated 10-gram: every dup-n (5..10) is nonzero
    val ten = "q w e r t y u i o p"
    val r = stats(1L -> (ten + " " + ten))(1L)
    (5 to 10).foreach { n =>
      assert(r.getAs[Double](s"dup${n}_frac") > 0.0,
        s"dup$n must see the repeated 10-gram's sub-grams")
    }
  }
}
