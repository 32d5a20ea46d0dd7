package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Unigram-LM tokenizer training (q268's operator): vocabulary shape,
  * char backstop, segmentation reconstruction, determinism, and the
  * family-separating property the round-12 verdict asked for — a corpus
  * where unigram-LM and BPE segment the SAME word differently.
  */
class UnigramLmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The HuggingFace-course-style corpus: "hug"-family words whose pair
    * statistics pull BPE one way while whole-piece likelihoods pull
    * unigram another. Word frequencies are encoded by repetition.
    */
  private def corpus = {
    val words = Seq.fill(10)("hug") ++ Seq.fill(5)("pug") ++
      Seq.fill(12)("pun") ++ Seq.fill(4)("bun") ++ Seq.fill(5)("hugs")
    words.grouped(6).map(_.mkString(" ")).toSeq.toDF("text")
  }

  test("train: every char survives, vocab bounded, counts positive, logp consistent") {
    val v = UnigramLm.train(corpus, "text", vocabTarget = 12, emRounds = 2,
      seedMultiplier = 2, maxPieceLen = 4).collect()
    val pieces = v.map(_.getString(0))
    assert(pieces.distinct.length === pieces.length)
    // char backstop: every character of the corpus is a vocab piece
    val chars = "hugpunbs".toSet
    assert(chars.forall(c => pieces.contains(c.toString)))
    // bounded: chars always survive; multi-char pieces fill to the target
    val nMulti = v.count(_.getLong(1) == 0L)
    assert(v.length <= math.max(12, chars.size) && nMulti <= 12 - chars.size + 12)
    assert(v.forall(_.getLong(2) >= 1L), "counts (smoothed) must be >= 1")
    // logp = round(ln(count/total), 12) over THIS frame's total
    val total = v.map(_.getLong(2)).sum.toDouble
    v.foreach { r =>
      val expect = BigDecimal(math.log(r.getLong(2) / total))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(3) === expect, s"logp of ${r.getString(0)}")
    }
  }

  test("segment: pieces concatenate back to the word, positions ascend") {
    val v = UnigramLm.train(corpus, "text", vocabTarget = 12, emRounds = 2,
      seedMultiplier = 2, maxPieceLen = 4)
    val segs = UnigramLm.segment(
        Seq("hug", "pug", "pun", "bun", "hugs", "shun").toDF("word"), v)
      .collect()
      .groupBy(_.getString(0))
    for ((w, rows) <- segs) {
      val ordered = rows.sortBy(_.getLong(1))
      assert(ordered.map(_.getString(2)).mkString === w,
        s"segmentation of $w must reconstruct it")
    }
    // "shun" was never a training word but segments anyway (char backstop)
    assert(segs.contains("shun"))
  }

  test("segment matches brute-force max-likelihood enumeration (HOF DP pin)") {
    // explicit vocab with tie-free logps: the per-word HOF DP (r17
    // optimization of the per-position join loop) must pick exactly the
    // global-max segmentation under left-to-right score addition
    val vmap = Map("h" -> -2.01, "u" -> -2.53, "g" -> -2.27, "s" -> -3.11,
      "hu" -> -1.93, "ug" -> -1.81, "hug" -> -2.09, "gs" -> -2.63,
      "ugg" -> -2.41)
    val vocab = vmap.toSeq.toDF("piece", "logp")
    val words = Seq("hug", "hugs", "uggh", "shug", "h").toDF("word")
    def brute(w: String): Seq[String] = {
      def all(rest: String): Seq[Seq[String]] =
        if (rest.isEmpty) Seq(Seq.empty)
        else (1 to rest.length).flatMap { l =>
          val p = rest.take(l)
          if (vmap.contains(p)) all(rest.drop(l)).map(p +: _) else Seq.empty
        }
      all(w).maxBy(_.foldLeft(0.0)((acc, p) => acc + vmap(p)))
    }
    val got = UnigramLm.segment(words, vocab).collect()
      .groupBy(_.getString(0))
      .map { case (w, rows) =>
        w -> rows.sortBy(_.getLong(1)).map(_.getString(2)).toSeq }
    for (w <- Seq("hug", "hugs", "uggh", "shug", "h"))
      assert(got(w) === brute(w), s"DP segmentation of $w")
  }

  test("train is deterministic: two runs produce identical vocabularies") {
    def run() = UnigramLm.train(corpus, "text", vocabTarget = 12,
      emRounds = 2, seedMultiplier = 2, maxPieceLen = 4)
      .orderBy("piece").collect().map(_.toString).toSeq
    assert(run() === run())
  }

  test("unigram-LM and BPE disagree on at least one corpus word (family-separating)") {
    // BPE: greedy count-scored merges applied in sequence
    val merges = TextAnalysis.bpeTrain(corpus, "text", nMerges = 4)
      .map(m => (m._1, m._2))
    val words = Seq("hug", "pug", "pun", "bun", "hugs").toDF("word")
    val bpe = words
      .select(col("word"), TextAnalysis.bpeSegment(col("word"), merges)
        .as("seg"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).mkString("|"))
      .toMap
    // unigram: global-likelihood Viterbi under the trained piece LM
    val v = UnigramLm.train(corpus, "text", vocabTarget = 12, emRounds = 2,
      seedMultiplier = 2, maxPieceLen = 4)
    val uni = UnigramLm.segment(words, v).collect()
      .groupBy(_.getString(0))
      .map { case (w, rows) =>
        w -> rows.sortBy(_.getLong(1)).map(_.getString(2)).mkString("|") }
    val disagreements = bpe.keys.filter(w => bpe(w) != uni(w))
    assert(disagreements.nonEmpty,
      s"expected the tokenizer families to separate; bpe=$bpe uni=$uni")
  }
}
