package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ClassifySpec extends AnyFunSuite {

  test("classifierMetrics: hand confusion, pred-only label, zero-tp f1") {
    val spark0 = graft.TestSpark.spark
    import spark0.implicits._
    // truth: a,a,a,b,b — predictions: a,a,b,b,c
    val preds = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"),
      ("b", "c")).toDF("label", "pred")
    val got = Classify.classifierMetrics(preds)
      .as[(String, Long, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // a: tp 2, pred 2, true 3 → P 1, R 2/3, F1 = 2·1·(2/3)/(1+2/3)
    val (pa, ra) = (1.0, 2.0 / 3)
    assert(got("a") == (("a", 3L, 2L, 2L, pa, ra,
      2 * pa * ra / (pa + ra))), s"got ${got("a")}")
    // b: tp 1, pred 2, true 2 → P 1/2, R 1/2, F1 1/2
    assert(got("b") == (("b", 2L, 2L, 1L, 0.5, 0.5, 0.5)))
    // c never occurs as truth: n_true 0, tp 0 → all-zero rates
    assert(got("c") == (("c", 0L, 1L, 0L, 0.0, 0.0, 0.0)))
  }
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val corpus = Seq(
    // (id, label, text, split)
    (1L, "fruit", "apple apple banana", "train"),
    (2L, "fruit", "apple pear", "train"),
    (3L, "auto", "car road", "train"),
    (4L, "auto", "car car engine", "train"),
    (5L, "fruit", "apple banana", "test"),
    (6L, "auto", "car engine", "test"),
    (7L, "fruit", "zebra", "test"))

  private def df = corpus.toDF("doc_id", "label", "text", "split")

  /** Pure-Scala multinomial NB reference: direct Σ ln((c+1)/(N_s+V)),
    * NOT the operator's regrouped form — agreement proves the
    * regrouping is an identity, not a shared bug.
    */
  private def refPredict(tokens: Seq[String]): (String, Double) = {
    val train = corpus.filter(_._4 == "train")
    val toks = train.map(d => d._2 -> d._3.split(" ").toSeq)
    val counts = toks.flatMap { case (l, ts) => ts.map(l -> _) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val mass = counts.groupBy(_._1._1).map { case (l, m) => l -> m.values.sum }
    val vocab = counts.keys.map(_._2).toSet.size.toLong
    val docsPer = train.groupBy(_._2).map { case (l, d) => l -> d.size.toLong }
    val total = train.size.toLong
    val scored = mass.keys.toSeq.sorted.map { l =>
      val raw = math.log(docsPer(l).toDouble / total) + tokens.map { t =>
        val c = counts.getOrElse((l, t), 0L)
        math.log((c + 1.0) / (mass(l) + vocab))
      }.sum
      l -> BigDecimal(raw + 1e-9)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    // argmax on (score desc, label asc):
    scored.sortBy { case (l, s) => (-s, l) }.head
  }

  test("predictions match a direct independent NB computation") {
    val got = Classify.nbPredict(df, "doc_id", "text", "label",
        col("split") === "train")
      .orderBy("doc_id")
      .select("doc_id", "label", "pred", "score")
      .as[(Long, String, String, Double)].collect()
    val expected = corpus.filter(_._4 == "test").map { case (id, l, text, _) =>
      val (pred, score) = refPredict(text.split(" ").toSeq)
      (id, l, pred, score)
    }
    assert(got.toSeq == expected)
  }

  test("nbScore (model/stream formulation) equals nbPredict (join formulation)") {
    val model = Classify.nbTrainModel(
      df.filter(col("split") === "train"), "text", "label")
    assert(model.labels.toSeq == Seq("auto", "fruit"))
    val viaModel = Classify.nbScore(df.filter(col("split") === "test"),
        "doc_id", "text", "label", model)
      .orderBy("doc_id")
      .select("doc_id", "label", "pred", "score")
      .as[(Long, String, String, Double)].collect().toSeq
    val viaJoin = Classify.nbPredict(df, "doc_id", "text", "label",
        col("split") === "train")
      .orderBy("doc_id")
      .select("doc_id", "label", "pred", "score")
      .as[(Long, String, String, Double)].collect().toSeq
    assert(viaModel == viaJoin)
  }

  test("null text scores like empty text, identically in both formulations") {
    val withNull = (corpus :+ ((9L, "auto", null.asInstanceOf[String], "test")))
      .toDF("doc_id", "label", "text", "split")
    val viaJoin = Classify.nbPredict(withNull, "doc_id", "text", "label",
        col("split") === "train")
      .orderBy("doc_id").select("doc_id", "pred", "score")
      .as[(Long, String, Double)].collect().toSeq
    val model = Classify.nbTrainModel(
      withNull.filter(col("split") === "train"), "text", "label")
    val viaModel = Classify.nbScore(withNull.filter(col("split") === "test"),
        "doc_id", "text", "label", model)
      .orderBy("doc_id").select("doc_id", "pred", "score")
      .as[(Long, String, Double)].collect().toSeq
    assert(viaJoin == viaModel)
    // zero tokens -> prior only; equal priors tie -> label asc
    assert(viaJoin.find(_._1 == 9L).get._2 == "auto")
  }

  test("nbScore keeps token-less docs (explode_outer) and prices them by the prior") {
    val withEmpty = (corpus :+ ((8L, "fruit", "", "test"))).toDF(
      "doc_id", "label", "text", "split")
    val model = Classify.nbTrainModel(
      withEmpty.filter(col("split") === "train"), "text", "label")
    val got = Classify.nbScore(withEmpty.filter(col("split") === "test"),
        "doc_id", "text", "label", model)
      .select("doc_id", "pred").as[(Long, String)].collect().toMap
    // zero tokens: score = prior only; equal priors tie -> label asc
    assert(got(8L) == "auto")
  }

  test("distinctive vocabularies classify correctly; unseen-only text falls to the prior") {
    val got = Classify.nbPredict(df, "doc_id", "text", "label",
        col("split") === "train")
      .select("doc_id", "pred").as[(Long, String)].collect().toMap
    assert(got(5L) == "fruit" && got(6L) == "auto")
    // doc 7 is all unseen tokens: score reduces to prior − ln(N_s+V);
    // both labels have 2 train docs AND token mass 5, so the scores tie
    // exactly and the deterministic label tie-break picks "auto"
    assert(got(7L) == "auto")
  }

  test("nbMarginCalibration: separable docs land high bins with exact " +
      "accuracy, ambiguous ones low, counts conserve") {
    val spark0 = graft.TestSpark.spark
    import spark0.implicits._
    import org.apache.spark.sql.functions.col
    val train = Seq(
      (1L, "apple apple apple pear fruit", "fruit", "train"),
      (2L, "apple pear pear fruit fruit", "fruit", "train"),
      (3L, "zebra lion zebra savanna lion", "animal", "train"),
      (4L, "lion zebra savanna savanna zebra", "animal", "train"))
    val test = Seq(
      (5L, "apple apple pear pear apple pear fruit fruit", "fruit", "test"),
      (6L, "zebra zebra lion lion savanna savanna zebra lion", "animal",
        "test"),
      // one shared-vocabulary-free token each way: near-tie margin
      (7L, "apple zebra", "fruit", "test"))
    val df = (train ++ test).toDF("doc_id", "text", "label", "split")
    val got = Classify.nbMarginCalibration(df, "doc_id", "text", "label",
        col("split") === "train", binWidth = 2.0, nBins = 4)
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(got.map(_._2).sum == 3L, "every test doc has a runner-up")
    assert(got.map(_._1) == got.map(_._1).sorted, "bins ascend")
    // the two separable docs have margins ~ 6 ln-units -> the clamp bin;
    // the mixed doc's margin is < 2 -> bin 0
    val byBin = got.map(t => t._1 -> t).toMap
    assert(byBin(3L)._2 == 2L && byBin(3L)._4 == 1.0,
      s"separable docs must clamp into the top bin with accuracy 1: $got")
    assert(byBin(0L)._2 == 1L, s"the ambiguous doc lands in bin 0: $got")
    // accuracy is the exact division n_correct/n
    assert(got.forall(t => t._4 == t._3.toDouble / t._2))
    // a single-label grid has no runner-up: empty output, not a crash
    val solo = Seq((1L, "apple", "fruit", "train"),
      (2L, "pear", "fruit", "test")).toDF("doc_id", "text", "label", "split")
    assert(Classify.nbMarginCalibration(solo, "doc_id", "text", "label",
      col("split") === "train").count() == 0L)
  }

  // The q316 gate pins determinism on the real tables (where the
  // synthetic lang label carries almost no text signal — the q145
  // confusion-matrix convention); LEARNING is pinned here on a
  // controlled separable fixture instead.
  test("logisticTrain learns a separable rule; trajectory is partition-order invariant") {
    // 200 points on a dyadic grid: y is a threshold rule on x1; x2
    // cycles independently of y (a pure noise dimension)
    val rows = (0 until 200).map { i =>
      val x1 = (i % 16) / 16.0
      val x2 = ((i / 16) % 8) / 8.0
      (if (x1 >= 0.5) 1.0 else 0.0, x1, x2)
    }
    val df = rows.toDF("y", "x1", "x2")
    def run(parts: Int) = Classify.logisticTrain(df.repartition(parts),
      Seq("x1", "x2"), "y", eta = 1.0, rounds = 40).collect()
    val traj = run(1)
    // the 6-decimal gradient rounding makes each round's update
    // accumulation-order independent: 1 partition ≡ 8 partitions
    assert(traj.map(_.toString).toSeq === run(8).map(_.toString).toSeq)
    val last = traj.last
    val (b, w1, w2) =
      (last.getDouble(1), last.getDouble(2), last.getDouble(3))
    assert(w1 > 0, s"separating weight must be positive: $w1")
    assert(math.abs(w2) < w1 / 4,
      s"noise dimension must stay small: w2=$w2 vs w1=$w1")
    // classify the fixture with the learned weights: the rule is
    // recovered (margin 1/16 around the 0.5 threshold)
    val acc = rows.count { case (y, x1, x2) =>
      val p = 1.0 / (1.0 + math.exp(-(b + w1 * x1 + w2 * x2)))
      (if (p >= 0.5) 1.0 else 0.0) == y
    }.toDouble / rows.size
    assert(acc >= 0.95, s"learned accuracy $acc")
    // weights move monotonically outward early (no oscillation at this
    // eta): |w1| never shrinks round-over-round
    val w1s = traj.map(_.getDouble(2)).toSeq
    assert(w1s.zip(w1s.tail).forall { case (a, c) => c >= a - 1e-12 },
      s"w1 trajectory must be non-decreasing: $w1s")
  }
}
