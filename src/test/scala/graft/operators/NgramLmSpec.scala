package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class NgramLmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("lmScores: seen bigrams use c2/ctx, unseen back off, short docs drop") {
    // train: doc1 [a b a c], doc2 [a b] → c2: (a,b)=2 (b,a)=1 (a,c)=1;
    // ctx: a=3 b=1; cont: b=2 a=1 c=1; T=4 train bigrams
    val docs = Seq(
      (1L, "a b a c", true), (2L, "a b", true),
      (3L, "a b z", false), // (a,b) seen, (b,z) unseen with unseen w2
      (4L, "x", false) // one token → no bigrams → no output row
    ).toDF("doc_id", "text", "train")
    val got = NgramLm.lmScores(docs, "doc_id", "text", isTrain = $"train")
      .select($"doc_id", $"n_bigrams", $"raw_lp")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L), "doc 4 must drop out")
    assert(got.map(_._2).toSeq == Seq(3L, 1L, 2L))
    val lp1 = (math.log(2.0 / 3) + math.log(1.0 / 1) + math.log(1.0 / 3)) / 3
    val lp2 = math.log(2.0 / 3)
    val lp3 = (math.log(2.0 / 3) + math.log(0.4 * 0.5 / 4)) / 2
    assert(math.abs(got(0)._3 - lp1) < 1e-12, s"doc1: ${got(0)._3} vs $lp1")
    assert(math.abs(got(1)._3 - lp2) < 1e-12, s"doc2: ${got(1)._3} vs $lp2")
    assert(math.abs(got(2)._3 - lp3) < 1e-12, s"doc3: ${got(2)._3} vs $lp3")
    // the quality-filter property: in-distribution text outscores
    // out-of-vocabulary text
    assert(got(1)._3 > got(2)._3)
  }

  test("lmScores: minCount prunes the count table and the pruned model is self-consistent") {
    // train [a b a b a c]: c2 (a,b)=2 (b,a)=2 (a,c)=1. minCount=2 drops
    // (a,c) → pruned table: (a,b)=2 (b,a)=2; ctx: a=2 b=2; cont: a=2 b=2;
    // T=4. The pruned bigram (a,c) must now score exactly like a
    // never-seen one: 0.4 * (cont(c)=0 + 0.5) / 4 — cont from the PRUNED
    // table, not the raw one.
    val docs = Seq(
      (1L, "a b a b a c", true),
      (2L, "a c", false)
    ).toDF("doc_id", "text", "train")
    val got = NgramLm.lmScores(docs, "doc_id", "text", isTrain = $"train",
        minCount = 2)
      .select($"doc_id", $"raw_lp").as[(Long, Double)]
      .collect().sortBy(_._1).toMap
    val backoffAc = math.log(0.4 * 0.5 / 4)
    assert(math.abs(got(2L) - backoffAc) < 1e-12,
      s"pruned (a,c) must back off with pruned-table counts: ${got(2L)} vs $backoffAc")
    // doc1: (a,b)=2/2... ctx(a)=2 → ln(2/2)=0 twice, (b,a): ln(2/2)=0
    // twice, (a,c): backoff → mean over 5 bigrams
    val lp1 = (0 + 0 + 0 + 0 + backoffAc) / 5
    assert(math.abs(got(1L) - lp1) < 1e-12, s"${got(1L)} vs $lp1")
    // default minCount=1 must keep (a,c) seen: 1/ctx(a) = 1/(2+1)
    val exact = NgramLm.lmScores(docs, "doc_id", "text", isTrain = $"train")
      .filter($"doc_id" === 2L).select($"raw_lp").as[Double].head()
    assert(math.abs(exact - math.log(1.0 / 3)) < 1e-12)
  }

  test("lmScores: unseen w1 with seen w2 backs off through the continuation count") {
    val docs = Seq(
      (1L, "a b a b", true), // c2: (a,b)=2 (b,a)=1; cont: a=1 b=2; T=3
      (2L, "q a", false) // (q,a): q unseen context, cont(a)=1
    ).toDF("doc_id", "text", "train")
    val got = NgramLm.lmScores(docs, "doc_id", "text", isTrain = $"train")
      .filter($"doc_id" === 2L)
      .select($"raw_lp").as[Double].head()
    val expected = math.log(0.4 * (1 + 0.5) / 3)
    assert(math.abs(got - expected) < 1e-12, s"$got vs $expected")
  }

  test("katzScores: hand-built spectrum halves the r=1 mass, backoff finite") {
    // two-token train docs = exactly one bigram each. Counts:
    // (a,b)=1 (b,c)=1 (c,d)=2 (d,e)=2 (e,f)=6 (a,c)=7
    // → spectrum N1=2, N2=2, N6=1, N7=1; kCut=5:
    //   A = 6·N6/N1 = 3;  d1 = (2·N2/N1/1 − 3)/(1 − 3) = 0.5;
    //   d2 = 1 (N3 absent);  counts > 5 undiscounted.
    val train = (Seq("a b", "b c") ++ Seq.fill(2)("c d") ++
      Seq.fill(2)("d e") ++ Seq.fill(6)("e f") ++ Seq.fill(7)("a c"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t, true) }
    val test = Seq((100L, "a b", false), (101L, "a z", false))
    val df = (train ++ test).toDF("doc_id", "text", "train")
    val out = NgramLm.katzScores(df, "doc_id", "text",
        isTrain = col("train"))
      .filter(col("doc_id") >= 100L).orderBy("doc_id")
      .select("doc_id", "n_bigrams", "raw_kp")
      .as[(Long, Long, Double)].collect().toSeq
    // seen: p(b|a) = d1 · 1/ctx(a) = 0.5/8 — HALF the ML estimate
    assert(out.head._2 == 1L &&
      math.abs(out.head._3 - math.log(0.0625)) < 1e-9,
      s"discounted seen prob diverged: ${out.head}")
    // unseen z after a: alpha(a)·q(z), finite. Tokens N=38, V=6:
    // q(z)=0.5/41; skz = 0.0625 + 7/8; sq = q(b)+q(c) = 2.5/41+10.5/41
    def r12(x: Double): Double = BigDecimal(x + 1e-15)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    val alpha = (1.0 - r12(0.0625 + 7.0 / 8)) /
      (1.0 - r12(2.5 / 41 + 10.5 / 41))
    val pz = alpha * (0.5 / 41)
    assert(math.abs(out(1)._3 - math.log(pz)) < 1e-9,
      s"backoff prob diverged: ${out(1)._3} vs ${math.log(pz)}")
    intercept[IllegalArgumentException] {
      NgramLm.katzScores(df, "doc_id", "text", col("train"), kCut = 0)
    }
  }

  test("knScores: absolute discount, continuation backoff, unseen history") {
    // train bigrams: (a,b)=1 (b,c)=1 (c,d)=2 → spectrum n1=2, n2=1 →
    // D = 2/(2+2) = 0.5 exactly. B=3 types, V=4 (a b c d).
    // λ(a) = (0.5·1)/1 = 0.5; pc denominator B + 0.5·V = 5:
    // pc(b) = 1.5/5 = 0.3, OOV pc = 0.5/5 = 0.1, pc(a) = 0.1 (a is
    // never a continuation).
    val train = Seq("a b", "b c", "c d", "c d")
      .zipWithIndex.map { case (t, i) => (i.toLong, t, true) }
    val test = Seq((100L, "a b", false), // seen: (1−D)/1 + λ(a)·pc(b)
      (101L, "a z", false), // unseen bigram, seen history: λ(a)·pc(z)
      (102L, "z a", false)) // unseen history: pc(a)
    val df = (train ++ test).toDF("doc_id", "text", "train")
    val got = NgramLm.knScores(df, "doc_id", "text", isTrain = col("train"))
      .filter(col("doc_id") >= 100L).orderBy("doc_id")
      .select("doc_id", "n_bigrams", "raw_knp")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.map(_._2) == Seq(1L, 1L, 1L))
    val exp = Seq(
      math.log((1 - 0.5) / 1.0 + 0.5 * 0.3), // 0.65
      math.log(0.5 * 0.1), // 0.05
      math.log(0.1))
    got.map(_._3).zip(exp).zipWithIndex.foreach { case ((g, e), i) =>
      assert(math.abs(g - e) < 1e-12, s"case $i: $g vs $e")
    }
    // quality-filter property: the in-distribution doc outscores both
    // backoff docs, and the seen-history backoff beats the unseen one
    // only through λ vs pc (here 0.05 < 0.1 — λ halves the mass)
    assert(got(0)._3 > got(2)._3 && got(2)._3 > got(1)._3)
    // empty train slice must fail loudly, not emit ln(inf)
    intercept[IllegalArgumentException] {
      NgramLm.knScores(df, "doc_id", "text", isTrain = lit(false))
    }
  }
}
