package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class NumericAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("benfordDigits: cent-exact digit extraction, zero-count digits " +
      "carry expected mass, chi2 replays the formula, non-positives drop") {
    // digits: 1.00→1, 19.99→1, 2.50→2, 300.00→3, 0.05→5; 0 and -4 drop
    val df = Seq(
      ("g", 1.00), ("g", 19.99), ("g", 2.50), ("g", 300.00), ("g", 0.05),
      ("g", 0.0), ("g", -4.0)
    ).toDF("grp", "amt")
    val got = NumericAudit.benfordDigits(df, "grp", "amt")
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(got.map(_._2) == (1L to 9L), "all nine digits must emit")
    assert(got.forall(_._4 == 5L))
    val byDigit = got.map(r => r._2 -> r._3).toMap
    assert(byDigit == Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 0L,
      5L -> 1L, 6L -> 0L, 7L -> 0L, 8L -> 0L, 9L -> 0L))
    // replay the operator's own op order (the q254 rule)
    val chi = (1 to 9).map { d =>
      val e = math.log(1.0 + 1.0 / d) / math.log(10.0) * 5.0
      val n = byDigit(d.toLong).toDouble
      (n - e) * (n - e) / e
    }.sum
    val r6 = BigDecimal(chi + 1e-9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.forall(_._5 == r6), s"chi2 ${got.head._5} != replay $r6")
  }
}
