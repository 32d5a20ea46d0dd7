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

  test("benfordDigits: sub-cent values are excluded from counts AND " +
      "totals together — observed and expected masses stay consistent") {
    // 0.004 rounds to 0 cents (digit 0, outside the 1..9 grid): it must
    // leave n as well as the grid, or every expected mass is inflated
    // (the r12 advisor finding). 0.005 rounds HALF_UP to 1 cent → digit 1.
    val df = Seq(
      ("g", 0.004), ("g", 0.005), ("g", 2.00), ("g", 9.99)
    ).toDF("grp", "amt")
    val got = NumericAudit.benfordDigits(df, "grp", "amt")
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(got.forall(_._4 == 3L),
      s"sub-cent row must not count in n: ${got.map(_._4)}")
    val byDigit = got.map(r => r._2 -> r._3).toMap
    assert(byDigit(1L) == 1L && byDigit(2L) == 1L && byDigit(9L) == 1L)
    assert(byDigit.values.sum == 3L, "grid must sum to n exactly")
  }

  private def cusumRows(vals: Seq[(String, Long, Long)], h: Long,
      chunk: Long = 4096) = {
    val df = vals.toDF("grp", "id", "v")
    NumericAudit.cusumDrift(df, "grp", "id", "v", target = 5L, h = h,
        chunkSize = chunk)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5),
        if (r.isNullAt(6)) -1L else r.getLong(6),
        if (r.isNullAt(7)) -1L else r.getLong(7))).toSeq
  }

  test("cusumDrift: hand-computed upward/downward shifts, clamp reset, " +
      "chunk-width invariance, integral contract") {
    // upward: devs 0,0,0,+4,+4,+4 → S_hi 0,0,0,4,8,12; lower side silent
    val up = (1L to 3L).map(i => ("g", i, 5L)) ++
      (4L to 6L).map(i => ("g", i, 9L))
    assert(cusumRows(up, h = 3) ==
      Seq(("g", 6L, 12L, 0L, 3L, 0L, 4L, -1L)))
    // downward: devs 0,0,-4,-4,-4 → S_lo 0,0,4,8,12; upper side silent
    val down = Seq(("g", 1L, 5L), ("g", 2L, 5L), ("g", 3L, 1L),
      ("g", 4L, 1L), ("g", 5L, 1L))
    assert(cusumRows(down, h = 3) ==
      Seq(("g", 5L, 0L, 12L, 0L, 3L, -1L, 3L)))
    // clamp: +4/-4 oscillation resets S to 0 each cycle, never alarms
    val osc = (1L to 8L).map(i => ("g", i, if (i % 2 == 1) 9L else 1L))
    assert(cusumRows(osc, h = 5) ==
      Seq(("g", 8L, 4L, 4L, 0L, 0L, -1L, -1L)))
    // chunk invariance: a 2-row chunk width must not change anything
    assert(cusumRows(up, h = 3, chunk = 2) == cusumRows(up, h = 3))
    assert(cusumRows(osc, h = 5, chunk = 2) == cusumRows(osc, h = 5))
    // exactness contract: float metric refused loudly
    val e = intercept[IllegalArgumentException] {
      NumericAudit.cusumDrift(Seq(("g", 1L, 1.5)).toDF("grp", "id", "v"),
        "grp", "id", "v", target = 1L, h = 1L)
    }
    assert(e.getMessage.contains("integral"))
  }
}
