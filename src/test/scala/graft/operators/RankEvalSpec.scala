package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RankEvalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rnd6(x: Double): Double =
    BigDecimal(x + 1e-9).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble

  test("rankingMetrics: hand-computed recall/RR/nDCG, empty system side") {
    val gold = Seq((1L, "a", 1L), (1L, "b", 2L), (1L, "c", 3L),
      (2L, "z", 1L)).toDF("query_id", "doc_id", "rank")
    // system for q1 swaps a/b and invents x; q2 has NO system rows
    val sys = Seq((1L, "b", 1L), (1L, "a", 2L), (1L, "x", 3L))
      .toDF("query_id", "doc_id", "rank")
    val got = RankEval.rankingMetrics(sys, gold, k = 3)
      .as[(Long, Long, Long, Double, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    val ln2 = math.log(2.0)
    val dcg = rnd6((3 + 1 - 2) * ln2 / math.log(2.0) +
      (3 + 1 - 1) * ln2 / math.log(3.0))
    val idcg = rnd6(3 * ln2 / math.log(2.0) + 2 * ln2 / math.log(3.0) +
      1 * ln2 / math.log(4.0))
    assert(got(1L) == ((1L, 3L, 2L, 2.0 / 3, 1.0 / 2, dcg, idcg,
      rnd6(dcg / idcg))), s"got ${got(1L)}")
    // q2: gold exists, the system returned nothing — all zeros
    val idcg2 = rnd6((3 + 1 - 1) * ln2 / math.log(2.0))
    assert(got(2L) == ((2L, 1L, 0L, 0.0, 0.0, 0.0, idcg2, rnd6(0.0))),
      s"got ${got(2L)}")
  }
}
