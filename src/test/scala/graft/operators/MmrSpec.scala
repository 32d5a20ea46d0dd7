package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MmrSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("mmrSelect: redundancy penalty displaces the near-duplicate runner-up") {
    // query (1,0). a=(2,1) and b=(4,2) are PARALLEL (cos(a,b)=1) with the
    // top rel ≈ 0.894427; c=(1,-1) has lower rel ≈ 0.707107 but low
    // similarity to a (cos ≈ 0.316228). Plain top-2 = {a, b}; MMR's
    // second pick must be c: score(b) = 0.5·0.894427 − 0.5·1 < 0 while
    // score(c) = 0.5·(0.707107 − 0.316228) > 0.
    val e = Seq(
      (1L, Array(2.0, 1.0)),
      (2L, Array(4.0, 2.0)),
      (3L, Array(1.0, -1.0))
    ).toDF("vec_id", "embedding")
    val q = Seq(Tuple1(Array(1.0, 0.0))).toDF("qv")
    val got = SimilaritySearch.mmrSelect(e, "vec_id", "embedding", q,
        m = 3, k = 2)
      .orderBy("rank").select("rank", "sel_id", "rel", "mmr")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(got.map(_._2) == Seq(1L, 3L),
      s"expected diversified picks (1, 3), got ${got.map(_._2)}")
    // rank-1 score is 0.5·rel − 0 on the ROUNDED rel
    assert(math.abs(got(0)._4 - 0.5 * got(0)._3) < 1e-15)
    assert(got(1)._4 > 0.0)
  }

  test("mmrSelect: rel ties break on the smaller id; k caps the output") {
    // identical vectors → identical rel; greedy must take id order
    val e = Seq(
      (7L, Array(1.0, 0.0)), (3L, Array(1.0, 0.0)), (5L, Array(1.0, 0.0))
    ).toDF("vec_id", "embedding")
    val q = Seq(Tuple1(Array(1.0, 0.0))).toDF("qv")
    val got = SimilaritySearch.mmrSelect(e, "vec_id", "embedding", q,
        m = 3, k = 2)
      .orderBy("rank").select("sel_id").as[Long].collect().toSeq
    assert(got == Seq(3L, 5L))
    intercept[IllegalArgumentException] {
      SimilaritySearch.mmrSelect(e, "vec_id", "embedding", q, m = 1, k = 2)
    }
  }
}
