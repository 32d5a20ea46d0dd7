package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class VectorPrepSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("randomProject: deterministic, linear, norm-preserving in expectation") {
    val e = graft.Tables.embeddings(spark, TestSpark.sf)
    def proj(df: org.apache.spark.sql.DataFrame) =
      VectorPrep.randomProject(df, "embedding", inDim = 64, outDim = 8)
        .select($"vec_id", $"projected").as[(Long, Seq[Double])]
        .collect().toMap
    val p1 = proj(e)
    val p2 = proj(e)
    assert(p1 == p2, "projection must be deterministic")
    assert(p1.values.forall(_.length == 8))
    // JL expectation: E[||Rx||²] = ||x||² — the corpus-mean ratio of
    // projected to original squared norm should sit near 1
    val orig = e.select($"vec_id", graft.functions.l2_norm($"embedding"))
      .as[(Long, Double)].collect().toMap
    val ratios = p1.map { case (id, p) =>
      val pn2 = p.map(x => x * x).sum
      val on = orig(id)
      pn2 / (on * on)
    }
    val mean = ratios.sum / ratios.size
    assert(mean > 0.7 && mean < 1.3,
      s"mean squared-norm ratio $mean should be near 1 (JL expectation)")
  }

  test("standardize: zero mean, unit variance per dim; zero-variance dims centered") {
    val df = Seq(
      (1L, Array(1.0f, 5.0f, 7.0f)),
      (2L, Array(3.0f, 5.0f, 9.0f)),
      (3L, Array(5.0f, 5.0f, 11.0f))).toDF("vec_id", "embedding")
    val stats = VectorPrep.dimStats(df, "embedding")
    assert(stats(0)._1 == 3.0 && stats(0)._2 == 2.0) // mean 3, std 2
    assert(stats(1)._2 == 0.0, "constant dim has zero std")
    val z = VectorPrep.standardize(df, "embedding", stats)
      .select($"vec_id", $"standardized").as[(Long, Seq[Double])]
      .collect().toMap
    assert(z(1L) == Seq(-1.0, 0.0, -1.0))
    assert(z(2L) == Seq(0.0, 0.0, 0.0))
    assert(z(3L) == Seq(1.0, 0.0, 1.0),
      "zero-variance dim must center without dividing by zero")
  }

  test("centroidsByKey: per-dim means in long form, rounded, double math") {
    val df = Seq(
      ("a", Array(1.0f, 2.0f)), ("a", Array(3.0f, 4.0f)),
      ("b", Array(10.0f, 0.0f))).toDF("k", "embedding")
    val got = VectorPrep.centroidsByKey(df, "k", "embedding")
      .as[(String, Int, Double)].collect().toSet
    assert(got == Set(
      ("a", 0, 2.0), ("a", 1, 3.0), ("b", 0, 10.0), ("b", 1, 0.0)))
    // rounding: mean of (0.1f, 0.2f) in double, 6dp
    val r = VectorPrep.centroidsByKey(
        Seq(("c", Array(0.1f, 0.0f)), ("c", Array(0.2f, 0.0f))).toDF("k", "embedding"),
        "k", "embedding")
      .filter($"pos" === 0).as[(String, Int, Double)].head()
    val expect = BigDecimal((0.1f.toDouble + 0.2f.toDouble) / 2 + 1e-9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r._3 == expect)
  }

  test("clusteredFixture: sign bucket equals cluster id by construction") {
    val ids = graft.Tables.embeddings(spark, graft.TestSpark.sf)
      .select("vec_id")
    val f = VectorPrep.clusteredFixture(ids, "vec_id", dim = 16, kClusters = 8)
    val mism = VectorIndex.assignSignBuckets(f, "fvec", nBits = 8)
      .filter(col("cluster_id") =!= col("vec_id") % 8)
      .count()
    assert(mism == 0, s"$mism members land outside their cluster's bucket")
    // components are exact dyadic rationals bounded away from zero, so
    // the sign is never ambiguous and floats hold them exactly
    val tiny = f.select(explode(col("fvec")).as("x"))
      .filter(abs(col("x")) < 0.01).count()
    assert(tiny == 0, "fixture components must stay clear of the sign boundary")
  }

  test("q162 fixture recall gate: residual >= plain >= usable, every query") {
    val out = graft.queries.VectorQueries
      .queries("q162_fixture_recall")(spark, graft.TestSpark.sf)
      .as[(Long, Long, Double, Long, Double)].collect()
    assert(out.length == 5)
    out.foreach { case (qid, _, rp, _, rr) =>
      assert(rr >= rp, s"query $qid: residual recall $rr < plain $rp")
      assert(rr >= 0.9, s"query $qid: residual recall $rr below 0.9")
      assert(rp >= 0.5, s"query $qid: plain recall $rp collapsed")
    }
  }
}
