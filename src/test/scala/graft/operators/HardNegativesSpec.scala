package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class HardNegativesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hard negatives: label-disjoint, self-excluded, k-bounded, rank-contiguous") {
    val e = graft.Tables.embeddings(spark, TestSpark.sf)
    val qs = e.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"),
        $"label".as("query_label"))
    val got = SimilaritySearch.hardNegatives(e, qs, k = 5,
        vecCol = "embedding", idCol = "vec_id", labelCol = "label")
      .select($"query_id", $"query_label".cast("int"), $"vec_id",
        $"label".cast("int"), $"rank")
      .as[(Long, Int, Long, Int, Int)].collect()
    assert(got.nonEmpty)
    assert(got.forall { case (_, ql, _, l, _) => ql != l },
      "a hard negative must never share the query's label")
    assert(got.forall { case (q, _, id, _, _) => q != id },
      "the query's own row is excluded (it shares its own label)")
    val perQuery = got.groupBy(_._1)
    assert(perQuery.values.forall(_.length <= 5))
    perQuery.foreach { case (q, rows) =>
      assert(rows.map(_._5).sorted.toSeq == (1 to rows.length),
        s"ranks for query $q must be contiguous from 1")
    }
  }

  test("crafted case: nearest same-label row is skipped, not just re-ranked") {
    // query q (label 0) is most similar to id=1 (label 0) — the positive
    // must be skipped and the top negative must be id=2 (label 1), even
    // though its score is lower.
    val coll = Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(0.9f, 0.1f), 1),
      (3L, Array(0.0f, 1.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val qs = Seq((0L, Array(1.0f, 0.0f), 0))
      .toDF("query_id", "query_vec", "query_label")
    val got = SimilaritySearch.hardNegatives(coll, qs, k = 2,
        vecCol = "embedding", idCol = "vec_id", labelCol = "label")
      .orderBy("rank").select("vec_id").as[Long].collect().toSeq
    assert(got == Seq(2L, 3L))
  }

  test("rrfFuse: hand-computed fusion, absence contributes nothing") {
    // list A ranks docs 1,2,3; list B ranks 2,1 — doc 2: 1/62 + 1/61,
    // doc 1: 1/61 + 1/62 (tie with 2 → id tie-break), doc 3: 1/63 only
    val a = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("doc_id", "rank")
    val b = Seq((2L, 1L), (1L, 2L)).toDF("doc_id", "rank")
    val out = SimilaritySearch.rrfFuse(Seq(a, b), "doc_id", k = 10)
      .select("doc_id", "rrf", "n_lists")
      .as[(Long, Double, Long)].collect().toSeq
    val both = BigDecimal(1.0 / 61 + 1.0 / 62 + 1e-9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val solo = BigDecimal(1.0 / 63 + 1e-9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out == Seq((1L, both, 2L), (2L, both, 2L), (3L, solo, 1L)),
      s"fusion diverged: $out")
  }

  test("embeddingDiversity: matches brute-force pairwise, singleton null") {
    val df = Seq(
      ("g", Array(1.0f, 0.0f)),
      ("g", Array(0.0f, 1.0f)),
      ("g", Array(1.0f, 1.0f)),
      ("solo", Array(3.0f, 4.0f)),
      ("dup", Array(2.0f, 0.0f)),
      ("dup", Array(5.0f, 0.0f))
    ).toDF("label", "embedding")
    val out = SimilaritySearch.embeddingDiversity(df, "label", "embedding")
      .orderBy("label")
      .select("label", "n", "avg_cos")
      .as[(String, Long, Option[Double])].collect().toSeq
      .map(r => r._1 -> (r._2, r._3)).toMap
    // brute force over g's three unit vectors: cos12=0, cos13=cos23=1/√2
    val expected = BigDecimal(
        (0.0 + 1.0 / math.sqrt(2) + 1.0 / math.sqrt(2)) / 3.0 + 1e-9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out("g") == ((3L, Some(expected))),
      s"diversity ${out("g")} != brute force $expected")
    // a singleton has no pairs: null, not 0 (and not a crash)
    assert(out("solo") == ((1L, None)))
    // collinear vectors: mean pairwise cosine exactly 1
    assert(out("dup")._1 == 2L &&
      math.abs(out("dup")._2.get - 1.0) < 1e-6)
  }
}
