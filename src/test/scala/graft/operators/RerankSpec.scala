package graft.operators

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RerankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def stubScore(q: Long, d: Long, text: String): Double =
    java.lang.Long.parseLong(
      md5hex(s"ce:$q:$d:${md5hex(text)}").take(8), 16) / 4294967296.0

  test("crossEncoderScore: md5 closed form, batching does not change rows") {
    val in = Seq(
      Rerank.RerankInput(1L, 10L, "alpha beta"),
      Rerank.RerankInput(1L, 11L, "gamma"),
      Rerank.RerankInput(2L, 10L, "alpha beta")).toDS()
    val got = Rerank.crossEncoderScore(in, batchSize = 2).collect()
      .map(r => (r.query_id, r.doc_id) -> r.ce_score).toMap
    assert(got((1L, 10L)) == stubScore(1L, 10L, "alpha beta"))
    assert(got((1L, 11L)) == stubScore(1L, 11L, "gamma"))
    // same doc under a different query scores differently (joint pair)
    assert(got((2L, 10L)) != got((1L, 10L)))
    val one = Rerank.crossEncoderScore(in, batchSize = 1).collect()
      .map(r => (r.query_id, r.doc_id) -> r.ce_score).toMap
    assert(one == got, "batch size must not change scores")
  }

  test("rerankBm25: the shortlist bounds eligibility before the boundary") {
    // docs 1 and 2 say 'vector' twice (top-2 shortlist); doc 3 says it
    // once — whatever its CE score, it can never appear at fbK = 2
    val docs = Seq(
      (1L, "vector vector apple"),
      (2L, "vector vector banana"),
      (3L, "vector cherry")).toDF("doc_id", "text")
    val got = Rerank.rerankBm25(docs, "doc_id", "text", queryId = 7L,
        terms = Seq("vector"), fbK = 2, k = 2)
      .as[(Long, Long, Double, Double)].collect()
    assert(got.map(_._2).toSet == Set(1L, 2L), s"got ${got.toSeq}")
    // ranked by the stub score, descending
    val s1 = stubScore(7L, 1L, "vector vector apple")
    val s2 = stubScore(7L, 2L, "vector vector banana")
    assert(got.head._4 == math.max(s1, s2))
    assert(got.forall(_._1 == 7L))
  }
}
