package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Quality characterization of the sign-bucket IVF probe: recall@10 vs the
  * exact scan across probe radii, on the real embeddings table. The data is
  * deterministic, so these are fixed properties of the index, not flaky
  * statistics: radius widens → recall must be monotone non-decreasing, and
  * the scanned fraction quantifies the cost side of the trade.
  */
class IvfRecallSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("probe recall@10 grows with radius and the scan stays pruned") {
    val e = graft.Tables.embeddings(spark, TestSpark.sf)
    val indexed = VectorIndex.assignSignBuckets(e, "embedding", nBits = 8).cache()
    val total = indexed.count()

    val queryIds = Seq(1L, 17L, 101L, 250L, 444L)
    val recalls = (0 to 2).map { radius =>
      val hits = queryIds.map { qid =>
        val q = e.filter($"vec_id" === qid)
          .select("embedding").head().getSeq[Float](0).toArray
        val exact = SimilaritySearch
          .topK(e.filter($"vec_id" =!= qid), q, 10, "cosine",
            vecCol = "embedding", idCol = "vec_id")
          .select("vec_id").as[Long].collect().toSet
        val probed = VectorIndex
          .probe(indexed.filter($"vec_id" =!= qid), q, 10, "cosine",
            nBits = 8, radius = radius, vecCol = "embedding", idCol = "vec_id")
          .select("vec_id").as[Long].collect().toSet
        (exact intersect probed).size
      }.sum
      hits.toDouble / (queryIds.size * 10)
    }

    // monotone in radius. The absolute values are LOW on this corpus
    // (measured: 0.0 / 0.06 / 0.30 for radius 0/1/2) because these
    // embeddings are near-isotropic — top-10 neighbors sit at cosine ≈ 0.4
    // and don't share sign patterns OR labels, so no bucketing scheme
    // recalls well at aggressive pruning. This is a property of the data
    // the spec documents, and exactly why GraftDatabase.searchSimilar
    // defaults to the exact scan with probing as an explicit opt-in.
    assert(recalls(0) <= recalls(1) + 1e-9 && recalls(1) <= recalls(2) + 1e-9,
      s"recall not monotone: $recalls")
    assert(recalls(2) >= 0.25, s"radius-2 recall collapsed: $recalls")

    // and the cost side: radius 1 scans only buckets within hamming 1 —
    // 9 of 256 codes ⇒ a small fraction of the collection
    val q0 = e.filter($"vec_id" === 1).select("embedding").head().getSeq[Float](0).toArray
    val candidates = VectorIndex.codesWithin(
      VectorIndex.signBucketOf(q0, 8), 8, 1)
    val scanned = indexed.filter($"cluster_id".isin(candidates: _*)).count()
    assert(candidates.size == 9)
    assert(scanned < total / 5,
      s"radius-1 probe scanned $scanned of $total rows — pruning is broken")
    indexed.unpersist()
  }
}
