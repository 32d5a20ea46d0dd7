package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class KMeansLloydSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("lloydOnce: total assignment, self-assigned seeds, k=1 degenerate") {
    val e = graft.Tables.embeddings(spark, TestSpark.sf)
    val n = e.count()
    val out = VectorIndex.lloydOnce(e, "vec_id", "embedding", k = 8)
    val rows = out.select($"vec_id", $"c_init", $"c_refined")
      .as[(Long, Long, Long)].collect()
    assert(rows.length == n, "every vector must be assigned")
    assert(rows.forall(r => r._2 >= 1 && r._2 <= 8))
    assert(rows.forall(r => r._3 >= 1 && r._3 <= 8))
    assert(rows.map(_._2).distinct.length > 1, "8 seeds must actually split the data")
    val k1 = VectorIndex.lloydOnce(e, "vec_id", "embedding", k = 1)
      .select($"c_init", $"c_refined").as[(Long, Long)].collect()
    assert(k1.forall(_ == ((1L, 1L))), "k=1 puts everything in cluster 1")
  }

  test("lloydOnce separates two well-separated blobs after one step") {
    // blob A near (0, 0, ...), blob B near (100, 100, ...); any seeding
    // refines to a perfect split because the refined centroids land in
    // their blobs' convex hulls
    val rnd = new scala.util.Random(5)
    def jitter() = Array.fill(8)(rnd.nextFloat() * 0.5f)
    val a = (0L until 20L).map(i => (i, jitter()))
    val b = (20L until 40L).map(i => (i, jitter().map(_ + 100f)))
    val df = (a ++ b).toDF("vec_id", "embedding")
    val got = VectorIndex.lloydOnce(df, "vec_id", "embedding", k = 2)
      .select($"vec_id", $"c_refined").as[(Long, Long)].collect().toMap
    val clustersA = (0L until 20L).map(got).toSet
    val clustersB = (20L until 40L).map(got).toSet
    assert(clustersA.size == 1 && clustersB.size == 1 && clustersA != clustersB,
      s"one refinement must separate the blobs: A→$clustersA B→$clustersB")
  }
}
