package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The property suite SURVEY §5 commits to (beyond the cosine invariants in
  * VectorExpressionsSpec): top-k nesting, mutation idempotence, and
  * approximate-aggregate error bounds.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("top-k ⊆ top-(k+1) for k = 1..15 (cosine and l2)") {
    val e = graft.Tables.embeddings(spark, TestSpark.sf)
    val q = e.filter($"vec_id" === 3).select("embedding").head().getSeq[Float](0).toArray
    for (metric <- Seq("cosine", "l2")) {
      var prev = Set.empty[Long]
      (1 to 15).foreach { k =>
        val ids = SimilaritySearch
          .topK(e, q, k, metric, vecCol = "embedding", idCol = "vec_id")
          .select("vec_id").as[Long].collect().toSet
        assert(ids.size == k)
        assert(prev.subsetOf(ids), s"top-${k - 1} ⊄ top-$k for $metric")
        prev = ids
      }
    }
  }

  test("upsert is idempotent; delete is idempotent; delete∘upsert removes") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val up = Seq((2L, "b2"), (4L, "d")).toDF("id", "v")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, String)].collect().toSet

    val once = Mutations.upsert(base, up)
    val twice = Mutations.upsert(once, up)
    assert(rows(once) == Set((1L, "a"), (2L, "b2"), (3L, "c"), (4L, "d")))
    assert(rows(twice) == rows(once), "upsert twice == upsert once")

    val del = Mutations.deleteWhere(once, col("id") === 2)
    val delTwice = Mutations.deleteWhere(del, col("id") === 2)
    assert(rows(del) == Set((1L, "a"), (3L, "c"), (4L, "d")))
    assert(rows(delTwice) == rows(del), "delete twice == delete once")

    // upsert after delete restores exactly the upserted version
    val restored = Mutations.upsert(del, Seq((2L, "b3")).toDF("id", "v"))
    assert(rows(restored).contains((2L, "b3")))
  }

  test("approx_count_distinct is within its rsd bound on real keys") {
    val li = graft.Tables.lineitem(spark, TestSpark.sf)
    val (approx, exact) = li.agg(
      approx_count_distinct("l_partkey", rsd = 0.05),
      countDistinct("l_partkey")).as[(Long, Long)].head()
    val err = math.abs(approx - exact).toDouble / exact
    assert(err <= 0.15, s"approx=$approx exact=$exact err=$err beyond 3×rsd")
  }
}
