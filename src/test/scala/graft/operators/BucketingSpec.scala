package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucketed fact⋈fact join plans with no shuffle and correct rows") {
    val docs = graft.Tables.documents(spark, TestSpark.sf)
      .select($"doc_id", $"lang", $"source")
    val embs = graft.Tables.embeddings(spark, TestSpark.sf)
      .select($"vec_id".as("doc_id"), $"label")

    Bucketing.writeBucketed(docs, "b_docs", "doc_id", buckets = 8)
    Bucketing.writeBucketed(embs, "b_embs", "doc_id", buckets = 8)
    try {
      val joined = Bucketing.cozyJoin(spark, "b_docs", "b_embs", "doc_id")
      val plan = joined.queryExecution.executedPlan.toString

      assert(!plan.contains("Exchange"),
        s"bucketed join must be shuffle-free, got:\n${plan.take(1500)}")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))

      // and it is still the same join semantically
      val expected = docs.join(embs, Seq("doc_id")).count()
      assert(joined.count() == expected && expected > 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_docs")
      spark.sql("DROP TABLE IF EXISTS b_embs")
    }
  }
}
