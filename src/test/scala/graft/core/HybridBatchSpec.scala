package graft.core

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[GraftDatabase.searchHybridBatch]]'s dense-branch layout dispatch
  * (r13 verdict item 1 + advisor item 2): the kmeans probe must be
  * result-invariant at full nprobe, the ADC path is exercised by the
  * q310 gate, and probeRadius on a clustered layout with no batch probe
  * must be LOUD — never a silent exact scan the caller believes pruned.
  */
class HybridBatchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hybridDb(): GraftDatabase = {
    val parent = Files.createTempDirectory("graft_hybatch").toString
    val db = GraftDatabase.create(spark, parent, "db")
    db.createCollection("docs")
    val docs = graft.Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id").as("id"), col("text").as("payload"))
    val embs = graft.Tables.embeddings(spark, TestSpark.sf)
      .select(col("vec_id").as("id"), col("embedding"))
    db.bulkInsert("docs", docs.join(embs, Seq("id"))
      .select("id", "embedding", "payload").filter(col("id") < 300))
    db
  }

  private def queryBatch(): Seq[(Long, Seq[String], Array[Float])] = {
    val vecs = graft.Tables.embeddings(spark, TestSpark.sf)
      .filter(col("vec_id") < 2).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    Seq((0L, Seq("vector", "data"), vecs(0L)),
      (1L, Seq("join", "scan"), vecs(1L)))
  }

  test("kmeans dense branch probing ALL cells equals the exact batch scan") {
    val db = hybridDb()
    db.reindexKMeans("docs", k = 4)
    db.reindexPostings("docs", buckets = 16)
    val qs = queryBatch()
    // nprobe = k (all cells) makes the pruned candidate set the whole
    // corpus, so the fused output must be row-identical to the exact path
    val probed = db.searchHybridBatch("docs", qs, k = 5, kf = 10,
      probeRadius = 3).collect().toSeq
    val exact = db.searchHybridBatch("docs", qs, k = 5, kf = 10)
      .collect().toSeq
    assert(probed == exact)
    assert(probed.nonEmpty)
  }

  test("probeRadius on a clustered layout with no batch probe is loud") {
    val parent = Files.createTempDirectory("graft_hybatch").toString
    val db = GraftDatabase.create(spark, parent, "db")
    db.createCollection("docs", org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, containsNull = false)),
      org.apache.spark.sql.types.StructField("payload",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("cluster_id",
        org.apache.spark.sql.types.IntegerType))))
    // a user-supplied cluster_id column with NO index sidecar: the batch
    // dispatch has no geometry to probe with — must throw, not scan
    db.bulkInsert("docs", Seq(
      (0L, Array(1f, 0f), "vector data join scan", 0),
      (1L, Array(0f, 1f), "vector join", 1))
      .toDF("id", "embedding", "payload", "cluster_id"))
    val qs = Seq((0L, Seq("vector"), Array(1f, 0f)))
    val e = intercept[IllegalArgumentException] {
      db.searchHybridBatch("docs", qs, k = 2, kf = 2, probeRadius = 1)
        .collect()
    }
    assert(e.getMessage.contains("no batch probe"))
  }

  test("ADC dense branch requires shortlist >= kf") {
    val db = hybridDb()
    db.reindexIvfPq("docs", m = 8, ksub = 16, rounds = 1, kCells = 4)
    db.reindexPostings("docs", buckets = 16)
    val qs = queryBatch()
    intercept[IllegalArgumentException] {
      db.searchHybridBatch("docs", qs, k = 5, kf = 10, probeRadius = 1,
        shortlist = 5).collect()
    }
    // and with a valid shortlist the ADC branch serves the batch
    val out = db.searchHybridBatch("docs", qs, k = 5, kf = 10,
      probeRadius = 1, shortlist = 20)
    assert(out.columns.toSeq == Seq("query_id", "id", "rrf", "n_lists"))
    assert(out.select("query_id").distinct().count() == 2)
  }
}
