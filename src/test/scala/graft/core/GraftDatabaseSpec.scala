package graft.core

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.VectorRecord

class GraftDatabaseSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDb(): GraftDatabase = {
    val parent = Files.createTempDirectory("graftdb").toString
    GraftDatabase.create(spark, parent, "testdb")
  }

  test("init creates config + wal, refuses overwrite") {
    val parent = Files.createTempDirectory("graftdb").toString
    GraftDatabase.create(spark, parent, "db1")
    assert(Files.exists(java.nio.file.Paths.get(parent, "db1", "graft_config.json")))
    assert(Files.isDirectory(java.nio.file.Paths.get(parent, "db1", "graft_wal")))
    intercept[IllegalStateException] {
      GraftDatabase.create(spark, parent, "db1")
    }
    // open works; open of a non-db fails
    GraftDatabase.open(spark, s"$parent/db1")
    intercept[IllegalArgumentException] {
      GraftDatabase.open(spark, parent)
    }
  }

  test("create/list/drop collections") {
    val db = freshDb()
    db.createCollection("vecs")
    db.createCollection("docs")
    assert(db.collectionNames() == Seq("docs", "vecs"))
    assert(db.listCollections().as[String].collect().toSeq == Seq("docs", "vecs"))
    intercept[IllegalStateException] { db.createCollection("vecs") }
    db.dropCollection("docs")
    assert(db.collectionNames() == Seq("vecs"))
    intercept[IllegalStateException] { db.dropCollection("docs") }
  }

  test("empty collection reads as empty frame with declared schema") {
    val db = freshDb()
    db.createCollection("vecs")
    val df = db.read("vecs")
    assert(df.count() == 0)
    assert(df.columns.toSeq == Seq("id", "embedding", "payload"))
  }

  test("insert + bulkInsert + search") {
    val db = freshDb()
    db.createCollection("vecs")
    db.insert("vecs", VectorRecord(1L, Array(1.0f, 0.0f), "alice"))
    db.bulkInsert("vecs", Seq(
      VectorRecord(2L, Array(0.0f, 1.0f), "rabbit"),
      VectorRecord(3L, Array(1.0f, 1.0f), "queen")).toDF())
    assert(db.read("vecs").count() == 3)
    val found = db.search("vecs", expr("payload LIKE 'ra%'"))
    assert(found.select("id").as[Long].collect().toSeq == Seq(2L))
  }

  test("update upserts and delete filters, copy-on-write") {
    val db = freshDb()
    db.createCollection("vecs")
    db.bulkInsert("vecs", Seq(
      VectorRecord(1L, Array(1.0f, 0.0f), "a"),
      VectorRecord(2L, Array(0.0f, 1.0f), "b")).toDF())
    // upsert: replace id=2, add id=3
    db.update("vecs", Seq(
      VectorRecord(2L, Array(0.5f, 0.5f), "b2"),
      VectorRecord(3L, Array(1.0f, 1.0f), "c")).toDF())
    val after = db.read("vecs").orderBy("id")
      .select($"id", $"payload").as[(Long, String)].collect().toSeq
    assert(after == Seq((1L, "a"), (2L, "b2"), (3L, "c")))

    db.delete("vecs", expr("id = 1"))
    assert(db.read("vecs").select("id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
  }

  test("searchSimilar returns nearest by cosine") {
    val db = freshDb()
    db.createCollection("vecs")
    db.bulkInsert("vecs", Seq(
      VectorRecord(1L, Array(1.0f, 0.0f), "x-axis"),
      VectorRecord(2L, Array(0.0f, 1.0f), "y-axis"),
      VectorRecord(3L, Array(0.9f, 0.1f), "near-x")).toDF())
    val top = db.searchSimilar("vecs", Array(1.0f, 0.0f), 2)
      .select("id").as[Long].collect().toSeq
    assert(top == Seq(1L, 3L))
  }

  test("reindex partitions by cluster_id and probe finds neighbors") {
    val db = freshDb()
    db.createCollection("vecs")
    val rows = (0 until 64).map { i =>
      val v = Array(if ((i & 1) == 0) 1.0f else -1.0f,
        if ((i & 2) == 0) 1.0f else -1.0f, i.toFloat / 64)
      VectorRecord(i.toLong, v, s"p$i")
    }
    db.bulkInsert("vecs", rows.toDF())
    db.reindexWith("vecs", df =>
      graft.operators.VectorIndex.assignSignBuckets(df, nBits = 2))
    val indexed = db.read("vecs")
    assert(indexed.columns.contains("cluster_id"))
    assert(indexed.select("cluster_id").distinct().count() == 4)
    val probed = graft.operators.VectorIndex.probe(
      indexed, Array(1.0f, 1.0f, 0.5f), k = 3, nBits = 2, radius = 0)
    assert(probed.count() == 3)
    // compaction keeps data
    db.compact(Some("vecs"), targetFiles = 2)
    assert(db.read("vecs").count() == 64)
  }

  test("searchSimilar auto-probes after reindex; mutations preserve the index") {
    val db = freshDb()
    db.createCollection("vecs")
    val rows = (0 until 32).map { i =>
      VectorRecord(i.toLong, Array(
        if ((i & 1) == 0) 1.0f else -1.0f,
        if ((i & 2) == 0) 1.0f else -1.0f,
        i.toFloat / 100 + 0.01f), s"p$i")
    }
    db.bulkInsert("vecs", rows.toDF())
    db.reindex("vecs", nBits = 2)

    // auto-probe (radius 0 = only the query's own bucket) returns only
    // same-sign-bucket neighbors; exact scan (radius -1) sees everything
    val probed = db.searchSimilar("vecs", Array(1.0f, 1.0f, 0.5f), k = 32,
      probeRadius = 0)
    assert(probed.count() == 8) // 32 ids / 4 buckets
    val exact = db.searchSimilar("vecs", Array(1.0f, 1.0f, 0.5f), k = 32,
      probeRadius = -1)
    assert(exact.count() == 32)

    // delete + compact keep the partition layout and the index sidecar
    db.delete("vecs", expr("id = 0"))
    db.compact(Some("vecs"), targetFiles = 2)
    assert(db.read("vecs").columns.contains("cluster_id"))
    val afterMutation = db.searchSimilar("vecs", Array(1.0f, 1.0f, 0.5f),
      k = 32, probeRadius = 0)
    assert(afterMutation.count() == 7) // id 0 was in this bucket

    // UPDATE on an indexed collection re-assigns buckets (the updated row
    // moves to the bucket its new vector belongs to)
    db.update("vecs", Seq(
      VectorRecord(1L, Array(-1.0f, -1.0f, -0.5f), "moved")).toDF())
    val moved = db.read("vecs").filter($"id" === 1)
      .select($"cluster_id".cast("int")).as[Int].head()
    assert(moved == 0) // both dims negative → sign bucket 0
  }

  test("delete with NULL-evaluating predicate keeps those rows (SQL semantics)") {
    val db = freshDb()
    db.createCollection("vecs")
    db.bulkInsert("vecs", Seq(
      (1L, Array(1.0f), "a"), (2L, Array(1.0f), null), (3L, Array(1.0f), "x")
    ).toDF("id", "embedding", "payload"))
    db.delete("vecs", expr("payload = 'x'")) // NULL payload ⇒ predicate NULL
    assert(db.read("vecs").select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L), "row with NULL payload must survive")
  }
}
