package graft.core

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[GraftDatabase.deconScreen]] — the ANN-assisted semantic
  * decontamination contract (r14 verdict item 1):
  *
  *  - recall on PLANTED contamination (exact train copies) is 1.0
  *    through the codes-only ADC path, pinned against the exact screen;
  *  - the exact and ANN paths agree on every flag at the 0.5 threshold
  *    (an ANN miss can only LOWER a clean eval's score — never flip a
  *    clean eval to contaminated);
  *  - probeRadius on an unprobeable layout is LOUD, and a non-integral
  *    query_id refuses before any silent cast.
  */
class DeconScreenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def evalQ() = {
    val emb = graft.Tables.embeddings(spark, TestSpark.sf)
    val donors = emb.select((col("vec_id") - 1).as("vec_id"),
      col("embedding").as("donor_vec"))
    broadcast(emb.filter(col("vec_id") % 50 === 0))
      .join(donors, Seq("vec_id"))
      .select(col("vec_id").as("query_id"),
        when(expr("(vec_id DIV 50) % 3") === 0, col("donor_vec"))
          .otherwise(col("embedding")).as("query_vec"))
  }

  private def trainDb(): GraftDatabase = {
    val parent = Files.createTempDirectory("graft_decon").toString
    val db = GraftDatabase.create(spark, parent, "db")
    db.createCollection("train", org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, containsNull = false)))))
    db.bulkInsert("train", graft.Tables.embeddings(spark, TestSpark.sf)
      .filter(col("vec_id") % 50 =!= 0)
      .select(col("vec_id").as("id"), col("embedding")))
    db
  }

  test("planted-contamination recall is 1.0 through the ADC path; flags match the exact screen") {
    val db = trainDb()
    db.reindexIvfPq("train", m = 8, ksub = 16, rounds = 1, kCells = 4)
    val qs = evalQ()
    val ann = db.deconScreen("train", qs, threshold = 0.5,
        probeRadius = 1, shortlist = 20)
      .as[(Long, Long, Double, Long)].collect().toSeq
    val exact = db.deconScreen("train", qs, threshold = 0.5)
      .as[(Long, Long, Double, Long)].collect().toSeq
    assert(ann.nonEmpty && ann.map(_._1) == exact.map(_._1))
    val planted = ann.filter { case (eid, _, _, _) => (eid / 50) % 3 == 0 }
    assert(planted.nonEmpty, "fixture must contain planted evals")
    // every planted eval: detected at exactly 1.0, nearest = its donor
    planted.foreach { case (eid, tid, score, flag) =>
      assert(flag == 1L && score == 1.0 && tid == eid + 1,
        s"planted eval $eid: ($tid, $score, $flag)")
    }
    // recall vs the exact screen's contaminated set is 1.0, and no clean
    // eval is flagged (ANN can only lower a clean score)
    val exactFlags = exact.map(r => r._1 -> r._4).toMap
    ann.foreach { case (eid, _, _, flag) =>
      assert(flag == exactFlags(eid), s"flag mismatch on eval $eid")
    }
  }

  test("ADC screen answers from stored codes: codes-only scan, no corpus float read outside the rerank") {
    val db = trainDb()
    db.reindexIvfPq("train", m = 8, ksub = 16, rounds = 1, kCells = 4)
    val df = db.deconScreen("train", evalQ(), threshold = 0.5,
      probeRadius = 1, shortlist = 20)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // exactly ONE scan reads the codes, WITHOUT the embedding column,
    // pruned to the probed-cell partitions (the q310 pin, decon edition)
    val codeScans = "ReadSchema: struct<[^>]*pq_code[^>]*>".r.findAllIn(p)
      .toSeq
    assert(codeScans.size == 1 && !codeScans.head.contains("embedding"),
      s"expected ONE codes-only scan:\n${p.take(2000)}")
    assert("PartitionFilters: \\[[^\\]]*cluster_id".r.findFirstIn(p).isDefined,
      s"the ADC scan must prune to probed cells:\n${p.take(2000)}")
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("probeRadius on an unprobeable layout is loud; non-integral query_id refuses") {
    val db = trainDb()
    db.reindex("train", nBits = 4) // sign_bucket: no decon probe path
    val e = intercept[IllegalArgumentException] {
      db.deconScreen("train", evalQ(), probeRadius = 1, shortlist = 20)
        .collect()
    }
    assert(e.getMessage.contains("no decon probe"))
    val bad = evalQ().withColumn("query_id", concat(lit("q"),
      col("query_id").cast("string")))
    assert(intercept[IllegalArgumentException] {
      db.deconScreen("train", bad)
    }.getMessage.contains("integral"))
  }

  test("probeRadius on an UNINDEXED collection (no cluster_id) is loud — never a silent exact scan") {
    val db = trainDb() // no REINDEX at all
    val e = intercept[IllegalArgumentException] {
      db.deconScreen("train", evalQ(), probeRadius = 1)
    }
    assert(e.getMessage.contains("no cluster_id"), e.getMessage)
    // and WITHOUT probeRadius the exact screen still serves
    assert(db.deconScreen("train", evalQ()).count() > 0)
  }

  test("kmeans layout: pruned screen recall 1.0 on planted copies; flags match exact; shortlist refuses") {
    val db = trainDb()
    db.reindexKMeansMd5("train", k = 4, rounds = 1)
    val qs = evalQ()
    val pruned = db.deconScreen("train", qs, threshold = 0.5,
        probeRadius = 1)
      .as[(Long, Long, Double, Long)].collect().toSeq
    val exact = db.deconScreen("train", qs, threshold = 0.5)
      .as[(Long, Long, Double, Long)].collect().toSeq
    assert(pruned.nonEmpty && pruned.map(_._1) == exact.map(_._1))
    val planted = pruned.filter { case (eid, _, _, _) => (eid / 50) % 3 == 0 }
    assert(planted.nonEmpty, "fixture must contain planted evals")
    // a planted copy's assignment cell IS the query's #1 probe cell
    // (identical rounded argmin), so it is always scanned: 1.0, donor id
    planted.foreach { case (eid, tid, score, flag) =>
      assert(flag == 1L && score == 1.0 && tid == eid + 1,
        s"planted eval $eid: ($tid, $score, $flag)")
    }
    // pruning can only LOWER a clean score — no clean eval gains a flag
    val exactFlags = exact.map(r => r._1 -> r._4).toMap
    pruned.foreach { case (eid, _, _, flag) =>
      assert(flag == exactFlags(eid), s"flag mismatch on eval $eid")
    }
    // shortlist has no meaning on this layout: loud, not ignored
    assert(intercept[IllegalArgumentException] {
      db.deconScreen("train", qs, probeRadius = 1, shortlist = 20)
    }.getMessage.contains("no ADC rerank stage"))
  }

  test("kmeans pruned screen scans only probed cells (partition-pruned float scan)") {
    val db = trainDb()
    db.reindexKMeansMd5("train", k = 4, rounds = 1)
    val df = db.deconScreen("train", evalQ(), threshold = 0.5,
      probeRadius = 0) // nprobe = 1: a strict subset of cells
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("PartitionFilters: \\[[^\\]]*cluster_id".r.findFirstIn(p).isDefined,
      s"the kmeans screen must prune to probed cells:\n${p.take(2000)}")
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }
}
