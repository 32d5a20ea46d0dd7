package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.GraftDatabase

/** The sink-side durable batch log ([[GraftDatabase.markBatchApplied]] /
  * [[GraftDatabase.appliedBatchTags]]) and its consumer
  * [[StreamingIngest.streamDeconScreen]]: a checkpoint-restarted decon
  * stream derives its skip set from DISK, so a replayed micro-batch
  * does not double-append verdict rows (the routing screen's sibling
  * contract — there the tag rides the sidecar's own commit marker,
  * StreamingRoutingSpec).
  */
class DurableBatchLogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def emptyDb(): GraftDatabase = {
    val parent = Files.createTempDirectory("graft_batchlog").toString
    GraftDatabase.create(spark, parent, "db")
  }

  test("batch log roundtrip: mark, list, survive re-open, die with the collection") {
    val d = emptyDb()
    d.createCollection("sink", StructType(Seq(
      StructField("id", LongType))))
    assert(d.appliedBatchTags("sink").isEmpty)
    d.markBatchApplied("sink", "decon-0")
    d.markBatchApplied("sink", "decon-3")
    assert(d.appliedBatchTags("sink") == Set("decon-0", "decon-3"))
    // idempotent re-mark
    d.markBatchApplied("sink", "decon-0")
    assert(d.appliedBatchTags("sink") == Set("decon-0", "decon-3"))
    // the record is DURABLE: a fresh handle on the same root sees it
    val reopened = GraftDatabase.open(spark, d.root.toString)
    assert(reopened.appliedBatchTags("sink") == Set("decon-0", "decon-3"))
    // path-unsafe tags refuse loudly (the tag names a marker file)
    assert(intercept[IllegalArgumentException] {
      d.markBatchApplied("sink", "decon:0")
    }.getMessage.contains("batch tag"))
    // the log must not outlive its collection
    d.dropCollection("sink")
    d.createCollection("sink", StructType(Seq(
      StructField("id", LongType))))
    assert(d.appliedBatchTags("sink").isEmpty,
      "a recreated collection must not inherit the old batch log")
  }

  test("streamDeconScreen skips micro-batches recorded in the sink's durable log") {
    val trainParent = Files.createTempDirectory("graft_batchlog_t").toString
    val trainDb = GraftDatabase.create(spark, trainParent, "db")
    trainDb.createCollection("train", StructType(Seq(
      StructField("id", LongType),
      StructField("embedding", ArrayType(FloatType, containsNull = false)))))
    trainDb.bulkInsert("train",
      graft.Tables.embeddings(spark, TestSpark.sf)
        .filter(col("vec_id") % 50 =!= 0)
        .select(col("vec_id").as("id"), col("embedding")))
    trainDb.reindexIvfPq("train", m = 8, ksub = 16, rounds = 1, kCells = 4)
    def freshSink(): GraftDatabase = {
      val p = Files.createTempDirectory("graft_batchlog_s").toString
      val s = GraftDatabase.create(spark, p, "db")
      s.createCollection("screened", StructType(Seq(
        StructField("eval_id", LongType),
        StructField("train_id", LongType),
        StructField("score", DoubleType),
        StructField("contaminated", LongType))))
      s
    }
    // a replay of an already-applied batch (the durable record exists,
    // this run's memory does not — the restart shape): nothing appends
    val replSink = freshSink()
    replSink.markBatchApplied("screened", "decon-0")
    val replayed = StreamingIngest.streamDeconScreen(spark, TestSpark.sf,
      trainDb, "train", replSink, "screened")
    assert(replayed.count() == 0L,
      "a durably-recorded micro-batch must be skipped on replay")
    // a clean run appends AND records its batch durably
    val sink = freshSink()
    val out = StreamingIngest.streamDeconScreen(spark, TestSpark.sf,
      trainDb, "train", sink, "screened")
    assert(out.count() > 0L)
    assert(sink.appliedBatchTags("screened") == Set("decon-0"))
  }
}
