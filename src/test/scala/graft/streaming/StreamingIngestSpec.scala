package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class StreamingIngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hourly windowed agg over the bounded event stream matches batch") {
    val streamed = StreamingIngest
      .hourlyEventCounts(spark, TestSpark.sf, "spec_hourly")
      .select("hour", "event_type", "n")
      .as[(String, String, Long)].collect().toSet
    val batch = graft.Tables.events(spark, TestSpark.sf)
      .groupBy(
        org.apache.spark.sql.functions.date_format(
          org.apache.spark.sql.functions.col("ts"), "yyyy-MM-dd HH").as("hour"),
        org.apache.spark.sql.functions.col("event_type"))
      .count()
      .as[(String, String, Long)].collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming quantile bins equal the batch q182 formulation") {
    import org.apache.spark.sql.functions._
    val streamed = StreamingIngest
      .streamQuantileBins(spark, TestSpark.sf, "spec_bins")
      .select("source", "bucket", "n", "lo", "hi")
      .as[(String, Long, Long, Double, Double)].collect().toSet
    val batch = graft.SparkEntry
      .queries("q182_quantile_bins")(spark, TestSpark.sf)
      .as[(String, Long, Long, Double, Double)].collect().toSet
    assert(streamed == batch,
      "stream-applied thresholds must reproduce the batch bins exactly")
    assert(streamed.nonEmpty)
  }

  test("streamApplyUpdates: CDC upserts drain through foreachBatch, layout survives") {
    import spark.implicits._
    import graft.model.VectorRecord
    val dbDir = Files.createTempDirectory("graft_cdc_db").toString
    val db = graft.core.GraftDatabase.create(spark, dbDir, "cdcdb")
    db.createCollection("vecs")
    db.bulkInsert("vecs", Seq(
      VectorRecord(1L, Array(1.0f, 1.0f), "a"),
      VectorRecord(2L, Array(-1.0f, 1.0f), "b")).toDF())
    db.reindex("vecs", nBits = 2)
    val upd = Files.createTempDirectory("graft_cdc_upd").toString
    // one edit (flips 1's quadrant → cluster 0) and one insert
    Seq(VectorRecord(1L, Array(-1.0f, -1.0f), "a2"),
        VectorRecord(3L, Array(1.0f, -1.0f), "c")).toDF()
      .write.parquet(s"$upd/u.parquet")
    val after = StreamingIngest
      .streamApplyUpdates(spark, db, "vecs", s"$upd/u.parquet")
      .select($"id", $"payload", $"cluster_id".cast("int"))
      .as[(Long, String, Int)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(after == Map(
      1L -> ("a2", 0), 2L -> ("b", 2), 3L -> ("c", 1)),
      "streamed upserts must apply with re-derived clusters")
    assert(db.indexTypeOf("vecs").contains("sign_bucket"),
      "the index sidecar must survive the update stream")
  }

  test("streamInto lands parquet rows through a checkpointed sink") {
    val src = Files.createTempDirectory("graft_stream_src")
    Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sf}/embeddings.parquet"),
      src.resolve("embeddings.parquet"))
    val out = Files.createTempDirectory("graft_stream_out").toString
    val ckpt = Files.createTempDirectory("graft_stream_ckpt").toString
    val schema = spark.read
      .parquet(s"${TestSpark.sf}/embeddings.parquet").schema.toDDL
    StreamingIngest.streamInto(spark, src.toString, schema, out, ckpt)
    assert(spark.read.parquet(out).count() ==
      spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet").count())
  }
}
