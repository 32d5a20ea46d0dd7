package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.GraftDatabase

/** [[StreamingIngest.streamTagIngest]] — continuous tagging, the TAG
  * lifecycle's streaming twin. What the q361 gate (single micro-batch)
  * cannot see:
  *
  *  - CROSS-BATCH maintenance: each micro-batch's refresh commits before
  *    the next batch lands, and each refresh scores only its own batch
  *    (the (id, payload_md5) diff) — segments accumulate per batch;
  *  - STRUCTURAL replay idempotency: ids are write-once (id anti-join
  *    before the append), so re-processing the same files from a fresh
  *    checkpoint appends nothing and changes no attribute.
  */
class StreamingTagSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def writeFile(src: java.nio.file.Path,
      rows: Seq[(Long, String)], name: String): Unit = {
    val tmp = Files.createTempDirectory("graft_tag_tmp").toString
    rows.toDF("id", "payload").coalesce(1).write.mode("overwrite")
      .parquet(tmp)
    val part = new java.io.File(tmp).listFiles
      .find(f => f.getName.endsWith(".parquet")).get
    Files.copy(part.toPath, src.resolve(name))
    ()
  }

  test("checkpoint restart replaying a committed batch changes nothing") {
    val parent = Files.createTempDirectory("graft_tag_ckpt_db").toString
    val d = GraftDatabase.create(spark, parent, "db")
    d.createCollection("docs", StructType(Seq(
      StructField("id", LongType), StructField("payload", StringType))))
    d.reindexAttrs("docs")
    val src = Files.createTempDirectory("graft_tag_ckpt_src")
    writeFile(src, Seq((1L, "the cat sat on the mat")), "b1.parquet")
    Thread.sleep(1100)
    writeFile(src, Seq((2L, "der hund und die katze")), "b2.parquet")
    val ckpt = Files.createTempDirectory("graft_tag_ckpt").toString
    val arrivals = (raw: org.apache.spark.sql.DataFrame) =>
      raw.select(col("id"), col("payload"))
    val out = StreamingIngest.streamTagIngest(spark, src.toString,
        d, "docs", arrivals, maxFilesPerTrigger = Some(1),
        glob = "*.parquet", checkpointLocation = Some(ckpt))
      .as[(Long, Long, String, Double, Long)].collect().sorted.toSeq
    assert(out.map(_._1) == Seq(1L, 2L))
    // force a TRUE driver-restart replay of batch 1: delete its commit
    // record AND the local ChecksumFs's crc sibling (deleting only the
    // commit makes the re-commit's rename throw FileAlreadyExists — the
    // checkpoint kill-and-restart rule), so the restarted query re-runs
    // the batch with the same batchId
    assert(new java.io.File(s"$ckpt/commits/1").delete())
    new java.io.File(s"$ckpt/commits/.1.crc").delete()
    val replay = StreamingIngest.streamTagIngest(spark, src.toString,
        d, "docs", arrivals, maxFilesPerTrigger = Some(1),
        glob = "*.parquet", checkpointLocation = Some(ckpt))
      .as[(Long, Long, String, Double, Long)].collect().sorted.toSeq
    assert(replay == out, "the replayed batch must change no attribute")
    assert(d.read("docs").count() == 2L,
      "the replayed batch must not duplicate ids")
  }

  test("two micro-batches accumulate; full replay from a fresh checkpoint is a no-op") {
    val parent = Files.createTempDirectory("graft_stream_tag").toString
    val d = GraftDatabase.create(spark, parent, "db")
    d.createCollection("docs", StructType(Seq(
      StructField("id", LongType), StructField("payload", StringType))))
    d.reindexAttrs("docs") // TAG the empty collection: per-batch = refresh

    val src = Files.createTempDirectory("graft_tag_src")
    writeFile(src, Seq((1L, "the cat sat on the mat")), "b1.parquet")
    Thread.sleep(1100) // distinct mtimes pin micro-batch order
    writeFile(src, Seq((2L, "der hund und die katze ist nicht das")),
      "b2.parquet")

    val arrivals = (raw: org.apache.spark.sql.DataFrame) =>
      raw.select(col("id"), col("payload"))
    val out = StreamingIngest.streamTagIngest(spark, src.toString,
        d, "docs", arrivals, maxFilesPerTrigger = Some(1),
        glob = "*.parquet")
      .as[(Long, Long, String, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L)._3 == "en" && out(2L)._3 == "de")
    assert(d.read("docs").count() == 2L)

    // replay EVERYTHING (fresh checkpoint → the file source re-reads both
    // files): the anti-join drops every id, no row duplicates, attributes
    // bit-identical
    val replay = StreamingIngest.streamTagIngest(spark, src.toString,
        d, "docs", arrivals, maxFilesPerTrigger = Some(1),
        glob = "*.parquet")
      .as[(Long, Long, String, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(replay == out)
    assert(d.read("docs").count() == 2L,
      "a replayed batch must not duplicate ids")
    assert(d.listIndexes("docs").as[(String, String)].collect()
      .contains(("attrs", "live")))
  }
}
