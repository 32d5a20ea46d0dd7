package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.GraftDatabase

/** [[StreamingIngest.streamRouteSplits]] — the cross-batch contract the
  * q341 gate (single micro-batch, q337's oracle) cannot see: each
  * micro-batch's routed assignments COMMIT (and its arrivals are
  * admitted into the band artifact) before the next batch screens, so a
  * batch-2 arrival that near-dups only a BATCH-1 arrival inherits its
  * routed placement — the transitive-inheritance property, here across
  * the micro-batch seam.
  */
class StreamingRoutingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val corpusDocs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2L, "one two three four five six seven eight nine ten"),
    (3L, "red orange yellow green blue indigo violet cyan magenta white"))

  private val newText =
    "zork quux fnord blarg wibble wobble flib glorp snark quib"

  private def db(): GraftDatabase = {
    val parent = Files.createTempDirectory("graft_stream_route").toString
    val d = GraftDatabase.create(spark, parent, "db")
    d.createCollection("docs", StructType(Seq(
      StructField("id", LongType), StructField("payload", StringType))))
    d.bulkInsert("docs", corpusDocs.toDF("id", "payload"))
    d.reindexMinhash("docs", buckets = 4)
    d
  }

  test("two micro-batches: batch 2 inherits batch 1's ROUTED placement") {
    val d = db()
    d.buildSplits("docs")
    val src = Files.createTempDirectory("graft_route_src")
    def writeFile(rows: Seq[(Long, String)], name: String): Unit = {
      val tmp = Files.createTempDirectory("graft_route_tmp").toString
      rows.toDF("id", "payload").coalesce(1).write.mode("overwrite")
        .parquet(tmp)
      val part = new java.io.File(tmp).listFiles
        .find(f => f.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, src.resolve(name))
      ()
    }
    // the file source orders micro-batches by modification time: distinct
    // mtimes pin batch 1 (the new-content arrival) before batch 2 (its
    // exact copy — matching nothing in the ORIGINAL corpus)
    writeFile(Seq((100L, newText)), "a1.parquet")
    Thread.sleep(1100)
    writeFile(Seq((200L, newText)), "a2.parquet")

    val sinkParent = Files.createTempDirectory("graft_route_sink").toString
    val sink = GraftDatabase.create(spark, sinkParent, "sinkdb")
    sink.createCollection("routed", StructType(Seq(
      StructField("id", LongType),
      StructField("rep", LongType),
      StructField("split", StringType),
      StructField("n_matches", LongType),
      StructField("bridged", LongType))))

    val out = StreamingIngest.streamRouteSplits(spark, src.toString,
        d, "docs", sink, "routed",
        arrivals = raw => raw.select(col("id"), col("payload")),
        maxFilesPerTrigger = Some(1), glob = "*.parquet")
      .as[(Long, Long, String, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.keySet == Set(100L, 200L))
    // batch 1: new content → own-id fallback, committed
    assert(out(100L)._2 == 100L && out(100L)._4 == 0L, out(100L).toString)
    // batch 2: near-dups ONLY the routed batch-1 arrival → inherits it
    assert(out(200L)._2 == 100L && out(200L)._4 == 1L &&
      out(200L)._3 == out(100L)._3,
      s"batch 2 must inherit across the micro-batch seam: ${out(200L)}")
    // and the sidecar carries both commits
    assert(d.splitAssignments("docs")
      .filter(col("id").isin(100L, 200L)).count() == 2)
  }

  test("checkpoint restart: replayed micro-batch skips via the DURABLE tag record and heals the lost insert") {
    val d = db()
    d.buildSplits("docs")
    val src = Files.createTempDirectory("graft_route_src2")
    def writeFile(rows: Seq[(Long, String)], name: String): Unit = {
      val tmp = Files.createTempDirectory("graft_route_tmp2").toString
      rows.toDF("id", "payload").coalesce(1).write.mode("overwrite")
        .parquet(tmp)
      val part = new java.io.File(tmp).listFiles
        .find(f => f.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, src.resolve(name))
      ()
    }
    val sinkParent = Files.createTempDirectory("graft_route_sink2").toString
    val sink = GraftDatabase.create(spark, sinkParent, "sinkdb")
    sink.createCollection("routed", StructType(Seq(
      StructField("id", LongType),
      StructField("rep", LongType),
      StructField("split", StringType),
      StructField("n_matches", LongType),
      StructField("bridged", LongType))))
    val cp = Files.createTempDirectory("graft_route_cp").toString

    writeFile(Seq((100L, newText)), "a1.parquet")
    StreamingIngest.streamRouteSplits(spark, src.toString,
      d, "docs", sink, "routed",
      arrivals = raw => raw.select(col("id"), col("payload")),
      maxFilesPerTrigger = Some(1), glob = "*.parquet",
      checkpointLocation = Some(cp)).collect()
    // run 1 committed: assignment + durable tag + inserted doc
    assert(d.routedBatchTags("docs") == Set("route-0"))
    assert(d.read("docs").filter(col("id") === 100L).count() == 1L)

    // kill-and-restart simulation: the stream's checkpoint commit for
    // batch 0 is LOST (crash after the sidecar marker, before the WAL
    // commit) — the restart must replay batch 0. Also simulate the
    // marker→insert crash window: the inserted doc is gone.
    val commit0 = new java.io.File(cp, "commits/0")
    assert(commit0.exists, "checkpoint layout changed — commits/0 missing")
    assert(commit0.delete())
    // the local ChecksumFs keeps a .crc sidecar; a stale one blocks the
    // re-commit's rename (test-only concern — real stores have no crc)
    val crc0 = new java.io.File(cp, "commits/.0.crc")
    if (crc0.exists) { crc0.delete(); () }
    d.delete("docs", col("id") === 100L)
    Thread.sleep(1100)
    writeFile(Seq((200L, newText)), "a2.parquet")

    val out = StreamingIngest.streamRouteSplits(spark, src.toString,
        d, "docs", sink, "routed",
        arrivals = raw => raw.select(col("id"), col("payload")),
        maxFilesPerTrigger = Some(1), glob = "*.parquet",
        checkpointLocation = Some(cp))
      .as[(Long, Long, String, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // the replayed batch 0 was recognized from disk (NOT re-routed: one
    // assignment row, no write-once refusal) and HEALED: the lost doc
    // is back in the collection
    assert(d.splitAssignments("docs").filter(col("id") === 100L)
      .count() == 1L, "replay must not duplicate the assignment row")
    assert(d.read("docs").filter(col("id") === 100L).count() == 1L,
      "replay must re-admit the doc lost in the marker→insert window")
    // the genuinely-new batch routed normally and inherited the healed
    // arrival's placement through the refreshed bands
    assert(out.keySet == Set(100L, 200L), out.keySet.toString)
    assert(out(200L)._2 == 100L && out(200L)._4 == 1L,
      s"batch after restart must inherit the healed arrival: ${out(200L)}")
    assert(d.routedBatchTags("docs") == Set("route-0", "route-1"))
    // sink: one verdict row per arrival, no double-append
    assert(sink.read("routed").count() == 2L)
  }

  test("compactSplits carries durable batch tags into the fresh generation") {
    val d = db()
    d.buildSplits("docs")
    d.routeArrivals("docs", Seq((100L, newText)).toDF("id", "payload"),
      batchTag = Some("route-0")).collect()
    assert(d.routedBatchTags("docs") == Set("route-0"))
    d.compactSplits("docs")
    // the routed segment (and its tag-bearing marker) folded away; the
    // tag survives via the generation's carry file
    assert(d.routedBatchTags("docs") == Set("route-0"),
      "compaction must not forget applied batch tags")
    // and the assignment itself is intact
    assert(d.splitAssignments("docs").filter(col("id") === 100L)
      .count() == 1L)
  }
}
