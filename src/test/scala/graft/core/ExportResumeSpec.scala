package graft.core

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Resumable EXPORT (r14 verdict item 3): per-shard commit under the
  * pointer discipline. Kill the export in BOTH crash windows — after a
  * shard's marker and mid-shard (files written, marker absent) — and
  * the resumed run must convert ONLY the missing shards from the
  * committed staging generation (never re-scan the collection), with
  * every shard's data-file bytes identical to a fresh single-job
  * [[GraftDatabase.exportCollection]]. The `_export_meta.json` pin
  * refuses shard-count/format drift across resumes.
  */
class ExportResumeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDb(): GraftDatabase = {
    val parent = Files.createTempDirectory("graft_exresume").toString
    val db = GraftDatabase.create(spark, parent, "db")
    db.createCollection("recs", org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("payload",
        org.apache.spark.sql.types.StringType))))
    db.bulkInsert("recs",
      (0L until 60L).map(i => (i, s"row payload $i")).toDF("id", "payload"))
    db
  }

  /** shard dir → that shard's single data file's lines. */
  private def shardBytes(path: String, suffix: String): Map[String, Seq[String]] =
    Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("shard=")).map { d =>
        val fs = d.listFiles().filter(_.getName.endsWith(suffix))
        assert(fs.length == 1, s"${d.getName}: expected one data file")
        d.getName -> scala.io.Source.fromFile(fs.head).getLines().toSeq
      }.toMap

  test("kill AFTER a shard marker: resume converts only the missing shards, bytes identical") {
    val db = freshDb()
    val base = Files.createTempDirectory("graft_exout").toString
    val freshOut = s"$base/fresh"
    val resOut = s"$base/resumable"
    val goldAudit = db.exportCollection("recs", freshOut, "jsonl", 4)
      .as[(Long, Long)].collect().toSeq
    db.exportFailAfterMark = Some(1)
    val e = intercept[IllegalStateException] {
      db.exportCollectionResumable("recs", resOut, "jsonl", 4)
    }
    assert(e.getMessage.contains("after marker of shard 1"))
    db.exportFailAfterMark = None
    // markers 0..1 committed, 2..3 absent
    assert(new java.io.File(s"$resOut/_shards/1.done").exists())
    assert(!new java.io.File(s"$resOut/_shards/2.done").exists())
    // resume through a FRESH handle (a new session/JVM in production):
    // only the markerless shards convert, from the committed staging
    val db2 = GraftDatabase.open(spark, db.root.toString)
    val audit = db2.exportCollectionResumable("recs", resOut, "jsonl", 4)
      .as[(Long, Long)].collect().toSeq
    assert(audit == goldAudit)
    assert(shardBytes(resOut, ".json") == shardBytes(freshOut, ".json"),
      "resumed export bytes must equal the fresh single-job export")
    assert(!new java.io.File(s"$resOut/_staging").exists(),
      "completed export must sweep its staging copy")
    // a no-op re-call on the finished export recomputes nothing and
    // reports the same audit from the markers
    assert(db2.exportCollectionResumable("recs", resOut, "jsonl", 4)
      .as[(Long, Long)].collect().toSeq == goldAudit)
  }

  test("kill MID-shard (files written, marker absent): resume rewrites that shard") {
    val db = freshDb()
    val base = Files.createTempDirectory("graft_exout2").toString
    val freshOut = s"$base/fresh"
    val resOut = s"$base/resumable"
    db.exportCollection("recs", freshOut, "jsonl", 4).collect()
    db.exportFailBeforeMark = Some(2)
    intercept[IllegalStateException] {
      db.exportCollectionResumable("recs", resOut, "jsonl", 4)
    }
    db.exportFailBeforeMark = None
    // shard 2's files exist but its marker does not — the overwrite
    // conversion on resume makes the window idempotent
    assert(!new java.io.File(s"$resOut/_shards/2.done").exists())
    db.exportCollectionResumable("recs", resOut, "jsonl", 4).collect()
    assert(shardBytes(resOut, ".json") == shardBytes(freshOut, ".json"))
  }

  test("the meta pin refuses shard-count and format drift across resumes") {
    val db = freshDb()
    val resOut = Files.createTempDirectory("graft_exout3").toString + "/r"
    db.exportFailAfterMark = Some(0)
    intercept[IllegalStateException] {
      db.exportCollectionResumable("recs", resOut, "jsonl", 4)
    }
    db.exportFailAfterMark = None
    assert(intercept[IllegalArgumentException] {
      db.exportCollectionResumable("recs", resOut, "jsonl", 8)
    }.getMessage.contains("started with shards=4"))
    assert(intercept[IllegalArgumentException] {
      db.exportCollectionResumable("recs", resOut, "csv", 4)
    }.getMessage.contains("started as format=jsonl"))
    // and the matching call completes the export
    assert(db.exportCollectionResumable("recs", resOut, "jsonl", 4)
      .count() > 0)
  }

  test("parallel shard conversion produces identical bytes (order-free per-shard work)") {
    val db = freshDb()
    val base = Files.createTempDirectory("graft_exoutpar").toString
    db.exportCollection("recs", s"$base/fresh", "jsonl", 8).collect()
    db.exportCollectionResumable("recs", s"$base/par", "jsonl", 8,
      parallelism = 4).collect()
    assert(shardBytes(s"$base/par", ".json") ==
      shardBytes(s"$base/fresh", ".json"))
  }

  test("write-once no-op fires BEFORE collection access: re-call after DROP returns the committed audit") {
    val db = freshDb()
    val out = Files.createTempDirectory("graft_exsc").toString + "/exp"
    val audit = db.exportCollectionResumable("recs", out, nShards = 4)
      .as[(Long, Long)].collect().toSeq
    assert(audit.map(_._2).sum == 60L)
    // the documented no-op must hold even when exportPrep would throw:
    // drop the collection entirely, then re-call the finished path
    db.dropCollection("recs")
    val again = db.exportCollectionResumable("recs", out, nShards = -1)
      .as[(Long, Long)].collect().toSeq
    assert(again == audit,
      s"fully-marked export must return the marker audit: $again vs $audit")
    // an explicit mismatching shard count still refuses (the pin wins
    // over the short-circuit's convenience)
    assert(intercept[IllegalArgumentException] {
      db.exportCollectionResumable("recs", out, nShards = 8)
    }.getMessage.contains("was started with shards=4"))
  }

  test("split= is part of the artifact identity: pinned in meta, refused on drift, counts match the sidecar") {
    val db = freshDb()
    db.buildSplits("recs") // the (id, payload) fixture — all singletons
    val trainN = db.splitAssignments("recs")
      .filter(org.apache.spark.sql.functions.col("split") === "train")
      .count()
    val out = Files.createTempDirectory("graft_exsplit").toString + "/exp"
    val audit = db.exportCollectionResumable("recs", out, nShards = 4,
        split = Some("train"))
      .as[(Long, Long)].collect().toSeq
    assert(audit.map(_._2).sum == trainN, s"audit $audit vs sidecar $trainN")
    // a resume WITHOUT the split (or with a different one) refuses: a
    // train-set export must never silently continue as full-corpus
    assert(intercept[IllegalArgumentException] {
      db.exportCollectionResumable("recs", out, nShards = -1)
    }.getMessage.contains("was started with split=train"))
    // single-job parity: same rows through exportCollection(split=...)
    val out2 = Files.createTempDirectory("graft_exsplit2").toString + "/exp"
    val audit2 = db.exportCollection("recs", out2, nShards = 4,
        split = Some("train"))
      .as[(Long, Long)].collect().toSeq
    assert(audit2 == audit, s"$audit2 vs $audit")
    // a typo'd split label refuses loudly instead of exporting nothing
    assert(intercept[IllegalArgumentException] {
      db.exportCollection("recs", out2 + "x", split = Some("trian"))
    }.getMessage.contains("must be train, val, or test"))
  }

  test("exclude= drops committed verdict ids and is pinned in the resume meta") {
    val db = freshDb()
    db.createCollection("verdicts", org.apache.spark.sql.types.StructType(
      Seq(org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType))))
    db.bulkInsert("verdicts", Seq(3L, 17L, 42L).toDF("id"))
    val out = Files.createTempDirectory("graft_exexcl").toString + "/exp"
    val audit = db.exportCollectionResumable("recs", out, nShards = 4,
        exclude = Some("verdicts"))
      .as[(Long, Long)].collect().toSeq
    assert(audit.map(_._2).sum == 57L, // 60 rows minus the 3 verdicts
      s"exclusion must drop exactly the committed ids: $audit")
    // none of the excluded ids is in the written artifact
    val ids = spark.read.json(out)
      .select(org.apache.spark.sql.functions.col("id").cast("long"))
      .as[Long].collect().toSet
    assert(Seq(3L, 17L, 42L).forall(!ids.contains(_)))
    // a resume WITHOUT the exclusion (or with a different one) refuses:
    // a decon-cleaned export must never silently resume uncleaned
    assert(intercept[IllegalArgumentException] {
      db.exportCollectionResumable("recs", out, nShards = -1)
    }.getMessage.contains("was started with exclude=verdicts"))
    // single-job parity
    val out2 = Files.createTempDirectory("graft_exexcl2").toString + "/exp"
    val audit2 = db.exportCollection("recs", out2, nShards = 4,
        exclude = Some("verdicts"))
      .as[(Long, Long)].collect().toSeq
    assert(audit2 == audit, s"$audit2 vs $audit")
    // a verdict collection without an id column refuses loudly
    db.createCollection("badv", org.apache.spark.sql.types.StructType(
      Seq(org.apache.spark.sql.types.StructField("doc",
        org.apache.spark.sql.types.LongType))))
    assert(intercept[IllegalArgumentException] {
      db.exportCollection("recs", out2 + "x", exclude = Some("badv"))
    }.getMessage.contains("needs an id column"))
  }

  test("text format resumes too: framing and float rendering survive the staging round-trip") {
    val parent = Files.createTempDirectory("graft_exresumetxt").toString
    val db = GraftDatabase.create(spark, parent, "db")
    db.createCollection("vecs")
    val txt = s"$parent/in.txt"
    Files.writeString(java.nio.file.Paths.get(txt),
      (0 until 20).map(i => s"0.$i,-1.5;p$i").mkString("", "\n", "\n"))
    graft.commands.CommandExecutor.execute(db,
      graft.commands.GraftCommand.BulkInsert("vecs", txt))
    val base = Files.createTempDirectory("graft_exouttxt").toString
    db.exportCollection("vecs", s"$base/fresh", "text", 2).collect()
    // through the command grammar: resume=true routes the per-shard path
    graft.commands.CommandExecutor.execute(db,
      graft.commands.GraftCommand.Export("vecs",
        s"$base/res;format=text;shards=2;resume=true")).collect()
    assert(shardBytes(s"$base/res", ".txt") ==
      shardBytes(s"$base/fresh", ".txt"))
  }

  test("a NULL id refuses per-row in the write pass (the audit would otherwise miscount it)") {
    val parent = Files.createTempDirectory("graft_exnull").toString
    val db = GraftDatabase.create(spark, parent, "db")
    db.createCollection("recs", org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("payload",
        org.apache.spark.sql.types.StringType))))
    db.bulkInsert("recs", Seq[(Option[Long], String)](
      (Some(1L), "ok"), (None, "null id")).toDF("id", "payload"))
    val out = Files.createTempDirectory("graft_exnullout").toString + "/e"
    val e = intercept[Exception] {
      db.exportCollection("recs", out, nShards = 2).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("NULL id")), e.toString)
  }
}
