package graft.core

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.{Parallelism, PretrainPipeline}

/** [[StageStore]] + the restartable q269 capstone (r13 verdict item 2):
  * kill the chain in BOTH crash windows — after a stage's commit and
  * mid-stage (data written, meta absent) — and the resumed run must
  * (a) not recompute committed stages, (b) recompute the uncommitted
  * one into a fresh generation, and (c) produce the hash-identical
  * q269 output.
  */
class StageStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Parallelism.ensure(
    graft.Tables.documents(spark, TestSpark.sf))

  private def freshRoot(): String =
    Files.createTempDirectory("graft_stagestore").toString

  private lazy val gold: Seq[org.apache.spark.sql.Row] =
    PretrainPipeline.run(docs, new StageStore(spark, freshRoot()))
      .collect().toSeq

  test("kill AFTER a committed stage: resume skips it, output hash-identical") {
    val root = freshRoot()
    val killed = new StageStore(spark, root)
    killed.failAfterCommit = Some("s2_spandedup")
    val e = intercept[IllegalStateException] {
      PretrainPipeline.run(docs, killed)
    }
    assert(e.getMessage.contains("injected crash after commit"))
    assert(killed.computed.toSeq == Seq("s1_curated", "s2_spandedup"))
    // resume on the same root with a fresh instance (a new session/JVM
    // in production): committed stages read back, the rest compute
    val resumed = new StageStore(spark, root)
    val out = PretrainPipeline.run(docs, resumed).collect().toSeq
    assert(resumed.computed.toSeq == Seq("s3_selected", "s4_shard_summary"),
      s"resume must not recompute committed stages: ${resumed.computed}")
    assert(resumed.committedGen("s1_curated").contains(0))
    assert(resumed.committedGen("s2_spandedup").contains(0))
    assert(out == gold)
  }

  test("kill MID-stage (data written, meta absent): resume recomputes into a fresh generation") {
    val root = freshRoot()
    val killed = new StageStore(spark, root)
    killed.failBeforeCommit = Some("s3_selected")
    val e = intercept[IllegalStateException] {
      PretrainPipeline.run(docs, killed)
    }
    assert(e.getMessage.contains("injected crash before commit"))
    assert(killed.committedGen("s3_selected").isEmpty,
      "a half-written stage must never look committed")
    val resumed = new StageStore(spark, root)
    val out = PretrainPipeline.run(docs, resumed).collect().toSeq
    assert(resumed.computed.toSeq == Seq("s3_selected", "s4_shard_summary"))
    // the crashed attempt's gen_0 data dir exists meta-less → the
    // recompute commits gen_1 and sweeps the orphan
    assert(resumed.committedGen("s3_selected").contains(1))
    assert(out == gold)
  }

  test("a completed store resumes with zero recomputation") {
    val root = freshRoot()
    PretrainPipeline.run(docs, new StageStore(spark, root)).collect()
    val resumed = new StageStore(spark, root)
    val out = PretrainPipeline.run(docs, resumed).collect().toSeq
    assert(resumed.computed.isEmpty,
      s"fully committed chain must read back only: ${resumed.computed}")
    assert(out == gold)
  }

  test("zero-row stage round-trips as the empty frame with its schema") {
    val store = new StageStore(spark, freshRoot())
    val empty = store.stage("s_empty") {
      Seq.empty[(Long, String)].toDF("id", "txt")
    }
    assert(empty.count() == 0)
    assert(empty.columns.toSeq == Seq("id", "txt"))
    // and a resume reads the committed empty generation, not a recompute
    val again = store.stage("s_empty") { sys.error("must not recompute") }
    assert(again.count() == 0)
  }
}
