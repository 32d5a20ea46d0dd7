package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

/** Restartable stage-boundary persistence for multi-stage pipelines
  * (r13 verdict item 2): each stage's output frame is written to
  * `<root>/<stage>/gen_<g>/data` and COMMITTED by the single
  * `meta.json` overwrite — the artifact generation-pointer discipline
  * (compactPostings precedent), so a crash at ANY point leaves either
  * "stage absent" (no meta — recompute) or "stage complete" (meta —
  * read back), never a half-written table a resume would trust.
  *
  * A resumed run calls [[stage]] with the same root: committed stages
  * read back from their pinned generation (schema from the committed
  * `schema.json` — a zero-row stage dir has no parquet footer to infer
  * from, the round-11 rule) without re-running any upstream work;
  * the first uncommitted stage recomputes into a FRESH generation and
  * commits, sweeping orphans from the crashed attempt.
  *
  * This replaces session-local `localCheckpoint` at pipeline stage
  * boundaries: the checkpoint dies with the session, the store survives
  * it — at 100 TB these are exactly the boundaries where a production
  * corpus build persists stage tables so a preempted job resumes at
  * stage grain instead of re-reading the corpus.
  */
final class StageStore(spark: SparkSession, rootDir: String) {
  private val root = new Path(rootDir)
  private val fs: FileSystem =
    root.getFileSystem(spark.sessionState.newHadoopConf())

  /** Test hooks (spec-only): throw after committing `stage` /
    * before committing it (data written, meta absent) — the two crash
    * windows a resume must survive.
    */
  private[graft] var failAfterCommit: Option[String] = None
  private[graft] var failBeforeCommit: Option[String] = None

  /** Names of stages COMPUTED (not read back) by this instance — lets a
    * resume spec assert which stages actually re-ran.
    */
  private[graft] val computed = scala.collection.mutable.ListBuffer.empty[String]

  /** Physical plan of each stage computed by this instance (pre-AQE
    * text, the PlanAuditSpec convention) — the per-stage shapes are no
    * longer visible in the caller's returned plan (that is just the
    * final stage's read-back), so audits assert on these.
    */
  private[graft] val stagePlans = scala.collection.mutable.Map.empty[String, String]

  private def metaPath(stage: String) = new Path(new Path(root, stage), "meta.json")

  /** Return `stage`'s committed output, computing + committing it first
    * if absent. `compute` is by-name: a committed stage never builds the
    * upstream plan at all. `partitionCols` (optional) lays the stage's
    * parquet out partitioned on those columns, so downstream per-value
    * reads prune directories (the resumable-export staging shape); the
    * read-back declares the FULL schema explicitly, so partition values
    * rehydrate typed and zero-row stages still read back.
    */
  def stage(name: String, partitionCols: Seq[String] = Nil)
      (compute: => DataFrame): DataFrame = {
    require(name.matches("[A-Za-z0-9_.-]+"), s"bad stage name: $name")
    val dir = new Path(root, name)
    val meta = metaPath(name)
    if (fs.exists(meta)) {
      val g = """"gen"\s*:\s*(\d+)""".r
        .findFirstMatchIn(readString(meta)).map(_.group(1).toInt)
        .getOrElse(throw new IllegalStateException(
          s"stage $name meta has no gen field"))
      val schema = DataType.fromJson(
        readString(new Path(dir, s"gen_$g/schema.json"))).asInstanceOf[StructType]
      // explicit schema: a zero-row stage reads back as the empty frame;
      // driver-side listing — partitioned stages are tens of dirs and
      // the distributed listing job is pure overhead there (ScaleKnobs)
      graft.operators.ScaleKnobs.withDriverListing(spark)(
        spark.read.schema(schema)
          .parquet(new Path(dir, s"gen_$g/data").toString))
    } else {
      val g = nextGen(dir)
      val genDir = new Path(dir, s"gen_$g")
      val out = compute
      computed += name
      stagePlans(name) = out.queryExecution.executedPlan.toString
      // Deliberately NOT handed forward materialized (r18, verdict item
      // 7 — attempted and reverted on measurement): checkpointing `out`
      // and writing from the blocks adds a full extra block→parquet
      // encoding pass per stage, which costs far more than the one
      // pruned parquet read-back it saves (q269 standalone 2.9 s →
      // 7.0 s with the hand-forward). The write below IS the single
      // compute pass; the committed read-back is this pipeline's
      // reliable checkpoint.
      val w = out.write.mode("overwrite")
      (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
        .parquet(new Path(genDir, "data").toString)
      writeString(new Path(genDir, "schema.json"), out.schema.json)
      if (failBeforeCommit.contains(name))
        throw new IllegalStateException(s"injected crash before commit: $name")
      writeString(meta, s"""{"stage":"$name","gen":$g}""")
      sweepOrphans(dir, g)
      if (failAfterCommit.contains(name))
        throw new IllegalStateException(s"injected crash after commit: $name")
      stage(name)(sys.error("unreachable — just committed"))
    }
  }

  /** Committed generation of `stage`, if any (spec introspection). */
  private[graft] def committedGen(stage: String): Option[Int] =
    if (!fs.exists(metaPath(stage))) None
    else """"gen"\s*:\s*(\d+)""".r
      .findFirstMatchIn(readString(metaPath(stage))).map(_.group(1).toInt)

  private def nextGen(dir: Path): Int = {
    val existing =
      if (!fs.exists(dir)) Seq.empty
      else fs.listStatus(dir).toSeq.map(_.getPath.getName)
        .filter(_.startsWith("gen_")).map(_.drop(4).toInt)
    if (existing.isEmpty) 0 else existing.max + 1
  }

  private def sweepOrphans(dir: Path, keep: Int): Unit = {
    fs.listStatus(dir).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith("gen_") && n != s"gen_$keep")
        fs.delete(st.getPath, true)
    }
  }

  private def writeString(p: Path, s: String): Unit = {
    val o = fs.create(p, true)
    try o.write(s.getBytes("UTF-8")) finally o.close()
  }

  private def readString(p: Path): String = {
    val i = fs.open(p)
    try scala.io.Source.fromInputStream(i, "UTF-8").mkString finally i.close()
  }
}
