package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.StageStore

/** Restartable training loops (r14 verdict item 2): unigram-LM EM
  * rounds, BPE merge picks, and LR gradient rounds persist through
  * [[StageStore]]'s generation-pointer commit, so a preempted training
  * resumes at ROUND grain. Both crash windows (after-commit and
  * mid-stage) are killed and resumed for each family, and every staged
  * output must equal the store-less run bit-for-bit — the q268/q129/
  * q316 oracles gate the same math.
  */
class TrainResumeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Parallelism.ensure(
    graft.Tables.documents(spark, TestSpark.sf)
      .filter(col("doc_id") < 120))

  private def freshRoot(): String =
    Files.createTempDirectory("graft_trainresume").toString

  // ---- unigram-LM ---------------------------------------------------

  private def unigram(store: Option[StageStore]) =
    UnigramLm.train(docs, "text", vocabTarget = 16, emRounds = 2,
        seedMultiplier = 4, maxPieceLen = 6, maxWordLen = 12, store = store)
      .select("piece", "is_char", "count", "logp")
      .orderBy("piece").collect().toSeq

  private lazy val unigramGold = unigram(None)

  test("unigram EM: kill AFTER a committed round, resume skips it; staged == store-less") {
    val root = freshRoot()
    val killed = new StageStore(spark, root)
    killed.failAfterCommit = Some("em_round_1")
    intercept[IllegalStateException] { unigram(Some(killed)) }
    assert(killed.computed.toSeq ==
      Seq("em_words", "em_seed", "em_round_1"))
    val resumed = new StageStore(spark, root)
    val out = unigram(Some(resumed))
    assert(resumed.computed.toSeq == Seq("em_round_2", "em_final"),
      s"resume must not recompute committed rounds: ${resumed.computed}")
    assert(out == unigramGold)
  }

  test("unigram EM: kill MID-round (meta absent), resume recomputes into a fresh generation") {
    val root = freshRoot()
    val killed = new StageStore(spark, root)
    killed.failBeforeCommit = Some("em_round_2")
    intercept[IllegalStateException] { unigram(Some(killed)) }
    assert(killed.committedGen("em_round_2").isEmpty)
    val resumed = new StageStore(spark, root)
    val out = unigram(Some(resumed))
    assert(resumed.computed.toSeq == Seq("em_round_2", "em_final"))
    assert(resumed.committedGen("em_round_2").contains(1))
    assert(out == unigramGold)
  }

  // ---- BPE ----------------------------------------------------------

  private def bpe(store: Option[StageStore], incremental: Boolean = false) =
    TextAnalysis.bpeTrain(docs, "text", nMerges = 6,
      incremental = incremental, store = store)

  private lazy val bpeGold = bpe(None)

  test("BPE: kill AFTER a committed merge, resume replays picks and continues; staged == store-less") {
    val root = freshRoot()
    val killed = new StageStore(spark, root)
    killed.failAfterCommit = Some("bpe_merge_3")
    intercept[IllegalStateException] { bpe(Some(killed)) }
    assert(killed.computed.toSeq ==
      Seq("bpe_words", "bpe_merge_1", "bpe_merge_2", "bpe_merge_3"))
    val resumed = new StageStore(spark, root)
    val out = bpe(Some(resumed))
    // committed picks read back; the segmentation state rebuilds from
    // the staged word table (never the corpus) for merge 4 onward
    assert(resumed.computed.toSeq ==
      Seq("bpe_merge_4", "bpe_merge_5", "bpe_merge_6"),
      s"resume must not re-read the corpus: ${resumed.computed}")
    assert(out == bpeGold)
  }

  test("BPE: kill MID-merge, resume recomputes that pick; incremental staged path agrees too") {
    val root = freshRoot()
    val killed = new StageStore(spark, root)
    killed.failBeforeCommit = Some("bpe_merge_2")
    intercept[IllegalStateException] { bpe(Some(killed)) }
    assert(killed.committedGen("bpe_merge_2").isEmpty)
    val resumed = new StageStore(spark, root)
    assert(bpe(Some(resumed)) == bpeGold)
    assert(resumed.committedGen("bpe_merge_2").contains(1))
    // the maintained-counts variant under a fresh store: same sequence
    assert(bpe(Some(new StageStore(spark, freshRoot())),
      incremental = true) == bpeGold)
  }

  // ---- WordPiece ----------------------------------------------------

  private def wp(store: Option[StageStore]) =
    TextAnalysis.wordPieceTrain(docs, "text", nMerges = 5, store = store)

  private lazy val wpGold = wp(None)

  test("WordPiece: kill AFTER a committed merge, resume replays and continues identically") {
    val root = freshRoot()
    val killed = new StageStore(spark, root)
    killed.failAfterCommit = Some("wp_merge_2")
    intercept[IllegalStateException] { wp(Some(killed)) }
    assert(killed.computed.toSeq ==
      Seq("wp_words", "wp_merge_1", "wp_merge_2"))
    val resumed = new StageStore(spark, root)
    assert(wp(Some(resumed)) == wpGold)
    assert(resumed.computed.toSeq ==
      Seq("wp_merge_3", "wp_merge_4", "wp_merge_5"),
      s"resume must not re-read the corpus: ${resumed.computed}")
  }

  // ---- PQ codebook training -----------------------------------------

  private def pqVecs = graft.Tables.embeddings(spark, TestSpark.sf)
    .filter(org.apache.spark.sql.functions.col("vec_id") < 200)

  private def pq(store: Option[StageStore]): Seq[Seq[Seq[Double]]] =
    ProductQuantization.trainCodebooks(pqVecs, "vec_id", "embedding",
        m = 8, ksub = 8, rounds = 3, seed = "resume", store = store)
      .map(_.map(_.toSeq).toSeq).toSeq

  private lazy val pqGold = pq(None)

  test("PQ training: kill AFTER a committed Lloyd round, resume replays codebooks exactly") {
    val root = freshRoot()
    val killed = new StageStore(spark, root)
    killed.failAfterCommit = Some("pq_resume_round_2")
    intercept[IllegalStateException] { pq(Some(killed)) }
    assert(killed.computed.toSeq ==
      Seq("pq_resume_seeds", "pq_resume_round_1", "pq_resume_round_2"))
    val resumed = new StageStore(spark, root)
    assert(pq(Some(resumed)) == pqGold)
    assert(resumed.computed.toSeq == Seq("pq_resume_round_3"),
      s"committed rounds must read back: ${resumed.computed}")
  }

  test("PQ training: kill MID-round, resume recomputes that round into a fresh generation") {
    val root = freshRoot()
    val killed = new StageStore(spark, root)
    killed.failBeforeCommit = Some("pq_resume_round_1")
    intercept[IllegalStateException] { pq(Some(killed)) }
    assert(killed.committedGen("pq_resume_round_1").isEmpty)
    val resumed = new StageStore(spark, root)
    assert(pq(Some(resumed)) == pqGold)
    assert(resumed.committedGen("pq_resume_round_1").contains(1))
  }

  // ---- REINDEX type=ivfpq under a store -----------------------------

  test("reindexIvfPq: a killed index build resumes its trainings at round grain, layout identical") {
    import org.apache.spark.sql.functions.col
    def freshTrainColl(): graft.core.GraftDatabase = {
      val parent = Files.createTempDirectory("graft_reidx").toString
      val db = graft.core.GraftDatabase.create(spark, parent, "db")
      db.createCollection("vecs", org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType, containsNull = false)))))
      db.bulkInsert("vecs", graft.Tables.embeddings(spark, TestSpark.sf)
        .filter(col("vec_id") < 200)
        .select(col("vec_id").as("id"), col("embedding")))
      db
    }
    def layoutOf(db: graft.core.GraftDatabase) = db.read("vecs")
      .select("id", "cluster_id", "pq_code")
      .as[(Long, Int, Seq[Byte])].collect()
      .map(t => (t._1, t._2, t._3)).toSet
    val goldDb = freshTrainColl()
    goldDb.reindexIvfPq("vecs", m = 8, ksub = 8, rounds = 2, kCells = 4)
    val gold = layoutOf(goldDb)
    val db2 = freshTrainColl()
    val root = freshRoot()
    val killed = new StageStore(spark, root)
    killed.failAfterCommit = Some("pq_rpq_round_1")
    intercept[IllegalStateException] {
      db2.reindexIvfPq("vecs", m = 8, ksub = 8, rounds = 2, kCells = 4,
        store = Some(killed))
    }
    // the coarse training and fine round 1 are committed; the resume
    // recomputes only fine round 2, then pays the layout rewrite
    val resumed = new StageStore(spark, root)
    db2.reindexIvfPq("vecs", m = 8, ksub = 8, rounds = 2, kCells = 4,
      store = Some(resumed))
    assert(resumed.computed.toSeq == Seq("pq_rpq_round_2"),
      s"resume must replay committed training rounds: ${resumed.computed}")
    assert(layoutOf(db2) == gold,
      "resumed index build must produce the identical layout")
  }

  // ---- logistic regression ------------------------------------------

  private def lrFeats = Seq(
    (1.0, 0.25, 1L), (2.0, 0.5, 1L), (0.25, 2.0, 0L), (0.5, 1.5, 0L),
    (1.5, 0.75, 1L), (0.125, 1.0, 0L))
    .toDF("x_a", "x_b", "y")

  private def lr(store: Option[StageStore]) =
    Classify.logisticTrain(lrFeats, Seq("x_a", "x_b"), "y",
        eta = 0.5, rounds = 4, store = store)
      .collect().toSeq

  private lazy val lrGold = lr(None)

  test("LR: kill AFTER a committed gradient round, resume replays the weight recursion exactly") {
    val root = freshRoot()
    val killed = new StageStore(spark, root)
    killed.failAfterCommit = Some("lr_grad_2")
    intercept[IllegalStateException] { lr(Some(killed)) }
    assert(killed.computed.toSeq == Seq("lr_n", "lr_grad_1", "lr_grad_2"))
    val resumed = new StageStore(spark, root)
    val out = lr(Some(resumed))
    assert(resumed.computed.toSeq == Seq("lr_grad_3", "lr_grad_4"),
      s"committed gradient rounds must read back: ${resumed.computed}")
    assert(out == lrGold)
  }

  test("LR: kill MID-round, resume recomputes that gradient into a fresh generation") {
    val root = freshRoot()
    val killed = new StageStore(spark, root)
    killed.failBeforeCommit = Some("lr_grad_3")
    intercept[IllegalStateException] { lr(Some(killed)) }
    assert(killed.committedGen("lr_grad_3").isEmpty)
    val resumed = new StageStore(spark, root)
    assert(lr(Some(resumed)) == lrGold)
    assert(resumed.committedGen("lr_grad_3").contains(1))
  }
}
