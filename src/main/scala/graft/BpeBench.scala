package graft

import org.apache.spark.sql.SparkSession

/** A/B-measures the two BPE training paths in [[graft.operators.TextAnalysis
  * .bpeTrain]] — incremental pair-count maintenance vs full per-round
  * recount — at a real merge budget (default 256 merges, the full byte
  * alphabet's worth), so the scaladoc's cost claim is a measured number,
  * not a story. Both paths must produce the IDENTICAL merge sequence
  * (asserted here; also spec-gated) — the A/B is purely about cost.
  *
  * What to read off the output: per-round wall clock of each path and the
  * ratio. The per-round cost model (TextAnalysis.scala scaladoc) says the
  * recount re-explodes and re-shuffles the whole vocabulary every round,
  * while the delta path explodes only the merged pair's hit set but still
  * rewrites the maintained pair table (union+regroup, O(|pairs| + hits))
  * — so the gap should WIDEN with vocabulary size and merge count: late
  * rounds have rare pairs (tiny hit sets) where recount cost stays flat.
  *
  * Run: `sbt "runMain graft.BpeBench"`; env knobs SPARK_GRAFT_SF_DIR
  * (default /root/testdata/sf0.01), SPARK_GRAFT_BPE_MERGES (default 256),
  * SPARK_GRAFT_CPUS.
  */
object BpeBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val nMerges = sys.env.getOrElse("SPARK_GRAFT_BPE_MERGES", "256").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, sfDir).select("text")

    def run(incremental: Boolean): (Double, Seq[(String, String, Long)]) = {
      val t0 = System.nanoTime()
      val m = operators.TextAnalysis.bpeTrain(docs, "text", nMerges,
        incremental = incremental)
      ((System.nanoTime() - t0) / 1e9, m)
    }

    // order: recount first, incremental second — JVM/codegen warmup favors
    // whichever runs second, so this ordering biases AGAINST the path the
    // scaladoc claims wins; a win under bias is a real win
    val (tRecount, mRecount) = run(incremental = false)
    val (tIncr, mIncr) = run(incremental = true)
    require(mIncr == mRecount,
      s"A/B paths diverged: incremental head=${mIncr.take(3)} recount head=${mRecount.take(3)}")
    println(f"[bpebench] sf=$sfDir merges=$nMerges rounds=${mIncr.size}" +
      f" | recount ${tRecount}%.1fs (${tRecount / mIncr.size}%.3fs/round)" +
      f" | incremental ${tIncr}%.1fs (${tIncr / mIncr.size}%.3fs/round)" +
      f" | ratio recount/incremental=${tRecount / tIncr}%.2f")
    spark.stop()
  }
}
