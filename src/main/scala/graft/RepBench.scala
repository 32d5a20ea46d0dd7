package graft

import org.apache.spark.sql.SparkSession

/** A/B harness for the two repetition-table formulations (verdict r10 #6):
  * the grouped two-aggregation batch shape (`repetitionStats`, q166) vs
  * the stateless per-row HOF shape (`repetitionStatsStateless`, q167 —
  * zero shuffle, counts each distinct gram with a filter over the doc's
  * own gram array at O(distinct × total) compares per doc).
  *
  * Both formulations hash-match the same oracle, so this is purely a
  * cost question: which one should q166 (and batch callers) default to
  * at corpus grain. Interleaved reps, min per path, outputs asserted
  * row-identical on the actual corpus before any time is trusted.
  */
object RepBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = operators.Parallelism.ensure(Tables.documents(spark, sfDir))

    def grouped() = operators.TextAnalysis
      .repetitionStats(docs, "doc_id", "text").orderBy("doc_id")
    def stateless() = operators.TextAnalysis
      .repetitionStatsStateless(docs, "doc_id", "text").orderBy("doc_id")

    // parity first: BIT-identical rows on the real corpus (both sides
    // are Spark-computed exact-integer divisions, so raw comparison is
    // the correct bar — the q166/q167 gates pin the same exactness)
    val a = grouped().collect().map(_.toString).toSeq
    val b = stateless().collect().map(_.toString).toSeq
    require(a == b, s"formulations diverged: ${a.size} vs ${b.size} rows, " +
      s"first diff: ${a.zip(b).find(p => p._1 != p._2)}")

    val reps = 3
    var tG, tS = Double.MaxValue
    for (_ <- 0 until reps) {
      val g0 = System.nanoTime()
      grouped().collect()
      tG = math.min(tG, (System.nanoTime() - g0) / 1e9)
      val s0 = System.nanoTime()
      stateless().collect()
      tS = math.min(tS, (System.nanoTime() - s0) / 1e9)
    }
    println(f"[repbench] sf=$sfDir grouped=$tG%.3f s stateless=$tS%.3f s " +
      f"ratio(stateless/grouped)=${tS / tG}%.2f")
    spark.stop()
  }
}
