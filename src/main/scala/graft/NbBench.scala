package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B/C harness for the q145 NB-classification core (r17 verdict item 1:
  * the one touched-and-regressed bench entry — adjudicate whether the
  * eager tokenized-base checkpoint costs more than it saves at bench SF,
  * standalone, away from the interleaved set's noise).
  *
  *   A  r16 shape: no base checkpoint, per-doc argmax as a rank window
  *   B  current:   eager base checkpoint, argmax as min(struct) aggregate
  *   C  hybrid:    no base checkpoint, argmax as min(struct) aggregate
  *
  * Parity is asserted row-identical on the real corpus before any time
  * is trusted (all three must hash-match the same q145 oracle). Reps are
  * interleaved (full A,B,C passes), min per variant, blocking unpersist +
  * GC between timed windows — the Bench methodology.
  */
object NbBench {
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

    def docs = operators.Parallelism.ensure(Tables.documents(spark, sfDir))
    val bucket = conv(substring(md5(concat(lit("split:"),
      col("doc_id").cast("string"))), 1, 4), 16, 10).cast("long") % 10
    val isTrain = bucket < 8

    def confusion(preds: DataFrame): DataFrame = preds
      .groupBy(col("label").as("source"), col("pred"))
      .agg(count(lit(1)).as("n"))
      .select(col("source"), col("pred"), col("n"))
      .orderBy("source", "pred")

    // A: the r16 formulation — lazy grid (13 corpus scans), window argmax
    def variantA(): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id"))
        .orderBy(desc("__score"), col("__label"))
      confusion(operators.Classify
        .nbScoredGrid(docs, "doc_id", "text", "source", isTrain,
          materializeBase = false)
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("doc_id"), col("label"), col("__label").as("pred"),
          col("__score").as("score")))
    }

    def aggArgmax(grid: DataFrame): DataFrame = confusion(grid
      .groupBy(col("doc_id"))
      .agg(max("label").as("label"),
        min(struct((-col("__score")).as("ns"), col("__label").as("l"),
          col("__score").as("s"))).as("__m"))
      .select(col("doc_id"), col("label"), col("__m.l").as("pred"),
        col("__m.s").as("score")))

    // B: the current production path (eager checkpoint + struct-min)
    def variantB(): DataFrame =
      confusion(operators.Classify
        .nbPredict(docs, "doc_id", "text", "source", isTrain))

    // C: struct-min argmax over the LAZY grid
    def variantC(): DataFrame = aggArgmax(operators.Classify
      .nbScoredGrid(docs, "doc_id", "text", "source", isTrain,
        materializeBase = false))

    def sweep(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }

    // parity first (also the warmup): all three must emit identical rows
    val a = variantA().collect().map(_.toString).toSeq
    sweep()
    val b = variantB().collect().map(_.toString).toSeq
    sweep()
    val c = variantC().collect().map(_.toString).toSeq
    sweep()
    require(a == b && b == c,
      s"variants diverged: ${a.size}/${b.size}/${c.size} rows")

    val reps = if (args.nonEmpty) args(0).toInt else 3
    var tA, tB, tC = Double.MaxValue
    for (_ <- 0 until reps) {
      val a0 = System.nanoTime()
      variantA().collect()
      tA = math.min(tA, (System.nanoTime() - a0) / 1e9)
      sweep()
      val b0 = System.nanoTime()
      variantB().collect()
      tB = math.min(tB, (System.nanoTime() - b0) / 1e9)
      sweep()
      val c0 = System.nanoTime()
      variantC().collect()
      tC = math.min(tC, (System.nanoTime() - c0) / 1e9)
      sweep()
    }
    println(f"[nbbench] sf=$sfDir reps=$reps " +
      f"A(window,lazy)=$tA%.3f s B(agg,ckpt)=$tB%.3f s C(agg,lazy)=$tC%.3f s")
    spark.stop()
  }
}
