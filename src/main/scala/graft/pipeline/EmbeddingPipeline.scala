package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.EmbeddingTextFormat

/** EP3 parity: the reference's fully-implemented text→embeddings pipeline
  * (`/root/reference/src/utils/embeddings.rs:6-71`): read a text file, take
  * the first N whitespace tokens, batch-embed, report sizes, write
  * `vec;word` lines.
  *
  * The environment is zero-egress so no model download is possible
  * (fastembed's default model in the reference); graft substitutes a
  * *deterministic* embedder with the same pipeline shape: token →
  * `array<float>` of fixed dim, L2-normalized. Each dimension j is a uniform
  * value in [-1, 1) derived from `md5(token:j)` — entirely built-in
  * codegen'd column functions (md5/conv/transform/aggregate), so it runs
  * in-scan at any scale and is reproducible in plain SQL (the DuckDB oracle
  * can recompute it).
  */
object DeterministicEmbedder {

  /** Uniform [-1, 1) from the first 8 hex chars of md5(seed). */
  private def unitFromMd5(seed: Column): Column =
    (conv(substring(md5(seed), 1, 8), 16, 10).cast("long") / lit(4294967296.0)) * 2.0 - 1.0

  /** Raw (unnormalized) embedding: dim values seeded by `token:j`. */
  def rawEmbedding(token: Column, dim: Int): Column =
    transform(
      sequence(lit(0), lit(dim - 1)),
      j => unitFromMd5(concat(token, lit(":"), j.cast("string"))))

  /** L2-normalized `array<float>` embedding of a token/text column. */
  def embedding(token: Column, dim: Int = 64): Column =
    transform(embeddingDouble(token, dim), x => x.cast("float"))

  /** Same embedding in full double precision (no float32 quantization) —
    * the form oracle SQL can reproduce bit-for-bit-enough to round-compare.
    */
  def embeddingDouble(token: Column, dim: Int): Column = {
    val raw = rawEmbedding(token, dim)
    val norm = sqrt(aggregate(raw, lit(0.0), (acc, x) => acc + x * x))
    transform(raw, x => x / norm)
  }
}

object EmbeddingPipeline {

  /** `process_embeddings` end-to-end (`embeddings.rs:6-20`):
    * text file → first `amount` whitespace tokens (`extract_words`,
    * `:22-27`) → deterministic embeddings (`generate_embeddings`, `:29-31`)
    * → size report (`print_embeddings_info`, `:33-50`) → `vec;word` file +
    * parquet (`write_embeddings_to_file`, `:52-71`).
    *
    * Token order: (line, position-in-line) — the file's global word order.
    * `amount` is a head-of-file limit like the reference's, so the orderBy
    * feeds a bounded TakeOrderedAndProject, not a full sort.
    */
  def processEmbeddings(spark: SparkSession, inputPath: String, amount: Int,
      outputPath: String, dim: Int = 64, verbose: Boolean = true): DataFrame = {
    // File word order without serializing the read: the text source emits
    // rows in line order within each split, and a single file's splits map
    // to partitions in byte-offset order, so `monotonically_increasing_id`
    // (partition-prefixed, in-partition sequential) sorts lines exactly as
    // the file orders them — no RDD hop, no single-partition window over
    // the corpus. Multi-file inputs order by file name first (ids are only
    // offset-ordered within one file).
    val lines = spark.read.text(inputPath)
      .select(
        input_file_name().as("__file"),
        monotonically_increasing_id().as("__line_ord"),
        col("value"))

    val words = lines
      .select(col("__file"), col("__line_ord"),
        posexplode(split(col("value"), "\\s+")).as(Seq("pos", "word")))
      .filter(length(col("word")) > 0)
      .orderBy(col("__file"), col("__line_ord"), col("pos"))
      .limit(amount) // bounded TakeOrderedAndProject — never a full sort
      .select(
        // ≤ `amount` rows from here on, so the global ranking window is a
        // bounded single-task sort of the head slice, not of the corpus
        row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("__file"), col("__line_ord"), col("pos")))
          .cast("long").minus(1).as("id"),
        col("word").as("payload"))

    val embedded = words
      .withColumn("embedding", DeterministicEmbedder.embedding(col("payload"), dim))
      .select("id", "embedding", "payload")

    embedded.cache()
    if (verbose) {
      // print_embeddings_info parity (`embeddings.rs:33-50`): counts + sizes.
      val stats = embedded.agg(
        count(lit(1)).as("n"),
        sum(length(col("payload"))).as("payload_chars")).head()
      println(s"[graft] embedded ${stats.getLong(0)} tokens, dim=$dim, " +
        s"payload chars=${stats.getLong(1)}, " +
        s"approx vector bytes=${stats.getLong(0) * dim * 4}")
    }

    EmbeddingTextFormat.write(embedded.coalesce(1), s"$outputPath/embeddings_txt")
    embedded.write.mode("overwrite").parquet(s"$outputPath/embeddings_parquet")
    embedded.unpersist() // cache served the stats + two sinks; don't leak it
    embedded
  }
}
