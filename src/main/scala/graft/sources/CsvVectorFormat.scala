package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CSV source/sink for vector records — the third bulk-insert format
  * beside Parquet (primary) and the reference's `vec;payload` text
  * ([[EmbeddingTextFormat]]). Layout: a header row and
  * `id,vec,payload` columns, the vector as space-separated floats
  * inside one quoted field (space, not comma — the field itself is
  * comma-delimited):
  *
  * {{{
  *   id,vec,payload
  *   0,0.1 -0.25 0.5,hello world
  * }}}
  *
  * Values round-trip exactly: Spark writes floats with shortest-repr
  * formatting and `Float.parseFloat` returns the identical bit pattern,
  * so write → read is lossless (the q116 gate pins it against the
  * original table). Both directions are plain codegen'd column
  * transforms over Spark's native CSV scan/sink — predicate-pushdown-
  * capable (on id/payload), nothing custom in the hot path.
  *
  * Edge semantics: an empty OR null embedding writes as an empty `vec`
  * field and reads back as an EMPTY array (null collapses to empty —
  * CSV has no null/empty distinction for this field; don't use this
  * format if that distinction matters). Payloads may contain embedded
  * newlines: the writer quotes them, and the reader runs with
  * `multiLine` so quoted newlines parse correctly — the cost is that a
  * multiLine CSV file is NOT splittable (one task per file). CSV is the
  * compatibility surface here, not the scale path (that's Parquet);
  * bulk loads wanting parallelism should write many files.
  */
object CsvVectorFormat {

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("multiLine", "true")
      .csv(path)
      .select(
        col("id").cast("long").as("id"),
        when(col("vec").isNull || length(col("vec")) === 0,
            array().cast("array<float>"))
          .otherwise(transform(split(col("vec"), " "), s => s.cast("float")))
          .as("embedding"),
        col("payload"))

  def write(df: DataFrame, path: String): Unit =
    df.select(
        col("id"),
        concat_ws(" ", transform(col("embedding"), _.cast("string")))
          .as("vec"),
        col("payload"))
      .write.mode("overwrite").option("header", "true").csv(path)
}
