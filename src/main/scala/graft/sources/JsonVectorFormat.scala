package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON-Lines source/sink for vector records — the fourth bulk-insert
  * format beside Parquet (primary), the reference's `vec;payload` text
  * ([[EmbeddingTextFormat]]), and CSV ([[CsvVectorFormat]]). One record
  * per line:
  *
  * {{{
  *   {"id":0,"embedding":[0.1,-0.25,0.5],"payload":"hello world"}
  * }}}
  *
  * The read applies an EXPLICIT schema — never inference: inference is a
  * whole extra pass over the load (and yields whatever shape the sampled
  * files happened to have), unacceptable on a bulk path. Line-delimited
  * JSON stays SPLITTABLE — unlike `multiLine` JSON (and unlike the
  * quoted-newline CSV mode), a large load parallelizes per input split,
  * which is why JSONL is the interchange format crawl pipelines actually
  * ship. Floats round-trip exactly (shortest-repr write, parseFloat
  * read — the q116 argument); a missing/null embedding collapses to the
  * EMPTY array on read (the CSV contract: this surface has no
  * null-vs-empty distinction), other missing fields read as NULL.
  */
object JsonVectorFormat {

  private val recordSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("payload", StringType)))

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(recordSchema).json(path)
      .select(
        col("id"),
        coalesce(col("embedding"), array().cast("array<float>"))
          .as("embedding"),
        col("payload"))

  def write(df: DataFrame, path: String): Unit =
    df.select(col("id"), col("embedding"), col("payload"))
      .write.mode("overwrite").json(path)
}
