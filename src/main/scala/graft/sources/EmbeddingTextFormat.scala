package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reader/writer for the reference's embeddings-file line format:
  * `"{f32,f32,...};{payload}"`, one record per line, line number = implicit
  * id (`/root/reference/src/utils/embeddings.rs:52-71`).
  *
  * This is the fidelity source/sink; Parquet is the primary format. The read
  * path materializes explicit ids from line order (RDD zipWithIndex — a
  * deterministic per-partition count, no shuffle); everything else is
  * codegen'd column work.
  */
object EmbeddingTextFormat {

  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = true),
    StructField("payload", StringType, nullable = true)))

  def read(spark: SparkSession, path: String): DataFrame = {
    val lines = spark.read.text(path)
    val withId = spark.createDataFrame(
      lines.rdd.zipWithIndex.map { case (r, i) => Row(i, r.getString(0)) },
      StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("value", StringType, nullable = true))))
    // payload = everything after the FIRST ';' — payloads may themselves
    // contain semicolons (substring_index(value, ";", -1) would keep only
    // the tail after the LAST one and corrupt such payloads on round-trip)
    withId.select(
      col("id"),
      transform(
        split(substring_index(col("value"), ";", 1), ","),
        s => s.cast("float")).as("embedding"),
      expr("substring(value, instr(value, ';') + 1)").as("payload"))
  }

  /** One output text part per input partition; `coalesce(1)` upstream for a
    * single file when fidelity to the reference's one-file output matters.
    */
  def write(df: DataFrame, path: String): Unit =
    df.select(concat_ws(";",
        concat_ws(",", transform(col("embedding"), _.cast("string"))),
        col("payload")).as("value"))
      .write.mode("overwrite").text(path)
}
