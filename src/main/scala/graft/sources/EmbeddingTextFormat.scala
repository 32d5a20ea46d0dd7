package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reader/writer for the reference's embeddings-file line format:
  * `"{f32,f32,...};{payload}"`, one record per line, line number = implicit
  * id (`/root/reference/src/utils/embeddings.rs:52-71`).
  *
  * This is the fidelity source/sink; Parquet is the primary format. The read
  * path materializes explicit line-number ids with the same two-job shape
  * `RDD.zipWithIndex` uses (per-partition counts → cumulative offsets) but
  * entirely in the SQL engine — the text scan stays codegen'd and
  * AQE-planned instead of detouring through a side RDD physical plan.
  */
object EmbeddingTextFormat {

  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = true),
    StructField("payload", StringType, nullable = true)))

  def read(spark: SparkSession, path: String): DataFrame = {
    // line order without a shuffle: within a text split the source emits
    // rows in line order and monotonically_increasing_id is consecutive, so
    // (mid − first mid of the partition) is the in-split line index; splits
    // of one file map to partitions in byte-offset order (the pipeline's
    // convention, EmbeddingPipeline.processEmbeddings). The per-partition
    // stats aggregate is one tiny job (a row per split — what zipWithIndex
    // also runs), and the offsets ride back in as a broadcast join.
    val lines = spark.read.text(path)
      .select(spark_partition_id().as("__pid"),
        monotonically_increasing_id().as("__mid"),
        col("value"))
    val stats = lines.groupBy("__pid")
      .agg(count(lit(1)).as("n"), min("__mid").as("m0"))
      .orderBy("__pid")
      .collect()
    var acc = 0L
    val bases = stats.map { r =>
      val base = acc - r.getLong(2) // cumulative offset − first mid
      acc += r.getLong(1)
      Row(r.getInt(0), base)
    }
    val off = spark.createDataFrame(
      java.util.Arrays.asList(bases: _*),
      StructType(Seq(
        StructField("__pid", IntegerType, nullable = false),
        StructField("__base", LongType, nullable = false))))
    // payload = everything after the FIRST ';' — payloads may themselves
    // contain semicolons (substring_index(value, ";", -1) would keep only
    // the tail after the LAST one and corrupt such payloads on round-trip)
    lines.join(broadcast(off), Seq("__pid"))
      .select(
        (col("__mid") + col("__base")).as("id"),
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
