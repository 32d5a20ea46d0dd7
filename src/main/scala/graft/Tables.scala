package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (see TESTDATA.md /
  * FIXTURES.md §B). Every SparkEntry query receives `sfDir` and reads through
  * here so the parquet path convention lives in one place.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  /** events.ts has shipped in two parquet encodings across testdata
    * generations: TIMESTAMP(NANOS) — which Spark 4 refuses to read as a
    * timestamp, so it is read as a long via the legacy conf and truncated
    * ns→µs (the same truncation DuckDB applies) — and TIMESTAMP(MICROS)
    * without timezone, which Spark reads as TIMESTAMP_NTZ. [[normalizeTs]]
    * maps either to a session-tz (UTC everywhere in this repo) TimestampType
    * column holding identical epoch microseconds, so every consumer sees one
    * schema regardless of generation.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(table(s, d, "events"))
  }

  /** Schema-adaptive `ts` normalization (batch or streaming frame): LongType
    * (nanosAsLong era) → exact ns→µs division; TIMESTAMP_NTZ (timestamp[us]
    * era) → cast to TimestampType, a wall-clock reinterpretation that is
    * exact under the UTC session timezone; TimestampType passes through.
    */
  def normalizeTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case org.apache.spark.sql.types.LongType =>
      df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    case org.apache.spark.sql.types.TimestampNTZType =>
      df.withColumn("ts",
        col("ts").cast(org.apache.spark.sql.types.TimestampType))
    case _ => df
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
