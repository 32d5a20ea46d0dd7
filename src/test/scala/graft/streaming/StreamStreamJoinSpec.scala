package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Stream-stream interval join: purchases joined to the same user's signups
  * within a trailing 1-day window, both sides watermarked so the join state
  * is bounded (the watermark + interval condition lets Spark evict right
  * rows older than the join horizon — the property that makes this viable
  * unbounded).
  */
class StreamStreamJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("watermarked purchase⋈signup interval join matches the batch join") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"${TestSpark.sf}/events.parquet"
    val schema = spark.read.parquet(path).schema

    def side(eventType: String, prefix: String) = graft.Tables.normalizeTs(
        spark.readStream
          .schema(schema)
          .option("pathGlobFilter", "events.parquet")
          .parquet(TestSpark.sf))
      .filter(col("event_type") === eventType)
      .select(
        col("event_id").as(s"${prefix}_id"),
        col("user_id").as(s"${prefix}_user"),
        col("ts").as(s"${prefix}_ts"))
      .withWatermark(s"${prefix}_ts", "1 hour")

    val joined = side("purchase", "p").join(
      side("signup", "s"),
      expr("""p_user = s_user AND
              s_ts BETWEEN p_ts - INTERVAL 1 DAY AND p_ts"""))

    val q = joined.writeStream
      .outputMode("append").format("memory").queryName("ss_join")
      .trigger(Trigger.AvailableNow()).start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("ss_join")
      .select("p_id", "s_id").as[(Long, Long)].collect().toSet

    val ev = graft.Tables.events(spark, TestSpark.sf)
    val p = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("p_id"), $"user_id".as("p_user"), $"ts".as("p_ts"))
    val s = ev.filter($"event_type" === "signup")
      .select($"event_id".as("s_id"), $"user_id".as("s_user"), $"ts".as("s_ts"))
    val batch = p.join(s,
        expr("p_user = s_user AND s_ts BETWEEN p_ts - INTERVAL 1 DAY AND p_ts"))
      .select("p_id", "s_id").as[(Long, Long)].collect().toSet

    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }
}
