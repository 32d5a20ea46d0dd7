package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[StatefulFunnel]] — the state-machine streaming form of the 3-step
  * greedy funnel (SURVEY §2.14: the join form is provably impossible;
  * this is the flatMapGroupsWithState path). The q334 gate pins the
  * full-corpus equality against q325's batch oracle; this spec pins the
  * pieces a gate can't isolate: the greedy chain itself, cross-batch
  * DISORDER (the anchor arriving after later events already
  * processed), anchorless eviction, and the punctuation row never
  * leaking into output.
  */
class StatefulFunnelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val H = 3600000000L // 1h in µs

  test("chain: greedy-earliest per step, per-step windows, missing steps") {
    def c(evs: (Int, Long)*) = StatefulFunnel.chain(evs, 3, gapUs = H)
    // straight conversion; later candidates ignored
    assert(c((1, 0L), (2, H / 2), (2, H - 1), (3, H / 2 + 10)) ==
      Some((0L, H / 2 + 10)))
    // anchor = EARLIEST signup even when a later one would convert
    assert(c((1, 0L), (1, 10 * H), (2, 10 * H + 1), (3, 10 * H + 2))
      .isEmpty)
    // middle step outside the window kills the chain
    assert(c((1, 0L), (2, H + 1), (3, H + 2)).isEmpty)
    // step-3 window anchors on t2, not t1
    assert(c((1, 0L), (2, H), (3, 2 * H)) == Some((0L, 2 * H)))
    // boundary: t > prev (strict) and t <= prev + gap (inclusive)
    assert(c((1, 0L), (2, 0L), (3, 1L)).isEmpty)
    assert(c((1, 0L), (2, H), (3, H)).isEmpty)
  }

  /** Write a hand-built event set as `<dir>/bNNN.parquet` files (one
    * per batch, mtime-ordered so maxFilesPerTrigger=1 replays them in
    * sequence; the spec passes glob "b*.parquet").
    */
  private def eventDir(batches: Seq[Seq[(Long, String, Long)]]): String = {
    val root = Files.createTempDirectory("graft_sfunnel").toString
    batches.zipWithIndex.foreach { case (rows, i) =>
      val tmp = s"$root/stage_b$i"
      rows.toDF("user_id", "event_type", "us")
        .select(col("user_id"), col("event_type"),
          timestamp_micros(col("us"))
            .cast(org.apache.spark.sql.types.TimestampNTZType).as("ts"))
        .coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(root, f"b$i%03d.parquet")
      assert(part.renameTo(dst))
      dst.setLastModified(1000000L * (i + 1))
    }
    root
  }

  test("cross-batch disorder: an earlier anchor arriving in a LATER batch still wins") {
    val base = 86400000000L * 1000 // day 1000 — keep timestamps sane
    val dir = eventDir(Seq(
      // batch 1: user 2's LATER signup + its chain; user 1 complete;
      // user 3 anchorless; user 4 middle step out of window
      Seq((1L, "signup", base), (1L, "view", base + H / 2),
        (1L, "purchase", base + H),
        (2L, "signup", base + 100 * H), (2L, "view", base + 100 * H + 10),
        (2L, "purchase", base + 100 * H + 20),
        (3L, "view", base), (3L, "purchase", base + 1),
        (4L, "signup", base), (4L, "view", base + 2 * H),
        (4L, "purchase", base + 2 * H + 1)),
      // batch 2: user 2's TRUE anchor (earlier, but still above the
      // batch-1 watermark at delay 2h), whose 1h window holds no
      // qualifying view — the conversion visible in batch 1 must NOT
      // emit once the true anchor lands
      Seq((2L, "signup", base + 99 * H))))
    val out = StatefulFunnel.runFunnel(spark, dir,
        Seq("signup", "view", "purchase"), gapUs = H,
        delaySeconds = 7200, queryName = "sfunnel_disorder",
        maxFilesPerTrigger = Some(1), glob = "b*.parquet")
      .collect().map(c => (c.user_id, c.lat_us)).toMap
    assert(out == Map(1L -> H),
      s"only user 1 converts (user 2's true anchor strands the chain): $out")
  }

  test("punctuation user never emits; all-user flush matches the batch operator") {
    val dir = TestSpark.sf
    val conv = StatefulFunnel.runFunnel(spark, dir,
        Seq("signup", "view", "purchase"), gapUs = 604800000000L,
        delaySeconds = 3600, queryName = "sfunnel_flush")
      .collect()
    assert(!conv.exists(_.user_id < 0L))
    val batch = graft.operators.EventStats.funnelLatency(
        graft.Tables.events(spark, dir), "user_id", "ts", "event_type",
        Seq("signup", "view", "purchase"),
        maxGapMicros = 604800000000L, bucketMicros = 86400000000L)
      .agg(sum("n_users")).head().getLong(0)
    assert(conv.length.toLong == batch,
      "every batch conversion must flush through the state machine")
  }

  test("session hygiene: the nanosAsLong conf is restored; a caller-supplied clock skips the batch pre-read") {
    val base = 86400000000L * 1000
    val dir = eventDir(Seq(Seq(
      (1L, "signup", base), (1L, "view", base + H / 2),
      (1L, "purchase", base + H))))
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    // prior value present: restored to it
    spark.conf.set(key, "false")
    StatefulFunnel.runFunnel(spark, dir, Seq("signup", "view", "purchase"),
      gapUs = H, delaySeconds = 3600, queryName = "sfunnel_conf1",
      glob = "b*.parquet").collect()
    assert(spark.conf.get(key) == "false",
      "runFunnel must restore the caller's conf value")
    // prior value absent: restored to the default behavior (RuntimeConfig
    // reports a defaulted conf as its default value, so "restore" writes
    // the equivalent explicit default — observable behavior unchanged)
    spark.conf.unset(key)
    StatefulFunnel.runFunnel(spark, dir, Seq("signup", "view", "purchase"),
      gapUs = H, delaySeconds = 3600, queryName = "sfunnel_conf2",
      glob = "b*.parquet").collect()
    assert(spark.conf.get(key) == "false",
      "runFunnel must leave the default behavior in place")
    // caller-supplied clock: same conversions, no batch-derived max
    val out = StatefulFunnel.runFunnel(spark, dir,
        Seq("signup", "view", "purchase"), gapUs = H,
        delaySeconds = 3600, queryName = "sfunnel_conf3",
        glob = "b*.parquet", clockUs = Some(base + 2 * H))
      .collect().map(c => (c.user_id, c.lat_us)).toMap
    assert(out == Map(1L -> H), out.toString)
  }
}
