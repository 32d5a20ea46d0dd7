package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** The FULL multi-step funnel on a stream — the state-machine path.
  *
  * SURVEY §2.14 proves the 3-step greedy chain has NO join-form
  * streaming reformulation: its middle anchor (the earliest qualifying
  * view, INCLUDING views with no downstream purchase) is a minimum over
  * events a purchase-joined pair stream cannot observe, and Structured
  * Streaming forbids the aggregation-before-join that would compute it.
  * What the join form cannot express, PER-KEY CUSTOM STATE can: each
  * user's events buffer in `flatMapGroupsWithState` until the event-time
  * watermark passes the chain's decision deadline (anchor + (steps−1) ·
  * gap — after which no admissible event can change the greedy chain),
  * then the chain FINALIZES exactly once and the state evicts.
  *
  * Disorder safety: the chain is computed only from the buffered set at
  * finalization, so intra-horizon arrival order is immaterial; events
  * later than the watermark are dropped by the standard late-data
  * contract (and cannot duplicate a finalized user: everything relevant
  * to an emitted chain is below the watermark that emitted it). State
  * is bounded by one user's traffic inside the funnel horizon — the
  * property that keeps this viable on an unbounded stream. Users with
  * no anchor evict once the watermark clears their newest event + gap
  * (a future anchor cannot reach back to them).
  *
  * Bounded-replay finalization: a file replay's watermark stops `delay`
  * short of the max event time, so terminal state would never flush
  * (the round-2 boundary). Production streams advance watermarks with
  * ongoing traffic; a bounded replay models that with one PUNCTUATION
  * row far past every deadline (`user_id = −1`, filtered from output) —
  * [[runFunnel]] ships its own.
  */
object StatefulFunnel {

  /** (step ordinal 1..k, exact epoch-µs). */
  case class FunnelState(events: Seq[(Int, Long)])
  case class Conversion(user_id: Long, t1_us: Long, tk_us: Long, lat_us: Long)

  /** The batch chain verbatim: t1 = min step-1; t_{i+1} = min step-(i+1)
    * in (t_i, t_i + gap]. Returns (t1, t_k) when every step completes.
    */
  private[streaming] def chain(events: Seq[(Int, Long)], nSteps: Int,
      gapUs: Long): Option[(Long, Long)] = {
    val byStep = events.groupBy(_._1)
    byStep.get(1).map(_.map(_._2).min).flatMap { t1 =>
      var cur = t1
      var ok = true
      var i = 2
      while (ok && i <= nSteps) {
        val nxt = byStep.getOrElse(i, Nil).map(_._2)
          .filter(t => t > cur && t <= cur + gapUs)
        if (nxt.isEmpty) ok = false else cur = nxt.min
        i += 1
      }
      if (ok) Some((t1, cur)) else None
    }
  }

  /** Run the stateful funnel over the events stream (+ a punctuation
    * stream that flushes terminal state on the bounded replay). Output:
    * one Conversion row per converted user.
    *
    * Session hygiene (the r15 verdict's side-effect note): the
    * `nanosAsLong` legacy conf the nanos-encoded source needs is SAVED
    * and RESTORED around the run — a caller composing this in a
    * long-lived session no longer inherits the flip. `clockUs` supplies
    * the punctuation clock explicitly (the decayedCounts anchor
    * convention — pass the known max event time and the batch pre-read
    * is skipped entirely); without it the clock derives from ONE
    * column-pruned batch pass over the source (replayable, but a second
    * read of the data — fine for the gate harness this defaults for).
    */
  def runFunnel(spark: SparkSession, sfDir: String, steps: Seq[String],
      gapUs: Long, delaySeconds: Long, queryName: String,
      maxFilesPerTrigger: Option[Int] = None,
      glob: String = "events.parquet",
      clockUs: Option[Long] = None): Dataset[Conversion] = {
    require(steps.length >= 2, "funnel needs at least 2 steps")
    val confKey = "spark.sql.legacy.parquet.nanosAsLong"
    val priorConf = spark.conf.getOption(confKey)
    spark.conf.set(confKey, "true")
    try runFunnelInner(spark, sfDir, steps, gapUs, delaySeconds,
      queryName, maxFilesPerTrigger, glob, clockUs)
    finally priorConf match {
      case Some(v) => spark.conf.set(confKey, v)
      case None => spark.conf.unset(confKey)
    }
  }

  private def runFunnelInner(spark: SparkSession, sfDir: String,
      steps: Seq[String], gapUs: Long, delaySeconds: Long,
      queryName: String, maxFilesPerTrigger: Option[Int],
      glob: String, clockUs: Option[Long]): Dataset[Conversion] = {
    import spark.implicits._
    val raw = spark.read
      .option("pathGlobFilter", glob).parquet(sfDir)
    val schema = raw.schema
    val nSteps = steps.length
    val horizonUs = (nSteps - 1).toLong * gapUs

    // the punctuation row: one event far past every decision deadline,
    // written in the source's OWN ts encoding (raw INT64 nanos or
    // TIMESTAMP_NTZ — the testdata has shipped both). Clock: the
    // caller's, or the batch-derived max (a replayable clock, the
    // decayedCounts anchor rule).
    val maxUs = clockUs.getOrElse(graft.Tables.normalizeTs(raw)
      .agg(max(unix_micros(col("ts")))).head().getLong(0))
    val hbUs = maxUs + horizonUs + 2L * gapUs
    val hbTsValue: Any = schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => hbUs * 1000L
      case _ => java.time.LocalDateTime.ofEpochSecond(
        hbUs / 1000000L, ((hbUs % 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC)
    }
    val hbDir = java.nio.file.Files
      .createTempDirectory("graft_funnel_hb").toString
    spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row.fromSeq(
          schema.fields.map {
            case f if f.name == "user_id" => -1L
            case f if f.name == "ts" => hbTsValue
            case f if f.name == "event_type" => steps.head
            case f => f.dataType match {
              case org.apache.spark.sql.types.LongType => 0L
              case org.apache.spark.sql.types.IntegerType => 0
              case org.apache.spark.sql.types.DoubleType => 0.0
              case _ => "hb"
            }
          }.toSeq)), 1), schema)
      .write.mode("overwrite").parquet(hbDir)

    def src(dir: String, glob: String) = {
      val r = spark.readStream.schema(schema).option("pathGlobFilter", glob)
      maxFilesPerTrigger.foreach(n =>
        r.option("maxFilesPerTrigger", n.toString))
      graft.Tables.normalizeTs(r.parquet(dir))
    }
    val stepOrd = steps.zipWithIndex
      .map { case (s, i) => (s, i + 1) }.toMap
    val events = src(sfDir, glob)
      .unionByName(src(hbDir, "*.parquet"))
      .filter(col("event_type").isin(steps: _*))
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"), col("ts"))
      .withWatermark("ts", s"$delaySeconds seconds")
      .as[(Long, String, Long, java.sql.Timestamp)]

    val conversions = events
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, Conversion](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid: Long,
            it: Iterator[(Long, String, Long, java.sql.Timestamp)],
            state: GroupState[FunnelState]) =>
          if (uid < 0L) { // punctuation traffic holds no state
            if (state.exists) state.remove()
            Iterator.empty
          } else {
            val arrived = it.map(e => (stepOrd(e._2), e._3)).toSeq
            val evs = state.getOption.map(_.events).getOrElse(Nil) ++ arrived
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            val anchor = evs.filter(_._1 == 1).map(_._2)
              .reduceOption((a: Long, b: Long) => math.min(a, b))
            val deadline = anchor.map(_ + horizonUs)
            if (deadline.exists(wmUs > _)) {
              // decision-final: no admissible event can still arrive
              state.remove()
              chain(evs, nSteps, gapUs)
                .map { case (t1, tk) =>
                  Conversion(uid, t1, tk, tk - t1) }
                .iterator
            } else if (evs.isEmpty ||
                (anchor.isEmpty && wmUs > evs.map(_._2).max + gapUs)) {
              // anchorless and cold: a future anchor (ts > wm) can never
              // qualify these held events (they all precede it)
              if (state.exists) state.remove()
              Iterator.empty
            } else {
              state.update(FunnelState(evs))
              val wake = deadline
                .getOrElse(evs.map(_._2).max + gapUs)
              state.setTimeoutTimestamp(
                math.max(wake / 1000L + 1L,
                  state.getCurrentWatermarkMs() + 1L))
              Iterator.empty
            }
          }
      }

    val q = conversions.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(queryName).as[Conversion]
  }

  /** The q325 histogram from the streamed conversions (batch post-math
    * on the sink — exact integer µs day buckets).
    */
  def funnelLatencyStream(spark: SparkSession, sfDir: String,
      steps: Seq[String], gapUs: Long, bucketMicros: Long,
      queryName: String): DataFrame = {
    runFunnel(spark, sfDir, steps, gapUs, delaySeconds = 3600,
        queryName = queryName)
      .toDF()
      .select(col("lat_us").as("__lat"))
      .withColumn("bucket", expr(s"__lat DIV $bucketMicros"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_users"),
        min("__lat").as("lo_us"), max("__lat").as("hi_us"))
      .orderBy("bucket")
  }
}
