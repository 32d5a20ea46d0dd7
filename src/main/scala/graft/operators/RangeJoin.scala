package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed point-in-interval join — the range-join operator class.
  *
  * The naive formulation (`points JOIN intervals ON t >= start AND t < end`)
  * has no equality key, so Spark plans a BroadcastNestedLoopJoin (or a
  * cartesian product): O(|points| × |intervals|) comparisons — a
  * scale-killer the moment intervals stop fitting the broadcast threshold.
  * This operator buckets time into fixed `bucketWidth` slots: a point lives
  * in exactly one bucket, an interval is exploded over the buckets it
  * covers, and the join becomes a plain hash equi-join on the bucket id
  * followed by the exact containment filter. Work drops to
  * O(|points| + |intervals| × spanFactor + |matches|), shuffle keys on the
  * bucket, and every join strategy (broadcast / shuffled-hash / sort-merge)
  * is available to Catalyst again.
  *
  * Correctness does not depend on `bucketWidth` (a candidate pair meets in
  * the point's single bucket iff the interval covers that bucket, and the
  * exact filter decides membership) — only the explode factor does. Pick
  * `bucketWidth` near the typical interval length: explode factor stays
  * ~2× and buckets stay selective. Intervals covering more than
  * `maxBucketsPerInterval` buckets fail LOUDLY (`raise_error`) instead of
  * silently exploding the intermediate — same discipline as the dedup
  * hot-bucket caps; callers with genuinely enormous intervals widen the
  * bucket or split the interval.
  *
  * Interval semantics are half-open `[start, end)`; empty intervals
  * (`end <= start`) match nothing and are dropped before the explode
  * (`sequence(hi, lo)` counts DOWN — an unguarded empty interval would
  * fabricate buckets).
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      bucketWidth: Long, maxBucketsPerInterval: Int = 64): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(maxBucketsPerInterval >= 1,
      s"maxBucketsPerInterval must be >= 1, got $maxBucketsPerInterval")
    def bucketOf(c: org.apache.spark.sql.Column) =
      floor(c.cast("double") / bucketWidth).cast("long")
    val startB = bucketOf(col(startCol))
    val endB = bucketOf(col(endCol) - 1) // inclusive end bucket of [start, end)
    val guardedEnd = when(endB - startB >= maxBucketsPerInterval,
      raise_error(concat(
        lit(s"pointInInterval: an interval covers >= $maxBucketsPerInterval " +
          s"buckets of width $bucketWidth (start="),
        col(startCol).cast("string"), lit(", end="),
        col(endCol).cast("string"),
        lit(") — widen bucketWidth or split the interval"))).cast("long"))
      .otherwise(endB)
    val exploded = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__bucket", explode(sequence(startB, guardedEnd)))
    points
      .withColumn("__bucket", bucketOf(col(pointCol)))
      .join(exploded, Seq("__bucket"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bucket")
  }

  /** Interval×interval overlap join — the second range-join class
    * (concurrent sessions, ad-window × visit-window attribution, temporal
    * conflict detection). Two half-open intervals overlap iff
    * `lStart < rEnd && rStart < lEnd`; the naive formulation is again a
    * nested loop, so both sides explode over their covered buckets and
    * meet in a hash equi-join on the bucket id.
    *
    * An overlapping pair shares EVERY bucket their overlap spans, so the
    * equi-join alone would emit duplicates; the pair is kept only in the
    * bucket containing the overlap's start (`max(lStart, rStart)`) —
    * that bucket lies in both sides' exploded ranges, so each
    * overlapping pair survives exactly once and nothing needs a
    * `distinct`. Same loud explode-factor cap and same empty-interval
    * guard as [[pointInInterval]], applied to both sides; the four
    * column names must be distinct (both sides' columns survive in the
    * output — alias any OTHER shared column names before calling, or the
    * joined frame carries ambiguous duplicates).
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketWidth: Long, maxBucketsPerInterval: Int = 64): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(maxBucketsPerInterval >= 1,
      s"maxBucketsPerInterval must be >= 1, got $maxBucketsPerInterval")
    require(Seq(lStart, lEnd, rStart, rEnd).distinct.size == 4,
      s"interval column names must be distinct across the two sides, " +
        s"got ($lStart, $lEnd) and ($rStart, $rEnd)")
    def bucketOf(c: org.apache.spark.sql.Column) =
      floor(c.cast("double") / bucketWidth).cast("long")
    def explodeSide(df: DataFrame, sc: String, ec: String): DataFrame = {
      val sB = bucketOf(col(sc))
      val eB = bucketOf(col(ec) - 1)
      val guarded = when(eB - sB >= maxBucketsPerInterval,
        raise_error(concat(
          lit(s"intervalOverlap: an interval covers >= $maxBucketsPerInterval " +
            s"buckets of width $bucketWidth (start="),
          col(sc).cast("string"), lit(", end="), col(ec).cast("string"),
          lit(") — widen bucketWidth or split the interval"))).cast("long"))
        .otherwise(eB)
      df.filter(col(ec) > col(sc))
        .withColumn("__bucket", explode(sequence(sB, guarded)))
    }
    explodeSide(left, lStart, lEnd)
      .join(explodeSide(right, rStart, rEnd), Seq("__bucket"))
      .filter(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      .filter(col("__bucket") ===
        bucketOf(greatest(col(lStart), col(rStart))))
      .drop("__bucket")
  }
}
