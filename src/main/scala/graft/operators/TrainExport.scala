package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-set export: deterministic global shuffle + sharding.
  *
  * Training jobs need the corpus in pseudo-random order, split into
  * same-sized shards, and REPRODUCIBLE — re-running the export (or
  * re-exporting after fixing one upstream bug) must yield byte-identical
  * shards, or training runs aren't comparable. A `rand()`-based shuffle
  * fails that on any retry/speculative re-execution; this one derives both
  * the shard and the within-shard order from `md5(seed ":" id)`, so the
  * layout is a pure function of (data, seed) — any engine can recompute
  * it (the audit query's DuckDB oracle does exactly that).
  *
  * Scale shape: shard assignment is one codegen'd hash per row; the export
  * is one hash-partitioned shuffle straight into the writer with a
  * partition-local sort — no global sort, no driver involvement, no skew
  * (md5 is uniform: expected shard imbalance at N rows is O(√(N/shards))).
  */
object TrainExport {

  /** Append `__shuffle_key` (the md5 order key) and `shard`
    * (first 16 bits of the key mod `nShards`) to `df`.
    *
    * `nShards` must divide 65536 (i.e. be a power of two ≤ 65536): the
    * shard id comes from a 16-bit slice of the key, and a non-divisor
    * would bias low shard ids (65536 % n leftover values) — a silent
    * imbalance this operator exists to prevent.
    */
  def withShard(df: DataFrame, idCol: String, nShards: Int,
      seed: String = "shard"): DataFrame = {
    require(nShards >= 1 && 65536 % nShards == 0,
      s"nShards must be a power of two <= 65536, got $nShards")
    val key = md5(concat(lit(seed + ":"), col(idCol).cast("string")))
    df.withColumn("__shuffle_key", key)
      .withColumn("shard",
        conv(substring(col("__shuffle_key"), 1, 4), 16, 10).cast("long")
          % nShards)
  }

  /** Balance + determinism audit, one row per shard: doc count, token
    * budget, and the first/last order keys (the keys pin the permutation,
    * so a hash-match on this frame proves the whole layout).
    */
  def shardAudit(df: DataFrame, idCol: String, textCol: String,
      nShards: Int, seed: String = "shard"): DataFrame =
    withShard(df, idCol, nShards, seed)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col(textCol))).cast("long").as("n_tokens"),
        min("__shuffle_key").as("first_key"),
        max("__shuffle_key").as("last_key"))
      .orderBy("shard")

  /** Deterministic proportional stratified sample: keep
    * `ceil(n · keepNumer / keepDenom)` rows of every stratum, chosen by
    * md5 order — the per-source/per-language mixture-downsampling step of
    * a corpus build (cap web text at 20%, keep all of a trusted source,
    * etc.), seedless-reproducible like every sampler here ([[withShard]]'s
    * doctrine: a `rand()` sample changes under retries and cluster
    * resizing; an md5-order sample is a pure function of the data).
    *
    * The keep fraction is a RATIONAL (`keepNumer / keepDenom`) and the
    * keep count is exact integer math (`(n·num + den − 1) DIV den`) —
    * `ceil(0.2 · n)` in doubles is off-by-one whenever `0.2 · n` lands on
    * a representation boundary (0.2 has no exact double), and engines
    * disagreeing by one row on a 5 000-row stratum is precisely the class
    * of bug the oracle gate exists to catch.
    *
    * Output: the input columns plus `rn` (1-based md5-order rank within
    * the stratum — stable, so downstream can sub-sample by rank).
    *
    * Scale shape: one shuffle on the strata columns; both windows (rank
    * and stratum count) share that exchange. A pathologically hot stratum
    * serializes its sort into one task — strata here are bounded
    * catalogs (source × language), not user-scale keys; for unbounded
    * strata, pre-aggregate counts and join instead of the count window.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCols: Seq[String],
      keepNumer: Int, keepDenom: Int, seed: String = "samp"): DataFrame = {
    require(strataCols.nonEmpty, "at least one stratum column required")
    require(keepDenom >= 1 && keepNumer >= 0 && keepNumer <= keepDenom,
      s"keep fraction must be in [0, 1]: got $keepNumer/$keepDenom")
    val strata = strataCols.map(col)
    val key = md5(concat(lit(seed + ":"), col(idCol).cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strata: _*).orderBy(key, col(idCol))
    val cw = org.apache.spark.sql.expressions.Window.partitionBy(strata: _*)
    df.withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(cw))
      .filter(col("rn") <=
        expr(s"(__n * $keepNumer + ${keepDenom - 1}) DIV $keepDenom"))
      .drop("__n")
  }

  /** Deterministic weighted sampling without replacement — the
    * Efraimidis–Spirakis scheme with md5 uniforms: each row draws
    * u ∈ (0,1) from a 16-bit md5 slice and ranks by ln(u)/w (the
    * log-form of the classic u^(1/w) key); the top `n` keys are a
    * weighted sample without replacement. The usual implementation draws
    * u from `rand()` and breaks under retries; this one is a pure
    * function of (id, seed), so any engine replays the exact sample
    * (q115 does).
    *
    * Keys are rounded at 9 places before ranking (they are already
    * ln-of-rational — cross-engine ulp drift is ~1e-19 — and an id
    * tie-break settles rounded collisions), and rows with non-positive
    * weight are excluded (their key is undefined). One bounded top-n
    * (TakeOrderedAndProject), no shuffle, no window.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      n: Int, seed: String = "ws"): DataFrame = {
    require(n >= 1, s"n must be positive, got $n")
    val u = (conv(substring(md5(concat(lit(seed + ":"),
      col(idCol).cast("string"))), 1, 4), 16, 10).cast("double") + 1.0) /
      65537.0
    df.filter(col(weightCol) > 0)
      .withColumn("skey", round(log(u) / col(weightCol), 9))
      .orderBy(desc("skey"), col(idCol))
      .limit(n)
  }

  /** Materialize the shards: one directory per shard, rows in shuffle-key
    * order within each file. `repartition(nShards, shard)` makes the write
    * a single shuffle whose output partitioning IS the shard layout —
    * `partitionBy` then splits ready-sorted partitions without a second
    * exchange.
    */
  def exportShards(df: DataFrame, idCol: String, path: String,
      nShards: Int, seed: String = "shard"): Unit =
    withShard(df, idCol, nShards, seed)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", "__shuffle_key")
      .write.mode("overwrite").partitionBy("shard").parquet(path)
}
