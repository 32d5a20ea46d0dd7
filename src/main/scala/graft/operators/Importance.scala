package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-selection importance weighting over hashed n-gram features — the
  * published DSIR recipe (Xie et al., "Data Selection for Language Models
  * via Importance Resampling", NeurIPS 2023): estimate a target and a raw
  * unigram distribution over a small hashed feature space, weight every
  * document by its log likelihood ratio, and keep the highest-scoring docs
  * as the training mixture. The classic use: raw = a web crawl, target =
  * a small trusted corpus (wiki/books), score = "how target-like is this
  * document".
  *
  * Everything is md5-derived and add-one smoothed in exact arithmetic, so
  * a SQL engine recomputes the identical weights (the oracle convention
  * every operator here follows).
  *
  * Scale shape: two linear passes over the token stream — a partial-agg
  * count into `nBuckets` cells (a few-hundred-row result regardless of
  * corpus size), then a broadcast join of those weights back onto the
  * tokens and a per-doc partial-agg sum. No shuffle ever carries more
  * than (doc, bucket) pairs; the weights table is O(nBuckets). At real
  * scale, persist the exploded token-bucket table (or estimate the
  * weights on a sample) rather than tokenizing twice — the two passes
  * here re-derive it per branch, which is the right trade at gate scale
  * and a one-line `.persist()` at 100 TB.
  */
object Importance {

  /** Hashed feature bucket for a token: a 16-bit md5 slice mod `nBuckets`.
    * `nBuckets` must divide 65536 so the slice maps uniformly (no modulo
    * bias) — the [[TrainExport.withShard]] convention.
    */
  def hashBucket(token: Column, nBuckets: Int): Column = {
    require(nBuckets >= 2 && 65536 % nBuckets == 0,
      s"nBuckets must be >= 2 and divide 65536, got $nBuckets")
    conv(substring(md5(token), 1, 4), 16, 10).cast("long") % nBuckets
  }

  /** Per-document importance scores: one row per input doc that has ≥ 1
    * normalized token, with `n_tokens` and `raw_score` = Σ_tokens
    * ln(p_target(bucket) / p_raw(bucket)) under add-one smoothing.
    * `isTarget` is a boolean column over `df`'s columns selecting the
    * target corpus (e.g. `col("lang") === "en"` or a trusted-source
    * predicate); the raw distribution is the whole frame.
    *
    * `raw_score` is returned unrounded — rank-and-cut callers round
    * before ordering (accumulation-order ulps must never decide a rank).
    */
  def importanceScores(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, nBuckets: Int = 256): DataFrame = {
    val toks = df
      .select(col(idCol), isTarget.as("__tgt"),
        explode(regexp_extract_all(lower(col(textCol)),
          lit("[a-z0-9]+"), lit(0))).as("__token"))
      .select(col(idCol), col("__tgt"),
        hashBucket(col("__token"), nBuckets).as("__b"))
    val counts = toks.groupBy("__b").agg(
      count(lit(1)).as("__cr"),
      count(when(col("__tgt"), 1)).as("__ct"))
    val totals = counts.agg(
      sum("__cr").cast("double").as("__tr"),
      sum("__ct").cast("double").as("__tt"))
    // ln(pt) − ln(pr), each probability add-one smoothed over nBuckets
    // cells; written as a DIFFERENCE of logs (not ln of a ratio) so the
    // oracle can mirror the exact floating-point evaluation order
    val weights = counts.crossJoin(broadcast(totals)).select(
      col("__b"),
      (log((col("__ct") + 1.0) / (col("__tt") + nBuckets.toDouble)) -
        log((col("__cr") + 1.0) / (col("__tr") + nBuckets.toDouble)))
        .as("__w"))
    toks.join(broadcast(weights), Seq("__b"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        sum("__w").as("raw_score"))
  }
}
