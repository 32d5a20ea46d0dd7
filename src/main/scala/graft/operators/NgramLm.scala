package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-based n-gram language-model scoring — the perplexity-class
  * quality filter of published corpus pipelines (CCNet filters web text by
  * KenLM perplexity; this is the Spark-native, exactly-reproducible
  * analogue): train bigram/unigram counts on a training slice, score every
  * document by its mean bigram log-probability under stupid backoff
  * (Brants et al. 2007 — no discounting, a fixed 0.4 backoff factor,
  * which keeps every number a ratio of counts that any SQL engine can
  * recompute bit-for-bit).
  *
  * Scoring semantics per bigram (w1, w2), counts from the TRAIN slice:
  *  - seen bigram:   s = c2(w1,w2) / c1(w1)
  *  - unseen bigram: s = 0.4 · (c1(w2) + 0.5) / T
  * (T = total train tokens; the +0.5 keeps unseen-unigram backoff finite).
  * Doc score = mean ln s over its bigrams; docs under 2 tokens produce no
  * bigrams and drop out.
  *
  * The train slice must be held out from the scored docs' perspective
  * (score everything, train on the [[graft.queries]] q60 fingerprint
  * split) or backoff never fires — a corpus containing its own eval slice
  * sees every bigram.
  *
  * Scale shape: two explode + partial-agg passes build the count tables;
  * scoring is equi-joins of the (doc, w1, w2) stream against them. The
  * count tables are corpus-vocabulary-sized, so the joins are left to
  * Catalyst/AQE (broadcast when small, shuffle when not) — NOT forced
  * broadcast; only the single-row total is. At real scale a production
  * deployment would threshold rare bigrams out of c2 (KenLM prunes too) —
  * counts here are exact because the oracle gate demands it.
  */
object NgramLm {

  /** Adjacent-pair structs from an ALREADY-MATERIALIZED token array
    * column (the [[TextAnalysis.ngramsFromTokens]] caveat: materialize
    * the array in its own projection first — the guard, the sequence
    * bound, and the lambda all reference it). Empty under 2 tokens; the
    * explicit guard matters because `sequence(1, 0)` counts DOWN.
    */
  def bigramStructs(toks: Column): Column =
    when(size(toks) < 2, array().cast("array<struct<w1:string,w2:string>>"))
      .otherwise(transform(sequence(lit(1), size(toks) - 1),
        i => struct(element_at(toks, i).as("w1"),
          element_at(toks, i + 1).as("w2"))))

  /** Per-document stupid-backoff scores: (`idCol`, n_bigrams, raw_lp).
    * `isTrain` selects the count-training slice over `df`'s columns.
    * `raw_lp` (mean ln s) is returned unrounded — rank-and-cut callers
    * round before ordering (accumulation-order ulps must never decide a
    * rank or a gate hash).
    */
  def lmScores(df: DataFrame, idCol: String, textCol: String,
      isTrain: Column): DataFrame = {
    val base = df.select(col(idCol), isTrain.as("__train"),
      TextAnalysis.normalizedTokens(col(textCol)).as("__toks"))
    val bg = base
      .select(col(idCol), col("__train"),
        explode(bigramStructs(col("__toks"))).as("__bg"))
      .select(col(idCol), col("__train"),
        col("__bg.w1").as("__w1"), col("__bg.w2").as("__w2"))
    val c2 = bg.filter(col("__train"))
      .groupBy("__w1", "__w2").agg(count(lit(1)).as("__c2"))
    val uni = base.filter(col("__train"))
      .select(explode(col("__toks")).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__c1"))
    val tot = uni.agg(sum("__c1").cast("double").as("__t"))
    val u1 = uni.select(col("__w").as("__w1"), col("__c1").as("__c1w1"))
    val u2 = uni.select(col("__w").as("__w2"), col("__c1").as("__c1w2"))
    bg
      .join(c2, Seq("__w1", "__w2"), "left")
      .join(u1, Seq("__w1"), "left")
      .join(u2, Seq("__w2"), "left")
      .crossJoin(broadcast(tot))
      // a seen bigram implies a seen context, so c1(w1) is never null on
      // that branch; the backoff branch tolerates both words being unseen
      .withColumn("__s", when(col("__c2").isNotNull,
          col("__c2").cast("double") / col("__c1w1"))
        .otherwise(lit(0.4) *
          (coalesce(col("__c1w2"), lit(0L)) + 0.5) / col("__t")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        avg(log(col("__s"))).as("raw_lp"))
  }
}
