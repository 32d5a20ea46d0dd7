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
  * Scoring semantics per bigram (w1, w2), all counts from the TRAIN
  * slice's bigram table:
  *  - seen bigram:   s = c2(w1,w2) / ctx(w1)      (ctx = Σ_w c2(w1,w))
  *  - unseen bigram: s = 0.4 · (cont(w2) + 0.5) / T
  * where cont(w2) = Σ_w c2(w,w2) is the CONTINUATION count (how often w2
  * appears as a bigram continuation — the Kneser–Ney lower-order idea,
  * which discounts words that are frequent but only inside fixed
  * phrases), T = total train bigrams, and +0.5 keeps fully-unseen backoff
  * finite. Doc score = mean ln s over its bigrams; docs under 2 tokens
  * produce no bigrams and drop out.
  *
  * The train slice must be held out from the scored docs' perspective
  * (score everything, train on the [[graft.queries]] q60 fingerprint
  * split) or backoff never fires — a corpus containing its own eval slice
  * sees every bigram.
  *
  * Scale shape: ONE explode + partial-agg pass over the train slice
  * builds the bigram count table; context, continuation, and total
  * counts all re-aggregate THAT table (vocabulary-sized), never the
  * corpus — the identical count subtrees collapse into one physical
  * exchange (AQE ReusedExchange), so the corpus tokenizes exactly twice:
  * once for counts, once for scoring. Scoring is equi-joins of the
  * (doc, w1, w2) stream against the count tables, left to Catalyst/AQE
  * (broadcast when small, shuffle when not) — NOT forced broadcast; only
  * the single-row total is. At real scale, prune the singleton tail with
  * [[lmScores]]'s `minCount` (KenLM prunes too) — the pruned model is
  * itself oracle-gated (q140), not a documented-only deviation.
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

  /** Collocation mining by pointwise mutual information — the "phrases"
    * pass of word2vec preprocessing (Mikolov et al. 2013: join tokens
    * that co-occur far above chance into single units before training):
    * PMI(w1, w2) = ln( c2·T / (c1(w1)·c1(w2)) ) over adjacent pairs with
    * `minCount` support (PMI is unstable on rare pairs — the standard
    * floor). Returns one row per qualifying pair with counts and the
    * ROUNDED pmi (rank-grade, the house rule).
    *
    * Scale shape: the same one-explode count tables as [[lmScores]];
    * the pair→unigram joins carry only pairs above `minCount`
    * (vocabulary-shaped, not corpus-shaped).
    */
  def collocations(df: DataFrame, idCol: String, textCol: String,
      minCount: Int = 5): DataFrame = {
    require(minCount >= 1, s"minCount must be positive, got $minCount")
    val base = df.select(col(idCol),
      TextAnalysis.normalizedTokens(col(textCol)).as("__toks"))
    val bg = base
      .select(explode(bigramStructs(col("__toks"))).as("__bg"))
      .select(col("__bg.w1").as("__w1"), col("__bg.w2").as("__w2"))
    val c2 = bg.groupBy("__w1", "__w2").agg(count(lit(1)).as("c2"))
      .filter(col("c2") >= minCount)
    val uni = base.select(explode(col("__toks")).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__c1"))
    val tot = uni.agg(sum("__c1").cast("double").as("__t"))
    c2
      .join(uni.select(col("__w").as("__w1"), col("__c1").as("c1w1")),
        Seq("__w1"))
      .join(uni.select(col("__w").as("__w2"), col("__c1").as("c1w2")),
        Seq("__w2"))
      .crossJoin(broadcast(tot))
      .select(col("__w1").as("w1"), col("__w2").as("w2"),
        col("c2"), col("c1w1"), col("c1w2"),
        round(log(col("c2").cast("double") * col("__t") /
          (col("c1w1").cast("double") * col("c1w2"))) + lit(1e-9), 6)
          .as("pmi"))
  }

  /** Per-document stupid-backoff scores: (`idCol`, n_bigrams, raw_lp).
    * `isTrain` selects the count-training slice over `df`'s columns.
    * `raw_lp` (mean ln s) is returned unrounded — rank-and-cut callers
    * round before ordering (accumulation-order ulps must never decide a
    * rank or a gate hash).
    *
    * `minCount` prunes bigrams below the support floor out of the count
    * table BEFORE the derived aggregates — the production deviation KenLM
    * ships (its count pruning): at 100 TB the singleton-bigram tail IS
    * most of the table's rows, and dropping it shrinks the join state by
    * an order of magnitude while barely moving scores. The pruned model
    * is self-consistent: context, continuation, and total counts all
    * derive from the PRUNED table (the model only knows surviving
    * bigrams), so a pruned bigram scores through backoff exactly like a
    * never-seen one — one rule, engine-replayable. Default 1 = exact.
    */
  def lmScores(df: DataFrame, idCol: String, textCol: String,
      isTrain: Column, minCount: Int = 1): DataFrame = {
    require(minCount >= 1, s"minCount must be positive, got $minCount")
    val base = df.select(col(idCol), isTrain.as("__train"),
      TextAnalysis.normalizedTokens(col(textCol)).as("__toks"))
    val bg = base
      .select(col(idCol), col("__train"),
        explode(bigramStructs(col("__toks"))).as("__bg"))
      .select(col(idCol), col("__train"),
        col("__bg.w1").as("__w1"), col("__bg.w2").as("__w2"))
    val c2full = bg.filter(col("__train"))
      .groupBy("__w1", "__w2").agg(count(lit(1)).as("__c2"))
    val c2 = if (minCount > 1) c2full.filter(col("__c2") >= minCount)
      else c2full
    // context / continuation / total counts re-aggregate the COUNT TABLE,
    // never the corpus (identical subtrees → one reused exchange)
    val ctx = c2.groupBy("__w1").agg(sum("__c2").as("__ctx"))
    val cont = c2.groupBy("__w2").agg(sum("__c2").as("__cont"))
    val tot = c2.agg(sum("__c2").cast("double").as("__t"))
    bg
      .join(c2, Seq("__w1", "__w2"), "left")
      .join(ctx, Seq("__w1"), "left")
      .join(cont, Seq("__w2"), "left")
      .crossJoin(broadcast(tot))
      // a seen bigram implies a seen context, so ctx(w1) is never null on
      // that branch; the backoff branch tolerates both words being unseen
      .withColumn("__s", when(col("__c2").isNotNull,
          col("__c2").cast("double") / col("__ctx"))
        .otherwise(lit(0.4) *
          (coalesce(col("__cont"), lit(0L)) + 0.5) / col("__t")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        avg(log(col("__s"))).as("raw_lp"))
  }
}
