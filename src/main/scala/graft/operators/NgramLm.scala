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
    // materialized once (vocabulary-sized): consumed by BOTH pair→unigram
    // joins plus the total — each re-tokenized the corpus otherwise
    val uni = base.select(explode(col("__toks")).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__c1"))
      .localCheckpoint(true)
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
    // materialize the count table ONCE (vocabulary-sized, never
    // corpus-sized): it feeds FOUR consumers (ctx/cont/tot + the scoring
    // join) and AQE ReusedExchange only dedups bit-identical exchanges —
    // the r17 plan audit measured q100's corpus tokenized 4× for the
    // model without this (katzModel precedent)
    val c2 = (if (minCount > 1) c2full.filter(col("__c2") >= minCount)
      else c2full).localCheckpoint(true)
    // context / continuation / total counts re-aggregate the COUNT TABLE,
    // never the corpus
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

  /** Katz back-off bigram scoring with Good-Turing discounting (Katz
    * 1987; discounts from the Gale–Sampson Turing estimate — the
    * [[graft.operators.TextAnalysis.frequencySpectrum]] quantity
    * applied to the BIGRAM count spectrum): the second smoothing family
    * beside [[lmScores]]' stupid backoff, with an actual probability
    * model — seen mass is discounted and the leftover is redistributed
    * over unseen continuations in proportion to a smoothed unigram.
    *
    * Per bigram (w1, w2), counts from the TRAIN slice:
    *  - seen (c > 0):  p = d_c · c / ctx(w1), where for c ≤ kCut
    *    d_c = (cstar / c − A) / (1 − A) with cstar = (c+1)·N_{c+1}/N_c
    *    and A = (kCut+1)·N_{kCut+1}/N_1 (counts above kCut are
    *    reliable: d = 1); a degenerate spectrum cell (missing
    *    N_{c+1}/N_1/N_{kCut+1}, or d outside (0, 1]) falls back to
    *    d = 1 — the standard guard, mirrored in the oracle.
    *  - unseen:        p = α(w1) · q(w2), with q(w) = (c1(w) + 0.5) /
    *    (N + 0.5·V) the half-smoothed train unigram (the +0.5 floor
    *    keeps OOV tokens finite — documented deviation from the pure ML
    *    unigram) and α(w1) = (1 − Σ_seen p) / (1 − Σ_seen q) the Katz
    *    leftover-mass ratio (α = 1 for an unseen history: pure q).
    *
    * Cross-engine determinism: every discount is a per-row chain over
    * exact integer counts (no rounding needed); the TWO per-history
    * accumulations (Σ_seen p, Σ_seen q) round at 12 dp (+1e-15 — the
    * pageRank re-entry idiom) before the α division, so
    * accumulation-order ulps cannot compound into the score; the
    * per-doc mean ln p rounds at the gate like every LM score.
    *
    * Scale shape: the same one-explode count tables as [[lmScores]];
    * the discount table is SPECTRUM-sized (≤ max bigram count rows),
    * α is vocabulary-shaped, and doc scoring is the identical
    * left-join chain plus two catalog joins.
    */
  def katzScores(df: DataFrame, idCol: String, textCol: String,
      isTrain: Column, kCut: Int = 5): DataFrame = {
    val base = df.select(col(idCol),
      TextAnalysis.normalizedTokens(col(textCol)).as("__toks"))
    val bg = base
      .select(col(idCol), explode(bigramStructs(col("__toks"))).as("__bg"))
      .select(col(idCol),
        col("__bg.w1").as("__w1"), col("__bg.w2").as("__w2"))
    katzScoreBigrams(bg, idCol,
      katzModel(df, textCol, isTrain, kCut))
  }

  /** The static Katz model frames [[katzScores]] builds from the train
    * slice — exposed so the STREAMING twin can train once in batch and
    * join the arriving stream against the identical model. `n`/`v`
    * (train token total, vocabulary size) are collected to plan
    * literals (the centroids precedent: a two-number model rides in the
    * plan, not a join).
    */
  private[graft] final case class KatzModel(c2: DataFrame, ctx: DataFrame,
    disc: DataFrame, alpha: DataFrame, uni: DataFrame,
    n: Double, v: Double)

  private[graft] def katzModel(df: DataFrame, textCol: String,
      isTrain: Column, kCut: Int): KatzModel = {
    require(kCut >= 1, s"kCut must be positive, got $kCut")
    val base = df.filter(isTrain)
      .select(TextAnalysis.normalizedTokens(col(textCol)).as("__toks"))
    val bg = base
      .select(explode(bigramStructs(col("__toks"))).as("__bg"))
      .select(col("__bg.w1").as("__w1"), col("__bg.w2").as("__w2"))
    // the count table and its derived model frames are each consumed by
    // several downstream subtrees (ctx/spec/alpha/scoring; AQE reuse
    // covers only bit-identical exchanges) — materialize them once:
    // all are vocabulary/spectrum-sized, never corpus-sized (the r17
    // plan audit measured q229's corpus tokenized 8× without this)
    val c2 = bg.groupBy("__w1", "__w2").agg(count(lit(1)).as("__c2"))
      .localCheckpoint(true)
    val ctx = c2.groupBy("__w1").agg(sum("__c2").as("__ctx"))
      .localCheckpoint(true)
    val uni = base
      .select(explode(col("__toks")).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__c1"))
      .localCheckpoint(true)
    val Array(nRow) = uni.agg(coalesce(sum("__c1").cast("double"), lit(0.0)),
      count(lit(1)).cast("double")).collect()
    val (n, v) = (nRow.getDouble(0), nRow.getDouble(1))
    // bigram-count spectrum → the GT discount table (spectrum-sized)
    val spec = c2.groupBy("__c2").agg(count(lit(1)).as("__nr"))
    val consts = spec.agg(
      sum(when(col("__c2") === 1, col("__nr"))).as("__n1"),
      sum(when(col("__c2") === (kCut + 1).toLong, col("__nr"))).as("__nk1"))
    val disc = spec.filter(col("__c2") <= kCut)
      .join(spec.select((col("__c2") - 1).as("__c2"),
        col("__nr").as("__nr1")), Seq("__c2"), "left")
      .crossJoin(broadcast(consts))
      .withColumn("__a",
        (lit((kCut + 1).toLong) * col("__nk1")) / col("__n1"))
      .withColumn("__rstar",
        (col("__c2") + 1) * col("__nr1") / col("__nr"))
      .withColumn("__draw",
        (col("__rstar") / col("__c2") - col("__a")) / (lit(1.0) - col("__a")))
      .withColumn("__d",
        when(col("__draw").isNull || isnan(col("__draw")) ||
          col("__draw") <= 0.0 || col("__draw") > 1.0, lit(1.0))
          .otherwise(col("__draw")))
      .select(col("__c2"), col("__d"))
      .localCheckpoint(true)
    // per-history leftover mass: both seen-sums rounded BEFORE the ratio
    val uniAsW2 = uni.select(col("__w").as("__w2"), col("__c1"))
    val alpha = c2
      .join(ctx, Seq("__w1"))
      .join(disc, Seq("__c2"), "left")
      .join(uniAsW2, Seq("__w2"))
      .withColumn("__pkz",
        coalesce(col("__d"), lit(1.0)) * col("__c2") / col("__ctx"))
      .withColumn("__q",
        (col("__c1") + lit(0.5)) / (lit(n) + lit(0.5) * lit(v)))
      .groupBy("__w1")
      .agg(round(sum("__pkz") + lit(1e-15), 12).as("__skz"),
        round(sum("__q") + lit(1e-15), 12).as("__sq"))
      .withColumn("__alpha",
        // degenerate histories (seen set saturates the vocabulary, or
        // no leftover mass after rounding) pass through undiscounted:
        // alpha = 1 keeps every unseen continuation finite — a zero
        // here would put ln(0) on any OOV after a saturated history
        when(col("__sq") >= 1.0 || col("__skz") >= 1.0, lit(1.0))
          .otherwise((lit(1.0) - col("__skz")) / (lit(1.0) - col("__sq"))))
      .select(col("__w1"), col("__alpha"))
      .localCheckpoint(true)
    KatzModel(c2, ctx, disc, alpha, uniAsW2, n, v)
  }

  /** Score a bigram frame `(idCol, __w1, __w2)` against a [[KatzModel]]
    * — the join chain is stream-safe (generator upstream, stream-static
    * left joins, ONE final aggregation), so batch and stream share the
    * identical math. */
  private[graft] def katzScoreBigrams(bg: DataFrame, idCol: String,
      m: KatzModel): DataFrame =
    bg
      .join(m.c2, Seq("__w1", "__w2"), "left")
      .join(m.ctx, Seq("__w1"), "left")
      .join(m.disc, Seq("__c2"), "left")
      .join(m.alpha, Seq("__w1"), "left")
      .join(m.uni, Seq("__w2"), "left")
      .withColumn("__q",
        (coalesce(col("__c1"), lit(0L)) + lit(0.5)) /
          (lit(m.n) + lit(0.5) * lit(m.v)))
      .withColumn("__p", when(col("__c2").isNotNull,
          coalesce(col("__d"), lit(1.0)) * col("__c2") / col("__ctx"))
        .otherwise(coalesce(col("__alpha"), lit(1.0)) * col("__q")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        avg(log(col("__p"))).as("raw_kp"))

  /** Interpolated Kneser–Ney bigram scoring (Kneser & Ney 1995; Chen &
    * Goodman 1999's interpolated variant with a single absolute
    * discount) — the third smoothing family beside [[lmScores]]' stupid
    * backoff and [[katzScores]]' Good–Turing Katz, and the one modern
    * toolkits default to (KenLM trains modified KN): seen mass loses a
    * FIXED discount D per bigram type and the freed mass interpolates
    * with the CONTINUATION unigram — a word scores high in backoff for
    * appearing after many different histories, not for being frequent
    * (the "San Francisco" argument: "Francisco" is frequent but follows
    * only "San").
    *
    * Per bigram (w1, w2), counts from the TRAIN slice's bigram table:
    *  - D = n1 / (n1 + 2·n2) from the bigram count spectrum (the
    *    Ney–Essen–Kneser leave-one-out estimate; n_r = #bigram types
    *    with count r). Degenerate spectrum (n1 + 2·n2 = 0) falls back
    *    to D = 0.5 — mirrored in the oracle.
    *  - continuation probability: pc(w2) = (N1+(·,w2) + 0.5) /
    *    (B + 0.5·V), where N1+(·,w2) = #distinct histories preceding
    *    w2, B = #distinct bigram types, V = train vocabulary size. The
    *    +0.5 half-smoothing keeps OOV continuations finite (the
    *    [[katzScores]] unigram-floor precedent — documented deviation
    *    from the pure N1+/B continuation distribution).
    *  - seen history w1 (ctx(w1) = Σ_w c(w1,w) > 0), with
    *    λ(w1) = (D · N1+(w1,·)) / ctx(w1) the interpolation weight:
    *      seen bigram:   p = (c − D)/ctx(w1) + λ(w1)·pc(w2)
    *      unseen bigram: p = λ(w1)·pc(w2)
    *    (c ≥ 1 and D ≤ 1 keep the discounted term non-negative).
    *  - unseen history: p = pc(w2) — no seen mass to discount.
    *
    * Cross-engine determinism: D is a single division of exact integer
    * spectrum counts (engine-exact, no rounding — the q120 doctrine);
    * λ and every per-bigram p are per-row chains over exact counts and
    * the scalar D with ONE two-term addition (a single correctly-rounded
    * IEEE op on identical operands — no accumulation anywhere before
    * the per-doc mean, which rounds at the gate like every LM score).
    * B/V/n1/n2 collect to plan literals (the centroids precedent), so
    * the model is three frames + three scalars and the score chain is
    * stream-safe.
    *
    * Scale shape: identical to [[lmScores]] — one explode + partial agg
    * builds the bigram table; histories, continuation counts, and the
    * spectrum all re-aggregate THAT table (vocabulary-shaped); scoring
    * is the same left-join chain with ONE final aggregation.
    */
  def knScores(df: DataFrame, idCol: String, textCol: String,
      isTrain: Column): DataFrame = {
    val base = df.select(col(idCol),
      TextAnalysis.normalizedTokens(col(textCol)).as("__toks"))
    val bg = base
      .select(col(idCol), explode(bigramStructs(col("__toks"))).as("__bg"))
      .select(col(idCol),
        col("__bg.w1").as("__w1"), col("__bg.w2").as("__w2"))
    knScoreBigrams(bg, idCol, knModel(df, textCol, isTrain))
  }

  /** The static KN model [[knScores]] builds from the train slice —
    * exposed so the streaming twin trains once in batch and joins the
    * arriving stream against the identical frames. `hist` carries the
    * per-history λ; `contd` the distinct-history counts; `d`/`b`/`v`
    * ride as plan literals.
    */
  private[graft] final case class KnModel(c2: DataFrame, hist: DataFrame,
    contd: DataFrame, d: Double, b: Double, v: Double)

  private[graft] def knModel(df: DataFrame, textCol: String,
      isTrain: Column): KnModel = {
    val base = df.filter(isTrain)
      .select(TextAnalysis.normalizedTokens(col(textCol)).as("__toks"))
    val bg = base
      .select(explode(bigramStructs(col("__toks"))).as("__bg"))
      .select(col("__bg.w1").as("__w1"), col("__bg.w2").as("__w2"))
    // materialized once (vocabulary-sized): the spectrum collect, hist,
    // contd, and the caller's scoring join each re-derived it from the
    // corpus otherwise (5 tokenizations measured in the q232 plan)
    val c2 = bg.groupBy("__w1", "__w2").agg(count(lit(1)).as("__c2"))
      .localCheckpoint(true)
    // ONE spectrum pass yields B, n1, n2; V from the unigram table —
    // four exact scalars to the driver (bounded model state)
    val Array(specRow) = c2.agg(
      count(lit(1)).cast("long"),
      coalesce(sum(when(col("__c2") === 1L, lit(1L))), lit(0L)),
      coalesce(sum(when(col("__c2") === 2L, lit(1L))), lit(0L))).collect()
    val (bCnt, n1, n2) =
      (specRow.getLong(0), specRow.getLong(1), specRow.getLong(2))
    require(bCnt > 0, "KN model: train slice produced no bigrams")
    val vCnt = base.select(explode(col("__toks")).as("__w"))
      .agg(countDistinct(col("__w")).cast("long")).collect()(0).getLong(0)
    // leave-one-out discount — a single exact-integer division (both
    // engines' correctly-rounded double division of exact operands)
    val d = if (n1 + 2 * n2 == 0) 0.5
      else n1.toDouble / (n1 + 2 * n2)
    val hist = c2.groupBy("__w1")
      .agg(sum("__c2").as("__ctx"), count(lit(1)).as("__n1p"))
      .withColumn("__lam", (lit(d) * col("__n1p")) / col("__ctx"))
      .select(col("__w1"), col("__ctx"), col("__lam"))
    val contd = c2.groupBy("__w2").agg(count(lit(1)).as("__cd"))
    KnModel(c2, hist, contd, d, bCnt.toDouble, vCnt.toDouble)
  }

  /** Score a bigram frame `(idCol, __w1, __w2)` against a [[KnModel]] —
    * stream-safe like [[katzScoreBigrams]] (left joins + ONE final
    * aggregation; the arithmetic chain is mirrored token-for-token in
    * the q232 oracle). */
  private[graft] def knScoreBigrams(bg: DataFrame, idCol: String,
      m: KnModel): DataFrame =
    bg
      .join(m.c2, Seq("__w1", "__w2"), "left")
      .join(m.hist, Seq("__w1"), "left")
      .join(m.contd, Seq("__w2"), "left")
      .withColumn("__pc",
        (coalesce(col("__cd"), lit(0L)) + lit(0.5)) /
          (lit(m.b) + lit(0.5) * lit(m.v)))
      .withColumn("__p", when(col("__ctx").isNotNull,
          when(col("__c2").isNotNull,
            (col("__c2") - lit(m.d)) / col("__ctx") +
              col("__lam") * col("__pc"))
          .otherwise(col("__lam") * col("__pc")))
        .otherwise(col("__pc")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        avg(log(col("__p"))).as("raw_knp"))
}
