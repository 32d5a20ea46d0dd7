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

  /** Per-source distribution drift: KL(source ‖ corpus) over the
    * corpus's top-`vocabSize` tokens, add-one smoothed within that
    * vocabulary — the "which source looks least like the mixture"
    * analytic behind rebalancing and contamination triage. The
    * restricted vocabulary is the standard move (full-vocab KL is
    * dominated by tail noise) and what makes every probability a single
    * exact-integer division; ln ulps land in the rounded sum (the ln
    * doctrine). The cut itself is deterministic: (count desc, token
    * asc).
    *
    * Scale shape: one token-keyed corpus count, a bounded top-V cut
    * (TakeOrderedAndProject), then everything downstream —
    * (source × V) grid, totals, KL sums — is broadcast-sized.
    *
    * Output: (source, n_in_vocab, kl), kl rounded to 6 dp.
    */
  def sourceDivergence(df: DataFrame, textCol: String, sourceCol: String,
      vocabSize: Int = 100): DataFrame = {
    require(vocabSize >= 1, s"vocabSize must be positive, got $vocabSize")
    val toks = df.select(col(sourceCol).as("source"),
      explode(TextAnalysis.normalizedTokens(col(textCol))).as("__tok"))
    val vocab = toks.groupBy("__tok").agg(count(lit(1)).as("__cq"))
      .orderBy(desc("__cq"), col("__tok")).limit(vocabSize)
    val qTot = vocab.agg(sum("__cq").as("__qt"))
    val srcCounts = toks.join(broadcast(vocab.select("__tok")), Seq("__tok"))
      .groupBy("source", "__tok").agg(count(lit(1)).as("__c"))
    val srcTot = srcCounts.groupBy("source")
      .agg(sum("__c").as("__ns"))
    srcTot.crossJoin(broadcast(vocab))
      .join(srcCounts, Seq("source", "__tok"), "left")
      .crossJoin(broadcast(qTot))
      .withColumn("__p", (coalesce(col("__c"), lit(0L)) + 1L).cast("double")
        / (col("__ns") + vocabSize))
      .withColumn("__q", (col("__cq") + 1L).cast("double")
        / (col("__qt") + vocabSize))
      .groupBy("source")
      .agg(first(col("__ns")).as("n_in_vocab"),
        round(sum(col("__p") * (log(col("__p")) - log(col("__q"))))
          + lit(1e-9), 6).as("kl"))
  }

  /** Training-mixture domain weights from per-source excess LM loss —
    * the DoReMi idea (Xie et al., "DoReMi: Optimizing Data Mixtures
    * Speeds Up Language Model Pretraining", 2023) with this library's
    * deterministic stand-ins: the reference model is the corpus-trained
    * bigram LM ([[NgramLm.lmScores]]), a source's loss is the negated
    * mean of its per-doc ROUNDED log-probs, excess = loss − min loss
    * over sources, and `weight ∝ exp(eta · excess)` normalized — harder
    * sources get upweighted, exactly the DoReMi direction.
    *
    * Engine parity: every floating hand-off is rounded before reuse
    * (doc lp, source lp — the q100 gate values), differences of
    * identical doubles are identical, and exp's ulp noise lands on a
    * continuous weight rounded to 6 dp — never on a rank or a count
    * (the exponent doctrine). Docs with fewer than two tokens score no
    * bigrams and drop from both sides' averages identically.
    *
    * Scale shape: the corpus-sized work is [[NgramLm.lmScores]] (one
    * count-table model, doc-keyed scoring); everything after is
    * |sources| rows with two single-row broadcasts (min loss,
    * normalizer).
    */
  def mixtureWeights(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String, eta: Double = 1.0): DataFrame = {
    require(eta > 0.0, s"eta must be positive, got $eta")
    val scored = NgramLm.lmScores(df, idCol, textCol, isTrain = lit(true))
      .select(col(idCol), round(col("raw_lp") + lit(1e-9), 6).as("__lp"))
    val perSrc = df.select(col(idCol), col(sourceCol).as("source"))
      .join(scored, Seq(idCol))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        round(avg("__lp") + lit(1e-9), 6).as("lp"))
    val minLoss = perSrc.agg(min(-col("lp")).as("__m"))
    val ex = perSrc.crossJoin(broadcast(minLoss))
      .withColumn("excess", round(-col("lp") - col("__m") + lit(1e-9), 6))
    val z = ex.agg(sum(exp(col("excess") * eta)).as("__z"))
    ex.crossJoin(broadcast(z))
      .select(col("source"), col("n_docs"), col("lp"), col("excess"),
        round(exp(col("excess") * eta) / col("__z") + lit(1e-9), 6)
          .as("weight"))
  }

  /** Per-source OUT-OF-VOCABULARY rate under the corpus's deterministic
    * top-V vocabulary — the coverage check run before freezing a
    * tokenizer or embedding table: a source whose tokens routinely fall
    * outside the corpus head will fragment under the trained vocab (the
    * fertility blow-up q130 then measures). Vocabulary = the top
    * `vocabSize` tokens by corpus count with token-asc tie-break (the
    * [[sourceDivergence]] cut, so both operators speak the same
    * vocabulary); rates are ONE exact-integer division per source —
    * nothing rounded.
    *
    * Scale shape: one token-grain count (map-side combined), one
    * bounded top-V, one broadcast marker join, one source-keyed agg.
    *
    * Output: (sourceCol, n_tokens, n_oov, oov_rate).
    */
  def oovRates(df: DataFrame, sourceCol: String, textCol: String,
      vocabSize: Int = 1000): DataFrame = {
    require(vocabSize >= 1, s"vocabSize must be positive, got $vocabSize")
    val toks = df.select(col(sourceCol).as("__src"),
        explode(TextAnalysis.normalizedTokens(col(textCol))).as("__tok"))
    val vocab = toks.groupBy("__tok").agg(count(lit(1)).as("__c"))
      .orderBy(desc("__c"), col("__tok")).limit(vocabSize)
      .select(col("__tok"), lit(true).as("__in"))
    toks.join(broadcast(vocab), Seq("__tok"), "left_outer")
      .groupBy(col("__src").as(sourceCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col(sourceCol), col("n_tokens"), col("n_oov"),
        (col("n_oov") / col("n_tokens")).as("oov_rate"))
  }

  /** EXACT Pearson correlation between two INTEGER per-row statistics,
    * per group — "does quality track length", "does repetition track
    * perplexity": the screening-signal redundancy check run before
    * adding yet another filter to a pipeline. Everything stays in
    * exact 64-bit integer arithmetic through the five sums, the
    * covariance/variance cross-products are integer subtractions, and
    * the result is deterministic IEEE (two correctly-rounded sqrts +
    * one division over identical bits) — ZERO rounding anywhere, the
    * [[ksDrift]] exactness philosophy for correlation.
    *
    *   r = (n·Σxy − Σx·Σy) / (√(n·Σx² − (Σx)²) · √(n·Σy² − (Σy)²))
    *
    * Overflow contract (loud in the doc, not silently wrong): the
    * integer cross-products must fit signed 64-bit — safe when
    * n·max|x|·max|y|, n·max(x²), n·max(y²) < 2⁶³ (e.g. a billion rows
    * of statistics under ~3M). Zero-variance groups emit NULL r.
    *
    * Scale shape: ONE map-side-combined aggregation per group. Output:
    * (groupCol, n BIGINT, r).
    */
  def pearsonByGroup(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val intTypes = Set[org.apache.spark.sql.types.DataType](
      org.apache.spark.sql.types.ByteType,
      org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType,
      org.apache.spark.sql.types.LongType)
    Seq(xCol, yCol).foreach { c =>
      require(intTypes.contains(df.schema(c).dataType),
        s"pearsonByGroup requires integral statistics; '$c' is " +
          s"${df.schema(c).dataType} — quantize to an exact grid first")
    }
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(x).as("__sx"), sum(y).as("__sy"),
        sum(x * x).as("__sxx"), sum(y * y).as("__syy"),
        sum(x * y).as("__sxy"))
      .withColumn("__num", col("n") * col("__sxy") -
        col("__sx") * col("__sy"))
      .withColumn("__vx", col("n") * col("__sxx") -
        col("__sx") * col("__sx"))
      .withColumn("__vy", col("n") * col("__syy") -
        col("__sy") * col("__sy"))
      .select(col(groupCol), col("n"),
        when(col("__vx") === 0L || col("__vy") === 0L,
          lit(null).cast("double"))
          .otherwise(col("__num") /
            (sqrt(col("__vx").cast("double")) *
             sqrt(col("__vy").cast("double")))).as("r"))
  }

  /** EXACT Spearman rank correlation between two INTEGER per-row
    * statistics, per group — [[pearsonByGroup]] asks "linear?", this
    * asks "MONOTONE?" (robust to the heavy tails every length/score
    * statistic has). Zero rounding anywhere: tie-averaged ranks are
    * exact half-integers (cum_before + (c+1)/2 — one dyadic division),
    * so every d² is an exact quarter-integer and their sum is
    * order-independent in double out to 2⁵¹; the classical
    * ρ = 1 − 6·Σd²/(n·(n²−1)) then costs one exact-integer product
    * and one division of bit-identical values.
    *
    * Conventions pinned: AVERAGE ranks for ties (the d²-formula
    * variant — the tie-corrected Pearson-on-ranks differs and is
    * deliberately not this operator); groups where either statistic is
    * constant emit NULL (ρ undefined); the n·(n²−1) product bounds n
    * at ~2M rows per group (2⁶³) — loud in the doc, the q254 contract
    * style.
    *
    * Scale shape: per variable one (group, value)-grain count + a
    * value-grain cumulative window (bounded by distinct values, the
    * [[ksDrift]] shape), one join back to rows, one group aggregation.
    *
    * Output: (groupCol, n BIGINT, rho).
    */
  def spearmanByGroup(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val intTypes = Set[org.apache.spark.sql.types.DataType](
      org.apache.spark.sql.types.ByteType,
      org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType,
      org.apache.spark.sql.types.LongType)
    Seq(xCol, yCol).foreach { c =>
      require(intTypes.contains(df.schema(c).dataType),
        s"spearmanByGroup requires integral statistics; '$c' is " +
          s"${df.schema(c).dataType} — quantize to an exact grid first")
    }
    val base = df.select(col(groupCol).as("__g"),
      col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y"))
    def avgRanks(vCol: String, out: String): DataFrame = {
      val w = Window.partitionBy("__g").orderBy(vCol)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      base.groupBy(col("__g"), col(vCol)).agg(count(lit(1)).as("__c"))
        .withColumn("__cum", sum("__c").over(w))
        .select(col("__g"), col(vCol),
          ((col("__cum") - col("__c")) +
            (col("__c") + 1) / lit(2.0)).as(out))
    }
    val withRanks = base
      .join(avgRanks("__x", "__rx"), Seq("__g", "__x"))
      .join(avgRanks("__y", "__ry"), Seq("__g", "__y"))
      .select(col("__g"),
        ((col("__rx") - col("__ry")) * (col("__rx") - col("__ry")))
          .as("__d2"), col("__x"), col("__y"))
    withRanks.groupBy(col("__g").as(groupCol))
      .agg(count(lit(1)).as("n"), sum("__d2").as("__s"),
        countDistinct("__x").as("__dx"), countDistinct("__y").as("__dy"))
      .select(col(groupCol), col("n"),
        when(col("__dx") <= 1 || col("__dy") <= 1,
          lit(null).cast("double"))
          .otherwise(lit(1.0) - lit(6.0) * col("__s") /
            (col("n") * (col("n") * col("n") - 1))).as("rho"))
  }

  /** Two-sample Kolmogorov–Smirnov distance between every pair of
    * sources over an INTEGER per-row statistic (token count, byte
    * length, a quantized score) — the distribution-drift monitor
    * beside [[sourceDivergence]]'s token-mixture KL: KL asks "do the
    * sources use different WORDS", KS asks "are the documents SHAPED
    * differently", and a nightly snapshot-vs-snapshot KS is the
    * canonical "did the crawler change under us" alarm.
    *
    * KS(a, b) = max_v |F_a(v) − F_b(v)| over the pooled distinct
    * values. Everything is engine-exact with ZERO rounding: counts and
    * cumulative counts are exact integers, each ECDF value is ONE
    * division of exact integers (q120 doctrine), and |·|/max of
    * bit-identical doubles are order-independent.
    *
    * Scale shape: one doc-grain groupBy collapses to (source, value)
    * grain; every window after that is VALUE-grain (distinct statistic
    * values — bounded by the statistic's range, not the corpus), as is
    * the source-pair self-join. The integer-statistic requirement is
    * loud: float statistics must be quantized first (exact decimal
    * grids only — the md5-recomputable rule's sibling).
    *
    * Output: (source_a, source_b, n_a, n_b, ks) for source_a <
    * source_b, ordered.
    */
  def ksDrift(df: DataFrame, sourceCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vType = df.schema(valueCol).dataType
    require(Set[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.ByteType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.LongType).contains(vType),
      s"ksDrift requires an integral statistic column; '$valueCol' is " +
        s"$vType — quantize float scores to an exact grid first")
    val base = df.select(col(sourceCol).as("src"),
      col(valueCol).cast("long").as("v"))
    val svc = base.groupBy("src", "v").agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy("src").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = svc.withColumn("cum", sum("c").over(wCum))
      .select("src", "v", "cum")
    val srcs = base.groupBy("src").agg(count(lit(1)).as("n"))
    val grid = svc.select("v").distinct()
      .crossJoin(broadcast(srcs.select("src")))
    val ecdf = grid
      .join(cum, Seq("src", "v"), "left_outer")
      .withColumn("__cum",
        coalesce(last("cum", ignoreNulls = true).over(wCum), lit(0L)))
      .join(broadcast(srcs), Seq("src"))
      .select(col("src"), col("v"), col("n"),
        (col("__cum").cast("double") / col("n")).as("f"))
    ecdf.select(col("src").as("source_a"), col("v"),
        col("f").as("f_a"), col("n").as("n_a"))
      .join(ecdf.select(col("src").as("source_b"), col("v"),
        col("f").as("f_b"), col("n").as("n_b")), Seq("v"))
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b", "n_a", "n_b")
      .agg(max(abs(col("f_a") - col("f_b"))).as("ks"))
      .select("source_a", "source_b", "n_a", "n_b", "ks")
      .orderBy("source_a", "source_b")
  }
}
