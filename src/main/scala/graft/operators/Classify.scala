package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic text classification — the quality/domain-classifier slot
  * of a curation pipeline (CCNet and its descendants gate pages with a
  * linear fastText model; the multinomial Naive Bayes here is the same
  * bag-of-words linear-scoring shape with CLOSED-FORM training, so the
  * model is a pure function of the corpus that any engine can replay —
  * no SGD order, no learning rate, no float accumulation in training).
  *
  * Reference surface: the embedding pipeline's text featurization
  * (`/root/reference/src/utils/embeddings.rs:6-71`) — tokenize → score
  * is the same dataflow, with counts instead of model weights.
  *
  * Scale shape: training is ONE token-keyed count aggregation (the
  * model table is vocabulary × labels, not corpus-sized); label stats
  * reduce to a broadcast-sized frame; scoring joins each test doc's
  * distinct tokens against the count table (token-keyed shuffle — the
  * q100 LM-scoring shape) and the per-doc argmax is a window over
  * |labels| rows per doc. No driver-side state beyond plan literals.
  */
object Classify {

  /** Multinomial NB with add-1 smoothing over [[TextAnalysis.normalizedTokens]].
    *
    * For label s with token counts c(t,s), token mass N_s = Σ_t c(t,s),
    * train-doc count D_s (D total), and train vocabulary size V:
    *
    *   score(d, s) = ln(D_s / D) + Σ_t tf(d,t)·ln(c(t,s) + 1)
    *                 − n_tok(d)·ln(N_s + V)
    *
    * which is the usual Σ ln((c+1)/(N_s+V)) regrouped so that tokens
    * absent from label s (ln(0+1) = 0) drop out of the join — unseen and
    * zero-count tokens are priced entirely by the −n_tok·ln(N_s+V) term,
    * so the inner join against the count table is exact, not an
    * approximation.
    *
    * Engine parity: scores are sums of ln over integer-valued inputs —
    * identical doubles in, accumulation-order ulps absorbed by rounding
    * (round(+1e-9, 6)) BEFORE the argmax, ties broken on the label (the
    * ln/rank doctrine). Returns one row per non-train doc:
    * (`idCol`, label = true label, pred, score = rounded winning score).
    */
  def nbPredict(df: DataFrame, idCol: String, textCol: String,
      labelCol: String, isTrain: Column): DataFrame = {
    val base = df.select(col(idCol), col(labelCol).as("__label"),
      isTrain.as("__train"),
      TextAnalysis.normalizedTokens(col(textCol)).as("__toks"))

    val trainToks = base.filter(col("__train"))
      .select(col("__label"), explode(col("__toks")).as("__tok"))
    // the model: vocabulary × labels token counts
    val counts = trainToks.groupBy("__label", "__tok")
      .agg(count(lit(1)).as("__c"))
    // per-label token mass re-aggregates the COUNT TABLE (vocabulary-
    // sized, one reused exchange), never the corpus
    val mass = counts.groupBy("__label").agg(sum("__c").as("__ns"))
    val docsPerLabel = base.filter(col("__train"))
      .groupBy("__label").agg(count(lit(1)).as("__ds"))
    val labelStats = mass.join(docsPerLabel, Seq("__label"))
    // two single-row frames: vocabulary size and total train docs
    val vocab = counts.select("__tok").distinct()
      .agg(count(lit(1)).as("__v"))
    val totDocs = base.filter(col("__train")).agg(count(lit(1)).as("__d"))

    val test = base.filter(!col("__train"))
      .select(col(idCol), col("__label"),
        size(col("__toks")).cast("long").as("__ntok"), col("__toks"))
    // per-doc term frequencies: collapse before the model join so the
    // shuffle carries distinct (doc, token) pairs, not occurrences
    val tf = test
      .select(col(idCol), explode(col("__toks")).as("__tok"))
      .groupBy(col(idCol), col("__tok"))
      .agg(count(lit(1)).as("__tf"))
    val partSums = tf.join(counts, Seq("__tok"))
      .groupBy(col(idCol), col("__label"))
      .agg(sum(col("__tf") * log(col("__c").cast("double") + 1.0))
        .as("__part"))

    val part = partSums
      .withColumnRenamed(idCol, "__pid")
      .withColumnRenamed("__label", "__plabel")
    val scored = test.drop("__toks")
      .withColumnRenamed("__label", "label")
      .crossJoin(broadcast(labelStats))
      .crossJoin(broadcast(vocab))
      .crossJoin(broadcast(totDocs))
      .join(part,
        col(idCol) === col("__pid") && col("__label") === col("__plabel"),
        "left")
      .drop("__pid", "__plabel")
      .withColumn("__score", round(
        log(col("__ds").cast("double") / col("__d"))
          - col("__ntok") * log((col("__ns") + col("__v")).cast("double"))
          + coalesce(col("__part"), lit(0.0)) + lit(1e-9), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(desc("__score"), col("__label"))
    scored
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("label"), col("__label").as("pred"),
        col("__score").as("score"))
  }
}
