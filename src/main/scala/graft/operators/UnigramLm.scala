package graft.operators

import org.apache.spark.sql.{DataFrame, GraftSqlShims}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer training (Kudo 2018, "Subword Regularization" —
  * the SentencePiece unigram model), the third major published tokenizer
  * family beside [[TextAnalysis.bpeTrain]] (count-scored merges) and
  * [[TextAnalysis.wordPieceTrain]] (likelihood-scored merges): instead of
  * growing a vocabulary bottom-up by merging, unigram-LM starts from a
  * LARGE seed vocabulary of candidate pieces and fits a unigram language
  * model over segmentations, pruning down to the target size.
  *
  * Deterministic hard-EM variant (every step engine-replayable, the house
  * doctrine — full EM's forward-backward expected counts would make the
  * E-step a float-accumulation surface no oracle could reproduce):
  *
  *  1. SEED: all substrings of length 1..`maxPieceLen` of the corpus's
  *     normalized words (lowercase [a-z0-9]+ runs, the q129 BPE
  *     convention; words longer than `maxWordLen` chars are excluded
  *     whole — mirrored in the oracle). Seed vocabulary = every single
  *     character ∪ the top `vocabTarget·seedMultiplier` multi-char
  *     substrings by (freq-weighted occurrence count DESC, piece ASC).
  *  2. E-step (Viterbi): segment every DISTINCT word into the maximum-
  *     likelihood piece sequence under the current piece log-probs — a
  *     driver-loop DP over character positions (vocabulary-sized frames,
  *     never corpus-sized; the connectedComponents localCheckpoint
  *     discipline). Piece usage counts are word-frequency-weighted.
  *  3. M-step: logp(piece) = round(ln(count′ / total), 12) where count′
  *     adds +1 to every single character (char backstop: characters never
  *     leave the vocabulary, so every word stays segmentable) and total =
  *     Σ count′ over the round's vocabulary. Multi-char pieces with zero
  *     Viterbi count drop — the EM pruning pressure.
  *  4. After `emRounds` E/M rounds: prune multi-char pieces to the top
  *     (`vocabTarget` − #chars) by (count DESC, piece ASC), then one
  *     final M-step over the pruned set (SentencePiece also re-estimates
  *     after pruning).
  *
  * Cross-engine exactness: counts and totals are exact integers;
  * count′/total is a SINGLE division of exact integers (engine-identical
  * double); ln of an identical double is identical (the q97 doctrine);
  * logp rounds at 12 so every DP input re-enters bit-identical. DP scores
  * are sums of rounded logps built in the identical structural order on
  * both engines (induction over positions), so Viterbi argmax comparisons
  * can never disagree; score ties break on the smaller start position
  * (= the longer final piece), a total order because each (start, end)
  * pair names exactly one piece.
  *
  * Scale shape: everything after the one corpus tokenization pass is
  * vocabulary-grain — the word-frequency table, the substring census
  * (≤ |words| · maxWordLen · maxPieceLen rows), and the DP frames
  * (|words| · maxWordLen). The driver loop runs maxWordLen position
  * layers + maxWordLen backtrace hops per EM round, each a small keyed
  * join; at 100 TB the corpus pass dominates and the training tail is
  * constant-sized.
  */
object UnigramLm {

  /** One row per surviving piece: `piece`, `is_char` (1/0 BIGINT),
    * `count` (the smoothed count′ entering the final M-step, BIGINT),
    * `logp` (rounded 12). Callers order; the frame is materialized.
    */
  def train(df: DataFrame, textCol: String, vocabTarget: Int = 64,
      emRounds: Int = 2, seedMultiplier: Int = 4, maxPieceLen: Int = 8,
      maxWordLen: Int = 16,
      store: Option[graft.core.StageStore] = None): DataFrame = {
    require(vocabTarget >= 1, s"vocabTarget must be >= 1, got $vocabTarget")
    require(emRounds >= 1, s"emRounds must be >= 1, got $emRounds")
    require(maxPieceLen >= 1 && maxPieceLen <= maxWordLen,
      s"need 1 <= maxPieceLen <= maxWordLen, got $maxPieceLen/$maxWordLen")
    // With a store (r14 verdict item 2), the restart-relevant round
    // boundaries — the word census (the one corpus read) and each EM
    // round's re-estimated vocabulary — COMMIT through the generation-
    // pointer discipline instead of session-local checkpoints, so a
    // preempted training resumes at round grain: committed rounds read
    // back (the by-name compute never builds the DP), the first
    // uncommitted round recomputes from vocab-grain staged state, never
    // the corpus. occ/census/seed stay derived (vocab-grain recompute is
    // one explode — cheaper than their stage round-trips).
    def mat(name: String)(f: => DataFrame): DataFrame = store match {
      case Some(st) => st.stage(name)(f)
      case None => f.localCheckpoint(true)
    }
    def free(d: DataFrame): Unit =
      if (store.isEmpty) GraftSqlShims.unpersistCheckpoint(d)
    val words = mat("em_words")(wordFreqs(df, textCol, maxWordLen))
    require(!words.isEmpty,
      "unigramLmTrain: no eligible words (empty corpus after filtering)")
    lazy val occ0 = substrings(words, maxPieceLen)
    val occ =
      if (store.isEmpty) occ0.localCheckpoint(true) else occ0
    lazy val census0 = occ.groupBy("piece").agg(sum("freq").as("c"))
    val census =
      if (store.isEmpty) census0.localCheckpoint(true) else census0
    val chars = census.filter(length(col("piece")) === 1)
      .select(col("piece"), col("c"))
    val seedMulti = census.filter(length(col("piece")) > 1)
      .orderBy(desc("c"), col("piece"))
      .limit(vocabTarget * seedMultiplier)
      .select(col("piece"), col("c"))
    var vocab = mat("em_seed")(withLogp(
      chars.select(col("piece"), (col("c") + 1L).as("cnt"),
          lit(1L).as("is_char"))
        .unionByName(seedMulti.select(col("piece"), col("c").as("cnt"),
          lit(0L).as("is_char")))))
    for (r <- 1 to emRounds) {
      val prev = vocab
      var roundCounts: Option[DataFrame] = None
      vocab = mat(s"em_round_$r") {
        val counts = viterbiCounts(words, occ, prev)
        roundCounts = Some(counts)
        withLogp(
          chars.join(counts, Seq("piece"), "left_outer")
            .select(col("piece"),
              (coalesce(col("c2"), lit(0L)) + 1L).as("cnt"),
              lit(1L).as("is_char"))
            .unionByName(counts.filter(length(col("piece")) > 1)
              .select(col("piece"), col("c2").as("cnt"),
                lit(0L).as("is_char"))))
      }
      free(prev)
      // the round's DP count frame is session-local either way; by the
      // time mat() returns, the successor is materialized/committed
      roundCounts.foreach(GraftSqlShims.unpersistCheckpoint)
    }
    // final prune: every char survives; multi-char pieces cut to the
    // remaining budget by (count DESC, piece ASC); one last M-step over
    // the pruned set
    val nChars = vocab.filter(col("is_char") === 1L).count().toInt
    val keepMulti = math.max(vocabTarget - nChars, 0)
    val pruned = vocab.filter(col("is_char") === 1L)
      .select("piece", "cnt", "is_char")
      .unionByName(vocab.filter(col("is_char") === 0L)
        .orderBy(desc("cnt"), col("piece")).limit(keepMulti)
        .select("piece", "cnt", "is_char"))
    val out = mat("em_final")(withLogp(pruned)
      .select(col("piece"), col("is_char"), col("cnt").as("count"),
        col("logp")))
    free(vocab)
    free(words)
    if (store.isEmpty) {
      GraftSqlShims.unpersistCheckpoint(occ)
      GraftSqlShims.unpersistCheckpoint(census)
    }
    out
  }

  /** Encode-time usage statistics: train on the corpus, then Viterbi-
    * segment every distinct word under the FINAL vocabulary and report
    * per piece — `piece`, `n_words` (distinct words whose best
    * segmentation uses it), `uses` (word-frequency-weighted occurrence
    * count). The tokenizer-health table a pipeline reads before
    * committing to a vocabulary (dead pieces, fertility drivers).
    */
  def encodeStats(df: DataFrame, textCol: String, vocabTarget: Int = 64,
      emRounds: Int = 2, seedMultiplier: Int = 4, maxPieceLen: Int = 8,
      maxWordLen: Int = 16): DataFrame = {
    val vocab = train(df, textCol, vocabTarget, emRounds, seedMultiplier,
      maxPieceLen, maxWordLen)
    val words = wordFreqs(df, textCol, maxWordLen).localCheckpoint(true)
    val occ = substrings(words, maxPieceLen).localCheckpoint(true)
    val em = emissions(words, occ, vocab.select(col("piece"), col("logp")))
    val out = em.groupBy("piece")
      .agg(countDistinct(col("word")).as("n_words"),
        sum("freq").as("uses"))
      .localCheckpoint(true)
    GraftSqlShims.unpersistCheckpoint(em)
    GraftSqlShims.unpersistCheckpoint(words)
    GraftSqlShims.unpersistCheckpoint(occ)
    GraftSqlShims.unpersistCheckpoint(vocab)
    out
  }

  /** Maximum-likelihood (Viterbi) segmentation of `words` (one `word`
    * column, distinct applied here) under `vocab`'s (piece, logp) — one
    * row per (word, ordinal piece): (word, pos start offset, piece).
    * Exposed for specs and encode-time use; [[train]] consumes the
    * freq-weighted counts of the same DP.
    */
  def segment(words: DataFrame, vocab: DataFrame,
      maxPieceLen: Int = 8): DataFrame = {
    val w = words.select(col("word")).distinct()
      .withColumn("freq", lit(1L))
    val occ = substrings(w, maxPieceLen)
    val em = emissions(w, occ, vocab)
    val out = em.select(col("word"), col("s").cast("long").as("pos"),
        col("piece"))
      .orderBy("word", "pos")
      .localCheckpoint(true)
    GraftSqlShims.unpersistCheckpoint(em)
    out
  }

  // ---- internals ----------------------------------------------------

  private def wordFreqs(df: DataFrame, textCol: String,
      maxWordLen: Int): DataFrame =
    df.select(explode(TextAnalysis.normalizedTokens(col(textCol)))
        .as("word"))
      .filter(length(col("word")) <= maxWordLen)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** All (word, freq, s, e, piece) substring occurrences, 0-based
    * [s, e) — every piece length 1..maxPieceLen at every start.
    */
  private def substrings(words: DataFrame, maxPieceLen: Int): DataFrame =
    words
      .withColumn("s",
        explode(sequence(lit(0), length(col("word")) - 1)))
      .withColumn("l", explode(sequence(lit(1),
        least(lit(maxPieceLen), length(col("word")) - col("s")))))
      .select(col("word"), col("freq"), col("s"),
        (col("s") + col("l")).as("e"),
        col("word").substr(col("s") + 1, col("l")).as("piece"))

  /** logp = round(ln(cnt / total), 12) appended to a (piece, cnt,
    * is_char) vocabulary frame — total is the frame's Σ cnt; the single
    * integer division is engine-exact, ln of an identical double is
    * identical.
    */
  private def withLogp(vocab: DataFrame): DataFrame =
    vocab
      .crossJoin(broadcast(vocab.agg(sum("cnt").as("__tot"))))
      .withColumn("logp", round(log(col("cnt") / col("__tot")), 12))
      .drop("__tot")

  /** Freq-weighted Viterbi piece-usage counts: (piece, c2),
    * materialized; intermediate emissions released.
    */
  private def viterbiCounts(words: DataFrame, occ: DataFrame,
      vocab: DataFrame): DataFrame = {
    val em = emissions(words, occ, vocab)
    val counts = em.groupBy("piece").agg(sum("freq").as("c2"))
      .localCheckpoint(true)
    GraftSqlShims.unpersistCheckpoint(em)
    counts
  }

  /** Viterbi DP + backtrace — one emission row per (word, used piece
    * occurrence): (word, freq, s, piece), materialized.
    *
    * The DP is PER-WORD LOCAL (len ≤ maxWordLen positions, ≤
    * len·maxPieceLen candidate occurrences), so it runs as per-row
    * higher-order-function column math over each word's collected
    * occurrence array instead of a driver loop of per-position joins
    * (the original shape paid ~2·maxWordLen keyed-join jobs + local
    * checkpoints per call; this is ONE shuffle). The score induction is
    * the identical structural order — layer i's score is
    * `score(j) + logp` for each candidate (j, i, piece), argmax with
    * ties to the smallest start — so every double compares
    * bit-identically to the joined form and the oracle's generated DP
    * layers replay unchanged. Every position 1..len(word) is reachable
    * because all single chars are in the vocabulary every round.
    */
  private def emissions(words: DataFrame, occ: DataFrame,
      vocab: DataFrame): DataFrame = {
    val occV = occ
      .join(broadcast(vocab.select(col("piece"), col("logp"))), Seq("piece"))
      .select(col("word"), col("freq"), col("s"), col("e"), col("piece"),
        col("logp"))
    // one row per word: its full in-vocab occurrence array (order
    // immaterial — the argmax below is order-blind: candidates at a
    // position differ in start s, and the (score, -s) struct max is a
    // total order over them)
    val perWord = occV.groupBy("word")
      .agg(max("freq").as("freq"),
        collect_list(struct(col("s"), col("e"), col("piece"), col("logp")))
          .as("__occ"))
    val len = length(col("word"))
    // dp(pos) = element pos+1: (sc, bestj, piece); pos 0 = empty prefix.
    // An unreachable position would carry a null sc, which loses every
    // max to any reachable candidate (nulls sort first) — same winner as
    // the joined form's absent row.
    val dpCol = aggregate(
      sequence(lit(1), len),
      array(struct(lit(0.0).as("sc"), lit(-1).as("bestj"),
        lit(null).cast("string").as("piece"))),
      (acc, i) => {
        val best = array_max(transform(
          filter(col("__occ"), o => o.getField("e") === i),
          o => struct(
            (element_at(acc, o.getField("s") + 1).getField("sc")
              + o.getField("logp")).as("sc"),
            (-o.getField("s")).as("negs"),
            o.getField("s").as("s"),
            o.getField("piece").as("piece"))))
        concat(acc, array(struct(best.getField("sc").as("sc"),
          best.getField("s").as("bestj"),
          best.getField("piece").as("piece"))))
      })
    // backtrace from pos = len(word): each hop emits (start, piece) and
    // jumps to the piece's start; at most len hops, exit at pos 0
    val btCol = aggregate(
      sequence(lit(1), len),
      struct(len.as("pos"),
        array().cast("array<struct<s:int,piece:string>>").as("out")),
      (acc, _) => {
        val e = element_at(col("__dp"), acc.getField("pos") + 1)
        when(acc.getField("pos") > 0,
          struct(e.getField("bestj").as("pos"),
            concat(acc.getField("out"), array(struct(
              e.getField("bestj").as("s"),
              e.getField("piece").as("piece")))).as("out")))
          .otherwise(acc)
      }).getField("out")
    // __dp materializes in its own projection (referenced per backtrace
    // hop — the q119 inlined-lambda rule); explode_outer + isNotNull
    // instead of explode so InferFiltersFromGenerate can't replant the
    // DP chain inside a pushed-down size() filter (the q119 fix)
    perWord
      .withColumn("__dp", dpCol)
      .withColumn("__bt", btCol)
      .select(col("word"), col("freq"), explode_outer(col("__bt")).as("__e"))
      .filter(col("__e").isNotNull)
      .select(col("word"), col("freq"), col("__e.s").as("s"),
        col("__e.piece").as("piece"))
      .localCheckpoint(true)
  }
}
