package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is a deterministic DataFrame over the testdata
  * tables in `sfDir` (TESTDATA.md), with a matching DuckDB oracle in
  * [[oracleSql]]. Conventions shared by every query/oracle pair:
  *  - identical column names on both sides (the driver sorts columns by name
  *    before hashing);
  *  - a total ORDER BY (unique tie-break key) on both sides;
  *  - floating-point aggregates rounded (`round(x, n)`) on both sides so
  *    accumulation-order ulps can't flip the hash;
  *  - integer-valued columns as BIGINT on both sides (DuckDB widens int
  *    sums to HUGEINT and row_number to BIGINT; Spark sides cast to long).
  *
  * Query modules (graft.queries): [[RelationalQueries]] (relational core,
  * windows, set ops, event analytics), [[VectorQueries]] (similarity
  * search, ANN layouts, PQ/OPQ/residual trainings, fixtures),
  * [[DedupQueries]] (exact/minhash/simhash/semantic dedup),
  * [[TextQueries]] (quality, LM, BPE, repetition, normalizers),
  * [[PipelineQueries]] (commands, streaming, multimodal, capstones).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ VectorQueries.queries ++
      DedupQueries.queries ++ TextQueries.queries ++
      TextQueries.pipelineQueries ++ PipelineQueries.queries

  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ VectorQueries.oracles ++
      DedupQueries.oracles ++ TextQueries.oracles ++
      TextQueries.pipelineOracles ++ PipelineQueries.oracles

  /** Headline subset Bench runs per-round (kept fast + scale-representative:
    * the scan-agg, the shuffling join, the window, and the vector paths).
    */
  def benchQueries: Seq[String] = Seq(
    "q01_pricing_summary", "q03_join_revenue", "q05_window_topn",
    "q19_sessionize", "q20_knn_cosine", "q22_knn_batch", "q23_ivf_probe",
    "q31_minhash_lsh", "q36_quality", "q61_curation",
    // round-2 additions: the most iterative pipeline (dedup clustering —
    // most regression-prone), the skew-hardened sessionize (must not regress
    // the balanced case vs q19), and the sq8 ANN path
    "q65_dedup_clusters", "q67_sessionize_2phase", "q69_sq8_rerank",
    // round-4 addition: broadcast decontamination. (q79's composed probe
    // is NOT here: as a self-contained query it spends ~90% of its wall
    // clock building its scratch collection — q23 + q69 already bench the
    // probe and sq8 scan paths in steady state.)
    "q81_decontaminate",
    // round-5 additions: the two new heavy token-pipeline shapes — DSIR
    // importance (two-pass hashed-feature weighting) and bigram-LM
    // scoring (count-table joins). q96/q97/q99 are narrow scans already
    // represented by q36's shape.
    "q98_importance", "q100_lm_score",
    // round-6 additions: the new ANN paths (PQ train+ADC probe, batch
    // union-scan probe) and the corpus-wide span-dedup pass (count +
    // join-back + reassembly — a shape no other bench query has).
    "q127_pq_probe", "q128_batch_probe", "q131_span_dedup",
    // round-6 tail: NB classification — train-side count aggregation +
    // vocabulary-keyed model join + per-doc argmax window in one query;
    // q148's cost is q100's LM (already benched), q146/q149 are narrow
    // scans represented by q36's shape.
    "q145_nb_classify",
    // round-9 additions: the nine-way n-gram repetition table (the widest
    // single explode + doc-keyed conditional agg in the repo) and the
    // kmeans-residual batch probe — SWAPPED in round 12 for its
    // stored-artifact steady-state twin q266 (the q201 pattern): q170's
    // wall clock was ~90% in-query codebook training, so the bench's most
    // expensive vector entry measured training, not retrieval. q170's
    // correctness gate still pins the in-query training chain.
    // q165-q168/q171 are fixture/command round-trips dominated by scratch
    // setup, not steady-state operator cost.
    "q166_repetition", "q266_ivfpq_stored",
    // round-10 session-2 additions: the triangle wedge join (edge-keyed
    // self-joins over the near-dup graph — a join shape no other bench
    // query has) and the SNM discover+verify pass (chunked string-key
    // rank + generated-rank neighbor join + shingle verification).
    // q187/q188/q189/q191 are oracle round-trips dominated by scratch
    // setup or covered shapes (q33's verify join, q45's rewrite path).
    "q186_triangles", "q190_snm_dedup",
    // round-11 additions: retrieval over the STORED postings artifact at
    // steady state (build amortized into the first/warmup call) — a
    // partition-pruned postings join with NO corpus scan — and phrase
    // retrieval over the stored POSITIONAL rows (m−1 keyed positional
    // joins), shapes no other bench entry has.
    "q201_searchtext_stored", "q210_phrase_bench",
    // round-11 session-2 additions: the exact-substring corpus pass — an
    // OVERLAPPING window census (~n windows/doc vs q131's n/20 spans)
    // with a covered-position union and a token-grain anti-coverage
    // join, the heaviest text-dedup shape in the repo — and Katz
    // scoring, which stacks the spectrum/discount/alpha catalog joins
    // on top of q100's LM chain (q212-q228's shapes are covered: span
    // census by q131, screening probes by q31/q81, command round-trips
    // are scratch-dominated by design).
    "q211_exact_substring", "q229_katz_lm",
    // round-11 session-4 additions: TextRank — the only PER-GROUP
    // iterative graph shape (sentence pair enumeration + five driver
    // rounds of doc-keyed join+sum, where q65/q177 iterate globally) —
    // and the banded dHash pass, the only bench entry whose scan builds
    // and hashes BINARY payloads (63 codegen'd md5 cells + bit math +
    // band self-join). q237-q241/q244-q245 shapes are covered: HITS by
    // q177's loop, link-pred wedges by q186, WordPiece by q129's merge
    // loop cost, PRF by q136+q97, KS by q155's rank family, the probe
    // twins by q31/q81.
    "q243_textrank", "q242_phash_neardup",
    // round-12 addition: SEARCHHYBRID at serving steady state — the one
    // retrieval command class that had correctness gates only. BOTH
    // branches answer from stored artifacts in ONE plan (term-bucket-
    // pruned postings join + sign-bucket-pruned SQ8 probe + RRF), the
    // query shape a real retrieval deployment runs.
    "q267_hybrid_stored",
    // round-12 addition: the pretraining-export capstone — curation →
    // exact dedup → span dedup → mixture select → pack → shard in ONE
    // query (every stage's isolated gate already green: q61, q131,
    // q200, q139, q82). Its time is the honest "pipeline number" for
    // the full corpus-build chain.
    "q269_pretrain_capstone",
    // round-13 addition (r12 verdict item 3): tokenizer TRAINING — the
    // only driver-loop-heavy family that had no tracked number. Unigram-LM
    // hard-EM has the steepest loop profile in the repo (per EM round:
    // a maxWordLen-layer Viterbi DP of keyed joins over the word
    // spectrum, then a vocabulary-grain re-estimation; BPE/WordPiece
    // merge rounds are single count-table regroups by comparison).
    "q268_unigram_lm",
    // round-13 addition (r12 verdict item 7): hybrid serving under a
    // CONCURRENT query batch — q267 measures one query; real serving
    // amortizes the postings scan and the cell probe across a batch.
    // One pruned postings pass + one cell-union probe for 3 queries.
    "q309_hybrid_batch",
    // round-14 addition (r13 verdict item 1): the same batch served from
    // the RESIDUAL ADC layout — dense candidates from ONE codes-only
    // scan pruned to the probed-cell union (broadcast residual LUTs,
    // bounded shortlist heap, one shortlist-bounded exact rerank).
    "q310_hybrid_adc_batch",
    // round-15 addition (r14 verdict item 7): the EGRESS path — no
    // prior entry exercised a write-heavy operator. Both ride cached
    // source collections (the q201 steady-state convention), so the
    // timed body is the export itself: q321 the sharded jsonl write +
    // read-back, q322 the reference vec;payload text write + re-ingest
    // round-trip.
    "q321_export_cmd", "q322_export_text",
    // round-17 additions (r16 verdict item 4): the split lifecycle's
    // steady-state costs — q349 the routing SCREEN (dry-run ROUTE of the
    // q339 batch against the cached band artifact + sidecar: shingle +
    // band-join + verify + inheritance math, nothing committed, so reps
    // are identical), q350 the split-aware EXPORT (id-keyed semi-join
    // against the committed assignment + sharded jsonl write). Both ride
    // one cached fixture (the q201 convention) — warmup pays the
    // corpus/band/sidecar build once.
    "q349_route_preview", "q350_export_split_stored",
    // round-17 session-2 addition: the TAG build — the tag-once corpus
    // scoring pass (token/lang/quality/PII column math + sidecar
    // commit), the one-pass cost every downstream attribute filter
    // amortizes. Rides the cached q321 docs fixture; each rep pays the
    // full rebuild, which IS the steady-state unit of this lifecycle
    // (refresh cost is delta-sized by construction).
    "q358_tag_attrs")
}
