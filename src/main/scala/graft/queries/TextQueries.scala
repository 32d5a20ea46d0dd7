package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{SimilaritySearch, TextAnalysis}

/** Text-analysis coverage over the documents table: per-language corpus
  * statistics, quality scoring, token/subword counting, fingerprinting, and
  * heuristic language-ID — all pure column expressions (they run inside the
  * scan), each mirrored exactly by its DuckDB oracle.
  */
object TextQueries {

  import org.apache.spark.sql.Column

  /** Shared q146/q150 synthetic URL: eight deterministic byte-variants
    * of the same page URL (host case, default port, trailing slash,
    * fragment, tracking params) from doc_id md5 slices.
    */
  private def syntheticUrl: Column = {
    val v = conv(substring(md5(concat(lit("urlvar:"),
      col("doc_id").cast("string"))), 1, 4), 16, 10).cast("long") % 8
    val hcase = conv(substring(md5(concat(lit("urlcase:"),
      col("doc_id").cast("string"))), 1, 4), 16, 10).cast("long") % 2
    val host = when(hcase === 0, lit("example.com"))
      .otherwise(lit("EXAMPLE.Com"))
    val k = (col("doc_id") % 25).cast("string")
    val base = concat(lit("https://"), host, lit("/a/"), k)
    when(v === 0, base)
      .when(v === 1, concat(base, lit("/")))
      .when(v === 2, concat(base, lit("?utm_source=feed")))
      .when(v === 3, concat(base, lit("#top")))
      .when(v === 4, concat(lit("https://"), host, lit(":443/a/"), k))
      .when(v === 5, concat(base, lit("?q=1&utm_campaign=x")))
      .when(v === 6, concat(base, lit("?q=1")))
      .otherwise(concat(base, lit("?q=1&gclid=zz")))
  }

  /** Shared q149/q150 synthetic diacritic suffix: precomposed /
    * decomposed / plain / markless-ß variants by doc_id md5 class.
    */
  private def accentSuffix: Column = {
    val av = conv(substring(md5(concat(lit("accvar:"),
      col("doc_id").cast("string"))), 1, 4), 16, 10).cast("long") % 4
    when(av === 0, lit("cafe"))
      .when(av === 1, lit("caf\u00e9"))
      .when(av === 2, lit("cafe\u0301"))
      .otherwise(lit("stra\u00dfe"))
  }

  /** Shared q146/q150 DuckDB CTE prefix: synthesizes the URL variants
    * and replays [[graft.operators.UrlOps.canonicalizeUrl]] exactly
    * (query anchored to the pre-fragment region, userinfo preserved
    * with only the host lowercased, default ports and trailing slashes
    * stripped, tracking params filtered in order). Ends with CTE `c`
    * exposing `$carry, raw, canon`.
    */
  private def urlCanonSql(carry: String): String =
    raw"""WITH u AS (
       |  SELECT doc_id, source, text,
       |    CAST(('0x'||substring(md5('urlvar:'||CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 8 AS v,
       |    CASE WHEN CAST(('0x'||substring(md5('urlcase:'||CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 2 = 0
       |      THEN 'example.com' ELSE 'EXAMPLE.Com' END AS host,
       |    CAST(doc_id % 25 AS VARCHAR) AS k,
       |    text || ' ' || CASE CAST(
       |        CAST(('0x'||substring(md5('accvar:'||CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 4
       |      AS INT)
       |      WHEN 0 THEN 'cafe'
       |      WHEN 1 THEN 'caf' || chr(233)
       |      WHEN 2 THEN 'cafe' || chr(769)
       |      ELSE 'stra' || chr(223) || 'e' END AS aug
       |  FROM documents),
       |r AS (
       |  SELECT *, CASE v
       |      WHEN 0 THEN 'https://'||host||'/a/'||k
       |      WHEN 1 THEN 'https://'||host||'/a/'||k||'/'
       |      WHEN 2 THEN 'https://'||host||'/a/'||k||'?utm_source=feed'
       |      WHEN 3 THEN 'https://'||host||'/a/'||k||'#top'
       |      WHEN 4 THEN 'https://'||host||':443/a/'||k
       |      WHEN 5 THEN 'https://'||host||'/a/'||k||'?q=1&utm_campaign=x'
       |      WHEN 6 THEN 'https://'||host||'/a/'||k||'?q=1'
       |      ELSE 'https://'||host||'/a/'||k||'?q=1&gclid=zz' END AS raw
       |  FROM u),
       |p AS (
       |  SELECT *,
       |    lower(regexp_extract(raw, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
       |    regexp_extract(raw, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1) AS auth,
       |    rtrim(regexp_extract(raw, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1), '/') AS path,
       |    regexp_extract(raw, '^[^#?]*\?([^#]*)', 1) AS qs
       |  FROM r),
       |c AS (
       |  SELECT $carry, raw,
       |    scheme || '://' ||
       |    (CASE WHEN scheme = 'https' THEN regexp_replace(hp, ':443$$', '')
       |          WHEN scheme = 'http' THEN regexp_replace(hp, ':80$$', '')
       |          ELSE hp END) || path ||
       |    (CASE WHEN qs = '' THEN '' ELSE
       |      (CASE WHEN len(kept) = 0 THEN ''
       |            ELSE '?' || array_to_string(kept, '&') END) END) AS canon
       |  FROM (
       |    SELECT *,
       |      regexp_extract(auth, '^([^@]*@)', 1)
       |        || lower(regexp_replace(auth, '^[^@]*@', '')) AS hp,
       |      list_filter(str_split(qs, '&'), x -> NOT (
       |        starts_with(x, 'utm_') OR starts_with(x, 'gclid=')
       |        OR starts_with(x, 'fbclid=') OR starts_with(x, 'ref='))) AS kept
       |    FROM p))""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Corpus statistics per language label.
    "q35_lang_stats" -> ((s, dir) => {
      Tables.documents(s, dir)
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          round(avg(col("n_chars")), 4).as("avg_chars"),
          round(avg(TextAnalysis.tokenCount(col("text"))), 4).as("avg_tokens"))
        .orderBy("lang")
    }),

    // Quality scoring: token count, punctuation ratio, stopword ratio, and
    // the composite score, per document. The tokens array and both raw
    // ratios are materialized once and reused (vs re-deriving the regexps
    // per output column — same values, ~3× less regex work per row).
    "q36_quality" -> ((s, dir) => {
      val toks = regexp_extract_all(lower(col("text")), lit("\\S+"), lit(0))
      graft.operators.Parallelism.ensure(Tables.documents(s, dir))
        .withColumn("__toks", toks)
        .withColumn("__punct", TextAnalysis.punctRatio(col("text")))
        .withColumn("__stop", when(size(col("__toks")) === 0, 0.0).otherwise(
          size(filter(col("__toks"), t => t.isin(TextAnalysis.stopwords: _*)))
            .cast("double") / size(col("__toks"))))
        .select(
          col("doc_id"),
          size(col("__toks")).cast("long").as("n_tokens"),
          // +1e-9 before rounding on BOTH sides: these ratios are dyadic
          // rationals (token counts are often powers of two) that land
          // EXACTLY on 6-decimal midpoints, where Spark (HALF_UP) and
          // DuckDB disagree; the epsilon (≪ the 5e-7 rounding granularity,
          // ≫ FP noise) shifts values off the midpoint lattice identically
          // in both engines.
          round(col("__punct") + lit(1e-9), 6).as("punct_ratio"),
          round(col("__stop") + lit(1e-9), 6).as("stopword_ratio"),
          round(TextAnalysis.qualityScoreFrom(
            col("text"), col("__punct"), col("__stop")) + lit(1e-9), 6).as("quality"))
        .orderBy("doc_id")
    }),

    // Intra-document repetition (Gopher-class quality rule): fraction of
    // 2-/3-gram occurrences repeating an earlier one in the same doc.
    "q84_repetition" -> ((s, dir) => {
      graft.operators.Parallelism.ensure(Tables.documents(s, dir))
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"),
          round(TextAnalysis.duplicateNgramFrac(col("text"), 2) + lit(1e-9), 6)
            .as("dup_2gram"),
          round(TextAnalysis.duplicateNgramFrac(col("text"), 3) + lit(1e-9), 6)
            .as("dup_3gram"))
        .orderBy("doc_id")
    }),

    // Winnowing fingerprints (k=8 char grams, w=4 windows): the gate pins
    // each document's ENTIRE fingerprint set via an md5 over the sorted
    // set, not just its size — the oracle recomputes the window minima.
    "q90_winnowing" -> ((s, dir) => {
      graft.operators.Parallelism.ensure(Tables.documents(s, dir))
        // materialize the gram-hash array in its own projection: the
        // window lambda would otherwise recompute it per window (O(n²))
        .withColumn("__h", TextAnalysis.kgramHashes(col("text"), 8))
        .withColumn("__fps", TextAnalysis.winnowFromHashes(col("__h"), 4))
        .select(col("doc_id"),
          size(col("__fps")).cast("long").as("n_fp"),
          when(size(col("__fps")) === 0, lit(null).cast("string"))
            .otherwise(md5(concat_ws("", array_sort(col("__fps")))))
            .as("fp_sig"))
        .orderBy("doc_id")
    }),

    // Corpus-level boilerplate mining: the most document-frequent 5-gram
    // shingles (nav bars, license headers, scraped chrome). One explode +
    // one partially-aggregated count + a top-k cut — the corpus never
    // self-joins, and the result feeds the stop-shingle lists the dedup
    // operators' frequency caps consume.
    "q88_boilerplate" -> ((s, dir) => {
      graft.operators.Dedup.explodeShingles(
          Tables.documents(s, dir), "doc_id", "text", 5)
        .groupBy("shingle")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(desc("n_docs"), col("shingle"))
        .limit(20)
    }),

    // Vocabulary building (tokenizer-training prep): corpus-wide top-100
    // normalized words by occurrence count, with document frequency and
    // cumulative corpus coverage. One explode + one partial-agg count, the
    // top-100 cut is orderBy+limit (TakeOrderedAndProject — never a global
    // sort of the full vocabulary), and only the 100 survivors enter the
    // ranking/cumsum window.
    "q93_vocabulary" -> ((s, dir) => {
      val toks = graft.operators.Parallelism.ensure(Tables.documents(s, dir))
        .select(col("doc_id"),
          explode(TextAnalysis.normalizedTokens(col("text"))).as("token"))
      val counts = toks.groupBy("token")
        .agg(count(lit(1)).as("n_occ"), countDistinct(col("doc_id")).as("n_docs"))
      val total = counts.agg(sum("n_occ").cast("double").as("total"))
      val top = counts.orderBy(desc("n_occ"), col("token")).limit(100)
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(desc("n_occ"), col("token"))
      top.crossJoin(broadcast(total))
        .withColumn("rank", row_number().over(w).cast("long"))
        .withColumn("cum_share", round(
          sum("n_occ").over(w.rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding, 0))
            .cast("double") / col("total") + lit(1e-9), 6))
        .select(col("rank"), col("token"), col("n_occ"), col("n_docs"),
          col("cum_share"))
        .orderBy("rank")
    }),

    // PII redaction: scrub emails/phones/IPv4s to class tokens and account
    // for what was removed. The PII is synthesized deterministically from
    // doc_id (the corpus itself is clean), so the gate exercises real
    // matches; the oracle recomputes synthesis, counts, and the scrubbed
    // text's md5 — a hash match pins the exact redacted output, not just
    // the counts.
    "q94_pii_scrub" -> ((s, dir) => {
      val synth = concat_ws(" ", col("text"), lit("contact:"),
        concat(lit("user"), col("doc_id").cast("string"), lit("@ex"),
          (col("doc_id") % 7).cast("string"), lit(".com")),
        concat(lit("+1-555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")),
        concat(lit("10."), (col("doc_id") % 256).cast("string"), lit("."),
          ((col("doc_id") * 3) % 256).cast("string"), lit("."),
          ((col("doc_id") * 7) % 256).cast("string")))
      graft.operators.Parallelism.ensure(Tables.documents(s, dir))
        .withColumn("__synth", synth)
        .select(col("doc_id"),
          TextAnalysis.piiCount(col("__synth"), "email").as("n_email"),
          TextAnalysis.piiCount(col("__synth"), "phone").as("n_phone"),
          TextAnalysis.piiCount(col("__synth"), "ip").as("n_ip"),
          md5(TextAnalysis.scrubPii(col("__synth"))).as("scrub_sig"))
        .orderBy("doc_id")
    }),

    // Count-min heavy hitters: md5-hashed sketch (4 rows × 256 buckets —
    // bounded regardless of corpus size), estimates for the true top-20
    // tokens beside their exact counts. The oracle recomputes every
    // sketch cell, so the hash match pins the sketch itself; n_cms ≥
    // n_true always (collisions only add).
    "q112_cms_heavyhitters" -> ((s, dir) => {
      val toks = graft.operators.Parallelism.ensure(Tables.documents(s, dir))
        .select(explode(TextAnalysis.normalizedTokens(col("text"))).as("token"))
      val table = graft.operators.Sketches.countMinTable(
        toks, "token", depth = 4, width = 256)
      val top = toks.groupBy("token").agg(count(lit(1)).as("n_true"))
        .orderBy(desc("n_true"), col("token")).limit(20)
      top.join(graft.operators.Sketches.cmsEstimate(
          table, top, "token", depth = 4, width = 256), Seq("token"))
        .select(col("token"), col("n_true"), col("n_cms"))
        .orderBy(desc("n_true"), col("token"))
    }),

    // EXACT heavy hitters via the Misra-Gries candidate pass (q112's CMS
    // estimates; this one PROVES): all tokens with freq STRICTLY > N/32,
    // candidates from bounded per-partition k-counter summaries (superset
    // guarantee), then an exact broadcast recount — the full vocabulary
    // never shuffles. Threshold as exact-integer n*k > N, no division.
    "q293_mg_heavyhitters" -> ((s, dir) => {
      graft.operators.Sketches.heavyHitters(
        graft.operators.Parallelism.ensure(Tables.documents(s, dir))
          .select(explode(TextAnalysis.normalizedTokens(col("text")))
            .as("token")),
        "token", k = 32)
    }),

    // KMV bottom-k distinct sketch: per-source vocabulary-size estimates
    // beside the exact counts — the distinct-count diagnostic the CMS
    // (frequencies, q112) and Bloom (membership, q113) sketches don't
    // cover. 48-bit md5 hashes keep every number under 2^53 (exact in
    // double on both engines); the oracle recomputes the k-th smallest
    // hash and the estimator division, pinning the sketch itself. The
    // bottom-k runs in the bounded heap, never a per-group sort window.
    "q143_kmv_distinct" -> ((s, dir) => {
      val toks = graft.operators.Parallelism.ensure(Tables.documents(s, dir))
        .select(col("source"),
          explode(TextAnalysis.normalizedTokens(col("text"))).as("token"))
      val exact = toks.groupBy("source")
        .agg(countDistinct("token").as("n_exact"))
      graft.operators.Sketches.kmvDistinct(toks, "source", "token", k = 64)
        .join(exact, Seq("source"))
        .select(col("source"), col("n_exact"), col("n_sketch"), col("kth"),
          round(col("est_distinct") + lit(1e-9), 4).as("est"))
        .orderBy("source")
    }),

    // HyperLogLog distinct-count per source — the register-based sibling
    // of q143's KMV, closing the sketch family (CMS counts, bloom
    // membership, KMV bottom-k, HLL registers). The oracle replays the
    // md5 bucketing, the CASE-ladder rank (exact integer compares — no
    // float log), the register maxima, the exact-dyadic harmonic sum,
    // and the linear-counting branch; ln follows the house parity rule.
    "q174_hll_distinct" -> ((s, dir) => {
      val toks = graft.operators.Parallelism.ensure(Tables.documents(s, dir))
        .select(col("source"),
          explode(TextAnalysis.normalizedTokens(col("text"))).as("token"))
      val exact = toks.groupBy("source")
        .agg(countDistinct("token").as("n_exact"))
      val est = graft.operators.Sketches.hllEstimate(
        graft.operators.Sketches.hllRegisters(toks, "source", "token"),
        "source")
      exact.join(est, Seq("source"))
        .select(col("source"), col("n_exact"), col("n_hll"))
        .orderBy("source")
    }),

    // KMV set operations: cross-source vocabulary overlap (union /
    // Jaccard / intersection estimates) for every source pair from the
    // stored bottom-64 sketches alone — the corpus is read once for the
    // sketch build, the 190 pair combinations are HOFs over 64-long
    // arrays.
    "q217_kmv_setops" -> ((s, dir) => {
      val toks = graft.operators.Parallelism.ensure(Tables.documents(s, dir))
        .select(col("source"),
          explode(TextAnalysis.normalizedTokens(col("text"))).as("token"))
      graft.operators.Sketches.kmvSetOps(toks, "source", "token", k = 64)
        .select(col("a_source"), col("b_source"), col("kp"), col("rho"),
          round(col("est_union") + lit(1e-9), 4).as("est_union"),
          round(col("est_jaccard") + lit(1e-9), 6).as("est_jaccard"),
          round(col("est_intersection") + lit(1e-9), 4).as("est_intersection"))
        .orderBy("a_source", "b_source")
    }),

    // Good-Turing frequency spectrum per source: N_r (tokens seen exactly
    // r times) and the Turing adjusted count (r+1)N_{r+1}/N_r — exact
    // integer math + one division, unrounded.
    "q218_freq_spectrum" -> ((s, dir) => {
      TextAnalysis.frequencySpectrum(
          graft.operators.Parallelism.ensure(Tables.documents(s, dir)),
          "source", "text")
        .orderBy("source", "r")
    }),

    // Zipf rank-frequency fit per source over the top-100 tokens: the
    // corpus-health slope/intercept (template-heavy sources drift from
    // the natural-text slope).
    "q219_zipf_slope" -> ((s, dir) => {
      TextAnalysis.zipfSlope(
          graft.operators.Parallelism.ensure(Tables.documents(s, dir)),
          "source", "text", topR = 100)
        .orderBy("source")
    }),

    // Heaps'-law vocabulary growth per source: cumulative tokens vs
    // cumulative distinct tokens after each doc (two-phase chunked
    // cumsum — no corpus-scale window partition), then the ln-ln fit.
    "q220_heaps_growth" -> ((s, dir) => {
      TextAnalysis.heapsGrowth(
          graft.operators.Parallelism.ensure(Tables.documents(s, dir)),
          "source", "doc_id", "text", chunkSize = 256)
        .orderBy("source", "doc_id")
    }),

    "q221_heaps_fit" -> ((s, dir) => {
      TextAnalysis.heapsFit(
          graft.operators.Parallelism.ensure(Tables.documents(s, dir)),
          "source", "doc_id", "text", chunkSize = 256)
        .orderBy("source")
    }),

    // Fightin' Words: the 10 most DISTINCTIVE tokens per source by
    // Dirichlet-prior log-odds z-score vs the rest of the corpus —
    // per-row ln/sqrt chains over exact counts, ranked on the rounded z.
    "q222_keyness" -> ((s, dir) => {
      TextAnalysis.keynessScores(
          graft.operators.Parallelism.ensure(Tables.documents(s, dir)),
          "source", "text", alpha = 0.01, topK = 10)
        .orderBy("source", "rank")
    }),

    // The RAW harmonic branch of the HLL (q174's corpus vocabulary is so
    // small every source linear-counts): thousands of distinct order keys
    // per return flag fill all 64 registers, so the α·m²/S path runs —
    // both branches of the estimator are now gate-covered.
    "q175_hll_raw" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_returnflag"), col("l_orderkey"))
      val exact = li.groupBy("l_returnflag")
        .agg(countDistinct("l_orderkey").as("n_exact"))
      val est = graft.operators.Sketches.hllEstimate(
        graft.operators.Sketches.hllRegisters(li, "l_returnflag",
          "l_orderkey"), "l_returnflag")
      exact.join(est, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("n_exact"), col("n_hll"))
        .orderBy("l_returnflag")
    }),

    // Mergeable sample-quantile sketch — the quantile member of the
    // sketch family: bottom-128-by-md5 uniform row sample per order
    // status, type-1 quantiles of the sample by exact integer index
    // math, beside the exact full-sort quantiles as the honesty
    // diagnostic (the q143 n_exact convention). Every output is an
    // actual data value — no interpolation, nothing to round. At
    // sf0.001 every group is smaller than the sample, so sp ≡ xp —
    // the self-sampling boundary rides the gate at one SF.
    "q176_sample_quantiles" -> ((s, dir) => {
      graft.operators.Sketches.sampleQuantiles(
        Tables.orders(s, dir), "o_orderstatus", "o_orderkey",
        "o_totalprice", sampleSize = 128)
        .orderBy("o_orderstatus")
    }),

    // The sample-quantile sketch driving its production consumer:
    // per-source quality-score quartile thresholds estimated from the
    // bottom-64 sample (exactDiagnostic = false — no full-group sort
    // anywhere, PlanAudit-pinned), broadcast back over the corpus to bin
    // every doc. Scores are rounded (+1e-9, 6) BEFORE the sketch on both
    // sides (q36's quality replay), so threshold comparisons are
    // identical-double compares; lo/hi are selections of already-rounded
    // values — nothing re-rounds.
    "q182_quantile_bins" -> ((s, dir) => {
      val docs = graft.operators.Parallelism.ensure(Tables.documents(s, dir))
        .withColumn("__q", round(
          TextAnalysis.qualityScore(col("text")) + lit(1e-9), 6))
      val sk = graft.operators.Sketches.sampleQuantiles(docs, "source",
        "doc_id", "__q", sampleSize = 64, qs = Seq(25, 50, 75),
        exactDiagnostic = false)
      docs.join(broadcast(sk), Seq("source"))
        .withColumn("bucket",
          when(col("__q") <= col("sp25"), 0L)
            .when(col("__q") <= col("sp50"), 1L)
            .when(col("__q") <= col("sp75"), 2L)
            .otherwise(3L))
        .groupBy("source", "bucket")
        .agg(count(lit(1)).as("n"), min("__q").as("lo"), max("__q").as("hi"))
        .orderBy("source", "bucket")
    }),

    // GPT-style concat-and-slice packing: the corpus as one md5-ordered
    // virtual token stream cut into exactly-256-token sequences across
    // document boundaries (q163 packs whole docs into bins; this is the
    // pretraining layout where every sequence is full). The gate hashes
    // the PROVENANCE map — every doc's global token offset and its token
    // count in every sequence it touches — so the chunked two-phase
    // cumsum is pinned offset-for-offset. All exact integer math.
    "q178_seq_slices" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .withColumn("__nt", TextAnalysis.tokenCount(col("text")))
      graft.operators.TrainExport
        .sliceSequences(docs, "doc_id", "__nt", seqLen = 256)
        .orderBy("doc_id", "seq_id")
    }),

    // Unicode canonicalization before dedup: deterministic synthetic
    // encoding variants (precomposed é/ñ vs decomposed e+U+0301 /
    // n+U+0303 by doc_id % 4 — the q80 synthetic-input pattern) are
    // NFC-normalized by the custom codegen expression; per source, the
    // four raw byte-variants collapse to two canonical classes, and the
    // md5 of the canonical bytes is pinned — the oracle recomputes with
    // DuckDB's own nfc_normalize, so a hash match proves the JDK and
    // utf8proc compose these sequences identically.
    "q144_nfc_dedup" -> ((s, dir) => {
      // variant from an md5 slice, NOT doc_id % 4: doc ids within a
      // source share a residue class, which would collapse the variants
      // to one per source (a vacuous gate)
      val variant = conv(substring(md5(concat(lit("nfcvar:"),
        col("doc_id").cast("string"))), 1, 4), 16, 10).cast("long") % 4
      val raw = concat(col("source"),
        when(variant === 0, lit("\u00e9"))        // precomposed e-acute
          .when(variant === 1, lit("e\u0301"))     // e + combining acute
          .when(variant === 2, lit("\u00f1"))      // precomposed n-tilde
          .otherwise(lit("n\u0303")))              // n + combining tilde
      Tables.documents(s, dir)
        .select(col("source"), raw.as("raw"))
        .withColumn("canon", graft.functions.nfc_normalize(col("raw")))
        .groupBy("source")
        .agg(countDistinct("raw").as("n_raw"),
          countDistinct("canon").as("n_canon"),
          min(md5(col("canon"))).as("canon_md5"))
        .orderBy("source")
    }),

    // Accent folding for fuzzy dedup keys: diacritic variants of the
    // same word (precomposed é, decomposed e+U+0301, plain e) land in
    // one fold class, while ß — which carries no combining mark — must
    // pass through untouched (folding is NOT transliteration). The md5
    // of the folded bytes is pinned; the oracle recomputes with
    // DuckDB's utf8proc strip_accents, proving the JDK NFD+drop-Mn
    // fold and utf8proc agree on the exercised sequences.
    "q149_accent_fold" -> ((s, dir) => {
      val variant = conv(substring(md5(concat(lit("accvar:"),
        col("doc_id").cast("string"))), 1, 4), 16, 10).cast("long") % 4
      val raw = concat(col("source"),
        when(variant === 0, lit("cafe"))
          .when(variant === 1, lit("caf\u00e9"))   // precomposed
          .when(variant === 2, lit("cafe\u0301"))  // decomposed
          .otherwise(lit("stra\u00dfe")))          // ß: no mark, kept
      Tables.documents(s, dir)
        .select(col("source"), raw.as("raw"))
        .withColumn("folded", graft.functions.strip_accents(col("raw")))
        .groupBy("source")
        .agg(countDistinct("raw").as("n_raw"),
          countDistinct("folded").as("n_fold"),
          min(md5(col("folded"))).as("fold_md5"))
        .orderBy("source")
    }),

    // URL canonicalization before URL-level dedup: eight deterministic
    // byte-variants of the same page URL (host case, default port,
    // trailing slash, fragment, tracking params — synthesized from
    // doc_id md5 slices, the q144 pattern) collapse to two canonical
    // classes per page (with and without the surviving ?q=1). The
    // canonical string itself is in the output, so a hash match pins
    // every normalization rule byte-for-byte.
    "q146_url_canon" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(syntheticUrl.as("raw"))
        .withColumn("canon", graft.operators.UrlOps.canonicalizeUrl(col("raw")))
        .groupBy("canon")
        .agg(countDistinct("raw").as("n_raw"), count(lit(1)).as("n"))
        .orderBy("canon")
    }),

    // Naive-Bayes source classification (the curation-pipeline
    // quality/domain classifier slot): train on the md5-split 80% of
    // docs, predict the source of the held-out 20%, pin the full
    // confusion matrix. Closed-form training means the MODEL — not just
    // the predictions — is engine-replayable; the oracle retrains from
    // scratch and must land every argmax identically (rounded scores,
    // label tie-break, the ln/rank doctrine).
    "q145_nb_classify" -> ((s, dir) => {
      val bucket = conv(substring(md5(concat(lit("split:"),
        col("doc_id").cast("string"))), 1, 4), 16, 10).cast("long") % 10
      graft.operators.Classify.nbPredict(
          graft.operators.Parallelism.ensure(Tables.documents(s, dir)),
          "doc_id", "text", "source", isTrain = bucket < 8)
        .groupBy(col("label").as("source"), col("pred"))
        .agg(count(lit(1)).as("n"))
        .select(col("source"), col("pred"), col("n"))
        .orderBy("source", "pred")
    }),

    // Margin calibration of the q145 NB classifier (the exp-free
    // reliability diagram): per test doc, the winner-vs-runner-up
    // rounded-score gap bucketed into integer-width bins; per bin the
    // EXACT empirical accuracy — the curve a filtering pipeline reads
    // to pick its confidence threshold. s1/s2 are bit-identical rounded
    // grid scores, so margins, floors, and counts are exact; only
    // avg_margin rounds.
    "q303_nb_calibration" -> ((s, dir) => {
      val bucket = conv(substring(md5(concat(lit("split:"),
        col("doc_id").cast("string"))), 1, 4), 16, 10).cast("long") % 10
      graft.operators.Classify.nbMarginCalibration(
        graft.operators.Parallelism.ensure(Tables.documents(s, dir)),
        "doc_id", "text", "source", isTrain = bucket < 8,
        binWidth = 0.25, nBins = 8)
    }),

    // Per-label precision/recall/F1 of the q145 NB classifier — the
    // trust measurement before a filtering threshold decides what the
    // corpus keeps. Exact counts, exact P/R divisions, deterministic
    // 2·P·R/(P+R) F1; labels seen only as predictions still row.
    "q253_classifier_metrics" -> ((s, dir) => {
      val bucket = conv(substring(md5(concat(lit("split:"),
        col("doc_id").cast("string"))), 1, 4), 16, 10).cast("long") % 10
      graft.operators.Classify.classifierMetrics(
          graft.operators.Classify.nbPredict(
            graft.operators.Parallelism.ensure(Tables.documents(s, dir)),
            "doc_id", "text", "source", isTrain = bucket < 8))
        .orderBy("label")
    }),

    // Logistic-regression quality/language classifier TRAINING (the
    // trainable sibling of the closed-form NB at q145): 6 rounds of
    // full-batch GD over cheap exact text features (token count / 256,
    // digit/punct/uppercase char ratios — single divisions of integer
    // counts), label = (lang = 'en'). Per-round gradient sums are the
    // only order-dependent + transcendental surface and round (+1e-9, 6)
    // before re-entering the recursion (the pageRank round-discipline;
    // exp-sum parity is the q148 precedent); the oracle replays all 6
    // layers with materialized CTEs (the q203 discipline — each layer is
    // referenced twice, inlining would go exponential). Output: the
    // weight trajectory, every float rounded.
    "q316_lr_train" -> ((s, dir) => {
      // gradient rounds commit through a fresh StageStore (the q268/q269
      // convention — TrainResumeSpec pins kill-and-resume)
      graft.operators.Classify.logisticTrain(
        lrFeatures(Tables.documents(s, dir)),
        Seq("x_len", "x_digit", "x_punct", "x_upper"), "y",
        eta = 0.5, rounds = 6,
        store = Some(new graft.core.StageStore(s, Scratch.dir("graft_q316"))))
    }),

    // The trained LR model APPLIED (q316's weights as plan literals —
    // the centroids precedent; the 5-double collect is model-sized):
    // per-doc sigmoid score and thresholded keep/drop decision. The
    // prediction thresholds on the ROUNDED score (the rank-on-rounded
    // doctrine: a one-ulp exp difference must not flip a keep decision);
    // the oracle re-derives the weights through the same 6 layers and
    // scores identically.
    "q317_lr_score" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val traj = graft.operators.Classify.logisticTrain(
        lrFeatures(docs), Seq("x_len", "x_digit", "x_punct", "x_upper"),
        "y", eta = 0.5, rounds = 6)
      val wRow = traj.orderBy(desc("round")).limit(1).head()
      val w = (1 to 5).map(wRow.getDouble)
      lrFeatures(docs.select(col("doc_id"), col("text"), col("lang")))
        .withColumn("score", graft.operators.Classify.logisticScore(w,
          Seq(col("x_len"), col("x_digit"), col("x_punct"),
            col("x_upper"))))
        .select(col("doc_id"), col("y").cast("long").as("is_en"),
          col("score"),
          when(col("score") >= 0.5, 1L).otherwise(0L).as("pred"))
        .orderBy("doc_id")
    }),

    // The LR scorer on a STREAM: weights train batch-side (model-sized
    // driver literals — the centroids precedent), then the scoring is a
    // stateless projection over the arriving docs (append mode, no
    // state) — q317's oracle verbatim (the q102 → q96 stream-twin
    // pattern applied to the trained-model family).
    "q318_stream_lr_score" -> ((s, dir) => {
      val traj = graft.operators.Classify.logisticTrain(
        lrFeatures(Tables.documents(s, dir)),
        Seq("x_len", "x_digit", "x_punct", "x_upper"), "y",
        eta = 0.5, rounds = 6)
      val wRow = traj.orderBy(desc("round")).limit(1).head()
      graft.streaming.StreamingIngest.streamLrScore(s, dir,
          (1 to 5).map(wRow.getDouble),
          queryName = s"lr_${java.util.UUID.randomUUID().toString.take(8)}")
        .orderBy("doc_id")
    }),

    // Reliability diagram of the q317 LR scorer (the q303 calibration
    // convention for the trained-model family): scores binned at dyadic
    // width 1/2048 (score·2048 is an EXACT power-of-two scaling of the
    // 6-decimal rounded score, floor exact; bins are data-driven ids —
    // this corpus's scores span ~0.003, so a fixed [0,1) grid would
    // collapse to one row), per bin the EXACT empirical positive rate
    // (single integer division) beside the rounded mean score — the
    // curve a filtering pipeline reads to pick its keep threshold.
    "q320_lr_calibration" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val traj = graft.operators.Classify.logisticTrain(
        lrFeatures(docs), Seq("x_len", "x_digit", "x_punct", "x_upper"),
        "y", eta = 0.5, rounds = 6)
      val wRow = traj.orderBy(desc("round")).limit(1).head()
      val w = (1 to 5).map(wRow.getDouble)
      lrFeatures(docs.select(col("doc_id"), col("text"), col("lang")))
        .withColumn("score", graft.operators.Classify.logisticScore(w,
          Seq(col("x_len"), col("x_digit"), col("x_punct"),
            col("x_upper"))))
        .withColumn("bin", floor(col("score") * 2048.0).cast("long"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"),
          sum(col("y").cast("long")).as("n_pos"),
          round(avg(col("score")) + lit(1e-9), 6).as("avg_score"))
        .withColumn("pos_rate",
          col("n_pos").cast("double") / col("n").cast("double"))
        .select(col("bin"), col("n"), col("n_pos"), col("pos_rate"),
          col("avg_score"))
        .orderBy("bin")
    }),

    // BPE merge-candidate table (tokenizer training, first merge): the
    // most frequent adjacent character pairs weighted by word frequency.
    // Pairs explode off the vocabulary, never the corpus; top-20 cut is
    // TakeOrderedAndProject.
    "q107_bpe_pairs" -> ((s, dir) => {
      TextAnalysis.bpePairCounts(
          graft.operators.Parallelism.ensure(Tables.documents(s, dir)), "text")
        .orderBy(desc("n"), col("pair"))
        .limit(20)
        .select(col("pair"), col("n"))
    }),

    // The full tokenizer-training loop: 10 BPE merges in sequence (count
    // pairs over the vocabulary → merge best → recount), the oracle
    // replaying all 10 layers — the SEQUENCE is pinned, not just the
    // first merge's table (q107). Symbol-pair ties break on (a, b).
    "q129_bpe_merges" -> ((s, dir) => {
      import s.implicits._
      // merge picks commit through a fresh StageStore (the q268/q269
      // convention — TrainResumeSpec pins kill-and-resume + replay)
      TextAnalysis.bpeTrain(
          graft.operators.Parallelism.ensure(Tables.documents(s, dir)),
          "text", nMerges = 10,
          store = Some(new graft.core.StageStore(s,
            Scratch.dir("graft_q129"))))
        .zipWithIndex
        .map { case ((a, b, n), i) => (i + 1L, a, b, n) }
        .toDF("rank", "a", "b", "n")
        .orderBy("rank")
    }),

    // Unigram-LM tokenizer training (SentencePiece's model, hard-EM
    // variant): seed substring census → top-256 multi-char seeds + all
    // chars → 2 Viterbi E/M rounds → prune to 64 pieces → final M-step.
    // The oracle replays the WHOLE loop — seed selection, every DP
    // position layer, every backtrace hop, both re-estimations, the
    // prune — as generated MATERIALIZED CTEs (the q129/q203 pattern).
    // Closes the third published tokenizer family beside BPE (q129) and
    // WordPiece (q239).
    "q268_unigram_lm" -> ((s, dir) => {
      // the training commits its word census + every EM round through a
      // FRESH StageStore (the q269 convention): the gate's time stays
      // the honest full-training number WITH the round-grain durability
      // a preempted 100 TB run resumes from (TrainResumeSpec pins
      // kill-and-resume in both crash windows).
      val store = new graft.core.StageStore(s, Scratch.dir("graft_q268"))
      graft.operators.UnigramLm.train(
          graft.operators.Parallelism.ensure(Tables.documents(s, dir)),
          "text", vocabTarget = 64, emRounds = 2, seedMultiplier = 4,
          maxPieceLen = 8, maxWordLen = 16, store = Some(store))
        .select(col("piece"), col("is_char"), col("count").as("cnt"),
          col("logp"))
        .orderBy("piece")
    }),

    // Multi-token phrase census — the C4 "bad words" compliance pass at
    // PHRASE grain: per blocklist phrase, how many docs contain it and
    // how many total (consecutive normalized-token) occurrences. Pure
    // per-row HOF math in the scan; the fourth phrase never occurs, so
    // the zero row pins absence.
    "q270_phrase_census" -> ((s, dir) => {
      TextAnalysis.blocklistCensus(
          graft.operators.Parallelism.ensure(Tables.documents(s, dir)),
          "doc_id", "text", blocklistPhrases)
        .groupBy("phrase")
        .agg(sum(when(col("n_hits") > 0L, 1L).otherwise(0L)).as("n_docs"),
          sum("n_hits").as("n_hits"))
        .orderBy("phrase")
    }),

    // Blocklist scrub: drop every doc containing ANY census phrase
    // (whole-doc removal, the C4 rule); per-source survivor stats pin
    // the cut. STATELESS per-row math — q274 runs the identical body on
    // a stream against this oracle verbatim.
    "q271_blocklist_scrub" -> ((s, dir) => {
      TextAnalysis.blocklistScrub(
          graft.operators.Parallelism.ensure(Tables.documents(s, dir)),
          "doc_id", "text", blocklistPhrases)
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"),
          sum(length(col("text"))).as("n_chars"))
        .orderBy("source")
    }),

    // Deterministic T5 span corruption (Raffel 2020 §3.1.4 derandomized):
    // md5-seeded span starts (~5% × len-3 spans ≈ 15% noise), overlapping
    // spans merge, sentinel numbering in position order, and the md5
    // signatures pin the FULL reconstructed input/target strings —
    // the denoising-objective export, gate-checked end to end.
    "q272_t5_spans" -> ((s, dir) => {
      TextAnalysis.spanCorruption(
          graft.operators.Parallelism.ensure(Tables.documents(s, dir)),
          "doc_id", "text")
        .orderBy("doc_id")
    }),

    // Dirichlet-smoothed query-likelihood ranking (Zhai & Lafferty 2001)
    // — the LM-retrieval family beside BM25: zero-tf query terms still
    // contribute smoothing mass, ranked on the rounded ln-sum. q280
    // serves the same query from the STORED postings through the command
    // grammar (score=ql) — stored ≡ rescan ≡ command.
    "q279_ql_rank" -> ((s, dir) => {
      TextAnalysis.dirichletQL(
          graft.operators.Parallelism.ensure(Tables.documents(s, dir))
            .select(col("doc_id").as("id"), col("text")),
          "id", "text", Seq("vector", "data", "merge"), mu = 2000.0, k = 20)
    }),

    // Jelinek–Mercer query likelihood (Zhai & Lafferty 2001's linear-
    // interpolation smoother beside q279's Dirichlet prior): a FIXED
    // collection-model weight per term regardless of doc length, so the
    // two families legitimately rank differently. q282 serves the same
    // query from the STORED postings through the command grammar
    // (score=jm) — stored ≡ rescan ≡ command.
    "q281_jm_rank" -> ((s, dir) => {
      TextAnalysis.jelinekMercerQL(
          graft.operators.Parallelism.ensure(Tables.documents(s, dir))
            .select(col("doc_id").as("id"), col("text")),
          "id", "text", Seq("vector", "data", "merge"), lambda = 0.7, k = 20)
    }),

    // Fill-in-the-middle transform (Bavarian et al. 2022, derandomized):
    // md5-coin doc selection at the paper's FIM rate (1/2 exact in
    // 65536), two 32-bit md5 cut points, PSM reassembly
    // <PRE>p<SUF>s<MID>m — the infilling-objective export beside q272's
    // T5 spans; out_sig pins the FULL transformed string. STATELESS
    // per-row math — q286 runs the identical body on a stream against
    // this oracle verbatim.
    "q285_fim" -> ((s, dir) => {
      TextAnalysis.fimTransform(
          graft.operators.Parallelism.ensure(Tables.documents(s, dir)),
          "doc_id", "text")
        .orderBy("doc_id")
    }),

    // MATTR lexical diversity (Covington & McFall 2010): per-doc moving-
    // window type-token ratio — the length-invariant diversity score
    // beside the Gopher repetition table. Every value is exact-integer
    // math; mattr is ONE division (no rounding anywhere — the q120
    // doctrine). STATELESS per-row math — q284 runs the identical body
    // on a stream against this oracle verbatim.
    "q283_mattr" -> ((s, dir) => {
      TextAnalysis.mattr(
          graft.operators.Parallelism.ensure(Tables.documents(s, dir)),
          "doc_id", "text", window = 25)
        .orderBy("doc_id")
    }),

    // RAKE keyword extraction (Rose et al. 2010): per-doc top candidate
    // phrase by summed deg/freq word scores over stopword-delimited
    // runs — the model-free document tagger beside TextRank's sentence
    // ranking. Word scores are exact single divisions; the per-phrase
    // sum rounds (+1e-9, 6); ties break to the earliest phrase.
    "q289_rake" -> ((s, dir) => {
      TextAnalysis.rakeKeywords(
          graft.operators.Parallelism.ensure(Tables.documents(s, dir)),
          "doc_id", "text")
        .orderBy("doc_id")
    }),

    // k-anonymity release audit (Sweeney 2002) over (lang, source,
    // 50-char length bucket) quasi-identifiers: equivalence-class
    // sizes, classes/rows below k=5, smallest class — the data-release
    // privacy screen beside the PII scrub. Pure exact-integer
    // aggregation, no rounding anywhere.
    "q305_k_anonymity" -> ((s, dir) => {
      TextAnalysis.kAnonymity(
        graft.operators.Parallelism.ensure(Tables.documents(s, dir))
          .withColumn("len_bucket", expr("n_chars DIV 50")),
        Seq("lang", "source", "len_bucket"), k = 5L)
    }),

    // t-closeness audit (Li et al. 2007), the trilogy's third leg: per
    // (source, length-bucket) class, total-variation distance of the
    // lang distribution from the corpus — the skewness-attack screen.
    // Absent values fold in algebraically (the q288 identity); only the
    // cross-value sum rounds.
    "q307_t_closeness" -> ((s, dir) => {
      TextAnalysis.tCloseness(
        graft.operators.Parallelism.ensure(Tables.documents(s, dir))
          .withColumn("len_bucket", expr("n_chars DIV 50")),
        Seq("source", "len_bucket"), "lang")
    }),

    // l-diversity audit (Machanavajjhala 2007), q305's companion: per
    // (source, length-bucket) class, the distinct lang count — classes
    // below l=2 are homogeneity-attackable even when k-anonymous. Pure
    // exact-integer aggregation.
    "q306_l_diversity" -> ((s, dir) => {
      TextAnalysis.lDiversity(
        graft.operators.Parallelism.ensure(Tables.documents(s, dir))
          .withColumn("len_bucket", expr("n_chars DIV 50")),
        Seq("source", "len_bucket"), "lang", l = 2L)
    }),

    // Windowed PPMI associations (Church & Hanks 1990): skip-gram
    // co-occurrence over a ±2 window, PMI in one fixed-op-order ln,
    // top-30 above the support floor — the count-based embedding prep
    // whose margins a PPMI vector model factorizes. Pairs are per-row
    // HOF math; margins are vocabulary-keyed joins; no self-join.
    "q298_ppmi" -> ((s, dir) => {
      TextAnalysis.ppmiAssociations(
        graft.operators.Parallelism.ensure(Tables.documents(s, dir)),
        "text", window = 2, minCount = 5, k = 30)
    }),

    // Two-sided CUSUM drift over doc token counts in ingest order per
    // source (Page 1954): the change-point screen for "did this source
    // get shorter mid-crawl" — the clamped recursion factored into
    // chunked prefix sums + running extremes, EXACT integer math end to
    // end (no rounding anywhere).
    "q295_cusum_drift" -> ((s, dir) => {
      graft.operators.NumericAudit.cusumDrift(
        graft.operators.Parallelism.ensure(Tables.documents(s, dir))
          .select(col("source"), col("doc_id"),
            size(TextAnalysis.normalizedTokens(col("text"))).cast("long")
              .as("n_tokens")),
        "source", "doc_id", "n_tokens", target = 50L, h = 200L)
    }),

    // Gries' DP dispersion (2008) for the top-30 terms across sources:
    // the burstiness axis beside the frequency spectrum — DP≈0 spread
    // like the corpus, DP→1 concentrated in one source. Zero-count
    // parts folded in algebraically (1 + Σ(|obs−exp|−exp) over existing
    // rows); per-row math is exact divisions in one fixed op order;
    // only the cross-part sum rounds (+1e-9, 6).
    "q288_dispersion" -> ((s, dir) => {
      TextAnalysis.dispersionDP(
          graft.operators.Parallelism.ensure(Tables.documents(s, dir)),
          "source", "text", topN = 30)
    }),

    // Pairwise cross-source VOCABULARY overlap (Kilgarriff 2001's
    // corpus-similarity question at type grain): distinct-type
    // intersection, Jaccard, and both directed containments per source
    // pair — every value exact-integer math with single divisions (no
    // rounding, the q120 doctrine). The mixture-design diagnostic
    // upstream of q200's gated selection.
    "q287_vocab_overlap" -> ((s, dir) => {
      TextAnalysis.vocabularyOverlap(
          graft.operators.Parallelism.ensure(Tables.documents(s, dir)),
          "source", "text")
        .orderBy("a", "b")
    }),

    // PROXIMITY retrieval (minimal cover span): docs containing all
    // three terms ranked by the smallest token window holding one
    // occurrence of each — the positional-index signal between BM25 and
    // exact phrase. Exact integer ranks; q276 serves the same query from
    // the STORED positional artifact against the subset oracle.
    "q275_prox_search" -> ((s, dir) => {
      val docs = graft.operators.Parallelism.ensure(Tables.documents(s, dir))
      TextAnalysis.minCoverSpans(
          TextAnalysis.invertedIndexPositional(docs, "doc_id", "text"),
          "doc_id", Seq("order", "fast", "scan"))
        .select(col("doc_id").as("id"), col("min_span"), col("n_occs"))
        .orderBy("min_span", "id")
        .limit(20)
    }),

    // Encode-time usage census of the q268 unigram-LM vocabulary: train,
    // then Viterbi-segment every distinct word under the FINAL pieces —
    // per piece, distinct words using it and freq-weighted uses. The
    // oracle replays the whole training chain PLUS one more generated DP
    // pass under the pruned vocabulary.
    "q273_unigram_encode" -> ((s, dir) => {
      graft.operators.UnigramLm.encodeStats(
          graft.operators.Parallelism.ensure(Tables.documents(s, dir)),
          "text", vocabTarget = 64, emRounds = 2, seedMultiplier = 4,
          maxPieceLen = 8, maxWordLen = 16)
        .orderBy("piece")
    }),

    // WordPiece training: the q129 merge loop with LIKELIHOOD selection
    // — each round fuses the pair maximizing n/(ca·cb) instead of raw n,
    // so rare-but-always-together pairs (stems, suffixes) merge first.
    // The score is ONE division of exact frequency-weighted integers
    // (engine-exact, unrounded); ties break (a, b); the oracle replays
    // all 10 layers with MATERIALIZED CTEs (each layer is referenced by
    // three downstream frames — the q203 inlining rule).
    "q239_wordpiece" -> ((s, dir) => {
      import s.implicits._
      // merge picks commit through a fresh StageStore (the q129
      // convention — TrainResumeSpec pins kill-and-resume)
      TextAnalysis.wordPieceTrain(
          graft.operators.Parallelism.ensure(Tables.documents(s, dir)),
          "text", nMerges = 10,
          store = Some(new graft.core.StageStore(s,
            Scratch.dir("graft_q239"))))
        .zipWithIndex
        .map { case ((a, b, n, ca, cb, sc), i) =>
          (i + 1L, a, b, n, ca, cb, sc) }
        .toDF("rank", "a", "b", "n", "ca", "cb", "score")
        .orderBy("rank")
    }),

    // BYTE-level BPE training (the GPT-2 setup): raw \S+ pre-tokenization
    // (case and punctuation kept — the closed 256-byte alphabet needs no
    // normalization for coverage), symbols = UTF-8 bytes as uppercase hex
    // pairs, so ANY Unicode input segments with zero OOV by construction
    // (round-trip pinned by spec). Same merge loop, same exact-integer
    // determinism; the oracle replays all 10 layers over the hex-pair
    // symbolization.
    "q164_bpe_bytes" -> ((s, dir) => {
      import s.implicits._
      TextAnalysis.bpeTrain(
          graft.operators.Parallelism.ensure(Tables.documents(s, dir)),
          "text", nMerges = 10, byteLevel = true)
        .zipWithIndex
        .map { case ((a, b, n), i) => (i + 1L, a, b, n) }
        .toDF("rank", "a", "b", "n")
        .orderBy("rank")
    }),

    // The FULL Gopher repetition table (Rae et al. 2021 A1) as a gate:
    // top-{2,3,4}-gram and duplicated-{5..10}-gram character fractions
    // plus the line-level pair, all single divisions of exact integer
    // counts (no rounding anywhere — the q120 doctrine), thresholds the
    // paper's. The corpus has no newlines, so the line fractions are
    // exercised structurally here (always one line → 0.0) and
    // numerically by spec; the n-gram family carries the gate.
    // Round-11 A/B (RepBench, sf0.01 + sf0.1): the stateless per-row
    // formulation beats the grouped two-aggregation one 0.81–0.93× at
    // corpus grain (zero shuffle beats the count-table exchange at
    // normal doc lengths), so it is the batch default here; the gate
    // text is unchanged — both formulations hash-match it (q167 is the
    // standing stream ≡ batch proof).
    "q166_repetition" -> ((s, dir) => {
      TextAnalysis.repetitionStatsStateless(
          graft.operators.Parallelism.ensure(Tables.documents(s, dir)),
          "doc_id", "text")
        .orderBy("doc_id")
    }),

    // The ENCODER side of the tokenizer: train 10 merges, apply them to
    // the corpus, report per-source token counts + fertility (BPE tokens
    // per word — THE tokenizer-quality number). Scale shape: the corpus
    // collapses to (source, word) counts, the encoder runs ONCE per
    // distinct word (vocabulary-sized frame), and totals re-aggregate
    // the count table — the replace chain never touches corpus rows.
    "q130_bpe_encode" -> ((s, dir) => {
      val docs = graft.operators.Parallelism.ensure(Tables.documents(s, dir))
      val merges = TextAnalysis.bpeTrain(docs, "text", nMerges = 10)
        .map(m => (m._1, m._2))
      val wordCounts = docs
        .select(col("source"),
          explode(TextAnalysis.normalizedTokens(col("text"))).as("word"))
        .groupBy("source", "word").agg(count(lit(1)).as("cnt"))
      val vocab = wordCounts.select("word").distinct()
        .withColumn("n_sym",
          size(TextAnalysis.bpeSegment(col("word"), merges)).cast("long"))
      wordCounts.join(vocab, "word")
        .groupBy("source")
        .agg(sum("cnt").as("words"),
          sum(col("cnt") * col("n_sym")).as("bpe_tokens"))
        .withColumn("fertility",
          round(col("bpe_tokens").cast("double") / col("words"), 6))
        .select("source", "words", "bpe_tokens", "fertility")
        .orderBy("source")
    }),

    // BM25 sparse retrieval: rank the corpus for a 3-term query, one
    // corpus pass + a single-row stats broadcast, top-20 on the rounded
    // score. The sparse counterpart to the kNN/ANN dense path.
    "q136_bm25" -> ((s, dir) => {
      TextAnalysis.bm25(
        graft.operators.Parallelism.ensure(Tables.documents(s, dir)),
        "doc_id", "text", terms = Seq("vector", "data", "merge"),
        k1 = 1.2, b = 0.75, k = 20)
    }),

    // Ingest-time sentence screening: the corpus's distinct sentences
    // are a STORED artifact; an arriving batch (%7=3, ids +500000, one
    // fresh per-doc sentence appended) drops every sentence the corpus
    // owns and reassembles from the genuinely new ones. One left join
    // + ONE aggregation — the same body serves batch and stream.
    "q251_sentence_screen" -> ((s, dir) => {
      val docs = graft.operators.Parallelism.ensure(Tables.documents(s, dir))
      val knownPath = Scratch.dir("graft_q251") + "/sents"
      docs.select(explode(split(col("text"), "[.!?]+")).as("__s"))
        .select(trim(col("__s")).as("sent"))
        .filter(col("sent") =!= "").distinct()
        .write.mode("overwrite").parquet(knownPath)
      val stored = s.read.parquet(knownPath)
      val batch = docs.filter(col("doc_id") % 7 === 3)
        .select((col("doc_id") + 500000L).as("doc_id"),
          concat(col("text"), lit(". fresh "),
            (col("doc_id") + 500000L).cast("string")).as("text"))
      TextAnalysis.incomingSentenceScreen(stored, batch, "doc_id", "text")
        .orderBy("doc_id")
    }),

    // STREAMING twin of q251 (stream-static left join + one agg — the
    // operator body unchanged); gated on q251's oracle verbatim.
    "q252_stream_sentscreen" -> ((s, dir) => {
      graft.streaming.StreamingIngest.streamSentenceScreen(s, dir)
        .orderBy("doc_id")
    }),

    // Corpus-wide sentence dedup: every repeated sentence keeps only
    // its corpus-first occurrence ((min doc, min pos) exact order);
    // docs reassemble from kept sentences in original order (the
    // round-6 reassembly parity pattern). The boilerplate killer at
    // sentence grain.
    "q249_sentence_dedup" -> ((s, dir) => {
      TextAnalysis.sentenceDedup(
          graft.operators.Parallelism.ensure(Tables.documents(s, dir)),
          "doc_id", "text")
        .orderBy("doc_id")
    }),

    // Retrieve-then-rerank: BM25 top-20 shortlist crosses the batched
    // cross-encoder boundary (partition-local mapPartitions batches —
    // the multimodal extract-boundary shape for text); the stub score
    // is md5-derived over (query, doc, md5(text)) with an EXACT dyadic
    // /2^32, so the gate proves the text rode through the boundary and
    // the rank math is engine-exact.
    "q248_ce_rerank" -> ((s, dir) => {
      graft.operators.Rerank.rerankBm25(
        graft.operators.Parallelism.ensure(Tables.documents(s, dir)),
        "doc_id", "text", queryId = 1L, terms = Seq("vector", "data"),
        fbK = 20, k = 10)
    }),

    // TextRank extractive summary: per-doc weighted PageRank over the
    // sentence-Jaccard graph (exact-integer Jaccard, the q177 rounding
    // scheme per round), top sentence per doc with earliest-sentence
    // tie-break. The oracle replays the sentence split, the capped
    // pair enumeration, and five unrolled rounds.
    "q243_textrank" -> ((s, dir) => {
      TextAnalysis.textRankSummary(
          graft.operators.Parallelism.ensure(Tables.documents(s, dir)),
          "doc_id", "text")
        .orderBy("doc_id")
    }),

    // Pseudo-relevance-feedback expansion: BM25 top-10 on the original
    // terms feeds a per-term Σ tf/dl mining pass (each addend ONE exact
    // division, sum rounded, term-asc tie-break), and the top-5 mined
    // terms re-retrieve at weight 1/2 beside the originals at 1.0
    // through the join-based weighted BM25. The oracle replays all
    // three stages — the expansion terms are DATA-dependent, so the
    // final list pins them transitively.
    "q240_prf_expand" -> ((s, dir) => {
      TextAnalysis.prfExpandedBm25(
        graft.operators.Parallelism.ensure(Tables.documents(s, dir)),
        "doc_id", "text", terms = Seq("vector", "data"),
        fbK = 10, nExpand = 5, expWeight = 0.5, k = 20)
    }),

    // Exact phrase query over POSITIONAL postings: term-filtered
    // postings lists join on (doc, pos + i) — the documents are never
    // touched. The oracle recomputes occurrences from the token windows
    // directly (the shingle machinery), so a hash match proves the
    // positional-join formulation finds every occurrence and no ghosts.
    "q197_phrase_match" -> ((s, dir) => {
      val docs = graft.operators.Parallelism.ensure(Tables.documents(s, dir))
      TextAnalysis.phraseHits(
          TextAnalysis.invertedIndexPositional(docs, "doc_id", "text"),
          "doc_id", Seq("table", "hash"))
        .orderBy("doc_id")
    }),

    // BM25 over a STORED inverted index: postings + doc lengths build
    // once (the sparse sibling of stored PQ codes), the query touches
    // only its terms' postings. Same oracle text as q136 — the stored-
    // index path must land bit-identical scores to the corpus-rescan
    // path (per-doc tfs are exact integer pivots; the score expression
    // is copied operation-for-operation).
    "q193_bm25_index" -> ((s, dir) => {
      val docs = graft.operators.Parallelism.ensure(Tables.documents(s, dir))
      TextAnalysis.bm25FromIndex(
        TextAnalysis.invertedIndex(docs, "doc_id", "text"),
        TextAnalysis.docLengths(docs, "doc_id", "text"),
        "doc_id", terms = Seq("vector", "data", "merge"),
        k1 = 1.2, b = 0.75, k = 20)
    }),

    // Hybrid retrieval: BM25 top-20 and dense cosine top-20 (query =
    // embedding 0, vec_id ≡ doc_id) fused by reciprocal rank — no score
    // calibration, ranks only, both cut on ROUNDED scores before
    // ranking. n_lists shows which hits both systems agree on.
    "q137_hybrid_rrf" -> ((s, dir) => {
      val w20 = org.apache.spark.sql.expressions.Window
        .orderBy(desc("bm25"), col("doc_id"))
      val sparse = TextAnalysis.bm25(
          graft.operators.Parallelism.ensure(Tables.documents(s, dir)),
          "doc_id", "text", terms = Seq("vector", "data", "merge"), k = 20)
        .withColumn("rank", row_number().over(w20).cast("long"))
        .select("doc_id", "rank")
      val e = Tables.embeddings(s, dir)
      val qv = e.filter(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0).toArray
      val wd = org.apache.spark.sql.expressions.Window
        .orderBy(desc("cs"), col("doc_id"))
      val dense = e.filter(col("vec_id") =!= 0)
        .select(col("vec_id").as("doc_id"),
          round(graft.functions.cosine_sim(col("embedding"), lit(qv)), 6)
            .as("cs"))
        .orderBy(desc("cs"), col("doc_id")).limit(20)
        .withColumn("rank", row_number().over(wd).cast("long"))
        .select("doc_id", "rank")
      SimilaritySearch.rrfFuse(Seq(sparse, dense), "doc_id",
          kRrf = 60, k = 10)
        .orderBy(desc("rrf"), col("doc_id"))
    }),

    // Per-doc token entropy — the lexical-diversity quality signal
    // (spam/keyword-stuffed pages score low, natural prose high).
    // H = ln n − (Σ c·ln c)/n: the −Σ p·ln p identity rearranged into a
    // single-pass form (one (doc, token) count, one per-doc agg) that
    // engines mirror exactly; ranking-grade rounding as always.
    "q105_token_entropy" -> ((s, dir) => {
      val toks = graft.operators.Parallelism.ensure(Tables.documents(s, dir))
        .select(col("doc_id"),
          explode(TextAnalysis.normalizedTokens(col("text"))).as("token"))
      toks.groupBy("doc_id", "token").agg(count(lit(1)).as("__c"))
        .groupBy("doc_id")
        .agg(sum("__c").cast("long").as("n_tokens"),
          count(lit(1)).cast("long").as("n_distinct"),
          sum(col("__c") * log(col("__c"))).as("__sclogc"))
        .withColumn("entropy", round(
          log(col("n_tokens")) - col("__sclogc") / col("n_tokens") +
            lit(1e-9), 6))
        .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
          col("entropy"))
        .orderBy("doc_id")
    }),

    // Token budget accounting per source: whitespace tokens + BPE-ish
    // subword pieces + characters.
    "q37_token_count" -> ((s, dir) => {
      Tables.documents(s, dir)
        .groupBy("source")
        .agg(
          sum(TextAnalysis.tokenCount(col("text"))).as("sum_tokens"),
          sum(TextAnalysis.subwordCount(col("text"))).as("sum_subwords"),
          sum(length(col("text"))).as("sum_chars"))
        .orderBy("source")
    }),

    // Content fingerprints: normalized-md5 per doc (first 100 docs keeps the
    // output small while still exercising the normalization chain).
    "q38_fingerprint" -> ((s, dir) => {
      Tables.documents(s, dir)
        .filter(col("doc_id") < 100)
        .select(col("doc_id"),
          TextAnalysis.fingerprint(col("text")).as("fingerprint"))
        .orderBy("doc_id")
    }),

    // Heuristic language-ID (signature-token voting, earliest-max
    // tie-break) vs the labeled lang column. The token array
    // materializes in its own projection first: the argmax references
    // it once per profile, and HOF lambdas get no subexpression
    // elimination (the round-4 rule) — inlining langId(text) here paid
    // 5× the tokenization per row.
    "q39_lang_id" -> ((s, dir) => {
      graft.operators.Parallelism.ensure(Tables.documents(s, dir))
        .select(col("doc_id"), col("lang"),
          regexp_extract_all(lower(col("text")), lit("\\S+"), lit(0))
            .as("__toks"))
        .select(col("doc_id"), col("lang"),
          TextAnalysis.langIdFromToks(col("__toks")).as("predicted"))
        .orderBy("doc_id")
    }),

    // Sequence packing: docs → 512-token training bins, packed per source
    // (the window parallelizes across sources), summarized per bin. The
    // assignment rule is a pure running-sum function, so the oracle
    // recomputes it exactly.
    "q76_pack_bins" -> ((s, dir) => {
      TextAnalysis.packBins(Tables.documents(s, dir), "doc_id", "text",
          budget = 512L, partitionCol = "source")
        .groupBy("source", "bin")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("bin_tokens"))
        .orderBy("source", "bin")
    })
  )

  // ---- training-data pipeline compositions ------------------------------

  val pipelineQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Web-ingest capstone for the round-6-tail operators, chained the
    // way a crawl-ingest pipeline runs: URL-level dedup on the
    // CANONICALIZED url (q146's synthetic variants — so byte-distinct
    // URL forms of the same page collapse first), then exact-content
    // dedup on the Unicode-canonical ACCENT-FOLDED fingerprint (each
    // doc's text carries a synthetic diacritic suffix by md5 class —
    // q149's variants — so byte-distinct encodings of the same content
    // merge only because the fold chain ran). The oracle recomputes the
    // whole chain; a hash match proves the three normalizers COMPOSE.
    // (The ~50-value canon keyspace is a synthetic-data artifact — real
    // crawls have high-cardinality canonical URLs, where the min-window
    // is q89's proven exact-dedup shape.)
    "q150_web_ingest" -> ((s, dir) => {
      val wUrl = org.apache.spark.sql.expressions.Window.partitionBy("canon")
      val wFp = org.apache.spark.sql.expressions.Window.partitionBy("fp")
      Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), col("text"),
          graft.operators.UrlOps.canonicalizeUrl(syntheticUrl).as("canon"),
          concat(col("text"), lit(" "), accentSuffix).as("aug"))
        .withColumn("keep", min("doc_id").over(wUrl))
        .filter(col("doc_id") === col("keep"))
        .withColumn("fp", md5(graft.functions.strip_accents(
          graft.functions.nfc_normalize(col("aug")))))
        .withColumn("keep2", min("doc_id").over(wFp))
        .filter(col("doc_id") === col("keep2"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"),
          sum(length(col("text"))).as("n_chars"))
        .orderBy("source")
    }),

    // Deterministic train/val/test split: the split is a pure function of
    // the content fingerprint (md5), so it is reproducible across runs,
    // engines, and cluster sizes — the property a training pipeline needs
    // (no sampleBy/random(), which would be seed- and partitioning-bound).
    "q60_dataset_split" -> ((s, dir) => {
      val bucket = conv(substring(md5(concat(lit("split:"), col("doc_id").cast("string"))), 1, 4), 16, 10)
        .cast("long") % 10
      Tables.documents(s, dir)
        .withColumn("split",
          when(bucket < 8, "train").when(bucket < 9, "val").otherwise("test"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text"))).as("n_chars"))
        .orderBy("split")
    }),

    // The flagship curation pipeline: language filter → quality floor →
    // exact-content dedup (keep the smallest doc_id per normalized
    // fingerprint) → per-source yield accounting. Every stage is an
    // operator from this library; the oracle recomputes the whole chain.
    "q61_curation" -> ((s, dir) => {
      val docs = graft.operators.Parallelism.ensure(Tables.documents(s, dir))
        .withColumn("__punct", TextAnalysis.punctRatio(col("text")))
        .withColumn("__stop", TextAnalysis.stopwordRatio(col("text")))
        .withColumn("__q", TextAnalysis.qualityScoreFrom(col("text"), col("__punct"), col("__stop")))
        .filter(col("lang") === "en" && col("__q") > 0.3)
        .withColumn("__fp", TextAnalysis.fingerprint(col("text")))
      // keep-min-per-fingerprint via a window, not groupBy + semi-join:
      // the join formulation would recompute the whole regex/score lineage
      // once per join side; the window is one shuffle on fp, single pass
      docs
        .withColumn("__keep", min("doc_id").over(
          org.apache.spark.sql.expressions.Window.partitionBy("__fp")))
        .filter(col("doc_id") === col("__keep"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"),
          sum(length(col("text"))).as("n_chars"))
        .orderBy("source")
    }),

    // Mixture sampling: a deterministic per-source sample (top-5 docs by
    // md5 order — a seedless, engine-reproducible "random" draw) for
    // balanced training mixtures.
    "q62_mixture_sample" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source")
        .orderBy(md5(concat(lit("mix:"), col("doc_id").cast("string"))), col("doc_id"))
      Tables.documents(s, dir)
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 5)
        .select(col("source"), col("rn"), col("doc_id"))
        .orderBy("source", "rn")
    }),

    // THE composed training-data pipeline — every stage is an operator
    // from this library, chained the way a production corpus build runs:
    // quality curation (language + score floor) → exact-content dedup
    // (keep min doc_id per fingerprint) → eval-set decontamination (drop
    // flagged docs via anti-join) → deterministic shard export audit.
    // The oracle recomputes the whole chain, so a hash match proves the
    // stages COMPOSE exactly, not just work in isolation.
    "q89_training_pipeline" -> ((s, dir) => {
      import graft.operators.{Dedup, TrainExport}
      val docs = graft.operators.Parallelism.ensure(Tables.documents(s, dir))
        .withColumn("__punct", TextAnalysis.punctRatio(col("text")))
        .withColumn("__stop", TextAnalysis.stopwordRatio(col("text")))
        .withColumn("__q", TextAnalysis.qualityScoreFrom(
          col("text"), col("__punct"), col("__stop")))
        .filter(col("lang") === "en" && col("__q") > 0.3)
        .withColumn("__fp", TextAnalysis.fingerprint(col("text")))
      val kept = docs
        .withColumn("__keep", min("doc_id").over(
          org.apache.spark.sql.expressions.Window.partitionBy("__fp")))
        .filter(col("doc_id") === col("__keep"))
      val evalSet = Tables.documents(s, dir).filter(col("doc_id") % 97 === 0)
      val contaminated = Dedup.decontaminate(kept, evalSet, "doc_id", "text",
          shingleN = 5, minShared = 2)
        .select("doc_id").distinct()
      val clean = kept.join(contaminated, Seq("doc_id"), "left_anti")
      TrainExport.shardAudit(clean, "doc_id", "text", nShards = 8)
    }),

    // Deterministic global shuffle + shard export audit: shard and
    // within-shard order are pure functions of (doc_id, seed), so the
    // oracle recomputes the exact permutation — a hash match pins the
    // whole training-data layout, not just the counts.
    "q82_shard_export" -> ((s, dir) => {
      graft.operators.TrainExport.shardAudit(
        Tables.documents(s, dir), "doc_id", "text", nShards = 16)
    }),

    // Sliding-window chunking (context-length segmentation): 40-token
    // windows advancing by 30 (10-token overlap), tail kept. The oracle
    // recomputes every chunk boundary in exact integer math and every
    // chunk's content signature — a hash match pins the full segmentation,
    // not just chunk counts. chunk text itself stays out of the gate
    // output (the md5 signature carries it) to keep the compare payload
    // bounded.
    "q96_chunking" -> ((s, dir) => {
      TextAnalysis.chunkDocuments(
          graft.operators.Parallelism.ensure(Tables.documents(s, dir)),
          "doc_id", "text", chunkSize = 40, stride = 30)
        .select(col("doc_id"), col("chunk_id"), col("n_tokens"),
          col("chunk_sig"))
        .orderBy("doc_id", "chunk_id")
    }),

    // TF-IDF top terms: document frequency over the FULL corpus, term
    // frequency for a bounded report set (doc_id < 100), smooth idf
    // ln((N+1)/(df+1)) + 1, top-3 terms per doc. Scale shape: the
    // vocabulary-sized df table streams; the report set is the broadcast
    // side; ranking windows only over report-set candidates.
    "q97_tfidf" -> ((s, dir) => {
      val docs = graft.operators.Parallelism.ensure(Tables.documents(s, dir))
      val toks = docs.select(col("doc_id"),
        explode(TextAnalysis.normalizedTokens(col("text"))).as("token"))
      val dfreq = toks.groupBy("token")
        .agg(countDistinct(col("doc_id")).as("df"))
      val nDocs = docs.agg(count(lit(1)).cast("double").as("__n_docs"))
      val tf = toks.filter(col("doc_id") < 100)
        .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(desc("tfidf"), col("token"))
      dfreq.join(broadcast(tf), Seq("token"))
        .crossJoin(broadcast(nDocs))
        .withColumn("tfidf", round(col("tf") *
          (log((col("__n_docs") + 1.0) / (col("df") + 1.0)) + 1.0) +
          lit(1e-9), 6))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("rank"), col("token"), col("tf"),
          col("df"), col("tfidf"))
        .orderBy("doc_id", "rank")
    }),

    // Proportional stratified sample: keep ceil(n/5) of every
    // (source, lang) stratum by md5 order — exact rational keep count
    // (never ceil on a double), full kept set pinned by the gate.
    "q101_stratified" -> ((s, dir) => {
      graft.operators.TrainExport.stratifiedSample(
          Tables.documents(s, dir), "doc_id", Seq("source", "lang"),
          keepNumer = 1, keepDenom = 5)
        .select(col("source"), col("lang"), col("rn"), col("doc_id"))
        .orderBy("source", "lang", "rn")
    }),

    // Pairwise source-overlap matrix: 5-gram shingle Jaccard between
    // every source pair — the corpus diagnostic that finds mirrored /
    // re-scraped sources before dedup spends compute on them. The join
    // key fans out to at most |sources|² pairs per shingle (a bounded
    // catalog, not a data-scale key — no cap needed), and the two join
    // sides share one physical exchange (identical distinct subtrees).
    "q125_source_overlap" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val ss = graft.operators.Dedup
        .explodeShingles(docs, "source", "text", 5).distinct()
      val tot = ss.groupBy("source").agg(count(lit(1)).as("n"))
      val pairs = ss.select(col("shingle"), col("source").as("src_a"))
        .join(ss.select(col("shingle"), col("source").as("src_b")),
          Seq("shingle"))
        .filter(col("src_a") < col("src_b"))
        .groupBy("src_a", "src_b").agg(count(lit(1)).as("n_shared"))
      pairs
        .join(tot.select(col("source").as("src_a"), col("n").as("n_a")),
          Seq("src_a"))
        .join(tot.select(col("source").as("src_b"), col("n").as("n_b")),
          Seq("src_b"))
        .select(col("src_a"), col("src_b"), col("n_shared"),
          round(col("n_shared").cast("double") /
            (col("n_a") + col("n_b") - col("n_shared")) + lit(1e-9), 6)
            .as("jaccard"))
        .orderBy("src_a", "src_b")
    }),

    // Temperature-sampled mixture at α = 0.5: keep ceil(√n) docs per
    // source by md5 order — the multilingual temperature-sampling scheme
    // (upweight small sources relative to proportional sampling). α is
    // FIXED at 1/2 because IEEE sqrt is correctly rounded in every
    // engine; an arbitrary pow(n, α) is not, and an off-by-one keep
    // count at a representation boundary is exactly the divergence class
    // the gate hunts (the q101 exact-integer lesson, transposed).
    // Skew-proof rank: md5RankChunked partitions the per-row sort by
    // (source, md5-prefix chunk) — the dominant source of a real corpus
    // never serializes one reducer (the q67 chunked doctrine).
    "q122_temperature" -> ((s, dir) => {
      graft.operators.TrainExport.md5RankChunked(
          Tables.documents(s, dir), "doc_id", Seq("source"), seed = "temp")
        .filter(col("rn") <= ceil(sqrt(col("__n").cast("double"))))
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"), max("__n").cast("long").as("n_total"))
        .orderBy("source")
    }),

    // The round-5 composed corpus build — quality filter (Gopher rules) →
    // exact-content dedup (keep min doc_id per fingerprint) → sliding
    // chunking → token-budget packing per source. Every stage is a
    // round-5-or-earlier operator; the oracle recomputes the WHOLE chain,
    // proving the new stages COMPOSE exactly (the q89 doctrine).
    "q121_corpus_build" -> ((s, dir) => {
      val docs = graft.operators.Parallelism.ensure(Tables.documents(s, dir))
      val kept = TextAnalysis.gopherQuality(docs, "doc_id", "text")
        .filter(col("keep")).select("doc_id")
        .join(docs, Seq("doc_id"))
        .withColumn("__fp", TextAnalysis.fingerprint(col("text")))
        .withColumn("__keep_id", min("doc_id").over(
          org.apache.spark.sql.expressions.Window.partitionBy("__fp")))
        .filter(col("doc_id") === col("__keep_id"))
      val chunks = TextAnalysis.chunkDocuments(kept, "doc_id", "text",
          chunkSize = 40, stride = 30)
        // a packable unique id in (doc, chunk) order; uid arithmetic
        // collides silently at >= 1000 chunks/doc, so fail loudly there
        // (the RangeJoin explode-cap doctrine)
        .withColumn("uid", col("doc_id") * 1000 +
          when(col("chunk_id") >= 1000, raise_error(concat(
              lit("q121: doc_id "), col("doc_id").cast("string"),
              lit(" produced >= 1000 chunks — uid packing would collide"))))
            .otherwise(col("chunk_id")))
        .join(docs.select("doc_id", "source"), Seq("doc_id"))
      TextAnalysis.packBins(chunks, "uid", "chunk",
          budget = 512L, partitionCol = "source")
        .groupBy("source", "bin")
        .agg(count(lit(1)).as("n_chunks"), sum("n_tokens").as("bin_tokens"))
        .orderBy("source", "bin")
    }),

    // Round-6 capstone compose: corpus-wide repeated-span removal →
    // chunk the CLEANED text → token-budget packing per source — the
    // boilerplate actually disappears from the packed training corpus,
    // and the oracle recomputes the entire chain (dedup reassembly
    // included) to pin every bin.
    "q139_dedup_pack" -> ((s, dir) => {
      val docs = graft.operators.Parallelism.ensure(Tables.documents(s, dir))
      val cleaned = graft.operators.Dedup
        .spanDedup(docs, "doc_id", "text", spanSize = 20, maxFreq = 1)
        .select("doc_id", "text")
        .join(docs.select("doc_id", "source"), Seq("doc_id"))
      val chunks = TextAnalysis.chunkDocuments(cleaned, "doc_id", "text",
          chunkSize = 40, stride = 30)
        .withColumn("uid", col("doc_id") * 1000 +
          when(col("chunk_id") >= 1000, raise_error(concat(
              lit("q139: doc_id "), col("doc_id").cast("string"),
              lit(" produced >= 1000 chunks — uid packing would collide"))))
            .otherwise(col("chunk_id")))
        .join(cleaned.select("doc_id", "source"), Seq("doc_id"))
      TextAnalysis.packBins(chunks, "uid", "chunk",
          budget = 512L, partitionCol = "source")
        .groupBy("source", "bin")
        .agg(count(lit(1)).as("n_chunks"), sum("n_tokens").as("bin_tokens"))
        .orderBy("source", "bin")
    }),

    // TOKENIZER-GRAIN packing — the round-9 capstone closing the gap the
    // verdict carried three rounds: q121/q139 pack by whitespace words,
    // but a real data loader budgets bins by the TRAINED tokenizer's
    // token count. Chain: train 10 BPE merges on the corpus → encode each
    // distinct word once (vocabulary-sized frame, the q130 shape) → sum
    // BPE tokens per document → greedy per-source packing on that count.
    // The oracle replays training, encoding, the per-doc roll-up, and the
    // packing window end to end.
    "q163_bpe_pack" -> ((s, dir) => {
      val docs = graft.operators.Parallelism.ensure(Tables.documents(s, dir))
      val merges = TextAnalysis.bpeTrain(docs, "text", nMerges = 10)
        .map(m => (m._1, m._2))
      val wc = docs
        .select(col("doc_id"),
          explode(TextAnalysis.normalizedTokens(col("text"))).as("word"))
        .groupBy("doc_id", "word").agg(count(lit(1)).as("cnt"))
      val vocab = wc.select("word").distinct()
        .withColumn("n_sym",
          size(TextAnalysis.bpeSegment(col("word"), merges)).cast("long"))
      val perDoc = wc.join(vocab, "word")
        .groupBy("doc_id")
        .agg(sum(col("cnt") * col("n_sym")).as("bpe_tokens"))
      // token-less docs pack too (0-cost rows) — left join + coalesce
      val base = docs.select("doc_id", "source")
        .join(perDoc, Seq("doc_id"), "left")
        .withColumn("bpe_tokens", coalesce(col("bpe_tokens"), lit(0L)))
      TextAnalysis.packBinsByCount(base, "doc_id", "bpe_tokens",
          budget = 2000L, partitionCol = "source")
        .groupBy("source", "bin")
        .agg(count(lit(1)).as("n_docs"), sum("bpe_tokens").as("bin_tokens"))
        .orderBy("source", "bin")
    }),

    // Gopher rule-based quality flags: the published filter bundle with
    // per-rule booleans + the keep conjunction — pipelines tune on the
    // per-rule breakdown, not just the verdict.
    "q120_gopher_rules" -> ((s, dir) => {
      TextAnalysis.gopherQuality(
          graft.operators.Parallelism.ensure(Tables.documents(s, dir)),
          "doc_id", "text")
        .orderBy("doc_id")
    }),

    // Partial-overlap pairs via shared winnowing fingerprints — the
    // cross-document face of q90 (MOSS-style): any shared substring of
    // length ≥ k+w−1 guarantees a shared fingerprint, so fingerprint
    // co-occurrence finds partial plagiarism/quotation that whole-doc
    // and shingle dedup miss. Hot fingerprints (boilerplate 8-grams)
    // capped on the fingerprint-frequency table BEFORE the self-join —
    // the candidatePairs discipline; top-100 cut bounds the report.
    "q119_winnow_pairs" -> ((s, dir) => {
      // ONE pass over the (expensive) winnowing compute: fingerprint
      // buckets aggregate their doc ids into a bounded sorted buffer
      // (cap 50, oversize buckets dropped whole — the candidatePairs
      // discipline), pairs explode from each bucket's array. A fps
      // self-join would recompute the per-doc window minima once per
      // branch — 4× the dominant cost.
      // explode_outer, NOT explode: InferFiltersFromGenerate turns a
      // plain explode into a `size(input) > 0` predicate that pushdown
      // re-plants at the SCAN with the whole fingerprint chain inlined —
      // and inside that inlined copy the winnow lambda re-evaluates the
      // gram-hash array per window: O(n²) md5s per doc in a filter
      // (measured 10×+ the whole query's cost). The outer explode infers
      // nothing; empty docs surface one null row dropped by a cheap
      // post-explode filter on the generated column.
      val fps = graft.operators.Parallelism.ensure(Tables.documents(s, dir))
        .withColumn("__h", TextAnalysis.kgramHashes(col("text"), 8))
        .withColumn("__fps", TextAnalysis.winnowFromHashes(col("__h"), 4))
        .select(col("doc_id"), explode_outer(col("__fps")).as("fp"))
        .filter(col("fp").isNotNull)
      val bounded = org.apache.spark.sql.functions.udaf(
        new graft.operators.BoundedDistinctSetAgg(51))
      val buckets = fps.groupBy("fp")
        .agg(bounded(col("doc_id")).as("ids"))
        .filter(size(col("ids")) >= 2 && size(col("ids")) <= 50)
      buckets
        .select(explode(flatten(transform(col("ids"), (x, i) =>
          transform(slice(col("ids"), i + lit(2), size(col("ids"))),
            y => struct(x.as("a_id"), y.as("b_id")))))).as("p"))
        .groupBy(col("p.a_id").as("a_id"), col("p.b_id").as("b_id"))
        .agg(count(lit(1)).as("n_shared_fp"))
        .filter(col("n_shared_fp") >= 3)
        .orderBy(desc("n_shared_fp"), col("a_id"), col("b_id"))
        .limit(100)
    }),

    // Collocation mining (the word2vec "phrases" pass): top-20 adjacent
    // pairs by PMI with min-count support — phrase-detection prep for
    // tokenizer/embedding training.
    "q118_collocations" -> ((s, dir) => {
      graft.operators.NgramLm.collocations(
          graft.operators.Parallelism.ensure(Tables.documents(s, dir)),
          "doc_id", "text", minCount = 5)
        .orderBy(desc("pmi"), col("w1"), col("w2"))
        .limit(20)
        .select(col("w1"), col("w2"), col("c2"), col("pmi"))
    }),

    // Deterministic word-dropout augmentation: ~10% of tokens dropped by
    // md5(doc, position) — reproducible across reruns/retries, the gate
    // pins every augmented document's exact content via md5 signature.
    "q117_augment" -> ((s, dir) => {
      graft.operators.Parallelism.ensure(Tables.documents(s, dir))
        .select(col("doc_id"),
          regexp_extract_all(col("text"), lit("\\S+"), lit(0)).as("__toks"))
        .withColumn("__kept",
          TextAnalysis.wordDropout(col("__toks"), col("doc_id"), 10))
        .select(col("doc_id"),
          size(col("__toks")).cast("long").as("n_orig"),
          size(col("__kept")).cast("long").as("n_kept"),
          md5(array_join(col("__kept"), " ")).as("aug_sig"))
        .orderBy("doc_id")
    }),

    // Weighted sampling without replacement (Efraimidis–Spirakis, md5
    // uniforms): 20 docs drawn proportional to length — the
    // quality/length-weighted mixture draw, retry-safe and
    // engine-replayable.
    "q115_weighted_sample" -> ((s, dir) => {
      graft.operators.TrainExport.weightedSample(
          Tables.documents(s, dir), "doc_id", "n_chars", n = 20)
        .select(col("doc_id"), col("n_chars"), col("skey"))
        .orderBy(desc("skey"), col("doc_id"))
    }),

    // Stupid-backoff bigram LM scoring (the CCNet perplexity-filter
    // analogue): counts trained on the q60 fingerprint train split, EVERY
    // doc scored — val/test docs genuinely hit unseen bigrams, so the
    // backoff path is exercised, not dead. The oracle recomputes counts,
    // backoff, and the mean log-prob per doc.
    "q100_lm_score" -> ((s, dir) => {
      val bucket = conv(substring(md5(concat(lit("split:"),
        col("doc_id").cast("string"))), 1, 4), 16, 10).cast("long") % 10
      graft.operators.NgramLm.lmScores(
          graft.operators.Parallelism.ensure(Tables.documents(s, dir)),
          "doc_id", "text", isTrain = bucket < 8)
        .select(col("doc_id"), col("n_bigrams"),
          round(col("raw_lp") + lit(1e-9), 6).as("lp"))
        .orderBy("doc_id")
    }),

    // Katz back-off LM scoring with Good-Turing discounts (the second
    // smoothing family beside q100's stupid backoff): seen-bigram mass
    // discounted by the Turing estimate over the bigram count spectrum,
    // leftover redistributed per history over a half-smoothed unigram.
    "q229_katz_lm" -> ((s, dir) => {
      val bucket = conv(substring(md5(concat(lit("split:"),
        col("doc_id").cast("string"))), 1, 4), 16, 10).cast("long") % 10
      graft.operators.NgramLm.katzScores(
          graft.operators.Parallelism.ensure(Tables.documents(s, dir)),
          "doc_id", "text", isTrain = bucket < 8)
        .select(col("doc_id"), col("n_bigrams"),
          round(col("raw_kp") + lit(1e-9), 6).as("kp"))
        .orderBy("doc_id")
    }),

    // Interpolated Kneser–Ney scoring (the third smoothing family):
    // absolute discount D from the bigram spectrum's leave-one-out
    // estimate, freed mass interpolated with the half-smoothed
    // CONTINUATION unigram (distinct-history counts, not frequency).
    "q232_kneser_ney" -> ((s, dir) => {
      val bucket = conv(substring(md5(concat(lit("split:"),
        col("doc_id").cast("string"))), 1, 4), 16, 10).cast("long") % 10
      graft.operators.NgramLm.knScores(
          graft.operators.Parallelism.ensure(Tables.documents(s, dir)),
          "doc_id", "text", isTrain = bucket < 8)
        .select(col("doc_id"), col("n_bigrams"),
          round(col("raw_knp") + lit(1e-9), 6).as("knp"))
        .orderBy("doc_id")
    }),

    // CCNet's perplexity buckets (Wenzek et al. 2020): rank every scored
    // doc per source by its LM score and cut head/middle/tail at exact
    // integer thirds (rn·3 ≤ n / rn·3 ≤ 2n — never a double fraction).
    // Ranking is on the ROUNDED lp with a doc_id tie-break (ulps must
    // not decide a bucket boundary) via the de-skewed chunked rank — no
    // global window. Docs under 2 tokens score nothing and drop out,
    // as in lmScores.
    "q233_ppl_buckets" -> ((s, dir) => {
      val bucket = conv(substring(md5(concat(lit("split:"),
        col("doc_id").cast("string"))), 1, 4), 16, 10).cast("long") % 10
      val docs = graft.operators.Parallelism.ensure(Tables.documents(s, dir))
      val scored = graft.operators.NgramLm.lmScores(
          docs, "doc_id", "text", isTrain = bucket < 8)
        .select(col("doc_id"), round(col("raw_lp") + lit(1e-9), 6).as("lp"))
        .join(docs.select("doc_id", "source"), Seq("doc_id"))
      graft.operators.TrainExport
        .scoreRankChunked(scored, "doc_id", "lp", Seq("source"))
        .select(col("doc_id"), col("source"), col("lp"),
          when(col("rn") * 3 <= col("__n"), lit("head"))
            .when(col("rn") * 3 <= col("__n") * 2, lit("middle"))
            .otherwise(lit("tail")).as("ppl_bucket"))
        .orderBy("doc_id")
    }),

    // Readability scoring: Flesch Reading Ease + Flesch–Kincaid grade
    // over pinned engine-replayable word/sentence/syllable heuristics —
    // integer totals, single divisions, fixed-order linear forms with
    // literal coefficients on both sides (never pre-folded).
    "q235_readability" -> ((s, dir) => {
      graft.operators.TextAnalysis.readability(
          graft.operators.Parallelism.ensure(Tables.documents(s, dir)),
          "doc_id", "text")
        .select(col("doc_id"), col("n_words"), col("n_sents"), col("n_syll"),
          round(col("fk_grade") + lit(1e-9), 6).as("fk_grade"),
          round(col("reading_ease") + lit(1e-9), 6).as("reading_ease"))
        .orderBy("doc_id")
    }),

    // Passage retrieval with document max-pooling: the q96 sliding
    // chunks become the retrieval corpus (pid = doc·10000 + chunk),
    // join-based BM25 scores EVERY matching passage (the un-cut
    // bm25WeightedScores — a shortlist would lose the pooling rows),
    // each doc takes its best passage (rounded score, earliest-chunk
    // tie-break), top-10 docs — the RAG shape where long documents
    // match on their best window, not their diluted whole.
    "q260_passage_retrieval" -> ((s, dir) => {
      val chunks = TextAnalysis.chunkDocuments(
          graft.operators.Parallelism.ensure(Tables.documents(s, dir)),
          "doc_id", "text", chunkSize = 40, stride = 30)
        .select(col("doc_id"), col("chunk_id"), col("chunk"),
          (col("doc_id") * 10000L + col("chunk_id")).as("pid"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(desc("bm25"), col("chunk_id"))
      TextAnalysis.bm25WeightedScores(chunks, "pid", "chunk",
          Seq(("vector", 1.0), ("data", 1.0)))
        .join(chunks.select("pid", "doc_id", "chunk_id"), Seq("pid"))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("doc_id"), col("chunk_id").as("best_chunk"),
          col("bm25"))
        .orderBy(desc("bm25"), col("doc_id"))
        .limit(10)
    }),

    // STREAMING readability: the operator is a pure per-row projection
    // (no aggregation, no state) so the batch body runs UNCHANGED in
    // append mode; gated on q235's oracle verbatim.
    "q259_stream_readability" -> ((s, dir) => {
      graft.streaming.StreamingIngest.streamReadability(s, dir)
        .orderBy("doc_id")
    }),

    // STREAMING blocklist scrub: the per-phrase hit counts are per-row
    // column math over the doc's own tokens, so q271's body runs
    // UNCHANGED on the stream (append, no state) — gated on q271's
    // oracle verbatim.
    "q274_stream_blocklist" -> ((s, dir) => {
      graft.streaming.StreamingIngest.streamBlocklistScrub(s, dir,
          blocklistPhrases, queryName = Scratch.name("stream_blk"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"),
          sum(length(col("text"))).as("n_chars"))
        .orderBy("source")
    }),

    // STREAMING MATTR: the sliding-window distinct counts are per-row
    // column math over the doc's own tokens, so q283's body runs
    // UNCHANGED on the stream (append, no state) — gated on q283's
    // oracle verbatim.
    "q284_stream_mattr" -> ((s, dir) => {
      graft.streaming.StreamingIngest.streamMattr(s, dir,
          queryName = Scratch.name("stream_mattr"))
        .orderBy("doc_id")
    }),

    // STREAMING FIM transform: coin, cut points, and PSM reassembly are
    // per-row md5/substr math, so q285's body runs UNCHANGED on the
    // stream (append, no state) — gated on q285's oracle verbatim.
    "q286_stream_fim" -> ((s, dir) => {
      graft.streaming.StreamingIngest.streamFim(s, dir,
          queryName = Scratch.name("stream_fim"))
        .orderBy("doc_id")
    }),


    // Count-pruned LM scoring (q100 with minCount=2): the production
    // deviation the NgramLm docs describe — KenLM-style support pruning —
    // made gate-checkable instead of prose. The pruned model is
    // self-consistent (ctx/cont/total re-derive from the PRUNED table), so
    // singleton bigrams score through backoff exactly like unseen ones;
    // the oracle mirrors the prune as one HAVING clause.
    "q140_lm_pruned" -> ((s, dir) => {
      val bucket = conv(substring(md5(concat(lit("split:"),
        col("doc_id").cast("string"))), 1, 4), 16, 10).cast("long") % 10
      graft.operators.NgramLm.lmScores(
          graft.operators.Parallelism.ensure(Tables.documents(s, dir)),
          "doc_id", "text", isTrain = bucket < 8, minCount = 2)
        .select(col("doc_id"), col("n_bigrams"),
          round(col("raw_lp") + lit(1e-9), 6).as("lp"))
        .orderBy("doc_id")
    }),

    // Percentile quality cut — the selection policy the calibration
    // enables: keep each source's top fifth by quality, with the keep
    // count as EXACT integer math ((n+4) DIV 5, the q101 fractional-
    // count doctrine — never ceil(0.2·n) in doubles) over the de-skewed
    // chunked rank. Output pins the boundary: per source, how many
    // kept, the worst kept score, and the kept character mass.
    "q160_quality_cut" -> ((s, dir) => {
      val docs = graft.operators.Parallelism.ensure(Tables.documents(s, dir))
        .withColumn("__punct", TextAnalysis.punctRatio(col("text")))
        .withColumn("__stop", TextAnalysis.stopwordRatio(col("text")))
        .withColumn("q", round(TextAnalysis.qualityScoreFrom(
          col("text"), col("__punct"), col("__stop")) + lit(1e-9), 6))
      graft.operators.TrainExport
        .scoreRankChunked(docs, "doc_id", "q", Seq("source"))
        .filter(col("rn") * 5 <= col("__n") + 4)
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"),
          min(col("q")).as("q_floor"),
          sum(length(col("text"))).as("n_chars"))
        .orderBy("source")
    }),

    // Distribution drift per source: KL(source ‖ corpus) over the
    // corpus's top-100 tokens, add-one smoothed — every probability is
    // an exact-integer division, ln ulps land in the rounded sum, and
    // the vocabulary cut is (count desc, token asc) deterministic.
    "q157_source_kl" -> ((s, dir) => {
      graft.operators.Importance.sourceDivergence(
          graft.operators.Parallelism.ensure(Tables.documents(s, dir)),
          "text", "source")
        .orderBy("source")
    }),

    // Per-source OOV rate under the corpus top-1000 vocabulary (the
    // q157 cut convention — count desc, token asc): the coverage check
    // before freezing a tokenizer/embedding table. One exact division
    // per source, nothing rounded.
    "q265_oov_rates" -> ((s, dir) => {
      graft.operators.Importance.oovRates(
          graft.operators.Parallelism.ensure(Tables.documents(s, dir)),
          "source", "text", vocabSize = 1000)
        .orderBy("source")
    }),

    // EXACT per-source Spearman rank correlation over the same pair of
    // statistics as q254 — monotone association where Pearson asks
    // linear: tie-averaged ranks are exact half-integers, d² exact
    // quarters (order-independent sums), ρ one exact product + one
    // division. ZERO rounding.
    "q264_spearman" -> ((s, dir) => {
      graft.operators.Importance.spearmanByGroup(
        Tables.documents(s, dir).select(col("source"),
          size(TextAnalysis.normalizedTokens(col("text"))).as("n_tokens"),
          length(col("text")).as("n_chars")),
        "source", "n_tokens", "n_chars").orderBy("source")
    }),

    // EXACT per-source Pearson correlation between token count and
    // char length — the screening-signal redundancy check, all in
    // 64-bit integer sums with two correctly-rounded sqrts and one
    // division: ZERO rounding (the ksDrift exactness class).
    "q254_pearson" -> ((s, dir) => {
      graft.operators.Importance.pearsonByGroup(
        Tables.documents(s, dir).select(col("source"),
          size(TextAnalysis.normalizedTokens(col("text"))).as("n_tokens"),
          length(col("text")).as("n_chars")),
        "source", "n_tokens", "n_chars").orderBy("source")
    }),

    // Two-sample KS drift between every source pair over the per-doc
    // token count: max |ECDF_a − ECDF_b| at pooled distinct values.
    // ZERO rounding — counts exact, each ECDF one exact-integer
    // division, |·|/max order-independent (q157's KL asks "different
    // words?", this asks "differently shaped documents?").
    "q241_ks_drift" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.operators.Importance.ksDrift(
        docs.select(col("source"),
          size(TextAnalysis.normalizedTokens(col("text"))).cast("long")
            .as("n_tokens")),
        "source", "n_tokens")
    }),

    // Cross-source score calibration: per-source DESCENDING quality
    // rank via the chunked two-phase pattern (rank within (source,
    // score band), stitch with higher-band counts — no single-task-per-
    // source sort), percentile = (rn−1)/(n−1) as exact integer
    // division. The oracle ranks with a plain per-source window, so a
    // hash match proves the de-skewed formulation is EXACT.
    "q155_score_calibration" -> ((s, dir) => {
      val docs = graft.operators.Parallelism.ensure(Tables.documents(s, dir))
        .withColumn("__punct", TextAnalysis.punctRatio(col("text")))
        .withColumn("__stop", TextAnalysis.stopwordRatio(col("text")))
        .withColumn("q", round(TextAnalysis.qualityScoreFrom(
          col("text"), col("__punct"), col("__stop")) + lit(1e-9), 6))
      graft.operators.TrainExport
        .scoreRankChunked(docs, "doc_id", "q", Seq("source"))
        .withColumn("pct", when(col("__n") === 1L, lit(0.0))
          .otherwise((col("rn") - 1L).cast("double") / (col("__n") - 1L)))
        .select(col("doc_id"), col("source"), col("q"), col("rn"), col("pct"))
        .orderBy("doc_id")
    }),

    // DoReMi-style mixture weights: per-source excess loss under the
    // corpus-trained bigram LM → exp-weighted, normalized. Hard sources
    // upweight; every floating hand-off is a rounded q100 gate value,
    // so the oracle replays model, losses, and weights exactly.
    "q148_mixture_weights" -> ((s, dir) => {
      graft.operators.Importance.mixtureWeights(
          graft.operators.Parallelism.ensure(Tables.documents(s, dir)),
          "doc_id", "text", "source")
        .orderBy("source")
    }),

    // The DoReMi loop closed: q148's weights → Hamilton largest-remainder
    // quotas for a 200-doc budget → md5-rank fill within each source.
    // Budget 200 over 20×25-doc sources (sf≤0.01) makes heavy sources
    // overflow availability, exercising the honest-shortfall path
    // (n_selected < quota, never redistributed). Every float hand-off is
    // a rounded weight; quota math is floor/compare on identical doubles;
    // the fill is the md5 rank — the oracle replays all three stages.
    "q200_mixture_select" -> ((s, dir) => {
      val docs = graft.operators.Parallelism.ensure(Tables.documents(s, dir))
      val wts = graft.operators.Importance.mixtureWeights(
        docs, "doc_id", "text", "source")
      graft.operators.TrainExport.mixtureSelect(
          docs, "doc_id", "source", wts, n = 200, seed = "mix")
        .orderBy("source")
    }),

    // THE pretraining-export capstone at bench grain (round-12 verdict
    // item 7): the full curation → exact-dedup → span-dedup → mixture →
    // pack → shard chain in ONE query — every stage an operator whose
    // isolated gate already passes (q61, q131, q200, q139, q82), chained
    // the way a production corpus build runs, so this entry's time IS
    // "the pipeline number". Output: per (source, shard) bin/chunk/token
    // totals — the training-layout audit a data engineer ships.
    "q269_pretrain_capstone" -> ((s, dir) => {
      // The chain now rides PretrainPipeline (r13 verdict item 2): each
      // stage boundary — exactly where the one-query form eagerly
      // localCheckpointed — commits to a StageStore generation, so a
      // killed run resumes at stage grain (StageStoreSpec pins
      // kill-and-resume to the hash-identical output). The gate uses a
      // FRESH store per call: its time stays the honest full-pipeline
      // number (stage writes included — the boundaries a production
      // build persists anyway), never a cached-resume fast path.
      val store = new graft.core.StageStore(s, Scratch.dir("graft_q269"))
      graft.operators.PretrainPipeline.run(
        graft.operators.Parallelism.ensure(Tables.documents(s, dir)), store)
    }),

    // DSIR importance scoring: raw = the whole corpus, target = the
    // English slice, top-20 most target-like docs by hashed-unigram log
    // likelihood ratio. Ranking happens on the ROUNDED score (then doc_id)
    // so accumulation-order ulps can never reorder the cut.
    "q98_importance" -> ((s, dir) => {
      graft.operators.Importance.importanceScores(
          graft.operators.Parallelism.ensure(Tables.documents(s, dir)),
          "doc_id", "text", isTarget = col("lang") === "en", nBuckets = 256)
        .withColumn("score", round(col("raw_score") + lit(1e-9), 6))
        .orderBy(desc("score"), col("doc_id"))
        .limit(20)
        .select(col("doc_id"), col("n_tokens"), col("score"))
    })
  )

  /** The generated BPE-training CTE prefix shared by q129/q130: `v0` is
    * the wrapped word-frequency vocabulary; each layer `i` exposes the
    * round's best pair as `b$i` and the merged vocabulary as `v$i` —
    * DuckDB replays [[TextAnalysis.bpeTrain]]'s exact loop.
    */
  private def bpeLayersSql(nMerges: Int, byteLevel: Boolean = false): String = {
    val sb = new StringBuilder
    sb ++= (if (byteLevel)
      // byte-level: raw \S+ pre-tokenization (case/punctuation kept),
      // symbols = UTF-8 bytes as uppercase hex pairs — DuckDB's
      // hex(encode(...)) renders identically to Spark's hex(encode(...))
      """WITH v0 AS (
        |  SELECT CAST(count(*) AS BIGINT) AS freq,
        |    ' ' || array_to_string(regexp_extract_all(hex(encode(word)), '..'), '  ') || ' ' AS seg
        |  FROM (SELECT unnest(regexp_extract_all(text, '\S+')) AS word
        |        FROM documents)
        |  GROUP BY word)""".stripMargin
    else
      """WITH v0 AS (
        |  SELECT CAST(count(*) AS BIGINT) AS freq,
        |    ' ' || array_to_string(regexp_extract_all(word, '.'), '  ') || ' ' AS seg
        |  FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
        |        FROM documents)
        |  GROUP BY word)""".stripMargin)
    for (i <- 1 to nMerges) {
      sb ++= s""",
        |s$i AS (SELECT freq, str_split(trim(seg), '  ') AS l FROM v${i - 1}),
        |p$i AS (
        |  SELECT l[i] AS a, l[i+1] AS b, CAST(sum(freq) AS BIGINT) AS n
        |  FROM (SELECT freq, l, unnest(range(1, len(l))) AS i FROM s$i)
        |  GROUP BY a, b),
        |b$i AS (SELECT a, b, n FROM p$i ORDER BY n DESC, a, b LIMIT 1),
        |v$i AS (
        |  SELECT freq,
        |    replace(seg, ' '||b$i.a||'  '||b$i.b||' ', ' '||b$i.a||b$i.b||' ') AS seg
        |  FROM v${i - 1} CROSS JOIN b$i)""".stripMargin
    }
    sb.toString
  }

  /** The q145 NB prediction chain (split, train counts, label stats,
    * per-doc scores, argmax) through `rk` — shared by the confusion
    * gate (q145) and the metrics gate (q253).
    */
  /** The q243 TextRank oracle chain, parameterized on the output id
    * alias so the operator gate (doc_id) and the SUMMARIZE command
    * gate (id) share one generator.
    */
  private def textRankOracleSql(idOut: String): String = {
      val rounds = (1 to 5).map { k =>
        s"""r$k AS MATERIALIZED (
           |  SELECT s.doc_id, s.sidx,
           |    round((CAST(1 AS DOUBLE) - 0.85) / nn.n
           |      + 0.85 * coalesce(c.cs, 0) + 1e-15, 12) AS rank
           |  FROM el s JOIN nn ON nn.doc_id = s.doc_id
           |  LEFT JOIN (
           |    SELECT e.doc_id, e.dst AS sidx, sum(e.enorm * r.rank) AS cs
           |    FROM edges e JOIN r${k - 1} r
           |      ON r.doc_id = e.doc_id AND r.sidx = e.src
           |    GROUP BY e.doc_id, e.dst) c
           |  ON c.doc_id = s.doc_id AND c.sidx = s.sidx)""".stripMargin
      }.mkString(",\n")
      s"""WITH parts AS MATERIALIZED (
         |  SELECT doc_id, regexp_split_to_array(text, '[.!?]+') AS p
         |  FROM documents),
         |el AS MATERIALIZED (
         |  SELECT * FROM (
         |    SELECT doc_id, CAST(i - 1 AS BIGINT) AS sidx, trim(p[i]) AS sent,
         |      list_distinct(regexp_extract_all(lower(p[i]), '[a-z0-9]+')) AS w
         |    FROM (SELECT doc_id, p, unnest(range(1, len(p) + 1)) AS i
         |          FROM parts)
         |    WHERE i - 1 < 64)
         |  WHERE len(w) >= 1),
         |nn AS MATERIALIZED (SELECT doc_id, count(*) AS n FROM el GROUP BY doc_id),
         |hw AS (
         |  SELECT doc_id, src, dst, CAST(i2 AS DOUBLE) / (ab - i2) AS w
         |  FROM (
         |    SELECT a.doc_id, a.sidx AS src, b.sidx AS dst,
         |      CAST(len(list_intersect(a.w, b.w)) AS BIGINT) AS i2,
         |      CAST(len(a.w) + len(b.w) AS BIGINT) AS ab
         |    FROM el a JOIN el b ON a.doc_id = b.doc_id AND a.sidx < b.sidx)
         |  WHERE i2 >= 1),
         |sym AS MATERIALIZED (
         |  SELECT doc_id, src, dst, w FROM hw
         |  UNION ALL SELECT doc_id, dst, src, w FROM hw),
         |edges AS MATERIALIZED (
         |  SELECT sym.doc_id, sym.src, sym.dst, sym.w / ws.wsum AS enorm
         |  FROM sym JOIN (
         |    SELECT doc_id, src, round(sum(w) + 1e-15, 12) AS wsum
         |    FROM sym GROUP BY doc_id, src) ws
         |  ON ws.doc_id = sym.doc_id AND ws.src = sym.src),
         |r0 AS MATERIALIZED (
         |  SELECT el.doc_id, el.sidx, CAST(1 AS DOUBLE) / nn.n AS rank
         |  FROM el JOIN nn ON nn.doc_id = el.doc_id),
         |$rounds
         |SELECT doc_id AS $idOut, sidx AS sent_idx, rank, sent FROM (
         |  SELECT r5.doc_id, r5.sidx, r5.rank, el.sent,
         |    row_number() OVER (PARTITION BY r5.doc_id
         |      ORDER BY r5.rank DESC, r5.sidx) AS rn
         |  FROM r5 JOIN el ON el.doc_id = r5.doc_id AND el.sidx = r5.sidx)
         |WHERE rn = 1
         |ORDER BY $idOut""".stripMargin
    }

  /** q316/q317 feature frame: label + four engine-exact features (token
    * count scaled by a dyadic constant; digit/punct/uppercase char
    * ratios as SINGLE divisions of integer counts — the q120 doctrine).
    * doc_id rides along for the scoring gate.
    */
  private[graft] def lrFeatures(docs: DataFrame,
      ensure: Boolean = true): DataFrame = {
    val nChar = length(col("text")).cast("double")
    def cnt(re: String): Column =
      size(regexp_extract_all(col("text"), lit(re), lit(0))).cast("double")
    // the split-widening guard reads optimizer stats — batch only; the
    // streaming twin passes ensure = false (micro-batches are already
    // scheduler-sized and the projection is cheap)
    (if (ensure) graft.operators.Parallelism.ensure(docs) else docs)
      .filter(length(col("text")) > 0)
      .select(col("doc_id"),
        when(col("lang") === "en", 1.0).otherwise(0.0).as("y"),
        (graft.operators.TextAnalysis.tokenCount(col("text"))
          .cast("double") / lit(256.0)).as("x_len"),
        (cnt("[0-9]") / nChar).as("x_digit"),
        (cnt("[.,;:!?]") / nChar).as("x_punct"),
        (cnt("[A-Z]") / nChar).as("x_upper"))
  }

  /** The q316/q317 oracle prefix: feature CTE + 6 generated GD layers.
    * EVERY layer is MATERIALIZED (the q203 discipline): g_r and w_r each
    * reference w_{r-1}, so inlining would expand the chain 2^rounds
    * times. The sigmoid, gradient rounding, and update arithmetic are
    * written in EXACTLY the Spark operator's op order — the weights must
    * re-enter each round bit-identical (the pageRank round-discipline).
    */
  private def lrLayersSql(rounds: Int): String = {
    val feat =
      """feat AS MATERIALIZED (
        |  SELECT doc_id,
        |    CASE WHEN lang = 'en' THEN CAST(1 AS DOUBLE)
        |         ELSE CAST(0 AS DOUBLE) END AS y,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE)
        |      / CAST(256 AS DOUBLE) AS x1,
        |    CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
        |      / CAST(length(text) AS DOUBLE) AS x2,
        |    CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE)
        |      / CAST(length(text) AS DOUBLE) AS x3,
        |    CAST(len(regexp_extract_all(text, '[A-Z]')) AS DOUBLE)
        |      / CAST(length(text) AS DOUBLE) AS x4
        |  FROM documents WHERE length(text) > 0),
        |nn AS (SELECT count(*) AS n FROM feat),
        |w0 AS (SELECT CAST(0 AS DOUBLE) AS b, CAST(0 AS DOUBLE) AS w1,
        |  CAST(0 AS DOUBLE) AS w2, CAST(0 AS DOUBLE) AS w3,
        |  CAST(0 AS DOUBLE) AS w4)""".stripMargin
    val p = "CAST(1 AS DOUBLE)/(CAST(1 AS DOUBLE)+exp(-(" +
      "w.b*CAST(1 AS DOUBLE) + w.w1*f.x1 + w.w2*f.x2 + w.w3*f.x3 + " +
      "w.w4*f.x4)))"
    val layers = (1 to rounds).map { r =>
      val xs = Seq("CAST(1 AS DOUBLE)", "f.x1", "f.x2", "f.x3", "f.x4")
      val gs = xs.zipWithIndex.map { case (x, j) =>
        s"    round(sum(($p - f.y) * $x) + 1e-9, 6) AS g$j"
      }.mkString(",\n")
      val ws = Seq("b", "w1", "w2", "w3", "w4").zipWithIndex.map {
        case (wn, j) => s"    w.$wn - 0.5*(g.g$j/nn.n) AS $wn"
      }.mkString(",\n")
      s"""g$r AS MATERIALIZED (
         |  SELECT
         |$gs
         |  FROM feat f, w${r - 1} w),
         |w$r AS MATERIALIZED (
         |  SELECT
         |$ws
         |  FROM w${r - 1} w, g$r g, nn)""".stripMargin
    }
    "WITH " + feat + ",\n" + layers.mkString(",\n")
  }

  private lazy val lrTrainSql: String = {
    val rows = (1 to 6).map { r =>
      s"""  SELECT CAST($r AS BIGINT) AS round, round(b + 1e-9, 6) AS w_bias,
         |    round(w1 + 1e-9, 6) AS w_x_len, round(w2 + 1e-9, 6) AS w_x_digit,
         |    round(w3 + 1e-9, 6) AS w_x_punct, round(w4 + 1e-9, 6) AS w_x_upper
         |  FROM w$r""".stripMargin
    }.mkString("\n  UNION ALL\n")
    lrLayersSql(6) + "\nSELECT * FROM (\n" + rows + ")\nORDER BY round"
  }

  private lazy val lrScoreSql: String =
    lrLayersSql(6) +
      """,
        |wf AS (SELECT round(b + 1e-9, 6) AS b, round(w1 + 1e-9, 6) AS w1,
        |  round(w2 + 1e-9, 6) AS w2, round(w3 + 1e-9, 6) AS w3,
        |  round(w4 + 1e-9, 6) AS w4 FROM w6)
        |SELECT doc_id, is_en, score,
        |  CAST(CASE WHEN score >= 0.5 THEN 1 ELSE 0 END AS BIGINT) AS pred
        |FROM (
        |  SELECT f.doc_id AS doc_id, CAST(f.y AS BIGINT) AS is_en,
        |    round(CAST(1 AS DOUBLE)/(CAST(1 AS DOUBLE)+exp(-(
        |      w.b*CAST(1 AS DOUBLE) + w.w1*f.x1 + w.w2*f.x2 + w.w3*f.x3 +
        |      w.w4*f.x4))) + 1e-9, 6) AS score
        |  FROM feat f, wf w)
        |ORDER BY doc_id""".stripMargin

  private lazy val lrCalibrationSql: String =
    lrLayersSql(6) +
      """,
        |wf AS (SELECT round(b + 1e-9, 6) AS b, round(w1 + 1e-9, 6) AS w1,
        |  round(w2 + 1e-9, 6) AS w2, round(w3 + 1e-9, 6) AS w3,
        |  round(w4 + 1e-9, 6) AS w4 FROM w6),
        |sc AS (
        |  SELECT f.y AS y,
        |    round(CAST(1 AS DOUBLE)/(CAST(1 AS DOUBLE)+exp(-(
        |      w.b*CAST(1 AS DOUBLE) + w.w1*f.x1 + w.w2*f.x2 + w.w3*f.x3 +
        |      w.w4*f.x4))) + 1e-9, 6) AS score
        |  FROM feat f, wf w)
        |SELECT bin, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(y AS BIGINT)) AS BIGINT) AS n_pos,
        |  CAST(sum(CAST(y AS BIGINT)) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |    AS pos_rate,
        |  round(avg(score) + 1e-9, 6) AS avg_score
        |FROM (SELECT y, score,
        |        CAST(floor(score * CAST(2048 AS DOUBLE)) AS BIGINT) AS bin
        |      FROM sc)
        |GROUP BY bin
        |ORDER BY bin""".stripMargin

  private lazy val nbChainSql =
    """WITH d AS (
      |  SELECT doc_id, source,
      |    coalesce(regexp_extract_all(lower(text), '[a-z0-9]+'),
      |      CAST([] AS VARCHAR[])) AS t,
      |    CAST(('0x'||substring(md5('split:'||CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 10 < 8 AS train
      |  FROM documents),
      |tok AS (SELECT doc_id, source, train, unnest(t) AS token FROM d),
      |c AS (SELECT source AS label, token, CAST(count(*) AS BIGINT) AS c
      |      FROM tok WHERE train GROUP BY 1, 2),
      |ls AS (SELECT label, CAST(sum(c) AS BIGINT) AS ns FROM c GROUP BY 1),
      |ds AS (SELECT source AS label, CAST(count(*) AS BIGINT) AS dsn
      |       FROM d WHERE train GROUP BY 1),
      |vv AS (SELECT CAST(count(DISTINCT token) AS BIGINT) AS v
      |       FROM tok WHERE train),
      |tt AS (SELECT CAST(count(*) AS BIGINT) AS dtot FROM d WHERE train),
      |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
      |       FROM tok WHERE NOT train GROUP BY 1, 2),
      |td AS (SELECT doc_id, source AS label_true,
      |         CAST(len(t) AS BIGINT) AS ntok
      |       FROM d WHERE NOT train),
      |part AS (
      |  SELECT tf.doc_id, c.label, sum(tf * ln(CAST(c AS DOUBLE) + 1.0)) AS p
      |  FROM tf JOIN c USING (token) GROUP BY 1, 2),
      |grid AS (
      |  SELECT td.doc_id, td.label_true, l.label,
      |    round(ln(CAST(l.dsn AS DOUBLE) / tt.dtot)
      |      - td.ntok * ln(CAST(l.ns + vv.v AS DOUBLE))
      |      + COALESCE(part.p, 0.0) + 1e-9, 6) AS score
      |  FROM td
      |  CROSS JOIN (SELECT label, ns, dsn FROM ls JOIN ds USING (label)) l
      |  CROSS JOIN vv CROSS JOIN tt
      |  LEFT JOIN part ON part.doc_id = td.doc_id AND part.label = l.label),
      |rk AS (
      |  SELECT doc_id, label_true, label AS pred, score, row_number() OVER (
      |    PARTITION BY doc_id ORDER BY score DESC, label) AS rn
      |  FROM grid)""".stripMargin

  private lazy val q235OracleSql =
    """WITH w AS (
      |  SELECT doc_id, text,
      |    regexp_extract_all(lower(text), '[a-z]+') AS wl
      |  FROM documents),
      |c AS (
      |  SELECT doc_id,
      |    CAST(len(wl) AS BIGINT) AS n_words,
      |    CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS BIGINT) AS n_sents,
      |    CAST(coalesce(list_sum(list_transform(wl,
      |      x -> greatest(1, len(regexp_extract_all(x, '[aeiouy]+'))))), 0) AS BIGINT) AS n_syll
      |  FROM w)
      |SELECT doc_id, n_words, n_sents, n_syll,
      |  CASE WHEN n_words = 0 THEN NULL
      |    ELSE round(0.39 * (CAST(n_words AS DOUBLE) / n_sents) +
      |      11.8 * (CAST(n_syll AS DOUBLE) / n_words) - 15.59 + 1e-9, 6)
      |    END AS fk_grade,
      |  CASE WHEN n_words = 0 THEN NULL
      |    ELSE round(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sents) -
      |      84.6 * (CAST(n_syll AS DOUBLE) / n_words) + 1e-9, 6)
      |    END AS reading_ease
      |FROM c
      |ORDER BY doc_id""".stripMargin

  private lazy val q251OracleSql =
    """WITH kel AS (
      |  SELECT trim(s) AS sent
      |  FROM (SELECT unnest(regexp_split_to_array(text, '[.!?]+')) AS s
      |        FROM documents)
      |  WHERE trim(s) <> ''),
      |known AS MATERIALIZED (SELECT DISTINCT sent FROM kel),
      |b AS (
      |  SELECT doc_id + 500000 AS doc_id,
      |    text || '. fresh ' || CAST(doc_id + 500000 AS VARCHAR) AS text
      |  FROM documents WHERE doc_id % 7 = 3),
      |bparts AS (
      |  SELECT doc_id, regexp_split_to_array(text, '[.!?]+') AS p FROM b),
      |bel AS (
      |  SELECT * FROM (
      |    SELECT doc_id, CAST(i - 1 AS BIGINT) AS sidx, trim(p[i]) AS sent
      |    FROM (SELECT doc_id, p, unnest(range(1, len(p) + 1)) AS i
      |          FROM bparts))
      |  WHERE sent <> ''),
      |m AS (
      |  SELECT bel.doc_id, bel.sidx, bel.sent, k.sent AS known
      |  FROM bel LEFT JOIN known k ON k.sent = bel.sent)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sents,
      |  CAST(sum(CASE WHEN known IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_kept,
      |  coalesce(string_agg(sent, ' ' ORDER BY sidx)
      |    FILTER (WHERE known IS NULL), '') AS cleaned_text
      |FROM m GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  /** The generated WordPiece-training CTE prefix (q239): the q129
    * vocabulary wrap, but each layer picks the pair maximizing
    * `n / (ca · cb)` — pair count over the product of symbol counts.
    * Every layer frame is MATERIALIZED: v/s are each referenced by
    * multiple downstream CTEs per layer, and inlining would expand the
    * chain 3^layers times (the q203 rule).
    */
  private def wordPieceLayersSql(nMerges: Int): String = {
    val sb = new StringBuilder
    sb ++= """WITH v0 AS MATERIALIZED (
      |  SELECT CAST(count(*) AS BIGINT) AS freq,
      |    ' ' || array_to_string(regexp_extract_all(word, '.'), '  ') || ' ' AS seg
      |  FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
      |        FROM documents)
      |  GROUP BY word)""".stripMargin
    for (i <- 1 to nMerges) {
      sb ++= s""",
        |s$i AS MATERIALIZED (
        |  SELECT freq, str_split(trim(seg), '  ') AS l FROM v${i - 1}),
        |p$i AS MATERIALIZED (
        |  SELECT l[i] AS a, l[i+1] AS b, CAST(sum(freq) AS BIGINT) AS n
        |  FROM (SELECT freq, l, unnest(range(1, len(l))) AS i FROM s$i)
        |  GROUP BY a, b),
        |c$i AS MATERIALIZED (
        |  SELECT sym, CAST(sum(freq) AS BIGINT) AS c
        |  FROM (SELECT unnest(l) AS sym, freq FROM s$i)
        |  GROUP BY sym),
        |b$i AS MATERIALIZED (
        |  SELECT p.a, p.b, p.n, ca.c AS ca, cb.c AS cb,
        |    CAST(p.n AS DOUBLE) / (ca.c * cb.c) AS score
        |  FROM p$i p
        |  JOIN c$i ca ON ca.sym = p.a
        |  JOIN c$i cb ON cb.sym = p.b
        |  ORDER BY score DESC, p.a, p.b LIMIT 1),
        |v$i AS MATERIALIZED (
        |  SELECT freq,
        |    replace(seg, ' '||b$i.a||'  '||b$i.b||' ', ' '||b$i.a||b$i.b||' ') AS seg
        |  FROM v${i - 1} CROSS JOIN b$i)""".stripMargin
    }
    sb.toString
  }

  private def duckLangScore(lang: String): String = {
    val prof = TextAnalysis.langProfiles.toMap.apply(lang)
      .map(t => s"'$t'").mkString(", ")
    s"len(list_filter(regexp_extract_all(lower(text), '\\S+'), t -> t IN ($prof)))"
  }

  /** Generated CTE prefix shared by q148/q200: the DoReMi mixture-weight
    * computation (bigram-LM doc losses → per-source excess → exp
    * weighting). Exposes `ex` (source, n_docs, lp, excess) and the
    * normalizer `zz`; each consumer inlines the rounded weight expression
    * (q148 reports it, q200 feeds it into the Hamilton-quota replay).
    */
  /** The mixture-weight CTE chain (bigram-LM per-source log-perplexity →
    * softmax weights) parameterized on the corpus CTE/table it reads —
    * `documents` for the standalone gates (q148/q200), the span-deduped
    * intermediate for the pipeline capstone (q269).
    */
  private def mixtureWeightsCteBody(from: String): String =
    s"""d AS (
      |  SELECT doc_id, source, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
      |  FROM $from),""".stripMargin +
    """
      |bg AS (
      |  SELECT doc_id, t[i] AS w1, t[i+1] AS w2
      |  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM d)),
      |c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2),
      |ctx AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS ctx FROM c2 GROUP BY w1),
      |cont AS (SELECT w2, CAST(sum(c2) AS BIGINT) AS cont FROM c2 GROUP BY w2),
      |tot AS (SELECT CAST(sum(c2) AS DOUBLE) AS t FROM c2),
      |sc AS (
      |  SELECT b.doc_id,
      |    CASE WHEN c2.c2 IS NOT NULL
      |      THEN CAST(c2.c2 AS DOUBLE) / ctx.ctx
      |      ELSE 0.4 * (COALESCE(cont.cont, 0) + 0.5) / tot.t END AS s
      |  FROM bg b
      |  LEFT JOIN c2 ON b.w1 = c2.w1 AND b.w2 = c2.w2
      |  LEFT JOIN ctx ON b.w1 = ctx.w1
      |  LEFT JOIN cont ON b.w2 = cont.w2
      |  CROSS JOIN tot),
      |dl AS (
      |  SELECT doc_id, round(avg(ln(s)) + 1e-9, 6) AS lp
      |  FROM sc GROUP BY doc_id),
      |ps AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |    round(avg(lp) + 1e-9, 6) AS lp
      |  FROM dl JOIN d USING (doc_id) GROUP BY source),
      |mn AS (SELECT min(-lp) AS m FROM ps),
      |ex AS (
      |  SELECT source, n_docs, lp, round((-lp) - m + 1e-9, 6) AS excess
      |  FROM ps CROSS JOIN mn),
      |zz AS (SELECT sum(exp(excess * 1.0)) AS z FROM ex)""".stripMargin

  private val mixtureWeightsCteSql: String =
    "WITH " + mixtureWeightsCteBody("documents")

  val pipelineOracles: Map[String, String] = Map(

    "q150_web_ingest" -> (urlCanonSql("doc_id, source, text, aug") +
      """
        |, s1 AS (
        |  SELECT * FROM (
        |    SELECT *, min(doc_id) OVER (PARTITION BY canon) AS keep FROM c)
        |  WHERE doc_id = keep),
        |f AS (
        |  SELECT *, md5(strip_accents(nfc_normalize(aug))) AS fp FROM s1),
        |s2 AS (
        |  SELECT * FROM (
        |    SELECT *, min(doc_id) OVER (PARTITION BY fp) AS keep2 FROM f)
        |  WHERE doc_id = keep2)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
        |  CAST(sum(length(text)) AS BIGINT) AS n_chars
        |FROM s2 GROUP BY source
        |ORDER BY source""".stripMargin),

    "q60_dataset_split" ->
      """WITH bucketed AS (
        |  SELECT *, CAST(('0x'||substring(md5('split:'||CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 10 AS b
        |  FROM documents)
        |SELECT CASE WHEN b < 8 THEN 'train' WHEN b < 9 THEN 'val' ELSE 'test' END AS split,
        |  count(*) AS n_docs,
        |  CAST(sum(length(text)) AS BIGINT) AS n_chars
        |FROM bucketed
        |GROUP BY 1
        |ORDER BY split""".stripMargin,

    "q61_curation" ->
      """WITH scored AS (
        |  SELECT doc_id, source, text,
        |    CASE WHEN length(text) = 0 THEN 0.0
        |      ELSE CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')) AS DOUBLE) / length(text) END AS punct,
        |    CASE WHEN len(regexp_extract_all(lower(text), '\S+')) = 0 THEN 0.0
        |      ELSE CAST(len(list_filter(regexp_extract_all(lower(text), '\S+'),
        |             t -> t IN ('the','a','an','and','of','to','in','is'))) AS DOUBLE)
        |           / len(regexp_extract_all(lower(text), '\S+')) END AS stop
        |  FROM documents WHERE lang = 'en'),
        |filtered AS (
        |  SELECT doc_id, source, text,
        |    md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS fp
        |  FROM scored
        |  WHERE least(greatest(
        |    least(CAST(length(text) AS DOUBLE) / 200.0, 1.0)
        |    * (1.0 - punct) * (0.5 + stop), 0.0), 1.0) > 0.3),
        |kept AS (
        |  SELECT f.* FROM filtered f
        |  JOIN (SELECT fp, min(doc_id) AS doc_id FROM filtered GROUP BY fp) k
        |    ON f.fp = k.fp AND f.doc_id = k.doc_id)
        |SELECT source, count(*) AS n_kept,
        |  CAST(sum(length(text)) AS BIGINT) AS n_chars
        |FROM kept
        |GROUP BY source
        |ORDER BY source""".stripMargin,

    "q62_mixture_sample" ->
      """SELECT source, rn, doc_id FROM (
        |  SELECT source, doc_id,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY md5('mix:'||CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rn
        |  FROM documents)
        |WHERE rn <= 5
        |ORDER BY source, rn""".stripMargin,

    "q89_training_pipeline" ->
      """WITH scored AS (
        |  SELECT doc_id, source, text,
        |    CASE WHEN length(text) = 0 THEN 0.0
        |      ELSE CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')) AS DOUBLE) / length(text) END AS punct,
        |    CASE WHEN len(regexp_extract_all(lower(text), '\S+')) = 0 THEN 0.0
        |      ELSE CAST(len(list_filter(regexp_extract_all(lower(text), '\S+'),
        |             t -> t IN ('the','a','an','and','of','to','in','is'))) AS DOUBLE)
        |           / len(regexp_extract_all(lower(text), '\S+')) END AS stop
        |  FROM documents WHERE lang = 'en'),
        |filtered AS (
        |  SELECT doc_id, source, text,
        |    md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS fp
        |  FROM scored
        |  WHERE least(greatest(
        |    least(CAST(length(text) AS DOUBLE) / 200.0, 1.0)
        |    * (1.0 - punct) * (0.5 + stop), 0.0), 1.0) > 0.3),
        |kept AS (
        |  SELECT f.* FROM filtered f
        |  JOIN (SELECT fp, min(doc_id) AS doc_id FROM filtered GROUP BY fp) k
        |    ON f.fp = k.fp AND f.doc_id = k.doc_id),
        |ktoks AS (SELECT doc_id, text, regexp_extract_all(text, '\S+') w FROM kept),
        |ksh AS (
        |  SELECT DISTINCT doc_id,
        |    w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4] AS shingle
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 3)) AS i FROM ktoks)),
        |etoks AS (SELECT doc_id, regexp_extract_all(text, '\S+') w
        |          FROM documents WHERE doc_id % 97 = 0),
        |ev AS (
        |  SELECT DISTINCT doc_id AS eval_id,
        |    w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4] AS shingle
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 3)) AS i FROM etoks)),
        |evok AS (SELECT shingle FROM ev GROUP BY shingle HAVING count(*) <= 100),
        |contaminated AS (
        |  SELECT DISTINCT s.doc_id
        |  FROM ksh s JOIN ev e USING (shingle) JOIN evok USING (shingle)
        |  WHERE s.doc_id <> e.eval_id
        |  GROUP BY s.doc_id, e.eval_id
        |  HAVING count(*) >= 2),
        |clean AS (
        |  SELECT k.doc_id, k.text FROM kept k
        |  WHERE k.doc_id NOT IN (SELECT doc_id FROM contaminated)),
        |sharded AS (
        |  SELECT text,
        |    md5('shard:'||CAST(doc_id AS VARCHAR)) AS key,
        |    CAST(('0x'||substring(md5('shard:'||CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 8 AS shard
        |  FROM clean)
        |SELECT shard, count(*) AS n_docs,
        |  CAST(sum(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS n_tokens,
        |  min(key) AS first_key, max(key) AS last_key
        |FROM sharded
        |GROUP BY shard
        |ORDER BY shard""".stripMargin,

    "q82_shard_export" ->
      """WITH t AS (
        |  SELECT text,
        |    md5('shard:'||CAST(doc_id AS VARCHAR)) AS key,
        |    CAST(('0x'||substring(md5('shard:'||CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 16 AS shard
        |  FROM documents)
        |SELECT shard, count(*) AS n_docs,
        |  CAST(sum(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS n_tokens,
        |  min(key) AS first_key, max(key) AS last_key
        |FROM t
        |GROUP BY shard
        |ORDER BY shard""".stripMargin,

    "q96_chunking" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_extract_all(text, '\S+') AS toks
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, toks,
        |    CASE WHEN len(toks) <= 0 THEN 0
        |         ELSE 1 + greatest((len(toks) - 40 + 29) // 30, 0)
        |    END AS nc
        |  FROM t),
        |x AS (SELECT doc_id, toks, unnest(range(0, nc)) AS i FROM c)
        |SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
        |  CAST(len(toks[i*30+1 : i*30+40]) AS BIGINT) AS n_tokens,
        |  md5(array_to_string(toks[i*30+1 : i*30+40], ' ')) AS chunk_sig
        |FROM x
        |ORDER BY doc_id, chunk_id""".stripMargin,

    "q97_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
        |  FROM documents),
        |dfreq AS (
        |  SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        |  FROM toks GROUP BY token),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
        |tf AS (
        |  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
        |  FROM toks WHERE doc_id < 100 GROUP BY doc_id, token),
        |scored AS (
        |  SELECT doc_id, token, tf, df,
        |    round(tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0) + 1e-9, 6) AS tfidf
        |  FROM tf JOIN dfreq USING (token) CROSS JOIN n),
        |r AS (
        |  SELECT *, CAST(row_number() OVER (
        |    PARTITION BY doc_id ORDER BY tfidf DESC, token) AS BIGINT) AS rank
        |  FROM scored)
        |SELECT doc_id, rank, token, tf, df, tfidf
        |FROM r WHERE rank <= 3
        |ORDER BY doc_id, rank""".stripMargin,

    "q101_stratified" ->
      """WITH t AS (
        |  SELECT source, lang, doc_id,
        |    CAST(row_number() OVER (PARTITION BY source, lang
        |      ORDER BY md5('samp:'||CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rn,
        |    count(*) OVER (PARTITION BY source, lang) AS n
        |  FROM documents)
        |SELECT source, lang, rn, doc_id
        |FROM t WHERE rn <= (n * 1 + 4) // 5
        |ORDER BY source, lang, rn""".stripMargin,

    "q100_lm_score" ->
      """WITH d AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t,
        |    CAST(('0x'||substring(md5('split:'||CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 10 < 8 AS train
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id, train, t[i] AS w1, t[i+1] AS w2
        |  FROM (SELECT doc_id, train, t, unnest(range(1, len(t))) AS i FROM d)),
        |c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg WHERE train GROUP BY w1, w2),
        |ctx AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS ctx FROM c2 GROUP BY w1),
        |cont AS (SELECT w2, CAST(sum(c2) AS BIGINT) AS cont FROM c2 GROUP BY w2),
        |tot AS (SELECT CAST(sum(c2) AS DOUBLE) AS t FROM c2),
        |sc AS (
        |  SELECT b.doc_id,
        |    CASE WHEN c2.c2 IS NOT NULL
        |      THEN CAST(c2.c2 AS DOUBLE) / ctx.ctx
        |      ELSE 0.4 * (COALESCE(cont.cont, 0) + 0.5) / tot.t END AS s
        |  FROM bg b
        |  LEFT JOIN c2 ON b.w1 = c2.w1 AND b.w2 = c2.w2
        |  LEFT JOIN ctx ON b.w1 = ctx.w1
        |  LEFT JOIN cont ON b.w2 = cont.w2
        |  CROSS JOIN tot)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  round(avg(ln(s)) + 1e-9, 6) AS lp
        |FROM sc
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    // Katz replay: discount table from the bigram spectrum (every
    // division chain parenthesized exactly as the Spark side), per-w1
    // seen-mass sums rounded 12dp (+1e-15) BEFORE the alpha ratio.
    "q229_katz_lm" ->
      """WITH d AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t,
        |    CAST(('0x'||substring(md5('split:'||CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 10 < 8 AS train
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id, train, t[i] AS w1, t[i+1] AS w2
        |  FROM (SELECT doc_id, train, t, unnest(range(1, len(t))) AS i FROM d)),
        |c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg WHERE train GROUP BY w1, w2),
        |ctx AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS ctx FROM c2 GROUP BY w1),
        |uni AS (SELECT w, count(*) AS c1
        |        FROM (SELECT unnest(t) AS w FROM d WHERE train) GROUP BY w),
        |ut AS (SELECT CAST(sum(c1) AS DOUBLE) AS n,
        |              CAST(count(*) AS DOUBLE) AS v FROM uni),
        |spec AS (SELECT c2 AS r, CAST(count(*) AS BIGINT) AS nr
        |         FROM c2 GROUP BY c2),
        |km AS (SELECT sum(CASE WHEN r = 1 THEN nr END) AS n1,
        |              sum(CASE WHEN r = 6 THEN nr END) AS nk1 FROM spec),
        |disc0 AS (
        |  SELECT s.r AS r, s.nr AS nr, s2.nr AS nr1,
        |    (6 * km.nk1) / km.n1 AS a
        |  FROM spec s LEFT JOIN spec s2 ON s2.r = s.r + 1 CROSS JOIN km
        |  WHERE s.r <= 5),
        |disc1 AS (SELECT r, (r + 1) * nr1 / nr AS rstar, a FROM disc0),
        |disc AS (
        |  SELECT r, CASE WHEN draw IS NULL OR isnan(draw)
        |      OR draw <= 0.0 OR draw > 1.0 THEN 1.0 ELSE draw END AS d
        |  FROM (SELECT r, (rstar / r - a) / (1.0 - a) AS draw FROM disc1) x),
        |al0 AS (
        |  SELECT c2.w1, COALESCE(disc.d, 1.0) * c2.c2 / ctx.ctx AS pkz,
        |    (uni.c1 + 0.5) / (ut.n + 0.5 * ut.v) AS q
        |  FROM c2 JOIN ctx ON c2.w1 = ctx.w1
        |  LEFT JOIN disc ON disc.r = c2.c2
        |  JOIN uni ON uni.w = c2.w2
        |  CROSS JOIN ut),
        |al AS (
        |  SELECT w1,
        |    CASE WHEN sq >= 1.0 OR skz >= 1.0 THEN 1.0
        |         ELSE (1.0 - skz) / (1.0 - sq) END AS alpha
        |  FROM (SELECT w1, round(sum(pkz) + 1e-15, 12) AS skz,
        |               round(sum(q) + 1e-15, 12) AS sq
        |        FROM al0 GROUP BY w1) y),
        |sc AS (
        |  SELECT b.doc_id,
        |    CASE WHEN c2.c2 IS NOT NULL
        |      THEN COALESCE(disc.d, 1.0) * c2.c2 / ctx.ctx
        |      ELSE COALESCE(al.alpha, 1.0) *
        |        ((COALESCE(uni.c1, 0) + 0.5) / (ut.n + 0.5 * ut.v)) END AS p
        |  FROM bg b
        |  LEFT JOIN c2 ON b.w1 = c2.w1 AND b.w2 = c2.w2
        |  LEFT JOIN ctx ON b.w1 = ctx.w1
        |  LEFT JOIN disc ON disc.r = c2.c2
        |  LEFT JOIN al ON b.w1 = al.w1
        |  LEFT JOIN uni ON b.w2 = uni.w
        |  CROSS JOIN ut)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  round(avg(ln(p)) + 1e-9, 6) AS kp
        |FROM sc
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    // CCNet bucket replay: the q100 score chain verbatim, then a
    // per-source rank on the rounded lp (DESC, doc_id tie-break) with
    // the thirds cut in exact integer arithmetic.
    "q233_ppl_buckets" ->
      """WITH d AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t,
        |    CAST(('0x'||substring(md5('split:'||CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 10 < 8 AS train
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id, train, t[i] AS w1, t[i+1] AS w2
        |  FROM (SELECT doc_id, train, t, unnest(range(1, len(t))) AS i FROM d)),
        |c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg WHERE train GROUP BY w1, w2),
        |ctx AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS ctx FROM c2 GROUP BY w1),
        |cont AS (SELECT w2, CAST(sum(c2) AS BIGINT) AS cont FROM c2 GROUP BY w2),
        |tot AS (SELECT CAST(sum(c2) AS DOUBLE) AS t FROM c2),
        |sc AS (
        |  SELECT b.doc_id,
        |    CASE WHEN c2.c2 IS NOT NULL
        |      THEN CAST(c2.c2 AS DOUBLE) / ctx.ctx
        |      ELSE 0.4 * (COALESCE(cont.cont, 0) + 0.5) / tot.t END AS s
        |  FROM bg b
        |  LEFT JOIN c2 ON b.w1 = c2.w1 AND b.w2 = c2.w2
        |  LEFT JOIN ctx ON b.w1 = ctx.w1
        |  LEFT JOIN cont ON b.w2 = cont.w2
        |  CROSS JOIN tot),
        |scored AS (
        |  SELECT sc.doc_id, docs.source,
        |    round(avg(ln(s)) + 1e-9, 6) AS lp
        |  FROM sc JOIN documents docs ON sc.doc_id = docs.doc_id
        |  GROUP BY sc.doc_id, docs.source),
        |r AS (
        |  SELECT doc_id, source, lp,
        |    CAST(row_number() OVER (
        |      PARTITION BY source ORDER BY lp DESC, doc_id) AS BIGINT) AS rn,
        |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
        |  FROM scored)
        |SELECT doc_id, source, lp,
        |  CASE WHEN rn * 3 <= n THEN 'head'
        |       WHEN rn * 3 <= n * 2 THEN 'middle'
        |       ELSE 'tail' END AS ppl_bucket
        |FROM r
        |ORDER BY doc_id""".stripMargin,

    // Readability replay: the same [a-z]+ / [.!?]+ / [aeiouy]+ run
    // counts (list_sum of an empty list is NULL in DuckDB — coalesce to
    // Spark's fold-over-empty 0), linear forms token-for-token.
    "q235_readability" -> q235OracleSql,

    // Stream ≡ batch: the stateless readability projection gates on
    // q235's oracle verbatim.
    "q259_stream_readability" -> q235OracleSql,
    // stream ≡ batch: q271's oracle verbatim
    "q274_stream_blocklist" -> blocklistScrubSql,

    "q284_stream_mattr" -> mattrSql("documents"),

    "q286_stream_fim" -> fimSql("documents"),

    // Kneser–Ney replay: D and the per-history λ chain parenthesized
    // exactly as the Spark side ((D·n1p)/ctx; (c−D)/ctx + λ·pc); the
    // continuation probability is the half-smoothed distinct-history
    // ratio. No rounding anywhere before the per-doc mean (single
    // divisions + one two-term addition per row — exact-operand IEEE).
    "q232_kneser_ney" ->
      """WITH d AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t,
        |    CAST(('0x'||substring(md5('split:'||CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 10 < 8 AS train
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id, train, t[i] AS w1, t[i+1] AS w2
        |  FROM (SELECT doc_id, train, t, unnest(range(1, len(t))) AS i FROM d)),
        |c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg WHERE train GROUP BY w1, w2),
        |km AS (SELECT
        |    CAST((SELECT count(*) FROM c2) AS DOUBLE) AS b,
        |    CAST((SELECT count(DISTINCT w)
        |          FROM (SELECT unnest(t) AS w FROM d WHERE train)) AS DOUBLE) AS v,
        |    (SELECT CAST(coalesce(sum(CASE WHEN c2 = 1 THEN 1 END), 0) AS BIGINT) FROM c2) AS n1,
        |    (SELECT CAST(coalesce(sum(CASE WHEN c2 = 2 THEN 1 END), 0) AS BIGINT) FROM c2) AS n2),
        |dd AS (SELECT b, v,
        |    CASE WHEN n1 + 2 * n2 = 0 THEN 0.5
        |         ELSE CAST(n1 AS DOUBLE) / (n1 + 2 * n2) END AS dsc
        |  FROM km),
        |hist AS (
        |  SELECT w1, ctx, (dd.dsc * n1p) / ctx AS lam
        |  FROM (SELECT w1, CAST(sum(c2) AS BIGINT) AS ctx,
        |               CAST(count(*) AS BIGINT) AS n1p
        |        FROM c2 GROUP BY w1) h CROSS JOIN dd),
        |contd AS (SELECT w2, CAST(count(*) AS BIGINT) AS cd FROM c2 GROUP BY w2),
        |sc AS (
        |  SELECT b.doc_id,
        |    CASE WHEN h.ctx IS NOT NULL THEN
        |      CASE WHEN c2.c2 IS NOT NULL
        |        THEN (c2.c2 - dd.dsc) / h.ctx +
        |          h.lam * ((COALESCE(cd.cd, 0) + 0.5) / (dd.b + 0.5 * dd.v))
        |        ELSE h.lam * ((COALESCE(cd.cd, 0) + 0.5) / (dd.b + 0.5 * dd.v)) END
        |    ELSE (COALESCE(cd.cd, 0) + 0.5) / (dd.b + 0.5 * dd.v) END AS p
        |  FROM bg b
        |  LEFT JOIN c2 ON b.w1 = c2.w1 AND b.w2 = c2.w2
        |  LEFT JOIN hist h ON b.w1 = h.w1
        |  LEFT JOIN contd cd ON b.w2 = cd.w2
        |  CROSS JOIN dd)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  round(avg(ln(p)) + 1e-9, 6) AS knp
        |FROM sc
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    "q144_nfc_dedup" ->
      """WITH v AS (
        |  SELECT source,
        |    source || CASE CAST(
        |        CAST(('0x'||substring(md5('nfcvar:'||CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 4
        |      AS INT)
        |      WHEN 0 THEN chr(233)
        |      WHEN 1 THEN 'e' || chr(769)
        |      WHEN 2 THEN chr(241)
        |      ELSE 'n' || chr(771) END AS raw
        |  FROM documents),
        |c AS (SELECT source, raw, nfc_normalize(raw) AS canon FROM v)
        |SELECT source, CAST(count(DISTINCT raw) AS BIGINT) AS n_raw,
        |  CAST(count(DISTINCT canon) AS BIGINT) AS n_canon,
        |  min(md5(canon)) AS canon_md5
        |FROM c GROUP BY source
        |ORDER BY source""".stripMargin,

    "q149_accent_fold" ->
      """WITH v AS (
        |  SELECT source,
        |    source || CASE CAST(
        |        CAST(('0x'||substring(md5('accvar:'||CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 4
        |      AS INT)
        |      WHEN 0 THEN 'cafe'
        |      WHEN 1 THEN 'caf' || chr(233)
        |      WHEN 2 THEN 'cafe' || chr(769)
        |      ELSE 'stra' || chr(223) || 'e' END AS raw
        |  FROM documents),
        |f AS (SELECT source, raw, strip_accents(raw) AS folded FROM v)
        |SELECT source, CAST(count(DISTINCT raw) AS BIGINT) AS n_raw,
        |  CAST(count(DISTINCT folded) AS BIGINT) AS n_fold,
        |  min(md5(folded)) AS fold_md5
        |FROM f GROUP BY source
        |ORDER BY source""".stripMargin,

    "q160_quality_cut" ->
      """WITH ratios AS (
        |  SELECT doc_id, source, text,
        |    length(text) AS n_chars,
        |    CASE WHEN length(text) = 0 THEN 0.0
        |      ELSE CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')) AS DOUBLE) / length(text) END AS punct,
        |    CASE WHEN len(regexp_extract_all(lower(text), '\S+')) = 0 THEN 0.0
        |      ELSE CAST(len(list_filter(regexp_extract_all(lower(text), '\S+'),
        |             t -> t IN ('the','a','an','and','of','to','in','is'))) AS DOUBLE)
        |           / len(regexp_extract_all(lower(text), '\S+')) END AS stop
        |  FROM documents),
        |scored AS (
        |  SELECT doc_id, source, text,
        |    round(least(greatest(
        |      least(CAST(n_chars AS DOUBLE) / 200.0, 1.0)
        |      * (1.0 - punct) * (0.5 + stop), 0.0), 1.0) + 1e-9, 6) AS q
        |  FROM ratios),
        |rk AS (
        |  SELECT doc_id, source, text, q,
        |    CAST(row_number() OVER (
        |      PARTITION BY source ORDER BY q DESC, doc_id) AS BIGINT) AS rn,
        |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
        |  FROM scored)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
        |  min(q) AS q_floor,
        |  CAST(sum(length(text)) AS BIGINT) AS n_chars
        |FROM rk
        |WHERE rn * 5 <= n + 4
        |GROUP BY source
        |ORDER BY source""".stripMargin,

    // OOV replay: the same top-1000 cut (row_number over count desc,
    // token asc), marker join, exact counts and division.
    "q265_oov_rates" ->
      """WITH toks AS (
        |  SELECT source, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
        |  FROM documents),
        |vc AS (
        |  SELECT token FROM (
        |    SELECT token, row_number() OVER (
        |      ORDER BY count(*) DESC, token) AS rn
        |    FROM toks GROUP BY token) WHERE rn <= 1000),
        |m AS (
        |  SELECT toks.source, vc.token AS hit
        |  FROM toks LEFT JOIN vc ON vc.token = toks.token)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN hit IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_oov,
        |  CAST(sum(CASE WHEN hit IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*) AS oov_rate
        |FROM m GROUP BY source
        |ORDER BY source""".stripMargin,

    // Spearman replay: per-variable value-grain cumulative ranks with
    // the exact half-integer tie average, quarter-exact d² sums, the
    // classical closed form — nothing rounded.
    "q264_spearman" ->
      """WITH b AS (
        |  SELECT source AS g,
        |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS x,
        |    CAST(length(text) AS BIGINT) AS y
        |  FROM documents),
        |rx AS (
        |  SELECT g, x, (cum - c) + (c + 1) / CAST(2 AS DOUBLE) AS rxv
        |  FROM (
        |    SELECT g, x, c, sum(c) OVER (PARTITION BY g ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |    FROM (SELECT g, x, count(*) AS c FROM b GROUP BY g, x))),
        |ry AS (
        |  SELECT g, y, (cum - c) + (c + 1) / CAST(2 AS DOUBLE) AS ryv
        |  FROM (
        |    SELECT g, y, c, sum(c) OVER (PARTITION BY g ORDER BY y
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |    FROM (SELECT g, y, count(*) AS c FROM b GROUP BY g, y))),
        |r AS (
        |  SELECT b.g, b.x, b.y,
        |    (rx.rxv - ry.ryv) * (rx.rxv - ry.ryv) AS d2
        |  FROM b
        |  JOIN rx ON rx.g = b.g AND rx.x = b.x
        |  JOIN ry ON ry.g = b.g AND ry.y = b.y),
        |a AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS n, sum(d2) AS s,
        |    count(DISTINCT x) AS dx, count(DISTINCT y) AS dy
        |  FROM r GROUP BY g)
        |SELECT g AS source, n,
        |  CASE WHEN dx <= 1 OR dy <= 1 THEN NULL
        |    ELSE 1.0 - 6.0 * s / (n * (n*n - 1)) END AS rho
        |FROM a
        |ORDER BY source""".stripMargin,

    // Pearson replay: integer sums, integer cross-products, two sqrts,
    // one division — nothing rounded.
    "q254_pearson" ->
      """WITH b AS (
        |  SELECT source,
        |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS x,
        |    CAST(length(text) AS BIGINT) AS y
        |  FROM documents),
        |a AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x*x) AS BIGINT) AS sxx,
        |    CAST(sum(y*y) AS BIGINT) AS syy,
        |    CAST(sum(x*y) AS BIGINT) AS sxy
        |  FROM b GROUP BY source),
        |c AS (
        |  SELECT source, n, n*sxy - sx*sy AS num,
        |    n*sxx - sx*sx AS vx, n*syy - sy*sy AS vy
        |  FROM a)
        |SELECT source, n,
        |  CASE WHEN vx = 0 OR vy = 0 THEN NULL
        |    ELSE num / (sqrt(CAST(vx AS DOUBLE)) * sqrt(CAST(vy AS DOUBLE)))
        |    END AS r
        |FROM c
        |ORDER BY source""".stripMargin,

    // KS replay: (source, value) counts, per-source cumulative window,
    // the pooled value grid filled with last_value IGNORE NULLS, one
    // exact division per ECDF point, max |diff| per source pair.
    "q241_ks_drift" ->
      """WITH base AS (
        |  SELECT source AS src,
        |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS v
        |  FROM documents),
        |svc AS (SELECT src, v, count(*) AS c FROM base GROUP BY src, v),
        |cum AS (
        |  SELECT src, v, sum(c) OVER (PARTITION BY src ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM svc),
        |srcs AS (SELECT src, count(*) AS n FROM base GROUP BY src),
        |grid AS (
        |  SELECT vals.v, srcs.src, srcs.n
        |  FROM (SELECT DISTINCT v FROM svc) vals CROSS JOIN srcs),
        |f AS (
        |  SELECT g.src, g.v, g.n,
        |    CAST(coalesce(last_value(cum.cum IGNORE NULLS) OVER (
        |      PARTITION BY g.src ORDER BY g.v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS DOUBLE)
        |      / g.n AS fv
        |  FROM grid g LEFT JOIN cum ON cum.src = g.src AND cum.v = g.v)
        |SELECT a.src AS source_a, b.src AS source_b,
        |  CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
        |  max(abs(a.fv - b.fv)) AS ks
        |FROM f a JOIN f b ON a.v = b.v AND a.src < b.src
        |GROUP BY a.src, b.src, a.n, b.n
        |ORDER BY source_a, source_b""".stripMargin,

    "q157_source_kl" ->
      """WITH toks AS (
        |  SELECT source, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        |  FROM documents),
        |vocab AS (
        |  SELECT tok, CAST(count(*) AS BIGINT) AS cq
        |  FROM toks GROUP BY tok
        |  ORDER BY cq DESC, tok LIMIT 100),
        |qt AS (SELECT CAST(sum(cq) AS BIGINT) AS qt FROM vocab),
        |sc AS (
        |  SELECT source, t.tok, CAST(count(*) AS BIGINT) AS c
        |  FROM toks t JOIN vocab USING (tok)
        |  GROUP BY 1, 2),
        |st AS (SELECT source, CAST(sum(c) AS BIGINT) AS ns FROM sc GROUP BY 1),
        |grid AS (
        |  SELECT st.source, st.ns, v.cq, qt.qt,
        |    CAST(COALESCE(sc.c, 0) + 1 AS DOUBLE) / (st.ns + 100) AS p,
        |    CAST(v.cq + 1 AS DOUBLE) / (qt.qt + 100) AS q
        |  FROM st CROSS JOIN vocab v CROSS JOIN qt
        |  LEFT JOIN sc ON sc.source = st.source AND sc.tok = v.tok)
        |SELECT source, min(ns) AS n_in_vocab,
        |  round(sum(p * (ln(p) - ln(q))) + 1e-9, 6) AS kl
        |FROM grid GROUP BY source
        |ORDER BY source""".stripMargin,

    "q155_score_calibration" ->
      """WITH ratios AS (
        |  SELECT doc_id, source,
        |    length(text) AS n_chars,
        |    CASE WHEN length(text) = 0 THEN 0.0
        |      ELSE CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')) AS DOUBLE) / length(text) END AS punct,
        |    CASE WHEN len(regexp_extract_all(lower(text), '\S+')) = 0 THEN 0.0
        |      ELSE CAST(len(list_filter(regexp_extract_all(lower(text), '\S+'),
        |             t -> t IN ('the','a','an','and','of','to','in','is'))) AS DOUBLE)
        |           / len(regexp_extract_all(lower(text), '\S+')) END AS stop
        |  FROM documents),
        |scored AS (
        |  SELECT doc_id, source,
        |    round(least(greatest(
        |      least(CAST(n_chars AS DOUBLE) / 200.0, 1.0)
        |      * (1.0 - punct) * (0.5 + stop), 0.0), 1.0) + 1e-9, 6) AS q
        |  FROM ratios),
        |rk AS (
        |  SELECT doc_id, source, q,
        |    CAST(row_number() OVER (
        |      PARTITION BY source ORDER BY q DESC, doc_id) AS BIGINT) AS rn,
        |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
        |  FROM scored)
        |SELECT doc_id, source, q, rn,
        |  CASE WHEN n = 1 THEN 0.0
        |       ELSE CAST(rn - 1 AS DOUBLE) / (n - 1) END AS pct
        |FROM rk
        |ORDER BY doc_id""".stripMargin,

    "q148_mixture_weights" -> (mixtureWeightsCteSql +
      """
        |SELECT source, n_docs, lp, excess,
        |  round(exp(excess * 1.0) / z + 1e-9, 6) AS weight
        |FROM ex CROSS JOIN zz
        |ORDER BY source""".stripMargin),

    "q200_mixture_select" -> (mixtureWeightsCteSql +
      """,
        |wts AS (
        |  SELECT source, n_docs,
        |    round(exp(excess * 1.0) / z + 1e-9, 6) AS weight
        |  FROM ex CROSS JOIN zz),
        |q0 AS (
        |  SELECT source, n_docs, weight,
        |    CAST(floor(weight * 200) AS BIGINT) AS q0,
        |    weight * 200 - floor(weight * 200) AS rem
        |  FROM wts),
        |rr AS (SELECT 200 - CAST(sum(q0) AS BIGINT) AS r FROM q0),
        |qk AS (
        |  SELECT source, n_docs, weight,
        |    q0 + CASE WHEN CAST(row_number() OVER (ORDER BY rem DESC, source)
        |        AS BIGINT) <= r THEN 1 ELSE 0 END AS quota
        |  FROM q0 CROSS JOIN rr),
        |rk AS (
        |  SELECT doc_id, source,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY md5('mix:'||CAST(doc_id AS VARCHAR)), doc_id)
        |      AS BIGINT) AS rn
        |  FROM documents),
        |sel AS (
        |  SELECT rk.source AS source,
        |    CAST(count(*) AS BIGINT) AS n_selected,
        |    CAST(sum(doc_id) AS BIGINT) AS sel_sum
        |  FROM rk JOIN qk ON rk.source = qk.source
        |  WHERE rk.rn <= qk.quota
        |  GROUP BY rk.source)
        |SELECT qk.source AS source, qk.n_docs AS n_docs, qk.weight AS weight,
        |  CAST(qk.quota AS BIGINT) AS quota,
        |  coalesce(sel.n_selected, CAST(0 AS BIGINT)) AS n_selected,
        |  coalesce(sel.sel_sum, CAST(0 AS BIGINT)) AS sel_sum
        |FROM qk LEFT JOIN sel ON qk.source = sel.source
        |ORDER BY qk.source""".stripMargin),

    // The capstone replay, stage for stage: q61's curation/exact-dedup
    // chain, q131's span census + reassembly OVER THE SURVIVORS, the
    // mixture CTEs over the deduped corpus (seed 'cap:', n = 400), the
    // q139 chunk/pack windows over the selected subset, and the q82
    // 16-bit md5 shard rule at bin grain.
    "q269_pretrain_capstone" -> (
      """WITH scored AS (
        |  SELECT doc_id, source, text,
        |    CASE WHEN length(text) = 0 THEN 0.0
        |      ELSE CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')) AS DOUBLE) / length(text) END AS punct,
        |    CASE WHEN len(regexp_extract_all(lower(text), '\S+')) = 0 THEN 0.0
        |      ELSE CAST(len(list_filter(regexp_extract_all(lower(text), '\S+'),
        |             t -> t IN ('the','a','an','and','of','to','in','is'))) AS DOUBLE)
        |           / len(regexp_extract_all(lower(text), '\S+')) END AS stop
        |  FROM documents WHERE lang = 'en'),
        |filtered AS (
        |  SELECT doc_id, source, text,
        |    md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS fp
        |  FROM scored
        |  WHERE least(greatest(
        |    least(CAST(length(text) AS DOUBLE) / 200.0, 1.0)
        |    * (1.0 - punct) * (0.5 + stop), 0.0), 1.0) > 0.3),
        |kept AS (
        |  SELECT f.doc_id, f.source, f.text FROM filtered f
        |  JOIN (SELECT fp, min(doc_id) AS doc_id FROM filtered GROUP BY fp) k
        |    ON f.fp = k.fp AND f.doc_id = k.doc_id),
        |t AS (
        |  SELECT doc_id, regexp_extract_all(text, '\S+') AS toks FROM kept),
        |c AS (
        |  SELECT doc_id, toks,
        |    CASE WHEN len(toks) <= 0 THEN 0
        |         ELSE 1 + greatest((len(toks) - 20 + 19) // 20, 0)
        |    END AS nc
        |  FROM t),
        |spans AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
        |    array_to_string(toks[i*20+1 : i*20+20], ' ') AS chunk
        |  FROM (SELECT doc_id, toks, unnest(range(0, nc)) AS i FROM c)),
        |f AS (SELECT md5(chunk) AS sig, count(*) AS n
        |      FROM spans GROUP BY md5(chunk)),
        |cleaned AS (
        |  SELECT doc_id,
        |    coalesce(
        |      string_agg(chunk, ' ' ORDER BY chunk_id) FILTER (WHERE f.n <= 1),
        |      '') AS text
        |  FROM spans JOIN f ON md5(chunk) = f.sig
        |  GROUP BY doc_id),
        |sdoc AS (
        |  SELECT cl.doc_id, k.source, cl.text
        |  FROM cleaned cl JOIN kept k ON k.doc_id = cl.doc_id),
        |""".stripMargin +
      mixtureWeightsCteBody("sdoc") +
      """,
        |wts AS (
        |  SELECT source, n_docs,
        |    round(exp(excess * 1.0) / z + 1e-9, 6) AS weight
        |  FROM ex CROSS JOIN zz),
        |q0 AS (
        |  SELECT source, weight,
        |    CAST(floor(weight * 400) AS BIGINT) AS q0,
        |    weight * 400 - floor(weight * 400) AS rem
        |  FROM wts),
        |rr AS (SELECT 400 - CAST(sum(q0) AS BIGINT) AS r FROM q0),
        |qk AS (
        |  SELECT source,
        |    q0 + CASE WHEN CAST(row_number() OVER (ORDER BY rem DESC, source)
        |        AS BIGINT) <= r THEN 1 ELSE 0 END AS quota
        |  FROM q0 CROSS JOIN rr),
        |rk AS (
        |  SELECT doc_id, source,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY md5('cap:'||CAST(doc_id AS VARCHAR)), doc_id)
        |      AS BIGINT) AS rn
        |  FROM sdoc),
        |sel AS (
        |  SELECT sdoc.doc_id, sdoc.source, sdoc.text
        |  FROM sdoc
        |  JOIN rk ON rk.doc_id = sdoc.doc_id
        |  JOIN qk ON qk.source = rk.source
        |  WHERE rk.rn <= qk.quota),
        |ct AS (
        |  SELECT doc_id, source, regexp_extract_all(text, '\S+') AS tk
        |  FROM sel),
        |cc AS (
        |  SELECT doc_id, source, tk,
        |    CASE WHEN len(tk) <= 0 THEN 0
        |         ELSE 1 + greatest((len(tk) - 40 + 29) // 30, 0) END AS nc
        |  FROM ct),
        |cx AS (SELECT doc_id, source, tk, unnest(range(0, nc)) AS i FROM cc),
        |chunks AS (
        |  SELECT doc_id * 1000 + i AS uid, source,
        |    CAST(len(tk[i*30+1 : i*30+40]) AS BIGINT) AS n_tokens
        |  FROM cx),
        |packed AS (
        |  SELECT source, uid, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY source ORDER BY uid
        |                        ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM chunks),
        |bins AS (
        |  SELECT source, CAST(floor((cum - n_tokens) / 512) AS BIGINT) AS bin,
        |    CAST(count(*) AS BIGINT) AS n_chunks,
        |    CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
        |  FROM packed
        |  GROUP BY 1, 2)
        |SELECT source, shard,
        |  CAST(count(*) AS BIGINT) AS n_bins,
        |  CAST(sum(n_chunks) AS BIGINT) AS n_chunks,
        |  CAST(sum(bin_tokens) AS BIGINT) AS n_tokens
        |FROM (
        |  SELECT source, bin, n_chunks, bin_tokens,
        |    CAST(('0x'||substring(md5('capshard:'||source||':'||CAST(bin AS VARCHAR)), 1, 4)) AS BIGINT) % 8 AS shard
        |  FROM bins)
        |GROUP BY source, shard
        |ORDER BY source, shard""".stripMargin),

    "q146_url_canon" -> (urlCanonSql("doc_id") +
      """
        |SELECT canon, CAST(count(DISTINCT raw) AS BIGINT) AS n_raw,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM c GROUP BY canon
        |ORDER BY canon""".stripMargin),

    // LR training replay: 6 materialized GD layers, gradient sums
    // rounded before each update — the weight trajectory must land
    // bit-identical per round
    "q316_lr_train" -> lrTrainSql,

    // LR scoring replay: the SAME 6 layers re-derive the published
    // (output-rounded) weights, then one sigmoid per doc, thresholded on
    // the rounded score
    "q317_lr_score" -> lrScoreSql,

    // the streaming scorer gates on the batch oracle verbatim (stateless
    // projection — the q102 → q96 pattern)
    "q318_stream_lr_score" -> lrScoreSql,

    // LR reliability diagram: same 6 layers + published-weight scoring,
    // dyadic 1/2048 score bins, exact positive-rate division, rounded mean
    "q320_lr_calibration" -> lrCalibrationSql,

    "q145_nb_classify" -> (nbChainSql +
      """
        |SELECT label_true AS source, pred, CAST(count(*) AS BIGINT) AS n
        |FROM rk WHERE rn = 1
        |GROUP BY 1, 2
        |ORDER BY source, pred""".stripMargin),

    // the q303 margin-calibration replay: top-2 rounded grid scores per
    // doc, floor bucket clamped into the top bin, exact accuracy
    "q303_nb_calibration" -> (nbChainSql +
      """,
        |top AS (
        |  SELECT doc_id,
        |    max(label_true) AS label_true,
        |    max(CASE WHEN rn = 1 THEN pred END) AS pred,
        |    max(CASE WHEN rn = 1 THEN score END) AS s1,
        |    max(CASE WHEN rn = 2 THEN score END) AS s2
        |  FROM rk WHERE rn <= 2 GROUP BY doc_id),
        |mb AS (
        |  SELECT doc_id, pred, label_true, s1 - s2 AS m,
        |    least(CAST(floor((s1 - s2) / 0.25) AS BIGINT), 7) AS bin
        |  FROM top WHERE s2 IS NOT NULL)
        |SELECT bin, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN pred = label_true THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_correct,
        |  CAST(sum(CASE WHEN pred = label_true THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS accuracy,
        |  round(avg(m) + 1e-9, 6) AS avg_margin
        |FROM mb GROUP BY bin
        |ORDER BY bin""".stripMargin),

    // Classifier metrics replay: the q145 prediction chain, then
    // label-keyed counts, exact precision/recall divisions, and the
    // deterministic 2·P·R/(P+R) F1 — nothing rounded.
    "q253_classifier_metrics" -> (nbChainSql +
      """,
        |pr AS (SELECT doc_id, label_true, pred FROM rk WHERE rn = 1),
        |bt AS (SELECT label_true AS label, CAST(count(*) AS BIGINT) AS n_true
        |       FROM pr GROUP BY 1),
        |bp AS (SELECT pred AS label, CAST(count(*) AS BIGINT) AS n_pred
        |       FROM pr GROUP BY 1),
        |tpx AS (SELECT label_true AS label, CAST(count(*) AS BIGINT) AS tp
        |        FROM pr WHERE label_true = pred GROUP BY 1),
        |mg AS (
        |  SELECT coalesce(bt.label, bp.label) AS label,
        |    coalesce(bt.n_true, 0) AS n_true,
        |    coalesce(bp.n_pred, 0) AS n_pred
        |  FROM bt FULL OUTER JOIN bp ON bp.label = bt.label),
        |mm AS (
        |  SELECT mg.label, CAST(mg.n_true AS BIGINT) AS n_true,
        |    CAST(mg.n_pred AS BIGINT) AS n_pred,
        |    CAST(coalesce(tpx.tp, 0) AS BIGINT) AS tp
        |  FROM mg LEFT JOIN tpx ON tpx.label = mg.label),
        |mx AS (
        |  SELECT label, n_true, n_pred, tp,
        |    CASE WHEN n_pred = 0 THEN 0.0
        |      ELSE CAST(tp AS DOUBLE) / n_pred END AS precision,
        |    CASE WHEN n_true = 0 THEN 0.0
        |      ELSE CAST(tp AS DOUBLE) / n_true END AS recall
        |  FROM mm)
        |SELECT label, n_true, n_pred, tp, precision, recall,
        |  CASE WHEN tp = 0 THEN 0.0
        |    ELSE 2 * precision * recall / (precision + recall) END AS f1
        |FROM mx
        |ORDER BY label""".stripMargin),

    "q143_kmv_distinct" ->
      """WITH toks AS (
        |  SELECT source, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
        |  FROM documents),
        |hx AS (
        |  SELECT DISTINCT source,
        |    CAST(('0x'||substring(md5('kmv:'||token), 1, 12)) AS BIGINT) AS h
        |  FROM toks),
        |bk AS (
        |  SELECT source, h, row_number() OVER (
        |    PARTITION BY source ORDER BY h) AS rn
        |  FROM hx),
        |sk AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_sketch,
        |    max(CASE WHEN rn = 64 THEN h END) AS kth
        |  FROM bk WHERE rn <= 64 GROUP BY source),
        |ex AS (
        |  SELECT source, CAST(count(DISTINCT token) AS BIGINT) AS n_exact
        |  FROM toks GROUP BY source)
        |SELECT ex.source, n_exact, n_sketch, kth,
        |  round(CASE WHEN n_sketch < 64 THEN CAST(n_sketch AS DOUBLE)
        |    ELSE 63.0 * 281474976710656.0 / CAST(kth AS DOUBLE) END + 1e-9, 4) AS est
        |FROM ex JOIN sk USING (source)
        |ORDER BY source""".stripMargin,

    // KMV set-op replay: per-source bottom-64 hash lists, pair merge via
    // list_sort(list_distinct(list_concat(...))) (list_distinct does NOT
    // preserve order — the sort re-establishes it), rho via list_filter
    // + list_contains, the same single-division/product chain.
    "q217_kmv_setops" ->
      """WITH toks AS (
        |  SELECT source, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
        |  FROM documents),
        |hx AS (
        |  SELECT DISTINCT source,
        |    CAST(('0x'||substring(md5('kmv:'||token), 1, 12)) AS BIGINT) AS h
        |  FROM toks),
        |bk AS (
        |  SELECT source, h, row_number() OVER (
        |    PARTITION BY source ORDER BY h) AS rn
        |  FROM hx),
        |sk AS (
        |  SELECT source, list(h ORDER BY h) AS skl
        |  FROM bk WHERE rn <= 64 GROUP BY source),
        |p AS (
        |  SELECT a.source AS a_source, b.source AS b_source,
        |    a.skl AS ask, b.skl AS bsk
        |  FROM sk a JOIN sk b ON a.source < b.source),
        |m AS (
        |  SELECT a_source, b_source, ask, bsk,
        |    list_sort(list_distinct(list_concat(ask, bsk))) AS mall
        |  FROM p),
        |mm AS (
        |  SELECT a_source, b_source, ask, bsk, mall,
        |    mall[1:64] AS mk, len(mall) AS nall
        |  FROM m),
        |e AS (
        |  SELECT a_source, b_source,
        |    CAST(len(mk) AS BIGINT) AS kp,
        |    CAST(len(list_filter(mk, h -> list_contains(ask, h)
        |      AND list_contains(bsk, h))) AS BIGINT) AS rho,
        |    CASE WHEN nall < 64 THEN CAST(nall AS DOUBLE)
        |      ELSE 63.0 * 281474976710656.0 / CAST(mk[64] AS DOUBLE)
        |    END AS u
        |  FROM mm)
        |SELECT a_source, b_source, kp, rho,
        |  round(u + 1e-9, 4) AS est_union,
        |  round(CAST(rho AS DOUBLE) / kp + 1e-9, 6) AS est_jaccard,
        |  round(CAST(rho AS DOUBLE) / kp * u + 1e-9, 4) AS est_intersection
        |FROM e
        |ORDER BY a_source, b_source""".stripMargin,

    "q222_keyness" ->
      """WITH toks AS (
        |  SELECT source, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
        |  FROM documents),
        |c AS (
        |  SELECT source, token, count(*) AS y FROM toks GROUP BY source, token),
        |tt AS (SELECT token, count(*) AS yall FROM toks GROUP BY token),
        |gt AS (SELECT source, count(*) AS ng FROM toks GROUP BY source),
        |tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(DISTINCT token) AS BIGINT) AS v
        |  FROM toks),
        |s AS (
        |  SELECT c.source, c.token, c.y, tt.yall, gt.ng, tot.n, tot.v
        |  FROM c JOIN tt USING (token) JOIN gt USING (source) CROSS JOIN tot),
        |z AS (
        |  SELECT source, token, y,
        |    round((ln((y + 0.01) / (ng + 0.01*v - y - 0.01))
        |      - ln((yall - y + 0.01) / (n - ng + 0.01*v - (yall - y) - 0.01)))
        |      / sqrt(1.0/(y + 0.01) + 1.0/(yall - y + 0.01)) + 1e-9, 6) AS z
        |  FROM s),
        |r AS (
        |  SELECT source, token, y, z, row_number() OVER (
        |    PARTITION BY source ORDER BY z DESC, token) AS rn
        |  FROM z)
        |SELECT source, CAST(rn AS BIGINT) AS rank, token,
        |  CAST(y AS BIGINT) AS cnt, z
        |FROM r WHERE rn <= 10
        |ORDER BY source, rank""".stripMargin,

    "q218_freq_spectrum" ->
      """WITH toks AS (
        |  SELECT source, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
        |  FROM documents),
        |c AS (
        |  SELECT source, token, count(*) AS r FROM toks GROUP BY source, token),
        |s AS (
        |  SELECT source, r, CAST(count(*) AS BIGINT) AS n_r
        |  FROM c GROUP BY source, r)
        |SELECT s.source AS source, s.r AS r, s.n_r AS n_r,
        |  (s.r + 1) * n2.n_r / s.n_r AS gt_rstar
        |FROM s LEFT JOIN s n2
        |  ON n2.source = s.source AND n2.r = s.r + 1
        |ORDER BY s.source, s.r""".stripMargin,

    "q219_zipf_slope" ->
      """WITH toks AS (
        |  SELECT source, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
        |  FROM documents),
        |c AS (
        |  SELECT source, token, count(*) AS cnt FROM toks GROUP BY source, token),
        |rk AS (
        |  SELECT source, token, cnt, row_number() OVER (
        |    PARTITION BY source ORDER BY cnt DESC, token) AS rank
        |  FROM c),
        |xy AS (
        |  SELECT source, ln(CAST(rank AS DOUBLE)) AS x,
        |    ln(CAST(cnt AS DOUBLE)) AS y
        |  FROM rk WHERE rank <= 100),
        |a AS (
        |  SELECT source, CAST(count(*) AS DOUBLE) AS n,
        |    sum(x) AS sx, sum(y) AS sy,
        |    sum(x*y) AS sxy, sum(x*x) AS sxx
        |  FROM xy GROUP BY source),
        |b AS (
        |  SELECT source, n, sx, sy,
        |    (sxy - sx*sy/n) / (sxx - sx*sx/n) AS slope
        |  FROM a)
        |SELECT source, CAST(n AS BIGINT) AS n_terms,
        |  round(slope + 1e-9, 6) AS slope,
        |  round(sy/n - slope*(sx/n) + 1e-9, 6) AS intercept
        |FROM b
        |ORDER BY source""".stripMargin,

    "q220_heaps_growth" ->
      """WITH toks AS (
        |  SELECT source, doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
        |  FROM documents),
        |nd AS (
        |  SELECT source, doc_id, count(*) AS n_tokens
        |  FROM toks GROUP BY source, doc_id),
        |fd AS (
        |  SELECT source, token, min(doc_id) AS fdoc
        |  FROM toks GROUP BY source, token),
        |nn AS (
        |  SELECT source, fdoc AS doc_id, CAST(count(*) AS BIGINT) AS n_new
        |  FROM fd GROUP BY source, fdoc),
        |c AS (
        |  SELECT nd.source AS source, nd.doc_id AS doc_id, nd.n_tokens,
        |    coalesce(nn.n_new, 0) AS n_new
        |  FROM nd LEFT JOIN nn
        |    ON nd.source = nn.source AND nd.doc_id = nn.doc_id)
        |SELECT source, doc_id, n_tokens, n_new,
        |  CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id)
        |    AS BIGINT) AS cum_tokens,
        |  CAST(sum(n_new) OVER (PARTITION BY source ORDER BY doc_id)
        |    AS BIGINT) AS cum_vocab
        |FROM c
        |ORDER BY source, doc_id""".stripMargin,

    "q221_heaps_fit" ->
      """WITH toks AS (
        |  SELECT source, doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
        |  FROM documents),
        |nd AS (
        |  SELECT source, doc_id, count(*) AS n_tokens
        |  FROM toks GROUP BY source, doc_id),
        |fd AS (
        |  SELECT source, token, min(doc_id) AS fdoc
        |  FROM toks GROUP BY source, token),
        |nn AS (
        |  SELECT source, fdoc AS doc_id, CAST(count(*) AS BIGINT) AS n_new
        |  FROM fd GROUP BY source, fdoc),
        |c AS (
        |  SELECT nd.source AS source, nd.doc_id AS doc_id, nd.n_tokens,
        |    coalesce(nn.n_new, 0) AS n_new
        |  FROM nd LEFT JOIN nn
        |    ON nd.source = nn.source AND nd.doc_id = nn.doc_id),
        |g AS (
        |  SELECT source,
        |    ln(CAST(sum(n_tokens) OVER w AS DOUBLE)) AS x,
        |    ln(CAST(sum(n_new) OVER w AS DOUBLE)) AS y
        |  FROM c
        |  WINDOW w AS (PARTITION BY source ORDER BY doc_id)),
        |a AS (
        |  SELECT source, CAST(count(*) AS DOUBLE) AS n,
        |    sum(x) AS sx, sum(y) AS sy,
        |    sum(x*y) AS sxy, sum(x*x) AS sxx
        |  FROM g GROUP BY source),
        |b AS (
        |  SELECT source, n, sx, sy,
        |    (sxy - sx*sy/n) / (sxx - sx*sx/n) AS slope
        |  FROM a)
        |SELECT source, CAST(n AS BIGINT) AS n_points,
        |  round(slope + 1e-9, 6) AS beta,
        |  round(sy/n - slope*(sx/n) + 1e-9, 6) AS ln_k
        |FROM b
        |ORDER BY source""".stripMargin,

    // HLL replay: md5 bucket (first 2 hex chars % 64), rank by a CASE
    // ladder of exact integer thresholds (no float log), register
    // maxima, exact-dyadic harmonic sum 1/(1<<r) with absent buckets
    // contributing 1.0, alpha·m²/S with the linear-counting branch.
    "q174_hll_distinct" -> {
      val ladder = (1 to 16)
        .map(i => s"WHEN v >= ${1 << (16 - i)} THEN $i")
        .mkString("CASE ", " ", " ELSE 17 END")
      s"""WITH toks AS (
         |  SELECT source, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
         |  FROM documents),
         |hx AS (
         |  SELECT DISTINCT source, token, md5('hll:'||token) AS hh FROM toks),
         |br AS (
         |  SELECT source,
         |    CAST(('0x'||substring(hh, 1, 2)) AS INTEGER) % 64 AS bucket,
         |    $ladder AS r
         |  FROM (SELECT source, hh,
         |          CAST(('0x'||substring(hh, 3, 4)) AS INTEGER) AS v
         |        FROM hx)),
         |regs AS (SELECT source, bucket, max(r) AS r FROM br GROUP BY 1, 2),
         |agg AS (
         |  SELECT source, sum(1.0 / (1 << r)) AS s0,
         |    CAST(count(*) AS BIGINT) AS nb
         |  FROM regs GROUP BY source),
         |fin AS (
         |  SELECT source,
         |    CASE WHEN (0.709 * 4096.0 / (s0 + (64 - nb))) <= 160.0
         |           AND (64 - nb) > 0
         |      THEN 64.0 * ln(64.0 / (64 - nb))
         |      ELSE 0.709 * 4096.0 / (s0 + (64 - nb)) END AS e
         |  FROM agg),
         |ex AS (
         |  SELECT source, CAST(count(DISTINCT token) AS BIGINT) AS n_exact
         |  FROM toks GROUP BY source)
         |SELECT ex.source, n_exact, round(e + 1e-9, 4) AS n_hll
         |FROM ex JOIN fin USING (source)
         |ORDER BY source""".stripMargin
    },

    // q174's replay over lineitem order keys — all 64 registers fill, so
    // the CASE selects the raw harmonic path.
    "q175_hll_raw" -> {
      val ladder = (1 to 16)
        .map(i => s"WHEN v >= ${1 << (16 - i)} THEN $i")
        .mkString("CASE ", " ", " ELSE 17 END")
      s"""WITH ks AS (
         |  SELECT DISTINCT l_returnflag,
         |    md5('hll:'||CAST(l_orderkey AS VARCHAR)) AS hh
         |  FROM lineitem),
         |br AS (
         |  SELECT l_returnflag,
         |    CAST(('0x'||substring(hh, 1, 2)) AS INTEGER) % 64 AS bucket,
         |    $ladder AS r
         |  FROM (SELECT l_returnflag, hh,
         |          CAST(('0x'||substring(hh, 3, 4)) AS INTEGER) AS v
         |        FROM ks)),
         |regs AS (
         |  SELECT l_returnflag, bucket, max(r) AS r FROM br GROUP BY 1, 2),
         |agg AS (
         |  SELECT l_returnflag, sum(1.0 / (1 << r)) AS s0,
         |    CAST(count(*) AS BIGINT) AS nb
         |  FROM regs GROUP BY l_returnflag),
         |fin AS (
         |  SELECT l_returnflag,
         |    CASE WHEN (0.709 * 4096.0 / (s0 + (64 - nb))) <= 160.0
         |           AND (64 - nb) > 0
         |      THEN 64.0 * ln(64.0 / (64 - nb))
         |      ELSE 0.709 * 4096.0 / (s0 + (64 - nb)) END AS e
         |  FROM agg),
         |ex AS (
         |  SELECT l_returnflag,
         |    CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_exact
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT ex.l_returnflag, n_exact, round(e + 1e-9, 4) AS n_hll
         |FROM ex JOIN fin USING (l_returnflag)
         |ORDER BY l_returnflag""".stripMargin
    },

    // Quantile-bin replay: q36's quality score rounded first, the q176
    // bottom-64/type-1 sketch per source, thresholds joined back, exact
    // bucket counts with raw min/max of the pre-rounded scores.
    "q182_quantile_bins" -> {
      def qsel(prefix: String): String = Seq(25, 50, 75)
        .map(q => s"max(CASE WHEN rn = 1 + CAST(((n - 1) * $q - ((n - 1) * $q) % 100) / 100 AS BIGINT) THEN qv END) AS $prefix$q")
        .mkString(",\n    ")
      raw"""WITH r0 AS (
         |  SELECT doc_id, source, text,
         |    CASE WHEN length(text) = 0 THEN 0.0
         |      ELSE CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')) AS DOUBLE) / length(text) END AS punct,
         |    CASE WHEN len(regexp_extract_all(lower(text), '\S+')) = 0 THEN 0.0
         |      ELSE CAST(len(list_filter(regexp_extract_all(lower(text), '\S+'),
         |             t -> t IN ('the','a','an','and','of','to','in','is'))) AS DOUBLE)
         |           / len(regexp_extract_all(lower(text), '\S+')) END AS stop
         |  FROM documents),
         |q AS (
         |  SELECT doc_id, source,
         |    round(least(greatest(
         |      least(CAST(length(text) AS DOUBLE) / 200.0, 1.0)
         |      * (1.0 - punct) * (0.5 + stop), 0.0), 1.0) + 1e-9, 6) AS qv
         |  FROM r0),
         |hx AS (
         |  SELECT source, doc_id, qv,
         |    CAST(('0x'||substring(md5('sq:'||CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) AS h
         |  FROM q),
         |pk AS (
         |  SELECT source, doc_id, qv,
         |    row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS hr
         |  FROM hx),
         |sr AS (
         |  SELECT source, qv,
         |    row_number() OVER (PARTITION BY source ORDER BY qv, doc_id) AS rn,
         |    count(*) OVER (PARTITION BY source) AS n
         |  FROM pk WHERE hr <= 64),
         |sk AS (
         |  SELECT source,
         |    ${qsel("sp")}
         |  FROM sr GROUP BY source),
         |b AS (
         |  SELECT q.source,
         |    CASE WHEN qv <= sp25 THEN 0 WHEN qv <= sp50 THEN 1
         |         WHEN qv <= sp75 THEN 2 ELSE 3 END AS bucket, qv
         |  FROM q JOIN sk USING (source))
         |SELECT source, CAST(bucket AS BIGINT) AS bucket,
         |  CAST(count(*) AS BIGINT) AS n, min(qv) AS lo, max(qv) AS hi
         |FROM b
         |GROUP BY source, bucket
         |ORDER BY source, bucket""".stripMargin
    },

    // Concat-and-slice replay: global token cumsum over the md5 order
    // (the single window is oracle-scale; Spark's side is the chunked
    // two-phase cumsum — same numbers, different plan), sequence span by
    // modulus-subtracted integer division, unnest(range(...)) in the
    // SELECT list (lateral generate_series is unsupported here).
    "q178_seq_slices" ->
      raw"""WITH d AS (
         |  SELECT doc_id,
         |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS t,
         |    md5('slice:'||CAST(doc_id AS VARCHAR)) AS key
         |  FROM documents),
         |o AS (
         |  SELECT doc_id, t,
         |    CAST(coalesce(sum(t) OVER (ORDER BY key, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
         |  FROM d),
         |s AS (
         |  SELECT doc_id, t, off,
         |    unnest(range(CAST((off - off % 256) / 256 AS BIGINT),
         |      CAST(((off + t - 1) - (off + t - 1) % 256) / 256 AS BIGINT) + 1)) AS seq_id
         |  FROM o WHERE t > 0)
         |SELECT doc_id, seq_id, off,
         |  least(off + t, (seq_id + 1) * 256) - greatest(off, seq_id * 256) AS n_tok
         |FROM s
         |ORDER BY doc_id, seq_id""".stripMargin,

    // Sample-quantile replay: bottom-128 by md5 of the order key
    // (ORDER BY h, k — the heap's h-tie rule), type-1 index
    // 1 + ((n−1)·q − ((n−1)·q) % 100)/100 (modulus-subtracted exact
    // integer division, the house keep-count idiom), quantiles picked
    // from the (v, k)-sorted sample and from the full group.
    "q176_sample_quantiles" -> {
      def qsel(prefix: String): String = Seq(25, 50, 75, 90)
        .map(q => s"max(CASE WHEN rn = 1 + CAST(((n - 1) * $q - ((n - 1) * $q) % 100) / 100 AS BIGINT) THEN v END) AS $prefix$q")
        .mkString(",\n    ")
      s"""WITH b AS (
         |  SELECT o_orderstatus AS g, o_orderkey AS k,
         |    CAST(o_totalprice AS DOUBLE) AS v,
         |    CAST(('0x'||substring(md5('sq:'||CAST(o_orderkey AS VARCHAR)), 1, 12)) AS BIGINT) AS h
         |  FROM orders),
         |pk AS (
         |  SELECT g, k, v,
         |    row_number() OVER (PARTITION BY g ORDER BY h, k) AS hr
         |  FROM b),
         |sr AS (
         |  SELECT g, v,
         |    row_number() OVER (PARTITION BY g ORDER BY v, k) AS rn,
         |    count(*) OVER (PARTITION BY g) AS n
         |  FROM pk WHERE hr <= 128),
         |sq AS (
         |  SELECT g, CAST(count(*) AS BIGINT) AS n_sample,
         |    ${qsel("sp")}
         |  FROM sr GROUP BY g),
         |xr AS (
         |  SELECT g, v,
         |    row_number() OVER (PARTITION BY g ORDER BY v, k) AS rn,
         |    count(*) OVER (PARTITION BY g) AS n
         |  FROM b),
         |xq AS (
         |  SELECT g, CAST(count(*) AS BIGINT) AS n_rows,
         |    ${qsel("xp")}
         |  FROM xr GROUP BY g)
         |SELECT g AS o_orderstatus, n_rows, n_sample,
         |  sp25, sp50, sp75, sp90, xp25, xp50, xp75, xp90
         |FROM sq JOIN xq USING (g)
         |ORDER BY o_orderstatus""".stripMargin
    },

    "q140_lm_pruned" ->
      """WITH d AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t,
        |    CAST(('0x'||substring(md5('split:'||CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 10 < 8 AS train
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id, train, t[i] AS w1, t[i+1] AS w2
        |  FROM (SELECT doc_id, train, t, unnest(range(1, len(t))) AS i FROM d)),
        |c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg WHERE train GROUP BY w1, w2
        |       HAVING count(*) >= 2),
        |ctx AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS ctx FROM c2 GROUP BY w1),
        |cont AS (SELECT w2, CAST(sum(c2) AS BIGINT) AS cont FROM c2 GROUP BY w2),
        |tot AS (SELECT CAST(sum(c2) AS DOUBLE) AS t FROM c2),
        |sc AS (
        |  SELECT b.doc_id,
        |    CASE WHEN c2.c2 IS NOT NULL
        |      THEN CAST(c2.c2 AS DOUBLE) / ctx.ctx
        |      ELSE 0.4 * (COALESCE(cont.cont, 0) + 0.5) / tot.t END AS s
        |  FROM bg b
        |  LEFT JOIN c2 ON b.w1 = c2.w1 AND b.w2 = c2.w2
        |  LEFT JOIN ctx ON b.w1 = ctx.w1
        |  LEFT JOIN cont ON b.w2 = cont.w2
        |  CROSS JOIN tot)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  round(avg(ln(s)) + 1e-9, 6) AS lp
        |FROM sc
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    "q98_importance" ->
      """WITH tb AS (
        |  SELECT doc_id,
        |    CAST(('0x'||substring(md5(token), 1, 4)) AS BIGINT) % 256 AS b,
        |    lang = 'en' AS tgt
        |  FROM (SELECT doc_id, lang,
        |          unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
        |        FROM documents)),
        |counts AS (
        |  SELECT b, count(*) AS cr,
        |    count(CASE WHEN tgt THEN 1 END) AS ct
        |  FROM tb GROUP BY b),
        |tot AS (SELECT CAST(sum(cr) AS DOUBLE) AS tr,
        |               CAST(sum(ct) AS DOUBLE) AS tt FROM counts),
        |wts AS (
        |  SELECT b, ln((ct + 1.0) / (tt + 256.0)) - ln((cr + 1.0) / (tr + 256.0)) AS w
        |  FROM counts, tot)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  round(sum(w) + 1e-9, 6) AS score
        |FROM tb JOIN wts USING (b)
        |GROUP BY doc_id
        |ORDER BY score DESC, doc_id
        |LIMIT 20""".stripMargin
  )

  // the q136 BM25 oracle, shared with q193 (stored-index path)
  /** The q270/q271/q274 blocklist: three phrases that occur in the
    * corpus (top bigrams/trigram of the synthetic text) and one that
    * never does — the census must pin absence as a zero row.
    */
  // lazy: referenced by pipelineOracles, which initializes before this
  // point in the object body
  private lazy val blocklistPhrases: Seq[Seq[String]] = Seq(
    Seq("window", "join"), Seq("stream", "column"),
    Seq("big", "order", "scan"), Seq("graft", "blocked", "phrase"))

  /** Shared CTE prefix: per-(doc, phrase) hit counts — one list_filter
    * over start positions per phrase, the exact mirror of
    * [[graft.operators.TextAnalysis.phraseHits]]' HOF (DuckDB's 1-based
    * range/list indexing vs Spark's 0-based sequence + element_at(i+j+1)
    * enumerate the identical starts; `range(1, n)` with n <= 1 is empty,
    * so short docs count 0 without a guard).
    */
  private def phraseCensusSql: String = {
    val blocks = blocklistPhrases.map { ps =>
      val m = ps.length
      val cond = ps.zipWithIndex
        .map { case (p, j) => s"w[i+$j] = '$p'" }.mkString(" AND ")
      s"""SELECT doc_id, '${ps.mkString(" ")}' AS phrase,
         |    CAST(len(list_filter(range(1, len(w) - $m + 2),
         |      i -> $cond)) AS BIGINT) AS n_hits
         |  FROM t""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH t AS (
       |  SELECT doc_id, source, text,
       |    regexp_extract_all(lower(text), '[a-z0-9]+') AS w
       |  FROM documents),
       |h AS (
       |  $blocks)""".stripMargin
  }

  /** The q275/q276 proximity oracle: per-term 0-based position lists,
    * docs holding all terms, min-cover-span via the same start-anchored
    * HOF math as [[graft.operators.TextAnalysis.minCoverSpans]]
    * (list_min of an empty filter is NULL on both engines; the all-mins-
    * non-null CASE mirrors Spark's `when` exactly — never DuckDB's
    * null-skipping greatest alone). Parameterized on the doc source so
    * the rescan gate (documents) and the stored-artifact gate (the
    * hybrid collection's rows) share one text.
    */
  private[queries] def proximitySql(from: String, terms: Seq[String],
      k: Int): String = {
    val idx = terms.indices
    val pCols = idx.map(i =>
      s"list_filter(range(0, len(w)), i -> w[i+1] = '${terms(i)}') AS p$i")
      .mkString(",\n    ")
    val mins = idx.map(i => s"list_min(list_filter(p$i, x -> x >= p))")
    val nullChecks = mins.map(m => s"$m IS NULL").mkString(" OR ")
    val great = mins.reduce((a, b) => s"greatest($a, $b)")
    val nonEmpty = idx.map(i => s"len(p$i) > 0").mkString(" AND ")
    val flat = idx.map(i => s"p$i").mkString(", ")
    s"""WITH t AS (
       |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
       |  FROM $from),
       |p AS (
       |  SELECT doc_id,
       |    $pCols
       |  FROM t),
       |q AS (
       |  SELECT doc_id, ${idx.map(i => s"p$i").mkString(", ")},
       |    flatten([$flat]) AS starts
       |  FROM p WHERE $nonEmpty)
       |SELECT doc_id AS id,
       |  CAST(list_min(list_filter(list_transform(starts, p ->
       |    CASE WHEN $nullChecks THEN NULL
       |         ELSE $great - p + 1 END), x -> x IS NOT NULL)) AS BIGINT)
       |    AS min_span,
       |  CAST(len(starts) AS BIGINT) AS n_occs
       |FROM q
       |ORDER BY min_span, id
       |LIMIT $k""".stripMargin
  }

  /** The q279/q280 query-likelihood oracle: per-doc tf columns,
    * collection stats (ctf per term, |C|), and the μ arithmetic written
    * in [[graft.operators.TextAnalysis.dirichletQL]]'s exact op order
    * (never pre-folded — the q136 rule); the ln-sum accumulates in the
    * same fixed term order and rounds (+1e-9, 6).
    */
  private[queries] def qlSql(from: String, terms: Seq[String],
      mu: String, k: Int): String =
    qlFamilySql(from, terms, i =>
      s"ln((tf$i + $mu * (CAST(ctf$i AS DOUBLE) / CAST(cs AS DOUBLE))) / (dl + $mu))",
      k)

  /** The q281/q282 Jelinek–Mercer oracle: [[qlSql]]'s frames with the JM
    * contribution. EVERY operand is cast to DOUBLE explicitly — DuckDB
    * evaluates `(1 - 0.7)` in exact DECIMAL (0.3 decimal → double ≠
    * Spark's `1.0 - 0.7` IEEE subtraction, verified divergent), so the
    * casts force the engine into Spark's exact op order on doubles (the
    * q136 never-pre-fold rule, decimal-literal edition).
    */
  private[queries] def jmSql(from: String, terms: Seq[String],
      lambda: String, k: Int): String =
    qlFamilySql(from, terms, i =>
      s"ln(CAST($lambda AS DOUBLE) * (CAST(tf$i AS DOUBLE) / CAST(dl AS DOUBLE)) " +
        s"+ (CAST(1 AS DOUBLE) - CAST($lambda AS DOUBLE)) " +
        s"* (CAST(ctf$i AS DOUBLE) / CAST(cs AS DOUBLE)))",
      k)

  /** The q283/q284 MATTR oracle: per-doc sliding-window distinct counts
    * via list slices (`w[i : i+w-1]` is 1-based inclusive = Spark's
    * `slice(toks, i, w)`), whole-doc-TTR fallback under the window, and
    * mattr as ONE exact-integer division — no rounding (q120 doctrine).
    * list_distinct's order instability is harmless here: only its
    * LENGTH is consumed (the round-10 rule).
    */
  private[queries] def mattrSql(from: String, window: Int = 25): String = {
    val wm1 = window - 1
    s"""WITH t AS (
       |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
       |  FROM $from),
       |p AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens, w FROM t),
       |x AS (
       |  SELECT doc_id, n_tokens,
       |    CASE WHEN n_tokens >= $window THEN
       |      CAST(list_sum(list_transform(
       |        range(1, CAST(n_tokens AS INTEGER) - ${wm1 - 1}),
       |        i -> len(list_distinct(w[i : i + $wm1])))) AS BIGINT)
       |    ELSE CAST(len(list_distinct(w)) AS BIGINT) END AS d_sum,
       |    CASE WHEN n_tokens >= $window THEN n_tokens - $wm1
       |         ELSE CAST(0 AS BIGINT) END AS n_windows
       |  FROM p)
       |SELECT doc_id, n_tokens, d_sum, n_windows,
       |  CASE WHEN n_tokens = 0 THEN NULL
       |       WHEN n_windows > 0
       |         THEN CAST(d_sum AS DOUBLE) / CAST(n_windows * $window AS DOUBLE)
       |       ELSE CAST(d_sum AS DOUBLE) / CAST(n_tokens AS DOUBLE) END AS mattr
       |FROM x
       |ORDER BY doc_id""".stripMargin
  }

  /** The q289 RAKE oracle: stopword-run islands via the doc-keyed
    * cumsum (the q272 pattern, positions from the zipped unnest —
    * round-11 convention), deg/freq word scores as explicit double
    * casts, ordered string_agg reassembly, rounded phrase sums, and
    * the earliest-phrase tie-break. The stopword list interpolates
    * from [[graft.operators.TextAnalysis.stopwords]] so the two sides
    * can never drift.
    */
  private[queries] def rakeSql(from: String,
      idOut: String = "doc_id"): String = {
    val stops = graft.operators.TextAnalysis.stopwords
      .map(s => s"'$s'").mkString(", ")
    s"""WITH t AS (
       |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
       |  FROM $from),
       |tok AS (
       |  SELECT doc_id, unnest(range(1, len(w) + 1)) AS i, unnest(w) AS word
       |  FROM t),
       |ph AS (
       |  SELECT doc_id, i, word,
       |    word IN ($stops) AS stop,
       |    sum(CASE WHEN word IN ($stops) THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY i) AS pid
       |  FROM tok),
       |body AS (SELECT doc_id, pid, i, word FROM ph WHERE NOT stop),
       |plen AS (SELECT doc_id, pid, CAST(count(*) AS BIGINT) AS plen
       |         FROM body GROUP BY 1, 2),
       |occ AS (SELECT b.doc_id, b.pid, b.i, b.word, p.plen
       |        FROM body b JOIN plen p
       |          ON p.doc_id = b.doc_id AND p.pid = b.pid),
       |ws AS (SELECT doc_id, word, CAST(sum(plen) AS BIGINT) AS deg,
       |         CAST(count(*) AS BIGINT) AS freq
       |       FROM occ GROUP BY 1, 2),
       |sc AS (SELECT o.doc_id, o.pid, o.i, o.word,
       |         CAST(ws.deg AS DOUBLE) / CAST(ws.freq AS DOUBLE) AS wscore
       |       FROM occ o JOIN ws ON ws.doc_id = o.doc_id AND ws.word = o.word),
       |phr AS (
       |  SELECT doc_id, pid, round(sum(wscore) + 1e-9, 6) AS score,
       |    CAST(count(*) AS BIGINT) AS n_words, min(i) AS ppos,
       |    string_agg(word, ' ' ORDER BY i) AS phrase
       |  FROM sc GROUP BY 1, 2),
       |rk AS (SELECT *, row_number()
       |         OVER (PARTITION BY doc_id ORDER BY score DESC, ppos) AS rn
       |       FROM phr)
       |SELECT doc_id AS $idOut, phrase, score, n_words
       |FROM rk WHERE rn = 1
       |ORDER BY $idOut""".stripMargin
  }

  /** The q285/q286 FIM oracle: the md5 coin and the two 32-bit cut
    * points replayed verbatim (the q82 hex-slice idiom), PSM reassembly
    * with 1-based substr on both engines, md5 signature of the FULL
    * transformed string.
    */
  private[queries] def fimSql(from: String, rate16: Int = 32768,
      seed: String = "fim"): String =
    s"""WITH p AS (
       |  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n_chars,
       |    CAST(('0x' || substring(md5('$seed:coin:' || CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) AS c,
       |    CAST(('0x' || substring(md5('$seed:a:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS ua,
       |    CAST(('0x' || substring(md5('$seed:b:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS ub
       |  FROM $from),
       |x AS (
       |  SELECT doc_id, text, n_chars,
       |    CASE WHEN c < $rate16 AND n_chars >= 2 THEN 1 ELSE 0 END AS fimmed,
       |    CASE WHEN c < $rate16 AND n_chars >= 2
       |      THEN least(ua % (n_chars + 1), ub % (n_chars + 1)) END AS lo,
       |    CASE WHEN c < $rate16 AND n_chars >= 2
       |      THEN greatest(ua % (n_chars + 1), ub % (n_chars + 1)) END AS hi
       |  FROM p),
       |y AS (
       |  SELECT doc_id, n_chars, fimmed, lo, hi,
       |    CASE WHEN fimmed = 1 THEN
       |      '<PRE>' || substr(text, 1, CAST(lo AS INTEGER))
       |      || '<SUF>' || substr(text, CAST(hi + 1 AS INTEGER),
       |           CAST(n_chars - hi AS INTEGER))
       |      || '<MID>' || substr(text, CAST(lo + 1 AS INTEGER),
       |           CAST(hi - lo AS INTEGER))
       |    ELSE text END AS out
       |  FROM x)
       |SELECT doc_id, n_chars, CAST(fimmed AS BIGINT) AS fimmed, lo, hi,
       |  CAST(length(out) AS BIGINT) AS out_len, md5(out) AS out_sig
       |FROM y
       |ORDER BY doc_id""".stripMargin

  /** Shared QL-family oracle frames (per-doc tf columns, collection
    * stats, eligibility filter, rounded ln-sum rank) under a pluggable
    * per-term contribution — the SQL twin of TextAnalysis.qlRank.
    */
  private def qlFamilySql(from: String, terms: Seq[String],
      contribOf: Int => String, k: Int): String = {
    val idx = terms.indices
    val tfCols = idx.map(i =>
      s"CAST(len(list_filter(w, x -> x = '${terms(i)}')) AS BIGINT) AS tf$i")
      .mkString(",\n    ")
    val ctfCols = idx.map(i => s"CAST(sum(tf$i) AS BIGINT) AS ctf$i")
      .mkString(", ")
    val contrib = idx.map(contribOf).mkString("\n    + ")
    val anyTf = idx.map(i => s"tf$i").mkString(" + ")
    s"""WITH t AS (
       |  SELECT doc_id AS id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
       |  FROM $from),
       |pd AS (
       |  SELECT id, CAST(len(w) AS BIGINT) AS dl,
       |    $tfCols
       |  FROM t),
       |st AS (SELECT CAST(sum(dl) AS BIGINT) AS cs, $ctfCols FROM pd)
       |SELECT id, round(($contrib) + 1e-9, 6) AS ql, dl
       |FROM pd CROSS JOIN st
       |WHERE $anyTf > 0
       |ORDER BY ql DESC, id
       |LIMIT $k""".stripMargin
  }

  /** q271's oracle, reused verbatim by the q274 stream twin. */
  private lazy val blocklistScrubSql: String = phraseCensusSql +
    """,
      |tot AS (SELECT doc_id, sum(n_hits) AS th FROM h GROUP BY doc_id)
      |SELECT d.source AS source, count(*) AS n_kept,
      |  CAST(sum(length(d.text)) AS BIGINT) AS n_chars
      |FROM documents d JOIN tot ON tot.doc_id = d.doc_id
      |WHERE th = 0
      |GROUP BY d.source
      |ORDER BY source""".stripMargin

  /** The q268 unigram-LM replay: seed census, seed vocabulary, and for
    * each EM round the Viterbi DP as one MATERIALIZED CTE per character
    * position (each layer is read by up to `maxPieceLen` later layers
    * AND the backtrace — the q203 inlining rule), the freq-weighted
    * backtrace counts, and the char-backstop re-estimation; then the
    * final prune + M-step. Score comparisons replay Spark's exact op
    * order (u.score + m.logp on bit-identical inputs), so the per-word
    * row_number argmax can never disagree.
    */
  private def unigramLayersSql(vocabTarget: Int, emRounds: Int,
      seedSize: Int, maxPieceLen: Int, maxWordLen: Int,
      encodePass: Boolean = false): String = {
    val sb = new StringBuilder
    // one Viterbi DP block (match table, position layers, backtrace,
    // emissions) under a given vocabulary CTE — shared by every EM round
    // and by the final encode pass
    def dpLayers(tag: String, vocabCte: String): Unit = {
      sb ++= s""",
        |m$tag AS MATERIALIZED (
        |  SELECT o.word, o.s, o.e, o.piece, v.logp
        |  FROM occ o JOIN $vocabCte v ON v.piece = o.piece),
        |u${tag}_0 AS (
        |  SELECT word, 0 AS pos, CAST(0 AS DOUBLE) AS score,
        |    -1 AS bestj, CAST(NULL AS VARCHAR) AS piece FROM w0)""".stripMargin
      for (i <- 1 to maxWordLen) {
        sb ++= s""",
          |d${tag}_$i AS MATERIALIZED (
          |  SELECT word, $i AS pos, sc AS score, s AS bestj, piece FROM (
          |    SELECT m.word, m.s, m.piece, u.score + m.logp AS sc,
          |      row_number() OVER (PARTITION BY m.word
          |        ORDER BY (u.score + m.logp) DESC, m.s) AS rn
          |    FROM m$tag m JOIN u${tag}_${i - 1} u
          |      ON u.word = m.word AND u.pos = m.s
          |    WHERE m.e = $i)
          |  WHERE rn = 1),
          |u${tag}_$i AS MATERIALIZED (
          |  SELECT * FROM u${tag}_${i - 1} UNION ALL SELECT * FROM d${tag}_$i)""".stripMargin
      }
      sb ++= s""",
        |b${tag}_0 AS (SELECT word, freq, length(word) AS pos FROM w0)""".stripMargin
      for (k <- 1 to maxWordLen) {
        sb ++= s""",
          |b${tag}_$k AS MATERIALIZED (
          |  SELECT b.word, b.freq, u.bestj AS pos, u.piece
          |  FROM b${tag}_${k - 1} b JOIN u${tag}_$maxWordLen u
          |    ON u.word = b.word AND u.pos = b.pos
          |  WHERE b.pos > 0)""".stripMargin
      }
      val emUnion = (1 to maxWordLen)
        .map(k => s"SELECT word, freq, piece FROM b${tag}_$k")
        .mkString("\n  UNION ALL\n  ")
      sb ++= s""",
        |em$tag AS (
        |  $emUnion)""".stripMargin
    }
    sb ++= s"""WITH w0 AS MATERIALIZED (
      |  SELECT word, CAST(count(*) AS BIGINT) AS freq
      |  FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
      |        FROM documents)
      |  WHERE length(word) <= $maxWordLen
      |  GROUP BY word),
      |occ AS MATERIALIZED (
      |  SELECT word, freq, s, s + l AS e, substring(word, s + 1, l) AS piece
      |  FROM (
      |    SELECT word, freq, s,
      |      unnest(range(1, least($maxPieceLen, length(word) - s) + 1)) AS l
      |    FROM (SELECT word, freq, unnest(range(0, length(word))) AS s
      |          FROM w0))),
      |census AS MATERIALIZED (
      |  SELECT piece, CAST(sum(freq) AS BIGINT) AS c FROM occ GROUP BY piece),
      |chars AS (SELECT piece, c FROM census WHERE length(piece) = 1),
      |seedm AS (SELECT piece, c FROM census WHERE length(piece) > 1
      |          ORDER BY c DESC, piece LIMIT $seedSize),
      |v0p AS (
      |  SELECT piece, c + 1 AS cnt, CAST(1 AS BIGINT) AS is_char FROM chars
      |  UNION ALL
      |  SELECT piece, c AS cnt, CAST(0 AS BIGINT) AS is_char FROM seedm),
      |v0 AS MATERIALIZED (
      |  SELECT piece, cnt, is_char,
      |    round(ln(CAST(cnt AS DOUBLE) / t), 12) AS logp
      |  FROM v0p CROSS JOIN (SELECT CAST(sum(cnt) AS DOUBLE) AS t FROM v0p))""".stripMargin
    for (r <- 1 to emRounds) {
      dpLayers(r.toString, s"v${r - 1}")
      sb ++= s""",
        |cnt$r AS MATERIALIZED (
        |  SELECT piece, CAST(sum(freq) AS BIGINT) AS c2
        |  FROM em$r GROUP BY piece),
        |v${r}p AS (
        |  SELECT ch.piece, CAST(coalesce(c.c2, 0) + 1 AS BIGINT) AS cnt,
        |    CAST(1 AS BIGINT) AS is_char
        |  FROM chars ch LEFT JOIN cnt$r c ON c.piece = ch.piece
        |  UNION ALL
        |  SELECT piece, c2 AS cnt, CAST(0 AS BIGINT) AS is_char
        |  FROM cnt$r WHERE length(piece) > 1),
        |v$r AS MATERIALIZED (
        |  SELECT piece, cnt, is_char,
        |    round(ln(CAST(cnt AS DOUBLE) / t), 12) AS logp
        |  FROM v${r}p CROSS JOIN (SELECT CAST(sum(cnt) AS DOUBLE) AS t FROM v${r}p))""".stripMargin
    }
    sb ++= s""",
      |pr AS (
      |  SELECT piece, cnt, is_char FROM v$emRounds WHERE is_char = 1
      |  UNION ALL
      |  SELECT piece, cnt, is_char FROM (
      |    SELECT piece, cnt, is_char,
      |      row_number() OVER (ORDER BY cnt DESC, piece) AS rn
      |    FROM v$emRounds WHERE is_char = 0)
      |  WHERE rn <= $vocabTarget -
      |    (SELECT count(*) FROM v$emRounds WHERE is_char = 1))""".stripMargin
    if (!encodePass) {
      sb ++= s"""
        |SELECT piece, is_char, cnt,
        |  round(ln(CAST(cnt AS DOUBLE) / t), 12) AS logp
        |FROM pr CROSS JOIN (SELECT CAST(sum(cnt) AS DOUBLE) AS t FROM pr)
        |ORDER BY piece""".stripMargin
    } else {
      // final M-step vocabulary, then one more Viterbi pass over every
      // distinct word under it — the encode-time usage census
      sb ++= s""",
        |vf AS MATERIALIZED (
        |  SELECT piece, round(ln(CAST(cnt AS DOUBLE) / t), 12) AS logp
        |  FROM pr CROSS JOIN (SELECT CAST(sum(cnt) AS DOUBLE) AS t FROM pr))""".stripMargin
      dpLayers("e", "vf")
      sb ++= s"""
        |SELECT piece,
        |  CAST(count(DISTINCT word) AS BIGINT) AS n_words,
        |  CAST(sum(freq) AS BIGINT) AS uses
        |FROM eme GROUP BY piece
        |ORDER BY piece""".stripMargin
    }
    sb.toString
  }

  private lazy val q136Oracle =
      """WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
        |  FROM documents),
        |pd AS (
        |  SELECT doc_id, CAST(len(t) AS BIGINT) AS dl,
        |    CAST(len(list_filter(t, x -> x = 'vector')) AS BIGINT) AS tf0,
        |    CAST(len(list_filter(t, x -> x = 'data')) AS BIGINT) AS tf1,
        |    CAST(len(list_filter(t, x -> x = 'merge')) AS BIGINT) AS tf2
        |  FROM toks),
        |st AS (
        |  SELECT count(*) AS n,
        |    CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
        |    sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
        |    sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
        |    sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
        |  FROM pd)
        |SELECT doc_id, round(
        |    (CASE WHEN tf0 > 0 THEN ln((n - df0 + 0.5)/(df0 + 0.5) + 1)
        |      * (tf0 * (1.2 + 1)) / (tf0 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
        |      ELSE 0.0 END)
        |  + (CASE WHEN tf1 > 0 THEN ln((n - df1 + 0.5)/(df1 + 0.5) + 1)
        |      * (tf1 * (1.2 + 1)) / (tf1 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
        |      ELSE 0.0 END)
        |  + (CASE WHEN tf2 > 0 THEN ln((n - df2 + 0.5)/(df2 + 0.5) + 1)
        |      * (tf2 * (1.2 + 1)) / (tf2 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
        |      ELSE 0.0 END) + 1e-9, 6) AS bm25, dl
        |FROM pd CROSS JOIN st
        |WHERE tf0 + tf1 + tf2 > 0
        |ORDER BY bm25 DESC, doc_id
        |LIMIT 20""".stripMargin

  val oracles: Map[String, String] = Map(

    "q76_pack_bins" ->
      """WITH t AS (
        |  SELECT source, doc_id,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT source, doc_id, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |                        ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM t)
        |SELECT source, CAST(floor((cum - n_tokens) / 512) AS BIGINT) AS bin,
        |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
        |FROM c
        |GROUP BY 1, 2
        |ORDER BY source, bin""".stripMargin,

    "q35_lang_stats" ->
      """SELECT lang, count(*) AS n_docs,
        |  round(avg(n_chars), 4) AS avg_chars,
        |  round(avg(len(regexp_extract_all(text, '\S+'))), 4) AS avg_tokens
        |FROM documents
        |GROUP BY lang
        |ORDER BY lang""".stripMargin,

    "q36_quality" ->
      """WITH ratios AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
        |    length(text) AS n_chars,
        |    CASE WHEN length(text) = 0 THEN 0.0
        |      ELSE CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')) AS DOUBLE) / length(text) END AS punct,
        |    CASE WHEN len(regexp_extract_all(lower(text), '\S+')) = 0 THEN 0.0
        |      ELSE CAST(len(list_filter(regexp_extract_all(lower(text), '\S+'),
        |             t -> t IN ('the','a','an','and','of','to','in','is'))) AS DOUBLE)
        |           / len(regexp_extract_all(lower(text), '\S+')) END AS stop
        |  FROM documents)
        |SELECT doc_id, n_tokens,
        |  round(punct + 1e-9, 6) AS punct_ratio,
        |  round(stop + 1e-9, 6) AS stopword_ratio,
        |  round(least(greatest(
        |    least(CAST(n_chars AS DOUBLE) / 200.0, 1.0)
        |    * (1.0 - punct) * (0.5 + stop), 0.0), 1.0) + 1e-9, 6) AS quality
        |FROM ratios
        |ORDER BY doc_id""".stripMargin,

    "q90_winnowing" ->
      """WITH fp AS (
        |  SELECT doc_id,
        |    CASE WHEN length(text) - 7 - 3 <= 0 THEN []::VARCHAR[]
        |    ELSE list_distinct(list_transform(range(1, length(text) - 7 - 3 + 1),
        |      j -> list_min(list_transform(range(j, j + 4),
        |        i -> substring(md5(substr(text, i, 8)), 1, 8))))) END AS fps
        |  FROM documents)
        |SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fp,
        |  CASE WHEN len(fps) = 0 THEN NULL
        |    ELSE md5(list_aggregate(list_sort(fps), 'string_agg', '')) END AS fp_sig
        |FROM fp
        |ORDER BY doc_id""".stripMargin,

    "q88_boilerplate" ->
      """WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\S+') w FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |    w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4] AS shingle
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 3)) AS i FROM toks))
        |SELECT shingle, count(*) AS n_docs
        |FROM sh
        |GROUP BY shingle
        |ORDER BY n_docs DESC, shingle
        |LIMIT 20""".stripMargin,

    "q84_repetition" ->
      """WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\S+') w FROM documents),
        |g2 AS (
        |  SELECT doc_id, count(*) AS total,
        |    count(DISTINCT w[i]||' '||w[i+1]) AS dist
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i FROM toks)
        |  GROUP BY doc_id),
        |g3 AS (
        |  SELECT doc_id, count(*) AS total,
        |    count(DISTINCT w[i]||' '||w[i+1]||' '||w[i+2]) AS dist
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i FROM toks)
        |  GROUP BY doc_id)
        |SELECT t.doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
        |  round(COALESCE(1.0 - CAST(g2.dist AS DOUBLE) / g2.total, 0.0) + 1e-9, 6) AS dup_2gram,
        |  round(COALESCE(1.0 - CAST(g3.dist AS DOUBLE) / g3.total, 0.0) + 1e-9, 6) AS dup_3gram
        |FROM toks t LEFT JOIN g2 USING (doc_id) LEFT JOIN g3 USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "q93_vocabulary" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
        |  FROM documents),
        |counts AS (
        |  SELECT token, count(*) AS n_occ,
        |    CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        |  FROM toks GROUP BY token),
        |tot AS (SELECT CAST(sum(n_occ) AS DOUBLE) AS total FROM counts),
        |top AS (SELECT * FROM counts ORDER BY n_occ DESC, token LIMIT 100),
        |r AS (
        |  SELECT *,
        |    CAST(row_number() OVER (ORDER BY n_occ DESC, token) AS BIGINT) AS rank,
        |    sum(n_occ) OVER (ORDER BY n_occ DESC, token ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM top)
        |SELECT rank, token, n_occ, n_docs,
        |  round(CAST(cum AS DOUBLE) / total + 1e-9, 6) AS cum_share
        |FROM r, tot
        |ORDER BY rank""".stripMargin,

    "q94_pii_scrub" ->
      """WITH synth AS (
        |  SELECT doc_id, concat_ws(' ', text, 'contact:',
        |    'user'||CAST(doc_id AS VARCHAR)||'@ex'||CAST(doc_id % 7 AS VARCHAR)||'.com',
        |    '+1-555-'||lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
        |    '10.'||CAST(doc_id % 256 AS VARCHAR)||'.'||CAST((doc_id * 3) % 256 AS VARCHAR)||'.'||CAST((doc_id * 7) % 256 AS VARCHAR)) AS s
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(s, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
        |  CAST(len(regexp_extract_all(s, '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phone,
        |  CAST(len(regexp_extract_all(s, '([0-9]{1,3}\.){3}[0-9]{1,3}')) AS BIGINT) AS n_ip,
        |  md5(regexp_replace(regexp_replace(regexp_replace(s,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
        |    '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g')) AS scrub_sig
        |FROM synth
        |ORDER BY doc_id""".stripMargin,

    "q125_source_overlap" ->
      """WITH toks AS (
        |  SELECT source, regexp_extract_all(text, '\S+') AS w FROM documents),
        |sh AS (
        |  SELECT DISTINCT source,
        |    w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4] AS shingle
        |  FROM (SELECT source, w, unnest(range(1, len(w) - 3)) AS i FROM toks)),
        |tot AS (SELECT source, count(*) AS n FROM sh GROUP BY source),
        |p AS (
        |  SELECT a.source AS src_a, b.source AS src_b,
        |    CAST(count(*) AS BIGINT) AS n_shared
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
        |  GROUP BY a.source, b.source)
        |SELECT src_a, src_b, n_shared,
        |  round(CAST(n_shared AS DOUBLE) / (ta.n + tb.n - n_shared) + 1e-9, 6) AS jaccard
        |FROM p
        |JOIN tot ta ON p.src_a = ta.source
        |JOIN tot tb ON p.src_b = tb.source
        |ORDER BY src_a, src_b""".stripMargin,

    "q122_temperature" ->
      """WITH t AS (
        |  SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5('temp:'||CAST(doc_id AS VARCHAR)), doc_id) AS rn,
        |    count(*) OVER (PARTITION BY source) AS n
        |  FROM documents)
        |SELECT source, count(*) AS n_kept, CAST(max(n) AS BIGINT) AS n_total
        |FROM t WHERE rn <= ceil(sqrt(CAST(n AS DOUBLE)))
        |GROUP BY source
        |ORDER BY source""".stripMargin,

    "q121_corpus_build" ->
      """WITH toks AS (
        |  SELECT doc_id, text, regexp_extract_all(text, '\S+') AS w FROM documents),
        |g2 AS (
        |  SELECT doc_id, count(*) AS total,
        |    count(DISTINCT w[i]||' '||w[i+1]) AS dist
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i FROM toks)
        |  GROUP BY doc_id),
        |b AS (
        |  SELECT t.doc_id,
        |    len(regexp_extract_all(lower(text), '\S+')) AS n,
        |    CASE WHEN len(regexp_extract_all(lower(text), '\S+')) = 0 THEN 0.0
        |      ELSE CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
        |           / len(regexp_extract_all(lower(text), '\S+')) END AS mwl,
        |    CASE WHEN length(text) = 0 THEN 0.0
        |      ELSE CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')) AS DOUBLE)
        |           / length(text) END AS punct,
        |    len(list_filter(list_distinct(regexp_extract_all(lower(text), '\S+')),
        |      x -> x IN ('the','a','an','and','of','to','in','is'))) AS nstop,
        |    COALESCE(1.0 - CAST(g2.dist AS DOUBLE) / g2.total, 0.0) AS dup2
        |  FROM toks t LEFT JOIN g2 USING (doc_id)),
        |keepids AS (
        |  SELECT doc_id FROM b
        |  WHERE n >= 20 AND n <= 100000 AND mwl >= 3.0 AND mwl <= 10.0
        |    AND punct <= 0.2 AND nstop >= 2 AND dup2 <= 0.3),
        |fps AS (
        |  SELECT d.doc_id, d.text, d.source,
        |    md5(trim(regexp_replace(regexp_replace(lower(d.text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS fp
        |  FROM documents d JOIN keepids USING (doc_id)),
        |dedup AS (
        |  SELECT doc_id, text, source FROM (
        |    SELECT *, min(doc_id) OVER (PARTITION BY fp) AS keep_id FROM fps)
        |  WHERE doc_id = keep_id),
        |ct AS (SELECT doc_id, source, regexp_extract_all(text, '\S+') AS tk FROM dedup),
        |cc AS (
        |  SELECT doc_id, source, tk,
        |    CASE WHEN len(tk) <= 0 THEN 0
        |         ELSE 1 + greatest((len(tk) - 40 + 29) // 30, 0) END AS nc
        |  FROM ct),
        |cx AS (SELECT doc_id, source, tk, unnest(range(0, nc)) AS i FROM cc),
        |chunks AS (
        |  SELECT doc_id * 1000 + i AS uid, source,
        |    CAST(len(tk[i*30+1 : i*30+40]) AS BIGINT) AS n_tokens
        |  FROM cx),
        |packed AS (
        |  SELECT source, uid, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY source ORDER BY uid
        |                        ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM chunks)
        |SELECT source, CAST(floor((cum - n_tokens) / 512) AS BIGINT) AS bin,
        |  count(*) AS n_chunks, CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
        |FROM packed
        |GROUP BY 1, 2
        |ORDER BY source, bin""".stripMargin,

    "q139_dedup_pack" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_extract_all(text, '\S+') AS toks
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, toks,
        |    CASE WHEN len(toks) <= 0 THEN 0
        |         ELSE 1 + greatest((len(toks) - 20 + 19) // 20, 0)
        |    END AS nc
        |  FROM t),
        |spans AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
        |    array_to_string(toks[i*20+1 : i*20+20], ' ') AS chunk
        |  FROM (SELECT doc_id, toks, unnest(range(0, nc)) AS i FROM c)),
        |f AS (SELECT md5(chunk) AS sig, count(*) AS n
        |      FROM spans GROUP BY md5(chunk)),
        |cleaned AS (
        |  SELECT doc_id,
        |    coalesce(
        |      string_agg(chunk, ' ' ORDER BY chunk_id) FILTER (WHERE f.n <= 1),
        |      '') AS text
        |  FROM spans JOIN f ON md5(chunk) = f.sig
        |  GROUP BY doc_id),
        |ct AS (
        |  SELECT cl.doc_id, d.source, regexp_extract_all(cl.text, '\S+') AS tk
        |  FROM cleaned cl JOIN documents d USING (doc_id)),
        |cc AS (
        |  SELECT doc_id, source, tk,
        |    CASE WHEN len(tk) <= 0 THEN 0
        |         ELSE 1 + greatest((len(tk) - 40 + 29) // 30, 0) END AS nc
        |  FROM ct),
        |cx AS (SELECT doc_id, source, tk, unnest(range(0, nc)) AS i FROM cc),
        |chunks AS (
        |  SELECT doc_id * 1000 + i AS uid, source,
        |    CAST(len(tk[i*30+1 : i*30+40]) AS BIGINT) AS n_tokens
        |  FROM cx),
        |packed AS (
        |  SELECT source, uid, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY source ORDER BY uid
        |                        ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM chunks)
        |SELECT source, CAST(floor((cum - n_tokens) / 512) AS BIGINT) AS bin,
        |  count(*) AS n_chunks, CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
        |FROM packed
        |GROUP BY 1, 2
        |ORDER BY source, bin""".stripMargin,

    "q120_gopher_rules" ->
      """WITH toks AS (
        |  SELECT doc_id, text, regexp_extract_all(text, '\S+') AS w FROM documents),
        |g2 AS (
        |  SELECT doc_id, count(*) AS total,
        |    count(DISTINCT w[i]||' '||w[i+1]) AS dist
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i FROM toks)
        |  GROUP BY doc_id),
        |b AS (
        |  SELECT t.doc_id,
        |    CAST(len(regexp_extract_all(lower(text), '\S+')) AS BIGINT) AS n,
        |    CASE WHEN len(regexp_extract_all(lower(text), '\S+')) = 0 THEN 0.0
        |      ELSE CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
        |           / len(regexp_extract_all(lower(text), '\S+')) END AS mwl,
        |    CASE WHEN length(text) = 0 THEN 0.0
        |      ELSE CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')) AS DOUBLE)
        |           / length(text) END AS punct,
        |    len(list_filter(list_distinct(regexp_extract_all(lower(text), '\S+')),
        |      x -> x IN ('the','a','an','and','of','to','in','is'))) AS nstop,
        |    COALESCE(1.0 - CAST(g2.dist AS DOUBLE) / g2.total, 0.0) AS dup2
        |  FROM toks t LEFT JOIN g2 USING (doc_id))
        |SELECT doc_id, n AS n_words,
        |  n >= 20 AND n <= 100000 AS flag_word_count,
        |  mwl >= 3.0 AND mwl <= 10.0 AS flag_word_len,
        |  punct <= 0.2 AS flag_punct,
        |  nstop >= 2 AS flag_stopwords,
        |  dup2 <= 0.3 AS flag_repetition,
        |  (n >= 20 AND n <= 100000) AND (mwl >= 3.0 AND mwl <= 10.0)
        |    AND punct <= 0.2 AND nstop >= 2 AND dup2 <= 0.3 AS keep
        |FROM b
        |ORDER BY doc_id""".stripMargin,

    "q119_winnow_pairs" ->
      """WITH fp AS (
        |  SELECT doc_id,
        |    CASE WHEN length(text) - 7 - 3 <= 0 THEN []::VARCHAR[]
        |    ELSE list_distinct(list_transform(range(1, length(text) - 7 - 3 + 1),
        |      j -> list_min(list_transform(range(j, j + 4),
        |        i -> substring(md5(substr(text, i, 8)), 1, 8))))) END AS fps
        |  FROM documents),
        |x AS (SELECT doc_id, unnest(fps) AS f FROM fp),
        |ok AS (SELECT f FROM x GROUP BY f HAVING count(*) <= 50),
        |xc AS (SELECT doc_id, f FROM x JOIN ok USING (f)),
        |p AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |    CAST(count(*) AS BIGINT) AS n_shared_fp
        |  FROM xc a JOIN xc b USING (f)
        |  WHERE a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id
        |  HAVING count(*) >= 3)
        |SELECT a_id, b_id, n_shared_fp FROM p
        |ORDER BY n_shared_fp DESC, a_id, b_id
        |LIMIT 100""".stripMargin,

    "q118_collocations" ->
      """WITH d AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
        |  FROM documents),
        |bg AS (
        |  SELECT t[i] AS w1, t[i+1] AS w2
        |  FROM (SELECT t, unnest(range(1, len(t))) AS i FROM d)),
        |c2 AS (
        |  SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2
        |  HAVING count(*) >= 5),
        |uni AS (
        |  SELECT w, count(*) AS c1
        |  FROM (SELECT unnest(t) AS w FROM d) GROUP BY w),
        |tot AS (SELECT CAST(sum(c1) AS DOUBLE) AS t FROM uni)
        |SELECT w1, w2, c2,
        |  round(ln(CAST(c2 AS DOUBLE) * tot.t /
        |    (CAST(u1.c1 AS DOUBLE) * u2.c1)) + 1e-9, 6) AS pmi
        |FROM c2
        |JOIN uni u1 ON c2.w1 = u1.w
        |JOIN uni u2 ON c2.w2 = u2.w
        |CROSS JOIN tot
        |ORDER BY pmi DESC, w1, w2
        |LIMIT 20""".stripMargin,

    "q117_augment" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_extract_all(text, '\S+') AS toks
        |  FROM documents),
        |x AS (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i FROM t),
        |k AS (
        |  SELECT doc_id, i, toks[i] AS tok FROM x
        |  WHERE CAST(('0x'||substring(md5(
        |      'aug:'||CAST(doc_id AS VARCHAR)||':'||CAST(i - 1 AS VARCHAR)), 1, 4))
        |    AS BIGINT) % 10 >= 1),
        |agg AS (
        |  SELECT doc_id, count(*) AS cnt,
        |    md5(string_agg(tok, ' ' ORDER BY i)) AS sig
        |  FROM k GROUP BY doc_id)
        |SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_orig,
        |  CAST(COALESCE(agg.cnt, 0) AS BIGINT) AS n_kept,
        |  COALESCE(agg.sig, md5('')) AS aug_sig
        |FROM t LEFT JOIN agg USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "q115_weighted_sample" ->
      """SELECT doc_id, n_chars,
        |  round(ln((CAST(('0x'||substring(md5('ws:'||CAST(doc_id AS VARCHAR)), 1, 4))
        |    AS BIGINT) + 1.0) / 65537.0) / n_chars, 9) AS skey
        |FROM documents
        |WHERE n_chars > 0
        |ORDER BY skey DESC, doc_id
        |LIMIT 20""".stripMargin,

    "q293_mg_heavyhitters" ->
      """WITH tok AS (
        |  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        |  FROM documents),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tok),
        |c AS (SELECT term, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY 1)
        |SELECT c.term, c.n
        |FROM c CROSS JOIN tot
        |WHERE c.n * 32 > tot.n
        |ORDER BY c.n DESC, c.term""".stripMargin,

    "q112_cms_heavyhitters" ->
      """WITH toks AS (
        |  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
        |  FROM documents),
        |rb AS (
        |  SELECT token, r,
        |    CAST(('0x'||substring(md5('cms'||CAST(r AS VARCHAR)||':'||token), 1, 4))
        |      AS BIGINT) % 256 AS bucket
        |  FROM toks, (SELECT unnest(range(0, 4)) AS r)),
        |tab AS (SELECT r, bucket, count(*) AS c FROM rb GROUP BY r, bucket),
        |top AS (
        |  SELECT token, CAST(count(*) AS BIGINT) AS n_true
        |  FROM toks GROUP BY token
        |  ORDER BY n_true DESC, token LIMIT 20),
        |est AS (
        |  SELECT t.token, CAST(min(tab.c) AS BIGINT) AS n_cms
        |  FROM (SELECT token, r,
        |          CAST(('0x'||substring(md5('cms'||CAST(r AS VARCHAR)||':'||token), 1, 4))
        |            AS BIGINT) % 256 AS bucket
        |        FROM top, (SELECT unnest(range(0, 4)) AS r)) t
        |  JOIN tab USING (r, bucket)
        |  GROUP BY t.token)
        |SELECT token, n_true, n_cms
        |FROM top JOIN est USING (token)
        |ORDER BY n_true DESC, token""".stripMargin,

    // nMerges generated CTE layers (the q108 oracle pattern): each layer
    // counts pairs over the previous vocabulary state, picks the best,
    // and applies the boundary-safe double-space replace.
    "q129_bpe_merges" -> {
      bpeLayersSql(10) + "\n" + (1 to 10)
        .map(i => s"SELECT CAST($i AS BIGINT) AS rank, a, b, n FROM b$i")
        .mkString(" UNION ALL ") + "\nORDER BY rank"
    },

    "q239_wordpiece" -> {
      wordPieceLayersSql(10) + "\n" + (1 to 10)
        .map(i => s"SELECT CAST($i AS BIGINT) AS rank, a, b, n, ca, cb, score FROM b$i")
        .mkString(" UNION ALL ") + "\nORDER BY rank"
    },

    // the full unigram-LM training replay (seed → 2 Viterbi EM rounds →
    // prune → final M-step) as generated MATERIALIZED layers
    "q268_unigram_lm" ->
      unigramLayersSql(vocabTarget = 64, emRounds = 2, seedSize = 256,
        maxPieceLen = 8, maxWordLen = 16),

    // the training replay PLUS one more generated Viterbi pass under the
    // pruned vocabulary — the encode-time usage census
    "q273_unigram_encode" ->
      unigramLayersSql(vocabTarget = 64, emRounds = 2, seedSize = 256,
        maxPieceLen = 8, maxWordLen = 16, encodePass = true),

    "q270_phrase_census" -> (phraseCensusSql +
      """
        |SELECT phrase,
        |  CAST(sum(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
        |  CAST(sum(n_hits) AS BIGINT) AS n_hits
        |FROM h GROUP BY phrase
        |ORDER BY phrase""".stripMargin),

    "q271_blocklist_scrub" -> blocklistScrubSql,

    "q275_prox_search" ->
      proximitySql("documents", Seq("order", "fast", "scan"), 20),

    "q279_ql_rank" ->
      qlSql("documents", Seq("vector", "data", "merge"), "2000.0", 20),

    "q281_jm_rank" ->
      jmSql("documents", Seq("vector", "data", "merge"), "0.7", 20),

    "q283_mattr" -> mattrSql("documents"),

    "q285_fim" -> fimSql("documents"),

    "q289_rake" -> rakeSql("documents"),

    "q307_t_closeness" ->
      """WITH csv AS (
        |  SELECT source, n_chars // 50 AS len_bucket, lang,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM documents GROUP BY 1, 2, 3),
        |ctot AS (SELECT source, len_bucket, CAST(sum(n) AS BIGINT) AS nc
        |         FROM csv GROUP BY 1, 2),
        |gv AS (SELECT lang, CAST(sum(n) AS BIGINT) AS gvn
        |       FROM csv GROUP BY 1),
        |gt AS (SELECT CAST(sum(gvn) AS BIGINT) AS g FROM gv)
        |SELECT c.source, c.len_bucket, max(t.nc) AS n,
        |  round((1.0 + sum(
        |      abs(CAST(c.n AS DOUBLE) / CAST(t.nc AS DOUBLE)
        |        - CAST(gv.gvn AS DOUBLE) / CAST(gt.g AS DOUBLE))
        |      - CAST(gv.gvn AS DOUBLE) / CAST(gt.g AS DOUBLE))) / 2
        |    + 1e-9, 6) AS tvd
        |FROM csv c
        |JOIN ctot t ON t.source = c.source AND t.len_bucket = c.len_bucket
        |JOIN gv ON gv.lang = c.lang
        |CROSS JOIN gt
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "q306_l_diversity" ->
      """WITH d AS (
        |  SELECT DISTINCT source, n_chars // 50 AS len_bucket, lang
        |  FROM documents),
        |cls AS (
        |  SELECT source, len_bucket, CAST(count(*) AS BIGINT) AS nd
        |  FROM d GROUP BY 1, 2)
        |SELECT CAST(count(*) AS BIGINT) AS n_classes,
        |  CAST(sum(CASE WHEN nd < 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_risk_classes,
        |  CAST(min(nd) AS BIGINT) AS min_diversity
        |FROM cls""".stripMargin,

    "q305_k_anonymity" ->
      """WITH cls AS (
        |  SELECT lang, source, n_chars // 50 AS len_bucket,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM documents GROUP BY 1, 2, 3)
        |SELECT CAST(count(*) AS BIGINT) AS n_classes,
        |  CAST(sum(n) AS BIGINT) AS n_rows,
        |  CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_risk_classes,
        |  CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
        |    AS n_risk_rows,
        |  CAST(min(n) AS BIGINT) AS min_class_size
        |FROM cls""".stripMargin,

    // the q298 PPMI replay: pair explode via the SELECT-list unnest of a
    // column-bounded slice (the round-5 lateral rule), unordered CASE
    // canonicalization, UNION ALL margins, 1-row totals, the ln in the
    // operator's exact op order.
    "q298_ppmi" ->
      """WITH t AS (
        |  SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS w
        |  FROM documents),
        |f AS (SELECT w FROM t WHERE len(w) >= 2),
        |p0 AS (SELECT w, unnest(range(1, len(w))) AS i FROM f),
        |p1 AS (SELECT w, i, unnest(w[i + 1 : i + 2]) AS x FROM p0),
        |pr AS (
        |  SELECT CASE WHEN w[i] <= x THEN w[i] ELSE x END AS a,
        |         CASE WHEN w[i] <= x THEN x ELSE w[i] END AS b
        |  FROM p1),
        |nab AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n_ab
        |        FROM pr GROUP BY 1, 2),
        |mg AS (
        |  SELECT w, CAST(sum(n_ab) AS BIGINT) AS n_w FROM (
        |    SELECT a AS w, n_ab FROM nab
        |    UNION ALL SELECT b AS w, n_ab FROM nab)
        |  GROUP BY w),
        |tt AS (SELECT CAST(sum(n_ab) AS BIGINT) AS t FROM nab),
        |mm AS (SELECT CAST(sum(n_w) AS BIGINT) AS m FROM mg)
        |SELECT n.a, n.b, n.n_ab, ma.n_w AS n_a, mb.n_w AS n_b,
        |  round(ln((CAST(n.n_ab AS DOUBLE) / CAST(tt.t AS DOUBLE))
        |    / ((CAST(ma.n_w AS DOUBLE) / CAST(mm.m AS DOUBLE))
        |       * (CAST(mb.n_w AS DOUBLE) / CAST(mm.m AS DOUBLE)))) + 1e-9, 6)
        |    AS pmi
        |FROM nab n
        |JOIN mg ma ON ma.w = n.a
        |JOIN mg mb ON mb.w = n.b
        |CROSS JOIN tt CROSS JOIN mm
        |WHERE n.n_ab >= 5
        |ORDER BY pmi DESC, a, b
        |LIMIT 30""".stripMargin,

    "q295_cusum_drift" ->
      """WITH base AS (
        |  SELECT source AS grp, doc_id AS id,
        |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT)
        |      - 50 AS dev
        |  FROM documents),
        |p AS (SELECT grp, id,
        |        sum(dev) OVER (PARTITION BY grp ORDER BY id) AS pf
        |      FROM base),
        |r AS (SELECT grp, id, pf,
        |        min(pf) OVER (PARTITION BY grp ORDER BY id) AS rmin,
        |        max(pf) OVER (PARTITION BY grp ORDER BY id) AS rmax
        |      FROM p),
        |s AS (SELECT grp, id, pf - least(0, rmin) AS s_hi,
        |        greatest(0, rmax) - pf AS s_lo
        |      FROM r)
        |SELECT grp, CAST(count(*) AS BIGINT) AS n,
        |  CAST(max(s_hi) AS BIGINT) AS max_s_hi,
        |  CAST(max(s_lo) AS BIGINT) AS max_s_lo,
        |  CAST(sum(CASE WHEN s_hi > 200 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_alarms_hi,
        |  CAST(sum(CASE WHEN s_lo > 200 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_alarms_lo,
        |  CAST(min(CASE WHEN s_hi > 200 THEN id END) AS BIGINT)
        |    AS first_alarm_hi,
        |  CAST(min(CASE WHEN s_lo > 200 THEN id END) AS BIGINT)
        |    AS first_alarm_lo
        |FROM s GROUP BY grp ORDER BY grp""".stripMargin,

    "q288_dispersion" ->
      """WITH tok AS (
        |  SELECT source AS p,
        |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        |  FROM documents),
        |ctp AS (SELECT p, term, CAST(count(*) AS BIGINT) AS c
        |        FROM tok GROUP BY 1, 2),
        |ct AS (SELECT term, CAST(sum(c) AS BIGINT) AS n_total
        |       FROM ctp GROUP BY 1),
        |sp AS (SELECT p, CAST(sum(c) AS BIGINT) AS s FROM ctp GROUP BY 1),
        |tot AS (SELECT CAST(sum(s) AS BIGINT) AS t FROM sp),
        |top AS (SELECT term, n_total FROM ct
        |        ORDER BY n_total DESC, term LIMIT 30)
        |SELECT top.term AS term, top.n_total AS n_total,
        |  round((1.0 + sum(
        |      abs(CAST(c.c AS DOUBLE) / CAST(top.n_total AS DOUBLE)
        |        - CAST(sp.s AS DOUBLE) / CAST(tot.t AS DOUBLE))
        |      - CAST(sp.s AS DOUBLE) / CAST(tot.t AS DOUBLE))) / 2
        |    + 1e-9, 6) AS dp
        |FROM ctp c
        |JOIN top ON top.term = c.term
        |JOIN sp ON sp.p = c.p
        |CROSS JOIN tot
        |GROUP BY 1, 2
        |ORDER BY term""".stripMargin,

    "q287_vocab_overlap" ->
      """WITH d AS (
        |  SELECT DISTINCT g, tok FROM (
        |    SELECT source AS g,
        |      unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        |    FROM documents)),
        |s AS (SELECT g, CAST(count(*) AS BIGINT) AS v FROM d GROUP BY g),
        |i AS (
        |  SELECT da.g AS a, db.g AS b, CAST(count(*) AS BIGINT) AS n_common
        |  FROM d da JOIN d db ON da.tok = db.tok AND da.g < db.g
        |  GROUP BY 1, 2)
        |SELECT i.a, i.b, i.n_common, sa.v AS n_a, sb.v AS n_b,
        |  CAST(i.n_common AS DOUBLE)
        |    / CAST(sa.v + sb.v - i.n_common AS DOUBLE) AS jaccard,
        |  CAST(i.n_common AS DOUBLE) / CAST(sa.v AS DOUBLE) AS containment_a,
        |  CAST(i.n_common AS DOUBLE) / CAST(sb.v AS DOUBLE) AS containment_b
        |FROM i JOIN s sa ON sa.g = i.a JOIN s sb ON sb.g = i.b
        |ORDER BY i.a, i.b""".stripMargin,

    // deterministic T5 span corruption: seeded span starts, backward-
    // looking coverage window (clips at the doc end for free), island
    // numbering via the gaps-and-islands cumsum, sentinel-spliced
    // input/target reassembly under the collect-skips-nulls ≡ FILTER
    // string_agg parity (round-6 convention)
    "q272_t5_spans" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_extract_all(text, '\S+') AS toks
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n,
        |    CAST(i AS BIGINT) AS pos, toks[i+1] AS tok
        |  FROM (SELECT doc_id, toks, unnest(range(0, len(toks))) AS i
        |        FROM t)),
        |st AS (
        |  SELECT *, (CAST(('0x'||substring(md5('t5:'||CAST(doc_id AS VARCHAR)||':'||CAST(pos AS VARCHAR)), 1, 4)) AS BIGINT) % 20 = 0) AS s
        |  FROM tok),
        |cv AS (
        |  SELECT *, max(CASE WHEN s THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY pos
        |            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) = 1 AS cov
        |  FROM st),
        |il AS (
        |  SELECT *, coalesce(lag(cov) OVER (PARTITION BY doc_id ORDER BY pos),
        |    false) AS prev
        |  FROM cv),
        |ik AS (
        |  SELECT *, (cov AND NOT prev) AS ist,
        |    sum(CASE WHEN cov AND NOT prev THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY pos
        |            ROWS UNBOUNDED PRECEDING) - 1 AS k
        |  FROM il),
        |pieces AS (
        |  SELECT doc_id, n, pos, cov, ist,
        |    CASE WHEN NOT cov THEN tok
        |         WHEN ist THEN '<extra_id_'||CAST(k AS VARCHAR)||'>' END AS ip,
        |    CASE WHEN cov AND ist THEN '<extra_id_'||CAST(k AS VARCHAR)||'> '||tok
        |         WHEN cov THEN tok END AS tp
        |  FROM ik),
        |agg AS (
        |  SELECT doc_id, max(n) AS n_tokens,
        |    CAST(sum(CASE WHEN cov THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
        |    CAST(sum(CASE WHEN ist THEN 1 ELSE 0 END) AS BIGINT) AS n_spans,
        |    coalesce(string_agg(ip, ' ' ORDER BY pos) FILTER (WHERE ip IS NOT NULL), '') AS ibody,
        |    coalesce(string_agg(tp, ' ' ORDER BY pos) FILTER (WHERE tp IS NOT NULL), '') AS tbody
        |  FROM pieces GROUP BY doc_id)
        |SELECT doc_id, n_tokens, n_masked, n_spans,
        |  md5(ibody) AS input_sig,
        |  md5(CASE WHEN n_spans = 0 THEN '<extra_id_0>'
        |       ELSE tbody||' <extra_id_'||CAST(n_spans AS VARCHAR)||'>' END) AS target_sig
        |FROM agg
        |ORDER BY doc_id""".stripMargin,

    // Same 10 replayed layers over the byte-level symbolization (raw \S+
    // words, hex-pair byte symbols).
    "q164_bpe_bytes" -> {
      bpeLayersSql(10, byteLevel = true) + "\n" + (1 to 10)
        .map(i => s"SELECT CAST($i AS BIGINT) AS rank, a, b, n FROM b$i")
        .mkString(" UNION ALL ") + "\nORDER BY rank"
    },

    // Gopher repetition replay: one (doc, n, gram) count table for all
    // nine n values, top gram per (doc, n) by (count DESC, gram DESC) —
    // Spark's max(struct(c, gram)) tie-break — dup chars as
    // Σ (c−1)·(len(gram) − (n−1)), line stats from trimmed nonempty
    // newline splits, every fraction a single division of exact integer
    // counts (CAST sums to BIGINT: DuckDB widens to HUGEINT).
    "q166_repetition" -> {
      def topFrac(n: Int) =
        s"CASE WHEN total_chars = 0 OR t$n IS NULL THEN 0.0 ELSE CAST(t$n AS BIGINT) / total_chars END"
      def dupFrac(n: Int) =
        s"CASE WHEN total_chars = 0 OR p$n IS NULL THEN 0.0 ELSE CAST(p$n AS BIGINT) / total_chars END"
      val lineFrac =
        "CASE WHEN nl IS NULL OR nl = 0 THEN 0.0 ELSE CAST(dl AS BIGINT) / CAST(nl AS BIGINT) END"
      val lineCharFrac =
        "CASE WHEN lch IS NULL OR lch = 0 THEN 0.0 ELSE CAST(dlch AS BIGINT) / CAST(lch AS BIGINT) END"
      val topThresh = Map(2 -> "0.20", 3 -> "0.18", 4 -> "0.16")
      val dupThresh = Map(5 -> "0.15", 6 -> "0.14", 7 -> "0.13",
        8 -> "0.12", 9 -> "0.11", 10 -> "0.10")
      val keep = ((2 to 4).map(n => s"${topFrac(n)} <= ${topThresh(n)}") ++
        (5 to 10).map(n => s"${dupFrac(n)} <= ${dupThresh(n)}") ++
        Seq(s"$lineFrac <= 0.30", s"$lineCharFrac <= 0.20"))
        .mkString("(", ") AND (", ")")
      raw"""WITH d AS (
         |  SELECT doc_id, text,
         |    regexp_extract_all(lower(text), '\S+') AS toks,
         |    CAST(length(regexp_replace(text, '\s+', '', 'g')) AS BIGINT) AS total_chars
         |  FROM documents),
         |ns AS (SELECT unnest(range(2, 11)) AS n),
         |g0 AS (
         |  SELECT doc_id, n, toks, unnest(range(1, len(toks) - n + 2)) AS i
         |  FROM d CROSS JOIN ns WHERE len(toks) >= n),
         |g AS (
         |  SELECT doc_id, n, array_to_string(toks[i:i+n-1], ' ') AS gram
         |  FROM g0),
         |cnts AS (
         |  SELECT doc_id, n, gram, count(*) AS c FROM g GROUP BY 1, 2, 3),
         |topg AS (
         |  SELECT doc_id, n, c * (length(gram) - (n - 1)) AS top_chars
         |  FROM (
         |    SELECT doc_id, n, gram, c, row_number() OVER (
         |      PARTITION BY doc_id, n ORDER BY c DESC, gram DESC) AS rn
         |    FROM cnts) WHERE rn = 1),
         |dupg AS (
         |  SELECT doc_id, n,
         |    CAST(sum(CASE WHEN c >= 2 THEN (c - 1) * (length(gram) - (n - 1)) ELSE 0 END) AS BIGINT) AS dup_chars
         |  FROM cnts GROUP BY 1, 2),
         |pern AS (
         |  SELECT t.doc_id, t.n, t.top_chars, p.dup_chars
         |  FROM topg t JOIN dupg p USING (doc_id, n)),
         |agg AS (
         |  SELECT doc_id,
         |    max(CASE WHEN n = 2 THEN top_chars END) AS t2,
         |    max(CASE WHEN n = 3 THEN top_chars END) AS t3,
         |    max(CASE WHEN n = 4 THEN top_chars END) AS t4,
         |    max(CASE WHEN n = 5 THEN dup_chars END) AS p5,
         |    max(CASE WHEN n = 6 THEN dup_chars END) AS p6,
         |    max(CASE WHEN n = 7 THEN dup_chars END) AS p7,
         |    max(CASE WHEN n = 8 THEN dup_chars END) AS p8,
         |    max(CASE WHEN n = 9 THEN dup_chars END) AS p9,
         |    max(CASE WHEN n = 10 THEN dup_chars END) AS p10
         |  FROM pern GROUP BY doc_id),
         |lines0 AS (
         |  SELECT doc_id, trim(l) AS line
         |  FROM (SELECT doc_id, unnest(str_split(text, chr(10))) AS l FROM d)
         |  WHERE trim(l) <> ''),
         |lcc AS (SELECT doc_id, line, count(*) AS c FROM lines0 GROUP BY 1, 2),
         |ls AS (
         |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS nl,
         |    CAST(sum(c * length(line)) AS BIGINT) AS lch,
         |    CAST(sum(c - 1) AS BIGINT) AS dl,
         |    CAST(sum((c - 1) * length(line)) AS BIGINT) AS dlch
         |  FROM lcc GROUP BY doc_id)
         |SELECT d.doc_id,
         |  ${topFrac(2)} AS top2_frac,
         |  ${topFrac(3)} AS top3_frac,
         |  ${topFrac(4)} AS top4_frac,
         |  ${dupFrac(5)} AS dup5_frac,
         |  ${dupFrac(6)} AS dup6_frac,
         |  ${dupFrac(7)} AS dup7_frac,
         |  ${dupFrac(8)} AS dup8_frac,
         |  ${dupFrac(9)} AS dup9_frac,
         |  ${dupFrac(10)} AS dup10_frac,
         |  $lineFrac AS dup_line_frac,
         |  $lineCharFrac AS dup_line_char_frac,
         |  $keep AS keep
         |FROM d LEFT JOIN agg USING (doc_id) LEFT JOIN ls USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    },

    // Tokenizer-grain packing: the q129 training layers + the q130 encode
    // chain, rolled up per document and packed by the greedy running-sum
    // window (the q121 packing SQL, on BPE token counts).
    "q163_bpe_pack" -> {
      bpeLayersSql(10) +
        """,
          |w AS (
          |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
          |  FROM documents),
          |wc AS (SELECT doc_id, word, count(*) AS cnt FROM w GROUP BY doc_id, word),
          |e0 AS (
          |  SELECT DISTINCT word,
          |    ' ' || array_to_string(regexp_extract_all(word, '.'), '  ') || ' ' AS seg
          |  FROM wc)""".stripMargin +
        (1 to 10).map(i => s""",
          |e$i AS (
          |  SELECT word,
          |    replace(seg, ' '||b$i.a||'  '||b$i.b||' ', ' '||b$i.a||b$i.b||' ') AS seg
          |  FROM e${i - 1} CROSS JOIN b$i)""".stripMargin).mkString +
        """,
          |vs AS (
          |  SELECT word, CAST(len(str_split(trim(seg), '  ')) AS BIGINT) AS n_sym
          |  FROM e10),
          |pd AS (
          |  SELECT doc_id, CAST(sum(cnt * n_sym) AS BIGINT) AS bpe_tokens
          |  FROM wc JOIN vs USING (word) GROUP BY doc_id),
          |base AS (
          |  SELECT d.doc_id, d.source, coalesce(pd.bpe_tokens, 0) AS bpe_tokens
          |  FROM documents d LEFT JOIN pd USING (doc_id)),
          |packed AS (
          |  SELECT source, doc_id, bpe_tokens,
          |    sum(bpe_tokens) OVER (PARTITION BY source ORDER BY doc_id
          |                          ROWS UNBOUNDED PRECEDING) AS cum
          |  FROM base)
          |SELECT source, CAST(floor((cum - bpe_tokens) / 2000) AS BIGINT) AS bin,
          |  CAST(count(*) AS BIGINT) AS n_docs,
          |  CAST(sum(bpe_tokens) AS BIGINT) AS bin_tokens
          |FROM packed
          |GROUP BY 1, 2
          |ORDER BY source, bin""".stripMargin
    },

    // BM25 with the Lucene +1-inside-log idf; identical expression shape
    // and parenthesization as the Spark side so every division chains in
    // the same order; rank on the rounded score.
    // Phrase replay from the token windows themselves — the
    // independent formulation the positional joins must agree with.
    "q197_phrase_match" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
        |  FROM documents)
        |SELECT doc_id, count(*) AS n_hits
        |FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i FROM toks)
        |WHERE w[i] = 'table' AND w[i+1] = 'hash'
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    // identical to q136's oracle on purpose: the stored-index path must
    // equal the corpus-rescan path score-for-score
    "q193_bm25_index" -> q136Oracle,

    "q136_bm25" -> q136Oracle,

    // Passage-retrieval replay: the q96 chunk chain carrying chunk
    // text, the generic join-based BM25 (per-passage sums rounded —
    // the q240 stage-3 convention), per-doc best-passage window,
    // top-10 on the rounded score.
    "q260_passage_retrieval" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_extract_all(text, '\S+') AS toks
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, toks,
        |    CASE WHEN len(toks) <= 0 THEN 0
        |         ELSE 1 + greatest((len(toks) - 40 + 29) // 30, 0)
        |    END AS nc
        |  FROM t),
        |ch AS MATERIALIZED (
        |  SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
        |    doc_id * 10000 + i AS pid,
        |    array_to_string(toks[i*30+1 : i*30+40], ' ') AS chunk
        |  FROM (SELECT doc_id, toks, unnest(range(0, nc)) AS i FROM c)),
        |toks2 AS MATERIALIZED (
        |  SELECT pid, doc_id, chunk_id,
        |    regexp_extract_all(lower(chunk), '[a-z0-9]+') AS t
        |  FROM ch),
        |st AS (
        |  SELECT count(*) AS n,
        |    CAST(sum(len(t)) AS DOUBLE) / count(*) AS avgdl
        |  FROM toks2),
        |ad AS (
        |  SELECT pid, CAST(len(t) AS BIGINT) AS dl, unnest(t) AS term
        |  FROM toks2),
        |tf2 AS (
        |  SELECT pid, dl, term, CAST(count(*) AS BIGINT) AS tf
        |  FROM ad GROUP BY pid, dl, term),
        |terms2 AS (
        |  SELECT 'vector' AS term, CAST(1 AS DOUBLE) AS w
        |  UNION ALL SELECT 'data', CAST(1 AS DOUBLE)),
        |hits AS MATERIALIZED (
        |  SELECT tf2.pid, tf2.dl, tf2.term, tf2.tf, terms2.w
        |  FROM tf2 JOIN terms2 USING (term)),
        |dfq AS (
        |  SELECT term, CAST(count(*) AS BIGINT) AS dfq FROM hits GROUP BY term),
        |sc AS (
        |  SELECT h.pid, h.dl,
        |    h.w * ln((st.n - d.dfq + 0.5)/(d.dfq + 0.5) + 1)
        |      * (h.tf * (1.2 + 1))
        |      / (h.tf + 1.2 * (1.0 - 0.75 + 0.75 * h.dl / st.avgdl)) AS cc
        |  FROM hits h JOIN dfq d USING (term) CROSS JOIN st),
        |ps AS (
        |  SELECT pid, round(sum(cc) + 1e-9, 6) AS bm25
        |  FROM sc GROUP BY pid),
        |best AS (
        |  SELECT doc_id, chunk_id AS best_chunk, bm25 FROM (
        |    SELECT ch.doc_id, ch.chunk_id, ps.bm25,
        |      row_number() OVER (PARTITION BY ch.doc_id
        |        ORDER BY ps.bm25 DESC, ch.chunk_id) AS rn
        |    FROM ps JOIN ch ON ch.pid = ps.pid)
        |  WHERE rn = 1)
        |SELECT doc_id, best_chunk, bm25
        |FROM best
        |ORDER BY bm25 DESC, doc_id
        |LIMIT 10""".stripMargin,

    // Sentence-screen replay (shared by the batch and streaming gates):
    // corpus distinct sentences, the appended-fresh batch, the marker
    // left join, FILTER'd ordered reassembly.
    "q251_sentence_screen" -> q251OracleSql,
    "q252_stream_sentscreen" -> q251OracleSql,

    // Sentence-dedup replay: positional split, trimmed nonempty
    // sentences, first occurrence via the (doc, pos) rank window ≡
    // Spark's min(struct), FILTER'd ordered string_agg ≡ the
    // collect-list reassembly (round-6 parity pattern).
    "q249_sentence_dedup" ->
      """WITH parts AS (
        |  SELECT doc_id, regexp_split_to_array(text, '[.!?]+') AS p
        |  FROM documents),
        |el AS MATERIALIZED (
        |  SELECT * FROM (
        |    SELECT doc_id, CAST(i - 1 AS BIGINT) AS sidx, trim(p[i]) AS sent
        |    FROM (SELECT doc_id, p, unnest(range(1, len(p) + 1)) AS i
        |          FROM parts))
        |  WHERE sent <> ''),
        |first AS (
        |  SELECT sent, doc_id AS fdoc, sidx AS fpos FROM (
        |    SELECT sent, doc_id, sidx, row_number() OVER (
        |      PARTITION BY sent ORDER BY doc_id, sidx) AS rn
        |    FROM el) WHERE rn = 1),
        |m AS (
        |  SELECT el.doc_id, el.sidx, el.sent,
        |    (el.doc_id = f.fdoc AND el.sidx = f.fpos) AS keep
        |  FROM el JOIN first f USING (sent))
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sents,
        |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  coalesce(string_agg(sent, ' ' ORDER BY sidx) FILTER (WHERE keep),
        |    '') AS cleaned_text
        |FROM m GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    // Rerank replay: the q136 fixed-order BM25 chain (terms vector/
    // data, top-20), then the md5 stub score and the ce rank.
    "q248_ce_rerank" ->
      """WITH toks AS (
        |  SELECT doc_id, text,
        |    regexp_extract_all(lower(text), '[a-z0-9]+') AS t
        |  FROM documents),
        |pd AS (
        |  SELECT doc_id, CAST(len(t) AS BIGINT) AS dl,
        |    CAST(len(list_filter(t, x -> x = 'vector')) AS BIGINT) AS tf0,
        |    CAST(len(list_filter(t, x -> x = 'data')) AS BIGINT) AS tf1
        |  FROM toks),
        |st AS (
        |  SELECT count(*) AS n,
        |    CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
        |    sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
        |    sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1
        |  FROM pd),
        |fbs AS (
        |  SELECT doc_id, round(
        |      (CASE WHEN tf0 > 0 THEN ln((n - df0 + 0.5)/(df0 + 0.5) + 1)
        |        * (tf0 * (1.2 + 1)) / (tf0 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
        |        ELSE 0.0 END)
        |    + (CASE WHEN tf1 > 0 THEN ln((n - df1 + 0.5)/(df1 + 0.5) + 1)
        |        * (tf1 * (1.2 + 1)) / (tf1 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
        |        ELSE 0.0 END) + 1e-9, 6) AS bm25
        |  FROM pd CROSS JOIN st
        |  WHERE tf0 + tf1 > 0),
        |fb AS (
        |  SELECT doc_id, bm25 FROM (
        |    SELECT doc_id, bm25,
        |      row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rn
        |    FROM fbs) WHERE rn <= 20),
        |sc AS (
        |  SELECT CAST(1 AS BIGINT) AS query_id, fb.doc_id, fb.bm25,
        |    CAST(('0x'||substring(md5('ce:1:'||CAST(fb.doc_id AS VARCHAR)
        |      ||':'||md5(d.text)), 1, 8)) AS BIGINT)
        |      / CAST(4294967296 AS DOUBLE) AS ce_score
        |  FROM fb JOIN toks d USING (doc_id))
        |SELECT query_id, doc_id, bm25, ce_score FROM (
        |  SELECT *, row_number() OVER (ORDER BY ce_score DESC, doc_id) AS rn
        |  FROM sc)
        |WHERE rn <= 10
        |ORDER BY ce_score DESC, doc_id""".stripMargin,

    // TextRank replay: positional sentence split (both engines keep
    // leading/trailing empties — verified parity), the 64-position cap,
    // the exact-integer Jaccard edges, rounded out-weight sums, five
    // unrolled weighted-PageRank rounds (all frames MATERIALIZED — each
    // layer is referenced twice), per-doc argmax window.
    "q243_textrank" -> textRankOracleSql("doc_id"),

    // SUMMARIZE command replay: the collection holds documents
    // verbatim (id = doc_id, payload = text), so the q243 chain
    // replays with the command surface's id alias.
    "q263_summarize_cmd" -> textRankOracleSql("id"),

    // KEYWORDS command replay: the collection holds documents verbatim
    // (id = doc_id, payload = text), so the q289 RAKE chain replays
    // with the command surface's id alias.
    "q290_keywords_cmd" -> rakeSql("documents", "id"),

    // PRF replay: stage 1 is bm25()'s fixed-order CASE chain over the
    // original terms (the q136 arithmetic verbatim, top-10); stage 2
    // mines Σ tf/dl over the feedback docs on the rounded score; stage
    // 3 is the JOIN-based weighted sum — per-term contributions are
    // engine-identical and the per-doc sum rounds (+1e-9, 6), the
    // load-bearing convention for data-sized term sets.
    "q240_prf_expand" ->
      """WITH toks AS MATERIALIZED (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
        |  FROM documents),
        |pd AS MATERIALIZED (
        |  SELECT doc_id, CAST(len(t) AS BIGINT) AS dl,
        |    CAST(len(list_filter(t, x -> x = 'vector')) AS BIGINT) AS tf0,
        |    CAST(len(list_filter(t, x -> x = 'data')) AS BIGINT) AS tf1
        |  FROM toks),
        |st AS MATERIALIZED (
        |  SELECT count(*) AS n,
        |    CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
        |    sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
        |    sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1
        |  FROM pd),
        |fbs AS (
        |  SELECT doc_id, round(
        |      (CASE WHEN tf0 > 0 THEN ln((n - df0 + 0.5)/(df0 + 0.5) + 1)
        |        * (tf0 * (1.2 + 1)) / (tf0 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
        |        ELSE 0.0 END)
        |    + (CASE WHEN tf1 > 0 THEN ln((n - df1 + 0.5)/(df1 + 0.5) + 1)
        |        * (tf1 * (1.2 + 1)) / (tf1 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
        |        ELSE 0.0 END) + 1e-9, 6) AS bm25
        |  FROM pd CROSS JOIN st
        |  WHERE tf0 + tf1 > 0),
        |fb AS MATERIALIZED (
        |  SELECT doc_id FROM (
        |    SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rn
        |    FROM fbs) WHERE rn <= 10),
        |fd AS (
        |  SELECT toks.doc_id, CAST(len(t) AS BIGINT) AS dl, unnest(t) AS term
        |  FROM toks JOIN fb USING (doc_id)),
        |ftf AS (
        |  SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
        |  FROM fd GROUP BY doc_id, dl, term),
        |ex AS (
        |  SELECT term, round(sum(CAST(tf AS DOUBLE) / dl) + 1e-9, 6) AS es
        |  FROM ftf WHERE term NOT IN ('vector', 'data') GROUP BY term),
        |exp5 AS MATERIALIZED (
        |  SELECT term FROM (
        |    SELECT term, row_number() OVER (ORDER BY es DESC, term) AS rn
        |    FROM ex) WHERE rn <= 5),
        |terms2 AS MATERIALIZED (
        |  SELECT 'vector' AS term, CAST(1 AS DOUBLE) AS w
        |  UNION ALL SELECT 'data', CAST(1 AS DOUBLE)
        |  UNION ALL SELECT term, 0.5 FROM exp5),
        |ad AS (
        |  SELECT doc_id, CAST(len(t) AS BIGINT) AS dl, unnest(t) AS term
        |  FROM toks),
        |tf2 AS (
        |  SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
        |  FROM ad GROUP BY doc_id, dl, term),
        |hits AS MATERIALIZED (
        |  SELECT tf2.doc_id, tf2.dl, tf2.term, tf2.tf, terms2.w
        |  FROM tf2 JOIN terms2 USING (term)),
        |dfq AS (
        |  SELECT term, CAST(count(*) AS BIGINT) AS dfq FROM hits GROUP BY term),
        |sc AS (
        |  SELECT h.doc_id, h.dl,
        |    h.w * ln((st.n - d.dfq + 0.5)/(d.dfq + 0.5) + 1)
        |      * (h.tf * (1.2 + 1))
        |      / (h.tf + 1.2 * (1.0 - 0.75 + 0.75 * h.dl / st.avgdl)) AS c
        |  FROM hits h JOIN dfq d USING (term) CROSS JOIN st)
        |SELECT doc_id, round(sum(c) + 1e-9, 6) AS bm25, dl
        |FROM sc GROUP BY doc_id, dl
        |ORDER BY bm25 DESC, doc_id
        |LIMIT 20""".stripMargin,


    // BM25 and dense lists re-ranked in SQL (both on rounded scores),
    // fused as sum of 1.0/(60 + r) — single exact divisions, rounded
    // before the final rank.
    "q137_hybrid_rrf" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
        |  FROM documents),
        |pd AS (
        |  SELECT doc_id, CAST(len(t) AS BIGINT) AS dl,
        |    CAST(len(list_filter(t, x -> x = 'vector')) AS BIGINT) AS tf0,
        |    CAST(len(list_filter(t, x -> x = 'data')) AS BIGINT) AS tf1,
        |    CAST(len(list_filter(t, x -> x = 'merge')) AS BIGINT) AS tf2
        |  FROM toks),
        |st AS (
        |  SELECT count(*) AS n,
        |    CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
        |    sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
        |    sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
        |    sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
        |  FROM pd),
        |bm AS (
        |  SELECT doc_id, round(
        |      (CASE WHEN tf0 > 0 THEN ln((n - df0 + 0.5)/(df0 + 0.5) + 1)
        |        * (tf0 * (1.2 + 1)) / (tf0 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
        |        ELSE 0.0 END)
        |    + (CASE WHEN tf1 > 0 THEN ln((n - df1 + 0.5)/(df1 + 0.5) + 1)
        |        * (tf1 * (1.2 + 1)) / (tf1 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
        |        ELSE 0.0 END)
        |    + (CASE WHEN tf2 > 0 THEN ln((n - df2 + 0.5)/(df2 + 0.5) + 1)
        |        * (tf2 * (1.2 + 1)) / (tf2 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
        |        ELSE 0.0 END) + 1e-9, 6) AS bm25
        |  FROM pd CROSS JOIN st
        |  WHERE tf0 + tf1 + tf2 > 0),
        |sp AS (
        |  SELECT doc_id, CAST(rn AS BIGINT) AS r FROM (
        |    SELECT doc_id, row_number() OVER (
        |      ORDER BY bm25 DESC, doc_id) AS rn FROM bm)
        |  WHERE rn <= 20),
        |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
        |      FROM embeddings WHERE vec_id = 0),
        |dn AS (
        |  SELECT vec_id AS doc_id,
        |    round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv), 6)
        |      AS cs
        |  FROM embeddings CROSS JOIN q WHERE vec_id <> 0),
        |de AS (
        |  SELECT doc_id, CAST(rn AS BIGINT) AS r FROM (
        |    SELECT doc_id, row_number() OVER (
        |      ORDER BY cs DESC, doc_id) AS rn FROM dn)
        |  WHERE rn <= 20),
        |u AS (SELECT doc_id, r FROM sp UNION ALL SELECT doc_id, r FROM de)
        |SELECT doc_id, round(sum(1.0/(60 + r)) + 1e-9, 6) AS rrf,
        |  CAST(count(*) AS BIGINT) AS n_lists
        |FROM u GROUP BY doc_id
        |ORDER BY rrf DESC, doc_id
        |LIMIT 10""".stripMargin,

    // Same generated layers, then the replace CHAIN applied once per
    // distinct word (e1..e10) and totals off the (source, word) counts.
    "q130_bpe_encode" -> {
      bpeLayersSql(10) +
        """,
          |w AS (
          |  SELECT source, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
          |  FROM documents),
          |wc AS (SELECT source, word, count(*) AS cnt FROM w GROUP BY source, word),
          |e0 AS (
          |  SELECT DISTINCT word,
          |    ' ' || array_to_string(regexp_extract_all(word, '.'), '  ') || ' ' AS seg
          |  FROM wc)""".stripMargin +
        (1 to 10).map(i => s""",
          |e$i AS (
          |  SELECT word,
          |    replace(seg, ' '||b$i.a||'  '||b$i.b||' ', ' '||b$i.a||b$i.b||' ') AS seg
          |  FROM e${i - 1} CROSS JOIN b$i)""".stripMargin).mkString +
        """,
          |vs AS (
          |  SELECT word, CAST(len(str_split(trim(seg), '  ')) AS BIGINT) AS n_sym
          |  FROM e10)
          |SELECT source,
          |  CAST(sum(cnt) AS BIGINT) AS words,
          |  CAST(sum(cnt * n_sym) AS BIGINT) AS bpe_tokens,
          |  round(CAST(sum(cnt * n_sym) AS DOUBLE) / sum(cnt), 6) AS fertility
          |FROM wc JOIN vs USING (word)
          |GROUP BY source
          |ORDER BY source""".stripMargin
    },

    "q107_bpe_pairs" ->
      """WITH vocab AS (
        |  SELECT token AS word, count(*) AS freq
        |  FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
        |        FROM documents)
        |  GROUP BY token),
        |pairs AS (
        |  SELECT substr(word, i, 2) AS pair, freq
        |  FROM (SELECT word, freq, unnest(range(1, length(word))) AS i
        |        FROM vocab WHERE length(word) >= 2))
        |SELECT pair, CAST(sum(freq) AS BIGINT) AS n
        |FROM pairs
        |GROUP BY pair
        |ORDER BY n DESC, pair
        |LIMIT 20""".stripMargin,

    "q105_token_entropy" ->
      """WITH tc AS (
        |  SELECT doc_id, token, count(*) AS c
        |  FROM (SELECT doc_id,
        |          unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
        |        FROM documents)
        |  GROUP BY doc_id, token)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |  CAST(count(*) AS BIGINT) AS n_distinct,
        |  round(ln(CAST(sum(c) AS DOUBLE))
        |    - sum(c * ln(c)) / CAST(sum(c) AS DOUBLE) + 1e-9, 6) AS entropy
        |FROM tc
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    "q37_token_count" ->
      """SELECT source,
        |  CAST(sum(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS sum_tokens,
        |  CAST(sum(len(regexp_extract_all(text, '[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\s]'))) AS BIGINT) AS sum_subwords,
        |  CAST(sum(length(text)) AS BIGINT) AS sum_chars
        |FROM documents
        |GROUP BY source
        |ORDER BY source""".stripMargin,

    "q38_fingerprint" ->
      """SELECT doc_id,
        |  md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS fingerprint
        |FROM documents
        |WHERE doc_id < 100
        |ORDER BY doc_id""".stripMargin,

    "q39_lang_id" -> {
      val (sDe, sEn, sEs, sFr, sZh) = (duckLangScore("de"), duckLangScore("en"),
        duckLangScore("es"), duckLangScore("fr"), duckLangScore("zh"))
      s"""SELECT doc_id, lang,
         |  CASE
         |    WHEN $sDe >= $sEn AND $sDe >= $sEs AND $sDe >= $sFr AND $sDe >= $sZh THEN 'de'
         |    WHEN $sEn >= $sEs AND $sEn >= $sFr AND $sEn >= $sZh THEN 'en'
         |    WHEN $sEs >= $sFr AND $sEs >= $sZh THEN 'es'
         |    WHEN $sFr >= $sZh THEN 'fr'
         |    ELSE 'zh'
         |  END AS predicted
         |FROM documents
         |ORDER BY doc_id""".stripMargin
    }
  )
}
