package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Numeric-column quality audits — the data-quality screens for the
  * MEASURE columns (prices, amounts, counters), the numeric sibling of
  * the text-side Gopher/quality family. A corrupted ingest (unit
  * mix-ups, truncation, synthetic padding, duplicated rows) bends value
  * DISTRIBUTIONS long before it breaks schemas; these operators make
  * that bend a number.
  */
object NumericAudit {

  /** Benford first-digit audit (Newcomb 1881; Benford 1938): per group,
    * the first-significant-digit distribution of a positive 2-decimal
    * money column against Benford's law ln(1+1/d)/ln(10), with the
    * group's chi-squared distance alongside — the classic forensic
    * screen for fabricated or unit-shifted amounts.
    *
    * Digit extraction never touches float FORMATTING (engine-divergent)
    * or log10 floors (ulp-flippable at decade boundaries): amounts are
    * 2-decimal by contract, so cents = round(x·100) lands within an ulp
    * of an exact integer on both engines and its INTEGER string
    * rendering gives the digit — exact, replayable.
    *
    * Determinism: per-digit counts are exact integers over a groups×9
    * catalog grid (zero-count digits still contribute their expected
    * mass); the expectation and chi-squared terms are ONE fixed op
    * order on identical double inputs (the q97 ln-parity doctrine);
    * only the 9-term chi-squared sum rounds (+1e-9, 6). The group
    * window is 9 rows by construction (the q256 bounded-window class).
    *
    * The 2-decimal contract is ENFORCED in the filter, not just
    * documented: a value in (0, 0.005) rounds to 0 cents — its "first
    * digit" would be 0, outside the 1..9 grid — so sub-cent rows are
    * excluded from the digit counts AND the group totals together
    * (counting them in n while dropping them from the grid would skew
    * every expected mass and the chi-squared with them — the r12
    * advisor finding). The oracle mirrors the same cents >= 1 predicate.
    *
    * Output: (grp, digit, n_d, n, chi2) — one row per group × digit
    * 1..9, chi2 constant within a group.
    */
  def benfordDigits(df: DataFrame, groupCol: String,
      valCol: String): DataFrame =
    benfordFromCounts(
      benfordDigitRows(df, groupCol, valCol)
        .groupBy("grp", "digit").agg(count(lit(1)).as("n_d")))

  /** The per-row half of [[benfordDigits]]: (grp, digit) with the exact
    * integer-cents digit extraction and the sub-cent exclusion. Pure
    * stateless column math — the streaming twin runs it unchanged on an
    * unbounded frame.
    */
  def benfordDigitRows(df: DataFrame, groupCol: String,
      valCol: String): DataFrame =
    df.filter(col(valCol) > 0)
      .select(col(groupCol).as("grp"),
        round(col(valCol) * 100).cast("long").as("__cents"))
      .filter(col("__cents") >= 1)
      .select(col("grp"),
        substring(col("__cents").cast("string"), 1, 1)
          .cast("int").as("digit"))

  /** The post-aggregation half of [[benfordDigits]]: groups×9 grid,
    * expected Benford mass, chi-squared — over per-(grp, digit) exact
    * counts `n_d`. Shared verbatim by the batch audit and the streaming
    * twin (whose memory sink lands exactly this shape, so stream ≡ batch
    * by construction). Group totals are the digit counts' own sum: every
    * surviving row's digit is in 1..9, so nothing is lost to the grid.
    */
  def benfordFromCounts(counts: DataFrame): DataFrame = {
    val spark = counts.sparkSession
    val digits = spark.range(1, 10)
      .select(col("id").cast("int").as("digit"))
    val e = log(lit(1.0) + lit(1.0) / col("digit").cast("double")) /
      log(lit(10.0)) * col("n").cast("double")
    val wg = Window.partitionBy("grp")
    // totals + grid in ONE aggregation over the counts (a digit→count
    // map per group, looked up per grid cell): deriving totals from the
    // counts frame and joining back would SELF-JOIN it, which the
    // streaming twin's memory-sink view cannot deduplicate (conflicting
    // attributes). Map semantics are order-blind, so the collect_list's
    // partition order is immaterial; keys are unique by the groupBy.
    counts.groupBy("grp")
      .agg(sum("n_d").as("n"),
        map_from_entries(collect_list(struct(col("digit"), col("n_d"))))
          .as("__m"))
      .crossJoin(broadcast(digits))
      .withColumn("n_d", coalesce(element_at(col("__m"), col("digit")),
        lit(0L)))
      .withColumn("__e", e)
      .withColumn("__c",
        (col("n_d").cast("double") - col("__e")) *
          (col("n_d").cast("double") - col("__e")) / col("__e"))
      .withColumn("chi2", round(sum(col("__c")).over(wg) + lit(1e-9), 6))
      .select(col("grp"), col("digit").cast("long").as("digit"),
        col("n_d"), col("n"), col("chi2"))
      .orderBy("grp", "digit")
  }

  /** Population Stability Index (the standard model-monitoring drift
    * score, e.g. Siddiqi 2006) between a REFERENCE and a CURRENT slice
    * of an integral metric, per group: PSI = Σ_bins (p_cur − p_ref) ·
    * ln(p_cur / p_ref) over a fixed-width binning with a top catch-all
    * bin. The "has this source's length/quality distribution moved since
    * the reference crawl" screen — the distribution-shape sibling of
    * [[cusumDrift]] (sequential shift) and the KS/KL members of the
    * drift family. Conventional reading: < 0.1 stable, 0.1–0.25 drifting,
    * > 0.25 shifted.
    *
    * Determinism: bin ids are exact integer math (val DIV width, clamped
    * to [0, nBins−1] — mirror the clamp in any oracle); bin masses are
    * add-one smoothed SINGLE divisions of exact integer counts
    * (p = (n_b + 1)/(N + nBins)) so zero-count bins stay finite and both
    * engines compute bit-identical doubles (the q120 exact-division
    * doctrine); ln on identical doubles is the q97 parity class; only
    * the nBins-term sum rounds (+1e-9, 6). The per-group window is nBins
    * rows by construction (the q256 bounded-window class).
    *
    * Groups must appear in BOTH slices (inner join of the totals) — a
    * PSI against an absent reference is undefined, not zero.
    *
    * Output: (grp, bin, n_ref, n_cur, psi) — one row per group × bin,
    * psi constant within a group.
    */
  def psiDrift(ref: DataFrame, cur: DataFrame, groupCol: String,
      valCol: String, binWidth: Long, nBins: Int): DataFrame = {
    require(binWidth >= 1, s"binWidth must be positive, got $binWidth")
    require(nBins >= 2, s"nBins must be at least 2, got $nBins")
    val integral = Set[org.apache.spark.sql.types.DataType](
      org.apache.spark.sql.types.ByteType,
      org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType,
      org.apache.spark.sql.types.LongType)
    Seq(ref, cur).foreach { df =>
      require(integral.contains(df.schema(valCol).dataType),
        s"psiDrift needs an integral value column (exactness contract), " +
          s"got ${df.schema(valCol).dataType.simpleString}")
    }
    psiFromCounts(
      psiBinned(ref, groupCol, valCol, binWidth, nBins)
        .groupBy("grp", "bin").agg(count(lit(1)).as("n")),
      psiBinned(cur, groupCol, valCol, binWidth, nBins)
        .groupBy("grp", "bin").agg(count(lit(1)).as("n")),
      nBins)
  }

  /** The per-row half of [[psiDrift]]: (grp, bin) with the exact integer
    * binning (DIV, never `/` — Spark's `/` on longs is DOUBLE division;
    * clamped top bin). Pure stateless column math — the streaming twin
    * runs it unchanged on an unbounded frame.
    */
  def psiBinned(df: DataFrame, groupCol: String, valCol: String,
      binWidth: Long, nBins: Int): DataFrame =
    df.select(col(groupCol).as("grp"),
        col(valCol).cast("long").as("__v"))
      .select(col("grp"),
        greatest(lit(0L), least(expr(s"__v DIV $binWidth"),
          lit(nBins - 1L))).as("bin"))

  /** The post-aggregation half of [[psiDrift]]: per-group bin→count maps
    * (the benfordFromCounts gather — totals derived from the counts' own
    * sums, so a memory-sink view never self-joins), the groups×nBins
    * grid by map lookup, smoothed masses, ln-parity terms, one rounded
    * sum. `refCounts`/`curCounts`: (grp, bin, n) exact counts. Shared
    * verbatim by the batch operator and the streaming twin.
    */
  def psiFromCounts(refCounts: DataFrame, curCounts: DataFrame,
      nBins: Int): DataFrame = {
    val spark = refCounts.sparkSession
    def gathered(c: DataFrame, total: String, m: String): DataFrame =
      c.groupBy("grp").agg(sum("n").as(total),
        map_from_entries(collect_list(struct(col("bin"), col("n"))))
          .as(m))
    val bins = spark.range(0, nBins).select(col("id").as("bin"))
    val pr = (col("n_ref") + 1L).cast("double") /
      (col("__nr") + lit(nBins.toLong)).cast("double")
    val pc = (col("n_cur") + 1L).cast("double") /
      (col("__nc") + lit(nBins.toLong)).cast("double")
    val wg = Window.partitionBy("grp")
    gathered(refCounts, "__nr", "__mr")
      .join(gathered(curCounts, "__nc", "__mc"), Seq("grp"))
      .crossJoin(broadcast(bins))
      .withColumn("n_ref",
        coalesce(element_at(col("__mr"), col("bin")), lit(0L)))
      .withColumn("n_cur",
        coalesce(element_at(col("__mc"), col("bin")), lit(0L)))
      .withColumn("__t", (pc - pr) * log(pc / pr))
      .withColumn("psi", round(sum(col("__t")).over(wg) + lit(1e-9), 6))
      .select(col("grp"), col("bin"), col("n_ref"), col("n_cur"), col("psi"))
      .orderBy("grp", "bin")
  }

  /** Two-sided CUSUM drift detection (Page 1954) over an INTEGER metric
    * in ingest order: per group, the classic change-point screen for
    * "did this source's docs get shorter / this feed's values shift
    * mid-crawl" — sensitive to small sustained shifts that per-row
    * thresholds (z-scores, [[benfordDigits]]) never see. Upper CUSUM
    * S_i = max(0, S_{i-1} + (x_i − target)); lower is symmetric; alarm
    * when either exceeds `h`.
    *
    * The recursion isn't a prefix sum (it clamps), but it FACTORS into
    * one: S_i = P_i − min(0, min_{j≤i} P_j) with P the running
    * deviation sum (and the lower side mirrored with max) — so the
    * whole computation is cumulative sums and running extremes,
    * CHUNKED two-phase (the heapsGrowth pattern): per-(group, chunk)
    * ordered windows plus a bounded chunk catalog carrying offsets and
    * prior-chunk extremes. No corpus-scale window partition anywhere;
    * results are chunk-width invariant (spec-pinned).
    *
    * Exactness: the metric is integral by contract, so every P, S, and
    * alarm is EXACT integer math — no rounding anywhere (the q120
    * doctrine at its strongest).
    *
    * Output per group: (grp, n, max_s_hi, max_s_lo, n_alarms_hi,
    * n_alarms_lo, first_alarm_hi, first_alarm_lo) — first-alarm ids
    * NULL when that side never fires.
    */
  def cusumDrift(df: DataFrame, groupCol: String, idCol: String,
      valCol: String, target: Long, h: Long,
      chunkSize: Long = 4096): DataFrame = {
    require(h >= 1, s"h must be positive, got $h")
    require(chunkSize >= 1, s"chunkSize must be positive, got $chunkSize")
    val integral = Set[org.apache.spark.sql.types.DataType](
      org.apache.spark.sql.types.ByteType,
      org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType,
      org.apache.spark.sql.types.LongType)
    require(integral.contains(df.schema(idCol).dataType),
      s"cusumDrift needs an integral id column, got " +
        df.schema(idCol).dataType.simpleString)
    require(integral.contains(df.schema(valCol).dataType),
      s"cusumDrift needs an integral value column (exactness contract), " +
        s"got ${df.schema(valCol).dataType.simpleString}")
    val base = df.select(col(groupCol).as("grp"),
        col(idCol).cast("long").as("__id"),
        (col(valCol).cast("long") - target).as("__dev"))
      .withColumn("__chunk", expr(s"__id DIV $chunkSize"))
    val wLoc = Window.partitionBy("grp", "__chunk").orderBy("__id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = base
      .withColumn("__lp", sum("__dev").over(wLoc))
      .withColumn("__lmin", min(col("__lp")).over(wLoc))
      .withColumn("__lmax", max(col("__lp")).over(wLoc))
    val wPrev = Window.partitionBy("grp").orderBy("__chunk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cat = local.groupBy("grp", "__chunk")
      .agg(sum("__dev").as("__cs"), min("__lp").as("__cmin"),
        max("__lp").as("__cmax"))
      .withColumn("__ot", coalesce(sum("__cs").over(wPrev), lit(0L)))
      .withColumn("__pmin", min(col("__ot") + col("__cmin")).over(wPrev))
      .withColumn("__pmax", max(col("__ot") + col("__cmax")).over(wPrev))
      .select("grp", "__chunk", "__ot", "__pmin", "__pmax")
    local.join(broadcast(cat), Seq("grp", "__chunk"))
      .withColumn("__p", col("__ot") + col("__lp"))
      // least/greatest skip NULLs: a first chunk has no prior extreme
      .withColumn("__rmin",
        least(col("__pmin"), col("__ot") + col("__lmin")))
      .withColumn("__rmax",
        greatest(col("__pmax"), col("__ot") + col("__lmax")))
      .withColumn("__shi", col("__p") - least(lit(0L), col("__rmin")))
      .withColumn("__slo", greatest(lit(0L), col("__rmax")) - col("__p"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n"),
        max("__shi").as("max_s_hi"), max("__slo").as("max_s_lo"),
        sum(when(col("__shi") > h, 1L).otherwise(0L)).as("n_alarms_hi"),
        sum(when(col("__slo") > h, 1L).otherwise(0L)).as("n_alarms_lo"),
        min(when(col("__shi") > h, col("__id"))).as("first_alarm_hi"),
        min(when(col("__slo") > h, col("__id"))).as("first_alarm_lo"))
      .orderBy("grp")
  }
}
