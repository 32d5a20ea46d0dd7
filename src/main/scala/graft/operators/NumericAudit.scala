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
    * Output: (grp, digit, n_d, n, chi2) — one row per group × digit
    * 1..9, chi2 constant within a group.
    */
  def benfordDigits(df: DataFrame, groupCol: String,
      valCol: String): DataFrame = {
    val spark = df.sparkSession
    val base = df.filter(col(valCol) > 0)
      .select(col(groupCol).as("grp"),
        substring(round(col(valCol) * 100).cast("long").cast("string"),
          1, 1).cast("int").as("digit"))
    val counts = base.groupBy("grp", "digit").agg(count(lit(1)).as("n_d"))
    val totals = base.groupBy("grp").agg(count(lit(1)).as("n"))
    val digits = spark.range(1, 10)
      .select(col("id").cast("int").as("digit"))
    val e = log(lit(1.0) + lit(1.0) / col("digit").cast("double")) /
      log(lit(10.0)) * col("n").cast("double")
    val wg = Window.partitionBy("grp")
    totals.crossJoin(broadcast(digits))
      .join(counts, Seq("grp", "digit"), "left")
      .na.fill(0L, Seq("n_d"))
      .withColumn("__e", e)
      .withColumn("__c",
        (col("n_d").cast("double") - col("__e")) *
          (col("n_d").cast("double") - col("__e")) / col("__e"))
      .withColumn("chi2", round(sum(col("__c")).over(wg) + lit(1e-9), 6))
      .select(col("grp"), col("digit").cast("long").as("digit"),
        col("n_d"), col("n"), col("chi2"))
      .orderBy("grp", "digit")
  }
}
