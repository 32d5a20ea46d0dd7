package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join: for every left row, attach the latest
  * right row with the same key whose timestamp is ≤ the left timestamp.
  *
  * Implemented as the union-and-carry dataflow rather than a range join:
  * tag both inputs, union them, and run one `last(ignoreNulls)` window over
  * (key, time) — the carried value at each left row is exactly the as-of
  * match. One shuffle on the key, a single sort per partition, no range
  * explosion — the shape that survives when both sides are large (a range
  * join's candidate blow-up does not). DuckDB's native ASOF JOIN is the
  * cross-check oracle in q50.
  */
object AsOfJoin {

  /** @param left      probe side (keeps all its rows)
    * @param right     reference side (its `valueCols` are carried forward)
    * @param keyCol    equality key present on both sides
    * @param timeCol   event-time column present on both sides
    * @param valueCols right-side columns to attach (null when no prior row)
    */
  def mostRecentPrior(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns
    // a reference row with no timestamp can never satisfy "most recent
    // PRIOR" (ts ≤ t is never true for NULL) — and nulls-first ordering
    // would otherwise carry it as an earliest match, diverging from ASOF
    // semantics (and from DuckDB's ASOF JOIN oracle)
    val rightValid = right.filter(col(timeCol).isNotNull)
    // values travel inside a struct so that a matched right row whose value
    // column is legitimately NULL still registers as "a row was here" —
    // last(ignoreNulls) skips the NULL struct of left rows but carries a
    // struct with a NULL field (otherwise that row would be skipped too and
    // a stale earlier value carried past it)
    val tagged = left
      .withColumn("__side", lit(1))
      .select(
        Seq(col(keyCol), col(timeCol), col("__side")) ++
          leftCols.filterNot(c => c == keyCol || c == timeCol).map(col) ++
          valueCols.map(c =>
            lit(null).cast(org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("v", right.schema(c).dataType))))
              .as(s"__v_$c")): _*)
      .unionByName(
        rightValid
          .withColumn("__side", lit(0))
          .select(
            Seq(col(keyCol), col(timeCol), col("__side")) ++
              leftCols.filterNot(c => c == keyCol || c == timeCol)
                .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
              valueCols.map(c => struct(col(c).as("v")).as(s"__v_$c")): _*))

    // right rows sort before left rows at the same timestamp (__side asc) so
    // an exactly-simultaneous reference row is visible to the probe row; the
    // value structs complete the order so that among reference rows tied on
    // (key, ts) the carried row is the struct-wise maximum — deterministic
    // across partitionings/runs, per the repo's total-order convention
    val w = Window
      .partitionBy(keyCol)
      .orderBy(col(timeCol) +: col("__side") +:
        valueCols.map(c => col(s"__v_$c")): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = valueCols.foldLeft(tagged) { (df, c) =>
      df.withColumn(s"__asof_$c", last(col(s"__v_$c"), ignoreNulls = true).over(w))
    }

    carried
      .filter(col("__side") === 1)
      .select(
        leftCols.map(col) ++
          valueCols.map(c => col(s"__asof_$c.v").as(s"asof_$c")): _*)
  }
}
