package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout for multi-dimensional file skipping.
  *
  * Parquet file skipping works off per-file min/max statistics, which a
  * single-column sort makes selective for ONE column and useless for every
  * other. Interleaving the bits of two bucketed key columns and
  * range-partitioning on the interleaved value puts rows that are close in
  * BOTH dimensions into the same files, so each file covers only a
  * ~√(files)-fraction of each dimension's range — point/range predicates
  * on either column skip most files. This is the layout trick behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY`; at 100 TB it is the difference
  * between a selective scan reading one node's worth of files and reading
  * the whole corpus for any filter the primary sort doesn't cover.
  *
  * The z-value is pure shift/and/or column math (whole-stage codegen, and
  * any SQL engine reproduces it bit-for-bit — the q83 oracle does), NOT a
  * UDF. Inputs must be pre-bucketed to non-negative ints `< 2^bits`; the
  * expression validates nothing at runtime because a validation branch per
  * row would break codegen fusion — callers bucket with `% (1 << bits)`.
  */
object ZOrder {

  /** Interleave the low `bits` bits of `a` (even positions) and `b` (odd
    * positions) into a non-negative long: bit i of `a` lands at 2i, bit i
    * of `b` at 2i+1.
    */
  def zvalue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1)).cast("long"), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(b, i).bitwiseAND(lit(1)).cast("long"),
            2 * i + 1))
    }.reduce(_.bitwiseOR(_))
  }

  /** The same interleave as ANSI SQL text (for oracles / other engines):
    * `((a >> i) & 1) << 2i | ((b >> i) & 1) << (2i+1)`, OR-folded.
    */
  def zvalueSql(a: String, b: String, bits: Int): String =
    (0 until bits).flatMap { i =>
      Seq(s"((($a >> $i) & 1) << ${2 * i})", s"((($b >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" | ")

  /** Rewrite `df` in z-order: range-partition on the interleaved value
    * (one shuffle, no global sort — range boundaries come from Spark's
    * sampling) and sort within partitions so parquet row-group stats are
    * tight too. `aCol`/`bCol` must already be bucketed to `[0, 2^bits)`.
    */
  def layout(df: DataFrame, aCol: String, bCol: String, bits: Int,
      nFiles: Int): DataFrame =
    df.withColumn("__z", zvalue(col(aCol), col(bCol), bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
}
