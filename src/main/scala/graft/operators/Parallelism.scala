package graft.operators

import org.apache.spark.sql.DataFrame

/** Input-split vs CPU-parallelism mismatch guard.
  *
  * Scan parallelism follows input splits (`files.maxPartitionBytes`), which
  * is right for IO-bound work but starves CPU-bound per-row stages (regex
  * tokenization, shingling, hashing) when the input is a few small-but-dense
  * files: a 5 MB parquet of 5 k documents is one split, so a 32-core
  * executor shingles on one core. At 100 TB the same shape appears after a
  * selective pushed-down filter leaves a handful of non-empty splits.
  *
  * `ensure` widens to the session's default parallelism ONLY when the plan's
  * current partitioning is narrower — on a well-split input it is a no-op,
  * so the extra shuffle is only paid exactly when the alternative is idle
  * cores.
  */
object Parallelism {
  def ensure(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
