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
  * `ensure` widens to the session's default parallelism ONLY when the
  * estimated split count is narrower — on a well-split input it is a no-op,
  * so the extra shuffle is only paid exactly when the alternative is idle
  * cores. The estimate comes from optimizer statistics (plan size ÷ max
  * split bytes), NOT from `df.rdd.getNumPartitions`: converting to an RDD
  * would force physical planning of a side plan and pin it outside AQE,
  * while logical stats are already computed and AQE still owns the real
  * plan.
  */
object Parallelism {
  def ensure(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val maxSplit = spark.sessionState.conf.filesMaxPartitionBytes
    val size = df.queryExecution.optimizedPlan.stats.sizeInBytes
    // a stat-less leaf reports conf.defaultSizeInBytes (Long.MaxValue-ish),
    // which would make the estimate "plenty of splits" and silently skip
    // the widening this guard exists for — treat unknown as narrow (the
    // repartition is cheap exactly when the guess is wrong the other way).
    // Caveat: the estimate assumes splittable storage (parquet — all graft
    // sources); a non-splittable codec (gzip text) can under-parallelize
    // despite a large byte size.
    val statless = size >= spark.sessionState.conf.defaultSizeInBytes
    val estSplits = size / math.max(1L, maxSplit) + 1
    if (statless || estSplits < target) df.repartition(target) else df
  }
}
