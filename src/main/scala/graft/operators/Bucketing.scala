package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for co-located joins.
  *
  * At 100 TB the dominant cost of a fact⋈fact join is the shuffle. Writing
  * both tables bucketed by the join key (same bucket count) pre-partitions
  * them ON DISK: Spark's scan reports the bucket distribution, Catalyst
  * sees both sides already hash-distributed on the key, and the join plans
  * with NO Exchange on either side. The shuffle is paid once at write time
  * and amortized over every subsequent join — the standard layout for
  * repeatedly-joined collection pairs (e.g. embeddings ⋈ document metadata
  * keyed by doc id).
  */
object Bucketing {

  /** Write `df` as a bucketed (and optionally sorted) table — managed by
    * default, external when `path` is given (keeps data out of the session
    * warehouse).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, sortByKey: Boolean = true,
      path: Option[String] = None): Unit = {
    val base = df.write.mode("overwrite").bucketBy(buckets, key)
    val w = path.fold(base)(p => base.option("path", p))
    (if (sortByKey) w.sortBy(key) else w).saveAsTable(table)
  }

  /** Join two same-bucket-count tables on their bucket key — shuffle-free
    * by construction (assert with `.explain`: no Exchange above either
    * scan).
    */
  def cozyJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String, joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), joinType)
}
