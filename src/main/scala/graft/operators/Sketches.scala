package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sketches. Spark's own sketch aggregates
  * (`approx_count_distinct`, `bloom_filter_agg`) hash with
  * engine-internal functions, so their bytes can't be recomputed by
  * another engine — fine for diagnostics, useless for an exactness gate.
  * These sketches hash with md5 slices (the house convention), so every
  * cell of the sketch is engine-recomputable and the gate can hash-match
  * the SKETCH ITSELF, not just sanity-check its answers.
  *
  * Count-min (Cormode & Muthukrishnan 2005): `depth` hash rows ×
  * `width` buckets of counts; point estimate = min over rows of the
  * token's bucket count. Always an OVERestimate (collisions only add),
  * exact when a token collides in no row — the property the spec pins.
  *
  * Scale shape: the sketch build is one explode (`depth` rows per
  * token) into a partial-agg count whose result is AT MOST depth×width
  * rows regardless of corpus size — the whole point of a sketch; the
  * estimate side broadcasts that bounded table. Width must divide 65536
  * (16-bit md5 slice, no modulo bias — the [[TrainExport.withShard]]
  * rule).
  */
object Sketches {

  /** Hash-row bucket of a token: 16-bit slice of md5("seed" + r + ":" +
    * token) mod `width`.
    */
  def cmsBucket(token: Column, r: Column, width: Int,
      seed: String = "cms"): Column =
    conv(substring(md5(concat(lit(seed), r.cast("string"), lit(":"), token)),
      1, 4), 16, 10).cast("long") % width

  private def checkParams(depth: Int, width: Int): Unit = {
    require(depth >= 1, s"depth must be positive, got $depth")
    require(width >= 2 && 65536 % width == 0,
      s"width must be >= 2 and divide 65536, got $width")
  }

  /** Build the count-min table from a token column: one row per
    * (hash row, bucket) with its collision-summed count — ≤ depth×width
    * rows total.
    */
  def countMinTable(toks: DataFrame, tokenCol: String, depth: Int,
      width: Int, seed: String = "cms"): DataFrame = {
    checkParams(depth, width)
    toks.select(col(tokenCol).as("__t"))
      .withColumn("r", explode(sequence(lit(0L), lit(depth - 1L))))
      .withColumn("bucket", cmsBucket(col("__t"), col("r"), width, seed))
      .groupBy("r", "bucket")
      .agg(count(lit(1)).as("c"))
  }

  /** Point estimates for a (small) candidate token set against a built
    * table: min over hash rows of the bucket count. The bounded table
    * broadcasts; candidates never shuffle. Tokens whose buckets are
    * absent from the table estimate 0 (they were never inserted).
    */
  def cmsEstimate(table: DataFrame, candidates: DataFrame,
      tokenCol: String, depth: Int, width: Int,
      seed: String = "cms"): DataFrame = {
    checkParams(depth, width)
    candidates.select(col(tokenCol)).distinct()
      .withColumn("r", explode(sequence(lit(0L), lit(depth - 1L))))
      .withColumn("bucket", cmsBucket(col(tokenCol), col("r"), width, seed))
      .join(broadcast(table), Seq("r", "bucket"), "left")
      .groupBy(col(tokenCol))
      .agg(min(coalesce(col("c"), lit(0L))).as("n_cms"))
  }
}
