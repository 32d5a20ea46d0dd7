package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins. AQE's skew-join handling covers most
  * cases at runtime; explicit salting remains the tool when a key's hotness
  * is known up front (power-law user ids, null-heavy foreign keys) or when
  * AQE is unavailable (e.g. inside some streaming plans).
  *
  * `saltedJoin` spreads each hot left key over `saltFactor` shuffle
  * partitions by appending a random salt to the left key and replicating
  * every right row once per salt value. Right-side replication costs
  * `saltFactor×` the (small) right side — the standard trade for unsticking
  * a hot reducer.
  */
object Skew {

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int = 8, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0)
    // right/full outer would surface the replicated right side: an
    // unmatched right row appears once per salt value in the output
    require(Set("inner", "left", "left_outer", "cross")(joinType.toLowerCase),
      s"saltedJoin supports left-preserving joins only, got $joinType " +
        "(right/full outer would emit saltFactor duplicates of unmatched right rows)")
    val salted = left.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltFactor)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted
      .join(replicated, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
