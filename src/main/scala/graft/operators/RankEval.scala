package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ranking-quality evaluation — the metrics pass that closes the ANN/
  * retrieval loop: given a SYSTEM ranking (IVF probe, BM25, hybrid,
  * rerank) and a GOLD ranking (exact scan) per query, emit recall@k,
  * reciprocal rank, and nDCG@k per query. The repo's recall gates
  * (q126/q138/q162) hard-code recall@10 inline; this is the
  * parameterized operator with the graded metrics beside it.
  */
object RankEval {

  /** Per-query recall@k / RR / nDCG@k from two (query, doc, rank)
    * frames with ranks 1..k (rows past `k` are ignored on both sides).
    *
    * Exactness conventions: counts and the recall division are exact
    * integers (q120); RR is ONE exact-integer division (1/rank of the
    * gold-top-1 document in the system list, 0 when absent); DCG gains
    * are the exact integers k+1−gold_rank with each term written
    * `rel * ln(2) / ln(rank + 1)` — ln on identical integer inputs is
    * bit-identical cross-engine (verified), products/divisions of
    * identical bits are deterministic, and only the per-query SUM
    * rounds (+1e-9, 6, the q97 doctrine). nDCG divides the two ROUNDED
    * sums (bit-identical inputs → identical quotient) and rounds once
    * more at the output boundary.
    *
    * Scale shape: every join and aggregation is query-keyed; list
    * sizes are bounded by k — the whole pass is linear in
    * |queries| · k. Queries with an empty gold list are dropped (nDCG
    * undefined).
    *
    * Output: (query_id, n_gold, n_hit, recall, rr, dcg, idcg, ndcg).
    */
  def rankingMetrics(sys: DataFrame, gold: DataFrame, k: Int,
      qCol: String = "query_id", dCol: String = "doc_id",
      rCol: String = "rank"): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val s = sys.select(col(qCol).as("__q"), col(dCol).as("__d"),
      col(rCol).cast("long").as("__sr")).filter(col("__sr") <= k)
    val g = gold.select(col(qCol).as("__q"), col(dCol).as("__d"),
      col(rCol).cast("long").as("__gr")).filter(col("__gr") <= k)
    val gStats = g.groupBy("__q").agg(
      count(lit(1)).as("n_gold"),
      round(sum((lit(k) + 1 - col("__gr")) * log(lit(2.0)) /
        log(col("__gr") + 1)) + lit(1e-9), 6).as("idcg"))
    val joined = s.join(g, Seq("__q", "__d"), "left_outer")
    val sysStats = joined.groupBy("__q").agg(
      sum(when(col("__gr").isNotNull, 1L).otherwise(0L)).as("n_hit"),
      round(sum(when(col("__gr").isNotNull,
          (lit(k) + 1 - col("__gr")) * log(lit(2.0)) /
            log(col("__sr") + 1))
        .otherwise(lit(0.0))) + lit(1e-9), 6).as("dcg"),
      max(when(col("__gr") === 1L, col("__sr"))).as("__top1r"))
    gStats.join(sysStats, Seq("__q"), "left_outer")
      .select(col("__q").as(qCol), col("n_gold"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        (coalesce(col("n_hit"), lit(0L)) / col("n_gold")).as("recall"),
        coalesce(lit(1.0) / col("__top1r"), lit(0.0)).as("rr"),
        coalesce(col("dcg"), lit(0.0)).as("dcg"), col("idcg"),
        round(coalesce(col("dcg"), lit(0.0)) / col("idcg") + lit(1e-9), 6)
          .as("ndcg"))
  }
}
