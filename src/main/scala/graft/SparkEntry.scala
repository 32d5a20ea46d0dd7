package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.SimilaritySearch

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is a deterministic DataFrame over the testdata
  * tables in `sfDir` (TESTDATA.md), with a matching DuckDB oracle in
  * [[oracleSql]]. Conventions shared by every query/oracle pair:
  *  - identical column names on both sides (the driver sorts columns by name
  *    before hashing);
  *  - a total ORDER BY (unique tie-break key) on both sides;
  *  - floating-point aggregates rounded (`round(x, n)`) on both sides so
  *    accumulation-order ulps can't flip the hash;
  *  - DuckDB integer sums cast to BIGINT (DuckDB widens to HUGEINT, Spark
  *    stays long).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- Relational core (SEARCH #9 + standard checklist ops) ----

    // Pricing summary: filter → hash-agg with partial aggregation (map-side
    // combine), grouped on two low-cardinality strings. At 100 TB this is a
    // scan-bound query; the only shuffle carries ~|groups| rows per partition.
    "q01_pricing_summary" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // ---- SEARCHSIMILAR #10: exact k-NN ----

    // Single-query exact cosine top-k. The query vector is row vec_id=0,
    // carried via a broadcast single-row join (no driver-side collect);
    // scoring is a codegen'd expression; orderBy+limit plans
    // TakeOrderedAndProject (no full sort).
    "q20_knn_cosine" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
      e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= 0)
        .select(
          col("vec_id"),
          round(graft.functions.cosine_sim(col("embedding"), col("q_emb")), 6).as("score"))
        .orderBy(desc("score"), col("vec_id"))
        .limit(10)
    }),

    // Single-query exact L2 top-k (ascending distance).
    "q21_knn_l2" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
      e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= 0)
        .select(
          col("vec_id"),
          round(graft.functions.l2_dist(col("embedding"), col("q_emb")), 6).as("dist"))
        .orderBy(asc("dist"), col("vec_id"))
        .limit(10)
    }),

    // Batched k-NN: 5 query vectors × collection, broadcast the query side,
    // per-query top-5 via ranking window partitioned by query id. The only
    // shuffle is on query_id (tiny); the collection is scanned once.
    "q22_knn_batch" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val queries = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      SimilaritySearch
        .topKBatch(e, queries, k = 5, metric = "cosine",
          vecCol = "embedding", idCol = "vec_id")
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          round(col("score"), 6).as("score"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    })
  )

  /** DuckDB oracle per query (same tables, same column names, same ORDER BY). */
  def oracleSql: Map[String, String] = Map(

    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q20_knn_cosine" ->
      """SELECT e.vec_id AS vec_id,
        |  round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])), 6) AS score
        |FROM embeddings e,
        |  (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        |WHERE e.vec_id <> 0
        |ORDER BY score DESC, vec_id
        |LIMIT 10""".stripMargin,

    "q21_knn_l2" ->
      """SELECT e.vec_id AS vec_id,
        |  round(list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])), 6) AS dist
        |FROM embeddings e,
        |  (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        |WHERE e.vec_id <> 0
        |ORDER BY dist ASC, vec_id
        |LIMIT 10""".stripMargin,

    "q22_knn_batch" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, embedding AS query_vec
        |  FROM embeddings WHERE vec_id < 5
        |), scored AS (
        |  SELECT q.query_id, e.vec_id,
        |    list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.query_vec AS DOUBLE[])) AS raw_score,
        |    row_number() OVER (PARTITION BY q.query_id
        |                       ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.query_vec AS DOUBLE[])) DESC, e.vec_id) AS rank
        |  FROM embeddings e CROSS JOIN q
        |)
        |SELECT query_id, vec_id, round(raw_score, 6) AS score, rank
        |FROM scored
        |WHERE rank <= 5 AND vec_id <> query_id
        |ORDER BY query_id, rank""".stripMargin
  )
}
