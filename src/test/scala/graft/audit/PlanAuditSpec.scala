package graft.audit

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Physical-plan assertions: the shapes we rely on at 100 TB must actually
  * be in the plan — filter/projection pushdown into the parquet scan,
  * TakeOrderedAndProject for top-k, broadcast for the small join sides.
  */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def plan(q: String): String =
    graft.SparkEntry.queries(q)(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString

  test("q02 search pushes filters and prunes columns at the scan") {
    val p = plan("q02_search_filter")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity)"), p.take(2000))
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double,l_discount:double"),
      "scan must read only the projected+filtered columns")
  }

  test("q01 aggregation is partial (map-side combine) with pushed date filter") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("HashAggregate"))
    assert(p.contains("partial_sum") || p.contains("partial"), "partial aggregation expected")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"))
  }

  test("q20 knn plans TakeOrderedAndProject with broadcast query side") {
    val p = plan("q20_knn_cosine")
    assert(p.contains("TakeOrderedAndProject"), "top-k must not be a full sort")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "single-row query side must broadcast")
    // the scoring project must sit inside a WholeStageCodegen span — the
    // custom expression's doGenCode is what makes it 6-7× faster than the
    // higher-order-function / UDF formulations (see graft.ScoreBench).
    // AQE only materializes codegen markers in the final plan → execute first.
    val df = graft.SparkEntry.queries("q20_knn_cosine")(spark, graft.TestSpark.sf)
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
    assert(finalPlan.contains("*(") && finalPlan.contains("cosine_sim"),
      s"cosine scoring must participate in whole-stage codegen:\n${finalPlan.take(1200)}")
  }

  test("q22 batch knn broadcasts queries and shuffles only on query_id") {
    val p = plan("q22_knn_batch")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("RunningWindowFunction") || p.contains("Window"))
  }

  test("q03 join broadcasts the customer dimension") {
    val p = plan("q03_join_revenue")
    assert(p.contains("BroadcastHashJoin"), "dimension join should broadcast")
  }

  test("q69 sq8 path: both passes are bounded heaps, quantized scoring codegen'd") {
    val p = plan("q69_sq8_rerank")
    // shortlist cut AND final cut must be TakeOrderedAndProject — a full
    // sort of the corpus would defeat the 100 TB design
    assert("TakeOrderedAndProject".r.findAllIn(p).size >= 2,
      s"expected two bounded top-k cuts:\n${p.take(1500)}")
    assert(p.contains("cosine_sim"), "quantized scoring must use the codegen'd expression")
  }

  test("kmeans probe prunes partitions at the scan") {
    import org.apache.spark.sql.types._
    val db = graft.core.GraftDatabase.create(spark,
      java.nio.file.Files.createTempDirectory("graft_audit").toString, "pdb")
    db.createCollection("vecs", StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType, containsNull = false)),
      StructField("label", IntegerType))))
    db.bulkInsert("vecs", graft.Tables.embeddings(spark, TestSpark.sf))
    db.reindexKMeans("vecs", k = 8)
    val q = graft.Tables.embeddings(spark, TestSpark.sf)
      .filter(org.apache.spark.sql.functions.col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray
    val probe = db.searchSimilar("vecs", q, k = 5, probeRadius = 1, idCol = "vec_id")
    val p = probe.queryExecution.executedPlan.toString
    // the cluster_id IN (...) filter must reach partition pruning, not a
    // post-scan filter over all files
    assert(p.contains("PartitionFilters: [cluster_id"),
      s"probe must prune cluster_id partitions at the scan:\n${p.take(1500)}")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("stored-sq8 shortlist scan reads only the quantized column") {
    import org.apache.spark.sql.types._
    val db = graft.core.GraftDatabase.create(spark,
      java.nio.file.Files.createTempDirectory("graft_audit_q8").toString, "qdb")
    db.createCollection("vecs", StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType, containsNull = false)),
      StructField("label", IntegerType))))
    db.bulkInsert("vecs", graft.Tables.embeddings(spark, TestSpark.sf))
    db.quantize("vecs")
    val q = graft.Tables.embeddings(spark, TestSpark.sf)
      .filter(org.apache.spark.sql.functions.col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray
    // the shortlist stage's scan must prune to (vec_id, embedding_q8) —
    // reading float vectors there would forfeit the 4× IO win
    val shortPlan = graft.operators.SimilaritySearch
      .sq8ShortlistStored(db.read("vecs"), q, 50, "cosine",
        "embedding_q8", "vec_id")
      .queryExecution.executedPlan.toString
    assert(shortPlan.contains("struct<vec_id:bigint,embedding_q8:array<tinyint>>"),
      s"shortlist scan must read only id + quantized column:\n${shortPlan.take(2000)}")
    assert(shortPlan.contains("TakeOrderedAndProject"))
    // and the rerank reads full vectors only behind a PUSHED id filter, so
    // row-group stats can skip — not a join that re-reads every float row
    val res = db.searchSimilarSq8("vecs", q, k = 5, shortlist = 50, idCol = "vec_id")
    val p = res.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [In(vec_id"),
      s"rerank scan must push the shortlist id filter:\n${p.take(2000)}")
    assert(res.count() == 5)
  }

  test("q67 two-phase sessionize: per-event window partitioned by (user, chunk)") {
    val p = plan("q67_sessionize_2phase")
    // the heavy (per-event) sort must key on user_id AND the chunk — that
    // is the whole point of the skew hardening
    assert(p.contains("hashpartitioning(user_id") && p.contains("__chunk"),
      s"phase-1 window must partition by (user, chunk):\n${p.take(1500)}")
  }
}
