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
}
