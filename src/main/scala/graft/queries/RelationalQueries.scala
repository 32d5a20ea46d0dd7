package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Mutations

/** Relational operator coverage (SURVEY §2.1 checklist): scan + filter +
  * projection (SEARCH #9), joins of every flavor the engine needs
  * (broadcast, semi, anti), aggregation with partial combine, window, top-k,
  * set ops, conditional/json/time/string scalar functions, and the
  * UPDATE/DELETE dataflows as pure queries.
  *
  * Every query is paired with a DuckDB oracle in [[oracles]]; see SparkEntry
  * for the shared determinism conventions (total ORDER BY, rounding, BIGINT
  * casts).
  */
object RelationalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Pricing summary: filter → hash-agg with partial aggregation (map-side
    // combine) on two low-cardinality keys; scan-bound at scale, the shuffle
    // carries ~|groups| rows per partition.
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

    // SEARCH parity: selective filter + narrow projection. Catalyst pushes
    // both into the parquet scan (PushedFilters + pruned ReadSchema).
    "q02_search_filter" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_quantity") >= 48 && col("l_discount") > 0.08 &&
          col("l_shipdate") >= lit("1999-01-01").cast("timestamp"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // 3-way join: two broadcastable dimensions against the fact table.
    // customer is tiny → broadcast; orders×lineitem is the one real shuffle.
    "q03_join_revenue" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      val l = Tables.lineitem(s, dir)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("c_mktsegment")
    }),

    // Global top-k: orderBy+limit plans TakeOrderedAndProject (per-partition
    // heaps, no full sort, no shuffle of the losers).
    "q04_topk_orders" -> ((s, dir) => {
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
        .limit(10)
    }),

    // Per-group top-n: ranking window partitioned by customer. One shuffle
    // on the partition key; Spark's rank-limit pushdown keeps state bounded.
    "q05_window_topn" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey").orderBy(desc("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rn")
    }),

    // UPDATE dataflow as a query: upsert = anti-join(current, keys(updates))
    // ∪ updates — exactly what GraftDatabase.update rewrites. The +10.0
    // price bump is FP-exact so the oracle's CASE expression matches
    // bit-for-bit.
    "q06_update_merge" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val updates = o.filter(col("o_orderstatus") === "P")
        .withColumn("o_totalprice", col("o_totalprice") + lit(10.0))
      Mutations.upsert(o, updates, key = "o_orderkey")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    // DELETE dataflow: anti-join against a key set (broadcast — the delete
    // set is small relative to the fact table), then verify by aggregation.
    "q07_delete_antijoin" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir)
      val doomed = Tables.orders(s, dir)
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey").as("l_orderkey"))
      Mutations.deleteByKeys(l, doomed, key = "l_orderkey")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
        .orderBy("l_returnflag")
    }),

    // Exact distinct (dedup on relational keys).
    "q08_distinct" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // Set operations over two derived key sets: partkeys shipped at max
    // quantity vs partkeys shipped at deep discount — EXCEPT both ways plus
    // INTERSECT, tagged and unioned (non-empty on all three sides).
    "q09_setops" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir)
      val highQty = l.filter(col("l_quantity") >= 49)
        .select(col("l_partkey").as("partkey")).distinct()
      val deepDisc = l.filter(col("l_discount") > 0.09)
        .select(col("l_partkey").as("partkey")).distinct()
      highQty.except(deepDisc).withColumn("side", lit("qty_only"))
        .unionByName(deepDisc.except(highQty).withColumn("side", lit("disc_only")))
        .unionByName(highQty.intersect(deepDisc).withColumn("side", lit("both")))
        .orderBy("side", "partkey")
    }),

    // Anti-join: customers with no high-value order (NOT EXISTS).
    "q10_anti_customers" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
        .filter(col("o_totalprice") > 400000.0)
        .select(col("o_custkey").as("c_custkey"))
      c.join(o, Seq("c_custkey"), "left_anti")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    }),

    // Semi-join: customers having at least one order above a threshold.
    "q11_semi_customers" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
        .filter(col("o_totalprice") > 300000.0)
        .select(col("o_custkey").as("c_custkey"))
      c.join(o, Seq("c_custkey"), "left_semi")
        .select("c_custkey", "c_acctbal")
        .orderBy("c_custkey")
    }),

    // GROUP BY ... HAVING on the fact table.
    "q12_having" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
        .filter(col("n") > 100)
        .orderBy("l_suppkey")
    }),

    // JSON extraction from the events.props string column.
    "q13_json_events" -> ((s, dir) => {
      Tables.events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
          round(avg("k"), 4).as("avg_k"))
        .orderBy("event_type")
    }),

    // Time bucketing: events per hour (string-formatted hour keeps the
    // output schema timestamp-free on both engines).
    "q14_hourly_events" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(date_format(col("ts"), "yyyy-MM-dd HH").as("hour"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .orderBy("hour")
    }),

    // Star join through three broadcast dimensions: region ⋈ nation ⋈
    // supplier ⋈ lineitem, revenue per (region, nation).
    "q15_star_join" -> ((s, dir) => {
      val r = Tables.region(s, dir)
      val n = Tables.nation(s, dir)
      val sup = Tables.supplier(s, dir)
      val l = Tables.lineitem(s, dir)
      l.join(broadcast(sup), l("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
        .orderBy("r_name", "n_name")
    }),

    // Scalar string functions over documents.
    "q16_string_ops" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(
          col("doc_id"),
          length(col("text")).cast("long").as("len"),
          size(regexp_extract_all(col("text"), lit("\\S+"), lit(0))).cast("long").as("n_tokens"),
          upper(substring(col("text"), 1, 12)).as("prefix"))
        .orderBy("doc_id")
    }),

    // Hierarchical aggregation: ROLLUP over (returnflag, linestatus) with
    // subtotal rows surfaced via a sentinel (coalesce) so null-ordering
    // differences between engines can't reorder the result.
    "q18_rollup" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("sum_qty"))
        .orderBy("rf", "ls")
    }),

    // Sessionization: gap-based session assignment (5-minute idle gap) via
    // one shuffle on user_id feeding both windows, then per-session summary.
    "q19_sessionize" -> ((s, dir) => {
      graft.operators.Sessionize
        .sessionSummary(Tables.events(s, dir), "user_id", "ts", "event_id",
          gapSeconds = 300L)
        .orderBy("user_id", "session_no")
    }),

    // Skew-hardened sessionization: identical semantics to q19 but the
    // per-event window is partitioned by (user, hour-chunk), so one hot
    // user (bot traffic) can no longer serialize a reducer; chunk-boundary
    // sessions are stitched back in a second window over the (tiny) local
    // session summaries. Same oracle SQL as q19 — a hash match proves the
    // two-phase merge is exact.
    "q67_sessionize_2phase" -> ((s, dir) => {
      graft.operators.Sessionize
        .sessionSummaryChunked(Tables.events(s, dir), "user_id", "ts",
          "event_id", gapSeconds = 300L, chunkSeconds = 3600L)
        .orderBy("user_id", "session_no")
    }),

    // Hourly volume anomalies: z-score each (event_type, hour) count
    // against the type's own hourly distribution, flag |z| >= 1.5. Mean
    // and stddev are rounded BEFORE the z division and z is rounded
    // before the threshold compare, so accumulation-order ulps can
    // never flip a flag (the ln/rank doctrine applied to a filter).
    "q151_event_anomaly" -> ((s, dir) => {
      graft.operators.EventStats
        .hourlyAnomalies(Tables.events(s, dir), "ts", "event_type",
          zThreshold = 1.5)
        .orderBy("event_type", "hour")
    }),

    // Weekly cohort retention triangle via the EventStats OPERATOR —
    // the q74 composition promoted to a reusable, parameterized
    // operator (the q124→semDeDup doctrine), extended with cohort sizes
    // so rates stay exact-integer divisions. q74's inline formulation
    // stays as an independent cross-check of the same triangle.
    "q153_retention" -> ((s, dir) => {
      graft.operators.EventStats
        .cohortRetention(Tables.events(s, dir), "user_id", "ts", "event_type")
        .orderBy("cohort", "offset")
    }),

    // Strict-order k-step funnel: view → click → purchase, each step's
    // first event strictly after the previous step's. DISTINCT
    // semantics from q73 (which is a 2-step signup→purchase conversion
    // under a 7-day deadline): this one enforces full-sequence ordering
    // with no deadline, generalized to any step list. Step counts are
    // exact integers; timestamps compare at microseconds (the q19
    // epoch_us precedent).
    "q152_funnel" -> ((s, dir) => {
      graft.operators.EventStats
        .funnel(Tables.events(s, dir), "user_id", "ts", "event_type",
          Seq("view", "click", "purchase"))
        .orderBy("step")
    }),

    // As-of join: every purchase event gets its user's most recent prior
    // signup. Union-and-carry dataflow (one shuffle on user_id, no range
    // explosion); the oracle cross-checks with DuckDB's native ASOF JOIN —
    // two different algorithms, same semantics.
    "q50_asof_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts"), col("ts").as("signup_ts"))
      graft.operators.AsOfJoin
        .mostRecentPrior(purchases, signups, "user_id", "ts", Seq("signup_ts"))
        .select(
          col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
          date_format(col("asof_signup_ts"), "yyyy-MM-dd HH:mm:ss").as("signup_ts"))
        .orderBy("event_id")
    }),

    // Bucketed range join (point-in-interval): lineitems shipped inside
    // each sampled order's one-week window. The naive inequality join has
    // no equality key and plans as a nested-loop — RangeJoin turns it into
    // a hash equi-join on week buckets + exact containment filter
    // (asserted nested-loop-free in PlanAuditSpec). Epochs in ms on both
    // sides (unix_millis ↔ epoch_ms).
    "q95_interval_join" -> ((s, dir) => {
      val wk = 604800000L // 7 days in ms — fits INT32, no DuckDB overflow
      // parquet timestamps read as NTZ; session TZ is UTC, so the cast
      // interprets them as UTC — matching DuckDB's epoch_ms on naive ts
      def ms(c: Column) = unix_millis(c.cast("timestamp"))
      val iv = Tables.orders(s, dir).filter(col("o_orderkey") % 199 === 0)
        .select(col("o_orderkey"),
          ms(col("o_orderdate")).as("w_start"),
          (ms(col("o_orderdate")) + wk).as("w_end"))
      val pts = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), ms(col("l_shipdate")).as("t"))
      graft.operators.RangeJoin
        .pointInInterval(pts, iv, "t", "w_start", "w_end", bucketWidth = wk)
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n_shipped"),
          countDistinct(col("l_orderkey")).as("n_orders"))
        .orderBy("o_orderkey")
    }),

    // Interval×interval overlap join (the second range-join class):
    // 7-day order windows of one sparse order subset against 10-day
    // windows of another, bucketed so the overlap test is a hash
    // equi-join — the oracle runs the naive theta-join, proving the
    // bucketed plan emits each overlapping pair exactly once.
    "q103_overlap_join" -> ((s, dir) => {
      val wk = 604800000L // 7 days in ms
      val tenDays = 864000000L // 10 days in ms — fits INT32 for DuckDB
      def ms(c: Column) = unix_millis(c.cast("timestamp"))
      val a = Tables.orders(s, dir).filter(col("o_orderkey") % 199 === 0)
        .select(col("o_orderkey").as("a_key"),
          ms(col("o_orderdate")).as("a_start"),
          (ms(col("o_orderdate")) + wk).as("a_end"))
      val b = Tables.orders(s, dir).filter(col("o_orderkey") % 211 === 0)
        .select(col("o_orderkey").as("b_key"),
          ms(col("o_orderdate")).as("b_start"),
          (ms(col("o_orderdate")) + tenDays).as("b_end"))
      graft.operators.RangeJoin
        .intervalOverlap(a, b, "a_start", "a_end", "b_start", "b_end",
          bucketWidth = tenDays)
        .select(col("a_key"), col("b_key"),
          (least(col("a_end"), col("b_end")) -
            greatest(col("a_start"), col("b_start"))).as("overlap_ms"))
        .orderBy("a_key", "b_key")
    }),

    // CUBE over two dimensions with sentinel subtotals.
    "q51_cube" -> ((s, dir) => {
      Tables.orders(s, dir)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("sum_price"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("sum_price"))
        .orderBy("status", "priority")
    }),

    // JSON → typed struct via from_json (schema-on-read for the props
    // column), grouped stats over the extracted field.
    "q63_json_struct" -> ((s, dir) => {
      Tables.events(s, dir)
        .withColumn("p", from_json(col("props"),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.LongType)))))
        .groupBy(col("event_type"))
        .agg(
          min(col("p.k")).as("min_k"),
          max(col("p.k")).as("max_k"),
          count(when(col("p.k") > 50, 1)).as("n_big_k"))
        .orderBy("event_type")
    }),

    // Pivot: event counts as one column per event type (fixed small
    // domain); the oracle is the equivalent conditional aggregation, which
    // is also exactly what Catalyst lowers pivot to.
    "q64_pivot" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("day")
    }),

    // Skew-salted join vs a plain SQL join oracle: salting must be
    // invisible in the result (the hot key here: a handful of customers
    // own most orders after the filter).
    "q57_salted_join" -> ((s, dir) => {
      val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey", "o_totalprice")
      val c = Tables.customer(s, dir).select(
        col("c_custkey").as("o_custkey"), col("c_mktsegment"))
      graft.operators.Skew.saltedJoin(o, c, "o_custkey", saltFactor = 8)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("sum_price"))
        .orderBy("c_mktsegment")
    }),

    // Bucketed-table co-located join: both sides written bucketed by the
    // join key (external tables at a scratch path), joined shuffle-free;
    // the oracle is the plain join on the source tables — identical rows
    // prove the bucketing layout is a pure physical optimization.
    "q58_bucketed_join" -> ((s, dir) => {
      // unique table names + scratch path per invocation: the query fn has
      // write side effects by nature (bucketing IS a write-time layout), so
      // concurrent/repeated calls must not race on shared catalog names
      val tag = java.util.UUID.randomUUID().toString.take(8)
      val tmp = Scratch.dir(s"graft_q58_$tag") // exit-cleaned
      val (tO, tC) = (s"b58_orders_$tag", s"b58_customer_$tag")
      val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey", "o_totalprice")
      val c = Tables.customer(s, dir).select("c_custkey", "c_mktsegment")
        .withColumnRenamed("c_custkey", "o_custkey")
      graft.operators.Bucketing.writeBucketed(o, tO, "o_custkey", 8, path = Some(s"$tmp/o"))
      graft.operators.Bucketing.writeBucketed(c, tC, "o_custkey", 8, path = Some(s"$tmp/c"))
      graft.operators.Bucketing.cozyJoin(s, tO, tC, "o_custkey")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("sum_price"))
        .orderBy("c_mktsegment")
    }),

    // Spark's native session_window (gap-based) — cross-validated against
    // the lag+running-sum sessionization (q19) and the SQL-window oracle:
    // three independent formulations must agree on session boundaries.
    "q56_session_window" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "5 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          col("n_events"))
        .orderBy("user_id", "session_start")
    }),

    // Exact continuous percentiles (median + p90) per order status.
    "q53_percentiles" -> ((s, dir) => {
      Tables.orders(s, dir)
        .groupBy("o_orderstatus")
        .agg(
          round(expr("percentile(o_totalprice, 0.5D)"), 4).as("p50"),
          round(expr("percentile(o_totalprice, 0.9D)"), 4).as("p90"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus")
    }),

    // Running aggregate: per-customer cumulative order value over time —
    // frame-ordered accumulation is identical in both engines, so values
    // match exactly before rounding.
    // Explicit GROUPING SETS (the general form behind q18's ROLLUP / q51's
    // CUBE) through the SQL-text surface.
    "q77_grouping_sets" -> ((s, dir) => {
      val view = Scratch.name("orders_gs") // unique: fixed view names race
      Tables.orders(s, dir).createOrReplaceTempView(view)
      s.sql(
        s"""SELECT coalesce(o_orderstatus, 'ALL') AS st,
           |  coalesce(o_orderpriority, 'ALL') AS pri,
           |  count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
           |FROM $view
           |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
           |ORDER BY st, pri""".stripMargin)
    }),

    // Funnel: per event-type first-touch funnel for each user (signup →
    // first purchase within 7 days), aggregated to conversion counts. One
    // shuffle on user_id; the per-user min() aggregations combine map-side.
    "q73_funnel" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val firstSignup = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min(unix_micros(col("ts"))).as("signup_us"))
      val firstConv = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("p_us"))
        .join(firstSignup, Seq("user_id"))
        .filter(col("p_us") >= col("signup_us") &&
          col("p_us") < col("signup_us") + lit(7L * 86400L * 1000000L))
        .groupBy("user_id").agg(min(col("p_us")).as("conv_us"))
      firstSignup.join(firstConv, Seq("user_id"), "left")
        .agg(
          count(lit(1)).as("n_signed"),
          count(col("conv_us")).as("n_converted"),
          round(count(col("conv_us")) / count(lit(1)).cast("double") + 1e-9, 4)
            .as("conversion"))
    }),

    // Top event PATHS (3-step sequences): q104's Markov matrix says
    // which single hop is common; this ranks whole 3-step journeys —
    // the product-analytics "what do users actually do" query. Two
    // leads over the user-keyed window, counts per path, share = one
    // exact division by the path total (the normalizing window runs
    // over the ≤ |types|³ aggregate, never the event stream).
    "q256_event_paths" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("step2", lead("event_type", 1).over(w))
        .withColumn("step3", lead("event_type", 2).over(w))
        .filter(col("step3").isNotNull)
        .groupBy(col("event_type").as("step1"), col("step2"), col("step3"))
        .agg(count(lit(1)).as("n"))
        .withColumn("share", col("n") /
          sum("n").over(org.apache.spark.sql.expressions.Window
            .partitionBy()))
        .orderBy(desc("n"), col("step1"), col("step2"), col("step3"))
        .limit(20)
    }),

    // Time-to-convert distribution: q73's converters, delay quantized
    // to HOURS (exact modulus-free floor division — the quantization
    // bounds the value grain at 168 rows, so the cumulative window and
    // nearest-rank picks never touch user-grain data), and EXACT
    // nearest-rank percentiles k = ⌈p·n/100⌉ in pure integer math —
    // zero floats anywhere (the q53 interpolated percentiles' exact
    // integer sibling).
    "q257_convert_time" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
      val firstSignup = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min(unix_micros(col("ts"))).as("signup_us"))
      val conv = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("p_us"))
        .join(firstSignup, Seq("user_id"))
        .filter(col("p_us") >= col("signup_us") &&
          col("p_us") < col("signup_us") + lit(7L * 86400L * 1000000L))
        .groupBy("user_id", "signup_us").agg(min(col("p_us")).as("conv_us"))
      val hrs = conv.select(
        expr("(conv_us - signup_us) DIV 3600000000").as("h"))
      val cum = hrs.groupBy("h").agg(count(lit(1)).as("c"))
        .withColumn("cum", sum("c").over(
          org.apache.spark.sql.expressions.Window.orderBy("h")
            .rowsBetween(org.apache.spark.sql.expressions.Window
              .unboundedPreceding, 0)))
      cum.crossJoin(broadcast(hrs.agg(count(lit(1)).as("n"))))
        .crossJoin(broadcast(Seq(25L, 50L, 75L, 90L).toDF("p")))
        .withColumn("k", expr("(n * p + 99) DIV 100"))
        .filter(col("cum") >= col("k"))
        .groupBy("p", "n", "k").agg(min("h").as("hours"))
        .select(col("p"), col("n"), col("k"), col("hours"))
        .orderBy("p")
    }),

    // Event-transition matrix (per-user Markov counts): each user's
    // event stream paired with its successor via lead() — one shuffle on
    // user_id for the window, a partial-agg count of (from, to) pairs,
    // and transition probabilities normalized per source state by a
    // window over the TINY (|types|²) aggregate, never the event stream.
    "q104_transitions" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val pw = org.apache.spark.sql.expressions.Window
        .partitionBy("from_type")
      Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("to_type", lead("event_type", 1).over(w))
        .filter(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("p", round(
          col("n") / sum("n").over(pw).cast("double") + lit(1e-9), 6))
        .orderBy("from_type", "to_type")
    }),

    // Retention cohorts: users grouped by signup week, activity counted by
    // week offset — the canonical triangle. date_trunc arithmetic only, one
    // shuffle on (cohort, offset).
    "q74_retention" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val cohort = ev.filter(col("event_type") === "signup")
        .groupBy("user_id")
        .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
      ev.select(col("user_id"), date_trunc("week", col("ts")).as("act_week"))
        .join(cohort, Seq("user_id"))
        .filter(col("act_week") >= col("cohort_week"))
        .groupBy(
          date_format(col("cohort_week"), "yyyy-MM-dd").as("cohort_week"),
          ((unix_micros(col("act_week")) - unix_micros(col("cohort_week")))
            / lit(7L * 86400L * 1000000L)).cast("long").as("week_offset"))
        .agg(countDistinct(col("user_id")).as("active_users"))
        .orderBy("cohort_week", "week_offset")
    }),

    // Engagement stickiness: per active day, DAU / rolling-7-day WAU —
    // rolling distinct via the (user, day) fan-out (no window-distinct
    // exists), exact epoch-day integers, ONE division per row.
    "q292_stickiness" -> ((s, dir) => {
      graft.operators.EventStats.stickiness(
        Tables.events(s, dir), "user_id", "ts", window = 7)
    }),

    // Time-constrained funnel: signup → view → purchase, each step
    // within 6 hours of the previous — the conversion-window form of
    // q-funnel's lifetime question. Exact epoch-microsecond gap math.
    "q297_windowed_funnel" -> ((s, dir) => {
      graft.operators.EventStats.windowedFunnel(
        Tables.events(s, dir), "user_id", "ts", "event_type",
        Seq("signup", "view", "purchase"), maxGapMicros = 21600000000L)
        .orderBy("step")
    }),

    // Any-anchor time-constrained funnel — q297's sibling semantic:
    // ANY qualifying prior-step occurrence may open the conversion
    // window (the retry-converts reading). Per-step state is the
    // distinct qualifying-time set per user; still one user-keyed
    // join + distinct per step.
    "q308_funnel_any_anchor" -> ((s, dir) => {
      graft.operators.EventStats.windowedFunnelAnyAnchor(
        Tables.events(s, dir), "user_id", "ts", "event_type",
        Seq("signup", "view", "purchase"), maxGapMicros = 21600000000L)
        .orderBy("step")
    }),

    // Behavioral-prefix duplicate detection: accounts whose first-3
    // event-type sequences are identical group together (the bot
    // screen — dedup applied to EVENT streams). The raw ordered prefix
    // is the key (no hash), (ts, event_id) the total order.
    "q296_behavior_prefix" -> ((s, dir) => {
      graft.operators.EventStats.behaviorPrefixGroups(
        Tables.events(s, dir), "user_id", "ts", "event_id", "event_type",
        k = 3, minUsers = 2)
    }),

    // Benford first-digit audit of the money column per return flag:
    // digit from the exact integer cents rendering (never float
    // formatting or log10 floors), groups×9 catalog grid with
    // zero-count digits contributing their expected mass, chi-squared
    // as the only rounded accumulation. The numeric forensic screen
    // beside the text-side quality family.
    "q294_benford" -> ((s, dir) => {
      graft.operators.NumericAudit.benfordDigits(
        Tables.lineitem(s, dir), "l_returnflag", "l_extendedprice")
    }),

    // Population Stability Index per source: token-length distributions
    // of a REFERENCE slice vs a CURRENT slice over 16 fixed-width bins
    // (width 32, top bin catch-all) — add-one smoothed single exact
    // divisions, ln-parity terms, one rounded sum. The slices split on
    // (doc_id DIV 20) % 2, NOT doc_id % 2: source = src(doc_id % 20) in
    // this testdata, so a parity split would give each slice disjoint
    // sources and an empty ref∩cur group set. The distribution-shape
    // drift monitor beside KS (q241), CUSUM (q295), and source-KL (q157).
    "q315_psi_drift" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("source"), col("doc_id"),
          graft.operators.TextAnalysis.tokenCount(col("text")).as("len"))
      graft.operators.NumericAudit.psiDrift(
        docs.filter(expr("(doc_id DIV 20) % 2") === 0),
        docs.filter(expr("(doc_id DIV 20) % 2") === 1),
        "source", "len", binWidth = 32, nBins = 16)
    }),

    // Time-to-convert distribution of the signup→view→purchase funnel
    // (q297's steps at a 7-day conversion window — the 6-hour window
    // converts nobody at the small SFs): per converted user, purchase
    // time − signup anchor in exact µs, as an exact 1-DAY-bucket
    // histogram with per-bucket min/max — one user-keyed chain + ONE
    // bucket-grain aggregation, zero rounding.
    "q325_funnel_latency" -> ((s, dir) => {
      graft.operators.EventStats.funnelLatency(
        Tables.events(s, dir), "user_id", "ts", "event_type",
        Seq("signup", "view", "purchase"),
        maxGapMicros = 604800000000L, bucketMicros = 86400000000L)
    }),

    // The 2-STEP funnel (signup→purchase direct, 7-day window) — the
    // shape whose streaming form exists (q330): one user-keyed chain,
    // one bucket-grain agg, exact integer µs throughout.
    "q329_funnel2_latency" -> ((s, dir) => {
      graft.operators.EventStats.funnelLatency(
        Tables.events(s, dir), "user_id", "ts", "event_type",
        Seq("signup", "purchase"),
        maxGapMicros = 604800000000L, bucketMicros = 86400000000L)
    }),

    // The FULL 3-step funnel on a stream — the state-machine path
    // (flatMapGroupsWithState + event-time timeouts): what SURVEY §2.14
    // proves impossible for the JOIN form, per-key custom state
    // expresses — each user's events buffer until the watermark passes
    // the chain's decision deadline (anchor + 2·gap), then the greedy
    // chain finalizes exactly once and the state evicts (bounded
    // replays flush terminal state with one punctuation row — live
    // streams advance watermarks with ongoing traffic). Histogram =
    // batch post-math on the conversion sink. q325's oracle VERBATIM.
    "q334_stream_funnel3" -> ((s, dir) => {
      graft.streaming.StatefulFunnel.funnelLatencyStream(s, dir,
        Seq("signup", "view", "purchase"), gapUs = 604800000000L,
        bucketMicros = 86400000000L,
        queryName = s"funnel3_${java.util.UUID.randomUUID().toString.take(8)}")
    }),

    // STREAMING funnel (r14 verdict item 5): the chained agg→join→agg
    // funnel reformulated under the q205→q204 doctrine — ONE watermarked
    // stream-stream join emits qualifying (user, t_a, t_b) pairs with
    // zero in-flight aggregations; anchors derive batch-side (the PSI
    // static-reference pattern); the histogram is batch post-math on the
    // sink (EventStats.funnelLatencyFromPairs). q329's oracle verbatim.
    "q330_stream_funnel" -> ((s, dir) => {
      graft.streaming.StreamingIngest.streamFunnelLatency(s, dir,
        queryName = s"funnel_${java.util.UUID.randomUUID().toString.take(8)}")
    }),

    // Exponentially time-decayed event counts per type — the
    // freshness-weighted popularity counter (trending screen). Anchor =
    // the data's own max epoch-µs (a replayable clock, collected as ONE
    // driver long); weights exp(−λ·age_µs), λ = ln2/halfLife_µs; the
    // one rounded accumulation is the weight sum (q148 exp-sum parity).
    "q323_decayed_counts" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val asOf = ev.agg(max(unix_micros(col("ts")))).head().getLong(0)
      graft.operators.EventStats.decayedCounts(ev, "event_type", "ts",
        asOf, halfLifeDays = 7.0)
    }),

    // The decayed counter on a STREAM: the anchor derives batch-side
    // (the PSI twin's static-reference pattern) and the operator body is
    // ONE aggregation, so decayedCounts runs UNCHANGED on the streaming
    // frame — stream ≡ batch by literal code identity, q323's oracle
    // verbatim.
    "q324_stream_decay" -> ((s, dir) => {
      graft.streaming.StreamingIngest.streamDecayedCounts(s, dir,
        queryName = s"decay_${java.util.UUID.randomUUID().toString.take(8)}")
    }),

    // STREAMING PSI: the reference profile is static, the current slice
    // streams through ONE complete-mode aggregation, and the
    // grid/smoothing/ln post-math is psiFromCounts — the same code the
    // batch operator calls. q315's oracle verbatim.
    "q319_stream_psi" -> ((s, dir) => {
      graft.streaming.StreamingIngest.streamPsiDrift(s, dir,
        queryName = s"psi_${java.util.UUID.randomUUID().toString.take(8)}")
    }),

    // STREAMING Benford audit: the digit projection is stateless row
    // math, so the stream pays ONE aggregation (grp×digit counts,
    // complete mode) and the grid/chi-squared post-math runs on the sink
    // table through the SAME NumericAudit.benfordFromCounts the batch
    // audit calls — q294's oracle verbatim (the q245/q262 stream-twin
    // economics applied to the numeric-audit family).
    "q314_stream_benford" -> ((s, dir) => {
      graft.streaming.StreamingIngest.streamBenford(s, dir,
        queryName = s"benford_${java.util.UUID.randomUUID().toString.take(8)}")
    }),

    "q54_running_sum" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      Tables.orders(s, dir)
        .filter(col("o_custkey") < 100)
        .select(col("o_custkey"), col("o_orderkey"),
          round(sum(col("o_totalprice")).over(w), 2).as("run_total"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // String-similarity scalar: Levenshtein distance of part names to a
    // reference string (both engines implement the same classic DP).
    "q55_levenshtein" -> ((s, dir) => {
      Tables.part(s, dir)
        .select(col("p_partkey"), col("p_name"),
          levenshtein(col("p_name"), lit("standard brushed steel")).cast("long").as("dist"))
        .orderBy("p_partkey")
    }),

    // Conditional aggregation (CASE WHEN inside agg).
    "q17_case_when" -> ((s, dir) => {
      Tables.orders(s, dir)
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n"),
          sum(when(col("o_totalprice") > 200000.0, 1L).otherwise(0L)).as("n_big"),
          round(avg(when(col("o_orderstatus") === "F", col("o_totalprice"))), 2).as("avg_f_price"))
        .orderBy("o_orderpriority")
    }),

    // Z-order layout audit: Morton-interleave (customer-bucket, order-day)
    // and aggregate per curve segment — per-bucket min/max of BOTH
    // dimensions stay tight (the property file skipping rides on). The
    // oracle recomputes the interleave bit-for-bit from ZOrder.zvalueSql.
    "q83_zorder" -> ((s, dir) => {
      import graft.operators.ZOrder
      val o = Tables.orders(s, dir)
        .select((col("o_custkey") % 256).cast("int").as("c1"),
          (dayofyear(col("o_orderdate")) % 256).cast("int").as("c2"))
      o.withColumn("__z", ZOrder.zvalue(col("c1"), col("c2"), 8))
        .groupBy(shiftright(col("__z"), 8).as("bucket"))
        .agg(count(lit(1)).as("n"),
          min("c1").cast("long").as("min_c1"), max("c1").cast("long").as("max_c1"),
          min("c2").cast("long").as("min_c2"), max("c2").cast("long").as("max_c2"))
        .orderBy("bucket")
    })
  )

  /** q294/q314 oracle: exact integer-cents digit extraction (never float
    * formatting or log10 floors), groups×9 grid with zero-count digits
    * carrying their expected mass, chi-squared the only rounded
    * accumulation — shared verbatim by the batch audit and its streaming
    * twin.
    */
  private lazy val benfordSql: String =
    """WITH base AS (
      |  SELECT l_returnflag AS grp,
      |    CAST(substr(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
      |      AS VARCHAR), 1, 1) AS INTEGER) AS digit
      |  FROM lineitem WHERE l_extendedprice > 0
      |    AND CAST(round(l_extendedprice * 100) AS BIGINT) >= 1),
      |counts AS (SELECT grp, digit, CAST(count(*) AS BIGINT) AS n_d
      |           FROM base GROUP BY 1, 2),
      |totals AS (SELECT grp, CAST(count(*) AS BIGINT) AS n
      |           FROM base GROUP BY 1),
      |grid AS (
      |  SELECT t.grp, d.digit, COALESCE(c.n_d, 0) AS n_d, t.n,
      |    ln(CAST(1 AS DOUBLE) + CAST(1 AS DOUBLE) / CAST(d.digit AS DOUBLE))
      |      / ln(CAST(10 AS DOUBLE)) * CAST(t.n AS DOUBLE) AS e
      |  FROM totals t
      |  CROSS JOIN (SELECT unnest(range(1, 10)) AS digit) d
      |  LEFT JOIN counts c ON c.grp = t.grp AND c.digit = d.digit)
      |SELECT grp, CAST(digit AS BIGINT) AS digit,
      |  CAST(n_d AS BIGINT) AS n_d, n,
      |  round(sum((CAST(n_d AS DOUBLE) - e) * (CAST(n_d AS DOUBLE) - e) / e)
      |    OVER (PARTITION BY grp) + 1e-9, 6) AS chi2
      |FROM grid
      |ORDER BY grp, digit""".stripMargin

  /** q315/q319 oracle: exact integer binning (// floor on non-negative
    * counts, clamped top bin), add-one smoothed single divisions of
    * exact counts, ln-parity terms written (cur − ref) · ln(cur/ref) in
    * the Spark op order, one rounded sum — shared verbatim by the batch
    * PSI and its streaming twin.
    */
  private lazy val psiDriftSql: String =
    """WITH d AS (
      |  SELECT source, doc_id,
      |    len(regexp_extract_all(text, '\S+')) AS lenv
      |  FROM documents),
      |rb AS (
      |  SELECT source AS grp, greatest(0, least(lenv // 32, 15)) AS bin
      |  FROM d WHERE (doc_id // 20) % 2 = 0),
      |cb AS (
      |  SELECT source AS grp, greatest(0, least(lenv // 32, 15)) AS bin
      |  FROM d WHERE (doc_id // 20) % 2 = 1),
      |rc AS (SELECT grp, bin, count(*) AS n_ref FROM rb GROUP BY 1, 2),
      |cc AS (SELECT grp, bin, count(*) AS n_cur FROM cb GROUP BY 1, 2),
      |rt AS (SELECT grp, count(*) AS nr FROM rb GROUP BY 1),
      |ct AS (SELECT grp, count(*) AS nc FROM cb GROUP BY 1),
      |grid AS (
      |  SELECT rt.grp, b.bin,
      |    COALESCE(rc.n_ref, 0) AS n_ref, COALESCE(cc.n_cur, 0) AS n_cur,
      |    rt.nr, ct.nc
      |  FROM rt JOIN ct ON ct.grp = rt.grp
      |  CROSS JOIN (SELECT unnest(range(0, 16)) AS bin) b
      |  LEFT JOIN rc ON rc.grp = rt.grp AND rc.bin = b.bin
      |  LEFT JOIN cc ON cc.grp = rt.grp AND cc.bin = b.bin),
      |t AS (
      |  SELECT grp, bin, n_ref, n_cur,
      |    (CAST(n_cur + 1 AS DOUBLE) / CAST(nc + 16 AS DOUBLE)
      |      - CAST(n_ref + 1 AS DOUBLE) / CAST(nr + 16 AS DOUBLE))
      |    * ln((CAST(n_cur + 1 AS DOUBLE) / CAST(nc + 16 AS DOUBLE))
      |        / (CAST(n_ref + 1 AS DOUBLE) / CAST(nr + 16 AS DOUBLE)))
      |      AS term
      |  FROM grid)
      |SELECT grp, CAST(bin AS BIGINT) AS bin,
      |  CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur,
      |  round(sum(term) OVER (PARTITION BY grp) + 1e-9, 6) AS psi
      |FROM t
      |ORDER BY grp, bin""".stripMargin

  /** q323/q324 oracle: the decay anchor is the data's own max epoch-µs
    * (replayable), λ written in the exact Spark op order with every
    * denominator literal CAST to DOUBLE, one rounded weight sum.
    */
  // the 3-step funnel latency histogram (q325 + its STATEFUL stream
  // twin q334): greedy-earliest chain, exact integer µs throughout
  private lazy val funnel3Sql: String =
    """WITH e AS (
      |  SELECT user_id AS u, event_type AS et, epoch_us(ts) AS t
      |  FROM events),
      |s1 AS (SELECT u, min(t) AS t1 FROM e WHERE et = 'signup'
      |       GROUP BY u),
      |s2 AS (SELECT e.u, s1.t1, min(e.t) AS t2 FROM e
      |       JOIN s1 ON e.u = s1.u
      |       WHERE e.et = 'view' AND e.t > s1.t1
      |         AND e.t <= s1.t1 + 604800000000
      |       GROUP BY e.u, s1.t1),
      |s3 AS (SELECT e.u, s2.t1, min(e.t) AS t3 FROM e
      |       JOIN s2 ON e.u = s2.u
      |       WHERE e.et = 'purchase' AND e.t > s2.t2
      |         AND e.t <= s2.t2 + 604800000000
      |       GROUP BY e.u, s2.t1),
      |lat AS (SELECT t3 - t1 AS l FROM s3)
      |SELECT l // 86400000000 AS bucket, CAST(count(*) AS BIGINT) AS n_users,
      |  CAST(min(l) AS BIGINT) AS lo_us, CAST(max(l) AS BIGINT) AS hi_us
      |FROM lat
      |GROUP BY 1
      |ORDER BY bucket""".stripMargin

  // the 2-step funnel latency histogram (q329 + its stream twin q330):
  // q325's chain with the middle step removed — all exact integer µs
  private lazy val funnel2Sql: String =
    """WITH e AS (
      |  SELECT user_id AS u, event_type AS et, epoch_us(ts) AS t
      |  FROM events),
      |s1 AS (SELECT u, min(t) AS t1 FROM e WHERE et = 'signup'
      |       GROUP BY u),
      |s2 AS (SELECT e.u, s1.t1, min(e.t) AS t2 FROM e
      |       JOIN s1 ON e.u = s1.u
      |       WHERE e.et = 'purchase' AND e.t > s1.t1
      |         AND e.t <= s1.t1 + 604800000000
      |       GROUP BY e.u, s1.t1),
      |lat AS (SELECT t2 - t1 AS l FROM s2)
      |SELECT l // 86400000000 AS bucket, CAST(count(*) AS BIGINT) AS n_users,
      |  CAST(min(l) AS BIGINT) AS lo_us, CAST(max(l) AS BIGINT) AS hi_us
      |FROM lat
      |GROUP BY 1
      |ORDER BY bucket""".stripMargin

  private lazy val decayedCountsSql: String =
    """WITH e AS (SELECT event_type AS grp, epoch_us(ts) AS t FROM events),
      |mx AS (SELECT max(t) AS mt FROM e)
      |SELECT grp, CAST(count(*) AS BIGINT) AS n,
      |  round(sum(exp(-(ln(CAST(2 AS DOUBLE)) /
      |      ((CAST(7 AS DOUBLE) * CAST(86400 AS DOUBLE))
      |        * CAST(1000000 AS DOUBLE)))
      |    * CAST(mx.mt - t AS DOUBLE))) + 1e-9, 6) AS decayed
      |FROM e, mx
      |GROUP BY grp
      |ORDER BY grp""".stripMargin

  val oracles: Map[String, String] = Map(

    "q153_retention" ->
      """WITH c AS (
        |  SELECT user_id, date_trunc('week', min(ts)) AS cohort
        |  FROM events WHERE event_type = 'signup' GROUP BY 1),
        |sz AS (SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_size
        |       FROM c GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS w
        |      FROM events),
        |j AS (
        |  SELECT c.cohort,
        |    CAST((epoch_us(a.w) - epoch_us(c.cohort)) / 604800000000 AS BIGINT) AS "offset",
        |    a.user_id
        |  FROM a JOIN c USING (user_id)
        |  WHERE epoch_us(a.w) >= epoch_us(c.cohort)),
        |r AS (
        |  SELECT cohort, "offset", CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |  FROM j GROUP BY 1, 2)
        |SELECT strftime(r.cohort, '%Y-%m-%d') AS cohort,
        |  CAST("offset" AS BIGINT) AS "offset", n_users, cohort_size
        |FROM r JOIN sz USING (cohort)
        |ORDER BY cohort, "offset"""".stripMargin,

    "q152_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t
        |  FROM events e JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > epoch_us(s1.t)
        |  GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t
        |  FROM events e JOIN s2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > epoch_us(s2.t)
        |  GROUP BY 1)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS step, 'view' AS event_type,
        |    CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_users
        |  UNION ALL
        |  SELECT CAST(2 AS BIGINT), 'click',
        |    CAST((SELECT count(*) FROM s2) AS BIGINT)
        |  UNION ALL
        |  SELECT CAST(3 AS BIGINT), 'purchase',
        |    CAST((SELECT count(*) FROM s3) AS BIGINT))
        |ORDER BY step""".stripMargin,

    "q151_event_anomaly" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT event_type,
        |    round(avg(n) + 1e-9, 6) AS m,
        |    round(coalesce(stddev_samp(n), 0.0) + 1e-9, 6) AS s
        |  FROM hourly GROUP BY event_type),
        |z AS (
        |  SELECT h.event_type, strftime(h.h, '%Y-%m-%d %H') AS hour, h.n,
        |    CASE WHEN st.s = 0.0 THEN 0.0
        |         ELSE round((h.n - st.m) / st.s + 1e-9, 6) END AS z
        |  FROM hourly h JOIN st USING (event_type))
        |SELECT event_type, hour, n, z
        |FROM z WHERE abs(z) >= 1.5
        |ORDER BY event_type, hour""".stripMargin,

    "q83_zorder" -> {
      val zv = graft.operators.ZOrder.zvalueSql("c1", "c2", 8)
      s"""WITH k AS (
         |  SELECT CAST(o_custkey % 256 AS INTEGER) AS c1,
         |    CAST(dayofyear(o_orderdate) % 256 AS INTEGER) AS c2
         |  FROM orders),
         |z AS (SELECT c1, c2, ($zv) AS zv FROM k)
         |SELECT CAST(zv >> 8 AS BIGINT) AS bucket, count(*) AS n,
         |  CAST(min(c1) AS BIGINT) AS min_c1, CAST(max(c1) AS BIGINT) AS max_c1,
         |  CAST(min(c2) AS BIGINT) AS min_c2, CAST(max(c2) AS BIGINT) AS max_c2
         |FROM z
         |GROUP BY 1
         |ORDER BY bucket""".stripMargin
    },

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

    "q02_search_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount
        |FROM lineitem
        |WHERE l_quantity >= 48 AND l_discount > 0.08
        |  AND l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q03_join_revenue" ->
      """SELECT c_mktsegment,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "q04_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  strftime(o_orderdate, '%Y-%m-%d') AS order_date
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 10""".stripMargin,

    "q05_window_topn" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,

    "q06_update_merge" ->
      """SELECT o_orderkey, o_orderstatus,
        |  CASE WHEN o_orderstatus = 'P' THEN o_totalprice + 10.0
        |       ELSE o_totalprice END AS o_totalprice
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,

    "q07_delete_antijoin" ->
      """SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q08_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus
        |FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q09_setops" ->
      """WITH high_qty AS (
        |  SELECT DISTINCT l_partkey AS partkey FROM lineitem WHERE l_quantity >= 49),
        |deep_disc AS (
        |  SELECT DISTINCT l_partkey AS partkey FROM lineitem WHERE l_discount > 0.09)
        |SELECT partkey, 'qty_only' AS side FROM (FROM high_qty EXCEPT FROM deep_disc)
        |UNION ALL
        |SELECT partkey, 'disc_only' AS side FROM (FROM deep_disc EXCEPT FROM high_qty)
        |UNION ALL
        |SELECT partkey, 'both' AS side FROM (FROM high_qty INTERSECT FROM deep_disc)
        |ORDER BY side, partkey""".stripMargin,

    "q10_anti_customers" ->
      """SELECT c_custkey, c_mktsegment
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin,

    "q11_semi_customers" ->
      """SELECT c_custkey, c_acctbal
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
        |ORDER BY c_custkey""".stripMargin,

    "q12_having" ->
      """SELECT l_suppkey, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |GROUP BY l_suppkey
        |HAVING count(*) > 100
        |ORDER BY l_suppkey""".stripMargin,

    "q13_json_events" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q14_hourly_events" ->
      """SELECT strftime(ts, '%Y-%m-%d %H') AS hour,
        |  count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events
        |GROUP BY hour
        |ORDER BY hour""".stripMargin,

    "q15_star_join" ->
      """SELECT r_name, n_name,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,

    "q16_string_ops" ->
      """SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS len,
        |  CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
        |  upper(substring(text, 1, 12)) AS prefix
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "q18_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,

    "q19_sessionize" ->
      """WITH ordered AS (
        |  SELECT user_id, event_id, ts,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |flagged AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 300000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM ordered),
        |sess AS (
        |  SELECT user_id, event_id, ts,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                        ROWS UNBOUNDED PRECEDING) AS session_no
        |  FROM flagged)
        |SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
        |  count(*) AS n_events,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  round((epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000.0, 3) AS duration_sec
        |FROM sess
        |GROUP BY user_id, session_no
        |ORDER BY user_id, session_no""".stripMargin,

    "q77_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS st,
        |  coalesce(o_orderpriority, 'ALL') AS pri,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY st, pri""".stripMargin,

    "q73_funnel" ->
      """WITH fs AS (
        |  SELECT user_id, min(epoch_us(ts)) AS signup_us
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |fc AS (
        |  SELECT e.user_id, min(epoch_us(e.ts)) AS conv_us
        |  FROM events e JOIN fs USING (user_id)
        |  WHERE e.event_type = 'purchase'
        |    AND epoch_us(e.ts) >= fs.signup_us
        |    AND epoch_us(e.ts) < fs.signup_us + 604800000000
        |  GROUP BY e.user_id)
        |SELECT CAST(count(*) AS BIGINT) AS n_signed,
        |  CAST(count(conv_us) AS BIGINT) AS n_converted,
        |  round(CAST(count(conv_us) AS DOUBLE) / count(*) + 1e-9, 4) AS conversion
        |FROM fs LEFT JOIN fc USING (user_id)""".stripMargin,

    // Convert-time replay: the q73 funnel chain carrying signup_us,
    // modulus-free hour floor-division (// is unsupported here), the
    // value-grain cumulative window, exact ⌈p·n/100⌉ ranks.
    "q257_convert_time" ->
      """WITH fs AS (
        |  SELECT user_id, min(epoch_us(ts)) AS signup_us
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |fc AS (
        |  SELECT e.user_id, fs.signup_us, min(epoch_us(e.ts)) AS conv_us
        |  FROM events e JOIN fs USING (user_id)
        |  WHERE e.event_type = 'purchase'
        |    AND epoch_us(e.ts) >= fs.signup_us
        |    AND epoch_us(e.ts) < fs.signup_us + 604800000000
        |  GROUP BY 1, 2),
        |hrs AS (
        |  SELECT CAST(((conv_us - signup_us)
        |    - ((conv_us - signup_us) % 3600000000)) / 3600000000 AS BIGINT)
        |    AS h
        |  FROM fc),
        |cum AS (
        |  SELECT h, sum(c) OVER (ORDER BY h
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM (SELECT h, count(*) AS c FROM hrs GROUP BY h)),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM hrs),
        |kv AS (
        |  SELECT CAST(ps.p AS BIGINT) AS p, nn.n AS n,
        |    CAST(((nn.n * ps.p + 99) - ((nn.n * ps.p + 99) % 100)) / 100
        |      AS BIGINT) AS k
        |  FROM (SELECT unnest([25, 50, 75, 90]) AS p) ps CROSS JOIN nn)
        |SELECT kv.p, kv.n, kv.k, min(cum.h) AS hours
        |FROM kv JOIN cum ON cum.cum >= kv.k
        |GROUP BY kv.p, kv.n, kv.k
        |ORDER BY p""".stripMargin,

    // Path replay: two leads over the same user-keyed order, path
    // counts, one exact division by the total.
    "q256_event_paths" ->
      """WITH nxt AS (
        |  SELECT event_type AS step1,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS step2,
        |    lead(event_type, 2) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS step3
        |  FROM events),
        |m AS (
        |  SELECT step1, step2, step3, count(*) AS n
        |  FROM nxt WHERE step3 IS NOT NULL
        |  GROUP BY 1, 2, 3)
        |SELECT step1, step2, step3, n,
        |  CAST(n AS DOUBLE) / sum(n) OVER () AS share
        |FROM m
        |ORDER BY n DESC, step1, step2, step3
        |LIMIT 20""".stripMargin,

    "q104_transitions" ->
      """WITH nxt AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |m AS (
        |  SELECT from_type, to_type, count(*) AS n
        |  FROM nxt WHERE to_type IS NOT NULL
        |  GROUP BY from_type, to_type)
        |SELECT from_type, to_type, n,
        |  round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type)
        |    + 1e-9, 6) AS p
        |FROM m
        |ORDER BY from_type, to_type""".stripMargin,

    "q297_windowed_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t
        |  FROM events e JOIN s1 ON s1.user_id = e.user_id
        |  WHERE e.event_type = 'view' AND e.ts > s1.t
        |    AND epoch_us(e.ts) <= epoch_us(s1.t) + 21600000000
        |  GROUP BY e.user_id),
        |s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t
        |  FROM events e JOIN s2 ON s2.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t
        |    AND epoch_us(e.ts) <= epoch_us(s2.t) + 21600000000
        |  GROUP BY e.user_id)
        |SELECT CAST(1 AS BIGINT) AS step, 'signup' AS event_type,
        |  (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n_users
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), 'view',
        |  (SELECT CAST(count(*) AS BIGINT) FROM s2)
        |UNION ALL
        |SELECT CAST(3 AS BIGINT), 'purchase',
        |  (SELECT CAST(count(*) AS BIGINT) FROM s3)
        |ORDER BY step""".stripMargin,

    "q308_funnel_any_anchor" ->
      """WITH s1 AS (
        |  SELECT DISTINCT user_id, ts AS t FROM events
        |  WHERE event_type = 'signup'),
        |s2 AS (
        |  SELECT DISTINCT e.user_id, e.ts AS t
        |  FROM events e JOIN s1 ON s1.user_id = e.user_id
        |  WHERE e.event_type = 'view' AND e.ts > s1.t
        |    AND epoch_us(e.ts) <= epoch_us(s1.t) + 21600000000),
        |s3 AS (
        |  SELECT DISTINCT e.user_id, e.ts AS t
        |  FROM events e JOIN s2 ON s2.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t
        |    AND epoch_us(e.ts) <= epoch_us(s2.t) + 21600000000)
        |SELECT CAST(1 AS BIGINT) AS step, 'signup' AS event_type,
        |  (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM s1) AS n_users
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), 'view',
        |  (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM s2)
        |UNION ALL
        |SELECT CAST(3 AS BIGINT), 'purchase',
        |  (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM s3)
        |ORDER BY step""".stripMargin,

    "q296_behavior_prefix" ->
      """WITH r AS (
        |  SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS rn
        |  FROM events),
        |seq AS (
        |  SELECT user_id, string_agg(event_type, '|' ORDER BY rn) AS prefix
        |  FROM r WHERE rn <= 3 GROUP BY user_id)
        |SELECT prefix, CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(min(user_id) AS BIGINT) AS canonical_user
        |FROM seq GROUP BY prefix
        |HAVING count(*) >= 2
        |ORDER BY n_users DESC, prefix""".stripMargin,

    // PSI: bins are exact integer math (// floor on non-negative counts,
    // clamped top bin), masses are add-one smoothed single divisions of
    // exact counts, ln on identical doubles, one rounded sum — term
    // written (cur − ref) · ln(cur/ref) in the same op order as the
    // Spark side
    "q315_psi_drift" -> psiDriftSql,
    // the PSI streaming twin gates on q315's oracle verbatim
    "q319_stream_psi" -> psiDriftSql,

    // funnel latency: the q297 greedy-earliest chain replayed with the
    // anchor carried through; exact integer µs and // bucket floors
    "q325_funnel_latency" -> funnel3Sql,

    // the stateful 3-step stream gates on the batch oracle verbatim
    "q334_stream_funnel3" -> funnel3Sql,

    // the 2-step funnel: q325's chain minus the middle step — anchor =
    // earliest signup, conversion = earliest purchase in the 7-day
    // window, exact-µs day buckets
    "q329_funnel2_latency" -> funnel2Sql,
    // the streaming reformulation gates on the batch oracle verbatim
    // (join-before-every-agg + static anchors + sink post-math ≡ the
    // greedy 2-step chain)
    "q330_stream_funnel" -> funnel2Sql,

    // decayed counts: λ recomputed with the Spark op order — ln(2.0)
    // over an all-CAST-DOUBLE denominator (the r12 decimal-literal
    // rule); ages exact integer µs (epoch_us parity proven by q297);
    // only the weight sum rounds
    "q323_decayed_counts" -> decayedCountsSql,
    // the streaming twin gates on the batch oracle verbatim
    "q324_stream_decay" -> decayedCountsSql,

    "q294_benford" -> benfordSql,
    // the streaming twin gates on the batch oracle verbatim (the q102 →
    // q96 pattern): same digit rows, same grid math, only the execution
    // surface differs
    "q314_stream_benford" -> benfordSql,

    "q292_stickiness" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id AS u,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
        |  FROM events),
        |dau AS (SELECT d, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY 1),
        |fan AS (SELECT u, unnest(range(d, d + 7)) AS t FROM ud),
        |wau AS (SELECT t, CAST(count(DISTINCT u) AS BIGINT) AS wau
        |        FROM fan GROUP BY 1)
        |SELECT strftime(DATE '1970-01-01' + CAST(dau.d AS INTEGER), '%Y-%m-%d')
        |    AS day,
        |  dau.dau, wau.wau,
        |  CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE) AS stickiness
        |FROM dau JOIN wau ON wau.t = dau.d
        |ORDER BY day""".stripMargin,

    "q74_retention" ->
      """WITH cohort AS (
        |  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |act AS (
        |  SELECT e.user_id, date_trunc('week', e.ts) AS act_week, c.cohort_week
        |  FROM events e JOIN cohort c USING (user_id)
        |  WHERE date_trunc('week', e.ts) >= c.cohort_week)
        |SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
        |  CAST((epoch_us(act_week) - epoch_us(cohort_week)) / 604800000000 AS BIGINT) AS week_offset,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS active_users
        |FROM act
        |GROUP BY 1, 2
        |ORDER BY cohort_week, week_offset""".stripMargin,

    // same oracle as q19 on purpose: the two-phase operator must produce
    // byte-identical sessions to the single-window formulation
    "q67_sessionize_2phase" ->
      """WITH ordered AS (
        |  SELECT user_id, event_id, ts,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |flagged AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 300000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM ordered),
        |sess AS (
        |  SELECT user_id, event_id, ts,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                        ROWS UNBOUNDED PRECEDING) AS session_no
        |  FROM flagged)
        |SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
        |  count(*) AS n_events,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  round((epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000.0, 3) AS duration_sec
        |FROM sess
        |GROUP BY user_id, session_no
        |ORDER BY user_id, session_no""".stripMargin,

    "q50_asof_join" ->
      """WITH p AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |s AS (
        |  SELECT user_id, ts AS signup_ts FROM events WHERE event_type = 'signup')
        |SELECT p.event_id, p.user_id,
        |  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
        |  strftime(s.signup_ts, '%Y-%m-%d %H:%M:%S') AS signup_ts
        |FROM p ASOF LEFT JOIN s
        |  ON p.user_id = s.user_id AND p.ts >= s.signup_ts
        |ORDER BY event_id""".stripMargin,

    "q103_overlap_join" ->
      """SELECT a.o_orderkey AS a_key, b.o_orderkey AS b_key,
        |  least(epoch_ms(a.o_orderdate) + 604800000,
        |        epoch_ms(b.o_orderdate) + 864000000)
        |  - greatest(epoch_ms(a.o_orderdate),
        |             epoch_ms(b.o_orderdate)) AS overlap_ms
        |FROM orders a JOIN orders b
        |  ON epoch_ms(a.o_orderdate) < epoch_ms(b.o_orderdate) + 864000000
        | AND epoch_ms(b.o_orderdate) < epoch_ms(a.o_orderdate) + 604800000
        |WHERE a.o_orderkey % 199 = 0 AND b.o_orderkey % 211 = 0
        |ORDER BY a_key, b_key""".stripMargin,

    "q95_interval_join" ->
      """SELECT o.o_orderkey,
        |  count(*) AS n_shipped,
        |  CAST(count(DISTINCT l.l_orderkey) AS BIGINT) AS n_orders
        |FROM orders o JOIN lineitem l
        |  ON epoch_ms(l.l_shipdate) >= epoch_ms(o.o_orderdate)
        | AND epoch_ms(l.l_shipdate) < epoch_ms(o.o_orderdate) + 604800000
        |WHERE o.o_orderkey % 199 = 0
        |GROUP BY o.o_orderkey
        |ORDER BY o_orderkey""".stripMargin,

    "q51_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,

    "q63_json_struct" ->
      """SELECT event_type,
        |  CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
        |  CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
        |  count(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50 THEN 1 END) AS n_big_k
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q64_pivot" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
        |  CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
        |  CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error,
        |  CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
        |  CAST(count(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup,
        |  CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view
        |FROM events
        |GROUP BY 1
        |ORDER BY day""".stripMargin,

    "q57_salted_join" ->
      """SELECT c_mktsegment, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "q58_bucketed_join" ->
      """SELECT c_mktsegment, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    // NOTE: session_window's gap test is exclusive (a new session starts at
    // diff >= gap, because event windows [ts, ts+gap) must OVERLAP to
    // merge), hence >= here vs the strict > of q19's operator semantics.
    "q56_session_window" ->
      """WITH ordered AS (
        |  SELECT user_id, event_id, ts,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |flagged AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us >= 300000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM ordered),
        |sess AS (
        |  SELECT user_id, ts,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                        ROWS UNBOUNDED PRECEDING) AS session_no
        |  FROM flagged)
        |SELECT user_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  count(*) AS n_events
        |FROM sess
        |GROUP BY user_id, session_no
        |ORDER BY user_id, session_start""".stripMargin,

    "q53_percentiles" ->
      """SELECT o_orderstatus,
        |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        |  round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
        |  count(*) AS n
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    "q54_running_sum" ->
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS UNBOUNDED PRECEDING), 2) AS run_total
        |FROM orders
        |WHERE o_custkey < 100
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q55_levenshtein" ->
      """SELECT p_partkey, p_name,
        |  CAST(levenshtein(p_name, 'standard brushed steel') AS BIGINT) AS dist
        |FROM part
        |ORDER BY p_partkey""".stripMargin,

    "q17_case_when" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(CASE WHEN o_totalprice > 200000.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
        |  round(avg(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS avg_f_price
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin
  )
}
