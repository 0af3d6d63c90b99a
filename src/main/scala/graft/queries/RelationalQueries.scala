package graft.queries

import graft.io.Tables
import graft.ops.Ops
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational query surface over the star schema (SURVEY.md §7 M5):
  * exercises the §2 operator inventory — aggregation (A3/A4), per-group top-k
  * (T1-T3), equi/semi/anti joins (the Spark-first replacements for the
  * reference's cross+contains J1), date-zone filters (P3), and window
  * functions.
  *
  * Every query:
  *  - aliases every computed column identically to its DuckDB oracle,
  *  - rounds floating aggregates so cross-engine hashes match,
  *  - ranks only on rounded values + a unique tie-break, so ordering is
  *    deterministic in both engines.
  */
object RelationalQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // A3/A4-style grouped aggregate (TPC-H Q1 shape) — partial aggregation
    // (map-side combine) is automatic; one shuffle on the two group keys.
    "q1_agg" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          Ops.discountedRevenue(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
          // exact-rational avg rounding (Ops.ratioHalfUp): quantity and
          // discount are 2-decimal fixed, so avg·10⁴ can land exactly on a
          // half-point where double rounding is engine-dependent
          Ops.ratioHalfUp(
            sum(round(col("l_quantity") * 100).cast("long")) * 100,
            count(lit(1)), 4).as("avg_qty"),
          Ops.ratioHalfUp(
            sum(round(col("l_discount") * 100).cast("long")) * 100,
            count(lit(1)), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),

    // T1: per-group top-k via window row_number (reference sortGroup+break,
    // TextRank.java:280-299). Single shuffle on the partition key.
    "q2_topk_per_group" -> ((s, d) => {
      Ops.topKPerGroup(
        Tables.lineitem(s, d).select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice"),
        Seq("l_returnflag"),
        Seq(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc),
        5)
    }),

    // J2-as-equi-join + grouped agg; customer is small → broadcast to keep a
    // single shuffle (lineitem⋈orders) in the plan.
    "q3_join_agg" -> ((s, d) => {
      val c = Tables.customer(s, d).select("c_custkey", "c_mktsegment")
      val o = Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_orderpriority")
      val l = Tables.lineitem(s, d).select("l_orderkey", "l_extendedprice", "l_discount")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("o_orderpriority"))
        .agg(
          Ops.discountedRevenue(col("l_extendedprice"), col("l_discount")).as("revenue"),
          count(lit(1)).as("n_lines"))
    }),

    // J1 done right: left-semi join (the reference emulates this with
    // cross + List.contains, TextRank.java:246-254) — Catalyst picks
    // BroadcastHashJoin(LeftSemi) since the filtered orders side is small.
    "q4_semi_join" -> ((s, d) => {
      val bigOrders = Tables.orders(s, d).filter(col("o_totalprice") > 150000).select("o_custkey")
      Tables.customer(s, d).select("c_custkey", "c_name")
        .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
    }),

    // Anti join — NOT EXISTS.
    "q5_anti_join" -> ((s, d) => {
      val o = Tables.orders(s, d).filter(col("o_totalprice") > 300000).select("o_custkey")
      Tables.customer(s, d).select("c_custkey", "c_name", "c_acctbal")
        .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .withColumn("c_acctbal", round(col("c_acctbal"), 2))
    }),

    // P3: DateZoneFilter window (direction 0 = past) as a pushed-down
    // Column predicate.
    "q6_date_window" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("day", to_date(col("ts")))
        .filter(Ops.dateZone(col("day"), java.sql.Date.valueOf("2024-01-15"), 3, 0))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
    }),

    // E3 HotTopics shape on lineitem: per-day top-3 parts by line count
    // (groupBy(date,key).sum → per-date top-k, HotTopics.java:41-46,75-91).
    "q7_hot_parts" -> ((s, d) => {
      val counts = Tables.lineitem(s, d)
        .withColumn("day", to_date(col("l_shipdate")))
        .groupBy(col("day"), col("l_partkey"))
        .agg(count(lit(1)).as("n"))
      Ops.topKPerGroup(counts, Seq("day"), Seq(col("n").desc, col("l_partkey").asc), 3)
    }),

    // A1: per-day distinct users (normalized count form).
    "q8_distinct_per_day" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n_events"))
    }),

    // T1 on events: per-user top-5 events by value.
    "q9_user_topk" -> ((s, d) => {
      Ops.topKPerGroup(
        Tables.events(s, d).select(col("user_id"), col("event_id"), round(col("value"), 2).as("value")),
        Seq("user_id"),
        Seq(col("value").desc, col("event_id").asc),
        5)
    }),

    // A4: global (ungrouped) aggregate.
    "q10_global_agg" -> ((s, d) => {
      Tables.lineitem(s, d).agg(
        count(lit(1)).as("n"),
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(min(col("l_extendedprice")), 2).as("min_price"),
        round(max(col("l_extendedprice")), 2).as("max_price"),
        countDistinct(col("l_orderkey")).as("n_orders"))
    }),

    // 5-way star join: dims are tiny → broadcast chain; the only shuffle is
    // the final group-by (and lineitem⋈orders if AQE doesn't broadcast it).
    "q11_star_join" -> ((s, d) => {
      val r = Tables.region(s, d)
      val n = Tables.nation(s, d)
      val c = Tables.customer(s, d).select("c_custkey", "c_nationkey")
      val o = Tables.orders(s, d).select("o_orderkey", "o_custkey")
      val l = Tables.lineitem(s, d).select("l_orderkey", "l_extendedprice", "l_discount")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          Ops.discountedRevenue(col("l_extendedprice"), col("l_discount")).as("revenue"),
          count(lit(1)).as("n_lines"))
    }),

    // The SQL API surface: the same star aggregation declared via
    // spark.sql over registered temp views (Catalyst path identical).
    "q48_sql_surface" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("g_lineitem")
      Tables.orders(s, d).createOrReplaceTempView("g_orders")
      s.sql(
        s"""SELECT o_orderpriority,
          |  ${SqlFragments.discountedRevenueSparkSql()} AS revenue,
          |  count(*) AS n_lines
          |FROM g_lineitem JOIN g_orders ON l_orderkey = o_orderkey
          |GROUP BY o_orderpriority""".stripMargin)
    }),

    // JSON payload extraction (events.props) — typed bucket aggregation.
    "q49_json_props" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy((col("k") % 10).as("k_bucket"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
    }),

    // Hierarchical aggregate (ROLLUP) — subtotal + grand-total rows in one
    // pass (engine-completeness beyond the reference's flat groupBys).
    "q52_rollup" -> ((s, d) => {
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
          count(lit(1)).as("n"))
    }),

    // As-of join: each event matched to the user's latest order at-or-before
    // the event time (union+window formulation; DuckDB native ASOF JOIN as
    // the oracle).
    "q53_asof_join" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("event_id"), col("user_id"), col("ts"))
      val ord = Tables.orders(s, d)
        .groupBy((col("o_custkey") % 1500).as("k"), col("o_orderdate").as("t"))
        .agg(max(col("o_orderkey")).as("o_orderkey"),
          max_by(col("o_totalprice"), col("o_orderkey")).as("o_totalprice"))
      Ops.asOfJoin(ev, "user_id", "ts", ord, "k", "t",
          Seq("o_orderkey", "o_totalprice"))
        .select(col("event_id"), col("user_id"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
    }),

    // Gap-based sessionization (ops.Sessionize, lag/cumsum window form):
    // 30-minute inactivity gap over the event stream, per-user session
    // ordinals + per-session stats.
    "q54_sessionize" -> ((s, d) =>
      graft.ops.Sessionize.sessionStats(
        Tables.events(s, d).select(col("user_id"), col("event_id"), col("ts")),
        "user_id", "ts", "event_id", 1800L)),

    // The same sessions via Spark's built-in session_window
    // (streaming.StreamingSessions — identical code path batch/streaming;
    // the streaming run is append+watermark, asserted ≡ batch in
    // PlanAndStreamSpec). Its merge rule must reproduce the lag/cumsum
    // form, so both run under equivalent oracles.
    "q60_session_window" -> ((s, d) =>
      graft.streaming.StreamingSessions.sessionAgg(
        Tables.events(s, d).select(col("user_id"), col("ts")))),

    // Full CUBE over two dimensions (q52's ROLLUP sibling): all 4 grouping
    // sets in one pass via Expand — no re-scan per set.
    "q55_cube" -> ((s, d) =>
      Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
          count(lit(1)).as("n"))),

    // Range/interval join, decomposed for scale: pre-aggregate the probe
    // side per day FIRST, then explode each interval into its member days
    // and equi-join on day — the O(|intervals|·|days|) bucketed plan, never
    // the O(N·M) theta join the BETWEEN predicate would naively produce.
    "q56_range_join" -> ((s, d) => {
      val iv = Tables.orders(s, d)
        .filter(col("o_orderkey") % 97 === 0)
        .select(col("o_orderkey"),
          date_add(lit(java.sql.Date.valueOf("2024-01-01")),
            (col("o_orderkey") % 28).cast("int")).as("d0"))
        .withColumn("d1", date_add(col("d0"), (col("o_orderkey") % 7).cast("int") + 1))
      val evDay = Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_ev"), round(sum(col("value")), 2).as("v"))
      iv.withColumn("day", explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))))
        .join(evDay, "day")
        .groupBy(col("o_orderkey"))
        .agg(sum(col("n_ev")).as("n_events"), round(sum(col("v")), 2).as("total_value"))
    }),

    // Exact nearest-rank percentiles: the value at ordered position
    // ceil(p·n) per group (continuous interpolation of 2-decimal prices
    // lands exactly on .005 halves, where engines' round() disagree —
    // nearest-rank is an existing data value, unambiguous cross-engine).
    "q57_percentiles" -> ((s, d) => {
      // Exact nearest-rank percentiles via the cumulative VALUE histogram
      // (Ops.cumHistogram): the previous row_number window partitioned by
      // the 3-value return flag sorted the whole corpus with parallelism 3
      // at any scale; the histogram form does the corpus-sized work in one
      // fully-parallel aggregate and window-sorts only distinct rounded
      // prices (domain-bounded). Selection and mean are bit-identical:
      // containsRank picks the same sorted-position element, and the
      // weighted fixed-point mean sums the identical per-row integers.
      val hist = Ops.cumHistogram(
        Tables.lineitem(s, d)
          .select(col("l_returnflag"), round(col("l_extendedprice"), 2).as("p")),
        Seq("l_returnflag"), "p")
      def at(q: Double) = max(when(Ops.containsRank(ceil(lit(q) * col("_n"))), col("p")))
      hist.groupBy(col("l_returnflag"))
        .agg(at(0.25).as("p25"), at(0.5).as("p50"), at(0.75).as("p75"),
          Ops.ratioHalfUp(
            sum(round(col("p") * 100).cast("long") * col("_cnt")),
            sum(col("_cnt")), 2).as("mean"))
    }),

    // Skew-mitigation pattern: two-phase salted aggregation (salt on a
    // uniform key → partial agg per (group, salt) → final agg per group).
    // Same result as the direct groupBy — the oracle IS the direct form.
    // At 100 TB this is how a 3-hot-group aggregation avoids 3 straggler
    // reducers; l_quantity sums are integer-valued so re-association is
    // exact.
    "q58_salted_agg" -> ((s, d) =>
      Tables.lineitem(s, d)
        .withColumn("_salt", pmod(col("l_orderkey"), lit(16)))
        .groupBy(col("l_returnflag"), col("_salt"))
        .agg(sum(col("l_quantity")).as("_pq"), count(lit(1)).as("_pn"))
        .groupBy(col("l_returnflag"))
        .agg(round(sum(col("_pq")), 2).as("sum_qty"), sum(col("_pn")).as("n"))),

    // Window-function suite: lag/lead/ntile/rank with a unique total order
    // per customer order history.
    "q59_window_suite" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      val wp = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_totalprice"))
        .withColumn("prev_price", round(lag(col("o_totalprice"), 1).over(w), 2))
        .withColumn("next_date", lead(col("o_orderdate"), 1).over(w))
        .withColumn("qtile", ntile(4).over(w))
        .withColumn("price_rank", rank().over(wp))
        .select(col("o_orderkey"), col("o_custkey"), col("prev_price"),
          col("next_date"), col("qtile"), col("price_rank"))
    }),

    // Full outer join (join-type completeness): daily click activity vs
    // daily order placements on non-overlapping date domains — both
    // unmatched sides must survive with nulls.
    "q63_full_outer" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("event_type") === "click")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_clicks"))
      val ord = Tables.orders(s, d)
        .filter(col("o_orderkey") % 997 === 0)
        .groupBy(col("o_orderdate").as("day"))
        .agg(count(lit(1)).as("n_orders"))
      ev.join(ord, Seq("day"), "full_outer")
        .select(col("day"), col("n_clicks"), col("n_orders"))
    }),

    // Pivot (long → wide): per-user event counts fanned across the five
    // event types. Explicit value list ⇒ stable schema, no discovery pass
    // over the data — the only pivot form that's sane at 100 TB.
    "q71_pivot" -> ((s, d) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val p = Tables.events(s, d)
        .groupBy(col("user_id").as("userId"))
        .pivot("event_type", types).count()
        .na.fill(0L, types)
      p.select(col("userId") +: types.map(t => col(t).as(s"n_$t")): _*)
    }),

    // Unpivot (wide → long): lineitem measures melted to (key, measure,
    // value) rows — the inverse surface, constant-folded per row (no
    // shuffle; it's a generate, not an aggregation).
    "q72_unpivot" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_quantity"), 2).as("l_quantity"),
          round(col("l_extendedprice"), 2).as("l_extendedprice"),
          round(col("l_discount"), 2).as("l_discount"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "measure", "value")),

    // Gap-filled daily series with LOCF: each user's observed click `value`
    // per day (last event wins), densified over the user's own date span,
    // missing days carrying the last observation forward — the standard
    // feature-pipeline resample. sequence+explode generates the calendar
    // per user (no driver loop); the fill is one ignoreNulls window.
    "q73_gapfill_locf" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val wPick = Window.partitionBy(col("user_id"), col("day"))
        .orderBy(col("ts").desc, col("event_id").desc)
      val obs = Tables.events(s, d)
        .filter(col("event_type") === "click")
        .select(col("user_id"), to_date(col("ts")).as("day"),
          col("ts"), col("event_id"), col("value"))
        .withColumn("_rn", row_number().over(wPick))
        .filter(col("_rn") === 1)
        .select(col("user_id"), col("day"), col("value"))
      val span = obs.groupBy(col("user_id"))
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      val cal = span.select(col("user_id"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
      val wFill = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cal.join(obs, Seq("user_id", "day"), "left")
        .withColumn("filled",
          round(last(col("value"), ignoreNulls = true).over(wFill), 6))
        .select(col("user_id").as("userId"), col("day"),
          col("value").isNotNull.as("observed"), col("filled"))
    }),

    // Set operations (§2.6 completeness): INTERSECT/EXCEPT between the
    // clicker and purchaser user sets. Both compile to aggregate-backed
    // joins (no sort) and stay a single shuffle on the set key.
    "q75_setops" -> ((s, d) => {
      val ev = Tables.events(s, d)
      def users(t: String) = ev.filter(col("event_type") === t)
        .select(col("user_id")).distinct()
      val both = users("click").intersect(users("purchase"))
        .withColumn("relation", lit("click_and_purchase"))
      val only = users("click").except(users("purchase"))
        .withColumn("relation", lit("click_only"))
      both.unionByName(only).select(col("user_id"), col("relation"))
    }),

    // Explicit GROUPING SETS with grouping_id — the general form next to
    // q52's ROLLUP and q55's CUBE; one shuffle produces all three
    // granularities (per-type, per-day, grand total).
    "q76_grouping_sets" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_type"), to_date(col("ts")).as("day"), col("value"))
      ev.groupingSets(
          Seq(Seq(col("event_type")), Seq(col("day")), Seq()),
          col("event_type"), col("day"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"),
          grouping_id().cast("long").as("gid"))
    }),

    // Sketch aggregates — the sublinear-memory path for 100 TB profiling:
    // HLL++ distinct counts and GK quantiles are one streaming pass with
    // mergeable fixed-size state (no exact distinct shuffle, no sort).
    // The raw estimates are engine-specific (no cross-engine oracle), but
    // their PUBLISHED ERROR CONTRACTS are checkable in-engine (VERDICT r8
    // task 6): the lane emits the exact distinct count (oracle-matched
    // exactly) plus bound-verdict booleans the oracle checks as literals —
    //  - users_ok: |HLL++ − exact| ≤ 8%·exact + 16 (4σ at rsd 0.02, plus
    //    small-count slack; a broken sketch is orders of magnitude off);
    //  - p50/p95_ok: percentile_approx returns an actual data value, so
    //    the check is on its RANK — the strictly-below .. at-or-below
    //    count interval must contain q·n within 2/accuracy·n + 1 slack
    //    (2× the documented 1/accuracy rank error, +1 for the rank-origin
    //    convention).
    // Shape: one extra pass over events (the rank counts) joined to the
    // broadcast |event_type|-row sketch frame — two scans, no sort, state
    // still sketch-sized. Raw estimates stay available via
    // graft.tools.DumpAux for tools/verify_sketches.py.
    "q74_sketches" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_type"), col("user_id"), col("value"))
      // Sketches alone in pass 1: mixing countDistinct into the same agg
      // triggers RewriteDistinctAggregates' EXPAND — every input row
      // duplicated with the per-copy percentile/HLL object state carried
      // through a 389-field ObjectHashAggregate (16× the lane's cost at
      // sf0.1). The exact count rides pass 2 instead, where the expand
      // only duplicates cheap long sums.
      val sk = ev.groupBy(col("event_type"))
        .agg(
          approx_count_distinct(col("user_id"), rsd = 0.02).as("_au"),
          percentile_approx(col("value"), lit(0.5), lit(10000)).as("_p50"),
          percentile_approx(col("value"), lit(0.95), lit(10000)).as("_p95"))
      ev.join(broadcast(sk), "event_type")
        .groupBy(col("event_type"))
        .agg(
          countDistinct(col("user_id")).as("exact_users"),
          max(col("_au")).as("_au"),
          count(lit(1)).as("_n"),
          sum((col("value") < col("_p50")).cast("long")).as("_lt50"),
          sum((col("value") <= col("_p50")).cast("long")).as("_le50"),
          sum((col("value") < col("_p95")).cast("long")).as("_lt95"),
          sum((col("value") <= col("_p95")).cast("long")).as("_le95"))
        .withColumn("_slack", col("_n") * 2.0 / 10000.0 + 1.0)
        .select(col("event_type"), col("exact_users"),
          (abs(col("_au") - col("exact_users")) <=
            col("exact_users") * 0.08 + 16).as("users_ok"),
          (col("_lt50") <= col("_n") * 0.5 + col("_slack") &&
            col("_le50") >= col("_n") * 0.5 - col("_slack")).as("p50_ok"),
          (col("_lt95") <= col("_n") * 0.95 + col("_slack") &&
            col("_le95") >= col("_n") * 0.95 - col("_slack")).as("p95_ok"))
    }),

    // Running window aggregate (rows-frame) with a total order → deterministic.
    "q12_running_sum" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      // l_quantity is part of the ORDER: the synthetic lineitem has
      // duplicate (orderkey, linenumber) pairs (sf0.1: 2-row ties on all
      // three keys with DIFFERENT quantities), and a ROWS-frame running
      // sum over a non-total order is order-dependent — DuckDB itself
      // returns different values run-to-run. With quantity in the order,
      // remaining ties are value-identical rows, so the output multiset
      // is deterministic.
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate").asc, col("l_orderkey").asc,
          col("l_linenumber").asc, col("l_quantity").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.lineitem(s, d)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_shipdate"))
        .withColumn("running_qty", round(sum(col("l_quantity")).over(w), 2))
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("running_qty"))
    })
  )

  val oracle: Map[String, String] = Map(
    // q74: exact distinct counts matched exactly; the sketch error-contract
    // verdicts are literals — see the lane comment.
    "q74_sketches" ->
      """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  true AS users_ok, true AS p50_ok, true AS p95_ok
        |FROM events GROUP BY 1""".stripMargin,

    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice),2) AS sum_base_price,
        | ${SqlFragments.discountedRevenueSql()} AS sum_disc_price,
        | ${SqlFragments.avg2To4Sql("l_quantity")} AS avg_qty,
        | ${SqlFragments.avg2To4Sql("l_discount")} AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q2_topk_per_group" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice, rn FROM (
        |  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        |  FROM lineitem) t WHERE rn <= 5""".stripMargin,

    "q3_join_agg" ->
      s"""SELECT c_mktsegment, o_orderpriority,
        | ${SqlFragments.discountedRevenueSql()} AS revenue,
        | count(*) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment, o_orderpriority""".stripMargin,

    "q4_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 150000)""".stripMargin,

    "q5_anti_join" ->
      """SELECT c_custkey, c_name, round(c_acctbal,2) AS c_acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 300000)""".stripMargin,

    "q6_date_window" ->
      """SELECT event_type, count(*) AS n, round(sum(value),2) AS total_value
        |FROM events
        |WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-12' AND DATE '2024-01-15'
        |GROUP BY event_type""".stripMargin,

    "q7_hot_parts" ->
      """SELECT day, l_partkey, n, rn FROM (
        |  SELECT day, l_partkey, n,
        |    row_number() OVER (PARTITION BY day ORDER BY n DESC, l_partkey) AS rn
        |  FROM (SELECT CAST(l_shipdate AS DATE) AS day, l_partkey, count(*) AS n
        |        FROM lineitem GROUP BY 1, 2) c) t
        |WHERE rn <= 3""".stripMargin,

    "q8_distinct_per_day" ->
      """SELECT CAST(ts AS DATE) AS day, count(DISTINCT user_id) AS n_users,
        | count(*) AS n_events
        |FROM events GROUP BY 1""".stripMargin,

    "q9_user_topk" ->
      """SELECT user_id, event_id, value, rn FROM (
        |  SELECT user_id, event_id, round(value,2) AS value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY round(value,2) DESC, event_id) AS rn
        |  FROM events) t WHERE rn <= 5""".stripMargin,

    "q10_global_agg" ->
      """SELECT count(*) AS n, round(sum(l_quantity),2) AS sum_qty,
        | round(min(l_extendedprice),2) AS min_price,
        | round(max(l_extendedprice),2) AS max_price,
        | count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem""".stripMargin,

    "q11_star_join" ->
      s"""SELECT r_name, n_name,
        | ${SqlFragments.discountedRevenueSql()} AS revenue,
        | count(*) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,

    "q48_sql_surface" ->
      s"""SELECT o_orderpriority,
        | ${SqlFragments.discountedRevenueSql()} AS revenue,
        | count(*) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,

    "q49_json_props" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
        | count(*) AS n, round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1""".stripMargin,

    "q52_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "q53_asof_join" ->
      """WITH o AS (
        |  SELECT o_custkey % 1500 AS k, o_orderdate AS t,
        |    max(o_orderkey) AS o_orderkey,
        |    arg_max(o_totalprice, o_orderkey) AS o_totalprice
        |  FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, o.o_orderkey,
        |  round(o.o_totalprice, 2) AS o_totalprice
        |FROM events e ASOF JOIN o ON e.user_id = o.k AND e.ts >= o.t""".stripMargin,

    "q12_running_sum" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        | round(sum(l_quantity) OVER (PARTITION BY l_suppkey
        |   ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS running_qty
        |FROM lineitem""".stripMargin,

    "q75_setops" ->
      """SELECT user_id, 'click_and_purchase' AS relation FROM (
        |  SELECT user_id FROM events WHERE event_type = 'click'
        |  INTERSECT
        |  SELECT user_id FROM events WHERE event_type = 'purchase') t
        |UNION ALL
        |SELECT user_id, 'click_only' FROM (
        |  SELECT user_id FROM events WHERE event_type = 'click'
        |  EXCEPT
        |  SELECT user_id FROM events WHERE event_type = 'purchase') t2""".stripMargin,

    "q76_grouping_sets" ->
      """SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n,
        | round(sum(value), 4) AS sum_value,
        | CAST(GROUPING(event_type, CAST(ts AS DATE)) AS BIGINT) AS gid
        |FROM events
        |GROUP BY GROUPING SETS ((event_type), (CAST(ts AS DATE)), ())""".stripMargin,

    "q71_pivot" ->
      """SELECT user_id AS userId,
        | count(*) FILTER (event_type = 'click') AS n_click,
        | count(*) FILTER (event_type = 'error') AS n_error,
        | count(*) FILTER (event_type = 'purchase') AS n_purchase,
        | count(*) FILTER (event_type = 'signup') AS n_signup,
        | count(*) FILTER (event_type = 'view') AS n_view
        |FROM events GROUP BY 1""".stripMargin,

    "q72_unpivot" ->
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
        |  round(l_quantity, 2) AS value FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_extendedprice',
        |  round(l_extendedprice, 2) FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_discount',
        |  round(l_discount, 2) FROM lineitem""".stripMargin,

    "q73_gapfill_locf" ->
      """WITH obs AS (
        |  SELECT user_id, day, value FROM (
        |    SELECT user_id, CAST(ts AS DATE) AS day, value,
        |      row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
        |        ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events WHERE event_type = 'click') t WHERE rn = 1),
        |span AS (SELECT user_id, min(day) AS d0, max(day) AS d1
        |         FROM obs GROUP BY 1),
        |cal AS (
        |  SELECT s.user_id, unnest(generate_series(s.d0, s.d1,
        |    INTERVAL 1 DAY))::DATE AS day
        |  FROM span s)
        |SELECT c.user_id AS userId, c.day,
        |  o.value IS NOT NULL AS observed,
        |  round(last_value(o.value IGNORE NULLS) OVER (
        |    PARTITION BY c.user_id ORDER BY c.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS filled
        |FROM cal c LEFT JOIN obs o ON o.user_id = c.user_id AND o.day = c.day""".stripMargin,

    "q63_full_outer" ->
      """WITH ev AS (
        |  SELECT CAST(ts AS DATE) AS day, count(*) AS n_clicks
        |  FROM events WHERE event_type = 'click' GROUP BY 1),
        |ord AS (
        |  SELECT o_orderdate AS day, count(*) AS n_orders
        |  FROM orders WHERE o_orderkey % 997 = 0 GROUP BY 1)
        |SELECT coalesce(ev.day, ord.day) AS day, ev.n_clicks, ord.n_orders
        |FROM ev FULL JOIN ord ON ev.day = ord.day""".stripMargin,

    "q54_sessionize" -> (sessionCte +
      """
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  count(*) AS n_events, min(ts) AS t_start, max(ts) AS t_end
        |FROM s GROUP BY 1, 2""".stripMargin),

    // session_window's merge rule == the gap rule: same sessions, keyed by
    // their span instead of the ordinal.
    "q60_session_window" -> (sessionCte +
      """
        |SELECT user_id, min(ts) AS t_start, max(ts) AS t_end,
        |  count(*) AS n_events
        |FROM s GROUP BY user_id, session_id""".stripMargin),

    "q55_cube" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,

    "q56_range_join" ->
      """WITH iv AS (
        |  SELECT o_orderkey,
        |    DATE '2024-01-01' + CAST(o_orderkey % 28 AS INT) AS d0,
        |    DATE '2024-01-01' + CAST(o_orderkey % 28 AS INT)
        |      + (CAST(o_orderkey % 7 AS INT) + 1) AS d1
        |  FROM orders WHERE o_orderkey % 97 = 0),
        |ev AS (
        |  SELECT CAST(ts AS DATE) AS day, count(*) AS n_ev,
        |    round(sum(value), 2) AS v
        |  FROM events GROUP BY 1)
        |SELECT o_orderkey, CAST(sum(n_ev) AS BIGINT) AS n_events,
        |  round(sum(v), 2) AS total_value
        |FROM iv JOIN ev ON ev.day BETWEEN iv.d0 AND iv.d1
        |GROUP BY o_orderkey""".stripMargin,

    "q57_percentiles" ->
      s"""WITH b AS (
        |  SELECT l_returnflag, round(l_extendedprice, 2) AS p FROM lineitem),
        |r AS (
        |  SELECT l_returnflag, p,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY p) AS rn,
        |    count(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM b)
        |SELECT l_returnflag,
        | max(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT) THEN p END) AS p25,
        | max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN p END) AS p50,
        | max(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT) THEN p END) AS p75,
        | ${SqlFragments.avgFixedSql("p", 2, 2)} AS mean
        |FROM r GROUP BY l_returnflag""".stripMargin,

    // the oracle IS the unsalted direct aggregation
    "q58_salted_agg" ->
      """SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty,
        | count(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q59_window_suite" ->
      """SELECT o_orderkey, o_custkey,
        | round(lag(o_totalprice, 1) OVER w, 2) AS prev_price,
        | lead(o_orderdate, 1) OVER w AS next_date,
        | ntile(4) OVER w AS qtile,
        | rank() OVER (PARTITION BY o_custkey
        |   ORDER BY o_totalprice DESC, o_orderkey) AS price_rank
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin
  )

  /** Shared gap-sessionization CTE (30-min gap, epoch-µs comparison, ts
    * truncated ns→µs to match the Spark reader).
    */
  private lazy val sessionCte =
    """WITH e AS (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
      |x AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
      |      THEN 1 ELSE 0 END AS nw
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT user_id, ts,
      |    sum(nw) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM x)""".stripMargin
}
