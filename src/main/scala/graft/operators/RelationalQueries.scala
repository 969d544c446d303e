package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.{QueryPack, Tables}

/** Scans, projection, filter, distinct, conditionals, aggregation,
  * grouping sets / rollup / cube, sort / limit / top-k, set operations.
  * SURVEY.md §2.2 "Scans", "Projection / filter", "Aggregations",
  * "Sort / limit / top-k", "Set operations".
  *
  * Scale notes: all aggregates here are partial+final hash aggregates
  * (map-side combine for free); filters/projections reach the parquet scan
  * via Catalyst pushdown (verified with .explain in RelationalSpec);
  * top-k compiles to TakeOrderedAndProject (no global sort of the input).
  */
object RelationalQueries extends QueryPack {

  def declared: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    // -- scan + projection + computed column + filter pushdown -------------
    "q_scan_project" -> ((s, d) => {
      // round via floor(x*100+0.5): identical binary-double arithmetic on
      // both engines (Spark's round() goes through BigDecimal's shortest
      // decimal repr and can differ from DuckDB's at .xx5 boundaries).
      Tables.lineitem(s, d)
        .filter(col("l_quantity") > 45)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * 100 + 0.5) / 100).as("revenue"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // -- filter: IN / BETWEEN / LIKE / NOT NULL ----------------------------
    "q_filter_pred" -> ((s, d) => {
      Tables.customer(s, d)
        .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE") &&
          col("c_acctbal").between(100.0, 5000.0) &&
          col("c_name").like("%5%") &&
          col("c_nationkey").isNotNull)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .orderBy(col("c_custkey"))
    }),

    // -- distinct ----------------------------------------------------------
    "q_distinct" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_linestatus"))
        .distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // -- conditional: CASE WHEN / coalesce / nullif ------------------------
    "q_conditional" -> ((s, d) => {
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          when(col("o_totalprice") > 200000, "big")
            .when(col("o_totalprice") > 100000, "mid")
            .otherwise("small").as("bucket"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN"))
            .as("status2"))
        .orderBy(col("o_orderkey"))
    }),

    // -- TPC-H Q1 shape: partial+final hash aggregate ----------------------
    "q1_agg" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * (lit(1.0) + col("l_tax"))), 2).as("sum_charge"),
          round(avg(col("l_quantity")), 6).as("avg_qty"),
          round(avg(col("l_extendedprice")), 6).as("avg_price"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // -- exact count distinct ---------------------------------------------
    "q_count_distinct" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(
          countDistinct(col("o_custkey")).as("n_cust"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderpriority"))
    }),

    // -- approx distinct (HLL) — engine-specific sketch, no oracle --------
    // HLL estimates are engine-specific, so the oracle-checkable output
    // is the exact count plus a bounded-relative-error flag (HLL merge is
    // register-wise max — commutative — so the estimate is deterministic
    // for fixed data regardless of partitioning). rsd=0.01 gives the 5%
    // bound a ~5-sigma margin; the default rsd=0.05 would make the flag a
    // one-sigma coin flip on a regenerated corpus.
    // The exact and approx aggregates run as SEPARATE aggregations joined
    // on the group key: mixing countDistinct with a non-distinct aggregate
    // forces Catalyst's expand plan, where the HLL partial (16 KB of
    // registers at rsd=0.01) is keyed by (group, l_partkey) instead of
    // group — ~200k × 16 KB of buffers at sf0.1 (measured 3.7 s vs 1.7 s
    // split). The join is 3 rows — free.
    "q_approx_distinct" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val exact = li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("exact_parts"))
      val approx = li.groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey"), 0.01).as("approx_raw"))
      exact.join(approx, "l_returnflag")
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("approx_raw") - col("exact_parts")).cast("double") /
            col("exact_parts") < 0.05).as("approx_within_5pct"))
        .orderBy(col("l_returnflag"))
    }),

    // -- exact percentiles (spill-safe: rank window + interpolation) -------
    // The declared default is the formulation that survives 100 TB group
    // sizes. Spark's `percentile()` buffers every group value in its
    // aggregate buffer (an ArrayBuffer that cannot spill — OOM at scale),
    // so instead: melt to (group, metric, value), row_number over a
    // sort-based window (SortExec spills to disk), then pick the two
    // straddling ranks and interpolate lower + (higher - lower) * frac —
    // the same linear interpolation `percentile()`/quantile_cont define.
    // The window partition is (group × metric); a 100 TB deployment
    // carries parallelism in that key the same way the packing/resample
    // operators do. The buffering `percentile()` formulation survives as
    // a spec-only cross-check (RelationalOpsSpec "percentile buffering
    // twin") proving both plans hash-match.
    "q_percentile" -> ((s, d) => {
      val vals = Tables.lineitem(s, d)
        .select(col("l_returnflag").as("g"),
          col("l_quantity").as("qty"), col("l_extendedprice").as("price"))
        .unpivot(Array(col("g")), Array(col("qty"), col("price")), "m", "v")
      val n = vals.groupBy(col("g"), col("m")).agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("g"), col("m")).orderBy(col("v"))
      val ranked = vals.withColumn("rn", row_number().over(w))
        .join(broadcast(n), Seq("g", "m"))
      // all three percentiles from ONE pass over ranked: conditional
      // aggregates pick each request's straddling ranks, the post-select
      // interpolates lower + (higher - lower) * frac
      val reqs = Seq(("qty", 0.5, "p50_qty"), ("price", 0.25, "p25_price"),
        ("price", 0.75, "p75_price"))
      val aggCols = reqs.flatMap { case (m0, p, out) =>
        val pos = lit(p) * (col("n") - 1)
        val lo = floor(pos) + 1
        Seq(
          max(when(col("m") === m0 && col("rn") === lo, col("v")))
            .as(s"${out}_lo"),
          max(when(col("m") === m0 && col("rn") === lo + 1, col("v")))
            .as(s"${out}_hi"),
          max(when(col("m") === m0, pos - floor(pos))).as(s"${out}_f"))
      }
      val outs = reqs.map { case (_, _, out) =>
        round(col(s"${out}_lo") +
          (coalesce(col(s"${out}_hi"), col(s"${out}_lo")) -
            col(s"${out}_lo")) * col(s"${out}_f"), 6).as(out)
      }
      ranked.groupBy(col("g")).agg(aggCols.head, aggCols.tail: _*)
        .select((col("g").as("l_returnflag") +: outs): _*)
        .orderBy(col("l_returnflag"))
    }),

    // -- winsorization: percentile clipping for featurization --------------
    // The outlier-taming step before a numeric column feeds a model:
    // clip each group's prices into [p05, p95] (q_percentile's
    // rank-interpolation machinery — hash-proven to match DuckDB's
    // quantile_cont) and report clip counts + the clipped sum. The sum
    // is cent-quantized per row BEFORE aggregation, so the only
    // cross-partition fold is integer. Two passes by construction
    // (bounds, then clip) — at 100 TB the bounds pass usually rides an
    // existing stats collection, or swaps for approx_percentile with
    // the same downstream shape.
    "q_winsorize" -> ((s, d) => {
      val vals = Tables.lineitem(s, d)
        .select(col("l_returnflag").as("g"), col("l_extendedprice").as("v"))
      val n = vals.groupBy(col("g")).agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("g")).orderBy(col("v"))
      val ranked = vals.withColumn("rn", row_number().over(w))
        .join(broadcast(n), "g")
      val reqs = Seq((0.05, "p05"), (0.95, "p95"))
      val aggCols = reqs.flatMap { case (p, out) =>
        val pos = lit(p) * (col("n") - 1)
        val lo = floor(pos) + 1
        Seq(
          max(when(col("rn") === lo, col("v"))).as(s"${out}_lo"),
          max(when(col("rn") === lo + 1, col("v"))).as(s"${out}_hi"),
          max(pos - floor(pos)).as(s"${out}_f"))
      }
      val bounds = ranked.groupBy(col("g")).agg(aggCols.head, aggCols.tail: _*)
        .select(col("g") +: reqs.map { case (_, out) =>
          (col(s"${out}_lo") +
            (coalesce(col(s"${out}_hi"), col(s"${out}_lo")) -
              col(s"${out}_lo")) * col(s"${out}_f")).as(out)
        }: _*)
      val clip = greatest(col("p05"), least(col("p95"), col("v")))
      vals.join(broadcast(bounds), "g")
        .groupBy(col("g"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("v") < col("p05"), 1L).otherwise(0L))
            .as("n_clip_low"),
          sum(when(col("v") > col("p95"), 1L).otherwise(0L))
            .as("n_clip_high"),
          (floor(max(col("p05")) * lit(1e6) + lit(0.5)) / lit(1e6))
            .as("p05"),
          (floor(max(col("p95")) * lit(1e6) + lit(0.5)) / lit(1e6))
            .as("p95"),
          sum(floor(clip * lit(100.0) + lit(0.5)).cast("long"))
            .as("sum_clipped_cents"))
        .select(col("g").as("l_returnflag"), col("n"), col("n_clip_low"),
          col("n_clip_high"), col("p05"), col("p95"),
          col("sum_clipped_cents"))
        .orderBy(col("l_returnflag"))
    }),

    // -- approx percentile (t-digest-ish sketch) — no oracle ---------------
    // Same pattern: exact median + a flag that the sketch median lands
    // within 2% relative error. floor(x*100+0.5)/100 rounding (see
    // q_scan_project) keeps the .xx5 boundary identical cross-engine —
    // an even-count group's median is an average of two 2dp prices and
    // lands exactly on that boundary.
    "q_approx_percentile" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          (floor(expr("percentile(l_extendedprice, 0.5)") * 100 + 0.5) / 100)
            .as("exact_p50"),
          expr("percentile_approx(l_extendedprice, 0.5, 1000)").as("ap_raw"),
          expr("percentile(l_extendedprice, 0.5)").as("ex_raw"))
        .select(col("l_returnflag"), col("exact_p50"),
          (abs(col("ap_raw") - col("ex_raw")) / col("ex_raw") < 0.02)
            .as("approx_within_2pct"))
        .orderBy(col("l_returnflag"))
    }),

    // -- rollup with grouping_id ------------------------------------------
    "q_rollup" -> ((s, d) => {
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          grouping_id().cast("int").as("gid"),
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("gid"),
          col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),

    // -- cube --------------------------------------------------------------
    "q_cube" -> ((s, d) => {
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(
          grouping_id().cast("int").as("gid"),
          round(sum(col("o_totalprice")), 2).as("sum_price"),
          count(lit(1)).as("n"))
        .orderBy(col("gid"),
          col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    }),

    // -- TPC-H Q6: forecasting revenue change (pure scan/filter/agg) -------
    // The canonical filter-pushdown exemplar: a one-year ship window,
    // a discount band, and a quantity cap — every predicate reaches the
    // parquet scan (no join, no shuffle; the aggregate is a single
    // map-side fold). Revenue accumulates in exact CENTS (the
    // q10_returns device: floor(x·100+0.5) per line, integer sum) so
    // the one-row answer is order-free on both engines.
    "q6_forecast" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1997-01-01") &&
          col("l_discount") >= lit(0.05) && col("l_discount") <= lit(0.07) &&
          col("l_quantity") < lit(24.0))
        .agg(count(lit(1)).as("n_lines"),
          (sum(floor(col("l_extendedprice") * col("l_discount") *
            lit(100.0) + lit(0.5)).cast("long")).cast("double") /
            lit(100.0)).as("revenue"))
    }),

    // -- grouping sets (SQL surface) --------------------------------------
    "q_grouping_sets" -> ((s, d) => {
      Tables.registerAll(s, d)
      s.sql(
        """SELECT l_returnflag, l_linestatus,
          |       CAST(grouping_id() AS INT) AS gid,
          |       ROUND(SUM(l_extendedprice), 2) AS sum_price,
          |       COUNT(*) AS n
          |FROM lineitem
          |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
          |                        (l_returnflag), ())
          |ORDER BY gid,
          |         l_returnflag ASC NULLS FIRST,
          |         l_linestatus ASC NULLS FIRST""".stripMargin)
    }),

    // -- LATERAL correlated subquery (top-N per key, SQL surface) ----------
    // The SQL-standard per-key top-N idiom: a correlated LATERAL derived
    // table with ORDER BY + LIMIT, the form analysts port from every
    // warehouse. Spark decorrelates it (DecorrelateInnerQuery) into the
    // same rank-window plan q_window_topk declares — i.e. the lateral
    // is pure SURFACE: one shuffle on the correlation key, no per-row
    // re-execution, so the 100 TB plan is the window plan. Customers
    // without orders drop (inner lateral join semantics, mirrored).
    "q_lateral_topn" -> ((s, d) => {
      Tables.registerAll(s, d)
      s.sql(
        """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
          |FROM customer c,
          |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
          |         WHERE o_custkey = c.c_custkey
          |         ORDER BY o_totalprice DESC, o_orderkey
          |         LIMIT 2) t
          |ORDER BY c.c_custkey, t.o_totalprice DESC,
          |         t.o_orderkey""".stripMargin)
    }),

    // -- filtered / conditional aggregation -------------------------------
    "q_filtered_agg" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          round(sum(when(col("l_discount") > 0.05, col("l_extendedprice"))
            .otherwise(0.0)), 2).as("disc_rev"),
          count(when(col("l_tax") > 0.04, lit(1))).as("n_taxed"),
          round(avg(when(col("l_quantity") > 25, col("l_quantity"))), 6)
            .as("avg_big_qty"))
        .orderBy(col("l_returnflag"))
    }),

    // -- TPC-H Q13: customer order-count distribution (r13) -----------------
    // The left-outer + two-level-aggregate signature: orders per customer
    // (customers with none count as 0), then the histogram of that count.
    // Adapted to the corpus schema: orders has no o_comment, so the
    // NOT LIKE '%special%requests%' predicate is dropped (noted in
    // SURVEY §2.4) — the plan shape (outer join preserving empty groups +
    // count-of-counts reaggregation) is the operator under test. At
    // 100 TB: one key shuffle for the outer join, and the second
    // aggregate runs on the |customers|-row frame keyed by c_count.
    "q13_cust_dist" -> ((s, d) => {
      val c = Tables.customer(s, d).select(col("c_custkey"))
      val o = Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"))
      c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // -- TPC-H Q15: top supplier by quarterly revenue (r13) -----------------
    // The view + argmax-equality signature: revenue per supplier over one
    // quarter, keep every supplier matching the MAX (ties all surface —
    // the spec's subtlety). The max is a 1-row broadcast joined back by
    // VALUE equality on the 2-decimal-rounded revenue (mirrored rounding
    // both engines), never a sort-limit — the Q15 semantics when several
    // suppliers tie. Scale: one filtered lineitem aggregate keyed by
    // suppkey; supplier dim broadcasts.
    "q15_top_supplier" -> ((s, d) => {
      val rev = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1996-04-01"))
        .groupBy(col("l_suppkey"))
        .agg(round(sum(col("l_extendedprice") *
          (lit(1.0) - col("l_discount"))), 2).as("total_revenue"))
      val mx = rev.agg(max(col("total_revenue")).as("mr"))
      rev.join(broadcast(mx), col("total_revenue") === col("mr"))
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey").cast("long").as("s_suppkey"),
          col("s_name"), col("total_revenue"))
        .orderBy(col("s_suppkey"))
    }),

    // -- mode + median aggregates ------------------------------------------
    // Inverse-distribution surface: most-frequent value and interpolated
    // median per group. mode() breaks ties arbitrarily on BOTH engines,
    // so the fixture precondition (strictly unique top count per group)
    // is pinned in RelationalOpsSpec; the floor(x*100+0.5)/100 rounding
    // is the cross-engine-safe form (see PERF.md round() note). Both are
    // single hash aggregates — median buffers per group, so a 100 TB
    // whole-table profile belongs to q_approx_percentile /
    // q_percentile_dist instead (same note as q_percentile).
    "q_mode_median" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(mode(col("o_orderstatus")).as("status_mode"),
          (floor(median(col("o_totalprice")) * lit(100) + lit(0.5)) /
            lit(100)).as("price_median"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority"))
    }),

    // -- collect_set (sorted + joined to a string: the driver's pandas
    // canonicalizer can't hash raw array cells, so emit a scalar) ----------
    "q_collect" -> ((s, d) => {
      Tables.customer(s, d)
        .groupBy(col("c_nationkey"))
        .agg(
          array_join(sort_array(collect_set(col("c_mktsegment"))), ",")
            .as("segments"),
          count(lit(1)).as("n"))
        .orderBy(col("c_nationkey"))
    }),

    // -- multi-key sort + limit + offset ----------------------------------
    "q_sort_multi" -> ((s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
        .orderBy(col("o_orderpriority").asc, col("o_totalprice").desc,
          col("o_orderkey").asc)
        .offset(10)
        .limit(100)
    }),

    // -- partition-local sort (the secondary-sort pattern) -----------------
    // repartition by key co-locates whole groups; sortWithinPartitions
    // orders each partition WITHOUT a global shuffle-and-merge; one
    // streaming pass over the sorted partition then emits each group's
    // first row. This is the scale idiom for "cheapest per-group
    // extremum over a huge table" when a global sort would be wasteful.
    "q_sort_local" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .repartition(col("l_orderkey"))
        // l_linenumber repeats within an order in this corpus — the price
        // tie-break keeps the emitted first row deterministic
        .sortWithinPartitions(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"))
        .as[(Long, Int, Double)]
        .mapPartitions { it =>
          var last = Long.MinValue
          it.flatMap { case (k, ln, price) =>
            if (k != last) { last = k; Iterator.single((k, ln, price)) }
            else Iterator.empty
          }
        }
        .toDF("l_orderkey", "first_line", "first_price")
        .orderBy(col("l_orderkey"))
    }),

    // -- unionByName: same schemas, different column order -----------------
    "q_union_byname" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val a = o.filter(col("o_totalprice") > 150000)
        .select(col("o_custkey"), col("o_totalprice").as("price"))
      val b = o.filter(col("o_orderstatus") === "F")
        .select(col("o_totalprice").as("price"), col("o_custkey"))
      a.unionByName(b)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n"), round(sum(col("price")), 2).as("sum_price"))
        .orderBy(col("o_custkey"))
    }),

    // -- global top-k (TakeOrderedAndProject) ------------------------------
    "q_topk" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
          col("l_linenumber").asc)
        .limit(25)
    }),

    // -- SQL entry point: CTE + correlated scalar subquery + EXISTS --------
    // Exercises the parser/analyzer path (SURVEY §3.3 entry point 1) and
    // Catalyst's subquery decorrelation: the correlated scalar subquery
    // rewrites to an aggregate + join, EXISTS to a left-semi join — no
    // per-row re-execution survives into the physical plan.
    "q_sql_subquery" -> ((s, d) => {
      Tables.registerAll(s, d)
      s.sql(
        """WITH open_custs AS (
          |  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O')
          |SELECT c.c_custkey,
          |  floor(c.c_acctbal * 100 + 0.5) / 100 AS bal
          |FROM customer c
          |WHERE c.c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
          |                     WHERE c2.c_nationkey = c.c_nationkey)
          |  AND EXISTS (SELECT 1 FROM open_custs oc
          |              WHERE oc.o_custkey = c.c_custkey)
          |  AND c.c_nationkey IN (SELECT n_nationkey FROM nation
          |                        WHERE n_regionkey < 3)
          |ORDER BY c.c_custkey""".stripMargin)
    }),

    // -- SQL entry point: LATERAL correlated subquery ----------------------
    // The per-row-subquery surface (top-2 customers per nation by
    // balance): Catalyst decorrelates the LATERAL LIMIT into a keyed
    // window under the hood — the same plan q_topk_per_group declares
    // directly — so the SQL sugar costs nothing at scale. Tie-break
    // (acctbal desc, custkey) makes the per-nation boundary total.
    "q_lateral" -> ((s, d) => {
      Tables.registerAll(s, d)
      s.sql(
        """SELECT n.n_name, t.c_custkey,
          |  floor(t.c_acctbal * 100 + 0.5) / 100 AS bal
          |FROM nation n, LATERAL (
          |  SELECT c_custkey, c_acctbal FROM customer c
          |  WHERE c.c_nationkey = n.n_nationkey
          |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
          |ORDER BY n.n_name, bal DESC, t.c_custkey""".stripMargin)
    }),

    // -- SQL entry point: WITH RECURSIVE (Spark 4 UnionLoop) ---------------
    // Hierarchy flattening — the canonical recursive-CTE warehouse query
    // (org charts, BOM explosions, folder trees). The hierarchy is the
    // implicit binary heap over c_custkey (parent = id DIV 2, root 1), so
    // depth grows as log2(n): ~11 levels at sf0.01, ~100 levels would need
    // a 2^100-row table — the default cteRecursionLevelLimit of 100 is
    // structurally unreachable. Each UnionLoop iteration is one hash join
    // of the (shrinking) frontier against customer: at cluster scale every
    // level is a keyed shuffle join, never a driver-side loop, and the
    // frontier is the only state carried between levels.
    "q_recursive_cte" -> ((s, d) => {
      Tables.registerAll(s, d)
      s.sql(
        """WITH RECURSIVE tree(id, depth) AS (
          |  SELECT CAST(1 AS BIGINT) AS id, 0 AS depth
          |  UNION ALL
          |  SELECT c.c_custkey, t.depth + 1
          |  FROM customer c JOIN tree t ON c.c_custkey DIV 2 = t.id
          |  WHERE c.c_custkey > 1
          |)
          |SELECT depth, count(*) AS n_nodes, min(id) AS min_id,
          |  max(id) AS max_id, CAST(sum(id) AS BIGINT) AS sum_id
          |FROM tree GROUP BY depth ORDER BY depth""".stripMargin)
    }),

    // -- SQL entry point: pipe syntax (Spark 4 `|>` operators) -------------
    // The linear query form: each |> stage consumes the previous table.
    // Pure parser sugar — Catalyst lowers it to the identical
    // filter→project→aggregate→sort plan as the ANSI form the oracle
    // runs, so the surface costs nothing at scale.
    "q_pipe_syntax" -> ((s, d) => {
      Tables.registerAll(s, d)
      s.sql(
        """FROM lineitem
          ||> WHERE l_quantity > 10
          ||> EXTEND l_extendedprice * (1.0e0 - l_discount) AS net
          ||> AGGREGATE count(*) AS n,
          |     CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
          |     round(sum(net), 2) AS net_rev
          |   GROUP BY l_returnflag, l_linestatus
          ||> ORDER BY l_returnflag, l_linestatus""".stripMargin)
    }),

    // -- SQL entry point: IDENTIFIER() parameterized names -----------------
    // The SQL-injection-safe templating surface (Spark 4 / DuckDB both
    // ship it): table and column names arrive as constant STRING
    // expressions through IDENTIFIER(), the resolver binds them at
    // analysis time, and the plan is byte-identical to the literal-name
    // query — zero runtime cost, but the entry point a multi-tenant
    // query service needs so tenant-supplied names can never splice SQL.
    "q_sql_identifier" -> ((s, d) => {
      Tables.registerAll(s, d)
      s.sql(
        """SELECT l_returnflag, count(*) AS n,
          |  round(sum(IDENTIFIER('l_' || 'extendedprice')), 2)
          |    AS revenue
          |FROM IDENTIFIER('line' || 'item')
          |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    }),

    // -- SQL entry point: EXECUTE IMMEDIATE with bound parameters -----------
    // The other half of the q_sql_identifier templating story: the query
    // TEXT itself arrives as a string and positional parameters bind via
    // USING — the dynamic-SQL entry a query service exposes, with
    // parameter marks (?) instead of string splicing so values can never
    // escape into syntax. The inner plan is identical to the literal
    // query; zero runtime cost.
    "q_sql_exec" -> ((s, d) => {
      Tables.registerAll(s, d)
      s.sql("DECLARE OR REPLACE VARIABLE stmt STRING")
      s.sql(
        """SET VAR stmt =
          |  'SELECT o_orderpriority, count(*) AS n,
          |     round(sum(o_totalprice), 2) AS revenue
          |   FROM orders WHERE o_totalprice > ?
          |   GROUP BY o_orderpriority ORDER BY o_orderpriority'"""
          .stripMargin)
      s.sql("EXECUTE IMMEDIATE stmt USING 100000")
    }),

    // -- RECURSIVE CTE: hierarchy walk (Spark 4 WITH RECURSIVE) (r14) -------
    // The iterative-plan surface Spark 4 added and every warehouse
    // engine has had for years: walk the implicit supplier org chart
    // (parent = key div 2 — a binary tree over s_suppkey) from every
    // node to the root, then profile the hierarchy by depth. The
    // recursion executes as Spark's UnionLoop (one plan iteration per
    // level, ≤ log₂(max key) rounds — each round a narrow map over the
    // frontier, so at 100 TB the cost is rounds × frontier scans, never
    // materialized all-pairs). ANSI-portable: DuckDB runs the same
    // recursion.
    "q_recursive_walk" -> ((s, d) => {
      Tables.registerAll(s, d)
      s.sql(
        """WITH RECURSIVE walk(node, cur, depth) AS (
          |  SELECT s_suppkey, s_suppkey, 0 FROM supplier
          |  UNION ALL
          |  SELECT node, cur div 2, depth + 1 FROM walk WHERE cur > 1
          |)
          |SELECT depth AS root_depth,
          |  count(*) AS n_nodes,
          |  min(node) AS min_node, max(node) AS max_node
          |FROM (SELECT node, CAST(max(depth) AS BIGINT) AS depth
          |      FROM walk GROUP BY node) t
          |GROUP BY root_depth ORDER BY root_depth""".stripMargin)
    }),

    // -- SQL entry point: GROUP BY ALL / ORDER BY ALL ----------------------
    // The analyst-ergonomics surface both engines grew for exploratory
    // SQL: every non-aggregate select item becomes a grouping key, and
    // ORDER BY ALL sorts by the full select list left-to-right — so the
    // query stays edit-stable as dimensions are added. Pure resolver
    // sugar: Catalyst rewrites to the explicit GROUP BY, identical plan,
    // zero scale cost.
    "q_groupby_all" -> ((s, d) => {
      Tables.registerAll(s, d)
      s.sql(
        """SELECT o_orderpriority, o_orderstatus, count(*) AS n,
          |  round(sum(o_totalprice), 2) AS revenue
          |FROM orders
          |GROUP BY ALL
          |ORDER BY ALL""".stripMargin)
    }),

    // -- SQL entry point: SQL-defined scalar UDF (CREATE FUNCTION) ---------
    // The declarative extension path: the body is a SQL expression, so
    // unlike a JVM udf() it inlines into the plan (no codegen fence, no
    // boxing) and pushes/folds like any built-in — the right first stop
    // before NativeExpressions for logic expressible in SQL.
    "q_sql_udf" -> ((s, d) => {
      Tables.registerAll(s, d)
      s.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION graft_net(
          |  price DOUBLE, disc DOUBLE, tax DOUBLE)
          |RETURNS DOUBLE
          |RETURN price * (1.0e0 - disc) * (1.0e0 + tax)""".stripMargin)
      s.sql(
        """SELECT l_returnflag,
          |  round(sum(graft_net(l_extendedprice, l_discount, l_tax)), 2)
          |    AS net_rev,
          |  count(*) AS n
          |FROM lineitem GROUP BY l_returnflag
          |ORDER BY l_returnflag""".stripMargin)
    }),

    // -- SQL entry point: SQL TABLE function + LATERAL correlation (r16) ---
    // The declarative UDTF tier next to q_sql_udf's scalar SQL function
    // and graft_sentences' native Generator: a `CREATE FUNCTION ...
    // RETURNS TABLE` body inlines into the plan as a correlated generator
    // (no black-box UDF — Catalyst sees the arithmetic, whole-stage
    // codegen applies). The function emits overlapping chunk windows
    // (win=100 chars, step=80) for a document length — the standard
    // training-pipeline chunking fan-out — and the LATERAL join expands
    // every doc to its windows; integer arithmetic only, so both engines
    // agree exactly. At 100 TB the fan-out is per-row generate (no
    // shuffle, no join): the same plan shape explode() produces.
    "q_sql_table_udtf" -> ((s, d) => {
      Tables.registerAll(s, d)
      s.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION graft_chunk_bounds(
          |  len INT, win INT, step INT)
          |RETURNS TABLE (chunk_id INT, start_c INT, end_c INT)
          |RETURN SELECT i AS chunk_id, i * step AS start_c,
          |  least(i * step + win, len) AS end_c
          |FROM (SELECT explode(sequence(0,
          |  CASE WHEN len > win THEN (len - win + step - 1) DIV step
          |       ELSE 0 END)) AS i)""".stripMargin)
      s.sql(
        """SELECT c.n_chunks, count(*) AS n_docs,
          |  CAST(sum(c.covered) AS BIGINT) AS covered_chars,
          |  CAST(sum(c.tail_len) AS BIGINT) AS tail_chars
          |FROM (
          |  SELECT d.doc_id, count(*) AS n_chunks, max(b.end_c) AS covered,
          |    max(b.end_c) - max(b.start_c) AS tail_len
          |  FROM documents d,
          |    LATERAL graft_chunk_bounds(CAST(length(d.text) AS INT),
          |                               100, 80) b
          |  GROUP BY d.doc_id) c
          |GROUP BY c.n_chunks
          |ORDER BY c.n_chunks""".stripMargin)
    }),

    // -- SQL entry point: session variables (DECLARE / SET VAR) ------------
    // Parameterized-query surface: the threshold is computed ONCE into a
    // session variable (scalar subquery at SET time), then referenced as
    // a constant — the main query plans with a literal instead of a
    // rewritten correlated subquery, so the scan prunes on a simple
    // comparison at scale.
    "q_sql_variables" -> ((s, d) => {
      Tables.registerAll(s, d)
      s.sql("DECLARE OR REPLACE VARIABLE graft_min_bal DOUBLE DEFAULT 0.0")
      s.sql(
        """SET VAR graft_min_bal =
          |  (SELECT avg(c_acctbal) FROM customer)""".stripMargin)
      s.sql(
        """SELECT c_mktsegment, count(*) AS n_above,
          |  floor(min(c_acctbal) * 100 + 0.5) / 100 AS min_bal
          |FROM customer WHERE c_acctbal > graft_min_bal
          |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
    }),

    // -- mergeable HLL sketches (Datasketches hll_sketch_agg / union) ------
    // THE re-aggregation pattern at 100 TB: persist a small sketch per
    // fine-grained cell (day × segment), answer coarser distinct-count
    // rollups by UNIONING sketches — no rescan of history, and sketch
    // union is exact w.r.t. the sketch state (unlike raw distinct counts,
    // which cannot be merged). The fine→coarse union here collapses
    // l_linestatus; the estimate surfaces only as a bounded boolean next
    // to the exact count (same discipline as q_approx_distinct), so the
    // oracle pins the bound while the sketch math stays engine-local.
    "q_hll_merge" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val fine = li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(hll_sketch_agg(col("l_partkey")).as("sk"))
      val merged = fine.groupBy(col("l_returnflag"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"),
          count(lit(1)).as("n_fine_cells"))
      val exact = li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("exact_parts"))
      exact.join(merged, "l_returnflag")
        .select(col("l_returnflag"), col("exact_parts"),
          col("n_fine_cells"),
          (abs(col("est") - col("exact_parts")).cast("double") /
            col("exact_parts") < 0.05).as("merged_within_5pct"))
        .orderBy(col("l_returnflag"))
    }),

    // -- listagg / string aggregation (Spark 4 WITHIN GROUP) ---------------
    // Ordered string concatenation per group — the report/export shape.
    // WITHIN GROUP (ORDER BY) makes the result deterministic across
    // partition merge orders (unordered listagg would hash-diverge run to
    // run); DISTINCT dedups before concatenation. Group state is the
    // sorted value list, so this is for bounded groups (segments,
    // categories) — unbounded-group concatenation belongs in collect_list
    // + explicit truncation, not here.
    "q_listagg" -> ((s, d) => {
      Tables.registerAll(s, d)
      s.sql(
        """SELECT c_nationkey,
          |  listagg(DISTINCT c_mktsegment, ',')
          |    WITHIN GROUP (ORDER BY c_mktsegment) AS segs,
          |  listagg(CAST(c_custkey AS STRING), ',')
          |    WITHIN GROUP (ORDER BY c_acctbal DESC, c_custkey) AS top_keys
          |FROM (SELECT * FROM customer WHERE c_acctbal > 9900)
          |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)
    }),

    // -- contingency table (DataFrameStatFunctions.crosstab) ---------------
    // Pairwise frequency matrix of two low-cardinality columns — the data
    // audit the mixture planner runs before choosing per-(lang, source)
    // sampling rates. Spark computes it as one count aggregate pivoted
    // into lang rows × source columns, so the shuffle carries at most
    // |langs|·|sources| cells regardless of corpus size.
    "q_crosstab" -> ((s, d) => {
      Tables.documents(s, d)
        .stat.crosstab("lang", "source")
        .orderBy(col("lang_source"))
    }),

    // -- transpose (Spark 4 Dataset.transpose) -----------------------------
    // Metrics-as-rows report shape: a 5-row aggregate flips so segments
    // become columns. transpose() collects the index column's values to
    // name the output columns, so it is strictly a small-frame finisher
    // (post-aggregate), never a scale-path operator — the heavy lifting
    // (the groupBy) has already reduced 100 TB to one row per segment.
    // All value columns are pre-cast to double: transpose requires a
    // least common type, and doing it explicitly keeps the oracle twin
    // trivial. sums are floor-quantized BEFORE the flip (2-decimal cents).
    "q_transpose" -> ((s, d) => {
      Tables.customer(s, d)
        .groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).cast("double").as("n_cust"),
          (floor(sum(col("c_acctbal")) * 100 + 0.5) / 100).as("sum_bal"),
          max(col("c_acctbal")).as("max_bal"))
        .transpose(col("c_mktsegment"))
        .orderBy(col("key"))
    }),

    // -- pivot (explicit value list so no extra distinct-scan job) ---------
    "q_pivot" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(round(sum(col("o_totalprice")), 2))
        .orderBy(col("o_orderpriority"))
    }),

    // -- set ops: union distinct ------------------------------------------
    "q_union" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val a = o.filter(col("o_totalprice") > 150000).select(col("o_custkey"))
      val b = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      a.union(b).distinct().orderBy(col("o_custkey"))
    }),

    // -- set ops: intersect all -------------------------------------------
    "q_intersect_all" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val a = o.filter(col("o_totalprice") > 150000).select(col("o_custkey"))
      val b = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      a.intersectAll(b).orderBy(col("o_custkey"))
    }),

    // -- set ops: except all ----------------------------------------------
    "q_except_all" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val a = o.filter(col("o_totalprice") > 150000).select(col("o_custkey"))
      val b = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      a.exceptAll(b).orderBy(col("o_custkey"))
    }),

    // -- set ops: intersect distinct (left-semi + distinct under the hood) -
    "q_intersect" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val a = o.filter(col("o_totalprice") > 150000).select(col("o_custkey"))
      val b = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      a.intersect(b).orderBy(col("o_custkey"))
    }),

    // -- set ops: except distinct (left-anti + distinct under the hood) ----
    "q_except" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val a = o.filter(col("o_totalprice") > 150000).select(col("o_custkey"))
      val b = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      a.except(b).orderBy(col("o_custkey"))
    }),

    // -- unpivot / melt (wide → long reshape; inverse of pivot) ------------
    // Expand is a narrow operator (each row emits one row per value
    // column, no shuffle); min/max are order-independent so the doubles
    // need no rounding discipline.
    "q_unpivot" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"), col("l_tax"))
        .unpivot(
          Array(col("l_orderkey")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "metric", "value")
        .groupBy(col("metric"))
        .agg(count(lit(1)).as("n"),
          round(min(col("value")), 6).as("min_value"),
          round(max(col("value")), 6).as("max_value"))
        .orderBy(col("metric"))
    }),

    // -- CDC upsert (MERGE INTO semantics, join-composed) ------------------
    // Spark lacks MERGE without a table format that supports it; the
    // engine-level shape is a FULL OUTER join between the base table and
    // a compacted change batch, resolved row-wise: delete drops, update
    // rewrites, insert lands, untouched rows pass through. One keyed
    // shuffle each side; at 100 TB both sides co-partition on the merge
    // key (bucketed base tables skip their exchange entirely — see
    // q_bucketed_join). The change batch here is derived
    // deterministically from orders: disjoint-by-construction U/D ops on
    // existing keys (one CASE, so a key never carries two ops) plus
    // inserts on a shifted key range.
    "q_upsert_merge" -> ((s, d) => {
      val base = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus"), col("o_totalprice"))
      val existing = base
        .withColumn("op",
          when(pmod(col("o_orderkey"), lit(7)) === 0, lit("U"))
            .when(pmod(col("o_orderkey"), lit(13)) === 5, lit("D")))
        .filter(col("op").isNotNull)
        .select(col("o_orderkey").as("k"), col("op"),
          col("o_custkey").as("ch_custkey"),
          col("o_orderstatus").as("ch_status"),
          (col("o_totalprice") + lit(100.0)).as("ch_price"))
      val inserts = base
        .filter(pmod(col("o_orderkey"), lit(17)) === 2)
        .select((col("o_orderkey") + lit(100000000L)).as("k"),
          lit("I").as("op"), col("o_custkey").as("ch_custkey"),
          lit("O").as("ch_status"), col("o_totalprice").as("ch_price"))
      val changes = existing.union(inserts)
      base.join(changes, col("o_orderkey") === col("k"), "full_outer")
        .filter(coalesce(col("op"), lit("")) =!= "D")
        .select(
          coalesce(col("o_orderkey"), col("k")).as("okey"),
          coalesce(col("ch_custkey"), col("o_custkey")).as("custkey"),
          // updates apply ALL change columns — ch_status, not the base's
          // status (value-identical on this fixture, but the MERGE
          // semantics must not mislead)
          coalesce(col("ch_status"), col("o_orderstatus")).as("status"),
          when(col("op").isin("U", "I"), col("ch_price"))
            .otherwise(col("o_totalprice")).as("price"))
        .orderBy(col("okey"))
    }),

    // -- incremental aggregate maintenance (materialized-view refresh) -----
    // The IVM shape that makes 100 TB rollups affordable: a maintained
    // per-status aggregate absorbs a CDC batch by MERGING partial
    // aggregates — base state + signed delta contributions (+1 for
    // insert, −1 for delete) — instead of rescanning history. Here the
    // "stored MV state" is derived from the base partition of orders
    // (keys with k%10∉{0,1}) and the delta batch carries inserts
    // (k%10=0) and deletes (k%10=1); at scale the base agg is O(groups)
    // rows read from the MV store and only the delta is scanned. Sums
    // are maintained in cent-quantized BIGINT — an MV refreshed by
    // increments must use order-independent arithmetic or repeated
    // refreshes drift; the oracle recomputes the post-batch state from
    // scratch, pinning increment==recompute.
    "q_incremental_agg" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"),
          floor(col("o_totalprice") * lit(100.0) + lit(0.5))
            .cast("long").as("cents"))
        .withColumn("m", pmod(col("o_orderkey"), lit(10)))
      // the stored MV state (pre-batch): everything but this batch's
      // inserts — at scale this is O(groups) rows READ, never recomputed
      val baseAgg = o.filter(col("m") =!= 0)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("bn"), sum(col("cents")).as("bs"))
      // the CDC batch: inserts (m=0) count +1, deletes (m=1) count −1;
      // only this slice is scanned during the refresh
      val deltaAgg = o.filter(col("m") <= 1)
        .withColumn("sgn", when(col("m") === 0, lit(1L)).otherwise(lit(-1L)))
        .groupBy(col("o_orderstatus"))
        .agg(sum(col("sgn")).as("dn"),
          sum(col("sgn") * col("cents")).as("ds"))
      baseAgg.join(deltaAgg, Seq("o_orderstatus"), "full_outer")
        .select(col("o_orderstatus"),
          (coalesce(col("bn"), lit(0L)) + coalesce(col("dn"), lit(0L)))
            .as("n_orders"),
          (coalesce(col("bs"), lit(0L)) + coalesce(col("ds"), lit(0L)))
            .as("sum_cents"))
        .filter(col("n_orders") > 0)
        .orderBy(col("o_orderstatus"))
    })
  )

  def declaredOracle: Seq[(String, String)] = {
    // q_crosstab's 20 source columns, generated by the same loop shape the
    // conditional-aggregate equivalence describes
    val crosstabCols = (0 until 20)
      .map(i => s"""  CAST(sum(CASE WHEN source = 'src$i' THEN 1 ELSE 0 END)
                   |    AS BIGINT) AS "src$i"""".stripMargin)
      .mkString(",\n")
    Seq(
    "q_crosstab" ->
      s"""SELECT lang AS lang_source,
         |$crosstabCols
         |FROM documents GROUP BY lang ORDER BY lang_source""".stripMargin,

    "q_hll_merge" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS exact_parts,
        |  count(DISTINCT l_linestatus) AS n_fine_cells,
        |  true AS merged_within_5pct
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q_listagg" ->
      """SELECT c_nationkey,
        |  string_agg(DISTINCT c_mktsegment, ','
        |    ORDER BY c_mktsegment) AS segs,
        |  string_agg(CAST(c_custkey AS VARCHAR), ','
        |    ORDER BY c_acctbal DESC, c_custkey) AS top_keys
        |FROM customer WHERE c_acctbal > 9900
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber,
        |       floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) / 100
        |         AS revenue
        |FROM lineitem WHERE l_quantity > 45
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_filter_pred" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE c_mktsegment IN ('BUILDING','AUTOMOBILE')
        |  AND c_acctbal BETWEEN 100.0 AND 5000.0
        |  AND c_name LIKE '%5%' AND c_nationkey IS NOT NULL
        |ORDER BY c_custkey""".stripMargin,

    "q_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_conditional" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 200000 THEN 'big'
        |       WHEN o_totalprice > 100000 THEN 'mid'
        |       ELSE 'small' END AS bucket,
        |  coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status2
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2) AS sum_charge,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  round(avg(l_extendedprice), 6) AS avg_price,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_count_distinct" ->
      """SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust,
        |       count(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q_percentile" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS p50_qty,
        |  round(quantile_cont(l_extendedprice, 0.25), 6) AS p25_price,
        |  round(quantile_cont(l_extendedprice, 0.75), 6) AS p75_price
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    // quantile_cont interpolation == the engine's rank-window form (the
    // q_percentile precedent); clip values cent-quantized before the sum
    "q_winsorize" ->
      """WITH b AS (SELECT l_returnflag AS g,
        |    quantile_cont(l_extendedprice, 0.05) AS p05,
        |    quantile_cont(l_extendedprice, 0.95) AS p95
        |  FROM lineitem GROUP BY 1)
        |SELECT v.g AS l_returnflag, count(*) AS n,
        |  CAST(sum(CASE WHEN v.v < b.p05 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_clip_low,
        |  CAST(sum(CASE WHEN v.v > b.p95 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_clip_high,
        |  floor(min(b.p05) * 1e6 + 0.5e0) / 1e6 AS p05,
        |  floor(min(b.p95) * 1e6 + 0.5e0) / 1e6 AS p95,
        |  CAST(sum(CAST(floor(greatest(b.p05, least(b.p95, v.v))
        |    * 100.0e0 + 0.5e0) AS BIGINT)) AS BIGINT)
        |    AS sum_clipped_cents
        |FROM (SELECT l_returnflag AS g, l_extendedprice AS v
        |      FROM lineitem) v
        |JOIN b USING (g)
        |GROUP BY v.g ORDER BY v.g""".stripMargin,

    "q_approx_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
        |  true AS approx_within_5pct
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q_approx_percentile" ->
      """SELECT l_returnflag,
        |  floor(quantile_cont(l_extendedprice, 0.5) * 100 + 0.5) / 100
        |    AS exact_p50,
        |  true AS approx_within_2pct
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
        |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag ASC NULLS FIRST,
        |         l_linestatus ASC NULLS FIRST""".stripMargin,

    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid,
        |  round(sum(o_totalprice), 2) AS sum_price, count(*) AS n
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus ASC NULLS FIRST,
        |         o_orderpriority ASC NULLS FIRST""".stripMargin,

    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
        |  round(sum(l_extendedprice), 2) AS sum_price, count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |                        (l_returnflag), ())
        |ORDER BY gid, l_returnflag ASC NULLS FIRST,
        |         l_linestatus ASC NULLS FIRST""".stripMargin,

    // every predicate in the scan; exact cent accumulation
    "q6_forecast" ->
      """SELECT count(*) AS n_lines,
        |  CAST(sum(CAST(floor(l_extendedprice * l_discount * 100.0
        |    + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24.0""".stripMargin,

    // identical LATERAL text — DuckDB runs the same SQL-standard form
    "q_lateral_topn" ->
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer c,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
        |         WHERE o_custkey = c.c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey
        |         LIMIT 2) t
        |ORDER BY c.c_custkey, t.o_totalprice DESC,
        |         t.o_orderkey""".stripMargin,

    "q_filtered_agg" ->
      """SELECT l_returnflag,
        |  round(sum(CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE 0.0 END), 2) AS disc_rev,
        |  count(*) FILTER (WHERE l_tax > 0.04) AS n_taxed,
        |  round(avg(l_quantity) FILTER (WHERE l_quantity > 25), 6) AS avg_big_qty
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q13_cust_dist" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey) t
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    round(sum(l_extendedprice * (1.0 - l_discount)), 2)
        |      AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
        |  total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "q_mode_median" ->
      """SELECT o_orderpriority, mode(o_orderstatus) AS status_mode,
        |  floor(median(o_totalprice) * 100 + 0.5) / 100 AS price_median,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q_collect" ->
      """SELECT c_nationkey,
        |  array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',')
        |    AS segments,
        |  count(*) AS n
        |FROM customer GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin,

    "q_sort_multi" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
        |ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey ASC
        |LIMIT 100 OFFSET 10""".stripMargin,

    "q_sort_local" ->
      """SELECT l_orderkey, l_linenumber AS first_line,
        |  l_extendedprice AS first_price
        |FROM (SELECT l_orderkey, l_linenumber, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_orderkey
        |      ORDER BY l_linenumber, l_extendedprice) AS rn
        |  FROM lineitem) t
        |WHERE rn = 1 ORDER BY l_orderkey""".stripMargin,

    "q_union_byname" ->
      """SELECT o_custkey, count(*) AS n, round(sum(price), 2) AS sum_price
        |FROM (SELECT o_custkey, o_totalprice AS price FROM orders
        |        WHERE o_totalprice > 150000
        |      UNION ALL
        |      SELECT o_custkey, o_totalprice AS price FROM orders
        |        WHERE o_orderstatus = 'F') t
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "q_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
        |LIMIT 25""".stripMargin,

    "q_lateral" ->
      """SELECT n.n_name, t.c_custkey,
        |  floor(t.c_acctbal * 100 + 0.5) / 100 AS bal
        |FROM nation n, LATERAL (
        |  SELECT c_custkey, c_acctbal FROM customer c
        |  WHERE c.c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
        |ORDER BY n.n_name, bal DESC, t.c_custkey""".stripMargin,

    "q_sql_subquery" ->
      """WITH open_custs AS (
        |  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |SELECT c.c_custkey,
        |  floor(c.c_acctbal * 100 + 0.5) / 100 AS bal
        |FROM customer c
        |WHERE c.c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
        |                     WHERE c2.c_nationkey = c.c_nationkey)
        |  AND EXISTS (SELECT 1 FROM open_custs oc
        |              WHERE oc.o_custkey = c.c_custkey)
        |  AND c.c_nationkey IN (SELECT n_nationkey FROM nation
        |                        WHERE n_regionkey < 3)
        |ORDER BY c.c_custkey""".stripMargin,

    // DuckDB spells integer division `//` where Spark spells `DIV`;
    // identical recursion otherwise. CAST(sum) — HUGEINT widening.
    "q_recursive_cte" ->
      """WITH RECURSIVE tree(id, depth) AS (
        |  SELECT CAST(1 AS BIGINT) AS id, 0 AS depth
        |  UNION ALL
        |  SELECT c.c_custkey, t.depth + 1
        |  FROM customer c JOIN tree t ON c.c_custkey // 2 = t.id
        |  WHERE c.c_custkey > 1
        |)
        |SELECT depth, count(*) AS n_nodes, min(id) AS min_id,
        |  max(id) AS max_id, CAST(sum(id) AS BIGINT) AS sum_id
        |FROM tree GROUP BY depth ORDER BY depth""".stripMargin,

    // the oracle rebuilds the flipped table with conditional aggregates;
    // row order pinned by key on both sides
    "q_transpose" ->
      """WITH a AS (SELECT c_mktsegment AS seg,
        |    CAST(count(*) AS DOUBLE) AS n_cust,
        |    floor(sum(c_acctbal) * 100 + 0.5) / 100 AS sum_bal,
        |    max(c_acctbal) AS max_bal
        |  FROM customer GROUP BY c_mktsegment)
        |SELECT 'n_cust' AS key,
        |  max(CASE WHEN seg = 'AUTOMOBILE' THEN n_cust END) AS "AUTOMOBILE",
        |  max(CASE WHEN seg = 'BUILDING' THEN n_cust END) AS "BUILDING",
        |  max(CASE WHEN seg = 'FURNITURE' THEN n_cust END) AS "FURNITURE",
        |  max(CASE WHEN seg = 'HOUSEHOLD' THEN n_cust END) AS "HOUSEHOLD",
        |  max(CASE WHEN seg = 'MACHINERY' THEN n_cust END) AS "MACHINERY"
        |FROM a
        |UNION ALL
        |SELECT 'sum_bal' AS key,
        |  max(CASE WHEN seg = 'AUTOMOBILE' THEN sum_bal END),
        |  max(CASE WHEN seg = 'BUILDING' THEN sum_bal END),
        |  max(CASE WHEN seg = 'FURNITURE' THEN sum_bal END),
        |  max(CASE WHEN seg = 'HOUSEHOLD' THEN sum_bal END),
        |  max(CASE WHEN seg = 'MACHINERY' THEN sum_bal END)
        |FROM a
        |UNION ALL
        |SELECT 'max_bal' AS key,
        |  max(CASE WHEN seg = 'AUTOMOBILE' THEN max_bal END),
        |  max(CASE WHEN seg = 'BUILDING' THEN max_bal END),
        |  max(CASE WHEN seg = 'FURNITURE' THEN max_bal END),
        |  max(CASE WHEN seg = 'HOUSEHOLD' THEN max_bal END),
        |  max(CASE WHEN seg = 'MACHINERY' THEN max_bal END)
        |FROM a
        |ORDER BY key""".stripMargin,

    "q_pipe_syntax" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        |  round(sum(l_extendedprice * (1.0e0 - l_discount)), 2) AS net_rev
        |FROM lineitem WHERE l_quantity > 10
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    // the same sugar exists in DuckDB — the oracle exercises it too
    "q_groupby_all" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS revenue
        |FROM orders GROUP BY ALL ORDER BY ALL""".stripMargin,

    // the identical ANSI recursion; DuckDB's integer // mirrors div
    "q_recursive_walk" ->
      """WITH RECURSIVE walk(node, cur, depth) AS (
        |  SELECT s_suppkey, s_suppkey, 0 FROM supplier
        |  UNION ALL
        |  SELECT node, cur // 2, depth + 1 FROM walk WHERE cur > 1
        |)
        |SELECT depth AS root_depth,
        |  count(*) AS n_nodes,
        |  min(node) AS min_node, max(node) AS max_node
        |FROM (SELECT node, CAST(max(depth) AS BIGINT) AS depth
        |      FROM walk GROUP BY node) t
        |GROUP BY root_depth ORDER BY root_depth""".stripMargin,

    // the parameter binds as a value on both engines
    "q_sql_exec" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS revenue
        |FROM orders WHERE o_totalprice > 100000
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // DuckDB resolves the same constant-expression names at bind time
    "q_sql_identifier" ->
      """SELECT l_returnflag, count(*) AS n,
        |  round(sum(l_extendedprice), 2) AS revenue
        |FROM lineitem
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_sql_udf" ->
      """SELECT l_returnflag,
        |  round(sum(l_extendedprice * (1.0e0 - l_discount)
        |            * (1.0e0 + l_tax)), 2) AS net_rev,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q_sql_variables" ->
      """SELECT c_mktsegment, count(*) AS n_above,
        |  floor(min(c_acctbal) * 100 + 0.5) / 100 AS min_bal
        |FROM customer
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    // chunk-window fan-out replayed with generate_series: same integer
    // window arithmetic (win=100, step=80, last window clamps to len)
    "q_sql_table_udtf" ->
      """WITH b AS (
        |  SELECT d.doc_id, i AS chunk_id, i * 80 AS start_c,
        |    least(i * 80 + 100, length(d.text)) AS end_c
        |  FROM documents d, LATERAL (
        |    SELECT unnest(generate_series(0,
        |      CASE WHEN length(d.text) > 100
        |           THEN (length(d.text) - 100 + 79) // 80
        |           ELSE 0 END)) AS i) g),
        |c AS (
        |  SELECT doc_id, count(*) AS n_chunks, max(end_c) AS covered,
        |    max(end_c) - max(start_c) AS tail_len
        |  FROM b GROUP BY doc_id)
        |SELECT n_chunks, count(*) AS n_docs,
        |  CAST(sum(covered) AS BIGINT) AS covered_chars,
        |  CAST(sum(tail_len) AS BIGINT) AS tail_chars
        |FROM c GROUP BY n_chunks ORDER BY n_chunks""".stripMargin,

    "q_pivot" ->
      """SELECT o_orderpriority,
        |  round(sum(CASE WHEN o_orderstatus = 'F'
        |    THEN o_totalprice END), 2) AS "F",
        |  round(sum(CASE WHEN o_orderstatus = 'O'
        |    THEN o_totalprice END), 2) AS "O",
        |  round(sum(CASE WHEN o_orderstatus = 'P'
        |    THEN o_totalprice END), 2) AS "P"
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q_union" ->
      """SELECT o_custkey FROM orders WHERE o_totalprice > 150000
        |UNION
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin,

    "q_intersect_all" ->
      """SELECT o_custkey FROM orders WHERE o_totalprice > 150000
        |INTERSECT ALL
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin,

    "q_except_all" ->
      """SELECT o_custkey FROM orders WHERE o_totalprice > 150000
        |EXCEPT ALL
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin,

    "q_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_totalprice > 150000
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin,

    "q_except" ->
      """SELECT o_custkey FROM orders WHERE o_totalprice > 150000
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin,

    "q_unpivot" ->
      """WITH u AS (
        |  SELECT 'l_quantity' AS metric, l_quantity AS value FROM lineitem
        |  UNION ALL
        |  SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
        |  UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
        |SELECT metric, count(*) AS n, round(min(value), 6) AS min_value,
        |  round(max(value), 6) AS max_value
        |FROM u GROUP BY metric ORDER BY metric""".stripMargin,

    // CAST(100.0 AS DOUBLE): the bare literal is DECIMAL in DuckDB and
    // decimal+double addition would diverge from Spark's double path
    "q_upsert_merge" ->
      """WITH base AS (SELECT o_orderkey, o_custkey, o_orderstatus,
        |    o_totalprice FROM orders),
        |ex AS (SELECT o_orderkey AS k,
        |    CASE WHEN o_orderkey % 7 = 0 THEN 'U'
        |         WHEN o_orderkey % 13 = 5 THEN 'D' END AS op,
        |    o_custkey AS ch_custkey, o_orderstatus AS ch_status,
        |    o_totalprice + CAST(100.0 AS DOUBLE) AS ch_price
        |  FROM base WHERE o_orderkey % 7 = 0 OR o_orderkey % 13 = 5),
        |ins AS (SELECT o_orderkey + 100000000 AS k, 'I' AS op,
        |    o_custkey AS ch_custkey, 'O' AS ch_status,
        |    o_totalprice AS ch_price
        |  FROM base WHERE o_orderkey % 17 = 2),
        |ch AS (SELECT * FROM ex UNION ALL SELECT * FROM ins)
        |SELECT coalesce(b.o_orderkey, c.k) AS okey,
        |  coalesce(c.ch_custkey, b.o_custkey) AS custkey,
        |  coalesce(c.ch_status, b.o_orderstatus) AS status,
        |  CASE WHEN c.op IN ('U','I') THEN c.ch_price
        |       ELSE b.o_totalprice END AS price
        |FROM base b FULL OUTER JOIN ch c ON b.o_orderkey = c.k
        |WHERE coalesce(c.op, '') <> 'D'
        |ORDER BY okey""".stripMargin,

    // the oracle recomputes the post-batch state from scratch — final
    // rows = (m<>0 base) + (m=0 inserts) − (m=1 deletes) = keys % 10 <> 1
    // — pinning increment == recompute
    "q_incremental_agg" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100.0e0 + 0.5e0) AS BIGINT))
        |    AS BIGINT) AS sum_cents
        |FROM orders WHERE o_orderkey % 10 <> 1
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
  )
  }
}
