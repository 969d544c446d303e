package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import graft.engine.{QueryPack, Tables}

/** Join surface: inner equi (SMJ/SHJ), broadcast, outer, semi/anti,
  * cross/theta, range join, self join. SURVEY.md §2.2 "Joins".
  *
  * Scale notes:
  *  - Dimension tables (region 5, nation 25, supplier, part) are explicitly
  *    `broadcast()`-hinted: at 100 TB the fact side never shuffles for these.
  *  - Fact-fact joins (lineitem ⋈ orders) are left to Catalyst: they shuffle
  *    on the join key once and AQE can convert to broadcast when a filtered
  *    side turns out small at runtime.
  *  - Non-equi joins are deliberately bounded: the range join's build side
  *    is a tiny literal band table (BroadcastNestedLoopJoin — fine because
  *    the broadcast side is O(10) rows, never the fact table).
  */
object JoinQueries extends QueryPack {

  /** Literal price-band dimension used by the range join (both engines). */
  private def bands(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      ("b0", 0.0, 100.0),
      ("b1", 100.0, 150.0),
      ("b2", 150.0, 175.0),
      ("b3", 175.0, 1e9)
    ).toDF("band", "lo", "hi")
  }

  def declared: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    // -- TPC-H Q3 shape (adapted: no o_shippriority in corpus) -------------
    "q3_join" -> ((s, d) => {
      val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") < lit("1998-01-01"))
      val l = Tables.lineitem(s, d)
        .filter(col("l_shipdate") > lit("1997-01-01"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(20)
    }),

    // -- TPC-H Q5 shape: 6-table join, dims broadcast ----------------------
    "q5_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1998-01-01"))
      val l = Tables.lineitem(s, d)
      val su = Tables.supplier(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("n_name"))
    }),

    // -- TPC-H Q8: national market share (r13) ------------------------------
    // The canonical two-level-dimension star query: within the AMERICA
    // market (customer's region) for STANDARD-type parts, what share of
    // yearly order volume is supplied by NATION_5? Adapted to the corpus
    // schema (names are synthetic; no partsupp — Q8 needs none). Shape at
    // 100 TB: lineitem⋈orders⋈part is the only fact-fact work (part
    // filter broadcast via AQE after the type predicate), customer/
    // supplier key into broadcast nation/region dims twice (two aliases,
    // the Q8 signature), and the share divides two conditional sums in
    // one pass — no second scan, no self-join. The division quantizes at
    // 1e-6 in a mirrored expression.
    "q8_market_share" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1998-01-01"))
      val p = Tables.part(s, d).filter(col("p_type") === "STANDARD")
      val c = Tables.customer(s, d)
      val su = Tables.supplier(s, d)
      val n1 = Tables.nation(s, d)
        .select(col("n_nationkey").as("c_nk"), col("n_regionkey"))
      val r = Tables.region(s, d).filter(col("r_name") === "AMERICA")
      val n2 = Tables.nation(s, d)
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val vol = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("c_nationkey") === col("c_nk"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n2), col("s_nationkey") === col("s_nk"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          round(sum(when(col("supp_nation") === "NATION_5", vol)
            .otherwise(lit(0.0))), 2).as("nation_volume"),
          round(sum(vol), 2).as("total_volume"))
        .withColumn("mkt_share",
          floor(col("nation_volume") / col("total_volume") * lit(1e6) +
            lit(0.5)) / lit(1e6))
        .orderBy(col("o_year"))
    }),

    // -- broadcast join: revenue per region --------------------------------
    "q_broadcast_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      o.join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(round(sum(col("o_totalprice")), 2).as("sum_price"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("r_name"))
    }),

    // -- left outer join + null handling -----------------------------------
    "q_left_outer" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          round(coalesce(sum(col("o_totalprice")), lit(0.0)), 2).as("spend"))
        .orderBy(col("c_custkey"))
    }),

    // -- right outer join --------------------------------------------------
    // Mirror of q_left_outer with the build/probe sides swapped: keeps all
    // customers even when the (larger, left) orders side has no match.
    "q_right_outer" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      o.join(c, col("o_custkey") === col("c_custkey"), "right_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          max(col("o_orderpriority")).as("max_prio"))
        .orderBy(col("c_custkey"))
    }),

    // -- full outer join ---------------------------------------------------
    "q_full_outer" -> ((s, d) => {
      // customers with high balance vs customers having open orders:
      // full outer exposes both unmatched sides.
      val a = Tables.customer(s, d).filter(col("c_acctbal") > 7500)
        .select(col("c_custkey").as("k"), col("c_acctbal"))
      val b = Tables.orders(s, d).filter(col("o_orderstatus") === "O")
        .groupBy(col("o_custkey").as("k2"))
        .agg(count(lit(1)).as("n_open"))
      a.join(b, col("k") === col("k2"), "full_outer")
        .select(
          coalesce(col("k"), col("k2")).as("custkey"),
          col("c_acctbal"),
          coalesce(col("n_open"), lit(0L)).as("n_open"))
        .orderBy(col("custkey").asc_nulls_last)
    }),

    // -- left semi (EXISTS) ------------------------------------------------
    "q_semi_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // -- left anti (NOT EXISTS) -------------------------------------------
    "q_anti_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .orderBy(col("c_custkey"))
    }),

    // -- cross join (small × small) ---------------------------------------
    "q_cross_join" -> ((s, d) => {
      val r = Tables.region(s, d).select(col("r_name"))
      val st = Tables.orders(s, d).select(col("o_orderstatus")).distinct()
      r.crossJoin(st).orderBy(col("r_name"), col("o_orderstatus"))
    }),

    // -- theta join: equi + range residual ---------------------------------
    "q_theta_join" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d)
      l.join(o, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 100 DAYS"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_late"),
          round(sum(col("l_extendedprice")), 2).as("late_value"))
        .orderBy(col("o_orderstatus"))
    }),

    // -- pure range join against tiny broadcast band table -----------------
    "q_range_join" -> ((s, d) => {
      val e = Tables.events(s, d)
      e.join(broadcast(bands(s)),
          col("value") >= col("lo") && col("value") < col("hi"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v"))
        .orderBy(col("band"))
    }),

    // -- self join: supplier pairs in the same nation ----------------------
    "q_self_join" -> ((s, d) => {
      val s1 = Tables.supplier(s, d)
        .select(col("s_suppkey").as("k1"), col("s_nationkey").as("nk"))
      val s2 = Tables.supplier(s, d)
        .select(col("s_suppkey").as("k2"), col("s_nationkey").as("nk2"))
      s1.join(s2, col("nk") === col("nk2") && col("k1") < col("k2"))
        .select(col("nk").as("s_nationkey"), col("k1"), col("k2"))
        .orderBy(col("s_nationkey"), col("k1"), col("k2"))
    }),

    // -- SALTED join for skewed keys ---------------------------------------
    // l_returnflag has 3 values over the whole fact table — a plain
    // shuffle join sends each value's ~2M rows/partition-at-sf0.1
    // (billions at 100 TB) to ONE reducer each: 3 working tasks, the
    // rest idle, the job bounded by the hottest key. The salt pattern:
    // REPLICATE the (small-but-not-broadcastable) build side once per
    // salt bucket, give each probe row a deterministic salt from its
    // unique key, and join on (key, salt) — the hot key's rows now
    // spread over [[skewSalts]] reducers. Results are provably
    // identical: every probe row still meets exactly one copy of its
    // build row. shuffle_hash hint pins the demonstration to the
    // shuffle path (with a truly tiny dim you would broadcast instead
    // — see q_broadcast_join; salting is for the middle regime where
    // the build side exceeds the broadcast threshold but keys skew).
    // -- runtime bloom-filter join pruning ---------------------------------
    // The shuffle-reduction feature a selective fact⋈fact join needs at
    // 100 TB: when one side carries a selective predicate, Catalyst
    // (spark.sql.optimizer.runtime.bloomFilter.enabled) builds a bloom
    // filter over the filtered side's join keys and applies it to the
    // OTHER side's scan as might_contain — rows that cannot match are
    // dropped BEFORE the shuffle, which is where the win lives (the
    // shuffle is the cost, not the join). The merge hint pins the
    // shuffle path (a broadcast join needs no bloom). At test scale the
    // application side sits under the 10 GB
    // applicationSideScanSizeThreshold, so injection is asserted in
    // PlanSpec with production thresholds; semantics are threshold-
    // independent, which is what the oracle checks.
    "q_bloom_join" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
        .hint("merge")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy(col("l_returnflag"))
    }),

    "q_skew_join" -> ((s, d) => {
      val flagDim = s.createDataFrame(java.util.Arrays.asList(
        Row("A", "returned"), Row("N", "active"), Row("R", "refunded")),
        StructType(Seq(StructField("flag", StringType, nullable = false),
          StructField("flag_desc", StringType, nullable = false))))
      val salted = flagDim.withColumn("salt",
        explode(sequence(lit(0), lit(skewSalts - 1))))
      val fact = Tables.lineitem(s, d)
        .select(col("l_returnflag").as("flag"),
          col("l_extendedprice"), col("l_discount"),
          pmod(xxhash64(col("l_orderkey"), col("l_linenumber")),
            lit(skewSalts)).cast("int").as("salt"))
      fact.join(salted.hint("shuffle_hash"), Seq("flag", "salt"))
        .groupBy(col("flag"), col("flag_desc"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
            2).as("revenue"))
        .orderBy(col("flag"))
    }),

    // -- join-key skew audit (the diagnostic BEFORE q_skew_join) -----------
    // The pre-flight a 100 TB join runs to decide whether it needs
    // salting/AQE-skew handling at all: the per-key row histogram of the
    // candidate join key, reduced to the numbers that drive the
    // decision — key count, max vs mean rows per key (the skew factor),
    // and the top-5 heavy keys with their corpus share. One map-side-
    // combined groupBy + a 1-row broadcast stats frame + TakeOrdered(5):
    // the diagnostic costs one shuffle bounded by key cardinality, never
    // a second pass over the fact table.
    "q_skew_audit" -> ((s, d) => {
      val perKey = Tables.lineitem(s, d)
        .groupBy(col("l_suppkey")).agg(count(lit(1)).as("n"))
      val stats = perKey.agg(count(lit(1)).as("n_keys"),
        sum(col("n")).as("total"), max(col("n")).as("max_n"))
      perKey.orderBy(col("n").desc, col("l_suppkey")).limit(5)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("n").desc, col("l_suppkey"))).cast("long"))
        .crossJoin(broadcast(stats))
        .select(col("rank"), col("l_suppkey"), col("n"),
          round(col("n").cast("double") / col("total"), 6).as("share"),
          col("n_keys"),
          round(col("max_n").cast("double") * col("n_keys") /
            col("total"), 6).as("skew_factor"))
        .orderBy(col("rank"))
    }),

    // -- null-safe equality join (`<=>` / IS NOT DISTINCT FROM) ------------
    // The SQL surface for joining on keys where NULL must match NULL
    // (sentinel-encoded dimensions, SCD bridge tables). nationkey 0 is
    // nulled on both sides, so the NULL partition carries real matches
    // that a plain equi-join would silently drop. Catalyst plans
    // EqualNullSafe as a KEYED join (hash/sort-merge on the null-safe
    // key), not a cartesian — the whole point of preferring `<=>` over
    // `ON a = b OR (a IS NULL AND b IS NULL)`, which falls off the keyed
    // path into BNLJ.
    "q_nullsafe_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
        .select(expr("nullif(c_nationkey, 0)").as("ck"))
      val su = Tables.supplier(s, d)
        .select(expr("nullif(s_nationkey, 0)").as("sk"))
      c.join(su, col("ck") <=> col("sk"))
        .groupBy(coalesce(col("ck"), lit(-1L)).as("nk"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("nk"))
    }),

    // -- volume shipping between two nations (TPC-H Q7 shape) --------------
    // The 6-way star-with-two-dims-twice join: lineitem⋈orders is the
    // fact spine (two big-table shuffles), supplier/customer bridge to
    // TWO separate broadcast copies of nation (aliased roles — the shape
    // that goes wrong when an engine can't alias a dim). Revenue is
    // per-row fixed double math quantized to exact integer cents BEFORE
    // the group sum, so the aggregate is summation-order-free (q5_join's
    // round(sum(double)) survives only because 2dp sits above the noise;
    // this one is exact by construction).
    "q7_volume" -> ((s, d) => {
      val n1 = Tables.nation(s, d)
        .select(col("n_nationkey").as("nk1"), col("n_name").as("supp_nation"))
        .filter(col("supp_nation").isin("NATION_1", "NATION_2",
          "NATION_3", "NATION_4"))
      val n2 = Tables.nation(s, d)
        .select(col("n_nationkey").as("nk2"), col("n_name").as("cust_nation"))
        .filter(col("cust_nation").isin("NATION_1", "NATION_2",
          "NATION_3", "NATION_4"))
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("nk1"))
        .join(broadcast(n2), col("c_nationkey") === col("nk2"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(count(lit(1)).as("n_items"),
          sum(floor(col("l_extendedprice") *
            (lit(1.0) - col("l_discount")) * lit(100.0) + lit(0.5))
            .cast("long")).as("rev_cents"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    }),

    // -- returned-item revenue ranking (TPC-H Q10 shape) -------------------
    // Who cost us the most in returns: fact-side filter (l_returnflag =
    // 'R') pushes to the scan BEFORE the join spine, customer/nation
    // dims attach after the aggregate-ready frame, top-20 fuses into
    // TakeOrderedAndProject. Exact integer cents per the q7_volume
    // rationale; (revenue desc, custkey) is the declared total order.
    "q10_returns" -> ((s, d) => {
      val l = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      l.join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(sum(floor(col("l_extendedprice") *
          (lit(1.0) - col("l_discount")) * lit(100.0) + lit(0.5))
          .cast("long")).as("rev_cents"))
        .orderBy(col("rev_cents").desc, col("c_custkey"))
        .limit(20)
    }),

    // -- large-volume orders (TPC-H Q18 shape) ------------------------------
    // The group-HAVING-semi-join classic: customers whose single orders
    // exceed a quantity threshold. The HAVING aggregate runs on lineitem
    // ALONE (two columns off the scan, map-side combined) and only the
    // few qualifying order keys re-enter the join spine — at 100 TB the
    // spine processes the ~1% survivors, not the fact table. Quantities
    // are integral by corpus contract; floor(q + 0.5) makes the group
    // sum an exact integer (never a double accumulation), and
    // (o_totalprice desc, o_orderkey) is the declared total order.
    "q18_big_orders" -> ((s, d) => {
      val big = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sum(floor(col("l_quantity") + lit(0.5)).cast("long"))
          .as("total_qty"))
        .filter(col("total_qty") > 250L)
      Tables.orders(s, d)
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"),
          round(col("o_totalprice"), 2).as("o_totalprice"),
          col("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }),

    // -- TPC-H Q14: promotion revenue share ---------------------------------
    // Broadcast-dimension exemplar: one ship-month of the fact joins the
    // part table (broadcast — the dimension never shuffles the fact),
    // then a single conditional aggregate. Revenue in exact cents; the
    // percentage is an exact integer micro-ratio.
    "q14_promo" -> ((s, d) => {
      val cents = floor(col("l_extendedprice") *
        (lit(1.0) - col("l_discount")) * lit(100.0) + lit(0.5))
        .cast("long")
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-03-01") &&
          col("l_shipdate") < lit("1996-04-01"))
        .join(broadcast(Tables.part(s, d)
          .select(col("p_partkey"), col("p_type"))),
          col("l_partkey") === col("p_partkey"))
        .agg(sum(when(col("p_type") === "PROMO", cents).otherwise(0L))
          .as("promo_cents"),
          sum(cents).as("total_cents"))
        .select(col("promo_cents"), col("total_cents"),
          (expr("(promo_cents * 1000000) div total_cents").cast("double") /
            lit(1e4)).as("promo_pct"))
    }),

    // -- TPC-H Q17: small-quantity-order revenue ----------------------------
    // The correlated-average shape: lines of one brand whose quantity
    // falls under 20% of that PART's average quantity. The scalable
    // form: per-part quantity moments aggregate FIRST (part-keyed, the
    // survivors of the brand filter only), then the threshold test is
    // the exact integer cross-multiplication qc·5·n < Σqc — no float
    // average ever materializes, no correlated re-scan (the TPC-H
    // subquery decorrelates to exactly this join). avg_yearly divides
    // the exact cent sum by the 7-year window via integer div.
    "q17_small_qty" -> ((s, d) => {
      val qc = floor(col("l_quantity") * lit(100.0) + lit(0.5)).cast("long")
      val pb = Tables.part(s, d).filter(col("p_brand") === "Brand#13")
        .select(col("p_partkey"))
      val li = Tables.lineitem(s, d)
        .join(broadcast(pb), col("l_partkey") === col("p_partkey"))
      val avgq = li.groupBy(col("p_partkey").as("pk"))
        .agg(count(lit(1)).as("n_l"), sum(qc).as("sqc"))
      li.join(avgq, col("p_partkey") === col("pk"))
        .filter(qc * lit(5L) * col("n_l") < col("sqc"))
        .agg(count(lit(1)).as("n_small"),
          (expr("sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))" +
            " div 7").cast("double") / lit(100.0)).as("avg_yearly"))
    }),

    // -- TPC-H Q19: disjunctive bracket filter ------------------------------
    // The OR-of-ANDs predicate exemplar: three (brand, size-band,
    // quantity-band) brackets over the part-joined fact. What matters at
    // 100 TB: Catalyst factors the common p_partkey equi-join OUT of the
    // disjunction (the join stays a broadcast hash join, never a BNLJ)
    // and pushes the residual disjunction to the scan. Cent-exact
    // revenue.
    "q19_brackets" -> ((s, d) => {
      val j = Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)
          .select(col("p_partkey"), col("p_brand"), col("p_size"))),
          col("l_partkey") === col("p_partkey"))
      j.filter(
        (col("p_brand") === "Brand#13" && col("p_size").between(1, 10) &&
          col("l_quantity").between(1.0, 15.0)) ||
        (col("p_brand") === "Brand#20" && col("p_size").between(5, 20) &&
          col("l_quantity").between(10.0, 25.0)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(10, 30) &&
          col("l_quantity").between(20.0, 35.0)))
        .agg(count(lit(1)).as("n_lines"),
          (sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * lit(100.0) + lit(0.5)).cast("long")).cast("double") /
            lit(100.0)).as("revenue"))
    }),

    // -- TPC-H Q22: idle high-balance customers -----------------------------
    // The anti-join + scalar-subquery exemplar: customers with an
    // above-average positive balance and no URGENT orders (this corpus's
    // order coverage is total, so the untouched-segment predicate is the
    // priority slice), grouped by nation. The average threshold never
    // materializes as a float: the test is the exact cross-multiplication
    // bal_cents·n > Σcents against the broadcast 1-row moment frame; the
    // anti join is key-shuffled and its probe side pre-filters to the
    // urgent slice BEFORE the shuffle (predicate under the anti join —
    // at 100 TB that is 1/5th of the orders table never moving). Balance
    // totals are exact cent sums.
    "q22_idle_customers" -> ((s, d) => {
      val bc = floor(col("c_acctbal") * lit(100.0) + lit(0.5)).cast("long")
      val c = Tables.customer(s, d)
      val t = c.filter(col("c_acctbal") > lit(0.0))
        .agg(sum(bc).as("sc"), count(lit(1)).as("nc"))
      c.crossJoin(broadcast(t))
        .filter(bc * col("nc") > col("sc"))
        .join(Tables.orders(s, d)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey").cast("long").as("nationkey"))
        .agg(count(lit(1)).as("n_cust"),
          (sum(bc).cast("double") / lit(100.0)).as("total_bal"))
        .orderBy(col("nationkey"))
    }),

    // -- Native broadcast range join (custom planner strategy, r16) --------
    // Point-in-interval join through the engine's own physical operator
    // (GraftRangeJoinExec — RangeJoin.scala): 128 overlapping price
    // brackets (stride 4000, width 10000, so every order lands in 2-3
    // brackets) probed by binary search + prefix-max walk-back instead of
    // the O(|orders|·128) BroadcastNestedLoopJoin Spark would plan for the
    // same non-equi predicate. The interval side rides the standard
    // BroadcastExchange; the fact side never shuffles or sorts. Bracket
    // bounds are multiples of 4000 — exactly representable doubles, so the
    // lo/hi group keys hash identically in both engines; aggregates are
    // counts only (no FP accumulation).
    "q_range_join_native" -> ((s, d) => {
      val o = Tables.orders(s, d).select(col("o_totalprice"), col("o_custkey"))
      val br = s.range(0, 128).select(
        col("id").as("bracket_id"),
        (col("id") * lit(4000.0)).as("lo"),
        (col("id") * lit(4000.0) + lit(10000.0)).as("hi"))
      org.apache.spark.sql.graft.GraftPlans
        .rangeJoinPoint(o, br, o("o_totalprice"), br("lo"), br("hi"))
        .groupBy(col("bracket_id"), col("lo"), col("hi"))
        .agg(count(lit(1)).as("n_orders"),
          countDistinct(col("o_custkey")).as("n_custs"))
        .orderBy(col("bracket_id"))
    }),

    // -- Storage-partitioned join (DSv2 KeyGroupedPartitioning, r16) -------
    // Both sides are KeyedGenSource tables whose scans REPORT their
    // key-grouped layout (SupportsReportPartitioning + HasPartitionKey,
    // identity transform on `key`), so with v2 bucketing enabled the join
    // AND the following per-key aggregate plan with ZERO ShuffleExchange —
    // the Iceberg/Delta bucketed-join shape that removes the dominant cost
    // of a 100 TB fact-fact join (Round16Spec pins the shuffle-free plan
    // with broadcast disabled). Rows are pure integer functions of the row
    // index, so the oracle replays both generators from range().
    "q_spj_join" -> ((s, _) => {
      // v2 bucketing stays on for the session: it only changes planning
      // for DSv2 scans that report KeyGroupedPartitioning (this source);
      // parquet scans are untouched.
      s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      def t(n: Long, mult: Long): DataFrame = s.read
        .format(classOf[graft.sources.KeyedGenSource].getName)
        .option("n", n).option("k", 32).option("mult", mult).load()
      val a = t(8000L, 2654435761L)
      val b = t(4000L, 40503L).withColumnRenamed("v", "w")
      a.join(b, "key")
        .groupBy(col("key"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("v") + col("w")).as("checksum"))
        .orderBy(col("key"))
    }),

    // -- DSv2 runtime filtering / dynamic partition pruning (r16) ----------
    // The fact side is the key-grouped KeyedGenSource; the dim side's
    // selective filter (dkey % 13 = 3) is only known at runtime. Spark
    // broadcasts the dim, hands the observed key set to the scan through
    // SupportsRuntimeV2Filtering, and the scan drops 29 of its 32
    // key-group splits BEFORE reading them (Round16Spec pins the survivor
    // set). At 100 TB this is DPP for DSv2 fact tables: the scan reads
    // the dimension-selected partitions only.
    "q_runtime_filter_join" -> ((s, _) => {
      val fact = s.read
        .format(classOf[graft.sources.KeyedGenSource].getName)
        .option("n", 8000L).option("k", 32).option("mult", 2654435761L)
        .load()
      val dim = s.range(0, 1000).select(col("id").as("dkey"))
        .filter(col("dkey") % 13 === 3)
      fact.join(dim, col("key") === col("dkey"))
        .groupBy(col("key"))
        .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("checksum"))
        .orderBy(col("key"))
    })
  )

  /** Salt fan-out for q_skew_join — one hot key spreads over this many
    * reducers. 16 at local[32]; at 1000 executors you size it to the
    * hot key's row count / target partition size. */
  private val skewSalts = 16

  def declaredOracle: Seq[(String, String)] = Seq(
    "q_bloom_join" ->
      """SELECT l_returnflag, count(*) AS n,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q3_join" ->
      """SELECT l_orderkey, o_orderdate,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1997-01-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey ASC
        |LIMIT 20""".stripMargin,

    "q5_join" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,

    // conditional-sum share in one pass; same 1e-6 floor-quantized divide
    "q8_market_share" ->
      """WITH v AS (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |    l_extendedprice * (1.0 - l_discount) AS vol,
        |    n2.n_name AS supp_nation
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region ON n1.n_regionkey = r_regionkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate < TIMESTAMP '1998-01-01'
        |    AND p_type = 'STANDARD' AND r_name = 'AMERICA')
        |SELECT o_year,
        |  round(sum(CASE WHEN supp_nation = 'NATION_5' THEN vol
        |    ELSE 0.0 END), 2) AS nation_volume,
        |  round(sum(vol), 2) AS total_volume,
        |  floor(round(sum(CASE WHEN supp_nation = 'NATION_5' THEN vol
        |      ELSE 0.0 END), 2)
        |    / round(sum(vol), 2) * 1e6 + 0.5e0) / 1e6 AS mkt_share
        |FROM v GROUP BY o_year ORDER BY o_year""".stripMargin,

    "q_broadcast_join" ->
      """SELECT r_name, round(sum(o_totalprice), 2) AS sum_price,
        |       count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "q_left_outer" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        |       round(coalesce(sum(o_totalprice), 0.0), 2) AS spend
        |FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "q_right_outer" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        |       max(o_orderpriority) AS max_prio
        |FROM orders RIGHT OUTER JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "q_full_outer" ->
      """SELECT coalesce(a.k, b.k2) AS custkey, a.c_acctbal,
        |       coalesce(b.n_open, 0) AS n_open
        |FROM (SELECT c_custkey AS k, c_acctbal FROM customer
        |      WHERE c_acctbal > 7500) a
        |FULL OUTER JOIN (SELECT o_custkey AS k2, count(*) AS n_open
        |                 FROM orders WHERE o_orderstatus = 'O'
        |                 GROUP BY o_custkey) b
        |ON a.k = b.k2
        |ORDER BY custkey ASC NULLS LAST""".stripMargin,

    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_cross_join" ->
      """SELECT r_name, o_orderstatus
        |FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) st
        |ORDER BY r_name, o_orderstatus""".stripMargin,

    "q_theta_join" ->
      """SELECT o_orderstatus, count(*) AS n_late,
        |       round(sum(l_extendedprice), 2) AS late_value
        |FROM lineitem JOIN orders
        |  ON l_orderkey = o_orderkey
        | AND l_shipdate > o_orderdate + INTERVAL 100 DAY
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_range_join" ->
      """SELECT band, count(*) AS n, round(sum(value), 2) AS sum_v
        |FROM events
        |JOIN (VALUES ('b0', 0.0, 100.0), ('b1', 100.0, 150.0),
        |             ('b2', 150.0, 175.0), ('b3', 175.0, 1e9))
        |     bands(band, lo, hi)
        |  ON value >= lo AND value < hi
        |GROUP BY band ORDER BY band""".stripMargin,

    "q_self_join" ->
      """SELECT s1.s_nationkey, s1.s_suppkey AS k1, s2.s_suppkey AS k2
        |FROM supplier s1 JOIN supplier s2
        |  ON s1.s_nationkey = s2.s_nationkey
        | AND s1.s_suppkey < s2.s_suppkey
        |ORDER BY s1.s_nationkey, k1, k2""".stripMargin,

    // salting is invisible to the result: the oracle is the PLAIN join
    "q_skew_join" ->
      """SELECT l_returnflag AS flag, v.flag_desc, count(*) AS n,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN (VALUES ('A', 'returned'), ('N', 'active'),
        |  ('R', 'refunded')) AS v(flag, flag_desc)
        |  ON v.flag = lineitem.l_returnflag
        |GROUP BY 1, 2 ORDER BY flag""".stripMargin,

    "q_skew_audit" ->
      """WITH pk AS (SELECT l_suppkey, count(*) AS n
        |  FROM lineitem GROUP BY 1),
        |st AS (SELECT count(*) AS n_keys, CAST(sum(n) AS BIGINT) AS total,
        |    CAST(max(n) AS BIGINT) AS max_n FROM pk),
        |top AS (SELECT l_suppkey, n, row_number() OVER (
        |    ORDER BY n DESC, l_suppkey) AS rank FROM pk)
        |SELECT rank, l_suppkey, n,
        |  round(CAST(n AS DOUBLE) / total, 6) AS share,
        |  n_keys,
        |  round(CAST(max_n AS DOUBLE) * n_keys / total, 6) AS skew_factor
        |FROM top CROSS JOIN st WHERE rank <= 5 ORDER BY rank""".stripMargin,

    // IS NOT DISTINCT FROM is DuckDB's spelling of Spark's <=>
    "q_nullsafe_join" ->
      """SELECT CAST(COALESCE(c.ck, -1) AS BIGINT) AS nk,
        |  count(*) AS n_pairs
        |FROM (SELECT nullif(c_nationkey, 0) AS ck FROM customer) c
        |JOIN (SELECT nullif(s_nationkey, 0) AS sk FROM supplier) s
        |  ON c.ck IS NOT DISTINCT FROM s.sk
        |GROUP BY 1 ORDER BY nk""".stripMargin,

    // exact integer cents before the group sum (order-free)
    "q7_volume" ->
      """WITH rev AS (SELECT n1.n_name AS supp_nation,
        |    n2.n_name AS cust_nation,
        |    CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
        |    CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 100.0
        |      + 0.5) AS BIGINT) AS rc
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        |  WHERE n1.n_name IN ('NATION_1', 'NATION_2', 'NATION_3',
        |      'NATION_4')
        |    AND n2.n_name IN ('NATION_1', 'NATION_2', 'NATION_3',
        |      'NATION_4')
        |    AND n1.n_name <> n2.n_name)
        |SELECT supp_nation, cust_nation, l_year, count(*) AS n_items,
        |  CAST(sum(rc) AS BIGINT) AS rev_cents
        |FROM rev GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    // fact filter ahead of the spine; (rev desc, custkey) total order
    "q10_returns" ->
      """SELECT c.c_custkey, c.c_name, n.n_name,
        |  CAST(sum(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount)
        |    * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE l.l_returnflag = 'R'
        |GROUP BY 1, 2, 3
        |ORDER BY rev_cents DESC, c_custkey LIMIT 20""".stripMargin,

    // HAVING aggregate on lineitem alone; only survivors join the spine
    "q18_big_orders" ->
      """WITH big AS (SELECT l_orderkey,
        |    CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT)
        |      AS total_qty
        |  FROM lineitem GROUP BY 1 HAVING total_qty > 250)
        |SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
        |  round(o.o_totalprice, 2) AS o_totalprice, b.total_qty
        |FROM orders o
        |JOIN big b ON o.o_orderkey = b.l_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    // exact cents + integer micro-ratio
    "q14_promo" ->
      """WITH j AS (SELECT p_type,
        |    CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0
        |      + 0.5) AS BIGINT) AS cents
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-03-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'),
        |m AS (SELECT
        |    CAST(sum(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END)
        |      AS BIGINT) AS promo_cents,
        |    CAST(sum(cents) AS BIGINT) AS total_cents
        |  FROM j)
        |SELECT promo_cents, total_cents,
        |  CAST((promo_cents * 1000000) // total_cents AS DOUBLE) / 1e4
        |    AS promo_pct
        |FROM m""".stripMargin,

    // per-part moments first; exact cross-multiplied threshold
    "q17_small_qty" ->
      """WITH li AS (SELECT l_partkey, l_quantity, l_extendedprice,
        |    CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) AS qc
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#13'),
        |a AS (SELECT l_partkey AS pk, count(*) AS n_l,
        |    CAST(sum(qc) AS BIGINT) AS sqc
        |  FROM li GROUP BY 1)
        |SELECT count(*) AS n_small,
        |  CAST(CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5)
        |    AS BIGINT)) AS BIGINT) // 7 AS DOUBLE) / 100.0 AS avg_yearly
        |FROM li JOIN a ON li.l_partkey = a.pk
        |WHERE qc * 5 * n_l < sqc""".stripMargin,

    // the disjunction stays a residual over one equi-join
    "q19_brackets" ->
      """SELECT count(*) AS n_lines,
        |  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
        |    * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 1.0 AND 15.0)
        |   OR (p_brand = 'Brand#20' AND p_size BETWEEN 5 AND 20
        |       AND l_quantity BETWEEN 10.0 AND 25.0)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 30
        |       AND l_quantity BETWEEN 20.0 AND 35.0)""".stripMargin,

    // exact cross-multiplied balance threshold; NOT EXISTS anti join
    "q22_idle_customers" ->
      """WITH t AS (SELECT
        |    CAST(sum(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT))
        |      AS BIGINT) AS sc,
        |    count(*) AS nc
        |  FROM customer WHERE c_acctbal > 0.0),
        |f AS (SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS nationkey,
        |    CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS bc
        |  FROM customer CROSS JOIN t
        |  WHERE CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) * nc > sc
        |    AND NOT EXISTS (SELECT 1 FROM orders
        |                    WHERE o_custkey = c_custkey
        |                      AND o_orderpriority = '1-URGENT'))
        |SELECT nationkey, count(*) AS n_cust,
        |  CAST(sum(bc) AS DOUBLE) / 100.0 AS total_bal
        |FROM f GROUP BY 1 ORDER BY nationkey""".stripMargin,

    // plain inequality join replay of the custom physical operator
    "q_range_join_native" ->
      """WITH brackets AS (
        |  SELECT CAST(i AS BIGINT) AS bracket_id,
        |         i * 4000.0 AS lo, i * 4000.0 + 10000.0 AS hi
        |  FROM range(0, 128) t(i))
        |SELECT b.bracket_id, b.lo, b.hi,
        |  count(*) AS n_orders,
        |  count(DISTINCT o.o_custkey) AS n_custs
        |FROM brackets b
        |JOIN orders o ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
        |GROUP BY 1, 2, 3
        |ORDER BY bracket_id""".stripMargin,

    // both generated sides replayed from range(): row i -> (i % 32,
    // (i * mult) % 1000003)
    "q_spj_join" ->
      """WITH a AS (SELECT i % 32 AS key, (i * 2654435761) % 1000003 AS v
        |  FROM range(0, 8000) t(i)),
        |b AS (SELECT i % 32 AS key, (i * 40503) % 1000003 AS w
        |  FROM range(0, 4000) t(i))
        |SELECT a.key AS key, count(*) AS n_pairs,
        |  CAST(sum(a.v + b.w) AS BIGINT) AS checksum
        |FROM a JOIN b ON a.key = b.key
        |GROUP BY a.key ORDER BY a.key""".stripMargin,

    // generator + range-derived dim replayed literally
    "q_runtime_filter_join" ->
      """WITH f AS (SELECT i % 32 AS key, (i * 2654435761) % 1000003 AS v
        |  FROM range(0, 8000) t(i)),
        |d AS (SELECT i AS dkey FROM range(0, 1000) t(i) WHERE i % 13 = 3)
        |SELECT f.key AS key, count(*) AS n_rows,
        |  CAST(sum(f.v) AS BIGINT) AS checksum
        |FROM f JOIN d ON f.key = d.dkey
        |GROUP BY f.key ORDER BY f.key""".stripMargin
  )
}
