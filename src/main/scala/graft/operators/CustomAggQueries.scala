package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{QueryPack, Tables}
import graft.functions.GeoMean

/** Custom typed-API surface (SURVEY.md §2.2): a geometric-mean
  * `Aggregator` registered via `udaf(...)`, oracle'd against the algebraic
  * identity exp(avg(ln(x))) in DuckDB, plus the typed
  * `KeyValueGroupedDataset` escape hatch (`cogroup`).
  */
object CustomAggQueries extends QueryPack {

  def declared: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q_udaf_geomean" -> ((s, d) => {
      val geomean = udaf(GeoMean)
      Tables.lineitem(s, d)
        .withColumn("markup", lit(1.0) + col("l_tax"))
        .groupBy(col("l_returnflag"))
        .agg(round(geomean(col("markup")), 6).as("geo_markup"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }),

    // -- typed cogroup (KeyValueGroupedDataset) -----------------------------
    // The per-key two-sided escape hatch: both inputs shuffle ONCE to a
    // co-partitioned layout and the lambda sees (key, Iterator[left],
    // Iterator[right]) — no materialized join product, so a key with n
    // orders and m lines costs n+m, not n·m. The price (same as
    // mapGroups) is that the lambda is opaque to Catalyst: no partial
    // aggregation, no codegen — which is why this is reserved for logic
    // a join+agg can't express and the aggregate twins in this corpus
    // stay declarative. Per-item cents are quantized to BIGINT before
    // the in-lambda sum so iterator order (not guaranteed) cannot
    // perturb a double accumulation.
    "q_cogroup" -> ((s, d) => {
      import s.implicits._
      val orders = Tables.orders(s, d)
        .filter(col("o_orderkey") < 2000)
        .select(col("o_orderkey"), col("o_totalprice"))
        .as[(Long, Double)]
      val lines = Tables.lineitem(s, d)
        .filter(col("l_orderkey") < 2000)
        .select(col("l_orderkey"), col("l_extendedprice"))
        .as[(Long, Double)]
      orders.groupByKey(_._1).cogroup(lines.groupByKey(_._1)) {
        (key, os, ls) =>
          var nOrders = 0L; var orderCents = 0L
          os.foreach { o =>
            nOrders += 1; orderCents += math.floor(o._2 * 100 + 0.5).toLong
          }
          var nLines = 0L; var lineCents = 0L
          ls.foreach { l =>
            nLines += 1; lineCents += math.floor(l._2 * 100 + 0.5).toLong
          }
          Iterator((key, nOrders, nLines, orderCents, lineCents))
      }.toDF("orderkey", "n_orders", "n_lines", "order_cents", "line_cents")
        .orderBy(col("orderkey"))
    }),

    // -- native TypedImperativeAggregate (r16) ------------------------------
    // Exact per-nation top-5 balances through `graft_topk`, a bounded
    // min-heap TypedImperativeAggregate (NativeAggregates.scala) — the
    // third and lowest rung of the UDAF ladder next to the typed
    // `Aggregator` (q_udaf_geomean) and plain declarative aggs. The
    // point at 100 TB: the window formulation (`row_number() <= 5`)
    // shuffles and sorts EVERY row; this plan runs ObjectHashAggregate
    // with a PARTIAL phase, so each map task reduces its slice to an
    // O(k) buffer and the exchange carries only groups × k longs
    // (Round16Spec pins the partial_graft_topk ObjectHashAggregate
    // plan). Values-only output keeps ties multiset-exact → hashable.
    "q_native_topk" -> ((s, d) => {
      Tables.customer(s, d)
        .select(col("c_nationkey"),
          floor(col("c_acctbal") * 100.0 + lit(0.5)).cast("long")
            .as("bal_cents"))
        .groupBy(col("c_nationkey"))
        .agg(expr("graft_topk(bal_cents, 5)").as("top5"))
        .select(col("c_nationkey"),
          posexplode(col("top5")).as(Seq("pos", "bal_cents")))
        .select(col("c_nationkey"),
          (col("pos") + 1).cast("long").as("rnk"), col("bal_cents"))
        .orderBy(col("c_nationkey"), col("rnk"))
    })
  )

  def declaredOracle: Seq[(String, String)] = Seq(
    "q_udaf_geomean" ->
      """SELECT l_returnflag,
        |  round(exp(avg(ln(1.0 + l_tax))), 6) AS geo_markup,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    // cogroup == full outer join of the two per-key aggregates
    "q_cogroup" ->
      """WITH o AS (SELECT o_orderkey AS k, count(*) AS n_orders,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS order_cents
        |  FROM orders WHERE o_orderkey < 2000 GROUP BY o_orderkey),
        |l AS (SELECT l_orderkey AS k, count(*) AS n_lines,
        |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS line_cents
        |  FROM lineitem WHERE l_orderkey < 2000 GROUP BY l_orderkey)
        |SELECT coalesce(o.k, l.k) AS orderkey,
        |  coalesce(o.n_orders, 0) AS n_orders,
        |  coalesce(l.n_lines, 0) AS n_lines,
        |  coalesce(o.order_cents, 0) AS order_cents,
        |  coalesce(l.line_cents, 0) AS line_cents
        |FROM o FULL OUTER JOIN l ON o.k = l.k
        |ORDER BY orderkey""".stripMargin,

    // the heap's values-only top-k == the window top-k multiset (which
    // equal-valued ROW survived a tie is unobservable in either engine)
    "q_native_topk" ->
      """SELECT c_nationkey, CAST(rnk AS BIGINT) AS rnk, bal_cents
        |FROM (
        |  SELECT c_nationkey, bal_cents,
        |    row_number() OVER (PARTITION BY c_nationkey
        |                       ORDER BY bal_cents DESC) AS rnk
        |  FROM (SELECT c_nationkey,
        |      CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS bal_cents
        |    FROM customer))
        |WHERE rnk <= 5
        |ORDER BY c_nationkey, rnk""".stripMargin
  )
}
