package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.{QueryPack, Tables}

/** Window functions: ranking, analytic (lag/lead/first/last), aggregates
  * over row and range frames, top-k per group. SURVEY.md §2.2 "Window
  * functions".
  *
  * Scale notes: every window here partitions by a high-cardinality key
  * (custkey / user_id / brand), so state per partition stays small and the
  * sort inside each partition is local — this is the shape that survives a
  * 100× scale-up. No global (unpartitioned) windows over fact tables.
  */
object WindowQueries extends QueryPack {

  def declared: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    // -- ranking family ----------------------------------------------------
    "q_window_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .withColumn("rnk", rank().over(w))
        .withColumn("drnk", dense_rank().over(w))
        .withColumn("quartile", ntile(4).over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          col("rn").cast("bigint").as("rn"), col("rnk").cast("bigint").as("rnk"),
          col("drnk").cast("bigint").as("drnk"),
          col("quartile").cast("bigint").as("quartile"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // -- lag / lead --------------------------------------------------------
    "q_window_lag" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
        .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
        .withColumn("days_since_prev",
          datediff(col("o_orderdate").cast("date"),
            col("prev_date").cast("date")))
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("days_since_prev"), col("next_price"))
        .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
    }),

    // -- running aggregate + moving average over row frames ----------------
    "q_window_running" -> ((s, d) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us").asc, col("event_id").asc)
      Tables.eventsWithTime(s, d)
        .withColumn("running_sum",
          round(sum(col("value")).over(
            byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2))
        .withColumn("moving_avg",
          round(avg(col("value")).over(byUser.rowsBetween(-3, 0)), 6))
        .select(col("user_id"), col("event_id"), col("ts_us"),
          col("running_sum"), col("moving_avg"))
        .orderBy(col("user_id"), col("ts_us"), col("event_id"))
    }),

    // -- value-range frame -------------------------------------------------
    // Partitioned by o_custkey (high-cardinality), NOT o_orderstatus (3
    // values): a 3-partition window caps parallelism at 3 tasks and at
    // 100× puts tens of millions of rows behind one sort.
    "q_window_range" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice"))
        .rangeBetween(-10000, 0)
      Tables.orders(s, d)
        .withColumn("n_within_10k", count(lit(1)).over(w))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("n_within_10k"))
        .orderBy(col("o_orderkey"))
    }),

    // -- first/last over full-partition frame ------------------------------
    "q_window_first_last" -> ((s, d) => {
      // l_linenumber is NOT unique within an order in this corpus —
      // l_partkey tie-break keeps first/last deterministic cross-engine.
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber"), col("l_partkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.lineitem(s, d)
        .withColumn("first_part", first(col("l_partkey")).over(w))
        .withColumn("last_part", last(col("l_partkey")).over(w))
        .filter(col("l_linenumber") === 1)
        .select(col("l_orderkey"), col("first_part"), col("last_part"))
        .orderBy(col("l_orderkey"))
    }),

    // -- top-k per group ---------------------------------------------------
    "q_topk_per_group" -> ((s, d) => {
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
      Tables.part(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .select(col("p_brand"), col("rn").cast("bigint").as("rn"),
          col("p_partkey"), col("p_retailprice"))
        .orderBy(col("p_brand"), col("rn"))
    }),

    // -- distribution-rank window functions --------------------------------
    // percent_rank/cume_dist/nth_value over a deterministic total order
    // (price ties broken by key). The ratios are single double divisions
    // of identical integers on both engines, but (rank-1)/(n-1) can land
    // on exact decimal boundaries -- floor(x*1e6+0.5)/1e6, not round().
    "q_window_dist" -> ((s, d) => {
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(col("p_retailprice").asc, col("p_partkey").asc)
      def r6(c: org.apache.spark.sql.Column) =
        floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
      Tables.part(s, d)
        .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
          r6(percent_rank().over(w)).as("pct_rank"),
          r6(cume_dist().over(w)).as("cdist"),
          nth_value(col("p_partkey"), 2).over(w).as("second_key"))
        .orderBy(col("p_brand"), col("p_partkey"))
    })
  )

  def declaredOracle: Seq[(String, String)] = Seq(
    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn, rnk, drnk, quartile
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER w AS rn, rank() OVER w AS rnk,
        |  dense_rank() OVER w AS drnk, ntile(4) OVER w AS quartile
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey
        |               ORDER BY o_totalprice DESC, o_orderkey ASC)) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q_window_lag" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  datediff('day', CAST(prev_date AS DATE),
        |           CAST(o_orderdate AS DATE)) AS days_since_prev,
        |  next_price
        |FROM (SELECT o_custkey, o_orderkey, o_orderdate,
        |  lag(o_orderdate, 1) OVER w AS prev_date,
        |  lead(o_totalprice, 1) OVER w AS next_price
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey
        |               ORDER BY o_orderdate ASC, o_orderkey ASC)) t
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,

    "q_window_running" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |  round(sum(value) OVER (PARTITION BY user_id
        |    ORDER BY epoch_us(ts) ASC, event_id ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
        |    AS running_sum,
        |  round(avg(value) OVER (PARTITION BY user_id
        |    ORDER BY epoch_us(ts) ASC, event_id ASC
        |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6) AS moving_avg
        |FROM events
        |ORDER BY user_id, ts_us, event_id""".stripMargin,

    "q_window_range" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
        |    RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS n_within_10k
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_window_first_last" ->
      """SELECT l_orderkey, first_part, last_part
        |FROM (SELECT l_orderkey, l_linenumber,
        |  first_value(l_partkey) OVER w AS first_part,
        |  last_value(l_partkey) OVER w AS last_part
        |  FROM lineitem
        |  WINDOW w AS (PARTITION BY l_orderkey
        |    ORDER BY l_linenumber, l_partkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)) t
        |WHERE l_linenumber = 1 ORDER BY l_orderkey""".stripMargin,

    "q_topk_per_group" ->
      """SELECT p_brand, rn, p_partkey, p_retailprice
        |FROM (SELECT p_brand, p_partkey, p_retailprice,
        |  row_number() OVER (PARTITION BY p_brand
        |    ORDER BY p_retailprice DESC, p_partkey ASC) AS rn
        |  FROM part) t
        |WHERE rn <= 2 ORDER BY p_brand, rn""".stripMargin,

    // floor-rounding, not round(): see the query comment
    "q_window_dist" ->
      """SELECT p_brand, p_partkey, p_retailprice,
        |  floor(percent_rank() OVER w * 1000000.0 + 0.5) / 1000000.0
        |    AS pct_rank,
        |  floor(cume_dist() OVER w * 1000000.0 + 0.5) / 1000000.0
        |    AS cdist,
        |  nth_value(p_partkey, 2) OVER (PARTITION BY p_brand
        |    ORDER BY p_retailprice ASC, p_partkey ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS second_key
        |FROM part
        |WINDOW w AS (PARTITION BY p_brand
        |  ORDER BY p_retailprice ASC, p_partkey ASC)
        |ORDER BY p_brand, p_partkey""".stripMargin
  )
}
