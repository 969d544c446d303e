package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.{Dist, Pins, QueryPack, Tables}
import graft.engine.Pins.PinOps

/** Statistical and behavioral analytics over the star schema + events —
  * second-moment aggregates, event funnels, cohort retention, and
  * exponential smoothing. SURVEY.md §2.2 "Aggregations" / "Window
  * functions" extensions a warehouse user expects day-one.
  *
  * Scale notes (100 TB):
  *  - Every query is a keyed groupBy/window on a natural key (returnflag,
  *    user_id) — partial aggregation is map-side, shuffles carry only
  *    group state (co-moment tuples, per-user minima), never raw rows.
  *  - The second-moment aggregates (corr/covar/var/regr) merge
  *    commutative co-moment sketches, so they parallelize to any
  *    partition count with one shuffle — the same shape DuckDB/Spark use
  *    internally; rounding in both engines absorbs merge-order float
  *    noise (QueryPack contract).
  *  - The funnel computes per-stage minima with successive keyed
  *    semi-computations instead of per-user event sorting: three
  *    hash-aggregates + keyed joins on user_id, each reusing the same
  *    hash partitioning (AQE coalesces the exchanges), no
  *    collect_list-style buffering of a user's full history.
  *  - EWMA uses a FIXED 16-term lag window (Horner form) instead of an
  *    unbounded recursive state: per-row cost is constant, the window
  *    frame is bounded, and Spark's WindowExec needs only a 16-row
  *    buffer per partition — a recursive formulation (a^n blowup or
  *    mapGroups over full user history) would either overflow doubles
  *    or buffer whole groups.
  */
object AnalyticsQueries extends QueryPack {

  /** EWMA decay: each older event contributes a^k. 16 taps ≈ 0.85^16 =
    * 7% residual mass — the standard truncated-kernel tradeoff. */
  private val ewmaAlpha = "0.85"
  private val ewmaTaps = 16

  /** Horner-form truncated EWMA built IDENTICALLY on both engines (the
    * Spark Column and the oracle SQL come from the same recursion shape,
    * so double arithmetic runs in the same order bit-for-bit):
    * v + a*(lag1 + a*(lag2 + ... + a*lag15)). */
  private def ewmaColumn(w: org.apache.spark.sql.expressions.WindowSpec): Column = {
    val a = ewmaAlpha.toDouble
    val inner = coalesce(lag(col("value"), ewmaTaps - 1).over(w), lit(0.0))
    val tail = (ewmaTaps - 2 to 1 by -1).foldLeft(inner) { (acc, k) =>
      coalesce(lag(col("value"), k).over(w), lit(0.0)) + lit(a) * acc
    }
    col("value") + lit(a) * tail
  }

  private def ewmaSql: String = {
    val inner = s"coalesce(lag(value, ${ewmaTaps - 1}) OVER w, 0)"
    val tail = (ewmaTaps - 2 to 1 by -1).foldLeft(inner) { (acc, k) =>
      s"coalesce(lag(value, $k) OVER w, 0) + $ewmaAlpha * ($acc)"
    }
    s"value + $ewmaAlpha * ($tail)"
  }

  def declared: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    // -- second-moment statistics: corr / covariance / variance / OLS ------
    // One hash aggregate; every statistic merges an (n, Σx, Σy, Σxy, Σx²)
    // co-moment tuple, so the shuffle carries 5 doubles per group per
    // partition regardless of data size.
    "q_stats_moments" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          round(corr(col("l_extendedprice"), col("l_quantity")), 6)
            .as("corr_pq"),
          round(covar_samp(col("l_extendedprice"), col("l_quantity")), 4)
            .as("cov_pq"),
          round(stddev_samp(col("l_discount")), 6).as("sd_disc"),
          round(var_samp(col("l_quantity")), 6).as("var_qty"),
          round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4)
            .as("slope"),
          round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 4)
            .as("icept"))
        .orderBy(col("l_returnflag"))
    }),

    // -- ordered event funnel: view → click → purchase ----------------------
    // Stage k's earliest qualifying timestamp must FOLLOW stage k-1's (a
    // strict funnel, not three independent minima). Carry-along shape:
    // each stage LEFT-joins the next event type onto the accumulated
    // per-user frame and re-aggregates keyed by (user, earlier stages),
    // so every stage subplan is referenced exactly ONCE — the naive
    // "derive three frames, join them at the end" formulation makes
    // Catalyst plan the view/click aggregates 2-3 times each (a
    // DataFrame DAG lowers to a plan TREE; shared lineage is recomputed,
    // and at 100 TB those are redundant full scans). Per-user state is
    // one timestamp per stage; no user's history is ever buffered.
    "q_funnel" -> ((s, d) => {
      val e = Tables.eventsWithTime(s, d)
        .select(col("user_id"), col("event_type"), col("ts_us"))
      def stage(t: String, as: String) = e
        .filter(col("event_type") === t)
        .select(col("user_id"), col("ts_us").as(as))
      val view = stage("view", "v_ts")
        .groupBy(col("user_id")).agg(min(col("v_ts")).as("view_us"))
      // conditional min, no pre-filter: the left join always keeps every
      // user (a filter on c_ts would drop users whose clicks all precede
      // the view), and `when` without otherwise nulls the non-qualifying
      // rows so min() ignores them
      val click = view
        .join(stage("click", "c_ts"), Seq("user_id"), "left")
        .groupBy(col("user_id"), col("view_us"))
        .agg(min(when(col("c_ts") > col("view_us"), col("c_ts")))
          .as("click_us"))
      click
        .join(stage("purchase", "b_ts"), Seq("user_id"), "left")
        .groupBy(col("user_id"), col("view_us"), col("click_us"))
        .agg(min(when(col("b_ts") > col("click_us"), col("b_ts")))
          .as("buy_us"))
        .withColumn("stage",
          when(col("buy_us").isNotNull, 3)
            .when(col("click_us").isNotNull, 2).otherwise(1))
        .select(col("user_id"), col("view_us"), col("click_us"),
          col("buy_us"), col("stage"))
        .orderBy(col("user_id"))
    }),

    // -- funnel latency: time-to-convert histogram ---------------------------
    // The question after q_funnel's "how many convert" is "how FAST":
    // per user, first view → first purchase strictly after it (the same
    // carry-along conditional-min shape as q_funnel, so the view frame
    // plans once), bucketed into a day-grain latency histogram with
    // exact second bounds per bucket. All arithmetic integer (µs → s →
    // day via div); the histogram frame is bounded by the corpus time
    // span, the data-sized work is two keyed aggregates.
    "q_time_to_convert" -> ((s, d) => {
      val e = Tables.eventsWithTime(s, d)
        .select(col("user_id"), col("event_type"), col("ts_us"))
      val v = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts_us")).as("v_us"))
      v.join(e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts_us").as("p_ts")),
          Seq("user_id"), "left")
        .groupBy(col("user_id"), col("v_us"))
        .agg(min(when(col("p_ts") > col("v_us"), col("p_ts"))).as("p_us"))
        .filter(col("p_us").isNotNull)
        .withColumn("delta_s", expr("(p_us - v_us) div 1000000"))
        .groupBy(expr("delta_s div 86400").as("day_bucket"))
        .agg(count(lit(1)).as("n_users"),
          min(col("delta_s")).as("min_s"), max(col("delta_s")).as("max_s"))
        .orderBy(col("day_bucket"))
    }),

    // -- price elasticity of demand (ln-ln regression) ------------------------
    // The econometric readout on the order book: regress ln(quantity) on
    // ln(effective price ratio 1−discount) across lines — the slope IS
    // the discount elasticity of demand. Per-row logs floor-quantize to
    // integer micros (the floor-ln idiom: both engines ln the IDENTICAL
    // double, ≤1 ulp, quantized before any accumulation), moments are
    // exact DECIMAL/HUGEINT, and the OLS slope evaluates in ONE mirrored
    // double expression. Zero-discount lines keep xq = 0 — they belong
    // in the regression; a zero-variance price column NULLs the slope
    // explicitly. One scan, one 1-row reduce.
    "q_elasticity" -> ((s, d) => {
      val dec = (c: Column) => c.cast("decimal(38,0)")
      val li = Tables.lineitem(s, d)
        .filter(col("l_quantity") > 0.0)
        .select(
          floor(log(lit(1.0) - col("l_discount")) * lit(1e6) + lit(0.5))
            .cast("long").as("xq"),
          floor(log(col("l_quantity")) * lit(1e6) + lit(0.5))
            .cast("long").as("yq"))
      val m = li.agg(count(lit(1)).as("n"), sum(dec(col("xq"))).as("sx"),
        sum(dec(col("yq"))).as("sy"),
        sum(dec(col("xq")) * dec(col("xq"))).as("sxx"),
        sum(dec(col("xq")) * dec(col("yq"))).as("sxy"))
      val nD = col("n").cast("double")
      val sxD = col("sx").cast("double"); val syD = col("sy").cast("double")
      val den = nD * col("sxx").cast("double") - sxD * sxD
      def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
      m.select(col("n"),
        q6(sxD / nD / lit(1e6)).as("mean_ln_price"),
        q6(syD / nD / lit(1e6)).as("mean_ln_qty"),
        when(den =!= 0.0,
          q6((nD * col("sxy").cast("double") - sxD * syD) / den))
          .as("elasticity"))
    }),

    // -- propensity-score caliper matching (ATT estimate) ---------------------
    // The causal-inference workhorse q_propensity_strat's stratification
    // approximates: match every TREATED user (≥1 purchase) to its
    // nearest CONTROL by score (micro mean event value) within a ±0.1
    // caliper, with replacement, nearest-then-smallest-id tie rule —
    // fully deterministic. Scale shape: candidates come from a BUCKET
    // equi-join (score div caliper; treated probes its bucket ±1, each
    // control lives in exactly one, so no pair dedup) — never an
    // all-pairs score join; the argmin is one struct-min per treated.
    // ATT = mean matched outcome gap (events per user), exact integer
    // sum with a final mirrored division (sum may be negative, so NO
    // integer div — trunc/floor diverge below zero).
    "q_psm_match" -> ((s, d) => {
      val u = Tables.events(s, d).groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(floor(col("value") * lit(1000.0) + lit(0.5)).cast("long"))
            .as("sv"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("treated"))
        .withColumn("score", expr("(sv * 1000) div n_events"))
      val t = u.filter(col("treated") === 1L)
        .select(col("user_id").as("tid"), col("score").as("ts"),
          col("n_events").as("ty"))
        .withColumn("b", explode(array(expr("ts div 100000 - 1"),
          expr("ts div 100000"), expr("ts div 100000 + 1"))))
      val c = u.filter(col("treated") === 0L)
        .select(col("user_id").as("cid"), col("score").as("cs"),
          col("n_events").as("cy"))
        .withColumn("b", expr("cs div 100000"))
      val best = t.join(c, "b")
        .filter(abs(col("ts") - col("cs")) <= lit(100000L))
        .groupBy(col("tid"), col("ty"))
        .agg(min(struct(abs(col("ts") - col("cs")).as("dist"),
          col("cid"), col("cy"))).as("m"))
      val nT = u.filter(col("treated") === 1L).groupBy()
        .agg(count(lit(1)).as("n_treated"))
      def q6(c2: Column) = floor(c2 * lit(1e6) + lit(0.5)) / lit(1e6)
      best.agg(count(lit(1)).as("n_matched"),
          sum(col("ty") - col("m.cy")).as("sdiff"))
        .crossJoin(broadcast(nT))
        .select(col("n_treated"), col("n_matched"),
          (expr("(n_matched * 1000000) div n_treated").cast("double") /
            lit(1e6)).as("match_rate"),
          q6(col("sdiff").cast("double") / col("n_matched"))
            .as("att_events"))
    }),

    // -- Shapley-value channel attribution -------------------------------------
    // The game-theoretically fair credit split q_attribution's first/
    // last-touch heuristics approximate: each user's TOUCH COALITION is
    // the set of non-purchase channels they saw (4 channels ⇒ 16
    // coalitions — a bounded frame regardless of corpus size); the
    // characteristic function v(S) is the exact integer micro conversion
    // rate of users with coalition exactly S (empty-population
    // coalitions contribute v = 0 — the standard practical convention,
    // documented, mirrored); Shapley φᵢ = Σ_{S∌i} |S|!(4−|S|−1)!
    // ·(v(S∪i) − v(S)) / 4! with the factorial weights as integer
    // literals (6,2,2,6 over 24). Data-sized work: ONE user-keyed
    // aggregate; everything after lives on the 16-row coalition frame.
    // The efficiency property Σφᵢ = v(full) − v(∅) is spec-pinned.
    "q_shapley_attribution" -> ((s, d) => {
      val u = Tables.events(s, d).groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("conv"),
          (max(when(col("event_type") === "click", 1L).otherwise(0L)) +
           max(when(col("event_type") === "error", 1L).otherwise(0L)) * 2 +
           max(when(col("event_type") === "signup", 1L).otherwise(0L)) * 4 +
           max(when(col("event_type") === "view", 1L).otherwise(0L)) * 8)
            .as("mask"))
      val byMask = u.groupBy(col("mask"))
        .agg(count(lit(1)).as("n"), sum(col("conv")).as("nc"))
      val all = s.range(0, 16).select(col("id").as("mask"))
      val vS = all.join(byMask, Seq("mask"), "left")
        .na.fill(0L, Seq("n", "nc"))
        .withColumn("v_u",
          when(col("n") > 0L, expr("(nc * 1000000) div n"))
            .otherwise(lit(0L)))
        .select(col("mask"), col("v_u"))
      val ch = s.createDataFrame(Seq(("click", 1L), ("error", 2L),
        ("signup", 4L), ("view", 8L))).toDF("channel", "bit")
      val pairs = vS.crossJoin(broadcast(ch))
        .filter(expr("mask & bit") === 0L)
        .join(vS.select(col("mask").as("mask2"), col("v_u").as("v2")),
          col("mask") + col("bit") === col("mask2"))
        .withColumn("pc", expr("bit_count(mask)"))
        .withColumn("w", when(col("pc") === 0, 6L)
          .when(col("pc") === 3, 6L).otherwise(2L))
      pairs.groupBy(col("channel"))
        .agg(sum(col("w") * (col("v2") - col("v_u"))).as("su"))
        .select(col("channel"),
          (floor(col("su").cast("double") / lit(24.0) + lit(0.5)) /
            lit(1e6)).as("shapley"))
        .orderBy(col("channel"))
    }),

    // -- UCB1 bandit arm ranking ---------------------------------------------
    // The deterministic half of the explore/exploit toolkit (Thompson
    // needs randomness; UCB1 is a pure function of the observed
    // history): per arm (event type), mean observed value plus the
    // √(2·ln N / nᵢ) exploration bonus — the arm a sequential optimizer
    // would pull next. Means are exact integer micros; the bonus is ONE
    // mirrored ln/sqrt expression on the k-row arm frame; the data-sized
    // work is a single keyed aggregate.
    "q_ucb_arms" -> ((s, d) => {
      val byArm = Tables.events(s, d)
        .select(col("event_type"),
          floor(col("value") * lit(1000.0) + lit(0.5)).cast("long")
            .as("vq"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("vq")).as("sv"))
        .withColumn("mu_u", expr("(sv * 1000) div n"))
      val tot = byArm.agg(sum(col("n")).as("nn"))
      def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
      byArm.crossJoin(broadcast(tot))
        .select(col("event_type"), col("n"),
          (col("mu_u").cast("double") / lit(1e6)).as("mean_value"),
          q6(col("mu_u").cast("double") / lit(1e6) +
            sqrt(lit(2.0) * log(col("nn").cast("double")) /
              col("n").cast("double"))).as("ucb"))
        .orderBy(col("event_type"))
    }),

    // -- join-key skew audit (the pre-shuffle ops readout) -------------------
    // The number that decides salting BEFORE a 100 TB join falls over:
    // the per-key row-count distribution of a join key (orders per
    // customer). Shape: key-counts (one keyed agg) → COUNT-OF-COUNTS
    // (bounded by the max key multiplicity, NOT the key count — a
    // billion-key table with multiplicities ≤ 1e4 reduces to ≤ 1e4
    // rows), then exact p50/p99/max and the heaviest key's row share by
    // integer cross-multiplication on that bounded frame. The quantile
    // convention is ceil-rank (smallest c with k·cum ≥ q·keys — the
    // q_outlier_mad integer contract). skew = p99/p50 as integer micros.
    "q_key_skew" -> ((s, d) => {
      val kc = Tables.orders(s, d).groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("c"))
      val cc = kc.groupBy(col("c")).agg(count(lit(1)).as("nk"))
      val w = Window.orderBy(col("c"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = cc.agg(sum(col("nk")).as("keys"),
        sum(col("c") * col("nk")).as("nrows"))
      cc.withColumn("cumk", sum(col("nk")).over(w))
        .crossJoin(broadcast(tot))
        .agg(max(col("keys")).as("n_keys"), max(col("nrows")).as("n_rows"),
          min(when(col("cumk") * 2 >= col("keys"), col("c"))).as("p50_c"),
          min(when(col("cumk") * 100 >= col("keys") * 99, col("c")))
            .as("p99_c"),
          max(col("c")).as("max_c"))
        .select(col("n_keys"), col("n_rows"), col("p50_c"), col("p99_c"),
          col("max_c"),
          (expr("(p99_c * 1000000) div p50_c").cast("double") / lit(1e6))
            .as("skew_ratio"),
          (expr("(max_c * 1000000) div n_rows").cast("double") / lit(1e6))
            .as("top_key_share"))
    }),

    // -- first/last-touch attribution ---------------------------------------
    // Which touchpoint gets credit for a conversion: per purchase, the
    // FIRST and the MOST RECENT preceding non-purchase event of the same
    // user. Both are one window pass over (user_id, time) — running
    // min-ignoreNulls for first touch, last-ignoreNulls for last touch —
    // the same one-shuffle union trick as the as-of join: no self-join,
    // no per-purchase range scan. Ties at equal ts_us are broken by
    // event_id in the frame order, making credit assignment total.
    "q_attribution" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables.eventsWithTime(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("ts_us"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val touch = when(col("event_type") =!= "purchase", col("event_type"))
      e.withColumn("first_touch", first(touch, ignoreNulls = true).over(w))
        .withColumn("last_touch", last(touch, ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          col("first_touch"), col("last_touch"))
        .orderBy(col("event_id"))
    }),

    // -- cohort retention: first-seen day × week offset ---------------------
    // The cohort dimension (per-user first day) is a keyed aggregate
    // joined back on user_id — at 100 TB both sides shuffle on the same
    // key once; countDistinct re-shuffles on the (cohort, offset) grid,
    // whose cardinality is days × weeks, not rows.
    "q_cohort_retention" -> ((s, d) => {
      val e = Tables.eventsWithTime(s, d)
        .select(col("user_id"), col("ts_t"))
      val first = e.groupBy(col("user_id"))
        .agg(min(date_trunc("day", col("ts_t"))).as("cohort_ts"))
      e.join(first, "user_id")
        .groupBy(
          date_format(col("cohort_ts"), "yyyy-MM-dd").as("cohort_day"),
          floor(datediff(date_trunc("day", col("ts_t")), col("cohort_ts"))
            / 7).as("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_active"))
        .orderBy(col("cohort_day"), col("week_offset"))
    }),

    // -- cohort LTV curve (cumulative value per user by age week) -----------
    // The monetary completion of q_cohort_retention: for each signup-week
    // cohort, cumulative value PER COHORT USER as the cohort ages — the
    // curve every acquisition-payback decision reads. Values are exact
    // milli-unit integers before any aggregation; cohort sizes come from
    // the first-seen frame; the running sum is a cohort-keyed window
    // over the calendar-bounded (cohort, age) cell frame, so nothing
    // after the two keyed aggregates grows with data.
    "q_cohort_ltv" -> ((s, d) => {
      val e = Tables.events(s, d)
        .select(col("user_id"),
          (datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
            .cast("long") * lit(1L)).as("dd"),
          floor(col("value") * lit(1000.0) + lit(0.5)).cast("long")
            .as("vq"))
        .withColumn("ww", expr("dd div 7"))
      val first = e.groupBy(col("user_id"))
        .agg(min(col("ww")).as("cohort_w"))
      val sizes = first.groupBy(col("cohort_w"))
        .agg(count(lit(1)).as("n_users"))
      val cells = e.join(first, "user_id")
        .groupBy(col("cohort_w"), (col("ww") - col("cohort_w"))
          .as("age_w"))
        .agg(sum(col("vq")).as("v"))
      val wCum = Window.partitionBy(col("cohort_w")).orderBy(col("age_w"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cells
        .withColumn("cum_v", sum(col("v")).over(wCum))
        .join(broadcast(sizes), "cohort_w")
        .select(col("cohort_w"), col("age_w"), col("n_users"),
          col("cum_v"),
          expr("cum_v div n_users").as("ltv_m"),
          ((expr("cum_v div n_users")).cast("double") / lit(1000.0))
            .as("ltv"))
        .orderBy(col("cohort_w"), col("age_w"))
    }),

    // -- exponentially weighted moving average (16-tap Horner) --------------
    // One window sort per user; constant per-row work; bounded frame.
    // Rounding is explicit floor(x*1e4 + 0.5)/1e4 on BOTH engines:
    // Spark's round() rounds the double's SHORTEST DECIMAL STRING
    // (184.0745499999... prints "184.07455" → HALF_UP 184.0746) while
    // DuckDB rounds the binary value (184.0745) — with identical input
    // doubles the explicit floor form cannot diverge.
    "q_ewma" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      Tables.eventsWithTime(s, d)
        .select(col("event_id"), col("user_id"), col("ts_us"), col("value"))
        .withColumn("ewma",
          floor(ewmaColumn(w) * lit(10000.0) + lit(0.5)) / lit(10000.0))
        .orderBy(col("user_id"), col("ts_us"), col("event_id"))
    }),

    // -- SCD Type 2: intervalize a change stream ---------------------------
    // The warehouse dimension-versioning shape: from a per-key event
    // stream, build effective-dated rows (key, state, valid_from,
    // valid_to, is_current) — one row per CHANGE, closed by the next
    // change's timestamp. Two windows over the same (user, time) sort:
    // lag() marks change points, lead() closes the interval — the
    // change-point filter preserves sort order, so the second Window
    // reuses the first's exchange AND sort (plan: one shuffle, one
    // sort, two WindowExecs stacked on it). At 100 TB state never
    // accumulates: each row's fate depends only on its sort neighbors.
    "q_scd2" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val marked = Tables.eventsWithTime(s, d)
        .select(col("user_id"), col("event_id"), col("ts_us"),
          col("event_type"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNull ||
          col("prev_type") =!= col("event_type"))
      val w2 = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      marked
        .withColumn("valid_to", lead(col("ts_us"), 1).over(w2))
        .select(col("user_id"), col("event_type").as("state"),
          col("ts_us").as("valid_from"), col("valid_to"),
          col("valid_to").isNull.as("is_current"))
        // two change points can share a timestamp (valid_from ties);
        // coalesce keeps the open interval last on both engines (they
        // disagree on NULL ordering), and state breaks the residual tie
        // when 3+ change points share one (user_id, ts_us) — otherwise
        // two rows with identical (valid_from, valid_to) sort keys but
        // different states order engine-dependently
        .orderBy(col("user_id"), col("valid_from"),
          coalesce(col("valid_to"), lit(Long.MaxValue)), col("state"))
    }),

    // -- equi-depth histogram per group (ntile bucketing) ------------------
    // Distribution profiling: 10 equal-population buckets of order value
    // WITHIN each priority class — the window partitions on the group
    // key, so the sort parallelizes and spills per group (a global
    // unpartitioned ntile would single-partition the corpus; for a
    // whole-table profile at 100 TB use approx_percentile boundaries +
    // range bucketing instead — see q_approx_percentile). Output is
    // groups × 10 rows regardless of input size.
    "q_histogram" -> ((s, d) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("bucket", ntile(10).over(w).cast("bigint"))
        .groupBy(col("o_orderpriority"), col("bucket"))
        .agg(count(lit(1)).as("n"),
          round(min(col("o_totalprice")), 2).as("lo"),
          round(max(col("o_totalprice")), 2).as("hi"),
          round(avg(col("o_totalprice")), 4).as("mean"))
        .orderBy(col("o_orderpriority"), col("bucket"))
    }),

    // -- WHOLE-TABLE equi-depth histogram without a global window ----------
    // The profile q_histogram's comment punts on: exact quantile buckets
    // over the entire table. A global ntile/row_number window would
    // single-partition the corpus at any scale; instead the global rank
    // comes from Dist.globalPrefixSum (weight 1 ⇒ rank): seeded-sample
    // boundaries, pid as a pure column, keyed offsets + running sum —
    // deterministic and invariant to physical partitioning (see Dist for
    // why the naive two-job repartitionByRange stitch is wrong).
    // bucket = ((rank-1)·B) div n is pure integer arithmetic, so the
    // oracle's single-window formulation matches bit-for-bit.
    "q_histogram_eqdepth" -> ((s, d) => {
      val b = 8
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"))
        .withColumn("one", lit(1L))
      val n = o.count()
      graft.engine.Dist.globalPrefixSum(o, "o_totalprice", asc = true,
          "o_orderkey", "one", s.sparkContext.defaultParallelism)
        .withColumn("bucket", expr(s"((cum - 1) * $b) div $n"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          round(min(col("o_totalprice")), 2).as("lo"),
          round(max(col("o_totalprice")), 2).as("hi"))
        .orderBy(col("bucket"))
    }),

    // -- Pareto-frontier (skyline) selection -------------------------------
    // The multi-objective data-selection primitive: keep exactly the
    // non-dominated points of (total value MAXIMIZED, error count
    // MINIMIZED) per user — u survives iff no v has (x_v > x_u, y_v <=
    // y_u) or (x_v >= x_u, y_v < y_u). The naive formulation is an
    // all-pairs anti-join (the oracle's NOT EXISTS — quadratic); the
    // distributed plan collapses dominance to two order statistics:
    //   m1(x)  = min y among strictly greater x  (exclusive prefix-min
    //            over x desc — Dist.globalPrefixMin, never a
    //            single-partition window)
    //   gmin(x) = min y within the same x        (a keyed group-by)
    // dominated ⟺ m1 <= y ∨ gmin < y. Both sides are exact integers
    // (milli-quantized values), so the frontier is float-free.
    "q_skyline" -> ((s, d) => {
      val a = Tables.eventsWithTime(s, d)
        .groupBy(col("user_id"))
        .agg(
          sum(floor(col("value") * lit(1000.0) + lit(0.5)).cast("long"))
            .as("xq"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L))
            .as("y"))
      val g = a.groupBy(col("xq")).agg(min(col("y")).as("gmin"))
        .withColumn("xqd", col("xq").cast("double"))
      val gm = graft.engine.Dist.globalPrefixMin(g, "xqd", asc = false,
          idCol = "xq", aggCol = "gmin",
          p = s.sparkContext.defaultParallelism, inclusive = false)
        .withColumnRenamed("cummin", "m1")
        .drop("xqd")
      a.join(gm, Seq("xq"))
        .filter(!(col("m1") <= col("y") || col("gmin") < col("y")))
        .select(col("user_id"),
          (col("xq").cast("double") / lit(1000.0)).as("total_value"),
          col("y").as("n_errors"))
        .orderBy(col("user_id"))
    }),

    // -- declarative data-quality validation (Deequ-shaped rule suite) -----
    // The warehouse QA gate a pipeline runs before publishing a table:
    // null-ness, key uniqueness, value domain, range, and referential
    // integrity, each reported as (rule, n_rows, n_violations, passed).
    // All aggregate rules for a table fold into ONE pass (a single hash
    // agg computes every violation counter side by side — adding a rule
    // adds a column, not a scan); the FK rules ride the same pass via a
    // left join ahead of the aggregate. stack() unpivots the one-row
    // aggregate into the per-rule report. At 100 TB the FK joins are the
    // only shuffles (key-on-key), and a fact⋈fact FK check (lineitem →
    // orders) shuffles both sides once — exactly the minimum the
    // constraint requires; AQE picks broadcast when the parent side is
    // dimension-sized.
    "q_validate" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val li = Tables.lineitem(s, d)
      val c = Tables.customer(s, d).select(col("c_custkey"))
      val oj = o.join(c, col("o_custkey") === col("c_custkey"), "left")
      val oa = oj.agg(
        count(lit(1)).as("n"),
        sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("v_null"),
        (count(lit(1)) - countDistinct(col("o_orderkey"))).as("v_uniq"),
        sum(when(!col("o_orderstatus").isin("F", "O", "P"), 1L)
          .otherwise(0L)).as("v_dom"),
        sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("v_pos"),
        sum(when(col("c_custkey").isNull, 1L).otherwise(0L)).as("v_fk"))
      val ok = o.select(col("o_orderkey").as("ok_key")).distinct()
      val lj = li.join(ok, col("l_orderkey") === col("ok_key"), "left")
      val la = lj.agg(
        count(lit(1)).as("n"),
        sum(when(!col("l_quantity").between(1, 50), 1L).otherwise(0L))
          .as("v_qty"),
        (count(lit(1)) -
          countDistinct(col("l_orderkey"), col("l_linenumber"))).as("v_pk"),
        sum(when(col("l_shipdate").isNull, 1L).otherwise(0L)).as("v_ship"),
        sum(when(col("ok_key").isNull, 1L).otherwise(0L)).as("v_fk"))
      val oRules = oa.selectExpr(
        """stack(5,
          |  'orders.o_custkey_not_null',      n, v_null,
          |  'orders.o_orderkey_unique',       n, v_uniq,
          |  'orders.o_orderstatus_domain',    n, v_dom,
          |  'orders.o_totalprice_positive',   n, v_pos,
          |  'orders.o_custkey_fk_customer',   n, v_fk
          |) AS (rule, n_rows, n_violations)""".stripMargin)
      val lRules = la.selectExpr(
        """stack(4,
          |  'lineitem.l_quantity_range',      n, v_qty,
          |  'lineitem.pk_unique',             n, v_pk,
          |  'lineitem.l_shipdate_not_null',   n, v_ship,
          |  'lineitem.l_orderkey_fk_orders',  n, v_fk
          |) AS (rule, n_rows, n_violations)""".stripMargin)
      oRules.union(lRules)
        .withColumn("passed", col("n_violations") === 0)
        .orderBy(col("rule"))
    }),

    // -- per-column table profiling (ANALYZE-style) ------------------------
    // The stats a catalog collects before CBO can reason about a table:
    // per column, null count and exact distinct count, in ONE aggregate
    // pass over the table (Catalyst expands the multi-countDistinct into
    // one Expand + two-phase agg — still a single scan). At 100 TB the
    // exact distinct counts become approx_count_distinct (HLL merge, no
    // expand) — same query shape, see q_approx_distinct; the profile
    // output is O(#columns) rows regardless of input size.
    "q_profile" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
      val aggs = count(lit(1)).as("n") +: cols.flatMap { c =>
        Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nul_$c"),
          countDistinct(col(c)).as(s"dis_$c"))
      }
      val stackArgs = cols
        .map(c => s"'$c', nul_$c, dis_$c").mkString(",\n          ")
      o.agg(aggs.head, aggs.tail: _*)
        .selectExpr("n", s"""stack(${cols.size},
          $stackArgs) AS (column_name, n_nulls, n_distinct)""")
        .select(col("column_name"), col("n").as("n_rows"), col("n_nulls"),
          col("n_distinct"))
        .orderBy(col("column_name"))
    }),

    // -- PageRank over the customer–supplier trade graph --------------------
    // Iterative graph centrality in FIXED-POINT arithmetic: ranks are
    // BIGINT multiples of 1e-12, every per-edge contribution is an
    // integer division, and every aggregation sums integers — exact and
    // ORDER-INDEPENDENT, so Spark's and DuckDB's nondeterministic merge
    // orders cannot diverge (a double formulation accumulates ~1e-13 of
    // order-dependent noise per iteration, which no output rounding can
    // reliably absorb across 15k nodes × 3 iterations). Scale shape per
    // iteration: one keyed join (edges ⋈ ranks on src, pre-joined with
    // degrees) + one keyed partial-agg groupBy(dst) — rank state is one
    // long per node, edges shuffle on their endpoints, nothing is
    // collected. [[prIterations]] unrolls the SAME loop into the Spark
    // DAG and the oracle CTE chain, so the engines cannot drift.
    "q_pagerank" -> ((s, d) => {
      // shared memoized edge list (see tradeEdges) — same distinct pair
      // set the per-query mining produced, built once per session
      val e0 = tradeEdgesEnc(s, d)
      val edges = e0.union(e0.select(col("dst").as("src"),
        col("src").as("dst")))
      val nodes = Tables.customer(s, d)
        .select((col("c_custkey") * 2).as("id"))
        .union(Tables.supplier(s, d)
          .select((col("s_suppkey") * 2 + 1).as("id")))
      val nTotal = nodes.agg(count(lit(1)).as("n"))
      val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      // The adjacency (edge, out-degree) is STATIC across iterations but
      // a DataFrame DAG lowers to a tree — without persist() every
      // iteration re-runs the lineitem⋈orders edge mining (measured 4.1 s
      // → 1.9 s warm at sf0.1). Persisting the static graph structure is
      // the canonical Spark shape for iterative graph algorithms
      // (GraphX/Pregel do exactly this); MEMORY_AND_DISK spills rather
      // than OOMs when the edge list outgrows executor memory.
      val adj = edges.join(deg, "src").pinned
      var pr = nodes.crossJoin(broadcast(nTotal))
        .select(col("id"), expr(s"${prScale}L div n").as("pr"), col("n"))
      // Per-iteration join strategy (guide §3.1, r16-opt): the rank
      // vector is ONE LONG PER NODE (|customer|+|supplier| rows — the
      // dimension side of the graph) while the cached adjacency is the
      // edge-sized side. Without a hint Catalyst can't estimate the
      // iterated aggregate's size and plans SortMergeJoin, re-exchanging
      // AND re-sorting the cached adjacency EVERY round
      // (plans/r16/q_pagerank_before.txt: SMJ(147)/(139) + Exchange(70)
      // over the InMemoryTableScan). Broadcasting the rank side leaves
      // the adjacency untouched in cache — each round is then one scan +
      // one keyed partial-agg shuffle of the contribution sums. Same
      // arithmetic, same integer div, bit-identical ranks. At node
      // counts past broadcast limits the production shape is an
      // adjacency pre-partitioned on src with the rank vector shuffled
      // to it (the small side still moves; the edge side still doesn't).
      for (_ <- 1 to prIters) {
        val contrib = adj
          .join(broadcast(pr.select(col("id").as("src"), col("pr"))),
            "src")
          .groupBy(col("dst")).agg(sum(expr("pr div outdeg")).as("c"))
        pr = nodes.crossJoin(broadcast(nTotal))
          .join(broadcast(contrib.withColumnRenamed("dst", "id")),
            Seq("id"), "left")
          .select(col("id"),
            (expr(s"(15 * ${prScale}L) div (100 * n)")
              + expr("(85 * coalesce(c, 0L)) div 100")).as("pr"),
            col("n"))
      }
      // The cached adjacency is NOT unpersisted inside the lambda: the
      // returned frame is lazy (consumers run it later), so an eager
      // release would drop the cache before it is ever used. The pin
      // registers it with Pins; the harness (Bench/Verify) releases it
      // after materializing — a 498-query bench JVM must not accumulate
      // every lambda's blocks (VERDICT r14 item 2).
      pr.select(col("id"),
          when(pmod(col("id"), lit(2)) === 0, lit("customer"))
            .otherwise(lit("supplier")).as("node_type"),
          col("pr").as("pr_fp"),
          (col("pr").cast("double") / lit(prScale.toDouble)).as("pr"))
        .orderBy(col("id"))
    }),

    // -- personalized PageRank (seed-teleport random walk) -------------------
    // The recommendation/similarity variant of q_pagerank: the teleport
    // mass returns to a SEED SET instead of the uniform vector, so
    // scores measure proximity to the seeds — "nodes like these" over
    // the customer–supplier graph. Identical integer fixed-point
    // discipline (1e-12 units, div-truncated identically on both
    // engines), same persisted static adjacency, 3 unrolled rounds;
    // only the teleport term differs (seeds get (15·scale) div (100·ns),
    // everyone else 0). Top-20 by fixed-point score is the read.
    "q_ppr" -> ((s, d) => {
      val e0 = tradeEdgesEnc(s, d)  // shared memoized edge list
      val edges = e0.union(e0.select(col("dst").as("src"),
        col("src").as("dst")))
      val nodes = Tables.customer(s, d)
        .select((col("c_custkey") * 2).as("id"))
        .union(Tables.supplier(s, d)
          .select((col("s_suppkey") * 2 + 1).as("id")))
      val seeds = Tables.customer(s, d)
        .filter(pmod(col("c_custkey"), lit(100)) === 0)
        .select((col("c_custkey") * 2).as("id"),
          lit(1L).as("is_seed"))
      val nSeed = seeds.agg(count(lit(1)).as("ns"))
      val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      val adj = edges.join(deg, "src").pinned
      def base = nodes.join(broadcast(seeds), Seq("id"), "left")
        .crossJoin(broadcast(nSeed))
      var pr = base.select(col("id"),
        when(col("is_seed").isNotNull, expr(s"${prScale}L div ns"))
          .otherwise(0L).as("pr"), col("ns"), col("is_seed"))
      // broadcast the rank side per round — same rationale and result
      // identity as q_pagerank's loop (guide §3.1)
      for (_ <- 1 to prIters) {
        val contrib = adj
          .join(broadcast(pr.select(col("id").as("src"), col("pr"))),
            "src")
          .groupBy(col("dst")).agg(sum(expr("pr div outdeg")).as("c"))
        pr = base
          .join(broadcast(contrib.withColumnRenamed("dst", "id")),
            Seq("id"), "left")
          .select(col("id"),
            (when(col("is_seed").isNotNull,
              expr(s"(15 * ${prScale}L) div (100 * ns)")).otherwise(0L)
              + expr("(85 * coalesce(c, 0L)) div 100")).as("pr"),
            col("ns"), col("is_seed"))
      }
      // adjacency deliberately left cached — same rationale as q_pagerank
      pr.select(col("id"),
          when(pmod(col("id"), lit(2)) === 0, lit("customer"))
            .otherwise(lit("supplier")).as("node_type"),
          coalesce(col("is_seed"), lit(0L)).as("is_seed"),
          col("pr").as("ppr_fp"),
          (col("pr").cast("double") / lit(prScale.toDouble)).as("ppr"))
        .orderBy(col("ppr_fp").desc, col("id"))
        .limit(20)
    }),

    // -- A/B test: Welch z-statistic between deterministic arms ------------
    // The experimentation readout: split users into arms by user_id
    // parity, compare mean event value per event_type. Determinism
    // discipline: per-arm moment sums (n, S=Σvq, Q=Σvq²) are EXACT
    // integers over milli-quantized values — merge-order-free — and the
    // z formula is then evaluated once per group in doubles whose
    // expression shape is mirrored token-for-token in the oracle, so
    // the 1.96 significance boundary cannot flip between engines. S ≤
    // 4.9e10 < 2^53 converts to double exactly. One vocabulary-sized
    // shuffle (type × arm); everything after is O(groups).
    "q_ab_test" -> ((s, d) => {
      val e = Tables.events(s, d)
        .select(col("event_type"),
          pmod(col("user_id"), lit(2)).as("arm"),
          floor(col("value") * lit(1000.0) + lit(0.5)).cast("long")
            .as("vq"))
      // ONE scan, ONE shuffle: both arms' moment sums ride the same
      // conditional aggregate (a per-arm groupBy + self-join would scan
      // and shuffle the event stream twice)
      def arm(a: Int, expr0: Column) = when(col("arm") === a, expr0)
      val m = e.groupBy(col("event_type")).agg(
        count(arm(0, lit(1))).as("n_a"),
        sum(arm(0, col("vq"))).as("s_a"),
        sum(arm(0, col("vq") * col("vq"))).as("q_a"),
        count(arm(1, lit(1))).as("n_b"),
        sum(arm(1, col("vq"))).as("s_b"),
        sum(arm(1, col("vq") * col("vq"))).as("q_b"))
      // var_samp from exact sums: (Q − S·S/n) / (n−1), all in doubles
      def va(suf: String) =
        (col(s"q$suf").cast("double") -
          col(s"s$suf").cast("double") * col(s"s$suf") / col(s"n$suf")) /
          (col(s"n$suf") - 1)
      def mean(suf: String) =
        col(s"s$suf").cast("double") / col(s"n$suf") / lit(1000.0)
      m.withColumn("z",
          (mean("_a") - mean("_b")) /
            sqrt((va("_a") / col("n_a") + va("_b") / col("n_b")) /
              lit(1000000.0)))
        .select(col("event_type"), col("n_a"), col("n_b"),
          (floor(mean("_a") * lit(1e6) + lit(0.5)) / lit(1e6))
            .as("mean_a"),
          (floor(mean("_b") * lit(1e6) + lit(0.5)) / lit(1e6))
            .as("mean_b"),
          (floor(col("z") * lit(1e6) + lit(0.5)) / lit(1e6)).as("z"),
          (col("z") * col("z") > lit(3.8416)).as("significant_95"))
        .orderBy(col("event_type"))
    }),

    // -- RFM customer segmentation -----------------------------------------
    // The classic marketing cut: quartile scores for Recency (latest
    // order), Frequency (order count), Monetary (cent-quantized spend),
    // each via ntile(4) under a TOTAL order (metric, custkey) so the
    // quartile boundaries are deterministic in both engines. Global
    // ntile = one full sort at 100 TB — the scale swap is percentile
    // BOUNDARIES (q_percentile machinery) broadcast back as a bucket
    // join, same downstream schema; pinned here as the exact form.
    "q_rfm" -> ((s, d) => {
      val base = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(max(col("o_orderdate")).as("last_order"),
          count(lit(1)).as("frequency"),
          sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5))
            .cast("long")).as("monetary_cents"))
      base
        .withColumn("r_score", ntile(4).over(
          Window.orderBy(col("last_order").desc, col("o_custkey"))))
        .withColumn("f_score", ntile(4).over(
          Window.orderBy(col("frequency").desc, col("o_custkey"))))
        .withColumn("m_score", ntile(4).over(
          Window.orderBy(col("monetary_cents").desc, col("o_custkey"))))
        .select(col("o_custkey"), col("last_order"), col("frequency"),
          col("monetary_cents"),
          col("r_score").cast("long").as("r_score"),
          col("f_score").cast("long").as("f_score"),
          col("m_score").cast("long").as("m_score"),
          concat(col("r_score").cast("string"),
            col("f_score").cast("string"), col("m_score").cast("string"))
            .as("segment"))
        .orderBy(col("o_custkey"))
    }),

    // -- frequent itemsets: co-purchased part pairs (market basket) --------
    // The association-mining staple (Apriori's 2-itemset round): count
    // orders in which two parts co-occur, top-20 by support. The pair
    // expansion self-joins baskets keyed on the ORDER key, so per-key
    // work is quadratic only in basket size (TPC-H baskets ≤ 7 lines) —
    // linear in the corpus; the pair-count shuffle is bounded by the
    // co-occurring vocabulary², which a support threshold prunes in the
    // full iterated Apriori. (support desc, p1, p2) is a total order, so
    // the top-20 boundary is deterministic.
    "q_freq_itemsets" -> ((s, d) => {
      // collect each basket once (collect_set dedups in the agg buffer —
      // no separate distinct shuffle) and expand pairs INSIDE the array:
      // one basket-keyed shuffle + one pair-keyed shuffle, vs the
      // textbook self-join's three exchanges over the line-item stream
      val baskets = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      baskets
        .select(explode(expr(
          "flatten(transform(ps, (x, i) -> " +
            "transform(slice(ps, i + 2, size(ps)), " +
            "y -> struct(x AS p1, y AS p2))))")).as("pr"))
        .groupBy(col("pr.p1").as("p1"), col("pr.p2").as("p2"))
        .agg(count(lit(1)).as("support"))
        .orderBy(col("support").desc, col("p1"), col("p2"))
        .limit(20)
    }),

    // -- association rules (confidence / lift over the co-purchase pairs) ---
    // The rule-mining step q_freq_itemsets stops short of: for each
    // thresholded pair emit BOTH directed rules a→b with confidence
    // s_ab/s_a and the shared lift s_ab·N/(s_a·s_b) — the actionable
    // "customers who bought X buy Y" readout (q_item_recs ranks by
    // cosine² affinity; rules carry the probabilistic semantics). All
    // scores are exact integer micro-divisions over the memoized
    // [[coEdges]] graph + per-item basket counts; both margins ride
    // broadcast joins on the thresholded pair frame. Top-20 rules by
    // (lift, confidence) under a total order.
    "q_assoc_rules" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val items = li.groupBy(col("l_partkey").as("item"))
        .agg(count(lit(1)).as("s_item"))
      val nb = li.select(col("l_orderkey")).distinct()
        .agg(count(lit(1)).as("n_baskets"))
      val pairs = coEdges(s, d)
      val rules = pairs.select(col("p1").as("a"), col("p2").as("b"),
          col("support"))
        .unionByName(pairs.select(col("p2").as("a"), col("p1").as("b"),
          col("support")))
      rules
        .join(broadcast(items.select(col("item").as("a"),
          col("s_item").as("s_a"))), "a")
        .join(broadcast(items.select(col("item").as("b"),
          col("s_item").as("s_b"))), "b")
        .crossJoin(broadcast(nb))
        .select(col("a"), col("b"), col("support"),
          expr("(support * 1000000) div s_a").as("confidence_u"),
          expr("CAST((CAST(support AS DECIMAL(38,0)) * n_baskets " +
            "* 1000000) div (CAST(s_a AS DECIMAL(38,0)) * s_b) " +
            "AS BIGINT)").as("lift_u"))
        .orderBy(col("lift_u").desc, col("confidence_u").desc,
          col("a"), col("b"))
        .limit(20)
    }),

    // -- bounded multi-source BFS (k-hop shortest path) --------------------
    // The remaining graph primitive next to PageRank/CC/triangles:
    // hop distance from a seed set (every 50th customer) over the same
    // undirected trade graph, relaxed for a FIXED bfsHops rounds — the
    // "within k hops" query a fraud/affinity pipeline runs, and bounding
    // the rounds is what makes the cost predictable at 100 TB (unbounded
    // BFS is q_dup_clusters' large-star territory). Per round: one
    // edge⋈frontier hash join + per-node min — all integer, so the
    // result is merge-order-independent. The static edge list persists
    // across rounds (pagerank's lesson); distances stay a DataFrame, so
    // round r's shuffle is bounded by |reached| ≤ |V|, never |E|·r.
    "q_graph_bfs" -> ((s, d) => {
      val e0 = tradeEdgesEnc(s, d)  // shared memoized edge list
      val edges = e0.union(e0.select(col("dst").as("src"),
          col("src").as("dst")))
        .pinned
      var dist = Tables.customer(s, d)
        .filter(pmod(col("c_custkey"), lit(50)) === 0)
        .select((col("c_custkey") * 2).as("id"), lit(0L).as("dist"))
      // r16-opt (guide §3.1, the q_pagerank treatment): the frontier is
      // bounded by the node count (≤ |customer|+|supplier| rows of two
      // longs) while edges is the cached big side — broadcast the
      // frontier so the edge cache is never re-exchanged/re-sorted per
      // hop (before-plan: SortMergeJoin(71/120/127) + Exchange over the
      // InMemoryTableScan each hop). Min-distances are join-strategy-
      // independent — bit-identical output. NOTE: multiRootBfs keeps its
      // SMJ deliberately — ITS frontier is roots × reach, not
      // node-bounded, and must not broadcast.
      for (_ <- 1 to bfsHops) {
        val relaxed = edges
          .join(broadcast(dist.withColumnRenamed("id", "src")), "src")
          .select(col("dst").as("id"), (col("dist") + lit(1L)).as("dist"))
        dist = dist.union(relaxed)
          .groupBy(col("id")).agg(min(col("dist")).as("dist"))
      }
      dist.select(col("id"),
          when(pmod(col("id"), lit(2)) === 0, lit("customer"))
            .otherwise(lit("supplier")).as("node_type"),
          col("dist"))
        .orderBy(col("id"))
    }),

    // -- sampled harmonic centrality (bounded-hop, multi-root BFS) ---------
    // The centrality metric that works on disconnected graphs (closeness
    // breaks: unreachable ⇒ ∞): c(v) = Σ_u 1/d(u, v), with unreachable
    // terms contributing 0. Exact all-pairs is |V| BFS runs; the
    // production estimator (Boldi–Vigna style) runs BFS from a SAMPLE
    // of roots and reports the partial sum — this is q_graph_bfs's
    // machinery with the ROOT kept in the frontier key, so per-round
    // state is Σ_seeds |B_k(seed)| rows, bounded by seeds × reach, and
    // every round is one edge⋈frontier join + keyed min. 1/d terms are
    // exact integer micro-units (d ∈ {1..3} ⇒ 1000000 div d), so the
    // per-node sum is merge-order-free.
    // -- sampled effective diameter (90th-percentile reach distance) --------
    // The robust companion to q_eccentricity's max: the 90th percentile
    // of sampled pairwise distances (the "effective diameter" of the
    // small-world literature — max distances chase single outlier
    // paths). Third consumer of the memoized multiRootBfs frame, so the
    // marginal cost is one bounded aggregate: distances live on {1..3},
    // making the percentile an exact contingency lookup — no sort, no
    // quantile estimate.
    "q_effective_diameter" -> ((s, d) => {
      val dist = multiRootBfs(s, d).filter(col("dist") > 0)
      val byD = dist.groupBy(col("dist")).agg(count(lit(1)).as("n"))
      val tot = byD.agg(sum(col("n")).as("nn"))
      byD.crossJoin(broadcast(tot))
        .withColumn("cum", sum(col("n"))
          .over(Window.orderBy(col("dist"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("dist"), col("n"), col("cum"), col("nn"),
          expr("(1000000 * cum) div nn").as("cdf_u"),
          expr("10 * cum >= 9 * nn AND 10 * (cum - n) < 9 * nn")
            .as("is_eff_diameter"))
        .orderBy(col("dist"))
    }),

    "q_harmonic_centrality" -> ((s, d) => {
      multiRootBfs(s, d).filter(col("dist") > 0)
        .groupBy(col("id"))
        .agg(count(lit(1)).as("n_sources"),
          sum(expr("1000000 div dist")).as("h_u"))
        .select(col("id"),
          when(pmod(col("id"), lit(2)) === 0, lit("customer"))
            .otherwise(lit("supplier")).as("node_type"),
          col("n_sources"),
          (col("h_u").cast("double") / lit(1e6)).as("harmonic"))
        .orderBy(col("id"))
    }),

    // -- sampled bounded-horizon eccentricity (diameter screen) ------------
    // The reach-profile companion to q_harmonic_centrality, on the same
    // fixed 200-root bounded BFS: per root, how FAR does the graph
    // extend (ecc within the hop horizon) and how MUCH of it is
    // reachable — max over the frame is the sampled diameter lower
    // bound, the standard screen before committing an iteration bound
    // for any frontier algorithm. Identical cost shape: roots × reach
    // frontier rows, keyed min per round, all-integer distances.
    "q_eccentricity" -> ((s, d) => {
      multiRootBfs(s, d).groupBy(col("root"))
        .agg(sum(when(col("dist") > 0L, 1L).otherwise(0L))
          .as("n_reached"), max(col("dist")).as("ecc_h"))
        .orderBy(col("root"))
    }),

    // -- sampled closeness centrality (bounded-horizon) ---------------------
    // The classical closeness readout on the same fixed 200-root bounded
    // BFS: reached mass over total distance, n_reached/Σdist per root —
    // the "how central is this node" number the harmonic variant
    // regularizes (harmonic handles disconnection; closeness is the one
    // dashboards quote). Fourth consumer of the memoized multiRootBfs
    // frame: marginal cost is one root-keyed aggregate; the ratio is an
    // exact integer micro-division (all-positive operands, div == //).
    "q_closeness_centrality" -> ((s, d) => {
      multiRootBfs(s, d).filter(col("dist") > 0L)
        .groupBy(col("root"))
        .agg(count(lit(1)).as("n_reached"), sum(col("dist")).as("sum_dist"))
        .select(col("root"), col("n_reached"), col("sum_dist"),
          (expr("(n_reached * 1000000) div sum_dist").cast("double") /
            lit(1e6)).as("closeness"))
        .orderBy(col("root"))
    }),

    // -- label propagation (semi-supervised label flooding) ----------------
    // The graph half of semi-supervised learning: a few nodes carry
    // known labels (every 20th customer, labeled with its nation's
    // REGION); labels flood outward for a fixed number of rounds, each
    // unlabeled node adopting the MAJORITY label among its labeled
    // neighbors (ties to the smallest label — a total order, so every
    // round is deterministic). Assigned labels are immutable (seeds
    // clamped, flood monotone) — the variant that provably converges
    // and never oscillates. Per round: one edge⋈labels join, one
    // (node, label) count, one per-node argmax window keyed by node —
    // all keyed shuffles, frontier-bounded like q_graph_bfs.
    "q_label_propagation" -> ((s, d) => {
      val e0 = tradeEdgesEnc(s, d)  // shared memoized edge list
      val edges = e0.union(e0.select(col("dst").as("src"),
          col("src").as("dst")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        var labels = Tables.customer(s, d)
          .filter(pmod(col("c_custkey"), lit(20)) === 0)
          .join(Tables.nation(s, d),
            col("c_nationkey") === col("n_nationkey"))
          .select((col("c_custkey") * 2).as("id"),
            col("n_regionkey").cast("long").as("label"),
            lit(0L).as("round"))
        for (r <- 1 to lpRounds) {
          val votes = edges
            .join(labels.select(col("id").as("src"), col("label")), "src")
            .groupBy(col("dst"), col("label"))
            .agg(count(lit(1)).as("cnt"))
            .join(labels.select(col("id").as("dst")), Seq("dst"),
              "left_anti")
          val w = Window.partitionBy(col("dst"))
            .orderBy(col("cnt").desc, col("label").asc)
          val newly = votes.withColumn("rn", row_number().over(w))
            .filter(col("rn") === 1)
            .select(col("dst").as("id"), col("label"),
              lit(r.toLong).as("round"))
          // localCheckpoint-per-round, not persist: the q_kcore lesson —
          // eager checkpoint detaches the superseded iterate so the loop
          // holds ≤2 cached generations
          labels = labels.union(newly).localCheckpoint(true)
        }
        labels.select(col("id"),
            when(pmod(col("id"), lit(2)) === 0, lit("customer"))
              .otherwise(lit("supplier")).as("node_type"),
            col("label"), col("round"))
          .orderBy(col("id"))
      } finally edges.unpersist(blocking = false)
    }),

    // -- sample-ratio mismatch guard (the A/B test's A/A test) -------------
    // The first thing to check about an experiment is the assignment
    // itself: if the two arms' sizes differ more than chance allows, the
    // bucketing is broken and every downstream readout (q_ab_test) is
    // invalid. One-degree chi-square of observed arm counts against the
    // designed 50/50 split, computed per event_type and overall from
    // exact integer counts — the (a−b)²/(a+b) form needs no expected-
    // count division. Flag at the classic 3.84 cut (χ²₁ at α=0.05),
    // cross-multiplied into integers so the boundary is exact. One
    // conditional aggregate — single scan, single shuffle.
    "q_ab_srm" -> ((s, d) => {
      val e = Tables.events(s, d)
        .select(col("event_type"), pmod(col("user_id"), lit(2)).as("arm"))
      val g = e.groupBy(col("event_type")).agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"))
      val diff = col("n_a") - col("n_b")
      g.select(col("event_type"), col("n_a"), col("n_b"),
          round(diff.cast("double") * diff / (col("n_a") + col("n_b")), 6)
            .as("chi2"),
          // χ² > 3.84 ⟺ 100·(a−b)² > 384·(a+b): integer boundary
          (lit(100L) * diff * diff >
            lit(384L) * (col("n_a") + col("n_b"))).as("srm_flag"))
        .orderBy(col("event_type"))
    }),

    // -- activity metrics: DAU / WAU / stickiness --------------------------
    // The product-analytics pulse: distinct active users per calendar
    // day, the containing ISO-week's distinct actives joined back, and
    // stickiness = DAU/WAU. Day and week derive from integer epoch-day
    // arithmetic ((days+3) div 7 makes weeks start Monday — the
    // q_seasonal_dow convention, engine-portable). Two distinct-count
    // aggregations keyed by day/week — map-side partial distinct keeps
    // the shuffle bounded by actives, never events.
    "q_active_users" -> ((s, d) => {
      val e = Tables.eventsWithTime(s, d)
        .select(expr("ts_us div 86400000000").as("day"), col("user_id"))
        .withColumn("week", expr("(day + 3) div 7"))
      val dau = e.groupBy(col("day"), col("week"))
        .agg(countDistinct(col("user_id")).as("dau"))
      val wau = e.groupBy(col("week"))
        .agg(countDistinct(col("user_id")).as("wau"))
      dau.join(wau, "week")
        .select(col("day"), col("week"), col("dau"), col("wau"),
          round(col("dau").cast("double") / col("wau"), 6)
            .as("stickiness"))
        .orderBy(col("day"))
    }),

    // -- cumulative distinct users per day (reach curve) -------------------
    // The audience-reach counter q_active_users' per-window distincts
    // cannot answer: how many DISTINCT users has the product ever seen
    // as of each day? The naive per-day COUNT(DISTINCT ... WHERE day <=
    // d) rescans the corpus once per day; the distributed shape is the
    // first-seen trick — a running distinct count is exactly the count
    // of FIRST OCCURRENCES, so one user-keyed min(day) aggregate
    // reduces the corpus to one row per user, a day-keyed count reduces
    // that to the bounded day frame, and the cumulative sum runs on
    // days only. DAU joins back for the same-frame comparison. All
    // integer; one user-keyed + one day-keyed shuffle.
    "q_running_distinct" -> ((s, d) => {
      val e = Tables.eventsWithTime(s, d)
        .select(expr("ts_us div 86400000000").as("day"), col("user_id"))
      val firstSeen = e.groupBy(col("user_id"))
        .agg(min(col("day")).as("day"))
        .groupBy(col("day")).agg(count(lit(1)).as("new_users"))
      val dau = e.groupBy(col("day"))
        .agg(countDistinct(col("user_id")).as("dau"))
      val w = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      dau.join(firstSeen, Seq("day"), "left")
        .withColumn("new_users", coalesce(col("new_users"), lit(0L)))
        .withColumn("cum_distinct", sum(col("new_users")).over(w))
        .select(col("day"), col("dau"), col("new_users"),
          col("cum_distinct"))
        .orderBy(col("day"))
    }),

    // -- referential-integrity audit (constraint checking) -----------------
    // The invariants a lakehouse cannot declare-and-enforce the way an
    // OLTP database does, so it AUDITS them per batch instead: primary-
    // key uniqueness (rows − distinct keys), foreign-key orphans (keyed
    // anti-join — the only join here, same cost class as any equi-join),
    // a value-range rule, and a payload-shape rule. One row per check
    // with the violation and checked counts — the frame a data-quality
    // dashboard ingests directly. Each check is a single aggregation
    // pass; nothing quadratic, nothing driver-sized.
    "q_integrity_audit" -> ((s, d) => {
      val orders = Tables.orders(s, d)
      val li = Tables.lineitem(s, d)
      val ev = Tables.events(s, d)
      val c1 = orders.agg(
          (count(lit(1)) - countDistinct(col("o_orderkey")))
            .as("n_violations"),
          count(lit(1)).as("n_checked"))
        .withColumn("check", lit("pk_orders_unique"))
      val c2 = li
        .join(orders.select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .crossJoin(li.agg(count(lit(1)).as("n_checked")))
        .withColumn("check", lit("fk_lineitem_orders"))
      val c3 = ev.agg(
          sum(when(col("value") < 0, 1L).otherwise(0L)).as("n_violations"),
          count(lit(1)).as("n_checked"))
        .withColumn("check", lit("value_nonnegative"))
      val c4 = ev.agg(
          sum(when(col("props").isNull || !col("props").like("{%}"), 1L)
            .otherwise(0L)).as("n_violations"),
          count(lit(1)).as("n_checked"))
        .withColumn("check", lit("props_json_shape"))
      c1.unionByName(c2).unionByName(c3).unionByName(c4)
        .select(col("check"), col("n_violations").cast("long")
          .as("n_violations"), col("n_checked"),
          (col("n_violations") === 0).as("pass"))
        .orderBy(col("check"))
    }),

    // -- graph degree distribution (log2-bucket histogram) -----------------
    // The first audit a graph pipeline runs before committing to a
    // partitioning strategy: the degree histogram tells you whether the
    // PageRank/CC/BFS family above needs skew handling (a power-law hub
    // melts an edge-keyed shuffle). Buckets are floor(log2(degree))
    // computed EXACTLY as binary-string length − 1 — no FP log at bucket
    // boundaries (ln(8)/ln(2) is not reliably 3.0 in any engine). Two
    // keyed aggregations over the undirected edge list; output bounded
    // by 2·64 buckets by construction.
    "q_degree_dist" -> ((s, d) => {
      val e0 = tradeEdgesEnc(s, d)  // shared memoized edge list
      e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
        .groupBy(col("src")).agg(count(lit(1)).as("degree"))
        .withColumn("node_type",
          when(pmod(col("src"), lit(2)) === 0, lit("customer"))
            .otherwise(lit("supplier")))
        .withColumn("bucket",
          (length(expr("bin(degree)")) - 1).cast("long"))
        .groupBy(col("node_type"), col("bucket"))
        .agg(count(lit(1)).as("n_nodes"),
          min(col("degree")).as("min_deg"),
          max(col("degree")).as("max_deg"))
        .orderBy(col("node_type"), col("bucket"))
    }),

    // -- triangle counting (degree-ordered edge orientation) ---------------
    // The clustering-structure primitive next to degree/BFS/PageRank:
    // per-node triangle participation over the co-purchase graph
    // (q_freq_itemsets' basket pairs, support ≥ 2 so density is
    // data-bounded, not |parts|²). The distributed-triangle trick is the
    // ORIENTATION: direct every edge from its (degree, id)-smaller
    // endpoint to the larger, so wedge generation fans out from the LOW
    // degree side — Σ out-deg² stays near-linear even on power-law
    // graphs (the node-iterator++ bound), where the naive wedge join is
    // Σ deg² and melts on hubs. One wedge self-join + one closure
    // equi-join, all integer, each triangle found exactly once.
    "q_triangle_count" -> ((s, d) => {
      // per-node triangle counts ride the session-memoized coTriangles
      // frame (r16-opt) — shared with q_clustering_coef, which ran the
      // identical wedge join independently before
      val e = coEdges(s, d).select(col("p1"), col("p2"))
      val deg = e.select(col("p1").as("n")).union(e.select(col("p2")))
        .groupBy(col("n")).agg(count(lit(1)).as("dg"))
      coTriangles(s, d)
        .join(deg.select(col("n").as("part"), col("dg").as("degree")),
          "part")
        .select(col("part"), col("degree"), col("n_tri"))
        .orderBy(col("n_tri").desc, col("part"))
        .limit(20)
    }),

    // -- link prediction (common neighbors + resource allocation) ----------
    // The recommendation/denoising primitive over the same graph: score
    // NON-adjacent pairs by their shared neighborhood. Two classic
    // indices in one pass: cn = |N(u)∩N(v)| and the resource-allocation
    // index Σ_w 1/deg(w) — the latter micro-quantized as the INTEGER
    // 1000000 div deg(w) per witness so the sum (and hence the ranking)
    // is engine-exact, no float accumulation order to disagree on. One
    // wedge join through the shared neighbor + one anti-join against
    // the edge set. Scale: wedge volume is Σ deg(v)² — on hub-heavy
    // graphs the production mitigation is a hub cap on v; here density
    // is already support-bounded upstream.
    "q_link_predict" -> ((s, d) => {
      val e = coEdges(s, d).select(col("p1"), col("p2"))
      val scored = coWedges(s, d).groupBy(col("u"), col("w"))
        .agg(count(lit(1)).as("cn"),
          sum(expr("1000000 div dg")).as("ra_q"))
      scored.join(e, scored("u") === e("p1") && scored("w") === e("p2"),
          "left_anti")
        .select(col("u"), col("w"), col("cn"), col("ra_q"))
        .orderBy(col("ra_q").desc, col("cn").desc, col("u"), col("w"))
        .limit(20)
    }),

    // -- Adamic-Adar link prediction (inverse-log common neighbors) --------
    // Completes the classical link-prediction trio next to
    // q_link_predict's CN + resource-allocation: AA downweights hub
    // wedge centers by 1/ln(deg) instead of 1/deg — the standard
    // middle ground. Same thresholded co-purchase graph and wedge
    // machinery; each center's weight is micro-quantized to an integer
    // BEFORE the pair aggregation (floor-ln discipline), so the per-pair
    // sum is order-free. Wedge centers always have deg ≥ 2 (they carry
    // two neighbors), so ln never sees 1; the guard keeps degree-1
    // rows finite anyway.
    "q_adamic_adar" -> ((s, d) => {
      val e = coEdges(s, d).select(col("p1"), col("p2"))
      val scored = coWedges(s, d).groupBy(col("u"), col("w"))
        .agg(count(lit(1)).as("cn"), sum(col("aw")).as("aa_q"))
      scored.join(e,
          scored("u") === e("p1") && scored("w") === e("p2"),
          "left_anti")
        .select(col("u"), col("w"), col("cn"), col("aa_q"))
        .orderBy(col("aa_q").desc, col("cn").desc, col("u"), col("w"))
        .limit(20)
    }),

    // -- item-item collaborative filtering (co-occurrence recs) ------------
    // The "customers also bought" readout: for the 10 most-stocked
    // parts, the top-3 co-purchased parts ranked by a cosine-squared
    // affinity co²/(n_u·n_v) — computed as the INTEGER
    // co²·10¹² div (n_u·n_v) so the ranking is exact on both engines,
    // the numerator widened to DECIMAL(38,0)/HUGEINT because co²·10¹²
    // exits int64 already at co ≈ 3033. The pair
    // frame is the same support-bounded co-purchase edge list; seed
    // popularity is one keyed count; the per-seed top-3 is a bounded
    // rank window over a frame whose size is the edge count.
    "q_item_recs" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val pop = li.groupBy(col("l_partkey").as("part"))
        .agg(count(lit(1)).as("n_baskets"))
      val seeds = pop
        .orderBy(col("n_baskets").desc, col("part")).limit(10)
      val pairs = coEdges(s, d)
      val both = pairs.select(col("p1").as("part"), col("p2").as("rec"),
          col("support").as("co"))
        .union(pairs.select(col("p2").as("part"), col("p1").as("rec"),
          col("support").as("co")))
      val scored = both.join(broadcast(seeds), "part")
        .join(pop.select(col("part").as("rec"),
          col("n_baskets").as("n_rec")), "rec")
        // DECIMAL(38,0) numerator (HUGEINT in the oracle): co²·10¹²
        // leaves int64 once a pair's co-occurrence support exceeds
        // ~3033 baskets — routine for hot pairs at scale. The quotient
        // is ≤ 10¹² (co ≤ min(n_baskets, n_rec)), so the BIGINT cast
        // back is always exact.
        .withColumn("score_q",
          expr("CAST((CAST(co AS DECIMAL(38,0)) * co * 1000000000000) " +
            "div (CAST(n_baskets AS DECIMAL(38,0)) * n_rec) AS BIGINT)"))
      val w = Window.partitionBy(col("part"))
        .orderBy(col("score_q").desc, col("rec"))
      scored.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("part"), col("rnk").cast("long").as("rnk"),
          col("rec"), col("co"), col("score_q"))
        .orderBy(col("part"), col("rnk"))
    }),

    // -- ROC AUC (rank-sum / Mann-Whitney form, grouped) -------------------
    // The classifier-eval metric q_eval_metrics' P/R/F1 can't give:
    // per-source AUC of "is this doc English?" with n_chars as the
    // score. The distributed form is the RANK-SUM identity, computed
    // over the per-(source, score) contingency frame — pos/neg counts
    // per distinct score, a prefix sum of negatives below, then
    // 2U = Σ np·(2·cumneg + nn) which handles ties as the standard
    // average-rank midpoint WITHOUT ever ranking rows globally. Every
    // value is an integer, so AUC_u is engine-exact. Scale: the shuffle
    // carries only the contingency frame (groups × distinct scores);
    // the prefix window partitions by source — with few heavy groups
    // the Dist.globalPrefixSum two-phase form takes over (q_outlier_mad
    // has the same documented caveat).
    "q_auc_roc" -> ((s, d) => {
      val g = Tables.documents(s, d)
        .groupBy(col("source"), col("n_chars"))
        .agg(sum(when(col("lang") === "en", 1L).otherwise(0L)).as("np"),
          sum(when(col("lang") =!= "en", 1L).otherwise(0L)).as("nn"))
      val w = Window.partitionBy(col("source")).orderBy(col("n_chars"))
        .rowsBetween(Window.unboundedPreceding, -1)
      g.withColumn("cumneg", coalesce(sum(col("nn")).over(w), lit(0L)))
        .groupBy(col("source"))
        .agg(sum(col("np") * (lit(2L) * col("cumneg") + col("nn")))
            .as("two_u"),
          sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"))
        .select(col("source"), col("n_pos"), col("n_neg"),
          when(col("n_pos") > 0 && col("n_neg") > 0,
            expr("(1000000 * two_u) div (2 * n_pos * n_neg)")).as("auc_u"))
        .orderBy(col("source"))
    }),

    // -- k-core decomposition (fixed-round peel) ---------------------------
    // The graph-cleaning primitive next to CC/PageRank: iteratively
    // strip nodes of degree < k until the k-core remains. Round count
    // is PINNED at 4 (like q_pagerank's 3) so both engines compute the
    // identical partial fixpoint whether or not the peel has converged
    // — convergence is data-dependent and an unbounded loop is exactly
    // what an oracle can't replay. Each round is two keyed joins
    // against the surviving-node frame; the edge list shrinks
    // monotonically, so round cost is bounded by the first. 100 TB
    // shape: same disjoint-component parallelism as q_graph_bfs —
    // peeling is embarrassingly key-parallel.
    "q_kcore" -> ((s, d) => {
      val k = 3
      // localCheckpoint-per-round (ConnectedComponents.scala discipline),
      // not persist: eager checkpoint truncates lineage AND detaches the
      // new iterate from the old one's blocks, so each superseded edge
      // list becomes unreferenced immediately and the context cleaner
      // reclaims it — the loop holds ≤2 cached generations at any time
      // instead of all 5 (the r10 leak: memory pressure at 100×).
      var e = coEdges(s, d).select(col("p1"), col("p2"))
        .localCheckpoint(true)
      for (_ <- 1 to 4) {
        val keep = e.select(col("p1").as("n"))
          .union(e.select(col("p2")))
          .groupBy(col("n")).agg(count(lit(1)).as("dg"))
          .filter(col("dg") >= k)
          .select(col("n"))
        e = e.join(keep.withColumnRenamed("n", "p1"), "p1")
          .join(keep.withColumnRenamed("n", "p2"), "p2")
          .select(col("p1"), col("p2"))
          .localCheckpoint(true)
      }
      e.select(col("p1").as("node")).union(e.select(col("p2")))
        .groupBy(col("node")).agg(count(lit(1)).as("core_deg"))
        .orderBy(col("core_deg").desc, col("node"))
    }),

    // -- entity resolution: min-df token blocking + token-sort ratio -------
    // Record linkage over the part-name universe: names normalized to
    // sorted-token form, DISTINCT names paired only inside blocks keyed
    // by each name's RAREST token (the canopy/cheapest-blocking-key
    // rule — the df-weighted choice keeps block sizes near the rare
    // tail instead of the hot head), then scored with the token-sort
    // ratio 1 − lev/maxlen as an exact integer. Working on distinct
    // names makes the frame vocabulary-bounded — the 100 TB corpus
    // collapses to its name vocabulary before any pairing, and the
    // support column carries the row weight back out. Both engines
    // replay the identical blocking, so the oracle sees the same pairs.
    "q_entity_match" -> ((s, d) => {
      val names = Tables.part(s, d)
        .select(array_join(sort_array(split(col("p_name"), " ")), " ")
          .as("nm"))
        .groupBy(col("nm")).agg(count(lit(1)).as("n_rows"))
      val tok = names.select(col("nm"),
        explode(split(col("nm"), " ")).as("t"))
      val df = tok.groupBy(col("t")).agg(count(lit(1)).as("tdf"))
      val blk = tok.join(df, "t")
        .groupBy(col("nm"))
        .agg(min(struct(col("tdf"), col("t"))).as("bk"))
        .select(col("nm"), col("bk.t").as("bt"))
      val a = names.join(blk, "nm")
        .select(col("bt"), col("nm").as("na"), col("n_rows").as("ca"))
      val b = a.select(col("bt"), col("na").as("nb"), col("ca").as("cb"))
      a.join(b, Seq("bt")).filter(col("na") < col("nb"))
        .withColumn("score_q", lit(1000000) -
          expr("(1000000 * levenshtein(na, nb)) div " +
            "greatest(length(na), length(nb))"))
        .filter(col("score_q") >= 600000)
        .select(col("na"), col("nb"), col("ca"), col("cb"),
          col("score_q").cast("long").as("score_q"))
        .orderBy(col("score_q").desc, col("na"), col("nb"))
    }),

    // -- CUPED variance reduction (pre-period covariate adjustment) --------
    // The experimentation-stack refinement of q_ab_test: adjust each
    // user's post-period metric by θ·(pre − pre_grand_mean), with
    // θ = cov(pre, post)/var(pre) estimated on the pooled population.
    // Per-user pre/post sums ride ONE user-keyed conditional aggregate;
    // θ's moment sums are integer-exact (dollar-resolution covariate —
    // Σpre² at milli resolution would overflow int64 near 10⁵ users,
    // the same two-level-DECIMAL escape q_embed_standardize documents);
    // the final per-arm means are fixed double expressions over exact
    // sums, the q_ab_test contract. Scale: one user shuffle + one
    // 2-group rollup; θ broadcast back as a scalar cross join.
    "q_cuped" -> ((s, d) => {
      val cut = lit("2024-01-16").cast("timestamp")
      val u = Tables.events(s, d)
        .select(pmod(col("user_id"), lit(2)).as("arm"), col("user_id"),
          when(col("ts") < cut,
            floor(col("value") * lit(1000.0) + lit(0.5)).cast("long"))
            .as("prem"),
          when(col("ts") >= cut,
            floor(col("value") * lit(1000.0) + lit(0.5)).cast("long"))
            .as("postm"))
        .groupBy(col("arm"), col("user_id"))
        .agg(coalesce(sum(col("prem")), lit(0L)).as("pre_m"),
          coalesce(sum(col("postm")), lit(0L)).as("post_m"))
        .withColumn("pre_d", expr("pre_m div 1000"))
        .withColumn("post_d", expr("post_m div 1000"))
      val g = u.agg(count(lit(1)).as("n"),
        sum(col("pre_d")).as("sx"), sum(col("post_d")).as("sy"),
        sum(col("pre_d") * col("pre_d")).as("sxx"),
        sum(col("pre_d") * col("post_d")).as("sxy"))
        .select(
          (col("sxy").cast("double") -
            col("sx").cast("double") * col("sy") / col("n")).as("covn"),
          (col("sxx").cast("double") -
            col("sx").cast("double") * col("sx") / col("n")).as("varn"),
          (col("sx").cast("double") / col("n")).as("gm"))
      val gt = g.withColumn("theta",
        when(col("varn") > 0, col("covn") / col("varn")).otherwise(lit(0.0)))
      // Arm means from EXACT integer sums, then ONE fixed double
      // expression (the q_ab_test/q_diff_in_diff determinism contract):
      // avg() over per-user double expressions would make the result
      // depend on float accumulation order across partitions. The
      // identity: avg(post/1000 − θ(pre − gm)) =
      // Σpost/(1000n) − θ(Σpre/n − gm).
      u.groupBy(col("arm"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("post_m")).as("sp"), sum(col("pre_d")).as("sd"))
        .crossJoin(broadcast(gt))
        .select(col("arm"), col("n_users"),
          round(col("sp").cast("double") / col("n_users") / lit(1000.0), 6)
            .as("raw_mean"),
          round(col("sp").cast("double") / col("n_users") / lit(1000.0) -
            col("theta") *
              (col("sd").cast("double") / col("n_users") - col("gm")), 6)
            .as("adj_mean"))
        .orderBy(col("arm"))
    }),

    // -- Gini concentration (per-nation customer spend) --------------------
    // The corpus-concentration diagnostic (domain dominance in a crawl,
    // whale dominance in revenue): exact Gini from the rank-weighted
    // sum, G = (2·Σ rank·x − (n+1)·Σx) / (n·Σx), on integer cents with
    // a (spend, custkey) total order. One customer-keyed join-agg, one
    // nation-keyed rank window — group-parallel, no global sort. The
    // rank·x SUMS stay exact int64 to ~10⁴ customers/nation at cent
    // resolution (measured 6.2e13 at sf0.1); the final ratio is a fixed
    // double expression rounded 6dp — a 1e6-scaled integer numerator
    // overflows int64 already at sf0.1, which ANSI mode turns into a
    // hard failure (caught by the 10× probe). Beyond ~sf10 the sums
    // widen to DECIMAL.
    "q_gini" -> ((s, d) => {
      val spend = Tables.customer(s, d)
        .join(Tables.orders(s, d),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_nationkey"), col("c_custkey"))
        .agg(coalesce(sum(floor(col("o_totalprice") * lit(100.0) +
          lit(0.5)).cast("long")), lit(0L)).as("sp"))
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("sp").asc, col("c_custkey").asc)
      spend.withColumn("rnk", row_number().over(w))
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_cust"), sum(col("sp")).as("total_c"),
          sum(col("rnk") * col("sp")).as("rs"))
        .select(col("c_nationkey"), col("n_cust"), col("total_c"),
          when(col("total_c") > 0,
            round((lit(2.0) * col("rs") -
              (col("n_cust") + lit(1.0)) * col("total_c")) /
              (col("n_cust").cast("double") * col("total_c")), 6))
            .as("gini"))
        .orderBy(col("c_nationkey"))
    }),

    // -- changepoint detection (single breakpoint, between-group SS) ------
    // Level-shift detection on the daily purchase-revenue series: the
    // breakpoint maximizing the between-segment sum of squares, scored
    // as the INTEGER (SL·nR − SR·nL)² div (nL·nR) on dollar-resolution
    // day totals so the argmax is engine-exact (the objective is
    // DEFINED as the integer-divided score; ties break earliest). The
    // data-sized work is one day-keyed aggregate; the breakpoint scan
    // is a prefix window over the bounded day frame (≤ series length —
    // the q_seasonal_dow class of bounded tail), not the event stream.
    "q_changepoint" -> ((s, d) => {
      val day = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(sum(floor(col("value")).cast("long")).as("rd"))
      val w = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = day.agg(sum(col("rd")).as("st"),
        count(lit(1)).as("nt"))
      day.withColumn("sl", sum(col("rd")).over(w))
        .withColumn("nl", count(lit(1)).over(w))
        .crossJoin(broadcast(tot))
        .filter(col("nl") < col("nt"))
        .select(date_format(col("day"), "yyyy-MM-dd").as("break_day"),
          expr("((sl * (nt - nl) - (st - sl) * nl) * " +
            "(sl * (nt - nl) - (st - sl) * nl)) div (nl * (nt - nl))")
            .as("score_q"),
          expr("sl div nl").as("mean_left_d"),
          expr("(st - sl) div (nt - nl)").as("mean_right_d"))
        .orderBy(col("score_q").desc, col("break_day"))
        .limit(1)
    }),

    // -- churn-label generation (training-set assembly) --------------------
    // The label-generation step of a churn-model pipeline: features
    // from the first 20 days (event count, purchase cents), label =
    // silent in the last 10 — emitted as the (activity bucket, label)
    // training-population histogram with exact integer spend means.
    // One user-keyed conditional aggregate builds both windows in a
    // single scan (the q_ab_test one-shuffle discipline); the output
    // frame is bounded at 10 buckets × 2 labels.
    "q_churn_label" -> ((s, d) => {
      val cut = lit("2024-01-21").cast("timestamp")
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(count(when(col("ts") < cut, 1)).as("n_ev"),
          coalesce(sum(when(col("ts") < cut &&
            col("event_type") === "purchase",
            floor(col("value") * lit(100.0) + lit(0.5)).cast("long"))),
            lit(0L)).as("purch_c"),
          count(when(col("ts") >= cut, 1)).as("n_post"))
        .filter(col("n_ev") > 0)
        .select(least(expr("n_ev div 10"), lit(9L)).as("bucket"),
          (col("n_post") === 0).cast("int").cast("long").as("churned"),
          col("purch_c"))
        .groupBy(col("bucket"), col("churned"))
        .agg(count(lit(1)).as("n_users"),
          expr("sum(purch_c) div count(1)").as("avg_purch_c"))
        .orderBy(col("bucket"), col("churned"))
    }),

    // -- discrete-time hazard curve (time-to-conversion survival) ----------
    // Survival analysis over the event stream: per user, days from
    // first activity to first purchase, right-censored at the window
    // end. The life-table quantities — at-risk count n_t (a suffix sum
    // over the bounded day frame), events d_t, censored c_t, hazard
    // d_t/n_t in exact micro-integers — are what a Kaplan-Meier plot
    // reads off. Scale: one user-keyed conditional aggregate carries
    // all the data-sized work; the suffix-sum window runs on ≤ series
    // length rows (the q_changepoint bounded-tail class).
    "q_hazard_curve" -> ((s, d) => {
      val winEnd = lit("2024-01-31").cast("date")
      val u = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(min(to_date(col("ts"))).as("first_day"),
          min(when(col("event_type") === "purchase", to_date(col("ts"))))
            .as("purch_day"))
        .select(
          when(col("purch_day").isNotNull,
            datediff(col("purch_day"), col("first_day")))
            .otherwise(datediff(winEnd, col("first_day")))
            .cast("long").as("t"),
          col("purch_day").isNotNull.cast("int").cast("long").as("ev"))
      val byT = u.groupBy(col("t"))
        .agg(sum(col("ev")).as("d_events"),
          sum(lit(1L) - col("ev")).as("c_censored"))
      val w = Window.orderBy(col("t").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byT.withColumn("n_risk",
          sum(col("d_events") + col("c_censored")).over(w))
        .select(col("t"), col("n_risk"), col("d_events"),
          col("c_censored"),
          expr("(1000000 * d_events) div n_risk").as("hazard_u"))
        .orderBy(col("t"))
    }),

    // -- A/B power analysis (required n per arm from pilot moments) --------
    // The pre-experiment sizing readout the q_ab_test/q_cuped stack
    // needs: per metric, the per-arm n for 80% power at α = 0.05
    // against a 5% lift, n = 2·(z_α/2 + z_β)²·σ²/Δ². The z constant is
    // a shared literal (7.848886 = (1.959964 + 0.841621)²); σ² and the
    // mean come from exact milli-integer moment sums, so both engines
    // evaluate one identical double expression (the q_ab_test
    // contract). One conditional scan, output bounded at |event types|.
    "q_power_analysis" -> ((s, d) => {
      val e = Tables.events(s, d)
        .select(col("event_type"),
          floor(col("value") * lit(1000.0) + lit(0.5)).cast("long")
            .as("vq"))
      e.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("vq")).as("s1"),
          sum(col("vq") * col("vq")).as("s2"))
        .filter(col("n") > 1)
        .select(col("event_type"), col("n"),
          round(col("s1").cast("double") / col("n") / lit(1000.0), 6)
            .as("mean_val"),
          round(
            (lit(2.0) * lit(7.848886) *
              ((col("s2").cast("double") -
                col("s1").cast("double") * col("s1") / col("n")) /
                (col("n") - lit(1L)))) /
              ((lit(0.05) * (col("s1").cast("double") / col("n"))) *
               (lit(0.05) * (col("s1").cast("double") / col("n")))), 2)
            .as("n_required"))
        .orderBy(col("event_type"))
    }),

    // -- Benford first-digit audit (data-quality / fraud screen) -----------
    // The classic fabricated-numbers screen: the leading significant
    // digit of order totals against Benford's log10(1 + 1/d), with the
    // expected shares pre-quantized to the same micro-integer literals
    // on both engines (the q_rank_ndcg discount-weight discipline).
    // Leading digit comes off the cent-integer's decimal rendering —
    // invariant under the ×100, no float log anywhere. One map-side-
    // combined groupBy into ≤ 9 cells; the total broadcasts back.
    "q_benford_audit" -> ((s, d) => {
      val pexp = Seq(301030L, 176091L, 124939L, 96910L, 79181L,
        66947L, 57992L, 51153L, 45757L)
      val digits = Tables.orders(s, d)
        .select(substring(floor(col("o_totalprice") * lit(100.0) +
          lit(0.5)).cast("long").cast("string"), 1, 1).cast("long")
          .as("digit"))
        .filter(col("digit") >= 1)
      digits.groupBy(col("digit"))
        .agg(count(lit(1)).as("n_obs"))
        .crossJoin(broadcast(digits.agg(count(lit(1)).as("n_all"))))
        .select(col("digit"), col("n_obs"),
          expr("(1000000 * n_obs) div n_all").as("p_obs_u"),
          element_at(typedLit(pexp), col("digit").cast("int"))
            .as("p_exp_u"))
        .orderBy(col("digit"))
    }),

    // -- decile lift chart (model-eval companion to q_auc_roc) -------------
    // Gains-table evaluation of the same is-English scorer: global
    // deciles of the (score DESC, id) ranking via the distributed
    // prefix pass (never a single-partition window — the
    // q_histogram_eqdepth machinery), positive share per decile as
    // integer lift vs the base rate. The 1e6·n_pos·n product stays in
    // int64 to ~10⁸ docs; beyond that the lift numerator widens to
    // DECIMAL.
    "q_decile_lift" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars").cast("double").as("score"),
          when(col("lang") === "en", 1L).otherwise(0L).as("pos"),
          lit(1L).as("one"))
      val n = docs.count()
      val tot = docs.agg(sum(col("pos")).as("p_all"))
      graft.engine.Dist.globalPrefixSum(docs, "score", asc = false,
          "doc_id", "one", s.sparkContext.defaultParallelism)
        .withColumn("decile", expr(s"((cum - 1) * 10) div $n"))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_rows"), sum(col("pos")).as("n_pos"))
        .crossJoin(broadcast(tot))
        .select(col("decile"), col("n_rows"), col("n_pos"),
          when(col("p_all") > 0,
            expr(s"(1000000 * n_pos * $n) div (n_rows * p_all)"))
            .as("lift_u"))
        .orderBy(col("decile"))
    }),

    // -- grouped weighted median (quantity-weighted price) -----------------
    // The weighted order statistic plain percentile can't express: the
    // price point at which half the UNITS (not half the line items)
    // have shipped, per return flag. Lower weighted median on exact
    // integers under the (price cents, line id) total order. With only
    // 3 groups a naive per-group sort window serializes the corpus
    // onto 3 tasks — the probe measured 5.8× at 10× data — so this is
    // the TWO-PHASE exact form: (1) weight mass per $100 price bin
    // (map-side combined, bins × groups bounded), a prefix over the
    // tiny bin frame locates the median bin and its exclusive weight
    // offset; (2) only that bin's rows (~1/10³ of the corpus) are
    // sorted to pin the exact row. Bin = a monotone function of price,
    // so the two-phase answer is IDENTICAL to the full sort — the
    // oracle keeps the direct window formulation as proof.
    "q_weighted_median" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_returnflag"),
          floor(col("l_extendedprice") * lit(100.0) + lit(0.5))
            .cast("long").as("price_c"),
          col("l_quantity").cast("long").as("qty"),
          col("l_orderkey") * lit(16L) + col("l_linenumber").cast("long"))
        .toDF("l_returnflag", "price_c", "qty", "lid")
        .withColumn("bin", expr("price_c div 10000"))
      val bins = li.groupBy(col("l_returnflag"), col("bin"))
        .agg(sum(col("qty")).as("bw"))
      val tot = li.groupBy(col("l_returnflag"))
        .agg(sum(col("qty")).as("w_all"), count(lit(1)).as("n_lines"))
      val wBin = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("bin").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tgt = bins.withColumn("cumb", sum(col("bw")).over(wBin))
        .join(broadcast(tot), "l_returnflag")
        .filter(col("cumb") * 2 >= col("w_all"))
        .groupBy(col("l_returnflag"))
        .agg(min(struct(col("bin"), col("cumb"), col("bw"))).as("tb"),
          first(col("w_all")).as("w_all"),
          first(col("n_lines")).as("n_lines"))
        .select(col("l_returnflag"), col("tb.bin").as("mbin"),
          (col("tb.cumb") - col("tb.bw")).as("w_off"),
          col("w_all"), col("n_lines"))
      val wRow = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("price_c").asc, col("lid").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      li.join(broadcast(tgt), "l_returnflag")
        .filter(col("bin") === col("mbin"))
        .withColumn("cum", sum(col("qty")).over(wRow) + col("w_off"))
        .filter(col("cum") * 2 >= col("w_all"))
        .groupBy(col("l_returnflag"))
        .agg(min(struct(col("cum"), col("lid"), col("price_c")))
          .as("m"), first(col("w_all")).as("w_all"),
          first(col("n_lines")).as("n_lines"))
        .select(col("l_returnflag"), col("n_lines"), col("w_all"),
          col("m.price_c").as("wmedian_c"))
        .orderBy(col("l_returnflag"))
    }),

    // -- rolling window quantiles (7-day revenue median / max) -------------
    // The time-series smoothing readout EWMA can't give: exact order
    // statistics over a 7-day moving frame. The moving frame holds ≤ 7
    // integer day totals, so the exact lower median comes from sorting
    // the collected frame in place — no approximate sketch, no
    // re-ranking pass. Data-sized work is the one day-keyed aggregate;
    // the window runs on the bounded day frame (q_changepoint class).
    "q_rolling_quantile" -> ((s, d) => {
      val day = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(sum(floor(col("value")).cast("long")).as("rd"))
      val w = Window.orderBy(col("day")).rowsBetween(-6, 0)
      day.withColumn("win", sort_array(collect_list(col("rd")).over(w)))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("rd"),
          element_at(col("win"), ((size(col("win")) + 1) / 2)
            .cast("int")).as("med7"),
          element_at(col("win"), size(col("win"))).as("max7"))
        .orderBy(col("day"))
    }),

    // -- cross-metric correlation matrix (daily co-movement) ---------------
    // Which metrics move together day over day: Pearson correlation for
    // every event-type pair on the daily totals. The data-sized work is
    // one (day, type) aggregate; the pair frame is the bounded day
    // matrix self-joined on day (≤ |types|²·days rows), with exact
    // integer co-moment sums and ONE fixed double expression per pair —
    // the q_ab_test contract, never Spark's streaming corr kernel
    // (merge-order-dependent) on the hot path.
    "q_corr_matrix" -> ((s, d) => {
      val day = Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(sum(floor(col("value")).cast("long")).as("rd"))
      val a = day.select(col("day"), col("event_type").as("t1"),
        col("rd").as("x"))
      val b = day.select(col("day"), col("event_type").as("t2"),
        col("rd").as("y"))
      a.join(b, "day").filter(col("t1") < col("t2"))
        .groupBy(col("t1"), col("t2"))
        .agg(count(lit(1)).as("n_days"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        .select(col("t1"), col("t2"), col("n_days"),
          round((col("sxy").cast("double") -
            col("sx").cast("double") * col("sy") / col("n_days")) /
            (sqrt(col("sxx").cast("double") -
              col("sx").cast("double") * col("sx") / col("n_days")) *
             sqrt(col("syy").cast("double") -
              col("sy").cast("double") * col("sy") / col("n_days"))), 6)
            .as("corr"))
        .orderBy(col("t1"), col("t2"))
    }),

    // -- fulfillment SLA: ship-lag percentiles per priority -----------------
    // Exact p50/p90 of order-to-ship days per priority WITHOUT a
    // per-group row sort: lag values live on a small integer domain, so
    // the percentiles come off the (priority, lag) CONTINGENCY frame —
    // count per distinct lag, prefix within priority, smallest lag
    // whose cumulative count crosses the rank threshold (lower
    // percentile contract, ceil via the cum·k ≥ q·n comparison). The
    // same trick q_auc_roc uses: the shuffle carries only the bounded
    // contingency frame, never the line items.
    "q_ship_lag" -> ((s, d) => {
      val lag = Tables.lineitem(s, d)
        .join(Tables.orders(s, d),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority"),
          datediff(col("l_shipdate"), col("o_orderdate")).cast("long")
            .as("lag_d"))
      val g = lag.groupBy(col("o_orderpriority"), col("lag_d"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("lag_d"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      g.withColumn("cum", sum(col("c")).over(w))
        .join(broadcast(lag.groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"))), "o_orderpriority")
        .groupBy(col("o_orderpriority"))
        .agg(first(col("n")).as("n_lines"),
          min(when(col("cum") * 2 >= col("n"), col("lag_d")))
            .as("p50_lag"),
          min(when(col("cum") * 10 >= col("n") * 9, col("lag_d")))
            .as("p90_lag"),
          max(col("lag_d")).as("max_lag"))
        .orderBy(col("o_orderpriority"))
    }),

    // -- target encoding (smoothed category → rate feature) ----------------
    // The categorical-feature workhorse of tabular ML, done exactly:
    // per brand, the above-global-mean rate shrunk toward the global
    // prior with pseudo-count m = 10 — enc = (pos + m·prior)/(n + m) as
    // the integer (1e6·pos + m·prior_u) div (n + m), so rare brands
    // collapse to the prior instead of memorizing noise. Global mean
    // and prior are exact integer aggregates broadcast back; one
    // brand-keyed aggregate carries the data-sized work.
    "q_target_encode" -> ((s, d) => {
      val p = Tables.part(s, d)
        .select(col("p_brand"),
          floor(col("p_retailprice") * lit(100.0) + lit(0.5))
            .cast("long").as("price_c"))
      val glob = p.agg(count(lit(1)).as("n_all"),
        sum(col("price_c")).as("s_all"))
        .select(col("n_all"), expr("s_all div n_all").as("gm_c"))
      val labeled = p.crossJoin(broadcast(glob))
        .withColumn("pos",
          (col("price_c") > col("gm_c")).cast("int").cast("long"))
      val prior = labeled.agg(count(lit(1)).as("np"),
        sum(col("pos")).as("pp"))
        .select(expr("(1000000 * pp) div np").as("prior_u"))
      labeled.groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"), sum(col("pos")).as("pos"))
        .crossJoin(broadcast(prior))
        .select(col("p_brand"), col("n"), col("pos"),
          expr("(1000000 * pos + 10 * prior_u) div (n + 10)")
            .as("enc_u"),
          col("prior_u"))
        .orderBy(col("p_brand"))
    }),

    // -- right-to-be-forgotten sweep (deletion audit) ------------------------
    // The GDPR/CCPA erasure pass that completes the privacy stack
    // (q_anonymize, q_kanon, q_dp_*): given a deletion request list (a
    // deterministic stand-in: the 20 lowest user ids), report per event
    // type what a scrub would delete vs retain — the audit artifact a
    // compliance pipeline logs BEFORE rewriting partitions. The request
    // list broadcasts (it is always tiny relative to the corpus); the
    // fact side never shuffles, one conditional aggregate.
    "q_forget_user" -> ((s, d) => {
      val doomed = Tables.events(s, d)
        .select(col("user_id")).distinct()
        .orderBy(col("user_id")).limit(20)
        .withColumnRenamed("user_id", "del_uid")
      Tables.events(s, d)
        .join(broadcast(doomed), col("user_id") === col("del_uid"),
          "left")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("del_uid").isNotNull, 1L).otherwise(0L))
            .as("n_deleted"),
          sum(when(col("del_uid").isNull, 1L).otherwise(0L))
            .as("n_retained"))
        .orderBy(col("event_type"))
    }),

    // -- difference-in-differences (quasi-experimental lift) ----------------
    // The observational-causal estimator the A/B stack needs when
    // treatment wasn't randomized at t0: arm × period means around the
    // Jan-16 cut, DiD = (treat_post − treat_pre) − (ctrl_post −
    // ctrl_pre). Four conditional moment sums in ONE scan and ONE
    // 1-row aggregate; means are fixed double expressions over exact
    // milli-integer sums (the q_ab_test contract).
    "q_diff_in_diff" -> ((s, d) => {
      val cut = lit("2024-01-16").cast("timestamp")
      def cell(a: Int, post: Boolean) = {
        val cond = pmod(col("user_id"), lit(2)) === a &&
          (if (post) col("ts") >= cut else col("ts") < cut)
        (sum(when(cond, col("vq"))).as(s"s_${a}_${if (post) "b" else "a"}"),
         count(when(cond, lit(1))).as(s"n_${a}_${if (post) "b" else "a"}"))
      }
      val e = Tables.events(s, d).select(col("user_id"), col("ts"),
        floor(col("value") * lit(1000.0) + lit(0.5)).cast("long")
          .as("vq"))
      val (s0a, n0a) = cell(0, post = false); val (s0b, n0b) = cell(0, post = true)
      val (s1a, n1a) = cell(1, post = false); val (s1b, n1b) = cell(1, post = true)
      e.agg(s0a, n0a, s0b, n0b, s1a, n1a, s1b, n1b)
        .select(
          round(col("s_0_a").cast("double") / col("n_0_a") / 1000.0, 6)
            .as("ctrl_pre"),
          round(col("s_0_b").cast("double") / col("n_0_b") / 1000.0, 6)
            .as("ctrl_post"),
          round(col("s_1_a").cast("double") / col("n_1_a") / 1000.0, 6)
            .as("treat_pre"),
          round(col("s_1_b").cast("double") / col("n_1_b") / 1000.0, 6)
            .as("treat_post"),
          round((col("s_1_b").cast("double") / col("n_1_b") / 1000.0 -
            col("s_1_a").cast("double") / col("n_1_a") / 1000.0) -
            (col("s_0_b").cast("double") / col("n_0_b") / 1000.0 -
             col("s_0_a").cast("double") / col("n_0_a") / 1000.0), 6)
            .as("did"))
    }),

    // -- graph modularity (partition-quality score) --------------------------
    // How partitioned the co-purchase graph is under its connected
    // components: Q = (4m² − Σ_c deg_c²) / 4m² for a partition with no
    // between-community edges, emitted as the exact integer micro
    // score. Components come from the SAME large/small-star helper the
    // dedup pipeline uses; degree sums are two keyed aggregates. The
    // deg_c² sums stay in int64 to m ≈ 10⁹ edges.
    "q_modularity" -> ((s, d) => {
      val e = coEdges(s, d).select(col("p1"), col("p2")).pinned
      val m = e.count()
      val labels = graft.functions.ConnectedComponents.largeSmallStar(
        e.select(col("p1").as("d1"), col("p2").as("d2")))
      val deg = e.select(col("p1").as("node")).union(
          e.select(col("p2")))
        .groupBy(col("node")).agg(count(lit(1)).as("dg"))
      val comm = deg.join(labels, col("node") === col("v"))
        .groupBy(col("lbl"))
        .agg(sum(col("dg")).as("deg_c"), count(lit(1)).as("sz"))
      comm.agg(count(lit(1)).as("n_communities"),
          max(col("sz")).as("largest"),
          sum(col("deg_c") * col("deg_c")).as("sd"))
        .select(col("n_communities"), col("largest"), lit(m).as("m_edges"),
          // DECIMAL(38,0) numerator (HUGEINT in the oracle twin): the
          // 1e6-scaled 4m² product leaves int64 already at m ≈ 1.5e6
          // edges (4m²·1e6 > 2⁶³) — far below the deg_c² sums' own
          // m ≈ 1e9 ceiling. 4m²·1e6 ≈ 4e24 at m = 1e9 sits well
          // inside 38 digits; the quotient is ≤ 1e6 so the final
          // BIGINT cast is always exact.
          expr(s"CAST((CAST(1000000 AS DECIMAL(38,0)) * " +
            s"(4 * CAST(${m} AS DECIMAL(38,0)) * ${m}L - sd)) div " +
            s"(4 * CAST(${m} AS DECIMAL(38,0)) * ${m}L) AS BIGINT)")
            .as("q_u"))
    }),

    // -- forecast backtest (seasonal-naive, WMAPE scored) -------------------
    // The forecasting-eval loop a metrics warehouse runs nightly:
    // predict each day as the same weekday last week (the
    // seasonal-naive baseline every real model must beat), scored over
    // the held-out back half (days ≥ Jan 17) with integer MAE and
    // weighted-MAPE micro — WMAPE, not MAPE, so zero-revenue days can't
    // divide by zero. One (type, day) aggregate, one keyed self-join on
    // the shifted date; both frames bounded at types × days.
    "q_forecast_backtest" -> ((s, d) => {
      val day = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(floor(col("value")).cast("long")).as("rd"))
      val pred = day.select(col("event_type"),
        date_add(col("day"), 7).as("day"), col("rd").as("pred"))
      day.join(pred, Seq("event_type", "day"))
        .filter(col("day") >= lit("2024-01-17").cast("date"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          sum(abs(col("rd") - col("pred"))).as("sae"),
          sum(col("rd")).as("sa"))
        .select(col("event_type"), col("n_days"),
          expr("sae div n_days").as("mae_d"),
          when(col("sa") > 0, expr("(1000000 * sae) div sa"))
            .as("wmape_u"))
        .orderBy(col("event_type"))
    }),

    // -- ABC / Pareto classification (inventory analytics) ------------------
    // The 80/15/5 revenue-concentration classing every ops team runs:
    // parts ranked by revenue descending, class A while the cumulative
    // share stays within 80%, B to 95%, C after — ranks from the
    // distributed prefix pass (q_decile_lift's machinery, never a
    // single-partition window), thresholds compared in exact integer
    // cross-products. Output is the bounded 3-row class summary.
    "q_abc_class" -> ((s, d) => {
      val rev = Tables.lineitem(s, d)
        .groupBy(col("l_partkey"))
        .agg(sum(floor(col("l_extendedprice") * lit(100.0) + lit(0.5))
          .cast("long")).as("rev_c"))
        .select(col("l_partkey"), col("rev_c"),
          col("rev_c").cast("double").as("score"))
      val tot = rev.agg(sum(col("rev_c")).as("t_all"))
      graft.engine.Dist.globalPrefixSum(rev, "score", asc = false,
          "l_partkey", "rev_c", s.sparkContext.defaultParallelism)
        .crossJoin(broadcast(tot))
        .select(col("rev_c"),
          when(col("cum") * 10 <= col("t_all") * 8, "A")
            .when(col("cum") * 20 <= col("t_all") * 19, "B")
            .otherwise("C").as("abc"))
        .groupBy(col("abc"))
        .agg(count(lit(1)).as("n_parts"), sum(col("rev_c")).as("rev_c"))
        .crossJoin(broadcast(tot))
        // share as a 6dp double ratio: a 1e6-scaled integer numerator
        // overflows int64 near 9e12 revenue cents (the q_gini lesson)
        .select(col("abc"), col("n_parts"), col("rev_c"),
          round(col("rev_c").cast("double") / col("t_all"), 6)
            .as("share"))
        .orderBy(col("abc"))
    }),

    // -- growth accounting (new / retained / resurrected / churned) ---------
    // The canonical MAU decomposition: every week's actives split into
    // new (first-ever week), retained (also active last week), and
    // resurrected (returning after a gap); churned counts last week's
    // actives who went silent. Weeks are integer epoch-week offsets
    // from the corpus start — no calendar/locale surface to disagree
    // on. One distinct (user, week) frame, a per-user min, and two
    // self-joins shifted by one week — all user-keyed; the output is
    // bounded at the week count.
    "q_growth_accounting" -> ((s, d) => {
      val uw = Tables.events(s, d)
        .select(col("user_id"),
          expr("datediff(to_date(ts), DATE '2024-01-01') div 7")
            .as("wk"))
        .distinct()
      val firstW = uw.groupBy(col("user_id")).agg(min(col("wk")).as("fw"))
      val prev = uw.select(col("user_id"), (col("wk") + 1).as("wk"),
        lit(1L).as("was_prev"))
      val cur = uw.join(firstW, "user_id")
        .join(prev, Seq("user_id", "wk"), "left")
        .select(col("wk"),
          when(col("wk") === col("fw"), 1L).otherwise(0L).as("is_new"),
          when(col("wk") =!= col("fw") && col("was_prev").isNotNull, 1L)
            .otherwise(0L).as("is_ret"),
          when(col("wk") =!= col("fw") && col("was_prev").isNull, 1L)
            .otherwise(0L).as("is_res"))
        .groupBy(col("wk"))
        .agg(sum(col("is_new")).as("n_new"),
          sum(col("is_ret")).as("n_retained"),
          sum(col("is_res")).as("n_resurrected"))
      val churned = uw.select(col("user_id"), (col("wk") + 1).as("wk"))
        .join(uw, Seq("user_id", "wk"), "left_anti")
        .groupBy(col("wk")).agg(count(lit(1)).as("n_churned"))
      cur.join(churned, Seq("wk"), "full_outer")
        .select(col("wk"), coalesce(col("n_new"), lit(0L)).as("n_new"),
          coalesce(col("n_retained"), lit(0L)).as("n_retained"),
          coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"),
          coalesce(col("n_churned"), lit(0L)).as("n_churned"))
        .orderBy(col("wk"))
    }),

    // -- bot-candidate detection (rate + regularity heuristics) -------------
    // The trust-and-safety screen over the event stream: automation
    // shows up as a HIGH request rate with LOW inter-arrival
    // dispersion (humans are bursty — q_burstiness's logic applied to
    // time). Per user: integer events-per-hour over the active span,
    // and the coefficient of variation of inter-arrival gaps from
    // exact SECOND-resolution moment sums (µs² would overflow int64 at
    // month-long gaps). One user-keyed lag window + one aggregate;
    // top-20 by rate is the review queue.
    "q_bot_detect" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      val gaps = Tables.eventsWithTime(s, d)
        .select(col("user_id"), col("ts_us"))
        .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
        // integer div, not a double cast: DuckDB CAST(DOUBLE AS BIGINT)
        // rounds while Spark truncates — `div`/`//` agree exactly
        .withColumn("gap_s", expr("(ts_us - prev_us) div 1000000"))
      gaps.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          (max(col("ts_us")) - min(col("ts_us"))).as("span_us"),
          count(col("gap_s")).as("n_gaps"),
          sum(col("gap_s")).as("sg"),
          sum(col("gap_s") * col("gap_s")).as("sgg"))
        .filter(col("n_gaps") >= 2 && col("span_us") > 0)
        .select(col("user_id"), col("n_events"),
          expr("(n_events * 3600000000L) div span_us").as("rate_h"),
          round(sqrt((col("sgg").cast("double") -
            col("sg").cast("double") * col("sg") / col("n_gaps")) /
            col("n_gaps")) /
            (col("sg").cast("double") / col("n_gaps")), 6).as("gap_cv"))
        .orderBy(col("rate_h").desc, col("user_id"))
        .limit(20)
    }),

    // -- Theil–Sen robust trend (median of pairwise slopes) ------------------
    // The outlier-immune alternative to the OLS trend: the median of
    // all pairwise day-slopes of the revenue series, in exact
    // micro-integers (each slope is an integer division; the median is
    // an order statistic, so no float accumulates anywhere). The day
    // frame is bounded, so the pair explosion is days²/2 — the
    // q_changepoint bounded-tail class — while the data-sized work
    // stays one keyed aggregate.
    "q_theilsen" -> ((s, d) => {
      val day = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .groupBy(expr("datediff(to_date(ts), DATE '2024-01-01')")
          .cast("long").as("di"))
        .agg(sum(floor(col("value")).cast("long")).as("rd"))
      val a = day.select(col("di").as("d1"), col("rd").as("r1"))
      val b = day.select(col("di").as("d2"), col("rd").as("r2"))
      val slopes = a.join(b, col("d1") < col("d2"))
        .select(expr("(1000000 * (r2 - r1)) div (d2 - d1)")
          .as("slope_u"))
      val n = slopes.count()
      val w = Window.orderBy(col("slope_u"))
      slopes.withColumn("rn", row_number().over(w))
        .filter(col("rn") === (n + 1) / 2)
        .crossJoin(broadcast(day.agg(count(lit(1)).as("n_days"))))
        .select(col("n_days"), lit(n).as("n_pairs"),
          col("slope_u").as("slope_med_u"))
    }),

    // -- relationship-cardinality audit (data-modeling profiler) ------------
    // What a schema-discovery pass asserts before anyone writes a join:
    // per declared relation, the left fan-out distribution and whether
    // the right side is actually unique — the difference between a
    // safe N:1 lookup and a silent row-multiplying N:M. Each relation
    // is two keyed aggregates; nothing joins.
    "q_cardinality_audit" -> ((s, d) => {
      def rel(name: String, left: DataFrame, lk: String,
              right: DataFrame, rk: String) = {
        val l = left.groupBy(col(lk)).agg(count(lit(1)).as("c"))
          .agg(count(lit(1)).as("n_keys"), sum(col("c")).as("n_rows"),
            max(col("c")).as("max_fanout"))
        val r = right.groupBy(col(rk)).agg(count(lit(1)).as("c"))
          .agg(max(col("c")).as("rmax"))
        l.crossJoin(broadcast(r)).select(lit(name).as("relation"),
          col("n_rows"), col("n_keys"), col("max_fanout"),
          (col("rmax") === 1).cast("int").cast("long")
            .as("right_unique"),
          when(col("rmax") === 1,
            when(col("max_fanout") === 1, "1:1").otherwise("N:1"))
            .otherwise("N:M").as("rel_class"))
      }
      rel("lineitem.orderkey->orders", Tables.lineitem(s, d),
          "l_orderkey", Tables.orders(s, d), "o_orderkey")
        .unionByName(rel("orders.custkey->customer", Tables.orders(s, d),
          "o_custkey", Tables.customer(s, d), "c_custkey"))
        .unionByName(rel("lineitem.partkey->part", Tables.lineitem(s, d),
          "l_partkey", Tables.part(s, d), "p_partkey"))
        .orderBy(col("relation"))
    }),

    // -- foreign-key discovery (inclusion coefficients) ---------------------
    // The other half of the profiler: how much of a candidate child
    // column's domain is contained in the candidate parent key —
    // inclusion ≈ 1e6 means an FK, low values kill the hypothesis.
    // Distinct key sets first (the corpus collapses to its key
    // domains), then a broadcast-friendly semi-join count per pair.
    "q_fk_inclusion" -> ((s, d) => {
      def inc(name: String, left: DataFrame, lk: String,
              right: DataFrame, rk: String) = {
        val lset = left.select(col(lk).as("k")).distinct()
        val rset = right.select(col(rk).as("k")).distinct()
        val nl = lset.agg(count(lit(1)).as("n_child"))
        val ni = lset.join(rset, Seq("k"), "left_semi")
          .agg(count(lit(1)).as("n_contained"))
        nl.crossJoin(broadcast(ni)).select(lit(name).as("candidate"),
          col("n_child"), col("n_contained"),
          expr("(1000000 * n_contained) div n_child").as("inclusion_u"))
      }
      inc("lineitem.l_partkey in part.p_partkey",
          Tables.lineitem(s, d), "l_partkey", Tables.part(s, d),
          "p_partkey")
        .unionByName(inc("orders.o_custkey in customer.c_custkey",
          Tables.orders(s, d), "o_custkey", Tables.customer(s, d),
          "c_custkey"))
        .unionByName(inc("events.user_id in customer.c_custkey",
          Tables.events(s, d), "user_id", Tables.customer(s, d),
          "c_custkey"))
        .unionByName(inc("part.p_partkey in lineitem.l_partkey",
          Tables.part(s, d), "p_partkey", Tables.lineitem(s, d),
          "l_partkey"))
        .orderBy(col("candidate"))
    }),

    // -- Holt linear-trend exponential smoothing (level + trend) -----------
    // The next rung above q_ewma (level only) and the adaptive
    // counterpart of q_forecast_backtest's frozen seasonal-naive: the
    // classic double-exponential recursion l_t = αy_t + (1−α)(l+b),
    // b_t = β(l_t − l) + (1−β)b, per daily event volume. The split
    // mirrors q_pca_power: the DATA-SIZED work is one map-side-combined
    // day aggregation; the inherently-sequential recursion then runs
    // driver-local on the calendar-bounded day frame (30 rows here;
    // ~36.5k rows per century at any corpus size — never data-sized).
    // Determinism: counts are exact integers and the recursion is
    // IDENTICAL double arithmetic in identical order on both sides —
    // the oracle replays it as a recursive CTE with the same literal
    // α = 0.3, β = 0.1 and the same expression shapes. Calendar gap
    // days, if any, are treated as consecutive recursion steps.
    "q_holt_linear" -> ((s, d) => {
      import s.implicits._
      val days = dailyCounts(s, d)
      holtRecursion(days).toDF("d", "y", "l", "b", "f")
        .select(col("d"), col("y"), round(col("l"), 6).as("level"),
          round(col("b"), 6).as("trend"),
          round(col("f"), 6).as("fitted"),
          round(col("y").cast("double") - col("f"), 6).as("err"))
        .orderBy(col("d"))
    }),

    // -- Holt-Winters additive (level + trend + weekly seasonality) --------
    // The triple-exponential rung above q_holt_linear: the recursion
    // additionally carries the last 7 seasonal offsets, so the one-step
    // forecast l + b + s_{t−7} absorbs the day-of-week cycle
    // q_seasonal_dow measures statically. Same architecture split: the
    // data-sized step is the day aggregate; the recursion is driver-
    // local on the calendar-bounded frame, replayed by the oracle as a
    // recursive CTE whose state row carries the seasonal window as a
    // LIST column (rotate-and-append each step). Standard init: l₆ =
    // mean(week 1), b₆ = (mean(week 2) − mean(week 1))/7 (0 if the
    // series is shorter than 14 days), s_i = y_i − l₆; α=0.3, β=0.1,
    // γ=0.2. Identical double arithmetic in identical order on both
    // engines; output starts at t = 7.
    "q_holt_winters" -> ((s, d) => {
      import s.implicits._
      val byDay = Tables.events(s, d)
        .groupBy(datediff(to_date(col("ts")),
          lit("1970-01-01").cast("date")).cast("long").as("d"))
        .agg(count(lit(1)).as("y"))
        .orderBy(col("d"))
      val days = byDay.collect().map(r => (r.getLong(0), r.getLong(1)))
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Double, Double, Double, Double, Double)]
      if (days.length >= 8) {
        val l0 = days.take(7).map(_._2).sum.toDouble / 7.0
        var b = if (days.length >= 14)
          (days.slice(7, 14).map(_._2).sum.toDouble / 7.0 - l0) / 7.0
        else 0.0
        var l = l0
        val sl = scala.collection.mutable.Queue(
          days.take(7).map(x => x._2.toDouble - l0): _*)
        var t = 7
        while (t < days.length) {
          val y = days(t)._2
          val s7 = sl.dequeue()
          val f = l + b + s7
          val lN = 0.3 * (y - s7) + 0.7 * (l + b)
          b = 0.1 * (lN - l) + 0.9 * b
          val sNew = 0.2 * (y - lN) + 0.8 * s7
          l = lN
          sl.enqueue(sNew)
          out += ((days(t)._1, y, l, b, sNew, f, y - f))
          t += 1
        }
      }
      out.toSeq.toDF("d", "y", "l", "b", "s", "f", "e")
        .select(col("d"), col("y"), round(col("l"), 6).as("level"),
          round(col("b"), 6).as("trend"),
          round(col("s"), 6).as("seasonal"),
          round(col("f"), 6).as("fitted"),
          round(col("e"), 6).as("err"))
        .orderBy(col("d"))
    }),

    // -- Kaplan-Meier product-limit survival (with Greenwood SE) -----------
    // The estimator q_hazard_curve's life table exists to feed: survival
    // S(t) = Π(1 − d/n) over event times, with Greenwood's variance
    // Σ d/(n(n−d)). Products become prefix sums of nano-quantized
    // ln((n−d)/n) integers — exact, order-free — and both prefix windows
    // run on the calendar-bounded day frame (the q_changepoint class);
    // the data-sized step is the same user-keyed first-activity/first-
    // purchase aggregate the hazard query uses. An exhausted risk set
    // (d = n, ln 0) pins S and its SE to exactly 0 from that point on
    // via a prefix flag instead of a sentinel log value.
    "q_kaplan_meier" -> ((s, d) => {
      val winEnd = lit("2024-01-31").cast("date")
      val u = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(min(to_date(col("ts"))).as("first_day"),
          min(when(col("event_type") === "purchase", to_date(col("ts"))))
            .as("purch_day"))
        .select(
          when(col("purch_day").isNotNull,
            datediff(col("purch_day"), col("first_day")))
            .otherwise(datediff(winEnd, col("first_day")))
            .cast("long").as("t"),
          col("purch_day").isNotNull.cast("int").cast("long").as("ev"))
      val byT = u.groupBy(col("t"))
        .agg(sum(col("ev")).as("d_events"),
          sum(lit(1L) - col("ev")).as("c_censored"))
      val wDesc = Window.orderBy(col("t").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val lt = byT.withColumn("n_risk",
        sum(col("d_events") + col("c_censored")).over(wDesc))
      val nD = col("n_risk").cast("double")
      val dD = col("d_events").cast("double")
      val terms = lt
        .withColumn("lq", when(col("d_events") < col("n_risk"),
          floor(log((nD - dD) / nD) * lit(1e9) + lit(0.5)).cast("long"))
          .otherwise(lit(0L)))
        .withColumn("gq", when(col("d_events") < col("n_risk"),
          floor(dD / (nD * (nD - dD)) * lit(1e12) + lit(0.5))
            .cast("long")).otherwise(lit(0L)))
        .withColumn("zf",
          when(col("d_events") === col("n_risk"), 1L).otherwise(0L))
      val wAsc = Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      terms
        .withColumn("cuml", sum(col("lq")).over(wAsc))
        .withColumn("cumg", sum(col("gq")).over(wAsc))
        .withColumn("zeroed", sum(col("zf")).over(wAsc))
        .select(col("t"), col("n_risk"), col("d_events"),
          col("c_censored"),
          when(col("zeroed") > 0, 0.0).otherwise(
            round(exp(col("cuml").cast("double") / lit(1e9)), 6))
            .as("surv"),
          when(col("zeroed") > 0, 0.0).otherwise(
            round(exp(col("cuml").cast("double") / lit(1e9)) *
              sqrt(col("cumg").cast("double") / lit(1e12)), 6))
            .as("se_greenwood"))
        .orderBy(col("t"))
    }),

    // -- approximate functional-dependency discovery (g3 error) ------------
    // The third leg of the schema profiler (with q_cardinality_audit and
    // q_fk_inclusion): for each candidate determinant → dependent pair,
    // the g3 measure — the minimum number of rows to delete before the
    // FD holds exactly, i.e. Σ_keys (group size − majority dependent
    // count). Two keyed aggregations per candidate ((det, dep) counts,
    // then the per-det majority), nothing joins, and the audited frame
    // collapses to the key domain before any cross-candidate union —
    // the profiler never moves row-sized data.
    "q_fd_check" -> ((s, d) => {
      def fd(name: String, df: DataFrame, det: String, dep: String) = {
        val cd = df.groupBy(col(det).as("k"), col(dep).as("v"))
          .agg(count(lit(1)).as("c"))
        val per = cd.groupBy(col("k"))
          .agg(sum(col("c")).as("n"), max(col("c")).as("mx"))
        per.agg(count(lit(1)).as("n_keys"), sum(col("n")).as("n_rows"),
            sum(col("n") - col("mx")).as("violations"))
          .select(lit(name).as("fd"), col("n_rows"), col("n_keys"),
            col("violations"),
            round(col("violations").cast("double") /
              col("n_rows").cast("double"), 6).as("g3_rate"),
            (col("violations") === 0L).cast("int").cast("long")
              .as("holds"))
      }
      fd("documents.source->lang", Tables.documents(s, d),
          "source", "lang")
        .unionByName(fd("customer.c_nationkey->c_mktsegment",
          Tables.customer(s, d), "c_nationkey", "c_mktsegment"))
        .unionByName(fd("orders.o_custkey->o_orderpriority",
          Tables.orders(s, d), "o_custkey", "o_orderpriority"))
        .unionByName(fd("lineitem.l_partkey->l_suppkey",
          Tables.lineitem(s, d), "l_partkey", "l_suppkey"))
        .orderBy(col("fd"))
    }),

    // -- leave-one-source-out influence (data valuation) -------------------
    // The cheapest member of the data-valuation family: how much does
    // dropping source s move the corpus-level metric? For linear metrics
    // (means/rates) the leave-one-group-out delta is CLOSED-FORM from
    // one keyed aggregate + the broadcast global moments — no retraining
    // loop, no per-candidate rescan, the property that makes it the
    // screen a 100 TB curation pipeline actually runs before the
    // expensive per-source ablation experiments. Reported for the mean
    // document length and the length-gate pass rate.
    "q_loo_influence" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("source"), col("n_chars"),
          when(col("n_chars") >= 300, 1L).otherwise(0L).as("pass"))
      val bySrc = docs.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sc"),
          sum(col("pass")).as("np"))
      val g = docs.agg(count(lit(1)).as("nn"), sum(col("n_chars")).as("tc"),
        sum(col("pass")).as("tp"))
      val nnD = col("nn").cast("double"); val ndD = col("n_docs").cast("double")
      val rest = nnD - ndD
      bySrc.crossJoin(broadcast(g))
        .select(col("source"), col("n_docs"),
          round(col("sc").cast("double") / ndD, 6).as("mean_src"),
          when(rest =!= 0.0, round(
            (col("tc").cast("double") - col("sc").cast("double")) / rest -
              col("tc").cast("double") / nnD, 6)).as("delta_mean"),
          when(rest =!= 0.0, round(
            (col("tp").cast("double") - col("np").cast("double")) / rest -
              col("tp").cast("double") / nnD, 6)).as("delta_passrate"))
        .orderBy(col("source"))
    }),

    // -- propensity-stratified treatment-effect estimate -------------------
    // The observational-causal counterpart of q_ab_test/q_cuped: when
    // assignment is NOT randomized (here: who converts to purchaser),
    // compare outcomes within strata of a confounder and weight the
    // per-stratum gaps. The confounder is user activity count; strata
    // are activity QUINTILES by exact order statistics computed on the
    // distinct-count frame (domain-bounded — the q_mann_whitney
    // argument; ties stay in one stratum by construction, so no per-row
    // global rank is ever needed). Per-user outcomes are exact integer
    // floor-divisions; per-stratum arms aggregate exactly; the weighted
    // ATE folds micro-quantized effects with integer weights in
    // DECIMAL. Scale: one user-keyed aggregate + a broadcast stratum
    // map; nothing data-sized shuffles twice.
    "q_propensity_strat" -> ((s, d) => {
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      // treatment = the user's FIRST event (min event_id — globally
      // unique, so min_by is deterministic) is a purchase: a non-
      // randomized ~20/80 split plausibly confounded with activity,
      // which is exactly what the stratification adjusts for. "Every
      // user eventually purchases" would leave an empty control arm —
      // first-event status does not.
      val u = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          floor(col("value") * lit(1000.0) + lit(0.5)).cast("long")
            .as("vq"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("x"),
          (min_by(col("event_type"), col("event_id")) === "purchase")
            .cast("int").cast("long").as("treat"),
          sum(col("vq")).as("sv"))
        .withColumn("yq", expr("sv div x"))
      val byX = u.groupBy(col("x")).agg(count(lit(1)).as("cnt"))
      val wx = Window.orderBy(col("x"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val strat = byX
        .withColumn("cum", sum(col("cnt")).over(wx))
        .crossJoin(broadcast(byX.agg(sum(col("cnt")).as("nu"))))
        .withColumn("stratum", expr("((cum - cnt) * 5) div nu"))
        .select(col("x"), col("stratum"))
      val byS = u.join(broadcast(strat), "x")
        .groupBy(col("stratum"))
        .agg(count(lit(1)).as("n"), sum(col("treat")).as("nt"),
          sum(col("treat") * col("yq")).as("syt"),
          sum((lit(1L) - col("treat")) * col("yq")).as("syc"))
        .withColumn("nc", col("n") - col("nt"))
      val mt = col("syt").cast("double") / col("nt").cast("double") /
        lit(1000.0)
      val mc = col("syc").cast("double") / col("nc").cast("double") /
        lit(1000.0)
      val withEff = byS
        .withColumn("effq", when(col("nt") > 0L && col("nc") > 0L,
          floor((mt - mc) * lit(1e6) + lit(0.5)).cast("long")))
      val ate = withEff.filter(col("effq").isNotNull)
        .agg(sum(dec(col("n")) * dec(col("effq"))).as("swe"),
          sum(col("n")).as("sn"))
      withEff.crossJoin(broadcast(ate))
        .select(col("stratum"), col("n"), col("nt"), col("nc"),
          when(col("nt") > 0L, round(mt, 6)).as("mean_treat"),
          when(col("nc") > 0L, round(mc, 6)).as("mean_ctrl"),
          when(col("effq").isNotNull,
            col("effq").cast("double") / lit(1e6)).as("effect"),
          when(col("sn").isNotNull && col("sn") > 0L,
            round(col("swe").cast("double") /
              col("sn").cast("double") / lit(1e6), 6)).as("ate"))
        .orderBy(col("stratum"))
    }),

    // -- Hill tail-index estimator (heavy-tail exponent) -------------------
    // The power-law companion of q_zipf_fit, pointed at document LENGTH:
    // α̂ = k / Σᵢ ln(xᵢ/x₍ₖ₊₁₎) over the top-k order statistics — the
    // number a curation pipeline reads before deciding length caps
    // (finite-mean tails truncate safely; α ≤ 1 means the longest docs
    // dominate total bytes). k adapts as min(100, n/2) so small corpora
    // stay defined. Scale: the only data-sized step is the global top-
    // (k+1) (TakeOrdered — no full sort); log-ratios are nano-quantized
    // on the bounded k-row frame and summed exactly.
    "q_hill_tail" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"),
        col("n_chars"))
      val k = math.max(1, math.min(100, (docs.count() / 2).toInt))
      val top = docs.orderBy(col("n_chars").desc, col("doc_id"))
        .limit(k + 1)
      val r = top.withColumn("rn", row_number().over(
        Window.orderBy(col("n_chars").desc, col("doc_id"))))
      val xm = r.filter(col("rn") === k + 1)
        .select(col("n_chars").as("xmin"))
      r.filter(col("rn") <= k).crossJoin(broadcast(xm))
        .withColumn("lq", floor(log(col("n_chars").cast("double") /
          col("xmin").cast("double")) * lit(1e9) + lit(0.5))
          .cast("long"))
        .groupBy(col("xmin"))
        .agg(count(lit(1)).as("k"), sum(col("lq")).as("slq"))
        .select(col("k"), col("xmin"),
          when(col("slq") > 0L, round(col("k").cast("double") /
            (col("slq").cast("double") / lit(1e9)), 6)).as("alpha"))
    }),

    // -- autocorrelation function (daily volume, lags 1-7) -----------------
    // The stationarity readout q_seasonal_dow and q_holt_linear both
    // implicitly assume: how much does today's volume predict tomorrow's
    // (lag 1) vs next week's (lag 7)? Deviations are made SCALE-FREE
    // before quantization — d_t = y_t/ȳ − 1 — so the micro-quantized
    // integer products can never overflow no matter how large daily
    // counts grow (the constant factor cancels in the ACF ratio; the
    // full-series denominator is the standard estimator). Everything
    // after the one day aggregate runs on the calendar-bounded frame:
    // the 7-lag fan-out is a bounded explode joined on the dense day
    // index.
    "q_acf" -> ((s, d) => {
      val byDay = Tables.events(s, d)
        .groupBy(datediff(to_date(col("ts")),
          lit("1970-01-01").cast("date")).cast("long").as("dd"))
        .agg(count(lit(1)).as("y"))
      val g = byDay.agg(count(lit(1)).as("n"), sum(col("y")).as("sy"))
      val idx = byDay
        .withColumn("t", row_number().over(Window.orderBy(col("dd")))
          .cast("long"))
        .crossJoin(broadcast(g))
        .withColumn("dq", floor((col("y").cast("double") /
          (col("sy").cast("double") / col("n").cast("double")) -
          lit(1.0)) * lit(1e6) + lit(0.5)).cast("long"))
        .select(col("t"), col("dq"))
      val den = idx.agg(sum(col("dq") * col("dq")).as("den"))
      val a = idx.withColumn("k", explode(expr("sequence(1, 7)")))
        .select(col("k").cast("long").as("k"), (col("t") + col("k"))
          .as("tk"), col("dq").as("dqa"))
      val pairs = a.join(idx.select(col("t").as("tk"),
        col("dq").as("dqb")), "tk")
      pairs.groupBy(col("k"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("dqa") * col("dqb")).as("num"))
        .crossJoin(broadcast(den))
        .select(col("k").as("lag"), col("n_pairs"),
          when(col("den") > 0L, round(col("num").cast("double") /
            col("den").cast("double"), 6)).as("acf"))
        .orderBy(col("lag"))
    }),

    // -- Ljung–Box portmanteau test on the daily series (r14) ---------------
    // The decision on top of q_acf's readout: are the first 7
    // autocorrelations JOINTLY zero, or is the series autocorrelated
    // enough that the i.i.d. modeling the A/B rows assume is unsafe?
    // Q = n(n+2)·Σ_{k≤7} r_k²/(n−k), df = 7. Reuses the exact q_acf
    // chain (scale-free micro deviations, integer lag co-moments); each
    // r_k²/(n−k) term nano-quantizes BEFORE the sum so the only
    // cross-row aggregation is integer; the 5% decision compares
    // against the χ²₇ literal (14.067140) rather than shipping an
    // incomplete-gamma approximation.
    "q_ljung_box" -> ((s, d) => {
      val byDay = Tables.events(s, d)
        .groupBy(datediff(to_date(col("ts")),
          lit("1970-01-01").cast("date")).cast("long").as("dd"))
        .agg(count(lit(1)).as("y"))
      val g = byDay.agg(count(lit(1)).as("n"), sum(col("y")).as("sy"))
      val idx = byDay
        .withColumn("t", row_number().over(Window.orderBy(col("dd")))
          .cast("long"))
        .crossJoin(broadcast(g))
        .withColumn("dq", floor((col("y").cast("double") /
          (col("sy").cast("double") / col("n").cast("double")) -
          lit(1.0)) * lit(1e6) + lit(0.5)).cast("long"))
        .select(col("t"), col("dq"), col("n"))
      val den = idx.agg(sum(col("dq") * col("dq")).as("den"),
        max(col("n")).as("n"))
      val a = idx.withColumn("k", explode(expr("sequence(1, 7)")))
        .select(col("k").cast("long").as("k"), (col("t") + col("k"))
          .as("tk"), col("dq").as("dqa"))
      val pairs = a.join(idx.select(col("t").as("tk"),
        col("dq").as("dqb")), "tk")
      val rks = pairs.groupBy(col("k"))
        .agg(sum(col("dqa") * col("dqb")).as("num"))
        .crossJoin(broadcast(den))
        .select(col("k"), col("n"),
          floor((col("num").cast("double") / col("den").cast("double")) *
            (col("num").cast("double") / col("den").cast("double")) /
            (col("n") - col("k")).cast("double") * lit(1e9) +
            lit(0.5)).cast("long").as("term_u"))
      rks.groupBy(col("n"))
        .agg(sum(col("term_u")).as("s_u"))
        .select(col("n").as("n_days"), lit(7L).as("df"),
          round(col("n").cast("double") * (col("n") + lit(2L)) *
            (col("s_u").cast("double") / lit(1e9)), 6).as("q_stat"),
          (col("n").cast("double") * (col("n") + lit(2L)) *
            (col("s_u").cast("double") / lit(1e9)) > 14.067140)
            .as("reject_5pct"))
    }),

    // -- matrix profile over the daily series (r14) --------------------------
    // The motif/discord discovery primitive (Yeh et al., ICDM'16,
    // simplified to the classic exact all-window form): for every
    // 7-day window of the daily-volume series, the squared Euclidean
    // distance to its nearest OTHER window (trivial-match exclusion
    // |a−b| ≥ 4), on mean-centered integer deviations dev = y·7 − Σwin
    // (scaled by 7 so centering never leaves the integers). The
    // profile's global minimum marks the series' repeated motif, the
    // maximum its discord (anomalous week). Every distance is an exact
    // integer; ties break to the smaller neighbor index. The window
    // frame is the CALENDAR (≤ a few hundred rows at any corpus size) —
    // the all-pairs step is day-frame-bounded, the q_cusum class.
    "q_matrix_profile" -> ((s, d) => {
      val byDay = Tables.events(s, d)
        .groupBy(datediff(to_date(col("ts")),
          lit("1970-01-01").cast("date")).cast("long").as("dd"))
        .agg(count(lit(1)).as("y"))
      val idx = byDay
        .withColumn("t", row_number().over(Window.orderBy(col("dd")))
          .cast("long"))
        .select(col("t"), col("y"))
      val ex = idx
        .withColumn("off", explode(expr("sequence(0, 6)")))
        .select((col("t") - col("off")).as("wt"),
          col("off").cast("long").as("off"), col("y"))
        .filter(col("wt") >= 1)
      val sums = ex.groupBy(col("wt"))
        .agg(count(lit(1)).as("n7"), sum(col("y")).as("sw"))
        .filter(col("n7") === 7)
        .select(col("wt"), col("sw"))
      val devs = ex.join(sums, "wt")
        .select(col("wt"), col("off"),
          (col("y") * lit(7L) - col("sw")).as("dev"))
      val a = devs.select(col("wt").as("ta"), col("off"),
        col("dev").as("da"))
      val b = devs.select(col("wt").as("tb"), col("off"),
        col("dev").as("db"))
      val d2 = a.join(b, Seq("off"))
        .filter(abs(col("ta") - col("tb")) >= 4)
        .groupBy(col("ta"), col("tb"))
        .agg(sum((col("da") - col("db")) * (col("da") - col("db")))
          .as("d2"))
      val wNN = Window.partitionBy(col("ta"))
        .orderBy(col("d2").asc, col("tb").asc)
      val prof = d2.withColumn("rn", row_number().over(wNN))
        .filter(col("rn") === 1)
        .select(col("ta").as("t"), col("tb").as("nn"), col("d2"))
      val glob = prof.agg(min(col("d2")).as("mn"), max(col("d2")).as("mx"))
      prof.crossJoin(broadcast(glob))
        .select(col("t"), col("nn"), col("d2"),
          (col("d2") === col("mn")).as("is_motif"),
          (col("d2") === col("mx")).as("is_discord"))
        .orderBy(col("t"))
    }),

    // -- value-pattern profiling (shape mining) ----------------------------
    // The data-profiling classic the FD/cardinality audits don't cover:
    // what SHAPES live in a string column? Each value masks to its
    // character classes (lowercase→a, uppercase→A, digit→9, everything
    // else verbatim) and the top-5 shapes per column come back with
    // exact shares — the screen that catches a stray free-text value in
    // a code column or a second date format in an ingest feed. One
    // keyed aggregate per column; the rank window runs per column on
    // the bounded distinct-pattern frame.
    "q_pattern_profile" -> ((s, d) => {
      def mask(c: org.apache.spark.sql.Column) =
        regexp_replace(regexp_replace(regexp_replace(c,
          "[a-z]", "a"), "[A-Z]", "A"), "[0-9]", "9")
      def prof(name: String, df: DataFrame, cn: String) =
        df.select(mask(col(cn)).as("pattern"))
          .groupBy(col("pattern")).agg(count(lit(1)).as("n"))
          .withColumn("col_name", lit(name))
      val all = prof("customer.c_mktsegment", Tables.customer(s, d),
          "c_mktsegment")
        .unionByName(prof("documents.source", Tables.documents(s, d),
          "source"))
        .unionByName(prof("events.props", Tables.events(s, d), "props"))
      val wTot = Window.partitionBy(col("col_name"))
      val wRnk = Window.partitionBy(col("col_name"))
        .orderBy(col("n").desc, col("pattern"))
      all
        .withColumn("tot", sum(col("n")).over(wTot))
        .withColumn("rnk", row_number().over(wRnk).cast("long"))
        .filter(col("rnk") <= 5)
        .select(col("col_name"), col("rnk"), col("pattern"), col("n"),
          expr("(1000000 * n) div tot").as("share_u"))
        .orderBy(col("col_name"), col("rnk"))
    }),

    // -- surrogate-key sequence audit --------------------------------------
    // The ingest-integrity screen for identifier columns: density of the
    // [min, max] range (gaps betray dropped batches), duplicate count
    // (betrays replayed batches), both from one aggregate per column —
    // count, distinct, min, max are all semigroup-mergeable, so the
    // audit is a single map-side-combined pass per table regardless of
    // scale.
    "q_sequence_audit" -> ((s, d) => {
      def audit(name: String, df: DataFrame, cn: String) =
        df.select(col(cn).cast("long").as("k"))
          .agg(count(lit(1)).as("n"),
            count_distinct(col("k")).as("n_distinct"),
            min(col("k")).as("kmin"), max(col("k")).as("kmax"))
          .select(lit(name).as("key_col"), col("n"), col("n_distinct"),
            col("kmin"), col("kmax"),
            (col("kmax") - col("kmin") + lit(1L) - col("n_distinct"))
              .as("gaps"),
            (col("n") - col("n_distinct")).as("dupes"),
            ((col("kmax") - col("kmin") + lit(1L) === col("n_distinct"))
              && (col("n") === col("n_distinct"))).cast("int")
              .cast("long").as("is_dense"))
      audit("documents.doc_id", Tables.documents(s, d), "doc_id")
        .unionByName(audit("embeddings.vec_id", Tables.embeddings(s, d),
          "vec_id"))
        .unionByName(audit("events.event_id", Tables.events(s, d),
          "event_id"))
        .unionByName(audit("orders.o_orderkey", Tables.orders(s, d),
          "o_orderkey"))
        .unionByName(audit("customer.c_custkey", Tables.customer(s, d),
          "c_custkey"))
        .orderBy(col("key_col"))
    }),

    // -- audience-overlap matrix (exact pairwise distinct intersections) ---
    // The segment-overlap readout behind every "reach" dashboard: for
    // each pair of event types, how many distinct users do both, and
    // the Jaccard of the two audiences. EXACT, without sketches: the
    // corpus first collapses to the distinct (user, type) frame — at
    // most |users|·|types| rows regardless of event volume — and the
    // pair expansion self-joins ON THE USER KEY (co-partitioned, never
    // cartesian), emitting at most C(|types|,2) rows per user. The
    // sketch alternative (q_hll_merge) trades this exactness for one
    // pass; this is the reconciliation query that audits it.
    "q_audience_overlap" -> ((s, d) => {
      val ut = Tables.events(s, d)
        .select(col("user_id"), col("event_type")).distinct()
      val szs = ut.groupBy(col("event_type")).agg(count(lit(1)).as("nu"))
      val both = ut.select(col("user_id"), col("event_type").as("t1"))
        .join(ut.select(col("user_id"), col("event_type").as("t2")),
          "user_id")
        .filter(col("t1") < col("t2"))
        .groupBy(col("t1"), col("t2")).agg(count(lit(1)).as("n_both"))
      both
        .join(szs.select(col("event_type").as("t1"), col("nu").as("n1")),
          "t1")
        .join(szs.select(col("event_type").as("t2"), col("nu").as("n2")),
          "t2")
        .select(col("t1"), col("t2"), col("n1"), col("n2"), col("n_both"),
          round(col("n_both").cast("double") /
            (col("n1") + col("n2") - col("n_both")).cast("double"), 6)
            .as("jaccard"))
        .orderBy(col("t1"), col("t2"))
    }),

    // -- Qini uplift curve (incremental response by targeting decile) ------
    // The uplift-model evaluation companion of q_propensity_strat: if we
    // could only "treat" the top-x% by a targeting score, how many
    // INCREMENTAL responders would the treatment buy vs the control
    // baseline? Users rank by activity (the available targeting signal)
    // into blocked deciles — the same domain-bounded distinct-count
    // quantile trick, DESC so decile 0 is the most active. The curve is
    // cumulative exact integers (responders/arm sizes prefix-summed on
    // the 10-row frame); Qini_d = Rt − Rc·Nt/Nc and the random-targeting
    // diagonal evaluate in one mirrored double expression each.
    "q_qini_uplift" -> ((s, d) => {
      val u = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          floor(col("value") * lit(1000.0) + lit(0.5)).cast("long")
            .as("vq"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("x"),
          (min_by(col("event_type"), col("event_id")) === "purchase")
            .cast("int").cast("long").as("treat"),
          sum(col("vq")).as("sv"))
        .withColumn("resp",
          (expr("sv div x") >= 50000L).cast("int").cast("long"))
      val byX = u.groupBy(col("x")).agg(count(lit(1)).as("cnt"))
      val wx = Window.orderBy(col("x").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val dec = byX
        .withColumn("cum", sum(col("cnt")).over(wx))
        .crossJoin(broadcast(byX.agg(sum(col("cnt")).as("nu"))))
        .withColumn("decile", expr("((cum - cnt) * 10) div nu"))
        .select(col("x"), col("decile"))
      val byD = u.join(broadcast(dec), "x")
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n"), sum(col("treat")).as("nt"),
          sum(col("treat") * col("resp")).as("rt"),
          sum((lit(1L) - col("treat")) * col("resp")).as("rc"))
      val wc = Window.orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = byD
        .withColumn("cn", sum(col("n")).over(wc))
        .withColumn("cnt_t", sum(col("nt")).over(wc))
        .withColumn("crt", sum(col("rt")).over(wc))
        .withColumn("crc", sum(col("rc")).over(wc))
        .withColumn("cnc", col("cn") - col("cnt_t"))
      val tot = byD.agg(sum(col("n")).as("tn"), sum(col("nt")).as("tnt"),
        sum(col("rt")).as("trt"), sum(col("rc")).as("trc"))
      cum.crossJoin(broadcast(tot))
        .select(col("decile"), col("n"), col("cnt_t").as("cum_nt"),
          col("cnc").as("cum_nc"), col("crt").as("cum_rt"),
          col("crc").as("cum_rc"),
          when(col("cnc") > 0L, round(col("crt").cast("double") -
            col("crc").cast("double") * col("cnt_t").cast("double") /
              col("cnc").cast("double"), 6)).as("qini"),
          when(col("tn") - col("tnt") > 0L, round(
            (col("trt").cast("double") - col("trc").cast("double") *
              col("tnt").cast("double") /
              (col("tn") - col("tnt")).cast("double")) *
              col("cn").cast("double") / col("tn").cast("double"), 6))
            .as("qini_random"))
        .orderBy(col("decile"))
    }),

    // -- mutual information between categorical columns --------------------
    // The feature-dependence measure q_chi2_select's statistic doesn't
    // give directly: MI in nats (how many nats does knowing A say about
    // B) plus the normalized MI/√(H_A·H_B) that makes pairs comparable.
    // Each audited pair is one keyed cell count; per-cell p·ln terms are
    // nano-quantized on the bounded cell frame (|A|·|B| cells) and
    // summed exactly — the engine never moves row-sized data after the
    // count.
    "q_mutual_info" -> ((s, d) => {
      // r14 replan: the r13 shape built each pair's margins by
      // re-aggregating the cells SUBTREE (ma/mb/nn/ha/hb), which planned
      // 24 FileScans across the 3 source tables (8 per leg; AQE exchange
      // reuse recovered only part). Now the three narrow projections
      // union FIRST (pair-keyed, the oracle's own shape), ONE groupBy
      // builds every pair's cells in a single shuffle, and margins /
      // totals / entropies come from windows over the tiny cell frame
      // (≤ |domA|·|domB| ≈ 175 rows per pair — attribute domains, never
      // corpus-sized). 3 scans, 1 data-sized shuffle at any scale.
      import org.apache.spark.sql.expressions.Window
      val src = Tables.documents(s, d)
          .select(lit("documents.lang~source").as("pair"),
            col("lang").cast("string").as("a"),
            col("source").cast("string").as("b"))
        .unionByName(Tables.orders(s, d)
          .select(lit("orders.status~priority").as("pair"),
            col("o_orderstatus").cast("string").as("a"),
            col("o_orderpriority").cast("string").as("b")))
        .unionByName(Tables.customer(s, d)
          .select(lit("customer.segment~nation").as("pair"),
            col("c_mktsegment").cast("string").as("a"),
            col("c_nationkey").cast("string").as("b")))
      val cells = src.groupBy(col("pair"), col("a"), col("b"))
        .agg(count(lit(1)).as("c"))
      val wa = Window.partitionBy(col("pair"), col("a"))
      val wb = Window.partitionBy(col("pair"), col("b"))
      val wp = Window.partitionBy(col("pair"))
      val cD = col("c").cast("double")
      val nD = col("n").cast("double")
      val t = cells
        .withColumn("cnt_a", sum(col("c")).over(wa))
        .withColumn("cnt_b", sum(col("c")).over(wb))
        .withColumn("n", sum(col("c")).over(wp))
        .withColumn("ra", row_number().over(wa.orderBy(col("b"))))
        .withColumn("rb", row_number().over(wb.orderBy(col("a"))))
        .withColumn("tq", floor(cD / nD *
          log(cD * nD / (col("cnt_a").cast("double") *
            col("cnt_b").cast("double"))) * lit(1e9) + lit(0.5))
          .cast("long"))
        // entropies charge each margin value ONCE (its first cell)
        .withColumn("haq", when(col("ra") === 1,
          floor(-(col("cnt_a").cast("double") / nD) *
            log(col("cnt_a").cast("double") / nD) * lit(1e9) + lit(0.5))
            .cast("long")).otherwise(lit(0L)))
        .withColumn("hbq", when(col("rb") === 1,
          floor(-(col("cnt_b").cast("double") / nD) *
            log(col("cnt_b").cast("double") / nD) * lit(1e9) + lit(0.5))
            .cast("long")).otherwise(lit(0L)))
      t.groupBy(col("pair"))
        .agg(max(col("n")).as("n"), count(lit(1)).as("n_cells"),
          sum(col("tq")).as("miq"),
          sum(col("haq")).as("ha"), sum(col("hbq")).as("hb"))
        .select(col("pair"), col("n"), col("n_cells"),
          round(col("miq").cast("double") / lit(1e9), 6).as("mi"),
          when(col("ha") > 0L && col("hb") > 0L,
            round(col("miq").cast("double") / lit(1e9) /
              sqrt(col("ha").cast("double") / lit(1e9) *
                (col("hb").cast("double") / lit(1e9))), 6)).as("nmi"))
        .orderBy(col("pair"))
    }),

    // -- weight of evidence + information value (scorecard profiling) ------
    // The credit-scorecard screen for a categorical feature against a
    // binary outcome: per-category WoE = ln(p_good/p_bad) with 0.5
    // Laplace smoothing (so empty arms stay finite), and the IV sum that
    // ranks features before any model sees them. Outcome: the order is
    // urgent-or-high priority; feature: the customer's market segment.
    // One shuffle join orders⋈customer, then everything is exact
    // integers on the |segments|-cell frame; WoE/IV evaluate in one
    // mirrored double expression with nano-quantized IV contributions.
    "q_woe_iv" -> ((s, d) => {
      val oc = Tables.orders(s, d)
        .select(col("o_custkey"),
          col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            .cast("int").cast("long").as("good"))
        .join(Tables.customer(s, d).select(
          col("c_custkey").as("o_custkey"), col("c_mktsegment")
            .as("seg")), "o_custkey")
      val cells = oc.groupBy(col("seg"))
        .agg(count(lit(1)).as("n"), sum(col("good")).as("g"))
        .withColumn("b", col("n") - col("g"))
      val tot = cells.agg(sum(col("g")).as("gg"), sum(col("b")).as("bb"),
        count(lit(1)).as("k"))
      val pg = (col("g").cast("double") + lit(0.5)) /
        (col("gg").cast("double") + lit(0.5) * col("k").cast("double"))
      val pb = (col("b").cast("double") + lit(0.5)) /
        (col("bb").cast("double") + lit(0.5) * col("k").cast("double"))
      val withWoe = cells.crossJoin(broadcast(tot))
        .withColumn("woeq",
          floor(log(pg / pb) * lit(1e9) + lit(0.5)).cast("long"))
        .withColumn("ivq",
          floor((pg - pb) * log(pg / pb) * lit(1e9) + lit(0.5))
            .cast("long"))
      val iv = withWoe.agg(sum(col("ivq")).as("sivq"))
      withWoe.crossJoin(broadcast(iv))
        .select(col("seg"), col("n"), col("g").as("n_good"),
          col("b").as("n_bad"),
          (col("woeq").cast("double") / lit(1e9)).as("woe"),
          (col("ivq").cast("double") / lit(1e9)).as("iv_contrib"),
          round(col("sivq").cast("double") / lit(1e9), 6).as("iv_total"))
        .orderBy(col("seg"))
    }),

    // -- degree assortativity (customer-supplier trade graph) --------------
    // Pearson correlation of endpoint degrees across edges of the shared
    // bipartite graph (q_degree_dist's construction): do high-degree
    // customers trade with high-degree suppliers? Negative r is the
    // hub-spoke signature. Degrees come from one keyed aggregate, join
    // back onto the symmetrized edge list ON THE ENDPOINT KEYS, and the
    // correlation derives from exact DECIMAL moment sums in one
    // mirrored expression — the q_group_ols shape on graph data.
    "q_assortativity" -> ((s, d) => {
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val e0 = tradeEdgesEnc(s, d)  // shared memoized edge list
      val edges = e0.union(
        e0.select(col("dst").as("src"), col("src").as("dst")))
      val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      val xy = edges
        .join(deg.select(col("src"), col("deg").as("dx")), "src")
        .join(deg.select(col("src").as("dst"), col("deg").as("dy")),
          "dst")
      val m = xy.agg(count(lit(1)).as("m"),
        sum(dec(col("dx"))).as("sx"), sum(dec(col("dy"))).as("sy"),
        sum(dec(col("dx")) * dec(col("dx"))).as("sxx"),
        sum(dec(col("dy")) * dec(col("dy"))).as("syy"),
        sum(dec(col("dx")) * dec(col("dy"))).as("sxy"))
      val mD = col("m").cast("double")
      val num = mD * col("sxy").cast("double") -
        col("sx").cast("double") * col("sy").cast("double")
      val dx2 = mD * col("sxx").cast("double") -
        col("sx").cast("double") * col("sx").cast("double")
      val dy2 = mD * col("syy").cast("double") -
        col("sy").cast("double") * col("sy").cast("double")
      m.select(expr("m div 2").as("n_edges"),
        when(dx2 > 0.0 && dy2 > 0.0,
          round(num / sqrt(dx2 * dy2), 6)).as("assortativity"))
    }),

    // -- Markov conditional entropy (event-sequence predictability) --------
    // The information-theoretic readout on top of q_transition_matrix:
    // per current state, the entropy of the next-event distribution, and
    // the overall conditional entropy H(next|cur) — how predictable the
    // event stream is one step ahead (0 = deterministic chains,
    // ln 5 ≈ 1.609 = uniform). Transitions come from a user-keyed lag
    // window (users carry the parallelism); per-cell p·ln terms are
    // nano-quantized on the |states|² frame and summed exactly (the
    // q_mutual_info discipline).
    "q_markov_entropy" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val pairs = Tables.eventsWithTime(s, d)
        .select(col("user_id"), col("event_id"), col("ts_us"),
          col("event_type").as("cur"))
        .withColumn("nxt", lead(col("cur"), 1).over(w))
        .filter(col("nxt").isNotNull)
      val cells = pairs.groupBy(col("cur"), col("nxt"))
        .agg(count(lit(1)).as("c"))
      val byCur = cells.groupBy(col("cur")).agg(sum(col("c")).as("nc"))
      val terms = cells.join(byCur, "cur")
        .withColumn("hq", floor(
          -(col("c").cast("double") / col("nc").cast("double")) *
            log(col("c").cast("double") / col("nc").cast("double")) *
            lit(1e9) + lit(0.5)).cast("long"))
        .groupBy(col("cur"))
        .agg(max(col("nc")).as("n_pairs"), sum(col("hq")).as("hcq"))
      val tot = terms.agg(sum(col("n_pairs")).as("nn"))
      val glob = terms.crossJoin(broadcast(tot))
        .withColumn("wq", floor(
          col("n_pairs").cast("double") / col("nn").cast("double") *
            (col("hcq").cast("double") / lit(1e9)) * lit(1e9) + lit(0.5))
          .cast("long"))
        .agg(sum(col("wq")).as("hallq"))
      terms.crossJoin(broadcast(glob))
        .select(col("cur"), col("n_pairs"),
          round(col("hcq").cast("double") / lit(1e9), 6).as("h_next"),
          round(col("hallq").cast("double") / lit(1e9), 6)
            .as("h_conditional"))
        .orderBy(col("cur"))
    }),

    // -- forecast accuracy comparison (MASE model selection) ---------------
    // The readout that decides between q_holt_linear and the frozen
    // seasonal-naive of q_forecast_backtest: MAE / RMSE / MASE of both
    // one-step forecasters on the SAME evaluation days (t ≥ 7). MASE
    // scales by the naive MAE, so 1.0 is the "no better than repeating
    // last week" line. Naive errors are exact integers; Holt errors are
    // micro-quantized per day on the calendar-bounded frame and summed
    // exactly; each metric evaluates in one mirrored expression.
    "q_forecast_accuracy" -> ((s, d) => {
      import s.implicits._
      val days = dailyCounts(s, d)
      val holt = holtRecursion(days).map(r => (r._1, r._5)).toMap
      val rows = scala.collection.mutable.ArrayBuffer
        .empty[(String, Long, Long, Long)]
      var i = 7
      while (i < days.length) {
        val (dd, y) = days(i)
        val en = math.abs(y - days(i - 7)._2)
        rows += (("seasonal_naive7", dd, en * 1000000L,
          en * en * 1000000L))
        val eh = math.abs(y.toDouble - holt(dd))
        rows += (("holt_linear", dd,
          math.floor(eh * 1e6 + 0.5).toLong,
          math.floor(eh * eh * 1e6 + 0.5).toLong))
        i += 1
      }
      val df = rows.toSeq.toDF("model", "dd", "aeq", "seq")
      val agg = df.groupBy(col("model"))
        .agg(count(lit(1)).as("n_eval"), sum(col("aeq")).as("sae"),
          sum(col("seq")).as("sse"))
      val naive = agg.filter(col("model") === "seasonal_naive7")
        .select(col("sae").as("nae"), col("n_eval").as("nn"))
      agg.crossJoin(broadcast(naive))
        .select(col("model"), col("n_eval"),
          round(col("sae").cast("double") / col("n_eval") / lit(1e6), 6)
            .as("mae"),
          round(sqrt(col("sse").cast("double") / col("n_eval") /
            lit(1e6)), 6).as("rmse"),
          when(col("nae") > 0L, round(
            (col("sae").cast("double") / col("n_eval")) /
              (col("nae").cast("double") / col("nn")), 6)).as("mase"))
        .orderBy(col("model"))
    }),

    // -- price indices (Laspeyres / Paasche / Fisher) ----------------------
    // The index-number triple between a base year (1996) and a current
    // year (2000) over the parts traded in BOTH: how much of the revenue
    // change is price vs mix? Unit values per (part, period) come from
    // exact cent/milli-quantity sums and micro-quantize before the
    // basket folds; the basket sums Σp·q accumulate in DECIMAL (price ×
    // quantity products reach 1e12+ per part); the three indices
    // evaluate in mirrored expressions (Fisher = √(L·P)). Scale: one
    // part-keyed aggregate per period and one part-keyed join — the
    // basket frame is |common parts|, never row-sized.
    "q_price_index" -> ((s, d) => {
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      def period(y: Int) = Tables.lineitem(s, d)
        .filter(year(col("l_shipdate")) === y)
        .groupBy(col("l_partkey").as("pk"))
        .agg(sum(floor(col("l_extendedprice") * lit(100.0) + lit(0.5))
          .cast("long")).as("sep"),
          sum(floor(col("l_quantity") * lit(1000.0) + lit(0.5))
            .cast("long")).as("sq"))
        .filter(col("sq") > 0L)
        .withColumn("p_u", floor(col("sep").cast("double") /
          col("sq").cast("double") * lit(1e6) + lit(0.5)).cast("long"))
      val base = period(1996).select(col("pk"), col("p_u").as("p0"),
        col("sq").as("q0"))
      val cur = period(2000).select(col("pk"), col("p_u").as("p1"),
        col("sq").as("q1"))
      val basket = base.join(cur, "pk")
      val m = basket.agg(count(lit(1)).as("n_parts"),
        sum(dec(col("p1")) * dec(col("q0"))).as("l_num"),
        sum(dec(col("p0")) * dec(col("q0"))).as("l_den"),
        sum(dec(col("p1")) * dec(col("q1"))).as("p_num"),
        sum(dec(col("p0")) * dec(col("q1"))).as("p_den"))
      val lasp = col("l_num").cast("double") / col("l_den").cast("double")
      val paas = col("p_num").cast("double") / col("p_den").cast("double")
      m.select(col("n_parts"),
        round(lasp, 6).as("laspeyres"),
        round(paas, 6).as("paasche"),
        round(sqrt(lasp * paas), 6).as("fisher"))
    }),

    // -- Markov removal-effect attribution ---------------------------------
    // The data-driven alternative to q_attribution's rule-based credits:
    // model each user journey (events until first purchase) as an
    // absorbing Markov chain (states start + the 4 non-conversion event
    // types; absorbers conv/null), then credit each channel by its
    // REMOVAL EFFECT — how much the start→conv absorption probability
    // drops when every transition into that channel is severed. The
    // DATA-SIZED work is one user-keyed journey-pair extraction and a
    // ≤30-cell transition count; scenarios and the 60-step absorption
    // iteration run driver-local on the bounded matrix (the q_pca_power
    // split). Determinism: transition probabilities are EXACT integer
    // ratios ((10⁹·cnt) div total — no float division), and the
    // iteration is identical double arithmetic in identical fixed state
    // order on both engines (the oracle replays it as a 25-column
    // recursive CTE).
    "q_markov_attribution" -> ((s, d) => {
      import s.implicits._
      // journey extraction: per user, events ordered by (ts_us,
      // event_id), truncated at the first purchase (inclusive)
      val ev = Tables.eventsWithTime(s, d)
        .select(col("user_id"), col("ts_us"), col("event_id"),
          col("event_type").as("et"))
      val wu = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val marked = ev
        .withColumn("pmin", min(when(col("et") === "purchase",
          struct(col("ts_us"), col("event_id")))).over(
          Window.partitionBy(col("user_id"))))
        .filter(col("pmin").isNull ||
          struct(col("ts_us"), col("event_id")) <= col("pmin"))
        .withColumn("rn", row_number().over(wu))
        .withColumn("nxt", lead(col("et"), 1).over(wu))
        .withColumn("converted", col("pmin").isNotNull)
      val trans = marked.select(
        when(col("rn") === 1,
          struct(lit("start").as("f"),
            when(col("et") === "purchase", "conv").otherwise(col("et"))
              .as("t"))).as("first"),
        when(col("nxt").isNotNull && col("et") =!= "purchase",
          struct(col("et").as("f"),
            when(col("nxt") === "purchase", "conv").otherwise(col("nxt"))
              .as("t"))).as("step"),
        when(col("nxt").isNull && !col("converted") &&
          col("et") =!= "purchase",
          struct(col("et").as("f"), lit("null").as("t"))).as("term"))
        .select(explode(array(col("first"), col("step"), col("term")))
          .as("tr"))
        .filter(col("tr").isNotNull)
        .select(col("tr.f").as("f"), col("tr.t").as("t"))
      val counts = trans.groupBy(col("f"), col("t"))
        .agg(count(lit(1)).as("c"))
        .collect().map(r => ((r.getString(0), r.getString(1)),
          r.getLong(2))).toMap
      // driver-local: exact integer probabilities, removal scenarios,
      // 60-step absorption — bounded at 5 origins × 6 targets
      val origins = Seq("start", "click", "error", "signup", "view")
      val chans = Seq("click", "error", "signup", "view")
      val totals = origins.map(o => o ->
        counts.collect { case ((f, _), c) if f == o => c }.sum).toMap
      def p(sc: String)(f: String, t: String): Double = {
        if (sc != "base" && (t == sc || f == sc)) 0.0
        else {
          val tot = totals(f)
          if (tot == 0L) 0.0
          else (1000000000L * counts.getOrElse((f, t), 0L) / tot) / 1e9
        }
      }
      def absorb(sc: String): Double = {
        val pr = p(sc) _
        // state vector in fixed order start, click, error, signup, view
        var st = Array(1.0, 0.0, 0.0, 0.0, 0.0)
        var conv = 0.0
        var k = 0
        while (k < 60) {
          conv = conv + st(0) * pr("start", "conv") +
            st(1) * pr("click", "conv") + st(2) * pr("error", "conv") +
            st(3) * pr("signup", "conv") + st(4) * pr("view", "conv")
          val nx = new Array[Double](5)
          for ((tgt, i) <- chans.zipWithIndex) {
            nx(i + 1) = st(0) * pr("start", tgt) +
              st(1) * pr("click", tgt) + st(2) * pr("error", tgt) +
              st(3) * pr("signup", tgt) + st(4) * pr("view", tgt)
          }
          nx(0) = 0.0
          st = nx
          k += 1
        }
        conv
      }
      val base = absorb("base")
      val res = chans.map { ch =>
        val rem = absorb(ch)
        val re = if (base > 0.0) 1.0 - rem / base else 0.0
        (ch, rem, re)
      }
      val reSum = res.map(_._3).sum
      res.map { case (ch, rem, re) =>
        (ch, base, rem, re, if (reSum > 0.0) re / reSum else 0.0)
      }.toDF("channel", "b", "r", "e", "s")
        .select(col("channel"), round(col("b"), 6).as("base_conv"),
          round(col("r"), 6).as("removed_conv"),
          round(col("e"), 6).as("removal_effect"),
          round(col("s"), 6).as("attribution"))
        .orderBy(col("channel"))
    }),

    // -- log-rank test (two-group survival comparison) ---------------------
    // The inference leg of the survival family (q_hazard_curve describes,
    // q_kaplan_meier estimates, this TESTS): do week-1 adopters convert
    // on a different clock than later joiners? The classic O−E/V
    // statistic over the pooled life table — at each event time, group
    // 1's observed events against its hypergeometric expectation given
    // the shared risk sets. Per-time E and V terms are nano-quantized
    // on the DENSIFIED (time × group) day frame (a group with no row at
    // t still sits in the risk set — sparse suffix sums would silently
    // shrink it) and summed exactly; z and χ² evaluate in one mirrored
    // expression. One user-keyed aggregate is the only data-sized step.
    "q_logrank" -> ((s, d) => {
      val winEnd = lit("2024-01-31").cast("date")
      // cohorts: the user's market segment (every first activity lands
      // in week 1 on this corpus, so a calendar split would leave an
      // empty arm) — "do AUTOMOBILE/BUILDING customers convert on a
      // different clock?" Users without a customer row fall to group 0.
      val seg = Tables.customer(s, d).select(
        col("c_custkey").as("user_id"),
        col("c_mktsegment").isin("AUTOMOBILE", "BUILDING")
          .cast("int").cast("long").as("gseg"))
      val u = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(min(to_date(col("ts"))).as("first_day"),
          min(when(col("event_type") === "purchase", to_date(col("ts"))))
            .as("purch_day"))
        .join(seg, Seq("user_id"), "left")
        .select(
          coalesce(col("gseg"), lit(0L)).as("g"),
          when(col("purch_day").isNotNull,
            datediff(col("purch_day"), col("first_day")))
            .otherwise(datediff(winEnd, col("first_day")))
            .cast("long").as("t"),
          col("purch_day").isNotNull.cast("int").cast("long").as("ev"))
      val byTG = u.groupBy(col("t"), col("g"))
        .agg(sum(col("ev")).as("dd"), count(lit(1)).as("tot"))
      val gframe = byTG.select(col("t")).distinct()
        .crossJoin(broadcast(byTG.select(col("g")).distinct()))
        .join(byTG, Seq("t", "g"), "left")
        .na.fill(0L, Seq("dd", "tot"))
      val wg = Window.partitionBy(col("g")).orderBy(col("t").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val risk = gframe.withColumn("nr", sum(col("tot")).over(wg))
      val byT = risk.groupBy(col("t"))
        .agg(sum(col("dd")).as("dt"), sum(col("nr")).as("nt"),
          sum(when(col("g") === 1L, col("dd")).otherwise(0L)).as("d1"),
          sum(when(col("g") === 1L, col("nr")).otherwise(0L)).as("n1"))
        .filter(col("dt") > 0L)
      val dtD = col("dt").cast("double"); val ntD = col("nt").cast("double")
      val n1D = col("n1").cast("double")
      val terms = byT
        .withColumn("eq", floor(dtD * n1D / ntD * lit(1e9) + lit(0.5))
          .cast("long"))
        .withColumn("vq", when(col("nt") > 1L, floor(
          dtD * (n1D / ntD) * (lit(1.0) - n1D / ntD) *
            (ntD - dtD) / (ntD - lit(1.0)) * lit(1e9) + lit(0.5))
          .cast("long")).otherwise(lit(0L)))
      val gm = terms.agg(sum(col("d1")).as("o1"), sum(col("eq")).as("se"),
        sum(col("vq")).as("sv"))
      val gsz = u.groupBy(col("g")).agg(count(lit(1)).as("nu"))
      val n1u = gsz.filter(col("g") === 1L).select(col("nu").as("n1_users"))
      val n0u = gsz.filter(col("g") === 0L).select(col("nu").as("n0_users"))
      val z = (col("o1").cast("double") -
        col("se").cast("double") / lit(1e9)) /
        sqrt(col("sv").cast("double") / lit(1e9))
      gm.crossJoin(broadcast(n1u)).crossJoin(broadcast(n0u))
        .select(col("n1_users"), col("n0_users"), col("o1"),
          round(col("se").cast("double") / lit(1e9), 6).as("e1"),
          when(col("sv") > 0L, round(z, 6)).as("z"),
          when(col("sv") > 0L, round(z * z, 6)).as("chi2"))
    }),

    // -- Theil index with between/within decomposition ---------------------
    // The inequality measure q_gini can't give: Theil's T DECOMPOSES
    // exactly into between-nation and within-nation components — the
    // answer to "is order-value inequality a country story or an
    // everywhere story". Per-row terms (x/μ)·ln(x/μ) are scale-free and
    // micro-quantize safely at any corpus size (the q_acf discipline);
    // group terms live on the 25-row frame. Within = total − between by
    // the decomposition identity — reported from the same quantized
    // sums so the identity holds exactly as printed.
    "q_theil_index" -> ((s, d) => {
      val oc = Tables.orders(s, d)
        .select(col("o_custkey"),
          floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long")
            .as("x"))
        .join(Tables.customer(s, d).select(
          col("c_custkey").as("o_custkey"),
          col("c_nationkey").cast("long").as("nk")), "o_custkey")
      val g = oc.agg(count(lit(1)).as("nn"), sum(col("x")).as("xx"))
      val mu = col("xx").cast("double") / col("nn").cast("double")
      val rows = oc.crossJoin(broadcast(g))
        .withColumn("tq", floor(col("x").cast("double") / mu *
          log(col("x").cast("double") / mu) * lit(1e6) + lit(0.5))
          .cast("long"))
      val total = rows.agg(max(col("nn")).as("nn"),
        sum(col("tq")).as("stq"))
      val byN = oc.groupBy(col("nk"))
        .agg(count(lit(1)).as("ng"), sum(col("x")).as("xg"))
      val bt = byN.crossJoin(broadcast(g))
        .withColumn("bq", floor(
          col("xg").cast("double") / col("xx").cast("double") *
            log((col("xg").cast("double") / col("ng").cast("double")) /
              (col("xx").cast("double") / col("nn").cast("double"))) *
            lit(1e6) + lit(0.5)).cast("long"))
        .agg(count(lit(1)).as("n_groups"), sum(col("bq")).as("sbq"))
      val theil = col("stq").cast("double") /
        col("nn").cast("double") / lit(1e6)
      val between = col("sbq").cast("double") / lit(1e6)
      total.crossJoin(broadcast(bt))
        .select(col("nn").as("n"), col("n_groups"),
          round(theil, 6).as("theil_total"),
          round(between, 6).as("theil_between"),
          round(theil - between, 6).as("theil_within"))
    }),

    // -- Herfindahl-Hirschman concentration index --------------------------
    // The antitrust-style concentration readout per market: HHI of
    // supplier revenue shares within each nation's supply base (scaled
    // ×10⁴ as conventionally reported; 10⁴ = monopoly). Revenue sums
    // are exact cents; per-supplier share-squared terms quantize at
    // 1e9 on the supplier frame and sum exactly per nation; the
    // effective-supplier count 1/HHI comes from the same integer.
    "q_hhi" -> ((s, d) => {
      val rev = Tables.lineitem(s, d)
        .join(Tables.supplier(s, d),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_nationkey").cast("long").as("nk"),
          col("l_suppkey"))
        .agg(sum(floor(col("l_extendedprice") * lit(100.0) + lit(0.5))
          .cast("long")).as("r"))
      val tot = rev.groupBy(col("nk")).agg(sum(col("r")).as("tr"),
        count(lit(1)).as("n_suppliers"))
      val terms = rev.join(tot, "nk")
        .withColumn("sq", floor(
          (col("r").cast("double") / col("tr").cast("double")) *
            (col("r").cast("double") / col("tr").cast("double")) *
            lit(1e9) + lit(0.5)).cast("long"))
        .groupBy(col("nk"))
        .agg(max(col("n_suppliers")).as("n_suppliers"),
          sum(col("sq")).as("shq"))
      terms.select(col("nk").as("nationkey"), col("n_suppliers"),
          round(col("shq").cast("double") / lit(1e9) * lit(10000.0), 6)
            .as("hhi"),
          when(col("shq") > 0L, round(lit(1e9) /
            col("shq").cast("double"), 6)).as("effective_suppliers"))
        .orderBy(col("nationkey"))
    }),

    // -- HITS hubs & authorities over the customer→supplier graph ----------
    // Kleinberg's mutual-reinforcement centrality on the directed
    // purchase graph: customers are hubs (they point), suppliers are
    // authorities (they are pointed at). Same integer fixed-point
    // discipline as q_pagerank: scores are multiples of 1e-12, every
    // iteration's L1 normalization is one HUGEINT-exact scalar aggregate
    // broadcast back (sums ride DECIMAL(38,0) — E·1e12 outgrows int64 at
    // ~9M edges), and the per-node update joins ride the edge keys. The
    // static edge list is persisted across the 2 unrolled rounds (the
    // q_pagerank iterative-graph caching shape).
    "q_hits" -> ((s, d) => {
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      // shared memoized edge list (raw ck/sk encoding) — the memo is
      // already session-persisted, so the per-query pin is gone too
      val e0 = tradeEdges(s, d)
      // Each round's frame is persisted and the superseded iterate
      // released (the ConnectedComponents discipline): without it, the
      // normalization aggregate and the next round's join would each
      // re-execute the whole prior lineage — measured 63 s → 1.3 s warm
      // at sf0.1. The L1 total is a DRIVER SCALAR (one exact DECIMAL,
      // bounded state) folded back in as a literal, which keeps each
      // round at one aggregation job instead of a crossJoin re-plan.
      // (r16-opt note, guide §1.1: a fully-lazy restructure — totals as
      // 1-row crossJoin broadcasts, no per-round persist/collect — was
      // measured at 15.4 s warm vs 5.1 s for this shape: ReusedExchange
      // does NOT dedupe the half-step aggregate across its two consumers
      // once AQE splits them into separate broadcast-stage builds, so
      // the lineage recomputes geometrically. The driver-scalar fold-back
      // stays; the r16-opt wins here are the memoized edge list, the
      // broadcast hint on the score side of each half-step join, and
      // HALVING the job count: each half-step's L1 total is computed
      // from the PREVIOUS score vector via the degree identity
      // Σ_sk araw(sk) = Σ_(ck,sk)∈E h(ck) = Σ_ck h(ck)·outdeg(ck) — a
      // node-sized cached join instead of a second pass over the
      // edge-sized aggregate, so each half-step is ONE job (the total)
      // plus the normalized frame's own materialization, not two. Exact
      // DECIMAL(38,0) integer sums on both sides of the identity, so the
      // folded-back literal is bit-identical (oracle-verified).
      var hub = e0.select(col("ck")).distinct()
        .withColumn("h", lit(hitsScale)).pinned
      val degC = e0.groupBy(col("ck"))
        .agg(count(lit(1)).as("odeg")).pinned
      val degS = e0.groupBy(col("sk"))
        .agg(count(lit(1)).as("odeg")).pinned
      var auth: DataFrame = null
      for (_ <- 1 to hitsIters) {
        // ta = Σ_ck h(ck)·outdeg(ck): materializes hub (pinned) as a side
        // effect and never touches the edge-sized half-step frame
        val ta = hub.join(degC, "ck")
          .agg(sum(dec(col("h")) * dec(col("odeg"))))
          .collect()(0).getDecimal(0)
        if (auth != null) auth.unpersist(blocking = false)
        auth = e0.join(broadcast(hub), "ck").groupBy(col("sk"))
          .agg(sum(dec(col("h"))).as("araw"))
          .select(col("sk"),
            expr(s"(CAST($hitsScale AS DECIMAL(38,0)) * araw) div " +
              s"CAST('$ta' AS DECIMAL(38,0))").as("a")).pinned
        val th = auth.join(degS, "sk")
          .agg(sum(dec(col("a")) * dec(col("odeg"))))
          .collect()(0).getDecimal(0)
        hub.unpersist(blocking = false)
        hub = e0.join(broadcast(auth), "sk").groupBy(col("ck"))
          .agg(sum(dec(col("a"))).as("hraw"))
          .select(col("ck"),
            expr(s"(CAST($hitsScale AS DECIMAL(38,0)) * hraw) div " +
              s"CAST('$th' AS DECIMAL(38,0))").as("h")).pinned
      }
      // (the final hub materializes inside the output job — one BHJ+agg
      // over cached inputs; a pre-count here would just be an extra job)
      val hubs = hub.select(lit("hub").as("role"), col("ck").as("id"),
        col("h").as("score_fp"))
      val auths = auth.select(lit("authority").as("role"),
        col("sk").as("id"), col("a").as("score_fp"))
      hubs.union(auths)
        .select(col("role"), col("id"), col("score_fp"),
          (col("score_fp").cast("double") / lit(hitsScale.toDouble))
            .as("score"))
        .orderBy(col("role"), col("id"))
    }),

    // -- per-node clustering coefficient over the co-purchase graph --------
    // The local-density companion to q_triangle_count: cc(v) =
    // 2·tri(v) / (deg(v)·(deg(v)−1)), exact integers until the final
    // ratio. Shares coEdges and the degree-ordered wedge orientation
    // (wedges fan out from the low-degree endpoint, the scale-safe
    // shape); nodes whose wedges close nowhere still report cc = 0 via
    // the left join — absence of triangles is a value, not a dropped row.
    "q_clustering_coef" -> ((s, d) => {
      // shares the session-memoized per-node triangle counts with
      // q_triangle_count (r16-opt) — it ran the identical wedge join
      // independently before
      val e = coEdges(s, d).select(col("p1"), col("p2"))
      val deg = e.select(col("p1").as("n")).union(e.select(col("p2")))
        .groupBy(col("n")).agg(count(lit(1)).as("dg"))
      val perNode = coTriangles(s, d)
      deg.select(col("n").as("part"), col("dg").as("degree"))
        .join(perNode, Seq("part"), "left")
        .select(col("part"), col("degree"),
          coalesce(col("n_tri"), lit(0L)).as("n_tri"),
          when(col("degree") >= 2L,
            floor(lit(2.0) * coalesce(col("n_tri"), lit(0L))
                .cast("double") /
              (col("degree").cast("double") *
                (col("degree") - lit(1L)).cast("double")) * lit(1e6) +
              lit(0.5)) / lit(1e6))
            .otherwise(lit(0.0)).as("cc"))
        .orderBy(col("part"))
    }),

    // -- average precision (PR-AUC) per source -----------------------------
    // The retrieval/classifier twin of q_auc_roc on the same
    // (score = n_chars, label = lang·en) frame: AP = mean over positive
    // ranks of precision@k under the DECLARED total order (n_chars desc,
    // doc_id asc — ties are broken identically on both engines, so the
    // statistic is exact by contract). Per-term precision is integer
    // micro-quantized ((10⁶·cum_pos) div k) before the positive-row sum,
    // so the reduction is order-free integer addition; source-keyed
    // windows shuffle once on the group key.
    "q_pr_auc" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("n_chars"),
          when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("n_chars").desc, col("doc_id"))
      val ranked = docs
        .withColumn("k", row_number().over(w))
        .withColumn("cum_pos", sum(col("pos")).over(w))
      ranked.filter(col("pos") === 1L)
        .withColumn("p_u", expr("(1000000 * cum_pos) div k"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_pos"), sum(col("p_u")).as("sp"))
        .select(col("source"), col("n_pos"),
          expr("sp div n_pos").as("ap_u"))
        .orderBy(col("source"))
    }),

    // -- Lorenz curve: cumulative revenue share by customer decile ---------
    // The inequality profile behind q_gini, as the 10-point curve a
    // dashboard plots. Customer revenue is exact integer cents; the
    // global ranking is the DISTRIBUTED prefix pass (Dist.globalPrefixSums
    // — seeded-sample ranges + per-range offsets, never a single-partition
    // window), carrying the population count and the revenue sum under
    // ONE total order (revenue asc, custkey asc). Decile boundaries and
    // shares derive from exact integers; zero-order customers enter at
    // revenue 0 — a Lorenz curve over only the active customers would
    // overstate equality.
    "q_lorenz" -> ((s, d) => {
      val rev = Tables.customer(s, d).select(col("c_custkey"))
        .join(Tables.orders(s, d)
          .groupBy(col("o_custkey")).agg(
            sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5))
              .cast("long")).as("rc")),
          col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"), coalesce(col("rc"), lit(0L)).as("revc"))
        .withColumn("revd", col("revc").cast("double"))
        .withColumn("one", lit(1L))
      val cum = Dist.globalPrefixSums(rev, "revd", asc = true,
        "c_custkey", Seq("one", "revc"), Seq("cumn", "cumrev"), 32)
      val tot = rev.agg(count(lit(1)).as("n"), sum(col("revc")).as("tr"))
      cum.crossJoin(broadcast(tot))
        .withColumn("decile", expr("((cumn - 1) * 10) div n + 1"))
        .groupBy(col("decile"))
        .agg(max(col("cumn")).as("cum_customers"),
          max(col("cumrev")).as("cum_revc"),
          max(col("n")).as("n"), max(col("tr")).as("tr"))
        .select(col("decile"), col("cum_customers"),
          (floor(col("cum_customers").cast("double") /
            col("n").cast("double") * lit(1e6) + lit(0.5)) / lit(1e6))
            .as("pop_share"),
          (floor(col("cum_revc").cast("double") /
            col("tr").cast("double") * lit(1e6) + lit(0.5)) / lit(1e6))
            .as("rev_share"))
        .orderBy(col("decile"))
    })
  )

  /** Daily event counts (d = epoch day, y = count), collected ordered —
    * the calendar-bounded frame the time-series recursions run on. */
  private def dailyCounts(s: SparkSession, d: String): Array[(Long, Long)] =
    Tables.events(s, d)
      .groupBy(datediff(to_date(col("ts")),
        lit("1970-01-01").cast("date")).cast("long").as("d"))
      .agg(count(lit(1)).as("y"))
      .orderBy(col("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))

  /** Holt double-exponential recursion (α=0.3, β=0.1) — ONE
    * implementation shared by q_holt_linear and q_forecast_accuracy so
    * the oracle-pinned arithmetic cannot drift between them. Returns
    * (d, y, level, trend, one-step fitted) per day. */
  private def holtRecursion(days: Array[(Long, Long)])
      : Seq[(Long, Long, Double, Double, Double)] = {
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Double, Double, Double)]
    if (days.nonEmpty) {
      var l = days(0)._2.toDouble
      var b = if (days.length > 1) days(1)._2.toDouble - days(0)._2
              else 0.0
      out += ((days(0)._1, days(0)._2, l, b, l))
      var i = 1
      while (i < days.length) {
        val y = days(i)._2.toDouble
        val fitted = l + b
        val lNew = 0.3 * y + 0.7 * (l + b)
        b = 0.1 * (lNew - l) + 0.9 * b
        l = lNew
        out += ((days(i)._1, days(i)._2, l, b, fitted))
        i += 1
      }
    }
    out.toSeq
  }

  /** Distinct customer–supplier trade pairs (ck, sk) mined from
    * lineitem⋈orders — the shared edge list behind the trade-graph
    * family (q_pagerank / q_ppr / q_graph_bfs / q_label_propagation /
    * q_degree_dist / q_assortativity / q_hits / multiRootBfs). Before
    * r16-opt each of those queries re-mined this join per query, and the
    * iterative rows' adjacency builds referenced the mining subtree up to
    * 4× per plan with NO exchange reuse (plans/r16/q_pagerank_before.txt:
    * four independent lineitem⋈orders+distinct legs) — guide §2.4
    * "remove shuffles outright". One session memo builds the pair list
    * once, exactly as the co-purchase graph (coEdges), the 200-root BFS
    * frame, and the IVF index already do — production materializes its
    * graph once and serves every traversal from it. Consumers derive
    * their node encodings (ck·2 / sk·2+1) by bijective projection, so
    * DISTINCTness is preserved and every query's result is bit-identical
    * to the per-query mining. Bench warms the family untimed via its
    * cheapest consumer (q_degree_dist). */
  private[graft] def tradeEdges(s: SparkSession, d: String): DataFrame = {
    val pairs = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("ck"), col("l_suppkey").as("sk"))
      .distinct()
    graft.engine.SharedArtifacts.memo(
      graft.engine.SharedArtifacts.keyFor(pairs, "tradeEdges"))(pairs)
  }

  /** [[tradeEdges]] in the bipartite node encoding the traversal family
    * uses: src = ck·2 (customer), dst = sk·2+1 (supplier). A bijective
    * projection of the memoized distinct pair list — no new shuffle, no
    * change in the edge set. */
  private def tradeEdgesEnc(s: SparkSession, d: String): DataFrame =
    tradeEdges(s, d).select((col("ck") * 2).as("src"),
      (col("sk") * 2 + 1).as("dst"))

  /** PageRank fixed-point scale (ranks are multiples of 1e-12) and
    * iteration count — shared by the Spark loop and the oracle CTEs. */
  /** Co-purchase graph shared by q_triangle_count / q_link_predict /
    * q_item_recs: undirected edges (p1 < p2) between parts appearing in
    * the same order basket, kept only at support ≥ 2 — the thresholding
    * every production co-occurrence graph applies, and what keeps edge
    * density data-bounded instead of |parts|²-bounded. Same basket-array
    * pair expansion as q_freq_itemsets (one basket-keyed shuffle + one
    * pair-keyed shuffle, no self-join over the raw line-item stream). */
  private def coEdges(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey"))
    // session-memoized (SharedArtifacts): five queries (triangles, CN/RA
    // and AA link prediction, item recs, clustering coefficient) search
    // the SAME thresholded graph — build it once per session, as a
    // production deployment would materialize its co-occurrence graph
    graft.engine.SharedArtifacts.memo(
      graft.engine.SharedArtifacts.keyFor(li, "coEdges")) {
      li.groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
        .select(explode(expr(
          "flatten(transform(ps, (x, i) -> " +
            "transform(slice(ps, i + 2, size(ps)), " +
            "y -> struct(x AS p1, y AS p2))))")).as("pr"))
        .groupBy(col("pr.p1").as("p1"), col("pr.p2").as("p2"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= 2)
    }
  }

  /** Center-annotated wedge frame (u < w, center degree dg, Adamic–Adar
    * center weight aw) over [[coEdges]] — the shared expensive shuffle
    * behind q_link_predict and q_adamic_adar, built once per session.
    * Row count is Σ_v deg(v)², linear in the thresholded graph. */
  private def coWedges(s: SparkSession, d: String): DataFrame = {
    val e = coEdges(s, d).select(col("p1"), col("p2"))
    graft.engine.SharedArtifacts.memo(
      graft.engine.SharedArtifacts.keyFor(e, "coWedges")) {
      val adj = e.select(col("p1").as("v"), col("p2").as("nb"))
        .union(e.select(col("p2").as("v"), col("p1").as("nb")))
      val degW = adj.groupBy(col("v")).agg(count(lit(1)).as("dg"))
        .withColumn("aw",
          when(col("dg") >= 2L,
            floor(lit(1e6) / log(col("dg").cast("double")) + lit(0.5))
              .cast("long"))
            .otherwise(0L))
      adj.select(col("v"), col("nb").as("u"))
        .join(adj.select(col("v"), col("nb").as("w")), "v")
        .filter(col("u") < col("w"))
        .join(degW, "v")
        .select(col("u"), col("w"), col("dg"), col("aw"))
    }
  }

  /** Per-node triangle participation counts (part, n_tri) over
    * [[coEdges]] — the degree-ordered wedge-join result shared by
    * q_triangle_count and q_clustering_coef (r16-opt: both queries ran
    * this identical orientation + wedge self-join + closure join
    * independently; the wedge join is the expensive step, so it is
    * built once per session like coWedges). Deterministic: exact
    * integer counts from a deterministic edge set, so both consumers'
    * results are bit-identical to the per-query build. */
  private def coTriangles(s: SparkSession, d: String): DataFrame = {
    val e = coEdges(s, d).select(col("p1"), col("p2"))
    graft.engine.SharedArtifacts.memo(
      graft.engine.SharedArtifacts.keyFor(e, "coTriangles")) {
      val deg = e.select(col("p1").as("n")).union(e.select(col("p2")))
        .groupBy(col("n")).agg(count(lit(1)).as("dg"))
      val withDeg = e
        .join(deg.select(col("n").as("p1"), col("dg").as("d1")), "p1")
        .join(deg.select(col("n").as("p2"), col("dg").as("d2")), "p2")
      val o = withDeg.select(
        when(struct(col("d1"), col("p1")) < struct(col("d2"), col("p2")),
          col("p1")).otherwise(col("p2")).as("a"),
        when(struct(col("d1"), col("p1")) < struct(col("d2"), col("p2")),
          col("p2")).otherwise(col("p1")).as("b"),
        when(struct(col("d1"), col("p1")) < struct(col("d2"), col("p2")),
          col("d2")).otherwise(col("d1")).as("db"))
      // wedges (a; b1 < b2 in the SAME total order) close iff b1→b2
      val wedges = o.select(col("a"), col("b").as("b1"),
          col("db").as("db1"))
        .join(o.select(col("a"), col("b").as("b2"), col("db").as("db2")),
          "a")
        .filter(struct(col("db1"), col("b1")) <
          struct(col("db2"), col("b2")))
      val tris = wedges.join(
        o.select(col("a").as("b1"), col("b").as("b2")), Seq("b1", "b2"))
      tris.select(explode(array(col("a"), col("b1"), col("b2")))
          .as("part"))
        .groupBy(col("part")).agg(count(lit(1)).as("n_tri"))
    }
  }

  /** Oracle twin of [[coEdges]] — emits CTEs `b` (baskets) and `pe`
    * (thresholded pairs p1 < p2 with support). */
  private val coEdgesSql: String =
    """b AS (SELECT l_orderkey, list_sort(list(DISTINCT l_partkey)) AS ps
      |  FROM lineitem GROUP BY 1),
      |pe AS (SELECT p1, p2, count(*) AS support FROM (
      |    SELECT unnest(ps) AS p1, l_orderkey FROM b) t1
      |  JOIN (SELECT unnest(ps) AS p2, l_orderkey FROM b) t2
      |    USING (l_orderkey)
      |  WHERE p1 < p2 GROUP BY 1, 2 HAVING count(*) >= 2)""".stripMargin

  private val prScale = 1000000000000L
  private val prIters = 3

  /** HITS fixed-point scale (scores are multiples of 1e-12; each round's
    * L1 normalization rescales the total mass back to this) and the
    * unrolled iteration count — shared by the Spark loop and the oracle
    * CTEs. */
  private val hitsScale = 1000000000000L
  private val hitsIters = 2
  private val lpRounds = 3

  /** BFS hop bound — shared by the Spark loop and the oracle CTEs. */
  private val bfsHops = 3

  /** q_harmonic_centrality root-sample size — FIXED so the multi-root
    * frontier (roots × reach) stays linear in the graph; shared by the
    * Spark query and the oracle. */
  private val harmonicRoots = 200

  /** Multi-root bounded BFS distance frame (root, id, dist) over the
    * customer–supplier bipartite graph, shared by q_harmonic_centrality
    * and q_eccentricity — both read the SAME frontier computation, so it
    * is built once per session (SharedArtifacts memo, the IVF-family
    * discipline) instead of once per query. The build eagerly
    * localCheckpoints the final frame (truncating the 3-round lineage,
    * ConnectedComponents' discipline) so the per-build edge persist can
    * be released before return.
    *
    * FIXED-SIZE root sample (the 200 smallest qualifying keys, a
    * deterministic set that is append-stable): "every 50th customer"
    * alone scales the root count WITH the table, and the multi-root
    * frontier is roots × reach — at 10× data that made the r11 probe
    * 10× roots × 10× reach ⇒ quadratic growth (91 s at sf1). A bounded
    * sample keeps sampled centrality/eccentricity linear in the graph,
    * which is the entire point of sampling. */
  private def multiRootBfs(s: SparkSession, d: String): DataFrame = {
    val e0 = tradeEdgesEnc(s, d)  // shared memoized edge list
    graft.engine.SharedArtifacts.memo(
      graft.engine.SharedArtifacts.keyFor(e0, "multiRootBfs",
        harmonicRoots, bfsHops)) {
      val edges = e0.union(e0.select(col("dst").as("src"),
          col("src").as("dst")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        var dist = Tables.customer(s, d)
          .filter(pmod(col("c_custkey"), lit(50)) === 0)
          .orderBy(col("c_custkey")).limit(harmonicRoots)
          .select((col("c_custkey") * 2).as("root"),
            (col("c_custkey") * 2).as("id"), lit(0L).as("dist"))
        for (_ <- 1 to bfsHops) {
          val relaxed = edges
            .join(dist.withColumnRenamed("id", "src"), "src")
            .select(col("root"), col("dst").as("id"),
              (col("dist") + lit(1L)).as("dist"))
          dist = dist.union(relaxed)
            .groupBy(col("root"), col("id"))
            .agg(min(col("dist")).as("dist"))
        }
        // eager: materializes the frame NOW (while edges is cached) and
        // truncates lineage, so the memoized artifact carries no
        // reference to the released persist below
        dist.localCheckpoint(true)
      } finally edges.unpersist(blocking = false)
    }
  }

  /** Oracle side of the SAME bounded relaxation: each round unions the
    * previous distance table with every edge-relaxed candidate and keeps
    * the per-node min — pure integer arithmetic. */
  private def bfsSql: String = {
    val rounds = (1 to bfsHops).map { i =>
      s"""d$i AS (SELECT id, CAST(min(dist) AS BIGINT) AS dist FROM (
         |    SELECT id, dist FROM d${i - 1}
         |    UNION ALL SELECT e.dst AS id, d${i - 1}.dist + 1 AS dist
         |    FROM e JOIN d${i - 1} ON e.src = d${i - 1}.id) t
         |  GROUP BY id)""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS (SELECT DISTINCT o.o_custkey * 2 AS src,
       |    l.l_suppkey * 2 + 1 AS dst
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
       |e AS (SELECT src, dst FROM e0
       |  UNION ALL SELECT dst, src FROM e0),
       |d0 AS (SELECT c_custkey * 2 AS id, CAST(0 AS BIGINT) AS dist
       |  FROM customer WHERE c_custkey % 50 = 0),
       |$rounds
       |SELECT id,
       |  CASE WHEN id % 2 = 0 THEN 'customer' ELSE 'supplier' END
       |    AS node_type,
       |  dist
       |FROM d$bfsHops ORDER BY id""".stripMargin
  }

  /** bfsSql with the ROOT kept in the frontier key — the oracle of the
    * sampled harmonic-centrality estimator. */
  /** Shared multi-root bounded-BFS CTE chain (customer–supplier bipartite
    * graph, fixed root sample, bfsHops relaxation rounds) — the common
    * body of q_harmonic_centrality and q_eccentricity's oracles. */
  private def multiRootBfsCtes: String = {
    val rounds = (1 to bfsHops).map { i =>
      s"""d$i AS (SELECT root, id, CAST(min(dist) AS BIGINT) AS dist
         |  FROM (
         |    SELECT root, id, dist FROM d${i - 1}
         |    UNION ALL SELECT d${i - 1}.root, e.dst AS id,
         |      d${i - 1}.dist + 1 AS dist
         |    FROM e JOIN d${i - 1} ON e.src = d${i - 1}.id) t
         |  GROUP BY root, id)""".stripMargin
    }.mkString(",\n")
    s"""e0 AS (SELECT DISTINCT o.o_custkey * 2 AS src,
       |    l.l_suppkey * 2 + 1 AS dst
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
       |e AS (SELECT src, dst FROM e0
       |  UNION ALL SELECT dst, src FROM e0),
       |d0 AS (SELECT c_custkey * 2 AS root, c_custkey * 2 AS id,
       |    CAST(0 AS BIGINT) AS dist
       |  FROM (SELECT c_custkey FROM customer WHERE c_custkey % 50 = 0
       |    ORDER BY c_custkey LIMIT $harmonicRoots) r),
       |$rounds""".stripMargin
  }

  private def harmonicSql: String =
    s"""WITH $multiRootBfsCtes
       |SELECT id,
       |  CASE WHEN id % 2 = 0 THEN 'customer' ELSE 'supplier' END
       |    AS node_type,
       |  count(*) AS n_sources,
       |  CAST(CAST(sum(1000000 // dist) AS BIGINT) AS DOUBLE) / 1e6
       |    AS harmonic
       |FROM d$bfsHops WHERE dist > 0 GROUP BY id ORDER BY id""".stripMargin

  private def eccentricitySql: String =
    s"""WITH $multiRootBfsCtes
       |SELECT root,
       |  CAST(sum(CASE WHEN dist > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_reached,
       |  CAST(max(dist) AS BIGINT) AS ecc_h
       |FROM d$bfsHops GROUP BY root ORDER BY root""".stripMargin

  /** Oracle of the label-flooding rounds: per round, unlabeled nodes
    * adopt the majority neighbor label (count DESC, label ASC — a total
    * order, so the argmax is unique on both engines). */
  private def labelPropSql: String = {
    val rounds = (1 to lpRounds).map { i =>
      s"""n$i AS (SELECT dst AS id, label, CAST($i AS BIGINT) AS round
         |  FROM (SELECT dst, label, row_number() OVER (PARTITION BY dst
         |      ORDER BY cnt DESC, label ASC) AS rn
         |    FROM (SELECT e.dst, l.label, count(*) AS cnt
         |      FROM e JOIN l${i - 1} l ON e.src = l.id
         |      WHERE e.dst NOT IN (SELECT id FROM l${i - 1})
         |      GROUP BY e.dst, l.label) v) z
         |  WHERE rn = 1),
         |l$i AS (SELECT * FROM l${i - 1}
         |  UNION ALL SELECT id, label, round FROM n$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS (SELECT DISTINCT o.o_custkey * 2 AS src,
       |    l.l_suppkey * 2 + 1 AS dst
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
       |e AS (SELECT src, dst FROM e0
       |  UNION ALL SELECT dst, src FROM e0),
       |l0 AS (SELECT c.c_custkey * 2 AS id,
       |    CAST(n.n_regionkey AS BIGINT) AS label,
       |    CAST(0 AS BIGINT) AS round
       |  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
       |  WHERE c.c_custkey % 20 = 0),
       |$rounds
       |SELECT id,
       |  CASE WHEN id % 2 = 0 THEN 'customer' ELSE 'supplier' END
       |    AS node_type,
       |  label, round
       |FROM l$lpRounds ORDER BY id""".stripMargin
  }

  /** The oracle side of the SAME iteration loop: r0 → c1/r1 → … as a
    * generated CTE chain (DuckDB `//` is integer division like Spark's
    * `div`; both truncate, and all operands here are non-negative). */
  private def pagerankSql: String = {
    val iters = (1 to prIters).map { i =>
      s"""c$i AS (SELECT e.dst AS id,
         |    CAST(sum(r${i - 1}.pr // deg.outdeg) AS BIGINT) AS c
         |  FROM e JOIN deg ON deg.id = e.src
         |  JOIN r${i - 1} ON r${i - 1}.id = e.src GROUP BY e.dst),
         |r$i AS (SELECT nodes.id,
         |    ((15 * $prScale) // (100 * nn.n))
         |      + ((85 * coalesce(c$i.c, 0)) // 100) AS pr
         |  FROM nodes CROSS JOIN nn
         |  LEFT JOIN c$i ON c$i.id = nodes.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS (SELECT DISTINCT o.o_custkey * 2 AS src,
       |    l.l_suppkey * 2 + 1 AS dst
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
       |e AS (SELECT src, dst FROM e0
       |  UNION ALL SELECT dst, src FROM e0),
       |nodes AS (SELECT c_custkey * 2 AS id FROM customer
       |  UNION ALL SELECT s_suppkey * 2 + 1 AS id FROM supplier),
       |nn AS (SELECT count(*) AS n FROM nodes),
       |deg AS (SELECT src AS id, count(*) AS outdeg FROM e GROUP BY 1),
       |r0 AS (SELECT id, $prScale // nn.n AS pr FROM nodes CROSS JOIN nn),
       |$iters
       |SELECT id,
       |  CASE WHEN id % 2 = 0 THEN 'customer' ELSE 'supplier' END
       |    AS node_type,
       |  pr AS pr_fp, CAST(pr AS DOUBLE) / $prScale.0 AS pr
       |FROM r$prIters ORDER BY id""".stripMargin
  }

  /** q_ppr oracle: the pagerankSql rounds with the teleport term gated
    * to the seed set (same integer fixed point, same truncation). */
  private def pprSql: String = {
    val iters = (1 to prIters).map { i =>
      s"""c$i AS (SELECT e.dst AS id,
         |    CAST(sum(r${i - 1}.pr // deg.outdeg) AS BIGINT) AS c
         |  FROM e JOIN deg ON deg.id = e.src
         |  JOIN r${i - 1} ON r${i - 1}.id = e.src GROUP BY e.dst),
         |r$i AS (SELECT nodes.id,
         |    (CASE WHEN seeds.id IS NOT NULL
         |      THEN (15 * $prScale) // (100 * ns.ns) ELSE 0 END)
         |      + ((85 * coalesce(c$i.c, 0)) // 100) AS pr
         |  FROM nodes CROSS JOIN ns
         |  LEFT JOIN seeds ON seeds.id = nodes.id
         |  LEFT JOIN c$i ON c$i.id = nodes.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS (SELECT DISTINCT o.o_custkey * 2 AS src,
       |    l.l_suppkey * 2 + 1 AS dst
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
       |e AS (SELECT src, dst FROM e0
       |  UNION ALL SELECT dst, src FROM e0),
       |nodes AS (SELECT c_custkey * 2 AS id FROM customer
       |  UNION ALL SELECT s_suppkey * 2 + 1 AS id FROM supplier),
       |seeds AS (SELECT c_custkey * 2 AS id FROM customer
       |  WHERE c_custkey % 100 = 0),
       |ns AS (SELECT count(*) AS ns FROM seeds),
       |deg AS (SELECT src AS id, count(*) AS outdeg FROM e GROUP BY 1),
       |r0 AS (SELECT nodes.id,
       |    CASE WHEN seeds.id IS NOT NULL THEN $prScale // ns.ns
       |      ELSE 0 END AS pr
       |  FROM nodes CROSS JOIN ns
       |  LEFT JOIN seeds ON seeds.id = nodes.id),
       |$iters
       |SELECT nodes.id,
       |  CASE WHEN nodes.id % 2 = 0 THEN 'customer' ELSE 'supplier' END
       |    AS node_type,
       |  CAST(CASE WHEN seeds.id IS NOT NULL THEN 1 ELSE 0 END
       |    AS BIGINT) AS is_seed,
       |  pr AS ppr_fp, CAST(pr AS DOUBLE) / $prScale.0 AS ppr
       |FROM r$prIters f JOIN nodes ON nodes.id = f.id
       |LEFT JOIN seeds ON seeds.id = nodes.id
       |ORDER BY ppr_fp DESC, nodes.id LIMIT 20""".stripMargin
  }

  /** q_hits oracle: unrolled mutual-reinforcement rounds in the same
    * 1e-12 HUGEINT fixed point; each normalization is a scalar subquery. */
  private def hitsSql: String = {
    val iters = (1 to hitsIters).map { i =>
      val prev = if (i == 1) "h0" else s"h${i - 1}"
      s"""a${i}raw AS (SELECT sk, sum(h) AS araw
         |  FROM e JOIN $prev USING (ck) GROUP BY 1),
         |a$i AS (SELECT sk, ($hitsScale::HUGEINT * araw)
         |    // (SELECT sum(araw) FROM a${i}raw) AS a
         |  FROM a${i}raw),
         |h${i}raw AS (SELECT ck, sum(a) AS hraw
         |  FROM e JOIN a$i USING (sk) GROUP BY 1),
         |h$i AS (SELECT ck, ($hitsScale::HUGEINT * hraw)
         |    // (SELECT sum(hraw) FROM h${i}raw) AS h
         |  FROM h${i}raw)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT DISTINCT o.o_custkey AS ck, l.l_suppkey AS sk
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
       |h0 AS (SELECT DISTINCT ck, $hitsScale::HUGEINT AS h FROM e),
       |$iters
       |SELECT role, id, score_fp,
       |  CAST(score_fp AS DOUBLE) / $hitsScale.0 AS score
       |FROM (
       |  SELECT 'hub' AS role, ck AS id, CAST(h AS BIGINT) AS score_fp
       |  FROM h$hitsIters
       |  UNION ALL
       |  SELECT 'authority', sk, CAST(a AS BIGINT) FROM a$hitsIters) t
       |ORDER BY role, id""".stripMargin
  }

  def declaredOracle: Seq[(String, String)] = Seq(
    // same integer fixed point as the Spark loop; see hitsSql
    "q_hits" -> hitsSql,

    // the triangle frame of q_triangle_count, re-read per node with the
    // zero-triangle left join; exact integers until the final ratio
    "q_clustering_coef" ->
      s"""WITH $coEdgesSql,
         |e AS (SELECT p1, p2 FROM pe),
         |deg AS (SELECT n, count(*) AS dg FROM (
         |    SELECT p1 AS n FROM e UNION ALL SELECT p2 FROM e) t
         |  GROUP BY 1),
         |o AS (SELECT
         |    CASE WHEN (d1.dg, e.p1) < (d2.dg, e.p2)
         |      THEN e.p1 ELSE e.p2 END AS a,
         |    CASE WHEN (d1.dg, e.p1) < (d2.dg, e.p2)
         |      THEN e.p2 ELSE e.p1 END AS b,
         |    CASE WHEN (d1.dg, e.p1) < (d2.dg, e.p2)
         |      THEN d2.dg ELSE d1.dg END AS db
         |  FROM e JOIN deg d1 ON d1.n = e.p1
         |    JOIN deg d2 ON d2.n = e.p2),
         |tri AS (SELECT w1.a, w1.b AS b1, w2.b AS b2
         |  FROM o w1 JOIN o w2 ON w1.a = w2.a
         |    AND (w1.db, w1.b) < (w2.db, w2.b)
         |  JOIN o c ON c.a = w1.b AND c.b = w2.b),
         |pn AS (SELECT part, count(*) AS n_tri FROM (
         |    SELECT unnest([a, b1, b2]) AS part FROM tri) x
         |  GROUP BY 1)
         |SELECT deg.n AS part, deg.dg AS degree,
         |  CAST(COALESCE(pn.n_tri, 0) AS BIGINT) AS n_tri,
         |  CASE WHEN deg.dg >= 2 THEN
         |    floor(2.0e0 * CAST(COALESCE(pn.n_tri, 0) AS DOUBLE)
         |      / (CAST(deg.dg AS DOUBLE) * CAST(deg.dg - 1 AS DOUBLE))
         |      * 1e6 + 0.5e0) / 1e6
         |    ELSE 0.0e0 END AS cc
         |FROM deg LEFT JOIN pn ON pn.part = deg.n
         |ORDER BY part""".stripMargin,

    // integer micro-quantized precision@k terms under the declared
    // (n_chars DESC, doc_id) total order — the reduction sums integers
    "q_pr_auc" ->
      """WITH docs AS (SELECT doc_id, source, n_chars,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
        |  FROM documents),
        |r AS (SELECT source, pos,
        |    row_number() OVER w AS k,
        |    sum(pos) OVER w AS cum_pos
        |  FROM docs
        |  WINDOW w AS (PARTITION BY source
        |    ORDER BY n_chars DESC, doc_id)),
        |g AS (SELECT source, count(*) AS n_pos,
        |    sum((1000000 * cum_pos) // k) AS sp
        |  FROM r WHERE pos = 1 GROUP BY 1)
        |SELECT source, n_pos, CAST(sp // n_pos AS BIGINT) AS ap_u
        |FROM g ORDER BY source""".stripMargin,

    // exact integer cents under one (revenue, custkey) total order;
    // zero-order customers enter at revenue 0
    "q_lorenz" ->
      """WITH rev AS (SELECT c.c_custkey,
        |    COALESCE(r.rc, 0) AS revc
        |  FROM customer c LEFT JOIN (SELECT o_custkey,
        |      CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |        AS BIGINT) AS rc
        |    FROM orders GROUP BY 1) r ON r.o_custkey = c.c_custkey),
        |cum AS (SELECT c_custkey, revc,
        |    row_number() OVER w AS cumn,
        |    sum(revc) OVER (ORDER BY revc, c_custkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumrev
        |  FROM rev WINDOW w AS (ORDER BY revc, c_custkey)),
        |t AS (SELECT count(*) AS n, sum(revc) AS tr FROM rev)
        |SELECT ((cumn - 1) * 10) // n + 1 AS decile,
        |  max(cumn) AS cum_customers,
        |  floor(CAST(max(cumn) AS DOUBLE) / CAST(max(n) AS DOUBLE)
        |    * 1e6 + 0.5e0) / 1e6 AS pop_share,
        |  floor(CAST(max(cumrev) AS DOUBLE) / CAST(max(tr) AS DOUBLE)
        |    * 1e6 + 0.5e0) / 1e6 AS rev_share
        |FROM cum CROSS JOIN t
        |GROUP BY 1 ORDER BY decile""".stripMargin,

    // the quadratic NOT EXISTS dominance check — semantics twin of the
    // engine's order-statistic formulation (see the query comment for the
    // m1/gmin ⟺ dominance proof); exact integers on both sides
    "q_skyline" ->
      """WITH a AS (SELECT user_id,
        |    sum(CAST(floor(value * 1000.0 + 0.5) AS BIGINT)) AS xq,
        |    sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS y
        |  FROM events GROUP BY user_id)
        |SELECT u.user_id,
        |  CAST(u.xq AS DOUBLE) / 1000.0 AS total_value,
        |  CAST(u.y AS BIGINT) AS n_errors
        |FROM a u
        |WHERE NOT EXISTS (SELECT 1 FROM a v
        |  WHERE (v.xq > u.xq AND v.y <= u.y)
        |     OR (v.xq >= u.xq AND v.y < u.y))
        |ORDER BY u.user_id""".stripMargin,

    "q_stats_moments" ->
      """SELECT l_returnflag,
        |  round(corr(l_extendedprice, l_quantity), 6) AS corr_pq,
        |  round(covar_samp(l_extendedprice, l_quantity), 4) AS cov_pq,
        |  round(stddev_samp(l_discount), 6) AS sd_disc,
        |  round(var_samp(l_quantity), 6) AS var_qty,
        |  round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        |  round(regr_intercept(l_extendedprice, l_quantity), 4) AS icept
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,

    "q_funnel" ->
      """WITH v AS (
        |  SELECT user_id, min(epoch_us(ts)) AS view_us FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (
        |  SELECT e.user_id, min(epoch_us(e.ts)) AS click_us
        |  FROM events e JOIN v USING (user_id)
        |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.view_us
        |  GROUP BY 1),
        |p AS (
        |  SELECT e.user_id, min(epoch_us(e.ts)) AS buy_us
        |  FROM events e JOIN c USING (user_id)
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.click_us
        |  GROUP BY 1)
        |SELECT v.user_id, v.view_us, c.click_us, p.buy_us,
        |  CASE WHEN p.buy_us IS NOT NULL THEN 3
        |       WHEN c.click_us IS NOT NULL THEN 2 ELSE 1 END AS stage
        |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
        |ORDER BY user_id""".stripMargin,

    // same carry-along conditional-min; integer µs→s→day buckets
    "q_time_to_convert" ->
      """WITH v AS (SELECT user_id, min(epoch_us(ts)) AS v_us FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |p AS (SELECT e.user_id, min(epoch_us(e.ts)) AS p_us
        |  FROM events e JOIN v USING (user_id)
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > v.v_us
        |  GROUP BY 1),
        |dl AS (SELECT (p.p_us - v.v_us) // 1000000 AS delta_s
        |  FROM v JOIN p USING (user_id))
        |SELECT delta_s // 86400 AS day_bucket, count(*) AS n_users,
        |  CAST(min(delta_s) AS BIGINT) AS min_s,
        |  CAST(max(delta_s) AS BIGINT) AS max_s
        |FROM dl GROUP BY 1 ORDER BY day_bucket""".stripMargin,

    // 16-coalition frame; integer factorial weights; mirrored /24 scale
    "q_shapley_attribution" ->
      """WITH u AS (SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS conv,
        |    max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      + max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) * 2
        |      + max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) * 4
        |      + max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) * 8
        |      AS mask
        |  FROM events GROUP BY 1),
        |bm AS (SELECT mask, count(*) AS n, CAST(sum(conv) AS BIGINT)
        |    AS nc FROM u GROUP BY 1),
        |allm AS (SELECT unnest(range(0, 16)) AS mask),
        |vs AS (SELECT allm.mask,
        |    CASE WHEN coalesce(bm.n, 0) > 0
        |      THEN (coalesce(bm.nc, 0) * 1000000) // bm.n
        |      ELSE 0 END AS v_u
        |  FROM allm LEFT JOIN bm ON allm.mask = bm.mask),
        |ch AS (SELECT * FROM (VALUES ('click', 1), ('error', 2),
        |    ('signup', 4), ('view', 8)) AS t(channel, bit)),
        |pairs AS (SELECT ch.channel, a.v_u, b.v_u AS v2,
        |    CASE WHEN bit_count(CAST(a.mask AS BIGINT)) IN (0, 3)
        |      THEN 6 ELSE 2 END AS w
        |  FROM vs a CROSS JOIN ch
        |  JOIN vs b ON a.mask + ch.bit = b.mask
        |  WHERE (CAST(a.mask AS BIGINT) & CAST(ch.bit AS BIGINT)) = 0)
        |SELECT channel,
        |  floor(CAST(sum(w * (v2 - v_u)) AS DOUBLE) / 24.0e0 + 0.5e0)
        |    / 1e6 AS shapley
        |FROM pairs GROUP BY channel ORDER BY channel""".stripMargin,

    // floor-ln quantized logs; HUGEINT moments; one mirrored slope
    "q_elasticity" ->
      """WITH li AS (SELECT
        |    CAST(floor(ln(1.0e0 - l_discount) * 1e6 + 0.5e0) AS BIGINT)
        |      AS xq,
        |    CAST(floor(ln(l_quantity) * 1e6 + 0.5e0) AS BIGINT) AS yq
        |  FROM lineitem WHERE l_quantity > 0.0),
        |m AS (SELECT count(*) AS n, sum(xq) AS sx, sum(yq) AS sy,
        |    sum(xq * xq) AS sxx, sum(xq * yq) AS sxy FROM li)
        |SELECT CAST(n AS BIGINT) AS n,
        |  floor(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) / 1e6 * 1e6
        |    + 0.5e0) / 1e6 AS mean_ln_price,
        |  floor(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) / 1e6 * 1e6
        |    + 0.5e0) / 1e6 AS mean_ln_qty,
        |  CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <> 0.0
        |    THEN floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |      * 1e6 + 0.5e0) / 1e6 END AS elasticity
        |FROM m""".stripMargin,

    // bucket equi-join candidates; struct-min nearest; mirrored ATT
    "q_psm_match" ->
      """WITH u AS (SELECT user_id, count(*) AS n_events,
        |    CAST(sum(CAST(floor(value * 1000.0 + 0.5) AS BIGINT))
        |      AS BIGINT) AS sv,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS treated
        |  FROM events GROUP BY 1),
        |u2 AS (SELECT user_id, n_events, treated,
        |    (sv * 1000) // n_events AS score FROM u),
        |t AS (SELECT user_id AS tid, score AS ts, n_events AS ty,
        |    unnest([score // 100000 - 1, score // 100000,
        |            score // 100000 + 1]) AS b
        |  FROM u2 WHERE treated = 1),
        |c AS (SELECT user_id AS cid, score AS cs, n_events AS cy,
        |    score // 100000 AS b FROM u2 WHERE treated = 0),
        |cand AS (SELECT tid, ty, abs(ts - cs) AS dist, cid, cy
        |  FROM t JOIN c USING (b) WHERE abs(ts - cs) <= 100000),
        |best AS (SELECT tid, ty,
        |    min(struct_pack(dist := dist, cid := cid, cy := cy)) AS m
        |  FROM cand GROUP BY 1, 2),
        |nt AS (SELECT count(*) AS n_treated FROM u2 WHERE treated = 1),
        |ag AS (SELECT count(*) AS n_matched,
        |    CAST(sum(ty - m.cy) AS BIGINT) AS sdiff FROM best)
        |SELECT CAST(n_treated AS BIGINT) AS n_treated,
        |  CAST(n_matched AS BIGINT) AS n_matched,
        |  CAST((n_matched * 1000000) // n_treated AS DOUBLE) / 1e6
        |    AS match_rate,
        |  floor(CAST(sdiff AS DOUBLE) / n_matched * 1e6 + 0.5e0) / 1e6
        |    AS att_events
        |FROM ag CROSS JOIN nt""".stripMargin,

    // integer micro means; one mirrored ln/sqrt bonus per arm
    "q_ucb_arms" ->
      """WITH a AS (SELECT event_type, count(*) AS n,
        |    CAST(sum(CAST(floor(value * 1000.0 + 0.5) AS BIGINT))
        |      AS BIGINT) AS sv
        |  FROM events GROUP BY 1),
        |a2 AS (SELECT event_type, n, (sv * 1000) // n AS mu_u FROM a),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM a)
        |SELECT event_type, n,
        |  CAST(mu_u AS DOUBLE) / 1e6 AS mean_value,
        |  floor((CAST(mu_u AS DOUBLE) / 1e6
        |    + sqrt(2.0e0 * ln(CAST(nn AS DOUBLE)) / CAST(n AS DOUBLE)))
        |    * 1e6 + 0.5e0) / 1e6 AS ucb
        |FROM a2 CROSS JOIN tot ORDER BY event_type""".stripMargin,

    // count-of-counts frame; ceil-rank quantiles by cross-multiplication
    "q_key_skew" ->
      """WITH kc AS (SELECT o_custkey, count(*) AS c
        |  FROM orders GROUP BY 1),
        |cc AS (SELECT c, count(*) AS nk FROM kc GROUP BY 1),
        |tot AS (SELECT CAST(sum(nk) AS BIGINT) AS keys,
        |    CAST(sum(c * nk) AS BIGINT) AS nrows FROM cc),
        |cm AS (SELECT c, nk,
        |    CAST(sum(nk) OVER (ORDER BY c) AS BIGINT) AS cumk FROM cc),
        |ag AS (SELECT max(keys) AS n_keys, max(nrows) AS n_rows,
        |    min(CASE WHEN cumk * 2 >= keys THEN c END) AS p50_c,
        |    min(CASE WHEN cumk * 100 >= keys * 99 THEN c END) AS p99_c,
        |    max(c) AS max_c
        |  FROM cm CROSS JOIN tot)
        |SELECT n_keys, n_rows, CAST(p50_c AS BIGINT) AS p50_c,
        |  CAST(p99_c AS BIGINT) AS p99_c, CAST(max_c AS BIGINT) AS max_c,
        |  CAST((p99_c * 1000000) // p50_c AS DOUBLE) / 1e6 AS skew_ratio,
        |  CAST((max_c * 1000000) // n_rows AS DOUBLE) / 1e6
        |    AS top_key_share
        |FROM ag""".stripMargin,

    "q_attribution" ->
      """WITH t AS (SELECT event_id, user_id, event_type,
        |  first_value(CASE WHEN event_type <> 'purchase'
        |      THEN event_type END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |    AS first_touch,
        |  last_value(CASE WHEN event_type <> 'purchase'
        |      THEN event_type END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |    AS last_touch
        |  FROM events)
        |SELECT event_id, user_id, first_touch, last_touch
        |FROM t WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin,

    "q_cohort_retention" ->
      """WITH f AS (
        |  SELECT user_id, min(date_trunc('day', ts)) AS cohort_ts
        |  FROM events GROUP BY 1)
        |SELECT strftime(f.cohort_ts, '%Y-%m-%d') AS cohort_day,
        |  date_diff('day', f.cohort_ts, date_trunc('day', e.ts)) // 7
        |    AS week_offset,
        |  count(DISTINCT e.user_id) AS n_active
        |FROM events e JOIN f USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort_day, week_offset""".stripMargin,

    // milli-unit values exact before aggregation; cohort-keyed running sum
    "q_cohort_ltv" ->
      """WITH e AS (SELECT user_id,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) // 7
        |      AS ww,
        |    CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS vq
        |  FROM events),
        |f AS (SELECT user_id, min(ww) AS cohort_w FROM e GROUP BY 1),
        |sz AS (SELECT cohort_w, count(*) AS n_users FROM f GROUP BY 1),
        |cells AS (SELECT cohort_w, ww - cohort_w AS age_w,
        |    CAST(sum(vq) AS BIGINT) AS v
        |  FROM e JOIN f USING (user_id) GROUP BY 1, 2),
        |cum AS (SELECT cohort_w, age_w,
        |    CAST(sum(v) OVER (PARTITION BY cohort_w ORDER BY age_w
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum_v
        |  FROM cells)
        |SELECT cohort_w, age_w, n_users, cum_v,
        |  CAST(cum_v // n_users AS BIGINT) AS ltv_m,
        |  CAST(cum_v // n_users AS DOUBLE) / 1000.0e0 AS ltv
        |FROM cum JOIN sz USING (cohort_w)
        |ORDER BY cohort_w, age_w""".stripMargin,

    // floor(x*1e4 + 0.5)/1e4, not round(): see the query comment
    "q_ewma" ->
      s"""SELECT event_id, user_id, epoch_us(ts) AS ts_us, value,
         |  floor(($ewmaSql) * 10000.0 + 0.5) / 10000.0 AS ewma
         |FROM events
         |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
         |ORDER BY user_id, ts_us, event_id""".stripMargin,

    // integer fixed-point throughout: see the query comment
    "q_pagerank" -> pagerankSql,

    "q_ppr" -> pprSql,

    "q_graph_bfs" -> bfsSql,
    "q_harmonic_centrality" -> harmonicSql,

    "q_eccentricity" -> eccentricitySql,

    // same multi-root BFS CTE chain; integer micro closeness
    "q_closeness_centrality" ->
      s"""WITH $multiRootBfsCtes
         |SELECT root, count(*) AS n_reached,
         |  CAST(sum(dist) AS BIGINT) AS sum_dist,
         |  CAST((count(*) * 1000000) // CAST(sum(dist) AS BIGINT)
         |    AS DOUBLE) / 1e6 AS closeness
         |FROM d$bfsHops WHERE dist > 0 GROUP BY root
         |ORDER BY root""".stripMargin,

    // contingency percentile on the bounded {1..3} distance domain
    "q_effective_diameter" ->
      s"""WITH $multiRootBfsCtes,
         |dd AS (SELECT dist, count(*) AS n FROM d$bfsHops
         |  WHERE dist > 0 GROUP BY 1),
         |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM dd),
         |c AS (SELECT dist, n,
         |    CAST(sum(n) OVER (ORDER BY dist
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum
         |  FROM dd)
         |SELECT dist, CAST(n AS BIGINT) AS n, cum, nn,
         |  CAST((1000000 * cum) // nn AS BIGINT) AS cdf_u,
         |  10 * cum >= 9 * nn AND 10 * (cum - n) < 9 * nn
         |    AS is_eff_diameter
         |FROM c CROSS JOIN tot ORDER BY dist""".stripMargin,

    // both directed rules per thresholded pair; exact integer
    // micro-divisions; N·support product widened to HUGEINT
    "q_assoc_rules" ->
      s"""WITH $coEdgesSql,
         |li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |items AS (SELECT l_partkey AS item, count(*) AS s_item
         |  FROM li GROUP BY 1),
         |nb AS (SELECT count(DISTINCT l_orderkey) AS n_baskets FROM li),
         |rules AS (SELECT p1 AS a, p2 AS b, support FROM pe
         |  UNION ALL SELECT p2, p1, support FROM pe)
         |SELECT a, b, support,
         |  CAST((support * 1000000) // ia.s_item AS BIGINT)
         |    AS confidence_u,
         |  CAST((CAST(support AS HUGEINT) * n_baskets * 1000000)
         |    // (CAST(ia.s_item AS HUGEINT) * ib.s_item) AS BIGINT)
         |    AS lift_u
         |FROM rules
         |JOIN items ia ON ia.item = a
         |JOIN items ib ON ib.item = b
         |CROSS JOIN nb
         |ORDER BY lift_u DESC, confidence_u DESC, a, b
         |LIMIT 20""".stripMargin,
    "q_label_propagation" -> labelPropSql,

    "q_ab_srm" ->
      """SELECT event_type,
        |  CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_a,
        |  CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_b,
        |  round(CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE -1 END)
        |      AS DOUBLE)
        |    * sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE -1 END)
        |    / count(*), 6) AS chi2,
        |  100 * sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE -1 END)
        |    * sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE -1 END)
        |    > 384 * count(*) AS srm_flag
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_active_users" ->
      """WITH e AS (SELECT epoch_us(ts) // 86400000000 AS day, user_id
        |  FROM events),
        |ew AS (SELECT day, (day + 3) // 7 AS week, user_id FROM e),
        |dau AS (SELECT day, week, count(DISTINCT user_id) AS dau
        |  FROM ew GROUP BY 1, 2),
        |wau AS (SELECT week, count(DISTINCT user_id) AS wau
        |  FROM ew GROUP BY 1)
        |SELECT day, dau.week, dau, wau,
        |  round(CAST(dau AS DOUBLE) / wau, 6) AS stickiness
        |FROM dau JOIN wau USING (week) ORDER BY day""".stripMargin,

    "q_running_distinct" ->
      """WITH e AS (SELECT epoch_us(ts) // 86400000000 AS day, user_id
        |  FROM events),
        |fs AS (SELECT min(day) AS day FROM e GROUP BY user_id),
        |nu AS (SELECT day, count(*) AS new_users FROM fs GROUP BY day),
        |dau AS (SELECT day, count(DISTINCT user_id) AS dau
        |  FROM e GROUP BY day)
        |SELECT dau.day, dau,
        |  CAST(coalesce(new_users, 0) AS BIGINT) AS new_users,
        |  CAST(sum(coalesce(new_users, 0))
        |    OVER (ORDER BY dau.day) AS BIGINT) AS cum_distinct
        |FROM dau LEFT JOIN nu ON nu.day = dau.day
        |ORDER BY dau.day""".stripMargin,

    "q_integrity_audit" ->
      """WITH c1 AS (SELECT 'pk_orders_unique' AS "check",
        |    CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
        |      AS n_violations,
        |    count(*) AS n_checked FROM orders),
        |c2 AS (SELECT 'fk_lineitem_orders' AS "check",
        |    CAST((SELECT count(*) FROM lineitem
        |      WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
        |      AS BIGINT) AS n_violations,
        |    count(*) AS n_checked FROM lineitem),
        |c3 AS (SELECT 'value_nonnegative' AS "check",
        |    CAST(sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_violations,
        |    count(*) AS n_checked FROM events),
        |c4 AS (SELECT 'props_json_shape' AS "check",
        |    CAST(sum(CASE WHEN props IS NULL
        |      OR props NOT LIKE '{%}' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_violations,
        |    count(*) AS n_checked FROM events)
        |SELECT "check", n_violations, n_checked,
        |  n_violations = 0 AS pass
        |FROM (SELECT * FROM c1 UNION ALL SELECT * FROM c2
        |  UNION ALL SELECT * FROM c3 UNION ALL SELECT * FROM c4) t
        |ORDER BY "check"""".stripMargin,

    // bin()-length bucket = exact floor(log2); same undirected edge CTE
    // as bfsSql
    "q_degree_dist" ->
      """WITH e0 AS (SELECT DISTINCT o.o_custkey * 2 AS src,
        |    l.l_suppkey * 2 + 1 AS dst
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |e AS (SELECT src, dst FROM e0
        |  UNION ALL SELECT dst, src FROM e0),
        |deg AS (SELECT src, count(*) AS degree FROM e GROUP BY 1)
        |SELECT
        |  CASE WHEN src % 2 = 0 THEN 'customer' ELSE 'supplier' END
        |    AS node_type,
        |  CAST(length(bin(degree)) - 1 AS BIGINT) AS bucket,
        |  count(*) AS n_nodes,
        |  CAST(min(degree) AS BIGINT) AS min_deg,
        |  CAST(max(degree) AS BIGINT) AS max_deg
        |FROM deg GROUP BY 1, 2 ORDER BY node_type, bucket""".stripMargin,

    // exact integer moment sums; the double z formula mirrors the
    // engine's expression shape token-for-token (see the query comment)
    "q_ab_test" ->
      """WITH e AS (SELECT event_type, user_id % 2 AS arm,
        |    CAST(floor(value * 1000.0e0 + 0.5e0) AS BIGINT) AS vq
        |  FROM events),
        |m AS (SELECT event_type, arm, count(*) AS n,
        |    CAST(sum(vq) AS BIGINT) AS s,
        |    CAST(sum(vq * vq) AS BIGINT) AS q
        |  FROM e GROUP BY 1, 2),
        |j AS (SELECT a.event_type,
        |    a.n AS n_a, a.s AS s_a, a.q AS q_a,
        |    b.n AS n_b, b.s AS s_b, b.q AS q_b
        |  FROM m a JOIN m b ON a.event_type = b.event_type
        |  WHERE a.arm = 0 AND b.arm = 1),
        |z AS (SELECT event_type, n_a, n_b,
        |    CAST(s_a AS DOUBLE) / n_a / 1000.0e0 AS mean_a,
        |    CAST(s_b AS DOUBLE) / n_b / 1000.0e0 AS mean_b,
        |    (CAST(s_a AS DOUBLE) / n_a / 1000.0e0
        |      - CAST(s_b AS DOUBLE) / n_b / 1000.0e0)
        |    / sqrt((((CAST(q_a AS DOUBLE) - CAST(s_a AS DOUBLE) * s_a / n_a)
        |        / (n_a - 1)) / n_a
        |      + ((CAST(q_b AS DOUBLE) - CAST(s_b AS DOUBLE) * s_b / n_b)
        |        / (n_b - 1)) / n_b) / 1000000.0e0) AS z
        |  FROM j)
        |SELECT event_type, n_a, n_b,
        |  floor(mean_a * 1e6 + 0.5e0) / 1e6 AS mean_a,
        |  floor(mean_b * 1e6 + 0.5e0) / 1e6 AS mean_b,
        |  floor(z * 1e6 + 0.5e0) / 1e6 AS z,
        |  (z * z > 3.8416e0) AS significant_95
        |FROM z ORDER BY event_type""".stripMargin,

    "q_rfm" ->
      """WITH base AS (SELECT o_custkey,
        |    max(o_orderdate) AS last_order,
        |    count(*) AS frequency,
        |    CAST(sum(CAST(floor(o_totalprice * 100.0e0 + 0.5e0) AS BIGINT))
        |      AS BIGINT) AS monetary_cents
        |  FROM orders GROUP BY 1),
        |sc AS (SELECT o_custkey, last_order, frequency, monetary_cents,
        |    ntile(4) OVER (ORDER BY last_order DESC, o_custkey) AS r_score,
        |    ntile(4) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
        |    ntile(4) OVER (ORDER BY monetary_cents DESC, o_custkey)
        |      AS m_score
        |  FROM base)
        |SELECT o_custkey, last_order, frequency, monetary_cents,
        |  CAST(r_score AS BIGINT) AS r_score,
        |  CAST(f_score AS BIGINT) AS f_score,
        |  CAST(m_score AS BIGINT) AS m_score,
        |  r_score::VARCHAR || f_score::VARCHAR || m_score::VARCHAR
        |    AS segment
        |FROM sc ORDER BY o_custkey""".stripMargin,

    "q_freq_itemsets" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem)
        |SELECT a.pk AS p1, b.pk AS p2, count(*) AS support
        |FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |GROUP BY 1, 2 ORDER BY support DESC, p1, p2 LIMIT 20""".stripMargin,

    "q_scd2" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS prev_type
        |  FROM events),
        |m AS (SELECT user_id, event_id, ts_us, event_type FROM e
        |  WHERE prev_type IS NULL OR prev_type <> event_type)
        |SELECT user_id, event_type AS state, ts_us AS valid_from,
        |  lead(ts_us) OVER (PARTITION BY user_id
        |    ORDER BY ts_us, event_id) AS valid_to,
        |  (lead(ts_us) OVER (PARTITION BY user_id
        |    ORDER BY ts_us, event_id) IS NULL) AS is_current
        |FROM m ORDER BY user_id, valid_from,
        |  coalesce(valid_to, 9223372036854775807), state""".stripMargin,

    "q_profile" -> {
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
      val branches = cols.map { c =>
        s"""SELECT '$c' AS column_name, count(*) AS n_rows,
           |    count(*) - count($c) AS n_nulls,
           |    count(DISTINCT $c) AS n_distinct FROM orders""".stripMargin
      }
      branches.mkString("", "\n  UNION ALL ", "\n  ORDER BY column_name")
    },

    // CASE-sum violation counters CAST from HUGEINT; tuple-DISTINCT for
    // the composite pk (pk columns are non-null, so Spark's
    // null-dropping countDistinct agrees)
    "q_validate" ->
      """WITH oj AS (SELECT o.*, c.c_custkey AS cfk FROM orders o
        |    LEFT JOIN customer c ON o.o_custkey = c.c_custkey),
        |oa AS (SELECT count(*) AS n,
        |    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS v_null,
        |    count(*) - count(DISTINCT o_orderkey) AS v_uniq,
        |    CAST(sum(CASE WHEN o_orderstatus NOT IN ('F', 'O', 'P')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS v_dom,
        |    CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS v_pos,
        |    CAST(sum(CASE WHEN cfk IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS v_fk
        |  FROM oj),
        |lj AS (SELECT l.*, ok.o_orderkey AS ofk FROM lineitem l
        |    LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) ok
        |      ON l.l_orderkey = ok.o_orderkey),
        |la AS (SELECT count(*) AS n,
        |    CAST(sum(CASE WHEN l_quantity NOT BETWEEN 1 AND 50
        |      THEN 1 ELSE 0 END) AS BIGINT) AS v_qty,
        |    count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS v_pk,
        |    CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS v_ship,
        |    CAST(sum(CASE WHEN ofk IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS v_fk
        |  FROM lj)
        |SELECT rule, n_rows, n_violations,
        |  (n_violations = 0) AS passed FROM (
        |  SELECT 'orders.o_custkey_not_null' AS rule, n AS n_rows,
        |      v_null AS n_violations FROM oa
        |  UNION ALL SELECT 'orders.o_orderkey_unique', n, v_uniq FROM oa
        |  UNION ALL SELECT 'orders.o_orderstatus_domain', n, v_dom FROM oa
        |  UNION ALL SELECT 'orders.o_totalprice_positive', n, v_pos FROM oa
        |  UNION ALL SELECT 'orders.o_custkey_fk_customer', n, v_fk FROM oa
        |  UNION ALL SELECT 'lineitem.l_quantity_range', n, v_qty FROM la
        |  UNION ALL SELECT 'lineitem.pk_unique', n, v_pk FROM la
        |  UNION ALL SELECT 'lineitem.l_shipdate_not_null', n, v_ship FROM la
        |  UNION ALL SELECT 'lineitem.l_orderkey_fk_orders', n, v_fk FROM la
        |) r ORDER BY rule""".stripMargin,

    "q_histogram" ->
      """SELECT o_orderpriority, bucket, count(*) AS n,
        |  round(min(o_totalprice), 2) AS lo,
        |  round(max(o_totalprice), 2) AS hi,
        |  round(avg(o_totalprice), 4) AS mean
        |FROM (SELECT o_orderpriority, o_totalprice,
        |    CAST(ntile(10) OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS bucket
        |  FROM orders) t
        |GROUP BY 1, 2 ORDER BY o_orderpriority, bucket""".stripMargin,

    // one global window here is fine for the ORACLE (DuckDB, test scale);
    // the Spark side must reproduce the identical ranks distributed
    "q_histogram_eqdepth" ->
      """WITH r AS (SELECT o_totalprice,
        |    row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rn,
        |    count(*) OVER () AS n
        |  FROM orders)
        |SELECT ((rn - 1) * 8) // n AS bucket, count(*) AS n_rows,
        |  round(min(o_totalprice), 2) AS lo,
        |  round(max(o_totalprice), 2) AS hi
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    // same (degree, id) total-order orientation; row-value comparison
    // mirrors Spark's struct ordering; each triangle enumerated once
    "q_triangle_count" ->
      s"""WITH $coEdgesSql,
         |e AS (SELECT p1, p2 FROM pe),
         |deg AS (SELECT n, count(*) AS dg FROM (
         |    SELECT p1 AS n FROM e UNION ALL SELECT p2 FROM e) t
         |  GROUP BY 1),
         |o AS (SELECT
         |    CASE WHEN (d1.dg, e.p1) < (d2.dg, e.p2)
         |      THEN e.p1 ELSE e.p2 END AS a,
         |    CASE WHEN (d1.dg, e.p1) < (d2.dg, e.p2)
         |      THEN e.p2 ELSE e.p1 END AS b,
         |    CASE WHEN (d1.dg, e.p1) < (d2.dg, e.p2)
         |      THEN d2.dg ELSE d1.dg END AS db
         |  FROM e JOIN deg d1 ON d1.n = e.p1
         |    JOIN deg d2 ON d2.n = e.p2),
         |tri AS (SELECT w1.a, w1.b AS b1, w2.b AS b2
         |  FROM o w1 JOIN o w2 ON w1.a = w2.a
         |    AND (w1.db, w1.b) < (w2.db, w2.b)
         |  JOIN o c ON c.a = w1.b AND c.b = w2.b)
         |SELECT part, dg AS degree, n_tri FROM (
         |  SELECT unnest([a, b1, b2]) AS part FROM tri) t
         |JOIN deg ON deg.n = t.part
         |JOIN (SELECT part AS p, count(*) AS n_tri FROM (
         |    SELECT unnest([a, b1, b2]) AS part FROM tri) x
         |  GROUP BY 1) g ON g.p = t.part
         |GROUP BY 1, 2, 3
         |ORDER BY n_tri DESC, part LIMIT 20""".stripMargin,

    // integer resource-allocation weights (1000000 // deg) — exact sum
    "q_link_predict" ->
      s"""WITH $coEdgesSql,
         |e AS (SELECT p1, p2 FROM pe),
         |adj AS (SELECT p1 AS v, p2 AS nb FROM e
         |  UNION ALL SELECT p2, p1 FROM e),
         |deg AS (SELECT v, count(*) AS dg FROM adj GROUP BY 1),
         |wedge AS (SELECT a1.nb AS u, a2.nb AS w, a1.v
         |  FROM adj a1 JOIN adj a2 ON a1.v = a2.v AND a1.nb < a2.nb),
         |scored AS (SELECT u, w, count(*) AS cn,
         |    sum(1000000 // dg) AS ra_q
         |  FROM wedge JOIN deg USING (v) GROUP BY 1, 2)
         |SELECT u, w, cn, CAST(ra_q AS BIGINT) AS ra_q FROM scored s
         |WHERE NOT EXISTS (SELECT 1 FROM e
         |  WHERE e.p1 = s.u AND e.p2 = s.w)
         |ORDER BY ra_q DESC, cn DESC, u, w LIMIT 20""".stripMargin,

    // inverse-log center weights, micro-quantized before the pair sum
    // (floor-ln discipline); same wedge frame and anti-join as CN/RA
    "q_adamic_adar" ->
      s"""WITH $coEdgesSql,
         |e AS (SELECT p1, p2 FROM pe),
         |adj AS (SELECT p1 AS v, p2 AS nb FROM e
         |  UNION ALL SELECT p2, p1 FROM e),
         |degw AS (SELECT v, count(*) AS dg,
         |    CASE WHEN count(*) >= 2 THEN CAST(floor(1e6
         |      / ln(CAST(count(*) AS DOUBLE)) + 0.5e0) AS BIGINT)
         |    ELSE 0 END AS aw
         |  FROM adj GROUP BY 1),
         |wedge AS (SELECT a1.nb AS u, a2.nb AS w, a1.v
         |  FROM adj a1 JOIN adj a2 ON a1.v = a2.v AND a1.nb < a2.nb),
         |scored AS (SELECT u, w, count(*) AS cn,
         |    CAST(sum(aw) AS BIGINT) AS aa_q
         |  FROM wedge JOIN degw USING (v) GROUP BY 1, 2)
         |SELECT u, w, cn, aa_q FROM scored s
         |WHERE NOT EXISTS (SELECT 1 FROM e
         |  WHERE e.p1 = s.u AND e.p2 = s.w)
         |ORDER BY aa_q DESC, cn DESC, u, w LIMIT 20""".stripMargin,

    // integer cosine² affinity co²·1e12 // (n_u·n_v); seeds = top-10
    // popular parts with id tiebreak
    "q_item_recs" ->
      s"""WITH $coEdgesSql,
         |li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |pop AS (SELECT l_partkey AS part, count(*) AS n_baskets
         |  FROM li GROUP BY 1),
         |seeds AS (SELECT part, n_baskets FROM pop
         |  ORDER BY n_baskets DESC, part LIMIT 10),
         |bo AS (SELECT p1 AS part, p2 AS rec, support AS co FROM pe
         |  UNION ALL SELECT p2, p1, support FROM pe),
         |scored AS (SELECT s.part, b.rec, b.co, s.n_baskets,
         |    p2.n_baskets AS n_rec,
         |    (b.co::HUGEINT * b.co * 1000000000000)
         |      // (s.n_baskets::HUGEINT * p2.n_baskets) AS score_q
         |  FROM bo b JOIN seeds s ON b.part = s.part
         |  JOIN pop p2 ON p2.part = b.rec)
         |SELECT part, rnk, rec, co, CAST(score_q AS BIGINT) AS score_q
         |FROM (SELECT part, rec, co, score_q, CAST(row_number() OVER (
         |      PARTITION BY part ORDER BY score_q DESC, rec) AS BIGINT)
         |    AS rnk
         |  FROM scored) t
         |WHERE rnk <= 3 ORDER BY part, rnk""".stripMargin,

    // rank-sum AUC with average-rank tie handling — all integer
    "q_auc_roc" ->
      """WITH g AS (SELECT source, n_chars,
        |    count(*) FILTER (lang = 'en') AS np,
        |    count(*) FILTER (lang <> 'en') AS nn
        |  FROM documents GROUP BY 1, 2),
        |c AS (SELECT source, np, nn, coalesce(sum(nn) OVER (
        |    PARTITION BY source ORDER BY n_chars
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS cumneg FROM g),
        |a AS (SELECT source, sum(np * (2 * cumneg + nn)) AS two_u,
        |    sum(np) AS n_pos, sum(nn) AS n_neg FROM c GROUP BY 1)
        |SELECT source, CAST(n_pos AS BIGINT) AS n_pos,
        |  CAST(n_neg AS BIGINT) AS n_neg,
        |  CASE WHEN n_pos > 0 AND n_neg > 0 THEN
        |    CAST((1000000 * two_u) // (2 * n_pos * n_neg) AS BIGINT)
        |  END AS auc_u
        |FROM a ORDER BY source""".stripMargin,

    // 4 pinned peel rounds at k = 3, unrolled
    "q_kcore" ->
      s"""WITH $coEdgesSql,
         |e0 AS MATERIALIZED (SELECT p1, p2 FROM pe),
         |k1 AS MATERIALIZED (SELECT n FROM (SELECT n, count(*) dg FROM (
         |    SELECT p1 AS n FROM e0 UNION ALL SELECT p2 FROM e0) t
         |  GROUP BY 1) WHERE dg >= 3),
         |e1 AS MATERIALIZED (SELECT p1, p2 FROM e0
         |  WHERE p1 IN (SELECT n FROM k1) AND p2 IN (SELECT n FROM k1)),
         |k2 AS MATERIALIZED (SELECT n FROM (SELECT n, count(*) dg FROM (
         |    SELECT p1 AS n FROM e1 UNION ALL SELECT p2 FROM e1) t
         |  GROUP BY 1) WHERE dg >= 3),
         |e2 AS MATERIALIZED (SELECT p1, p2 FROM e1
         |  WHERE p1 IN (SELECT n FROM k2) AND p2 IN (SELECT n FROM k2)),
         |k3 AS MATERIALIZED (SELECT n FROM (SELECT n, count(*) dg FROM (
         |    SELECT p1 AS n FROM e2 UNION ALL SELECT p2 FROM e2) t
         |  GROUP BY 1) WHERE dg >= 3),
         |e3 AS MATERIALIZED (SELECT p1, p2 FROM e2
         |  WHERE p1 IN (SELECT n FROM k3) AND p2 IN (SELECT n FROM k3)),
         |k4 AS MATERIALIZED (SELECT n FROM (SELECT n, count(*) dg FROM (
         |    SELECT p1 AS n FROM e3 UNION ALL SELECT p2 FROM e3) t
         |  GROUP BY 1) WHERE dg >= 3),
         |e4 AS MATERIALIZED (SELECT p1, p2 FROM e3
         |  WHERE p1 IN (SELECT n FROM k4) AND p2 IN (SELECT n FROM k4))
         |SELECT node, count(*) AS core_deg FROM (
         |  SELECT p1 AS node FROM e4 UNION ALL SELECT p2 FROM e4) t
         |GROUP BY 1 ORDER BY core_deg DESC, node""".stripMargin,

    // identical min-df-token blocking + integer token-sort ratio
    "q_entity_match" ->
      """WITH names AS (SELECT
        |    list_aggr(list_sort(string_split(p_name, ' ')), 'string_agg',
        |      ' ') AS nm, count(*) AS n_rows
        |  FROM part GROUP BY 1),
        |tok AS (SELECT nm, unnest(string_split(nm, ' ')) AS t FROM names),
        |df AS (SELECT t, count(*) AS tdf FROM tok GROUP BY 1),
        |blk AS (SELECT nm, min((tdf, t)) AS bk
        |  FROM tok JOIN df USING (t) GROUP BY 1),
        |a AS (SELECT bk[2] AS bt, nm AS na, n_rows AS ca
        |  FROM names JOIN blk USING (nm))
        |SELECT na, nb, ca, cb, CAST(score_q AS BIGINT) AS score_q FROM (
        |  SELECT a.na, b.na AS nb, a.ca, b.ca AS cb,
        |    1000000 - (1000000 * levenshtein(a.na, b.na)) //
        |      greatest(length(a.na), length(b.na)) AS score_q
        |  FROM a JOIN a b ON a.bt = b.bt AND a.na < b.na) t
        |WHERE score_q >= 600000
        |ORDER BY score_q DESC, na, nb""".stripMargin,

    // θ from exact dollar-resolution integer moments; identical double
    // expressions on both sides (q_ab_test contract)
    "q_cuped" ->
      """WITH u AS (SELECT user_id % 2 AS arm, user_id,
        |    coalesce(sum(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN
        |      CAST(floor(value * 1000.0e0 + 0.5e0) AS BIGINT) END), 0)
        |      AS pre_m,
        |    coalesce(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN
        |      CAST(floor(value * 1000.0e0 + 0.5e0) AS BIGINT) END), 0)
        |      AS post_m
        |  FROM events GROUP BY 1, 2),
        |ud AS (SELECT arm, user_id, pre_m, post_m,
        |    pre_m // 1000 AS pre_d, post_m // 1000 AS post_d FROM u),
        |g AS (SELECT count(*) AS n, sum(pre_d) AS sx, sum(post_d) AS sy,
        |    sum(pre_d * pre_d) AS sxx, sum(pre_d * post_d) AS sxy
        |  FROM ud),
        |t AS (SELECT
        |    CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n AS covn,
        |    CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n AS varn,
        |    CAST(sx AS DOUBLE) / n AS gm FROM g),
        |t2 AS (SELECT covn, varn, gm,
        |    CASE WHEN varn > 0 THEN covn / varn ELSE 0.0e0 END AS theta
        |  FROM t),
        |a AS (SELECT arm, count(*) AS n_users,
        |    CAST(sum(post_m) AS BIGINT) AS sp,
        |    CAST(sum(pre_d) AS BIGINT) AS sd FROM ud GROUP BY 1)
        |SELECT arm, n_users,
        |  round(CAST(sp AS DOUBLE) / n_users / 1000.0e0, 6) AS raw_mean,
        |  round(CAST(sp AS DOUBLE) / n_users / 1000.0e0 -
        |    theta * (CAST(sd AS DOUBLE) / n_users - gm), 6) AS adj_mean
        |FROM a, t2 ORDER BY arm""".stripMargin,

    // exact rank-weighted Gini on integer cents, (spend, custkey) order
    "q_gini" ->
      """WITH sp AS (SELECT c_nationkey, c_custkey,
        |    coalesce(sum(CAST(floor(o_totalprice * 100.0e0 + 0.5e0)
        |      AS BIGINT)), 0) AS sp
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY 1, 2),
        |r AS (SELECT c_nationkey, sp, row_number() OVER (
        |    PARTITION BY c_nationkey ORDER BY sp ASC, c_custkey ASC)
        |    AS rnk FROM sp),
        |g AS (SELECT c_nationkey, count(*) AS n_cust,
        |    CAST(sum(sp) AS BIGINT) AS total_c,
        |    CAST(sum(rnk * sp) AS BIGINT) AS rs FROM r GROUP BY 1)
        |SELECT c_nationkey, n_cust, total_c,
        |  CASE WHEN total_c > 0 THEN
        |    round((2.0e0 * rs - (n_cust + 1.0e0) * total_c) /
        |      (CAST(n_cust AS DOUBLE) * total_c), 6) END AS gini
        |FROM g ORDER BY c_nationkey""".stripMargin,

    // integer between-segment-SS objective; earliest-day tiebreak
    "q_changepoint" ->
      """WITH day AS (SELECT CAST(ts AS DATE) AS day,
        |    sum(CAST(floor(value) AS BIGINT)) AS rd
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |p AS (SELECT day, sum(rd) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sl,
        |    CAST(count(*) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS nl FROM day),
        |t AS (SELECT sum(rd) AS st, count(*) AS nt FROM day)
        |SELECT strftime(day, '%Y-%m-%d') AS break_day,
        |  CAST(((sl * (nt - nl) - (st - sl) * nl) *
        |    (sl * (nt - nl) - (st - sl) * nl)) // (nl * (nt - nl))
        |    AS BIGINT) AS score_q,
        |  CAST(sl // nl AS BIGINT) AS mean_left_d,
        |  CAST((st - sl) // (nt - nl) AS BIGINT) AS mean_right_d
        |FROM p, t WHERE nl < nt
        |ORDER BY score_q DESC, break_day LIMIT 1""".stripMargin,

    // one conditional user aggregate; bounded (bucket, label) histogram
    "q_churn_label" ->
      """WITH u AS (SELECT user_id,
        |    count(CASE WHEN ts < TIMESTAMP '2024-01-21' THEN 1 END)
        |      AS n_ev,
        |    coalesce(sum(CASE WHEN ts < TIMESTAMP '2024-01-21'
        |      AND event_type = 'purchase' THEN
        |      CAST(floor(value * 100.0e0 + 0.5e0) AS BIGINT) END), 0)
        |      AS purch_c,
        |    count(CASE WHEN ts >= TIMESTAMP '2024-01-21' THEN 1 END)
        |      AS n_post
        |  FROM events GROUP BY 1)
        |SELECT least(n_ev // 10, 9) AS bucket,
        |  CAST(CASE WHEN n_post = 0 THEN 1 ELSE 0 END AS BIGINT)
        |    AS churned,
        |  count(*) AS n_users,
        |  CAST(sum(purch_c) // count(*) AS BIGINT) AS avg_purch_c
        |FROM u WHERE n_ev > 0
        |GROUP BY 1, 2 ORDER BY bucket, churned""".stripMargin,

    // same life-table construction; suffix sum over the bounded t frame
    "q_hazard_curve" ->
      """WITH u AS (SELECT user_id,
        |    min(CAST(ts AS DATE)) AS first_day,
        |    min(CASE WHEN event_type = 'purchase'
        |      THEN CAST(ts AS DATE) END) AS purch_day
        |  FROM events GROUP BY 1),
        |tt AS (SELECT CAST(CASE WHEN purch_day IS NOT NULL
        |      THEN purch_day - first_day
        |      ELSE DATE '2024-01-31' - first_day END AS BIGINT) AS t,
        |    CASE WHEN purch_day IS NOT NULL THEN 1 ELSE 0 END AS ev
        |  FROM u),
        |byt AS (SELECT t, CAST(sum(ev) AS BIGINT) AS d_events,
        |    CAST(sum(1 - ev) AS BIGINT) AS c_censored
        |  FROM tt GROUP BY 1),
        |rk AS (SELECT t, d_events, c_censored,
        |    CAST(sum(d_events + c_censored) OVER (ORDER BY t DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS n_risk FROM byt)
        |SELECT t, n_risk, d_events, c_censored,
        |  CAST((1000000 * d_events) // n_risk AS BIGINT) AS hazard_u
        |FROM rk ORDER BY t""".stripMargin,

    // identical double expression over exact milli-integer moments
    "q_power_analysis" ->
      """WITH m AS (SELECT event_type, count(*) AS n,
        |    sum(CAST(floor(value * 1000.0e0 + 0.5e0) AS BIGINT)) AS s1,
        |    sum(CAST(floor(value * 1000.0e0 + 0.5e0) AS BIGINT) *
        |        CAST(floor(value * 1000.0e0 + 0.5e0) AS BIGINT)) AS s2
        |  FROM events GROUP BY 1)
        |SELECT event_type, CAST(n AS BIGINT) AS n,
        |  round(CAST(s1 AS DOUBLE) / n / 1000.0e0, 6) AS mean_val,
        |  round((2.0e0 * 7.848886e0 *
        |    ((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) /
        |      (n - 1))) /
        |    ((0.05e0 * (CAST(s1 AS DOUBLE) / n)) *
        |     (0.05e0 * (CAST(s1 AS DOUBLE) / n))), 2) AS n_required
        |FROM m WHERE n > 1 ORDER BY event_type""".stripMargin,

    // identical micro-integer Benford expectations; cent-string digit
    "q_benford_audit" ->
      """WITH dd AS (SELECT CAST(substr(CAST(CAST(floor(
        |      o_totalprice * 100.0e0 + 0.5e0) AS BIGINT) AS VARCHAR),
        |      1, 1) AS BIGINT) AS digit
        |  FROM orders),
        |f AS (SELECT digit FROM dd WHERE digit >= 1),
        |t AS (SELECT count(*) AS n_all FROM f)
        |SELECT digit, count(*) AS n_obs,
        |  CAST((1000000 * count(*)) // n_all AS BIGINT) AS p_obs_u,
        |  CAST(([301030, 176091, 124939, 96910, 79181, 66947, 57992,
        |    51153, 45757])[CAST(digit AS INT)] AS BIGINT) AS p_exp_u
        |FROM f, t GROUP BY digit, n_all ORDER BY digit""".stripMargin,

    // same (score DESC, id) global ranking; integer lift vs base rate
    "q_decile_lift" ->
      """WITH r AS (SELECT doc_id,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
        |    row_number() OVER (ORDER BY CAST(n_chars AS DOUBLE) DESC,
        |      doc_id) AS rn
        |  FROM documents),
        |t AS (SELECT count(*) AS n, sum(pos) AS p_all FROM r),
        |g AS (SELECT ((rn - 1) * 10) // n AS decile,
        |    count(*) AS n_rows, sum(pos) AS n_pos, any_value(n) AS n,
        |    any_value(p_all) AS p_all
        |  FROM r, t GROUP BY 1)
        |SELECT decile, CAST(n_rows AS BIGINT) AS n_rows,
        |  CAST(n_pos AS BIGINT) AS n_pos,
        |  CASE WHEN p_all > 0 THEN
        |    CAST((1000000 * n_pos * n) // (n_rows * p_all) AS BIGINT)
        |  END AS lift_u
        |FROM g ORDER BY decile""".stripMargin,

    // same (price, line-id) order, lower weighted median on exact cents
    "q_weighted_median" ->
      """WITH li AS (SELECT l_returnflag,
        |    CAST(floor(l_extendedprice * 100.0e0 + 0.5e0) AS BIGINT)
        |      AS price_c,
        |    CAST(l_quantity AS BIGINT) AS qty,
        |    l_orderkey * 16 + l_linenumber AS lid
        |  FROM lineitem),
        |c AS (SELECT l_returnflag, price_c, qty, lid,
        |    sum(qty) OVER (PARTITION BY l_returnflag
        |      ORDER BY price_c, lid
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM li),
        |t AS (SELECT l_returnflag, sum(qty) AS w_all,
        |    count(*) AS n_lines FROM li GROUP BY 1),
        |m AS (SELECT c.l_returnflag, price_c, cum, lid, t.w_all,
        |    t.n_lines
        |  FROM c JOIN t USING (l_returnflag) WHERE cum * 2 >= w_all),
        |r AS (SELECT *, row_number() OVER (PARTITION BY l_returnflag
        |    ORDER BY cum, lid) AS rn FROM m)
        |SELECT l_returnflag, CAST(n_lines AS BIGINT) AS n_lines,
        |  CAST(w_all AS BIGINT) AS w_all, price_c AS wmedian_c
        |FROM r WHERE rn = 1 ORDER BY l_returnflag""".stripMargin,

    // same sorted moving frame; lower median at (size+1)//2, 1-based
    "q_rolling_quantile" ->
      """WITH day AS (SELECT CAST(ts AS DATE) AS day,
        |    CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS rd
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |w AS (SELECT day, rd, list_sort(list(rd) OVER (ORDER BY day
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS win FROM day)
        |SELECT strftime(day, '%Y-%m-%d') AS day, rd,
        |  win[CAST((len(win) + 1) // 2 AS INT)] AS med7,
        |  win[CAST(len(win) AS INT)] AS max7
        |FROM w ORDER BY day""".stripMargin,

    // exact integer co-moments per pair; one identical double expression
    "q_corr_matrix" ->
      """WITH day AS (SELECT CAST(ts AS DATE) AS day, event_type,
        |    sum(CAST(floor(value) AS BIGINT)) AS rd
        |  FROM events GROUP BY 1, 2),
        |p AS (SELECT a.event_type AS t1, b.event_type AS t2,
        |    count(*) AS n_days,
        |    sum(a.rd) AS sx, sum(b.rd) AS sy,
        |    sum(a.rd * a.rd) AS sxx, sum(b.rd * b.rd) AS syy,
        |    sum(a.rd * b.rd) AS sxy
        |  FROM day a JOIN day b ON a.day = b.day
        |    AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT t1, t2, CAST(n_days AS BIGINT) AS n_days,
        |  round((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n_days) /
        |    (sqrt(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n_days) *
        |     sqrt(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n_days)),
        |    6) AS corr
        |FROM p ORDER BY t1, t2""".stripMargin,

    // same contingency-prefix percentiles (lower-percentile contract)
    "q_ship_lag" ->
      """WITH lag AS (SELECT o_orderpriority,
        |    CAST(CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE)
        |      AS BIGINT) AS lag_d
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |g AS (SELECT o_orderpriority, lag_d, count(*) AS c
        |  FROM lag GROUP BY 1, 2),
        |cgg AS (SELECT o_orderpriority, lag_d, c, sum(c) OVER (
        |    PARTITION BY o_orderpriority ORDER BY lag_d
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM g),
        |t AS (SELECT o_orderpriority, count(*) AS n FROM lag GROUP BY 1)
        |SELECT o_orderpriority, CAST(any_value(n) AS BIGINT) AS n_lines,
        |  CAST(min(CASE WHEN cum * 2 >= n THEN lag_d END) AS BIGINT)
        |    AS p50_lag,
        |  CAST(min(CASE WHEN cum * 10 >= n * 9 THEN lag_d END) AS BIGINT)
        |    AS p90_lag,
        |  CAST(max(lag_d) AS BIGINT) AS max_lag
        |FROM cgg JOIN t USING (o_orderpriority)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // same smoothed-rate arithmetic on exact integer aggregates
    "q_target_encode" ->
      """WITH p AS (SELECT p_brand,
        |    CAST(floor(p_retailprice * 100.0e0 + 0.5e0) AS BIGINT)
        |      AS price_c
        |  FROM part),
        |gl AS (SELECT count(*) AS n_all,
        |    sum(price_c) // count(*) AS gm_c FROM p),
        |lab AS (SELECT p_brand,
        |    CASE WHEN price_c > gm_c THEN 1 ELSE 0 END AS pos
        |  FROM p, gl),
        |pr AS (SELECT (1000000 * sum(pos)) // count(*) AS prior_u
        |  FROM lab)
        |SELECT p_brand, count(*) AS n, CAST(sum(pos) AS BIGINT) AS pos,
        |  CAST((1000000 * sum(pos) + 10 * any_value(prior_u)) //
        |    (count(*) + 10) AS BIGINT) AS enc_u,
        |  CAST(any_value(prior_u) AS BIGINT) AS prior_u
        |FROM lab, pr GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    // same deterministic 20-user request list; one conditional agg
    "q_forget_user" ->
      """WITH doomed AS (SELECT DISTINCT user_id FROM events
        |  ORDER BY user_id LIMIT 20)
        |SELECT event_type, count(*) AS n_total,
        |  CAST(sum(CASE WHEN user_id IN (SELECT user_id FROM doomed)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_deleted,
        |  CAST(sum(CASE WHEN user_id IN (SELECT user_id FROM doomed)
        |    THEN 0 ELSE 1 END) AS BIGINT) AS n_retained
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,

    // identical double expressions over exact milli-integer cell sums
    "q_diff_in_diff" ->
      """WITH e AS (SELECT user_id % 2 AS arm,
        |    ts >= TIMESTAMP '2024-01-16' AS post,
        |    CAST(floor(value * 1000.0e0 + 0.5e0) AS BIGINT) AS vq
        |  FROM events),
        |m AS (SELECT
        |    sum(CASE WHEN arm = 0 AND NOT post THEN vq END) AS s_0_a,
        |    count(CASE WHEN arm = 0 AND NOT post THEN 1 END) AS n_0_a,
        |    sum(CASE WHEN arm = 0 AND post THEN vq END) AS s_0_b,
        |    count(CASE WHEN arm = 0 AND post THEN 1 END) AS n_0_b,
        |    sum(CASE WHEN arm = 1 AND NOT post THEN vq END) AS s_1_a,
        |    count(CASE WHEN arm = 1 AND NOT post THEN 1 END) AS n_1_a,
        |    sum(CASE WHEN arm = 1 AND post THEN vq END) AS s_1_b,
        |    count(CASE WHEN arm = 1 AND post THEN 1 END) AS n_1_b
        |  FROM e)
        |SELECT
        |  round(CAST(s_0_a AS DOUBLE) / n_0_a / 1000.0e0, 6) AS ctrl_pre,
        |  round(CAST(s_0_b AS DOUBLE) / n_0_b / 1000.0e0, 6) AS ctrl_post,
        |  round(CAST(s_1_a AS DOUBLE) / n_1_a / 1000.0e0, 6) AS treat_pre,
        |  round(CAST(s_1_b AS DOUBLE) / n_1_b / 1000.0e0, 6) AS treat_post,
        |  round((CAST(s_1_b AS DOUBLE) / n_1_b / 1000.0e0 -
        |    CAST(s_1_a AS DOUBLE) / n_1_a / 1000.0e0) -
        |    (CAST(s_0_b AS DOUBLE) / n_0_b / 1000.0e0 -
        |     CAST(s_0_a AS DOUBLE) / n_0_a / 1000.0e0), 6) AS did
        |FROM m""".stripMargin,

    // CC labels via the recursive min-reachable fixpoint (the engine's
    // large/small-star converges to the same min label per component)
    "q_modularity" ->
      s"""WITH RECURSIVE $coEdgesSql,
         |ee AS (SELECT p1 AS src, p2 AS dst FROM pe
         |  UNION ALL SELECT p2, p1 FROM pe),
         |reach(v, r) AS (
         |  SELECT DISTINCT src, src FROM ee
         |  UNION
         |  SELECT ee.dst, reach.r FROM reach JOIN ee ON reach.v = ee.src),
         |lbl AS (SELECT v, min(r) AS lbl FROM reach GROUP BY v),
         |deg AS (SELECT n AS node, count(*) AS dg FROM (
         |    SELECT p1 AS n FROM pe UNION ALL SELECT p2 FROM pe) t
         |  GROUP BY 1),
         |comm AS (SELECT lbl.lbl, CAST(sum(dg) AS BIGINT) AS deg_c,
         |    count(*) AS sz
         |  FROM deg JOIN lbl ON deg.node = lbl.v GROUP BY 1),
         |mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM pe)
         |SELECT count(*) AS n_communities,
         |  CAST(max(sz) AS BIGINT) AS largest,
         |  any_value(m) AS m_edges,
         |  CAST((1000000::HUGEINT * (4::HUGEINT * any_value(m) *
         |    any_value(m) - sum(deg_c * deg_c))) //
         |    (4::HUGEINT * any_value(m) * any_value(m)) AS BIGINT) AS q_u
         |FROM comm, mm""".stripMargin,

    // same shifted-date self-join; integer MAE, WMAPE micro
    "q_forecast_backtest" ->
      """WITH day AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS rd
        |  FROM events GROUP BY 1, 2),
        |j AS (SELECT a.event_type, a.day, a.rd, b.rd AS pred
        |  FROM day a JOIN day b ON a.event_type = b.event_type
        |    AND a.day = b.day + INTERVAL 7 DAY
        |  WHERE a.day >= DATE '2024-01-17')
        |SELECT event_type, count(*) AS n_days,
        |  CAST(sum(abs(rd - pred)) // count(*) AS BIGINT) AS mae_d,
        |  CASE WHEN sum(rd) > 0 THEN
        |    CAST((1000000 * sum(abs(rd - pred))) // sum(rd) AS BIGINT)
        |  END AS wmape_u
        |FROM j GROUP BY 1 ORDER BY event_type""".stripMargin,

    // same descending-revenue ranking and integer class thresholds
    "q_abc_class" ->
      """WITH rev AS (SELECT l_partkey,
        |    CAST(sum(CAST(floor(l_extendedprice * 100.0e0 + 0.5e0)
        |      AS BIGINT)) AS BIGINT) AS rev_c
        |  FROM lineitem GROUP BY 1),
        |r AS (SELECT rev_c, sum(rev_c) OVER (
        |    ORDER BY CAST(rev_c AS DOUBLE) DESC, l_partkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM rev),
        |t AS (SELECT CAST(sum(rev_c) AS BIGINT) AS t_all FROM rev),
        |cl AS (SELECT rev_c,
        |    CASE WHEN cum * 10 <= t_all * 8 THEN 'A'
        |      WHEN cum * 20 <= t_all * 19 THEN 'B'
        |      ELSE 'C' END AS abc
        |  FROM r, t)
        |SELECT abc, count(*) AS n_parts,
        |  CAST(sum(rev_c) AS BIGINT) AS rev_c,
        |  round(CAST(sum(rev_c) AS DOUBLE) / any_value(t_all), 6)
        |    AS share
        |FROM cl, t GROUP BY abc ORDER BY abc""".stripMargin,

    // same epoch-week decomposition; churn via the shifted anti-join
    "q_growth_accounting" ->
      """WITH uw AS (SELECT DISTINCT user_id,
        |    (CAST(ts AS DATE) - DATE '2024-01-01') // 7 AS wk
        |  FROM events),
        |fw AS (SELECT user_id, min(wk) AS fw FROM uw GROUP BY 1),
        |cur AS (SELECT u.wk,
        |    sum(CASE WHEN u.wk = fw.fw THEN 1 ELSE 0 END) AS n_new,
        |    sum(CASE WHEN u.wk <> fw.fw AND p.user_id IS NOT NULL
        |      THEN 1 ELSE 0 END) AS n_retained,
        |    sum(CASE WHEN u.wk <> fw.fw AND p.user_id IS NULL
        |      THEN 1 ELSE 0 END) AS n_resurrected
        |  FROM uw u JOIN fw ON u.user_id = fw.user_id
        |  LEFT JOIN uw p ON p.user_id = u.user_id AND p.wk + 1 = u.wk
        |  GROUP BY 1),
        |ch AS (SELECT a.wk + 1 AS wk, count(*) AS n_churned
        |  FROM uw a LEFT JOIN uw b
        |    ON b.user_id = a.user_id AND b.wk = a.wk + 1
        |  WHERE b.user_id IS NULL GROUP BY 1)
        |SELECT CAST(wk AS BIGINT) AS wk,
        |  CAST(coalesce(n_new, 0) AS BIGINT) AS n_new,
        |  CAST(coalesce(n_retained, 0) AS BIGINT) AS n_retained,
        |  CAST(coalesce(n_resurrected, 0) AS BIGINT) AS n_resurrected,
        |  CAST(coalesce(n_churned, 0) AS BIGINT) AS n_churned
        |FROM cur FULL OUTER JOIN ch USING (wk) ORDER BY wk""".stripMargin,

    // same second-resolution gap moments; integer rate over the span
    "q_bot_detect" ->
      """WITH g AS (SELECT user_id, epoch_us(ts) AS ts_us,
        |    (epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |      PARTITION BY user_id ORDER BY epoch_us(ts))) // 1000000
        |      AS gap_s
        |  FROM events),
        |u AS (SELECT user_id, count(*) AS n_events,
        |    max(ts_us) - min(ts_us) AS span_us,
        |    count(gap_s) AS n_gaps, sum(gap_s) AS sg,
        |    sum(gap_s * gap_s) AS sgg
        |  FROM g GROUP BY 1)
        |SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
        |  CAST((n_events * 3600000000) // span_us AS BIGINT) AS rate_h,
        |  round(sqrt((CAST(sgg AS DOUBLE) -
        |    CAST(sg AS DOUBLE) * sg / n_gaps) / n_gaps) /
        |    (CAST(sg AS DOUBLE) / n_gaps), 6) AS gap_cv
        |FROM u WHERE n_gaps >= 2 AND span_us > 0
        |ORDER BY rate_h DESC, user_id LIMIT 20""".stripMargin,

    // same integer pairwise slopes; lower median by row_number
    "q_theilsen" ->
      """WITH day AS (SELECT
        |    CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS di,
        |    CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS rd
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |sl AS (SELECT (1000000 * (b.rd - a.rd)) // (b.di - a.di)
        |    AS slope_u
        |  FROM day a JOIN day b ON a.di < b.di),
        |r AS (SELECT slope_u, row_number() OVER (ORDER BY slope_u)
        |    AS rn, count(*) OVER () AS np FROM sl),
        |t AS (SELECT count(*) AS n_days FROM day)
        |SELECT CAST(n_days AS BIGINT) AS n_days,
        |  CAST(np AS BIGINT) AS n_pairs,
        |  CAST(slope_u AS BIGINT) AS slope_med_u
        |FROM r, t WHERE rn = (np + 1) // 2""".stripMargin,

    // same two keyed aggregates per relation
    "q_cardinality_audit" ->
      """WITH rel AS (
        |  SELECT 'lineitem.orderkey->orders' AS relation,
        |    l_orderkey AS lk FROM lineitem
        |  UNION ALL SELECT 'orders.custkey->customer', o_custkey
        |    FROM orders
        |  UNION ALL SELECT 'lineitem.partkey->part', l_partkey
        |    FROM lineitem),
        |l AS (SELECT relation, count(*) AS n_keys,
        |    CAST(sum(c) AS BIGINT) AS n_rows,
        |    CAST(max(c) AS BIGINT) AS max_fanout FROM (
        |    SELECT relation, lk, count(*) AS c FROM rel GROUP BY 1, 2) t
        |  GROUP BY 1),
        |r AS (
        |  SELECT 'lineitem.orderkey->orders' AS relation,
        |    CAST(max(c) AS BIGINT) AS rmax FROM (
        |    SELECT o_orderkey, count(*) AS c FROM orders GROUP BY 1) t
        |  UNION ALL SELECT 'orders.custkey->customer', max(c) FROM (
        |    SELECT c_custkey, count(*) AS c FROM customer GROUP BY 1) t
        |  UNION ALL SELECT 'lineitem.partkey->part', max(c) FROM (
        |    SELECT p_partkey, count(*) AS c FROM part GROUP BY 1) t)
        |SELECT l.relation, n_rows, n_keys, max_fanout,
        |  CAST(CASE WHEN rmax = 1 THEN 1 ELSE 0 END AS BIGINT)
        |    AS right_unique,
        |  CASE WHEN rmax = 1 THEN
        |    CASE WHEN max_fanout = 1 THEN '1:1' ELSE 'N:1' END
        |  ELSE 'N:M' END AS rel_class
        |FROM l JOIN r ON l.relation = r.relation
        |ORDER BY l.relation""".stripMargin,

    // same distinct-domain semi-join counts
    "q_fk_inclusion" ->
      """WITH pairs AS (
        |  SELECT 'lineitem.l_partkey in part.p_partkey' AS candidate,
        |    (SELECT count(DISTINCT l_partkey) FROM lineitem) AS n_child,
        |    (SELECT count(*) FROM
        |      (SELECT DISTINCT l_partkey FROM lineitem) a
        |      WHERE a.l_partkey IN (SELECT p_partkey FROM part))
        |      AS n_contained
        |  UNION ALL
        |  SELECT 'orders.o_custkey in customer.c_custkey',
        |    (SELECT count(DISTINCT o_custkey) FROM orders),
        |    (SELECT count(*) FROM
        |      (SELECT DISTINCT o_custkey FROM orders) a
        |      WHERE a.o_custkey IN (SELECT c_custkey FROM customer))
        |  UNION ALL
        |  SELECT 'events.user_id in customer.c_custkey',
        |    (SELECT count(DISTINCT user_id) FROM events),
        |    (SELECT count(*) FROM
        |      (SELECT DISTINCT user_id FROM events) a
        |      WHERE a.user_id IN (SELECT c_custkey FROM customer))
        |  UNION ALL
        |  SELECT 'part.p_partkey in lineitem.l_partkey',
        |    (SELECT count(DISTINCT p_partkey) FROM part),
        |    (SELECT count(*) FROM
        |      (SELECT DISTINCT p_partkey FROM part) a
        |      WHERE a.p_partkey IN (SELECT l_partkey FROM lineitem)))
        |SELECT candidate, CAST(n_child AS BIGINT) AS n_child,
        |  CAST(n_contained AS BIGINT) AS n_contained,
        |  CAST((1000000 * n_contained) // n_child AS BIGINT)
        |    AS inclusion_u
        |FROM pairs ORDER BY candidate""".stripMargin,

    // the same recursion as the Spark driver loop, replayed as a
    // recursive CTE: identical double expression shapes in identical
    // order, same α/β literals
    "q_holt_linear" ->
      """WITH RECURSIVE dd AS (SELECT
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
        |    count(*) AS y
        |  FROM events GROUP BY 1),
        |i AS (SELECT d, CAST(y AS BIGINT) AS y,
        |    row_number() OVER (ORDER BY d) - 1 AS t FROM dd),
        |h AS (
        |  SELECT t, y, CAST(y AS DOUBLE) AS f, CAST(y AS DOUBLE) AS l,
        |    coalesce((SELECT CAST(y AS DOUBLE) FROM i WHERE t = 1)
        |      - CAST(y AS DOUBLE), 0.0e0) AS b
        |  FROM i WHERE t = 0
        |  UNION ALL
        |  SELECT i.t, i.y, h.l + h.b AS f,
        |    0.3e0 * i.y + 0.7e0 * (h.l + h.b) AS l,
        |    0.1e0 * ((0.3e0 * i.y + 0.7e0 * (h.l + h.b)) - h.l)
        |      + 0.9e0 * h.b AS b
        |  FROM h JOIN i ON i.t = h.t + 1)
        |SELECT i.d, h.y, round(h.l, 6) AS level, round(h.b, 6) AS trend,
        |  round(h.f, 6) AS fitted,
        |  round(CAST(h.y AS DOUBLE) - h.f, 6) AS err
        |FROM h JOIN i USING (t) ORDER BY i.d""".stripMargin,

    // the same triple-exponential recursion; the recursive CTE state
    // row carries the 7-slot seasonal window as a LIST column rotated
    // each step
    "q_holt_winters" ->
      """WITH RECURSIVE dd AS (SELECT
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
        |    count(*) AS y
        |  FROM events GROUP BY 1),
        |i AS (SELECT d, CAST(y AS BIGINT) AS y,
        |    row_number() OVER (ORDER BY d) - 1 AS t FROM dd),
        |m1 AS (SELECT sum(y) / 7.0e0 AS l0 FROM i WHERE t <= 6),
        |m2 AS (SELECT CASE WHEN (SELECT max(t) FROM i) >= 13
        |    THEN ((SELECT sum(y) FROM i WHERE t BETWEEN 7 AND 13)
        |      / 7.0e0 - l0) / 7.0e0 ELSE 0.0e0 END AS b0 FROM m1),
        |sl0 AS (SELECT list(CAST(y AS DOUBLE) - l0 ORDER BY t) AS sl
        |  FROM i, m1 WHERE t <= 6),
        |h AS (
        |  SELECT 6 AS t, CAST(NULL AS BIGINT) AS y,
        |    CAST(NULL AS DOUBLE) AS f, l0 AS l, b0 AS b, sl
        |  FROM m1, m2, sl0
        |  UNION ALL
        |  SELECT i.t, i.y, h.l + h.b + h.sl[1] AS f,
        |    0.3e0 * (i.y - h.sl[1]) + 0.7e0 * (h.l + h.b) AS l,
        |    0.1e0 * ((0.3e0 * (i.y - h.sl[1])
        |      + 0.7e0 * (h.l + h.b)) - h.l) + 0.9e0 * h.b AS b,
        |    h.sl[2:7] || [0.2e0 * (i.y - (0.3e0 * (i.y - h.sl[1])
        |      + 0.7e0 * (h.l + h.b))) + 0.8e0 * h.sl[1]] AS sl
        |  FROM h JOIN i ON i.t = h.t + 1)
        |SELECT i.d, h.y, round(h.l, 6) AS level, round(h.b, 6) AS trend,
        |  round(h.sl[7], 6) AS seasonal, round(h.f, 6) AS fitted,
        |  round(CAST(h.y AS DOUBLE) - h.f, 6) AS err
        |FROM h JOIN i USING (t) WHERE h.t >= 7 ORDER BY i.d""".stripMargin,

    // the hazard life table + nano-quantized log prefix sums; the d = n
    // exhaustion flag zeroes S and SE exactly on both engines
    "q_kaplan_meier" ->
      """WITH u AS (SELECT user_id,
        |    min(CAST(ts AS DATE)) AS first_day,
        |    min(CASE WHEN event_type = 'purchase'
        |      THEN CAST(ts AS DATE) END) AS purch_day
        |  FROM events GROUP BY 1),
        |tt AS (SELECT CAST(CASE WHEN purch_day IS NOT NULL
        |      THEN purch_day - first_day
        |      ELSE DATE '2024-01-31' - first_day END AS BIGINT) AS t,
        |    CASE WHEN purch_day IS NOT NULL THEN 1 ELSE 0 END AS ev
        |  FROM u),
        |byt AS (SELECT t, CAST(sum(ev) AS BIGINT) AS d_events,
        |    CAST(sum(1 - ev) AS BIGINT) AS c_censored
        |  FROM tt GROUP BY 1),
        |rk AS (SELECT t, d_events, c_censored,
        |    CAST(sum(d_events + c_censored) OVER (ORDER BY t DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS n_risk FROM byt),
        |q AS (SELECT t, n_risk, d_events, c_censored,
        |    CASE WHEN d_events < n_risk THEN CAST(floor(
        |      ln(CAST(n_risk - d_events AS DOUBLE)
        |        / CAST(n_risk AS DOUBLE)) * 1e9 + 0.5e0) AS BIGINT)
        |      ELSE 0 END AS lq,
        |    CASE WHEN d_events < n_risk THEN CAST(floor(
        |      CAST(d_events AS DOUBLE) / (CAST(n_risk AS DOUBLE)
        |        * CAST(n_risk - d_events AS DOUBLE)) * 1e12 + 0.5e0)
        |      AS BIGINT) ELSE 0 END AS gq,
        |    CASE WHEN d_events = n_risk THEN 1 ELSE 0 END AS zf
        |  FROM rk),
        |cm AS (SELECT t, n_risk, d_events, c_censored,
        |    CAST(sum(lq) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cuml,
        |    CAST(sum(gq) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cumg,
        |    CAST(sum(zf) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS zeroed
        |  FROM q)
        |SELECT t, n_risk, d_events, c_censored,
        |  CASE WHEN zeroed > 0 THEN 0.0e0
        |    ELSE round(exp(CAST(cuml AS DOUBLE) / 1e9), 6) END AS surv,
        |  CASE WHEN zeroed > 0 THEN 0.0e0
        |    ELSE round(exp(CAST(cuml AS DOUBLE) / 1e9)
        |      * sqrt(CAST(cumg AS DOUBLE) / 1e12), 6) END
        |    AS se_greenwood
        |FROM cm ORDER BY t""".stripMargin,

    // per-candidate (det, dep) counts -> per-det majority; g3 =
    // sum(group - majority)
    "q_fd_check" ->
      """WITH f1 AS (SELECT count(*) AS n_keys,
        |    CAST(sum(n) AS BIGINT) AS n_rows,
        |    CAST(sum(n - mx) AS BIGINT) AS violations
        |  FROM (SELECT k, sum(c) AS n, max(c) AS mx FROM (
        |      SELECT source AS k, lang AS v, count(*) AS c
        |      FROM documents GROUP BY 1, 2) cd1 GROUP BY 1) p1),
        |f2 AS (SELECT count(*) AS n_keys,
        |    CAST(sum(n) AS BIGINT) AS n_rows,
        |    CAST(sum(n - mx) AS BIGINT) AS violations
        |  FROM (SELECT k, sum(c) AS n, max(c) AS mx FROM (
        |      SELECT c_nationkey AS k, c_mktsegment AS v, count(*) AS c
        |      FROM customer GROUP BY 1, 2) cd2 GROUP BY 1) p2),
        |f3 AS (SELECT count(*) AS n_keys,
        |    CAST(sum(n) AS BIGINT) AS n_rows,
        |    CAST(sum(n - mx) AS BIGINT) AS violations
        |  FROM (SELECT k, sum(c) AS n, max(c) AS mx FROM (
        |      SELECT o_custkey AS k, o_orderpriority AS v, count(*) AS c
        |      FROM orders GROUP BY 1, 2) cd3 GROUP BY 1) p3),
        |f4 AS (SELECT count(*) AS n_keys,
        |    CAST(sum(n) AS BIGINT) AS n_rows,
        |    CAST(sum(n - mx) AS BIGINT) AS violations
        |  FROM (SELECT k, sum(c) AS n, max(c) AS mx FROM (
        |      SELECT l_partkey AS k, l_suppkey AS v, count(*) AS c
        |      FROM lineitem GROUP BY 1, 2) cd4 GROUP BY 1) p4),
        |u AS (
        |  SELECT 'documents.source->lang' AS fd, n_rows, n_keys,
        |    violations FROM f1
        |  UNION ALL SELECT 'customer.c_nationkey->c_mktsegment',
        |    n_rows, n_keys, violations FROM f2
        |  UNION ALL SELECT 'orders.o_custkey->o_orderpriority',
        |    n_rows, n_keys, violations FROM f3
        |  UNION ALL SELECT 'lineitem.l_partkey->l_suppkey',
        |    n_rows, n_keys, violations FROM f4)
        |SELECT fd, n_rows, CAST(n_keys AS BIGINT) AS n_keys, violations,
        |  round(CAST(violations AS DOUBLE) / CAST(n_rows AS DOUBLE), 6)
        |    AS g3_rate,
        |  CAST(CASE WHEN violations = 0 THEN 1 ELSE 0 END AS BIGINT)
        |    AS holds
        |FROM u ORDER BY fd""".stripMargin,

    // closed-form leave-one-group-out deltas from one keyed aggregate
    // + the global moments
    "q_loo_influence" ->
      """WITH docs AS (SELECT source, n_chars,
        |    CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS pass
        |  FROM documents),
        |bys AS (SELECT source, count(*) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS sc,
        |    CAST(sum(pass) AS BIGINT) AS np
        |  FROM docs GROUP BY 1),
        |g AS (SELECT count(*) AS nn, CAST(sum(n_chars) AS BIGINT) AS tc,
        |    CAST(sum(pass) AS BIGINT) AS tp FROM docs)
        |SELECT source, n_docs,
        |  round(CAST(sc AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
        |    AS mean_src,
        |  CASE WHEN CAST(nn AS DOUBLE) - CAST(n_docs AS DOUBLE) <> 0
        |    THEN round((CAST(tc AS DOUBLE) - CAST(sc AS DOUBLE))
        |      / (CAST(nn AS DOUBLE) - CAST(n_docs AS DOUBLE))
        |      - CAST(tc AS DOUBLE) / CAST(nn AS DOUBLE), 6) END
        |    AS delta_mean,
        |  CASE WHEN CAST(nn AS DOUBLE) - CAST(n_docs AS DOUBLE) <> 0
        |    THEN round((CAST(tp AS DOUBLE) - CAST(np AS DOUBLE))
        |      / (CAST(nn AS DOUBLE) - CAST(n_docs AS DOUBLE))
        |      - CAST(tp AS DOUBLE) / CAST(nn AS DOUBLE), 6) END
        |    AS delta_passrate
        |FROM bys CROSS JOIN g ORDER BY source""".stripMargin,

    // blocked activity quintiles on the distinct-count frame; exact
    // integer arm sums; DECIMAL-weighted micro-quantized ATE fold
    "q_propensity_strat" ->
      """WITH u AS (SELECT user_id, count(*) AS x,
        |    CAST(CASE WHEN arg_min(event_type, event_id) = 'purchase'
        |      THEN 1 ELSE 0 END AS BIGINT) AS treat,
        |    CAST(sum(CAST(floor(value * 1000.0e0 + 0.5e0) AS BIGINT))
        |      AS BIGINT) AS sv
        |  FROM events GROUP BY 1),
        |uy AS (SELECT user_id, x, treat, sv // x AS yq FROM u),
        |byx AS (SELECT x, count(*) AS cnt FROM uy GROUP BY 1),
        |nu AS (SELECT CAST(sum(cnt) AS BIGINT) AS nu FROM byx),
        |st AS (SELECT x,
        |    ((CAST(sum(cnt) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) - cnt) * 5) // nu.nu
        |      AS stratum
        |  FROM byx CROSS JOIN nu),
        |bys AS (SELECT stratum, count(*) AS n,
        |    CAST(sum(treat) AS BIGINT) AS nt,
        |    CAST(sum(treat * yq) AS BIGINT) AS syt,
        |    CAST(sum((1 - treat) * yq) AS BIGINT) AS syc
        |  FROM uy JOIN st USING (x) GROUP BY 1),
        |we AS (SELECT stratum, n, nt, n - nt AS nc, syt, syc,
        |    CASE WHEN nt > 0 AND n - nt > 0 THEN CAST(floor(
        |      (CAST(syt AS DOUBLE) / CAST(nt AS DOUBLE) / 1000.0e0
        |        - CAST(syc AS DOUBLE) / CAST(n - nt AS DOUBLE)
        |          / 1000.0e0) * 1e6 + 0.5e0) AS BIGINT) END AS effq
        |  FROM bys),
        |ate AS (SELECT sum(CAST(n AS HUGEINT) * effq) AS swe,
        |    CAST(sum(n) AS BIGINT) AS sn FROM we WHERE effq IS NOT NULL)
        |SELECT stratum, n, nt, nc,
        |  CASE WHEN nt > 0 THEN round(CAST(syt AS DOUBLE)
        |    / CAST(nt AS DOUBLE) / 1000.0e0, 6) END AS mean_treat,
        |  CASE WHEN nc > 0 THEN round(CAST(syc AS DOUBLE)
        |    / CAST(nc AS DOUBLE) / 1000.0e0, 6) END AS mean_ctrl,
        |  CASE WHEN effq IS NOT NULL THEN CAST(effq AS DOUBLE) / 1e6 END
        |    AS effect,
        |  CASE WHEN sn IS NOT NULL AND sn > 0 THEN round(
        |    CAST(swe AS DOUBLE) / CAST(sn AS DOUBLE) / 1e6, 6) END
        |    AS ate
        |FROM we CROSS JOIN ate ORDER BY stratum""".stripMargin,

    // global top-(k+1) order statistics; nano-quantized log-ratios
    "q_hill_tail" ->
      """WITH nn AS (SELECT count(*) AS n FROM documents),
        |kk AS (SELECT greatest(1, least(100, n // 2)) AS k FROM nn),
        |r AS (SELECT doc_id, n_chars, row_number() OVER (
        |    ORDER BY n_chars DESC, doc_id) AS rn FROM documents),
        |xm AS (SELECT n_chars AS xmin FROM r, kk WHERE rn = k + 1),
        |l AS (SELECT xmin, CAST(floor(
        |    ln(CAST(r.n_chars AS DOUBLE) / CAST(xmin AS DOUBLE))
        |      * 1e9 + 0.5e0) AS BIGINT) AS lq
        |  FROM r, kk, xm WHERE rn <= k)
        |SELECT count(*) AS k, xmin,
        |  CASE WHEN sum(lq) > 0 THEN round(CAST(count(*) AS DOUBLE)
        |    / (CAST(sum(lq) AS DOUBLE) / 1e9), 6) END AS alpha
        |FROM l GROUP BY xmin""".stripMargin,

    // scale-free micro-quantized deviations; dense day index; bounded
    // 7-lag fan-out
    // calendar-bounded all-window distances; integer mean-centered
    // deviations (scaled by 7); ties to the smaller neighbor
    "q_matrix_profile" ->
      """WITH byd AS (SELECT
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dd,
        |    count(*) AS y
        |  FROM events GROUP BY 1),
        |idx AS (SELECT
        |    CAST(row_number() OVER (ORDER BY dd) AS BIGINT) AS t, y
        |  FROM byd),
        |ex AS (SELECT t - off AS wt, CAST(off AS BIGINT) AS off, y
        |  FROM idx CROSS JOIN (SELECT unnest(range(0, 7)) AS off) o
        |  WHERE t - off >= 1),
        |sums AS (SELECT wt, CAST(sum(y) AS BIGINT) AS sw
        |  FROM ex GROUP BY wt HAVING count(*) = 7),
        |devs AS (SELECT ex.wt, ex.off,
        |    CAST(ex.y * 7 - s.sw AS BIGINT) AS dev
        |  FROM ex JOIN sums s ON ex.wt = s.wt),
        |d2 AS (SELECT a.wt AS ta, b.wt AS tb,
        |    CAST(sum((a.dev - b.dev) * (a.dev - b.dev)) AS BIGINT)
        |      AS d2
        |  FROM devs a JOIN devs b ON a.off = b.off
        |    AND abs(a.wt - b.wt) >= 4
        |  GROUP BY 1, 2),
        |prof AS (SELECT ta AS t, tb AS nn, d2 FROM (
        |    SELECT ta, tb, d2, row_number() OVER (PARTITION BY ta
        |      ORDER BY d2 ASC, tb ASC) AS rn FROM d2) x
        |  WHERE rn = 1),
        |g AS (SELECT min(d2) AS mn, max(d2) AS mx FROM prof)
        |SELECT t, nn, d2, d2 = mn AS is_motif, d2 = mx AS is_discord
        |FROM prof CROSS JOIN g ORDER BY t""".stripMargin,

    // the q_acf chain with nano-quantized r_k^2/(n-k) terms; chi2_7
    // literal decision
    "q_ljung_box" ->
      """WITH byd AS (SELECT
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dd,
        |    count(*) AS y
        |  FROM events GROUP BY 1),
        |g AS (SELECT count(*) AS n, CAST(sum(y) AS BIGINT) AS sy
        |  FROM byd),
        |idx AS (SELECT
        |    CAST(row_number() OVER (ORDER BY dd) AS BIGINT) AS t,
        |    CAST(floor((CAST(y AS DOUBLE)
        |      / (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) - 1.0e0)
        |      * 1e6 + 0.5e0) AS BIGINT) AS dq
        |  FROM byd CROSS JOIN g),
        |den AS (SELECT CAST(sum(dq * dq) AS BIGINT) AS den,
        |    (SELECT count(*) FROM byd) AS n FROM idx),
        |a AS (SELECT CAST(k AS BIGINT) AS k, t + k AS tk, dq AS dqa
        |  FROM idx CROSS JOIN (SELECT unnest(range(1, 8)) AS k) ks),
        |p AS (SELECT a.k, a.dqa, b.dq AS dqb
        |  FROM a JOIN idx b ON b.t = a.tk),
        |rks AS (SELECT k, n,
        |    CAST(floor((CAST(sum(dqa * dqb) AS DOUBLE)
        |        / CAST(den AS DOUBLE))
        |      * (CAST(sum(dqa * dqb) AS DOUBLE) / CAST(den AS DOUBLE))
        |      / CAST(n - k AS DOUBLE) * 1e9 + 0.5e0) AS BIGINT)
        |      AS term_u
        |  FROM p CROSS JOIN den GROUP BY k, n, den)
        |SELECT n AS n_days, CAST(7 AS BIGINT) AS df,
        |  round(CAST(n AS DOUBLE) * (n + 2)
        |    * (CAST(sum(term_u) AS DOUBLE) / 1e9), 6) AS q_stat,
        |  CAST(n AS DOUBLE) * (n + 2)
        |    * (CAST(sum(term_u) AS DOUBLE) / 1e9) > 14.067140e0
        |    AS reject_5pct
        |FROM rks GROUP BY n""".stripMargin,

    "q_acf" ->
      """WITH byd AS (SELECT
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dd,
        |    count(*) AS y
        |  FROM events GROUP BY 1),
        |g AS (SELECT count(*) AS n, CAST(sum(y) AS BIGINT) AS sy
        |  FROM byd),
        |idx AS (SELECT
        |    CAST(row_number() OVER (ORDER BY dd) AS BIGINT) AS t,
        |    CAST(floor((CAST(y AS DOUBLE)
        |      / (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) - 1.0e0)
        |      * 1e6 + 0.5e0) AS BIGINT) AS dq
        |  FROM byd CROSS JOIN g),
        |den AS (SELECT CAST(sum(dq * dq) AS BIGINT) AS den FROM idx),
        |a AS (SELECT CAST(k AS BIGINT) AS k, t + k AS tk, dq AS dqa
        |  FROM idx CROSS JOIN (SELECT unnest(range(1, 8)) AS k) ks),
        |p AS (SELECT a.k, a.dqa, b.dq AS dqb
        |  FROM a JOIN idx b ON b.t = a.tk)
        |SELECT k AS lag, count(*) AS n_pairs,
        |  CASE WHEN den > 0 THEN round(
        |    CAST(sum(dqa * dqb) AS DOUBLE) / CAST(den AS DOUBLE), 6)
        |  END AS acf
        |FROM p CROSS JOIN den GROUP BY k, den ORDER BY lag""".stripMargin,

    // same three-stage character-class mask; per-column rank window on
    // the bounded distinct-pattern frame
    "q_pattern_profile" ->
      """WITH m AS (
        |  SELECT 'customer.c_mktsegment' AS col_name,
        |    regexp_replace(regexp_replace(regexp_replace(c_mktsegment,
        |      '[a-z]', 'a', 'g'), '[A-Z]', 'A', 'g'), '[0-9]', '9', 'g')
        |      AS pattern
        |  FROM customer
        |  UNION ALL
        |  SELECT 'documents.source',
        |    regexp_replace(regexp_replace(regexp_replace(source,
        |      '[a-z]', 'a', 'g'), '[A-Z]', 'A', 'g'), '[0-9]', '9', 'g')
        |  FROM documents
        |  UNION ALL
        |  SELECT 'events.props',
        |    regexp_replace(regexp_replace(regexp_replace(props,
        |      '[a-z]', 'a', 'g'), '[A-Z]', 'A', 'g'), '[0-9]', '9', 'g')
        |  FROM events),
        |c AS (SELECT col_name, pattern, count(*) AS n
        |  FROM m GROUP BY 1, 2),
        |r AS (SELECT col_name, pattern, n,
        |    CAST(sum(n) OVER (PARTITION BY col_name) AS BIGINT) AS tot,
        |    CAST(row_number() OVER (PARTITION BY col_name
        |      ORDER BY n DESC, pattern) AS BIGINT) AS rnk
        |  FROM c)
        |SELECT col_name, rnk, pattern, n,
        |  CAST((1000000 * n) // tot AS BIGINT) AS share_u
        |FROM r WHERE rnk <= 5 ORDER BY col_name, rnk""".stripMargin,

    // one semigroup aggregate per key column
    "q_sequence_audit" ->
      """WITH a AS (
        |  SELECT 'documents.doc_id' AS key_col, count(*) AS n,
        |    count(DISTINCT doc_id) AS n_distinct,
        |    CAST(min(doc_id) AS BIGINT) AS kmin,
        |    CAST(max(doc_id) AS BIGINT) AS kmax FROM documents
        |  UNION ALL
        |  SELECT 'embeddings.vec_id', count(*),
        |    count(DISTINCT vec_id), CAST(min(vec_id) AS BIGINT),
        |    CAST(max(vec_id) AS BIGINT) FROM embeddings
        |  UNION ALL
        |  SELECT 'events.event_id', count(*),
        |    count(DISTINCT event_id), CAST(min(event_id) AS BIGINT),
        |    CAST(max(event_id) AS BIGINT) FROM events
        |  UNION ALL
        |  SELECT 'orders.o_orderkey', count(*),
        |    count(DISTINCT o_orderkey), CAST(min(o_orderkey) AS BIGINT),
        |    CAST(max(o_orderkey) AS BIGINT) FROM orders
        |  UNION ALL
        |  SELECT 'customer.c_custkey', count(*),
        |    count(DISTINCT c_custkey), CAST(min(c_custkey) AS BIGINT),
        |    CAST(max(c_custkey) AS BIGINT) FROM customer)
        |SELECT key_col, n, CAST(n_distinct AS BIGINT) AS n_distinct,
        |  kmin, kmax,
        |  kmax - kmin + 1 - n_distinct AS gaps,
        |  n - n_distinct AS dupes,
        |  CAST(CASE WHEN kmax - kmin + 1 = n_distinct
        |    AND n = n_distinct THEN 1 ELSE 0 END AS BIGINT) AS is_dense
        |FROM a ORDER BY key_col""".stripMargin,

    // distinct (user, type) frame first; user-keyed pair self-join
    "q_audience_overlap" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        |sz AS (SELECT event_type, count(*) AS nu FROM ut GROUP BY 1),
        |bt AS (SELECT a.event_type AS t1, b.event_type AS t2,
        |    count(*) AS n_both
        |  FROM ut a JOIN ut b ON a.user_id = b.user_id
        |    AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT t1, t2, s1.nu AS n1, s2.nu AS n2, n_both,
        |  round(CAST(n_both AS DOUBLE)
        |    / CAST(s1.nu + s2.nu - n_both AS DOUBLE), 6) AS jaccard
        |FROM bt JOIN sz s1 ON s1.event_type = bt.t1
        |JOIN sz s2 ON s2.event_type = bt.t2
        |ORDER BY t1, t2""".stripMargin,

    // first-event treatment; blocked DESC activity deciles; cumulative
    // exact integers; mirrored Qini expressions
    "q_qini_uplift" ->
      """WITH u AS (SELECT user_id, count(*) AS x,
        |    CAST(CASE WHEN arg_min(event_type, event_id) = 'purchase'
        |      THEN 1 ELSE 0 END AS BIGINT) AS treat,
        |    CAST(sum(CAST(floor(value * 1000.0e0 + 0.5e0) AS BIGINT))
        |      AS BIGINT) AS sv
        |  FROM events GROUP BY 1),
        |ur AS (SELECT user_id, x, treat,
        |    CAST(CASE WHEN sv // x >= 50000 THEN 1 ELSE 0 END AS BIGINT)
        |      AS resp FROM u),
        |byx AS (SELECT x, count(*) AS cnt FROM ur GROUP BY 1),
        |nu AS (SELECT CAST(sum(cnt) AS BIGINT) AS nu FROM byx),
        |dc AS (SELECT x,
        |    ((CAST(sum(cnt) OVER (ORDER BY x DESC ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) - cnt) * 10) // nu.nu
        |      AS decile
        |  FROM byx CROSS JOIN nu),
        |byd AS (SELECT decile, count(*) AS n,
        |    CAST(sum(treat) AS BIGINT) AS nt,
        |    CAST(sum(treat * resp) AS BIGINT) AS rt,
        |    CAST(sum((1 - treat) * resp) AS BIGINT) AS rc
        |  FROM ur JOIN dc USING (x) GROUP BY 1),
        |cm AS (SELECT decile, n, nt, rt, rc,
        |    CAST(sum(n) OVER w AS BIGINT) AS cn,
        |    CAST(sum(nt) OVER w AS BIGINT) AS cnt_t,
        |    CAST(sum(rt) OVER w AS BIGINT) AS crt,
        |    CAST(sum(rc) OVER w AS BIGINT) AS crc
        |  FROM byd WINDOW w AS (ORDER BY decile ROWS BETWEEN UNBOUNDED
        |    PRECEDING AND CURRENT ROW)),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS tn,
        |    CAST(sum(nt) AS BIGINT) AS tnt,
        |    CAST(sum(rt) AS BIGINT) AS trt,
        |    CAST(sum(rc) AS BIGINT) AS trc FROM byd)
        |SELECT decile, n, cnt_t AS cum_nt, cn - cnt_t AS cum_nc,
        |  crt AS cum_rt, crc AS cum_rc,
        |  CASE WHEN cn - cnt_t > 0 THEN round(CAST(crt AS DOUBLE)
        |    - CAST(crc AS DOUBLE) * CAST(cnt_t AS DOUBLE)
        |      / CAST(cn - cnt_t AS DOUBLE), 6) END AS qini,
        |  CASE WHEN tn - tnt > 0 THEN round((CAST(trt AS DOUBLE)
        |    - CAST(trc AS DOUBLE) * CAST(tnt AS DOUBLE)
        |      / CAST(tn - tnt AS DOUBLE))
        |    * CAST(cn AS DOUBLE) / CAST(tn AS DOUBLE), 6) END
        |    AS qini_random
        |FROM cm CROSS JOIN tot ORDER BY decile""".stripMargin,

    // nano-quantized p*ln terms on the bounded cell frame; entropies
    // from the margins with the same quantization
    "q_mutual_info" ->
      """WITH src AS (
        |  SELECT 'documents.lang~source' AS pair, lang AS a,
        |    source AS b FROM documents
        |  UNION ALL
        |  SELECT 'orders.status~priority', o_orderstatus,
        |    o_orderpriority FROM orders
        |  UNION ALL
        |  SELECT 'customer.segment~nation', c_mktsegment,
        |    CAST(c_nationkey AS VARCHAR) FROM customer),
        |cells AS (SELECT pair, a, b, count(*) AS c
        |  FROM src GROUP BY 1, 2, 3),
        |ma AS (SELECT pair, a, CAST(sum(c) AS BIGINT) AS cnt_a
        |  FROM cells GROUP BY 1, 2),
        |mb AS (SELECT pair, b, CAST(sum(c) AS BIGINT) AS cnt_b
        |  FROM cells GROUP BY 1, 2),
        |nn AS (SELECT pair, CAST(sum(c) AS BIGINT) AS n
        |  FROM cells GROUP BY 1),
        |tm AS (SELECT cells.pair, CAST(floor(
        |    CAST(c AS DOUBLE) / CAST(n AS DOUBLE)
        |    * ln(CAST(c AS DOUBLE) * CAST(n AS DOUBLE)
        |      / (CAST(cnt_a AS DOUBLE) * CAST(cnt_b AS DOUBLE)))
        |    * 1e9 + 0.5e0) AS BIGINT) AS tq
        |  FROM cells JOIN ma USING (pair, a) JOIN mb USING (pair, b)
        |  JOIN nn USING (pair)),
        |ha AS (SELECT ma.pair, CAST(sum(CAST(floor(
        |    -(CAST(cnt_a AS DOUBLE) / CAST(n AS DOUBLE))
        |    * ln(CAST(cnt_a AS DOUBLE) / CAST(n AS DOUBLE))
        |    * 1e9 + 0.5e0) AS BIGINT)) AS BIGINT) AS ha
        |  FROM ma JOIN nn USING (pair) GROUP BY 1),
        |hb AS (SELECT mb.pair, CAST(sum(CAST(floor(
        |    -(CAST(cnt_b AS DOUBLE) / CAST(n AS DOUBLE))
        |    * ln(CAST(cnt_b AS DOUBLE) / CAST(n AS DOUBLE))
        |    * 1e9 + 0.5e0) AS BIGINT)) AS BIGINT) AS hb
        |  FROM mb JOIN nn USING (pair) GROUP BY 1),
        |mi AS (SELECT pair, count(*) AS n_cells,
        |    CAST(sum(tq) AS BIGINT) AS miq FROM tm GROUP BY 1)
        |SELECT mi.pair, nn.n, mi.n_cells,
        |  round(CAST(miq AS DOUBLE) / 1e9, 6) AS mi,
        |  CASE WHEN ha > 0 AND hb > 0 THEN round(
        |    CAST(miq AS DOUBLE) / 1e9
        |    / sqrt(CAST(ha AS DOUBLE) / 1e9
        |      * (CAST(hb AS DOUBLE) / 1e9)), 6) END AS nmi
        |FROM mi JOIN nn USING (pair) JOIN ha USING (pair)
        |JOIN hb USING (pair)
        |ORDER BY pair""".stripMargin,

    // 0.5-Laplace-smoothed shares; mirrored ln ratio; nano-quantized IV
    "q_woe_iv" ->
      """WITH oc AS (SELECT
        |    CAST(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END AS BIGINT) AS good,
        |    c.c_mktsegment AS seg
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |cells AS (SELECT seg, count(*) AS n,
        |    CAST(sum(good) AS BIGINT) AS g,
        |    CAST(count(*) - sum(good) AS BIGINT) AS b
        |  FROM oc GROUP BY 1),
        |tot AS (SELECT CAST(sum(g) AS BIGINT) AS gg,
        |    CAST(sum(b) AS BIGINT) AS bb, count(*) AS k FROM cells),
        |ww AS (SELECT seg, n, g, b,
        |    CAST(floor(ln(((CAST(g AS DOUBLE) + 0.5e0)
        |      / (CAST(gg AS DOUBLE) + 0.5e0 * CAST(k AS DOUBLE)))
        |      / ((CAST(b AS DOUBLE) + 0.5e0)
        |      / (CAST(bb AS DOUBLE) + 0.5e0 * CAST(k AS DOUBLE))))
        |      * 1e9 + 0.5e0) AS BIGINT) AS woeq,
        |    CAST(floor(((CAST(g AS DOUBLE) + 0.5e0)
        |      / (CAST(gg AS DOUBLE) + 0.5e0 * CAST(k AS DOUBLE))
        |      - (CAST(b AS DOUBLE) + 0.5e0)
        |      / (CAST(bb AS DOUBLE) + 0.5e0 * CAST(k AS DOUBLE)))
        |      * ln(((CAST(g AS DOUBLE) + 0.5e0)
        |      / (CAST(gg AS DOUBLE) + 0.5e0 * CAST(k AS DOUBLE)))
        |      / ((CAST(b AS DOUBLE) + 0.5e0)
        |      / (CAST(bb AS DOUBLE) + 0.5e0 * CAST(k AS DOUBLE))))
        |      * 1e9 + 0.5e0) AS BIGINT) AS ivq
        |  FROM cells CROSS JOIN tot),
        |iv AS (SELECT CAST(sum(ivq) AS BIGINT) AS sivq FROM ww)
        |SELECT seg, n, g AS n_good, b AS n_bad,
        |  CAST(woeq AS DOUBLE) / 1e9 AS woe,
        |  CAST(ivq AS DOUBLE) / 1e9 AS iv_contrib,
        |  round(CAST(sivq AS DOUBLE) / 1e9, 6) AS iv_total
        |FROM ww CROSS JOIN iv ORDER BY seg""".stripMargin,

    // symmetrized bipartite edge list; HUGEINT degree moments; one
    // mirrored Pearson expression
    "q_assortativity" ->
      """WITH e0 AS (SELECT DISTINCT o.o_custkey * 2 AS src,
        |    l.l_suppkey * 2 + 1 AS dst
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |ed AS (SELECT src, dst FROM e0
        |  UNION ALL SELECT dst, src FROM e0),
        |dg AS (SELECT src, count(*) AS deg FROM ed GROUP BY 1),
        |xy AS (SELECT dx.deg AS dx, dy.deg AS dy
        |  FROM ed JOIN dg dx ON dx.src = ed.src
        |  JOIN dg dy ON dy.src = ed.dst),
        |m AS (SELECT count(*) AS m,
        |    sum(CAST(dx AS HUGEINT)) AS sx,
        |    sum(CAST(dy AS HUGEINT)) AS sy,
        |    sum(CAST(dx AS HUGEINT) * dx) AS sxx,
        |    sum(CAST(dy AS HUGEINT) * dy) AS syy,
        |    sum(CAST(dx AS HUGEINT) * dy) AS sxy
        |  FROM xy)
        |SELECT CAST(m // 2 AS BIGINT) AS n_edges,
        |  CASE WHEN CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
        |    AND CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
        |  THEN round((CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
        |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / sqrt((CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |      * (CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
        |  END AS assortativity
        |FROM m""".stripMargin,

    // user-keyed lag pairs; nano-quantized p*ln terms per current state
    "q_markov_entropy" ->
      """WITH seq AS (SELECT user_id, event_type AS cur,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS nxt
        |  FROM events),
        |cells AS (SELECT cur, nxt, count(*) AS c FROM seq
        |  WHERE nxt IS NOT NULL GROUP BY 1, 2),
        |byc AS (SELECT cur, CAST(sum(c) AS BIGINT) AS nc
        |  FROM cells GROUP BY 1),
        |tm AS (SELECT cells.cur, nc, CAST(floor(
        |    -(CAST(c AS DOUBLE) / CAST(nc AS DOUBLE))
        |    * ln(CAST(c AS DOUBLE) / CAST(nc AS DOUBLE))
        |    * 1e9 + 0.5e0) AS BIGINT) AS hq
        |  FROM cells JOIN byc USING (cur)),
        |terms AS (SELECT cur, max(nc) AS n_pairs,
        |    CAST(sum(hq) AS BIGINT) AS hcq FROM tm GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_pairs) AS BIGINT) AS nn FROM terms),
        |gl AS (SELECT CAST(sum(CAST(floor(
        |    CAST(n_pairs AS DOUBLE) / CAST(nn AS DOUBLE)
        |    * (CAST(hcq AS DOUBLE) / 1e9) * 1e9 + 0.5e0) AS BIGINT))
        |    AS BIGINT) AS hallq
        |  FROM terms CROSS JOIN tot)
        |SELECT cur, n_pairs,
        |  round(CAST(hcq AS DOUBLE) / 1e9, 6) AS h_next,
        |  round(CAST(hallq AS DOUBLE) / 1e9, 6) AS h_conditional
        |FROM terms CROSS JOIN gl ORDER BY cur""".stripMargin,

    // the q_holt_linear recursive CTE supplies the model errors; naive
    // errors are exact integers on the same evaluation days
    "q_forecast_accuracy" ->
      """WITH RECURSIVE dd AS (SELECT
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
        |    count(*) AS y
        |  FROM events GROUP BY 1),
        |i AS (SELECT d, CAST(y AS BIGINT) AS y,
        |    row_number() OVER (ORDER BY d) - 1 AS t FROM dd),
        |h AS (
        |  SELECT t, y, CAST(y AS DOUBLE) AS f, CAST(y AS DOUBLE) AS l,
        |    coalesce((SELECT CAST(y AS DOUBLE) FROM i WHERE t = 1)
        |      - CAST(y AS DOUBLE), 0.0e0) AS b
        |  FROM i WHERE t = 0
        |  UNION ALL
        |  SELECT i.t, i.y, h.l + h.b AS f,
        |    0.3e0 * i.y + 0.7e0 * (h.l + h.b) AS l,
        |    0.1e0 * ((0.3e0 * i.y + 0.7e0 * (h.l + h.b)) - h.l)
        |      + 0.9e0 * h.b AS b
        |  FROM h JOIN i ON i.t = h.t + 1),
        |ev AS (
        |  SELECT 'seasonal_naive7' AS model, a.t,
        |    abs(a.y - b.y) * 1000000 AS aeq,
        |    abs(a.y - b.y) * abs(a.y - b.y) * 1000000 AS seq
        |  FROM i a JOIN i b ON b.t = a.t - 7
        |  UNION ALL
        |  SELECT 'holt_linear', h.t,
        |    CAST(floor(abs(CAST(h.y AS DOUBLE) - h.f) * 1e6 + 0.5e0)
        |      AS BIGINT),
        |    CAST(floor(abs(CAST(h.y AS DOUBLE) - h.f)
        |      * abs(CAST(h.y AS DOUBLE) - h.f) * 1e6 + 0.5e0) AS BIGINT)
        |  FROM h WHERE h.t >= 7),
        |agg AS (SELECT model, count(*) AS n_eval,
        |    CAST(sum(aeq) AS BIGINT) AS sae,
        |    CAST(sum(seq) AS BIGINT) AS sse
        |  FROM ev GROUP BY 1),
        |nv AS (SELECT sae AS nae, n_eval AS nn FROM agg
        |  WHERE model = 'seasonal_naive7')
        |SELECT model, n_eval,
        |  round(CAST(sae AS DOUBLE) / n_eval / 1e6, 6) AS mae,
        |  round(sqrt(CAST(sse AS DOUBLE) / n_eval / 1e6), 6) AS rmse,
        |  CASE WHEN nae > 0 THEN round(
        |    (CAST(sae AS DOUBLE) / n_eval)
        |    / (CAST(nae AS DOUBLE) / nn), 6) END AS mase
        |FROM agg CROSS JOIN nv ORDER BY model""".stripMargin,

    // exact cent/milli sums per (part, period); micro-quantized unit
    // values; HUGEINT basket folds; mirrored index expressions
    "q_price_index" ->
      """WITH b AS (SELECT l_partkey AS pk,
        |    CAST(sum(CAST(floor(l_extendedprice * 100.0e0 + 0.5e0)
        |      AS BIGINT)) AS BIGINT) AS sep,
        |    CAST(sum(CAST(floor(l_quantity * 1000.0e0 + 0.5e0)
        |      AS BIGINT)) AS BIGINT) AS sq
        |  FROM lineitem WHERE year(l_shipdate) = 1996
        |  GROUP BY 1 HAVING sum(CAST(floor(l_quantity * 1000.0e0
        |    + 0.5e0) AS BIGINT)) > 0),
        |c AS (SELECT l_partkey AS pk,
        |    CAST(sum(CAST(floor(l_extendedprice * 100.0e0 + 0.5e0)
        |      AS BIGINT)) AS BIGINT) AS sep,
        |    CAST(sum(CAST(floor(l_quantity * 1000.0e0 + 0.5e0)
        |      AS BIGINT)) AS BIGINT) AS sq
        |  FROM lineitem WHERE year(l_shipdate) = 2000
        |  GROUP BY 1 HAVING sum(CAST(floor(l_quantity * 1000.0e0
        |    + 0.5e0) AS BIGINT)) > 0),
        |bk AS (SELECT b.pk,
        |    CAST(floor(CAST(b.sep AS DOUBLE) / CAST(b.sq AS DOUBLE)
        |      * 1e6 + 0.5e0) AS BIGINT) AS p0, b.sq AS q0,
        |    CAST(floor(CAST(c.sep AS DOUBLE) / CAST(c.sq AS DOUBLE)
        |      * 1e6 + 0.5e0) AS BIGINT) AS p1, c.sq AS q1
        |  FROM b JOIN c USING (pk)),
        |m AS (SELECT count(*) AS n_parts,
        |    sum(CAST(p1 AS HUGEINT) * q0) AS l_num,
        |    sum(CAST(p0 AS HUGEINT) * q0) AS l_den,
        |    sum(CAST(p1 AS HUGEINT) * q1) AS p_num,
        |    sum(CAST(p0 AS HUGEINT) * q1) AS p_den
        |  FROM bk)
        |SELECT n_parts,
        |  round(CAST(l_num AS DOUBLE) / CAST(l_den AS DOUBLE), 6)
        |    AS laspeyres,
        |  round(CAST(p_num AS DOUBLE) / CAST(p_den AS DOUBLE), 6)
        |    AS paasche,
        |  round(sqrt(CAST(l_num AS DOUBLE) / CAST(l_den AS DOUBLE)
        |    * (CAST(p_num AS DOUBLE) / CAST(p_den AS DOUBLE))), 6)
        |    AS fisher
        |FROM m""".stripMargin,

    // journey pairs truncated at first purchase; exact integer-ratio
    // probabilities; the 60-step absorption replayed as a recursive CTE
    // over the scenario-pivoted 25-column transition matrix with the
    // same fixed state order as the driver loop
    "q_markov_attribution" -> {
      val pcol = (f: String, t: String, fs: String, ts: String) =>
        s"coalesce(sum(CASE WHEN f = '$fs' AND t = '$ts' THEN pq END)," +
          s" 0) / 1e9 AS p_$f$t"
      val froms = Seq("s" -> "start", "c" -> "click", "e" -> "error",
        "g" -> "signup", "v" -> "view")
      val tos = Seq("c" -> "click", "e" -> "error", "g" -> "signup",
        "v" -> "view", "k" -> "conv")
      val pivCols = (for ((f, fs) <- froms; (t, ts) <- tos)
        yield pcol(f, t, fs, ts)).mkString(",\n        |    ")
      s"""WITH RECURSIVE ev AS (SELECT user_id, epoch_us(ts) AS us,
         |    event_id, event_type AS et FROM events),
         |pm AS (SELECT user_id,
         |    min(CASE WHEN et = 'purchase' THEN (us, event_id) END)
         |      AS pmin
         |  FROM ev GROUP BY 1),
         |kept AS (SELECT ev.user_id, ev.us, ev.event_id, ev.et,
         |    pm.pmin IS NOT NULL AS converted
         |  FROM ev JOIN pm USING (user_id)
         |  WHERE pm.pmin IS NULL OR (ev.us, ev.event_id) <= pm.pmin),
         |seq AS (SELECT user_id, et, converted,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY us, event_id) AS rn,
         |    lead(et) OVER (PARTITION BY user_id
         |      ORDER BY us, event_id) AS nxt
         |  FROM kept),
         |tr AS (
         |  SELECT 'start' AS f, CASE WHEN et = 'purchase' THEN 'conv'
         |    ELSE et END AS t FROM seq WHERE rn = 1
         |  UNION ALL
         |  SELECT et, CASE WHEN nxt = 'purchase' THEN 'conv' ELSE nxt
         |    END FROM seq WHERE nxt IS NOT NULL AND et <> 'purchase'
         |  UNION ALL
         |  SELECT et, 'null' FROM seq
         |  WHERE nxt IS NULL AND NOT converted AND et <> 'purchase'),
         |cnt AS (SELECT f, t, count(*) AS c FROM tr GROUP BY 1, 2),
         |tt AS (SELECT f, CAST(sum(c) AS BIGINT) AS tot
         |  FROM cnt GROUP BY 1),
         |pq0 AS (SELECT cnt.f, cnt.t,
         |    CAST((1000000000 * c) // tot AS BIGINT) AS pq
         |  FROM cnt JOIN tt USING (f)),
         |scn AS (SELECT unnest(['base', 'click', 'error', 'signup',
         |    'view']) AS sc),
         |spq AS (SELECT scn.sc, f, t,
         |    CASE WHEN scn.sc <> 'base' AND (t = scn.sc OR f = scn.sc)
         |      THEN 0 ELSE pq END AS pq
         |  FROM pq0 CROSS JOIN scn),
         |piv AS (SELECT sc,
         |    $pivCols
         |  FROM spq GROUP BY sc),
         |it AS (
         |  SELECT sc, 0 AS k, 1.0e0 AS s0, 0.0e0 AS s1, 0.0e0 AS s2,
         |    0.0e0 AS s3, 0.0e0 AS s4, 0.0e0 AS conv FROM piv
         |  UNION ALL
         |  SELECT i.sc, i.k + 1,
         |    0.0e0,
         |    i.s0 * p.p_sc + i.s1 * p.p_cc + i.s2 * p.p_ec
         |      + i.s3 * p.p_gc + i.s4 * p.p_vc,
         |    i.s0 * p.p_se + i.s1 * p.p_ce + i.s2 * p.p_ee
         |      + i.s3 * p.p_ge + i.s4 * p.p_ve,
         |    i.s0 * p.p_sg + i.s1 * p.p_cg + i.s2 * p.p_eg
         |      + i.s3 * p.p_gg + i.s4 * p.p_vg,
         |    i.s0 * p.p_sv + i.s1 * p.p_cv + i.s2 * p.p_ev
         |      + i.s3 * p.p_gv + i.s4 * p.p_vv,
         |    i.conv + i.s0 * p.p_sk + i.s1 * p.p_ck + i.s2 * p.p_ek
         |      + i.s3 * p.p_gk + i.s4 * p.p_vk
         |  FROM it i JOIN piv p USING (sc) WHERE i.k < 60),
         |fin AS (SELECT sc, conv FROM it WHERE k = 60),
         |bs AS (SELECT conv AS b FROM fin WHERE sc = 'base'),
         |re AS (SELECT sc AS channel, conv AS removed,
         |    CASE WHEN b > 0 THEN 1.0e0 - conv / b ELSE 0.0e0 END AS re,
         |    b
         |  FROM fin CROSS JOIN bs WHERE sc <> 'base'),
         |rs AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |    list(re ORDER BY channel)), (a, x) -> a + x) AS resum
         |  FROM re)
         |SELECT channel, round(b, 6) AS base_conv,
         |  round(removed, 6) AS removed_conv,
         |  round(re, 6) AS removal_effect,
         |  round(CASE WHEN resum > 0 THEN re / resum ELSE 0.0e0 END, 6)
         |    AS attribution
         |FROM re CROSS JOIN rs ORDER BY channel""".stripMargin
    },

    // densified (time x group) life table; nano-quantized E/V terms;
    // one mirrored z
    "q_logrank" ->
      """WITH u AS (SELECT user_id,
        |    min(CAST(ts AS DATE)) AS first_day,
        |    min(CASE WHEN event_type = 'purchase'
        |      THEN CAST(ts AS DATE) END) AS purch_day
        |  FROM events GROUP BY 1),
        |sg AS (SELECT c_custkey AS user_id,
        |    CAST(CASE WHEN c_mktsegment IN ('AUTOMOBILE', 'BUILDING')
        |      THEN 1 ELSE 0 END AS BIGINT) AS gseg
        |  FROM customer),
        |tt AS (SELECT
        |    coalesce(gseg, 0) AS g,
        |    CAST(CASE WHEN purch_day IS NOT NULL
        |      THEN purch_day - first_day
        |      ELSE DATE '2024-01-31' - first_day END AS BIGINT) AS t,
        |    CASE WHEN purch_day IS NOT NULL THEN 1 ELSE 0 END AS ev
        |  FROM u LEFT JOIN sg USING (user_id)),
        |bytg AS (SELECT t, g, CAST(sum(ev) AS BIGINT) AS dd,
        |    count(*) AS tot FROM tt GROUP BY 1, 2),
        |gf AS (SELECT ts.t, gs.g, coalesce(bytg.dd, 0) AS dd,
        |    coalesce(bytg.tot, 0) AS tot
        |  FROM (SELECT DISTINCT t FROM bytg) ts
        |  CROSS JOIN (SELECT DISTINCT g FROM bytg) gs
        |  LEFT JOIN bytg USING (t, g)),
        |rk AS (SELECT t, g, dd,
        |    CAST(sum(tot) OVER (PARTITION BY g ORDER BY t DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS nr FROM gf),
        |byt AS (SELECT t, CAST(sum(dd) AS BIGINT) AS dt,
        |    CAST(sum(nr) AS BIGINT) AS nt,
        |    CAST(sum(CASE WHEN g = 1 THEN dd ELSE 0 END) AS BIGINT)
        |      AS d1,
        |    CAST(sum(CASE WHEN g = 1 THEN nr ELSE 0 END) AS BIGINT)
        |      AS n1
        |  FROM rk GROUP BY 1 HAVING sum(dd) > 0),
        |tm AS (SELECT d1,
        |    CAST(floor(CAST(dt AS DOUBLE) * CAST(n1 AS DOUBLE)
        |      / CAST(nt AS DOUBLE) * 1e9 + 0.5e0) AS BIGINT) AS eq,
        |    CASE WHEN nt > 1 THEN CAST(floor(CAST(dt AS DOUBLE)
        |      * (CAST(n1 AS DOUBLE) / CAST(nt AS DOUBLE))
        |      * (1.0e0 - CAST(n1 AS DOUBLE) / CAST(nt AS DOUBLE))
        |      * (CAST(nt AS DOUBLE) - CAST(dt AS DOUBLE))
        |      / (CAST(nt AS DOUBLE) - 1.0e0) * 1e9 + 0.5e0) AS BIGINT)
        |      ELSE 0 END AS vq
        |  FROM byt),
        |gm AS (SELECT CAST(sum(d1) AS BIGINT) AS o1,
        |    CAST(sum(eq) AS BIGINT) AS se,
        |    CAST(sum(vq) AS BIGINT) AS sv FROM tm),
        |gsz AS (SELECT g, count(*) AS nu FROM tt GROUP BY 1)
        |SELECT
        |  (SELECT nu FROM gsz WHERE g = 1) AS n1_users,
        |  (SELECT nu FROM gsz WHERE g = 0) AS n0_users,
        |  o1, round(CAST(se AS DOUBLE) / 1e9, 6) AS e1,
        |  CASE WHEN sv > 0 THEN round((CAST(o1 AS DOUBLE)
        |    - CAST(se AS DOUBLE) / 1e9)
        |    / sqrt(CAST(sv AS DOUBLE) / 1e9), 6) END AS z,
        |  CASE WHEN sv > 0 THEN round(((CAST(o1 AS DOUBLE)
        |    - CAST(se AS DOUBLE) / 1e9)
        |    / sqrt(CAST(sv AS DOUBLE) / 1e9))
        |    * ((CAST(o1 AS DOUBLE) - CAST(se AS DOUBLE) / 1e9)
        |    / sqrt(CAST(sv AS DOUBLE) / 1e9)), 6) END AS chi2
        |FROM gm""".stripMargin,

    // scale-free micro-quantized row terms; 25-row between frame; the
    // decomposition identity holds on the printed numbers
    "q_theil_index" ->
      """WITH oc AS (SELECT CAST(c.c_nationkey AS BIGINT) AS nk,
        |    CAST(floor(o.o_totalprice * 100.0e0 + 0.5e0) AS BIGINT)
        |      AS x
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |g AS (SELECT count(*) AS nn, CAST(sum(x) AS BIGINT) AS xx
        |  FROM oc),
        |rows_ AS (SELECT CAST(floor(CAST(x AS DOUBLE)
        |    / (CAST(xx AS DOUBLE) / CAST(nn AS DOUBLE))
        |    * ln(CAST(x AS DOUBLE)
        |      / (CAST(xx AS DOUBLE) / CAST(nn AS DOUBLE)))
        |    * 1e6 + 0.5e0) AS BIGINT) AS tq
        |  FROM oc CROSS JOIN g),
        |tot AS (SELECT CAST(sum(tq) AS BIGINT) AS stq FROM rows_),
        |byn AS (SELECT nk, count(*) AS ng, CAST(sum(x) AS BIGINT) AS xg
        |  FROM oc GROUP BY 1),
        |bt AS (SELECT count(*) AS n_groups,
        |    CAST(sum(CAST(floor(CAST(xg AS DOUBLE)
        |      / CAST(xx AS DOUBLE)
        |      * ln((CAST(xg AS DOUBLE) / CAST(ng AS DOUBLE))
        |        / (CAST(xx AS DOUBLE) / CAST(nn AS DOUBLE)))
        |      * 1e6 + 0.5e0) AS BIGINT)) AS BIGINT) AS sbq
        |  FROM byn CROSS JOIN g)
        |SELECT g.nn AS n, CAST(n_groups AS BIGINT) AS n_groups,
        |  round(CAST(stq AS DOUBLE) / CAST(g.nn AS DOUBLE) / 1e6, 6)
        |    AS theil_total,
        |  round(CAST(sbq AS DOUBLE) / 1e6, 6) AS theil_between,
        |  round(CAST(stq AS DOUBLE) / CAST(g.nn AS DOUBLE) / 1e6
        |    - CAST(sbq AS DOUBLE) / 1e6, 6) AS theil_within
        |FROM g CROSS JOIN tot CROSS JOIN bt""".stripMargin,

    // exact cent revenue; nano-quantized share squares per supplier
    "q_hhi" ->
      """WITH rev AS (SELECT CAST(s.s_nationkey AS BIGINT) AS nk,
        |    l.l_suppkey,
        |    CAST(sum(CAST(floor(l.l_extendedprice * 100.0e0 + 0.5e0)
        |      AS BIGINT)) AS BIGINT) AS r
        |  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  GROUP BY 1, 2),
        |tot AS (SELECT nk, CAST(sum(r) AS BIGINT) AS tr,
        |    count(*) AS n_suppliers FROM rev GROUP BY 1),
        |tm AS (SELECT rev.nk,
        |    CAST(max(n_suppliers) AS BIGINT) AS n_suppliers,
        |    CAST(sum(CAST(floor((CAST(r AS DOUBLE)
        |      / CAST(tr AS DOUBLE)) * (CAST(r AS DOUBLE)
        |      / CAST(tr AS DOUBLE)) * 1e9 + 0.5e0) AS BIGINT))
        |      AS BIGINT) AS shq
        |  FROM rev JOIN tot USING (nk) GROUP BY 1)
        |SELECT nk AS nationkey, n_suppliers,
        |  round(CAST(shq AS DOUBLE) / 1e9 * 10000.0e0, 6) AS hhi,
        |  CASE WHEN shq > 0 THEN round(1e9 / CAST(shq AS DOUBLE), 6)
        |    END AS effective_suppliers
        |FROM tm ORDER BY nationkey""".stripMargin
  )
}
