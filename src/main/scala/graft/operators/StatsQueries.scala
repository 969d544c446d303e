package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.NativeExpressions
import graft.engine.{Dist, OracleHash, QueryPack, RankStats, Tables}
import graft.functions.TextDedup

/** Statistical-modeling operators over the event stream and document
  * corpus (SURVEY.md §2.4 "LLM-data-pipeline operators" — statistics
  * family): the estimation/uncertainty primitives a 100 TB pipeline runs
  * on top of its aggregates — trend fits, resampled confidence intervals,
  * seasonality profiles, and classifier-calibration audits.
  *
  *  - q_group_ols     — per-group ordinary-least-squares fit (slope /
  *                      intercept / R²) of event value against time, from
  *                      EXACT integer moment sums: one keyed aggregation
  *                      is the only data-sized step.
  *  - q_bootstrap_ci  — Poisson(1) bootstrap confidence interval for the
  *                      per-group mean. The scale-out bootstrap: instead
  *                      of materializing B resamples, every row draws B
  *                      deterministic Poisson weights and the statistic
  *                      folds in one pass — map-side combine bounds the
  *                      shuffle at groups × B rows regardless of input
  *                      size.
  *  - q_seasonal_dow  — day-of-week seasonal decomposition (per-dow
  *                      seasonal offset vs the global level + residual
  *                      spread), exact integer moments per cell.
  *  - q_calibration   — reliability diagram of the hashed linear quality
  *                      classifier (q_quality_classifier's score through
  *                      a logistic link) against a length outcome:
  *                      predicted-probability deciles vs empirical rate.
  *
  * Determinism policy (repo-wide): resample weights are pure functions of
  * splitmix64 over the row key; every cross-row double aggregation is
  * replaced by exact integer (micro-quantized) sums; final statistics
  * evaluate through ONE fixed double expression mirrored token-for-token
  * in the DuckDB oracle.
  */
object StatsQueries extends QueryPack {

  /** Inclusive cumulative-Poisson(1) thresholds on the 53-bit uniform
    * integer hq = splitmix64(seed) >>> 11: the weight is the count of
    * thresholds ≤ hq, i.e. w = #{k : hq ≥ T_k}, giving P(w = k) =
    * e⁻¹/k! (truncated at 8 — P(w > 8) ≈ 1e-6 folds into the last
    * bucket). Integer comparisons only: no float CDF math can disagree
    * between engines. T_k = floor(cdf_k · 2⁵³ − 0.5) + 1. */
  private[operators] val poissonThresholds: Seq[Long] = Seq(
    3313563428353948L, 6627126856707897L, 8283908570884871L,
    8836169142277195L, 8974234285125277L, 9001847313694893L,
    9006449485123161L, 9007106938184343L)

  /** Number of bootstrap resamples. Bounded driver/shuffle state is
    * groups × B rows by construction. */
  private[operators] val bootstrapReps = 100

  /** q_ewma_chart truncation depth — same 16-tap Horner lag-fold contract
    * as q_ewma ((1−λ)¹⁶ ≈ 2.8% residual weight at λ=0.2). */
  private[operators] val ewmaChartTaps = 16

  /** q_periodogram DFT basis, micro-quantized ONCE on the driver and
    * inlined as integer literals into BOTH engines (the Spark literal
    * frame and the oracle's VALUES list), so no cos/sin is ever evaluated
    * by either engine at query time — the cross-engine last-ulp trig risk
    * is structurally zero. cos(2πkt/N) depends only on kt mod N, so a
    * fixed N=64-day window needs exactly 64 coefficient pairs for ALL
    * analysis frequencies. */
  private[operators] val dftWindowDays = 64
  private[operators] val dftCoeffs: Seq[(Long, Long, Long)] =
    (0 until dftWindowDays).map { m =>
      val a = 2.0 * math.Pi * m / dftWindowDays
      (m.toLong,
        math.floor(math.cos(a) * 1e6 + 0.5).toLong,
        math.floor(math.sin(a) * 1e6 + 0.5).toLong)
    }

  def declared: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    // -- per-group OLS trend fit ------------------------------------------
    // Exact integer moments per event_type: x = whole seconds since the
    // corpus min timestamp (broadcast 1-row bounds frame), y = milli-
    // quantized value. The five sums (Σx, Σy, Σx², Σxy, Σy²) accumulate
    // in DECIMAL(38,0) — exact at any row count, matching DuckDB's
    // HUGEINT widening bit-for-bit — and the closed-form estimates
    // evaluate in ONE mirrored double expression:
    //   slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²), reported per DAY in value
    //   units (· 86.4 folds the milli→unit and sec→day factors);
    //   R² = num²/(den·(nΣy² − (Σy)²)).
    // One keyed aggregation is the only data-sized step — the classic
    // "regression as a semigroup" shape that survives any scale.
    "q_group_ols" -> ((s, d) => {
      val e = Tables.eventsWithTime(s, d)
        .select(col("event_type"),
          col("ts_us").as("us"),
          floor(col("value") * lit(1000.0) + lit(0.5)).cast("long")
            .as("vq"))
      val bounds = e.agg(min(col("us")).as("us0"))
      val xy = e.crossJoin(broadcast(bounds))
        .withColumn("xs", expr("(us - us0) div 1000000"))
      // operands cast to DECIMAL(38,0) BEFORE the per-row products: a
      // Long vq² would silently wrap for |value| ≳ 3e6 while DuckDB's
      // HUGEINT raises — the decimal product keeps both engines exact
      // (and identical) to ~1e19 magnitudes
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val m = xy.groupBy(col("event_type")).agg(
        count(lit(1)).as("n"),
        sum(dec(col("xs"))).as("sx"),
        sum(dec(col("vq"))).as("sy"),
        sum(dec(col("xs")) * dec(col("xs"))).as("sxx"),
        sum(dec(col("xs")) * dec(col("vq"))).as("sxy"),
        sum(dec(col("vq")) * dec(col("vq"))).as("syy"))
      val nD = col("n").cast("double")
      val sxD = col("sx").cast("double"); val syD = col("sy").cast("double")
      val num = nD * col("sxy").cast("double") - sxD * syD
      val den = nD * col("sxx").cast("double") - sxD * sxD
      val dyy = nD * col("syy").cast("double") - syD * syD
      // degenerate groups (single event / constant x or y) have den or
      // dyy = 0; NULL the estimates EXPLICITLY so both engines agree
      // (Spark's x/0.0 yields NULL, DuckDB's yields Inf — an unguarded
      // division would hash-mismatch exactly when a group degenerates)
      m.select(col("event_type"), col("n"),
          when(den =!= 0.0, round(num / den * lit(86.4), 6))
            .as("slope_per_day"),
          when(den =!= 0.0,
            round((syD - num / den * sxD) / nD / lit(1000.0), 6))
            .as("intercept"),
          when(den =!= 0.0 && dyy =!= 0.0,
            round(num * num / (den * dyy), 6)).as("r2"))
        .orderBy(col("event_type"))
    }),

    // -- Poisson-bootstrap confidence interval ----------------------------
    // The one-pass bootstrap (the trick that makes resampling feasible on
    // a cluster): rep r gives row e weight w ~ Poisson(1), derived from
    // splitmix64(event_id·1000003 + r·7919 + 5) — unique seed per
    // (row, rep), decorrelated from every other sampler in the repo —
    // via integer CDF thresholds (see poissonThresholds). Each rep's
    // mean is Σw·y/Σw on milli-quantized y (exact integer sums; one
    // double division per rep). The 90% percentile interval takes order
    // statistics 5 and 95 of the 100 rep means, compared as micro-
    // quantized integers with the rep index as tiebreak — a total order,
    // so the reported bounds are unique. Scale shape: the explode
    // multiplies scan CPU by B, but map-side combine bounds the shuffle
    // at groups × B rows — nothing data-sized crosses the wire.
    "q_bootstrap_ci" -> ((s, d) => {
      val e = Tables.events(s, d)
        .select(col("event_id"), col("event_type"),
          floor(col("value") * lit(1000.0) + lit(0.5)).cast("long")
            .as("vq"))
        .withColumn("rep", explode(expr(
          s"sequence(0, ${bootstrapReps - 1})")))
      val hq = shiftrightunsigned(NativeExpressions.splitmix64(
        col("event_id") * lit(1000003L) + col("rep") * lit(7919L) +
          lit(5L)), 11)
      val w = poissonThresholds
        .map(t => when(hq >= t, 1L).otherwise(0L))
        .reduce(_ + _)
      // an all-zero-weight rep (P ≈ e^(−n) per rep — real for tiny
      // groups) has no mean; pin it to the Long.MaxValue sentinel so it
      // sorts LAST deterministically in both engines (Spark's x/0 → NULL
      // sorts first, DuckDB's → Inf sorts last — an unguarded division
      // would desynchronize the rank-5/95 selection)
      val reps = e.withColumn("w", w)
        .groupBy(col("event_type"), col("rep"))
        .agg(sum(col("w") * col("vq")).as("swy"), sum(col("w")).as("sw"))
        .withColumn("mq", when(col("sw") === 0L, lit(Long.MaxValue))
          .otherwise(floor(
            col("swy").cast("double") / col("sw") * lit(1000.0) + lit(0.5))
            .cast("long")))
      val rk = Window.partitionBy(col("event_type"))
        .orderBy(col("mq"), col("rep"))
      val cis = reps.withColumn("rnk", row_number().over(rk))
        .filter(col("rnk") === 5 || col("rnk") === 95)
        .groupBy(col("event_type"))
        .agg(min(col("mq")).as("lo_u"), max(col("mq")).as("hi_u"))
      val pt = Tables.events(s, d)
        .select(col("event_type"),
          floor(col("value") * lit(1000.0) + lit(0.5)).cast("long")
            .as("vq"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("vq")).as("svq"))
      pt.join(cis, "event_type")
        .select(col("event_type"), col("n"),
          round(col("svq").cast("double") / col("n") / lit(1000.0), 6)
            .as("mean"),
          (col("lo_u").cast("double") / lit(1000000.0)).as("ci_lo"),
          (col("hi_u").cast("double") / lit(1000000.0)).as("ci_hi"))
        .orderBy(col("event_type"))
    }),

    // -- day-of-week seasonal decomposition -------------------------------
    // The additive profile: seasonal_d = mean(value | dow d) − global
    // mean, residual spread = per-dow std of (value − dow mean). Day
    // index is pure integer arithmetic on epoch micros ((days + 3) % 7,
    // 0 = Monday) — engine dayofweek() conventions differ, integer
    // division doesn't. Two bounded aggregations (7-row dow frame ×
    // broadcast 1-row global) over exact milli-integer moments; the
    // σ derivation (nΣy² − (Σy)²)/n² under one sqrt, mirrored.
    "q_seasonal_dow" -> ((s, d) => {
      val e = Tables.eventsWithTime(s, d)
        .select(
          expr("((ts_us div 86400000000) + 3) % 7").as("dow"),
          floor(col("value") * lit(1000.0) + lit(0.5)).cast("long")
            .as("vq"))
      val byDow = e.groupBy(col("dow")).agg(
        count(lit(1)).as("n"),
        sum(col("vq")).as("sy"),
        sum(col("vq") * col("vq")).as("syy"))
      val glob = byDow.agg(sum(col("sy")).as("gy"), sum(col("n")).as("gn"))
      val nD = col("n").cast("double")
      byDow.crossJoin(broadcast(glob))
        .select(col("dow"), col("n"),
          round(col("sy").cast("double") / nD / lit(1000.0), 6)
            .as("dow_mean"),
          round((col("sy").cast("double") / nD -
            col("gy").cast("double") / col("gn").cast("double")) /
            lit(1000.0), 6).as("seasonal"),
          round(sqrt((nD * col("syy").cast("double") -
            col("sy").cast("double") * col("sy").cast("double")) /
            (nD * nD)) / lit(1000.0), 6).as("resid_sd"))
        .orderBy(col("dow"))
    }),

    // -- STL-lite trend/seasonal/remainder decomposition -------------------
    // q_seasonal_dow reports dow OFFSETS; this decomposes the whole
    // daily series the classic-decomposition way: trend = centered
    // 7-day moving average (full windows only — edges stay NULL rather
    // than silently shortening the kernel), seasonal = per-dow mean of
    // the detrended series, remainder = what's left — the frame an
    // anomaly monitor thresholds. Determinism: day means are exact
    // integer micro-units; the MA of 7 integers is an exact integer
    // division; the per-dow mean is the only fractional step and is
    // floor(x+0.5)-quantized from exact integer sums, so every output
    // is an integer micro-value divided by 1e6. The data-sized step is
    // one day-keyed aggregate; all windows ride the bounded day frame.
    "q_stl_decompose" -> ((s, d) => {
      val byDay = Tables.eventsWithTime(s, d)
        .select(expr("ts_us div 86400000000").as("day"),
          floor(col("value") * lit(1000.0) + lit(0.5)).cast("long")
            .as("vq"))
        .groupBy(col("day"))
        .agg(count(lit(1)).as("n"), sum(col("vq")).as("sq"))
        .withColumn("xm", expr("(sq * 1000) div n"))
        .withColumn("dow", expr("(day + 3) % 7"))
      val w7 = Window.orderBy(col("day")).rowsBetween(-3, 3)
      val tr = byDay
        .withColumn("wc", count(lit(1)).over(w7))
        .withColumn("swin", sum(col("xm")).over(w7))
        .withColumn("trend_u",
          when(col("wc") === 7, expr("swin div 7")))
      val sdow = tr.filter(col("trend_u").isNotNull)
        .groupBy(col("dow"))
        .agg(sum(col("xm") - col("trend_u")).as("sdet"),
          count(lit(1)).as("cnt"))
        .select(col("dow"),
          floor(col("sdet").cast("double") / col("cnt") + lit(0.5))
            .cast("long").as("s_u"))
      tr.join(sdow, Seq("dow"), "left")
        .select(col("day"), col("dow"), col("n"),
          (col("xm").cast("double") / lit(1e6)).as("x"),
          (col("trend_u").cast("double") / lit(1e6)).as("trend"),
          (col("s_u").cast("double") / lit(1e6)).as("seasonal"),
          ((col("xm") - col("trend_u") - col("s_u")).cast("double") /
            lit(1e6)).as("remainder"))
        .orderBy(col("day"))
    }),

    // -- strength of trend / seasonality (Hyndman F-measures) (r14) ---------
    // The one-number readouts on top of q_stl_decompose's frame that
    // decide whether the series is WORTH seasonal modeling:
    // F_trend = max(0, 1 − Var(R)/Var(T+R)) and
    // F_seasonal = max(0, 1 − Var(R)/Var(S+R)) over the full-window
    // days (Hyndman & Athanasopoulos, FPP). Identical integer micro
    // decomposition as the STL row (shared formulas, exact DECIMAL
    // moments of the micro residuals); only the final variance ratio is
    // floating and mirrored. One day-keyed aggregate + bounded windows.
    "q_seasonal_strength" -> ((s, d) => {
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val byDay = Tables.eventsWithTime(s, d)
        .select(expr("ts_us div 86400000000").as("day"),
          floor(col("value") * lit(1000.0) + lit(0.5)).cast("long")
            .as("vq"))
        .groupBy(col("day"))
        .agg(count(lit(1)).as("n"), sum(col("vq")).as("sq"))
        .withColumn("xm", expr("(sq * 1000) div n"))
        .withColumn("dow", expr("(day + 3) % 7"))
      val w7 = Window.orderBy(col("day")).rowsBetween(-3, 3)
      val tr = byDay
        .withColumn("wc", count(lit(1)).over(w7))
        .withColumn("swin", sum(col("xm")).over(w7))
        .withColumn("trend_u",
          when(col("wc") === 7, expr("swin div 7")))
      val sdow = tr.filter(col("trend_u").isNotNull)
        .groupBy(col("dow"))
        .agg(sum(col("xm") - col("trend_u")).as("sdet"),
          count(lit(1)).as("cnt"))
        .select(col("dow"),
          floor(col("sdet").cast("double") / col("cnt") + lit(0.5))
            .cast("long").as("s_u"))
      val m = tr.join(sdow, Seq("dow"))
        .filter(col("trend_u").isNotNull)
        .select((col("xm") - col("trend_u") - col("s_u")).as("r"),
          (col("xm") - col("trend_u")).as("sr"),
          (col("xm") - col("s_u")).as("tr_"))
      val mm = m.agg(count(lit(1)).as("n"),
        sum(dec(col("r"))).as("s1r"),
        sum(dec(col("r")) * dec(col("r"))).as("s2r"),
        sum(dec(col("sr"))).as("s1s"),
        sum(dec(col("sr")) * dec(col("sr"))).as("s2s"),
        sum(dec(col("tr_"))).as("s1t"),
        sum(dec(col("tr_")) * dec(col("tr_"))).as("s2t"))
      val nD = col("n").cast("double")
      def v(s1: String, s2: String) =
        nD * col(s2).cast("double") -
          col(s1).cast("double") * col(s1).cast("double")
      val vr = v("s1r", "s2r")
      mm.select(col("n").as("n_days"),
        when(v("s1t", "s2t") > 0.0,
          round(greatest(lit(0.0), lit(1.0) - vr / v("s1t", "s2t")), 6))
          .as("f_trend"),
        when(v("s1s", "s2s") > 0.0,
          round(greatest(lit(0.0), lit(1.0) - vr / v("s1s", "s2s")), 6))
          .as("f_seasonal"))
    }),

    // -- Kendall's W: concordance of k raters over the day frame (r14) ------
    // The effect-size companion of q_friedman: do the five event types
    // agree on WHICH days are busy? Each type ranks the densified day
    // spine by its daily milli-volume (midranks for ties, kept as
    // DOUBLED integers so everything stays exact), and
    // W = 12·S / (k²(n³−n) − k·ΣT) with the standard tie correction
    // T = Σ(t³−t). Every moment is an exact integer off the bounded
    // (k × days) grid; only the final ratio is floating and mirrored.
    // Windows partition by event_type — never a corpus-sized frame.
    "q_kendall_w" -> ((s, d) => {
      val byDT = Tables.eventsWithTime(s, d)
        .select(expr("ts_us div 86400000000").as("day"),
          col("event_type"),
          floor(col("value") * lit(1000.0) + lit(0.5)).cast("long")
            .as("vq"))
        .groupBy(col("event_type"), col("day"))
        .agg(sum(col("vq")).as("sv"))
      val days = byDT.select(col("day")).distinct()
      val types = byDT.select(col("event_type")).distinct()
      val grid = days.crossJoin(types)
        .join(byDT, Seq("event_type", "day"), "left")
        .withColumn("sv", coalesce(col("sv"), lit(0L)))
      val wT = Window.partitionBy(col("event_type")).orderBy(col("sv"))
      val wTie = Window.partitionBy(col("event_type"), col("sv"))
      val ranked = grid
        .withColumn("rmin", rank().over(wT))
        .withColumn("tie", count(lit(1)).over(wTie))
        .withColumn("mr2",
          lit(2L) * col("rmin") + col("tie") - lit(1L))
      val perDay = ranked.groupBy(col("day"))
        .agg(sum(col("mr2")).as("r2"))
      val ties = ranked.select(col("event_type"), col("sv"), col("tie"))
        .distinct()
        .agg(sum(col("tie") * col("tie") * col("tie") - col("tie"))
          .as("t_tot"))
      val kn = grid.agg(countDistinct(col("event_type")).as("k"),
        countDistinct(col("day")).as("n"))
      val s2 = perDay.crossJoin(broadcast(kn))
        .select((col("r2") - col("k") * (col("n") + lit(1L))).as("dev"),
          col("k"), col("n"))
        .groupBy(col("k"), col("n"))
        .agg(sum(col("dev") * col("dev")).as("s2sum"))
      s2.crossJoin(broadcast(ties))
        .select(col("n").as("n_days"), col("k"),
          when(col("k") * col("k") *
            (col("n") * col("n") * col("n") - col("n")) -
            col("k") * col("t_tot") > 0L,
            round(lit(3.0) * col("s2sum").cast("double") /
              (col("k") * col("k") *
                (col("n") * col("n") * col("n") - col("n")) -
                col("k") * col("t_tot")).cast("double"), 6))
            .as("w"))
    }),

    // -- sequential probability ratio test (Wald SPRT) --------------------
    // The streaming-decision primitive batch A/B tests lack: walk the
    // event stream in time order accumulating the Bernoulli
    // log-likelihood ratio for H1: p = 0.22 vs H0: p = 0.18 on the
    // purchase indicator, and report the FIRST boundary crossing
    // (A = ln(0.95/0.05) rejects H0, B = ln(0.05/0.95) accepts) — the
    // test that lets a pipeline stop collecting the moment the evidence
    // suffices. LLR_n = k·ln(p1/p0) + (n−k)·ln((1−p1)/(1−p0)) derives
    // per row from EXACT prefix integers (k, n ride ONE
    // [[Dist.globalPrefixSums]] pass under the (ts, event_id) order —
    // never a single-partition window), with the two ln constants
    // evaluated from identical literals in both engines and the LLR
    // micro-quantized before every boundary comparison. No crossing →
    // 'continue' with the full-sample LLR. TakeOrdered(1) on the
    // crossing set; driver state is one row.
    "q_ab_sprt" -> ((s, d) => {
      val e = Tables.eventsWithTime(s, d)
        .select(col("event_id"),
          col("ts_us").cast("double").as("tsd"),
          when(col("event_type") === "purchase", 1L).otherwise(0L)
            .as("conv"),
          lit(1L).as("one"))
      val cum = Dist.globalPrefixSums(e, "tsd", asc = true,
        idCol = "event_id", weightCols = Seq("conv", "one"),
        outCols = Seq("k", "n"), p = 32)
      val c1 = log(lit(0.22) / lit(0.18))
      val c0 = log(lit(0.78) / lit(0.82))
      val aU = floor(log(lit(0.95) / lit(0.05)) * lit(1000000.0) +
        lit(0.5)).cast("long")
      val bU = floor(log(lit(0.05) / lit(0.95)) * lit(1000000.0) +
        lit(0.5)).cast("long")
      val llr = cum.withColumn("llr_u",
        floor((col("k") * c1 + (col("n") - col("k")) * c0) *
          lit(1000000.0) + lit(0.5)).cast("long"))
      val crossed = llr
        .filter(col("llr_u") >= aU || col("llr_u") <= bU)
        .orderBy(col("n")).limit(1)
        .select(col("n").as("first_n"), col("llr_u").as("cross_u"),
          when(col("llr_u") >= aU, lit("reject_h0"))
            .otherwise(lit("accept_h0")).as("decision"))
      // k is nondecreasing under the same order, so max(k) IS k at
      // n_total and the final LLR re-derives from the two exact totals
      val tot = llr.agg(max(col("n")).as("n_total"),
        max(col("k")).as("k_total"))
      tot
        .withColumn("final_u",
          floor((col("k_total") * c1 +
            (col("n_total") - col("k_total")) * c0) * lit(1000000.0) +
            lit(0.5)).cast("long"))
        .join(crossed, lit(true), "left")
        .select(col("n_total"), col("k_total"),
          coalesce(col("first_n"), col("n_total")).as("decided_at"),
          coalesce(col("decision"), lit("continue")).as("decision"),
          (coalesce(col("cross_u"), col("final_u")) / lit(1e6))
            .as("llr"))
    }),

    // -- robust outlier detection (median / MAD) --------------------------
    // The outlier gate that survives what z-scores don't: mean/σ are
    // themselves dragged by the outliers they're meant to catch, while
    // median and MAD (median absolute deviation) have a 50% breakdown
    // point. Per event_type: exact LOWER median of the milli-quantized
    // value (rank ⌈n/2⌉ under the (vq, event_id) total order — an
    // integer contract, no interpolation ambiguity), MAD on the same
    // contract over |vq − med|, and the flagged count at the classic
    // |x − med| > 3·MAD cut (pure integer comparison). Scale: two
    // group-keyed sort windows — group count carries the parallelism;
    // a few very heavy groups would ride the q_rebalance two-phase
    // pattern or [[Dist.globalPrefixSum]] per group instead.
    "q_outlier_mad" -> ((s, d) => {
      val e = Tables.events(s, d)
        .select(col("event_type"), col("event_id"),
          floor(col("value") * lit(1000.0) + lit(0.5)).cast("long")
            .as("vq"))
      val w1 = Window.partitionBy(col("event_type"))
        .orderBy(col("vq"), col("event_id"))
      val wn = Window.partitionBy(col("event_type"))
      val med = e
        .withColumn("rn", row_number().over(w1))
        .withColumn("n", count(lit(1)).over(wn))
        .filter(col("rn") === expr("(n + 1) div 2"))
        .select(col("event_type"), col("vq").as("med"))
      val dev = e.join(med, "event_type")
        .withColumn("adev", abs(col("vq") - col("med")))
      val w2 = Window.partitionBy(col("event_type"))
        .orderBy(col("adev"), col("event_id"))
      val mad = dev
        .withColumn("rn", row_number().over(w2))
        .withColumn("n", count(lit(1)).over(wn))
        .filter(col("rn") === expr("(n + 1) div 2"))
        .select(col("event_type"), col("adev").as("mad"))
      dev.join(mad, "event_type")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          max(col("med")).as("med_u"), max(col("mad")).as("mad_u"),
          sum(when(col("adev") > lit(3L) * col("mad"), 1L).otherwise(0L))
            .as("n_outliers"))
        .select(col("event_type"), col("n"),
          (col("med_u").cast("double") / lit(1000.0)).as("median"),
          (col("mad_u").cast("double") / lit(1000.0)).as("mad"),
          col("n_outliers"),
          round(col("n_outliers").cast("double") / col("n"), 6)
            .as("outlier_pct"))
        .orderBy(col("event_type"))
    }),

    // -- classifier calibration audit (reliability diagram) ---------------
    // q_quality_classifier's integer score through a logistic link
    // p = 1/(1 + e^(−score/4)) becomes a predicted probability; the
    // outcome is the n_chars ≥ 300 length gate. Predictions are micro-
    // quantized BEFORE any aggregation (Σpu is exact), binned into ten
    // fixed-width probability buckets, and each bucket reports mean
    // predicted vs empirical rate — the per-bin gap is the ECE summand.
    // Cost: the classifier's unigram pass + one 10-row aggregation.
    "q_calibration" -> ((s, d) => {
      val scored = TextDedup.classifierScored(Tables.documents(s, d),
        Seq(col("doc_id"), col("n_chars")))
      scored
        .withColumn("p", lit(1.0) /
          (lit(1.0) + exp(-col("score").cast("double") / lit(4.0))))
        .withColumn("pu", floor(col("p") * lit(1000000.0) + lit(0.5))
          .cast("long"))
        .withColumn("bin", least(expr("pu div 100000"), lit(9L)))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("n_chars") >= 300, 1L).otherwise(0L)).as("n_pos"),
          sum(col("pu")).as("spu"))
        .select(col("bin"), col("n"), col("n_pos"),
          round(col("spu").cast("double") / col("n") / lit(1000000.0), 6)
            .as("mean_pred"),
          round(col("n_pos").cast("double") / col("n"), 6).as("rate"))
        .orderBy(col("bin"))
    }),

    // -- isotonic calibration (PAVA on the reliability deciles) ------------
    // q_calibration DIAGNOSES miscalibration; this REPAIRS it: the
    // monotone-nondecreasing rate curve closest (weighted L2) to the
    // per-bin empirical rates — what a production scorer applies as its
    // calibration map. Pool-adjacent-violators is a sequential
    // algorithm; on the bounded bin frame it collapses to the exact
    // minimax identity iso_i = max_{j≤i} min_{k≥i} mean(y over bins
    // j..k) — a (j, k) interval enumeration over ≤10 rows, free of
    // driver loops AND of sequential state. Interval means are exact
    // integer micro-divisions of prefix-sum differences, so the
    // max-of-min decides on integers — no float comparison anywhere.
    // Data-sized work: the same classifier pass + 10-row aggregation
    // as q_calibration; the enumeration is O(bins³) on a bounded frame.
    "q_isotonic" -> ((s, d) => {
      val scored = TextDedup.classifierScored(Tables.documents(s, d),
        Seq(col("doc_id"), col("n_chars")))
      val bins = scored
        .withColumn("p", lit(1.0) /
          (lit(1.0) + exp(-col("score").cast("double") / lit(4.0))))
        .withColumn("pu", floor(col("p") * lit(1000000.0) + lit(0.5))
          .cast("long"))
        .withColumn("bin", least(expr("pu div 100000"), lit(9L)))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("n_chars") >= 300, 1L).otherwise(0L)).as("n_pos"))
      val w = Window.orderBy(col("bin"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val c = bins
        .withColumn("cn", sum(col("n")).over(w))
        .withColumn("cp", sum(col("n_pos")).over(w))
      val jf = c.select(col("bin").as("j"), (col("cn") - col("n"))
        .as("cnj"), (col("cp") - col("n_pos")).as("cpj"))
      val kf = c.select(col("bin").as("k"), col("cn").as("cnk"),
        col("cp").as("cpk"))
      val iv = jf.crossJoin(kf).filter(col("j") <= col("k"))
        .withColumn("m_u",
          expr("((cpk - cpj) * 1000000) div (cnk - cnj)"))
      val iso = c.select(col("bin").as("i"))
        .join(iv, col("j") <= col("i") && col("k") >= col("i"))
        .groupBy(col("i"), col("j")).agg(min(col("m_u")).as("mn"))
        .groupBy(col("i")).agg(max(col("mn")).as("iso_u"))
      c.join(iso, col("bin") === col("i"))
        .select(col("bin"), col("n"), col("n_pos"),
          (expr("(n_pos * 1000000) div n").cast("double") / lit(1e6))
            .as("rate"),
          (col("iso_u").cast("double") / lit(1e6)).as("iso_rate"))
        .orderBy(col("bin"))
    }),

    // -- Mann-Whitney U rank-sum test (nonparametric two-sample) -----------
    // The distribution-free alternative to q_ab_test's t-test: does the
    // purchase value distribution stochastically dominate clicks? Ranks
    // with midrank tie handling, computed WITHOUT ever ranking individual
    // rows: the data-sized step is one groupBy on the milli-quantized
    // value, and all rank arithmetic runs on the DISTINCT-VALUE frame —
    // bounded by the quantized value domain (~1e5 cells for values in
    // [0, 100]), a constant in corpus size, so the unpartitioned prefix
    // window is scale-safe by construction (the q_changepoint bounded-
    // frame class). Midranks stay integer by doubling (r2 = 2·below +
    // t + 1 = twice the average rank of a tie group of size t);
    // Σcnt1·r2 and the tie-correction Σ(t³−t) accumulate in
    // DECIMAL(38,0) — exact past 2^63, matching DuckDB's HUGEINT. The
    // final z (normal approximation with tie-corrected variance)
    // evaluates in ONE mirrored double expression; a fully-tied corpus
    // (σ = 0) NULLs z explicitly on both engines.
    "q_mann_whitney" -> ((s, d) => {
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val e = Tables.events(s, d)
        .filter(col("event_type").isin("purchase", "click"))
        .select(
          when(col("event_type") === "purchase", 1L).otherwise(0L)
            .as("g1"),
          floor(col("value") * lit(1000.0) + lit(0.5)).cast("long")
            .as("vq"))
      val byV = e.groupBy(col("vq"))
        .agg(count(lit(1)).as("cnt"), sum(col("g1")).as("cnt1"))
      // NDV-dispatched midranks (RankStats): global window under an
      // in-plan Limit at the measured NDV when the quantized domain is
      // small, Dist.globalPrefixSum above the ceiling
      val ranked = RankStats.doubledMidranks(byV, "vq", "cnt", "r2")
      val m = ranked.agg(
        sum(col("cnt1")).as("n1"),
        sum(col("cnt") - col("cnt1")).as("n2"),
        sum(dec(col("cnt1")) * dec(col("r2"))).as("r1d"),
        sum(dec(col("cnt")) * dec(col("cnt")) * dec(col("cnt")) -
          dec(col("cnt"))).as("tsum"))
      val n1D = col("n1").cast("double"); val n2D = col("n2").cast("double")
      val u1d = col("r1d").cast("double") - n1D * (n1D + lit(1.0))
      val sig = sqrt(n1D * n2D / lit(12.0) *
        ((n1D + n2D + lit(1.0)) -
          col("tsum").cast("double") / ((n1D + n2D) * (n1D + n2D - lit(1.0)))))
      m.select(col("n1"), col("n2"),
        round(u1d / lit(2.0), 1).as("u1"),
        when(sig =!= 0.0,
          round((u1d - n1D * n2D) / (lit(2.0) * sig), 6)).as("z"))
    }),

    // -- Benjamini-Hochberg FDR over per-nation chi-square screens ---------
    // The multiple-testing correction every metric-sweep dashboard needs:
    // 25 simultaneous per-nation tests (does this nation's order-status
    // mix deviate from the global mix?) would produce ~1-2 false alarms
    // per sweep at raw α = 0.05; BH step-up controls the false-discovery
    // rate across the family. The statistic is the df=2 goodness-of-fit
    // chi-square against the pooled status shares (3 categories), chosen
    // deliberately: for even df the chi-square survival function is
    // CLOSED-FORM (df=2 → p = e^(−x²/2)) — elementary functions only, no
    // incomplete-gamma dependency either engine would have to approximate.
    // Determinism: cell terms (O−E)²/E are nano-quantized before the
    // 3-cell sum (integer, order-free); p micro-quantized; the BH compare
    // p_(i) ≤ i·α/m runs as the pure-integer pu·20m ≤ i·10⁶. Scale: one
    // shuffle join orders⋈customer, then everything lives on the
    // 25×3-cell frame (missing cells densified — an absent status still
    // contributes its expected count). The rank window is bounded at m.
    "q_bh_fdr" -> ((s, d) => {
      val x2 = natChi2P(s, d)
      val ranked = x2
        .crossJoin(broadcast(x2.agg(count(lit(1)).as("m"))))
        .withColumn("rnk",
          row_number().over(Window.orderBy(col("pu"), col("nk"))))
        .withColumn("pass",
          col("pu") * col("m") * lit(20L) <= col("rnk") * lit(1000000L))
      val kstar = ranked.agg(max(when(col("pass"), col("rnk"))).as("k"))
      ranked.crossJoin(broadcast(kstar))
        .select(col("nk").as("nationkey"), col("n"),
          round(col("x2u").cast("double") / lit(1e9), 6).as("x2"),
          (col("pu").cast("double") / lit(1e6)).as("p_value"),
          col("rnk").cast("long").as("rnk"),
          when(col("k").isNotNull && col("rnk") <= col("k"), 1L)
            .otherwise(0L).as("significant"))
        .orderBy(col("nationkey"))
    }),

    // -- Holm–Bonferroni step-down (FWER companion of q_bh_fdr) -------------
    // The family-wise-error control on the SAME 25 per-nation
    // independence tests: reject p₍ᵢ₎ only while EVERY earlier test in
    // the p-ascending order also clears its α/(m−i+1) bar (the
    // step-down stop), and report the standard running-max adjusted
    // p̃ᵢ = min(1, maxⱼ≤ᵢ pⱼ·(m−j+1)). Both the stop and the adjustment
    // are exact integer arithmetic on the micro-quantized p frame (the
    // q_bh_fdr device); the windows ride the m-row TEST frame, bounded
    // by the nation count, never the data.
    "q_holm_bonferroni" -> ((s, d) => {
      val x2 = natChi2P(s, d)
      val wOrd = Window.orderBy(col("pu"), col("nk"))
      val w = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      x2.crossJoin(broadcast(x2.agg(count(lit(1)).as("m"))))
        .withColumn("rnk", row_number().over(wOrd).cast("long"))
        .withColumn("stepu", col("pu") * (col("m") - col("rnk") + lit(1L)))
        .withColumn("fail",
          when(col("stepu") * lit(20L) > lit(1000000L), 1L).otherwise(0L))
        .withColumn("adj_u", least(lit(1000000L), max(col("stepu")).over(w)))
        .withColumn("nfail", sum(col("fail")).over(w))
        .select(col("nk").as("nationkey"), col("n"),
          (col("pu").cast("double") / lit(1e6)).as("p_value"),
          col("rnk"),
          (col("adj_u").cast("double") / lit(1e6)).as("p_holm"),
          when(col("nfail") === 0L, 1L).otherwise(0L).as("significant"))
        .orderBy(col("nationkey"))
    }),

    // -- Welch's ANOVA (unequal-variance one-way test) -----------------------
    // q_anova_f's classical F assumes a common within-group variance;
    // Welch's F* is the heteroscedasticity-robust form every stats
    // package recommends when group spreads differ (event-type values
    // here). Per-group moments are exact DECIMAL; the group weights
    // wᵢ = nᵢ/sᵢ² and weighted means quantize to integer micros on the
    // k-row frame and SUM exactly (order-free — the q_anova_f bq/wq
    // device), as do the second-stage deviation and H terms; F*, df₂
    // evaluate in one mirrored expression each.
    "q_welch_anova" -> ((s, d) => {
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val e = Tables.events(s, d).select(col("event_type"),
        floor(col("value") * lit(1000.0) + lit(0.5)).cast("long")
          .as("vq"))
      val byG = e.groupBy(col("event_type"))
        .agg(count(lit(1)).as("ng"), sum(dec(col("vq"))).as("s1"),
          sum(dec(col("vq")) * dec(col("vq"))).as("s2"))
        .filter(col("ng") > 1L)
        // a degenerate group whose values are all identical has vg = 0;
        // its Welch weight ng/vg is Infinity and the non-ANSI long cast
        // saturates where DuckDB errors — exclude it exactly:
        // vg > 0  ⟺  ng·s2 − s1² > 0 in integer (decimal) arithmetic
        .filter(dec(col("ng")) * col("s2") > col("s1") * col("s1"))
      val ngD = col("ng").cast("double")
      // mean and sample variance in VALUE units (vq is milli-units)
      val mg = col("s1").cast("double") / ngD / lit(1000.0)
      val vg = (col("s2").cast("double") / lit(1e6) -
        (col("s1").cast("double") / lit(1000.0)) * mg) / (ngD - lit(1.0))
      val wts = byG
        .withColumn("wq", floor(ngD / vg * lit(1e6) + lit(0.5))
          .cast("long"))
        .withColumn("wmq", floor(ngD / vg * mg * lit(1e6) + lit(0.5))
          .cast("long"))
      val tot = wts.agg(count(lit(1)).as("k"), sum(col("wq")).as("sw"),
        sum(col("wmq")).as("swm"))
      val mw = col("swm").cast("double") / col("sw").cast("double")
      val wD = col("wq").cast("double") / lit(1e6)
      val swD = col("sw").cast("double") / lit(1e6)
      val terms = wts.crossJoin(broadcast(tot))
        .withColumn("aq", floor(wD * (mg - mw) * (mg - mw) * lit(1e6) +
          lit(0.5)).cast("long"))
        .withColumn("hq", floor((lit(1.0) - wD / swD) *
          (lit(1.0) - wD / swD) / (ngD - lit(1.0)) * lit(1e9) +
          lit(0.5)).cast("long"))
      val fin = terms.groupBy(col("k"), col("sw"))
        .agg(sum(col("ng")).as("n"), sum(col("aq")).as("sa"),
          sum(col("hq")).as("sh"))
      val kD = col("k").cast("double")
      val aD = col("sa").cast("double") / lit(1e6)
      val hD = col("sh").cast("double") / lit(1e9)
      def q6(c: org.apache.spark.sql.Column) =
        floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
      fin.select(col("n"), col("k"),
        q6(aD / (kD - lit(1.0)) /
          (lit(1.0) + lit(2.0) * (kD - lit(2.0)) /
            (kD * kD - lit(1.0)) * hD)).as("f_welch"),
        (col("k") - lit(1L)).as("df1"),
        q6((kD * kD - lit(1.0)) / (lit(3.0) * hD)).as("df2"))
    }),

    // -- intraclass correlation ICC(1) (one-way random effects) ---------------
    // The reliability readout behind "does nation explain order value":
    // what share of total variance is BETWEEN nations? ICC(1) =
    // (MSB − MSW)/(MSB + (n₀−1)·MSW) with the unbalanced-design
    // n₀ = (N − Σnᵢ²/N)/(k−1). Per-group cent moments are exact
    // DECIMAL; the between/within sum-of-squares terms are quantized
    // per group as N-normalized integer micros (the q_anova_f device —
    // order-free sums) and the final ICC/n₀ evaluate in mirrored
    // expressions on the 1-row frame.
    "q_icc" -> ((s, d) => {
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val oc = Tables.orders(s, d)
        .select(col("o_custkey"),
          floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long")
            .as("cents"))
        .join(Tables.customer(s, d).select(
          col("c_custkey").as("o_custkey"),
          col("c_nationkey").cast("long").as("nk")), "o_custkey")
      val byG = oc.groupBy(col("nk"))
        .agg(count(lit(1)).as("ng"), sum(dec(col("cents"))).as("s1"),
          sum(dec(col("cents")) * dec(col("cents"))).as("s2"))
        .filter(col("ng") > 1L)
      val g = byG.agg(sum(col("ng")).as("nn"), sum(col("s1")).as("gs1"),
        count(lit(1)).as("k"), sum(dec(col("ng")) * dec(col("ng")))
          .as("sn2"))
      val ngD = col("ng").cast("double"); val nnD = col("nn").cast("double")
      val mg = col("s1").cast("double") / ngD
      val gm = col("gs1").cast("double") / nnD
      val terms = byG.crossJoin(broadcast(g))
        .withColumn("bq", floor(ngD * (mg - gm) * (mg - gm) / nnD +
          lit(0.5)).cast("long"))
        .withColumn("wq", floor((col("s2").cast("double") - mg *
          col("s1").cast("double")) / nnD + lit(0.5))
          .cast("long"))
      val fin = terms.groupBy(col("nn"), col("k"), col("sn2"))
        .agg(sum(col("bq")).as("ssb"), sum(col("wq")).as("ssw"))
      val kD = col("k").cast("double")
      val msb = col("ssb").cast("double") *
        col("nn").cast("double") / (kD - lit(1.0))
      val msw = col("ssw").cast("double") *
        col("nn").cast("double") /
        (col("nn").cast("double") - kD)
      val n0 = (col("nn").cast("double") -
        col("sn2").cast("double") / col("nn").cast("double")) /
        (kD - lit(1.0))
      def q6(c: org.apache.spark.sql.Column) =
        floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
      fin.select(col("nn").as("n"), col("k"),
        q6(n0).as("n0"),
        when(msb + (n0 - lit(1.0)) * msw =!= 0.0,
          q6((msb - msw) / (msb + (n0 - lit(1.0)) * msw))).as("icc"))
    }),

    // -- TOST equivalence test (two one-sided tests) --------------------------
    // The inference q_ab_test can't give: evidence of SAMENESS. Classic
    // TOST with margin ±0.5 value units: both one-sided z's must clear
    // 1.645 for the purchase/click mean gap to be declared inside the
    // equivalence band — absence of evidence made rigorous, the
    // non-inferiority readout every launch review wants. Group moments
    // are exact DECIMAL; Welch SE, the two z's, and the verdict evaluate
    // in mirrored expressions; the verdict itself compares quantized
    // integers so the boolean can't straddle a ULP.
    "q_tost" -> ((s, d) => {
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val e = Tables.events(s, d)
        .filter(col("event_type").isin("purchase", "click"))
        .select((col("event_type") === "purchase").cast("int").cast("long")
          .as("g"),
          floor(col("value") * lit(1000.0) + lit(0.5)).cast("long")
            .as("vq"))
      val m = e.groupBy(col("g"))
        .agg(count(lit(1)).as("n"), sum(dec(col("vq"))).as("s1"),
          sum(dec(col("vq")) * dec(col("vq"))).as("s2"))
      val w = m.agg(
        max(when(col("g") === 1L, col("n"))).as("n1"),
        max(when(col("g") === 1L, col("s1"))).as("a1"),
        max(when(col("g") === 1L, col("s2"))).as("a2"),
        max(when(col("g") === 0L, col("n"))).as("n2"),
        max(when(col("g") === 0L, col("s1"))).as("b1"),
        max(when(col("g") === 0L, col("s2"))).as("b2"))
      val n1D = col("n1").cast("double"); val n2D = col("n2").cast("double")
      val m1 = col("a1").cast("double") / n1D / lit(1000.0)
      val m2 = col("b1").cast("double") / n2D / lit(1000.0)
      val v1 = (col("a2").cast("double") / lit(1e6) -
        (col("a1").cast("double") / lit(1000.0)) * m1) / (n1D - lit(1.0))
      val v2 = (col("b2").cast("double") / lit(1e6) -
        (col("b1").cast("double") / lit(1000.0)) * m2) / (n2D - lit(1.0))
      val se0 = sqrt(v1 / n1D + v2 / n2D)
      // degenerate-but-valid edge (ADVICE r12): both groups all-identical
      // values → se = 0 → the z ratios divide by zero (Spark Infinity vs
      // DuckDB cast error). Emit NULL z's and a non-equivalent verdict,
      // mirrored in the oracle.
      val se = when(se0 > lit(0.0), se0)
      val margin = lit(0.5)
      val zLo = ((m1 - m2) + margin) / se
      val zUp = (margin - (m1 - m2)) / se
      def q6(c: org.apache.spark.sql.Column) =
        floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
      w.select(col("n1"), col("n2"), q6(m1 - m2).as("diff"),
        q6(se0).as("se"), q6(zLo).as("z_lower"), q6(zUp).as("z_upper"),
        coalesce(floor(zLo * lit(1e6) + lit(0.5)) > lit(1644854.0) &&
          floor(zUp * lit(1e6) + lit(0.5)) > lit(1644854.0), lit(false))
          .as("equivalent"))
    }),

    // -- permutation test (deterministic label-flip resampling) --------------
    // The distribution-free significance machinery t-tests approximate:
    // re-assign each observation's group label B=64 times by the pure
    // splitmix64 hash of (event_id, b) — reproducible across runs,
    // engines, and partitionings, the same determinism contract as the
    // sampling family — and count replicates whose |mean difference|
    // reaches the observed one; p = (extreme+1)/(B+1) (the add-one
    // permutation convention). The comparison |d_b| ≥ |d_obs| is decided
    // on EXACT integers: d = (sv₁n₂ − sv₂n₁)/(n₁n₂), so cross-multiply
    // in DECIMAL(38,0) (≈1e25 ≪ 1e38; HUGEINT twin). A degenerate flip
    // (one side empty) counts as extreme — conservative, and
    // probability-zero at any real n. Cost: one B-fold explode over the
    // filtered scan + a 64-group aggregate; B is the knob at 100 TB.
    "q_permutation_test" -> ((s, d) => {
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val e = Tables.events(s, d)
        .filter(col("event_type").isin("purchase", "click"))
        .select(col("event_id"),
          (col("event_type") === "purchase").cast("int").cast("long")
            .as("g"),
          floor(col("value") * lit(1000.0) + lit(0.5)).cast("long")
            .as("vq"))
      val obs = e.agg(sum(col("g")).as("n1"),
        sum(col("g") * col("vq")).as("sv1"),
        sum(lit(1L) - col("g")).as("n2"),
        sum((lit(1L) - col("g")) * col("vq")).as("sv2"))
      val reps = e.withColumn("b", explode(sequence(lit(0L), lit(63L))))
        .withColumn("gb", pmod(shiftrightunsigned(
          NativeExpressions.splitmix64(
            col("event_id") * lit(64L) + col("b")), 8), lit(2)))
        .groupBy(col("b"))
        .agg(sum(col("gb")).as("n1b"),
          sum(col("gb") * col("vq")).as("sv1b"),
          sum(lit(1L) - col("gb")).as("n2b"),
          sum((lit(1L) - col("gb")) * col("vq")).as("sv2b"))
      val fin = reps.crossJoin(broadcast(obs))
        .withColumn("numb",
          dec(col("sv1b")) * col("n2b") - dec(col("sv2b")) * col("n1b"))
        .withColumn("num",
          dec(col("sv1")) * col("n2") - dec(col("sv2")) * col("n1"))
        .withColumn("extreme",
          when(abs(col("numb")) * dec(col("n1")) * col("n2") >=
            abs(col("num")) * dec(col("n1b")) * col("n2b"), 1L)
            .otherwise(0L))
        .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
          max(col("sv1")).as("sv1"), max(col("sv2")).as("sv2"),
          count(lit(1)).as("n_flips"), sum(col("extreme")).as("n_extreme"))
      def q6(c: org.apache.spark.sql.Column) =
        floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
      fin.select(col("n1"), col("n2"),
        q6(col("sv1").cast("double") / col("n1") / lit(1000.0) -
          col("sv2").cast("double") / col("n2") / lit(1000.0))
          .as("diff_obs"),
        col("n_flips"), col("n_extreme"),
        (expr("((n_extreme + 1) * 1000000) div (n_flips + 1)")
          .cast("double") / lit(1e6)).as("p_value"))
    }),

    // -- Q–Q deciles (purchase vs click value distributions) -----------------
    // The distribution-comparison readout behind every Q–Q plot: the
    // nine deciles of the two event-value distributions side by side,
    // each an EXACT ceil-rank order statistic (smallest quantized value
    // with 10·cum ≥ d·n — the q_outlier_mad integer contract) computed
    // on the GROUP-KEYED distinct-value frames (windows partitioned by
    // event type, so nothing is single-task; frames bounded by the
    // quantized value domain). Matching deciles ⇒ same distribution;
    // the integer milli gap per decile is the Q–Q deviation.
    "q_qq_plot" -> ((s, d) => {
      val e = Tables.events(s, d)
        .filter(col("event_type").isin("purchase", "click"))
        .select(col("event_type").as("grp"),
          floor(col("value") * lit(1000.0) + lit(0.5)).cast("long")
            .as("vq"))
      val cells = e.groupBy(col("grp"), col("vq"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("grp")).orderBy(col("vq"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wn = Window.partitionBy(col("grp"))
      cells
        .withColumn("cum", sum(col("cnt")).over(w))
        .withColumn("n", sum(col("cnt")).over(wn))
        .withColumn("d", explode(sequence(lit(1L), lit(9L))))
        .filter(col("cum") * 10 >= col("d") * col("n"))
        .groupBy(col("d").as("decile"))
        .agg(min(when(col("grp") === "purchase", col("vq"))).as("pq"),
          min(when(col("grp") === "click", col("vq"))).as("cq"))
        .select(col("decile"),
          (col("pq").cast("double") / lit(1000.0)).as("q_purchase"),
          (col("cq").cast("double") / lit(1000.0)).as("q_click"),
          ((col("pq") - col("cq")).cast("double") / lit(1000.0))
            .as("qq_gap"))
        .orderBy(col("decile"))
    }),

    // -- MASE backtest of the seasonal-naive forecaster ----------------------
    // The scale-free forecast-accuracy metric (Hyndman & Koehler) the
    // smoothing family (q_holt_*) lacks an evaluation row for: on the
    // daily mean-value series, score the weekly seasonal-naive forecast
    // (ŷ_t = y_{t−7}) against the one-step naive benchmark —
    // MASE = mean|y−ŷ| / mean|y−y_{t−1}|; < 1 beats naive. Day means
    // are exact integer micros (the q_cusum device); both error sums
    // are integer; the ratio is one exact cross-multiplied integer
    // micro-division. Lags ride the BOUNDED day frame (calendar class).
    "q_mase_backtest" -> ((s, d) => {
      val byDay = Tables.eventsWithTime(s, d)
        .select(expr("ts_us div 86400000000").as("day"),
          floor(col("value") * lit(1000.0) + lit(0.5)).cast("long")
            .as("vq"))
        .groupBy(col("day"))
        .agg(count(lit(1)).as("n"), sum(col("vq")).as("sq"))
        .withColumn("xm", expr("(sq * 1000) div n"))
      val w = Window.orderBy(col("day"))
      val errs = byDay
        .withColumn("e1", abs(col("xm") - lag(col("xm"), 1).over(w)))
        .withColumn("e7", abs(col("xm") - lag(col("xm"), 7).over(w)))
      errs.agg(count(lit(1)).as("n_days"),
          sum(when(col("e7").isNotNull, 1L).otherwise(0L)).as("n7"),
          sum(when(col("e1").isNotNull, 1L).otherwise(0L)).as("n1"),
          sum(col("e7")).as("s7"), sum(col("e1")).as("s1"))
        .select(col("n_days"),
          (expr("(s7 * 1000000) div n7").cast("double") / lit(1e12))
            .as("mae_seasonal"),
          (expr("(s1 * 1000000) div n1").cast("double") / lit(1e12))
            .as("mae_naive"),
          // the triple product s7*n1*1e6 can exceed int64 on a long
          // calendar with high-magnitude day means; widen to
          // DECIMAL(38,0) (HUGEINT on the oracle side) so the integer
          // division is exact instead of silently wrapped (non-ANSI
          // Spark wraps, DuckDB raises — a silent-wrong-answer class)
          (expr("(cast(s7 as decimal(38,0)) * n1 * 1000000) div " +
            "(cast(s1 as decimal(38,0)) * n7)").cast("double") /
            lit(1e6)).as("mase"))
    }),

    // -- Simpson's-paradox detector (pooled vs within-group trend) ---------
    // The aggregation-bias audit: fit the order-value-vs-time trend once
    // POOLED over all orders and once as the ANCOVA common slope WITHIN
    // order-priority groups (Σg centered-Sxy / Σg centered-Sxx). A sign
    // flip between the two is Simpson's paradox — the composition of
    // groups, not the within-group relationship, drives the pooled trend;
    // the gap column quantifies the confounding even when the sign holds.
    // Determinism: per-group raw moments are exact DECIMAL(38,0); the
    // per-group centered sums evaluate in double but the cross-group
    // reduction folds them in SORTED group order via sort_array +
    // aggregate() (the q_pca_power sorted-fold discipline), mirrored by
    // list_reduce over an ORDER BY list in DuckDB — bit-identical
    // sequential double adds. Scale: one keyed aggregation is the only
    // data-sized step; the fold runs on the |priorities|-row frame.
    "q_simpson_flip" -> ((s, d) => {
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val o = Tables.orders(s, d).select(
        col("o_orderpriority").as("grp"),
        datediff(col("o_orderdate").cast("date"),
          lit("1970-01-01").cast("date")).cast("long").as("x"),
        floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long")
          .as("y"))
      val g = o.groupBy(col("grp")).agg(
        count(lit(1)).as("n"),
        sum(dec(col("x"))).as("sx"), sum(dec(col("y"))).as("sy"),
        sum(dec(col("x")) * dec(col("x"))).as("sxx"),
        sum(dec(col("x")) * dec(col("y"))).as("sxy"))
      val c = g.select(col("grp"), col("n"), col("sx"), col("sy"),
        col("sxx"), col("sxy"),
        (col("sxy").cast("double") - col("sx").cast("double") *
          col("sy").cast("double") / col("n").cast("double")).as("cxy"),
        (col("sxx").cast("double") - col("sx").cast("double") *
          col("sx").cast("double") / col("n").cast("double")).as("cxx"))
      val t = c.agg(
        sum(col("n")).as("nn"),
        sum(col("sx")).as("tsx"), sum(col("sy")).as("tsy"),
        sum(col("sxx")).as("tsxx"), sum(col("sxy")).as("tsxy"),
        count(lit(1)).as("ngroups"),
        sort_array(collect_list(struct(col("grp"), col("cxy"),
          col("cxx")))).as("gs"))
        .withColumn("wxy", expr(
          "aggregate(gs, cast(0.0 as double), (a, s) -> a + s.cxy)"))
        .withColumn("wxx", expr(
          "aggregate(gs, cast(0.0 as double), (a, s) -> a + s.cxx)"))
      val nnD = col("nn").cast("double")
      val pooled = (nnD * col("tsxy").cast("double") -
        col("tsx").cast("double") * col("tsy").cast("double")) /
        (nnD * col("tsxx").cast("double") -
          col("tsx").cast("double") * col("tsx").cast("double"))
      val within = col("wxy") / col("wxx")
      t.select(col("nn").as("n"), col("ngroups").as("n_groups"),
        round(pooled, 6).as("pooled_slope"),
        when(col("wxx") =!= 0.0, round(within, 6)).as("within_slope"),
        when(col("wxx") =!= 0.0, round(pooled - within, 6))
          .as("confounding_gap"),
        when(col("wxx") =!= 0.0 && pooled * within < 0.0, 1L)
          .otherwise(0L).as("sign_flip"))
    }),

    // -- Brier-score decomposition (Murphy 1973) ---------------------------
    // The single-number counterpart of q_calibration's reliability
    // diagram: Brier = reliability − resolution + uncertainty over the
    // same classifier/bin structure. Raw Brier is an exact integer sum of
    // micro-residual squares in DECIMAL(38,0); the binned reliability/
    // resolution terms are each ≤ 1 by construction, so nano-quantizing
    // the per-bin SHARE-weighted term ((n_k/N)·gap²·1e9 ≤ 1e9) keeps the
    // 10-term sum inside a long at ANY corpus size — no two-level escape
    // needed. Cost: the classifier's unigram pass + a 10-row aggregate;
    // the global moment frame broadcasts back.
    "q_brier_decomp" -> ((s, d) => {
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val pr = TextDedup.classifierScored(Tables.documents(s, d),
          Seq(col("doc_id"), col("n_chars")))
        .withColumn("pu", floor(lit(1.0) /
          (lit(1.0) + exp(-col("score").cast("double") / lit(4.0))) *
          lit(1000000.0) + lit(0.5)).cast("long"))
        .withColumn("o", when(col("n_chars") >= 300, 1L).otherwise(0L))
      val g = pr.agg(count(lit(1)).as("n"), sum(col("o")).as("npos"),
        sum(dec(col("pu") - col("o") * lit(1000000L)) *
          dec(col("pu") - col("o") * lit(1000000L))).as("sse"))
      val bn = pr
        .withColumn("bin", least(expr("pu div 100000"), lit(9L)))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("nk"), sum(col("pu")).as("spu"),
          sum(col("o")).as("nposk"))
      val nD = col("n").cast("double")
      val pbar = col("spu").cast("double") / col("nk").cast("double") /
        lit(1e6)
      val obark = col("nposk").cast("double") / col("nk").cast("double")
      val obar = col("npos").cast("double") / nD
      val share = col("nk").cast("double") / nD
      val t = bn.crossJoin(broadcast(g))
        .withColumn("relu", floor(share * (pbar - obark) *
          (pbar - obark) * lit(1e9) + lit(0.5)).cast("long"))
        .withColumn("resu", floor(share * (obark - obar) *
          (obark - obar) * lit(1e9) + lit(0.5)).cast("long"))
        .groupBy(col("n"), col("npos"), col("sse"))
        .agg(sum(col("relu")).as("srel"), sum(col("resu")).as("sres"))
      t.select(col("n"),
        round(col("sse").cast("double") / nD / lit(1e12), 6).as("brier"),
        round(col("srel").cast("double") / lit(1e9), 6).as("reliability"),
        round(col("sres").cast("double") / lit(1e9), 6).as("resolution"),
        round(obar * (lit(1.0) - obar), 6).as("uncertainty"),
        round(col("srel").cast("double") / lit(1e9) -
          col("sres").cast("double") / lit(1e9) +
          obar * (lit(1.0) - obar), 6).as("brier_binned"))
    }),

    // -- delete-one-group jackknife (grouped SE without resampling) --------
    // The deterministic cousin of q_bootstrap_ci: the delete-one-SOURCE
    // jackknife for the corpus mean, the estimator a pipeline uses when
    // the natural resampling unit is a whole source/shard (clustered
    // data) rather than a row. Every leave-one-out replicate is CLOSED-
    // FORM from the per-source totals ((T−T_s)/(N−n_s) — the
    // q_loo_influence identity), so the whole thing is one keyed
    // aggregate + arithmetic on the G-row frame. Replicates are micro-
    // quantized before the two bounded reduction passes (exact integer
    // sums, order-free); SE and bias come out of Tukey's (G−1)/G
    // formula in one mirrored double expression.
    "q_jackknife" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("source"),
        col("n_chars"))
      val bySrc = docs.groupBy(col("source"))
        .agg(count(lit(1)).as("ns"), sum(col("n_chars")).as("ts"))
      val g = docs.agg(count(lit(1)).as("nn"), sum(col("n_chars")).as("tt"))
      val th = bySrc.crossJoin(broadcast(g))
        .filter(col("nn") =!= col("ns"))
        .withColumn("thq", floor(
          (col("tt").cast("double") - col("ts").cast("double")) /
            (col("nn").cast("double") - col("ns").cast("double")) *
            lit(1e6) + lit(0.5)).cast("long"))
      val p1 = th.agg(count(lit(1)).as("gg"), sum(col("thq")).as("sthq"))
      val gD = col("gg").cast("double")
      val thDot = col("sthq").cast("double") / gD / lit(1e6)
      val dev = th.crossJoin(broadcast(p1))
        .withColumn("devq", floor(
          (col("thq").cast("double") / lit(1e6) - thDot) *
            (col("thq").cast("double") / lit(1e6) - thDot) *
            lit(1e9) + lit(0.5)).cast("long"))
      val fin = dev.agg(max(col("gg")).as("gg"), max(col("sthq")).as("sthq"),
        max(col("nn")).as("nn"), max(col("tt")).as("tt"),
        sum(col("devq")).as("sdev"))
      val theta = col("tt").cast("double") / col("nn").cast("double")
      fin.select(col("gg").as("n_groups"),
        round(theta, 6).as("theta"),
        round(thDot, 6).as("theta_jk"),
        round(sqrt((gD - lit(1.0)) / gD *
          (col("sdev").cast("double") / lit(1e9))), 6).as("jk_se"),
        round((gD - lit(1.0)) * (thDot - theta), 6).as("jk_bias"))
    }),

    // -- one-way ANOVA F (k-group mean separation) -------------------------
    // The k-sample extension of q_ab_test / q_mann_whitney: does event
    // value differ across the 5 event types at all? Between/within sums
    // of squares derive entirely from exact milli-integer moments; the
    // per-group SHARE-weighted terms (n_g/N)·(m_g−m)² and the within-
    // group variance shares are each bounded by the value variance, so
    // micro-quantizing them keeps the k-term sums inside a long at any
    // corpus size (the q_brier_decomp discipline). F and η² come out of
    // one mirrored double expression on the two integer SS shares —
    // the quantization unit cancels in both ratios.
    "q_anova_f" -> ((s, d) => {
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val e = Tables.events(s, d).select(col("event_type"),
        floor(col("value") * lit(1000.0) + lit(0.5)).cast("long")
          .as("vq"))
      val byG = e.groupBy(col("event_type"))
        .agg(count(lit(1)).as("ng"), sum(dec(col("vq"))).as("s1"),
          sum(dec(col("vq")) * dec(col("vq"))).as("s2"))
      val g = byG.agg(sum(col("ng")).as("nn"), sum(col("s1")).as("gs1"),
        count(lit(1)).as("k"))
      val ngD = col("ng").cast("double"); val nnD = col("nn").cast("double")
      val mg = col("s1").cast("double") / ngD
      val gm = col("gs1").cast("double") / nnD
      val terms = byG.crossJoin(broadcast(g))
        .withColumn("bq", floor(ngD / nnD * (mg - gm) * (mg - gm) *
          lit(1e6) + lit(0.5)).cast("long"))
        .withColumn("wq", floor(
          (col("s2").cast("double") / ngD - mg * mg) * ngD / nnD *
            lit(1e6) + lit(0.5)).cast("long"))
      val fin = terms.groupBy(col("nn"), col("k"))
        .agg(sum(col("bq")).as("ssb"), sum(col("wq")).as("ssw"))
      val kD = col("k").cast("double")
      val ssbD = col("ssb").cast("double"); val sswD = col("ssw").cast("double")
      fin.select(col("nn").as("n"), col("k"),
        when(col("ssw") =!= 0L && col("k") > 1L, round(
          ssbD * (col("nn").cast("double") - kD) /
            (sswD * (kD - lit(1.0))), 6)).as("f_stat"),
        when(col("ssb") + col("ssw") =!= 0L,
          round(ssbD / (ssbD + sswD), 6)).as("eta2"))
    }),

    // -- James-Stein shrinkage of per-group means --------------------------
    // The winner's-curse correction for a 25-arm dashboard: raw
    // per-nation mean order values overstate the extremes; the JS
    // estimator shrinks every arm toward the grand mean by
    // c = max(0, 1 − (k−3)·se²/S), which DOMINATES the raw means in
    // total squared error for k ≥ 4 (Stein's paradox). Everything
    // derives from exact DECIMAL cent moments: per-arm variance-of-the-
    // mean and squared deviations are micro-quantized on the k-row
    // frame and summed exactly; the shrink factor and shrunk means
    // evaluate in one mirrored double expression.
    "q_james_stein" -> ((s, d) => {
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val oc = Tables.orders(s, d)
        .select(col("o_custkey"),
          floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long")
            .as("yq"))
        .join(Tables.customer(s, d).select(
          col("c_custkey").as("o_custkey"),
          col("c_nationkey").cast("long").as("nk")), "o_custkey")
      val byN = oc.groupBy(col("nk"))
        .agg(count(lit(1)).as("n"), sum(dec(col("yq"))).as("s1"),
          sum(dec(col("yq")) * dec(col("yq"))).as("s2"))
        .filter(col("n") > 1L)
      val g = byN.agg(sum(col("n")).as("nn"), sum(col("s1")).as("gs1"),
        count(lit(1)).as("k"))
      val nD = col("n").cast("double")
      val mi = col("s1").cast("double") / nD / lit(100.0)
      val gm = col("gs1").cast("double") / col("nn").cast("double") /
        lit(100.0)
      val se2 = (col("s2").cast("double") / lit(10000.0) -
        (col("s1").cast("double") / lit(100.0)) * mi) /
        (nD - lit(1.0)) / nD
      val wj = byN.crossJoin(broadcast(g))
        .withColumn("devq",
          floor((mi - gm) * (mi - gm) * lit(1e6) + lit(0.5)).cast("long"))
        .withColumn("seq",
          floor(se2 * lit(1e6) + lit(0.5)).cast("long"))
      val sums = wj.agg(max(col("k")).as("k"),
        sum(col("devq")).as("sdev"), sum(col("seq")).as("sse2"))
      val kD = col("k").cast("double")
      val c = greatest(lit(0.0), lit(1.0) - (kD - lit(3.0)) *
        (col("sse2").cast("double") / lit(1e6) / kD) /
        (col("sdev").cast("double") / lit(1e6)))
      wj.crossJoin(broadcast(sums.select(col("k").as("kk"),
          round(c, 6).as("shrink"))))
        .select(col("nk").as("nationkey"), col("n"),
          round(mi, 6).as("raw_mean"),
          round(gm + col("shrink") * (mi - gm), 6).as("js_mean"),
          col("shrink"))
        .orderBy(col("nationkey"))
    }),

    // -- empirical-Bayes rate shrinkage (beta-binomial) --------------------
    // The rate counterpart of q_james_stein: per-nation urgent-order
    // rates shrink toward the prior fitted by method of moments on the
    // k arm rates (α+β = m(1−m)/v − 1, clamped at 0 when the arms are
    // underdispersed — then the posterior IS the raw rate). The
    // "intelligent pseudo-counts" every rate dashboard should apply
    // before ranking small arms against big ones. Exact integer arm
    // counts; the k-row moment fold is micro-quantized; prior and
    // posteriors evaluate in mirrored expressions.
    "q_eb_rate" -> ((s, d) => {
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val oc = Tables.orders(s, d)
        .select(col("o_custkey"),
          col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            .cast("int").cast("long").as("u"))
        .join(Tables.customer(s, d).select(
          col("c_custkey").as("o_custkey"),
          col("c_nationkey").cast("long").as("nk")), "o_custkey")
      val byN = oc.groupBy(col("nk"))
        .agg(count(lit(1)).as("n"), sum(col("u")).as("x"))
      val rate = col("x").cast("double") / col("n").cast("double")
      val withQ = byN
        .withColumn("rq", floor(rate * lit(1e9) + lit(0.5)).cast("long"))
      // rq² reaches 1e18 per arm — the k-arm sum would wrap a long, so
      // the squares accumulate in DECIMAL like every other moment fold
      val mom = withQ.agg(count(lit(1)).as("k"), sum(col("rq")).as("sr"),
        sum(dec(col("rq")) * dec(col("rq"))).as("srr"))
      val kD = col("k").cast("double")
      val m = col("sr").cast("double") / kD / lit(1e9)
      val v = (col("srr").cast("double") / lit(1e18) -
        kD * m * m) / (kD - lit(1.0))
      val kap = greatest(lit(0.0), when(v > 0.0,
        m * (lit(1.0) - m) / v - lit(1.0)).otherwise(lit(0.0)))
      val pri = mom.select(col("k"), round(m, 6).as("prior_mean"),
        round(kap, 6).as("kappa"))
      withQ.crossJoin(broadcast(pri))
        .select(col("nk").as("nationkey"), col("n"), col("x"),
          round(rate, 6).as("raw_rate"),
          round((col("x").cast("double") +
            col("prior_mean") * col("kappa")) /
            (col("n").cast("double") + col("kappa")), 6).as("eb_rate"),
          col("prior_mean"), col("kappa"))
        .orderBy(col("nationkey"))
    }),

    // -- Spearman rank correlation (ties via midranks) ---------------------
    // The monotone-association measure between document length and the
    // hashed classifier score: Pearson on MIDRANKS, with both rank
    // assignments computed on domain-bounded distinct-value frames (the
    // q_mann_whitney trick — no global per-row ranking ever happens;
    // doubled midranks keep everything integer until the final moment
    // fold in DECIMAL). Output is ρ with exact tie handling.
    "q_spearman" -> ((s, d) => {
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val scored = TextDedup.classifierScored(Tables.documents(s, d),
          Seq(col("doc_id"), col("n_chars")))
        .select(col("doc_id"), col("n_chars").as("xv"),
          col("score").cast("long").as("yv"))
      // NDV-dispatched midranks (RankStats, q_mann_whitney class): each
      // midrank frame is the DISTINCT-VALUE frame — xv a document length,
      // yv the integer micro-scaled score. The dispatcher probes the NDV
      // and takes the Limit-bounded window below the ceiling (where it
      // also broadcast-hints the rank frame for the join back) or
      // Dist.globalPrefixSum above it (unhinted — shuffle join).
      def midranks(src: DataFrame, cn: String) =
        RankStats.doubledMidranks(
          src.groupBy(col(cn)).agg(count(lit(1)).as("cnt")),
          cn, "cnt", s"r_$cn")
          .select(col(cn), col(s"r_$cn"))
      val ranked = scored
        .join(midranks(scored, "xv"), "xv")
        .join(midranks(scored, "yv"), "yv")
      val m = ranked.agg(count(lit(1)).as("n"),
        sum(dec(col("r_xv"))).as("sx"), sum(dec(col("r_yv"))).as("sy"),
        sum(dec(col("r_xv")) * dec(col("r_xv"))).as("sxx"),
        sum(dec(col("r_yv")) * dec(col("r_yv"))).as("syy"),
        sum(dec(col("r_xv")) * dec(col("r_yv"))).as("sxy"))
      val nD = col("n").cast("double")
      val num = nD * col("sxy").cast("double") -
        col("sx").cast("double") * col("sy").cast("double")
      val dx = nD * col("sxx").cast("double") -
        col("sx").cast("double") * col("sx").cast("double")
      val dy = nD * col("syy").cast("double") -
        col("sy").cast("double") * col("sy").cast("double")
      m.select(col("n"),
        when(dx > 0.0 && dy > 0.0, round(num / sqrt(dx * dy), 6))
          .as("spearman_rho"))
    }),

    // -- regression discontinuity (jump at a date cutoff) ------------------
    // The sharp-RD estimator: fit the order-value trend separately on
    // each side of the 1998-01-01 cutoff and read the jump between the
    // two intercepts AT the cutoff — the causal estimate when treatment
    // switches exactly there (the q_diff_in_diff companion for
    // threshold designs). Per-side OLS from exact DECIMAL cent moments
    // (the q_group_ols shape keyed by side); intercepts and the jump
    // evaluate in one mirrored expression; degenerate sides NULL
    // explicitly.
    "q_reg_discontinuity" -> ((s, d) => {
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val cutoff = lit("1998-01-01").cast("date")
      val o = Tables.orders(s, d).select(
        datediff(col("o_orderdate").cast("date"), cutoff).cast("long")
          .as("x"),
        floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long")
          .as("y"))
        .withColumn("side", when(col("x") < 0L, "left")
          .otherwise("right"))
      val m = o.groupBy(col("side")).agg(count(lit(1)).as("n"),
        sum(dec(col("x"))).as("sx"), sum(dec(col("y"))).as("sy"),
        sum(dec(col("x")) * dec(col("x"))).as("sxx"),
        sum(dec(col("x")) * dec(col("y"))).as("sxy"))
      val nD = col("n").cast("double")
      val num = nD * col("sxy").cast("double") -
        col("sx").cast("double") * col("sy").cast("double")
      val den = nD * col("sxx").cast("double") -
        col("sx").cast("double") * col("sx").cast("double")
      val sides = m.select(col("side"), col("n"),
        when(den =!= 0.0, num / den).as("slope"),
        when(den =!= 0.0,
          (col("sy").cast("double") - num / den *
            col("sx").cast("double")) / nD / lit(100.0)).as("icpt"))
      val l = sides.filter(col("side") === "left")
        .select(col("n").as("n_left"), col("slope").as("sl"),
          col("icpt").as("il"))
      val r = sides.filter(col("side") === "right")
        .select(col("n").as("n_right"), col("slope").as("sr"),
          col("icpt").as("ir"))
      l.crossJoin(broadcast(r))
        .select(col("n_left"), col("n_right"),
          round(col("sl") * lit(365.0) / lit(100.0), 6)
            .as("slope_left_per_year"),
          round(col("sr") * lit(365.0) / lit(100.0), 6)
            .as("slope_right_per_year"),
          round(col("il"), 6).as("icpt_left"),
          round(col("ir"), 6).as("icpt_right"),
          round(col("ir") - col("il"), 6).as("jump"))
    }),

    // -- capture-recapture population estimate (Chapman) -------------------
    // Two-sample mark-recapture over the PURCHASER population: who
    // purchases in days 1-3 vs days 4-6 of the corpus window, overlap m,
    // Chapman's bias-corrected N̂ = (n1+1)(n2+1)/(m+1) − 1 — the
    // estimator a coverage audit uses when the full population can't be
    // enumerated (how many distinct entities does this corpus REALLY
    // touch?). Exact distinct-set sizes via two keyed aggregates; the
    // estimate and the observed-coverage ratio evaluate in mirrored
    // expressions.
    "q_capture_recapture" -> ((s, d) => {
      val pe = Tables.eventsWithTime(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), to_date(col("ts_t")).as("day"))
      val d0 = lit("2024-01-01").cast("date")
      val s1 = pe.filter(datediff(col("day"), d0).between(0, 2))
        .select(col("user_id")).distinct()
      val s2 = pe.filter(datediff(col("day"), d0).between(3, 5))
        .select(col("user_id")).distinct()
      val n1 = s1.agg(count(lit(1)).as("n1"))
      val n2 = s2.agg(count(lit(1)).as("n2"))
      val mm = s1.join(s2, "user_id").agg(count(lit(1)).as("m"))
      val obs = pe.select(col("user_id")).distinct()
        .agg(count(lit(1)).as("n_obs"))
      n1.crossJoin(broadcast(n2)).crossJoin(broadcast(mm))
        .crossJoin(broadcast(obs))
        .select(col("n1"), col("n2"), col("m"), col("n_obs"),
          round((col("n1").cast("double") + lit(1.0)) *
            (col("n2").cast("double") + lit(1.0)) /
            (col("m").cast("double") + lit(1.0)) - lit(1.0), 6)
            .as("chapman_n"),
          when((col("n1") + lit(1L)) * (col("n2") + lit(1L)) >
            (col("m") + lit(1L)), round(col("n_obs").cast("double") /
              ((col("n1").cast("double") + lit(1.0)) *
                (col("n2").cast("double") + lit(1.0)) /
                (col("m").cast("double") + lit(1.0)) - lit(1.0)), 6))
            .as("coverage"))
    }),

    // -- Wilson score intervals for per-arm rates --------------------------
    // The interval q_eb_rate's point shrinkage should be read next to:
    // the Wilson 95% CI per nation urgent-rate, which stays inside
    // (0,1) and behaves at small n where the Wald interval collapses.
    // One closed-form expression per arm from exact integer counts,
    // shared z²=3.841459 literal on both engines.
    "q_wilson_ci" -> ((s, d) => {
      val oc = Tables.orders(s, d)
        .select(col("o_custkey"),
          col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            .cast("int").cast("long").as("u"))
        .join(Tables.customer(s, d).select(
          col("c_custkey").as("o_custkey"),
          col("c_nationkey").cast("long").as("nk")), "o_custkey")
      val byN = oc.groupBy(col("nk"))
        .agg(count(lit(1)).as("n"), sum(col("u")).as("x"))
      val nD = col("n").cast("double")
      val p = col("x").cast("double") / nD
      val z2 = lit(3.841459)
      val denom = lit(1.0) + z2 / nD
      val center = (p + z2 / (lit(2.0) * nD)) / denom
      val half = sqrt(z2) * sqrt(p * (lit(1.0) - p) / nD +
        z2 / (lit(4.0) * nD * nD)) / denom
      byN.select(col("nk").as("nationkey"), col("n"), col("x"),
          round(p, 6).as("rate"),
          round(center - half, 6).as("wilson_lo"),
          round(center + half, 6).as("wilson_hi"))
        .orderBy(col("nationkey"))
    }),

    // -- overdispersion diagnostic (Poisson adequacy per event type) -------
    // The count-model sanity check: is daily volume per event type
    // Poisson (dispersion ≈ 1) or clumped (> 1 — bursts, bots, retry
    // storms)? Variance-to-mean of the per-type daily counts from exact
    // integer moments on the (type × day) frame — a 5×30 contingency at
    // any corpus size; sample variance uses the n−1 convention. One
    // keyed aggregate is the only data-sized step.
    "q_overdispersion" -> ((s, d) => {
      val byTD = Tables.events(s, d)
        .groupBy(col("event_type"),
          datediff(to_date(col("ts")),
            lit("1970-01-01").cast("date")).cast("long").as("dd"))
        .agg(count(lit(1)).as("c"))
      val m = byTD.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"), sum(col("c")).as("s1"),
          sum(col("c") * col("c")).as("s2"))
      val nD = col("n_days").cast("double")
      val mean = col("s1").cast("double") / nD
      val vr = (col("s2").cast("double") - col("s1").cast("double") *
        col("s1").cast("double") / nD) / (nD - lit(1.0))
      m.filter(col("n_days") > 1L)
        .select(col("event_type"), col("n_days"),
          round(mean, 6).as("mean_daily"),
          round(vr, 6).as("var_daily"),
          when(mean > 0.0, round(vr / mean, 6)).as("dispersion"),
          when(mean > 0.0 && vr / mean > 1.0, 1L).otherwise(0L)
            .as("overdispersed"))
        .orderBy(col("event_type"))
    }),

    // -- Wald-Wolfowitz runs test (randomness of daily movement) -----------
    // Is the day-over-day up/down sequence of total volume random, or
    // does it trend/oscillate? The runs count against its null
    // expectation 2·n1·n2/(n1+n2) + 1 — the distribution-free check
    // behind "is this series worth a forecaster at all". Ties
    // (flat days) drop before runs are counted, per the classical
    // definition. Everything runs on the calendar-bounded day frame:
    // two lag windows and exact integer counts; z evaluates in one
    // mirrored expression.
    "q_runs_test" -> ((s, d) => {
      val byDay = Tables.events(s, d)
        .groupBy(datediff(to_date(col("ts")),
          lit("1970-01-01").cast("date")).cast("long").as("dd"))
        .agg(count(lit(1)).as("y"))
      val wd = Window.orderBy(col("dd"))
      val signs = byDay
        .withColumn("prev", lag(col("y"), 1).over(wd))
        .filter(col("prev").isNotNull && col("y") =!= col("prev"))
        .withColumn("s", when(col("y") > col("prev"), 1L).otherwise(0L))
      val runsF = signs
        .withColumn("ps", lag(col("s"), 1).over(wd))
        .withColumn("chg",
          when(col("ps").isNull || col("s") =!= col("ps"), 1L)
            .otherwise(0L))
      val m = runsF.agg(sum(col("s")).as("n1"),
        sum(lit(1L) - col("s")).as("n2"), sum(col("chg")).as("runs"))
      val n1D = col("n1").cast("double"); val n2D = col("n2").cast("double")
      val nn = n1D + n2D
      val er = lit(2.0) * n1D * n2D / nn + lit(1.0)
      val vr = lit(2.0) * n1D * n2D *
        (lit(2.0) * n1D * n2D - n1D - n2D) / (nn * nn * (nn - lit(1.0)))
      m.select(col("n1"), col("n2"), col("runs"),
        round(er, 6).as("expected_runs"),
        when(vr > 0.0, round((col("runs").cast("double") - er) /
          sqrt(vr), 6)).as("z"))
    }),

    // -- paired t-test (within-user first-half vs second-half) -------------
    // The design that beats q_ab_test's independent-samples comparison
    // when the same units appear in both conditions: each user's mean
    // event value in the first half of the window pairs against their
    // own second half, removing between-user variance from the error
    // term entirely. Per-user half means come from exact milli sums;
    // the per-user DELTA micro-quantizes on the user frame and its
    // moments fold in DECIMAL; t evaluates in one mirrored expression.
    // One user-keyed conditional aggregate is the only data-sized step.
    "q_paired_ttest" -> ((s, d) => {
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val mid = lit("2024-01-16").cast("date")
      val u = Tables.events(s, d)
        .select(col("user_id"),
          (to_date(col("ts")) < mid).cast("int").cast("long").as("h1"),
          floor(col("value") * lit(1000.0) + lit(0.5)).cast("long")
            .as("vq"))
        .groupBy(col("user_id"))
        .agg(sum(col("h1")).as("n1"),
          sum(col("h1") * col("vq")).as("sv1"),
          sum(lit(1L) - col("h1")).as("n2"),
          sum((lit(1L) - col("h1")) * col("vq")).as("sv2"))
        .filter(col("n1") > 0L && col("n2") > 0L)
        .withColumn("dq", floor(
          (col("sv1").cast("double") / col("n1").cast("double") -
            col("sv2").cast("double") / col("n2").cast("double")) /
            lit(1000.0) * lit(1e6) + lit(0.5)).cast("long"))
      val m = u.agg(count(lit(1)).as("n"), sum(dec(col("dq"))).as("sd"),
        sum(dec(col("dq")) * dec(col("dq"))).as("sdd"))
      val nD = col("n").cast("double")
      val mean = col("sd").cast("double") / nD / lit(1e6)
      val sd = sqrt((col("sdd").cast("double") / lit(1e12) -
        nD * mean * mean) / (nD - lit(1.0)))
      m.select(col("n").as("n_users"),
        round(mean, 6).as("mean_delta"),
        when(col("n") > 1L && sd > 0.0,
          round(mean / (sd / sqrt(nD)), 6)).as("t_stat"))
    }),

    // -- Cohen's kappa (agreement between two labelers) --------------------
    // Chance-corrected agreement between the hashed quality classifier
    // (score > 0) and the length gate (n_chars ≥ 300) — the number that
    // says whether two quality signals measure the same thing or just
    // share a base rate. Confusion cells are exact integer counts from
    // the classifier's one unigram pass; κ = (p_o − p_e)/(1 − p_e)
    // evaluates in one mirrored expression.
    "q_cohens_kappa" -> ((s, d) => {
      val sc = TextDedup.classifierScored(Tables.documents(s, d),
          Seq(col("doc_id"), col("n_chars")))
        .select((col("score") > 0L).cast("int").cast("long").as("a"),
          (col("n_chars") >= 300L).cast("int").cast("long").as("b"))
      val m = sc.agg(count(lit(1)).as("n"),
        sum(col("a") * col("b")).as("n11"),
        sum(col("a") * (lit(1L) - col("b"))).as("n10"),
        sum((lit(1L) - col("a")) * col("b")).as("n01"),
        sum((lit(1L) - col("a")) * (lit(1L) - col("b"))).as("n00"))
      val nD = col("n").cast("double")
      val po = (col("n11") + col("n00")).cast("double") / nD
      val pa = (col("n11") + col("n10")).cast("double") / nD
      val pb = (col("n11") + col("n01")).cast("double") / nD
      val pe = pa * pb + (lit(1.0) - pa) * (lit(1.0) - pb)
      m.select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
        round(po, 6).as("p_observed"),
        round(pe, 6).as("p_expected"),
        when(pe =!= 1.0, round((po - pe) / (lit(1.0) - pe), 6))
          .as("kappa"))
    }),

    // -- Durbin-Watson (serial correlation of trend residuals) -------------
    // The companion q_group_ols should always be read with: after
    // fitting the daily-volume trend, are the residuals independent
    // (DW ≈ 2) or autocorrelated (DW → 0 trending, → 4 oscillating)?
    // The global fit derives from exact DECIMAL moments; residuals
    // micro-quantize on the calendar-bounded day frame and the DW
    // ratio folds their exact integer squares through one lag window.
    "q_durbin_watson" -> ((s, d) => {
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val byDay = Tables.events(s, d)
        .groupBy(datediff(to_date(col("ts")),
          lit("1970-01-01").cast("date")).cast("long").as("dd"))
        .agg(count(lit(1)).as("y"))
      val m = byDay.agg(count(lit(1)).as("n"),
        sum(dec(col("dd"))).as("sx"), sum(dec(col("y"))).as("sy"),
        sum(dec(col("dd")) * dec(col("dd"))).as("sxx"),
        sum(dec(col("dd")) * dec(col("y"))).as("sxy"))
      val nD = col("n").cast("double")
      val num = nD * col("sxy").cast("double") -
        col("sx").cast("double") * col("sy").cast("double")
      val den = nD * col("sxx").cast("double") -
        col("sx").cast("double") * col("sx").cast("double")
      val fit = m.select(col("n"), (num / den).as("b"),
        ((col("sy").cast("double") - num / den *
          col("sx").cast("double")) / nD).as("a"))
      val res = byDay.crossJoin(broadcast(fit))
        .withColumn("eq", floor(
          (col("y").cast("double") - (col("a") + col("b") *
            col("dd").cast("double"))) * lit(1e6) + lit(0.5))
          .cast("long"))
      val wd = Window.orderBy(col("dd"))
      val dw = res
        .withColumn("pe", lag(col("eq"), 1).over(wd))
        .agg(max(col("n")).as("n_days"), max(col("b")).as("slope"),
          sum(dec(col("eq")) * dec(col("eq"))).as("see"),
          sum(when(col("pe").isNotNull,
            dec(col("eq") - col("pe")) * dec(col("eq") - col("pe")))
            .otherwise(dec(lit(0L)))).as("sde"))
      dw.select(col("n_days"),
        round(col("slope"), 6).as("slope_per_day"),
        when(col("see") > dec(lit(0L)), round(
          col("sde").cast("double") / col("see").cast("double"), 6))
          .as("dw"))
    }),

    // -- Kruskal-Wallis H (k-sample rank test) -----------------------------
    // The k-group extension of q_mann_whitney (as q_anova_f extends the
    // t-test): do the 5 event-type value distributions differ at all,
    // without normality? Midranks ride the same domain-bounded
    // distinct-value frame; per-group doubled rank sums accumulate in
    // DECIMAL; the per-group R²/n terms fold in SORTED group order (the
    // sorted-fold discipline) before the mirrored H expression with
    // tie correction. df = k−1 = 4 is even, so the chi-square p-value
    // is CLOSED FORM: p = e^(−H/2)·(1 + H/2).
    "q_kruskal_wallis" -> ((s, d) => {
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val e = Tables.events(s, d)
        .select(col("event_type"),
          floor(col("value") * lit(1000.0) + lit(0.5)).cast("long")
            .as("vq"))
      val byV = e.groupBy(col("vq")).agg(count(lit(1)).as("cnt"))
      // NDV-dispatched midranks (RankStats, q_mann_whitney class): the
      // prefix runs on the DISTINCT-QUANTIZED-VALUE frame; the
      // dispatcher probes its NDV and bounds the window in-plan below
      // the ceiling (broadcast-hinting the rank frame for the join
      // back) or rides Dist.globalPrefixSum above it.
      val ranks = RankStats.doubledMidranks(byV, "vq", "cnt", "r2")
        .select(col("vq"), col("r2"))
      val ties = byV.agg(
        sum(dec(col("cnt")) * dec(col("cnt")) * dec(col("cnt")) -
          dec(col("cnt"))).as("tsum"))
      val byG = e.join(ranks, "vq")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("ng"), sum(dec(col("r2"))).as("sr2"))
        .withColumn("term",
          (col("sr2").cast("double") / lit(2.0)) *
            (col("sr2").cast("double") / lit(2.0)) /
            col("ng").cast("double"))
      val agg1 = byG.agg(sum(col("ng")).as("nn"),
        count(lit(1)).as("k"),
        sort_array(collect_list(struct(col("event_type"), col("term"))))
          .as("gs"))
        .withColumn("tsumr", expr(
          "aggregate(gs, cast(0.0 as double), (a, s) -> a + s.term)"))
        .crossJoin(broadcast(ties))
      val nD = col("nn").cast("double")
      val h0 = lit(12.0) / (nD * (nD + lit(1.0))) * col("tsumr") -
        lit(3.0) * (nD + lit(1.0))
      val corr = lit(1.0) - col("tsum").cast("double") /
        (nD * nD * nD - nD)
      val h = h0 / corr
      agg1.select(col("nn").as("n"), col("k"),
        when(corr > 0.0, round(h, 6)).as("h_stat"),
        (col("k") - lit(1L)).as("df"),
        when(corr > 0.0,
          round(exp(-h / lit(2.0)) * (lit(1.0) + h / lit(2.0)), 6))
          .as("p_value"))
    }),

    // -- Cochran-Mantel-Haenszel (stratified 2x2 association) --------------
    // The confounder-safe version of a pooled 2x2: does the
    // AUTOMOBILE/BUILDING segment pair have different urgent-order odds,
    // CONTROLLING for nation? 25 per-stratum 2x2 tables; per-stratum
    // hypergeometric E and V nano-quantize on the 25-row frame (the
    // q_logrank term discipline); the CMH chi-square (no continuity
    // correction) and the Mantel-Haenszel common odds ratio each
    // evaluate in one mirrored expression.
    "q_cmh" -> ((s, d) => {
      val oc = Tables.orders(s, d)
        .select(col("o_custkey"),
          col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            .cast("int").cast("long").as("u"))
        .join(Tables.customer(s, d).select(
          col("c_custkey").as("o_custkey"),
          col("c_nationkey").cast("long").as("nk"),
          col("c_mktsegment").isin("AUTOMOBILE", "BUILDING")
            .cast("int").cast("long").as("g")), "o_custkey")
      val cells = oc.groupBy(col("nk"))
        .agg(count(lit(1)).as("n"),
          sum(col("g") * col("u")).as("a"),
          sum(col("g") * (lit(1L) - col("u"))).as("b"),
          sum((lit(1L) - col("g")) * col("u")).as("c"),
          sum((lit(1L) - col("g")) * (lit(1L) - col("u"))).as("dd"))
        .filter(col("n") > 1L)
      val nD = col("n").cast("double")
      val r1 = (col("a") + col("b")).cast("double")
      val r0 = (col("c") + col("dd")).cast("double")
      val c1 = (col("a") + col("c")).cast("double")
      val c0 = (col("b") + col("dd")).cast("double")
      val terms = cells
        .withColumn("eq", floor(r1 * c1 / nD * lit(1e9) + lit(0.5))
          .cast("long"))
        .withColumn("vq", floor(r1 * r0 * c1 * c0 /
          (nD * nD * (nD - lit(1.0))) * lit(1e9) + lit(0.5))
          .cast("long"))
        .withColumn("adq", floor(col("a").cast("double") *
          col("dd").cast("double") / nD * lit(1e6) + lit(0.5))
          .cast("long"))
        .withColumn("bcq", floor(col("b").cast("double") *
          col("c").cast("double") / nD * lit(1e6) + lit(0.5))
          .cast("long"))
      val m = terms.agg(count(lit(1)).as("n_strata"),
        sum(col("a")).as("sa"), sum(col("eq")).as("se"),
        sum(col("vq")).as("sv"), sum(col("adq")).as("sad"),
        sum(col("bcq")).as("sbc"))
      val diff = col("sa").cast("double") -
        col("se").cast("double") / lit(1e9)
      m.select(col("n_strata"), col("sa").as("sum_a"),
        round(col("se").cast("double") / lit(1e9), 6).as("sum_e"),
        when(col("sv") > 0L, round(diff * diff /
          (col("sv").cast("double") / lit(1e9)), 6)).as("cmh_chi2"),
        when(col("sbc") > 0L, round(col("sad").cast("double") /
          col("sbc").cast("double"), 6)).as("or_mh"))
    }),

    // -- Weibull fit of the conversion-time distribution -------------------
    // The parametric summary on top of q_kaplan_meier: ln(−ln S) vs
    // ln t is LINEAR iff survival is Weibull, and the fit's slope IS
    // the shape (k < 1 = early-bias, > 1 = wear-in). The KM estimate's
    // −ln S is already an exact nano-integer (the log prefix sum), so
    // y = ln(−cuml/10⁹) is a pure function of integers; both axes
    // micro-quantize on the bounded day frame and OLS folds exact
    // integers (the q_heaps_law discipline). λ reports as exp(−a/k).
    "q_weibull_fit" -> ((s, d) => {
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
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
      val wAsc = Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val lt = byT.withColumn("n_risk",
        sum(col("d_events") + col("c_censored")).over(wDesc))
      val nD = col("n_risk").cast("double")
      val dD = col("d_events").cast("double")
      val pts = lt
        .withColumn("lq", when(col("d_events") < col("n_risk"),
          floor(log((nD - dD) / nD) * lit(1e9) + lit(0.5)).cast("long"))
          .otherwise(lit(0L)))
        .withColumn("zf",
          when(col("d_events") === col("n_risk"), 1L).otherwise(0L))
        .withColumn("cuml", sum(col("lq")).over(wAsc))
        .withColumn("zeroed", sum(col("zf")).over(wAsc))
        .filter(col("t") >= 1L && col("cuml") < 0L &&
          col("zeroed") === 0L)
        .select(
          floor(log(col("t").cast("double")) * lit(1e6) + lit(0.5))
            .cast("long").as("xq"),
          floor(log(-col("cuml").cast("double") / lit(1e9)) * lit(1e6) +
            lit(0.5)).cast("long").as("yq"))
      val fit = pts.agg(count(lit(1)).as("np"),
        sum(dec(col("xq"))).as("sx"), sum(dec(col("yq"))).as("sy"),
        sum(dec(col("xq")) * dec(col("xq"))).as("sxx"),
        sum(dec(col("xq")) * dec(col("yq"))).as("sxy"))
      val npD = col("np").cast("double")
      val num = npD * col("sxy").cast("double") -
        col("sx").cast("double") * col("sy").cast("double")
      val den = npD * col("sxx").cast("double") -
        col("sx").cast("double") * col("sx").cast("double")
      val shape = num / den
      val icpt = (col("sy").cast("double") - shape *
        col("sx").cast("double")) / npD / lit(1e6)
      fit.select(col("np").as("n_points"),
        when(den =!= 0.0, round(shape, 6)).as("shape"),
        when(den =!= 0.0, round(exp(-icpt / shape), 6)).as("scale_days"))
    }),

    // -- Friedman test (repeated-measures ranks: types ranked within days) -
    // The blocked counterpart of q_kruskal_wallis: each DAY ranks the 5
    // event types by volume, removing day-level level shifts the way
    // q_paired_ttest removes user-level ones; the statistic asks
    // whether any type systematically outranks the others across the 30
    // blocks. Midranks (doubled, exact integers) come from a per-day
    // window over the k-row frame; rank sums fold per type in DECIMAL
    // and the R² terms in SORTED type order; df = k−1 = 4 keeps the
    // closed-form even-df p-value.
    "q_friedman" -> ((s, d) => {
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val byTD0 = Tables.events(s, d)
        .groupBy(datediff(to_date(col("ts")),
          lit("1970-01-01").cast("date")).cast("long").as("dd"),
          col("event_type"))
        .agg(count(lit(1)).as("c"))
      // Densify the (day × type) frame with zero-count cells BEFORE
      // ranking (the q_logrank/q_bh_fdr discipline): ranks are per-day
      // over whatever types are present, but the statistic divides by
      // the GLOBAL k and max(nb) — a single missing cell would silently
      // bias chi2 instead of ranking the absent type last with c = 0.
      // The type dimension is domain-bounded (k = 5), so it broadcasts.
      val byTD = byTD0.select(col("dd")).distinct()
        .crossJoin(broadcast(byTD0.select(col("event_type")).distinct()))
        .join(byTD0, Seq("dd", "event_type"), "left")
        .select(col("dd"), col("event_type"),
          coalesce(col("c"), lit(0L)).as("c"))
      val wcnt = Window.partitionBy(col("dd"), col("c"))
      // midrank within day: r2 = 2·(#strictly below) + (#tied) + 1
      val ranked = byTD
        .withColumn("cumle", count(lit(1)).over(
          Window.partitionBy(col("dd")).orderBy(col("c"))
            .rangeBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("tied", count(lit(1)).over(wcnt))
        .withColumn("r2",
          lit(2L) * (col("cumle") - col("tied")) + col("tied") + lit(1L))
      val byJ = ranked.groupBy(col("event_type"))
        .agg(count(lit(1)).as("nb"), sum(dec(col("r2"))).as("sr2"))
        .withColumn("term",
          (col("sr2").cast("double") / lit(2.0)) *
            (col("sr2").cast("double") / lit(2.0)))
      val agg1 = byJ.agg(max(col("nb")).as("nb"), count(lit(1)).as("k"),
        sort_array(collect_list(struct(col("event_type"), col("term"))))
          .as("gs"))
        .withColumn("sumr2", expr(
          "aggregate(gs, cast(0.0 as double), (a, s) -> a + s.term)"))
      val nD = col("nb").cast("double"); val kD = col("k").cast("double")
      val chi = lit(12.0) / (nD * kD * (kD + lit(1.0))) * col("sumr2") -
        lit(3.0) * nD * (kD + lit(1.0))
      agg1.select(col("nb").as("n_blocks"), col("k"),
        round(chi, 6).as("chi2"),
        (col("k") - lit(1L)).as("df"),
        round(exp(-chi / lit(2.0)) * (lit(1.0) + chi / lit(2.0)), 6)
          .as("p_value"))
    }),

    // -- McNemar test (paired disagreement between two labelers) -----------
    // The inference companion of q_cohens_kappa on the SAME confusion
    // cells: do the classifier gate and the length gate disagree
    // SYMMETRICALLY, or does one systematically fire where the other
    // doesn't? Only the discordant cells matter — χ² = (b−c)²/(b+c) —
    // which is what makes it the right test for comparing two quality
    // filters on the same corpus. Exact integer cells; one mirrored
    // expression.
    "q_mcnemar" -> ((s, d) => {
      val sc = TextDedup.classifierScored(Tables.documents(s, d),
          Seq(col("doc_id"), col("n_chars")))
        .select((col("score") > 0L).cast("int").cast("long").as("a"),
          (col("n_chars") >= 300L).cast("int").cast("long").as("b"))
      val m = sc.agg(count(lit(1)).as("n"),
        sum(col("a") * (lit(1L) - col("b"))).as("n10"),
        sum((lit(1L) - col("a")) * col("b")).as("n01"))
      val bD = col("n10").cast("double"); val cD = col("n01").cast("double")
      m.select(col("n"), col("n10"), col("n01"),
        when(col("n10") + col("n01") > 0L,
          round((bD - cD) * (bD - cD) / (bD + cD), 6)).as("chi2"))
    }),

    // -- Cramér's V (categorical association strength) ----------------------
    // The effect-size companion the χ² family lacks: how STRONGLY are
    // order status and priority associated, on a [0,1] scale comparable
    // across tables? V = √(χ²/(n·(min(r,c)−1))) over the full r×c
    // contingency grid. The grid is DENSIFIED from the margin cross
    // product (the q_friedman convention: χ² charges e_ij for empty
    // cells too — a cells-only sum understates). Exact integer cells and
    // margins; each cell's (n_ij−e_ij)²/e_ij quantizes to integer
    // micro-units on the BOUNDED grid (r·c ≤ 15 here) and sums exactly;
    // V is one mirrored double expression. Data-sized work: one
    // two-column groupBy.
    "q_cramers_v" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .select(col("o_orderstatus").as("rr"),
          col("o_orderpriority").as("cc"))
      val cells = o.groupBy(col("rr"), col("cc"))
        .agg(count(lit(1)).as("nij"))
      val rm = cells.groupBy(col("rr")).agg(sum(col("nij")).as("ri"))
      val cm = cells.groupBy(col("cc")).agg(sum(col("nij")).as("cj"))
      val tot = cells.agg(sum(col("nij")).as("n"),
        countDistinct(col("rr")).as("r"),
        countDistinct(col("cc")).as("c"))
      val grid = rm.crossJoin(cm)
        .join(cells, Seq("rr", "cc"), "left")
        .withColumn("nij", coalesce(col("nij"), lit(0L)))
        .crossJoin(broadcast(tot))
      val eij = col("ri").cast("double") * col("cj") / col("n")
      grid
        .withColumn("t_u", floor((col("nij") - eij) * (col("nij") - eij) /
          eij * lit(1e6) + lit(0.5)).cast("long"))
        .groupBy(col("n"), col("r"), col("c"))
        .agg(sum(col("t_u")).as("chi_u"))
        .select(col("n"), col("r"), col("c"),
          (col("chi_u").cast("double") / lit(1e6)).as("chi2"),
          (floor(sqrt(col("chi_u").cast("double") / lit(1e6) /
            (col("n").cast("double") *
              (least(col("r"), col("c")) - lit(1L)).cast("double"))) *
            lit(1e6) + lit(0.5)) / lit(1e6)).as("cramers_v"))
    }),

    // -- χ² goodness-of-fit (priority mix vs the uniform null) -------------
    // The one-sample categorical test: does the order-priority mix
    // deviate from uniform? Per-category (o−e)²/e terms quantize to
    // integer micro-units on the k-row category frame and sum exactly;
    // df = k−1. The corpus contract pins k = 5 priorities, so df = 4 is
    // EVEN and the χ² p-value is closed form p = e^(−x/2)·(1 + x/2)
    // (the q_friedman/q_kruskal_wallis device) — guarded on k, NULL if a
    // future corpus changes the category count. Data-sized work: one
    // single-column groupBy.
    "q_chisq_gof" -> ((s, d) => {
      val cells = Tables.orders(s, d)
        .groupBy(col("o_orderpriority").as("cat"))
        .agg(count(lit(1)).as("o"))
      val tot = cells.agg(sum(col("o")).as("n"), count(lit(1)).as("k"))
      val e = col("n").cast("double") / col("k").cast("double")
      val agg1 = cells.crossJoin(broadcast(tot))
        .withColumn("t_u", floor((col("o") - e) * (col("o") - e) / e *
          lit(1e6) + lit(0.5)).cast("long"))
        .groupBy(col("n"), col("k"))
        .agg(sum(col("t_u")).as("chi_u"))
      val chi = col("chi_u").cast("double") / lit(1e6)
      agg1.select(col("n"), col("k"),
        chi.as("chi2"),
        (col("k") - lit(1L)).as("df"),
        when(col("k") === 5L,
          floor(exp(-chi / lit(2.0)) * (lit(1.0) + chi / lit(2.0)) *
            lit(1e6) + lit(0.5)) / lit(1e6)).as("p_value"))
    }),

    // -- paired sign test (early vs late per-user value) --------------------
    // The assumption-free paired companion of q_mann_whitney: for each
    // user active in BOTH halves of the window, the sign of the
    // (late − early) mean-value change; under H₀ signs are fair coins.
    // The per-user delta is the exact integer micro-quantized
    // mean-difference (the diff-in-means device); zeros drop by the
    // textbook rule; z = (n_pos − n_neg)/√(n_pos + n_neg) is one
    // mirrored expression. Data-sized work: one user-keyed aggregate.
    "q_sign_test" -> ((s, d) => {
      val e0 = Tables.eventsWithTime(s, d)
        .select(col("user_id"), expr("ts_us div 86400000000").as("dd"),
          floor(col("value") * lit(1000.0) + lit(0.5)).cast("long")
            .as("vq"))
      val mid = e0.agg(expr("(min(dd) + max(dd)) div 2").as("mid"))
      val u = e0.crossJoin(broadcast(mid))
        .withColumn("h1", (col("dd") <= col("mid")).cast("int")
          .cast("long"))
        .groupBy(col("user_id"))
        .agg(sum(col("h1")).as("n1"),
          sum(col("h1") * col("vq")).as("sv1"),
          sum(lit(1L) - col("h1")).as("n2"),
          sum((lit(1L) - col("h1")) * col("vq")).as("sv2"))
        .filter(col("n1") > 0L && col("n2") > 0L)
        .withColumn("dq", floor(
          (col("sv2").cast("double") / col("n2").cast("double") -
            col("sv1").cast("double") / col("n1").cast("double")) /
            lit(1000.0) * lit(1e6) + lit(0.5)).cast("long"))
      val m = u.agg(
        sum(when(col("dq") > 0L, 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("dq") < 0L, 1L).otherwise(0L)).as("n_neg"))
      val pD = col("n_pos").cast("double")
      val nD = col("n_neg").cast("double")
      m.select(col("n_pos"), col("n_neg"),
        when(col("n_pos") + col("n_neg") > 0L,
          floor((pD - nD) / sqrt(pD + nD) * lit(1e6) + lit(0.5)) /
            lit(1e6)).as("z"))
    }),

    // -- two-sample Poisson rate test (purchase vs click intensity) --------
    // Are purchases and clicks arriving at different daily rates? With
    // equal exposure (the same day window), the conditional test's
    // normal approximation is z = (k₁ − k₂)/√(k₁ + k₂) — exact integer
    // counts, one mirrored expression. Rates report as exact integer
    // micro-units per day ((k·10⁶) div days). Data-sized work: one
    // filtered scan.
    "q_poisson_rate_test" -> ((s, d) => {
      val e0 = Tables.eventsWithTime(s, d)
        .filter(col("event_type").isin("purchase", "click"))
        .select(col("event_type"), expr("ts_us div 86400000000").as("dd"))
      val m = e0.agg(
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("k1"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("k2"),
        (max(col("dd")) - min(col("dd")) + lit(1L)).as("days"))
      val k1D = col("k1").cast("double"); val k2D = col("k2").cast("double")
      m.select(col("k1"), col("k2"), col("days"),
        (expr("(k1 * 1000000) div days").cast("double") / lit(1e6))
          .as("rate1"),
        (expr("(k2 * 1000000) div days").cast("double") / lit(1e6))
          .as("rate2"),
        when(col("k1") + col("k2") > 0L,
          floor((k1D - k2D) / sqrt(k1D + k2D) * lit(1e6) + lit(0.5)) /
            lit(1e6)).as("z"))
    }),

    // -- Cronbach's alpha (internal consistency of the metric panel) -------
    // Do the 5 per-type daily volumes move together enough to justify a
    // single "site activity" composite? α = k/(k−1)·(1 − Σvarⱼ/var_tot)
    // over the 30-day panel — the reliability readout before anyone
    // ships a summed index. Exact integer count moments per item and
    // for the day totals; per-item variance terms micro-quantize on the
    // k-row frame and sum exactly; α evaluates in one mirrored
    // expression. Everything after the (type, day) aggregate is
    // calendar-bounded.
    "q_cronbach_alpha" -> ((s, d) => {
      val byTD0 = Tables.events(s, d)
        .groupBy(col("event_type"),
          datediff(to_date(col("ts")),
            lit("1970-01-01").cast("date")).cast("long").as("dd"))
        .agg(count(lit(1)).as("c"))
      // Same densification as q_friedman: every item must carry the
      // full day panel (zero-count days included) or per-item variances
      // and the day totals are computed over DIFFERENT n's and alpha
      // silently biases on a single missing (type, day) cell.
      val byTD = byTD0.select(col("dd")).distinct()
        .crossJoin(broadcast(byTD0.select(col("event_type")).distinct()))
        .join(byTD0, Seq("dd", "event_type"), "left")
        .select(col("event_type"), col("dd"),
          coalesce(col("c"), lit(0L)).as("c"))
      val perItem = byTD.groupBy(col("event_type"))
        .agg(count(lit(1)).as("nd"), sum(col("c")).as("s1"),
          sum(col("c") * col("c")).as("s2"))
      val ndD = col("nd").cast("double")
      val vj = (col("s2").cast("double") - col("s1").cast("double") *
        col("s1").cast("double") / ndD) / (ndD - lit(1.0))
      val items = perItem
        .withColumn("vq", floor(vj * lit(1e6) + lit(0.5)).cast("long"))
        .agg(count(lit(1)).as("k"), max(col("nd")).as("n_days"),
          sum(col("vq")).as("svq"))
      val totals = byTD.groupBy(col("dd")).agg(sum(col("c")).as("tot"))
        .agg(count(lit(1)).as("ndt"), sum(col("tot")).as("t1"),
          sum(col("tot") * col("tot")).as("t2"))
      val ndtD = col("ndt").cast("double")
      val vtot = (col("t2").cast("double") - col("t1").cast("double") *
        col("t1").cast("double") / ndtD) / (ndtD - lit(1.0))
      val kD = col("k").cast("double")
      items.crossJoin(broadcast(totals))
        .select(col("k"), col("n_days"),
          round(vtot, 6).as("var_total"),
          round(col("svq").cast("double") / lit(1e6), 6)
            .as("sum_item_var"),
          when(col("k") > 1L && vtot > 0.0, round(
            kD / (kD - lit(1.0)) * (lit(1.0) -
              (col("svq").cast("double") / lit(1e6)) / vtot), 6))
            .as("alpha"))
    }),

    // -- partial correlation (controlling for total volume) ----------------
    // The confound check q_corr_matrix invites: purchase and view daily
    // volumes correlate — but is that a real relationship or just both
    // riding total site traffic? r_xy·z partials out the day's total
    // volume; a raw correlation that collapses when controlled is the
    // classic spurious-common-cause signature. All three pairwise r's
    // derive from exact DECIMAL co-moments on the calendar-bounded
    // (day × series) frame; the partial evaluates in one mirrored
    // expression.
    "q_partial_corr" -> ((s, d) => {
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val byDay = Tables.events(s, d)
        .groupBy(datediff(to_date(col("ts")),
          lit("1970-01-01").cast("date")).cast("long").as("dd"))
        .agg(sum(when(col("event_type") === "purchase", 1L)
          .otherwise(0L)).as("x"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .as("y"),
          count(lit(1)).as("z"))
      val m = byDay.agg(count(lit(1)).as("n"),
        sum(dec(col("x"))).as("sx"), sum(dec(col("y"))).as("sy"),
        sum(dec(col("z"))).as("sz"),
        sum(dec(col("x")) * dec(col("x"))).as("sxx"),
        sum(dec(col("y")) * dec(col("y"))).as("syy"),
        sum(dec(col("z")) * dec(col("z"))).as("szz"),
        sum(dec(col("x")) * dec(col("y"))).as("sxy"),
        sum(dec(col("x")) * dec(col("z"))).as("sxz"),
        sum(dec(col("y")) * dec(col("z"))).as("syz"))
      val nD = col("n").cast("double")
      def cv(sab: String, sa: String, sb: String) =
        nD * col(sab).cast("double") -
          col(sa).cast("double") * col(sb).cast("double")
      val rxy = cv("sxy", "sx", "sy") /
        sqrt(cv("sxx", "sx", "sx") * cv("syy", "sy", "sy"))
      val rxz = cv("sxz", "sx", "sz") /
        sqrt(cv("sxx", "sx", "sx") * cv("szz", "sz", "sz"))
      val ryz = cv("syz", "sy", "sz") /
        sqrt(cv("syy", "sy", "sy") * cv("szz", "sz", "sz"))
      val part = (rxy - rxz * ryz) /
        sqrt((lit(1.0) - rxz * rxz) * (lit(1.0) - ryz * ryz))
      m.select(col("n").as("n_days"),
        round(rxy, 6).as("r_xy"),
        round(rxz, 6).as("r_xz"),
        round(ryz, 6).as("r_yz"),
        when(rxz * rxz < 1.0 && ryz * ryz < 1.0, round(part, 6))
          .as("r_xy_given_z"))
    }),

    // -- Granger causality screen (lag-1, F-test) --------------------------
    // Does yesterday's VIEW volume predict today's PURCHASE volume
    // beyond purchase's own history? The restricted model regresses
    // y_t on y_{t−1}; the unrestricted adds x_{t−1}; F compares the
    // residual sums. Both fits are CLOSED-FORM two-predictor normal
    // equations over centered co-moments, which derive from exact
    // DECIMAL sums on the lagged calendar-bounded frame — one mirrored
    // expression chain, no iterative solver. (A screen, not proof:
    // Granger precedence, not causation.)
    "q_granger" -> ((s, d) => {
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val byDay = Tables.events(s, d)
        .groupBy(datediff(to_date(col("ts")),
          lit("1970-01-01").cast("date")).cast("long").as("dd"))
        .agg(sum(when(col("event_type") === "purchase", 1L)
          .otherwise(0L)).as("p"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .as("v"))
      val wd = Window.orderBy(col("dd"))
      val lagged = byDay
        .withColumn("y", col("p"))
        .withColumn("x1", lag(col("p"), 1).over(wd))
        .withColumn("x2", lag(col("v"), 1).over(wd))
        .filter(col("x1").isNotNull)
      val m = lagged.agg(count(lit(1)).as("n"),
        sum(dec(col("y"))).as("sy"), sum(dec(col("x1"))).as("s1"),
        sum(dec(col("x2"))).as("s2"),
        sum(dec(col("y")) * dec(col("y"))).as("syy"),
        sum(dec(col("x1")) * dec(col("x1"))).as("s11"),
        sum(dec(col("x2")) * dec(col("x2"))).as("s22"),
        sum(dec(col("x1")) * dec(col("y"))).as("s1y"),
        sum(dec(col("x2")) * dec(col("y"))).as("s2y"),
        sum(dec(col("x1")) * dec(col("x2"))).as("s12"))
      val nD = col("n").cast("double")
      def cc(sab: String, sa: String, sb: String) =
        (col(sab).cast("double") - col(sa).cast("double") *
          col(sb).cast("double") / nD)
      val c11 = cc("s11", "s1", "s1"); val c22 = cc("s22", "s2", "s2")
      val c12 = cc("s12", "s1", "s2"); val c1y = cc("s1y", "s1", "sy")
      val c2y = cc("s2y", "s2", "sy"); val cyy = cc("syy", "sy", "sy")
      val det = c11 * c22 - c12 * c12
      val b1 = (c1y * c22 - c2y * c12) / det
      val b2 = (c2y * c11 - c1y * c12) / det
      val rssU = cyy - b1 * c1y - b2 * c2y
      val rssR = cyy - c1y * c1y / c11
      val f = (rssR - rssU) / (rssU / (nD - lit(3.0)))
      m.select(col("n").as("n_obs"),
        when(det =!= 0.0, round(b2, 6)).as("coef_xlag"),
        when(det =!= 0.0 && rssU > 0.0, round(f, 6)).as("f_stat"))
    }),

    // -- Mann-Kendall trend test -------------------------------------------
    // The significance test q_theilsen's slope should be read with: is
    // the monotone trend in daily volume real? S sums the signs of all
    // day-pair differences (exact integers on the days²/2 bounded pair
    // frame — the q_theilsen shape), the variance takes the standard
    // tie correction from the tied-value groups, and z applies the
    // continuity correction. Everything after the day aggregate is
    // calendar-bounded.
    "q_mann_kendall" -> ((s, d) => {
      val byDay = Tables.events(s, d)
        .groupBy(datediff(to_date(col("ts")),
          lit("1970-01-01").cast("date")).cast("long").as("dd"))
        .agg(count(lit(1)).as("y"))
      val pairs = byDay.select(col("dd").as("d1"), col("y").as("y1"))
        .join(byDay.select(col("dd").as("d2"), col("y").as("y2")),
          col("d1") < col("d2"))
        .select(signum(col("y2").cast("double") -
          col("y1").cast("double")).cast("long").as("sg"))
      val sAgg = pairs.agg(sum(col("sg")).as("s"))
      val nAgg = byDay.agg(count(lit(1)).as("n"))
      val ties = byDay.groupBy(col("y")).agg(count(lit(1)).as("t"))
        .agg(sum(col("t") * (col("t") - lit(1L)) *
          (lit(2L) * col("t") + lit(5L))).as("tcorr"))
      val nD = col("n").cast("double")
      val varS = (nD * (nD - lit(1.0)) * (lit(2.0) * nD + lit(5.0)) -
        col("tcorr").cast("double")) / lit(18.0)
      val sD = col("s").cast("double")
      val z = (sD - signum(sD)) / sqrt(varS)
      sAgg.crossJoin(broadcast(nAgg)).crossJoin(broadcast(ties))
        .select(col("n").as("n_days"), col("s"),
          when(varS > 0.0, round(z, 6)).as("z"),
          when(sD > 0.0, "increasing").when(sD < 0.0, "decreasing")
            .otherwise("none").as("trend"))
    }),

    // -- Pettitt changepoint test ------------------------------------------
    // The nonparametric counterpart of q_changepoint: the split t* that
    // maximizes |U_t| = |Σ_{i≤t<j} sgn(x_j − x_i)| — a rank-based break
    // detector immune to outliers, with the classical closed-form
    // approximate p = 2·e^(−6K²/(n³+n²)). The (pair × split) expansion
    // is bounded at days³/2 by the calendar; signs are exact integers
    // and the argmax takes the earliest day on ties.
    "q_pettitt" -> ((s, d) => {
      val byDay = Tables.events(s, d)
        .groupBy(datediff(to_date(col("ts")),
          lit("1970-01-01").cast("date")).cast("long").as("dd"))
        .agg(count(lit(1)).as("y"))
      val idx = byDay.withColumn("t",
        row_number().over(Window.orderBy(col("dd"))).cast("long"))
      val pairs = idx.select(col("t").as("i"), col("y").as("y1"))
        .join(idx.select(col("t").as("j"), col("y").as("y2")),
          col("i") < col("j"))
        .select(col("i"), col("j"),
          signum(col("y2").cast("double") - col("y1").cast("double"))
            .cast("long").as("sg"))
      val splits = idx.select(col("t").as("sp")).filter(col("sp") <
        idx.agg(max(col("t"))).head().getLong(0))
      val ut = pairs.join(broadcast(splits),
          col("i") <= col("sp") && col("j") > col("sp"))
        .groupBy(col("sp")).agg(sum(col("sg")).as("u"))
      val n = idx.agg(count(lit(1)).as("n"))
      val best = ut
        .withColumn("rnk", row_number().over(
          Window.orderBy(abs(col("u")).desc, col("sp"))))
        .filter(col("rnk") === 1)
        .join(idx.select(col("t").as("sp"), col("dd").as("break_day")),
          "sp")
      val nD = col("n").cast("double")
      val k = abs(col("u")).cast("double")
      best.crossJoin(broadcast(n))
        .select(col("n").as("n_days"), col("break_day"),
          col("u").as("u_stat"),
          round(least(lit(1.0), lit(2.0) * exp(lit(-6.0) * k * k /
            (nD * nD * nD + nD * nD))), 6).as("p_approx"))
    }),

    // -- KS separation of the quality classifier ---------------------------
    // The scorecard-world companion of q_auc_roc: the maximum gap
    // between the positive and negative score CDFs, and the score
    // where it happens — the classical cut-point selection readout.
    // The argmax is decided on CROSS-MULTIPLIED exact integers
    // (cum1·n0 vs cum0·n1 — the q_drift_ks discipline, no float CDFs
    // can disagree), on the domain-bounded distinct-score frame; the
    // earliest score wins ties.
    "q_ks_separation" -> ((s, d) => {
      val sc = TextDedup.classifierScored(Tables.documents(s, d),
          Seq(col("doc_id"), col("n_chars")))
        .select(col("score").cast("long").as("sv"),
          (col("n_chars") >= 300L).cast("int").cast("long").as("pos"))
      val byS = sc.groupBy(col("sv"))
        .agg(sum(col("pos")).as("c1"),
          sum(lit(1L) - col("pos")).as("c0"))
      // NDV-dispatched CDFs (RankStats, q_mann_whitney class): both
      // class CDFs ride ONE dispatcher pass over the DISTINCT-SCORE
      // frame — Limit-bounded window below the NDV ceiling,
      // Dist.globalPrefixSums above it (shared sample/offsets for the
      // two weight columns).
      val tot = byS.agg(sum(col("c1")).as("n1"), sum(col("c0")).as("n0"))
      val cum = RankStats.cumulative(byS, "sv",
          Seq("c1", "c0"), Seq("f1", "f0"))
        .crossJoin(broadcast(tot))
        // DECIMAL(38,0) cross-products (HUGEINT in the oracle): the
        // gap approaches n1·n0, so 10⁶·gap exits int64 once
        // n1·n0 > 9.2e12 (~3e6 docs per class) and the raw products
        // themselves at ~3e9 per class — sibling queries document the
        // same ceiling; here we widen instead. ks_u ≤ 10⁶, so the
        // final BIGINT cast is exact.
        .withColumn("gap",
          abs(col("f1").cast("decimal(38,0)") * col("n0") -
            col("f0").cast("decimal(38,0)") * col("n1")))
      // argmax via TakeOrdered (orderBy+limit(1) fuses into
      // TakeOrderedAndProject — distributed top-1, no global window)
      val best = cum.orderBy(col("gap").desc, col("sv")).limit(1)
      best.select(col("n1").as("n_pos"), col("n0").as("n_neg"),
        col("sv").as("ks_score"),
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * gap) div " +
          "(CAST(n1 AS DECIMAL(38,0)) * n0) AS BIGINT)").as("ks_u"))
    }),

    // -- Jarque–Bera normality test of the daily count series --------------
    // The distribution-shape gate a monitoring pipeline runs before
    // trusting z-score alarms: skewness/kurtosis of each type's daily
    // volumes from EXACT integer raw moments (Σy..Σy⁴ in DECIMAL(38,0) —
    // y⁴ outgrows int64 once daily volume passes ~55k, i.e. well inside
    // sf1), then one fixed double expression both engines evaluate
    // identically. Scale shape: one (type, day) aggregate, then a
    // k-row moment aggregate — the day frame is calendar-bounded.
    "q_jarque_bera" -> ((s, d) => {
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val byd = Tables.events(s, d)
        .groupBy(col("event_type"),
          datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
            .cast("long").as("dd"))
        .agg(count(lit(1)).as("y"))
      val m = byd.groupBy(col("event_type")).agg(
        count(lit(1)).as("n"),
        sum(dec(col("y"))).as("s1"),
        sum(dec(col("y")) * dec(col("y"))).as("s2"),
        sum(dec(col("y")) * dec(col("y")) * dec(col("y"))).as("s3"),
        sum(dec(col("y")) * dec(col("y")) * dec(col("y")) * dec(col("y")))
          .as("s4"))
      val nD = col("n").cast("double")
      val mu = col("s1").cast("double") / nD
      val r2 = col("s2").cast("double") / nD
      val r3 = col("s3").cast("double") / nD
      val r4 = col("s4").cast("double") / nD
      val m2 = r2 - mu * mu
      val m3 = r3 - lit(3.0) * mu * r2 + lit(2.0) * mu * mu * mu
      val m4 = r4 - lit(4.0) * mu * r3 + lit(6.0) * mu * mu * r2 -
        lit(3.0) * mu * mu * mu * mu
      val sk = m3 / (sqrt(m2) * m2)
      val ku = m4 / (m2 * m2)
      val jb = nD / lit(6.0) *
        (sk * sk + (ku - lit(3.0)) * (ku - lit(3.0)) / lit(4.0))
      def q6(c: org.apache.spark.sql.Column) =
        floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
      m.select(col("event_type"), col("n").as("n_days"),
          when(m2 > 0.0, q6(sk)).as("skew"),
          when(m2 > 0.0, q6(ku)).as("kurtosis"),
          when(m2 > 0.0, q6(jb)).as("jb"))
        .orderBy(col("event_type"))
    }),

    // -- Grubbs outlier statistic over the daily series --------------------
    // Single-most-extreme-day test: G = max|y−ȳ|/s. The argmax is decided
    // on EXACT integers (|n·y − Σy| — the deviation scaled by n, sign-free
    // and overflow-safe in DECIMAL), so no float ever picks the day;
    // G itself is then one fixed double expression. The day frame is
    // calendar-bounded, so the rank window is a bounded-frame sort by
    // contract (same policy as q_mann_kendall / q_pettitt).
    "q_grubbs" -> ((s, d) => {
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val byd = Tables.events(s, d)
        .groupBy(datediff(to_date(col("ts")),
          lit("1970-01-01").cast("date")).cast("long").as("dd"))
        .agg(count(lit(1)).as("y"))
      val m = byd.agg(count(lit(1)).as("n"), sum(dec(col("y"))).as("s1"),
        sum(dec(col("y")) * dec(col("y"))).as("s2"))
      val top = byd.crossJoin(broadcast(m))
        .withColumn("adev", abs(dec(col("y")) * dec(col("n")) - col("s1")))
        .withColumn("rnk", row_number().over(
          Window.orderBy(col("adev").desc, col("dd"))))
        .filter(col("rnk") === 1)
      val nD = col("n").cast("double")
      val mu = col("s1").cast("double") / nD
      val vr = (col("s2").cast("double") -
        col("s1").cast("double") * col("s1").cast("double") / nD) /
        (nD - lit(1.0))
      def q6(c: org.apache.spark.sql.Column) =
        floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
      top.select(col("n").as("n_days"), col("dd").as("outlier_dd"),
        col("y").as("outlier_y"), q6(mu).as("mean"),
        when(vr > 0.0, q6(sqrt(vr))).as("sd"),
        when(vr > 0.0, q6(abs(col("y").cast("double") - mu) / sqrt(vr)))
          .as("g"))
    }),

    // -- Kendall rank correlation (tau-b) between two daily metrics --------
    // Concordance of daily click volume vs daily purchase volume. All
    // pair classification happens on exact integer signs over the
    // calendar-bounded days²/2 pair frame (the q_theilsen/q_mann_kendall
    // band); tau-b's tie correction uses exact pair counts and only the
    // final ratio is floating point.
    "q_kendall_tau" -> ((s, d) => {
      val byd = Tables.events(s, d)
        .groupBy(datediff(to_date(col("ts")),
          lit("1970-01-01").cast("date")).cast("long").as("dd"))
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .as("x"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("y"))
      val pr = byd.select(col("dd").as("d1"), col("x").as("x1"),
          col("y").as("y1"))
        .join(byd.select(col("dd").as("d2"), col("x").as("x2"),
          col("y").as("y2")), col("d1") < col("d2"))
        .select((signum(col("x2").cast("double") - col("x1")) *
            signum(col("y2").cast("double") - col("y1")))
            .cast("long").as("cd"),
          when(col("x1") === col("x2"), 1L).otherwise(0L).as("tx"),
          when(col("y1") === col("y2"), 1L).otherwise(0L).as("ty"))
      val agg = pr.agg(
        sum(when(col("cd") === 1L, 1L).otherwise(0L)).as("c"),
        sum(when(col("cd") === -1L, 1L).otherwise(0L)).as("dis"),
        sum(col("tx")).as("n1"), sum(col("ty")).as("n2"),
        count(lit(1)).as("n0"))
      val den = sqrt((col("n0") - col("n1")).cast("double") *
        (col("n0") - col("n2")).cast("double"))
      agg.select(col("n0").as("n_pairs"), col("c").as("concordant"),
        col("dis").as("discordant"),
        when(den > 0.0,
          floor((col("c") - col("dis")).cast("double") / den * lit(1e6) +
            lit(0.5)) / lit(1e6)).as("tau_b"))
    }),

    // -- Cohen's d / Hedges' g effect size between A/B arms ----------------
    // The "is it big, not just significant" companion to q_ab_test: same
    // arm derivation (user_id parity), same ONE-scan conditional moment
    // aggregate; pooled-SD standardized difference from exact micro-unit
    // integer sums — the micro scale cancels in the ratio, so no unit
    // correction appears anywhere.
    "q_cohens_d" -> ((s, d) => {
      val e = Tables.events(s, d)
        .select(col("event_type"), pmod(col("user_id"), lit(2)).as("arm"),
          floor(col("value") * lit(1000.0) + lit(0.5)).cast("long")
            .as("vq"))
      def arm(a: Int, e0: org.apache.spark.sql.Column) =
        when(col("arm") === a, e0)
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val m = e.groupBy(col("event_type")).agg(
        count(arm(0, lit(1))).as("n_a"),
        sum(arm(0, dec(col("vq")))).as("s_a"),
        sum(arm(0, dec(col("vq")) * dec(col("vq")))).as("q_a"),
        count(arm(1, lit(1))).as("n_b"),
        sum(arm(1, dec(col("vq")))).as("s_b"),
        sum(arm(1, dec(col("vq")) * dec(col("vq")))).as("q_b"))
      def va(suf: String) =
        (col(s"q$suf").cast("double") -
          col(s"s$suf").cast("double") * col(s"s$suf").cast("double") /
            col(s"n$suf")) / (col(s"n$suf") - lit(1L))
      def mn(suf: String) = col(s"s$suf").cast("double") / col(s"n$suf")
      val sp = sqrt(((col("n_a") - lit(1L)) * va("_a") +
        (col("n_b") - lit(1L)) * va("_b")) /
        (col("n_a") + col("n_b") - lit(2L)))
      val dEff = (mn("_a") - mn("_b")) / sp
      val gCorr = lit(1.0) - lit(3.0) /
        (lit(4.0) * (col("n_a") + col("n_b")).cast("double") - lit(9.0))
      def q6(c: org.apache.spark.sql.Column) =
        floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
      m.select(col("event_type"), col("n_a"), col("n_b"),
          when(sp > 0.0, q6(dEff)).as("cohens_d"),
          when(sp > 0.0, q6(dEff * gCorr)).as("hedges_g"))
        .orderBy(col("event_type"))
    }),

    // -- Brown–Forsythe (median-based Levene) equal-variance test ----------
    // The precondition check for pooled-variance tests (q_ab_test /
    // q_anova_f): are the k groups' spreads comparable? Deviations are
    // taken from the exact LOWER median (the q_outlier_mad idiom — no
    // interpolated float median can disagree between engines), and the
    // between/within sums of squares are assembled as integer rationals:
    // tⱼ = Sⱼ² div nⱼ is integer-divided per group (truncation < 1
    // squared-milli-unit per group — relative ~1e-12 against the ~1e13
    // SS magnitudes, and IDENTICAL on both engines), so the k-row
    // reduction sums INTEGERS (order-free) and only the final W ratio is
    // floating point. Spark's `div` lowers to a BIGINT quotient, so the
    // un-scaled quotient (≤ nⱼ·maxz² ≈ 2e15 at sf1) must stay inside
    // int64 — a 10⁶ pre-scale would silently wrap it. One keyed median
    // window + one keyed aggregate — both shuffles ride event_type.
    "q_levene_bf" -> ((s, d) => {
      val e = Tables.events(s, d)
        .select(col("event_type"), col("event_id"),
          floor(col("value") * lit(1000.0) + lit(0.5)).cast("long")
            .as("vq"))
      val w1 = Window.partitionBy(col("event_type"))
        .orderBy(col("vq"), col("event_id"))
      val wn = Window.partitionBy(col("event_type"))
      val med = e.withColumn("rn", row_number().over(w1))
        .withColumn("n", count(lit(1)).over(wn))
        .filter(col("rn") === expr("(n + 1) div 2"))
        .select(col("event_type"), col("vq").as("med"))
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val z = e.join(med, "event_type")
        .select(col("event_type"), abs(col("vq") - col("med")).as("z"))
      val g = z.groupBy(col("event_type")).agg(count(lit(1)).as("nj"),
        sum(dec(col("z"))).as("sj"),
        sum(dec(col("z")) * dec(col("z"))).as("qj"))
      val gg = g.select(col("nj"), col("sj"),
        expr("(sj * sj) div CAST(nj AS DECIMAL(38,0))").as("tj"),
        col("qj"))
      val tot = gg.agg(count(lit(1)).as("k"), sum(col("nj")).as("n"),
        sum(col("sj")).as("s"), sum(col("tj")).as("t_tot"),
        sum(col("qj") - col("tj")).as("denom_u"))
      val u = expr("(s * s) div CAST(n AS DECIMAL(38,0))")
      val numerU = (col("t_tot") - u).cast("double")
      val wStat = (col("n") - col("k")).cast("double") /
        (col("k") - lit(1L)).cast("double") *
        numerU / col("denom_u").cast("double")
      tot.select(col("k").as("k_groups"), col("n").as("n_total"),
        when(col("denom_u").cast("double") > 0.0,
          floor(wStat * lit(1e6) + lit(0.5)) / lit(1e6)).as("bf_w"))
    }),

    // -- EWMA control chart over the daily volume series -------------------
    // The SPC companion to q_cusum: a 16-tap Horner-truncated EWMA
    // (λ=0.2 — the q_ewma lag-fold discipline, identical fold order on
    // both engines) tracked against asymptotic ±3σ·sqrt(λ/(2−λ)) control
    // limits derived from exact integer day-count moments. The day frame
    // is calendar-bounded, so the single-partition ORDER BY dd window is
    // a bounded-frame sort by contract.
    "q_ewma_chart" -> ((s, d) => {
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val byd = Tables.events(s, d)
        .groupBy(datediff(to_date(col("ts")),
          lit("1970-01-01").cast("date")).cast("long").as("dd"))
        .agg(count(lit(1)).as("y"))
        .withColumn("yd", col("y").cast("double"))
      val m = byd.agg(count(lit(1)).as("n"), sum(dec(col("y"))).as("s1"),
        sum(dec(col("y")) * dec(col("y"))).as("s2"))
      val w = Window.orderBy(col("dd"))
      val inner = coalesce(lag(col("yd"), ewmaChartTaps - 1).over(w),
        lit(0.0))
      val tail = (ewmaChartTaps - 2 to 1 by -1).foldLeft(inner) {
        (acc, k) =>
          coalesce(lag(col("yd"), k).over(w), lit(0.0)) + lit(0.8) * acc
      }
      val zCol = lit(0.2) * (col("yd") + lit(0.8) * tail)
      val nD = col("n").cast("double")
      val mu = col("s1").cast("double") / nD
      val vr = (col("s2").cast("double") -
        col("s1").cast("double") * col("s1").cast("double") / nD) /
        (nD - lit(1.0))
      val limit = lit(3.0) * sqrt(vr) * sqrt(lit(0.2) / lit(1.8))
      byd.withColumn("z", zCol)
        .crossJoin(broadcast(m))
        .select(col("dd"), col("y"),
          (floor(col("z") * lit(1e6) + lit(0.5)) / lit(1e6)).as("ewma"),
          // non-null boolean by contract (the q_bollinger None-vs-NaN
          // harness lesson): a zero-variance series reads false
          coalesce(when(vr > 0.0, abs(col("z") - mu) > limit),
            lit(false)).as("violation"))
        .orderBy(col("dd"))
    }),

    // -- cross-correlation function between two daily metrics --------------
    // The lead/lag discovery companion to q_acf (within one series) and
    // q_granger (fixed lag 1): does click volume LEAD purchase volume,
    // and by how many days? For each lag ∈ [−7, 7] the overlap
    // cross-moments are EXACT DECIMAL integer sums over the keyed
    // (dd+lag) join of the calendar-bounded day frame; the normalization
    // uses full-series central moments (the standard CCF denominator),
    // so every lag shares one broadcast stats row and only the final
    // ratio is floating point.
    "q_ccf" -> ((s, d) => {
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val byd = Tables.events(s, d)
        .groupBy(datediff(to_date(col("ts")),
          lit("1970-01-01").cast("date")).cast("long").as("dd"))
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .as("x"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("y"))
      val m = byd.agg(count(lit(1)).as("n"),
        sum(dec(col("x"))).as("sx"), sum(dec(col("y"))).as("sy"),
        sum(dec(col("x")) * dec(col("x"))).as("sxx"),
        sum(dec(col("y")) * dec(col("y"))).as("syy"))
      val lags = s.range(-7, 8).select(col("id").as("lag"))
      val o = byd.select(col("dd").as("d1"), col("x").as("x1"))
        .crossJoin(lags)
        .join(byd.select(col("dd").as("d2"), col("y").as("y2")),
          col("d2") === col("d1") + col("lag"))
        .groupBy(col("lag"))
        .agg(count(lit(1)).as("n_overlap"),
          sum(dec(col("x1"))).as("sxo"), sum(dec(col("y2"))).as("syo"),
          sum(dec(col("x1")) * dec(col("y2"))).as("sxyo"))
      val nD = col("n").cast("double")
      val mx = col("sx").cast("double") / nD
      val my = col("sy").cast("double") / nD
      val num = col("sxyo").cast("double") - mx * col("syo").cast("double") -
        my * col("sxo").cast("double") +
        col("n_overlap").cast("double") * mx * my
      val den = sqrt((col("sxx").cast("double") - nD * mx * mx) *
        (col("syy").cast("double") - nD * my * my))
      o.crossJoin(broadcast(m))
        .select(col("lag"), col("n_overlap"),
          when(den > 0.0,
            floor(num / den * lit(1e6) + lit(0.5)) / lit(1e6)).as("ccf"))
        .orderBy(col("lag"))
    }),

    // -- Bollinger bands over the daily volume series ----------------------
    // The rolling-window SPC view (vs q_ewma_chart's exponentially
    // weighted one): 7-day rolling mean ± 2σ from EXACT integer rolling
    // sums (the window carries longs; only each row's band evaluation is
    // floating point, one fixed expression). Bands are NULL until the
    // window is full — a 3-day "band" is noise, and an engine that
    // silently emitted it would alarm on warm-up; the breakout flag is a
    // plain NON-NULL boolean (warm-up rows read false) because the
    // comparison harness renders a null boolean as None on one engine
    // and NaN on the other.
    "q_bollinger" -> ((s, d) => {
      val byd = Tables.events(s, d)
        .groupBy(datediff(to_date(col("ts")),
          lit("1970-01-01").cast("date")).cast("long").as("dd"))
        .agg(count(lit(1)).as("y"))
      val w = Window.orderBy(col("dd")).rowsBetween(-6, 0)
      val r = byd
        .withColumn("cnt", count(lit(1)).over(w))
        .withColumn("rs1", sum(col("y")).over(w))
        .withColumn("rs2", sum(col("y") * col("y")).over(w))
      val cntD = col("cnt").cast("double")
      val mid = col("rs1").cast("double") / cntD
      val vr = (col("rs2").cast("double") -
        col("rs1").cast("double") * col("rs1").cast("double") / cntD) /
        (cntD - lit(1.0))
      def q6(c: org.apache.spark.sql.Column) =
        floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
      // the vr divisor (cnt−1) is 0 on the first warm-up row and ANSI
      // mode faults even a double division by zero — nest the guards so
      // vr only ever evaluates under cnt = 7 (CaseWhen short-circuits
      // per row in codegen)
      val full = col("cnt") === 7L
      r.select(col("dd"), col("y"),
          when(full, q6(mid)).as("mid"),
          when(full, when(vr > 0.0, q6(mid + lit(2.0) * sqrt(vr))))
            .as("bb_upper"),
          when(full, when(vr > 0.0, q6(mid - lit(2.0) * sqrt(vr))))
            .as("bb_lower"),
          coalesce(when(full, when(vr > 0.0,
            col("y").cast("double") > mid + lit(2.0) * sqrt(vr) ||
              col("y").cast("double") < mid - lit(2.0) * sqrt(vr))),
            lit(false)).as("breakout"))
        .orderBy(col("dd"))
    }),

    // -- Hurst exponent via rescaled-range (R/S) analysis ------------------
    // Long-range-dependence audit of the daily series (H≈0.5 random walk,
    // H→1 trending): for window sizes w ∈ {5,10,15} the series splits
    // into complete segments; within each, the cumulative-deviation range
    // is computed as EXACT integers (Z_k·w = w·cumsum_k − (k+1)·S — the
    // mean never materializes as a float), and R/S collapses to
    // R_u / sqrt(w·SS − S²) with the moment products in DECIMAL. Per-
    // segment R/S is micro-quantized to an integer before the per-w mean
    // (order-free reduction), and H is the closed-form 3-point OLS slope
    // on (ln w, ln mean R/S). Segment windows are (w, seg)-keyed.
    "q_hurst" -> ((s, d) => {
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val byd = Tables.events(s, d)
        .groupBy(datediff(to_date(col("ts")),
          lit("1970-01-01").cast("date")).cast("long").as("dd"))
        .agg(count(lit(1)).as("y"))
        .withColumn("idx",
          row_number().over(Window.orderBy(col("dd"))).cast("long") -
            lit(1L))
      val tot = byd.agg(count(lit(1)).as("nd"))
      val ws = s.range(1, 4).select((col("id") * 5).as("w"))
      val segs = byd.crossJoin(ws).crossJoin(broadcast(tot))
        .withColumn("seg", expr("idx div w"))
        .withColumn("pos", expr("idx % w"))
        .filter(col("seg") < expr("nd div w"))
      val wseg = Window.partitionBy(col("w"), col("seg"))
      val wcum = wseg.orderBy(col("pos"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val z = segs
        .withColumn("s", sum(col("y")).over(wseg))
        .withColumn("ss", sum(dec(col("y")) * dec(col("y"))).over(wseg))
        .withColumn("c", sum(col("y")).over(wcum))
        .withColumn("zs",
          col("w") * col("c") - (col("pos") + lit(1L)) * col("s"))
      val perSeg = z.groupBy(col("w"), col("seg"))
        .agg(max(col("zs")).as("zmax"), min(col("zs")).as("zmin"),
          max(col("s")).as("sTot"), max(col("ss")).as("ssTot"))
        .withColumn("den2",
          (dec(col("w")) * col("ssTot") -
            dec(col("sTot")) * dec(col("sTot"))).cast("double"))
        .withColumn("rs6",
          when(col("den2") > 0.0,
            floor((col("zmax") - col("zmin")).cast("double") /
              sqrt(col("den2")) * lit(1e6) + lit(0.5)).cast("long")))
        .filter(col("rs6").isNotNull)
      val perW = perSeg.groupBy(col("w"))
        .agg(count(lit(1)).as("n_segs"), sum(col("rs6")).as("srs"))
        .withColumn("mean_rs_u", expr("srs div n_segs"))
        .withColumn("lnw_u",
          floor(log(col("w").cast("double")) * lit(1e6) + lit(0.5))
            .cast("long"))
        .withColumn("lnrs_u",
          floor(log(col("mean_rs_u").cast("double") / lit(1e6)) *
            lit(1e6) + lit(0.5)).cast("long"))
      val fit = perW.agg(count(lit(1)).as("np"),
        sum(col("lnw_u")).as("sa"), sum(col("lnrs_u")).as("sb"),
        sum(col("lnw_u") * col("lnw_u")).as("saa"),
        sum(col("lnw_u") * col("lnrs_u")).as("sab"))
      val npD = col("np").cast("double")
      val hNum = npD * col("sab").cast("double") -
        col("sa").cast("double") * col("sb").cast("double")
      val hDen = npD * col("saa").cast("double") -
        col("sa").cast("double") * col("sa").cast("double")
      val h = fit.select(
        when(hDen =!= 0.0,
          floor(hNum / hDen * lit(1e6) + lit(0.5)) / lit(1e6)).as("h"))
      perW.crossJoin(broadcast(h))
        .select(col("w"), col("n_segs"),
          (col("mean_rs_u").cast("double") / lit(1e6)).as("rs_mean"),
          col("h"))
        .orderBy(col("w"))
    }),

    // -- Wilcoxon signed-rank test on paired daily metrics ------------------
    // The paired nonparametric companion to q_mann_whitney (unpaired) and
    // q_paired_ttest (parametric): does daily click volume systematically
    // exceed daily view volume? Average ranks of |d| are carried as EXACT
    // integers in 2× units (avg2 = 2·min_rank + ties − 1), so W⁺ and the
    // tie correction are integer sums; the normal approximation is one
    // fixed double expression. The rank window runs on the calendar-
    // bounded day frame (the q_mann_kendall band).
    "q_wilcoxon_signed" -> ((s, d) => {
      val byd = Tables.events(s, d)
        .groupBy(datediff(to_date(col("ts")),
          lit("1970-01-01").cast("date")).cast("long").as("dd"))
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .as("x"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .as("y"))
        .withColumn("diff", col("x") - col("y"))
        .filter(col("diff") =!= 0L)
        .withColumn("ad", abs(col("diff")))
      val ranked = byd
        .withColumn("rnk", rank().over(Window.orderBy(col("ad"))))
        .withColumn("t", count(lit(1)).over(Window.partitionBy(col("ad"))))
        .withColumn("avg2", lit(2L) * col("rnk") + col("t") - lit(1L))
      val agg = ranked.agg(count(lit(1)).as("n"),
        sum(when(col("diff") > 0L, col("avg2")).otherwise(0L)).as("w2p"))
      // tie correction Σ(t³−t) counts each tie GROUP once: aggregate the
      // distinct (ad, t) frame, not per-row
      val ties = ranked.select(col("ad"), col("t")).distinct()
        .agg(coalesce(sum(col("t") * col("t") * col("t") - col("t")),
          lit(0L)).as("tcorr"))
      val nD = col("n").cast("double")
      val wp = col("w2p").cast("double") / lit(2.0)
      val mu = nD * (nD + lit(1.0)) / lit(4.0)
      val vr = nD * (nD + lit(1.0)) * (lit(2.0) * nD + lit(1.0)) /
        lit(24.0) - col("tcorr").cast("double") / lit(48.0)
      agg.crossJoin(broadcast(ties))
        .select(col("n").as("n_nonzero"), wp.as("w_plus"),
          when(vr > 0.0,
            floor((wp - mu) / sqrt(vr) * lit(1e6) + lit(0.5)) / lit(1e6))
            .as("z"))
    }),

    // -- Tukey HSD pairwise comparisons after ANOVA -------------------------
    // The post-hoc step q_anova_f motivates: WHICH event-type means
    // differ? All k·(k−1)/2 studentized ranges derive from ONE
    // conditional-moment scan (exact micro-unit integers) self-joined on
    // the bounded k-row frame; MSW and every q statistic are fixed double
    // expressions. The 3.86 critical value is the k=5, df→∞, α=0.05
    // studentized-range constant — a declared constant, not a lookup.
    "q_tukey_hsd" -> ((s, d) => {
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val e = Tables.events(s, d)
        .select(col("event_type"),
          floor(col("value") * lit(1000.0) + lit(0.5)).cast("long")
            .as("vq"))
      val g = e.groupBy(col("event_type")).agg(count(lit(1)).as("nj"),
        sum(dec(col("vq"))).as("sj"),
        sum(dec(col("vq")) * dec(col("vq"))).as("qj"))
      val tot = g.agg(count(lit(1)).as("k"), sum(col("nj")).as("n"),
        sum((col("qj") -
          expr("(sj * sj) div CAST(nj AS DECIMAL(38,0))"))
          .cast("decimal(38,0)")).as("ssw_u"))
      val msw = col("ssw_u").cast("double") /
        (col("n") - col("k")).cast("double")
      val a = g.select(col("event_type").as("type_a"),
        col("nj").as("na"), col("sj").as("sa"))
      val b = g.select(col("event_type").as("type_b"),
        col("nj").as("nb"), col("sj").as("sb"))
      val ma = col("sa").cast("double") / col("na")
      val mb = col("sb").cast("double") / col("nb")
      val se = sqrt(msw / lit(2.0) *
        (lit(1.0) / col("na") + lit(1.0) / col("nb")))
      val qStat = abs(ma - mb) / se
      def q6(c: org.apache.spark.sql.Column) =
        floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
      a.join(b, col("type_a") < col("type_b"))
        .crossJoin(broadcast(tot))
        .select(col("type_a"), col("type_b"),
          q6((ma - mb) / lit(1000.0)).as("mean_diff"),
          when(se > 0.0, q6(qStat)).as("q_stat"),
          // non-null boolean by contract (the q_bollinger None-vs-NaN
          // harness lesson): a degenerate zero-spread pair reads false
          coalesce(when(se > 0.0, qStat > lit(3.86)), lit(false))
            .as("significant"))
        .orderBy(col("type_a"), col("type_b"))
    }),

    // -- Bartlett equal-variance test (k event-type groups) -----------------
    // The parametric sibling of q_levene_bf: sensitive to non-normality
    // but the textbook precondition check for q_anova_f / q_tukey_hsd's
    // pooled MSW. Discipline: per-group moments are EXACT integer sums
    // (one conditional scan); each group variance evaluates through ONE
    // fixed double expression and its ln is micro-quantized to an integer
    // BEFORE the k-row reduction (the q_pmi floor-ln idiom), so the
    // k-term sum is order-free; the reciprocal sum in Bartlett's C
    // correction is an exact integer division (pico-units), never a float
    // accumulation. Only the final T/C ratio is floating point.
    "q_bartlett" -> ((s, d) => {
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val e = Tables.events(s, d)
        .select(col("event_type"),
          floor(col("value") * lit(1000.0) + lit(0.5)).cast("long")
            .as("vq"))
      val g = e.groupBy(col("event_type")).agg(count(lit(1)).as("nj"),
        sum(dec(col("vq"))).as("sj"),
        sum(dec(col("vq")) * dec(col("vq"))).as("qj"))
      val vj = (col("qj").cast("double") -
        col("sj").cast("double") * col("sj").cast("double") /
          col("nj")) / (col("nj") - lit(1L))
      val per = g.select(col("nj"),
        when(vj > 0.0,
          (col("nj") - lit(1L)) *
            floor(log(vj) * lit(1e6) + lit(0.5)).cast("long"))
          .otherwise(lit(0L)).as("lj_w"),
        when(vj > 0.0, 0L).otherwise(1L).as("degen"),
        (col("qj") - expr("(sj * sj) div CAST(nj AS DECIMAL(38,0))"))
          .cast("decimal(38,0)").as("ssw_j"),
        expr("1000000000000 div (nj - 1)").as("rj"))
      val t = per.agg(count(lit(1)).as("k"), sum(col("nj")).as("n"),
        sum(col("lj_w")).as("sum_lj"), sum(col("degen")).as("n_degen"),
        sum(col("ssw_j")).as("ssw_u"), sum(col("rj")).as("sum_rj"))
      val sp2 = col("ssw_u").cast("double") /
        (col("n") - col("k")).cast("double")
      val lp = floor(log(sp2) * lit(1e6) + lit(0.5))
      val tU = (col("n") - col("k")).cast("double") * lp -
        col("sum_lj").cast("double")
      val cCorr = lit(1.0) +
        (col("sum_rj").cast("double") / lit(1e12) -
          lit(1.0) / (col("n") - col("k")).cast("double")) /
        (lit(3.0) * (col("k") - lit(1L)).cast("double"))
      t.select(col("k"), col("n"), (col("k") - lit(1L)).as("df"),
        when(col("n_degen") === 0L && sp2 > 0.0,
          floor(tU / lit(1e6) / cCorr * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("bartlett_chi2"))
    }),

    // -- Cochran's Q test (binary repeated measures across event types) -----
    // q_friedman's binary specialization: within a (user, day) exposure
    // block, is the 0/1 "did event type j that day" indicator equally
    // likely across types? Blocks are user-days (per-user lifetime
    // indicators saturate — every long-lived user eventually touches
    // every type, degenerating the denominator; daily blocks stay
    // sparse at every scale), the response is a genuine zero for an
    // absent (user, day, type), so unlike q_friedman no densification
    // is needed — the formula touches only row/column totals. One
    // distinct-triple shuffle; both reductions (per-block Ri, per-type
    // Cj) are exact integers; Q is one fixed double expression on the
    // final 1-row frame.
    "q_cochran_q" -> ((s, d) => {
      val pairs = Tables.events(s, d)
        .select(col("user_id"),
          datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
            .cast("long").as("dd"),
          col("event_type")).distinct()
      val rAgg = pairs.groupBy(col("user_id"), col("dd"))
        .agg(count(lit(1)).as("ri"))
        .agg(count(lit(1)).as("n_blocks"), sum(col("ri")).as("n_tot"),
          sum(col("ri") * col("ri")).as("sr2"))
      val cAgg = pairs.groupBy(col("event_type"))
        .agg(count(lit(1)).as("cj"))
        .agg(count(lit(1)).as("k"), sum(col("cj") * col("cj")).as("sc2"))
      val den = col("k").cast("double") * col("n_tot") -
        col("sr2").cast("double")
      val num = (col("k") - lit(1L)).cast("double") *
        (col("k").cast("double") * col("sc2") -
          col("n_tot").cast("double") * col("n_tot"))
      rAgg.crossJoin(broadcast(cAgg))
        .select(col("k"), col("n_blocks"), (col("k") - lit(1L)).as("df"),
          when(den > 0.0,
            floor(num / den * lit(1e6) + lit(0.5)) / lit(1e6))
            .as("q_stat"))
    }),

    // -- Mood's median test (k-group location on counts above the median) ---
    // The nonparametric coarse cousin of q_kruskal_wallis: does each
    // event type land above the GLOBAL median as often as expected?
    // The global lower median comes off the distinct-value contingency
    // frame via Dist.globalPrefixSum — no single-partition window at any
    // corpus size (the q_histogram_eqdepth discipline). The 2×k
    // chi-square then assembles from per-cell INTEGER terms:
    // (obs·N − rt·ct)²·10⁶ div (rt·ct·N) in DECIMAL(38,0) — exact and
    // order-free (numerator ≤ ~10³³ at sf1000; the 38-digit ceiling is
    // reached near 10¹⁰ rows, same documented bound as q_mood's
    // contingency siblings). Only the final /10⁶ rescale is floating.
    "q_mood_median" -> ((s, d) => {
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val e = Tables.events(s, d)
        .select(col("event_type"),
          floor(col("value") * lit(1000.0) + lit(0.5)).cast("long")
            .as("vq"))
      val counts = e.groupBy(col("vq")).agg(count(lit(1)).as("cnt"))
        .withColumn("vqd", col("vq").cast("double"))
      val tot = counts.agg(sum(col("cnt")).as("n"))
      val med = Dist.globalPrefixSum(counts, "vqd", asc = true,
          idCol = "vq", weightCol = "cnt",
          s.sparkContext.defaultParallelism)
        .crossJoin(broadcast(tot))
        .filter(col("cum") >= expr("(n + 1) div 2"))
        .agg(min(col("vq")).as("med"))
      val cells = e.crossJoin(broadcast(med))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("rt"),
          sum(when(col("vq") > col("med"), 1L).otherwise(0L)).as("above"))
      val g = cells.agg(sum(col("rt")).as("nn"),
        sum(col("above")).as("ca"))
      val withTot = cells.crossJoin(broadcast(g))
        .select(col("nn"), col("ca"),
          (dec(col("above")) * dec(col("nn")) -
            dec(col("rt")) * dec(col("ca"))).as("dev_a"),
          (dec(col("rt")) * dec(col("ca")) * dec(col("nn"))).as("den_a"),
          (dec(col("rt") - col("above")) * dec(col("nn")) -
            dec(col("rt")) * dec(col("nn") - col("ca"))).as("dev_b"),
          (dec(col("rt")) * dec(col("nn") - col("ca")) * dec(col("nn")))
            .as("den_b"))
      val terms = withTot.select(col("nn"), col("ca"),
        expr("CAST((dev_a * dev_a * 1000000) div den_a " +
          "+ (dev_b * dev_b * 1000000) div den_b AS DECIMAL(38,0))")
          .as("t_u"))
      val fin = terms.groupBy(col("nn"), col("ca"))
        .agg(count(lit(1)).as("k"), sum(col("t_u")).as("chi_u"))
      fin.crossJoin(broadcast(med))
        .select(col("k"), col("nn").as("n"),
          (col("med").cast("double") / lit(1000.0)).as("median"),
          (col("k") - lit(1L)).as("df"),
          (col("chi_u").cast("double") / lit(1e6)).as("chi2"))
    }),

    // -- AR(2) Yule–Walker fit of the daily-volume series --------------------
    // The forecasting step q_acf motivates: fit the autoregressive
    // coefficients themselves. Same scale-free micro-quantized deviation
    // frame as q_acf (so the integer lag co-moments can never overflow),
    // lags 1–2 via the bounded dense-index join; φ₁/φ₂ and the residual
    // ratio are the closed-form Yule–Walker solutions — fixed double
    // expressions over three exact integers (num₁, num₂, den). Everything
    // after the one day aggregate runs on the calendar-bounded frame.
    "q_ar_fit" -> ((s, d) => {
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
      val den = idx.agg(sum(col("dq") * col("dq")).as("den"),
        count(lit(1)).as("n_days"))
      val a = idx.withColumn("k", explode(expr("sequence(1, 2)")))
        .select(col("k").cast("long").as("k"),
          (col("t") + col("k")).as("tk"), col("dq").as("dqa"))
      val nums = a.join(idx.select(col("t").as("tk"),
          col("dq").as("dqb")), "tk")
        .groupBy(col("k"))
        .agg(sum(col("dqa") * col("dqb")).as("num"))
        .groupBy()
        .agg(sum(when(col("k") === 1L, col("num"))).as("num1"),
          sum(when(col("k") === 2L, col("num"))).as("num2"))
      val r1 = col("num1").cast("double") / col("den")
      val r2 = col("num2").cast("double") / col("den")
      val phi1 = r1 * (lit(1.0) - r2) / (lit(1.0) - r1 * r1)
      val phi2 = (r2 - r1 * r1) / (lit(1.0) - r1 * r1)
      def q6(c: org.apache.spark.sql.Column) =
        floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
      den.crossJoin(broadcast(nums))
        .select(col("n_days"),
          when(col("den") > 0L, q6(r1)).as("r1"),
          when(col("den") > 0L, q6(r2)).as("r2"),
          when(col("den") > 0L && r1 * r1 =!= lit(1.0), q6(phi1))
            .as("phi1"),
          when(col("den") > 0L && r1 * r1 =!= lit(1.0), q6(phi2))
            .as("phi2"),
          when(col("den") > 0L && r1 * r1 =!= lit(1.0),
            q6(lit(1.0) - phi1 * r1 - phi2 * r2)).as("noise_ratio"))
    }),

    // -- daily-volume periodogram (DFT power at the top 8 frequencies) ------
    // The frequency-domain twin of q_acf/q_seasonal_dow: WHICH cycle
    // dominates the volume series? A fixed 64-day window from the first
    // observed day (absent days contribute exactly 0, so no densify
    // shuffle), the quantized-basis table broadcast from [[dftCoeffs]] —
    // every spectral line is two exact INTEGER dot products (re/im), and
    // the power combines them in DECIMAL(38,0) before one identical
    // integer rescale. The data-sized cost is the one day aggregate; the
    // fan-out is 8 bounded rows per day.
    "q_periodogram" -> ((s, d) => {
      val coef = s.createDataFrame(dftCoeffs).toDF("m", "cq", "sq")
      val byDay = Tables.events(s, d)
        .groupBy(datediff(to_date(col("ts")),
          lit("1970-01-01").cast("date")).cast("long").as("dd"))
        .agg(count(lit(1)).as("y"))
      val d0 = byDay.agg(min(col("dd")).as("d0"))
      val frame = byDay.crossJoin(broadcast(d0))
        .select((col("dd") - col("d0")).as("t"), col("y"))
        .filter(col("t") < dftWindowDays)
      frame.withColumn("k", explode(expr("sequence(1, 8)")))
        .withColumn("m", expr(s"(k * t) % $dftWindowDays"))
        .join(broadcast(coef), "m")
        .groupBy(col("k").cast("long").as("k"))
        .agg(sum(col("y") * col("cq")).as("re_u"),
          sum(col("y") * col("sq")).as("im_u"))
        .select(col("k"),
          (lit(dftWindowDays.toDouble) / col("k")).as("period_days"),
          col("re_u"), col("im_u"),
          expr("CAST((CAST(re_u AS DECIMAL(38,0)) * re_u " +
            "+ CAST(im_u AS DECIMAL(38,0)) * im_u) " +
            "div 1000000000000 AS BIGINT)").as("power"))
        .orderBy(col("k"))
    }),

    // -- Bayesian A/B conversion readout (P(B beats A)) ----------------------
    // The decision-framed companion to q_ab_test's frequentist z: under
    // Beta(1+x, 1+n−x) posteriors on each arm's user-conversion rate,
    // how probable is it that B's rate exceeds A's? The two posteriors
    // are summarized by their exact moments (rational in the four
    // conversion integers), the difference standardized, and Φ evaluated
    // through the Abramowitz–Stegun 26.2.17 polynomial — a FIXED double
    // expression both engines compute from the same four integers (the
    // single exp() call carries the same quantized last-ulp tolerance as
    // the repo's ln discipline). One distinct-user scan is the only
    // data-sized stage.
    "q_bayes_ab" -> ((s, d) => {
      val conv = Tables.events(s, d)
        .groupBy(pmod(col("user_id"), lit(2)).as("arm"), col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1L)
          .otherwise(0L)).as("cv"))
      val m = conv.groupBy()
        .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
          sum(when(col("arm") === 0, col("cv")).otherwise(0L)).as("x_a"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"),
          sum(when(col("arm") === 1, col("cv")).otherwise(0L)).as("x_b"))
      def mu(n: String, x: String) =
        (lit(1.0) + col(x)) / (lit(2.0) + col(n))
      def va(n: String, x: String) =
        (lit(1.0) + col(x)) * (lit(1.0) + col(n) - col(x)) /
          ((lit(2.0) + col(n)) * (lit(2.0) + col(n)) *
            (lit(3.0) + col(n)))
      val z = (mu("n_b", "x_b") - mu("n_a", "x_a")) /
        sqrt(va("n_a", "x_a") + va("n_b", "x_b"))
      val az = abs(z)
      val t = lit(1.0) / (lit(1.0) + lit(0.2316419) * az)
      val poly = t * (lit(0.319381530) + t * (lit(-0.356563782) +
        t * (lit(1.781477937) + t * (lit(-1.821255978) +
          t * lit(1.330274429)))))
      val phiPos = lit(1.0) -
        lit(0.3989422804014327) * exp(az * az / lit(-2.0)) * poly
      val pB = when(z >= 0.0, phiPos).otherwise(lit(1.0) - phiPos)
      def q6(c: org.apache.spark.sql.Column) =
        floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
      m.select(col("n_a"), col("x_a"), col("n_b"), col("x_b"),
        q6(mu("n_a", "x_a")).as("mean_a"),
        q6(mu("n_b", "x_b")).as("mean_b"),
        q6(pB).as("p_b_beats_a"))
    }),

    // -- IPF / raking: calibrate a contingency table to target margins ------
    // The survey-weighting classic (iterative proportional fitting):
    // rescale the (lang × source) document counts so both margins match
    // uniform targets — the de-biasing step before any corpus statistic
    // is read as population-representative. Two unrolled IPF iterations
    // (row-scale then column-scale, twice) entirely in integer
    // micro-units: every scaling is (w · T_u) div marginsum in
    // DECIMAL(38,0) — deterministic truncation on both engines, no
    // float state carried between rounds. The cell frame is bounded
    // (|langs| × |sources|), so everything after the one counting
    // aggregate is margin-keyed work on ~100 rows.
    "q_ipf_rake" -> ((s, d) => {
      val cells = Tables.documents(s, d)
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n"))
      val tot = cells.agg(sum(col("n")).as("nn"),
        countDistinct(col("lang")).as("nr"),
        countDistinct(col("source")).as("nc"))
      val base = cells.crossJoin(broadcast(tot))
        .withColumn("tr_u", expr("(nn * 1000000) div nr"))
        .withColumn("tc_u", expr("(nn * 1000000) div nc"))
        .withColumn("w_u", col("n") * lit(1000000L))
      def scaleRows(df: DataFrame): DataFrame = {
        val m = Window.partitionBy(col("lang"))
        df.withColumn("ms", sum(col("w_u")).over(m))
          .withColumn("w_u",
            expr("CAST((CAST(w_u AS DECIMAL(38,0)) * tr_u) " +
              "div CAST(ms AS DECIMAL(38,0)) AS BIGINT)"))
          .drop("ms")
      }
      def scaleCols(df: DataFrame): DataFrame = {
        val m = Window.partitionBy(col("source"))
        df.withColumn("ms", sum(col("w_u")).over(m))
          .withColumn("w_u",
            expr("CAST((CAST(w_u AS DECIMAL(38,0)) * tc_u) " +
              "div CAST(ms AS DECIMAL(38,0)) AS BIGINT)"))
          .drop("ms")
      }
      val raked = scaleCols(scaleRows(scaleCols(scaleRows(base))))
      raked.select(col("lang"), col("source"), col("n"), col("w_u"),
          (col("w_u").cast("double") / lit(1e6)).as("weight"))
        .orderBy(col("lang"), col("source"))
    }),

    // -- Croston-style intermittent-demand rate (per event type) ------------
    // The forecasting primitive for SPARSE series where q_forecast_backtest's
    // seasonal-naive assumes density: demand rate = mean demand on ACTIVE
    // days over mean inter-arrival gap, the long-run-mean form of
    // Croston's method. The only data-sized stage is the (type, day)
    // aggregate; everything after runs on the bounded active-day frame,
    // and all three readouts are exact integer micro-divisions
    // (numerator ≤ 10⁶·Σy·n_active ≈ 10¹⁷ at sf10 — the int64 ceiling
    // sits near 10⁴× that, documented here per house convention).
    "q_croston" -> ((s, d) => {
      val byd = Tables.events(s, d)
        .groupBy(col("event_type"),
          datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
            .cast("long").as("dd"))
        .agg(count(lit(1)).as("y"))
      byd.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_active"), sum(col("y")).as("sy"),
          min(col("dd")).as("d1"), max(col("dd")).as("dn"))
        .select(col("event_type"), col("n_active"), col("sy"),
          expr("(1000000 * sy) div n_active").as("mean_demand_u"),
          when(col("n_active") > 1L,
            expr("(1000000 * (dn - d1)) div (n_active - 1)"))
            .as("mean_gap_u"),
          when(col("n_active") > 1L && col("dn") > col("d1"),
            expr("(1000000 * sy * (n_active - 1)) " +
              "div (n_active * (dn - d1))")).as("forecast_u"))
        .orderBy(col("event_type"))
    }),

    // -- log loss (cross-entropy) of the calibrated classifier (r13) -------
    // The scoring-rule readout q_brier_decomp's family lacks: mean
    // negative log-likelihood of the logistic-calibrated classifier
    // probability p = 1/(1+e^(−score/64)) against the length label,
    // p clipped to [1e-6, 1−1e-6] (the standard clip — a single
    // overconfident wrong row otherwise dominates). Determinism: the
    // per-row loss nano-quantizes to an integer BEFORE the sum
    // (order-free; DECIMAL(38,0)/HUGEINT — 1e12 rows × ~1.4e10 nanos
    // exceeds int64), and ln/exp are mirrored elementary expressions.
    // One narrow pass + one 1-row reduce at any scale.
    "q_log_loss" -> ((s, d) => {
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val sc = TextDedup.classifierScored(Tables.documents(s, d),
          Seq(col("doc_id"), col("n_chars")))
        .select((col("n_chars") >= 300L).cast("int").cast("long").as("y"),
          col("score"))
        .withColumn("p", lit(1.0) /
          (lit(1.0) + exp(-col("score").cast("double") / lit(64.0))))
        .withColumn("pc",
          least(greatest(col("p"), lit(1e-6)), lit(1.0) - lit(1e-6)))
        .withColumn("lq", floor(
          -(col("y").cast("double") * log(col("pc")) +
            (lit(1.0) - col("y").cast("double")) *
              log(lit(1.0) - col("pc"))) * lit(1e9) + lit(0.5))
          .cast("long"))
      val m = sc.agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"),
        sum(dec(col("lq"))).as("slq"))
      def q6(c: org.apache.spark.sql.Column) =
        floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
      m.select(col("n"), col("n_pos"),
        when(col("n") > 0L, q6(col("slq").cast("double") /
          col("n").cast("double") / lit(1e9))).as("log_loss"))
    }),

    // -- lift & cumulative gains by score band (r13) ------------------------
    // The targeting readout behind "how much better than random is the
    // top score band": 10 fixed probability bands of the SAME logistic
    // calibration as q_log_loss, per-band positive rate vs the base
    // rate (lift), and top-down cumulative gains. Fixed-width bands
    // (not rank deciles) keep the operator order-free and shuffle-light:
    // one keyed aggregate; the cumulative runs on the ≤10-row band frame
    // under an in-plan Limit (the RankStats small-branch discipline —
    // no unbounded global window).
    "q_lift_gains" -> ((s, d) => {
      val sc = TextDedup.classifierScored(Tables.documents(s, d),
          Seq(col("doc_id"), col("n_chars")))
        .select((col("n_chars") >= 300L).cast("int").cast("long").as("y"),
          col("score"))
        .withColumn("p", lit(1.0) /
          (lit(1.0) + exp(-col("score").cast("double") / lit(64.0))))
        .withColumn("band",
          least(lit(9L), floor(col("p") * lit(10.0)).cast("long")))
      val byB = sc.groupBy(col("band"))
        .agg(count(lit(1)).as("nb"), sum(col("y")).as("posb"))
      val tot = byB.agg(sum(col("nb")).as("nt"), sum(col("posb")).as("post"))
      val w = Window.orderBy(col("band").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = byB.orderBy(col("band").desc).limit(10)
        .withColumn("cum_n", sum(col("nb")).over(w))
        .withColumn("cum_pos", sum(col("posb")).over(w))
        .crossJoin(broadcast(tot))
      def q6(c: org.apache.spark.sql.Column) =
        floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
      cum.select(col("band"), col("nb"), col("posb"),
          when(col("post") > 0L,
            q6((col("posb").cast("double") / col("nb").cast("double")) /
              (col("post").cast("double") / col("nt").cast("double"))))
            .as("lift"),
          when(col("post") > 0L,
            q6(col("cum_pos").cast("double") / col("post").cast("double")))
            .as("cum_gain"),
          q6(col("cum_n").cast("double") / col("nt").cast("double"))
            .as("cum_share"))
        .orderBy(col("band").desc)
    }),

    // -- exact trimmed mean per group (r13) ---------------------------------
    // The robust location estimate between mean and median: drop the
    // lowest and highest 10% of rows per event type (k = ⌊n/10⌋ each
    // side), average the rest — EXACTLY, via the distinct-value frame:
    // each milli-quantized value cell covers rank interval
    // [cum−cnt+1, cum]; its kept weight is the overlap with [k+1, n−k];
    // Σ vq·w stays integer (DECIMAL/HUGEINT) until one final division.
    // The cumulative is a PER-TYPE window over the value-domain frame —
    // keyed, NDV-bounded, never a corpus-row sort (the q_mann_whitney
    // frame discipline, per group).
    "q_trimmed_mean" -> ((s, d) => {
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val e = Tables.events(s, d).select(col("event_type"),
        floor(col("value") * lit(1000.0) + lit(0.5)).cast("long").as("vq"))
      val byV = e.groupBy(col("event_type"), col("vq"))
        .agg(count(lit(1)).as("cnt"))
      val wT = Window.partitionBy(col("event_type")).orderBy(col("vq"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = e.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      val cells = byV.withColumn("cum", sum(col("cnt")).over(wT))
        .join(tot, "event_type")
        .withColumn("k", expr("n div 10"))
        .withColumn("kept", greatest(lit(0L),
          least(col("cum"), col("n") - col("k")) -
            greatest(col("cum") - col("cnt") + lit(1L), col("k") + lit(1L)) +
            lit(1L)))
      cells.groupBy(col("event_type"), col("n"), col("k"))
        .agg(sum(dec(col("vq")) * dec(col("kept"))).as("sv"),
          sum(col("kept")).as("nk"))
        .select(col("event_type"), col("n"), col("k"),
          when(col("nk") > 0L,
            floor(col("sv").cast("double") / col("nk").cast("double") /
              lit(1000.0) * lit(1e6) + lit(0.5)) / lit(1e6))
            .as("trimmed_mean"))
        .orderBy(col("event_type"))
    }),

    // -- strict local peaks in the daily series (r13) ------------------------
    // The alarm primitive under every "traffic spiked" readout: days
    // whose count strictly exceeds both neighbors, per event type
    // (keyed lag/lead over the calendar-bounded day frame), plus the
    // global top peak per type (max value, earliest day on ties — an
    // exact two-level reduction, no argmax ambiguity).
    "q_peak_days" -> ((s, d) => {
      val byd = Tables.events(s, d)
        .groupBy(col("event_type"),
          datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
            .cast("long").as("dd"))
        .agg(count(lit(1)).as("y"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("dd"))
      val peaks = byd
        .withColumn("pv", lag(col("y"), 1).over(w))
        .withColumn("nx", lead(col("y"), 1).over(w))
        .filter(col("pv").isNotNull && col("nx").isNotNull &&
          col("y") > col("pv") && col("y") > col("nx"))
      val mx = peaks.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_peaks"), max(col("y")).as("peak_value"))
      peaks.join(mx, "event_type")
        .filter(col("y") === col("peak_value"))
        .groupBy(col("event_type"), col("n_peaks"), col("peak_value"))
        .agg(min(col("dd")).as("peak_day"))
        .orderBy(col("event_type"))
    }),

    // -- Fleiss' kappa: m=3 rater agreement (r14) ---------------------------
    // q_cohens_kappa generalized past two raters — the annotation-QA
    // number for a labeling fleet: three deterministic binary "raters"
    // per document (classifier sign score > 0, length gate n_chars ≥
    // 300, lexical-richness gate n_feats ≥ 25 — all off ONE
    // classifierScored pass), per-item category counts n_i1 = Σ raters,
    // P_i = (n_i1² + (3−n_i1)² − 3)/6, κ = (P̄ − P̄e)/(1 − P̄e). All
    // moments are exact integers until the final mirrored double; one
    // narrow pass + a 1-row reduce at any corpus size.
    "q_fleiss_kappa" -> ((s, d) => {
      val sc = TextDedup.classifierScored(Tables.documents(s, d),
          Seq(col("doc_id"), col("n_chars")))
        .select(((col("score") > 0L).cast("int") +
          (col("n_chars") >= 300L).cast("int") +
          (col("n_feats") >= 25L).cast("int")).cast("long").as("n1"))
      val m = sc.agg(count(lit(1)).as("n"),
        sum(col("n1")).as("t1"),
        sum(col("n1") * col("n1") +
          (lit(3L) - col("n1")) * (lit(3L) - col("n1"))).as("s2"))
      val nD = col("n").cast("double")
      val p1 = col("t1").cast("double") / (lit(3.0) * nD)
      val pbar = (col("s2").cast("double") - lit(3.0) * nD) /
        (lit(6.0) * nD)
      val pe = p1 * p1 + (lit(1.0) - p1) * (lit(1.0) - p1)
      m.select(col("n"), lit(3L).as("m"), col("t1"),
        round(pbar, 6).as("p_bar"), round(pe, 6).as("p_e"),
        when(pe =!= 1.0, round((pbar - pe) / (lit(1.0) - pe), 6))
          .as("kappa"))
    }),

    // -- Krippendorff's alpha (binary nominal, m=3, no missing) (r14) -------
    // The agreement coefficient annotation guidelines actually cite:
    // chance-corrects by the COINCIDENCE margins rather than per-rater
    // marginals (Fleiss), so it stays comparable when rater identity is
    // arbitrary. Same three gates as q_fleiss_kappa. With m=3 complete
    // ratings: off-diagonal coincidence mass o01 = Σ n_i1·n_i0/(m−1)
    // (kept doubled to stay integer), margins n_j = category totals,
    // α = 1 − (3N−1)·(2·o01)/(2·n1·n0). Exact integers to the last
    // mirrored division.
    "q_krippendorff_alpha" -> ((s, d) => {
      val sc = TextDedup.classifierScored(Tables.documents(s, d),
          Seq(col("doc_id"), col("n_chars")))
        .select(((col("score") > 0L).cast("int") +
          (col("n_chars") >= 300L).cast("int") +
          (col("n_feats") >= 25L).cast("int")).cast("long").as("n1"))
      val m = sc.agg(count(lit(1)).as("n"),
        sum(col("n1")).as("n_pos"),
        sum(col("n1") * (lit(3L) - col("n1"))).as("o01_x2"))
      val nTot = lit(3L) * col("n")
      val n0 = nTot - col("n_pos")
      m.select(col("n"), nTot.as("n_ratings"), col("n_pos"),
        n0.as("n_neg"), col("o01_x2"),
        when(col("n_pos") > 0L && n0 > 0L,
          round(lit(1.0) - (nTot - lit(1L)).cast("double") *
            col("o01_x2").cast("double") /
            (lit(2.0) * col("n_pos").cast("double") * n0.cast("double")),
            6)).as("alpha"))
    }),

    // -- Hosmer–Lemeshow calibration deciles (r14) --------------------------
    // The goodness-of-fit companion q_calibration/q_log_loss lack: bin
    // the logistic-calibrated probability p = 1/(1+e^(−score/64)) into
    // deciles and compare observed vs expected positives per bin — the
    // per-bin readout reviewers actually inspect before trusting a
    // quality classifier. The cumulative decile cut runs on the
    // DISTINCT-SCORE frame (bounded by the classifier's integer score
    // domain, never corpus-sized — q_quantile_normalize's allowlisted
    // bound); expected counts micro-quantize per score group BEFORE the
    // decile sum, so cross-partition aggregation is pure integers.
    "q_hosmer_lemeshow" -> ((s, d) => {
      val sc = TextDedup.classifierScored(Tables.documents(s, d),
          Seq(col("doc_id"), col("n_chars")))
        .select(col("score"),
          (col("n_chars") >= 300L).cast("int").cast("long").as("y"))
      val g = sc.groupBy(col("score"))
        .agg(count(lit(1)).as("cnt"), sum(col("y")).as("pos"))
      val p = lit(1.0) /
        (lit(1.0) + exp(-col("score").cast("double") / lit(64.0)))
      val wS = Window.orderBy(col("score"))
      val tot = g.agg(sum(col("cnt")).as("n"))
      val cut = g
        .withColumn("exp_u",
          floor(col("cnt").cast("double") * p * lit(1e6) + lit(0.5))
            .cast("long"))
        .withColumn("cum", sum(col("cnt")).over(wS))
        .crossJoin(broadcast(tot))
        // exact integer floor division, mirroring the oracle's `//`:
        // double-divide-then-cast can flip a bucket boundary once cum
        // outgrows double's 2^53 integer range
        .withColumn("decile", expr("((cum - 1) * 10) div n"))
      val ex = col("exp_pos_u").cast("double") / lit(1e6)
      val ngD = col("n_g").cast("double")
      cut.groupBy(col("decile"))
        .agg(sum(col("cnt")).as("n_g"), sum(col("pos")).as("obs_pos"),
          sum(col("exp_u")).as("exp_pos_u"))
        .select(col("decile"), col("n_g"), col("obs_pos"),
          round(ex, 6).as("exp_pos"),
          when(ex > 0.0 && ex < ngD,
            round((col("obs_pos").cast("double") - ex) *
              (col("obs_pos").cast("double") - ex) * ngD /
              (ex * (ngD - ex)), 6)).as("chi2_term"))
        .orderBy(col("decile"))
    }),

    // -- peaks-over-threshold GPD tail fit (r14) -----------------------------
    // The extreme-value companion q_hill_tail's power-law lens misses:
    // model the event-value tail ABOVE a high threshold with the
    // Generalized Pareto (the Pickands–Balkema–de Haan limit), fitted
    // by the closed-form method of moments — ξ = ½(1 − m²/v),
    // σ = ½·m·(1 + m²/v) over the exceedances y = x − u at u = exact
    // P95. The threshold comes off the milli-quantized value-domain
    // frame via Dist.globalPrefixSum (never a single-partition window);
    // exceedance moments are exact integers; the two estimator
    // expressions are mirrored doubles. ξ > 0 flags a heavy tail the
    // capacity-planning rows must respect.
    "q_gpd_tail" -> ((s, d) => {
      val e = Tables.events(s, d)
        .select(floor(col("value") * lit(1000.0) + lit(0.5)).cast("long")
          .as("vq"))
      val counts = e.groupBy(col("vq")).agg(count(lit(1)).as("cnt"))
        .withColumn("vqd", col("vq").cast("double"))
      val tot = counts.agg(sum(col("cnt")).as("n"))
      val u = Dist.globalPrefixSum(counts, "vqd", asc = true,
          idCol = "vq", weightCol = "cnt",
          s.sparkContext.defaultParallelism)
        .crossJoin(broadcast(tot))
        .filter(col("cum") >= expr("(19 * n + 19) div 20"))
        .agg(min(col("vq")).as("u"))
      val exc = e.crossJoin(broadcast(u))
        .filter(col("vq") > col("u"))
        .select(col("u"), (col("vq") - col("u")).as("y"))
      val m = exc.groupBy(col("u"))
        .agg(count(lit(1)).as("n_exceed"), sum(col("y")).as("sy"),
          sum(col("y") * col("y")).as("syy"))
      val nD = col("n_exceed").cast("double")
      val mean = col("sy").cast("double") / nD
      val vr = (nD * col("syy").cast("double") -
        col("sy").cast("double") * col("sy").cast("double")) / (nD * nD)
      m.select(
        (col("u").cast("double") / lit(1000.0)).as("u"),
        col("n_exceed"),
        when(vr > 0.0, round(lit(0.5) * (lit(1.0) - mean * mean / vr), 6))
          .as("xi"),
        when(vr > 0.0, round(lit(0.5) * (mean / lit(1000.0)) *
          (lit(1.0) + mean * mean / vr), 6)).as("sigma"))
    }),

    // -- operating-point selection: F1-max and Youden-max thresholds (r14) --
    // The decision the ROC/lift family stops short of: WHICH score
    // threshold should the quality gate ship with? Sweep every distinct
    // classifier score as a candidate cut (predict positive at
    // score ≥ θ), with cumulative TP/FP off the bounded distinct-score
    // frame, and report the θ maximizing F1 = 2tp/(pp + P) and the θ
    // maximizing Youden's J = tp/P − fp/N. Both objectives are
    // micro-quantized INTEGER divisions, so the argmax comparison can
    // never flip on float noise between engines; ties break toward the
    // lower θ (orderBy metric desc, score asc → TakeOrdered).
    "q_optimal_threshold" -> ((s, d) => {
      val sc = TextDedup.classifierScored(Tables.documents(s, d),
          Seq(col("doc_id"), col("n_chars")))
        .select(col("score"),
          (col("n_chars") >= 300L).cast("int").cast("long").as("y"))
      val byS = sc.groupBy(col("score"))
        .agg(count(lit(1)).as("cnt"), sum(col("y")).as("pos"))
      val tot = byS.agg(sum(col("cnt")).as("n"), sum(col("pos")).as("p"))
      val wD = Window.orderBy(col("score").desc)
      val cum = byS
        .withColumn("tp", sum(col("pos")).over(wD))
        .withColumn("pp", sum(col("cnt")).over(wD))
        .crossJoin(broadcast(tot))
        .withColumn("fp", col("pp") - col("tp"))
        .withColumn("f1_u", expr("(2 * tp * 1000000) div (pp + p)"))
        // difference-of-floors rather than the single cross-multiplied
        // ratio: tp·(n−p) would overflow int64 near n ≈ 3·10⁹ docs; the
        // two-floor form keeps every intermediate ≤ n·10⁶ (the same
        // ceiling class as f1_u) and stays a deterministic integer
        // objective mirrored on both engines (micro error < 2 ulp of
        // the exact J — immaterial to an argmax over ≥ 1-micro gaps)
        // degenerate-label guard: with zero positives (p=0) or zero
        // negatives (n=p) Youden's J is undefined — Spark's non-ANSI div
        // would yield NULL while DuckDB's // raises, so both sides gate
        // explicitly and return a NULL metric row instead of diverging
        .withColumn("youden_u",
          when(col("p") > 0L && col("n") > col("p"),
            expr("(tp * 1000000) div p - (fp * 1000000) div (n - p)")))
      def best(metric: String, name: String) = cum
        .orderBy(col(metric).desc, col("score").asc).limit(1)
        .select(lit(name).as("criterion"), col("score").as("threshold"),
          col("tp"), col("fp"),
          (col(metric).cast("double") / lit(1e6)).as("metric"))
      best("f1_u", "f1").unionByName(best("youden_u", "youden"))
        .orderBy(col("criterion"))
    }),

    // -- Breusch–Pagan heteroscedasticity screen (r14) ----------------------
    // The q_durbin_watson companion on the same daily-volume OLS: do the
    // trend residuals have CONSTANT variance, or does dispersion itself
    // trend (which silently invalidates the q_group_ols standard
    // errors)? LM = n·R² of e² on the day index. The fit derives from
    // exact DECIMAL moments; residuals milli-quantize on the
    // calendar-bounded day frame, and z = e_u² is rescaled by an exact
    // mirrored integer K before the auxiliary moments so sum(z²) can
    // never cross the DECIMAL(38,0) ceiling (see the inline note).
    // df=1; the 5% decision compares against the χ²₁ literal rather
    // than shipping an erf approximation.
    "q_breusch_pagan" -> ((s, d) => {
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val byDay = Tables.events(s, d)
        .groupBy(datediff(to_date(col("ts")),
          lit("1970-01-01").cast("date")).cast("long").as("dd"))
        .agg(count(lit(1)).as("y"))
      val m = byDay.agg(count(lit(1)).as("n"),
        sum(dec(col("dd"))).as("sx"), sum(dec(col("y"))).as("sy"),
        sum(dec(col("dd")) * dec(col("dd"))).as("sxx"),
        sum(dec(col("dd")) * dec(col("y"))).as("sxy"))
      val nD = col("n").cast("double")
      val bNum = nD * col("sxy").cast("double") -
        col("sx").cast("double") * col("sy").cast("double")
      val bDen = nD * col("sxx").cast("double") -
        col("sx").cast("double") * col("sx").cast("double")
      val fit = m.select(col("n"), (bNum / bDen).as("b"),
        ((col("sy").cast("double") - bNum / bDen *
          col("sx").cast("double")) / nD).as("a"))
      val z = byDay.crossJoin(broadcast(fit))
        .withColumn("eu", floor((col("y").cast("double") -
          col("a") - col("b") * col("dd").cast("double")) * lit(1000.0) +
          lit(0.5)).cast("long"))
        .select(col("dd"), (dec(col("eu")) * dec(col("eu"))).as("z"))
      // R² is scale-invariant in z, so rescale z = eu² to ≤ ~2·10¹²
      // before the auxiliary moments: the raw fourth-power sum
      // sum(z²) = sum(eu⁴) would cross the decimal(38,0) ceiling once
      // daily residuals exceed ~3·10⁹ milli-units (plausible at 100 TB
      // daily volumes) — Spark (non-ANSI) overflows to silent NULL where
      // the HUGEINT oracle keeps computing. K = max(1, max(z) div 10¹²)
      // is an exact integer mirrored on both engines, so the rescaled
      // statistic stays bit-identical across engines; sum(zs²) ≤ n·4·10²⁴
      // — exact past any real calendar (10¹⁰ days before 10³⁸).
      val zmx = z.agg(max(col("z")).as("zmx"))
      val zq = z.crossJoin(broadcast(zmx))
        .select(col("dd"), expr(
          "z div greatest(cast(1 as bigint), zmx div 1000000000000)")
          .as("zs"))
      val aux = zq.agg(count(lit(1)).as("n"),
        sum(dec(col("dd"))).as("sx"), sum(dec(col("zs"))).as("sz"),
        sum(dec(col("dd")) * dec(col("dd"))).as("sxx"),
        sum(dec(col("dd")) * dec(col("zs"))).as("sxz"),
        sum(dec(col("zs")) * dec(col("zs"))).as("szz"))
      val nA = col("n").cast("double")
      val num = nA * col("sxz").cast("double") -
        col("sx").cast("double") * col("sz").cast("double")
      val den = (nA * col("sxx").cast("double") -
        col("sx").cast("double") * col("sx").cast("double")) *
        (nA * col("szz").cast("double") -
          col("sz").cast("double") * col("sz").cast("double"))
      aux.select(col("n").as("n_days"), lit(1L).as("df"),
        when(den > 0.0, round(nA * num * num / den, 6)).as("lm_stat"),
        when(den > 0.0, nA * num * num / den > 3.841459)
          .as("reject_5pct"))
    }),

    // -- Gumbel block-maxima fit + return levels (r15) ------------------------
    // The BLOCK-MAXIMA half of extreme-value theory (q_gpd_tail covers
    // peaks-over-threshold): daily maxima of the event value follow a
    // Gumbel in the domain-of-attraction limit; method-of-moments fit
    // β = σ√6/π, μ = x̄ − γβ (Euler–Mascheroni), and the numbers a
    // capacity planner actually reads — the T-block return levels
    // x_T = μ − β·ln(−ln(1−1/T)). Daily maxima are exact milli-quantized
    // integers; moments fold in DECIMAL; four mirrored double
    // expressions at the end.
    "q_gumbel_fit" -> ((s, d) => {
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val byDay = Tables.events(s, d)
        .groupBy(datediff(to_date(col("ts")),
          lit("1970-01-01").cast("date")).cast("long").as("dd"))
        .agg(max(floor(col("value") * lit(1000.0) + lit(0.5)).cast("long"))
          .as("mxq"))
      val m = byDay.agg(count(lit(1)).as("n"), sum(col("mxq")).as("s"),
        sum(dec(col("mxq")) * dec(col("mxq"))).as("ss"))
      val nD = col("n").cast("double")
      val mean = col("s").cast("double") / nD
      val vr = (nD * col("ss").cast("double") -
        col("s").cast("double") * col("s").cast("double")) /
        (nD * (nD - 1.0))
      val beta = sqrt(lit(6.0) * vr) / lit(math.Pi)
      val mu = mean - lit(0.5772156649015329) * beta
      def rl(t: Double) =
        (mu - beta * log(-log(lit(1.0) - lit(1.0 / t)))) / lit(1000.0)
      m.select(col("n").as("n_days"),
        when(col("n") > 1L, round(mu / lit(1000.0), 6)).as("mu"),
        when(col("n") > 1L, round(beta / lit(1000.0), 6)).as("beta"),
        when(col("n") > 1L, round(rl(10.0), 6)).as("return_level_10"),
        when(col("n") > 1L, round(rl(100.0), 6)).as("return_level_100"))
    }),

    // -- Gaussian KDE density profile (r15) ------------------------------------
    // The smooth-density readout q_histogram's fixed bins can't give:
    // kernel density at 9 evenly spaced grid points over the value
    // range, Silverman bandwidth h = 1.06·σ·n^(−1/5) off exact integer
    // moments. The kernel sum rides the DISTINCT-VALUE frame (counts ×
    // 9 grid points — domain-bounded, never per-row), each (grid,
    // value) term nano-quantized then integer-summed per grid point, so
    // no cross-row float fold exists on either engine.
    "q_kde_profile" -> ((s, d) => {
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val vals = Tables.events(s, d)
        .select(floor(col("value") * lit(1000.0) + lit(0.5)).cast("long")
          .as("vq"))
        .groupBy(col("vq")).agg(count(lit(1)).as("cnt"))
      val m = vals.agg(sum(col("cnt")).as("n"),
        sum(dec(col("vq")) * dec(col("cnt"))).as("s"),
        sum(dec(col("vq")) * dec(col("vq")) * dec(col("cnt"))).as("ss"),
        min(col("vq")).as("lo"), max(col("vq")).as("hi"))
      val nD = col("n").cast("double")
      val vr = (nD * col("ss").cast("double") -
        col("s").cast("double") * col("s").cast("double")) / (nD * nD)
      val bw = m.select(col("n"), col("lo"), col("hi"),
        (lit(1.06) * sqrt(vr) * pow(nD, -0.2)).as("h"))
      val g = vals.crossJoin(broadcast(bw))
        .withColumn("k", explode(expr("sequence(1, 9)")))
        .withColumn("g", expr("lo + (k * (hi - lo)) div 10"))
        .withColumn("z", (col("g").cast("double") -
          col("vq").cast("double")) / col("h"))
        // degenerate-input guard (single distinct value or n = 1 → h =
        // 0, z = 0/0 = NaN; floor(NaN) diverges between the engines):
        // gate the kernel term so the density column comes out NULL on
        // BOTH engines instead of an engine-specific NaN/error
        .withColumn("t_u", when(col("h") > 0.0 && col("n") > 1L,
          floor(col("cnt").cast("double") *
            exp(-col("z") * col("z") / lit(2.0)) * lit(1e9) + lit(0.5))
            .cast("long")))
      g.groupBy(col("k").cast("long").as("k"))
        .agg(max((col("g").cast("double") / lit(1000.0))).as("grid_v"),
          sum(col("t_u")).as("su"), max(col("n")).as("n"),
          max(col("h")).as("h"))
        .select(col("k"), round(col("grid_v"), 6).as("grid_v"),
          round(col("su").cast("double") / lit(1e9) /
            (col("n").cast("double") * col("h") / lit(1000.0)) /
            lit(math.sqrt(2.0 * math.Pi)), 9)
            .as("density"))
        .orderBy(col("k"))
    }),

    // -- Somers' D / Goodman–Kruskal gamma ordinal association (r15) ----------
    // The ordinal-by-ordinal association family q_kendall_tau's
    // continuous lens doesn't give: over FIXED-WIDTH ordinal bins
    // (length decile × word-count decile — deterministic bins, never
    // rank-based ntile whose tie handling differs across engines), the
    // concordant/discordant/tied pair counts come from the BOUNDED
    // 10×10 contingency grid crossed with itself (≤ 10⁴ cell pairs at
    // ANY corpus size — never a row-pair join). Gamma = (C−D)/(C+D);
    // Somers' d_yx additionally charges pairs tied on y only. All
    // integers until two final divisions.
    "q_somers_d" -> ((s, d) => {
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val b = Tables.documents(s, d).select(
        least(expr("n_chars div 100"), lit(9L)).as("xb"),
        least(expr("size(split(text, ' ')) div 50"), lit(9L)).as("yb"))
      val grid = b.groupBy(col("xb"), col("yb"))
        .agg(count(lit(1)).as("n"))
      val pairs = grid.alias("a").crossJoin(grid.alias("b"))
      val cd = pairs.agg(
        sum(when(col("a.xb") < col("b.xb") && col("a.yb") < col("b.yb"),
          dec(col("a.n")) * dec(col("b.n"))).otherwise(dec(lit(0L))))
          .as("c_pairs"),
        sum(when(col("a.xb") < col("b.xb") && col("a.yb") > col("b.yb"),
          dec(col("a.n")) * dec(col("b.n"))).otherwise(dec(lit(0L))))
          .as("d_pairs"),
        sum(when(col("a.xb") < col("b.xb") && col("a.yb") === col("b.yb"),
          dec(col("a.n")) * dec(col("b.n"))).otherwise(dec(lit(0L))))
          .as("ty_pairs"))
      val tot = b.agg(count(lit(1)).as("n_docs"))
      val cD = col("c_pairs").cast("double")
      val dD = col("d_pairs").cast("double")
      val tyD = col("ty_pairs").cast("double")
      cd.crossJoin(broadcast(tot))
        .select(col("n_docs"),
          col("c_pairs").cast("double").as("c_pairs"),
          col("d_pairs").cast("double").as("d_pairs"),
          when(cD + dD > 0.0, round((cD - dD) / (cD + dD), 6))
            .as("gamma"),
          when(cD + dD + tyD > 0.0,
            round((cD - dD) / (cD + dD + tyD), 6)).as("somers_d_yx"))
    }),

    // -- Cohen's h effect size for proportions (r15) --------------------------
    // The EFFECT-SIZE companion to q_ab_test's z: h = 2·asin√p₁ −
    // 2·asin√p₂ on the arcsine-stabilized scale, the standard "is this
    // conversion lift big enough to matter" number (0.2/0.5/0.8 bands)
    // that a significance test alone can't give at scale (everything is
    // significant at n = 10⁹). Same user-hash arms and purchase
    // conversion as q_bayes_ab; four exact integers, one mirrored
    // double expression; bands on the rounded h.
    "q_cohens_h" -> ((s, d) => {
      val conv = Tables.events(s, d)
        .groupBy((col("user_id") % 2).as("arm"), col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1L)
          .otherwise(0L)).as("cv"))
      val m = conv.agg(
        sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === 0L, col("cv")).otherwise(0L)).as("x_a"),
        sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("arm") === 1L, col("cv")).otherwise(0L)).as("x_b"))
      val h = round(lit(2.0) *
        (asin(sqrt(col("x_a").cast("double") / col("n_a").cast("double"))) -
          asin(sqrt(col("x_b").cast("double") / col("n_b").cast("double")))),
        6)
      m.select(col("n_a"), col("x_a"), col("n_b"), col("x_b"),
        h.as("cohens_h"),
        when(abs(h) < 0.2, "negligible").when(abs(h) < 0.5, "small")
          .when(abs(h) < 0.8, "medium").otherwise("large").as("magnitude"))
    }),

    // -- Bradley-Terry pairwise-preference ranking (r16) ---------------------
    // The preference-data workhorse (reward-model / RLHF eval): strengths
    // p_a from pairwise duels via three unrolled MM rounds (Hunter 2004)
    // — p'_a = W_a / Σ_b n_ab/(p_a+p_b) — in the q_markov_steady pico
    // fixed point: every division is a DECIMAL(38,0) `div` both engines
    // truncate identically, so no float state crosses rounds. Duels are
    // deterministic from the corpus: per user, type a beats type b when
    // the user fired a more often (ties/absent types contribute no
    // comparison). A strength is floored at 1 pico so a winless type
    // can never zero a later denominator (n·S² ≥ S² ≫ p_a+p_b keeps
    // every term ≥ 1 anyway). Scale shape: one user-keyed count shuffle,
    // then everything lives on the k² duel frame (localCheckpointed,
    // k = |event types|); magnitudes stay < 1.5e27 ≪ the decimal(38,0)
    // envelope (ScaleStressSpec's discipline).
    "q_bradley_terry" -> ((s, d) => {
      val S = "1000000000000"
      val cnts = Tables.events(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("c"))
      val duels = cnts.as("x").join(cnts.as("y"),
          col("x.user_id") === col("y.user_id") &&
          col("x.event_type") < col("y.event_type"))
        .select(col("x.event_type").as("a"), col("y.event_type").as("b"),
          when(col("x.c") > col("y.c"), 1L).otherwise(0L).as("aw"),
          when(col("x.c") < col("y.c"), 1L).otherwise(0L).as("bw"))
        .groupBy(col("a"), col("b"))
        .agg(sum(col("aw")).as("wab"), sum(col("bw")).as("wba"))
      val sym = duels
        .select(col("a"), col("b"), col("wab").as("w"),
          (col("wab") + col("wba")).as("n"))
        .unionAll(duels.select(col("b"), col("a"), col("wba"),
          col("wab") + col("wba")))
        .filter(col("n") > 0L)
        .localCheckpoint(true)
      val wtot = sym.groupBy(col("a").as("t"))
        .agg(sum(col("w")).as("wins"), sum(col("n")).as("comparisons"))
      var p = wtot.select(col("t"), expr(s"CAST($S AS BIGINT)").as("p"))
      for (_ <- 1 to 3) {
        val denom = sym
          .join(p.select(col("t").as("a"), col("p").as("pa")), "a")
          .join(p.select(col("t").as("b"), col("p").as("pb")), "b")
          .groupBy(col("a").as("t"))
          .agg(sum(expr(s"(CAST(n AS DECIMAL(38,0)) * $S * $S)" +
            " div (pa + pb)")).as("dd"))
        p = wtot.join(denom, "t")
          .select(col("t"), expr(
            s"greatest(CAST((CAST(wins AS DECIMAL(38,0)) * $S * $S)" +
            " div dd AS BIGINT), CAST(1 AS BIGINT))").as("p"))
      }
      val w = Window.orderBy(col("p").desc, col("t").asc)
      wtot.join(p, "t")
        .select(col("t").as("event_type"), col("wins"),
          col("comparisons"), col("p").as("bt_u"),
          row_number().over(w).cast("long").as("rnk"))
        .orderBy(col("event_type"))
    }),

    // -- Hjorth parameters of the daily series (r15) --------------------------
    // The three classical signal descriptors (Hjorth 1970): activity =
    // var(y), mobility = √(var(Δy)/var(y)), complexity =
    // mobility(Δy)/mobility(y) — the cheap "how noisy / how
    // oscillatory" fingerprint logged beside q_hurst. Daily counts are
    // integers, so all three variances come from EXACT integer moments
    // (n·Σx² − (Σx)² in DECIMAL) over the calendar day frame; three
    // mirrored double ratios at the end.
    "q_hjorth_params" -> ((s, d) => {
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val byDay = Tables.events(s, d)
        .groupBy(datediff(to_date(col("ts")),
          lit("1970-01-01").cast("date")).cast("long").as("dd"))
        .agg(count(lit(1)).as("y"))
      val wd = Window.orderBy(col("dd"))
      val diffs = byDay
        .withColumn("d1", col("y") - lag(col("y"), 1).over(wd))
        .withColumn("d2", col("d1") - lag(col("d1"), 1).over(wd))
      def varAgg(c: String, n: String, v: String) = Seq(
        sum(when(col(c).isNotNull, 1L).otherwise(0L)).as(n),
        sum(when(col(c).isNotNull, dec(col(c))).otherwise(dec(lit(0L))))
          .as(s"s_$v"),
        sum(when(col(c).isNotNull, dec(col(c)) * dec(col(c)))
          .otherwise(dec(lit(0L)))).as(s"ss_$v"))
      val aggs = varAgg("y", "n0", "v0") ++ varAgg("d1", "n1", "v1") ++
        varAgg("d2", "n2", "v2")
      val m = diffs.agg(aggs.head, aggs.tail: _*)
      def vr(n: String, v: String) =
        (col(n).cast("double") * col(s"ss_$v").cast("double") -
          col(s"s_$v").cast("double") * col(s"s_$v").cast("double")) /
          (col(n).cast("double") * col(n).cast("double"))
      val (v0, v1, v2) = (vr("n0", "v0"), vr("n1", "v1"), vr("n2", "v2"))
      m.select(col("n0").as("n_days"),
        round(v0, 6).as("activity"),
        when(v0 > 0.0, round(sqrt(v1 / v0), 6)).as("mobility"),
        when(v1 > 0.0 && v0 > 0.0,
          round(sqrt(v2 / v1) / sqrt(v1 / v0), 6)).as("complexity"))
    }),

    // -- Theil's U2 forecast-skill ratio (r15) --------------------------------
    // The "is the model better than persistence" gate q_mase_backtest's
    // MASE asks with absolute errors, asked with RMS: fit the OLS trend
    // on the FIRST-half days (exact DECIMAL moments, the
    // q_durbin_watson fit), forecast the second half, and report
    // U2 = RMSE(model)/RMSE(naive last-value). Model errors
    // milli-quantize; naive errors are exact integers; U2 < 1 on the
    // rounded value means the trend beats persistence out of sample.
    "q_theil_u2" -> ((s, d) => {
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val byDay = Tables.events(s, d)
        .groupBy(datediff(to_date(col("ts")),
          lit("1970-01-01").cast("date")).cast("long").as("dd"))
        .agg(count(lit(1)).as("y"))
      val mid = byDay.agg(min(col("dd")).as("mn"), max(col("dd")).as("mx"))
        .select(expr("(mn + mx) div 2").as("mid"))
      val wd = Window.orderBy(col("dd"))
      val withPrev = byDay.crossJoin(broadcast(mid))
        .withColumn("yp", lag(col("y"), 1).over(wd))
      val train = withPrev.filter(col("dd") < col("mid"))
      val mTrain = train.agg(count(lit(1)).as("n"),
        sum(dec(col("dd"))).as("sx"), sum(dec(col("y"))).as("sy"),
        sum(dec(col("dd")) * dec(col("dd"))).as("sxx"),
        sum(dec(col("dd")) * dec(col("y"))).as("sxy"))
      val nD = col("n").cast("double")
      val bNum = nD * col("sxy").cast("double") -
        col("sx").cast("double") * col("sy").cast("double")
      val bDen = nD * col("sxx").cast("double") -
        col("sx").cast("double") * col("sx").cast("double")
      val fit = mTrain.select(col("n").as("n_train"),
        (bNum / bDen).as("b"),
        ((col("sy").cast("double") - bNum / bDen *
          col("sx").cast("double")) / nD).as("a"))
      val test = withPrev.filter(col("dd") >= col("mid") &&
          col("yp").isNotNull)
        .crossJoin(broadcast(fit))
        .withColumn("e1u", floor((col("y").cast("double") - col("a") -
          col("b") * col("dd").cast("double")) * lit(1000.0) + lit(0.5))
          .cast("long"))
        .withColumn("e2", col("y") - col("yp"))
      val agg = test.agg(max(col("n_train")).as("n_train"),
        count(lit(1)).as("n_test"),
        sum(dec(col("e1u")) * dec(col("e1u"))).as("se1"),
        sum(dec(col("e2")) * dec(col("e2"))).as("se2"))
      val rm = sqrt(col("se1").cast("double") / lit(1e6) /
        col("n_test").cast("double"))
      val rn = sqrt(col("se2").cast("double") /
        col("n_test").cast("double"))
      val u2 = round(rm / rn, 6)
      agg.select(col("n_train"), col("n_test"),
        round(rm, 6).as("rmse_model"), round(rn, 6).as("rmse_naive"),
        when(col("se2") > dec(lit(0L)), u2).as("theil_u2"),
        when(col("se2") > dec(lit(0L)), u2 < 1.0).as("model_beats_naive"))
    }),

    // -- Benjamini–Yekutieli FDR under dependence (r15) -----------------------
    // q_bh_fdr's step-up control is only valid under independence/PRDS;
    // BY divides each threshold by the harmonic number c(m) = Σ 1/i,
    // giving control under ARBITRARY dependence — the conservative
    // variant a dashboard of CORRELATED per-nation tests should run.
    // Same natChi2P frame as q_bh_fdr/q_holm_bonferroni (the shared-
    // statistic discipline); c(m) folds as exact pico-unit integer
    // divisions (the Bartlett reciprocal idiom), and the step-up
    // comparison is a pure integer cross-multiplication in DECIMAL.
    "q_benjamini_yekutieli" -> ((s, d) => {
      val x2 = natChi2P(s, d)
      val ranked = x2
        .crossJoin(broadcast(x2.agg(count(lit(1)).as("m"))))
        .withColumn("rnk",
          row_number().over(Window.orderBy(col("pu"), col("nk"))))
        .withColumn("cp", expr("aggregate(sequence(1L, m), " +
          "cast(0 as bigint), (a, i) -> a + 1000000000000L div i)"))
        .withColumn("pass", expr(
          "cast(pu as decimal(38,0)) * m * 20 * cp <= " +
            "cast(rnk as decimal(38,0)) * 1000000 * 1000000000000"))
      val kstar = ranked.agg(max(when(col("pass"), col("rnk"))).as("k"))
      ranked.crossJoin(broadcast(kstar))
        .select(col("nk").as("nationkey"), col("n"),
          (col("pu").cast("double") / lit(1e6)).as("p_value"),
          col("rnk").cast("long").as("rnk"),
          round(col("cp").cast("double") / lit(1e12), 6).as("c_m"),
          when(col("k").isNotNull && col("rnk") <= col("k"), 1L)
            .otherwise(0L).as("significant"))
        .orderBy(col("nationkey"))
    }),

    // -- normalized spectral entropy of the daily series (r15) ---------------
    // "Is the series one clean cycle or broadband noise?" — Shannon
    // entropy of the normalized q_periodogram power spectrum (the
    // forecastability feature in the tsfeatures/catch22 canon): H =
    // −Σ p_k·ln p_k over the 8 integer DFT band powers, normalized by
    // ln 8 (1 = flat/unforecastable, 0 = a single dominant cycle). The
    // powers are the SAME exact integer chain as q_periodogram; each
    // entropy term is nano-quantized then integer-summed (the natChi2P
    // discipline), so no cross-row float fold exists on either engine.
    "q_spectral_entropy" -> ((s, d) => {
      val coef = s.createDataFrame(dftCoeffs).toDF("m", "cq", "sq")
      val byDay = Tables.events(s, d)
        .groupBy(datediff(to_date(col("ts")),
          lit("1970-01-01").cast("date")).cast("long").as("dd"))
        .agg(count(lit(1)).as("y"))
      val d0 = byDay.agg(min(col("dd")).as("d0"))
      val frame = byDay.crossJoin(broadcast(d0))
        .select((col("dd") - col("d0")).as("t"), col("y"))
        .filter(col("t") < dftWindowDays)
      val pw = frame.withColumn("k", explode(expr("sequence(1, 8)")))
        .withColumn("m", expr(s"(k * t) % $dftWindowDays"))
        .join(broadcast(coef), "m")
        .groupBy(col("k").cast("long").as("k"))
        .agg(sum(col("y") * col("cq")).as("re_u"),
          sum(col("y") * col("sq")).as("im_u"))
        .select(expr("CAST((CAST(re_u AS DECIMAL(38,0)) * re_u " +
          "+ CAST(im_u AS DECIMAL(38,0)) * im_u) " +
          "div 1000000000000 AS BIGINT)").as("power"))
      val tot = pw.agg(sum(col("power")).as("pt"))
      val p = col("power").cast("double") / col("pt").cast("double")
      pw.crossJoin(broadcast(tot))
        .withColumn("term_u", when(col("power") > 0L && col("pt") > 0L,
          floor(-p * log(p) * lit(1e9) + lit(0.5)).cast("long"))
          .otherwise(0L))
        .agg(count(lit(1)).as("n_bins"), sum(col("term_u")).as("hu"))
        .select(col("n_bins"),
          round(col("hu").cast("double") / lit(1e9), 6).as("h_nats"),
          round(col("hu").cast("double") / lit(1e9) / log(lit(8.0)), 6)
            .as("h_norm"))
    }),

    // -- permutation-entropy ordinal patterns (r15) ---------------------------
    // Bandt–Pompe ordinal analysis of the daily-count series: each
    // 3-day window maps to the 3-bit comparison code (y₁>y₀, y₂>y₁,
    // y₂>y₀) — a tie-deterministic refinement of the 6 strict ordinal
    // permutations — and the per-pattern distribution is THE
    // model-free "how structured is this series" readout (white noise
    // → uniform; trends/cycles → concentrated). Emitted as per-pattern
    // rows (count, share, −p·log₂p term), the q_js_divergence shape, so
    // the oracle gate never sums floats across rows.
    "q_permutation_entropy" -> ((s, d) => {
      val byDay = Tables.events(s, d)
        .groupBy(datediff(to_date(col("ts")),
          lit("1970-01-01").cast("date")).cast("long").as("dd"))
        .agg(count(lit(1)).as("y"))
      val wd = Window.orderBy(col("dd"))
      val pat = byDay
        .withColumn("y1", lead(col("y"), 1).over(wd))
        .withColumn("y2", lead(col("y"), 2).over(wd))
        .filter(col("y2").isNotNull)
        .select(concat(
          (col("y1") > col("y")).cast("int").cast("string"),
          (col("y2") > col("y1")).cast("int").cast("string"),
          (col("y2") > col("y")).cast("int").cast("string"))
          .as("pattern"))
      val cnt = pat.groupBy(col("pattern")).agg(count(lit(1)).as("n"))
      val tot = cnt.agg(sum(col("n")).as("nt"))
      val pr = col("n").cast("double") / col("nt").cast("double")
      cnt.crossJoin(broadcast(tot))
        .select(col("pattern"), col("n"),
          round(pr, 6).as("p"),
          round(-pr * log2(pr), 6).as("term_bits"))
        .orderBy(col("pattern"))
    }),

    // -- turning-point randomness test (r15) ----------------------------------
    // The oldest nonparametric "is this series random" check: count
    // strict local extrema in the daily series; under i.i.d. data
    // E[T] = 2(n−2)/3 and Var(T) = (16n−29)/90, so the standardized T
    // flags both over-smoothness (trends — too few turns) and
    // oscillation (negative autocorrelation — too many). Integer count
    // off two day-frame offsets; one mirrored double z.
    "q_turning_points" -> ((s, d) => {
      val byDay = Tables.events(s, d)
        .groupBy(datediff(to_date(col("ts")),
          lit("1970-01-01").cast("date")).cast("long").as("dd"))
        .agg(count(lit(1)).as("y"))
      val wd = Window.orderBy(col("dd"))
      val t = byDay
        .withColumn("yp", lag(col("y"), 1).over(wd))
        .withColumn("yn", lead(col("y"), 1).over(wd))
        .agg(count(lit(1)).as("n"),
          sum(when(col("yp").isNotNull && col("yn").isNotNull &&
            ((col("y") > col("yp") && col("y") > col("yn")) ||
              (col("y") < col("yp") && col("y") < col("yn"))), 1L)
            .otherwise(0L)).as("t"))
      val nD = col("n").cast("double")
      val e = lit(2.0) * (nD - lit(2.0)) / lit(3.0)
      val v = (lit(16.0) * nD - lit(29.0)) / lit(90.0)
      val z = round((col("t").cast("double") - e) / sqrt(v), 6)
      t.select(col("n").as("n_days"), col("t").as("n_turning"),
        round(e, 6).as("expected"), z.as("z"),
        (abs(z) <= lit(1.959964)).as("is_random_5pct"))
    }),

    // -- SAX symbolic motifs over the daily-mean series (r15) ----------------
    // Symbolic Aggregate approXimation (Lin et al. 2003): z-normalize
    // the daily micro-mean series, discretize into a 4-letter alphabet
    // at the Gaussian breakpoints (−0.6745, 0, +0.6745 — quartiles of
    // N(0,1)), and count 3-letter motifs — the "what shapes does this
    // series keep making" readout behind q_matrix_profile's nearest-
    // neighbor lens. Day means are the exact integer micro-quantization
    // q_seasonal_strength uses; μ/σ are mirrored doubles off exact
    // integer moments (σ guarded by greatest(0,·) against float-negative
    // variance); motifs ride the calendar-bounded day window.
    "q_sax_motifs" -> ((s, d) => {
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val byDay = Tables.eventsWithTime(s, d)
        .select(expr("ts_us div 86400000000").as("day"),
          floor(col("value") * lit(1000.0) + lit(0.5)).cast("long")
            .as("vq"))
        .groupBy(col("day"))
        .agg(count(lit(1)).as("n"), sum(col("vq")).as("sq"))
        .withColumn("xm", expr("(sq * 1000) div n"))
      val m = byDay.agg(count(lit(1)).as("nd"), sum(col("xm")).as("sx"),
          sum(dec(col("xm")) * dec(col("xm"))).as("sxx"))
        .withColumn("mu",
          col("sx").cast("double") / col("nd").cast("double"))
        .withColumn("sig", sqrt(greatest(lit(0.0),
          (col("sxx").cast("double") - col("sx").cast("double") *
            col("sx").cast("double") / col("nd").cast("double")) /
            col("nd").cast("double"))))
      val xd = col("xm").cast("double")
      val sym = byDay.crossJoin(broadcast(m))
        .withColumn("sym",
          when(xd < col("mu") - lit(0.6745) * col("sig"), "a")
            .when(xd < col("mu"), "b")
            .when(xd < col("mu") + lit(0.6745) * col("sig"), "c")
            .otherwise("d"))
      val wd = Window.orderBy(col("day"))
      sym.withColumn("s1", lead(col("sym"), 1).over(wd))
        .withColumn("s2", lead(col("sym"), 2).over(wd))
        .filter(col("s2").isNotNull)
        .withColumn("motif", concat(col("sym"), col("s1"), col("s2")))
        .groupBy(col("motif"))
        .agg(count(lit(1)).as("n_occurrences"),
          min(col("day")).as("first_day"))
        .orderBy(col("n_occurrences").desc, col("motif").asc)
        .limit(10)
    }),

    // -- KPSS level-stationarity test (r15) ----------------------------------
    // The COMPLEMENT of a trend test: KPSS's null is stationarity, so it
    // catches the series q_mann_kendall's null lets through. η =
    // (l+1)·Σ S_t² / (n·[(l+1)γ₀ + 2Σ_{j≤l}(l+1−j)γ_j]) over
    // milli-quantized demeaned daily counts — partial sums and Bartlett-
    // weighted autocovariances ride the calendar-bounded day frame
    // (position index t from a day-frame window; lags via a bounded
    // t+j self-join, j ≤ l = ⌊4(n/100)^¼⌋). Multiplying the Bartlett
    // weights through by (l+1) keeps the WHOLE denominator integer —
    // no ordered float fold anywhere; one final double division.
    "q_kpss" -> ((s, d) => {
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val byDay = Tables.events(s, d)
        .groupBy(datediff(to_date(col("ts")),
          lit("1970-01-01").cast("date")).cast("long").as("dd"))
        .agg(count(lit(1)).as("y"))
      val m = byDay.agg(count(lit(1)).as("n"), sum(col("y")).as("sy"))
        .withColumn("mu", col("sy").cast("double") / col("n").cast("double"))
        .withColumn("l", floor(lit(4.0) *
          pow(col("n").cast("double") / lit(100.0), 0.25)).cast("long"))
      val wd = Window.orderBy(col("dd"))
      val e = byDay.crossJoin(broadcast(m))
        .withColumn("eu", floor((col("y").cast("double") - col("mu")) *
          lit(1000.0) + lit(0.5)).cast("long"))
        .withColumn("t", row_number().over(wd))
        .select(col("t"), col("eu"), col("n"), col("l"))
      val num = e
        .withColumn("st", sum(col("eu")).over(
          Window.orderBy(col("t")).rowsBetween(Window.unboundedPreceding,
            Window.currentRow)))
        .agg(sum(dec(col("st")) * dec(col("st"))).as("ss2"))
      val lags = e.select(col("t"), col("eu"))
        .crossJoin(broadcast(m.select(col("l"))))
        .withColumn("j", explode(expr("sequence(0, l)")))
        .select((col("t") + col("j")).as("t2"), col("t"), col("j"),
          col("eu").as("ea"))
      val gam = lags.join(e.select(col("t").as("t2"),
          col("eu").as("eb")), "t2")
        .groupBy(col("j"))
        .agg(sum(dec(col("ea")) * dec(col("eb"))).as("g"))
      val den = gam.crossJoin(broadcast(m.select(col("l"))))
        .agg(sum(when(col("j") === 0L, dec(col("l") + 1L) * col("g"))
          .otherwise(dec(lit(2L)) * dec(col("l") + 1L - col("j")) *
            col("g"))).as("den_u"))
      num.crossJoin(broadcast(den)).crossJoin(broadcast(m))
        .select(col("n").as("n_days"), col("l").as("l_bartlett"),
          when(col("den_u") > dec(lit(0L)), round(
            (col("l") + 1L).cast("double") * col("ss2").cast("double") /
              (col("n").cast("double") * col("den_u").cast("double")),
            6)).as("eta"),
          when(col("den_u") > dec(lit(0L)),
            (col("l") + 1L).cast("double") * col("ss2").cast("double") /
              (col("n").cast("double") * col("den_u").cast("double")) >
              0.463).as("reject_5pct"))
    })
  )

  /** Per-nation status-mix independence χ² + micro-quantized p-value
    * frame (nk, n, x2u, pu) — the shared multiple-testing input of
    * q_bh_fdr and q_holm_bonferroni, factored so the two procedures
    * cannot drift from different test statistics. Densified nation ×
    * status grid; per-cell terms nano-quantized then integer-summed;
    * p from the df=2 closed form e^(−χ²/2). */
  private def natChi2P(s: SparkSession, d: String): DataFrame = {
    val oc = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderstatus").as("st"))
      .join(Tables.customer(s, d).select(
        col("c_custkey").as("o_custkey"),
        col("c_nationkey").cast("long").as("nk")), "o_custkey")
    val cell = oc.groupBy(col("nk"), col("st")).agg(count(lit(1)).as("o"))
    val nat = cell.groupBy(col("nk")).agg(sum(col("o")).as("ni"))
    val glob = cell.groupBy(col("st")).agg(sum(col("o")).as("gc"))
    val tot = cell.agg(sum(col("o")).as("nn"))
    val grid = nat.crossJoin(broadcast(glob))
    val terms = grid
      .join(cell, Seq("nk", "st"), "left")
      .na.fill(0L, Seq("o"))
      .crossJoin(broadcast(tot))
      .withColumn("e", col("ni").cast("double") *
        col("gc").cast("double") / col("nn").cast("double"))
      .withColumn("tu", floor(
        (col("o").cast("double") - col("e")) *
          (col("o").cast("double") - col("e")) / col("e") *
          lit(1e9) + lit(0.5)).cast("long"))
    terms.groupBy(col("nk"))
      .agg(max(col("ni")).as("n"), sum(col("tu")).as("x2u"))
      .withColumn("pu", floor(
        exp(-col("x2u").cast("double") / lit(2e9)) * lit(1e6) +
          lit(0.5)).cast("long"))
  }

  def declaredOracle: Seq[(String, String)] = Seq(
    // DECIMAL sums widen exactly like Spark's decimal(38,0) (DuckDB sums
    // BIGINT into HUGEINT); the closed form mirrors the Spark expression
    // token-for-token, e-notation literals forcing DOUBLE arithmetic
    "q_group_ols" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) AS us,
        |    CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS vq
        |  FROM events),
        |b AS (SELECT min(us) AS us0 FROM e),
        |xy AS (SELECT event_type, (us - us0) // 1000000 AS xs, vq
        |  FROM e CROSS JOIN b),
        |m AS (SELECT event_type, count(*) AS n,
        |    sum(xs) AS sx, sum(vq) AS sy,
        |    sum(CAST(xs AS HUGEINT) * xs) AS sxx,
        |    sum(CAST(xs AS HUGEINT) * vq) AS sxy,
        |    sum(CAST(vq AS HUGEINT) * vq) AS syy
        |  FROM xy GROUP BY 1),
        |f AS (SELECT event_type, n,
        |    CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
        |    CAST(sy AS DOUBLE) AS syd, CAST(sxx AS DOUBLE) AS sxxd,
        |    CAST(sxy AS DOUBLE) AS sxyd, CAST(syy AS DOUBLE) AS syyd
        |  FROM m)
        |SELECT event_type, n,
        |  CASE WHEN nd * sxxd - sxd * sxd <> 0.0e0 THEN
        |    round((nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)
        |      * 86.4e0, 6) END AS slope_per_day,
        |  CASE WHEN nd * sxxd - sxd * sxd <> 0.0e0 THEN
        |    round((syd - (nd * sxyd - sxd * syd)
        |      / (nd * sxxd - sxd * sxd) * sxd) / nd / 1000.0e0, 6)
        |    END AS intercept,
        |  CASE WHEN nd * sxxd - sxd * sxd <> 0.0e0
        |      AND nd * syyd - syd * syd <> 0.0e0 THEN
        |    round((nd * sxyd - sxd * syd) * (nd * sxyd - sxd * syd)
        |      / ((nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd)), 6)
        |    END AS r2
        |FROM f ORDER BY event_type""".stripMargin,

    // integer Poisson thresholds on the 53-bit hash — no float CDF; the
    // rep means compare as micro-quantized integers with rep tiebreak
    "q_bootstrap_ci" -> {
      val thr = poissonThresholds
      s"""WITH ev AS (SELECT event_id, event_type,
         |    CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS vq
         |  FROM events),
         |er AS (SELECT event_id, event_type, vq, r
         |  FROM ev CROSS JOIN (SELECT unnest(range(0, $bootstrapReps))
         |    AS r)),
         |${OracleHash.splitmixStages("er", "event_type, vq, r",
            "(event_id*1000003 + r*7919 + 5)::UBIGINT")},
         |wts AS (SELECT event_type, vq, r,
         |    CAST((xor(z3, z3 >> 31) >> 11) AS BIGINT) AS hq FROM p3_),
         |ws AS (SELECT event_type, r, vq,
         |    ${thr.map(t => s"(CASE WHEN hq >= $t THEN 1 ELSE 0 END)")
               .mkString(" + ")} AS w
         |  FROM wts),
         |reps AS (SELECT event_type, r,
         |    CAST(sum(w * vq) AS BIGINT) AS swy,
         |    CAST(sum(w) AS BIGINT) AS sw
         |  FROM ws GROUP BY 1, 2),
         |mq AS (SELECT event_type, r,
         |    CASE WHEN sw = 0 THEN 9223372036854775807
         |    ELSE CAST(floor(CAST(swy AS DOUBLE) / sw * 1000.0 + 0.5)
         |      AS BIGINT) END AS mq
         |  FROM reps),
         |rk AS (SELECT event_type, mq, row_number() OVER (
         |    PARTITION BY event_type ORDER BY mq, r) AS rnk FROM mq),
         |ci AS (SELECT event_type, min(mq) AS lo_u, max(mq) AS hi_u
         |  FROM rk WHERE rnk IN (5, 95) GROUP BY 1),
         |pt AS (SELECT event_type, count(*) AS n,
         |    CAST(sum(vq) AS BIGINT) AS svq FROM ev GROUP BY 1)
         |SELECT pt.event_type, pt.n,
         |  round(CAST(svq AS DOUBLE) / n / 1000.0e0, 6) AS mean,
         |  CAST(lo_u AS DOUBLE) / 1000000.0e0 AS ci_lo,
         |  CAST(hi_u AS DOUBLE) / 1000000.0e0 AS ci_hi
         |FROM pt JOIN ci USING (event_type)
         |ORDER BY event_type""".stripMargin
    },

    // (days + 3) % 7 with 0 = Monday on both engines; σ under one sqrt
    // from exact integer moments
    "q_seasonal_dow" ->
      """WITH e AS (SELECT
        |    ((epoch_us(ts) // 86400000000) + 3) % 7 AS dow,
        |    CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS vq
        |  FROM events),
        |d AS (SELECT dow, count(*) AS n,
        |    CAST(sum(vq) AS BIGINT) AS sy,
        |    CAST(sum(vq * vq) AS BIGINT) AS syy
        |  FROM e GROUP BY 1),
        |g AS (SELECT CAST(sum(sy) AS BIGINT) AS gy,
        |    CAST(sum(n) AS BIGINT) AS gn FROM d)
        |SELECT dow, n,
        |  round(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) / 1000.0e0, 6)
        |    AS dow_mean,
        |  round((CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
        |    - CAST(gy AS DOUBLE) / CAST(gn AS DOUBLE)) / 1000.0e0, 6)
        |    AS seasonal,
        |  round(sqrt((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) / 1000.0e0, 6)
        |    AS resid_sd
        |FROM d CROSS JOIN g ORDER BY dow""".stripMargin,

    // centered 7-row MA (full windows only), per-dow mean of detrended
    // integers floor(x+0.5)-quantized; every output = micro-int / 1e6
    "q_stl_decompose" ->
      """WITH e AS (SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS vq
        |  FROM events),
        |g AS (SELECT day, count(*) AS n, sum(vq) AS sq
        |  FROM e GROUP BY day),
        |g2 AS (SELECT day, n, sq, (sq * 1000) // n AS xm,
        |    (day + 3) % 7 AS dow FROM g),
        |t AS (SELECT *,
        |    CASE WHEN count(*) OVER w7 = 7
        |      THEN (sum(xm) OVER w7) // 7 END AS trend_u
        |  FROM g2 WINDOW w7 AS (ORDER BY day
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |sd AS (SELECT dow, CAST(floor(
        |    CAST(sum(xm - trend_u) AS DOUBLE) / count(*) + 0.5)
        |    AS BIGINT) AS s_u
        |  FROM t WHERE trend_u IS NOT NULL GROUP BY dow)
        |SELECT CAST(t.day AS BIGINT) AS day,
        |  CAST(t.dow AS BIGINT) AS dow, CAST(t.n AS BIGINT) AS n,
        |  CAST(xm AS DOUBLE) / 1e6 AS x,
        |  CAST(trend_u AS DOUBLE) / 1e6 AS trend,
        |  CAST(s_u AS DOUBLE) / 1e6 AS seasonal,
        |  CAST(xm - trend_u - s_u AS DOUBLE) / 1e6 AS remainder
        |FROM t LEFT JOIN sd ON sd.dow = t.dow
        |ORDER BY day""".stripMargin,

    // exact prefix integers under one window; ln constants from the
    // same literals; LLR micro-quantized before every boundary compare
    "q_ab_sprt" ->
      """WITH e AS (SELECT event_id, epoch_us(ts) AS us,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
        |  FROM events),
        |c AS (SELECT event_id,
        |    CAST(sum(conv) OVER (ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS k,
        |    CAST(count(*) OVER (ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS n
        |  FROM e),
        |l AS (SELECT k, n, CAST(floor(
        |    (k * ln(0.22e0 / 0.18e0) + (n - k) * ln(0.78e0 / 0.82e0))
        |      * 1000000.0 + 0.5) AS BIGINT) AS llr_u
        |  FROM c),
        |bnd AS (SELECT
        |    CAST(floor(ln(0.95e0 / 0.05e0) * 1000000.0 + 0.5) AS BIGINT)
        |      AS au,
        |    CAST(floor(ln(0.05e0 / 0.95e0) * 1000000.0 + 0.5) AS BIGINT)
        |      AS bu),
        |crossed AS (SELECT n AS first_n, llr_u AS cross_u,
        |    CASE WHEN llr_u >= au THEN 'reject_h0'
        |         ELSE 'accept_h0' END AS decision
        |  FROM l CROSS JOIN bnd
        |  WHERE llr_u >= au OR llr_u <= bu
        |  ORDER BY n LIMIT 1),
        |tot AS (SELECT max(n) AS n_total, max(k) AS k_total FROM l),
        |fin AS (SELECT n_total, k_total, CAST(floor(
        |    (k_total * ln(0.22e0 / 0.18e0)
        |      + (n_total - k_total) * ln(0.78e0 / 0.82e0))
        |      * 1000000.0 + 0.5) AS BIGINT) AS final_u FROM tot)
        |SELECT n_total, k_total,
        |  coalesce(first_n, n_total) AS decided_at,
        |  coalesce(decision, 'continue') AS decision,
        |  coalesce(cross_u, final_u) / 1e6 AS llr
        |FROM fin LEFT JOIN crossed ON true""".stripMargin,

    // lower-median rank ⌈n/2⌉ under the (vq, event_id) total order on
    // both engines; the 3·MAD cut is a pure integer comparison
    "q_outlier_mad" ->
      """WITH e AS (SELECT event_type, event_id,
        |    CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS vq
        |  FROM events),
        |r1 AS (SELECT event_type, vq,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY vq, event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM e),
        |med AS (SELECT event_type, vq AS med FROM r1
        |  WHERE rn = (n + 1) // 2),
        |dev AS (SELECT e.event_type, e.event_id, e.vq,
        |    abs(e.vq - med.med) AS adev, med.med
        |  FROM e JOIN med USING (event_type)),
        |r2 AS (SELECT event_type, adev,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY adev, event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM dev),
        |mad AS (SELECT event_type, adev AS mad FROM r2
        |  WHERE rn = (n + 1) // 2)
        |SELECT dev.event_type, count(*) AS n,
        |  CAST(max(dev.med) AS DOUBLE) / 1000.0 AS median,
        |  CAST(max(mad.mad) AS DOUBLE) / 1000.0 AS mad,
        |  CAST(sum(CASE WHEN dev.adev > 3 * mad.mad THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_outliers,
        |  round(CAST(sum(CASE WHEN dev.adev > 3 * mad.mad THEN 1
        |    ELSE 0 END) AS DOUBLE) / count(*), 6) AS outlier_pct
        |FROM dev JOIN mad USING (event_type)
        |GROUP BY dev.event_type ORDER BY dev.event_type""".stripMargin,

    // the shared classifier chain (OracleHash.classifierScoreCtes);
    // logistic link then micro-quantization BEFORE the bin agg
    "q_calibration" ->
      s"""WITH ${OracleHash.classifierScoreCtes("doc_id, n_chars")},
         |pr AS (SELECT doc_id, n_chars, CAST(floor(
         |    1.0e0 / (1.0e0 + exp(-CAST(score AS DOUBLE) / 4.0e0))
         |      * 1000000.0e0 + 0.5) AS BIGINT) AS pu
         |  FROM sc),
         |bn AS (SELECT least(pu // 100000, 9) AS bin, count(*) AS n,
         |    CAST(sum(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_pos,
         |    CAST(sum(pu) AS BIGINT) AS spu
         |  FROM pr GROUP BY 1)
         |SELECT bin, n, n_pos,
         |  round(CAST(spu AS DOUBLE) / n / 1000000.0e0, 6) AS mean_pred,
         |  round(CAST(n_pos AS DOUBLE) / n, 6) AS rate
         |FROM bn ORDER BY bin""".stripMargin,

    // exact minimax PAVA on the bounded bin frame: interval means are
    // integer micro-divisions, max-of-min decides on integers
    "q_isotonic" ->
      s"""WITH ${OracleHash.classifierScoreCtes("doc_id, n_chars")},
         |pr AS (SELECT doc_id, n_chars, CAST(floor(
         |    1.0e0 / (1.0e0 + exp(-CAST(score AS DOUBLE) / 4.0e0))
         |      * 1000000.0e0 + 0.5) AS BIGINT) AS pu
         |  FROM sc),
         |bn AS (SELECT least(pu // 100000, 9) AS bin, count(*) AS n,
         |    CAST(sum(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_pos
         |  FROM pr GROUP BY 1),
         |c AS (SELECT bin, n, n_pos,
         |    CAST(sum(n) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED
         |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cn,
         |    CAST(sum(n_pos) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED
         |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cp
         |  FROM bn),
         |iv AS (SELECT j.bin AS j, k.bin AS k,
         |    ((k.cp - (j.cp - j.n_pos)) * 1000000)
         |      // (k.cn - (j.cn - j.n)) AS m_u
         |  FROM c j CROSS JOIN c k WHERE j.bin <= k.bin),
         |mn AS (SELECT c.bin AS i, iv.j, min(m_u) AS mn
         |  FROM c JOIN iv ON iv.j <= c.bin AND iv.k >= c.bin
         |  GROUP BY 1, 2),
         |iso AS (SELECT i, max(mn) AS iso_u FROM mn GROUP BY i)
         |SELECT c.bin, c.n, c.n_pos,
         |  CAST((c.n_pos * 1000000) // c.n AS DOUBLE) / 1e6 AS rate,
         |  CAST(iso_u AS DOUBLE) / 1e6 AS iso_rate
         |FROM c JOIN iso ON iso.i = c.bin ORDER BY c.bin""".stripMargin,

    // doubled midranks on the distinct-value frame; HUGEINT products
    // mirror Spark's decimal(38,0); one shared double expression for z
    "q_mann_whitney" ->
      """WITH e AS (SELECT
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g1,
        |    CAST(floor(value * 1000.0e0 + 0.5e0) AS BIGINT) AS vq
        |  FROM events WHERE event_type IN ('purchase', 'click')),
        |bv AS (SELECT vq, count(*) AS cnt,
        |    CAST(sum(g1) AS BIGINT) AS cnt1 FROM e GROUP BY 1),
        |rk AS (SELECT vq, cnt, cnt1,
        |    CAST(sum(cnt) OVER (ORDER BY vq ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cum FROM bv),
        |r2 AS (SELECT cnt, cnt1, 2 * (cum - cnt) + cnt + 1 AS r2
        |  FROM rk),
        |m AS (SELECT CAST(sum(cnt1) AS BIGINT) AS n1,
        |    CAST(sum(cnt - cnt1) AS BIGINT) AS n2,
        |    sum(CAST(cnt1 AS HUGEINT) * CAST(r2 AS HUGEINT)) AS r1d,
        |    sum(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS tsum FROM r2)
        |SELECT n1, n2,
        |  round((CAST(r1d AS DOUBLE)
        |    - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0e0))
        |    / 2.0e0, 1) AS u1,
        |  CASE WHEN sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0e0
        |      * ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) + 1.0e0)
        |        - CAST(tsum AS DOUBLE)
        |          / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
        |            * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1.0e0))))
        |      <> 0
        |    THEN round(((CAST(r1d AS DOUBLE)
        |      - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0e0))
        |      - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
        |      / (2.0e0 * sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |        / 12.0e0
        |        * ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) + 1.0e0)
        |          - CAST(tsum AS DOUBLE)
        |            / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
        |              * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)
        |                - 1.0e0))))), 6)
        |  END AS z
        |FROM m""".stripMargin,

    // densified 25x3 grid; nano-quantized cell terms; closed-form df=2
    // p-value; pure-integer BH step-up compare
    "q_bh_fdr" ->
      """WITH oc AS (SELECT CAST(c.c_nationkey AS BIGINT) AS nk,
        |    o.o_orderstatus AS st
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |cell AS (SELECT nk, st, count(*) AS o FROM oc GROUP BY 1, 2),
        |nat AS (SELECT nk, CAST(sum(o) AS BIGINT) AS ni
        |  FROM cell GROUP BY 1),
        |gshare AS (SELECT st, CAST(sum(o) AS BIGINT) AS gc
        |  FROM cell GROUP BY 1),
        |tot AS (SELECT CAST(sum(o) AS BIGINT) AS nn FROM cell),
        |grid AS (SELECT nat.nk, nat.ni, gshare.st, gshare.gc
        |  FROM nat CROSS JOIN gshare),
        |terms AS (SELECT g.nk, g.ni, coalesce(cell.o, 0) AS o,
        |    CAST(g.ni AS DOUBLE) * CAST(g.gc AS DOUBLE)
        |      / CAST(tot.nn AS DOUBLE) AS e
        |  FROM grid g LEFT JOIN cell ON cell.nk = g.nk AND cell.st = g.st
        |  CROSS JOIN tot),
        |tu AS (SELECT nk, ni, CAST(floor(
        |    (CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e) / e
        |      * 1e9 + 0.5e0) AS BIGINT) AS tu FROM terms),
        |x2 AS (SELECT nk, max(ni) AS n, CAST(sum(tu) AS BIGINT) AS x2u
        |  FROM tu GROUP BY 1),
        |pp AS (SELECT nk, n, x2u, CAST(floor(
        |    exp(-CAST(x2u AS DOUBLE) / 2e9) * 1e6 + 0.5e0) AS BIGINT)
        |    AS pu FROM x2),
        |rk AS (SELECT nk, n, x2u, pu,
        |    row_number() OVER (ORDER BY pu, nk) AS rnk,
        |    count(*) OVER () AS m FROM pp),
        |ks AS (SELECT max(CASE WHEN pu * m * 20 <= rnk * 1000000
        |    THEN rnk END) AS k FROM rk)
        |SELECT nk AS nationkey, n,
        |  round(CAST(x2u AS DOUBLE) / 1e9, 6) AS x2,
        |  CAST(pu AS DOUBLE) / 1e6 AS p_value, rnk,
        |  CAST(CASE WHEN k IS NOT NULL AND rnk <= k THEN 1 ELSE 0 END
        |    AS BIGINT) AS significant
        |FROM rk CROSS JOIN ks ORDER BY nationkey""".stripMargin,

    // same χ²/p CTE chain as q_bh_fdr; exact integer step-down
    "q_holm_bonferroni" ->
      """WITH oc AS (SELECT CAST(c.c_nationkey AS BIGINT) AS nk,
        |    o.o_orderstatus AS st
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |cell AS (SELECT nk, st, count(*) AS o FROM oc GROUP BY 1, 2),
        |nat AS (SELECT nk, CAST(sum(o) AS BIGINT) AS ni
        |  FROM cell GROUP BY 1),
        |gshare AS (SELECT st, CAST(sum(o) AS BIGINT) AS gc
        |  FROM cell GROUP BY 1),
        |tot AS (SELECT CAST(sum(o) AS BIGINT) AS nn FROM cell),
        |grid AS (SELECT nat.nk, nat.ni, gshare.st, gshare.gc
        |  FROM nat CROSS JOIN gshare),
        |terms AS (SELECT g.nk, g.ni, coalesce(cell.o, 0) AS o,
        |    CAST(g.ni AS DOUBLE) * CAST(g.gc AS DOUBLE)
        |      / CAST(tot.nn AS DOUBLE) AS e
        |  FROM grid g LEFT JOIN cell ON cell.nk = g.nk AND cell.st = g.st
        |  CROSS JOIN tot),
        |tu AS (SELECT nk, ni, CAST(floor(
        |    (CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e) / e
        |      * 1e9 + 0.5e0) AS BIGINT) AS tu FROM terms),
        |x2 AS (SELECT nk, max(ni) AS n, CAST(sum(tu) AS BIGINT) AS x2u
        |  FROM tu GROUP BY 1),
        |pp AS (SELECT nk, n, x2u, CAST(floor(
        |    exp(-CAST(x2u AS DOUBLE) / 2e9) * 1e6 + 0.5e0) AS BIGINT)
        |    AS pu FROM x2),
        |rk AS (SELECT nk, n, pu,
        |    row_number() OVER (ORDER BY pu, nk) AS rnk,
        |    count(*) OVER () AS m FROM pp),
        |st2 AS (SELECT *, pu * (m - rnk + 1) AS stepu,
        |    CASE WHEN pu * (m - rnk + 1) * 20 > 1000000 THEN 1 ELSE 0 END
        |      AS fail FROM rk),
        |fin AS (SELECT *,
        |    least(1000000, max(stepu) OVER (ORDER BY pu, nk)) AS adj_u,
        |    CAST(sum(fail) OVER (ORDER BY pu, nk) AS BIGINT) AS nfail
        |  FROM st2)
        |SELECT nk AS nationkey, n,
        |  CAST(pu AS DOUBLE) / 1e6 AS p_value,
        |  CAST(rnk AS BIGINT) AS rnk,
        |  CAST(adj_u AS DOUBLE) / 1e6 AS p_holm,
        |  CAST(CASE WHEN nfail = 0 THEN 1 ELSE 0 END AS BIGINT)
        |    AS significant
        |FROM fin ORDER BY nationkey""".stripMargin,

    // HUGEINT group moments; micro-quantized weights summed exactly;
    // mirrored F*, df2
    "q_welch_anova" ->
      """WITH e AS (SELECT event_type,
        |    CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS vq
        |  FROM events),
        |g AS (SELECT event_type, count(*) AS ng,
        |    sum(vq) AS s1, sum(vq * vq) AS s2
        |  FROM e GROUP BY 1
        |  HAVING count(*) > 1
        |    AND count(*) * sum(CAST(vq AS HUGEINT) * vq)
        |      > sum(CAST(vq AS HUGEINT)) * sum(CAST(vq AS HUGEINT))),
        |wts AS (SELECT event_type, ng,
        |    CAST(floor(CAST(ng AS DOUBLE)
        |      / ((CAST(s2 AS DOUBLE) / 1e6
        |          - (CAST(s1 AS DOUBLE) / 1000.0)
        |            * (CAST(s1 AS DOUBLE) / CAST(ng AS DOUBLE) / 1000.0))
        |         / (CAST(ng AS DOUBLE) - 1.0e0))
        |      * 1e6 + 0.5e0) AS BIGINT) AS wq,
        |    CAST(floor(CAST(ng AS DOUBLE)
        |      / ((CAST(s2 AS DOUBLE) / 1e6
        |          - (CAST(s1 AS DOUBLE) / 1000.0)
        |            * (CAST(s1 AS DOUBLE) / CAST(ng AS DOUBLE) / 1000.0))
        |         / (CAST(ng AS DOUBLE) - 1.0e0))
        |      * (CAST(s1 AS DOUBLE) / CAST(ng AS DOUBLE) / 1000.0)
        |      * 1e6 + 0.5e0) AS BIGINT) AS wmq,
        |    CAST(s1 AS DOUBLE) / CAST(ng AS DOUBLE) / 1000.0 AS mg
        |  FROM g),
        |tot AS (SELECT count(*) AS k, CAST(sum(wq) AS BIGINT) AS sw,
        |    CAST(sum(wmq) AS BIGINT) AS swm FROM wts),
        |terms AS (SELECT ng, k, sw,
        |    CAST(floor((CAST(wq AS DOUBLE) / 1e6)
        |      * (mg - CAST(swm AS DOUBLE) / CAST(sw AS DOUBLE))
        |      * (mg - CAST(swm AS DOUBLE) / CAST(sw AS DOUBLE))
        |      * 1e6 + 0.5e0) AS BIGINT) AS aq,
        |    CAST(floor((1.0e0 - (CAST(wq AS DOUBLE) / 1e6)
        |        / (CAST(sw AS DOUBLE) / 1e6))
        |      * (1.0e0 - (CAST(wq AS DOUBLE) / 1e6)
        |        / (CAST(sw AS DOUBLE) / 1e6))
        |      / (CAST(ng AS DOUBLE) - 1.0e0) * 1e9 + 0.5e0) AS BIGINT)
        |      AS hq
        |  FROM wts CROSS JOIN tot),
        |fin AS (SELECT k, CAST(sum(ng) AS BIGINT) AS n,
        |    CAST(sum(aq) AS BIGINT) AS sa, CAST(sum(hq) AS BIGINT) AS sh
        |  FROM terms GROUP BY k)
        |SELECT n, CAST(k AS BIGINT) AS k,
        |  floor((CAST(sa AS DOUBLE) / 1e6) / (CAST(k AS DOUBLE) - 1.0e0)
        |    / (1.0e0 + 2.0e0 * (CAST(k AS DOUBLE) - 2.0e0)
        |      / (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0e0)
        |      * (CAST(sh AS DOUBLE) / 1e9)) * 1e6 + 0.5e0) / 1e6
        |    AS f_welch,
        |  CAST(k - 1 AS BIGINT) AS df1,
        |  floor((CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0e0)
        |    / (3.0e0 * (CAST(sh AS DOUBLE) / 1e9)) * 1e6 + 0.5e0) / 1e6
        |    AS df2
        |FROM fin""".stripMargin,

    // HUGEINT group moments; N-normalized micro SS terms; mirrored ICC
    "q_icc" ->
      """WITH oc AS (SELECT CAST(c.c_nationkey AS BIGINT) AS nk,
        |    CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |g AS (SELECT nk, count(*) AS ng, sum(cents) AS s1,
        |    sum(cents * cents) AS s2
        |  FROM oc GROUP BY 1 HAVING count(*) > 1),
        |t AS (SELECT CAST(sum(ng) AS BIGINT) AS nn,
        |    sum(s1) AS gs1, count(*) AS k, sum(ng::HUGEINT * ng) AS sn2
        |  FROM g),
        |terms AS (SELECT nn, k, sn2,
        |    CAST(floor(CAST(ng AS DOUBLE)
        |      * (CAST(s1 AS DOUBLE) / CAST(ng AS DOUBLE)
        |         - CAST(gs1 AS DOUBLE) / CAST(nn AS DOUBLE))
        |      * (CAST(s1 AS DOUBLE) / CAST(ng AS DOUBLE)
        |         - CAST(gs1 AS DOUBLE) / CAST(nn AS DOUBLE))
        |      / CAST(nn AS DOUBLE) + 0.5e0) AS BIGINT) AS bq,
        |    CAST(floor((CAST(s2 AS DOUBLE)
        |      - (CAST(s1 AS DOUBLE) / CAST(ng AS DOUBLE))
        |        * CAST(s1 AS DOUBLE))
        |      / CAST(nn AS DOUBLE) + 0.5e0) AS BIGINT) AS wq
        |  FROM g CROSS JOIN t),
        |fin AS (SELECT nn, k, sn2, CAST(sum(bq) AS BIGINT) AS ssb,
        |    CAST(sum(wq) AS BIGINT) AS ssw
        |  FROM terms GROUP BY 1, 2, 3),
        |x AS (SELECT nn, k,
        |    CAST(ssb AS DOUBLE) * CAST(nn AS DOUBLE)
        |      / (CAST(k AS DOUBLE) - 1.0e0) AS msb,
        |    CAST(ssw AS DOUBLE) * CAST(nn AS DOUBLE)
        |      / (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE)) AS msw,
        |    (CAST(nn AS DOUBLE) - CAST(sn2 AS DOUBLE)
        |      / CAST(nn AS DOUBLE)) / (CAST(k AS DOUBLE) - 1.0e0) AS n0
        |  FROM fin)
        |SELECT nn AS n, CAST(k AS BIGINT) AS k,
        |  floor(n0 * 1e6 + 0.5e0) / 1e6 AS n0,
        |  CASE WHEN msb + (n0 - 1.0e0) * msw <> 0.0
        |    THEN floor((msb - msw) / (msb + (n0 - 1.0e0) * msw)
        |      * 1e6 + 0.5e0) / 1e6 END AS icc
        |FROM x""".stripMargin,

    // HUGEINT moments; mirrored Welch SE + z's; integer-quantized verdict
    "q_tost" ->
      """WITH e AS (SELECT
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g,
        |    CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS vq
        |  FROM events WHERE event_type IN ('purchase', 'click')),
        |m AS (SELECT g, count(*) AS n, sum(vq) AS s1,
        |    sum(vq * vq) AS s2 FROM e GROUP BY 1),
        |w AS (SELECT
        |    CAST(max(CASE WHEN g = 1 THEN n END) AS BIGINT) AS n1,
        |    max(CASE WHEN g = 1 THEN s1 END) AS a1,
        |    max(CASE WHEN g = 1 THEN s2 END) AS a2,
        |    CAST(max(CASE WHEN g = 0 THEN n END) AS BIGINT) AS n2,
        |    max(CASE WHEN g = 0 THEN s1 END) AS b1,
        |    max(CASE WHEN g = 0 THEN s2 END) AS b2
        |  FROM m),
        |x AS (SELECT n1, n2,
        |    CAST(a1 AS DOUBLE) / n1 / 1000.0e0 AS m1,
        |    CAST(b1 AS DOUBLE) / n2 / 1000.0e0 AS m2,
        |    sqrt(((CAST(a2 AS DOUBLE) / 1e6 - (CAST(a1 AS DOUBLE)
        |        / 1000.0e0) * (CAST(a1 AS DOUBLE) / n1 / 1000.0e0))
        |        / (CAST(n1 AS DOUBLE) - 1.0e0)) / n1
        |      + ((CAST(b2 AS DOUBLE) / 1e6 - (CAST(b1 AS DOUBLE)
        |        / 1000.0e0) * (CAST(b1 AS DOUBLE) / n2 / 1000.0e0))
        |        / (CAST(n2 AS DOUBLE) - 1.0e0)) / n2) AS se
        |  FROM w),
        |x2 AS (SELECT n1, n2, m1, m2, se,
        |    CASE WHEN se > 0 THEN se END AS seg FROM x)
        |SELECT n1, n2,
        |  floor((m1 - m2) * 1e6 + 0.5e0) / 1e6 AS diff,
        |  floor(se * 1e6 + 0.5e0) / 1e6 AS se,
        |  floor(((m1 - m2) + 0.5e0) / seg * 1e6 + 0.5e0) / 1e6 AS z_lower,
        |  floor((0.5e0 - (m1 - m2)) / seg * 1e6 + 0.5e0) / 1e6 AS z_upper,
        |  coalesce(floor(((m1 - m2) + 0.5e0) / seg * 1e6 + 0.5e0) > 1644854
        |    AND floor((0.5e0 - (m1 - m2)) / seg * 1e6 + 0.5e0) > 1644854,
        |    FALSE) AS equivalent
        |FROM x2""".stripMargin,

    // staged-splitmix label flips; HUGEINT cross-multiplied extremes
    "q_permutation_test" -> {
      import graft.engine.OracleHash._
      s"""WITH e AS (SELECT event_id,
         |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g,
         |    CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS vq
         |  FROM events WHERE event_type IN ('purchase', 'click')),
         |obs AS (SELECT CAST(sum(g) AS BIGINT) AS n1,
         |    CAST(sum(g * vq) AS BIGINT) AS sv1,
         |    CAST(sum(1 - g) AS BIGINT) AS n2,
         |    CAST(sum((1 - g) * vq) AS BIGINT) AS sv2 FROM e),
         |px AS (SELECT event_id, b, vq,
         |    CAST(event_id * 64 + b AS UBIGINT) AS seed
         |  FROM e, unnest(range(0, 64)) AS t(b)),
         |${splitmixStages("px", "event_id, b, vq", "seed")},
         |fl AS (SELECT b, vq,
         |    CAST((xor(z3, z3 >> 31) >> 8) % 2 AS BIGINT) AS gb
         |  FROM p3_),
         |reps AS (SELECT b, CAST(sum(gb) AS BIGINT) AS n1b,
         |    CAST(sum(gb * vq) AS BIGINT) AS sv1b,
         |    CAST(sum(1 - gb) AS BIGINT) AS n2b,
         |    CAST(sum((1 - gb) * vq) AS BIGINT) AS sv2b
         |  FROM fl GROUP BY b),
         |ex AS (SELECT
         |    CASE WHEN abs(sv1b::HUGEINT * n2b - sv2b::HUGEINT * n1b)
         |        * n1 * n2
         |      >= abs(sv1::HUGEINT * n2 - sv2::HUGEINT * n1)
         |        * n1b * n2b THEN 1 ELSE 0 END AS extreme
         |  FROM reps CROSS JOIN obs),
         |fin AS (SELECT count(*) AS n_flips,
         |    CAST(sum(extreme) AS BIGINT) AS n_extreme FROM ex)
         |SELECT n1, n2,
         |  floor((CAST(sv1 AS DOUBLE) / n1 / 1000.0e0
         |    - CAST(sv2 AS DOUBLE) / n2 / 1000.0e0) * 1e6 + 0.5e0) / 1e6
         |    AS diff_obs,
         |  CAST(n_flips AS BIGINT) AS n_flips, n_extreme,
         |  CAST(((n_extreme + 1) * 1000000) // (n_flips + 1) AS DOUBLE)
         |    / 1e6 AS p_value
         |FROM fin CROSS JOIN obs""".stripMargin
    },

    // group-keyed ceil-rank deciles on the quantized value frames
    "q_qq_plot" ->
      """WITH e AS (SELECT event_type AS grp,
        |    CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS vq
        |  FROM events WHERE event_type IN ('purchase', 'click')),
        |cells AS (SELECT grp, vq, count(*) AS cnt FROM e GROUP BY 1, 2),
        |cm AS (SELECT grp, vq,
        |    CAST(sum(cnt) OVER (PARTITION BY grp ORDER BY vq) AS BIGINT)
        |      AS cum,
        |    CAST(sum(cnt) OVER (PARTITION BY grp) AS BIGINT) AS n
        |  FROM cells),
        |q AS (SELECT d, grp, vq
        |  FROM cm, unnest(range(1, 10)) AS t(d)
        |  WHERE cum * 10 >= d * n)
        |SELECT d AS decile,
        |  CAST(min(CASE WHEN grp = 'purchase' THEN vq END) AS DOUBLE)
        |    / 1000.0 AS q_purchase,
        |  CAST(min(CASE WHEN grp = 'click' THEN vq END) AS DOUBLE)
        |    / 1000.0 AS q_click,
        |  CAST(min(CASE WHEN grp = 'purchase' THEN vq END)
        |    - min(CASE WHEN grp = 'click' THEN vq END) AS DOUBLE)
        |    / 1000.0 AS qq_gap
        |FROM q GROUP BY d ORDER BY decile""".stripMargin,

    // integer day-mean lags on the calendar frame; exact micro ratio
    "q_mase_backtest" ->
      """WITH e AS (SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS vq
        |  FROM events),
        |g AS (SELECT day, count(*) AS n, CAST(sum(vq) AS BIGINT) AS sq
        |  FROM e GROUP BY 1),
        |g2 AS (SELECT day, (sq * 1000) // n AS xm FROM g),
        |er AS (SELECT
        |    abs(xm - lag(xm, 1) OVER (ORDER BY day)) AS e1,
        |    abs(xm - lag(xm, 7) OVER (ORDER BY day)) AS e7
        |  FROM g2),
        |m AS (SELECT count(*) AS n_days,
        |    CAST(sum(CASE WHEN e7 IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n7,
        |    CAST(sum(CASE WHEN e1 IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n1,
        |    CAST(sum(e7) AS BIGINT) AS s7, CAST(sum(e1) AS BIGINT) AS s1
        |  FROM er)
        |SELECT n_days,
        |  CAST((s7 * 1000000) // n7 AS DOUBLE) / 1e12 AS mae_seasonal,
        |  CAST((s1 * 1000000) // n1 AS DOUBLE) / 1e12 AS mae_naive,
        |  CAST((CAST(s7 AS HUGEINT) * n1 * 1000000)
        |    // (CAST(s1 AS HUGEINT) * n7) AS DOUBLE) / 1e6 AS mase
        |FROM m""".stripMargin,

    // HUGEINT raw moments; centered sums fold in ORDER BY grp via
    // list_reduce — the same sequential double adds as sort_array +
    // aggregate() on the Spark side
    "q_simpson_flip" ->
      """WITH o AS (SELECT o_orderpriority AS grp,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |      AS x,
        |    CAST(floor(o_totalprice * 100.0e0 + 0.5e0) AS BIGINT) AS y
        |  FROM orders),
        |g AS (SELECT grp, count(*) AS n,
        |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy
        |  FROM o GROUP BY 1),
        |c AS (SELECT grp, n, sx, sy, sxx, sxy,
        |    CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
        |      / CAST(n AS DOUBLE) AS cxy,
        |    CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
        |      / CAST(n AS DOUBLE) AS cxx
        |  FROM g),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
        |    sum(sx) AS tsx, sum(sy) AS tsy,
        |    sum(sxx) AS tsxx, sum(sxy) AS tsxy,
        |    CAST(count(*) AS BIGINT) AS ngroups,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(cxy ORDER BY grp)), (a, b) -> a + b) AS wxy,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(cxx ORDER BY grp)), (a, b) -> a + b) AS wxx
        |  FROM c)
        |SELECT nn AS n, ngroups AS n_groups,
        |  round((CAST(nn AS DOUBLE) * CAST(tsxy AS DOUBLE)
        |    - CAST(tsx AS DOUBLE) * CAST(tsy AS DOUBLE))
        |    / (CAST(nn AS DOUBLE) * CAST(tsxx AS DOUBLE)
        |      - CAST(tsx AS DOUBLE) * CAST(tsx AS DOUBLE)), 6)
        |    AS pooled_slope,
        |  CASE WHEN wxx <> 0 THEN round(wxy / wxx, 6) END
        |    AS within_slope,
        |  CASE WHEN wxx <> 0 THEN round((CAST(nn AS DOUBLE)
        |    * CAST(tsxy AS DOUBLE)
        |    - CAST(tsx AS DOUBLE) * CAST(tsy AS DOUBLE))
        |    / (CAST(nn AS DOUBLE) * CAST(tsxx AS DOUBLE)
        |      - CAST(tsx AS DOUBLE) * CAST(tsx AS DOUBLE))
        |    - wxy / wxx, 6) END AS confounding_gap,
        |  CAST(CASE WHEN wxx <> 0 AND (CAST(nn AS DOUBLE)
        |    * CAST(tsxy AS DOUBLE)
        |    - CAST(tsx AS DOUBLE) * CAST(tsy AS DOUBLE))
        |    / (CAST(nn AS DOUBLE) * CAST(tsxx AS DOUBLE)
        |      - CAST(tsx AS DOUBLE) * CAST(tsx AS DOUBLE))
        |    * (wxy / wxx) < 0 THEN 1 ELSE 0 END AS BIGINT) AS sign_flip
        |FROM t""".stripMargin,

    // shared classifier chain; HUGEINT micro-residual squares; share-
    // weighted nano-quantized bin terms summed as integers
    "q_brier_decomp" ->
      s"""WITH ${OracleHash.classifierScoreCtes("doc_id, n_chars")},
         |pr AS (SELECT CAST(floor(
         |    1.0e0 / (1.0e0 + exp(-CAST(score AS DOUBLE) / 4.0e0))
         |      * 1000000.0e0 + 0.5) AS BIGINT) AS pu,
         |    CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS o
         |  FROM sc),
         |g AS (SELECT count(*) AS n, CAST(sum(o) AS BIGINT) AS npos,
         |    sum((CAST(pu AS HUGEINT) - CAST(o AS HUGEINT) * 1000000)
         |      * (CAST(pu AS HUGEINT) - CAST(o AS HUGEINT) * 1000000))
         |      AS sse
         |  FROM pr),
         |bn AS (SELECT least(pu // 100000, 9) AS bin, count(*) AS nk,
         |    CAST(sum(pu) AS BIGINT) AS spu,
         |    CAST(sum(o) AS BIGINT) AS nposk
         |  FROM pr GROUP BY 1),
         |tm AS (SELECT
         |    CAST(floor(CAST(nk AS DOUBLE) / CAST(g.n AS DOUBLE)
         |      * (CAST(spu AS DOUBLE) / CAST(nk AS DOUBLE) / 1e6
         |        - CAST(nposk AS DOUBLE) / CAST(nk AS DOUBLE))
         |      * (CAST(spu AS DOUBLE) / CAST(nk AS DOUBLE) / 1e6
         |        - CAST(nposk AS DOUBLE) / CAST(nk AS DOUBLE))
         |      * 1e9 + 0.5e0) AS BIGINT) AS relu,
         |    CAST(floor(CAST(nk AS DOUBLE) / CAST(g.n AS DOUBLE)
         |      * (CAST(nposk AS DOUBLE) / CAST(nk AS DOUBLE)
         |        - CAST(g.npos AS DOUBLE) / CAST(g.n AS DOUBLE))
         |      * (CAST(nposk AS DOUBLE) / CAST(nk AS DOUBLE)
         |        - CAST(g.npos AS DOUBLE) / CAST(g.n AS DOUBLE))
         |      * 1e9 + 0.5e0) AS BIGINT) AS resu
         |  FROM bn CROSS JOIN g),
         |agg AS (SELECT CAST(sum(relu) AS BIGINT) AS srel,
         |    CAST(sum(resu) AS BIGINT) AS sres FROM tm)
         |SELECT g.n,
         |  round(CAST(sse AS DOUBLE) / CAST(g.n AS DOUBLE) / 1e12, 6)
         |    AS brier,
         |  round(CAST(srel AS DOUBLE) / 1e9, 6) AS reliability,
         |  round(CAST(sres AS DOUBLE) / 1e9, 6) AS resolution,
         |  round(CAST(g.npos AS DOUBLE) / CAST(g.n AS DOUBLE)
         |    * (1.0e0 - CAST(g.npos AS DOUBLE) / CAST(g.n AS DOUBLE)), 6)
         |    AS uncertainty,
         |  round(CAST(srel AS DOUBLE) / 1e9 - CAST(sres AS DOUBLE) / 1e9
         |    + CAST(g.npos AS DOUBLE) / CAST(g.n AS DOUBLE)
         |      * (1.0e0 - CAST(g.npos AS DOUBLE) / CAST(g.n AS DOUBLE)),
         |    6) AS brier_binned
         |FROM g CROSS JOIN agg""".stripMargin,

    // closed-form leave-one-source replicates, micro-quantized before
    // the bounded reduction; Tukey (G-1)/G in one shared expression
    "q_jackknife" ->
      """WITH bys AS (SELECT source, count(*) AS ns,
        |    CAST(sum(n_chars) AS BIGINT) AS ts
        |  FROM documents GROUP BY 1),
        |g AS (SELECT count(*) AS nn, CAST(sum(n_chars) AS BIGINT) AS tt
        |  FROM documents),
        |th AS (SELECT CAST(floor(
        |    (CAST(tt AS DOUBLE) - CAST(ts AS DOUBLE))
        |      / (CAST(nn AS DOUBLE) - CAST(ns AS DOUBLE)) * 1e6 + 0.5e0)
        |    AS BIGINT) AS thq, nn, tt
        |  FROM bys CROSS JOIN g WHERE nn <> ns),
        |p1 AS (SELECT count(*) AS gg, CAST(sum(thq) AS BIGINT) AS sthq
        |  FROM th),
        |dev AS (SELECT th.nn, th.tt, p1.gg, p1.sthq, CAST(floor(
        |    (CAST(thq AS DOUBLE) / 1e6 - CAST(sthq AS DOUBLE)
        |      / CAST(gg AS DOUBLE) / 1e6)
        |    * (CAST(thq AS DOUBLE) / 1e6 - CAST(sthq AS DOUBLE)
        |      / CAST(gg AS DOUBLE) / 1e6) * 1e9 + 0.5e0) AS BIGINT)
        |    AS devq
        |  FROM th CROSS JOIN p1),
        |fin AS (SELECT max(gg) AS gg, max(sthq) AS sthq, max(nn) AS nn,
        |    max(tt) AS tt, CAST(sum(devq) AS BIGINT) AS sdev FROM dev)
        |SELECT gg AS n_groups,
        |  round(CAST(tt AS DOUBLE) / CAST(nn AS DOUBLE), 6) AS theta,
        |  round(CAST(sthq AS DOUBLE) / CAST(gg AS DOUBLE) / 1e6, 6)
        |    AS theta_jk,
        |  round(sqrt((CAST(gg AS DOUBLE) - 1.0e0) / CAST(gg AS DOUBLE)
        |    * (CAST(sdev AS DOUBLE) / 1e9)), 6) AS jk_se,
        |  round((CAST(gg AS DOUBLE) - 1.0e0)
        |    * (CAST(sthq AS DOUBLE) / CAST(gg AS DOUBLE) / 1e6
        |      - CAST(tt AS DOUBLE) / CAST(nn AS DOUBLE)), 6) AS jk_bias
        |FROM fin""".stripMargin,

    // exact milli-integer moments; share-weighted micro-quantized SS
    // terms; the quantization unit cancels in F and eta-squared
    "q_anova_f" ->
      """WITH e AS (SELECT event_type,
        |    CAST(floor(value * 1000.0e0 + 0.5e0) AS BIGINT) AS vq
        |  FROM events),
        |byg AS (SELECT event_type, count(*) AS ng,
        |    sum(CAST(vq AS HUGEINT)) AS s1,
        |    sum(CAST(vq AS HUGEINT) * vq) AS s2
        |  FROM e GROUP BY 1),
        |g AS (SELECT CAST(sum(ng) AS BIGINT) AS nn, sum(s1) AS gs1,
        |    count(*) AS k FROM byg),
        |tm AS (SELECT nn, k, CAST(floor(
        |    CAST(ng AS DOUBLE) / CAST(nn AS DOUBLE)
        |    * (CAST(s1 AS DOUBLE) / CAST(ng AS DOUBLE)
        |      - CAST(gs1 AS DOUBLE) / CAST(nn AS DOUBLE))
        |    * (CAST(s1 AS DOUBLE) / CAST(ng AS DOUBLE)
        |      - CAST(gs1 AS DOUBLE) / CAST(nn AS DOUBLE))
        |    * 1e6 + 0.5e0) AS BIGINT) AS bq,
        |    CAST(floor((CAST(s2 AS DOUBLE) / CAST(ng AS DOUBLE)
        |      - CAST(s1 AS DOUBLE) / CAST(ng AS DOUBLE)
        |        * (CAST(s1 AS DOUBLE) / CAST(ng AS DOUBLE)))
        |      * CAST(ng AS DOUBLE) / CAST(nn AS DOUBLE)
        |      * 1e6 + 0.5e0) AS BIGINT) AS wq
        |  FROM byg CROSS JOIN g),
        |fin AS (SELECT nn, k, CAST(sum(bq) AS BIGINT) AS ssb,
        |    CAST(sum(wq) AS BIGINT) AS ssw FROM tm GROUP BY 1, 2)
        |SELECT nn AS n, CAST(k AS BIGINT) AS k,
        |  CASE WHEN ssw <> 0 AND k > 1 THEN round(
        |    CAST(ssb AS DOUBLE) * (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE))
        |    / (CAST(ssw AS DOUBLE) * (CAST(k AS DOUBLE) - 1.0e0)), 6)
        |  END AS f_stat,
        |  CASE WHEN ssb + ssw <> 0 THEN round(CAST(ssb AS DOUBLE)
        |    / (CAST(ssb AS DOUBLE) + CAST(ssw AS DOUBLE)), 6)
        |  END AS eta2
        |FROM fin""".stripMargin,

    // exact HUGEINT cent moments; micro-quantized k-row folds; one
    // mirrored shrink-factor expression
    "q_james_stein" ->
      """WITH oc AS (SELECT CAST(c.c_nationkey AS BIGINT) AS nk,
        |    CAST(floor(o.o_totalprice * 100.0e0 + 0.5e0) AS BIGINT)
        |      AS yq
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |byn AS (SELECT nk, count(*) AS n,
        |    sum(CAST(yq AS HUGEINT)) AS s1,
        |    sum(CAST(yq AS HUGEINT) * yq) AS s2
        |  FROM oc GROUP BY 1 HAVING count(*) > 1),
        |g AS (SELECT CAST(sum(n) AS BIGINT) AS nn, sum(s1) AS gs1,
        |    count(*) AS k FROM byn),
        |wj AS (SELECT nk, n, s1, s2, nn, gs1, k,
        |    CAST(floor((CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 100.0e0
        |      - CAST(gs1 AS DOUBLE) / CAST(nn AS DOUBLE) / 100.0e0)
        |      * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 100.0e0
        |      - CAST(gs1 AS DOUBLE) / CAST(nn AS DOUBLE) / 100.0e0)
        |      * 1e6 + 0.5e0) AS BIGINT) AS devq,
        |    CAST(floor((CAST(s2 AS DOUBLE) / 10000.0e0
        |      - (CAST(s1 AS DOUBLE) / 100.0e0)
        |        * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 100.0e0))
        |      / (CAST(n AS DOUBLE) - 1.0e0) / CAST(n AS DOUBLE)
        |      * 1e6 + 0.5e0) AS BIGINT) AS seq
        |  FROM byn CROSS JOIN g),
        |sm AS (SELECT max(k) AS k, CAST(sum(devq) AS BIGINT) AS sdev,
        |    CAST(sum(seq) AS BIGINT) AS sse2 FROM wj),
        |sh AS (SELECT round(greatest(0.0e0, 1.0e0
        |    - (CAST(k AS DOUBLE) - 3.0e0)
        |    * (CAST(sse2 AS DOUBLE) / 1e6 / CAST(k AS DOUBLE))
        |    / (CAST(sdev AS DOUBLE) / 1e6)), 6) AS shrink FROM sm)
        |SELECT nk AS nationkey, n,
        |  round(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 100.0e0, 6)
        |    AS raw_mean,
        |  round(CAST(gs1 AS DOUBLE) / CAST(nn AS DOUBLE) / 100.0e0
        |    + shrink * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 100.0e0
        |      - CAST(gs1 AS DOUBLE) / CAST(nn AS DOUBLE) / 100.0e0), 6)
        |    AS js_mean,
        |  shrink
        |FROM wj CROSS JOIN sh ORDER BY nationkey""".stripMargin,

    // method-of-moments beta-binomial prior on the k-arm rate frame;
    // HUGEINT rate-square fold
    "q_eb_rate" ->
      """WITH oc AS (SELECT CAST(c.c_nationkey AS BIGINT) AS nk,
        |    CAST(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END AS BIGINT) AS u
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |byn AS (SELECT nk, count(*) AS n, CAST(sum(u) AS BIGINT) AS x
        |  FROM oc GROUP BY 1),
        |wq AS (SELECT nk, n, x, CAST(floor(
        |    CAST(x AS DOUBLE) / CAST(n AS DOUBLE) * 1e9 + 0.5e0)
        |    AS BIGINT) AS rq FROM byn),
        |mom AS (SELECT count(*) AS k, CAST(sum(rq) AS BIGINT) AS sr,
        |    sum(CAST(rq AS HUGEINT) * rq) AS srr FROM wq),
        |pri AS (SELECT k,
        |    round(CAST(sr AS DOUBLE) / CAST(k AS DOUBLE) / 1e9, 6)
        |      AS prior_mean,
        |    round(greatest(0.0e0, CASE WHEN
        |      (CAST(srr AS DOUBLE) / 1e18 - CAST(k AS DOUBLE)
        |        * (CAST(sr AS DOUBLE) / CAST(k AS DOUBLE) / 1e9)
        |        * (CAST(sr AS DOUBLE) / CAST(k AS DOUBLE) / 1e9))
        |        / (CAST(k AS DOUBLE) - 1.0e0) > 0
        |      THEN (CAST(sr AS DOUBLE) / CAST(k AS DOUBLE) / 1e9)
        |        * (1.0e0 - CAST(sr AS DOUBLE) / CAST(k AS DOUBLE) / 1e9)
        |        / ((CAST(srr AS DOUBLE) / 1e18 - CAST(k AS DOUBLE)
        |          * (CAST(sr AS DOUBLE) / CAST(k AS DOUBLE) / 1e9)
        |          * (CAST(sr AS DOUBLE) / CAST(k AS DOUBLE) / 1e9))
        |          / (CAST(k AS DOUBLE) - 1.0e0)) - 1.0e0
        |      ELSE 0.0e0 END), 6) AS kappa
        |  FROM mom)
        |SELECT nk AS nationkey, n, x,
        |  round(CAST(x AS DOUBLE) / CAST(n AS DOUBLE), 6) AS raw_rate,
        |  round((CAST(x AS DOUBLE) + prior_mean * kappa)
        |    / (CAST(n AS DOUBLE) + kappa), 6) AS eb_rate,
        |  prior_mean, kappa
        |FROM wq CROSS JOIN pri ORDER BY nationkey""".stripMargin,

    // midranks on both domain-bounded distinct-value frames; Pearson on
    // doubled midranks in HUGEINT
    "q_spearman" -> {
      s"""WITH ${OracleHash.classifierScoreCtes("doc_id, n_chars")},
         |sv AS (SELECT doc_id, n_chars AS xv,
         |    CAST(score AS BIGINT) AS yv FROM sc),
         |rx AS (SELECT xv, 2 * (cum - cnt) + cnt + 1 AS r_xv FROM (
         |  SELECT xv, cnt, CAST(sum(cnt) OVER (ORDER BY xv
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum
         |  FROM (SELECT xv, count(*) AS cnt FROM sv GROUP BY 1) t) t2),
         |ry AS (SELECT yv, 2 * (cum - cnt) + cnt + 1 AS r_yv FROM (
         |  SELECT yv, cnt, CAST(sum(cnt) OVER (ORDER BY yv
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum
         |  FROM (SELECT yv, count(*) AS cnt FROM sv GROUP BY 1) t) t2),
         |rk AS (SELECT r_xv, r_yv FROM sv JOIN rx USING (xv)
         |  JOIN ry USING (yv)),
         |m AS (SELECT count(*) AS n,
         |    sum(CAST(r_xv AS HUGEINT)) AS sx,
         |    sum(CAST(r_yv AS HUGEINT)) AS sy,
         |    sum(CAST(r_xv AS HUGEINT) * r_xv) AS sxx,
         |    sum(CAST(r_yv AS HUGEINT) * r_yv) AS syy,
         |    sum(CAST(r_xv AS HUGEINT) * r_yv) AS sxy
         |  FROM rk)
         |SELECT n,
         |  CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
         |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
         |    AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
         |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
         |  THEN round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
         |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         |    / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
         |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
         |      * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
         |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
         |  END AS spearman_rho
         |FROM m""".stripMargin
    },

    // per-side HUGEINT cent moments; mirrored intercept/jump expressions
    "q_reg_discontinuity" ->
      """WITH o AS (SELECT
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1998-01-01'
        |      AS BIGINT) AS x,
        |    CAST(floor(o_totalprice * 100.0e0 + 0.5e0) AS BIGINT) AS y
        |  FROM orders),
        |sd AS (SELECT CASE WHEN x < 0 THEN 'left' ELSE 'right' END
        |    AS side, x, y FROM o),
        |m AS (SELECT side, count(*) AS n,
        |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy
        |  FROM sd GROUP BY 1),
        |est AS (SELECT side, n,
        |    CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <> 0
        |      THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |        / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) END AS slope,
        |    CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <> 0
        |      THEN (CAST(sy AS DOUBLE)
        |        - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |          / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |          * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) / 100.0e0
        |      END AS icpt
        |  FROM m)
        |SELECT l.n AS n_left, r.n AS n_right,
        |  round(l.slope * 365.0e0 / 100.0e0, 6) AS slope_left_per_year,
        |  round(r.slope * 365.0e0 / 100.0e0, 6) AS slope_right_per_year,
        |  round(l.icpt, 6) AS icpt_left,
        |  round(r.icpt, 6) AS icpt_right,
        |  round(r.icpt - l.icpt, 6) AS jump
        |FROM (SELECT * FROM est WHERE side = 'left') l
        |CROSS JOIN (SELECT * FROM est WHERE side = 'right') r"""
        .stripMargin,

    // two distinct purchaser windows; Chapman bias-corrected estimate
    "q_capture_recapture" ->
      """WITH pe AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        |  FROM events WHERE event_type = 'purchase'),
        |s1 AS (SELECT DISTINCT user_id FROM pe
        |  WHERE day - DATE '2024-01-01' BETWEEN 0 AND 2),
        |s2 AS (SELECT DISTINCT user_id FROM pe
        |  WHERE day - DATE '2024-01-01' BETWEEN 3 AND 5),
        |n1 AS (SELECT count(*) AS n1 FROM s1),
        |n2 AS (SELECT count(*) AS n2 FROM s2),
        |m AS (SELECT count(*) AS m FROM s1 JOIN s2 USING (user_id)),
        |obs AS (SELECT count(DISTINCT user_id) AS n_obs FROM pe)
        |SELECT n1, n2, m, n_obs,
        |  round((CAST(n1 AS DOUBLE) + 1.0e0)
        |    * (CAST(n2 AS DOUBLE) + 1.0e0)
        |    / (CAST(m AS DOUBLE) + 1.0e0) - 1.0e0, 6) AS chapman_n,
        |  CASE WHEN (n1 + 1) * (n2 + 1) > m + 1 THEN round(
        |    CAST(n_obs AS DOUBLE) / ((CAST(n1 AS DOUBLE) + 1.0e0)
        |      * (CAST(n2 AS DOUBLE) + 1.0e0)
        |      / (CAST(m AS DOUBLE) + 1.0e0) - 1.0e0), 6) END
        |    AS coverage
        |FROM n1 CROSS JOIN n2 CROSS JOIN m CROSS JOIN obs"""
        .stripMargin,

    // shared z-squared literal; one closed-form Wilson expression
    "q_wilson_ci" ->
      """WITH oc AS (SELECT CAST(c.c_nationkey AS BIGINT) AS nk,
        |    CAST(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END AS BIGINT) AS u
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |byn AS (SELECT nk, count(*) AS n, CAST(sum(u) AS BIGINT) AS x
        |  FROM oc GROUP BY 1)
        |SELECT nk AS nationkey, n, x,
        |  round(CAST(x AS DOUBLE) / CAST(n AS DOUBLE), 6) AS rate,
        |  round((CAST(x AS DOUBLE) / CAST(n AS DOUBLE)
        |    + 3.841459e0 / (2.0e0 * CAST(n AS DOUBLE)))
        |    / (1.0e0 + 3.841459e0 / CAST(n AS DOUBLE))
        |    - sqrt(3.841459e0) * sqrt(CAST(x AS DOUBLE)
        |      / CAST(n AS DOUBLE) * (1.0e0 - CAST(x AS DOUBLE)
        |      / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)
        |      + 3.841459e0 / (4.0e0 * CAST(n AS DOUBLE)
        |        * CAST(n AS DOUBLE)))
        |      / (1.0e0 + 3.841459e0 / CAST(n AS DOUBLE)), 6)
        |    AS wilson_lo,
        |  round((CAST(x AS DOUBLE) / CAST(n AS DOUBLE)
        |    + 3.841459e0 / (2.0e0 * CAST(n AS DOUBLE)))
        |    / (1.0e0 + 3.841459e0 / CAST(n AS DOUBLE))
        |    + sqrt(3.841459e0) * sqrt(CAST(x AS DOUBLE)
        |      / CAST(n AS DOUBLE) * (1.0e0 - CAST(x AS DOUBLE)
        |      / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)
        |      + 3.841459e0 / (4.0e0 * CAST(n AS DOUBLE)
        |        * CAST(n AS DOUBLE)))
        |      / (1.0e0 + 3.841459e0 / CAST(n AS DOUBLE)), 6)
        |    AS wilson_hi
        |FROM byn ORDER BY nationkey""".stripMargin,

    // exact integer daily-count moments; n-1 sample variance
    "q_overdispersion" ->
      """WITH td AS (SELECT event_type,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dd,
        |    count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, count(*) AS n_days,
        |    CAST(sum(c) AS BIGINT) AS s1,
        |    CAST(sum(c * c) AS BIGINT) AS s2
        |  FROM td GROUP BY 1)
        |SELECT event_type, n_days,
        |  round(CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE), 6)
        |    AS mean_daily,
        |  round((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
        |    * CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE))
        |    / (CAST(n_days AS DOUBLE) - 1.0e0), 6) AS var_daily,
        |  CASE WHEN CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE) > 0
        |    THEN round(((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
        |      * CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE))
        |      / (CAST(n_days AS DOUBLE) - 1.0e0))
        |      / (CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE)), 6) END
        |    AS dispersion,
        |  CAST(CASE WHEN CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE) > 0
        |    AND ((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
        |      * CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE))
        |      / (CAST(n_days AS DOUBLE) - 1.0e0))
        |      / (CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE)) > 1.0e0
        |    THEN 1 ELSE 0 END AS BIGINT) AS overdispersed
        |FROM m WHERE n_days > 1 ORDER BY event_type""".stripMargin,

    // ties drop first; runs from sign changes; one mirrored z
    "q_runs_test" ->
      """WITH byd AS (SELECT
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dd,
        |    count(*) AS y
        |  FROM events GROUP BY 1),
        |sg AS (SELECT dd, CASE WHEN y > prev THEN 1 ELSE 0 END AS s
        |  FROM (SELECT dd, y, lag(y) OVER (ORDER BY dd) AS prev
        |    FROM byd) t
        |  WHERE prev IS NOT NULL AND y <> prev),
        |ch AS (SELECT s, CASE WHEN ps IS NULL OR s <> ps THEN 1 ELSE 0
        |    END AS chg
        |  FROM (SELECT dd, s, lag(s) OVER (ORDER BY dd) AS ps
        |    FROM sg) t),
        |m AS (SELECT CAST(sum(s) AS BIGINT) AS n1,
        |    CAST(sum(1 - s) AS BIGINT) AS n2,
        |    CAST(sum(chg) AS BIGINT) AS runs FROM ch)
        |SELECT n1, n2, runs,
        |  round(2.0e0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |    / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) + 1.0e0, 6)
        |    AS expected_runs,
        |  CASE WHEN 2.0e0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |      * (2.0e0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |        - CAST(n1 AS DOUBLE) - CAST(n2 AS DOUBLE))
        |      / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
        |        * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
        |        * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1.0e0)) > 0
        |    THEN round((CAST(runs AS DOUBLE)
        |      - (2.0e0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |        / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) + 1.0e0))
        |      / sqrt(2.0e0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |        * (2.0e0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |          - CAST(n1 AS DOUBLE) - CAST(n2 AS DOUBLE))
        |        / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
        |          * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
        |          * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)
        |            - 1.0e0))), 6) END AS z
        |FROM m""".stripMargin,

    // per-user half sums; micro-quantized deltas; HUGEINT delta moments
    "q_paired_ttest" ->
      """WITH u AS (SELECT user_id,
        |    CAST(sum(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
        |      THEN CAST(floor(value * 1000.0e0 + 0.5e0) AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS sv1,
        |    CAST(sum(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
        |      THEN 0 ELSE 1 END) AS BIGINT) AS n2,
        |    CAST(sum(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
        |      THEN 0 ELSE CAST(floor(value * 1000.0e0 + 0.5e0)
        |        AS BIGINT) END) AS BIGINT) AS sv2
        |  FROM events GROUP BY 1),
        |dq AS (SELECT CAST(floor(
        |    (CAST(sv1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |      - CAST(sv2 AS DOUBLE) / CAST(n2 AS DOUBLE)) / 1000.0e0
        |      * 1e6 + 0.5e0) AS BIGINT) AS dq
        |  FROM u WHERE n1 > 0 AND n2 > 0),
        |m AS (SELECT count(*) AS n, sum(CAST(dq AS HUGEINT)) AS sd,
        |    sum(CAST(dq AS HUGEINT) * dq) AS sdd FROM dq)
        |SELECT n AS n_users,
        |  round(CAST(sd AS DOUBLE) / CAST(n AS DOUBLE) / 1e6, 6)
        |    AS mean_delta,
        |  CASE WHEN n > 1 AND sqrt((CAST(sdd AS DOUBLE) / 1e12
        |      - CAST(n AS DOUBLE)
        |        * (CAST(sd AS DOUBLE) / CAST(n AS DOUBLE) / 1e6)
        |        * (CAST(sd AS DOUBLE) / CAST(n AS DOUBLE) / 1e6))
        |      / (CAST(n AS DOUBLE) - 1.0e0)) > 0
        |    THEN round((CAST(sd AS DOUBLE) / CAST(n AS DOUBLE) / 1e6)
        |      / (sqrt((CAST(sdd AS DOUBLE) / 1e12 - CAST(n AS DOUBLE)
        |        * (CAST(sd AS DOUBLE) / CAST(n AS DOUBLE) / 1e6)
        |        * (CAST(sd AS DOUBLE) / CAST(n AS DOUBLE) / 1e6))
        |        / (CAST(n AS DOUBLE) - 1.0e0))
        |        / sqrt(CAST(n AS DOUBLE))), 6) END AS t_stat
        |FROM m""".stripMargin,

    // shared classifier chain; exact confusion cells; mirrored kappa
    "q_cohens_kappa" -> {
      s"""WITH ${OracleHash.classifierScoreCtes("doc_id, n_chars")},
         |ab AS (SELECT CASE WHEN score > 0 THEN 1 ELSE 0 END AS a,
         |    CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS b FROM sc),
         |m AS (SELECT count(*) AS n,
         |    CAST(sum(a * b) AS BIGINT) AS n11,
         |    CAST(sum(a * (1 - b)) AS BIGINT) AS n10,
         |    CAST(sum((1 - a) * b) AS BIGINT) AS n01,
         |    CAST(sum((1 - a) * (1 - b)) AS BIGINT) AS n00
         |  FROM ab)
         |SELECT n, n11, n10, n01, n00,
         |  round(CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE), 6)
         |    AS p_observed,
         |  round(CAST(n11 + n10 AS DOUBLE) / CAST(n AS DOUBLE)
         |    * (CAST(n11 + n01 AS DOUBLE) / CAST(n AS DOUBLE))
         |    + (1.0e0 - CAST(n11 + n10 AS DOUBLE) / CAST(n AS DOUBLE))
         |    * (1.0e0 - CAST(n11 + n01 AS DOUBLE) / CAST(n AS DOUBLE)),
         |    6) AS p_expected,
         |  CASE WHEN CAST(n11 + n10 AS DOUBLE) / CAST(n AS DOUBLE)
         |      * (CAST(n11 + n01 AS DOUBLE) / CAST(n AS DOUBLE))
         |      + (1.0e0 - CAST(n11 + n10 AS DOUBLE) / CAST(n AS DOUBLE))
         |      * (1.0e0 - CAST(n11 + n01 AS DOUBLE)
         |        / CAST(n AS DOUBLE)) <> 1.0e0
         |    THEN round((CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE)
         |      - (CAST(n11 + n10 AS DOUBLE) / CAST(n AS DOUBLE)
         |        * (CAST(n11 + n01 AS DOUBLE) / CAST(n AS DOUBLE))
         |        + (1.0e0 - CAST(n11 + n10 AS DOUBLE)
         |          / CAST(n AS DOUBLE))
         |        * (1.0e0 - CAST(n11 + n01 AS DOUBLE)
         |          / CAST(n AS DOUBLE))))
         |      / (1.0e0 - (CAST(n11 + n10 AS DOUBLE)
         |        / CAST(n AS DOUBLE)
         |        * (CAST(n11 + n01 AS DOUBLE) / CAST(n AS DOUBLE))
         |        + (1.0e0 - CAST(n11 + n10 AS DOUBLE)
         |          / CAST(n AS DOUBLE))
         |        * (1.0e0 - CAST(n11 + n01 AS DOUBLE)
         |          / CAST(n AS DOUBLE)))), 6) END AS kappa
         |FROM m""".stripMargin
    },

    // HUGEINT trend moments; micro-quantized residuals; lag-window DW
    "q_durbin_watson" ->
      """WITH byd AS (SELECT
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dd,
        |    count(*) AS y
        |  FROM events GROUP BY 1),
        |m AS (SELECT count(*) AS n, sum(CAST(dd AS HUGEINT)) AS sx,
        |    sum(CAST(y AS HUGEINT)) AS sy,
        |    sum(CAST(dd AS HUGEINT) * dd) AS sxx,
        |    sum(CAST(dd AS HUGEINT) * y) AS sxy
        |  FROM byd),
        |fit AS (SELECT n,
        |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b,
        |    (CAST(sy AS DOUBLE)
        |      - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |        / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |        * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS a
        |  FROM m),
        |res AS (SELECT dd, CAST(floor(
        |    (CAST(y AS DOUBLE) - (a + b * CAST(dd AS DOUBLE)))
        |      * 1e6 + 0.5e0) AS BIGINT) AS eq, n, b
        |  FROM byd CROSS JOIN fit),
        |lg AS (SELECT n, b, eq, lag(eq) OVER (ORDER BY dd) AS pe
        |  FROM res),
        |dw AS (SELECT max(n) AS n_days, max(b) AS slope,
        |    sum(CAST(eq AS HUGEINT) * eq) AS see,
        |    sum(CASE WHEN pe IS NOT NULL
        |      THEN CAST(eq - pe AS HUGEINT) * (eq - pe)
        |      ELSE 0::HUGEINT END) AS sde
        |  FROM lg)
        |SELECT CAST(n_days AS BIGINT) AS n_days,
        |  round(slope, 6) AS slope_per_day,
        |  CASE WHEN see > 0 THEN round(
        |    CAST(sde AS DOUBLE) / CAST(see AS DOUBLE), 6) END AS dw
        |FROM dw""".stripMargin,

    // midranks on the distinct-value frame; ordered fold of R^2/n
    // terms; closed-form even-df p-value
    "q_kruskal_wallis" ->
      """WITH e AS (SELECT event_type,
        |    CAST(floor(value * 1000.0e0 + 0.5e0) AS BIGINT) AS vq
        |  FROM events),
        |bv AS (SELECT vq, count(*) AS cnt FROM e GROUP BY 1),
        |rk AS (SELECT vq, 2 * (cum - cnt) + cnt + 1 AS r2 FROM (
        |  SELECT vq, cnt, CAST(sum(cnt) OVER (ORDER BY vq
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum FROM bv) t),
        |ties AS (SELECT sum(CAST(cnt AS HUGEINT) * cnt * cnt - cnt)
        |    AS tsum FROM bv),
        |byg AS (SELECT event_type, count(*) AS ng,
        |    sum(CAST(r2 AS HUGEINT)) AS sr2
        |  FROM e JOIN rk USING (vq) GROUP BY 1),
        |tm AS (SELECT event_type, ng,
        |    (CAST(sr2 AS DOUBLE) / 2.0e0) * (CAST(sr2 AS DOUBLE)
        |      / 2.0e0) / CAST(ng AS DOUBLE) AS term
        |  FROM byg),
        |agg AS (SELECT CAST(sum(ng) AS BIGINT) AS nn,
        |    count(*) AS k,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(term ORDER BY event_type)), (a, x) -> a + x)
        |      AS tsumr
        |  FROM tm)
        |SELECT nn AS n, CAST(k AS BIGINT) AS k,
        |  CASE WHEN 1.0e0 - CAST(tsum AS DOUBLE)
        |      / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)
        |        * CAST(nn AS DOUBLE) - CAST(nn AS DOUBLE)) > 0
        |    THEN round((12.0e0 / (CAST(nn AS DOUBLE)
        |      * (CAST(nn AS DOUBLE) + 1.0e0)) * tsumr
        |      - 3.0e0 * (CAST(nn AS DOUBLE) + 1.0e0))
        |      / (1.0e0 - CAST(tsum AS DOUBLE)
        |        / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)
        |          * CAST(nn AS DOUBLE) - CAST(nn AS DOUBLE))), 6) END
        |    AS h_stat,
        |  CAST(k - 1 AS BIGINT) AS df,
        |  CASE WHEN 1.0e0 - CAST(tsum AS DOUBLE)
        |      / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)
        |        * CAST(nn AS DOUBLE) - CAST(nn AS DOUBLE)) > 0
        |    THEN round(exp(-((12.0e0 / (CAST(nn AS DOUBLE)
        |      * (CAST(nn AS DOUBLE) + 1.0e0)) * tsumr
        |      - 3.0e0 * (CAST(nn AS DOUBLE) + 1.0e0))
        |      / (1.0e0 - CAST(tsum AS DOUBLE)
        |        / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)
        |          * CAST(nn AS DOUBLE) - CAST(nn AS DOUBLE)))) / 2.0e0)
        |      * (1.0e0 + ((12.0e0 / (CAST(nn AS DOUBLE)
        |      * (CAST(nn AS DOUBLE) + 1.0e0)) * tsumr
        |      - 3.0e0 * (CAST(nn AS DOUBLE) + 1.0e0))
        |      / (1.0e0 - CAST(tsum AS DOUBLE)
        |        / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)
        |          * CAST(nn AS DOUBLE) - CAST(nn AS DOUBLE))))
        |        / 2.0e0), 6) END AS p_value
        |FROM agg CROSS JOIN ties""".stripMargin,

    // per-stratum 2x2 E/V nano-quantized; mirrored CMH and MH-OR
    "q_cmh" ->
      """WITH oc AS (SELECT CAST(c.c_nationkey AS BIGINT) AS nk,
        |    CAST(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END AS BIGINT) AS u,
        |    CAST(CASE WHEN c.c_mktsegment IN ('AUTOMOBILE', 'BUILDING')
        |      THEN 1 ELSE 0 END AS BIGINT) AS g
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |cells AS (SELECT nk, count(*) AS n,
        |    CAST(sum(g * u) AS BIGINT) AS a,
        |    CAST(sum(g * (1 - u)) AS BIGINT) AS b,
        |    CAST(sum((1 - g) * u) AS BIGINT) AS c,
        |    CAST(sum((1 - g) * (1 - u)) AS BIGINT) AS dd
        |  FROM oc GROUP BY 1 HAVING count(*) > 1),
        |tm AS (SELECT a,
        |    CAST(floor(CAST(a + b AS DOUBLE) * CAST(a + c AS DOUBLE)
        |      / CAST(n AS DOUBLE) * 1e9 + 0.5e0) AS BIGINT) AS eq,
        |    CAST(floor(CAST(a + b AS DOUBLE) * CAST(c + dd AS DOUBLE)
        |      * CAST(a + c AS DOUBLE) * CAST(b + dd AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |        * (CAST(n AS DOUBLE) - 1.0e0)) * 1e9 + 0.5e0)
        |      AS BIGINT) AS vq,
        |    CAST(floor(CAST(a AS DOUBLE) * CAST(dd AS DOUBLE)
        |      / CAST(n AS DOUBLE) * 1e6 + 0.5e0) AS BIGINT) AS adq,
        |    CAST(floor(CAST(b AS DOUBLE) * CAST(c AS DOUBLE)
        |      / CAST(n AS DOUBLE) * 1e6 + 0.5e0) AS BIGINT) AS bcq
        |  FROM cells),
        |m AS (SELECT count(*) AS n_strata, CAST(sum(a) AS BIGINT) AS sa,
        |    CAST(sum(eq) AS BIGINT) AS se,
        |    CAST(sum(vq) AS BIGINT) AS sv,
        |    CAST(sum(adq) AS BIGINT) AS sad,
        |    CAST(sum(bcq) AS BIGINT) AS sbc
        |  FROM tm)
        |SELECT n_strata, sa AS sum_a,
        |  round(CAST(se AS DOUBLE) / 1e9, 6) AS sum_e,
        |  CASE WHEN sv > 0 THEN round(
        |    (CAST(sa AS DOUBLE) - CAST(se AS DOUBLE) / 1e9)
        |    * (CAST(sa AS DOUBLE) - CAST(se AS DOUBLE) / 1e9)
        |    / (CAST(sv AS DOUBLE) / 1e9), 6) END AS cmh_chi2,
        |  CASE WHEN sbc > 0 THEN round(
        |    CAST(sad AS DOUBLE) / CAST(sbc AS DOUBLE), 6) END AS or_mh
        |FROM m""".stripMargin,

    // KM nano-integer -lnS reused exactly; micro-quantized ln-ln OLS
    "q_weibull_fit" ->
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
        |q AS (SELECT t,
        |    CASE WHEN d_events < n_risk THEN CAST(floor(
        |      ln(CAST(n_risk - d_events AS DOUBLE)
        |        / CAST(n_risk AS DOUBLE)) * 1e9 + 0.5e0) AS BIGINT)
        |      ELSE 0 END AS lq,
        |    CASE WHEN d_events = n_risk THEN 1 ELSE 0 END AS zf
        |  FROM rk),
        |cm AS (SELECT t,
        |    CAST(sum(lq) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cuml,
        |    CAST(sum(zf) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS zeroed
        |  FROM q),
        |pts AS (SELECT
        |    CAST(floor(ln(CAST(t AS DOUBLE)) * 1e6 + 0.5e0) AS BIGINT)
        |      AS xq,
        |    CAST(floor(ln(-CAST(cuml AS DOUBLE) / 1e9) * 1e6 + 0.5e0)
        |      AS BIGINT) AS yq
        |  FROM cm WHERE t >= 1 AND cuml < 0 AND zeroed = 0),
        |fit AS (SELECT count(*) AS np,
        |    sum(CAST(xq AS HUGEINT)) AS sx,
        |    sum(CAST(yq AS HUGEINT)) AS sy,
        |    sum(CAST(xq AS HUGEINT) * xq) AS sxx,
        |    sum(CAST(xq AS HUGEINT) * yq) AS sxy
        |  FROM pts)
        |SELECT np AS n_points,
        |  CASE WHEN CAST(np AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <> 0
        |    THEN round((CAST(np AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |      / (CAST(np AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) END
        |    AS shape,
        |  CASE WHEN CAST(np AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <> 0
        |    THEN round(exp(-((CAST(sy AS DOUBLE)
        |      - (CAST(np AS DOUBLE) * CAST(sxy AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |        / (CAST(np AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |        * CAST(sx AS DOUBLE)) / CAST(np AS DOUBLE) / 1e6)
        |      / ((CAST(np AS DOUBLE) * CAST(sxy AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |        / (CAST(np AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))), 6) END
        |    AS scale_days
        |FROM fit""".stripMargin,

    // within-day doubled midranks; ordered fold of R^2 terms;
    // closed-form even-df p
    "q_friedman" ->
      """WITH td0 AS (SELECT
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dd,
        |    event_type, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |td AS (SELECT d.dd, t.event_type, coalesce(td0.c, 0) AS c
        |  FROM (SELECT DISTINCT dd FROM td0) d
        |  CROSS JOIN (SELECT DISTINCT event_type FROM td0) t
        |  LEFT JOIN td0 ON td0.dd = d.dd
        |    AND td0.event_type = t.event_type),
        |rk AS (SELECT dd, event_type,
        |    2 * (cumle - tied) + tied + 1 AS r2
        |  FROM (SELECT dd, event_type, c,
        |      count(*) OVER (PARTITION BY dd ORDER BY c
        |        RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |        AS cumle,
        |      count(*) OVER (PARTITION BY dd, c) AS tied
        |    FROM td) t),
        |byj AS (SELECT event_type, count(*) AS nb,
        |    sum(CAST(r2 AS HUGEINT)) AS sr2
        |  FROM rk GROUP BY 1),
        |tm AS (SELECT event_type, nb,
        |    (CAST(sr2 AS DOUBLE) / 2.0e0)
        |      * (CAST(sr2 AS DOUBLE) / 2.0e0) AS term
        |  FROM byj),
        |agg AS (SELECT CAST(max(nb) AS BIGINT) AS nb,
        |    count(*) AS k,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(term ORDER BY event_type)), (a, x) -> a + x)
        |      AS sumr2
        |  FROM tm)
        |SELECT nb AS n_blocks, CAST(k AS BIGINT) AS k,
        |  round(12.0e0 / (CAST(nb AS DOUBLE) * CAST(k AS DOUBLE)
        |    * (CAST(k AS DOUBLE) + 1.0e0)) * sumr2
        |    - 3.0e0 * CAST(nb AS DOUBLE)
        |      * (CAST(k AS DOUBLE) + 1.0e0), 6) AS chi2,
        |  CAST(k - 1 AS BIGINT) AS df,
        |  round(exp(-(12.0e0 / (CAST(nb AS DOUBLE) * CAST(k AS DOUBLE)
        |    * (CAST(k AS DOUBLE) + 1.0e0)) * sumr2
        |    - 3.0e0 * CAST(nb AS DOUBLE)
        |      * (CAST(k AS DOUBLE) + 1.0e0)) / 2.0e0)
        |    * (1.0e0 + (12.0e0 / (CAST(nb AS DOUBLE)
        |      * CAST(k AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0e0))
        |      * sumr2 - 3.0e0 * CAST(nb AS DOUBLE)
        |      * (CAST(k AS DOUBLE) + 1.0e0)) / 2.0e0), 6) AS p_value
        |FROM agg""".stripMargin,

    // shared classifier chain; only the discordant cells
    "q_mcnemar" -> {
      s"""WITH ${OracleHash.classifierScoreCtes("doc_id, n_chars")},
         |ab AS (SELECT CASE WHEN score > 0 THEN 1 ELSE 0 END AS a,
         |    CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS b FROM sc),
         |m AS (SELECT count(*) AS n,
         |    CAST(sum(a * (1 - b)) AS BIGINT) AS n10,
         |    CAST(sum((1 - a) * b) AS BIGINT) AS n01
         |  FROM ab)
         |SELECT n, n10, n01,
         |  CASE WHEN n10 + n01 > 0 THEN round(
         |    (CAST(n10 AS DOUBLE) - CAST(n01 AS DOUBLE))
         |    * (CAST(n10 AS DOUBLE) - CAST(n01 AS DOUBLE))
         |    / (CAST(n10 AS DOUBLE) + CAST(n01 AS DOUBLE)), 6) END
         |    AS chi2
         |FROM m""".stripMargin
    },

    // densified r×c grid from the margin cross product; per-cell terms
    // micro-quantized then integer-summed; mirrored V
    "q_cramers_v" ->
      """WITH o AS (SELECT o_orderstatus AS rr, o_orderpriority AS cc
        |  FROM orders),
        |cells AS (SELECT rr, cc, count(*) AS nij FROM o GROUP BY 1, 2),
        |rm AS (SELECT rr, CAST(sum(nij) AS BIGINT) AS ri
        |  FROM cells GROUP BY 1),
        |cm AS (SELECT cc, CAST(sum(nij) AS BIGINT) AS cj
        |  FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(sum(nij) AS BIGINT) AS n,
        |    count(DISTINCT rr) AS r, count(DISTINCT cc) AS c FROM cells),
        |grid AS (SELECT rm.rr, cm.cc, ri, cj,
        |    coalesce(cells.nij, 0) AS nij
        |  FROM rm CROSS JOIN cm
        |  LEFT JOIN cells ON cells.rr = rm.rr AND cells.cc = cm.cc),
        |tu AS (SELECT n, r, c,
        |    CAST(floor((nij - CAST(ri AS DOUBLE) * cj / n)
        |      * (nij - CAST(ri AS DOUBLE) * cj / n)
        |      / (CAST(ri AS DOUBLE) * cj / n) * 1e6 + 0.5e0) AS BIGINT)
        |      AS t_u
        |  FROM grid CROSS JOIN tot),
        |ag AS (SELECT n, r, c, CAST(sum(t_u) AS BIGINT) AS chi_u
        |  FROM tu GROUP BY 1, 2, 3)
        |SELECT n, r, c, CAST(chi_u AS DOUBLE) / 1e6 AS chi2,
        |  floor(sqrt(CAST(chi_u AS DOUBLE) / 1e6 / (CAST(n AS DOUBLE)
        |    * CAST(least(r, c) - 1 AS DOUBLE))) * 1e6 + 0.5e0) / 1e6
        |    AS cramers_v
        |FROM ag""".stripMargin,

    // per-category terms micro-quantized then integer-summed; df = k−1;
    // the even-df closed-form p guarded on the 5-priority contract
    "q_chisq_gof" ->
      """WITH cells AS (SELECT o_orderpriority AS cat, count(*) AS o
        |  FROM orders GROUP BY 1),
        |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n, count(*) AS k
        |  FROM cells),
        |tu AS (SELECT n, k,
        |    CAST(floor((o - CAST(n AS DOUBLE) / CAST(k AS DOUBLE))
        |      * (o - CAST(n AS DOUBLE) / CAST(k AS DOUBLE))
        |      / (CAST(n AS DOUBLE) / CAST(k AS DOUBLE)) * 1e6 + 0.5e0)
        |      AS BIGINT) AS t_u
        |  FROM cells CROSS JOIN tot),
        |ag AS (SELECT n, k, CAST(sum(t_u) AS BIGINT) AS chi_u
        |  FROM tu GROUP BY 1, 2)
        |SELECT n, k, CAST(chi_u AS DOUBLE) / 1e6 AS chi2,
        |  CAST(k - 1 AS BIGINT) AS df,
        |  CASE WHEN k = 5 THEN
        |    floor(exp(-(CAST(chi_u AS DOUBLE) / 1e6) / 2.0e0)
        |      * (1.0e0 + (CAST(chi_u AS DOUBLE) / 1e6) / 2.0e0)
        |      * 1e6 + 0.5e0) / 1e6 END AS p_value
        |FROM ag""".stripMargin,

    // exact integer per-user mean deltas; ties drop; mirrored z
    "q_sign_test" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS dd,
        |    CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS vq
        |  FROM events),
        |mid AS (SELECT (min(dd) + max(dd)) // 2 AS mid FROM e),
        |u AS (SELECT user_id,
        |    CAST(sum(CASE WHEN dd <= mid THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n1,
        |    CAST(sum(CASE WHEN dd <= mid THEN vq ELSE 0 END) AS BIGINT)
        |      AS sv1,
        |    CAST(sum(CASE WHEN dd > mid THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n2,
        |    CAST(sum(CASE WHEN dd > mid THEN vq ELSE 0 END) AS BIGINT)
        |      AS sv2
        |  FROM e CROSS JOIN mid GROUP BY user_id),
        |dq AS (SELECT CAST(floor((CAST(sv2 AS DOUBLE) / n2
        |      - CAST(sv1 AS DOUBLE) / n1) / 1000.0e0 * 1e6 + 0.5e0)
        |      AS BIGINT) AS dq
        |  FROM u WHERE n1 > 0 AND n2 > 0),
        |m AS (SELECT
        |    CAST(sum(CASE WHEN dq > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_pos,
        |    CAST(sum(CASE WHEN dq < 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_neg
        |  FROM dq)
        |SELECT n_pos, n_neg,
        |  CASE WHEN n_pos + n_neg > 0 THEN
        |    floor((CAST(n_pos AS DOUBLE) - CAST(n_neg AS DOUBLE))
        |      / sqrt(CAST(n_pos AS DOUBLE) + CAST(n_neg AS DOUBLE))
        |      * 1e6 + 0.5e0) / 1e6 END AS z
        |FROM m""".stripMargin,

    // exact counts over the shared exposure window; integer micro rates;
    // mirrored z
    "q_poisson_rate_test" ->
      """WITH e AS (SELECT event_type,
        |    epoch_us(ts) // 86400000000 AS dd
        |  FROM events WHERE event_type IN ('purchase', 'click')),
        |m AS (SELECT
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS k1,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS k2,
        |    max(dd) - min(dd) + 1 AS days
        |  FROM e)
        |SELECT k1, k2, CAST(days AS BIGINT) AS days,
        |  CAST((k1 * 1000000) // days AS DOUBLE) / 1e6 AS rate1,
        |  CAST((k2 * 1000000) // days AS DOUBLE) / 1e6 AS rate2,
        |  CASE WHEN k1 + k2 > 0 THEN
        |    floor((CAST(k1 AS DOUBLE) - CAST(k2 AS DOUBLE))
        |      / sqrt(CAST(k1 AS DOUBLE) + CAST(k2 AS DOUBLE))
        |      * 1e6 + 0.5e0) / 1e6 END AS z
        |FROM m""".stripMargin,

    // exact count moments per item + day totals; micro-quantized item
    // variances; mirrored alpha
    "q_cronbach_alpha" ->
      """WITH td0 AS (SELECT event_type,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dd,
        |    count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |td AS (SELECT t.event_type, d.dd, coalesce(td0.c, 0) AS c
        |  FROM (SELECT DISTINCT dd FROM td0) d
        |  CROSS JOIN (SELECT DISTINCT event_type FROM td0) t
        |  LEFT JOIN td0 ON td0.dd = d.dd
        |    AND td0.event_type = t.event_type),
        |pi AS (SELECT event_type, count(*) AS nd,
        |    CAST(sum(c) AS BIGINT) AS s1,
        |    CAST(sum(c * c) AS BIGINT) AS s2
        |  FROM td GROUP BY 1),
        |it AS (SELECT count(*) AS k, CAST(max(nd) AS BIGINT) AS n_days,
        |    CAST(sum(CAST(floor((CAST(s2 AS DOUBLE)
        |      - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
        |        / CAST(nd AS DOUBLE)) / (CAST(nd AS DOUBLE) - 1.0e0)
        |      * 1e6 + 0.5e0) AS BIGINT)) AS BIGINT) AS svq
        |  FROM pi),
        |tt AS (SELECT count(*) AS ndt, CAST(sum(tot) AS BIGINT) AS t1,
        |    CAST(sum(tot * tot) AS BIGINT) AS t2
        |  FROM (SELECT dd, CAST(sum(c) AS BIGINT) AS tot
        |    FROM td GROUP BY 1) dt)
        |SELECT CAST(k AS BIGINT) AS k, n_days,
        |  round((CAST(t2 AS DOUBLE) - CAST(t1 AS DOUBLE)
        |    * CAST(t1 AS DOUBLE) / CAST(ndt AS DOUBLE))
        |    / (CAST(ndt AS DOUBLE) - 1.0e0), 6) AS var_total,
        |  round(CAST(svq AS DOUBLE) / 1e6, 6) AS sum_item_var,
        |  CASE WHEN k > 1 AND (CAST(t2 AS DOUBLE) - CAST(t1 AS DOUBLE)
        |      * CAST(t1 AS DOUBLE) / CAST(ndt AS DOUBLE))
        |      / (CAST(ndt AS DOUBLE) - 1.0e0) > 0
        |    THEN round(CAST(k AS DOUBLE) / (CAST(k AS DOUBLE) - 1.0e0)
        |      * (1.0e0 - (CAST(svq AS DOUBLE) / 1e6)
        |        / ((CAST(t2 AS DOUBLE) - CAST(t1 AS DOUBLE)
        |          * CAST(t1 AS DOUBLE) / CAST(ndt AS DOUBLE))
        |          / (CAST(ndt AS DOUBLE) - 1.0e0))), 6) END AS alpha
        |FROM it CROSS JOIN tt""".stripMargin,

    // HUGEINT co-moments on the day frame; mirrored pairwise and
    // partial correlation expressions
    "q_partial_corr" ->
      """WITH byd AS (SELECT
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dd,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
        |      END) AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS y,
        |    count(*) AS z
        |  FROM events GROUP BY 1),
        |m AS (SELECT count(*) AS n,
        |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |    sum(CAST(z AS HUGEINT)) AS sz,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx,
        |    sum(CAST(y AS HUGEINT) * y) AS syy,
        |    sum(CAST(z AS HUGEINT) * z) AS szz,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy,
        |    sum(CAST(x AS HUGEINT) * z) AS sxz,
        |    sum(CAST(y AS HUGEINT) * z) AS syz
        |  FROM byd),
        |r AS (SELECT n,
        |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |      / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS rxy,
        |    (CAST(n AS DOUBLE) * CAST(sxz AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sz AS DOUBLE))
        |      / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |        * (CAST(n AS DOUBLE) * CAST(szz AS DOUBLE)
        |        - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE))) AS rxz,
        |    (CAST(n AS DOUBLE) * CAST(syz AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sz AS DOUBLE))
        |      / sqrt((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
        |        * (CAST(n AS DOUBLE) * CAST(szz AS DOUBLE)
        |        - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE))) AS ryz
        |  FROM m)
        |SELECT n AS n_days, round(rxy, 6) AS r_xy,
        |  round(rxz, 6) AS r_xz, round(ryz, 6) AS r_yz,
        |  CASE WHEN rxz * rxz < 1.0e0 AND ryz * ryz < 1.0e0
        |    THEN round((rxy - rxz * ryz)
        |      / sqrt((1.0e0 - rxz * rxz) * (1.0e0 - ryz * ryz)), 6)
        |  END AS r_xy_given_z
        |FROM r""".stripMargin,

    // lagged day frame; closed-form two-predictor normal equations;
    // mirrored F
    "q_granger" ->
      """WITH byd AS (SELECT
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dd,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
        |      END) AS BIGINT) AS p,
        |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS v
        |  FROM events GROUP BY 1),
        |lg AS (SELECT p AS y,
        |    lag(p) OVER (ORDER BY dd) AS x1,
        |    lag(v) OVER (ORDER BY dd) AS x2
        |  FROM byd),
        |f AS (SELECT y, x1, x2 FROM lg WHERE x1 IS NOT NULL),
        |m AS (SELECT count(*) AS n,
        |    sum(CAST(y AS HUGEINT)) AS sy,
        |    sum(CAST(x1 AS HUGEINT)) AS s1,
        |    sum(CAST(x2 AS HUGEINT)) AS s2,
        |    sum(CAST(y AS HUGEINT) * y) AS syy,
        |    sum(CAST(x1 AS HUGEINT) * x1) AS s11,
        |    sum(CAST(x2 AS HUGEINT) * x2) AS s22,
        |    sum(CAST(x1 AS HUGEINT) * y) AS s1y,
        |    sum(CAST(x2 AS HUGEINT) * y) AS s2y,
        |    sum(CAST(x1 AS HUGEINT) * x2) AS s12
        |  FROM f),
        |cm AS (SELECT n,
        |    CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE)
        |      * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS c11,
        |    CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE)
        |      * CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS c22,
        |    CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE)
        |      * CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS c12,
        |    CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE)
        |      * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS c1y,
        |    CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE)
        |      * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS c2y,
        |    CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
        |      * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS cyy
        |  FROM m)
        |SELECT n AS n_obs,
        |  CASE WHEN c11 * c22 - c12 * c12 <> 0 THEN round(
        |    (c2y * c11 - c1y * c12) / (c11 * c22 - c12 * c12), 6) END
        |    AS coef_xlag,
        |  CASE WHEN c11 * c22 - c12 * c12 <> 0
        |    AND cyy - (c1y * c22 - c2y * c12)
        |      / (c11 * c22 - c12 * c12) * c1y
        |      - (c2y * c11 - c1y * c12)
        |      / (c11 * c22 - c12 * c12) * c2y > 0
        |    THEN round(((cyy - c1y * c1y / c11)
        |      - (cyy - (c1y * c22 - c2y * c12)
        |        / (c11 * c22 - c12 * c12) * c1y
        |        - (c2y * c11 - c1y * c12)
        |        / (c11 * c22 - c12 * c12) * c2y))
        |      / ((cyy - (c1y * c22 - c2y * c12)
        |        / (c11 * c22 - c12 * c12) * c1y
        |        - (c2y * c11 - c1y * c12)
        |        / (c11 * c22 - c12 * c12) * c2y)
        |        / (CAST(n AS DOUBLE) - 3.0e0)), 6) END AS f_stat
        |FROM cm""".stripMargin,

    // exact sign pairs on the bounded day frame; tie-corrected variance;
    // continuity-corrected z
    "q_mann_kendall" ->
      """WITH byd AS (SELECT
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dd,
        |    count(*) AS y
        |  FROM events GROUP BY 1),
        |pr AS (SELECT CAST(sign(CAST(b.y AS DOUBLE)
        |    - CAST(a.y AS DOUBLE)) AS BIGINT) AS sg
        |  FROM byd a JOIN byd b ON a.dd < b.dd),
        |sa AS (SELECT CAST(sum(sg) AS BIGINT) AS s FROM pr),
        |na AS (SELECT count(*) AS n FROM byd),
        |ti AS (SELECT CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT)
        |    AS tcorr
        |  FROM (SELECT count(*) AS t FROM byd GROUP BY y) g)
        |SELECT n AS n_days, s,
        |  CASE WHEN (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0e0)
        |      * (2.0e0 * CAST(n AS DOUBLE) + 5.0e0)
        |      - CAST(tcorr AS DOUBLE)) / 18.0e0 > 0
        |    THEN round((CAST(s AS DOUBLE) - sign(CAST(s AS DOUBLE)))
        |      / sqrt((CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0e0)
        |        * (2.0e0 * CAST(n AS DOUBLE) + 5.0e0)
        |        - CAST(tcorr AS DOUBLE)) / 18.0e0), 6) END AS z,
        |  CASE WHEN CAST(s AS DOUBLE) > 0 THEN 'increasing'
        |       WHEN CAST(s AS DOUBLE) < 0 THEN 'decreasing'
        |       ELSE 'none' END AS trend
        |FROM sa CROSS JOIN na CROSS JOIN ti""".stripMargin,

    // bounded (pair x split) expansion; earliest-day argmax; classical
    // closed-form approximate p
    "q_pettitt" ->
      """WITH byd AS (SELECT
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dd,
        |    count(*) AS y
        |  FROM events GROUP BY 1),
        |idx AS (SELECT dd, y,
        |    CAST(row_number() OVER (ORDER BY dd) AS BIGINT) AS t
        |  FROM byd),
        |pr AS (SELECT a.t AS i, b.t AS j, CAST(sign(CAST(b.y AS DOUBLE)
        |    - CAST(a.y AS DOUBLE)) AS BIGINT) AS sg
        |  FROM idx a JOIN idx b ON a.t < b.t),
        |sp AS (SELECT t AS sp FROM idx
        |  WHERE t < (SELECT max(t) FROM idx)),
        |ut AS (SELECT sp, CAST(sum(sg) AS BIGINT) AS u
        |  FROM pr JOIN sp ON pr.i <= sp.sp AND pr.j > sp.sp
        |  GROUP BY 1),
        |na AS (SELECT count(*) AS n FROM idx),
        |best AS (SELECT sp, u FROM (SELECT sp, u,
        |    row_number() OVER (ORDER BY abs(u) DESC, sp) AS rnk
        |  FROM ut) t WHERE rnk = 1)
        |SELECT na.n AS n_days, idx.dd AS break_day, best.u AS u_stat,
        |  round(least(1.0e0, 2.0e0
        |    * exp(-6.0e0 * CAST(abs(best.u) AS DOUBLE)
        |    * CAST(abs(best.u) AS DOUBLE)
        |    / (CAST(na.n AS DOUBLE) * CAST(na.n AS DOUBLE)
        |      * CAST(na.n AS DOUBLE)
        |      + CAST(na.n AS DOUBLE) * CAST(na.n AS DOUBLE)))), 6)
        |    AS p_approx
        |FROM best JOIN idx ON idx.t = best.sp CROSS JOIN na"""
        .stripMargin,

    // shared classifier chain; cross-multiplied integer CDF argmax
    "q_ks_separation" -> {
      s"""WITH ${OracleHash.classifierScoreCtes("doc_id, n_chars")},
         |sv AS (SELECT CAST(score AS BIGINT) AS sv,
         |    CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS pos
         |  FROM sc),
         |bys AS (SELECT sv, CAST(sum(pos) AS BIGINT) AS c1,
         |    CAST(sum(1 - pos) AS BIGINT) AS c0 FROM sv GROUP BY 1),
         |tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
         |    CAST(sum(c0) AS BIGINT) AS n0 FROM bys),
         |cum AS (SELECT sv,
         |    CAST(sum(c1) OVER (ORDER BY sv ROWS BETWEEN UNBOUNDED
         |      PRECEDING AND CURRENT ROW) AS BIGINT) AS f1,
         |    CAST(sum(c0) OVER (ORDER BY sv ROWS BETWEEN UNBOUNDED
         |      PRECEDING AND CURRENT ROW) AS BIGINT) AS f0
         |  FROM bys),
         |gp AS (SELECT sv,
         |    abs(f1::HUGEINT * n0 - f0::HUGEINT * n1) AS gap, n1, n0
         |  FROM cum CROSS JOIN tot),
         |best AS (SELECT sv, gap, n1, n0 FROM (SELECT sv, gap, n1, n0,
         |    row_number() OVER (ORDER BY gap DESC, sv) AS rnk FROM gp) t
         |  WHERE rnk = 1)
         |SELECT n1 AS n_pos, n0 AS n_neg, sv AS ks_score,
         |  CAST((1000000::HUGEINT * gap) // (n1::HUGEINT * n0)
         |    AS BIGINT) AS ks_u
         |FROM best""".stripMargin
    },

    // exact HUGEINT raw moments; the central-moment/skew/kurtosis closed
    // form mirrors the Spark expression token-for-token
    "q_jarque_bera" ->
      """WITH byd AS (SELECT event_type,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dd,
        |    count(*) AS y
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, count(*) AS n,
        |    sum(CAST(y AS HUGEINT)) AS s1,
        |    sum(CAST(y AS HUGEINT) * y) AS s2,
        |    sum(CAST(y AS HUGEINT) * y * y) AS s3,
        |    sum(CAST(y AS HUGEINT) * y * y * y) AS s4
        |  FROM byd GROUP BY 1),
        |f AS (SELECT event_type, n, CAST(n AS DOUBLE) AS nd,
        |    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
        |    CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
        |    CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
        |    CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
        |  FROM m),
        |g AS (SELECT event_type, n, nd,
        |    r2 - mu * mu AS m2,
        |    r3 - 3.0e0 * mu * r2 + 2.0e0 * mu * mu * mu AS m3,
        |    r4 - 4.0e0 * mu * r3 + 6.0e0 * mu * mu * r2
        |      - 3.0e0 * mu * mu * mu * mu AS m4
        |  FROM f),
        |h AS (SELECT event_type, n, nd, m2,
        |    m3 / (sqrt(m2) * m2) AS sk, m4 / (m2 * m2) AS ku
        |  FROM g)
        |SELECT event_type, n AS n_days,
        |  CASE WHEN m2 > 0 THEN floor(sk * 1e6 + 0.5e0) / 1e6 END AS skew,
        |  CASE WHEN m2 > 0 THEN floor(ku * 1e6 + 0.5e0) / 1e6
        |    END AS kurtosis,
        |  CASE WHEN m2 > 0 THEN floor(nd / 6.0e0 * (sk * sk
        |    + (ku - 3.0e0) * (ku - 3.0e0) / 4.0e0) * 1e6 + 0.5e0) / 1e6
        |    END AS jb
        |FROM h ORDER BY event_type""".stripMargin,

    // integer-decided argmax (|n·y − Σy| in HUGEINT), earliest-day tiebreak
    "q_grubbs" ->
      """WITH byd AS (SELECT
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dd,
        |    count(*) AS y
        |  FROM events GROUP BY 1),
        |m AS (SELECT count(*) AS n, sum(CAST(y AS HUGEINT)) AS s1,
        |    sum(CAST(y AS HUGEINT) * y) AS s2
        |  FROM byd),
        |t AS (SELECT dd, y, n, s1, s2,
        |    row_number() OVER (ORDER BY abs(CAST(y AS HUGEINT) * n - s1)
        |      DESC, dd) AS rnk
        |  FROM byd CROSS JOIN m),
        |top AS (SELECT dd, y, n, s1, s2 FROM t WHERE rnk = 1),
        |f AS (SELECT dd, y, n, CAST(n AS DOUBLE) AS nd,
        |    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
        |    (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
        |      / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0e0) AS vr
        |  FROM top)
        |SELECT n AS n_days, dd AS outlier_dd, CAST(y AS BIGINT)
        |    AS outlier_y,
        |  floor(mu * 1e6 + 0.5e0) / 1e6 AS mean,
        |  CASE WHEN vr > 0 THEN floor(sqrt(vr) * 1e6 + 0.5e0) / 1e6
        |    END AS sd,
        |  CASE WHEN vr > 0 THEN
        |    floor(abs(CAST(y AS DOUBLE) - mu) / sqrt(vr) * 1e6 + 0.5e0)
        |      / 1e6 END AS g
        |FROM f""".stripMargin,

    // exact integer sign pairs over the bounded day² frame; tau-b tie
    // correction from exact pair counts
    "q_kendall_tau" ->
      """WITH byd AS (SELECT
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dd,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |pr AS (SELECT
        |    CAST(sign(CAST(b.x AS DOUBLE) - a.x)
        |      * sign(CAST(b.y AS DOUBLE) - a.y) AS BIGINT) AS cd,
        |    CASE WHEN a.x = b.x THEN 1 ELSE 0 END AS tx,
        |    CASE WHEN a.y = b.y THEN 1 ELSE 0 END AS ty
        |  FROM byd a JOIN byd b ON a.dd < b.dd),
        |agg AS (SELECT
        |    CAST(sum(CASE WHEN cd = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN cd = -1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS dis,
        |    CAST(sum(tx) AS BIGINT) AS n1, CAST(sum(ty) AS BIGINT) AS n2,
        |    count(*) AS n0
        |  FROM pr)
        |SELECT n0 AS n_pairs, c AS concordant, dis AS discordant,
        |  CASE WHEN sqrt(CAST(n0 - n1 AS DOUBLE)
        |      * CAST(n0 - n2 AS DOUBLE)) > 0 THEN
        |    floor(CAST(c - dis AS DOUBLE)
        |      / sqrt(CAST(n0 - n1 AS DOUBLE) * CAST(n0 - n2 AS DOUBLE))
        |      * 1e6 + 0.5e0) / 1e6 END AS tau_b
        |FROM agg""".stripMargin,

    // pooled-SD standardized difference from exact micro-unit moments;
    // micro scale cancels in the ratio
    "q_cohens_d" ->
      """WITH e AS (SELECT event_type, user_id % 2 AS arm,
        |    CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS vq
        |  FROM events),
        |m AS (SELECT event_type,
        |    count(CASE WHEN arm = 0 THEN 1 END) AS n_a,
        |    sum(CASE WHEN arm = 0 THEN CAST(vq AS HUGEINT) END) AS s_a,
        |    sum(CASE WHEN arm = 0 THEN CAST(vq AS HUGEINT) * vq END)
        |      AS q_a,
        |    count(CASE WHEN arm = 1 THEN 1 END) AS n_b,
        |    sum(CASE WHEN arm = 1 THEN CAST(vq AS HUGEINT) END) AS s_b,
        |    sum(CASE WHEN arm = 1 THEN CAST(vq AS HUGEINT) * vq END)
        |      AS q_b
        |  FROM e GROUP BY 1),
        |f AS (SELECT event_type, n_a, n_b,
        |    CAST(s_a AS DOUBLE) / n_a AS mn_a,
        |    CAST(s_b AS DOUBLE) / n_b AS mn_b,
        |    (CAST(q_a AS DOUBLE) - CAST(s_a AS DOUBLE)
        |      * CAST(s_a AS DOUBLE) / n_a) / (n_a - 1) AS va,
        |    (CAST(q_b AS DOUBLE) - CAST(s_b AS DOUBLE)
        |      * CAST(s_b AS DOUBLE) / n_b) / (n_b - 1) AS vb
        |  FROM m),
        |g AS (SELECT event_type, n_a, n_b, mn_a, mn_b,
        |    sqrt(((n_a - 1) * va + (n_b - 1) * vb) / (n_a + n_b - 2))
        |      AS sp
        |  FROM f)
        |SELECT event_type, n_a, n_b,
        |  CASE WHEN sp > 0 THEN
        |    floor((mn_a - mn_b) / sp * 1e6 + 0.5e0) / 1e6 END AS cohens_d,
        |  CASE WHEN sp > 0 THEN
        |    floor((mn_a - mn_b) / sp * (1.0e0 - 3.0e0
        |      / (4.0e0 * CAST(n_a + n_b AS DOUBLE) - 9.0e0)) * 1e6
        |      + 0.5e0) / 1e6 END AS hedges_g
        |FROM g ORDER BY event_type""".stripMargin,

    // exact lower-median deviations; between/within SS as integer
    // rationals (S² div n per group — truncation identical on both
    // engines) so the k-row reduction sums integers and only the final
    // W ratio is floating point
    "q_levene_bf" ->
      """WITH e AS (SELECT event_type, event_id,
        |    CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS vq
        |  FROM events),
        |med AS (SELECT event_type, vq AS med FROM (
        |    SELECT event_type, vq,
        |      row_number() OVER (PARTITION BY event_type
        |        ORDER BY vq, event_id) AS rn,
        |      count(*) OVER (PARTITION BY event_type) AS n
        |    FROM e) t
        |  WHERE rn = (n + 1) // 2),
        |z AS (SELECT e.event_type, abs(e.vq - med.med) AS z
        |  FROM e JOIN med USING (event_type)),
        |g AS (SELECT event_type, count(*) AS nj,
        |    sum(CAST(z AS HUGEINT)) AS sj,
        |    sum(CAST(z AS HUGEINT) * z) AS qj
        |  FROM z GROUP BY 1),
        |gg AS (SELECT nj, sj, (sj * sj) // nj AS tj, qj
        |  FROM g),
        |tot AS (SELECT count(*) AS k, sum(nj) AS n, sum(sj) AS s,
        |    sum(tj) AS t_tot, sum(qj - tj) AS denom_u
        |  FROM gg)
        |SELECT CAST(k AS BIGINT) AS k_groups, CAST(n AS BIGINT)
        |    AS n_total,
        |  CASE WHEN CAST(denom_u AS DOUBLE) > 0 THEN
        |    floor(CAST(n - k AS DOUBLE) / CAST(k - 1 AS DOUBLE)
        |      * CAST(t_tot - (s * s) // n AS DOUBLE)
        |      / CAST(denom_u AS DOUBLE) * 1e6 + 0.5e0) / 1e6 END AS bf_w
        |FROM tot""".stripMargin,

    // same 16-tap Horner lag fold as q_ewma, on the daily count series;
    // asymptotic limits from exact integer moments
    "q_ewma_chart" -> {
      val inner = s"coalesce(lag(yd, ${ewmaChartTaps - 1}) OVER w, 0.0e0)"
      val tail = (ewmaChartTaps - 2 to 1 by -1).foldLeft(inner) {
        (acc, k) => s"coalesce(lag(yd, $k) OVER w, 0.0e0) + 0.8e0 * ($acc)"
      }
      s"""WITH byd AS (SELECT
         |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dd,
         |    count(*) AS y, CAST(count(*) AS DOUBLE) AS yd
         |  FROM events GROUP BY 1),
         |m AS (SELECT count(*) AS n, sum(CAST(y AS HUGEINT)) AS s1,
         |    sum(CAST(y AS HUGEINT) * y) AS s2
         |  FROM byd),
         |f AS (SELECT dd, y, 0.2e0 * (yd + 0.8e0 * ($tail)) AS z
         |  FROM byd WINDOW w AS (ORDER BY dd)),
         |g AS (SELECT CAST(n AS DOUBLE) AS nd,
         |    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
         |    (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
         |      / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0e0) AS vr
         |  FROM m)
         |SELECT dd, CAST(y AS BIGINT) AS y,
         |  floor(z * 1e6 + 0.5e0) / 1e6 AS ewma,
         |  COALESCE(CASE WHEN vr > 0 THEN
         |    abs(z - mu) > 3.0e0 * sqrt(vr) * sqrt(0.2e0 / 1.8e0)
         |    END, FALSE) AS violation
         |FROM f CROSS JOIN g ORDER BY dd""".stripMargin
    },

    // exact HUGEINT overlap cross-moments per lag; full-series central
    // moments in the denominator, one fixed ratio
    "q_ccf" ->
      """WITH byd AS (SELECT
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dd,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |m AS (SELECT count(*) AS n, sum(CAST(x AS HUGEINT)) AS sx,
        |    sum(CAST(y AS HUGEINT)) AS sy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx,
        |    sum(CAST(y AS HUGEINT) * y) AS syy
        |  FROM byd),
        |l AS (SELECT unnest(range(-7, 8)) AS lag),
        |o AS (SELECT lag, count(*) AS n_overlap,
        |    sum(CAST(a.x AS HUGEINT)) AS sxo,
        |    sum(CAST(b.y AS HUGEINT)) AS syo,
        |    sum(CAST(a.x AS HUGEINT) * b.y) AS sxyo
        |  FROM byd a CROSS JOIN l JOIN byd b ON b.dd = a.dd + l.lag
        |  GROUP BY 1),
        |f AS (SELECT lag, n_overlap, CAST(n AS DOUBLE) AS nd,
        |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx,
        |    CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my,
        |    CAST(sxx AS DOUBLE) AS sxxd, CAST(syy AS DOUBLE) AS syyd,
        |    CAST(sxo AS DOUBLE) AS sxod, CAST(syo AS DOUBLE) AS syod,
        |    CAST(sxyo AS DOUBLE) AS sxyod
        |  FROM o CROSS JOIN m)
        |SELECT CAST(lag AS BIGINT) AS lag, n_overlap,
        |  CASE WHEN sqrt((sxxd - nd * mx * mx)
        |      * (syyd - nd * my * my)) > 0 THEN
        |    floor((sxyod - mx * syod - my * sxod
        |      + CAST(n_overlap AS DOUBLE) * mx * my)
        |      / sqrt((sxxd - nd * mx * mx) * (syyd - nd * my * my))
        |      * 1e6 + 0.5e0) / 1e6 END AS ccf
        |FROM f ORDER BY lag""".stripMargin,

    // exact integer rolling sums; bands NULL until the window is full
    "q_bollinger" ->
      """WITH byd AS (SELECT
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dd,
        |    count(*) AS y
        |  FROM events GROUP BY 1),
        |r AS (SELECT dd, y,
        |    count(*) OVER w AS cnt,
        |    sum(y) OVER w AS rs1,
        |    sum(y * y) OVER w AS rs2
        |  FROM byd
        |  WINDOW w AS (ORDER BY dd
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
        |f AS (SELECT dd, y, cnt, CAST(cnt AS DOUBLE) AS cd,
        |    CAST(rs1 AS DOUBLE) AS r1, CAST(rs2 AS DOUBLE) AS r2
        |  FROM r)
        |SELECT dd, CAST(y AS BIGINT) AS y,
        |  CASE WHEN cnt = 7 THEN floor(r1 / cd * 1e6 + 0.5e0) / 1e6
        |    END AS mid,
        |  CASE WHEN cnt = 7 THEN
        |    CASE WHEN (r2 - r1 * r1 / cd) / (cd - 1.0e0) > 0
        |    THEN floor((r1 / cd + 2.0e0
        |      * sqrt((r2 - r1 * r1 / cd) / (cd - 1.0e0))) * 1e6 + 0.5e0)
        |      / 1e6 END END AS bb_upper,
        |  CASE WHEN cnt = 7 THEN
        |    CASE WHEN (r2 - r1 * r1 / cd) / (cd - 1.0e0) > 0
        |    THEN floor((r1 / cd - 2.0e0
        |      * sqrt((r2 - r1 * r1 / cd) / (cd - 1.0e0))) * 1e6 + 0.5e0)
        |      / 1e6 END END AS bb_lower,
        |  COALESCE(CASE WHEN cnt = 7 THEN
        |    CASE WHEN (r2 - r1 * r1 / cd) / (cd - 1.0e0) > 0
        |    THEN CAST(y AS DOUBLE) > r1 / cd + 2.0e0
        |        * sqrt((r2 - r1 * r1 / cd) / (cd - 1.0e0))
        |      OR CAST(y AS DOUBLE) < r1 / cd - 2.0e0
        |        * sqrt((r2 - r1 * r1 / cd) / (cd - 1.0e0))
        |    END END, FALSE) AS breakout
        |FROM f ORDER BY dd""".stripMargin,

    // integer cumulative-deviation ranges (Z·w = w·cum − (k+1)·S);
    // R/S = R_u / sqrt(w·SS − S²) with HUGEINT products; micro-quantized
    // per-segment R/S before the order-free per-w mean; 3-point OLS H
    "q_hurst" ->
      """WITH b0 AS (SELECT
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dd,
        |    count(*) AS y
        |  FROM events GROUP BY 1),
        |byd AS (SELECT dd, y,
        |    row_number() OVER (ORDER BY dd) - 1 AS idx
        |  FROM b0),
        |t AS (SELECT count(*) AS nd FROM byd),
        |wv AS (SELECT unnest(range(1, 4)) * 5 AS w),
        |segs AS (SELECT b.y, wv.w, b.idx // wv.w AS seg,
        |    b.idx % wv.w AS pos
        |  FROM byd b CROSS JOIN wv CROSS JOIN t
        |  WHERE b.idx // wv.w < t.nd // wv.w),
        |z AS (SELECT w, seg, pos,
        |    sum(y) OVER ws AS s,
        |    sum(CAST(y AS HUGEINT) * y) OVER ws AS ss,
        |    sum(y) OVER (PARTITION BY w, seg ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
        |  FROM segs WINDOW ws AS (PARTITION BY w, seg)),
        |zz AS (SELECT w, seg, w * c - (pos + 1) * s AS zs, s, ss FROM z),
        |perseg AS (SELECT w, seg, max(zs) AS zmax, min(zs) AS zmin,
        |    max(s) AS stot, max(ss) AS sstot
        |  FROM zz GROUP BY 1, 2),
        |rs AS (SELECT w, seg, zmax, zmin,
        |    CAST(CAST(w AS HUGEINT) * sstot
        |      - CAST(stot AS HUGEINT) * stot AS DOUBLE) AS den2
        |  FROM perseg),
        |r6 AS (SELECT w,
        |    CAST(floor(CAST(zmax - zmin AS DOUBLE) / sqrt(den2) * 1e6
        |      + 0.5e0) AS BIGINT) AS rs6
        |  FROM rs WHERE den2 > 0),
        |perw AS (SELECT w, count(*) AS n_segs, sum(rs6) AS srs
        |  FROM r6 GROUP BY 1),
        |pw3 AS (SELECT w, n_segs, srs // n_segs AS mean_rs_u,
        |    CAST(floor(ln(CAST(w AS DOUBLE)) * 1e6 + 0.5e0) AS BIGINT)
        |      AS lnw_u,
        |    CAST(floor(ln(CAST(srs // n_segs AS DOUBLE) / 1e6) * 1e6
        |      + 0.5e0) AS BIGINT) AS lnrs_u
        |  FROM perw),
        |fit AS (SELECT count(*) AS np, sum(lnw_u) AS sa,
        |    sum(lnrs_u) AS sb,
        |    sum(CAST(lnw_u AS HUGEINT) * lnw_u) AS saa,
        |    sum(CAST(lnw_u AS HUGEINT) * lnrs_u) AS sab
        |  FROM pw3),
        |h AS (SELECT CASE WHEN CAST(np AS DOUBLE) * CAST(saa AS DOUBLE)
        |      - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) <> 0 THEN
        |    floor((CAST(np AS DOUBLE) * CAST(sab AS DOUBLE)
        |      - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
        |      / (CAST(np AS DOUBLE) * CAST(saa AS DOUBLE)
        |      - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)) * 1e6 + 0.5e0)
        |      / 1e6 END AS h
        |  FROM fit)
        |SELECT CAST(w AS BIGINT) AS w, n_segs,
        |  CAST(mean_rs_u AS DOUBLE) / 1e6 AS rs_mean, h
        |FROM pw3 CROSS JOIN h ORDER BY w""".stripMargin,

    // exact 2×-unit average ranks (2·min_rank + ties − 1); tie groups
    // aggregated once; one fixed normal-approximation expression
    "q_wilcoxon_signed" ->
      """WITH byd AS (SELECT
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dd,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |dz AS (SELECT dd, x - y AS diff, abs(x - y) AS ad
        |  FROM byd WHERE x - y <> 0),
        |r AS (SELECT diff, ad,
        |    rank() OVER (ORDER BY ad) AS rnk,
        |    count(*) OVER (PARTITION BY ad) AS t
        |  FROM dz),
        |r2 AS (SELECT diff, ad, t, 2 * rnk + t - 1 AS avg2 FROM r),
        |agg AS (SELECT count(*) AS n,
        |    CAST(sum(CASE WHEN diff > 0 THEN avg2 ELSE 0 END) AS BIGINT)
        |      AS w2p
        |  FROM r2),
        |ties AS (SELECT COALESCE(CAST(sum(t * t * t - t) AS BIGINT), 0)
        |      AS tcorr
        |  FROM (SELECT DISTINCT ad, t FROM r2) g)
        |SELECT n AS n_nonzero,
        |  CAST(w2p AS DOUBLE) / 2.0e0 AS w_plus,
        |  CASE WHEN CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0e0)
        |      * (2.0e0 * CAST(n AS DOUBLE) + 1.0e0) / 24.0e0
        |      - CAST(tcorr AS DOUBLE) / 48.0e0 > 0 THEN
        |    floor((CAST(w2p AS DOUBLE) / 2.0e0 - CAST(n AS DOUBLE)
        |      * (CAST(n AS DOUBLE) + 1.0e0) / 4.0e0)
        |      / sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0e0)
        |      * (2.0e0 * CAST(n AS DOUBLE) + 1.0e0) / 24.0e0
        |      - CAST(tcorr AS DOUBLE) / 48.0e0) * 1e6 + 0.5e0) / 1e6
        |    END AS z
        |FROM agg CROSS JOIN ties""".stripMargin,

    // one conditional-moment scan; all pairs on the bounded k-row frame;
    // 3.86 = studentized-range critical (k=5, df→∞, α=0.05)
    "q_tukey_hsd" ->
      """WITH e AS (SELECT event_type,
        |    CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS vq
        |  FROM events),
        |g AS (SELECT event_type, count(*) AS nj,
        |    sum(CAST(vq AS HUGEINT)) AS sj,
        |    sum(CAST(vq AS HUGEINT) * vq) AS qj
        |  FROM e GROUP BY 1),
        |tot AS (SELECT count(*) AS k, sum(nj) AS n,
        |    sum(qj - (sj * sj) // nj) AS ssw_u
        |  FROM g),
        |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    a.nj AS na, a.sj AS sa, b.nj AS nb, b.sj AS sb
        |  FROM g a JOIN g b ON a.event_type < b.event_type),
        |f AS (SELECT type_a, type_b,
        |    CAST(sa AS DOUBLE) / na AS ma, CAST(sb AS DOUBLE) / nb AS mb,
        |    sqrt(CAST(ssw_u AS DOUBLE) / CAST(n - k AS DOUBLE) / 2.0e0
        |      * (1.0e0 / na + 1.0e0 / nb)) AS se
        |  FROM p CROSS JOIN tot)
        |SELECT type_a, type_b,
        |  floor((ma - mb) / 1000.0e0 * 1e6 + 0.5e0) / 1e6 AS mean_diff,
        |  CASE WHEN se > 0 THEN
        |    floor(abs(ma - mb) / se * 1e6 + 0.5e0) / 1e6 END AS q_stat,
        |  COALESCE(CASE WHEN se > 0 THEN abs(ma - mb) / se > 3.86e0
        |    END, FALSE) AS significant
        |FROM f ORDER BY type_a, type_b""".stripMargin,

    // exact integer moments per group; ln terms micro-quantized BEFORE the
    // k-row sum (floor-ln idiom); reciprocal sum in C as exact pico-unit
    // integer division; one final T/C double ratio
    "q_bartlett" ->
      """WITH e AS (SELECT event_type,
        |    CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS vq
        |  FROM events),
        |g AS (SELECT event_type, count(*) AS nj,
        |    sum(CAST(vq AS HUGEINT)) AS sj,
        |    sum(CAST(vq AS HUGEINT) * vq) AS qj
        |  FROM e GROUP BY 1),
        |per AS (SELECT nj,
        |    CASE WHEN (CAST(qj AS DOUBLE) - CAST(sj AS DOUBLE)
        |        * CAST(sj AS DOUBLE) / nj) / (nj - 1) > 0
        |      THEN (nj - 1) * CAST(floor(ln((CAST(qj AS DOUBLE)
        |        - CAST(sj AS DOUBLE) * CAST(sj AS DOUBLE) / nj)
        |        / (nj - 1)) * 1e6 + 0.5e0) AS BIGINT)
        |      ELSE 0 END AS lj_w,
        |    CASE WHEN (CAST(qj AS DOUBLE) - CAST(sj AS DOUBLE)
        |        * CAST(sj AS DOUBLE) / nj) / (nj - 1) > 0
        |      THEN 0 ELSE 1 END AS degen,
        |    qj - (sj * sj) // nj AS ssw_j,
        |    1000000000000 // (nj - 1) AS rj
        |  FROM g),
        |t AS (SELECT count(*) AS k, CAST(sum(nj) AS BIGINT) AS n,
        |    CAST(sum(lj_w) AS BIGINT) AS sum_lj,
        |    CAST(sum(degen) AS BIGINT) AS n_degen,
        |    sum(ssw_j) AS ssw_u, CAST(sum(rj) AS BIGINT) AS sum_rj
        |  FROM per)
        |SELECT k, n, k - 1 AS df,
        |  CASE WHEN n_degen = 0
        |    AND CAST(ssw_u AS DOUBLE) / CAST(n - k AS DOUBLE) > 0
        |  THEN floor((CAST(n - k AS DOUBLE)
        |    * floor(ln(CAST(ssw_u AS DOUBLE) / CAST(n - k AS DOUBLE))
        |      * 1e6 + 0.5e0)
        |    - CAST(sum_lj AS DOUBLE)) / 1e6
        |    / (1.0e0 + (CAST(sum_rj AS DOUBLE) / 1e12
        |      - 1.0e0 / CAST(n - k AS DOUBLE))
        |      / (3.0e0 * CAST(k - 1 AS DOUBLE)))
        |    * 1e6 + 0.5e0) / 1e6
        |  END AS bartlett_chi2
        |FROM t""".stripMargin,

    // distinct (user, day, type) triples; exact integer row/column
    // totals; one closed-form double ratio
    "q_cochran_q" ->
      """WITH p AS (SELECT DISTINCT user_id,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dd,
        |    event_type
        |  FROM events),
        |r AS (SELECT count(*) AS n_blocks,
        |    CAST(sum(ri) AS BIGINT) AS n_tot,
        |    CAST(sum(ri * ri) AS BIGINT) AS sr2
        |  FROM (SELECT user_id, dd, count(*) AS ri
        |    FROM p GROUP BY 1, 2) t),
        |c AS (SELECT count(*) AS k, CAST(sum(cj * cj) AS BIGINT) AS sc2
        |  FROM (SELECT event_type, count(*) AS cj FROM p GROUP BY 1) t)
        |SELECT k, n_blocks, k - 1 AS df,
        |  CASE WHEN CAST(k AS DOUBLE) * n_tot - CAST(sr2 AS DOUBLE) > 0
        |  THEN floor(CAST(k - 1 AS DOUBLE)
        |    * (CAST(k AS DOUBLE) * sc2 - CAST(n_tot AS DOUBLE) * n_tot)
        |    / (CAST(k AS DOUBLE) * n_tot - CAST(sr2 AS DOUBLE))
        |    * 1e6 + 0.5e0) / 1e6
        |  END AS q_stat
        |FROM r CROSS JOIN c""".stripMargin,

    // global lower median off the distinct-value contingency prefix; per-
    // cell chi-square terms as exact HUGEINT micro-units
    "q_mood_median" ->
      """WITH e AS (SELECT event_type,
        |    CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS vq
        |  FROM events),
        |cum AS (SELECT vq, CAST(sum(cnt) OVER (ORDER BY vq
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum
        |  FROM (SELECT vq, count(*) AS cnt FROM e GROUP BY 1) t),
        |tot AS (SELECT count(*) AS n FROM e),
        |med AS (SELECT min(vq) AS med FROM cum CROSS JOIN tot
        |  WHERE cum >= (n + 1) // 2),
        |cells AS (SELECT event_type, count(*) AS rt,
        |    CAST(sum(CASE WHEN vq > med THEN 1 ELSE 0 END) AS BIGINT)
        |      AS above
        |  FROM e CROSS JOIN med GROUP BY 1),
        |g AS (SELECT CAST(sum(rt) AS BIGINT) AS nn,
        |    CAST(sum(above) AS BIGINT) AS ca FROM cells),
        |wt AS (SELECT nn, ca,
        |    CAST(above AS HUGEINT) * nn - CAST(rt AS HUGEINT) * ca
        |      AS dev_a,
        |    CAST(rt AS HUGEINT) * ca * nn AS den_a,
        |    CAST(rt - above AS HUGEINT) * nn
        |      - CAST(rt AS HUGEINT) * (nn - ca) AS dev_b,
        |    CAST(rt AS HUGEINT) * (nn - ca) * nn AS den_b
        |  FROM cells CROSS JOIN g),
        |terms AS (SELECT nn, ca,
        |    (dev_a * dev_a * 1000000) // den_a
        |      + (dev_b * dev_b * 1000000) // den_b AS t_u
        |  FROM wt),
        |fin AS (SELECT nn, ca, count(*) AS k, sum(t_u) AS chi_u
        |  FROM terms GROUP BY 1, 2)
        |SELECT k, nn AS n, CAST(med AS DOUBLE) / 1000.0e0 AS median,
        |  k - 1 AS df, CAST(chi_u AS DOUBLE) / 1e6 AS chi2
        |FROM fin CROSS JOIN med""".stripMargin,

    // the q_acf deviation frame at lags 1-2; Yule-Walker closed forms as
    // fixed double expressions over three exact integers
    "q_ar_fit" ->
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
        |    count(*) AS n_days FROM idx),
        |a AS (SELECT CAST(k AS BIGINT) AS k, t + k AS tk, dq AS dqa
        |  FROM idx CROSS JOIN (SELECT unnest(range(1, 3)) AS k) ks),
        |p AS (SELECT a.k, a.dqa, b.dq AS dqb
        |  FROM a JOIN idx b ON b.t = a.tk),
        |nums AS (SELECT
        |    CAST(sum(CASE WHEN k = 1 THEN dqa * dqb END) AS BIGINT)
        |      AS num1,
        |    CAST(sum(CASE WHEN k = 2 THEN dqa * dqb END) AS BIGINT)
        |      AS num2
        |  FROM p),
        |f AS (SELECT n_days, den,
        |    CAST(num1 AS DOUBLE) / den AS rr1,
        |    CAST(num2 AS DOUBLE) / den AS rr2
        |  FROM den CROSS JOIN nums)
        |SELECT n_days,
        |  CASE WHEN den > 0
        |    THEN floor(rr1 * 1e6 + 0.5e0) / 1e6 END AS r1,
        |  CASE WHEN den > 0
        |    THEN floor(rr2 * 1e6 + 0.5e0) / 1e6 END AS r2,
        |  CASE WHEN den > 0 AND rr1 * rr1 <> 1.0e0
        |    THEN floor(rr1 * (1.0e0 - rr2) / (1.0e0 - rr1 * rr1)
        |      * 1e6 + 0.5e0) / 1e6 END AS phi1,
        |  CASE WHEN den > 0 AND rr1 * rr1 <> 1.0e0
        |    THEN floor((rr2 - rr1 * rr1) / (1.0e0 - rr1 * rr1)
        |      * 1e6 + 0.5e0) / 1e6 END AS phi2,
        |  CASE WHEN den > 0 AND rr1 * rr1 <> 1.0e0
        |    THEN floor((1.0e0
        |      - rr1 * (1.0e0 - rr2) / (1.0e0 - rr1 * rr1) * rr1
        |      - (rr2 - rr1 * rr1) / (1.0e0 - rr1 * rr1) * rr2)
        |      * 1e6 + 0.5e0) / 1e6 END AS noise_ratio
        |FROM f""".stripMargin,

    // the SAME driver-quantized integer basis table as the Spark side
    // (interpolated below) — neither engine evaluates trig at query time
    "q_periodogram" -> {
      val values = dftCoeffs
        .map { case (m, c, sq) => s"($m, $c, $sq)" }.mkString(", ")
      s"""WITH coef(m, cq, sq) AS (VALUES $values),
         |byd AS (SELECT
         |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dd,
         |    count(*) AS y
         |  FROM events GROUP BY 1),
         |d0 AS (SELECT min(dd) AS d0 FROM byd),
         |f AS (SELECT dd - d0 AS t, y FROM byd CROSS JOIN d0
         |  WHERE dd - d0 < $dftWindowDays),
         |fan AS (SELECT k, (k * t) % $dftWindowDays AS m, y
         |  FROM f CROSS JOIN (SELECT unnest(range(1, 9)) AS k) ks),
         |agg AS (SELECT k, CAST(sum(y * cq) AS BIGINT) AS re_u,
         |    CAST(sum(y * sq) AS BIGINT) AS im_u
         |  FROM fan JOIN coef USING (m) GROUP BY 1)
         |SELECT k, ${dftWindowDays.toDouble}e0 / k AS period_days,
         |  re_u, im_u,
         |  CAST((CAST(re_u AS HUGEINT) * re_u
         |    + CAST(im_u AS HUGEINT) * im_u)
         |    // 1000000000000 AS BIGINT) AS power
         |FROM agg ORDER BY k""".stripMargin
    },

    // four exact conversion integers; posterior moments + A&S 26.2.17 Φ as
    // one mirrored double expression
    "q_bayes_ab" ->
      """WITH conv AS (SELECT user_id % 2 AS arm, user_id,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS cv
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT
        |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_a,
        |    CAST(sum(CASE WHEN arm = 0 THEN cv ELSE 0 END) AS BIGINT)
        |      AS x_a,
        |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b,
        |    CAST(sum(CASE WHEN arm = 1 THEN cv ELSE 0 END) AS BIGINT)
        |      AS x_b
        |  FROM conv),
        |s AS (SELECT n_a, x_a, n_b, x_b,
        |    ((1.0e0 + x_b) / (2.0e0 + n_b)
        |      - (1.0e0 + x_a) / (2.0e0 + n_a))
        |    / sqrt((1.0e0 + x_a) * (1.0e0 + n_a - x_a)
        |        / ((2.0e0 + n_a) * (2.0e0 + n_a) * (3.0e0 + n_a))
        |      + (1.0e0 + x_b) * (1.0e0 + n_b - x_b)
        |        / ((2.0e0 + n_b) * (2.0e0 + n_b) * (3.0e0 + n_b)))
        |      AS z
        |  FROM m),
        |p AS (SELECT n_a, x_a, n_b, x_b, z,
        |    1.0e0 / (1.0e0 + 0.2316419e0 * abs(z)) AS t
        |  FROM s),
        |f AS (SELECT n_a, x_a, n_b, x_b, z,
        |    1.0e0 - 0.3989422804014327e0 * exp(abs(z) * abs(z) / -2.0e0)
        |    * (t * (0.319381530e0 + t * (-0.356563782e0
        |      + t * (1.781477937e0 + t * (-1.821255978e0
        |      + t * 1.330274429e0))))) AS phi_pos
        |  FROM p)
        |SELECT n_a, x_a, n_b, x_b,
        |  floor((1.0e0 + x_a) / (2.0e0 + n_a) * 1e6 + 0.5e0) / 1e6
        |    AS mean_a,
        |  floor((1.0e0 + x_b) / (2.0e0 + n_b) * 1e6 + 0.5e0) / 1e6
        |    AS mean_b,
        |  floor(CASE WHEN z >= 0 THEN phi_pos ELSE 1.0e0 - phi_pos END
        |    * 1e6 + 0.5e0) / 1e6 AS p_b_beats_a
        |FROM f""".stripMargin,

    // four unrolled margin scalings in integer micro-units; identical
    // DECIMAL/HUGEINT truncation on both engines
    "q_ipf_rake" ->
      """WITH cells AS (SELECT lang, source, count(*) AS n
        |  FROM documents GROUP BY 1, 2),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
        |    count(DISTINCT lang) AS nr, count(DISTINCT source) AS nc
        |  FROM cells),
        |b0 AS (SELECT lang, source, n,
        |    (nn * 1000000) // nr AS tr_u, (nn * 1000000) // nc AS tc_u,
        |    n * 1000000 AS w_u
        |  FROM cells CROSS JOIN tot),
        |r1 AS (SELECT lang, source, n, tr_u, tc_u,
        |    CAST((CAST(w_u AS HUGEINT) * tr_u)
        |      // CAST(sum(w_u) OVER (PARTITION BY lang) AS HUGEINT)
        |      AS BIGINT) AS w_u
        |  FROM b0),
        |c1 AS (SELECT lang, source, n, tr_u, tc_u,
        |    CAST((CAST(w_u AS HUGEINT) * tc_u)
        |      // CAST(sum(w_u) OVER (PARTITION BY source) AS HUGEINT)
        |      AS BIGINT) AS w_u
        |  FROM r1),
        |r2 AS (SELECT lang, source, n, tr_u, tc_u,
        |    CAST((CAST(w_u AS HUGEINT) * tr_u)
        |      // CAST(sum(w_u) OVER (PARTITION BY lang) AS HUGEINT)
        |      AS BIGINT) AS w_u
        |  FROM c1),
        |c2 AS (SELECT lang, source, n, tr_u, tc_u,
        |    CAST((CAST(w_u AS HUGEINT) * tc_u)
        |      // CAST(sum(w_u) OVER (PARTITION BY source) AS HUGEINT)
        |      AS BIGINT) AS w_u
        |  FROM r2)
        |SELECT lang, source, n, w_u,
        |  CAST(w_u AS DOUBLE) / 1e6 AS weight
        |FROM c2 ORDER BY lang, source""".stripMargin,

    // bounded active-day frame; all readouts exact integer micro-divisions
    "q_croston" ->
      """WITH byd AS (SELECT event_type,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dd,
        |    count(*) AS y
        |  FROM events GROUP BY 1, 2),
        |g AS (SELECT event_type, count(*) AS n_active,
        |    CAST(sum(y) AS BIGINT) AS sy,
        |    min(dd) AS d1, max(dd) AS dn
        |  FROM byd GROUP BY 1)
        |SELECT event_type, n_active, sy,
        |  CAST((1000000 * sy) // n_active AS BIGINT) AS mean_demand_u,
        |  CASE WHEN n_active > 1 THEN
        |    CAST((1000000 * (dn - d1)) // (n_active - 1) AS BIGINT)
        |  END AS mean_gap_u,
        |  CASE WHEN n_active > 1 AND dn > d1 THEN
        |    CAST((1000000 * sy * (n_active - 1))
        |      // (n_active * (dn - d1)) AS BIGINT)
        |  END AS forecast_u
        |FROM g ORDER BY event_type""".stripMargin,

    // nano-quantized per-row loss summed in HUGEINT; mirrored
    // logistic + clip + ln
    "q_log_loss" -> {
      s"""WITH ${OracleHash.classifierScoreCtes("doc_id, n_chars")},
         |r AS (SELECT
         |    CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS y,
         |    least(greatest(
         |      1.0e0 / (1.0e0 + exp(-CAST(score AS DOUBLE) / 64.0e0)),
         |      1e-6), 1.0e0 - 1e-6) AS pc FROM sc),
         |q AS (SELECT y,
         |    CAST(floor(-(CAST(y AS DOUBLE) * ln(pc)
         |      + (1.0e0 - CAST(y AS DOUBLE)) * ln(1.0e0 - pc))
         |      * 1e9 + 0.5e0) AS BIGINT) AS lq FROM r),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(y) AS BIGINT) AS n_pos,
         |    sum(CAST(lq AS HUGEINT)) AS slq FROM q)
         |SELECT n, n_pos,
         |  CASE WHEN n > 0 THEN
         |    floor(CAST(slq AS DOUBLE) / CAST(n AS DOUBLE) / 1e9
         |      * 1e6 + 0.5e0) / 1e6
         |  END AS log_loss
         |FROM m""".stripMargin
    },

    // fixed 10-band logistic calibration; cumulative over the band
    // frame (≤10 rows)
    "q_lift_gains" -> {
      s"""WITH ${OracleHash.classifierScoreCtes("doc_id, n_chars")},
         |r AS (SELECT
         |    CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS y,
         |    least(9, CAST(floor(
         |      1.0e0 / (1.0e0 + exp(-CAST(score AS DOUBLE) / 64.0e0))
         |      * 10.0e0) AS BIGINT)) AS band FROM sc),
         |bb AS (SELECT band, CAST(count(*) AS BIGINT) AS nb,
         |    CAST(sum(y) AS BIGINT) AS posb FROM r GROUP BY band),
         |tt AS (SELECT CAST(sum(nb) AS BIGINT) AS nt,
         |    CAST(sum(posb) AS BIGINT) AS post FROM bb),
         |cc AS (SELECT band, nb, posb,
         |    CAST(sum(nb) OVER (ORDER BY band DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum_n,
         |    CAST(sum(posb) OVER (ORDER BY band DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum_pos
         |  FROM bb)
         |SELECT band, nb, posb,
         |  CASE WHEN post > 0 THEN floor(
         |    (CAST(posb AS DOUBLE) / CAST(nb AS DOUBLE))
         |    / (CAST(post AS DOUBLE) / CAST(nt AS DOUBLE))
         |    * 1e6 + 0.5e0) / 1e6 END AS lift,
         |  CASE WHEN post > 0 THEN floor(
         |    CAST(cum_pos AS DOUBLE) / CAST(post AS DOUBLE)
         |    * 1e6 + 0.5e0) / 1e6 END AS cum_gain,
         |  floor(CAST(cum_n AS DOUBLE) / CAST(nt AS DOUBLE)
         |    * 1e6 + 0.5e0) / 1e6 AS cum_share
         |FROM cc CROSS JOIN tt ORDER BY band DESC""".stripMargin
    },

    // value-domain cells × kept-rank overlap, all integer until the
    // final division
    "q_trimmed_mean" ->
      """WITH e AS (SELECT event_type,
        |    CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS vq
        |  FROM events),
        |byv AS (SELECT event_type, vq, count(*) AS cnt
        |  FROM e GROUP BY 1, 2),
        |cu AS (SELECT event_type, vq, cnt,
        |    CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY vq
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum
        |  FROM byv),
        |tot AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
        |  FROM e GROUP BY 1),
        |cells AS (SELECT cu.event_type, vq, cnt, cum, n, n // 10 AS k,
        |    greatest(0, least(cum, n - n // 10)
        |      - greatest(cum - cnt + 1, n // 10 + 1) + 1) AS kept
        |  FROM cu JOIN tot ON cu.event_type = tot.event_type)
        |SELECT event_type, n, k,
        |  CASE WHEN sum(kept) > 0 THEN
        |    floor(CAST(sum(CAST(vq AS HUGEINT) * kept) AS DOUBLE)
        |      / CAST(sum(kept) AS DOUBLE) / 1000.0e0 * 1e6 + 0.5e0) / 1e6
        |  END AS trimmed_mean
        |FROM cells GROUP BY event_type, n, k
        |ORDER BY event_type""".stripMargin,

    // keyed lag/lead peaks; exact two-level top reduction
    "q_peak_days" ->
      """WITH byd AS (SELECT event_type,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dd,
        |    count(*) AS y
        |  FROM events GROUP BY 1, 2),
        |l AS (SELECT event_type, dd, y,
        |    lag(y) OVER (PARTITION BY event_type ORDER BY dd) AS pv,
        |    lead(y) OVER (PARTITION BY event_type ORDER BY dd) AS nx
        |  FROM byd),
        |p AS (SELECT event_type, dd, y FROM l
        |  WHERE pv IS NOT NULL AND nx IS NOT NULL AND y > pv AND y > nx),
        |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_peaks,
        |    CAST(max(y) AS BIGINT) AS peak_value FROM p GROUP BY 1)
        |SELECT p.event_type, n_peaks, peak_value,
        |  min(dd) AS peak_day
        |FROM p JOIN m ON p.event_type = m.event_type
        |  AND p.y = m.peak_value
        |GROUP BY p.event_type, n_peaks, peak_value
        |ORDER BY p.event_type""".stripMargin,

    // exact integer rater counts off the shared classifier chain;
    // mirrored Fleiss algebra
    "q_fleiss_kappa" -> {
      s"""WITH ${OracleHash.classifierScoreCtes("doc_id, n_chars")},
         |r AS (SELECT
         |    (CASE WHEN score > 0 THEN 1 ELSE 0 END
         |     + CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END
         |     + CASE WHEN n_feats >= 25 THEN 1 ELSE 0 END) AS n1
         |  FROM sc),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(n1) AS BIGINT) AS t1,
         |    CAST(sum(n1*n1 + (3-n1)*(3-n1)) AS BIGINT) AS s2 FROM r),
         |x AS (SELECT n, t1, s2,
         |    CAST(t1 AS DOUBLE) / (3.0e0 * n) AS p1,
         |    (CAST(s2 AS DOUBLE) - 3.0e0 * n) / (6.0e0 * n) AS pbar
         |  FROM m),
         |y AS (SELECT n, t1, pbar,
         |    p1*p1 + (1.0e0-p1)*(1.0e0-p1) AS pe FROM x)
         |SELECT n, CAST(3 AS BIGINT) AS m, t1,
         |  round(pbar, 6) AS p_bar, round(pe, 6) AS p_e,
         |  CASE WHEN pe <> 1.0e0
         |    THEN round((pbar - pe) / (1.0e0 - pe), 6) END AS kappa
         |FROM y""".stripMargin
    },

    // same rater frame; coincidence-margin chance correction
    "q_krippendorff_alpha" -> {
      s"""WITH ${OracleHash.classifierScoreCtes("doc_id, n_chars")},
         |r AS (SELECT
         |    (CASE WHEN score > 0 THEN 1 ELSE 0 END
         |     + CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END
         |     + CASE WHEN n_feats >= 25 THEN 1 ELSE 0 END) AS n1
         |  FROM sc),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(n1) AS BIGINT) AS n_pos,
         |    CAST(sum(n1 * (3-n1)) AS BIGINT) AS o01_x2 FROM r)
         |SELECT n, CAST(3*n AS BIGINT) AS n_ratings, n_pos,
         |  CAST(3*n - n_pos AS BIGINT) AS n_neg, o01_x2,
         |  CASE WHEN n_pos > 0 AND 3*n - n_pos > 0 THEN
         |    round(1.0e0 - CAST(3*n - 1 AS DOUBLE) * o01_x2
         |      / (2.0e0 * n_pos * (3*n - n_pos)), 6) END AS alpha
         |FROM m""".stripMargin
    },

    // distinct-score decile cut; expected counts micro-quantized per
    // score group BEFORE the decile sum (mirrors the Spark integers)
    "q_hosmer_lemeshow" -> {
      s"""WITH ${OracleHash.classifierScoreCtes("doc_id, n_chars")},
         |r AS (SELECT score,
         |    CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS y FROM sc),
         |g AS (SELECT score, CAST(count(*) AS BIGINT) AS cnt,
         |    CAST(sum(y) AS BIGINT) AS pos FROM r GROUP BY 1),
         |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM g),
         |cu AS (SELECT score, cnt, pos,
         |    CAST(floor(cnt * (1.0e0 / (1.0e0
         |      + exp(-CAST(score AS DOUBLE) / 64.0e0))) * 1e6 + 0.5e0)
         |      AS BIGINT) AS exp_u,
         |    CAST(sum(cnt) OVER (ORDER BY score
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum
         |  FROM g),
         |dg AS (SELECT ((cum - 1) * 10) // n AS decile, cnt, pos, exp_u
         |  FROM cu CROSS JOIN tot),
         |agg AS (SELECT decile, CAST(sum(cnt) AS BIGINT) AS n_g,
         |    CAST(sum(pos) AS BIGINT) AS obs_pos,
         |    CAST(sum(exp_u) AS BIGINT) AS exp_pos_u
         |  FROM dg GROUP BY 1)
         |SELECT decile, n_g, obs_pos,
         |  round(exp_pos_u / 1e6, 6) AS exp_pos,
         |  CASE WHEN exp_pos_u > 0 AND exp_pos_u < n_g * 1000000 THEN
         |    round((obs_pos - exp_pos_u / 1e6)
         |      * (obs_pos - exp_pos_u / 1e6) * n_g
         |      / ((exp_pos_u / 1e6) * (n_g - exp_pos_u / 1e6)), 6)
         |  END AS chi2_term
         |FROM agg ORDER BY decile""".stripMargin
    },

    // densified (type x day) grid; doubled midranks stay integer;
    // exact tie correction; one mirrored final ratio
    "q_kendall_w" ->
      """WITH e AS (SELECT event_type,
        |    epoch_us(ts) // 86400000000 AS day,
        |    CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS vq
        |  FROM events),
        |bdt AS (SELECT event_type, day, CAST(sum(vq) AS BIGINT) AS sv
        |  FROM e GROUP BY 1, 2),
        |grid AS (SELECT t.event_type, d.day,
        |    coalesce(b.sv, 0) AS sv
        |  FROM (SELECT DISTINCT day FROM bdt) d
        |  CROSS JOIN (SELECT DISTINCT event_type FROM bdt) t
        |  LEFT JOIN bdt b ON b.event_type = t.event_type
        |    AND b.day = d.day),
        |rk AS (SELECT event_type, day, sv,
        |    rank() OVER (PARTITION BY event_type ORDER BY sv) AS rmin,
        |    count(*) OVER (PARTITION BY event_type, sv) AS tie
        |  FROM grid),
        |mr AS (SELECT event_type, day, sv,
        |    2 * rmin + tie - 1 AS mr2, tie FROM rk),
        |pd AS (SELECT day, CAST(sum(mr2) AS BIGINT) AS r2
        |  FROM mr GROUP BY day),
        |tt AS (SELECT CAST(sum(tie * tie * tie - tie) AS BIGINT)
        |    AS t_tot
        |  FROM (SELECT DISTINCT event_type, sv, tie FROM mr) u),
        |kn AS (SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS k,
        |    CAST(count(DISTINCT day) AS BIGINT) AS n FROM grid),
        |s2 AS (SELECT k, n,
        |    CAST(sum((r2 - k * (n + 1)) * (r2 - k * (n + 1)))
        |      AS BIGINT) AS s2sum
        |  FROM pd CROSS JOIN kn GROUP BY k, n)
        |SELECT n AS n_days, k,
        |  CASE WHEN k * k * (n * n * n - n) - k * t_tot > 0 THEN
        |    round(3.0e0 * s2sum
        |      / CAST(k * k * (n * n * n - n) - k * t_tot AS DOUBLE), 6)
        |  END AS w
        |FROM s2 CROSS JOIN tt""".stripMargin,

    // identical STL integer chain; variance moments in HUGEINT;
    // mirrored Hyndman F ratio
    "q_seasonal_strength" ->
      """WITH e AS (SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS vq
        |  FROM events),
        |g AS (SELECT day, count(*) AS n, sum(vq) AS sq
        |  FROM e GROUP BY day),
        |g2 AS (SELECT day, n, sq, (sq * 1000) // n AS xm,
        |    (day + 3) % 7 AS dow FROM g),
        |t AS (SELECT *,
        |    CASE WHEN count(*) OVER w7 = 7
        |      THEN (sum(xm) OVER w7) // 7 END AS trend_u
        |  FROM g2 WINDOW w7 AS (ORDER BY day
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |sd AS (SELECT dow, CAST(floor(
        |    CAST(sum(xm - trend_u) AS DOUBLE) / count(*) + 0.5)
        |    AS BIGINT) AS s_u
        |  FROM t WHERE trend_u IS NOT NULL GROUP BY dow),
        |m AS (SELECT xm - trend_u - s_u AS r, xm - trend_u AS sr,
        |    xm - s_u AS tr_
        |  FROM t JOIN sd ON sd.dow = t.dow WHERE trend_u IS NOT NULL),
        |mm AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(r AS HUGEINT)) AS HUGEINT) AS s1r,
        |    CAST(sum(CAST(r AS HUGEINT) * r) AS HUGEINT) AS s2r,
        |    CAST(sum(CAST(sr AS HUGEINT)) AS HUGEINT) AS s1s,
        |    CAST(sum(CAST(sr AS HUGEINT) * sr) AS HUGEINT) AS s2s,
        |    CAST(sum(CAST(tr_ AS HUGEINT)) AS HUGEINT) AS s1t,
        |    CAST(sum(CAST(tr_ AS HUGEINT) * tr_) AS HUGEINT) AS s2t
        |  FROM m),
        |vv AS (SELECT n,
        |    CAST(n AS DOUBLE) * CAST(s2r AS DOUBLE)
        |      - CAST(s1r AS DOUBLE) * CAST(s1r AS DOUBLE) AS vr,
        |    CAST(n AS DOUBLE) * CAST(s2s AS DOUBLE)
        |      - CAST(s1s AS DOUBLE) * CAST(s1s AS DOUBLE) AS vs,
        |    CAST(n AS DOUBLE) * CAST(s2t AS DOUBLE)
        |      - CAST(s1t AS DOUBLE) * CAST(s1t AS DOUBLE) AS vt
        |  FROM mm)
        |SELECT n AS n_days,
        |  CASE WHEN vt > 0.0e0 THEN
        |    round(greatest(0.0e0, 1.0e0 - vr / vt), 6) END AS f_trend,
        |  CASE WHEN vs > 0.0e0 THEN
        |    round(greatest(0.0e0, 1.0e0 - vr / vs), 6) END AS f_seasonal
        |FROM vv""".stripMargin,

    // value-domain P95 via cumulative counts; exact exceedance moments;
    // mirrored method-of-moments estimators
    "q_gpd_tail" ->
      """WITH e AS (SELECT CAST(floor(value * 1000.0 + 0.5) AS BIGINT)
        |    AS vq FROM events),
        |c AS (SELECT vq, count(*) AS cnt FROM e GROUP BY vq),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM c),
        |cu AS (SELECT vq,
        |    CAST(sum(cnt) OVER (ORDER BY vq
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum
        |  FROM c),
        |u AS (SELECT CAST(min(vq) AS BIGINT) AS u FROM cu CROSS JOIN tot
        |  WHERE cum >= (19 * n + 19) // 20),
        |exc AS (SELECT u, e.vq - u AS y FROM e CROSS JOIN u
        |  WHERE e.vq > u),
        |m AS (SELECT u, CAST(count(*) AS BIGINT) AS n_exceed,
        |    CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(y * y) AS BIGINT) AS syy
        |  FROM exc GROUP BY u),
        |v AS (SELECT u, n_exceed,
        |    CAST(sy AS DOUBLE) / n_exceed AS mean,
        |    (CAST(n_exceed AS DOUBLE) * syy
        |      - CAST(sy AS DOUBLE) * sy)
        |      / (CAST(n_exceed AS DOUBLE) * n_exceed) AS vr
        |  FROM m)
        |SELECT CAST(u AS DOUBLE) / 1000.0e0 AS u, n_exceed,
        |  CASE WHEN vr > 0.0e0 THEN
        |    round(0.5e0 * (1.0e0 - mean * mean / vr), 6) END AS xi,
        |  CASE WHEN vr > 0.0e0 THEN
        |    round(0.5e0 * (mean / 1000.0e0)
        |      * (1.0e0 + mean * mean / vr), 6) END AS sigma
        |FROM v""".stripMargin,

    // distinct-score cumulative sweep; integer micro objectives so the
    // argmax can never flip on float noise; ties toward the lower theta
    "q_optimal_threshold" -> {
      s"""WITH ${OracleHash.classifierScoreCtes("doc_id, n_chars")},
         |r AS (SELECT score,
         |    CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS y FROM sc),
         |g AS (SELECT score, CAST(count(*) AS BIGINT) AS cnt,
         |    CAST(sum(y) AS BIGINT) AS pos FROM r GROUP BY 1),
         |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n,
         |    CAST(sum(pos) AS BIGINT) AS p FROM g),
         |cum AS (SELECT score,
         |    CAST(sum(pos) OVER (ORDER BY score DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS tp,
         |    CAST(sum(cnt) OVER (ORDER BY score DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS pp
         |  FROM g),
         |mx AS (SELECT score, tp, pp - tp AS fp,
         |    (2 * tp * 1000000) // (pp + p) AS f1_u,
         |    CASE WHEN p > 0 AND n > p THEN
         |      (tp * 1000000) // p
         |        - ((pp - tp) * 1000000) // (n - p) END AS youden_u
         |  FROM cum CROSS JOIN tot),
         |bf AS (SELECT 'f1' AS criterion, score AS threshold, tp, fp,
         |    CAST(f1_u AS DOUBLE) / 1e6 AS metric
         |  FROM mx ORDER BY f1_u DESC, score ASC LIMIT 1),
         |by_ AS (SELECT 'youden' AS criterion, score AS threshold, tp,
         |    fp, CAST(youden_u AS DOUBLE) / 1e6 AS metric
         |  FROM mx ORDER BY youden_u DESC, score ASC LIMIT 1)
         |SELECT * FROM bf UNION ALL SELECT * FROM by_
         |ORDER BY criterion""".stripMargin
    },

    // exact integer daily-max moments; mirrored Gumbel MoM + return
    // levels
    "q_gumbel_fit" ->
      """WITH byd AS (SELECT
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dd,
        |    CAST(max(CAST(floor(value * 1000.0 + 0.5) AS BIGINT))
        |      AS BIGINT) AS mxq
        |  FROM events GROUP BY 1),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(mxq) AS BIGINT) AS s,
        |    CAST(sum(CAST(mxq AS HUGEINT) * mxq) AS HUGEINT) AS ss
        |  FROM byd),
        |f AS (SELECT n,
        |    CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
        |    (CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
        |      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
        |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0e0)) AS vr
        |  FROM m),
        |p AS (SELECT n, mean, sqrt(6.0e0 * vr) / pi() AS beta FROM f),
        |q AS (SELECT n, beta,
        |    mean - 0.5772156649015329e0 * beta AS mu FROM p)
        |SELECT n AS n_days,
        |  CASE WHEN n > 1 THEN round(mu / 1000.0e0, 6) END AS mu,
        |  CASE WHEN n > 1 THEN round(beta / 1000.0e0, 6) END AS beta,
        |  CASE WHEN n > 1 THEN round((mu - beta
        |    * ln(-ln(1.0e0 - 1.0e0 / 10.0e0))) / 1000.0e0, 6) END
        |    AS return_level_10,
        |  CASE WHEN n > 1 THEN round((mu - beta
        |    * ln(-ln(1.0e0 - 1.0e0 / 100.0e0))) / 1000.0e0, 6) END
        |    AS return_level_100
        |FROM q""".stripMargin,

    // distinct-value frame x 9 grid points; Silverman bandwidth off
    // exact moments; nano-quantized kernel terms integer-summed
    "q_kde_profile" ->
      """WITH v AS (SELECT
        |    CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS vq,
        |    count(*) AS cnt
        |  FROM events GROUP BY 1),
        |m AS (SELECT CAST(sum(cnt) AS BIGINT) AS n,
        |    CAST(sum(CAST(vq AS HUGEINT) * cnt) AS HUGEINT) AS s,
        |    CAST(sum(CAST(vq AS HUGEINT) * vq * cnt) AS HUGEINT) AS ss,
        |    min(vq) AS lo, max(vq) AS hi
        |  FROM v),
        |bw AS (SELECT n, lo, hi,
        |    1.06e0 * sqrt((CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
        |      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
        |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
        |      * pow(CAST(n AS DOUBLE), -0.2e0) AS h
        |  FROM m),
        |g AS (SELECT v.vq, v.cnt, bw.n, bw.h, k.k,
        |    lo + (k.k * (hi - lo)) // 10 AS g
        |  FROM v CROSS JOIN bw
        |  CROSS JOIN (SELECT unnest(range(1, 10)) AS k) k),
        |t AS (SELECT k, g, n, h,
        |    CASE WHEN h > 0 AND n > 1 THEN
        |      CAST(floor(CAST(cnt AS DOUBLE)
        |        * exp(-((CAST(g AS DOUBLE) - CAST(vq AS DOUBLE)) / h)
        |          * ((CAST(g AS DOUBLE) - CAST(vq AS DOUBLE)) / h)
        |          / 2.0e0) * 1e9 + 0.5e0) AS BIGINT) END AS t_u
        |  FROM g)
        |SELECT CAST(k AS BIGINT) AS k,
        |  round(max(CAST(g AS DOUBLE) / 1000.0e0), 6) AS grid_v,
        |  round(CAST(sum(t_u) AS DOUBLE) / 1e9
        |    / (CAST(max(n) AS DOUBLE) * max(h) / 1000.0e0)
        |    / sqrt(2.0e0 * pi()), 9) AS density
        |FROM t GROUP BY k ORDER BY k""".stripMargin,

    // fixed-width ordinal bins; bounded 10x10 grid self-cross; exact
    // HUGEINT pair counts; two mirrored final divisions
    "q_somers_d" ->
      """WITH b AS (SELECT
        |    least(n_chars // 100, 9) AS xb,
        |    least(len(string_split(text, ' ')) // 50, 9) AS yb
        |  FROM documents),
        |grid AS (SELECT xb, yb, CAST(count(*) AS HUGEINT) AS n
        |  FROM b GROUP BY 1, 2),
        |cd AS (SELECT
        |    CAST(sum(CASE WHEN a.xb < c.xb AND a.yb < c.yb
        |      THEN a.n * c.n ELSE 0 END) AS HUGEINT) AS c_pairs,
        |    CAST(sum(CASE WHEN a.xb < c.xb AND a.yb > c.yb
        |      THEN a.n * c.n ELSE 0 END) AS HUGEINT) AS d_pairs,
        |    CAST(sum(CASE WHEN a.xb < c.xb AND a.yb = c.yb
        |      THEN a.n * c.n ELSE 0 END) AS HUGEINT) AS ty_pairs
        |  FROM grid a CROSS JOIN grid c),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM b)
        |SELECT n_docs,
        |  CAST(c_pairs AS DOUBLE) AS c_pairs,
        |  CAST(d_pairs AS DOUBLE) AS d_pairs,
        |  CASE WHEN CAST(c_pairs AS DOUBLE) + CAST(d_pairs AS DOUBLE) > 0
        |    THEN round((CAST(c_pairs AS DOUBLE) - CAST(d_pairs AS DOUBLE))
        |      / (CAST(c_pairs AS DOUBLE) + CAST(d_pairs AS DOUBLE)), 6)
        |  END AS gamma,
        |  CASE WHEN CAST(c_pairs AS DOUBLE) + CAST(d_pairs AS DOUBLE)
        |      + CAST(ty_pairs AS DOUBLE) > 0
        |    THEN round((CAST(c_pairs AS DOUBLE) - CAST(d_pairs AS DOUBLE))
        |      / (CAST(c_pairs AS DOUBLE) + CAST(d_pairs AS DOUBLE)
        |        + CAST(ty_pairs AS DOUBLE)), 6)
        |  END AS somers_d_yx
        |FROM cd CROSS JOIN tot""".stripMargin,

    // same arm/conversion integers as q_bayes_ab; one mirrored arcsine
    // expression; bands on the rounded h
    // three unrolled MM rounds in HUGEINT; `//` on positive HUGEINTs
    // truncates exactly like Spark's DECIMAL `div`
    "q_bradley_terry" ->
      """WITH cnts AS (SELECT user_id, event_type, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |duels AS (SELECT x.event_type AS a, y.event_type AS b,
        |    CAST(sum(CASE WHEN x.c > y.c THEN 1 ELSE 0 END) AS BIGINT)
        |      AS wab,
        |    CAST(sum(CASE WHEN x.c < y.c THEN 1 ELSE 0 END) AS BIGINT)
        |      AS wba
        |  FROM cnts x JOIN cnts y ON x.user_id = y.user_id
        |    AND x.event_type < y.event_type
        |  GROUP BY 1, 2),
        |sym AS (SELECT a, b, wab AS w, wab + wba AS n FROM duels
        |    WHERE wab + wba > 0
        |  UNION ALL SELECT b, a, wba, wab + wba FROM duels
        |    WHERE wab + wba > 0),
        |wtot AS (SELECT a AS t, CAST(sum(w) AS BIGINT) AS wins,
        |    CAST(sum(n) AS BIGINT) AS comparisons FROM sym GROUP BY a),
        |p0 AS (SELECT t, CAST(1000000000000 AS HUGEINT) AS p FROM wtot),
        |d1 AS (SELECT s.a AS t, sum((CAST(s.n AS HUGEINT)
        |      * 1000000000000 * 1000000000000) // (pa.p + pb.p)) AS dd
        |  FROM sym s JOIN p0 pa ON s.a = pa.t JOIN p0 pb ON s.b = pb.t
        |  GROUP BY s.a),
        |p1 AS (SELECT w.t, greatest((CAST(w.wins AS HUGEINT)
        |      * 1000000000000 * 1000000000000) // d1.dd, 1) AS p
        |  FROM wtot w JOIN d1 ON w.t = d1.t),
        |d2 AS (SELECT s.a AS t, sum((CAST(s.n AS HUGEINT)
        |      * 1000000000000 * 1000000000000) // (pa.p + pb.p)) AS dd
        |  FROM sym s JOIN p1 pa ON s.a = pa.t JOIN p1 pb ON s.b = pb.t
        |  GROUP BY s.a),
        |p2 AS (SELECT w.t, greatest((CAST(w.wins AS HUGEINT)
        |      * 1000000000000 * 1000000000000) // d2.dd, 1) AS p
        |  FROM wtot w JOIN d2 ON w.t = d2.t),
        |d3 AS (SELECT s.a AS t, sum((CAST(s.n AS HUGEINT)
        |      * 1000000000000 * 1000000000000) // (pa.p + pb.p)) AS dd
        |  FROM sym s JOIN p2 pa ON s.a = pa.t JOIN p2 pb ON s.b = pb.t
        |  GROUP BY s.a),
        |p3 AS (SELECT w.t, greatest((CAST(w.wins AS HUGEINT)
        |      * 1000000000000 * 1000000000000) // d3.dd, 1) AS p
        |  FROM wtot w JOIN d3 ON w.t = d3.t)
        |SELECT w.t AS event_type, w.wins, w.comparisons,
        |  CAST(p3.p AS BIGINT) AS bt_u,
        |  CAST(row_number() OVER (ORDER BY p3.p DESC, w.t) AS BIGINT)
        |    AS rnk
        |FROM wtot w JOIN p3 ON w.t = p3.t
        |ORDER BY event_type""".stripMargin,

    "q_cohens_h" ->
      """WITH conv AS (SELECT user_id % 2 AS arm, user_id,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS cv
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT
        |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_a,
        |    CAST(sum(CASE WHEN arm = 0 THEN cv ELSE 0 END) AS BIGINT)
        |      AS x_a,
        |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b,
        |    CAST(sum(CASE WHEN arm = 1 THEN cv ELSE 0 END) AS BIGINT)
        |      AS x_b
        |  FROM conv),
        |r AS (SELECT n_a, x_a, n_b, x_b,
        |    round(2.0e0 * (asin(sqrt(CAST(x_a AS DOUBLE)
        |      / CAST(n_a AS DOUBLE)))
        |      - asin(sqrt(CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE)))),
        |      6) AS cohens_h
        |  FROM m)
        |SELECT n_a, x_a, n_b, x_b, cohens_h,
        |  CASE WHEN abs(cohens_h) < 0.2e0 THEN 'negligible'
        |       WHEN abs(cohens_h) < 0.5e0 THEN 'small'
        |       WHEN abs(cohens_h) < 0.8e0 THEN 'medium'
        |       ELSE 'large' END AS magnitude
        |FROM r""".stripMargin,

    // exact integer moments of y, delta-y, delta-delta-y; three mirrored
    // double ratios
    "q_hjorth_params" ->
      """WITH byd AS (SELECT
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dd,
        |    count(*) AS y
        |  FROM events GROUP BY 1),
        |d1 AS (SELECT dd, y, y - lag(y) OVER (ORDER BY dd) AS d1
        |  FROM byd),
        |d2 AS (SELECT dd, y, d1, d1 - lag(d1) OVER (ORDER BY dd) AS d2
        |  FROM d1),
        |m AS (SELECT
        |    CAST(sum(CASE WHEN y IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n0,
        |    CAST(sum(CAST(coalesce(y, 0) AS HUGEINT)) AS HUGEINT) AS s0,
        |    CAST(sum(CAST(coalesce(y, 0) AS HUGEINT) * coalesce(y, 0))
        |      AS HUGEINT) AS ss0,
        |    CAST(sum(CASE WHEN d1 IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n1,
        |    CAST(sum(CAST(coalesce(d1, 0) AS HUGEINT)) AS HUGEINT) AS s1,
        |    CAST(sum(CAST(coalesce(d1, 0) AS HUGEINT) * coalesce(d1, 0))
        |      AS HUGEINT) AS ss1,
        |    CAST(sum(CASE WHEN d2 IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n2,
        |    CAST(sum(CAST(coalesce(d2, 0) AS HUGEINT)) AS HUGEINT) AS s2,
        |    CAST(sum(CAST(coalesce(d2, 0) AS HUGEINT) * coalesce(d2, 0))
        |      AS HUGEINT) AS ss2
        |  FROM d2),
        |v AS (SELECT n0,
        |    (CAST(n0 AS DOUBLE) * CAST(ss0 AS DOUBLE)
        |      - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE))
        |      / (CAST(n0 AS DOUBLE) * CAST(n0 AS DOUBLE)) AS v0,
        |    (CAST(n1 AS DOUBLE) * CAST(ss1 AS DOUBLE)
        |      - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
        |      / (CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE)) AS v1,
        |    (CAST(n2 AS DOUBLE) * CAST(ss2 AS DOUBLE)
        |      - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))
        |      / (CAST(n2 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS v2
        |  FROM m)
        |SELECT n0 AS n_days, round(v0, 6) AS activity,
        |  CASE WHEN v0 > 0 THEN round(sqrt(v1 / v0), 6) END AS mobility,
        |  CASE WHEN v1 > 0 AND v0 > 0
        |    THEN round(sqrt(v2 / v1) / sqrt(v1 / v0), 6) END
        |    AS complexity
        |FROM v""".stripMargin,

    // first-half OLS fit (exact moments), second-half model-vs-naive RMS
    "q_theil_u2" ->
      """WITH byd AS (SELECT
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dd,
        |    count(*) AS y
        |  FROM events GROUP BY 1),
        |mid AS (SELECT (min(dd) + max(dd)) // 2 AS mid FROM byd),
        |wp AS (SELECT dd, y, lag(y) OVER (ORDER BY dd) AS yp
        |  FROM byd),
        |tr AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(dd AS HUGEINT)) AS HUGEINT) AS sx,
        |    CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
        |    CAST(sum(CAST(dd AS HUGEINT) * dd) AS HUGEINT) AS sxx,
        |    CAST(sum(CAST(dd AS HUGEINT) * y) AS HUGEINT) AS sxy
        |  FROM wp CROSS JOIN mid WHERE dd < mid),
        |fit AS (SELECT n AS n_train,
        |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b,
        |    (CAST(sy AS DOUBLE)
        |      - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |        / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |        * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS a
        |  FROM tr),
        |te AS (SELECT n_train,
        |    CAST(floor((CAST(y AS DOUBLE) - a - b * CAST(dd AS DOUBLE))
        |      * 1000.0e0 + 0.5e0) AS BIGINT) AS e1u,
        |    y - yp AS e2
        |  FROM wp CROSS JOIN mid CROSS JOIN fit
        |  WHERE dd >= mid AND yp IS NOT NULL),
        |ag AS (SELECT max(n_train) AS n_train,
        |    CAST(count(*) AS BIGINT) AS n_test,
        |    CAST(sum(CAST(e1u AS HUGEINT) * e1u) AS HUGEINT) AS se1,
        |    CAST(sum(CAST(e2 AS HUGEINT) * e2) AS HUGEINT) AS se2
        |  FROM te),
        |r AS (SELECT n_train, n_test, se2,
        |    sqrt(CAST(se1 AS DOUBLE) / 1e6 / CAST(n_test AS DOUBLE))
        |      AS rm,
        |    sqrt(CAST(se2 AS DOUBLE) / CAST(n_test AS DOUBLE)) AS rn
        |  FROM ag)
        |SELECT n_train, n_test,
        |  round(rm, 6) AS rmse_model, round(rn, 6) AS rmse_naive,
        |  CASE WHEN se2 > 0 THEN round(rm / rn, 6) END AS theil_u2,
        |  CASE WHEN se2 > 0 THEN round(rm / rn, 6) < 1.0e0 END
        |    AS model_beats_naive
        |FROM r""".stripMargin,

    // same chi2/p chain as q_bh_fdr; harmonic c(m) as exact pico-unit
    // integer divisions; HUGEINT step-up cross-multiplication
    "q_benjamini_yekutieli" ->
      """WITH oc AS (SELECT CAST(c.c_nationkey AS BIGINT) AS nk,
        |    o.o_orderstatus AS st
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |cell AS (SELECT nk, st, count(*) AS o FROM oc GROUP BY 1, 2),
        |nat AS (SELECT nk, CAST(sum(o) AS BIGINT) AS ni
        |  FROM cell GROUP BY 1),
        |gshare AS (SELECT st, CAST(sum(o) AS BIGINT) AS gc
        |  FROM cell GROUP BY 1),
        |tot AS (SELECT CAST(sum(o) AS BIGINT) AS nn FROM cell),
        |grid AS (SELECT nat.nk, nat.ni, gshare.st, gshare.gc
        |  FROM nat CROSS JOIN gshare),
        |terms AS (SELECT g.nk, g.ni, coalesce(cell.o, 0) AS o,
        |    CAST(g.ni AS DOUBLE) * CAST(g.gc AS DOUBLE)
        |      / CAST(tot.nn AS DOUBLE) AS e
        |  FROM grid g LEFT JOIN cell ON cell.nk = g.nk AND cell.st = g.st
        |  CROSS JOIN tot),
        |tu AS (SELECT nk, ni, CAST(floor(
        |    (CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e) / e
        |      * 1e9 + 0.5e0) AS BIGINT) AS tu FROM terms),
        |x2 AS (SELECT nk, max(ni) AS n, CAST(sum(tu) AS BIGINT) AS x2u
        |  FROM tu GROUP BY 1),
        |pp AS (SELECT nk, n, x2u, CAST(floor(
        |    exp(-CAST(x2u AS DOUBLE) / 2e9) * 1e6 + 0.5e0) AS BIGINT)
        |    AS pu FROM x2),
        |mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM pp),
        |rk AS (SELECT nk, n, pu,
        |    row_number() OVER (ORDER BY pu, nk) AS rnk
        |  FROM pp),
        |hp AS (SELECT CAST(sum(1000000000000 // rnk) AS BIGINT) AS cp
        |  FROM rk),
        |ks AS (SELECT max(CASE WHEN CAST(pu AS HUGEINT) * m * 20 * cp
        |      <= CAST(rnk AS HUGEINT) * 1000000 * 1000000000000
        |    THEN rnk END) AS k
        |  FROM rk CROSS JOIN mm CROSS JOIN hp)
        |SELECT nk AS nationkey, n,
        |  CAST(pu AS DOUBLE) / 1e6 AS p_value,
        |  rnk,
        |  round(CAST(cp AS DOUBLE) / 1e12, 6) AS c_m,
        |  CAST(CASE WHEN k IS NOT NULL AND rnk <= k THEN 1 ELSE 0 END
        |    AS BIGINT) AS significant
        |FROM rk CROSS JOIN ks CROSS JOIN hp
        |ORDER BY nationkey""".stripMargin,

    // same integer DFT powers as q_periodogram; nano-quantized entropy
    // terms integer-summed; ln-8 normalization
    "q_spectral_entropy" -> {
      val values = dftCoeffs
        .map { case (m, c, sq) => s"($m, $c, $sq)" }.mkString(", ")
      s"""WITH coef(m, cq, sq) AS (VALUES $values),
         |byd AS (SELECT
         |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dd,
         |    count(*) AS y
         |  FROM events GROUP BY 1),
         |d0 AS (SELECT min(dd) AS d0 FROM byd),
         |f AS (SELECT dd - d0 AS t, y FROM byd CROSS JOIN d0
         |  WHERE dd - d0 < $dftWindowDays),
         |fan AS (SELECT k, (k * t) % $dftWindowDays AS m, y
         |  FROM f CROSS JOIN (SELECT unnest(range(1, 9)) AS k) ks),
         |agg AS (SELECT k, CAST(sum(y * cq) AS BIGINT) AS re_u,
         |    CAST(sum(y * sq) AS BIGINT) AS im_u
         |  FROM fan JOIN coef USING (m) GROUP BY 1),
         |pw AS (SELECT CAST((CAST(re_u AS HUGEINT) * re_u
         |    + CAST(im_u AS HUGEINT) * im_u)
         |    // 1000000000000 AS BIGINT) AS power FROM agg),
         |tot AS (SELECT CAST(sum(power) AS BIGINT) AS pt FROM pw),
         |tm AS (SELECT CASE WHEN power > 0 AND pt > 0 THEN
         |      CAST(floor(-(CAST(power AS DOUBLE) / CAST(pt AS DOUBLE))
         |        * ln(CAST(power AS DOUBLE) / CAST(pt AS DOUBLE))
         |        * 1e9 + 0.5e0) AS BIGINT)
         |    ELSE 0 END AS term_u
         |  FROM pw CROSS JOIN tot)
         |SELECT CAST(count(*) AS BIGINT) AS n_bins,
         |  round(CAST(sum(term_u) AS DOUBLE) / 1e9, 6) AS h_nats,
         |  round(CAST(sum(term_u) AS DOUBLE) / 1e9 / ln(8.0e0), 6)
         |    AS h_norm
         |FROM tm""".stripMargin
    },

    // 3-bit comparison codes over lead offsets; per-pattern rows
    "q_permutation_entropy" ->
      """WITH byd AS (SELECT
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dd,
        |    count(*) AS y
        |  FROM events GROUP BY 1),
        |w3 AS (SELECT y, lead(y, 1) OVER (ORDER BY dd) AS y1,
        |    lead(y, 2) OVER (ORDER BY dd) AS y2
        |  FROM byd),
        |pat AS (SELECT
        |    CAST(CASE WHEN y1 > y THEN 1 ELSE 0 END AS VARCHAR)
        |      || CAST(CASE WHEN y2 > y1 THEN 1 ELSE 0 END AS VARCHAR)
        |      || CAST(CASE WHEN y2 > y THEN 1 ELSE 0 END AS VARCHAR)
        |      AS pattern
        |  FROM w3 WHERE y2 IS NOT NULL),
        |cnt AS (SELECT pattern, CAST(count(*) AS BIGINT) AS n
        |  FROM pat GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM cnt)
        |SELECT pattern, n,
        |  round(CAST(n AS DOUBLE) / CAST(nt AS DOUBLE), 6) AS p,
        |  round(-(CAST(n AS DOUBLE) / CAST(nt AS DOUBLE))
        |    * log2(CAST(n AS DOUBLE) / CAST(nt AS DOUBLE)), 6)
        |    AS term_bits
        |FROM cnt CROSS JOIN tot ORDER BY pattern""".stripMargin,

    // strict local extrema over lag/lead; closed-form moments
    "q_turning_points" ->
      """WITH byd AS (SELECT
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dd,
        |    count(*) AS y
        |  FROM events GROUP BY 1),
        |w AS (SELECT y, lag(y) OVER (ORDER BY dd) AS yp,
        |    lead(y) OVER (ORDER BY dd) AS yn
        |  FROM byd),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN yp IS NOT NULL AND yn IS NOT NULL
        |      AND ((y > yp AND y > yn) OR (y < yp AND y < yn))
        |      THEN 1 ELSE 0 END) AS BIGINT) AS t
        |  FROM w),
        |r AS (SELECT n, t,
        |    round(2.0e0 * (CAST(n AS DOUBLE) - 2.0e0) / 3.0e0, 6)
        |      AS expected,
        |    round((CAST(t AS DOUBLE)
        |      - 2.0e0 * (CAST(n AS DOUBLE) - 2.0e0) / 3.0e0)
        |      / sqrt((16.0e0 * CAST(n AS DOUBLE) - 29.0e0) / 90.0e0), 6)
        |      AS z
        |  FROM m)
        |SELECT n AS n_days, t AS n_turning, expected, z,
        |  abs(z) <= 1.959964e0 AS is_random_5pct
        |FROM r""".stripMargin,

    // same integer day-mean chain as q_seasonal_strength; mirrored
    // double mu/sigma; Gaussian-quartile alphabet; lead-window 3-grams
    "q_sax_motifs" ->
      """WITH e AS (SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS vq
        |  FROM events),
        |g AS (SELECT day, count(*) AS n, sum(vq) AS sq
        |  FROM e GROUP BY 1),
        |g2 AS (SELECT day, (sq * 1000) // n AS xm FROM g),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS nd,
        |    CAST(sum(xm) AS BIGINT) AS sx,
        |    CAST(sum(CAST(xm AS HUGEINT) * xm) AS HUGEINT) AS sxx
        |  FROM g2),
        |mm AS (SELECT nd,
        |    CAST(sx AS DOUBLE) / CAST(nd AS DOUBLE) AS mu,
        |    sqrt(greatest(0.0e0,
        |      (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
        |        * CAST(sx AS DOUBLE) / CAST(nd AS DOUBLE))
        |      / CAST(nd AS DOUBLE))) AS sig
        |  FROM m),
        |sy AS (SELECT day,
        |    CASE WHEN CAST(xm AS DOUBLE) < mu - 0.6745e0 * sig THEN 'a'
        |         WHEN CAST(xm AS DOUBLE) < mu THEN 'b'
        |         WHEN CAST(xm AS DOUBLE) < mu + 0.6745e0 * sig THEN 'c'
        |         ELSE 'd' END AS sym
        |  FROM g2 CROSS JOIN mm),
        |tri AS (SELECT day,
        |    sym || lead(sym, 1) OVER w || lead(sym, 2) OVER w AS motif
        |  FROM sy WINDOW w AS (ORDER BY day))
        |SELECT motif, CAST(count(*) AS BIGINT) AS n_occurrences,
        |  CAST(min(day) AS BIGINT) AS first_day
        |FROM tri WHERE motif IS NOT NULL GROUP BY motif
        |ORDER BY n_occurrences DESC, motif LIMIT 10""".stripMargin,

    // partial sums of milli-quantized demeaned counts; Bartlett weights
    // multiplied through by (l+1) keep the denominator integer
    "q_kpss" ->
      """WITH byd AS (SELECT
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dd,
        |    count(*) AS y
        |  FROM events GROUP BY 1),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS sy FROM byd),
        |mm AS (SELECT n, CAST(sy AS DOUBLE) / n AS mu,
        |    CAST(floor(4.0e0 * pow(n / 100.0e0, 0.25e0)) AS BIGINT)
        |      AS l FROM m),
        |e AS (SELECT CAST(row_number() OVER (ORDER BY dd) AS BIGINT)
        |      AS t,
        |    CAST(floor((CAST(y AS DOUBLE) - mu) * 1000.0e0 + 0.5e0)
        |      AS BIGINT) AS eu
        |  FROM byd CROSS JOIN mm),
        |num AS (SELECT CAST(sum(CAST(st AS HUGEINT) * st) AS HUGEINT)
        |    AS ss2 FROM (
        |  SELECT CAST(sum(eu) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS st FROM e) q),
        |g AS (SELECT j,
        |    CAST(sum(CAST(a.eu AS HUGEINT) * b.eu) AS HUGEINT) AS g
        |  FROM e a
        |  CROSS JOIN (SELECT unnest(range(0, l + 1)) AS j FROM mm) js
        |  JOIN e b ON b.t = a.t + j GROUP BY j),
        |den AS (SELECT CAST(sum(CASE WHEN j = 0
        |      THEN CAST(l + 1 AS HUGEINT) * g
        |      ELSE 2 * CAST(l + 1 - j AS HUGEINT) * g END) AS HUGEINT)
        |    AS den_u
        |  FROM g CROSS JOIN mm)
        |SELECT n AS n_days, l AS l_bartlett,
        |  CASE WHEN den_u > 0 THEN
        |    round(CAST(l + 1 AS DOUBLE) * CAST(ss2 AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * CAST(den_u AS DOUBLE)), 6)
        |  END AS eta,
        |  CASE WHEN den_u > 0 THEN
        |    CAST(l + 1 AS DOUBLE) * CAST(ss2 AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * CAST(den_u AS DOUBLE)) > 0.463e0
        |  END AS reject_5pct
        |FROM num CROSS JOIN den CROSS JOIN mm""".stripMargin,

    // day-frame OLS residuals milli-quantized; auxiliary moments of
    // z = e_u^2 folded in HUGEINT; mirrored LM = n*R^2
    "q_breusch_pagan" ->
      """WITH byd AS (SELECT
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dd,
        |    count(*) AS y
        |  FROM events GROUP BY 1),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(dd AS HUGEINT)) AS HUGEINT) AS sx,
        |    CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
        |    CAST(sum(CAST(dd AS HUGEINT) * dd) AS HUGEINT) AS sxx,
        |    CAST(sum(CAST(dd AS HUGEINT) * y) AS HUGEINT) AS sxy
        |  FROM byd),
        |fit AS (SELECT n,
        |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b,
        |    sx, sy, sxx FROM m),
        |f2 AS (SELECT n, b,
        |    (CAST(sy AS DOUBLE) - b * CAST(sx AS DOUBLE))
        |      / CAST(n AS DOUBLE) AS a FROM fit),
        |z AS (SELECT dd,
        |    CAST(CAST(floor((CAST(y AS DOUBLE) - a
        |      - b * CAST(dd AS DOUBLE)) * 1000.0e0 + 0.5e0) AS HUGEINT)
        |      * CAST(floor((CAST(y AS DOUBLE) - a
        |      - b * CAST(dd AS DOUBLE)) * 1000.0e0 + 0.5e0) AS HUGEINT)
        |      AS HUGEINT) AS zz
        |  FROM byd CROSS JOIN f2),
        |zm AS (SELECT max(zz) AS zmx FROM z),
        |zq AS (SELECT dd, zz // greatest(CAST(1 AS HUGEINT),
        |    zmx // 1000000000000) AS zs
        |  FROM z CROSS JOIN zm),
        |aux AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(dd AS HUGEINT)) AS HUGEINT) AS sx,
        |    CAST(sum(CAST(zs AS HUGEINT)) AS HUGEINT) AS sz,
        |    CAST(sum(CAST(dd AS HUGEINT) * dd) AS HUGEINT) AS sxx,
        |    CAST(sum(CAST(dd AS HUGEINT) * zs) AS HUGEINT) AS sxz,
        |    CAST(sum(CAST(zs AS HUGEINT) * zs) AS HUGEINT) AS szz
        |  FROM zq),
        |fin AS (SELECT n,
        |    CAST(n AS DOUBLE) * CAST(sxz AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sz AS DOUBLE) AS num,
        |    (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |    * (CAST(n AS DOUBLE) * CAST(szz AS DOUBLE)
        |      - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)) AS den
        |  FROM aux)
        |SELECT n AS n_days, CAST(1 AS BIGINT) AS df,
        |  CASE WHEN den > 0.0e0
        |    THEN round(CAST(n AS DOUBLE) * num * num / den, 6)
        |  END AS lm_stat,
        |  CASE WHEN den > 0.0e0
        |    THEN CAST(n AS DOUBLE) * num * num / den > 3.841459e0
        |  END AS reject_5pct
        |FROM fin""".stripMargin
  )
}
