package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, ListState, MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, Trigger, TTLConfig, ValueState}
import graft.engine.{QueryPack, Tables}

/** Per-user running state carried by the stateful operator. */
case class UserState(n: Long, sum: Double)

/** Final per-user emission from the stateful operator. */
case class UserStats(user_id: Long, n_events: Long, sum_raw: Double)

/** Per-user state for the transformWithState processor. */
case class MaxState(n: Long, mx: Double)

/** Per-user emission from the transformWithState processor. */
case class UserMax(user_id: Long, n_events: Long, max_raw: Double)

/** Spark 4 arbitrary-state API (`transformWithState`): per-user running
  * count + max in a typed `ValueState`, one emission per key per
  * micro-batch. Requires the RocksDB state store provider.
  */
class MaxProcessor extends StatefulProcessor[Long, (Long, Double), UserMax] {
  @transient private var state: ValueState[MaxState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[MaxState]("maxState",
      Encoders.product[MaxState], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
                               timerValues: TimerValues): Iterator[UserMax] = {
    val prev =
      if (state.exists()) state.get() else MaxState(0L, Double.NegativeInfinity)
    var n = prev.n
    var mx = prev.mx
    rows.foreach { case (_, v) => n += 1; if (v > mx) mx = v }
    state.update(MaxState(n, mx))
    Iterator.single(UserMax(key, n, mx))
  }
}

/** Per-key emission from the TTL processor: the TTL'd per-batch count
  * next to the persistent running total. */
case class TtlEmit(user_id: Long, batch_n: Long, total_n: Long)

/** State-TTL demo processor (Spark 4 `transformWithState` TTL surface):
  * two ValueStates over the same key — `perBatch` carries a 1 ms
  * processing-time TTL, `total` carries none. Micro-batch scheduling
  * gaps are always ≫ 1 ms (each batch pays planning + task scheduling),
  * so the TTL'd value written in batch k is expired by batch k+1 —
  * deterministic per-batch reset — while `total` accumulates across the
  * run. The consumer asserts the reset arithmetically:
  * Σ batch_n over a key's emissions equals its final total IFF the TTL
  * state never leaked across batches. */
class TtlCountProcessor extends StatefulProcessor[Long, Long, TtlEmit] {
  @transient private var perBatch: ValueState[Long] = _
  @transient private var total: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    perBatch = getHandle.getValueState[Long]("perBatch",
      Encoders.scalaLong, TTLConfig(java.time.Duration.ofMillis(1)))
    total = getHandle.getValueState[Long]("total",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[Long],
                               timerValues: TimerValues): Iterator[TtlEmit] = {
    var n = 0L
    rows.foreach(_ => n += 1)
    val b = (if (perBatch.exists()) perBatch.get() else 0L) + n
    val t = (if (total.exists()) total.get() else 0L) + n
    perBatch.update(b)
    total.update(t)
    Iterator.single(TtlEmit(key, b, t))
  }
}

/** Session summary emitted when a user's event-time timer expires. */
case class TimerEmit(user_id: Long, n_events: Long, timer_ms: Long)

/** Per-user timer state: running event count + last event time (µs). */
case class TimerState(n: Long, lastUs: Long)

/** Event-time timer processor (the `registerTimer`/`handleExpiredTimer`
  * half of the transformWithState API): each batch updates the user's
  * (count, max event time) state and re-registers ONE timer at
  * last-event-ms + 30 min; when the event-time watermark passes the
  * timer, [[handleExpiredTimer]] emits the closed session summary. Only
  * sessions whose gap provably elapsed BEFORE the run's final watermark
  * emit — the stream's completeness contract, replayable in SQL. */
class SessionTimerProcessor
    extends StatefulProcessor[Long, (Long, Long), TimerEmit] {
  @transient private var st: ValueState[TimerState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[TimerState]("sess",
      Encoders.product[TimerState], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
                               tv: TimerValues): Iterator[TimerEmit] = {
    val prev = if (st.exists()) st.get() else TimerState(0L, Long.MinValue)
    var n = prev.n
    var mx = prev.lastUs
    rows.foreach { case (_, us) => n += 1; if (us > mx) mx = us }
    if (prev.lastUs != Long.MinValue)
      getHandle.deleteTimer(prev.lastUs / 1000L + 1800000L)
    st.update(TimerState(n, mx))
    getHandle.registerTimer(mx / 1000L + 1800000L)
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, tv: TimerValues,
                                  info: ExpiredTimerInfo): Iterator[TimerEmit] = {
    val cur = st.get()
    // the session is CLOSED once its timer fires: clear the state so a
    // later batch starts a fresh session (count from 0) instead of
    // resuming the emitted one — without this a multi-batch source
    // double-counts (cumulative n_events re-emitted) and per-key state
    // never dies. The test fixture pins maxFilesPerTrigger so all rows
    // land in one micro-batch and only the final-watermark expiry path
    // runs; the oracle's one-row-per-user predicate relies on that
    // single-batch shape, not on stale state surviving here.
    st.clear()
    Iterator.single(TimerEmit(key, cur.n, info.getExpiryTimeInMs))
  }
}

/** Per-key emission from [[RecentEventsProcessor]]: the bounded
  * recent-list readout next to the per-type map totals. */
case class ListMapEmit(user_id: Long, n_recent: Long, recent_max_us: Long,
                       recent_min_us: Long, n_types: Long, n_total: Long)

/** ListState + MapState processor (the two `transformWithState` state
  * variants q_stream_state_ttl/q_stream_event_timer don't exercise —
  * VERDICT r15 item 6): per user,
  *  - `recent` (ListState[Long]): the 5 LARGEST event timestamps seen so
  *    far — each batch merges its rows and `put`s the trimmed top-5
  *    back, the bounded-state discipline a 100 TB stream needs (state
  *    per key is O(5), never O(events));
  *  - `byType` (MapState[String, Long]): event counts keyed by type
  *    (containsKey/getValue/updateValue/iterator all exercised).
  * One emission per key per batch carrying the current list bounds and
  * map totals; every emitted field is monotone in the event set, so the
  * consumer's max-per-user readout equals the FINAL state and a SQL
  * oracle can replay it from the corpus (ties on ts are harmless: the
  * readout uses only count/min/max of the kept ts VALUES). */
class RecentEventsProcessor
    extends StatefulProcessor[Long, (Long, Long, String), ListMapEmit] {
  @transient private var recent: ListState[Long] = _
  @transient private var byType: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    recent = getHandle.getListState[Long]("recent",
      Encoders.scalaLong, TTLConfig.NONE)
    byType = getHandle.getMapState[String, Long]("byType",
      Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long, String)],
                               tv: TimerValues): Iterator[ListMapEmit] = {
    val batch = rows.toArray
    batch.foreach { case (_, _, et) =>
      val cur = if (byType.containsKey(et)) byType.getValue(et) else 0L
      byType.updateValue(et, cur + 1L)
    }
    val merged = (recent.get().toArray ++ batch.map(_._2))
      .sorted(Ordering[Long].reverse).take(5)
    recent.put(merged) // trim on write: the list never exceeds 5 entries
    var nTypes = 0L
    var nTotal = 0L
    byType.iterator().foreach { kv => nTypes += 1; nTotal += kv._2 }
    Iterator.single(ListMapEmit(key, merged.length.toLong,
      merged.head, merged.last, nTypes, nTotal))
  }
}

/** Structured Streaming operators (SURVEY.md §2.2 "Streaming"), each run
  * bounded via [[StreamRunner]] (file source → memory sink →
  * `Trigger.AvailableNow`) so results are hash-checkable against DuckDB.
  * The reference declares the streaming surface only as "querying …
  * table-structured datasets" over its workspace tables
  * (/root/reference/README.md:3); `events` is the driver corpus' stream
  * table.
  *
  * Every transform here is a production streaming plan: watermarks bound
  * state, aggregations are keyed (shuffle on group keys only), the
  * stream-static join broadcasts the dimension side. Only the source/sink
  * pair is test-specific.
  */
object StreamingQueries extends QueryPack {

  def declared: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    // -- watermarked tumbling event-time window, complete mode -------------
    "q_stream_tumbling" -> ((s, d) => {
      val agg = StreamRunner.eventsStream(s, d)
        .withWatermark("ts_t", "10 minutes")
        .groupBy(window(col("ts_t"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_raw"))
      StreamRunner.runToTable(s, agg, "g_stream_tumbling", "complete")
        .select(unix_timestamp(col("w.start")).as("hour_s"),
          col("event_type"), col("n"), round(col("sum_raw"), 2).as("sum_v"))
        .orderBy(col("hour_s"), col("event_type"))
    }),

    // -- sliding window (1h every 30m), complete mode -----------------------
    "q_stream_sliding" -> ((s, d) => {
      val agg = StreamRunner.eventsStream(s, d)
        .withWatermark("ts_t", "10 minutes")
        .groupBy(window(col("ts_t"), "1 hour", "30 minutes").as("w"))
        .agg(count(lit(1)).as("n"), avg(col("value")).as("avg_raw"))
      StreamRunner.runToTable(s, agg, "g_stream_sliding", "complete")
        .select(unix_timestamp(col("w.start")).as("win_s"), col("n"),
          round(col("avg_raw"), 6).as("avg_v"))
        .orderBy(col("win_s"))
    }),

    // -- session window (complete mode; batch twin: q_session_window) -------
    "q_stream_session" -> ((s, d) => {
      val agg = StreamRunner.eventsStream(s, d)
        .withWatermark("ts_t", "10 minutes")
        .groupBy(col("user_id"),
          session_window(col("ts_t"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_raw"))
      StreamRunner.runToTable(s, agg, "g_stream_session", "complete")
        .select(col("user_id"),
          unix_micros(col("w.start")).as("session_start_us"),
          col("n_events"), round(col("sum_raw"), 2).as("sum_v"))
        .orderBy(col("user_id"), col("session_start_us"))
    }),

    // -- update output mode: per-key counts, single-batch bounded run -------
    // Update mode emits only keys changed in each micro-batch; under one
    // AvailableNow batch every key changes exactly once, so the sink
    // holds one final row per key — deterministic and oracle-checkable
    // (complete/append are covered by the window queries above).
    "q_stream_update" -> ((s, d) => {
      val agg = StreamRunner.eventsStream(s, d)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_raw"))
      StreamRunner.runToTable(s, agg, "g_stream_update", "update")
        .select(col("event_type"), col("n"),
          round(col("sum_raw"), 2).as("sum_v"))
        .orderBy(col("event_type"))
    }),

    // -- streaming dedup within watermark -----------------------------------
    "q_stream_dedup" -> ((s, d) => {
      val deduped = StreamRunner.eventsStream(s, d)
        .withWatermark("ts_t", "10 minutes")
        .dropDuplicatesWithinWatermark("event_id")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("ts_us"))
      StreamRunner.runToTable(s, deduped, "g_stream_dedup", "append")
        .orderBy(col("event_id"))
    }),

    // -- stream-static join: events enriched with the customer dim ----------
    // The static side is small → broadcast; no shuffle of the stream.
    "q_stream_static_join" -> ((s, d) => {
      val cust = broadcast(Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment")))
      val joined = StreamRunner.eventsStream(s, d)
        .join(cust, col("user_id") === col("c_custkey"))
        .select(col("event_id"), col("user_id"), col("c_mktsegment"),
          col("value"))
      StreamRunner.runToTable(s, joined, "g_stream_static_join", "append")
        .orderBy(col("event_id"))
    }),

    // -- streaming drift monitor: windowed PSI vs a static reference --------
    // The continuous-query twin of q_drift_psi: reference decile edges
    // come from a BATCH pass over the early cohort (a frozen baseline in
    // production — recomputed offline, broadcast to the stream), the
    // stream bins each event with the shared DriftQueries.binColumn fold
    // (no join, a 9-branch codegen'd expression) and counts per
    // (6h tumbling window, bin). PSI normalization happens post-sink on
    // the bounded (windows × 10) result — the stream maintains only
    // mergeable counts, which is what keeps the state store small at
    // any input rate. Driver state: 9 edge longs + 10 reference counts.
    "q_stream_drift" -> ((s, d) => {
      import graft.operators.DriftQueries
      val cdf = DriftQueries.cohortCdf(s, d)  // session-persisted memo
      val (edges, naTot, refCounts) = {
        val naTot = cdf.agg(sum(col("na"))).head().getLong(0)
        val decEdges = DriftQueries.decileEdges(cdf, naTot)
        val counts = cdf
          .withColumn("bin", DriftQueries.binColumn(decEdges, col("vq")))
          .groupBy(col("bin")).agg(sum(col("na")).as("n_ref"))
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        (decEdges, naTot,
          (0 until 10).map(b => (b, counts.getOrElse(b, 0L))))
      }
      val refBins = s.createDataFrame(refCounts).toDF("bin", "n_ref")
      val vq = floor(col("value") * lit(1000.0) + lit(0.5)).cast("long")
      val agg = StreamRunner.eventsStream(s, d)
        .withWatermark("ts_t", "10 minutes")
        .withColumn("bin", DriftQueries.binColumn(edges, vq))
        .groupBy(window(col("ts_t"), "6 hours").as("w"), col("bin"))
        .agg(count(lit(1)).as("n_cur"))
      val sink = StreamRunner.runToTable(s, agg, "g_stream_drift", "complete")
        .select(unix_timestamp(col("w.start")).as("win_s"), col("bin"),
          col("n_cur"))
      val grid = sink.select(col("win_s")).distinct()
        .crossJoin(broadcast(
          s.range(0, 10).select(col("id").cast("int").as("bin"))))
      val tot = sink.groupBy(col("win_s")).agg(sum(col("n_cur")).as("nw"))
      grid.join(sink, Seq("win_s", "bin"), "left")
        .join(broadcast(refBins), Seq("bin"))
        .join(broadcast(tot), Seq("win_s"))
        .withColumn("n_cur", coalesce(col("n_cur"), lit(0L)))
        .withColumn("pr",
          (col("n_ref").cast("double") + lit(0.5)) / lit(naTot + 5.0))
        .withColumn("pc",
          (col("n_cur").cast("double") + lit(0.5)) /
            (col("nw").cast("double") + lit(5.0)))
        .select(col("win_s"), col("bin").cast("bigint").as("bin"),
          col("n_cur"),
          round((col("pc") - col("pr")) * log(col("pc") / col("pr")), 6)
            .as("psi_term"))
        .orderBy(col("win_s"), col("bin"))
    }),

    // -- stream-static LEFT ANTI join (dedup against history) ---------------
    // The incremental-ingest decontamination shape: new events stream in
    // and rows whose user already exists in a static historical corpus
    // are dropped BEFORE any downstream aggregation. The static side
    // broadcasts per micro-batch (a frozen blocklist/seen-set at 100 TB
    // would be a bucketed table or bloom sketch — q_bloom_decontaminate
    // is the batch twin of that refinement); anti join is stateless per
    // batch, so no watermark is needed on the join itself.
    "q_stream_anti_join" -> ((s, d) => {
      val seen = broadcast(Tables.customer(s, d)
        .filter(pmod(col("c_custkey"), lit(10)) === 0)
        .select(col("c_custkey")))
      val fresh = StreamRunner.eventsStream(s, d)
        .join(seen, col("user_id") === col("c_custkey"), "left_anti")
        .groupBy(col("event_type"))
        // exact count(distinct) is unsupported over a stream (it cannot
        // be maintained incrementally per-key); the distinct-user shape
        // lives in q_stream_dedup — here the survivor stats are
        // incrementally mergeable aggregates
        .agg(count(lit(1)).as("n_fresh"),
          min(col("user_id")).as("min_user"),
          max(col("user_id")).as("max_user"))
      StreamRunner.runToTable(s, fresh, "g_stream_anti_join", "complete")
        .orderBy(col("event_type"))
    }),

    // -- stream-stream inner join with event-time interval ------------------
    // Both sides watermarked and the join carries a time-range predicate,
    // so each side's buffered state is bounded (rows age out once the
    // other side's watermark passes view_t <= click_t + 30min) — the
    // requirement for an unbounded run. Inner join in append mode is
    // exact, so the batch twin is a plain interval self-join.
    "q_stream_stream_join" -> ((s, d) => {
      val clicks = StreamRunner.eventsStream(s, d)
        .filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("cu"),
          col("ts_t").as("click_t"), col("ts_us").as("click_us"))
        .withWatermark("click_t", "10 minutes")
      val views = StreamRunner.eventsStream(s, d)
        .filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id").as("vu"),
          col("ts_t").as("view_t"), col("ts_us").as("view_us"))
        .withWatermark("view_t", "10 minutes")
      val joined = clicks.join(views,
        col("cu") === col("vu") &&
          col("view_t") >= col("click_t") &&
          col("view_t") <= col("click_t") + expr("INTERVAL 30 MINUTES"))
        .select(col("click_id"), col("view_id"), col("cu").as("user_id"),
          col("click_us"), col("view_us"))
      StreamRunner.runToTable(s, joined, "g_stream_stream_join", "append")
        .orderBy(col("click_id"), col("view_id"))
    }),

    // -- stream-stream LEFT SEMI interval join ------------------------------
    // The streaming EXISTS: clicks that attracted ≥1 view from the same
    // user within 30 minutes, emitted as soon as the FIRST match
    // arrives — each left row at most once, no view payload shipped.
    // Unlike the outer twin there is no withholding subtlety on a
    // bounded replay: unmatched rows simply never emit, so the batch
    // oracle is the plain EXISTS under the identical interval. State:
    // both sides bounded by the watermark + interval, exactly the inner
    // join's envelope.
    "q_stream_semi_join" -> ((s, d) => {
      val clicks = StreamRunner.eventsStream(s, d)
        .filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("cu"),
          col("ts_t").as("click_t"), col("ts_us").as("click_us"))
        .withWatermark("click_t", "10 minutes")
      val views = StreamRunner.eventsStream(s, d)
        .filter(col("event_type") === "view")
        .select(col("user_id").as("vu"), col("ts_t").as("view_t"))
        .withWatermark("view_t", "10 minutes")
      val joined = clicks.join(views,
        col("cu") === col("vu") &&
          col("view_t") >= col("click_t") &&
          col("view_t") <= col("click_t") + expr("INTERVAL 30 MINUTES"),
        "left_semi")
        .select(col("click_id"), col("cu").as("user_id"), col("click_us"))
      StreamRunner.runToTable(s, joined, "g_stream_semi_join", "append")
        .orderBy(col("click_id"))
    }),

    // -- streaming upsert snapshot (last-writer-wins per key) ---------------
    // The CDC-view shape: an update-mode aggregate whose state is each
    // user's LATEST event under the (ts, event_id) total order — the
    // streaming materialization of "current value per key" every
    // operational dashboard sits on. max(struct(...)) makes the
    // comparison a single lexicographic struct max (mergeable, so
    // map-side partials work and state is one row per key); the bounded
    // replay's single AvailableNow micro-batch emits each key exactly
    // once. Oracle: the batch argmax.
    "q_stream_upsert" -> ((s, d) => {
      val e = StreamRunner.eventsStream(s, d)
        .select(col("user_id"), col("ts_us"), col("event_id"),
          col("event_type"),
          floor(col("value") * lit(1000.0) + lit(0.5)).cast("long")
            .as("vq"))
      val snap = e.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          max(struct(col("ts_us"), col("event_id"), col("event_type"),
            col("vq"))).as("last"))
        .select(col("user_id"), col("n_events"),
          col("last.ts_us").as("last_ts_us"),
          col("last.event_id").as("last_event_id"),
          col("last.event_type").as("last_type"),
          (col("last.vq").cast("double") / lit(1000.0)).as("last_value"))
      StreamRunner.runToTable(s, snap, "g_stream_upsert", "update")
        .orderBy(col("user_id"))
    }),

    // -- late-data accounting: watermark drops, measured (r14) --------------
    // The production streaming question none of the other rows answer:
    // when data arrives LATE — older than what the stream has already
    // processed — how much does the watermark actually drop? The
    // three-micro-batch fixture (StreamRunner.lateFixtureDir) replays
    // the events table split at its midpoint T0: batch 1 processes the
    // newer half, batch 2 a 1-row marker (Spark applies a freshly
    // computed watermark to late-row FILTERING one batch later, so the
    // marker batch is what arms it; the duplicated row dedupes away),
    // batch 3 delivers the older half late under watermark
    // W = max(on-time ts)ms − 18 days. dropDuplicates drops every late
    // row below W (numRowsDroppedByWatermark — the metric a production
    // stream alerts on); rows in the ~3-day grace band survive and
    // emit. Output is the one-row audit a pipeline dashboard tracks:
    // on-time volume, late volume, dropped, late-but-kept, total
    // emitted — with n_emitted ≡ n_on_time + n_late_kept pinning the
    // metric against the sink. Deterministic because the split, the
    // file order, the ms-floored watermark arithmetic and the drop
    // predicate (event time < W; no corpus event lies within 1 ms of
    // the boundary) are exact integer functions of the corpus — which
    // is what lets a DuckDB oracle replay a STREAMING-semantics row.
    "q_stream_late_data" -> ((s, d) => {
      val fix = StreamRunner.lateFixtureDir(s, d)
      val schema = s.read.parquet(s"$d/events.parquet").schema
      val dd = s.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", "1") // one file per micro-batch
        .parquet(fix)
        .transform(graft.engine.Tables.withEventTime)
        .withWatermark("ts_t", "18 days")
        .dropDuplicates("event_id", "ts_t")
        .select(col("event_id"))
      val (sink, dropped) = StreamRunner.runToTableWithDropped(
        s, dd, "g_stream_late_data", "append")
      val nEmitted = sink.count()
      val ev = Tables.withEventTime(Tables.events(s, d))
      val mm = ev.agg(min(col("ts_us")).as("mn"),
        max(col("ts_us")).as("mx")).head()
      val t0 = (mm.getLong(0) + mm.getLong(1)) / 2
      ev.agg(
          sum((col("ts_us") >= t0).cast("int").cast("long"))
            .as("n_on_time"),
          sum((col("ts_us") < t0).cast("int").cast("long"))
            .as("n_late"))
        .select(col("n_on_time"), col("n_late"),
          lit(dropped).as("n_dropped"),
          (col("n_late") - lit(dropped)).as("n_late_kept"),
          lit(nEmitted).as("n_emitted"))
    }),

    // -- stream-stream LEFT OUTER interval join ----------------------------
    // Outer rows (clicks with no view in their 30-minute window) can
    // only EMIT once the watermark passes the end of their match window
    // -- until then a matching view could still arrive, so the row sits
    // in join state. A bounded replay's FINAL watermark is
    // max(event_time) - delay, so clicks whose windows extend past it
    // are (correctly!) withheld at termination: they are not yet
    // decidable. Streaming results are only COMPLETE UP TO THE
    // WATERMARK; the declared query therefore restricts the left side
    // to clicks whose windows provably close before the final watermark
    // -- a deterministic predicate both engines apply identically (the
    // 60 s margin keeps the gate independent of Spark's internal
    // eviction-boundary strictness). The batch oracle is the plain
    // LEFT JOIN under the same bound.
    "q_stream_outer_join" -> ((s, d) => {
      // The completeness bound comes from the run's OWN final watermark
      // (progress metadata, zero extra source reads — at 100 TB a
      // pre-pass over the stream's history is a full extra scan).
      // Mechanics: run the unrestricted left-outer join; Spark withholds
      // undecided outer rows (a matching view could still arrive) but
      // emits matched rows immediately, so the sink holds every click
      // decided by the final watermark plus early matches beyond it.
      // Post-filtering clicks to (watermark - join window - 60 s margin)
      // keeps exactly the watermark-complete subset — deterministic, and
      // the batch oracle applies the same bound (floored to ms first:
      // Spark tracks event-time stats in ms). The global watermark is
      // min(max click ts, max view ts) - delay, each side derived from
      // ITS OWN filtered stream.
      val clicks = StreamRunner.eventsStream(s, d)
        .filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("cu"),
          col("ts_t").as("click_t"), col("ts_us").as("click_us"))
        .withWatermark("click_t", "10 minutes")
      val views = StreamRunner.eventsStream(s, d)
        .filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id").as("vu"),
          col("ts_t").as("view_t"), col("ts_us").as("view_us"))
        .withWatermark("view_t", "10 minutes")
      val joined = clicks.join(views,
          col("cu") === col("vu") &&
            col("view_t") >= col("click_t") &&
            col("view_t") <= col("click_t") + expr("INTERVAL 30 MINUTES"),
          "left_outer")
        .select(col("click_id"), col("view_id"), col("cu").as("user_id"),
          col("click_us"), col("view_us"))
      val (table, wm) = StreamRunner.runToTableWithWatermark(
        s, joined, "g_stream_outer_join", "append")
      // no watermark (empty side) -> nothing is decidable -> empty result
      val bound = wm.map(_ - 1800000000L - 60000000L)
        .getOrElse(Long.MinValue)
      table.filter(col("click_us") <= lit(bound))
        .orderBy(col("click_id"), coalesce(col("view_id"), lit(-1L)))
    }),

    // -- stream-stream FULL OUTER interval join ----------------------------
    // Completes the streaming join family: unmatched rows of BOTH sides
    // survive. Decidability is asymmetric — a click's outer row needs
    // the watermark past its whole 30-min match window (no view can
    // still arrive), while a view's needs only the watermark past the
    // view itself (matching clicks satisfy click_t <= view_t, so a
    // future click for it would already be late). The declared subset
    // applies each side's bound, both derived from the run's own final
    // watermark (same zero-extra-scan mechanics as q_stream_outer_join);
    // the oracle applies the identical predicate OVER the full join —
    // not to the join inputs, which would resurrect view-null rows for
    // views whose only match was an out-of-bound click.
    "q_stream_full_outer" -> ((s, d) => {
      val clicks = StreamRunner.eventsStream(s, d)
        .filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("cu"),
          col("ts_t").as("click_t"), col("ts_us").as("click_us"))
        .withWatermark("click_t", "10 minutes")
      val views = StreamRunner.eventsStream(s, d)
        .filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id").as("vu"),
          col("ts_t").as("view_t"), col("ts_us").as("view_us"))
        .withWatermark("view_t", "10 minutes")
      val joined = clicks.join(views,
          col("cu") === col("vu") &&
            col("view_t") >= col("click_t") &&
            col("view_t") <= col("click_t") + expr("INTERVAL 30 MINUTES"),
          "full_outer")
        .select(col("click_id"), col("view_id"),
          coalesce(col("cu"), col("vu")).as("user_id"),
          col("click_us"), col("view_us"))
      val (table, wm) = StreamRunner.runToTableWithWatermark(
        s, joined, "g_stream_full_outer", "append")
      val boundC = wm.map(_ - 1800000000L - 60000000L)
        .getOrElse(Long.MinValue)
      val boundV = wm.map(_ - 60000000L).getOrElse(Long.MinValue)
      table.filter(
          (col("click_id").isNotNull && col("click_us") <= lit(boundC)) ||
          (col("click_id").isNull && col("view_us") <= lit(boundV)))
        .orderBy(coalesce(col("click_id"), lit(-1L)),
          coalesce(col("view_id"), lit(-1L)))
    }),

    // -- state store reader: inspect a checkpoint's state as a DataFrame ----
    // The streaming-ops surface: after a stateful query runs, its state
    // store is a queryable table (Spark 4's "statestore" data source) —
    // how production debugs hot keys, audits state size, and bootstraps
    // state migrations without replaying the stream. Here: run a
    // watermarked per-type count against a DURABLE checkpoint, then read
    // the aggregation state back and project key + count. The state's
    // content equals the batch aggregate, which is the oracle.
    "q_state_reader" -> ((s, d) => {
      val ckpt = graft.operators.SourceQueries.scratch(s, d,
        "state_reader_ckpt")
      val agg = StreamRunner.eventsStream(s, d)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_raw"))
      val q = agg.writeStream
        .format("noop")
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.format("statestore").load(ckpt)
        .select(col("key.event_type").as("event_type"),
          col("value.count").as("n"),
          round(col("value.sum"), 2).as("sum_v"))
        .orderBy(col("event_type"))
    }),

    // -- stateful per-key processing (flatMapGroupsWithState) ---------------
    // One emission per key per micro-batch; the single-file source gives
    // exactly one batch under AvailableNow (see StreamRunner), so the
    // output is the per-user total — deterministic and oracle-checkable.
    "q_stream_stateful" -> ((s, d) => {
      import s.implicits._
      val typed = StreamRunner.eventsStream(s, d)
        .select(col("user_id"), col("value")).as[(Long, Double)]
      val stats = typed.groupByKey(_._1)
        .flatMapGroupsWithState[UserState, UserStats](
          OutputMode.Append(), GroupStateTimeout.NoTimeout) {
          (user: Long, rows: Iterator[(Long, Double)],
           state: GroupState[UserState]) =>
            val prev = state.getOption.getOrElse(UserState(0L, 0.0))
            var n = prev.n
            var sum = prev.sum
            rows.foreach { case (_, v) => n += 1; sum += v }
            state.update(UserState(n, sum))
            Iterator(UserStats(user, n, sum))
        }
      StreamRunner.runToTable(s, stats.toDF(), "g_stream_stateful", "append")
        .select(col("user_id"), col("n_events"),
          round(col("sum_raw"), 2).as("sum_v"))
        .orderBy(col("user_id"))
    }),

    // -- transformWithState (Spark 4 arbitrary-state API) -------------------
    // Typed ValueState per key, RocksDB-backed (the API requires it); the
    // single AvailableNow batch makes the per-key emission the final
    // running aggregate, so the output is oracle-checkable.
    "q_stream_transform" -> ((s, d) => {
      import s.implicits._
      val confKey = "spark.sql.streaming.stateStore.providerClass"
      val prev = s.conf.getOption(confKey)
      s.conf.set(confKey, "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
      try {
        val typed = StreamRunner.eventsStream(s, d)
          .select(col("user_id"), col("value")).as[(Long, Double)]
        val out = typed.groupByKey(_._1)
          .transformWithState(new MaxProcessor, TimeMode.None(),
            OutputMode.Append())
        StreamRunner.runToTable(s, out.toDF(), "g_stream_transform", "append")
          .select(col("user_id"), col("n_events"),
            round(col("max_raw"), 2).as("max_v"))
          .orderBy(col("user_id"))
      } finally prev match {
        case Some(p) => s.conf.set(confKey, p)
        case None    => s.conf.unset(confKey)
      }
    }),

    // -- event-time timers: watermark-driven session close (r15) -------------
    // The registerTimer/handleExpiredTimer half of transformWithState
    // (q_stream_state_ttl covers the TTL half): [[SessionTimerProcessor]]
    // re-registers one event-time timer per user at last-event + 30 min;
    // the session summary emits ONLY when the watermark passes the
    // timer — so the bounded run's output is exactly the users whose
    // session gap provably elapsed before the final watermark
    // (last_ms + 30 min < ms-floored max(ts) − 10 min), a pure-SQL
    // predicate the oracle replays. Event-time mode DOES drain under
    // AvailableNow (the clock is the watermark, which stabilizes —
    // unlike processing-time mode's always-another-batch).
    "q_stream_event_timer" -> ((s, d) => {
      import s.implicits._
      val confKey = "spark.sql.streaming.stateStore.providerClass"
      val prev = s.conf.getOption(confKey)
      s.conf.set(confKey, "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
      try {
        val typed = StreamRunner.eventsStream(s, d)
          .withWatermark("ts_t", "10 minutes")
          .select(col("user_id"), col("ts_us")).as[(Long, Long)]
        val out = typed.groupByKey(_._1)
          .transformWithState(new SessionTimerProcessor,
            TimeMode.EventTime(), OutputMode.Append())
        StreamRunner.runToTable(s, out.toDF(), "g_stream_event_timer",
            "append")
          .orderBy(col("user_id"), col("timer_ms"))
      } finally prev match {
        case Some(p) => s.conf.set(confKey, p)
        case None    => s.conf.unset(confKey)
      }
    }),

    // -- transformWithState TTL: per-batch state expiry (r15) ----------------
    // The state-TTL half of the Spark-4 arbitrary-state API (VERDICT r14
    // item 6): [[TtlCountProcessor]] keeps a 1 ms processing-time-TTL'd
    // per-batch counter next to a persistent total over the SAME key.
    // Driven over the 3-micro-batch late fixture (one file per trigger —
    // deterministic batch membership: on-time ts ≥ T0, the max-ts marker
    // row, late ts < T0), so each user's per-batch counts are pure
    // functions of the corpus. The readout pins TTL semantics
    // arithmetically: ttl_reset_ok ⇔ Σ batch_n = final total, which
    // holds only if the TTL'd state expired between every pair of
    // batches (an unexpired TTL would double-count earlier batches).
    // Production shape: TTL is how a 100 TB keyed-state stream bounds
    // state for keys that go quiet — the store evicts them without a
    // timer per key.
    "q_stream_state_ttl" -> ((s, d) => {
      import s.implicits._
      val confKey = "spark.sql.streaming.stateStore.providerClass"
      val prev = s.conf.getOption(confKey)
      s.conf.set(confKey, "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
      try {
        val fix = StreamRunner.lateFixtureDir(s, d)
        val schema = s.read.parquet(s"$d/events.parquet").schema
        val typed = s.readStream
          .schema(schema)
          .option("maxFilesPerTrigger", "1") // one file per micro-batch
          .parquet(fix)
          .select(col("user_id")).as[Long]
        val out = typed.groupByKey(identity)
          .transformWithState(new TtlCountProcessor,
            TimeMode.ProcessingTime(), OutputMode.Append())
        // processing-time mode never drains (see runToTableUntilInput) —
        // stop once every fixture row has committed through the sink
        val expected = s.read.schema(schema).parquet(fix).count()
        StreamRunner.runToTableUntilInput(s, out.toDF(),
            "g_stream_state_ttl", "append", expected)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_batches"),
            max(col("total_n")).as("n_events"),
            max(col("batch_n")).as("max_batch_n"),
            (sum(col("batch_n")) === max(col("total_n")))
              .as("ttl_reset_ok"))
          .orderBy(col("user_id"))
      } finally prev match {
        case Some(p) => s.conf.set(confKey, p)
        case None    => s.conf.unset(confKey)
      }
    }),

    // -- transformWithState ListState + MapState (r16) ----------------------
    // The remaining Spark-4 arbitrary-state variants (VERDICT r15 item
    // 6): [[RecentEventsProcessor]] keeps a BOUNDED top-5 recent-ts
    // ListState plus a per-type count MapState per user, driven over the
    // same 3-micro-batch late fixture as q_stream_state_ttl (on-time /
    // marker / late — so the list must survive a batch whose rows are
    // all OLDER than everything it holds, and the map accumulates
    // across batches). Every emitted field is monotone in the event
    // set, so max-per-user over the per-batch emissions equals the
    // final state and the oracle replays it straight from the corpus
    // (marker row duplicated, exactly as the fixture feeds it).
    "q_stream_list_state" -> ((s, d) => {
      import s.implicits._
      val confKey = "spark.sql.streaming.stateStore.providerClass"
      val prev = s.conf.getOption(confKey)
      s.conf.set(confKey, "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
      try {
        val fix = StreamRunner.lateFixtureDir(s, d)
        val schema = s.read.parquet(s"$d/events.parquet").schema
        val typed = s.readStream
          .schema(schema)
          .option("maxFilesPerTrigger", "1") // one file per micro-batch
          .parquet(fix)
          .transform(Tables.withEventTime)
          .select(col("user_id"), col("ts_us"), col("event_type"))
          .as[(Long, Long, String)]
        val out = typed.groupByKey(_._1)
          .transformWithState(new RecentEventsProcessor,
            TimeMode.None(), OutputMode.Append())
        val expected = s.read.schema(schema).parquet(fix).count()
        StreamRunner.runToTableUntilInput(s, out.toDF(),
            "g_stream_list_state", "append", expected)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_batches"),
            max(col("n_recent")).as("n_recent"),
            max(col("recent_max_us")).as("recent_max_us"),
            max(col("recent_min_us")).as("recent_min_us"),
            max(col("n_types")).as("n_types"),
            max(col("n_total")).as("n_total"))
          .orderBy(col("user_id"))
      } finally prev match {
        case Some(p) => s.conf.set(confKey, p)
        case None    => s.conf.unset(confKey)
      }
    }),

    // -- foreachBatch sink: per-micro-batch batch writes --------------------
    // THE production sink API: each micro-batch arrives as a plain
    // DataFrame with its batchId, and the writer gets full batch-API
    // power (parquet/JDBC/merge). Exactly-once comes from idempotence —
    // the output path is keyed by batchId, so a retried batch overwrites
    // its own directory instead of duplicating. The streamed rows are
    // then read back from the parquet sink and aggregated, so the oracle
    // checks the data actually LANDED through the sink, not just that
    // the stream ran. No checkpointLocation: like every bounded run
    // here, a temp checkpoint makes each invocation reprocess from
    // scratch (a production job pins a durable checkpoint instead).
    "q_stream_foreachbatch" -> ((s, d) => {
      val out = graft.operators.SourceQueries.scratch(s, d, "stream_fb")
      val src = StreamRunner.eventsStream(s, d)
        .filter(col("value") > 0)
        .select(col("event_id"), col("event_type"), col("value"))
      val conf = s.conf
      val prev = conf.get("spark.sql.shuffle.partitions")
      conf.set("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTS", "4"))
      try {
        val q = src.writeStream
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            batch.write.mode("overwrite").parquet(s"$out/batch_$batchId")
            ()
          }
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      } finally conf.set("spark.sql.shuffle.partitions", prev)
      s.read.parquet(s"$out/batch_*")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v"))
        .orderBy(col("event_type"))
    }),

    // -- continuous top-k: hourly leaders -----------------------------------
    // The production streaming-top-k shape: the STREAM maintains only the
    // mergeable per-(window, type) counts (bounded state — exact top-k is
    // not incrementally maintainable, its inputs are), and the rank is
    // taken at READ time over the result table with a deterministic
    // (count desc, type) tie-break. Complete mode over AvailableNow sees
    // the whole corpus, so the batch oracle is exact.
    // -- streaming EXACT daily active users (chained stateful operators) ----
    // The q_active_users batch metric as a continuous query, exact (not
    // HLL): a per-(day-window, user) streaming dedup feeds a windowed
    // count — Spark 4's multiple-stateful-operator support, with the
    // watermark propagated through the dedup so both state stores expire.
    // State is bounded by users-per-open-window, the exact-distinct
    // analogue of q_stream_drift's mergeable counts. Append mode emits
    // decided windows; the deterministic read keeps windows whose end is
    // ≤ the run's own final watermark (the q_stream_outer_join
    // completeness pattern), which the batch oracle reproduces from
    // ms-floored max(ts) − delay.
    "q_stream_dau" -> ((s, d) => {
      val dedup = StreamRunner.eventsStream(s, d)
        .withWatermark("ts_t", "10 minutes")
        .select(window(col("ts_t"), "1 day").as("w"), col("user_id"),
          col("ts_t"))
        .dropDuplicates("w", "user_id")
      val agg = dedup.groupBy(col("w")).agg(count(lit(1)).as("dau"))
      val (table, wm) = StreamRunner.runToTableWithWatermark(
        s, agg, "g_stream_dau", "append")
      val bound = wm.getOrElse(Long.MinValue)
      table
        .select(unix_timestamp(col("w.start")).as("day_s"),
          unix_micros(col("w.end")).as("end_us"), col("dau"))
        .filter(col("end_us") <= lit(bound))
        .select(col("day_s"), col("dau"))
        .orderBy(col("day_s"))
    }),

    "q_stream_topk" -> ((s, d) => {
      val agg = StreamRunner.eventsStream(s, d)
        .withWatermark("ts_t", "10 minutes")
        .groupBy(window(col("ts_t"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("hour_s"))
        .orderBy(col("n").desc, col("event_type"))
      StreamRunner.runToTable(s, agg, "g_stream_topk", "complete")
        .select(unix_timestamp(col("w.start")).as("hour_s"),
          col("event_type"), col("n"))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3L)
        .orderBy(col("hour_s"), col("rnk"))
    })
  )

  def declaredOracle: Seq[(String, String)] = Seq(
    // exact distinct per epoch-aligned day; watermark-complete windows
    // only (end <= ms-floored max(ts) - 10 min)
    "q_stream_dau" ->
      """WITH wm AS (SELECT (max(epoch_us(ts) // 1000)) * 1000
        |    - 600000000 AS wm_us FROM events),
        |d AS (SELECT epoch_us(ts) // 86400000000 AS day_i, user_id
        |  FROM events),
        |dd AS (SELECT DISTINCT day_i, user_id FROM d)
        |SELECT day_i * 86400 AS day_s, count(*) AS dau
        |FROM dd CROSS JOIN wm
        |WHERE (day_i + 1) * 86400000000 <= wm_us
        |GROUP BY day_i * 86400 ORDER BY day_s""".stripMargin,

    "q_stream_topk" ->
      """WITH c AS (SELECT (epoch_us(ts) // 3600000000) * 3600 AS hour_s,
        |    event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT hour_s, event_type, n,
        |    row_number() OVER (PARTITION BY hour_s
        |      ORDER BY n DESC, event_type) AS rnk
        |  FROM c)
        |SELECT hour_s, event_type, n, CAST(rnk AS BIGINT) AS rnk
        |FROM r WHERE rnk <= 3 ORDER BY hour_s, rnk""".stripMargin,
    // batch replay of the full pipeline: reference deciles (q_drift_psi's
    // ceil-threshold contract), epoch-aligned 6h windows, per-(win, bin)
    // counts with zero cells kept, Laplace-smoothed PSI terms
    "q_stream_drift" ->
      """WITH e AS (SELECT
        |    CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS vq,
        |    epoch_us(ts) AS us FROM events),
        |b AS (SELECT (min(us) + max(us)) // 2 AS mid FROM e),
        |g AS (SELECT vq,
        |    sum(CASE WHEN us < mid THEN 1 ELSE 0 END) AS na
        |  FROM e CROSS JOIN b GROUP BY vq),
        |c AS (SELECT vq, na, sum(na) OVER (ORDER BY vq) AS cum_a FROM g),
        |t AS (SELECT sum(na) AS nat FROM g),
        |edges AS (SELECT i, min(vq) AS edge
        |  FROM c CROSS JOIN (SELECT unnest(range(1, 10)) AS i)
        |  CROSS JOIN t
        |  WHERE cum_a >= (i * nat + 9) // 10 GROUP BY i),
        |eb AS (SELECT e.vq, e.us,
        |    (SELECT count(*) FROM edges WHERE edge <= e.vq) AS bin
        |  FROM e),
        |rb AS (SELECT bin, count(*) AS n_ref FROM eb CROSS JOIN b
        |  WHERE us < mid GROUP BY bin),
        |wn AS (SELECT (us // 21600000000) * 21600 AS win_s, bin FROM eb),
        |cnt AS (SELECT win_s, bin, count(*) AS n_cur FROM wn
        |  GROUP BY 1, 2),
        |wins AS (SELECT DISTINCT win_s FROM wn),
        |grid AS (SELECT wins.win_s, gb.bin
        |  FROM wins CROSS JOIN (SELECT unnest(range(0, 10)) AS bin) gb),
        |tw AS (SELECT win_s, sum(n_cur) AS nw FROM cnt GROUP BY win_s),
        |j AS (SELECT grid.win_s, grid.bin,
        |    coalesce(cnt.n_cur, 0) AS n_cur,
        |    coalesce(rb.n_ref, 0) AS n_ref, tw.nw, t.nat
        |  FROM grid LEFT JOIN cnt USING (win_s, bin)
        |  LEFT JOIN rb USING (bin) JOIN tw USING (win_s) CROSS JOIN t)
        |SELECT win_s, CAST(bin AS BIGINT) AS bin,
        |  CAST(n_cur AS BIGINT) AS n_cur,
        |  round(((n_cur + 0.5) / (nw + 5.0) - (n_ref + 0.5) / (nat + 5.0))
        |    * ln(((n_cur + 0.5) / (nw + 5.0))
        |        / ((n_ref + 0.5) / (nat + 5.0))), 6) AS psi_term
        |FROM j ORDER BY win_s, bin""".stripMargin,

    // fixture replay in pure SQL: midpoint split, ms-floored watermark,
    // row-level late predicate (no corpus event within 1 ms of W)
    // completeness predicate: a session emits iff its timer (last event
    // ms + 30 min) sits below the run's final watermark
    "q_stream_event_timer" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        |w AS (SELECT (max(us) // 1000) - 600000 AS wm FROM e),
        |g AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |    max(us) // 1000 + 1800000 AS timer_ms
        |  FROM e GROUP BY 1)
        |SELECT user_id, n_events, CAST(timer_ms AS BIGINT) AS timer_ms
        |FROM g CROSS JOIN w WHERE timer_ms < wm
        |ORDER BY user_id, timer_ms""".stripMargin,

    // batch membership replayed from the fixture's deterministic split
    // (on-time ts >= T0, the max-ts marker row(s), late ts < T0); the
    // TTL reset makes per-batch counts exactly the per-file counts
    "q_stream_state_ttl" ->
      """WITH e AS (SELECT epoch_us(ts) AS us, user_id FROM events),
        |m AS (SELECT min(us) AS mn, max(us) AS mx FROM e),
        |t AS (SELECT (mn + mx) // 2 AS t0, mx FROM m),
        |b1 AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n
        |  FROM e, t WHERE us >= t0 GROUP BY 1),
        |b2 AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n
        |  FROM e, t WHERE us = mx GROUP BY 1),
        |b3 AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n
        |  FROM e, t WHERE us < t0 GROUP BY 1),
        |u AS (SELECT user_id FROM b1 UNION
        |  SELECT user_id FROM b2 UNION SELECT user_id FROM b3),
        |j AS (SELECT u.user_id,
        |    coalesce(b1.n, 0) AS n1, coalesce(b2.n, 0) AS n2,
        |    coalesce(b3.n, 0) AS n3
        |  FROM u LEFT JOIN b1 ON u.user_id = b1.user_id
        |  LEFT JOIN b2 ON u.user_id = b2.user_id
        |  LEFT JOIN b3 ON u.user_id = b3.user_id)
        |SELECT user_id,
        |  CAST((CASE WHEN n1 > 0 THEN 1 ELSE 0 END)
        |    + (CASE WHEN n2 > 0 THEN 1 ELSE 0 END)
        |    + (CASE WHEN n3 > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_batches,
        |  CAST(n1 + n2 + n3 AS BIGINT) AS n_events,
        |  CAST(greatest(n1, n2, n3) AS BIGINT) AS max_batch_n,
        |  true AS ttl_reset_ok
        |FROM j ORDER BY user_id""".stripMargin,

    // fixture replay: events plus the duplicated max-ts marker row(s);
    // top-5 ts per user = the bounded ListState, per-type counts = the
    // MapState; n_batches from on-time/marker/late membership
    "q_stream_list_state" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_type
        |  FROM events),
        |m AS (SELECT min(us) AS mn, max(us) AS mx FROM e),
        |t AS (SELECT (mn + mx) // 2 AS t0, mx FROM m),
        |au AS (SELECT user_id, us, event_type FROM e
        |  UNION ALL
        |  SELECT user_id, us, event_type FROM e, t WHERE us = mx),
        |nb AS (SELECT e.user_id, CAST(
        |    max(CASE WHEN us >= t0 THEN 1 ELSE 0 END)
        |    + max(CASE WHEN us = mx THEN 1 ELSE 0 END)
        |    + max(CASE WHEN us < t0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_batches
        |  FROM e, t GROUP BY 1),
        |top5 AS (SELECT user_id, us,
        |    row_number() OVER (PARTITION BY user_id ORDER BY us DESC)
        |      AS rn
        |  FROM au),
        |rec AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_recent,
        |    max(us) AS recent_max_us, min(us) AS recent_min_us
        |  FROM top5 WHERE rn <= 5 GROUP BY 1),
        |tots AS (SELECT user_id,
        |    CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
        |    CAST(count(*) AS BIGINT) AS n_total
        |  FROM au GROUP BY 1)
        |SELECT nb.user_id, nb.n_batches, rec.n_recent,
        |  rec.recent_max_us, rec.recent_min_us, tots.n_types,
        |  tots.n_total
        |FROM nb JOIN rec ON nb.user_id = rec.user_id
        |JOIN tots ON nb.user_id = tots.user_id
        |ORDER BY nb.user_id""".stripMargin,

    "q_stream_late_data" ->
      """WITH e AS (SELECT epoch_us(ts) AS us FROM events),
        |m AS (SELECT min(us) AS mn, max(us) AS mx FROM e),
        |t AS (SELECT (mn + mx) // 2 AS t0 FROM m),
        |a AS (SELECT us FROM e, t WHERE us >= t0),
        |b AS (SELECT us FROM e, t WHERE us < t0),
        |w AS (SELECT (max(us) // 1000) - 18*24*3600*1000 AS wm_ms
        |  FROM a),
        |dr AS (SELECT CAST(count(*) AS BIGINT) AS n_dropped
        |  FROM b, w WHERE us // 1000 < wm_ms)
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM a) AS n_on_time,
        |  (SELECT CAST(count(*) AS BIGINT) FROM b) AS n_late,
        |  n_dropped,
        |  CAST((SELECT count(*) FROM b) - n_dropped AS BIGINT)
        |    AS n_late_kept,
        |  CAST((SELECT count(*) FROM a) + (SELECT count(*) FROM b)
        |    - n_dropped AS BIGINT) AS n_emitted
        |FROM dr""".stripMargin,

    "q_stream_tumbling" ->
      """SELECT (epoch_us(ts) // 3600000000) * 3600 AS hour_s, event_type,
        |  count(*) AS n, round(sum(value), 2) AS sum_v
        |FROM events GROUP BY 1, 2 ORDER BY hour_s, event_type""".stripMargin,

    "q_stream_sliding" ->
      """SELECT win_s, count(*) AS n, round(avg(value), 6) AS avg_v
        |FROM (SELECT unnest([(epoch_us(ts) // 1800000000) * 1800,
        |                     (epoch_us(ts) // 1800000000) * 1800 - 1800])
        |        AS win_s, value
        |      FROM events) t
        |GROUP BY win_s ORDER BY win_s""".stripMargin,

    // Grouped by the dedup key so the oracle stays correct if a corpus
    // regeneration ever emits duplicate event_ids (StreamingSpec pins the
    // uniqueness precondition and fails loudly first if payloads could
    // diverge; under that precondition min() over one row is identity).
    "q_stream_dedup" ->
      """SELECT event_id, min(user_id) AS user_id,
        |  min(event_type) AS event_type, min(epoch_us(ts)) AS ts_us
        |FROM events GROUP BY event_id ORDER BY event_id""".stripMargin,

    "q_stream_update" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_v
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_stream_session" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us, value,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
        |      (PARTITION BY user_id ORDER BY epoch_us(ts))
        |      >= 1800000000 THEN 1
        |      WHEN lag(epoch_us(ts)) OVER
        |      (PARTITION BY user_id ORDER BY epoch_us(ts)) IS NULL THEN 1
        |      ELSE 0 END AS new_session
        |  FROM events),
        |sess AS (
        |  SELECT user_id, us, value,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY us
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM e)
        |SELECT user_id, min(us) AS session_start_us,
        |  count(*) AS n_events, round(sum(value), 2) AS sum_v
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, session_start_us""".stripMargin,

    "q_stream_static_join" ->
      """SELECT event_id, user_id, c_mktsegment, value
        |FROM events JOIN customer ON user_id = c_custkey
        |ORDER BY event_id""".stripMargin,

    "q_stream_anti_join" ->
      """SELECT event_type, count(*) AS n_fresh,
        |  min(user_id) AS min_user, max(user_id) AS max_user
        |FROM events e
        |WHERE NOT EXISTS (SELECT 1 FROM customer c
        |                  WHERE c.c_custkey % 10 = 0
        |                    AND c.c_custkey = e.user_id)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_stream_stream_join" ->
      """SELECT a.event_id AS click_id, b.event_id AS view_id, a.user_id,
        |  epoch_us(a.ts) AS click_us, epoch_us(b.ts) AS view_us
        |FROM events a JOIN events b ON a.user_id = b.user_id
        |WHERE a.event_type = 'click' AND b.event_type = 'view'
        |  AND epoch_us(b.ts) >= epoch_us(a.ts)
        |  AND epoch_us(b.ts) <= epoch_us(a.ts) + 1800000000
        |ORDER BY click_id, view_id""".stripMargin,

    // matched-only semantics: the batch EXISTS under the same interval
    "q_stream_semi_join" ->
      """SELECT a.event_id AS click_id, a.user_id,
        |  epoch_us(a.ts) AS click_us
        |FROM events a
        |WHERE a.event_type = 'click'
        |  AND EXISTS (SELECT 1 FROM events b
        |    WHERE b.event_type = 'view' AND b.user_id = a.user_id
        |      AND epoch_us(b.ts) >= epoch_us(a.ts)
        |      AND epoch_us(b.ts) <= epoch_us(a.ts) + 1800000000)
        |ORDER BY click_id""".stripMargin,

    // the batch argmax under the (ts, event_id, type, vq) struct order
    "q_stream_upsert" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |    event_type,
        |    CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS vq
        |  FROM events),
        |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts_us DESC, event_id DESC, event_type DESC,
        |             vq DESC) AS rk,
        |    count(*) OVER (PARTITION BY user_id) AS n_events
        |  FROM e)
        |SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
        |  ts_us AS last_ts_us, event_id AS last_event_id,
        |  event_type AS last_type,
        |  CAST(vq AS DOUBLE) / 1000.0 AS last_value
        |FROM r WHERE rk = 1 ORDER BY user_id""".stripMargin,

    // the state store's content IS the aggregation result, so the
    // oracle is the plain batch aggregate
    "q_state_reader" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_v
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,

    // same watermark-completeness bound as the stream side (results are
    // complete only up to max(ts) - window - delay - margin); nullable
    // view_id sorts via coalesce (engines disagree on NULL ordering)
    "q_stream_outer_join" ->
      """SELECT a.event_id AS click_id, b.event_id AS view_id, a.user_id,
        |  epoch_us(a.ts) AS click_us, epoch_us(b.ts) AS view_us
        |FROM events a LEFT JOIN events b ON a.user_id = b.user_id
        |  AND b.event_type = 'view'
        |  AND epoch_us(b.ts) >= epoch_us(a.ts)
        |  AND epoch_us(b.ts) <= epoch_us(a.ts) + 1800000000
        |WHERE a.event_type = 'click'
        |  AND epoch_us(a.ts) <= (SELECT least(
        |      max(CASE WHEN event_type = 'click'
        |          THEN epoch_us(ts) // 1000 END),
        |      max(CASE WHEN event_type = 'view'
        |          THEN epoch_us(ts) // 1000 END)) FROM events)
        |    * 1000 - 600000000 - 1800000000 - 60000000
        |ORDER BY click_id, coalesce(view_id, -1)""".stripMargin,

    // the bound predicate applies OVER the full join (see query comment);
    // wm = min-side ms-floored max ts minus the 10 min delay
    "q_stream_full_outer" ->
      """WITH c AS (SELECT event_id AS click_id, user_id AS cu,
        |    epoch_us(ts) AS click_us FROM events
        |  WHERE event_type = 'click'),
        |v AS (SELECT event_id AS view_id, user_id AS vu,
        |    epoch_us(ts) AS view_us FROM events
        |  WHERE event_type = 'view'),
        |wm AS (SELECT (SELECT least(
        |      max(CASE WHEN event_type = 'click'
        |          THEN epoch_us(ts) // 1000 END),
        |      max(CASE WHEN event_type = 'view'
        |          THEN epoch_us(ts) // 1000 END)) FROM events)
        |    * 1000 - 600000000 AS w),
        |j AS (SELECT click_id, view_id, coalesce(cu, vu) AS user_id,
        |    click_us, view_us
        |  FROM c FULL JOIN v ON cu = vu
        |    AND view_us >= click_us
        |    AND view_us <= click_us + 1800000000)
        |SELECT click_id, view_id, user_id, click_us, view_us
        |FROM j, wm
        |WHERE (click_id IS NOT NULL
        |       AND click_us <= w - 1800000000 - 60000000)
        |   OR (click_id IS NULL AND view_us <= w - 60000000)
        |ORDER BY coalesce(click_id, -1), coalesce(view_id, -1)""".stripMargin,

    "q_stream_stateful" ->
      """SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS sum_v
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_stream_transform" ->
      """SELECT user_id, count(*) AS n_events, round(max(value), 2) AS max_v
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_stream_foreachbatch" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_v
        |FROM events WHERE value > 0
        |GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
