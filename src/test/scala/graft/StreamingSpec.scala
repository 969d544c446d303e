package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamRunner

/** Structured Streaming semantics the batch oracle cannot check:
  * watermark-driven late-data drop and append-mode window finalization,
  * driven batch-by-batch through a MemoryStream. Plus bounded-run parity
  * between the streaming pack and its batch twin on the corpus.
  */
class StreamingSpec extends AnyFunSuite {
  import SparkFixture.{spark, sfDir}
  import spark.implicits._

  test("watermark drops late rows; append emits finalized windows only") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Long] // epoch seconds
    val agg = input.toDF()
      .select(timestamp_seconds($"value").as("ts"))
      .withWatermark("ts", "10 seconds")
      .groupBy(window($"ts", "10 seconds").as("w"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("g_late_drop")
      .outputMode("append").start()
    try {
      // batch 1: events at 5s and 15s -> watermark advances to 15-10=5
      input.addData(5L, 15L)
      q.processAllAvailable()
      // batch 2: event at 100s -> watermark advances to 90;
      // processAllAvailable includes the watermark-commit batch, so
      // windows [0,10) and [10,20) finalize and emit here.
      input.addData(100L)
      q.processAllAvailable()
      val mid = spark.table("g_late_drop")
        .select(unix_timestamp($"w.start").as("s"), $"n")
        .as[(Long, Long)].collect().toMap
      assert(mid == Map(0L -> 1L, 10L -> 1L), s"unexpected: $mid")
      // batch 3: 1s is LATE (behind watermark 90) -> dropped; its window
      // is already finalized and must NOT re-emit or change. 120s pushes
      // the watermark to 110, finalizing [100,110).
      input.addData(1L, 120L)
      q.processAllAvailable()
      val out = spark.table("g_late_drop")
        .select(unix_timestamp($"w.start").as("s"), $"n")
        .as[(Long, Long)].collect().toMap
      assert(out == Map(0L -> 1L, 10L -> 1L, 100L -> 1L),
        s"late row leaked or window re-emitted: $out")
    } finally q.stop()
  }

  test("bounded streaming run matches the batch twin on the corpus") {
    val streamed = SparkEntry.queries("q_stream_tumbling")(spark, sfDir)
    val batch = SparkEntry.queries("q_tumbling_window")(spark, sfDir)
    // identical column semantics: hour_s/event_type/n/sum_v
    assert(streamed.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed).isEmpty)
  }

  test("q_stream_drift counts match a driver-side batch replay") {
    val out = SparkEntry.queries("q_stream_drift")(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3))))
    val e = graft.engine.Tables.eventsWithTime(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("ts_us"),
        org.apache.spark.sql.functions.col("value"))
      .collect().map(r => (r.getLong(0),
        math.floor(r.getDouble(1) * 1000.0 + 0.5).toLong))
    val mid = (e.map(_._1).min + e.map(_._1).max) / 2
    val ref = e.filter(_._1 < mid).map(_._2).sorted
    val edges = (1 to 9).map { i =>
      ref(((i.toLong * ref.length + 9) / 10).toInt - 1)
    }
    def bin(v: Long): Long = edges.count(_ <= v).toLong
    val counts = e.groupBy(x => ((x._1 / 21600000000L) * 21600, bin(x._2)))
      .map { case (k, xs) => k -> xs.length.toLong }
    val wins = e.map(x => (x._1 / 21600000000L) * 21600).distinct
    assert(out.length == wins.length * 10, "full windows x bins grid")
    out.foreach { case ((w, b), (n, psi)) =>
      assert(n == counts.getOrElse((w, b), 0L), s"window $w bin $b")
      assert(!psi.isNaN && !psi.isInfinite)
    }
    // per-window totals account for every event
    assert(out.map(_._2._1).sum == e.length.toLong)
  }

  test("q_stream_dedup oracle precondition: event_id is unique") {
    // dropDuplicatesWithinWatermark keeps an arbitrary row per event_id,
    // so the plain SELECT-FROM-events oracle is only deterministic when
    // event_ids never repeat; pin that assumption here.
    val ev = graft.engine.Tables.events(spark, sfDir)
    val (n, d) = ev.agg(count(lit(1)), countDistinct($"event_id"))
      .as[(Long, Long)].collect().head
    assert(n == d, s"duplicate event_ids: $n rows, $d distinct")
  }

  test("streaming source exposes event-time columns") {
    val st = StreamRunner.eventsStream(spark, sfDir)
    assert(st.isStreaming)
    assert(Seq("ts_us", "ts_t").forall(st.columns.contains))
  }

  test("full-outer join restricted to matched-or-null clicks equals the left-outer query") {
    // the two declared subsets use the same click bound, so the full
    // outer's click-side rows must be EXACTLY the left-outer result —
    // pins that the extra view-null rows never perturb the click side
    val fo = SparkEntry.queries("q_stream_full_outer")(spark, sfDir)
      .filter($"click_id".isNotNull)
      .select($"click_id", $"view_id", $"user_id", $"click_us", $"view_us")
    val lo = SparkEntry.queries("q_stream_outer_join")(spark, sfDir)
      .select($"click_id", $"view_id", $"user_id", $"click_us", $"view_us")
    assert(fo.exceptAll(lo).isEmpty && lo.exceptAll(fo).isEmpty)
  }

  test("final watermark from progress metadata equals min-side max(ts,ms) - delay") {
    // q_stream_outer_join derives its completeness bound from the run's
    // own lastProgress watermark — pin that the metadata value is exactly
    // the formula the DuckDB oracle computes from the data (ms-floored
    // per-side max, min across sides, minus the 10 min delay), so the
    // bound needs no extra pre-pass scan of events.parquet.
    val clicks = StreamRunner.eventsStream(spark, sfDir)
      .filter($"event_type" === "click")
      .select($"user_id", $"ts_t".as("click_t"))
      .withWatermark("click_t", "10 minutes")
    val views = StreamRunner.eventsStream(spark, sfDir)
      .filter($"event_type" === "view")
      .select($"user_id".as("vu"), $"ts_t".as("view_t"))
      .withWatermark("view_t", "10 minutes")
    val joined = clicks.join(views,
      $"user_id" === $"vu" && $"view_t" >= $"click_t" &&
        $"view_t" <= $"click_t" + expr("INTERVAL 30 MINUTES"),
      "left_outer")
    val (_, wm) = StreamRunner.runToTableWithWatermark(
      spark, joined, "g_wm_probe", "append")
    val expected = graft.engine.Tables.eventsWithTime(spark, sfDir)
      .agg(least(
        max(when($"event_type" === "click", expr("ts_us div 1000"))),
        max(when($"event_type" === "view", expr("ts_us div 1000")))))
      .as[Long].collect().head * 1000L - 600000000L
    assert(wm.contains(expected),
      s"watermark $wm != data-derived $expected")
  }
}
