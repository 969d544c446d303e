package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row
import graft.engine.Tables

/** Bounded-run harness for Structured Streaming queries (SURVEY.md §2.2
  * "Streaming"): a file source over the `events` parquet, a caller-supplied
  * stream transform, and a memory sink drained with `Trigger.AvailableNow`
  * so the result comes back as a plain DataFrame the correctness gate can
  * hash against a DuckDB oracle.
  *
  * Scale notes (100 TB):
  *  - The SAME transform runs unmodified against an unbounded source
  *    (kafka/files) with a durable sink — `Trigger.AvailableNow` + memory
  *    sink are only the bounded test harness; nothing in the query logic
  *    assumes boundedness.
  *  - State (windows, dedup keys, per-key state) is bounded by watermarks,
  *    so executor state stores don't grow without limit on a real stream.
  *  - The memory sink materializes on the driver — test-only; production
  *    sinks (parquet/kafka) stream through executors.
  */
object StreamRunner {

  // Fresh tmpfs-backed checkpoint per bounded run (r16 streaming-floor
  // work): with no explicit checkpointLocation Spark creates the temp
  // checkpoint under java.io.tmpdir — ext4 on this box — and every
  // micro-batch then pays disk-journal costs for the offset-log/
  // commit-log WRITE+RENAME pair plus one state delta file per store
  // partition. The logs are by construction throwaway for a bounded
  // test run (the stream drains and the query object is dropped), so
  // memory-backed scratch changes nothing semantically; production
  // checkpoints live on durable storage BY DESIGN and are not what the
  // bench should measure. MUST be unique per run: a reused checkpoint
  // resumes (offsets committed → zero-row batches → an empty memory
  // sink). Same base-dir policy as SourceQueries.scratch.
  private val ckptCounter = new java.util.concurrent.atomic.AtomicLong(0L)
  private val ckptCleanup =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private def freshCheckpoint(spark: SparkSession): String = {
    val base = sys.env.get("SPARK_GRAFT_SCRATCH").getOrElse {
      if (new java.io.File("/dev/shm").isDirectory) "/dev/shm" else "/tmp"
    }
    val root = s"$base/graft_ckpt/${spark.sparkContext.applicationId}"
    if (ckptCleanup.add(root)) {
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def del(f: java.io.File): Unit = {
          val cs = f.listFiles(); if (cs != null) cs.foreach(del)
          f.delete(); ()
        }
        del(new java.io.File(root))
      }))
    }
    s"$root/c${ckptCounter.incrementAndGet()}"
  }

  /** Drain `stream` into a DSv2 catalog table via the table's
    * STREAMING_WRITE path (writeStream.toTable), bounded with
    * Trigger.AvailableNow and a fresh throwaway checkpoint. Used by the
    * workspace streaming-sink operator; the table's own commit machinery
    * (content-addressed versions) is the durable half. */
  def runToCatalogTable(spark: SparkSession, stream: DataFrame,
                        tableName: String): Unit = {
    val q = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", freshCheckpoint(spark))
      .toTable(tableName)
    try {
      if (!q.awaitTermination(180000)) q.stop()
    } finally {
      if (q.isActive) q.stop()
    }
  }

  /** Streaming view of `events` with `ts_t` (TIMESTAMP, UTC) event time.
    * Time derivation is delegated to Tables.withEventTime, which adapts to
    * how the corpus stores `ts` (bigint ns or native timestamp[us]).
    */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    Tables.ensureConf(spark)
    // Streaming sources need an explicit schema; take it from the batch
    // reader (driver-side footer read, no data scan).
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    spark.readStream
      .schema(schema)
      // Single input file -> exactly one micro-batch under AvailableNow,
      // which makes append-mode stateful output deterministic in tests.
      .option("maxFilesPerTrigger", "1000000")
      // The file stream source wants a directory; select just the events
      // file out of the corpus dir.
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .transform(graft.engine.Tables.withEventTime)
  }

  /** Run `stream` to a memory sink until all available data is processed,
    * then return the sink contents as a batch DataFrame.
    */
  def runToTable(spark: SparkSession, stream: DataFrame, name: String,
                 mode: String): DataFrame =
    runToTableWithWatermark(spark, stream, name, mode)._1

  /** Three-micro-batch late-arrival fixture (q_stream_late_data): the
    * events table split at the midpoint timestamp T0 = (min+max)/2 µs
    * into an ON-TIME file (ts ≥ T0, first micro-batch), a 1-row MARKER
    * file (the max-ts event again — exists only to advance a batch:
    * Spark applies the watermark to LATE-ROW FILTERING one batch after
    * it is computed, so the drop must happen two batches after the
    * on-time data; the duplicate row itself dedupes away), and a LATE
    * file (ts < T0 — data older than everything already processed, the
    * production late-arrival shape). File order is pinned by explicit
    * modTimes (the file source schedules oldest-modTime first);
    * maxFilesPerTrigger is set by the caller's readStream. Memoized per
    * corpus dir — the split is deterministic, so rebuilding it per call
    * would only add write traffic. */
  private val lateFixtures =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  def lateFixtureDir(spark: SparkSession, dir: String): String =
    lateFixtures.computeIfAbsent(dir, { _ =>
      Tables.ensureConf(spark)
      val ev = spark.read.parquet(s"$dir/events.parquet")
      val evT = Tables.withEventTime(ev)
      val mm = evT.agg(min(col("ts_us")).as("mn"),
        max(col("ts_us")).as("mx")).head()
      val t0 = (mm.getLong(0) + mm.getLong(1)) / 2
      val root = java.nio.file.Files
        .createTempDirectory("graft_late_fixture").toFile
      root.deleteOnExit()
      def writeOne(df: DataFrame, fname: String, modTime: Long): Unit = {
        val stage = new java.io.File(root, s"_stage_$fname")
        df.coalesce(1).write.parquet(stage.toString)
        val part = stage.listFiles()
          .find(f => f.getName.startsWith("part-") &&
            f.getName.endsWith(".parquet")).get
        val dest = new java.io.File(root, fname)
        java.nio.file.Files.move(part.toPath, dest.toPath)
        // the file order IS the fixture: the source schedules
        // oldest-modTime first, so a silently failed pin would feed the
        // late file in the wrong batch and test nothing — fail loudly
        if (!dest.setLastModified(modTime))
          throw new java.io.IOException(
            s"lateFixtureDir: could not pin modTime on $dest")
        // deleteOnExit on the root alone cannot remove a non-empty
        // directory — register the contents too (reverse order: files
        // are deleted before their parent on JVM exit)
        dest.deleteOnExit()
        stage.listFiles().foreach(_.delete()); stage.delete(); ()
      }
      val base = System.currentTimeMillis() - 3600000L
      val orig = ev.columns.map(col)
      writeOne(evT.filter(col("ts_us") >= t0).select(orig: _*),
        "a_ontime.parquet", base)
      writeOne(evT.filter(col("ts_us") === mm.getLong(1))
        .select(orig: _*), "m_marker.parquet", base + 30000L)
      writeOne(evT.filter(col("ts_us") < t0).select(orig: _*),
        "b_late.parquet", base + 60000L)
      root.toString
    })

  /** Bounded run for PROCESSING-TIME-mode stateful queries
    * (transformWithState with TimeMode.ProcessingTime — the mode state
    * TTL requires): under processing-time mode the engine ALWAYS
    * schedules another micro-batch to advance the clock for timers/TTL
    * (`shouldRunAnotherBatch` is unconditionally true), so BOTH
    * `Trigger.AvailableNow` and `processAllAvailable()` spin forever
    * (measured: 330 empty epochs in 2 minutes on a 3-file source; the
    * drain flag never sets because the clock offset always advances).
    * This runner instead counts COMMITTED input rows through a
    * progress listener — onQueryProgress fires after each batch's sink
    * commit, with no eviction (unlike the bounded `recentProgress`
    * buffer) — and stops the query once `expectedRows` have landed.
    * The extra empty batches the clock mode runs are harmless: no input
    * keys → no emissions → the sink is a pure function of the data
    * batches. */
  def runToTableUntilInput(spark: SparkSession, stream: DataFrame,
                           name: String, mode: String,
                           expectedRows: Long): DataFrame = {
    import org.apache.spark.sql.streaming.StreamingQueryListener
    val conf = spark.conf
    val prev = conf.get("spark.sql.shuffle.partitions")
    conf.set("spark.sql.shuffle.partitions",
      sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTS", "4"))
    val seen = new java.util.concurrent.atomic.AtomicLong(0L)
    val done = new java.util.concurrent.CountDownLatch(1)
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit =
        // match on the (run-unique) sink name: the query's runId is not
        // yet visible to this callback if the first batch outraces start()
        if (e.progress.name == name &&
            seen.addAndGet(e.progress.numInputRows) >= expectedRows)
          done.countDown()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    try {
      val q = stream.writeStream
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", freshCheckpoint(spark))
        .outputMode(mode)
        .start()
      try {
        if (!done.await(180, java.util.concurrent.TimeUnit.SECONDS))
          throw new IllegalStateException(
            s"runToTableUntilInput($name): only ${seen.get()} of " +
            s"$expectedRows input rows committed within 180s")
      } finally q.stop()
    } finally {
      spark.streams.removeListener(listener)
      conf.set("spark.sql.shuffle.partitions", prev)
    }
    spark.table(name)
  }

  /** [[runToTableWithWatermark]] plus the total input rows DROPPED by the
    * watermark across all micro-batches (the per-batch
    * `stateOperators.numRowsDroppedByWatermark` metric summed) — the
    * late-data accounting a production stream alerts on. */
  def runToTableWithDropped(
      spark: SparkSession, stream: DataFrame, name: String,
      mode: String): (DataFrame, Long) = {
    val conf = spark.conf
    val prev = conf.get("spark.sql.shuffle.partitions")
    conf.set("spark.sql.shuffle.partitions",
      sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTS", "4"))
    val dropped = try {
      val q = stream.writeStream
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", freshCheckpoint(spark))
        .outputMode(mode)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      q.recentProgress.toSeq
        .flatMap(p => Option(p.stateOperators).toSeq.flatMap(_.toSeq))
        .map(_.numRowsDroppedByWatermark)
        .sum
    } finally conf.set("spark.sql.shuffle.partitions", prev)
    (spark.table(name), dropped)
  }

  /** [[runToTable]] plus the run's FINAL event-time watermark in epoch
    * micros (None when the query has no watermark or saw no data).
    *
    * This is the stream's own completeness certificate: results are
    * complete up to the watermark, so a query that must declare a
    * deterministic watermark-complete subset (q_stream_outer_join) reads
    * the bound from the progress metadata the run already produced — no
    * extra pre-pass over the source. Spark tracks event-time stats in
    * MILLISECONDS (EventTimeWatermarkExec divides the micros timestamp
    * by 1000), so the returned value is always ms-aligned; an oracle
    * reproducing it must floor its max-timestamps to ms before
    * subtracting the delay.
    */
  def runToTableWithWatermark(
      spark: SparkSession, stream: DataFrame, name: String,
      mode: String): (DataFrame, Option[Long]) = {
    // Stateful operators allocate one state-store instance per shuffle
    // partition and pay a commit per partition per micro-batch; at the
    // test corpus size that fixed cost dominates, so pin a small state
    // parallelism for the bounded run (a production deployment sizes
    // this to the key cardinality). The conf is a plan-time setting —
    // restore it after the query drains so batch queries are unaffected.
    val conf = spark.conf
    val prev = conf.get("spark.sql.shuffle.partitions")
    // SPARK_GRAFT_STREAM_PARTS is the documented floor knob (r13 floor
    // analysis, PERF.md "Streaming floor"): each stateful operator pays
    // one state-store instance + commit per partition per micro-batch,
    // so the bounded-run fixed cost is ~linear in this number. Measured
    // at sf0.1 on the interval-join family (warm): parts=4 → 3.07/4.21/
    // 2.47 s, parts=8 → 3.67/4.74/2.87, parts=16 → 4.27/5.47/3.97 —
    // the floor IS the per-partition store machinery, so the bounded
    // harness defaults to the measured optimum (4); a production
    // deployment sizes this to key cardinality instead. RocksDB was
    // also measured (parts=4: 5.63/6.08/4.99 warm — 1.8× slower at this
    // scale; native store init + changelog upload dominate) — the
    // default in-memory HDFS-backed provider stays.
    conf.set("spark.sql.shuffle.partitions",
      sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTS", "4"))
    val wm = try {
      val q = stream.writeStream
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", freshCheckpoint(spark))
        .outputMode(mode)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // max over all progress events: the final no-data batch carries the
      // fully-advanced watermark, but scanning recentProgress is robust
      // to which entry is last
      q.recentProgress.toSeq
        .flatMap(p => Option(p.eventTime).flatMap(e =>
          Option(e.get("watermark"))))
        .map { s =>
          val i = java.time.Instant.parse(s)
          i.getEpochSecond * 1000000L + i.getNano / 1000L
        }
        .reduceOption(_ max _)
        .filter(_ > 0L)
    } finally conf.set("spark.sql.shuffle.partitions", prev)
    (spark.table(name), wm)
  }
}
