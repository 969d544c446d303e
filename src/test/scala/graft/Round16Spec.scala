package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-16 replays: the ListState/MapState transformWithState operator
  * (VERDICT r15 item 6) recomputed from the batch corpus. */
class Round16Spec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sfDir = SparkFixture.sfDir

  test("INSERT INTO / INSERT OVERWRITE commit NEW versions; priors stay readable") {
    val store = graft.operators.WorkspaceQueries.fixture()
    spark.conf.set("spark.sql.catalog.wst",
      classOf[graft.sources.WorkspaceCatalog].getName)
    spark.conf.set("spark.sql.catalog.wst.root", store.mountPath.toString)
    val preLatest = store.resolve("demo", "latest").toOption.get
    spark.sql("INSERT INTO wst.demo.`data.csv` VALUES ('9', '90')")
    val postLatest = store.resolve("demo", "latest").toOption.get
    assert(postLatest != preLatest,
      "INSERT must land as a NEW content-addressed version")
    // the pre-insert version is still readable byte-for-byte by id
    val preRows = spark.sql(
      s"SELECT k, v FROM wst.demo.`data.csv` VERSION AS OF '$preLatest'")
      .collect().map(r => (r.getString(0), r.getString(1))).sorted
    assert(preRows.toSeq == Seq(("1", "10"), ("2", "20"), ("3", "30")))
    val postRows = spark.sql("SELECT k, v FROM wst.demo.`data.csv`")
      .collect().map(r => (r.getString(0), r.getString(1))).sorted
    assert(postRows.toSeq ==
      Seq(("1", "10"), ("2", "20"), ("3", "30"), ("9", "90")))
    // overwrite: post-image is ONLY the new rows, and the insert version
    // remains pinned
    spark.sql("INSERT OVERWRITE wst.demo.`data.csv` VALUES ('5', '50')")
    val owRows = spark.sql("SELECT k, v FROM wst.demo.`data.csv`")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(owRows.toSeq == Seq(("5", "50")))
    val midRows = spark.sql(
      s"SELECT k, v FROM wst.demo.`data.csv` VERSION AS OF '$postLatest'")
      .collect().map(r => (r.getString(0), r.getString(1))).sorted
    assert(midRows.toSeq ==
      Seq(("1", "10"), ("2", "20"), ("3", "30"), ("9", "90")))
    // content-addressing determinism: re-running the same overwrite on
    // the same base yields the same post-image CONTENT (byte-identical
    // file), whatever id the store assigns
    spark.sql("INSERT OVERWRITE wst.demo.`data.csv` VALUES ('5', '50')")
    val ow2 = spark.sql("SELECT k, v FROM wst.demo.`data.csv`")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(ow2.toSeq == Seq(("5", "50")))
  }

  test("UPDATE / DELETE rewrite through ReplaceData as NEW versions; priors stay readable") {
    val store = graft.operators.WorkspaceQueries.fixture()
    spark.conf.set("spark.sql.catalog.wsrl",
      classOf[graft.sources.WorkspaceCatalog].getName)
    spark.conf.set("spark.sql.catalog.wsrl.root", store.mountPath.toString)
    val preLatest = store.resolve("demo", "latest").toOption.get
    // UPDATE: matched rows take the SET expression, unmatched carry over
    spark.sql(
      """UPDATE wsrl.demo.`data.csv`
        |SET v = CAST(CAST(v AS INT) + 7 AS STRING)
        |WHERE CAST(k AS INT) >= 2""".stripMargin)
    val postUpdate = store.resolve("demo", "latest").toOption.get
    assert(postUpdate != preLatest,
      "UPDATE must land as a NEW content-addressed version")
    val updRows = spark.sql("SELECT k, v FROM wsrl.demo.`data.csv`")
      .collect().map(r => (r.getString(0), r.getString(1))).sorted
    assert(updRows.toSeq == Seq(("1", "10"), ("2", "27"), ("3", "37")))
    // the pre-update image is still readable byte-for-byte by id
    val preRows = spark.sql(
      s"SELECT k, v FROM wsrl.demo.`data.csv` VERSION AS OF '$preLatest'")
      .collect().map(r => (r.getString(0), r.getString(1))).sorted
    assert(preRows.toSeq == Seq(("1", "10"), ("2", "20"), ("3", "30")))
    // DELETE: predicate rows drop, everything else carries over; again a
    // new version with the update image pinned
    spark.sql("DELETE FROM wsrl.demo.`data.csv` WHERE k = '2'")
    val postDelete = store.resolve("demo", "latest").toOption.get
    assert(postDelete != postUpdate,
      "DELETE must land as a NEW content-addressed version")
    val delRows = spark.sql("SELECT k, v FROM wsrl.demo.`data.csv`")
      .collect().map(r => (r.getString(0), r.getString(1))).sorted
    assert(delRows.toSeq == Seq(("1", "10"), ("3", "37")))
    val midRows = spark.sql(
      s"SELECT k, v FROM wsrl.demo.`data.csv` VERSION AS OF '$postUpdate'")
      .collect().map(r => (r.getString(0), r.getString(1))).sorted
    assert(midRows.toSeq == Seq(("1", "10"), ("2", "27"), ("3", "37")))
    // a full-table DELETE is still a valid post-image: zero data rows
    spark.sql("DELETE FROM wsrl.demo.`data.csv` WHERE true")
    assert(spark.sql("SELECT k, v FROM wsrl.demo.`data.csv`").count() == 0L)
  }

  test("@changes stream: one version per micro-batch; checkpoint resume tails new commits") {
    val store = graft.operators.WorkspaceQueries.fixture()
    spark.conf.set("spark.sql.catalog.wscdc",
      classOf[graft.sources.WorkspaceCatalog].getName)
    spark.conf.set("spark.sql.catalog.wscdc.root", store.mountPath.toString)
    spark.sql("INSERT INTO wscdc.demo.`data.csv` VALUES ('7', '70')") // v3
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_cdc_ckpt").toString
    // memory sink refuses checkpoint recovery, and recovery is exactly
    // what the tailing half pins — collect per-batch through foreachBatch
    val seen = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Seq[(Long, String)])]
    def drain(): Unit = {
      val q = spark.readStream.table("wscdc.demo.`data.csv@changes`")
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          val rows = df.collect()
            .map(r => (r.getLong(0), r.getString(2))).toSeq
          seen.synchronized { seen += ((id, rows)); () }
        }
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    // admission control: v1/v2/v3 arrive as THREE data batches, not one
    val run1 = seen.toSeq.filter(_._2.nonEmpty)
    assert(run1.length == 3, s"expected 3 per-version batches, got " +
      seen.map(_._2.length).mkString(","))
    assert(run1.map(_._2.length) == Seq(2, 3, 4)) // v1..v3 row counts
    assert(run1.flatMap(_._2.map(_._1)).distinct.sorted == Seq(1L, 2L, 3L))
    // one seq per batch — the per-version boundary is real
    assert(run1.forall { case (_, rows) => rows.map(_._1).distinct.size == 1 })
    // tail a NEW commit from the same checkpoint: only v4 is emitted
    seen.clear()
    spark.sql("DELETE FROM wscdc.demo.`data.csv` WHERE k = '1'") // v4
    drain()
    val run2 = seen.toSeq.filter(_._2.nonEmpty)
    assert(run2.flatMap(_._2.map(_._1)).distinct == Seq(4L),
      "resume must start past the committed offset")
    assert(run2.flatMap(_._2).map(_._2).sorted == Seq("2", "3", "7"),
      "v4 post-image = {2:20, 3:30, 7:70}")
    // batch shape agrees with the streamed feed on the same store
    val batch = spark.sql(
      "SELECT count(*) FROM wscdc.demo.`data.csv@changes`").head.getLong(0)
    assert(batch == 12L) // 2 + 3 + 4 + 3
  }

  test("graft_topk: bounded-heap edges + partial ObjectHashAggregate plan pin") {
    import org.apache.spark.sql.graft.LongTopKHeap
    // heap unit edges: k > group size, duplicates, negatives, merge
    val h = new LongTopKHeap(5)
    Seq(3L, -7L, 3L, 10L).foreach(h.insert)
    assert(h.sortedDesc.toSeq == Seq(10L, 3L, 3L, -7L))
    val h2 = new LongTopKHeap(5)
    (0L until 100L).foreach(h2.insert)
    h2.mergeFrom(h)
    assert(h2.sortedDesc.toSeq == Seq(99L, 98L, 97L, 96L, 95L))
    // SQL-surface cross-check vs the window formulation on skewed data
    // (one hot group, duplicate values straddling the k boundary)
    graft.engine.Tables.ensureConf(spark)
    spark.range(0, 10000L).selectExpr(
      "id % 7 AS g", "CAST(id % 13 AS BIGINT) AS v")
      .createOrReplaceTempView("topk_in")
    val agg = spark.sql(
      """SELECT g, posexplode(graft_topk(v, 4)) AS (pos, v)
        |FROM topk_in GROUP BY g""".stripMargin)
    val window = spark.sql(
      """SELECT g, CAST(rnk - 1 AS INT) AS pos, v FROM (
        |  SELECT g, v, row_number() OVER (PARTITION BY g
        |      ORDER BY v DESC) AS rnk FROM topk_in)
        |WHERE rnk <= 4""".stripMargin)
    assert(agg.exceptAll(window).isEmpty && window.exceptAll(agg).isEmpty)
    // the scale claim: a PARTIAL ObjectHashAggregate runs before the
    // exchange, so the shuffle carries O(k) buffers, not rows
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(1200))
    assert(plan.contains("partial_graft_topk"),
      "no partial agg phase before the exchange:\n" + plan.take(1200))
  }

  test("graft_jaro_winkler is bit-exact vs DuckDB's jaro_winkler_similarity") {
    import org.apache.spark.sql.graft.NativeExpressions
    import org.apache.spark.unsafe.types.UTF8String
    def jw(a: String, b: String): Double = NativeExpressions.jaroWinkler(
      UTF8String.fromString(a), UTF8String.fromString(b))
    // expected values computed by DuckDB 1.0 jaro_winkler_similarity —
    // the oracle engine — and asserted with == (BIT-exact, no epsilon):
    // the ER argmax orders raw doubles, so any ULP drift is a real bug
    val battery = Seq(
      ("DWAYNE", "DUANE", 0.8400000000000001),
      ("MARTHA", "MARHTA", 0.9611111111111111),
      ("DIXON", "DICKSONX", 0.8133333333333332),
      ("", "abc", 0.0),
      ("", "", 0.0), // DuckDB quirk: empty-vs-empty is 0, not 1
      ("equal", "equal", 1.0),
      ("CRATE", "TRACE", 0.7333333333333334),
      ("ab", "ba", 0.0), // window 0: adjacent swap of a 2-char string
      ("UNITED STATES", "UNITED KINGDOM", 0.6794871794871794),
      ("abcdefgh", "badcfehg", 0.8333333333333334))
    battery.foreach { case (a, b, want) =>
      assert(jw(a, b) == want, s"jw($a, $b) = ${jw(a, b)}, want $want")
    }
    // interpreted eval and codegen agree (the query path runs codegen)
    graft.engine.Tables.ensureConf(spark)
    import spark.implicits._
    val got = battery.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .selectExpr("graft_jaro_winkler(a, b) AS jw").collect().map(_.getDouble(0))
    assert(got.toSeq == battery.map(_._3))
  }

  test("AQE splits a skewed sort-merge-join partition (skew=true plan pin)") {
    // The runtime half of the skew story (q_skew_join is the MANUAL
    // salting path; q_skew_audit the diagnostic): on a 100 TB cluster
    // the first line of defense is AQE's OptimizeSkewedJoin, which
    // splits oversized shuffle partitions at runtime with no plan
    // changes. Pin that the engine's session shape actually engages it:
    // a 90%-hot-key join under test-sized thresholds must finish with
    // `skew=true` stamped on the SMJ node of the FINAL adaptive plan,
    // and the split must not change results.
    val s = spark
    val keys = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.shuffle.partitions")
    val prev = keys.map(k => k -> s.conf.getOption(k)).toMap
    try {
      s.conf.set("spark.sql.adaptive.enabled", "true")
      // force SMJ (broadcast would hide the skew entirely - that IS the
      // other mitigation, but not the one under test)
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      s.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32k")
      s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      val left = s.range(0, 400000L).select(
        when(col("id") % 100 < 90, 0L).otherwise(col("id") % 1000)
          .as("k"),
        col("id").as("payload"))
      val right = s.range(0, 1000L).select(col("id").as("k"),
        (col("id") * 2).as("w"))
      val j = left.join(right, "k")
        .agg(count(lit(1)).as("n"), sum(col("payload") + col("w")).as("s"))
      val row = j.collect().head
      // correctness is conf-independent: every left row matches exactly
      // one right row, so n = |left|
      assert(row.getLong(0) == 400000L)
      val planStr = j.queryExecution.executedPlan.toString
      assert(planStr.contains("skew=true"),
        "final adaptive plan has no skew=true SMJ:\n" + planStr.take(1500))
    } finally prev.foreach { case (k, vOpt) =>
      vOpt.fold(s.conf.unset(k))(v => s.conf.set(k, v))
    }
  }

  test("q_lof matches a brute-force driver-side LOF replay") {
    val got = SparkEntry.queries("q_lof")(spark, sfDir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val pts = graft.engine.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") < 256)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val nrm = pts.map { case (_, v) => math.sqrt(dot(v, v)) }
    val ids = pts.map(_._1)
    val n = pts.length
    def distU(i: Int, j: Int): Long =
      math.floor((1.0 - dot(pts(i)._2, pts(j)._2) / (nrm(i) * nrm(j))) *
        1000000.0).toLong
    // top-5 by (dist_u, id)
    val knn = Array.tabulate(n) { i =>
      (0 until n).filter(_ != i).map(j => (distU(i, j), ids(j), j))
        .sorted.take(5)
    }
    val kdist = knn.map(_.map(_._1).max)
    val s_u = Array.tabulate(n) { i =>
      knn(i).map { case (d, _, j) => math.max(math.max(kdist(j), d), 1L) }.sum
    }
    (0 until n).foreach { i =>
      val recip = knn(i).map(_._3).sortBy(j => ids(j))
        .foldLeft(0.0)((acc, j) => acc + 1.0 / s_u(j).toDouble)
      val lof = math.floor(s_u(i).toDouble * recip / 25.0 * 1000000.0).toLong
      assert(got(ids(i)) == ((s_u(i), lof)), s"id ${ids(i)}")
    }
  }

  test("q_source_modularity matches a driver-side degree-count replay") {
    val got = SparkEntry.queries("q_source_modularity")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    val docs = graft.engine.Tables.documents(spark, sfDir)
    val srcOf = docs.select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = graft.functions.TextDedup.exactJaccardPairs(
        docs.select(col("doc_id"), col("text")), 0.7)
      .select(col("d1"), col("d2")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val m = pairs.length.toLong
    val bySrc = scala.collection.mutable.Map
      .empty[String, (Set[Long], Long, Long)] // nodes, m_s, d_s
    pairs.foreach { case (a, b) =>
      val (sa, sb) = (srcOf(a), srcOf(b))
      val xa = bySrc.getOrElse(sa, (Set.empty[Long], 0L, 0L))
      bySrc(sa) = (xa._1 + a, xa._2 + (if (sa == sb) 1L else 0L), xa._3 + 1L)
      val xb = bySrc.getOrElse(sb, (Set.empty[Long], 0L, 0L))
      bySrc(sb) = (xb._1 + b, xb._2, xb._3 + 1L)
    }
    assert(got.keySet == bySrc.keySet)
    bySrc.foreach { case (src, (nodes, ms, ds)) =>
      assert(got(src) == ((nodes.size.toLong, ms, ds,
        4L * m * ms - ds * ds, 4L * m * m)), src)
    }
    // partition-quality identity: sum of contributions never exceeds q_den
    assert(bySrc.valuesIterator.map { case (_, ms, ds) =>
      BigInt(4L * m * ms) - BigInt(ds) * BigInt(ds)
    }.sum <= BigInt(4L) * BigInt(m) * BigInt(m))
  }

  test("q_seq_mining matches a driver-side trigram replay") {
    val got = SparkEntry.queries("q_seq_mining")(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val ev = graft.engine.Tables.eventsWithTime(spark, sfDir)
      .select(col("user_id"), col("ts_us"), col("event_id"),
        col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val tris = ev.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      val ts = rows.sortBy(r => (r._2, r._3)).map(_._4)
      ts.sliding(3).filter(_.length == 3)
        .map(w => (w.mkString(">"), u)).toSeq
    }
    val expect = tris.groupBy(_._1).map { case (k, xs) =>
      k -> ((xs.length.toLong, xs.map(_._2).distinct.length.toLong))
    }
    assert(got == expect)
  }

  test("q_bradley_terry matches a BigInt MM-round replay") {
    val got = SparkEntry.queries("q_bradley_terry")(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val S = BigInt(1000000000000L)
    val cnts = graft.engine.Tables.events(spark, sfDir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap
    val types = cnts.keysIterator.map(_._2).toSeq.distinct.sorted
    val users = cnts.keysIterator.map(_._1).toSeq.distinct
    // ordered duel tallies (w, n) per (a, b)
    val sym = (for {
      a <- types; b <- types if a != b
    } yield {
      var w = 0L; var nn = 0L
      users.foreach { u =>
        (cnts.get((u, a)), cnts.get((u, b))) match {
          case (Some(ca), Some(cb)) if ca != cb =>
            nn += 1; if (ca > cb) w += 1
          case _ =>
        }
      }
      ((a, b), (w, nn))
    }).filter(_._2._2 > 0).toMap
    val wins = types.map(t => t -> sym.collect {
      case ((a, _), (w, _)) if a == t => w }.sum).toMap
    val comps = types.map(t => t -> sym.collect {
      case ((a, _), (_, nn)) if a == t => nn }.sum).toMap
    var p = types.map(t => t -> S).toMap
    for (_ <- 1 to 3) {
      val d = types.map { t =>
        t -> sym.collect { case ((a, b), (_, nn)) if a == t =>
          (BigInt(nn) * S * S) / (p(t) + p(b))
        }.sum
      }.toMap
      p = types.map { t =>
        t -> ((BigInt(wins(t)) * S * S) / d(t)).max(BigInt(1))
      }.toMap
    }
    val rnk = types.sortBy(t => (-p(t), t)).zipWithIndex
      .map { case (t, i) => t -> (i + 1).toLong }.toMap
    types.foreach { t =>
      assert(got(t) == ((wins(t), comps(t), p(t).toLong, rnk(t))), t)
    }
  }

  test("q_distinct_n and q_self_bleu match a driver-side n-gram replay") {
    val docs = graft.engine.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        split(regexp_replace(lower(trim(col("text"))),
          "[ \\t\\n\\f\\r\\x0B]+", " "), " ").as("ws"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getSeq[String](2).toArray))
    def grams(ws: Array[String], n: Int): Seq[String] =
      if (n == 1) ws.toSeq
      else ws.toSeq.sliding(n).filter(_.length == n).map(_.mkString(" ")).toSeq
    // distinct-n
    val gotD = SparkEntry.queries("q_distinct_n")(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    docs.groupBy(_._2).foreach { case (src, ds) =>
      val u = ds.toSeq.flatMap(d => grams(d._3, 1))
      val b = ds.toSeq.filter(_._3.length >= 2).flatMap(d => grams(d._3, 2))
      val exp = (u.length.toLong, u.distinct.length.toLong,
        b.length.toLong, b.distinct.length.toLong,
        1000000L * u.distinct.length / u.length,
        1000000L * b.distinct.length / b.length)
      assert(gotD(src) == exp, src)
    }
    // self-BLEU: exact clipping from (m1, at1, m2) per gram
    val gotB = SparkEntry.queries("q_self_bleu")(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    val d2 = docs.filter(_._3.length >= 2)
    def prec(n: Int): Map[Long, (Long, Long)] = {
      val byDoc = d2.map(d => d._1 ->
        grams(d._3, n).groupBy(identity).map { case (g, xs) =>
          g -> xs.length.toLong }).toMap
      val gstats = byDoc.values.flatten.groupBy(_._1).map { case (g, cs) =>
        val counts = cs.map(_._2).toSeq.sorted.reverse
        val m1 = counts.head
        val at1 = counts.count(_ == m1).toLong
        val m2 = counts.find(_ < m1).getOrElse(0L)
        g -> ((m1, at1, m2))
      }
      byDoc.map { case (id, cs) =>
        val num = cs.map { case (g, c) =>
          val (m1, at1, m2) = gstats(g)
          math.min(c, if (c == m1 && at1 == 1L) m2 else m1)
        }.sum
        id -> ((num, cs.valuesIterator.sum))
      }
    }
    val (pr1, pr2) = (prec(1), prec(2))
    d2.groupBy(_._2).foreach { case (src, ds) =>
      val rows = ds.toSeq.map { d =>
        val (n1, de1) = pr1(d._1)
        val (n2, de2) = pr2(d._1)
        (1000000L * n1 / de1, 1000000L * n2 / de2,
          math.floor(math.sqrt((n1.toDouble / de1.toDouble) *
            (n2.toDouble / de2.toDouble)) * 1000000.0).toLong)
      }
      val n = rows.length.toLong
      val exp = (n, rows.map(_._1).sum / n, rows.map(_._2).sum / n,
        rows.map(_._3).sum / n)
      assert(gotB(src) == exp, src)
    }
  }

  test("q_stream_list_state: bounded ListState + MapState match a corpus replay") {
    val rows = SparkEntry.queries("q_stream_list_state")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    // replay from the batch corpus, marker row(s) duplicated exactly as
    // the 3-file fixture feeds them
    val ev = graft.engine.Tables.eventsWithTime(spark, sfDir)
      .select(col("user_id"), col("ts_us"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val mn = ev.map(_._2).min
    val mx = ev.map(_._2).max
    val t0 = (mn + mx) / 2
    val marker = ev.filter(_._2 == mx)
    val au = ev ++ marker
    val expect = au.groupBy(_._1).map { case (u, rs) =>
      val orig = ev.filter(_._1 == u)
      val nBatches = (if (orig.exists(_._2 >= t0)) 1 else 0) +
        (if (orig.exists(_._2 == mx)) 1 else 0) +
        (if (orig.exists(_._2 < t0)) 1 else 0)
      val top5 = rs.map(_._2).sorted(Ordering[Long].reverse).take(5)
      (u, (nBatches.toLong, top5.length.toLong, top5.head, top5.last,
        rs.map(_._3).distinct.length.toLong, rs.length.toLong))
    }
    assert(rows.length == expect.size)
    rows.foreach { r =>
      val u = r.getLong(0)
      val (nb, nr, rmx, rmn, nt, ntot) = expect(u)
      assert(r.getLong(1) == nb, s"user $u n_batches")
      assert(r.getLong(2) == nr && nr <= 5L,
        s"user $u n_recent ${r.getLong(2)} (bounded-state pin)")
      assert(r.getLong(3) == rmx, s"user $u recent_max_us")
      assert(r.getLong(4) == rmn, s"user $u recent_min_us (5th-largest ts)")
      assert(r.getLong(5) == nt, s"user $u n_types")
      assert(r.getLong(6) == ntot, s"user $u n_total")
    }
  }

  test("range join plans through GraftRangeJoinExec + BroadcastExchange " +
      "and matches the built-in non-equi join") {
    import org.apache.spark.sql.graft.GraftPlans
    graft.engine.Tables.ensureConf(spark)
    val left = spark.range(0, 10000)
      .select(col("id").as("row_id"),
        ((col("id") * 37 + 11) % 1000).cast("double").as("p"))
    // overlapping AND disjoint intervals, plus a degenerate empty one
    // (lo == hi matches nothing under lo <= p < hi) and a swallowing
    // [0, 1000) interval that matches every row — the prefix-max
    // walk-back must find it from any binary-search position
    val ivs = spark.createDataFrame(Seq(
      (0L, 0.0, 250.0), (1L, 200.0, 450.0), (2L, 400.0, 650.0),
      (3L, 600.0, 850.0), (4L, 800.0, 1000.0), (5L, 300.0, 300.0),
      (6L, 0.0, 1000.0), (7L, 999.0, 2000.0)))
      .toDF("iv_id", "lo", "hi")
    val native = GraftPlans.rangeJoinPoint(left, ivs, left("p"),
      ivs("lo"), ivs("hi"))
    val planStr = native.queryExecution.executedPlan.toString
    assert(planStr.contains("GraftRangeJoin"),
      s"custom exec must plan the node:\n$planStr")
    assert(planStr.contains("BroadcastExchange"),
      s"interval side must ride the standard broadcast exchange:\n$planStr")
    val expected = left.join(ivs,
      left("p") >= ivs("lo") && left("p") < ivs("hi"))
    assert(planStr.indexOf("GraftRangeJoin") >= 0 &&
      !expected.queryExecution.executedPlan.toString.contains("GraftRangeJoin"),
      "the built-in predicate join must NOT be rewritten (strategy only " +
        "fires on the explicit node)")
    val got = native.collect().map(r =>
      (r.getLong(0), r.getLong(2))).sorted.toSeq
    val want = expected.collect().map(r =>
      (r.getLong(0), r.getLong(2))).sorted.toSeq
    assert(got == want, s"native range join diverges: got ${got.length} " +
      s"pairs, want ${want.length}")
    // null point / null bound rows never match (SQL three-valued logic)
    val nullLeft = left.select(col("row_id"),
      when(col("row_id") % 2 === 0, col("p")).otherwise(lit(null)).as("p"))
    val gotNull = GraftPlans.rangeJoinPoint(nullLeft, ivs, nullLeft("p"),
      ivs("lo"), ivs("hi")).collect().map(_.getLong(0))
    assert(gotNull.forall(_ % 2 == 0), "null points must not match")
  }

  test("workspace scan pushdown: predicates, column pruning, and limit " +
      "reach the DSv2 scan; the row-level path stays pushdown-free") {
    import org.apache.spark.sql.execution.FilterExec
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val store = graft.operators.WorkspaceQueries.fixture()
    spark.conf.set("spark.sql.catalog.wpd",
      classOf[graft.sources.WorkspaceCatalog].getName)
    spark.conf.set("spark.sql.catalog.wpd.root", store.mountPath.toString)

    def scanOf(df: org.apache.spark.sql.DataFrame) = {
      val scans = df.queryExecution.executedPlan.collect {
        case b: BatchScanExec => b.scan
      }
      assert(scans.length == 1, s"expected one scan:\n${df.queryExecution}")
      scans.head
    }

    // fully-pushed predicate: no post-scan FilterExec survives, and the
    // projection prunes the read schema to the selected column
    val filtered = spark.sql(
      "SELECT v FROM wpd.demo.`data.csv` WHERE k >= '2'")
    val filterExecs = filtered.queryExecution.executedPlan.collect {
      case f: FilterExec => f
    }
    assert(filterExecs.isEmpty,
      s"predicate must be fully pushed:\n${filtered.queryExecution}")
    scanOf(filtered) match {
      case s: graft.sources.CsvSnapshotScan =>
        assert(s.preds.nonEmpty, "compiled predicates must reach the scan")
        assert(s.required.fieldNames.toSeq == Seq("v"),
          s"read schema must be pruned, got ${s.required.fieldNames.toSeq}")
      case other => fail(s"unexpected scan ${other.getClass}")
    }
    assert(filtered.collect().map(_.getString(0)).sorted.toSeq ==
      Seq("20", "30"))

    // unsupported predicate shape (column-vs-column) is NOT pushed:
    // Spark keeps its Filter and results stay correct
    val unpushed = spark.sql(
      "SELECT k FROM wpd.demo.`data.csv` WHERE k = v")
    assert(unpushed.queryExecution.executedPlan.collect {
      case f: FilterExec => f }.nonEmpty,
      "column-vs-column must stay a post-scan filter")
    assert(unpushed.collect().isEmpty)

    // limit pushdown stops the reader early
    val limited = spark.sql("SELECT k FROM wpd.demo.`data.csv` LIMIT 2")
    scanOf(limited) match {
      case s: graft.sources.CsvSnapshotScan =>
        assert(s.limit == 2, s"limit must be pushed, got ${s.limit}")
      case other => fail(s"unexpected scan ${other.getClass}")
    }
    assert(limited.count() == 2)

    // count(*) prunes to ZERO columns and still counts every row
    val counted = spark.sql("SELECT count(*) AS n FROM wpd.demo.`data.csv`")
    assert(counted.collect().head.getLong(0) == 3L)

    // LIMIT over a pushed aggregate must still be enforced (the scan
    // refuses the limit once an aggregate is pushed)
    val aggLim = spark.sql(
      "SELECT k, count(*) AS n FROM wpd.demo.`data.csv` GROUP BY k LIMIT 2")
    assert(aggLim.collect().length == 2, "limit over pushed agg")

    // the row-level operation path must NOT row-filter its scan: an
    // UPDATE with a selective WHERE keeps the non-matching rows in the
    // rewritten post-image
    spark.sql("UPDATE wpd.demo.`data.csv` SET v = '99' WHERE k = '2'")
    val post = spark.sql("SELECT k, v FROM wpd.demo.`data.csv`")
      .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(post == Seq(("1", "10"), ("2", "99"), ("3", "30")),
      s"non-matching rows must survive the rewrite, got $post")
  }

  test("aggregate pushdown: COUNT/MIN/MAX compute inside the scan, " +
      "HashAggregate disappears, unsupported aggs fall back") {
    val store = graft.operators.WorkspaceQueries.fixture()
    spark.conf.set("spark.sql.catalog.wagg",
      classOf[graft.sources.WorkspaceCatalog].getName)
    spark.conf.set("spark.sql.catalog.wagg.root", store.mountPath.toString)
    // global: plan is Project over the agg scan — no aggregate exec at all
    val g = spark.sql(
      "SELECT count(*) AS n, min(v) AS mn, max(v) AS mx " +
        "FROM wagg.demo.`data.csv`")
    val gPlan = g.queryExecution.executedPlan.toString
    assert(gPlan.contains("CsvSnapshotAggScan") &&
      !gPlan.contains("HashAggregate") && !gPlan.contains("SortAggregate"),
      s"global agg must be fully pushed:\n$gPlan")
    val gr = g.collect().head
    assert((gr.getLong(0), gr.getString(1), gr.getString(2)) ==
      ((3L, "10", "30")))
    // grouped + filtered: predicates and the grouped aggregate both push
    val k = spark.sql(
      "SELECT k, count(*) AS n FROM wagg.demo.`data.csv` " +
        "WHERE v >= '20' GROUP BY k")
    val kPlan = k.queryExecution.executedPlan.toString
    assert(kPlan.contains("CsvSnapshotAggScan") &&
      kPlan.contains("pushedFilters=[v IS NOT NULL, v >= '20']") &&
      !kPlan.contains("HashAggregate"),
      s"grouped agg + filter must push together:\n$kPlan")
    assert(k.collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
      == Seq(("2", 1L), ("3", 1L)))
    // count(DISTINCT) is NOT pushable: the engine keeps its aggregate and
    // the scan falls back to the row form
    val d = spark.sql(
      "SELECT count(DISTINCT v) AS n FROM wagg.demo.`data.csv`")
    assert(d.queryExecution.executedPlan.toString.contains("HashAggregate"),
      "distinct agg must stay in the engine")
    assert(d.collect().head.getLong(0) == 3L)
  }

  test("streaming write: each drained stream commits a new rebased " +
      "version; prior versions stay pinned") {
    val store = graft.operators.WorkspaceQueries.fixture()
    spark.conf.set("spark.sql.catalog.wsw",
      classOf[graft.sources.WorkspaceCatalog].getName)
    spark.conf.set("spark.sql.catalog.wsw.root", store.mountPath.toString)
    val v0 = store.resolve("demo", "latest").toOption.get
    def slice(lo: Long, hi: Long) =
      graft.streaming.StreamRunner.eventsStream(spark, sfDir)
        .filter(col("event_id") >= lo && col("event_id") < hi)
        .filter(col("event_id") % 100 === 0)
        .select(col("event_id").cast("string").as("k"),
          col("event_type").as("v"))
    graft.streaming.StreamRunner
      .runToCatalogTable(spark, slice(0, 300), "wsw.demo.`data.csv`")
    val v1 = store.resolve("demo", "latest").toOption.get
    assert(v1 != v0, "streaming commit must land a NEW version")
    // second stream rebases on v1 — appends accumulate
    graft.streaming.StreamRunner
      .runToCatalogTable(spark, slice(300, 600), "wsw.demo.`data.csv`")
    val v2 = store.resolve("demo", "latest").toOption.get
    assert(v2 != v1)
    val ks = spark.sql("SELECT k FROM wsw.demo.`data.csv`")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(ks == Seq("0", "1", "100", "2", "200", "3", "300", "400", "500"),
      s"both epochs plus seed must be present, got $ks")
    // the pre-stream version is still byte-identical
    val pre = spark.sql(
      s"SELECT k FROM wsw.demo.`data.csv` VERSION AS OF '$v0'")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(pre == Seq("1", "2", "3"), "prior version must stay pinned")
  }

  test("DDL: CREATE TABLE / CTAS / DROP TABLE land as versions; " +
      "priors keep the dropped table") {
    val store = graft.operators.WorkspaceQueries.fixture()
    spark.conf.set("spark.sql.catalog.wdl",
      classOf[graft.sources.WorkspaceCatalog].getName)
    spark.conf.set("spark.sql.catalog.wdl.root", store.mountPath.toString)
    // plain CREATE + INSERT round-trip
    spark.sql("CREATE TABLE wdl.demo.`fresh.csv` (a STRING, b STRING)")
    spark.sql("INSERT INTO wdl.demo.`fresh.csv` VALUES ('x', '1'), ('y', '2')")
    assert(spark.sql("SELECT a, b FROM wdl.demo.`fresh.csv`")
      .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq ==
      Seq(("x", "1"), ("y", "2")))
    // duplicate CREATE is refused
    assertThrows[org.apache.spark.sql.AnalysisException](
      spark.sql("CREATE TABLE wdl.demo.`fresh.csv` (a STRING)").collect())
    // CTAS derives from an existing table
    spark.sql("CREATE TABLE wdl.demo.`twice.csv` AS " +
      "SELECT k, CAST(CAST(v AS INT) * 2 AS STRING) AS v " +
      "FROM wdl.demo.`data.csv`")
    assert(spark.sql("SELECT v FROM wdl.demo.`twice.csv`")
      .collect().map(_.getString(0)).sorted.toSeq == Seq("20", "40", "60"))
    // DROP removes from latest but prior versions still read it
    val preDrop = store.resolve("demo", "latest").toOption.get
    spark.sql("DROP TABLE wdl.demo.`twice.csv`")
    assertThrows[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT v FROM wdl.demo.`twice.csv`").collect())
    assert(spark.sql(
      s"SELECT v FROM wdl.demo.`twice.csv` VERSION AS OF '$preDrop'")
      .collect().map(_.getString(0)).sorted.toSeq == Seq("20", "40", "60"),
      "time travel must still read the dropped table at a pinned version")
    // dropping a missing table reports false (IF EXISTS semantics)
    assert(spark.sql("DROP TABLE IF EXISTS wdl.demo.`never.csv`") != null)
    // the change feed of a CTAS'd table: versions that predate the file
    // contribute no rows, so the feed starts at the creating version
    spark.sql("CREATE TABLE wdl.demo.`feed.csv` AS " +
      "SELECT k, v FROM wdl.demo.`data.csv` WHERE k = '1'")
    // history: creating version is header-only (no rows); only the CTAS
    // append version carries the row — every earlier version contributes
    // nothing
    val feed = spark.sql(
      "SELECT seq, k, v FROM wdl.demo.`feed.csv@changes`").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    assert(feed.length == 1 && (feed.head._2, feed.head._3) == (("1", "10")),
      s"feed must carry only the CTAS append version, got ${feed.toSeq}")
  }

  test("catalog V2 function: content_id resolves through FunctionCatalog " +
      "and matches the store digest convention") {
    val store = graft.operators.WorkspaceQueries.fixture()
    spark.conf.set("spark.sql.catalog.wfn",
      classOf[graft.sources.WorkspaceCatalog].getName)
    spark.conf.set("spark.sql.catalog.wfn.root", store.mountPath.toString)
    val df = spark.sql(
      "SELECT wfn.fn.content_id('10') AS a, wfn.fn.content_id(k) AS b " +
        "FROM wfn.demo.`data.csv` WHERE k = '1'")
    val r = df.collect().head
    // sha256('10') = 4a44dc15364204a8...; first 8 bytes
    assert(r.getString(0) == "4a44dc15364204a8")
    // sha256('1') = 6b86b273ff34fce1...
    assert(r.getString(1) == "6b86b273ff34fce1")
    // SHOW FUNCTIONS surfaces the catalog function listing
    val listed = spark.sql("SHOW FUNCTIONS IN wfn.fn").collect()
      .map(_.getString(0))
    assert(listed.exists(_.endsWith("content_id")), listed.mkString(","))
  }

  test("runtime V2 filtering: the dim side's observed keys prune " +
      "key-group splits before the fact scan reads them") {
    graft.sources.KeyedGenSource.lastRuntimeKeptKeys.set(Array.empty)
    val fact = spark.read
      .format(classOf[graft.sources.KeyedGenSource].getName)
      .option("n", 8000L).option("k", 32).option("mult", 2654435761L)
      .load()
    val dim = spark.range(0, 1000).select(col("id").as("dkey"))
      .filter(col("dkey") % 13 === 3)
    val j = fact.join(dim, col("key") === col("dkey"))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("cs"))
    val rows = j.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    // dkey % 13 == 3 within 0..31 -> {3, 16, 29}: exactly those three
    // key-group splits survive the runtime filter
    val kept = graft.sources.KeyedGenSource.lastRuntimeKeptKeys.get.sorted
    assert(kept.toSeq == Seq(3, 16, 29),
      s"runtime filter must prune to the dim's keys, kept ${kept.toSeq}")
    assert(j.queryExecution.executedPlan.toString
      .contains("dynamicpruningexpression"),
      "plan must carry the dynamic-pruning runtime filter")
    // ground truth with dynamic pruning disabled
    val saved = spark.conf
      .getOption("spark.sql.optimizer.dynamicPartitionPruning.enabled")
    try {
      spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
      val want = fact.join(dim, col("key") === col("dkey"))
        .groupBy(col("key"))
        .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("cs"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
      assert(rows == want, "pruned result must equal the unpruned result")
      assert(rows.map(_._1) == Seq(3L, 16L, 29L) &&
        rows.forall(_._2 == 8000L / 32), "each kept group scans fully")
    } finally saved match {
      case Some(v) => spark.conf
        .set("spark.sql.optimizer.dynamicPartitionPruning.enabled", v)
      case None => spark.conf
        .unset("spark.sql.optimizer.dynamicPartitionPruning.enabled")
    }
  }

  test("storage-partitioned join: key-grouped DSv2 sides join and " +
      "aggregate with zero shuffles, matching the shuffled plan") {
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = confs.map(c => c -> spark.conf.getOption(c))
    try {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      // AQE would convert the tiny build side to a broadcast join, which
      // ALSO has no shuffle — disable it so the pin is unambiguous SPJ
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      def t(n: Long, mult: Long) = spark.read
        .format(classOf[graft.sources.KeyedGenSource].getName)
        .option("n", n).option("k", 8).option("mult", mult).load()
      val a = t(2000L, 2654435761L)
      val b = t(1000L, 40503L).withColumnRenamed("v", "w")
      val agg = a.join(b, "key").groupBy("key")
        .agg(count(lit(1)).as("n_pairs"), sum(col("v") + col("w")).as("cs"))
      val rows = agg.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
      // post-execution plan strings: AQE hides exchanges inside leaf
      // QueryStageExec nodes, so a typed collect() misses them — the
      // final-plan STRING shows every Exchange either way
      val aggStr = agg.queryExecution.executedPlan.toString
      assert(!aggStr.contains("Exchange"),
        s"SPJ must plan without exchanges:\n$aggStr")
      // SupportsReportOrdering: single-key splits are trivially sorted by
      // key, so the SMJ needs no per-partition Sort either — the plan has
      // neither shuffles NOR sorts
      assert(!aggStr.contains("Sort "),
        s"reported ordering must kill the SMJ sorts:\n$aggStr")
      // ground truth from the shuffled plan
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      val base = a.join(b, "key").groupBy("key")
        .agg(count(lit(1)).as("n_pairs"), sum(col("v") + col("w")).as("cs"))
      val want = base.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
      assert(base.queryExecution.executedPlan.toString.contains("Exchange"),
        "control plan should shuffle once bucketing is off")
      assert(rows == want, "SPJ result must equal the shuffled result")
      assert(rows.map(_._2).sum == 2000L / 8 * (1000L / 8) * 8,
        "pair count sanity")
    } finally saved.foreach {
      case (c, Some(v)) => spark.conf.set(c, v)
      case (c, None)    => spark.conf.unset(c)
    }
  }
}
