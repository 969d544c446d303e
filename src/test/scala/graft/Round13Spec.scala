package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 additions. First family: the DSv2 write path — native SQL
  * MERGE INTO / UPDATE / DELETE through the WorkspaceCatalog
  * (SupportsRowLevelOperations, group-based copy-on-write), pinned
  * against the store-level invariants the reference's versioning model
  * promises: every mutation lands as a NEW content-addressed snapshot,
  * `latest` advances, and every previously-pinned version remains
  * byte-identical readable.
  */
class Round13Spec extends AnyFunSuite {
  import SparkFixture.spark

  private def mountCatalog(name: String) = {
    val store = graft.operators.WorkspaceQueries.fixture()
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.sources.WorkspaceCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root",
      store.mountPath.toString)
    store
  }

  private def kv(sql: String): Seq[(String, String)] =
    spark.sql(sql).collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq

  test("native MERGE INTO commits a new snapshot version; old pins intact") {
    val store = mountCatalog("wsm")
    import spark.implicits._
    Seq(("2", "222"), ("9", "90")).toDF("k", "v")
      .createOrReplaceTempView("merge_updates")
    val beforeIds = store.versionIds("demo").toSet
    spark.sql(
      """MERGE INTO wsm.demo.`data.csv` t USING merge_updates s
        |ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)
        |""".stripMargin)
    // merged table state: 2 updated, 9 inserted, 1/3 carried over
    assert(kv("SELECT k, v FROM wsm.demo.`data.csv`") ==
      Seq("1" -> "10", "2" -> "222", "3" -> "30", "9" -> "90"))
    // a new content-addressed version exists and latest moved to it
    val newIds = store.versionIds("demo").toSet -- beforeIds
    assert(newIds.size == 1)
    assert(store.refs("demo")("latest") == newIds.head)
    // prior pins are untouched: stable (v1) and the old latest (v2 id)
    assert(kv("SELECT k, v FROM wsm.demo.`data.csv` VERSION AS OF 'stable'")
      == Seq("1" -> "10", "2" -> "20"))
    assert(kv("SELECT k, v FROM wsm.demo.`data.csv` " +
      "VERSION AS OF 'bbbb2222c0ffee'")
      == Seq("1" -> "10", "2" -> "20", "3" -> "30"))
    // non-table files rode along into the new snapshot (copy-on-write
    // copies the whole tree, one file replaced)
    val snap = store.query("demo", newIds.head, "docs/readme.txt")
    assert(snap.exists {
      case graft.core.Workspace.FileResult(_, c) => c == "version two readme"
      case _ => false
    })
  }

  test("native UPDATE and DELETE ride the same copy-on-write path") {
    val store = mountCatalog("wsu")
    spark.sql("UPDATE wsu.demo.`data.csv` SET v = '77' WHERE k = '1'")
    assert(kv("SELECT k, v FROM wsu.demo.`data.csv`") ==
      Seq("1" -> "77", "2" -> "20", "3" -> "30"))
    spark.sql("DELETE FROM wsu.demo.`data.csv` WHERE k = '2'")
    assert(kv("SELECT k, v FROM wsu.demo.`data.csv`") ==
      Seq("1" -> "77", "3" -> "30"))
    // three versions now: the fixture's two plus one per mutation
    assert(store.versionIds("demo").size == 4)
    assert(kv("SELECT k, v FROM wsu.demo.`data.csv` VERSION AS OF 'stable'")
      == Seq("1" -> "10", "2" -> "20"))
  }

  test("identical logical state commits to the identical version id") {
    // content-addressing: two stores, same mutation → same new id
    val ids = Seq("wsa", "wsb").map { name =>
      val store = mountCatalog(name)
      spark.sql(s"UPDATE $name.demo.`data.csv` SET v = '55' WHERE k = '2'")
      store.refs("demo")("latest")
    }
    assert(ids.distinct.size == 1)
  }

  // ---- r13 operator replays (driver-side recomputation on sf0.001) ------

  private val sfDir = SparkFixture.sfDir
  private def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  private lazy val classifierRows: Array[(Long, Long)] =
    graft.functions.TextDedup.classifierScored(
        graft.engine.Tables.documents(spark, sfDir),
        Seq(col("doc_id"), col("n_chars")))
      .select(col("n_chars"), col("score"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))

  test("q_cohens_kappa replays from the raw classifier frame") {
    // replays the r12 rater convention (a = classifier score > 0,
    // b = length gate) — the one q_mcnemar shares; the r14 cleanup
    // deleted the duplicated r13 variant that had shadowed it
    val a = classifierRows.map { case (_, sc) => if (sc > 0) 1L else 0L }
    val b = classifierRows.map { case (nc, _) => if (nc >= 300) 1L else 0L }
    val n = a.length.toDouble
    val n11 = a.zip(b).count { case (x, y) => x == 1 && y == 1 }
    val n00 = a.zip(b).count { case (x, y) => x == 0 && y == 0 }
    val po = (n11 + n00) / n
    val pa = a.sum / n; val pb = b.sum / n
    val pe = pa * pb + (1 - pa) * (1 - pb)
    val row = SparkEntry.queries("q_cohens_kappa")(spark, sfDir).head()
    assert(row.getAs[Long]("n") == a.length)
    val expect = BigDecimal((po - pe) / (1 - pe))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(row.getAs[Double]("kappa") - expect) < 1e-9)
  }

  test("q_log_loss replays: nano-quantized per-row loss mean") {
    val losses = classifierRows.map { case (nc, sc) =>
      val y = if (nc >= 300) 1.0 else 0.0
      val p = 1.0 / (1.0 + math.exp(-sc.toDouble / 64.0))
      val pc = math.min(math.max(p, 1e-6), 1.0 - 1e-6)
      math.floor(-(y * math.log(pc) + (1.0 - y) * math.log(1.0 - pc))
        * 1e9 + 0.5).toLong
    }
    val row = SparkEntry.queries("q_log_loss")(spark, sfDir).head()
    assert(row.getAs[Double]("log_loss") ==
      q6(losses.map(BigInt(_)).sum.toDouble / losses.length / 1e9))
  }

  test("q_lift_gains replays: band counts, lift, cumulative gains") {
    val banded = classifierRows.map { case (nc, sc) =>
      val p = 1.0 / (1.0 + math.exp(-sc.toDouble / 64.0))
      (math.min(9L, math.floor(p * 10.0).toLong),
        if (nc >= 300) 1L else 0L)
    }
    val byBand = banded.groupBy(_._1).view
      .mapValues(v => (v.length.toLong, v.map(_._2).sum)).toMap
    val nt = banded.length.toDouble
    val post = banded.map(_._2).sum.toDouble
    val got = SparkEntry.queries("q_lift_gains")(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("band"), r)).toMap
    assert(got.keySet == byBand.keySet)
    val bandsDesc = byBand.keys.toSeq.sorted.reverse
    var cumPos = 0L
    bandsDesc.foreach { b =>
      val (nb, posb) = byBand(b)
      cumPos += posb
      val r = got(b)
      assert(r.getAs[Long]("nb") == nb && r.getAs[Long]("posb") == posb)
      assert(r.getAs[Double]("lift") == q6((posb / nb.toDouble) / (post / nt)))
      assert(r.getAs[Double]("cum_gain") == q6(cumPos / post))
    }
  }

  private lazy val eventVq: Array[(String, Long)] =
    graft.engine.Tables.events(spark, sfDir)
      .select(col("event_type"),
        floor(col("value") * lit(1000.0) + lit(0.5)).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))

  test("q_trimmed_mean replays: sort, trim k each side, exact mean") {
    val got = SparkEntry.queries("q_trimmed_mean")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    eventVq.groupBy(_._1).foreach { case (et, rows) =>
      val vs = rows.map(_._2).sorted
      val k = vs.length / 10
      val kept = vs.slice(k, vs.length - k)
      val exp = q6(kept.map(BigInt(_)).sum.toDouble / kept.length / 1000.0)
      val r = got(et)
      assert(r.getAs[Long]("n") == vs.length && r.getAs[Long]("k") == k)
      assert(r.getAs[Double]("trimmed_mean") == exp, s"type $et")
    }
  }

  test("q_peak_days replays: strict local maxima per type") {
    val byDay = graft.engine.Tables.events(spark, sfDir)
      .groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
          .cast("long").as("dd"))
      .agg(count(lit(1)).as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = SparkEntry.queries("q_peak_days")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    byDay.groupBy(_._1).foreach { case (et, rows) =>
      val series = rows.map(t => (t._2, t._3)).sortBy(_._1)
      val peaks = series.indices.drop(1).dropRight(1).filter { i =>
        series(i)._2 > series(i - 1)._2 && series(i)._2 > series(i + 1)._2
      }.map(series)
      if (peaks.isEmpty) assert(!got.contains(et))
      else {
        val r = got(et)
        assert(r.getAs[Long]("n_peaks") == peaks.length)
        val mx = peaks.map(_._2).max
        assert(r.getAs[Long]("peak_value") == mx)
        assert(r.getAs[Long]("peak_day") ==
          peaks.filter(_._2 == mx).map(_._1).min)
      }
    }
  }

  test("q_temperature_mix replays: e^(0.7 ln n) micro weights") {
    val counts = graft.engine.Tables.documents(spark, sfDir)
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val wqu = counts.map { case (s, n) =>
      (s, n, math.floor(math.exp(0.7 * math.log(n.toDouble)) * 1e6 + 0.5)
        .toLong)
    }
    val z = wqu.map(_._3).sum.toDouble
    val nt = counts.map(_._2).sum.toDouble
    val got = SparkEntry.queries("q_temperature_mix")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    wqu.foreach { case (src, n, w) =>
      val r = got(src)
      assert(r.getAs[Double]("temp_share") == q6(w / z))
      assert(r.getAs[Double]("epochs") == q6(w / z * nt / n))
    }
    // temperature flattens: smallest source's share rises vs raw
    val smallest = counts.minBy(_._2)._1
    val r = got(smallest)
    assert(r.getAs[Double]("temp_share") >= r.getAs[Double]("raw_share"))
  }

  test("q_filter_funnel: stages nest (n_out <= n_in, chained)") {
    val rows = SparkEntry.queries("q_filter_funnel")(spark, sfDir)
      .orderBy(col("stage")).collect()
    assert(rows.map(_.getAs[String]("rule")).toSeq ==
      Seq("word_count", "mean_len", "alpha_ratio", "stopwords"))
    rows.foreach(r =>
      assert(r.getAs[Long]("n_out") <= r.getAs[Long]("n_in")))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("n_in") == a.getAs[Long]("n_out")) }
    // stage 1 input is the whole corpus
    assert(rows.head.getAs[Long]("n_in") ==
      graft.engine.Tables.documents(spark, sfDir).count())
  }

  test("q_centroid_drift replays: exact integer component sums") {
    val vecs = graft.engine.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label").cast("long"),
        graft.functions.Vectors.asDouble(col("embedding")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Double](2).toArray))
    val got = SparkEntry.queries("q_centroid_drift")(spark, sfDir)
      .collect().map(r => r.getAs[Long]("label") -> r).toMap
    vecs.groupBy(_._2).foreach { case (label, rows) =>
      val dims = rows.head._3.length
      def sums(par: Long): Array[BigInt] = {
        val s = Array.fill(dims)(BigInt(0))
        rows.filter(v => v._1 % 2 == par).foreach { v =>
          v._3.indices.foreach(i =>
            s(i) += BigInt(math.floor(v._3(i) * 1e6 + 0.5).toLong))
        }
        s
      }
      val (sa, sb) = (sums(0L), sums(1L))
      val dot = sa.zip(sb).map { case (a, b) => a * b }.sum
      val na2 = sa.map(a => a * a).sum
      val nb2 = sb.map(b => b * b).sum
      if (na2 > 0 && nb2 > 0) {
        val exp = q6(dot.toDouble /
          math.sqrt(na2.toDouble * nb2.toDouble))
        assert(got(label).getAs[Double]("centroid_cos") == exp,
          s"label $label")
      }
    }
  }

  test("q_ivf_nprobe_sweep: recall is monotone in nprobe") {
    val rows = SparkEntry.queries("q_ivf_nprobe_sweep")(spark, sfDir)
      .orderBy(col("nprobe")).collect()
    assert(rows.map(_.getAs[Long]("nprobe")).toSeq == Seq(1L, 2L, 3L))
    assert(rows.map(_.getAs[Long]("n_trials")).distinct.length == 1)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("n_hits") >= a.getAs[Long]("n_hits"),
        "widening the probe fan-out must never lose candidates") }
  }

  test("recall CI rows: Wilson interval brackets the point estimate") {
    Seq("q_dedup_recall_ci" -> ("n_true", "n_hit", "recall"),
        "q_ann_recall_ci" -> ("n_trials", "n_hits", "recall5"))
      .foreach { case (qn, (ncol, hcol, pcol)) =>
        val r = SparkEntry.queries(qn)(spark, sfDir).head()
        val n = r.getAs[Long](ncol); val h = r.getAs[Long](hcol)
        assert(h <= n)
        if (n > 0) {
          val p = h.toDouble / n
          val lo = r.getAs[Double]("recall_lo95")
          val hi = r.getAs[Double]("recall_hi95")
          assert(lo <= r.getAs[Double](pcol) + 1e-9 &&
            r.getAs[Double](pcol) <= hi + 1e-9, s"$qn: $lo $p $hi")
          // replay the Wilson bounds exactly
          val z = 1.959964
          val den = 1.0 + z * z / n
          val ctr = (p + z * z / (2.0 * n)) / den
          val hf = z * math.sqrt(p * (1 - p) / n + z * z / (4.0 * n * n)) / den
          assert(lo == q6(ctr - hf) && hi == q6(ctr + hf), qn)
        }
      }
  }

  test("q_parquet_bloom: footer carries bloom offsets; values match direct") {
    // the file-level claim: the written parquet really has a bloom
    // filter on l_orderkey (offset recorded in the column metadata)
    val out = graft.operators.SourceQueries.scratch(spark, sfDir,
      "lineitem_bloom_spec")
    graft.engine.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_quantity"))
      .coalesce(1)
      .write.mode("overwrite")
      .option("parquet.bloom.filter.enabled#l_orderkey", "true")
      .option("parquet.bloom.filter.expected.ndv#l_orderkey", "200000")
      // dictionary-encoded chunks drop the bloom (see the query's
      // comment) — disable dictionary on the bloom column
      .option("parquet.enable.dictionary#l_orderkey", "false")
      .parquet(out)
    val file = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val in = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file.getAbsolutePath),
        spark.sparkContext.hadoopConfiguration))
    try {
      val cols = in.getFooter.getBlocks.get(0).getColumns
      val ok = (0 until cols.size()).map(cols.get).find(
        _.getPath.toDotString == "l_orderkey")
      assert(ok.exists(_.getBloomFilterOffset >= 0),
        "l_orderkey column chunk must record a bloom filter offset")
    } finally in.close()
    // and the operator's readback equals the direct batch filter
    val got = SparkEntry.queries("q_parquet_bloom")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val exp = graft.engine.Tables.lineitem(spark, sfDir)
      .filter(col("l_orderkey").isin(1L, 7L, 4242L))
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n"),
        floor(sum(col("l_quantity")) * lit(100.0) + lit(0.5)).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == exp)
  }
}
