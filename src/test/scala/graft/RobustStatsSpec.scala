package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Tables

/** Round-10 (this session) operators — nonparametric tests, survival,
  * multiple-testing, time-series smoothing, profiling and data-valuation —
  * cross-checked against driver-side brute-force recomputation on the
  * sf0.001 corpus (the DuckDB hash gate is the second, engine-external
  * check).
  */
class RobustStatsSpec extends AnyFunSuite {
  import SparkFixture.{spark, sfDir}

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  private def vq(v: Double): Long = math.floor(v * 1000.0 + 0.5).toLong

  private lazy val events: Array[(Long, Long, String, Double)] =
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))

  private lazy val docs: Array[(Long, String, String, Long)] =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))

  test("q_mann_whitney matches brute-force midrank U and tie-corrected z") {
    val xs = events.filter(e => e._3 == "purchase" || e._3 == "click")
      .map(e => (if (e._3 == "purchase") 1 else 0, vq(e._4)))
    val n1 = xs.count(_._1 == 1).toLong
    val n2 = xs.length - n1
    // midranks via sort: rank of value v = below + (t + 1) / 2
    val byV = xs.groupBy(_._2).view
      .mapValues(g => (g.length.toLong, g.count(_._1 == 1).toLong))
      .toSeq.sortBy(_._1)
    var below = 0L; var r1twice = 0L; var tieSum = 0L
    byV.foreach { case (_, (t, t1)) =>
      r1twice += t1 * (2 * below + t + 1)
      tieSum += t * t * t - t
      below += t
    }
    val u1 = (r1twice - n1 * (n1 + 1)).toDouble / 2.0
    val nn = (n1 + n2).toDouble
    val sig = math.sqrt(n1.toDouble * n2 / 12.0 *
      ((nn + 1.0) - tieSum.toDouble / (nn * (nn - 1.0))))
    val z = (u1 - n1.toDouble * n2 / 2.0) / sig
    val r = run("q_mann_whitney").collect().head
    assert(r.getLong(0) == n1 && r.getLong(1) == n2)
    assert(math.abs(r.getDouble(2) - u1) < 0.51)
    assert(math.abs(r.getDouble(3) - z) < 1e-5)
  }

  test("q_anova_f matches the brute-force k-group F on quantized values") {
    val groups = events.groupBy(_._3).view.mapValues(_.map(e => vq(e._4)))
    val nn = events.length.toDouble
    val gm = groups.values.flatten.sum.toDouble / nn
    val ssb = groups.values.map { g =>
      val m = g.sum.toDouble / g.length
      g.length * (m - gm) * (m - gm)
    }.sum
    val ssw = groups.values.map { g =>
      val m = g.sum.toDouble / g.length
      g.map(v => (v - m) * (v - m)).sum
    }.sum
    val k = groups.size.toDouble
    val f = (ssb / (k - 1)) / (ssw / (nn - k))
    val r = run("q_anova_f").collect().head
    assert(r.getLong(0) == events.length && r.getLong(1) == groups.size)
    // the operator quantizes the per-group SS shares at 1e-6 relative to
    // N — allow that rounding on the reassembled statistic
    assert(math.abs(r.getDouble(2) - f) / f < 1e-3, s"F ${r.getDouble(2)} vs $f")
    assert(math.abs(r.getDouble(3) - ssb / (ssb + ssw)) < 1e-4)
  }

  test("q_jackknife matches brute-force delete-one-source replicates") {
    val bySrc = docs.groupBy(_._2).view
      .mapValues(g => (g.length.toLong, g.map(_._4).sum)).toMap
    val nn = docs.length.toLong
    val tt = docs.map(_._4).sum
    val reps = bySrc.values.map { case (ns, ts) =>
      (tt - ts).toDouble / (nn - ns)
    }.toSeq
    val g = reps.length.toDouble
    val thDot = reps.sum / g
    val se = math.sqrt((g - 1.0) / g *
      reps.map(x => (x - thDot) * (x - thDot)).sum)
    val r = run("q_jackknife").collect().head
    assert(r.getLong(0) == reps.length)
    assert(math.abs(r.getDouble(1) - tt.toDouble / nn) < 1e-5)
    assert(math.abs(r.getDouble(2) - thDot) < 1e-4)
    assert(math.abs(r.getDouble(3) - se) < 1e-3)
  }

  test("q_kaplan_meier matches the brute-force product-limit curve") {
    val winEnd = java.time.LocalDate.parse("2024-01-31").toEpochDay
    val times = Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay,
        r.getString(2)))
      .groupBy(_._1).toSeq.map { case (_, rows) =>
        val first = rows.map(_._2).min
        val purch = rows.filter(_._3 == "purchase").map(_._2)
        if (purch.nonEmpty) (purch.min - first, 1) else (winEnd - first, 0)
      }
    val byT = times.groupBy(_._1).view
      .mapValues(g => (g.count(_._2 == 1).toLong, g.length.toLong))
      .toSeq.sortBy(_._1)
    var atRisk = times.length.toLong
    var s = 1.0
    val expected = byT.map { case (t, (d, tot)) =>
      if (d < atRisk) s *= (atRisk - d).toDouble / atRisk
      else s = 0.0
      val row = (t, atRisk, d, s)
      atRisk -= tot
      row
    }
    val got = run("q_kaplan_meier").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(4)))
    assert(got.length == expected.length)
    got.zip(expected).foreach { case ((gt, gn, gd, gs), (et, en, ed, es)) =>
      assert(gt == et && gn == en && gd == ed)
      assert(math.abs(gs - es) < 2e-6, s"t=$gt surv $gs vs $es")
    }
    // survival must be non-increasing
    got.map(_._4).sliding(2).foreach {
      case Array(a, b) => assert(b <= a + 1e-12)
      case _           =>
    }
  }

  test("q_holt_linear replays the recursion on brute-force day counts") {
    val byDay = events.length // just force events; counts from table
    val counts = Tables.events(spark, sfDir)
      .groupBy(to_date(col("ts")).as("day")).count()
      .collect()
      .map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getLong(1)))
      .sortBy(_._1)
    var l = counts(0)._2.toDouble
    var b = counts(1)._2.toDouble - counts(0)._2
    val exp = scala.collection.mutable.ArrayBuffer((counts(0)._1, l, b, l))
    for (i <- 1 until counts.length) {
      val y = counts(i)._2.toDouble
      val f = l + b
      val lN = 0.3 * y + 0.7 * (l + b)
      b = 0.1 * (lN - l) + 0.9 * b
      l = lN
      exp += ((counts(i)._1, l, b, f))
    }
    val got = run("q_holt_linear").collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(got.length == exp.length && byDay > 0)
    got.zip(exp).foreach { case ((gd, gl, gb, gf), (ed, el, eb, ef)) =>
      assert(gd == ed)
      assert(math.abs(gl - el) < 1e-5 && math.abs(gb - eb) < 1e-5 &&
        math.abs(gf - ef) < 1e-5)
    }
  }

  test("q_bh_fdr significant set is the exact BH step-up prefix") {
    val rows = run("q_bh_fdr").collect()
      .map(r => (r.getLong(4), r.getDouble(3), r.getLong(5)))
      .sortBy(_._1)
    val m = rows.length
    val passing = rows.filter { case (rnk, p, _) => p * m <= rnk * 0.05 + 1e-12 }
    val kStar = if (passing.isEmpty) 0L else passing.map(_._1).max
    rows.foreach { case (rnk, _, sig) =>
      assert((sig == 1L) == (rnk <= kStar), s"rank $rnk")
    }
  }

  test("q_acf matches brute-force autocorrelation of daily counts") {
    val counts = Tables.events(spark, sfDir)
      .groupBy(to_date(col("ts")).as("day")).count()
      .collect()
      .map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getLong(1)))
      .sortBy(_._1).map(_._2)
    val mean = counts.sum.toDouble / counts.length
    val dq = counts.map(y =>
      math.floor((y / mean - 1.0) * 1e6 + 0.5).toLong)
    val den = dq.map(x => x * x).sum.toDouble
    val got = run("q_acf").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    (1 to 7).foreach { k =>
      val num = dq.dropRight(k).zip(dq.drop(k)).map(p => p._1 * p._2).sum
      val (np, acf) = got(k.toLong)
      assert(np == counts.length - k)
      assert(math.abs(acf - num / den) < 1e-5, s"lag $k")
    }
  }

  test("q_stratified_split cuts are the exact 80/10/10 integer boundaries") {
    val got = run("q_stratified_split").collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    docs.groupBy(_._3).foreach { case (lang, g) =>
      val nl = g.length.toLong
      val train = nl * 8 / 10
      val valid = nl * 9 / 10 - train
      val test = nl - nl * 9 / 10
      assert(got.getOrElse((lang, "train"), 0L) == train, s"$lang train")
      assert(got.getOrElse((lang, "valid"), 0L) == valid, s"$lang valid")
      assert(got.getOrElse((lang, "test"), 0L) == test, s"$lang test")
    }
  }

  test("q_fd_check matches brute-force g3 violation counts") {
    val srcLang = docs.groupBy(_._2).values.map { g =>
      g.length - g.groupBy(_._3).values.map(_.length).max
    }.sum
    val got = run("q_fd_check").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    val (nRows, viol) = got("documents.source->lang")
    assert(nRows == docs.length)
    assert(viol == srcLang)
    // a surrogate-key determinant can never violate
    got.foreach { case (fd, (n, v)) =>
      assert(v >= 0 && v < n, fd)
    }
  }

  test("q_loo_influence deltas recompute from per-source totals") {
    val nn = docs.length.toLong
    val tt = docs.map(_._4).sum
    val got = run("q_loo_influence").collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    docs.groupBy(_._2).foreach { case (src, g) =>
      val exp = (tt - g.map(_._4).sum).toDouble / (nn - g.length) -
        tt.toDouble / nn
      assert(math.abs(got(src) - exp) < 1e-5, src)
    }
    // influences must roughly balance: the weighted sum over sources of
    // (N - n_s)·delta_s telescopes to 0 exactly
    val full = run("q_loo_influence").collect()
      .map(r => (r.getLong(1), r.getDouble(3)))
    val bal = full.map { case (ns, dl) => (nn - ns) * dl }.sum
    assert(math.abs(bal) < 1e-2)
  }

  test("q_hill_tail matches brute-force top-k log-ratio estimate") {
    val k = math.max(1, math.min(100, docs.length / 2))
    val sorted = docs.map(d => (d._4, d._1)).sortBy { case (c, id) => (-c, id) }
    val xmin = sorted(k)._1.toDouble
    val slq = sorted.take(k)
      .map(x => math.floor(math.log(x._1 / xmin) * 1e9 + 0.5).toLong).sum
    val r = run("q_hill_tail").collect().head
    assert(r.getLong(0) == k)
    assert(r.getLong(1) == xmin.toLong)
    assert(math.abs(r.getDouble(2) - k / (slq / 1e9)) < 1e-5)
  }

  test("q_audience_overlap matches brute-force distinct-user set overlap") {
    val byType = events.groupBy(_._3).view
      .mapValues(_.map(_._2).toSet).toMap
    val got = run("q_audience_overlap").collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    for ((t1, s1) <- byType; (t2, s2) <- byType if t1 < t2) {
      val inter = (s1 & s2).size.toLong
      if (inter > 0) {
        val (n1, n2, nb) = got((t1, t2))
        assert(n1 == s1.size && n2 == s2.size && nb == inter, s"$t1/$t2")
      } else assert(!got.contains((t1, t2)))
    }
  }

  test("q_simpson_flip within-slope lies in the per-group slope hull") {
    val r = run("q_simpson_flip").collect().head
    val pooled = r.getDouble(2); val within = r.getDouble(3)
    assert(!pooled.isNaN && !within.isNaN)
    // the ANCOVA common slope is a convex combination of per-group
    // slopes — recompute the per-group extremes as the hull
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"),
        datediff(col("o_orderdate").cast("date"),
          lit("1970-01-01").cast("date")).cast("long"),
        floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long"))
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    val slopes = o.groupBy(_._1).values.map { g =>
      val n = g.length.toDouble
      val sx = g.map(_._2).sum.toDouble; val sy = g.map(_._3).sum.toDouble
      val sxx = g.map(p => p._2.toDouble * p._2).sum
      val sxy = g.map(p => p._2.toDouble * p._3).sum
      (n * sxy - sx * sy) / (n * sxx - sx * sx)
    }.toSeq
    assert(within >= slopes.min - 1e-6 && within <= slopes.max + 1e-6)
  }

  test("q_brier_decomp components are consistent and brier is exact") {
    val r = run("q_brier_decomp").collect().head
    val (brier, rel, res, unc, binned) = (r.getDouble(1), r.getDouble(2),
      r.getDouble(3), r.getDouble(4), r.getDouble(5))
    assert(rel >= 0 && res >= 0 && unc >= 0 && unc <= 0.25)
    assert(math.abs(binned - (rel - res + unc)) < 2e-6)
    // the binned decomposition reconstructs Brier up to within-bin
    // variance of the predictions (Murphy): binned >= brier - epsilon
    assert(binned >= brier - 0.05 && binned <= brier + 0.05)
    assert(brier >= 0 && brier <= 1)
  }

  test("q_matryoshka is exact at full dimension and bounded") {
    val rows = run("q_matryoshka").collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(rows.keySet == Set(8L, 16L, 32L, 64L))
    assert(rows(64L)._2 == 0.0)
    rows.values.foreach { case (mc, mae) =>
      assert(mc >= -1.0 && mc <= 1.0 && mae >= 0.0 && mae <= 2.0)
    }
    assert(rows(8L)._2 >= rows(32L)._2)
  }

  test("q_propensity_strat strata partition users and ATE is the weighted fold") {
    val rows = run("q_propensity_strat").collect()
    val users = events.map(_._2).distinct.length
    assert(rows.map(_.getLong(1)).sum == users)
    val valid = rows.filter(r => r.getLong(2) > 0 && r.getLong(3) > 0)
    if (valid.nonEmpty) {
      val wate = valid.map(r => r.getLong(1) *
        math.floor(r.getDouble(6) * 1e6 + 0.5)).sum /
        valid.map(_.getLong(1)).sum.toDouble / 1e6
      val ate = valid.head.getDouble(7)
      assert(math.abs(ate - wate) < 2e-6)
    }
  }

  test("q_sequence_audit flags the dense driver keys as dense") {
    val got = run("q_sequence_audit").collect()
      .map(r => r.getString(0) -> (r.getLong(5), r.getLong(6),
        r.getLong(7))).toMap
    // every driver surrogate key is 0..n-1 dense with no dupes
    got.foreach { case (k, (gaps, dupes, dense)) =>
      assert(gaps == 0 && dupes == 0 && dense == 1, k)
    }
  }

  test("q_mutual_info matches brute-force MI and is non-negative") {
    val cells = docs.groupBy(d => (d._3, d._2)).view.mapValues(_.length)
    val n = docs.length.toDouble
    val ma = docs.groupBy(_._3).view.mapValues(_.length)
    val mb = docs.groupBy(_._2).view.mapValues(_.length)
    val mi = cells.map { case ((a, b), c) =>
      c / n * math.log(c * n / (ma(a).toDouble * mb(b))) }.sum
    val got = run("q_mutual_info").collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(math.abs(got("documents.lang~source") - mi) < 1e-4)
    got.values.foreach(v => assert(v >= -1e-6))
  }

  test("q_woe_iv contributions are non-negative and sum to the total") {
    val rows = run("q_woe_iv").collect()
    val total = rows.head.getDouble(6)
    rows.foreach { r =>
      assert(r.getDouble(5) >= 0.0)
      assert(math.abs(r.getDouble(6) - total) < 1e-12)
    }
    assert(math.abs(rows.map(_.getDouble(5)).sum - total) < 1e-5)
  }

  test("q_qini_uplift cumulative counts are monotone and end at the totals") {
    val rows = run("q_qini_uplift").collect().sortBy(_.getLong(0))
    val users = events.map(_._2).distinct.length
    assert(rows.map(_.getLong(1)).sum == users)
    val cums = rows.map(r => (r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5)))
    cums.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._1 >= a._1 && b._2 >= a._2 && b._3 >= a._3 &&
          b._4 >= a._4)
      case _ =>
    }
    // the last decile's qini equals the random diagonal's endpoint
    val last = rows.last
    assert(math.abs(last.getDouble(6) - last.getDouble(7)) < 1e-6)
  }

  test("q_holt_winters fitted values replay the triple recursion") {
    val counts = Tables.events(spark, sfDir)
      .groupBy(to_date(col("ts")).as("day")).count()
      .collect()
      .map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getLong(1)))
      .sortBy(_._1)
    val l0 = counts.take(7).map(_._2).sum.toDouble / 7.0
    var b = if (counts.length >= 14)
      (counts.slice(7, 14).map(_._2).sum.toDouble / 7.0 - l0) / 7.0
    else 0.0
    var l = l0
    val q = scala.collection.mutable.Queue(
      counts.take(7).map(x => x._2.toDouble - l0): _*)
    val exp = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    for (i <- 7 until counts.length) {
      val y = counts(i)._2
      val s7 = q.dequeue()
      exp += ((counts(i)._1, l + b + s7))
      val lN = 0.3 * (y - s7) + 0.7 * (l + b)
      b = 0.1 * (lN - l) + 0.9 * b
      q.enqueue(0.2 * (y - lN) + 0.8 * s7)
      l = lN
    }
    val got = run("q_holt_winters").collect()
      .map(r => (r.getLong(0), r.getDouble(5)))
    assert(got.length == exp.length)
    got.zip(exp).foreach { case ((gd, gf), (ed, ef)) =>
      assert(gd == ed && math.abs(gf - ef) < 1e-5)
    }
  }

  test("q_forecast_accuracy MASE of the naive model is exactly 1") {
    val rows = run("q_forecast_accuracy").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(4))).toMap
    val (nN, maeN, maseN) = rows("seasonal_naive7")
    assert(maseN == 1.0)
    val (nH, maeH, maseH) = rows("holt_linear")
    assert(nN == nH)
    assert(math.abs(maseH - maeH / maeN) < 1e-4)
  }

  test("q_markov_entropy conditional entropy is the weighted state mean") {
    val rows = run("q_markov_entropy").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val nn = rows.map(_._1).sum.toDouble
    val wavg = rows.map { case (n, h, _) => n / nn * h }.sum
    rows.foreach { case (_, h, hc) =>
      assert(h >= 0.0 && h <= math.log(5.0) + 1e-9)
      assert(math.abs(hc - wavg) < 1e-5)
    }
  }

  test("q_assortativity is a correlation in [-1, 1]") {
    val r = run("q_assortativity").collect().head
    assert(r.getLong(0) > 0)
    val a = r.getDouble(1)
    assert(a >= -1.0 - 1e-9 && a <= 1.0 + 1e-9)
  }

  test("q_ivf_tuning recall and candidates are monotone in nprobe") {
    val rows = run("q_ivf_tuning").collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getLong(2) >= a.getLong(2), "candidates must not shrink")
        assert(b.getLong(4) >= a.getLong(4), "recall must not drop")
      case _ =>
    }
    rows.foreach(r => assert(r.getLong(4) <= 1000000L))
  }

  test("q_james_stein shrinks every arm toward the grand mean") {
    val rows = run("q_james_stein").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    val c = rows.head._4
    assert(c >= 0.0 && c <= 1.0)
    // weighted grand mean of raw means (order-weighted) bounds the
    // shrunk value between raw and grand mean
    val gm = rows.map(x => x._1 * x._2).sum / rows.map(_._1).sum
    rows.foreach { case (_, raw, js, cc) =>
      assert(math.abs(cc - c) < 1e-12)
      assert(math.abs(js - (gm + c * (raw - gm))) < 1e-3)
      // shrinkage never overshoots past the grand mean
      if (raw > gm) assert(js <= raw + 1e-9 && js >= gm - 1e-9)
      else assert(js >= raw - 1e-9 && js <= gm + 1e-9)
    }
  }

  test("q_eb_rate posteriors interpolate raw rate and prior mean") {
    val rows = run("q_eb_rate").collect()
      .map(r => (r.getLong(1), r.getDouble(3), r.getDouble(4),
        r.getDouble(5), r.getDouble(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (n, raw, eb, pm, kap) =>
      assert(kap >= 0.0)
      val expected = (raw * n + pm * kap) / (n + kap)
      assert(math.abs(eb - expected) < 1e-4)
      val lo = math.min(raw, pm) - 1e-9
      val hi = math.max(raw, pm) + 1e-9
      assert(eb >= lo && eb <= hi)
    }
  }

  test("q_spearman matches a brute-force midrank correlation") {
    import graft.functions.TextDedup
    val scored = TextDedup.classifierScored(
      Tables.documents(spark, sfDir),
      Seq(col("doc_id"), col("n_chars")))
      .select(col("n_chars"), col("score").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def midrank(xs: Array[Long]): Map[Long, Double] = {
      val byV = xs.groupBy(identity).view.mapValues(_.length)
        .toSeq.sortBy(_._1)
      var below = 0L
      byV.map { case (v, t) =>
        val r = below + (t + 1) / 2.0
        below += t
        v -> r
      }.toMap
    }
    val rx = midrank(scored.map(_._1)); val ry = midrank(scored.map(_._2))
    val pairs = scored.map { case (x, y) => (rx(x), ry(y)) }
    val n = pairs.length.toDouble
    val mx = pairs.map(_._1).sum / n; val my = pairs.map(_._2).sum / n
    val num = pairs.map(p => (p._1 - mx) * (p._2 - my)).sum
    val den = math.sqrt(pairs.map(p => (p._1 - mx) * (p._1 - mx)).sum *
      pairs.map(p => (p._2 - my) * (p._2 - my)).sum)
    val r = run("q_spearman").collect().head
    assert(r.getLong(0) == scored.length)
    assert(math.abs(r.getDouble(1) - num / den) < 1e-5)
  }

  test("q_wilson_ci brackets the rate and stays inside (0,1)") {
    val rows = run("q_wilson_ci").collect()
    rows.foreach { r =>
      val (n, x, rate, lo, hi) = (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(lo < rate && rate < hi)
      assert(lo > 0.0 && hi < 1.0)
      val z2 = 3.841459; val nD = n.toDouble; val p = x.toDouble / n
      val denom = 1.0 + z2 / nD
      val center = (p + z2 / (2 * nD)) / denom
      val half = math.sqrt(z2) *
        math.sqrt(p * (1 - p) / nD + z2 / (4 * nD * nD)) / denom
      assert(math.abs(lo - (center - half)) < 1e-5)
      assert(math.abs(hi - (center + half)) < 1e-5)
    }
  }

  test("q_capture_recapture matches brute-force set arithmetic") {
    val d0 = java.time.LocalDate.parse("2024-01-01").toEpochDay
    val pe = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .collect().map(r => (r.getLong(0),
        r.getDate(1).toLocalDate.toEpochDay - d0))
    val s1 = pe.filter(p => p._2 >= 0 && p._2 <= 2).map(_._1).toSet
    val s2 = pe.filter(p => p._2 >= 3 && p._2 <= 5).map(_._1).toSet
    val r = run("q_capture_recapture").collect().head
    assert(r.getLong(0) == s1.size && r.getLong(1) == s2.size)
    assert(r.getLong(2) == (s1 & s2).size)
    val chap = (s1.size + 1.0) * (s2.size + 1.0) /
      ((s1 & s2).size + 1.0) - 1.0
    assert(math.abs(r.getDouble(4) - chap) < 1e-5)
  }

  test("q_reg_discontinuity intercepts match per-side brute-force OLS") {
    val cutoff = java.time.LocalDate.parse("1998-01-01").toEpochDay
    val o = Tables.orders(spark, sfDir)
      .select(to_date(col("o_orderdate")).as("day"), col("o_totalprice"))
      .collect().map(r => (r.getDate(0).toLocalDate.toEpochDay - cutoff,
        math.floor(r.getDouble(1) * 100.0 + 0.5).toLong))
    def fit(g: Array[(Long, Long)]): Double = {
      val n = g.length.toDouble
      val sx = g.map(_._1).sum.toDouble; val sy = g.map(_._2).sum.toDouble
      val sxx = g.map(p => p._1.toDouble * p._1).sum
      val sxy = g.map(p => p._1.toDouble * p._2).sum
      val b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      (sy - b * sx) / n / 100.0
    }
    val il = fit(o.filter(_._1 < 0)); val ir = fit(o.filter(_._1 >= 0))
    val r = run("q_reg_discontinuity").collect().head
    assert(math.abs(r.getDouble(4) - il) < 1e-3)
    assert(math.abs(r.getDouble(5) - ir) < 1e-3)
    assert(math.abs(r.getDouble(6) - (ir - il)) < 2e-3)
  }

  test("q_overdispersion matches brute-force daily-count moments") {
    val counts = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day")).count()
      .collect().map(r => (r.getString(0), r.getLong(2)))
    val got = run("q_overdispersion").collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(4))).toMap
    counts.groupBy(_._1).foreach { case (t, g) =>
      val n = g.length.toDouble
      val mean = g.map(_._2).sum / n
      val vr = g.map(x => (x._2 - mean) * (x._2 - mean)).sum / (n - 1)
      val (gm, gd) = got(t)
      assert(math.abs(gm - mean) < 1e-4, t)
      assert(math.abs(gd - vr / mean) < 1e-4, t)
    }
  }

  test("q_runs_test counts runs like the brute-force sign walk") {
    val ys = Tables.events(spark, sfDir)
      .groupBy(to_date(col("ts")).as("day")).count()
      .collect().map(r => (r.getDate(0).toLocalDate.toEpochDay,
        r.getLong(1))).sortBy(_._1).map(_._2)
    val signs = ys.sliding(2).collect {
      case Array(a, b) if a != b => if (b > a) 1 else 0
    }.toSeq
    val runs = 1 + signs.sliding(2).count {
      case Seq(a, b) => a != b
      case _         => false
    }
    val r = run("q_runs_test").collect().head
    assert(r.getLong(0) == signs.count(_ == 1))
    assert(r.getLong(1) == signs.count(_ == 0))
    assert(r.getLong(2) == runs)
  }

  test("q_price_index Fisher lies between Laspeyres and Paasche") {
    val r = run("q_price_index").collect().head
    val (np, l, p, f) = (r.getLong(0), r.getDouble(1), r.getDouble(2),
      r.getDouble(3))
    assert(np > 0)
    assert(l > 0 && p > 0 && f > 0)
    assert(f >= math.min(l, p) - 1e-9 && f <= math.max(l, p) + 1e-9)
    assert(math.abs(f - math.sqrt(l * p)) < 1e-5)
  }

  test("q_dedup_sweep counts are monotone non-increasing in threshold") {
    val rows = run("q_dedup_sweep").collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == Seq(500000L, 700000L, 900000L))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getLong(1) <= a.getLong(1))
        assert(b.getLong(2) <= a.getLong(2))
        assert(b.getLong(3) <= a.getLong(3))
        assert(b.getLong(4) >= a.getLong(4)) // retention grows
      case _ =>
    }
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2)) // removal bound <= affected
    }
  }

  test("q_log_odds z-ranking is consistent and counts are exact") {
    val rows = run("q_log_odds").collect()
    assert(rows.length == 20)
    val zs = rows.map(r => math.abs(r.getDouble(4)))
    zs.sliding(2).foreach {
      case Array(a, b) => assert(b <= a + 1e-9)
      case _           =>
    }
    // sign of log_odds and z agree
    rows.foreach { r =>
      assert(r.getDouble(3) * r.getDouble(4) >= 0.0)
    }
  }

  test("q_heaps_law curves are cumulative and detect the closed vocabulary") {
    val rows = run("q_heaps_law").collect().sortBy(_.getLong(0))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getLong(1) > a.getLong(1))  // tokens strictly grow
        assert(b.getLong(2) >= a.getLong(2)) // vocab non-decreasing
      case _ =>
    }
    // the driver corpus has a closed generator vocabulary: every type
    // appears in the first decile, so the fitted growth exponent is 0
    assert(rows.last.getLong(2) == rows.head.getLong(2))
    assert(math.abs(rows.head.getDouble(3)) < 1e-9)
  }

  test("q_paired_ttest matches brute-force per-user half deltas") {
    val mid = java.time.LocalDate.parse("2024-01-16").toEpochDay
    val rows = Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("day"), col("value"))
      .collect().map(r => (r.getLong(0),
        r.getDate(1).toLocalDate.toEpochDay < mid, vq(r.getDouble(2))))
    val deltas = rows.groupBy(_._1).values.flatMap { g =>
      val h1 = g.filter(_._2); val h2 = g.filterNot(_._2)
      if (h1.nonEmpty && h2.nonEmpty)
        Some((h1.map(_._3).sum.toDouble / h1.length -
          h2.map(_._3).sum.toDouble / h2.length) / 1000.0)
      else None
    }.toSeq
    val n = deltas.length.toDouble
    val mean = deltas.sum / n
    val sd = math.sqrt(deltas.map(x => (x - mean) * (x - mean)).sum /
      (n - 1))
    val r = run("q_paired_ttest").collect().head
    assert(r.getLong(0) == deltas.length)
    assert(math.abs(r.getDouble(1) - mean) < 1e-4)
    assert(math.abs(r.getDouble(2) - mean / (sd / math.sqrt(n))) < 1e-3)
  }

  test("q_cohens_kappa cells sum to n and kappa is chance-corrected") {
    val r = run("q_cohens_kappa").collect().head
    val (n, n11, n10, n01, n00) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4))
    assert(n11 + n10 + n01 + n00 == n)
    val po = (n11 + n00).toDouble / n
    val pa = (n11 + n10).toDouble / n; val pb = (n11 + n01).toDouble / n
    val pe = pa * pb + (1 - pa) * (1 - pb)
    assert(math.abs(r.getDouble(7) - (po - pe) / (1 - pe)) < 1e-5)
    assert(r.getDouble(7) > -1.0 && r.getDouble(7) < 1.0)
  }

  test("q_durbin_watson is near 2 for uncorrelated residuals and in [0,4]") {
    val r = run("q_durbin_watson").collect().head
    val dw = r.getDouble(2)
    assert(dw >= 0.0 && dw <= 4.0)
    // the synthetic daily series is i.i.d.-ish noise around a flat
    // trend: DW must not scream autocorrelation
    assert(dw > 1.0 && dw < 3.0)
  }

  test("q_markov_attribution effects are probabilities and shares sum to 1") {
    val rows = run("q_markov_attribution").collect()
    assert(rows.map(_.getString(0)).sorted.toSeq ==
      Seq("click", "error", "signup", "view"))
    val base = rows.head.getDouble(1)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(1) - base) < 1e-12)
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= base + 1e-9,
        "removal can only lower conversion")
      assert(r.getDouble(3) >= -1e-9 && r.getDouble(3) <= 1.0 + 1e-9)
      val expectedRe = 1.0 - r.getDouble(2) / base
      assert(math.abs(r.getDouble(3) - expectedRe) < 1e-5)
    }
    assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 1e-4)
  }

  test("q_kruskal_wallis matches brute-force midrank H") {
    val xs = events.map(e => (e._3, vq(e._4)))
    val byV = xs.groupBy(_._2).view.mapValues(_.length.toLong)
      .toSeq.sortBy(_._1)
    var below = 0L
    val rank = byV.map { case (v, t) =>
      val r = below + (t + 1) / 2.0; below += t; v -> r
    }.toMap
    val n = xs.length.toDouble
    val tsum = byV.map { case (_, t) => t * t * t - t }.sum.toDouble
    val groups = xs.groupBy(_._1)
    val sumTerm = groups.toSeq.sortBy(_._1).map { case (_, g) =>
      val r = g.map(x => rank(x._2)).sum
      r * r / g.length
    }.sum
    val h0 = 12.0 / (n * (n + 1)) * sumTerm - 3.0 * (n + 1)
    val h = h0 / (1.0 - tsum / (n * n * n - n))
    val r = run("q_kruskal_wallis").collect().head
    assert(r.getLong(0) == xs.length && r.getLong(1) == groups.size)
    assert(math.abs(r.getDouble(2) - h) < 1e-4)
    assert(math.abs(r.getDouble(4) -
      math.exp(-h / 2) * (1 + h / 2)) < 1e-4)
  }

  test("q_cmh chi-square is non-negative and OR is positive") {
    val r = run("q_cmh").collect().head
    assert(r.getLong(0) > 0)
    assert(r.getDouble(3) >= 0.0)
    assert(r.getDouble(4) > 0.0)
    // sum of observed a-cells is close to expectation under the null
    // synthetic data: chi2 should not scream
    assert(r.getDouble(3) < 50.0)
  }

  test("q_weibull_fit shape is positive and matches the hazard story") {
    val r = run("q_weibull_fit").collect().head
    assert(r.getLong(0) >= 2)
    val shape = r.getDouble(1)
    assert(shape > 0.0)
    assert(r.getDouble(2) > 0.0)
  }

  test("q_logrank observed and expected events reconcile") {
    val r = run("q_logrank").collect().head
    assert(r.getLong(0) > 0 && r.getLong(1) > 0)
    assert(r.getLong(2) <= r.getLong(0), "O1 cannot exceed group size")
    assert(r.getDouble(3) > 0.0)
    // z^2 == chi2
    assert(math.abs(r.getDouble(4) * r.getDouble(4) - r.getDouble(5))
      < 1e-5)
  }

  test("q_friedman rank sums conserve the total and p is closed-form") {
    val r = run("q_friedman").collect().head
    val (nb, k, chi, df, p) = (r.getLong(0), r.getLong(1),
      r.getDouble(2), r.getLong(3), r.getDouble(4))
    assert(df == k - 1)
    assert(chi >= -1e-9)
    assert(math.abs(p - math.exp(-chi / 2) * (1 + chi / 2)) < 1e-5)
    assert(nb > 0 && p >= 0.0 && p <= 1.0)
  }

  test("q_mcnemar uses the same discordant cells as kappa") {
    val mc = run("q_mcnemar").collect().head
    val kp = run("q_cohens_kappa").collect().head
    assert(mc.getLong(1) == kp.getLong(2)) // n10
    assert(mc.getLong(2) == kp.getLong(3)) // n01
    val b = mc.getLong(1).toDouble; val c = mc.getLong(2).toDouble
    assert(math.abs(mc.getDouble(3) - (b - c) * (b - c) / (b + c)) < 1e-5)
  }

  test("q_cronbach_alpha detects the multinomial anti-correlation") {
    val r = run("q_cronbach_alpha").collect().head
    assert(r.getLong(0) == 5)
    // the per-type daily volumes split a near-constant total, so items
    // anti-correlate and alpha must come out below zero — a composite
    // of these five would be meaningless, which is the audit's point
    assert(r.getDouble(4) < 0.5)
    assert(r.getDouble(2) > 0 && r.getDouble(3) > 0)
  }

  test("q_theil_index decomposition identity holds as printed") {
    val r = run("q_theil_index").collect().head
    val (total, between, within) = (r.getDouble(2), r.getDouble(3),
      r.getDouble(4))
    assert(total >= 0.0 && between >= -1e-9 && within >= -1e-9)
    assert(math.abs(total - (between + within)) < 2e-6)
    assert(between <= total + 1e-9)
  }

  test("q_hhi is bounded by the supplier count") {
    run("q_hhi").collect().foreach { r =>
      val (ns, hhi, eff) = (r.getLong(1), r.getDouble(2), r.getDouble(3))
      // HHI in [10^4/n, 10^4]; effective suppliers in [1, n]
      assert(hhi >= 10000.0 / ns - 1e-3 && hhi <= 10000.0 + 1e-6)
      assert(eff >= 1.0 - 1e-6 && eff <= ns + 1e-6)
      assert(math.abs(eff * hhi - 10000.0) < 1.0,
        "eff * hhi must reconstruct the 10^4 scale")
    }
  }

  test("q_partial_corr matches brute-force correlations") {
    val byDay = Tables.events(spark, sfDir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("x"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L))
          .as("y"),
        count(lit(1)).as("z"))
      .collect().map(r => (r.getLong(1).toDouble, r.getLong(2).toDouble,
        r.getLong(3).toDouble))
    def corr(a: Array[Double], b: Array[Double]): Double = {
      val n = a.length
      val ma = a.sum / n; val mb = b.sum / n
      val num = a.zip(b).map { case (p, q) => (p - ma) * (q - mb) }.sum
      num / math.sqrt(a.map(p => (p - ma) * (p - ma)).sum *
        b.map(q => (q - mb) * (q - mb)).sum)
    }
    val xs = byDay.map(_._1); val ys = byDay.map(_._2)
    val zs = byDay.map(_._3)
    val rxy = corr(xs, ys); val rxz = corr(xs, zs); val ryz = corr(ys, zs)
    val part = (rxy - rxz * ryz) /
      math.sqrt((1 - rxz * rxz) * (1 - ryz * ryz))
    val r = run("q_partial_corr").collect().head
    assert(math.abs(r.getDouble(1) - rxy) < 1e-5)
    assert(math.abs(r.getDouble(4) - part) < 1e-5)
  }

  test("q_granger F is non-negative and the unrestricted fit wins") {
    val r = run("q_granger").collect().head
    assert(r.getLong(0) > 3)
    // RSS_u <= RSS_r always => F >= 0
    assert(r.getDouble(2) >= -1e-9)
  }

  test("q_pattern_profile shares sum to the column total over top shapes") {
    val rows = run("q_pattern_profile").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (cn, g) =>
      // ranks are 1..k distinct
      val rnks = g.map(_.getLong(1)).sorted
      assert(rnks.toSeq == (1L to rnks.length).toSeq, cn)
      g.foreach(r => assert(r.getLong(4) >= 0 && r.getLong(4) <= 1000000L))
    }
    // props masks to exactly the {"a": 9...} shapes
    val props = rows.filter(_.getString(0) == "events.props")
    assert(props.forall(_.getString(2).startsWith("{\"a\": 9")))
  }
}
