package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Tables

/** Round-10 statistics operators: per-group OLS, Poisson-bootstrap CI,
  * day-of-week seasonal decomposition, classifier calibration and
  * reciprocal-rank fusion — cross-checked against driver-side brute-force
  * recomputation on the sf0.001 corpus (the DuckDB hash gate is the
  * second, engine-external check).
  */
class StatsSpec extends AnyFunSuite {
  import SparkFixture.{spark, sfDir}

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  private lazy val events: Array[(Long, String, Double)] =
    Tables.eventsWithTime(spark, sfDir)
      .select(col("ts_us"), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))

  private def vq(v: Double): Long = math.floor(v * 1000.0 + 0.5).toLong

  test("q_group_ols matches a brute-force per-group least-squares fit") {
    val us0 = events.map(_._1).min
    val got = run("q_group_ols").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val byType = events.groupBy(_._2)
    assert(got.keySet == byType.keySet)
    byType.foreach { case (t, rows) =>
      val xy = rows.map { case (us, _, v) => ((us - us0) / 1000000L, vq(v)) }
      val n = xy.length.toDouble
      val sx = xy.map(_._1).sum.toDouble
      val sy = xy.map(_._2).sum.toDouble
      val sxx = xy.map(p => p._1 * p._1).sum.toDouble
      val sxy = xy.map(p => p._1 * p._2).sum.toDouble
      val syy = xy.map(p => p._2 * p._2).sum.toDouble
      val num = n * sxy - sx * sy
      val den = n * sxx - sx * sx
      val (gn, gSlope, gIcpt, gR2) = got(t)
      assert(gn == rows.length)
      assert(math.abs(gSlope - num / den * 86.4) < 1e-5, t)
      assert(math.abs(gIcpt - (sy - num / den * sx) / n / 1000.0) < 1e-5, t)
      val r2 = num * num / (den * (n * syy - sy * sy))
      assert(math.abs(gR2 - r2) < 1e-5, t)
      assert(gR2 >= 0.0 && gR2 <= 1.0, s"$t r2=$gR2")
    }
  }

  test("q_bootstrap_ci brackets the point mean with a proper interval") {
    val got = run("q_bootstrap_ci").collect()
    assert(got.length == events.map(_._2).distinct.length)
    got.foreach { r =>
      val (t, n, mean, lo, hi) = (r.getString(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4))
      val exact = events.filter(_._2 == t).map(e => vq(e._3)).sum.toDouble /
        (n * 1000.0)
      assert(math.abs(mean - exact) < 1e-5, t)
      assert(lo < hi, s"$t degenerate interval [$lo, $hi]")
      assert(lo <= mean && mean <= hi,
        s"$t mean $mean outside [$lo, $hi]")
      // Poisson-bootstrap SE of a mean ~ sd/sqrt(n): the 90% interval
      // half-width should be within a loose factor of that
      val vals = events.filter(_._2 == t).map(_._3)
      val mu = vals.sum / vals.length
      val sd = math.sqrt(vals.map(v => (v - mu) * (v - mu)).sum / vals.length)
      val se = sd / math.sqrt(vals.length.toDouble)
      val hw = (hi - lo) / 2.0
      assert(hw > 0.5 * se && hw < 5.0 * se,
        s"$t half-width $hw vs se $se — resampling machinery off")
    }
  }

  test("q_seasonal_dow: weighted seasonal offsets cancel; moments exact") {
    val rows = run("q_seasonal_dow").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.map(_._1).toSet.subsetOf((0L to 6L).toSet))
    assert(rows.map(_._2).sum == events.length)
    // Σ n_d · seasonal_d = 0 by construction (up to 6dp rounding per row)
    val cancel = rows.map { case (_, n, _, s, _) => n * s }.sum
    assert(math.abs(cancel) < rows.length * 1e-3, s"seasonal sum $cancel")
    val byDow = events.groupBy { case (us, _, _) =>
      (us / 86400000000L + 3) % 7
    }
    rows.foreach { case (dow, n, mean, _, sd) =>
      val vs = byDow(dow).map(e => vq(e._3))
      assert(n == vs.length)
      assert(math.abs(mean - vs.sum.toDouble / n / 1000.0) < 1e-5)
      val nD = n.toDouble
      val expSd = math.sqrt(
        (nD * vs.map(v => v * v).sum.toDouble -
          vs.sum.toDouble * vs.sum.toDouble) / (nD * nD)) / 1000.0
      assert(math.abs(sd - expSd) < 1e-5, s"dow $dow")
    }
  }

  test("q_calibration: probability bins are coherent") {
    val rows = run("q_calibration").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.map(_._2).sum == nDocs, "every doc lands in one bin")
    rows.foreach { case (bin, n, nPos, meanPred, rate) =>
      assert(bin >= 0 && bin <= 9)
      assert(nPos <= n)
      assert(meanPred >= 0.0 && meanPred <= 1.0)
      assert(rate >= 0.0 && rate <= 1.0)
      // mean predicted probability must sit inside its own bin's range
      // (bin 9 absorbs pu = 1e6 exactly)
      assert(meanPred >= bin / 10.0 - 1e-6 &&
        meanPred <= (bin + 1) / 10.0 + (if (bin == 9) 1.0 else 1e-6),
        s"bin $bin meanPred $meanPred")
    }
  }

  test("q_ab_sprt replays the sequential walk and its first crossing") {
    val r = run("q_ab_sprt").head()
    val (nTot, kTot, decidedAt, decision, llr) = (r.getLong(0),
      r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4))
    val ordered = Tables.eventsWithTime(spark, sfDir)
      .select(col("ts_us"), col("event_id"), col("event_type")).collect()
      .map(rr => (rr.getLong(0), rr.getLong(1), rr.getString(2)))
      .sortBy(e => (e._1, e._2))
    assert(nTot == ordered.length)
    assert(kTot == ordered.count(_._3 == "purchase"))
    val c1 = math.log(0.22 / 0.18)
    val c0 = math.log(0.78 / 0.82)
    val aU = math.floor(math.log(0.95 / 0.05) * 1e6 + 0.5).toLong
    val bU = math.floor(math.log(0.05 / 0.95) * 1e6 + 0.5).toLong
    var k = 0L
    var cross: Option[(Long, Long, String)] = None
    ordered.zipWithIndex.foreach { case ((_, _, t), i) =>
      if (t == "purchase") k += 1
      val n = i + 1L
      val u = math.floor((k * c1 + (n - k) * c0) * 1e6 + 0.5).toLong
      if (cross.isEmpty && (u >= aU || u <= bU))
        cross = Some((n, u, if (u >= aU) "reject_h0" else "accept_h0"))
    }
    cross match {
      case Some((n, u, dec)) =>
        assert(decidedAt == n && decision == dec)
        assert(math.abs(llr - u / 1e6) < 1e-9)
      case None =>
        assert(decision == "continue" && decidedAt == nTot)
    }
  }

  test("q_outlier_mad matches brute-force median/MAD with the 3-MAD cut") {
    val got = run("q_outlier_mad").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4), r.getDouble(5))).toMap
    val e = Tables.events(spark, sfDir)
      .select(col("event_type"), col("event_id"), col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1), vq(r.getDouble(2))))
    assert(got.keySet == e.map(_._1).toSet)
    e.groupBy(_._1).foreach { case (t, rows) =>
      // lower median under the (vq, event_id) total order
      val sorted = rows.sortBy(r => (r._3, r._2)).map(_._3)
      val med = sorted((sorted.length + 1) / 2 - 1)
      val adevSorted = rows
        .map(r => (math.abs(r._3 - med), r._2)).sortBy(identity)
      val mad = adevSorted((adevSorted.length + 1) / 2 - 1)._1
      val nOut = rows.count(r => math.abs(r._3 - med) > 3 * mad)
      val (gn, gMed, gMad, gOut, gPct) = got(t)
      assert(gn == rows.length && gOut == nOut, t)
      assert(gMed == med / 1000.0 && gMad == mad / 1000.0, t)
      assert(math.abs(gPct - nOut.toDouble / rows.length) < 1e-5, t)
    }
  }

  test("q_rrf_fusion agrees with a driver-side fusion of the two rankings") {
    val fused = run("q_rrf_fusion").collect()
    assert(fused.map(_.getLong(0)).toSeq == (1L to fused.length))
    assert(fused.length == 10 || fused.length ==
      fused.map(_.getLong(1)).distinct.length) // ≤10 only if corpus tiny
    // brute-force: lexical ranking from q_bm25 output, semantic ranking
    // from an exact driver-side cosine against vec 0
    val lex = run("q_bm25").collect()
      .map(r => r.getLong(1) -> r.getLong(0)).toMap
    val emb = Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id", "cast(embedding as array<double>) as v")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val q = emb(0L)
    def dot(a: Array[Double], b: Array[Double]) =
      a.indices.map(i => a(i) * b(i)).sum
    val qn = math.sqrt(dot(q, q))
    val sem = emb.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, dot(q, v) / (qn * math.sqrt(dot(v, v)))) }
      .sortBy { case (id, c) => (-c, id) }
      .take(20).zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val scores = (lex.keySet ++ sem.keySet).toSeq.map { id =>
      val s = lex.get(id).map(r => 1000000L / (60 + r)).getOrElse(0L) +
        sem.get(id).map(r => 1000000L / (60 + r)).getOrElse(0L)
      (id, s)
    }.sortBy { case (id, s) => (-s, id) }.take(10)
    val expect = scores.zipWithIndex.map { case ((id, s), i) =>
      (i + 1L, id, s / 1e6)
    }
    val gotTriples = fused.map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(4))).toSeq
    assert(gotTriples == expect)
  }
}
