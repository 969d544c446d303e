package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Tables

/** Round-12 additions — each cross-checked against an independent
  * driver-side brute-force recomputation on the sf0.001 corpus (the
  * DuckDB hash gate is the second, engine-external check): Page–Hinkley,
  * Cramér's V, the χ² goodness-of-fit, the paired sign test, the
  * two-sample Poisson rate test, skip-gram pairs, Gini–Simpson
  * diversity, sampled closeness centrality, and the LATERAL top-N.
  */
class Round12Spec extends AnyFunSuite {
  import SparkFixture.{spark, sfDir}
  import spark.implicits._

  private def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  private lazy val events: Array[(Long, Long, String, Double)] =
    Tables.eventsWithTime(spark, sfDir)
      .select(col("ts_us"), col("user_id"), col("event_type"),
        col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3)))

  private lazy val docs: Array[(Long, String, String)] =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  private def dayOf(tsUs: Long): Long = tsUs / 86400000000L
  private def vq(value: Double): Long =
    math.floor(value * 1000.0 + 0.5).toLong
  private def norm(s: String): String =
    s.trim.toLowerCase.replaceAll("[ \\t\\n\\f\\r\\u000B]+", " ")

  // ---------------------------------------------------------- drift

  test("q_page_hinkley replays the sequential PH recursion") {
    // TRUE sequential implementation (running mean, m_t, running min) —
    // validates the window-collapse identity, not just the windows.
    val byDay = events.groupBy(e => dayOf(e._1)).toSeq
      .map { case (d, es) => (d, es.length.toLong,
        es.map(e => vq(e._4)).sum) }
      .sortBy(_._1)
    val xms = byDay.map { case (d, n, sq) => (d, n, (sq * 1000L) / n) }
    val nd = xms.length.toDouble
    val s1 = xms.map(_._3).sum
    val s2 = xms.map(x => BigInt(x._3) * x._3).sum
    val sd = math.sqrt((s2.toDouble - s1.toDouble * s1 / nd) / nd)
    val dq = math.floor(sd * 0.1 + 0.5).toLong
    val lq = math.floor(sd * 5.0 + 0.5).toLong
    var cums = 0L; var cumn = 0L; var mt = 0L; var minMt = 0L
    val expected = byDay.zip(xms).map { case ((d, n, sq), (_, _, xm)) =>
      cums += sq; cumn += n
      val xbar = (cums * 1000L) / cumn
      mt += xm - xbar - dq
      if (mt < minMt) minMt = mt
      val ph = mt - math.min(0L, minMt)
      (d, n, xbar.toDouble / 1e6, ph.toDouble / 1e6, ph > lq)
    }
    val got = SparkEntry.queries("q_page_hinkley")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getBoolean(4))).toSeq
    assert(got == expected)
  }

  // ---------------------------------------------------------- stats

  private lazy val orders: Array[(Long, String, String)] =
    Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderstatus"),
        col("o_orderpriority"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  test("q_cramers_v replays the densified-grid chi-square and V") {
    val cells = orders.groupBy(o => (o._2, o._3)).map {
      case (k, xs) => (k, xs.length.toLong) }
    val rows = orders.map(_._2).distinct.sorted
    val cols = orders.map(_._3).distinct.sorted
    val ri = rows.map(r => r -> cells.collect {
      case ((rr, _), n) if rr == r => n }.sum).toMap
    val cj = cols.map(c => c -> cells.collect {
      case ((_, cc), n) if cc == c => n }.sum).toMap
    val n = orders.length.toLong
    var chiU = 0L
    for (r <- rows; c <- cols) {
      val nij = cells.getOrElse((r, c), 0L)
      val e = ri(r).toDouble * cj(c) / n
      chiU += math.floor((nij - e) * (nij - e) / e * 1e6 + 0.5).toLong
    }
    val v = q6(math.sqrt(chiU.toDouble / 1e6 /
      (n.toDouble * (math.min(rows.size, cols.size) - 1).toDouble)))
    val got = SparkEntry.queries("q_cramers_v")(spark, sfDir)
      .collect().head
    assert(got.getLong(0) == n)
    assert(got.getLong(1) == rows.size.toLong)
    assert(got.getLong(2) == cols.size.toLong)
    assert(got.getDouble(3) == chiU.toDouble / 1e6)
    assert(got.getDouble(4) == v)
  }

  test("q_chisq_gof replays the uniform-null chi-square with closed-form p") {
    val cells = orders.groupBy(_._3).map { case (_, xs) => xs.length.toLong }
    val n = cells.sum; val k = cells.size.toLong
    val e = n.toDouble / k
    val chiU = cells.map(o =>
      math.floor((o - e) * (o - e) / e * 1e6 + 0.5).toLong).sum
    val chi = chiU.toDouble / 1e6
    val got = SparkEntry.queries("q_chisq_gof")(spark, sfDir)
      .collect().head
    assert(got.getLong(0) == n && got.getLong(1) == k)
    assert(got.getDouble(2) == chi)
    assert(got.getLong(3) == k - 1)
    if (k == 5)
      assert(got.getDouble(4) ==
        q6(math.exp(-chi / 2.0) * (1.0 + chi / 2.0)))
  }

  test("q_sign_test replays the per-user early/late signs") {
    val dds = events.map(e => dayOf(e._1))
    val mid = (dds.min + dds.max) / 2
    val perUser = events.groupBy(_._2).values.flatMap { es =>
      val e1 = es.filter(e => dayOf(e._1) <= mid)
      val e2 = es.filter(e => dayOf(e._1) > mid)
      if (e1.isEmpty || e2.isEmpty) None
      else {
        val m1 = e1.map(e => vq(e._4)).sum.toDouble / e1.length
        val m2 = e2.map(e => vq(e._4)).sum.toDouble / e2.length
        Some(math.floor((m2 - m1) / 1000.0 * 1e6 + 0.5).toLong)
      }
    }.toSeq
    val pos = perUser.count(_ > 0L).toLong
    val neg = perUser.count(_ < 0L).toLong
    val got = SparkEntry.queries("q_sign_test")(spark, sfDir)
      .collect().head
    assert(got.getLong(0) == pos && got.getLong(1) == neg)
    assert(got.getDouble(2) ==
      q6((pos - neg).toDouble / math.sqrt((pos + neg).toDouble)))
  }

  test("q_poisson_rate_test replays the equal-exposure rate z") {
    val pc = events.filter(e => e._3 == "purchase" || e._3 == "click")
    val k1 = pc.count(_._3 == "purchase").toLong
    val k2 = pc.count(_._3 == "click").toLong
    val dds = pc.map(e => dayOf(e._1))
    val days = dds.max - dds.min + 1
    val got = SparkEntry.queries("q_poisson_rate_test")(spark, sfDir)
      .collect().head
    assert(got.getLong(0) == k1 && got.getLong(1) == k2)
    assert(got.getLong(2) == days)
    assert(got.getDouble(3) == (k1 * 1000000L / days).toDouble / 1e6)
    assert(got.getDouble(4) == (k2 * 1000000L / days).toDouble / 1e6)
    assert(got.getDouble(5) ==
      q6((k1 - k2).toDouble / math.sqrt((k1 + k2).toDouble)))
  }

  // ---------------------------------------------------------- text

  test("q_skipgram_pairs replays the windowed co-occurrence counts") {
    val counts = scala.collection.mutable.Map.empty[(String, String), Long]
    docs.foreach { case (_, _, text) =>
      val ws = norm(text).split(" ").filter(_.nonEmpty)
      for (i <- ws.indices; k <- 1 to 2 if i + k < ws.length) {
        counts((ws(i), ws(i + k))) =
          counts.getOrElse((ws(i), ws(i + k)), 0L) + 1L
        counts((ws(i + k), ws(i))) =
          counts.getOrElse((ws(i + k), ws(i)), 0L) + 1L
      }
    }
    val expected = counts.toSeq
      .sortBy { case ((a, b), n) => (-n, a, b) }.take(20)
      .map { case ((a, b), n) => (a, b, n) }
    val got = SparkEntry.queries("q_skipgram_pairs")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSeq
    assert(got == expected)
  }

  test("q_simpson_diversity replays the per-source Gini-Simpson index") {
    val expected = docs.groupBy(_._2).toSeq.sortBy(_._1).map {
      case (src, ds) =>
        val wc = ds.flatMap(d => norm(d._3).split(" ").filter(_.nonEmpty))
          .groupBy(identity).map(_._2.length.toLong)
        val n = wc.sum
        val ssq = wc.map(c => BigInt(c) * (c - 1)).sum
        (src, n, wc.size.toLong,
          q6(1.0 - ssq.toDouble / (n.toDouble * (n - 1))))
    }
    val got = SparkEntry.queries("q_simpson_diversity")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == expected)
  }

  // ---------------------------------------------------------- graph / sql

  test("q_closeness_centrality replays a driver-side multi-root BFS") {
    val li = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_suppkey"))
      .distinct().collect()
      .map(r => (r.getLong(0) * 2, r.getLong(1) * 2 + 1))
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    li.foreach { case (c, s) =>
      adj(c) = adj(c) + s; adj(s) = adj(s) + c }
    val roots = Tables.customer(spark, sfDir)
      .filter(pmod(col("c_custkey"), lit(50)) === 0)
      .select(col("c_custkey")).collect().map(_.getLong(0) * 2)
      .sorted.take(200)
    val expected = roots.flatMap { r =>
      var dist = Map(r -> 0L)
      var frontier = Set(r)
      for (h <- 1 to 3) {
        val next = frontier.flatMap(adj).filterNot(dist.contains)
        next.foreach(n => dist += n -> h.toLong)
        frontier = next
      }
      val reached = dist.values.filter(_ > 0L)
      if (reached.isEmpty) None
      else {
        val nr = reached.size.toLong; val sdist = reached.sum
        Some((r, nr, sdist, (nr * 1000000L / sdist).toDouble / 1e6))
      }
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q_closeness_centrality")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == expected)
  }

  test("q_time_to_convert replays the first-view-to-first-purchase histogram") {
    val byUser = events.groupBy(_._2)
    val deltas = byUser.values.flatMap { es =>
      val views = es.filter(_._3 == "view")
      if (views.isEmpty) None
      else {
        val v = views.map(_._1).min
        val ps = es.filter(e => e._3 == "purchase" && e._1 > v)
        if (ps.isEmpty) None else Some((ps.map(_._1).min - v) / 1000000L)
      }
    }.toSeq
    val expected = deltas.groupBy(_ / 86400L).toSeq.sortBy(_._1)
      .map { case (b, xs) => (b, xs.length.toLong, xs.min, xs.max) }
    val got = SparkEntry.queries("q_time_to_convert")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == expected)
  }

  test("q_key_skew replays the count-of-counts quantiles") {
    val counts = orders.groupBy(_._1).map(_._2.length.toLong).toSeq.sorted
    val keys = counts.length.toLong
    val nrows = counts.sum
    val got = SparkEntry.queries("q_key_skew")(spark, sfDir)
      .collect().head
    assert(got.getLong(0) == keys && got.getLong(1) == nrows)
    // replicate exactly: smallest c with cum*2 >= keys etc.
    var cum = 0L
    val dist = counts.groupBy(identity).toSeq.sortBy(_._1)
    var e50 = -1L; var e99 = -1L
    dist.foreach { case (c, xs) =>
      cum += xs.length
      if (e50 < 0 && cum * 2 >= keys) e50 = c
      if (e99 < 0 && cum * 100 >= keys * 99) e99 = c
    }
    assert(got.getLong(2) == e50 && got.getLong(3) == e99)
    assert(got.getLong(4) == counts.max)
    assert(got.getDouble(5) == (e99 * 1000000L / e50).toDouble / 1e6)
    assert(got.getDouble(6) ==
      (counts.max * 1000000L / nrows).toDouble / 1e6)
  }

  test("q_quantile_normalize: quantiles are an exact upper-rank ECDF") {
    val rows = SparkEntry.queries("q_quantile_normalize")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    val nn = rows.map(_._2).sum
    var cum = 0L
    rows.foreach { case (_, n, q) =>
      cum += n
      assert(q == (cum * 1000000L / nn).toDouble / 1e6)
    }
    // scores ascend; quantiles non-decreasing ending at 1.0
    assert(rows.map(_._1).toSeq == rows.map(_._1).toSeq.sorted)
    assert(rows.last._3 == 1.0)
  }

  test("q_robust_scaler replays median/IQR/fences per dimension") {
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble))
    val dims = vecs.head.length
    val expected = (0 until dims).map { d =>
      val vqs = vecs.map(v => math.floor(v(d) * 1e6 + 0.5).toLong).sorted
      val n = vqs.length.toLong
      def ceilQ(num: Long, den: Long): Long =
        vqs(((num * n + den - 1) / den - 1).toInt)
      // smallest value whose cum*den >= num*n == element at ceil rank
      val q1 = ceilQ(1, 4); val med = ceilQ(1, 2); val q3 = ceilQ(3, 4)
      val out = vqs.count(v => math.abs(v - med) * 2 > (q3 - q1) * 3)
      (d.toLong, n, med.toDouble / 1e6, (q3 - q1).toDouble / 1e6,
        out.toLong)
    }
    val got = SparkEntry.queries("q_robust_scaler")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4))).toSeq
    assert(got == expected)
  }

  test("q_holm_bonferroni replays the step-down on independently computed p-values") {
    val nk = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_nationkey")).collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val cells = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderstatus")).collect()
      .map(r => (nk(r.getLong(0)), r.getString(1)))
    val byCell = cells.groupBy(identity).map { case (k, xs) =>
      k -> xs.length.toLong }
    val nats = cells.map(_._1).distinct.sorted
    val sts = cells.map(_._2).distinct.sorted
    val ni = nats.map(n => n -> cells.count(_._1 == n).toLong).toMap
    val gc = sts.map(s0 => s0 -> cells.count(_._2 == s0).toLong).toMap
    val nn = cells.length.toLong
    val ps = nats.map { n =>
      val x2u = sts.map { s0 =>
        val o = byCell.getOrElse((n, s0), 0L)
        val e = ni(n).toDouble * gc(s0).toDouble / nn.toDouble
        math.floor((o - e) * (o - e) / e * 1e9 + 0.5).toLong
      }.sum
      val pu = math.floor(math.exp(-x2u.toDouble / 2e9) * 1e6 + 0.5).toLong
      (n, pu)
    }
    val m = ps.length.toLong
    val ranked = ps.sortBy(p => (p._2, p._1)).zipWithIndex
      .map { case ((n, pu), i) => (n, pu, i + 1L) }
    var runMax = 0L; var anyFail = false
    val holm = ranked.map { case (n, pu, rnk) =>
      val step = pu * (m - rnk + 1)
      runMax = math.max(runMax, step)
      if (step * 20 > 1000000L) anyFail = true
      (n, pu.toDouble / 1e6, rnk, math.min(1000000L, runMax).toDouble / 1e6,
        if (anyFail) 0L else 1L)
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_holm_bonferroni")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getLong(3),
        r.getDouble(4), r.getLong(5))).toSeq
    assert(got == holm.toSeq)
  }

  test("q_welch_anova replays the heteroscedastic F*") {
    val groups = events.groupBy(_._3).values.map(_.map(e => vq(e._4)))
      .filter(_.length > 1).toSeq
    val stats = groups.map { g =>
      val n = g.length.toLong
      val s1 = g.map(BigInt(_)).sum
      val s2 = g.map(v => BigInt(v) * v).sum
      val mg = s1.toDouble / n / 1000.0
      val vg = (s2.toDouble / 1e6 - (s1.toDouble / 1000.0) *
        (s1.toDouble / n / 1000.0)) / (n - 1.0)
      val wq = math.floor(n / vg * 1e6 + 0.5).toLong
      val wmq = math.floor(n / vg * mg * 1e6 + 0.5).toLong
      (n, mg, wq, wmq)
    }
    val k = stats.length.toLong
    val sw = stats.map(_._3).sum; val swm = stats.map(_._4).sum
    val mw = swm.toDouble / sw
    val sa = stats.map { case (_, mg, wq, _) =>
      math.floor((wq.toDouble / 1e6) * (mg - mw) * (mg - mw) * 1e6 +
        0.5).toLong }.sum
    val sh = stats.map { case (n, _, wq, _) =>
      val f = 1.0 - (wq.toDouble / 1e6) / (sw.toDouble / 1e6)
      math.floor(f * f / (n - 1.0) * 1e9 + 0.5).toLong }.sum
    val aD = sa.toDouble / 1e6; val hD = sh.toDouble / 1e9
    val fW = q6(aD / (k - 1.0) /
      (1.0 + 2.0 * (k - 2.0) / (k * k - 1.0) * hD))
    val df2 = q6((k.toDouble * k - 1.0) / (3.0 * hD))
    val got = SparkEntry.queries("q_welch_anova")(spark, sfDir)
      .collect().head
    assert(got.getLong(0) == stats.map(_._1).sum)
    assert(got.getLong(1) == k)
    assert(got.getDouble(2) == fW)
    assert(got.getLong(3) == k - 1)
    assert(got.getDouble(4) == df2)
  }

  test("q_mase_backtest replays the seasonal-naive MASE") {
    val xm = events.groupBy(e => dayOf(e._1)).toSeq.sortBy(_._1)
      .map { case (d, es) =>
        val sq = es.map(e => vq(e._4)).sum
        (sq * 1000L) / es.length }
    val e1 = xm.indices.drop(1).map(i => math.abs(xm(i) - xm(i - 1)))
    val e7 = xm.indices.drop(7).map(i => math.abs(xm(i) - xm(i - 7)))
    val got = SparkEntry.queries("q_mase_backtest")(spark, sfDir)
      .collect().head
    assert(got.getLong(0) == xm.length.toLong)
    assert(got.getDouble(1) ==
      (e7.sum * 1000000L / e7.length).toDouble / 1e12)
    assert(got.getDouble(2) ==
      (e1.sum * 1000000L / e1.length).toDouble / 1e12)
    assert(got.getDouble(3) ==
      (e7.sum * e1.length * 1000000L / (e1.sum * e7.length)).toDouble /
        1e6)
  }

  test("q_ucb_arms replays the UCB1 scores") {
    val arms = events.groupBy(_._3).toSeq.sortBy(_._1)
    val nn = events.length.toDouble
    val expected = arms.map { case (t, es) =>
      val n = es.length.toLong
      val mu = (es.map(e => vq(e._4)).sum * 1000L) / n
      (t, n, mu.toDouble / 1e6,
        q6(mu.toDouble / 1e6 + math.sqrt(2.0 * math.log(nn) / n)))
    }
    val got = SparkEntry.queries("q_ucb_arms")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    assert(got == expected)
  }

  test("q_dbscan_core: classes partition the corpus; core/border logic replays") {
    import graft.functions.Vectors
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("id"),
        Vectors.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", Vectors.norm(col("v")))
    val nlist = Vectors.deriveNlist(e.count())
    val idx = Vectors.ivfIndex2(e, nlist)
    val assign = Vectors.ivfAssign2(e, idx, 1)
    val probes = Vectors.ivfAssign2(e, idx, 2)
    // collect the same IVF-blocked cosine-0.35 edges, classify in Scala
    val edges = probes.select(col("id").as("a_id"), col("cid"))
      .join(assign.select(col("id").as("b_id"), col("cid")), "cid")
      .filter(col("a_id") =!= col("b_id"))
      .join(e.select(col("id").as("a_id"), col("v").as("av"),
        col("nrm").as("anrm")), "a_id")
      .join(e.select(col("id").as("b_id"), col("v").as("bv"),
        col("nrm").as("bnrm")), "b_id")
      .filter(Vectors.dot(col("av"), col("bv")) /
        (col("anrm") * col("bnrm")) >= 0.35)
      .select(least(col("a_id"), col("b_id")),
        greatest(col("a_id"), col("b_id")))
      .distinct().as[(Long, Long)].collect().toSet
    val ids = e.select(col("id")).as[Long].collect()
    val deg = scala.collection.mutable.Map.empty[Long, Int]
      .withDefaultValue(0)
    edges.foreach { case (u, v) => deg(u) += 1; deg(v) += 1 }
    val core = ids.filter(deg(_) >= 3).toSet
    val border = ids.filter(i => !core(i) && edges.exists { case (u, v) =>
      (u == i && core(v)) || (v == i && core(u)) }).toSet
    val expected = Map(
      "core" -> core.size.toLong, "border" -> border.size.toLong,
      "noise" -> (ids.length - core.size - border.size).toLong)
      .filter(_._2 > 0L).toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q_dbscan_core")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected)
    assert(got.map(_._2).sum == ids.length.toLong)
  }

  test("q_mm_image_ahash replays the perceptual hash from the splitmix pixels") {
    // PNG is lossless, so the decoded raster equals the generated pixels;
    // recompute the mean-threshold bits + nibble packing in plain Scala.
    import org.apache.spark.sql.graft.NativeExpressions.splitmix64Long
    val ids = docs.map(_._1).sorted
    val expected = ids.map { id =>
      val pv = (0 until 256).map(i =>
        (splitmix64Long(id * 256L + i) & 0xffL).toInt)
      val sum = pv.map(_.toLong).sum
      val bits = pv.map(p => if (p.toLong * 256L > sum) 1 else 0)
      val hex = (0 until 64).map { k =>
        val nib = bits(4 * k) * 8 + bits(4 * k + 1) * 4 +
          bits(4 * k + 2) * 2 + bits(4 * k + 3)
        Integer.toHexString(nib)
      }.mkString
      (id, hex, bits.count(_ == 1).toLong)
    }.toSeq
    val got = SparkEntry.queries("q_mm_image_ahash")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq
    assert(got == expected)
  }

  test("q_qq_plot replays the ceil-rank deciles per group") {
    def deciles(t: String): Map[Long, Long] = {
      val vs = events.filter(_._3 == t).map(e => vq(e._4)).sorted
      val n = vs.length.toLong
      (1L to 9L).map(d0 =>
        d0 -> vs(((d0 * n + 9) / 10 - 1).toInt)).toMap
    }
    val p = deciles("purchase"); val c = deciles("click")
    val expected = (1L to 9L).map(d0 => (d0, p(d0).toDouble / 1000.0,
      c(d0).toDouble / 1000.0, (p(d0) - c(d0)).toDouble / 1000.0))
    val got = SparkEntry.queries("q_qq_plot")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    assert(got == expected)
  }

  test("q_dup_by_source replays the per-source dup marking") {
    import graft.functions.TextDedup
    val pairs = TextDedup.exactJaccardPairs(
      Tables.documents(spark, sfDir).select(col("doc_id"), col("text")),
      0.7).select(col("d1"), col("d2")).as[(Long, Long)].collect()
    val dup = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    val expected = docs.groupBy(_._2).toSeq.sortBy(_._1).map {
      case (src, ds) =>
        val n = ds.length.toLong
        val nd = ds.count(d0 => dup(d0._1)).toLong
        (src, n, nd, (nd * 1000000L / n).toDouble / 1e6)
    }
    val got = SparkEntry.queries("q_dup_by_source")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == expected)
  }

  test("q_json_corrupt and q_csv_multiline replay from the nation table") {
    val nation = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").cast("long"), col("n_name")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expJson = nation.map { case (k, nm) =>
      if (k % 5 == 0) (None, None, true) else (Some(k.toInt), Some(nm), false)
    }.sortBy(t => (t._1.isDefined, t._1, t._2))
    val gotJson = SparkEntry.queries("q_json_corrupt")(spark, sfDir)
      .collect().map(r => (
        if (r.isNullAt(0)) None else Some(r.getInt(0)),
        Option(r.getString(1)), r.getBoolean(2)))
      .sortBy(t => (t._1.isDefined, t._1, t._2)).toSeq
    assert(gotJson == expJson.toSeq)
    val expCsv = nation.sortBy(_._1).map { case (k, nm) =>
      (k.toInt, (nm + "\nsecond line of " + nm).length.toLong, nm, true) }
    val gotCsv = SparkEntry.queries("q_csv_multiline")(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2),
        r.getBoolean(3))).toSeq
    assert(gotCsv == expCsv.toSeq)
  }

  test("q_permutation_test replays the hash-flip replicates") {
    import org.apache.spark.sql.graft.NativeExpressions.splitmix64Long
    val pc = Tables.eventsWithTime(spark, sfDir)
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("event_id"),
        (col("event_type") === "purchase").cast("int"), col("value"))
      .collect().map(r => (r.getLong(0), r.getInt(1), vq(r.getDouble(2))))
    val n1 = pc.count(_._2 == 1).toLong
    val n2 = pc.count(_._2 == 0).toLong
    val sv1 = pc.filter(_._2 == 1).map(_._3).sum
    val sv2 = pc.filter(_._2 == 0).map(_._3).sum
    val num = (BigInt(sv1) * n2 - BigInt(sv2) * n1).abs
    var extreme = 0L
    for (b <- 0L until 64L) {
      var n1b = 0L; var n2b = 0L; var s1b = BigInt(0); var s2b = BigInt(0)
      pc.foreach { case (id, _, v) =>
        val gb = ((splitmix64Long(id * 64L + b) >>> 8) % 2L)
        if (gb == 1L) { n1b += 1; s1b += v } else { n2b += 1; s2b += v }
      }
      val numb = (s1b * n2b - s2b * n1b).abs
      if (numb * n1 * n2 >= num * n1b * n2b) extreme += 1
    }
    val got = SparkEntry.queries("q_permutation_test")(spark, sfDir)
      .collect().head
    assert(got.getLong(0) == n1 && got.getLong(1) == n2)
    assert(got.getDouble(2) ==
      q6(sv1.toDouble / n1 / 1000.0 - sv2.toDouble / n2 / 1000.0))
    assert(got.getLong(3) == 64L)
    assert(got.getLong(4) == extreme)
    assert(got.getDouble(5) ==
      ((extreme + 1) * 1000000L / 65L).toDouble / 1e6)
  }

  test("q_minhash_calibration: est tracks exact and masses add up") {
    import graft.functions.TextDedup
    val rows = SparkEntry.queries("q_minhash_calibration")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(rows.nonEmpty)
    // pair mass equals the exact miner's J >= 0.6 pair count
    val nPairs = TextDedup.exactJaccardPairs(
      Tables.documents(spark, sfDir).select(col("doc_id"), col("text")),
      0.6).count()
    assert(rows.map(_._2).sum == nPairs)
    // estimator sanity: m in [0, 16], est = m/16 exactly
    rows.foreach { case (m, _, est, _) =>
      assert(m >= 0L && m <= 16L)
      assert(est == (m * 1000000L / 16L).toDouble / 1e6)
    }
  }

  test("q_stream_semi_join and q_stream_upsert replay their batch semantics") {
    val ev = Tables.eventsWithTime(spark, sfDir)
      .select(col("ts_us"), col("user_id"), col("event_type"),
        col("event_id"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getDouble(4)))
    // semi: clicks with >= 1 same-user view in [t, t+30m]
    val views = ev.filter(_._3 == "view")
    val expSemi = ev.filter(_._3 == "click").filter { c =>
      views.exists(v => v._2 == c._2 && v._1 >= c._1 &&
        v._1 <= c._1 + 1800000000L)
    }.map(c => (c._4, c._2, c._1)).sortBy(_._1).toSeq
    val gotSemi = SparkEntry.queries("q_stream_semi_join")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
    assert(gotSemi == expSemi)
    // upsert: last-writer-wins under the (ts, id, type, vq) struct order
    val expUp = ev.groupBy(_._2).toSeq.sortBy(_._1).map { case (u, es) =>
      val last = es.map(e => (e._1, e._4, e._3, vq(e._5))).max
      (u, es.length.toLong, last._1, last._2, last._3,
        last._4.toDouble / 1000.0)
    }
    val gotUp = SparkEntry.queries("q_stream_upsert")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getDouble(5))).toSeq
    assert(gotUp == expUp)
  }

  test("q_tost replays the two one-sided z's") {
    def grp(t: String) = events.filter(_._3 == t).map(e => vq(e._4))
    val a = grp("purchase"); val b = grp("click")
    val n1 = a.length.toLong; val n2 = b.length.toLong
    val a1 = a.map(BigInt(_)).sum; val b1 = b.map(BigInt(_)).sum
    val a2 = a.map(v => BigInt(v) * v).sum
    val b2 = b.map(v => BigInt(v) * v).sum
    val m1 = a1.toDouble / n1 / 1000.0; val m2 = b1.toDouble / n2 / 1000.0
    val v1 = (a2.toDouble / 1e6 - (a1.toDouble / 1000.0) * m1) / (n1 - 1.0)
    val v2 = (b2.toDouble / 1e6 - (b1.toDouble / 1000.0) * m2) / (n2 - 1.0)
    val se = math.sqrt(v1 / n1 + v2 / n2)
    val zLo = ((m1 - m2) + 0.5) / se; val zUp = (0.5 - (m1 - m2)) / se
    val got = SparkEntry.queries("q_tost")(spark, sfDir).collect().head
    assert(got.getLong(0) == n1 && got.getLong(1) == n2)
    assert(got.getDouble(2) == q6(m1 - m2))
    assert(got.getDouble(3) == q6(se))
    assert(got.getDouble(4) == q6(zLo) && got.getDouble(5) == q6(zUp))
    assert(got.getBoolean(6) ==
      (math.floor(zLo * 1e6 + 0.5) > 1644854.0 &&
        math.floor(zUp * 1e6 + 0.5) > 1644854.0))
  }

  test("q_elasticity replays the ln-ln OLS slope") {
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_quantity") > 0.0)
      .select(col("l_discount"), col("l_quantity")).collect()
      .map(r => (math.floor(math.log(1.0 - r.getDouble(0)) * 1e6 +
        0.5).toLong,
        math.floor(math.log(r.getDouble(1)) * 1e6 + 0.5).toLong))
    val n = li.length.toLong
    val sx = li.map(x => BigInt(x._1)).sum
    val sy = li.map(x => BigInt(x._2)).sum
    val sxx = li.map(x => BigInt(x._1) * x._1).sum
    val sxy = li.map(x => BigInt(x._1) * x._2).sum
    val den = n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble
    val got = SparkEntry.queries("q_elasticity")(spark, sfDir)
      .collect().head
    assert(got.getLong(0) == n)
    assert(got.getDouble(1) == q6(sx.toDouble / n / 1e6))
    assert(got.getDouble(2) == q6(sy.toDouble / n / 1e6))
    assert(got.getDouble(3) ==
      q6((n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) / den))
  }

  test("q_psm_match replays the caliper nearest-neighbor ATT") {
    val us = events.groupBy(_._2).toSeq.map { case (uid, es) =>
      val sv = es.map(e => vq(e._4)).sum
      val score = (sv * 1000L) / es.length
      (uid, es.length.toLong, score, es.exists(_._3 == "purchase"))
    }
    val controls = us.filter(!_._4)
    val treated = us.filter(_._4)
    val matched = treated.flatMap { case (tid, ty, ts, _) =>
      val cands = controls.filter(c => math.abs(ts - c._3) <= 100000L)
        .map(c => (math.abs(ts - c._3), c._1, c._2))
      if (cands.isEmpty) None else Some((tid, ty, cands.min))
    }
    val sdiff = matched.map { case (_, ty, (_, _, cy)) => ty - cy }.sum
    val got = SparkEntry.queries("q_psm_match")(spark, sfDir)
      .collect().head
    assert(got.getLong(0) == treated.length.toLong)
    assert(got.getLong(1) == matched.length.toLong)
    assert(got.getDouble(2) ==
      (matched.length.toLong * 1000000L / treated.length).toDouble / 1e6)
    // zero matched treated (possible at tiny SF: every user purchased,
    // or no control within the caliper) legitimately NULLs the ATT
    if (matched.isEmpty) assert(got.isNullAt(3))
    else assert(got.getDouble(3) == q6(sdiff.toDouble / matched.length))
  }

  test("q_shapley_attribution replays exact Shapley and satisfies efficiency") {
    val byUser = events.groupBy(_._2).toSeq.map { case (_, es) =>
      val types = es.map(_._3).toSet
      val mask = (if (types("click")) 1 else 0) +
        (if (types("error")) 2 else 0) + (if (types("signup")) 4 else 0) +
        (if (types("view")) 8 else 0)
      (mask, if (types("purchase")) 1L else 0L)
    }
    val v = (0 until 16).map { m =>
      val us = byUser.filter(_._1 == m)
      m -> (if (us.isEmpty) 0L
            else us.map(_._2).sum * 1000000L / us.length)
    }.toMap
    val chans = Seq(("click", 1), ("error", 2), ("signup", 4), ("view", 8))
    val expected = chans.map { case (name, bit) =>
      val su = (0 until 16).filter(m => (m & bit) == 0).map { m =>
        val w = Integer.bitCount(m) match {
          case 0 | 3 => 6L; case _ => 2L }
        w * (v(m + bit) - v(m))
      }.sum
      (name, math.floor(su.toDouble / 24.0 + 0.5) / 1e6)
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_shapley_attribution")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(got == expected)
    // efficiency: sum of phi equals v(full) - v(empty) up to the four
    // per-channel floor quantizations (each <= 0.5 micro)
    val tot = got.map(_._2).sum
    val target = (v(15) - v(0)).toDouble / 1e6
    assert(math.abs(tot - target) <= 4.0 / 1e6 + 1e-9,
      s"efficiency violated: $tot vs $target")
  }

  test("q_icc replays the one-way random-effects ICC(1)") {
    val nk = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_nationkey")).collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val oc = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_totalprice")).collect()
      .map(r => (nk(r.getLong(0)), cents(r.getDouble(1))))
    val gs = oc.groupBy(_._1).values.filter(_.length > 1).toSeq
    val nn = gs.map(_.length.toLong).sum
    val k = gs.length.toLong
    val gs1 = gs.flatMap(_.map(x => BigInt(x._2))).sum
    val sn2 = gs.map(g => BigInt(g.length.toLong) * g.length).sum
    val gm = gs1.toDouble / nn
    val ssb = gs.map { g =>
      val ng = g.length.toDouble
      val mg = g.map(x => BigInt(x._2)).sum.toDouble / ng
      math.floor(ng * (mg - gm) * (mg - gm) / nn + 0.5).toLong }.sum
    val ssw = gs.map { g =>
      val s1 = g.map(x => BigInt(x._2)).sum
      val s2 = g.map(x => BigInt(x._2) * x._2).sum
      val mg = s1.toDouble / g.length
      math.floor((s2.toDouble - mg * s1.toDouble) / nn + 0.5).toLong }.sum
    val msb = ssb.toDouble * nn / (k - 1.0)
    val msw = ssw.toDouble * nn / (nn - k.toDouble)
    val n0 = (nn.toDouble - sn2.toDouble / nn) / (k - 1.0)
    val got = SparkEntry.queries("q_icc")(spark, sfDir).collect().head
    assert(got.getLong(0) == nn && got.getLong(1) == k)
    assert(got.getDouble(2) == q6(n0))
    assert(got.getDouble(3) == q6((msb - msw) / (msb + (n0 - 1.0) * msw)))
  }

  // ---------------------------------------------------------- TPC-H

  private def cents(x: Double): Long = math.floor(x * 100.0 + 0.5).toLong

  private lazy val li6: Array[(Long, Long, Double, Double, Double, String)] =
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("sd"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getString(5)))

  test("q6_forecast replays the banded filter-aggregate") {
    val sel = li6.filter(l => l._6 >= "1996-01-01" &&
      l._6 < "1997-01-01" &&
      l._5 >= 0.05 && l._5 <= 0.07 && l._3 < 24.0)
    val got = SparkEntry.queries("q6_forecast")(spark, sfDir)
      .collect().head
    assert(got.getLong(0) == sel.length.toLong)
    assert(got.getDouble(1) ==
      sel.map(l => cents(l._4 * l._5)).sum.toDouble / 100.0)
  }

  test("q17_small_qty replays the per-part 20%-of-average threshold") {
    val brand = Tables.part(spark, sfDir)
      .filter(col("p_brand") === "Brand#13")
      .select(col("p_partkey")).collect().map(_.getLong(0)).toSet
    val bl = li6.filter(l => brand(l._2))
    val moments = bl.groupBy(_._2).map { case (pk, xs) =>
      pk -> (xs.length.toLong,
        xs.map(l => math.floor(l._3 * 100.0 + 0.5).toLong).sum) }
    val small = bl.filter { l =>
      val (nl, sqc) = moments(l._2)
      math.floor(l._3 * 100.0 + 0.5).toLong * 5L * nl < sqc
    }
    val got = SparkEntry.queries("q17_small_qty")(spark, sfDir)
      .collect().head
    assert(got.getLong(0) == small.length.toLong)
    assert(got.getDouble(1) ==
      (small.map(l => cents(l._4)).sum / 7L).toDouble / 100.0)
  }

  test("q19_brackets replays the disjunctive bracket revenue") {
    val parts = Tables.part(spark, sfDir)
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2)))
      .toMap
    val sel = li6.filter { l =>
      parts.get(l._2).exists { case (b, sz) =>
        (b == "Brand#13" && sz >= 1 && sz <= 10 &&
          l._3 >= 1.0 && l._3 <= 15.0) ||
        (b == "Brand#20" && sz >= 5 && sz <= 20 &&
          l._3 >= 10.0 && l._3 <= 25.0) ||
        (b == "Brand#23" && sz >= 10 && sz <= 30 &&
          l._3 >= 20.0 && l._3 <= 35.0)
      }
    }
    val got = SparkEntry.queries("q19_brackets")(spark, sfDir)
      .collect().head
    assert(got.getLong(0) == sel.length.toLong)
    assert(got.getDouble(1) ==
      sel.map(l => cents(l._4 * (1.0 - l._5))).sum.toDouble / 100.0)
  }

  test("q14_promo and q22_idle_customers replay") {
    // q14: one ship-month promo share
    val pt = Tables.part(spark, sfDir)
      .select(col("p_partkey"), col("p_type")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val mSel = li6.filter(l => l._6 >= "1996-03-01" &&
      l._6 < "1996-04-01")
    val totalC = mSel.map(l => cents(l._4 * (1.0 - l._5))).sum
    val promoC = mSel.filter(l => pt(l._2) == "PROMO")
      .map(l => cents(l._4 * (1.0 - l._5))).sum
    val got14 = SparkEntry.queries("q14_promo")(spark, sfDir)
      .collect().head
    assert(got14.getLong(0) == promoC && got14.getLong(1) == totalC)
    assert(got14.getDouble(2) ==
      (promoC * 1000000L / totalC).toDouble / 1e4)
    // q22: above-average balance, no urgent orders, by nation
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong,
        r.getDouble(2)))
    val urgent = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey")).collect().map(_.getLong(0)).toSet
    val pos = cust.filter(_._3 > 0.0)
    val sc = pos.map(c => cents(c._3)).sum; val nc = pos.length.toLong
    val expected = cust
      .filter(c => cents(c._3) * nc > sc && !urgent(c._1))
      .groupBy(_._2).toSeq.sortBy(_._1)
      .map { case (nk, xs) => (nk, xs.length.toLong,
        xs.map(c => cents(c._3)).sum.toDouble / 100.0) }
    val got22 = SparkEntry.queries("q22_idle_customers")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    assert(got22 == expected)
  }

  test("q_lateral_topn replays per-customer top-2 orders") {
    val os = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = os.groupBy(_._1).toSeq.flatMap { case (ck, xs) =>
      xs.sortBy(x => (-x._3, x._2)).take(2).map(x => (ck, x._2, x._3))
    }.sortBy(x => (x._1, -x._3, x._2))
    val got = SparkEntry.queries("q_lateral_topn")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    assert(got == expected)
  }
}
