package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.NativeExpressions
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Tables

/** Round-11 operators — each cross-checked against an independent
  * driver-side brute-force recomputation on the sf0.001 corpus (the
  * DuckDB hash gate is the second, engine-external check): JS divergence,
  * CUSUM, reach curve, Good–Turing, readability, tokenizer fertility,
  * isotonic calibration, STL-lite, class weights, l-diversity, DP
  * quantile, nearest as-of, harmonic centrality, label propagation, and
  * the GROUP BY ALL surface.
  */
class Round11Spec extends AnyFunSuite {
  import SparkFixture.{spark, sfDir}

  private def vq(v: Double): Long = math.floor(v * 1000.0 + 0.5).toLong

  private lazy val events: Array[(Long, Long, String, Double, Long)] =
    Tables.eventsWithTime(spark, sfDir)
      .select(col("ts_us"), col("user_id"), col("event_type"),
        col("value"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3), r.getLong(4)))

  private lazy val docs: Array[(Long, String, String, Long)] =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3)))

  private def normText(t: String): String =
    t.trim.toLowerCase.replaceAll("[ \\t\\n\\f\\r\\x0B]+", " ")

  private def countMatches(s: String, re: String): Long =
    re.r.findAllMatchIn(s).size.toLong

  // ---------------------------------------------------------------- drift

  test("q_js_divergence terms are nonnegative and replay the closed form") {
    val mid = { val us = events.map(_._1); (us.min + us.max) / 2 }
    val types = events.map(_._3).distinct.sorted
    val na = types.map(t =>
      t -> events.count(e => e._3 == t && e._1 < mid).toLong).toMap
    val nb = types.map(t =>
      t -> events.count(e => e._3 == t && e._1 >= mid).toLong).toMap
    val ta = na.values.sum.toDouble
    val tb = nb.values.sum.toDouble
    val k = types.length
    val rows = SparkEntry.queries("q_js_divergence")(spark, sfDir)
      .collect()
    assert(rows.map(_.getString(0)).toSeq == types.toSeq)
    rows.foreach { r =>
      val t = r.getString(0)
      assert(r.getLong(1) == na(t) && r.getLong(2) == nb(t))
      val p = (na(t) + 0.5) / (ta + 0.5 * k)
      val q = (nb(t) + 0.5) / (tb + 0.5 * k)
      val m = (p + q) / 2.0
      val js = (p * math.log(p / m) + q * math.log(q / m)) / 2.0
      val expect = math.floor(js * 1e6 + 0.5) / 1e6
      assert(r.getDouble(5) == expect, s"type $t")
      assert(r.getDouble(5) >= 0.0)
    }
  }

  test("q_cusum replays the sequential max(0, ...) recursion exactly") {
    val byDay = events.groupBy(e => e._1 / 86400000000L).map {
      case (day, es) =>
        val sq = es.map(x => vq(x._4)).sum
        (day, es.length.toLong, (sq * 1000) / es.length)
    }.toArray.sortBy(_._1)
    val tn = byDay.map(_._2).sum
    val tsq = events.map(x => vq(x._4)).sum
    val mu = (tsq * 1000) / tn
    val nd = byDay.length
    val s1 = byDay.map(_._3).sum
    val s2 = byDay.map(x => x._3 * x._3).sum
    val sd = math.sqrt((s2.toDouble - s1.toDouble * s1 / nd) / nd)
    val kq = math.floor(sd * 0.5 + 0.5).toLong
    val hq = math.floor(sd * 4.0 + 0.5).toLong
    var sHi = 0L; var sLo = 0L
    val expect = byDay.map { case (day, _, xm) =>
      sHi = math.max(0L, sHi + (xm - mu - kq))
      sLo = math.max(0L, sLo + (mu - kq - xm))
      (day, sHi, sLo, sHi > hq || sLo > hq)
    }
    val got = SparkEntry.queries("q_cusum")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(3), r.getDouble(4),
        r.getBoolean(5)))
    assert(got.length == expect.length)
    got.zip(expect).foreach { case ((d1, hi, lo, al), (d2, eh, el, ea)) =>
      assert(d1 == d2)
      assert(hi == eh.toDouble / 1e6 && lo == el.toDouble / 1e6)
      assert(al == ea)
    }
  }

  test("q_running_distinct: cumulative count ends at total distinct users") {
    val rows = SparkEntry.queries("q_running_distinct")(spark, sfDir)
      .collect()
    val cums = rows.map(_.getLong(3))
    assert(cums.last == events.map(_._2).distinct.length.toLong)
    assert(cums.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    assert(rows.map(_.getLong(2)).sum == cums.last)
    // per-day brute force: new users are exactly first-seen counts
    val firstDay = events.groupBy(_._2)
      .map { case (_, es) => es.map(_._1 / 86400000000L).min }
    rows.foreach { r =>
      assert(r.getLong(2) == firstDay.count(_ == r.getLong(0)).toLong)
    }
  }

  // ----------------------------------------------------------- text stats

  private lazy val wordCounts: Map[String, Long] =
    docs.flatMap(d => normText(d._2).split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }

  test("q_good_turing replays count-of-counts smoothing on the 12 lowest r") {
    val coc = wordCounts.values.groupBy(identity)
      .map { case (r, rs) => r -> rs.size.toLong }
    val lows = coc.keys.toSeq.sorted.take(12)
    val rows = SparkEntry.queries("q_good_turing")(spark, sfDir).collect()
    assert(rows.map(_.getLong(0)).toSeq == lows)
    rows.foreach { row =>
      val r = row.getLong(0)
      val nr = coc(r); val nr1 = coc.getOrElse(r + 1, 0L)
      assert(row.getLong(1) == nr && row.getLong(2) == nr1)
      val exp = (((r + 1) * nr1 * 1000000L) / nr).toDouble / 1e6
      assert(row.getDouble(3) == exp)
      assert(row.getLong(4) == wordCounts.values.sum)
      assert(row.getLong(5) == wordCounts.size.toLong)
    }
  }

  test("q_readability replays the Flesch formulas per document") {
    val got = SparkEntry.queries("q_readability")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r).toMap
    docs.foreach { case (id, text, _, _) =>
      val w = countMatches(normText(text), "[^ ]+")
      val s = math.max(countMatches(text, "[.!?]+"), 1L)
      val y = math.max(countMatches(text.toLowerCase, "[aeiouy]+"), 1L)
      if (w > 0) {
        val r = got(id)
        assert(r.getLong(1) == w && r.getLong(2) == s && r.getLong(3) == y)
        val wps = w.toDouble / s; val spw = y.toDouble / w
        val flesch =
          math.floor((206.835 - 1.015 * wps - 84.6 * spw) * 1e6 + 0.5) / 1e6
        val grade =
          math.floor((0.39 * wps + 11.8 * spw - 15.59) * 1e6 + 0.5) / 1e6
        assert(r.getDouble(4) == flesch && r.getDouble(5) == grade)
      }
    }
  }

  test("q_tokenizer_fertility replays exact per-language ratios") {
    val got = SparkEntry.queries("q_tokenizer_fertility")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    docs.groupBy(_._3).foreach { case (lang, ds) =>
      val words = ds.map(d => countMatches(normText(d._2), "[^ ]+")).sum
      val toks =
        ds.map(d => countMatches(d._2, "[a-z]+|[0-9]+|[^a-z0-9 ]")).sum
      val chars = ds.map(_._4).sum
      val r = got(lang)
      assert(r.getLong(1) == ds.length.toLong)
      assert(r.getLong(2) == words && r.getLong(3) == toks)
      assert(r.getDouble(4) == ((toks * 1000000L) / words).toDouble / 1e6)
      assert(r.getDouble(5) == ((chars * 1000000L) / toks).toDouble / 1e6)
    }
  }

  // ---------------------------------------------------------- calibration

  test("q_isotonic equals driver-side PAVA and is monotone") {
    val rows = SparkEntry.queries("q_isotonic")(spark, sfDir).collect()
    val iso = rows.map(_.getDouble(4))
    assert(iso.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    // classic pool-adjacent-violators on (n, n_pos), exact micro ints
    case class Block(var n: Long, var pos: Long)
    val stack = scala.collection.mutable.ArrayBuffer[Block]()
    rows.foreach { r =>
      stack += Block(r.getLong(1), r.getLong(2))
      // merge while the mean order is strictly violated (cross products —
      // no float comparison; equal means need no pooling and pooling
      // them would not change the fitted values anyway)
      while (stack.length >= 2 && {
        val a = stack(stack.length - 2); val b = stack.last
        a.pos * b.n > b.pos * a.n
      }) {
        val b = stack.remove(stack.length - 1)
        stack.last.n += b.n; stack.last.pos += b.pos
      }
      ()
    }
    // re-expand block means over the rows they cover
    val expect = scala.collection.mutable.ArrayBuffer[Double]()
    var i = 0
    stack.foreach { b =>
      var covered = 0L
      while (covered < b.n) {
        covered += rows(i).getLong(1)
        expect += ((b.pos * 1000000L) / b.n).toDouble / 1e6
        i += 1
      }
    }
    assert(iso.toSeq == expect.toSeq)
  }

  test("q_stl_decompose: components sum back to the series where defined") {
    val rows = SparkEntry.queries("q_stl_decompose")(spark, sfDir)
      .collect()
    var checked = 0
    rows.foreach { r =>
      if (!r.isNullAt(4)) {
        assert(!r.isNullAt(5) && !r.isNullAt(6))
        val x = r.getDouble(3); val t = r.getDouble(4)
        val s = r.getDouble(5); val rem = r.getDouble(6)
        assert(math.abs(x - (t + s + rem)) < 1e-9)
        checked += 1
      }
    }
    assert(checked > 0)
    // trend replays the 7-row centered mean of day means
    val xs = rows.map(r => (r.getLong(0), r.getDouble(3)))
    rows.zipWithIndex.foreach { case (r, i) =>
      if (i >= 3 && i < rows.length - 3) {
        val mean = (i - 3 to i + 3)
          .map(j => math.floor(xs(j)._2 * 1e6 + 0.5).toLong).sum / 7
        assert(!r.isNullAt(4) && r.getDouble(4) == mean.toDouble / 1e6)
      } else assert(r.isNullAt(4))
    }
  }

  // ------------------------------------------------- weights / governance

  test("q_class_weights replays both closed forms") {
    val byLang = docs.groupBy(_._3).map { case (l, ds) =>
      l -> ds.length.toLong
    }
    val tot = byLang.values.sum; val k = byLang.size.toLong
    val rows = SparkEntry.queries("q_class_weights")(spark, sfDir)
      .collect()
    rows.foreach { r =>
      val n = byLang(r.getString(0))
      assert(r.getLong(1) == n)
      assert(r.getDouble(2) ==
        ((tot * 1000000L) / (k * n)).toDouble / 1e6)
      val eff = (1.0 - 0.999) / (1.0 - math.pow(0.999, n.toDouble)) *
        1000.0
      assert(r.getDouble(3) == math.floor(eff * 1e6 + 0.5) / 1e6)
    }
  }

  test("q_l_diversity brute-forces distinct sensitive bands per QI group") {
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_mktsegment"), col("c_nationkey").cast("long"),
        col("c_acctbal"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        math.floor(r.getDouble(2) / 2000.0).toLong))
    val expect = cust.groupBy(c => (c._1, c._2)).map { case (kk, cs) =>
      kk -> (cs.length.toLong, cs.map(_._3).distinct.length.toLong)
    }
    val rows = SparkEntry.queries("q_l_diversity")(spark, sfDir).collect()
    assert(rows.length == expect.size)
    rows.foreach { r =>
      val (n, l) = expect((r.getString(0), r.getAs[Number](1).longValue()))
      assert(r.getLong(2) == n && r.getLong(3) == l)
      assert(r.getBoolean(4) == (l < 3))
    }
  }

  test("q_dp_quantile: winner maximizes the seeded exponential-mechanism " +
    "score and the release is reproducible") {
    val vals = events.map(e => vq(e._4))
    val n = vals.length.toLong
    val cands = vals.groupBy(identity).map {
      case (v, vs) => v -> vs.length.toLong
    }.toArray.sortBy(_._1)
    var cum = 0L
    val scored = cands.map { case (v, c) =>
      cum += c
      val absdev = math.abs(cum * 2 - n)
      val h = NativeExpressions.splitmix64Long(v)
      val u01 = ((h >>> 11).toDouble + 0.5) / 9007199254740992.0
      val score = -0.25 * absdev.toDouble + (-math.log(-math.log(u01)))
      (v, absdev, score)
    }
    val winner = scored.maxBy(s => (s._3, -s._1))
    val r1 = SparkEntry.queries("q_dp_quantile")(spark, sfDir).head()
    assert(r1.getDouble(0) == winner._1.toDouble / 1000.0)
    assert(r1.getLong(2) == winner._2 / 2)
    val r2 = SparkEntry.queries("q_dp_quantile")(spark, sfDir).head()
    assert(r1.getDouble(0) == r2.getDouble(0))
  }

  // --------------------------------------------------------------- joins

  test("q_asof_nearest picks the closer purchase, ties to backward") {
    val purchases = events.filter(_._3 == "purchase")
      .groupBy(_._2).map { case (u, es) => u -> es.map(_._1).sorted }
    val got = SparkEntry.queries("q_asof_nearest")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r).toMap
    events.filter(_._3 == "view").foreach { v =>
      val r = got(v._5)
      purchases.get(v._2) match {
        case None => assert(r.isNullAt(3))
        case Some(ts) =>
          val bt = ts.filter(_ <= v._1).lastOption
          val ft = ts.find(_ > v._1)
          val expect = (bt, ft) match {
            case (Some(b), Some(f)) =>
              if (v._1 - b <= f - v._1) b else f
            case (Some(b), None) => b
            case (None, Some(f)) => f
            case _ => fail("unreachable")
          }
          assert(r.getLong(3) == expect, s"view ${v._5}")
          assert(r.getLong(5) == math.abs(expect - v._1))
      }
    }
  }

  // --------------------------------------------------------------- graph

  private lazy val graph: Map[Long, Array[Long]] = {
    val e0 = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val sym = e0 ++ e0.map(p => (p._2, p._1))
    sym.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
  }

  test("q_harmonic_centrality replays 3-hop BFS sums from the seed set") {
    val seeds = Tables.customer(spark, sfDir)
      .filter(pmod(col("c_custkey"), lit(50)) === 0)
      .select(col("c_custkey") * 2).collect().map(_.getLong(0))
    val expect = scala.collection.mutable.Map[Long, Long]()
      .withDefaultValue(0L)
    val nSrc = scala.collection.mutable.Map[Long, Long]()
      .withDefaultValue(0L)
    seeds.foreach { s0 =>
      val dist = scala.collection.mutable.Map(s0 -> 0L)
      var frontier = Set(s0)
      for (h <- 1 to 3) {
        frontier = frontier.flatMap(f => graph.getOrElse(f, Array[Long]()))
          .filterNot(dist.contains)
        frontier.foreach(n => dist(n) = h.toLong)
      }
      dist.foreach { case (node, dd) =>
        if (dd > 0) {
          expect(node) += 1000000L / dd; nSrc(node) += 1
        }
      }
    }
    val rows = SparkEntry.queries("q_harmonic_centrality")(spark, sfDir)
      .collect()
    assert(rows.length == expect.size)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(2) == nSrc(id))
      assert(r.getDouble(3) == expect(id).toDouble / 1e6)
    }
  }

  test("q_label_propagation replays deterministic majority flooding") {
    val nations = Tables.customer(spark, sfDir)
      .join(Tables.nation(spark, sfDir),
        col("c_nationkey") === col("n_nationkey"))
      .filter(pmod(col("c_custkey"), lit(20)) === 0)
      .select(col("c_custkey") * 2, col("n_regionkey").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val labels = scala.collection.mutable.Map[Long, (Long, Long)]()
    nations.foreach { case (id, l) => labels(id) = (l, 0L) }
    for (round <- 1 to 3) {
      val votes = scala.collection.mutable
        .Map[Long, scala.collection.mutable.Map[Long, Long]]()
      labels.foreach { case (id, (l, _)) =>
        graph.getOrElse(id, Array[Long]()).foreach { nb =>
          if (!labels.contains(nb)) {
            val m = votes.getOrElseUpdate(nb,
              scala.collection.mutable.Map[Long, Long]()
                .withDefaultValue(0L))
            m(l) += 1
          }
        }
      }
      votes.foreach { case (id, m) =>
        val best = m.toSeq.maxBy { case (l, c) => (c, -l) }
        labels(id) = (best._1, round.toLong)
      }
    }
    val rows = SparkEntry.queries("q_label_propagation")(spark, sfDir)
      .collect()
    assert(rows.length == labels.size)
    rows.foreach { r =>
      val (l, round) = labels(r.getLong(0))
      assert(r.getLong(2) == l && r.getLong(3) == round, s"id ${r.getLong(0)}")
    }
  }

  // ----------------------------------------------------------------- SQL

  test("q_groupby_all equals the explicit GROUP BY formulation") {
    val got = SparkEntry.queries("q_groupby_all")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    val expect = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("revenue"))
      .orderBy(col("o_orderpriority"), col("o_orderstatus"), col("n"),
        col("revenue"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.toSeq == expect.toSeq)
  }
}
