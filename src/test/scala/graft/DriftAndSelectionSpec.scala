package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Dist, Tables}

/** Round-10 operators: drift monitoring (KS / PSI / chi-square), skyline
  * selection, linear interpolation, incremental dedup, int8 quantization
  * and MMR re-ranking — each cross-checked against an independent
  * driver-side brute-force recomputation on the sf0.001 corpus (the
  * DuckDB hash gate is the second, engine-external check).
  */
class DriftAndSelectionSpec extends AnyFunSuite {
  import SparkFixture.{spark, sfDir}

  private def events: Array[(Long, Long, String, Double)] =
    Tables.eventsWithTime(spark, sfDir)
      .select(col("ts_us"), col("user_id"), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))

  private def vq(v: Double): Long = math.floor(v * 1000.0 + 0.5).toLong

  test("Dist.globalPrefixMin matches a driver-side sorted scan (incl + excl)") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 500).map { i =>
      (rnd.nextInt(40).toDouble, i.toLong, rnd.nextInt(1000).toLong)
    }
    val df = spark.createDataFrame(rows).toDF("v", "id", "a")
    for (asc <- Seq(true, false); inclusive <- Seq(true, false)) {
      val got = Dist.globalPrefixMin(df, "v", asc, "id", "a", p = 7,
          inclusive = inclusive)
        .select(col("id"), col("cummin")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val ord = rows.sortBy(r => (if (asc) r._1 else -r._1, r._2))
      val mins = ord.scanLeft(Long.MaxValue) {
        case (acc, (_, _, a)) => math.min(acc, a)
      }
      val expect = ord.zipWithIndex.map { case ((_, id, _), i) =>
        id -> (if (inclusive) mins(i + 1) else mins(i))
      }.toMap
      assert(got == expect, s"asc=$asc inclusive=$inclusive")
    }
  }

  test("q_drift_ks equals the brute-force two-sample KS on quantized values") {
    val e = events
    val mid = {
      val us = e.map(_._1); (us.min + us.max) / 2
    }
    val a = e.filter(_._1 < mid).map(x => vq(x._4))
    val b = e.filter(_._1 >= mid).map(x => vq(x._4))
    val values = (a ++ b).distinct.sorted
    val best = values.map { v =>
      val ca = a.count(_ <= v).toLong
      val cb = b.count(_ <= v).toLong
      (math.abs(ca * b.length.toLong - cb * a.length.toLong), v)
    }.minBy { case (d, v) => (-d, v) }
    val row = SparkEntry.queries("q_drift_ks")(spark, sfDir).head()
    assert(row.getLong(0) == a.length.toLong)
    assert(row.getLong(1) == b.length.toLong)
    val expKs = math.floor(best._1.toDouble /
      (a.length.toLong * b.length.toLong) * 1e6 + 0.5) / 1e6
    assert(math.abs(row.getDouble(2) - expKs) < 1e-9)
    assert(row.getDouble(3) == best._2.toDouble / 1000.0)
  }

  test("q_drift_psi: decile edges are reference order statistics; totals add up") {
    val out = SparkEntry.queries("q_drift_psi")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.map(_._1).toSeq == (0L to 9L))
    val e = events
    val mid = { val us = e.map(_._1); (us.min + us.max) / 2 }
    val ref = e.filter(_._1 < mid).map(x => vq(x._4)).sorted
    val cur = e.filter(_._1 >= mid).map(x => vq(x._4))
    assert(out.map(_._2).sum == ref.length.toLong, "ref total")
    assert(out.map(_._3).sum == cur.length.toLong, "cur total")
    // replay the exact ceil-threshold edge contract and the bin counts
    val edges = (1 to 9).map { i =>
      val thr = ((i.toLong * ref.length + 9) / 10).toInt
      ref(thr - 1) // cum >= thr first holds at the thr-th order statistic
    }
    def bin(v: Long): Int = edges.count(_ <= v)
    val refBins = ref.groupBy(bin).map { case (k, v) => (k, v.length.toLong) }
    val curBins = cur.groupBy(bin).map { case (k, v) => (k, v.length.toLong) }
    out.foreach { case (b, nr, nc, psi) =>
      assert(nr == refBins.getOrElse(b.toInt, 0L), s"bin $b ref")
      assert(nc == curBins.getOrElse(b.toInt, 0L), s"bin $b cur")
      assert(!psi.isNaN && !psi.isInfinite, s"bin $b psi finite")
    }
  }

  test("q_transition_matrix equals the brute-force pair counts and rows normalize") {
    // the engine orders by (ts_us, event_id); event_id is not in the
    // tuple, but per-user timestamps are unique at sf0.001 (asserted),
    // so ts alone is a total order here
    events.groupBy(_._2).foreach { case (u, rs) =>
      assert(rs.map(_._1).distinct.length == rs.length,
        s"user $u has duplicate timestamps; spec ordering assumption broken")
    }
    val pairs = events.groupBy(_._2).toSeq.flatMap { case (_, rs) =>
      val ordered = rs.sortBy(_._1).map(_._3)
      ordered.zip(ordered.drop(1))
    }
    val counts = pairs.groupBy(identity).map { case ((f, t), xs) =>
      (f, t) -> xs.length.toLong
    }
    val fromTot = counts.groupBy(_._1._1).map { case (f, m) =>
      f -> m.values.sum
    }
    val got = SparkEntry.queries("q_transition_matrix")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.map(x => (x._1, x._2)).toSet == counts.keySet)
    got.foreach { case (f, t, n, p) =>
      assert(n == counts((f, t)))
      val exp = n.toDouble / fromTot(f)
      assert(math.abs(p - exp) < 1e-6, s"($f->$t)")
    }
    // each from-row's probabilities sum to ~1
    got.groupBy(_._1).foreach { case (f, rows) =>
      assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4, s"row $f")
    }
  }

  test("q_chi2_select equals the brute-force contingency statistic") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("lang"), col("source")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val n = docs.length.toDouble
    val langs = docs.map(_._1).distinct.sorted
    val sources = docs.map(_._2).distinct
    val out = SparkEntry.queries("q_chi2_select")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(out.map(_._1).toSeq == langs.toSeq)
    out.foreach { case (lang, nd, chi2, dof) =>
      val rt = docs.count(_._1 == lang).toDouble
      assert(nd == rt.toLong)
      assert(dof == sources.length - 1L)
      val exp = sources.map { src =>
        val st = docs.count(_._2 == src).toDouble
        val o = docs.count(x => x._1 == lang && x._2 == src).toDouble
        val eIn = rt * st / n
        val eOut = (n - rt) * st / n
        math.pow(o - eIn, 2) / eIn + math.pow((st - o) - eOut, 2) / eOut
      }.sum
      assert(math.abs(chi2 - exp) < 1e-4, s"$lang: $chi2 vs $exp")
    }
  }

  test("q_funnel_paths equals the brute-force trigram path counts") {
    events.groupBy(_._2).foreach { case (u, rs) =>
      assert(rs.map(_._1).distinct.length == rs.length,
        s"user $u has duplicate timestamps; ordering assumption broken")
    }
    val tris = events.groupBy(_._2).toSeq.flatMap { case (_, rs) =>
      val o = rs.sortBy(_._1).map(_._3)
      o.indices.dropRight(2).map(i => (o(i), o(i + 1), o(i + 2)))
    }
    val counts = tris.groupBy(identity).map { case (k, v) =>
      k -> v.length.toLong }
    val top5 = counts.toSeq
      .sortBy { case ((a, b, c), n) => (-n, a, b, c) }.take(5)
    val got = SparkEntry.queries("q_funnel_paths")(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)),
        r.getLong(3)))
    assert(got.toSeq == top5)
  }

  test("q_kanon flags exactly the quasi-identifier groups under k=5") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("lang"), col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2) / 100))
    val expect = docs.groupBy(identity).map { case (k, v) =>
      (k._1, k._2, k._3, v.length.toLong, v.length < 5)
    }.toSeq.sortBy(x => (x._1, x._2, x._3))
    val got = SparkEntry.queries("q_kanon")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    assert(got.toSeq == expect)
  }

  test("q_sentence_chunks re-chunks the UDTF sentence stream by start offset") {
    val sents = SparkEntry.queries("q_udtf_gen")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val expect = sents.groupBy(_._1).toSeq.flatMap { case (doc, ss) =>
      val ordered = ss.sortBy(_._2)
      var off = 0L
      ordered.map { case (_, pos, sent) =>
        val chunk = off / 200
        off += sent.length
        (doc, chunk, pos, sent.length.toLong)
      }.groupBy(x => (x._1, x._2)).toSeq.map { case ((d2, c), xs) =>
        (d2, c, xs.length.toLong, xs.map(_._4).sum, xs.map(_._3).min)
      }
    }.sortBy(x => (x._1, x._2))
    val got = SparkEntry.queries("q_sentence_chunks")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == expect)
    // multi-chunk docs exist, so the boundary logic is actually exercised
    assert(got.map(_._1).distinct.length < got.length)
  }

  test("q_gaps_islands equals the brute-force streak decomposition") {
    val byUser = events.groupBy(_._2)
    val expect = byUser.toSeq.map { case (u, rs) =>
      val days = rs.map(_._1 / 86400000000L).distinct.sorted
      val streaks = days.foldLeft(List.empty[List[Long]]) {
        case (acc, d) => acc match {
          case (h @ (last :: _)) :: t if d == last + 1 => (d :: h) :: t
          case _ => List(d) :: acc
        }
      }.map(s => (s.length.toLong, s.min))
      val longest = streaks.minBy { case (len, start) => (-len, start) }
      (u, days.length.toLong, streaks.length.toLong, longest._1, longest._2)
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_gaps_islands")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == expect)
  }

  test("q_embed_gram equals the brute-force quantized moment sums") {
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getSeq[Double](1).toArray)
    val dims = 64
    val q = emb.map(_.map(x =>
      math.floor((math.max(x, -1.0) + 1.0) * 1000000.0).toLong))
    val n = q.length.toDouble
    val sums = (0 until dims).map(i => q.map(_(i)).sum)
    val got = SparkEntry.queries("q_embed_gram")(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2),
        r.getDouble(3)))).toMap
    assert(got.size == dims * (dims + 1) / 2)
    for (i <- 0 until dims; j <- i until dims) {
      val sij = q.map(v => v(i) * v(j)).sum
      val cov = ((sij.toDouble - sums(i).toDouble * sums(j) / n) / n) / 1e12
      val (gs, gc) = got((i.toLong, j.toLong))
      assert(gs == sij, s"s_ij($i,$j)")
      assert(math.abs(gc - cov) < 1e-6, s"cov($i,$j): $gc vs $cov")
    }
    // the diagonal is a variance — must be non-negative
    for (i <- 0 until dims)
      assert(got((i.toLong, i.toLong))._2 >= 0.0, s"var($i)")
  }

  test("q_skyline is exactly the non-dominated set") {
    val agg = events.groupBy(_._2).map { case (u, rs) =>
      (u, rs.map(x => vq(x._4)).sum,
        rs.count(_._3 == "error").toLong)
    }.toArray
    val expect = agg.filter { case (_, x, y) =>
      !agg.exists { case (_, x2, y2) =>
        (x2 > x && y2 <= y) || (x2 >= x && y2 < y)
      }
    }.map { case (u, x, y) => (u, x.toDouble / 1000.0, y) }
      .sortBy(_._1)
    val got = SparkEntry.queries("q_skyline")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(got.toSeq == expect.toSeq)
    assert(got.nonEmpty, "frontier should not be empty")
  }

  test("q_interp_linear bridges interior gaps linearly and matches LOCF at edges") {
    val out = SparkEntry.queries("q_interp_linear")(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]))))
    val byType = out.groupBy(_._1._1)
    // recompute per series from the raw events
    val e = events.map { case (us, _, t, v) => (t, (us / 3600000000L) * 3600, v) }
    val lo = e.map(_._2).min
    val hi = e.map(_._2).max
    byType.foreach { case (tpe, rows) =>
      val obs = e.filter(x => x._1 == tpe && x._3 > 90)
        .groupBy(_._2).map { case (h, xs) =>
          val avg = xs.map(_._3).sum / xs.length
          h -> math.floor(avg * 1e6 + 0.5) / 1e6
        }
      val sorted = rows.sortBy(_._1._2)
      assert(sorted.head._1._2 == lo && sorted.last._1._2 == hi)
      sorted.foreach { case ((_, h), (nObs, vLin)) =>
        if (obs.contains(h)) {
          assert(nObs > 0 && math.abs(vLin.get - obs(h)) < 2e-6,
            s"$tpe@$h observed cell")
        } else {
          assert(nObs == 0L)
          val prev = obs.keys.filter(_ < h)
          val next = obs.keys.filter(_ > h)
          (prev.nonEmpty, next.nonEmpty) match {
            case (true, true) =>
              val tp = prev.max; val tn = next.min
              val exp = obs(tp) + (obs(tn) - obs(tp)) *
                (h - tp).toDouble / (tn - tp).toDouble
              assert(math.abs(vLin.get - exp) < 2e-6, s"$tpe@$h interp")
            case (true, false) =>
              assert(math.abs(vLin.get - obs(prev.max)) < 2e-6)
            case (false, true) =>
              assert(math.abs(vLin.get - obs(next.min)) < 2e-6)
            case _             => fail(s"series $tpe has no observations")
          }
        }
      }
    }
  }

  test("q_dedup_incr flags exactly the increment docs with an earlier near-dup") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def shingles(t: String): Set[String] = {
      val toks = t.trim.toLowerCase
        .split("[ \t\n\f\r]+").filter(_.nonEmpty)
      val n = math.max(toks.length - 4, 1)
      (0 until n).map(i => toks.slice(i, i + 5).mkString(" ")).toSet
    }
    val sets = docs.map { case (id, t) => (id, shingles(t)) }
    val cutoff = (docs.map(_._1).max + 1) * 8 / 10
    def jacc(a: Set[String], b: Set[String]): Double = {
      val i = (a & b).size; i.toDouble / (a.size + b.size - i)
    }
    val expect = sets.filter(_._1 >= cutoff).map { case (id, s) =>
      val m = sets.count { case (id2, s2) =>
        id2 != id && (id2 < cutoff || id2 < id) && jacc(s2, s) >= 0.7
      }
      (id, m.toLong, m > 0)
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_dedup_incr")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.toSeq == expect.toSeq)
    assert(got.forall(_._1 >= cutoff), "only increment docs reported")
  }

  test("q_quantize_int8 matches the brute-force per-dim quantizer") {
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val dims = emb.head._2.length
    val scale = (0 until dims).map { j =>
      math.max(emb.map(x => math.abs(x._2(j))).max, 1e-12)
    }
    val expect = emb.map { case (id, v) =>
      var qn = 0L; var ef = 0L
      for (j <- 0 until dims) {
        val q = math.floor(v(j) / scale(j) * 127.0 + 0.5).toLong
        val e = v(j) - q * scale(j) / 127.0
        qn += q * q
        ef += math.floor(e * e * 1e12 + 0.5).toLong
        assert(q >= -127 && q <= 127, s"q out of int8 range: $q")
      }
      (id, qn, ef)
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_quantize_int8")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == expect.toSeq)
  }

  test("q_mmr_rerank replays the greedy MMR selection") {
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val nrm = emb.map { case (id, v) => id -> math.sqrt(dot(v, v)) }.toMap
    val vec = emb.toMap
    val q = vec(0L)
    val cand = emb.filter(_._1 != 0L)
      .map { case (id, v) => (id, dot(q, v) / (nrm(0L) * nrm(id))) }
      .sortBy { case (id, rel) => (-rel, id) }.take(20)
    var sel = Vector.empty[(Long, Double, Double)]
    for (_ <- 1 to 5) {
      val pick = cand.filter(c => !sel.exists(_._1 == c._1)).map {
        case (id, rel) =>
          val mx = if (sel.isEmpty) 0.0
            else sel.map(s =>
              dot(vec(id), vec(s._1)) / (nrm(id) * nrm(s._1))).max
          (id, rel, 0.7 * rel - 0.3 * mx)
      }.minBy { case (id, _, mmr) => (-mmr, id) }
      sel = sel :+ pick
    }
    val got = SparkEntry.queries("q_mmr_rerank")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.map(_._1).toSeq == (1L to 5L))
    assert(got.map(_._2).toSeq == sel.map(_._1))
    got.zip(sel).foreach { case ((_, _, rel, mmr), (_, eRel, eMmr)) =>
      assert(math.abs(rel - eRel) < 1e-6 && math.abs(mmr - eMmr) < 1e-6)
    }
    // diversification actually engages: picks are not simply top-5 by rel
    assert(got.map(_._2).toSet.size == 5)
  }

  test("Dist.globalLead matches a driver-side sorted lead") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 500).map { i =>
      (rnd.nextInt(40).toDouble, i.toLong, rnd.nextInt(1000).toLong)
    }
    val df = spark.createDataFrame(rows).toDF("v", "id", "x")
    val got = Dist.globalLead(df, "v", "id", "x", "nx", p = 7)
      .select(col("id"), col("nx")).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val ord = rows.sortBy(r => (r._1, r._2))
    val expect = ord.zipWithIndex.map { case ((_, id, _), i) =>
      id -> (if (i + 1 < ord.length) Some(ord(i + 1)._3) else None)
    }.toMap
    assert(got == expect)
  }

  test("q_concurrency: integral identity and span conservation hold") {
    val rows = SparkEntry.queries("q_concurrency")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty && rows.exists(_._1 >= 1))
    // rebuild sessions driver-side from the same 30-min-gap contract
    val evs = Tables.eventsWithTime(spark, sfDir)
      .select(col("user_id"), col("ts_us"), col("event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val sessions = evs.groupBy(_._1).values.flatMap { g =>
      val ord = g.sortBy(r => (r._2, r._3)).map(_._2)
      val bounds = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var start = ord.head; var prev = ord.head
      ord.tail.foreach { us =>
        if (us - prev >= 1800000000L) { bounds += ((start, prev)); start = us }
        prev = us
      }
      bounds += ((start, prev))
      bounds
    }.toSeq
    // ∫ concurrency dt == Σ session durations (the sweep-line invariant)
    val lhs = rows.map { case (lvl, _, tot) => lvl * tot }.sum
    val rhs = sessions.map { case (a, b) => b - a }.sum
    assert(lhs == rhs, s"integral $lhs != total session time $rhs")
    // Σ total_us across ALL levels == the swept span
    val span = sessions.map(_._2).max - sessions.map(_._1).min
    assert(rows.map(_._3).sum == span,
      s"segment durations ${rows.map(_._3).sum} != span $span")
  }

  test("q_degree_dist matches a brute-force degree histogram") {
    val got = SparkEntry.queries("q_degree_dist")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ok = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = li.flatMap { case (o, sk) =>
      ok.get(o).map(ck => (ck * 2, sk * 2 + 1)) }.distinct
    val deg = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (n, es) => n -> es.length.toLong }
    val expect = deg.groupBy { case (n, d) =>
      (if (n % 2 == 0) "customer" else "supplier",
        (63 - java.lang.Long.numberOfLeadingZeros(d)).toLong)
    }.map { case (k, g) =>
      k -> (g.size.toLong, g.values.min, g.values.max) }
    assert(got == expect)
  }

  test("q_source_overlap matches brute-force per-source shingle Jaccard") {
    val ss = Tables.documents(spark, sfDir)
      .select(col("source"),
        graft.functions.TextDedup.wordShingles(col("text")).as("toks"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toSet)
      .groupBy(_._1).map { case (s, g) =>
        s -> g.map(_._2).reduce(_ union _) }
    val expect = (for {
      a <- ss.keys; b <- ss.keys if a < b
      inter = (ss(a) intersect ss(b)).size if inter > 0
    } yield (a, b) -> (ss(a).size.toLong, ss(b).size.toLong,
      inter.toLong)).toMap
    val got = SparkEntry.queries("q_source_overlap")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == expect)
  }

  test("q_skew_audit matches a brute-force key histogram") {
    val keys = Tables.lineitem(spark, sfDir)
      .select(col("l_suppkey")).collect().map(_.getLong(0))
    val hist = keys.groupBy(identity).map { case (k, v) => k -> v.length }
    val total = keys.length.toDouble
    val top = hist.toSeq.sortBy { case (k, n) => (-n, k) }.take(5)
    val got = SparkEntry.queries("q_skew_audit")(spark, sfDir).collect()
    assert(got.length == math.min(5, hist.size))
    got.zip(top).zipWithIndex.foreach { case ((r, (k, n)), i) =>
      assert(r.getLong(0) == i + 1 && r.getLong(1) == k &&
        r.getLong(2) == n)
      assert(math.abs(r.getDouble(3) - n / total) < 1e-5)
      assert(r.getLong(4) == hist.size)
      val skew = hist.values.max * hist.size / total
      assert(math.abs(r.getDouble(5) - skew) < 1e-5)
    }
  }

  test("q_dataset_card: per-source totals and bounds are coherent") {
    val rows = SparkEntry.queries("q_dataset_card")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.map(_._2).sum == nDocs)
    rows.foreach { case (src, n, toks, nLangs, ent, q, dup) =>
      assert(n > 0 && toks >= n, src)
      assert(nLangs >= 1)
      // entropy of an nLangs-way categorical is at most ln(nLangs)
      assert(ent >= -1e-9 && ent <= math.log(nLangs.toDouble) + 1e-6, src)
      assert(q >= 0.0 && q <= 1.0, src)
      assert(dup >= 0.0 && dup < 1.0, src)
    }
  }

  test("q_textrank replays the 5 integer-PageRank rounds per doc") {
    val SCALE = 1000000000000L
    val sents = SparkEntry.queries("q_udtf_gen")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val got = SparkEntry.queries("q_textrank")(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val byDoc = sents.groupBy(_._1)
    assert(got.keySet == byDoc.keySet)
    byDoc.foreach { case (doc, ss) =>
      val ws = ss.map { case (_, sid, t) =>
        sid -> t.trim.toLowerCase
          .replaceAll("[ \\t\\n\\f\\r\\x0B]+", " ").split(" ", -1)
          .distinct.toSet
      }.toMap
      val sids = ws.keys.toSeq.sorted
      val edges = for {
        i <- sids; j <- sids if i != j
        w = (ws(i) intersect ws(j)).size.toLong if w >= 1
      } yield (i, j, w)
      val wdeg = edges.groupBy(_._1).map { case (k, es) =>
        k -> es.map(_._3).sum }
      val nS = sids.length
      var r = sids.map(sid => sid -> SCALE / nS).toMap
      for (_ <- 1 to 5) {
        // edge row (i, j, w): node i receives (w·r_j) div wdeg_j
        val cMap = sids.map { t =>
          t -> edges.collect { case (ti, tj, w) if ti == t =>
            (w * r(tj)) / wdeg(tj) }.sum
        }.toMap
        r = sids.map(sid =>
          sid -> ((15 * SCALE) / (100 * nS) + (85 * cMap(sid)) / 100))
          .toMap
      }
      val top = sids.maxBy(sid => (r(sid), -sid))
      val (gN, gSid, gScore) = got(doc)
      assert(gN == nS, s"doc $doc")
      assert(gSid == top, s"doc $doc top sentence")
      assert(gScore == r(top).toDouble / 1e12, s"doc $doc score")
    }
  }

  test("q_ab_srm matches a brute-force chi-square on arm counts") {
    val got = SparkEntry.queries("q_ab_srm")(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
      .toMap
    val arms = Tables.events(spark, sfDir)
      .select(col("event_type"), col("user_id")).collect()
      .map(r => (r.getString(0), r.getLong(1) % 2))
    arms.groupBy(_._1).foreach { case (t, g) =>
      val a = g.count(_._2 == 0).toLong
      val b = g.count(_._2 == 1).toLong
      val (ga, gb, chi2, flag) = got(t)
      assert(ga == a && gb == b, t)
      val d = (a - b).toDouble
      assert(math.abs(chi2 - d * d / (a + b)) < 1e-5, t)
      assert(flag == (100L * (a - b) * (a - b) > 384L * (a + b)), t)
    }
  }

  test("q_active_users: DAU never exceeds its week's WAU; totals hold") {
    val rows = SparkEntry.queries("q_active_users")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, dau, wau, st) =>
      assert(dau >= 1 && dau <= wau)
      assert(math.abs(st - dau.toDouble / wau) < 1e-5)
    }
    // brute force one day
    val evs = Tables.eventsWithTime(spark, sfDir)
      .select(col("ts_us"), col("user_id")).collect()
      .map(r => (r.getLong(0) / 86400000000L, r.getLong(1)))
    val d0 = rows.head._1
    val expectDau = evs.filter(_._1 == d0).map(_._2).distinct.length
    assert(rows.head._3 == expectDau)
  }

  test("q_disorder_audit matches a brute-force arrival-order walk") {
    val r = SparkEntry.queries("q_disorder_audit")(spark, sfDir).head()
    val evs = Tables.eventsWithTime(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts_us")).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val lates = evs.groupBy(_._1).values.flatMap { g =>
      val ord = g.sortBy(_._2).map(_._3)
      ord.zip(ord.tail).map { case (p, c) => math.max(0L, p - c) }
    }.toSeq
    assert(r.getLong(0) == lates.length)
    val nDis = lates.count(_ > 0).toLong
    assert(r.getLong(1) == nDis)
    assert(r.getLong(3) == (if (lates.isEmpty) 0L else lates.max))
    if (nDis == 0) assert(r.isNullAt(4), "avg lateness must be NULL " +
      "when nothing is disordered (both engines)")
  }

  test("q_lsh_tuning: recall is monotone in bands and ties out at 4x4") {
    val rows = SparkEntry.queries("q_lsh_tuning")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(rows.map(_._1).toSeq == Seq(2L, 4L, 8L))
    rows.foreach { case (b, rws, _, _, _) => assert(b * rws == 16) }
    // more bands = more candidate chances = recall can only grow
    val recalls = rows.sortBy(_._1).map(_._5)
    assert(recalls.zip(recalls.tail).forall { case (a, c) => a <= c })
    // the 4-band row IS q_dedup_minhash's config
    val mh = SparkEntry.queries("q_dedup_minhash")(spark, sfDir).count()
    assert(rows.find(_._1 == 4L).get._4 == mh)
  }

  test("q_dedup_recall ties out against the standalone pair miners") {
    val r = SparkEntry.queries("q_dedup_recall")(spark, sfDir).head()
    val (nTrue, nCand, nHit) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val (recall, precision) = (r.getDouble(3), r.getDouble(4))
    val exact = SparkEntry.queries("q_dedup_jaccard")(spark, sfDir).count()
    val lsh = SparkEntry.queries("q_dedup_minhash")(spark, sfDir).count()
    assert(nTrue == exact && nCand == lsh)
    // the miner verifies candidates exactly → no false positives ever
    assert(nHit == nCand && precision == 1.0)
    assert(nHit <= nTrue && recall > 0.0 && recall <= 1.0)
    assert(math.abs(recall - nHit.toDouble / nTrue) < 1e-5)
  }

  test("q_bpe_apply replays the merge table word-by-word") {
    val merges = Seq("t h" -> "th", "th e" -> "the", "i n" -> "in",
      "a n" -> "an", "an d" -> "and", "e r" -> "er", "o n" -> "on",
      "r e" -> "re")
    def applyMerges(w: String): Int = {
      var s = " " + w.toCharArray.mkString(" ") + " "
      merges.foreach { case (a, b) => s = s.replace(s" $a ", s" $b ") }
      s.trim.split(" ").length
    }
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val expect = docs.map { case (id, t) =>
      val ws = t.trim.toLowerCase
        .replaceAll("[ \\t\\n\\f\\r\\x0B]+", " ").split(" ", -1)
        .filter(_.nonEmpty)
      id -> (ws.map(_.length.toLong).sum,
        ws.map(w => applyMerges(w).toLong).sum)
    }.toMap
    val got = SparkEntry.queries("q_bpe_apply")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == expect)
    // merges actually fire: tokens strictly below chars somewhere
    assert(got.values.exists { case (c, t) => t < c })
  }

  test("q_cdc_apply materializes latest-op-wins state with tombstones") {
    val log = Tables.eventsWithTime(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts_us"),
        col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    val byUser = log.groupBy(_._1)
    val expect = byUser.flatMap { case (u, rows) =>
      val last = rows.maxBy(r => (r._3, r._2))
      if (last._4 == "error") None // trailing delete tombstones the key
      else Some(u -> (rows.length.toLong,
        rows.count(_._4 == "error").toLong, last._2, last._4, last._5))
    }
    val got = SparkEntry.queries("q_cdc_apply")(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getDouble(5))).toMap
    assert(got == expect)
    // tombstoning engages: at least one user's latest op is a delete
    assert(got.keySet != byUser.keySet,
      "no trailing deletes in the corpus — tombstone path untested")
  }

  test("q_pmi matches a brute-force collocation scan (incl. quantization)") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("text")).collect().map(_.getString(0))
    val bigrams = docs.flatMap { t =>
      val ws = t.trim.toLowerCase
        .replaceAll("[ \\t\\n\\f\\r\\x0B]+", " ").split(" ", -1)
      if (ws.length < 2) Nil else ws.sliding(2).map(a => (a(0), a(1))).toSeq
    }
    val c2 = bigrams.groupBy(identity).map { case (k, v) => k -> v.length }
    val ca = bigrams.groupBy(_._1).map { case (k, v) => k -> v.length }
    val cb = bigrams.groupBy(_._2).map { case (k, v) => k -> v.length }
    val t = bigrams.length
    val scored = c2.toSeq.filter(_._2 >= 5).map { case ((a, b), n2) =>
      val pmiU = math.floor(math.log(n2.toDouble * t /
        (ca(a).toDouble * cb(b))) * 1e6 + 0.5).toLong
      (a, b, n2.toLong, pmiU)
    }.sortBy { case (a, b, _, u) => (-u, a, b) }.take(20)
      .map { case (a, b, n2, u) => (a, b, n2, u / 1e6) }
    val got = SparkEntry.queries("q_pmi")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == scored)
    assert(got.nonEmpty)
  }
}
