package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.NativeExpressions
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Tables

/** Round-11 second-leg operators — each cross-checked against an
  * independent driver-side brute-force recomputation on the sf0.001
  * corpus (the DuckDB hash gate is the second, engine-external check):
  * Jarque–Bera, Grubbs, Kendall tau-b, Cohen's d, Brown–Forsythe, EWMA
  * chart, HITS, clustering coefficient, PR-AUC, Lorenz curve, PII scrub,
  * script profile, URL normalization, curriculum interleave, JL random
  * projection, null-safe join, and the session profile.
  */
class Round11bSpec extends AnyFunSuite {
  import SparkFixture.{spark, sfDir}

  private def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  private lazy val events: Array[(Long, Long, String, Double, Long)] =
    Tables.eventsWithTime(spark, sfDir)
      .select(col("ts_us"), col("user_id"), col("event_type"),
        col("value"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3), r.getLong(4)))

  private lazy val docs: Array[(Long, String, String, String, Long)] =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))

  /** day index of a ts_us value under the UTC session the queries use */
  private def dayOf(tsUs: Long): Long = tsUs / 86400000000L

  private lazy val dailyCounts: Map[Long, Long] =
    events.groupBy(e => dayOf(e._1)).map { case (d, es) =>
      d -> es.length.toLong
    }

  private def dailyByType(t: String): Map[Long, Long] =
    events.filter(_._3 == t).groupBy(e => dayOf(e._1)).map {
      case (d, es) => d -> es.length.toLong
    }

  // ---------------------------------------------------------- statistics

  test("q_jarque_bera replays the moment closed form per type") {
    val rows = SparkEntry.queries("q_jarque_bera")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = r.getString(0)
      val ys = events.filter(_._3 == t).groupBy(e => dayOf(e._1))
        .map(_._2.length.toLong).toSeq
      val n = ys.length.toDouble
      assert(r.getLong(1) == ys.length.toLong)
      val mu = ys.sum / n
      val r2 = ys.map(y => y.toDouble * y).sum / n
      val r3 = ys.map(y => y.toDouble * y * y).sum / n
      val r4 = ys.map(y => y.toDouble * y * y * y).sum / n
      val m2 = r2 - mu * mu
      val m3 = r3 - 3 * mu * r2 + 2 * mu * mu * mu
      val m4 = r4 - 4 * mu * r3 + 6 * mu * mu * r2 - 3 * mu * mu * mu * mu
      val sk = m3 / (math.sqrt(m2) * m2)
      val ku = m4 / (m2 * m2)
      assert(math.abs(r.getDouble(2) - q6(sk)) < 2e-6)
      assert(math.abs(r.getDouble(3) - q6(ku)) < 2e-6)
      val jb = n / 6 * (sk * sk + (ku - 3) * (ku - 3) / 4)
      assert(math.abs(r.getDouble(4) - q6(jb)) < 2e-6)
    }
  }

  test("q_grubbs picks the integer-argmax day and replays G") {
    val r = SparkEntry.queries("q_grubbs")(spark, sfDir).collect().head
    val ys = dailyCounts.toSeq.sortBy(_._1)
    val n = ys.length
    val s1 = ys.map(_._2).sum
    val best = ys.map { case (d, y) =>
      (d, y, (BigInt(y) * n - s1).abs)
    }.maxBy(t => (t._3, -t._1))
    assert(r.getLong(0) == n.toLong && r.getLong(1) == best._1)
    assert(r.getLong(2) == best._2)
    val mu = s1.toDouble / n
    val vr = (ys.map(y => y._2.toDouble * y._2).sum - s1.toDouble * s1 / n) /
      (n - 1)
    assert(math.abs(r.getDouble(5) -
      q6(math.abs(best._2 - mu) / math.sqrt(vr))) < 2e-6)
  }

  test("q_kendall_tau replays the O(d^2) concordance count") {
    val r = SparkEntry.queries("q_kendall_tau")(spark, sfDir)
      .collect().head
    val clicks = dailyByType("click").withDefaultValue(0L)
    val purch = dailyByType("purchase").withDefaultValue(0L)
    val days = dailyCounts.keys.toSeq.sorted
    var c = 0L; var dct = 0L; var n1 = 0L; var n2 = 0L; var n0 = 0L
    for (i <- days.indices; j <- i + 1 until days.length) {
      val (x1, y1) = (clicks(days(i)), purch(days(i)))
      val (x2, y2) = (clicks(days(j)), purch(days(j)))
      n0 += 1
      if (x1 == x2) n1 += 1
      if (y1 == y2) n2 += 1
      val sg = math.signum((x2 - x1).toDouble) *
        math.signum((y2 - y1).toDouble)
      if (sg > 0) c += 1 else if (sg < 0) dct += 1
    }
    assert(r.getLong(0) == n0 && r.getLong(1) == c && r.getLong(2) == dct)
    val den = math.sqrt((n0 - n1).toDouble * (n0 - n2).toDouble)
    assert(math.abs(r.getDouble(3) - q6((c - dct) / den)) < 2e-6)
  }

  test("q_cohens_d replays the pooled-SD effect size per type") {
    val rows = SparkEntry.queries("q_cohens_d")(spark, sfDir).collect()
    rows.foreach { r =>
      val t = r.getString(0)
      def arm(a: Long) = events.filter(e => e._3 == t && e._2 % 2 == a)
        .map(e => math.floor(e._4 * 1000.0 + 0.5).toLong)
      val (va0, vb0) = (arm(0), arm(1))
      assert(r.getLong(1) == va0.length.toLong &&
        r.getLong(2) == vb0.length.toLong)
      def stats(v: Array[Long]) = {
        val n = v.length.toDouble
        val mn = v.sum.toDouble / n
        val vr = (v.map(x => x.toDouble * x).sum - v.sum.toDouble *
          v.sum / n) / (n - 1)
        (n, mn, vr)
      }
      val (na, ma, va) = stats(va0)
      val (nb, mb, vb) = stats(vb0)
      val sp = math.sqrt(((na - 1) * va + (nb - 1) * vb) / (na + nb - 2))
      assert(math.abs(r.getDouble(3) - q6((ma - mb) / sp)) < 2e-6)
      val g = (ma - mb) / sp * (1.0 - 3.0 / (4.0 * (na + nb) - 9.0))
      assert(math.abs(r.getDouble(4) - q6(g)) < 2e-6)
    }
  }

  test("q_levene_bf replays the lower-median deviation rationals") {
    val r = SparkEntry.queries("q_levene_bf")(spark, sfDir)
      .collect().head
    val byType = events.groupBy(_._3)
    assert(r.getLong(0) == byType.size.toLong)
    assert(r.getLong(1) == events.length.toLong)
    case class G(nj: Long, sj: BigInt, qj: BigInt)
    val gs = byType.values.map { es =>
      val sorted = es.map(e =>
        (math.floor(e._4 * 1000.0 + 0.5).toLong, e._5)).sortBy(identity)
      val med = sorted((sorted.length + 1) / 2 - 1)._1
      val zs = sorted.map(v => math.abs(v._1 - med))
      G(zs.length.toLong, zs.map(BigInt(_)).sum,
        zs.map(z => BigInt(z) * z).sum)
    }.toSeq
    val k = gs.length
    val n = gs.map(_.nj).sum
    val s = gs.map(_.sj).sum
    val tTot = gs.map(g => g.sj * g.sj / g.nj).sum
    val denom = gs.map(g => g.qj - g.sj * g.sj / g.nj).sum
    val w = (n - k).toDouble / (k - 1).toDouble *
      (tTot - s * s / n).toDouble / denom.toDouble
    assert(math.abs(r.getDouble(2) - q6(w)) < 2e-6)
  }

  test("q_ewma_chart replays the 16-tap fold and the limit rule") {
    val rows = SparkEntry.queries("q_ewma_chart")(spark, sfDir).collect()
    val ys = dailyCounts.toSeq.sortBy(_._1)
    assert(rows.length == ys.length)
    val n = ys.length
    val s1 = ys.map(_._2).sum
    val mu = s1.toDouble / n
    val vr = (ys.map(y => y._2.toDouble * y._2).sum -
      s1.toDouble * s1 / n) / (n - 1)
    val limit = 3.0 * math.sqrt(vr) * math.sqrt(0.2 / 1.8)
    rows.zipWithIndex.foreach { case (r, t) =>
      assert(r.getLong(0) == ys(t)._1 && r.getLong(1) == ys(t)._2)
      // identical Horner fold: innermost lag first
      var acc = if (t - 15 >= 0) ys(t - 15)._2.toDouble else 0.0
      for (k <- 14 to 1 by -1) {
        val yk = if (t - k >= 0) ys(t - k)._2.toDouble else 0.0
        acc = yk + 0.8 * acc
      }
      val z = 0.2 * (ys(t)._2.toDouble + 0.8 * acc)
      assert(math.abs(r.getDouble(2) - q6(z)) < 2e-6)
      assert(r.getBoolean(3) == math.abs(z - mu) > limit)
    }
  }

  // ---------------------------------------------------------------- graph

  private lazy val purchaseEdges: Set[(Long, Long)] =
    Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_suppkey"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("q_hits replays the normalized mutual-reinforcement rounds") {
    val rows = SparkEntry.queries("q_hits")(spark, sfDir).collect()
    val scale = BigInt(1000000000000L)
    var hub: Map[Long, BigInt] =
      purchaseEdges.map(_._1).map(_ -> scale).toMap
    var auth: Map[Long, BigInt] = Map.empty
    for (_ <- 1 to 2) {
      val araw = purchaseEdges.toSeq.groupBy(_._2).map { case (sk, es) =>
        sk -> es.map(e => hub(e._1)).sum
      }
      val ta = araw.values.sum
      auth = araw.map { case (sk, a) => sk -> (scale * a / ta) }
      val hraw = purchaseEdges.toSeq.groupBy(_._1).map { case (ck, es) =>
        ck -> es.map(e => auth(e._2)).sum
      }
      val th = hraw.values.sum
      hub = hraw.map { case (ck, h) => ck -> (scale * h / th) }
    }
    val gotHubs = rows.filter(_.getString(0) == "hub")
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    val gotAuths = rows.filter(_.getString(0) == "authority")
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(gotHubs == hub.map { case (k, v) => k -> v.toLong })
    assert(gotAuths == auth.map { case (k, v) => k -> v.toLong })
  }

  test("q_clustering_coef replays brute-force triangle counts") {
    // co-purchase graph: parts sharing an order basket, support >= 2
    val baskets = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values.map(_.map(_._2).sorted)
    val support = scala.collection.mutable.Map[(Long, Long), Int]()
    baskets.foreach { ps =>
      for (i <- ps.indices; j <- i + 1 until ps.length)
        support((ps(i), ps(j))) = support.getOrElse((ps(i), ps(j)), 0) + 1
    }
    val edges = support.filter(_._2 >= 2).keys.toSet
    val adj = scala.collection.mutable.Map[Long, Set[Long]]()
      .withDefaultValue(Set.empty)
    edges.foreach { case (a, b) =>
      adj(a) = adj(a) + b; adj(b) = adj(b) + a
    }
    val rows = SparkEntry.queries("q_clustering_coef")(spark, sfDir)
      .collect()
    assert(rows.map(_.getLong(0)).toSet == adj.keys.toSet)
    rows.foreach { r =>
      val v = r.getLong(0)
      val nb = adj(v).toSeq
      assert(r.getLong(1) == nb.length.toLong)
      val tri = (for {
        i <- nb.indices; j <- i + 1 until nb.length
        a = math.min(nb(i), nb(j)); b = math.max(nb(i), nb(j))
        if edges((a, b))
      } yield 1).size.toLong
      assert(r.getLong(2) == tri)
      val expCc = if (nb.length >= 2)
        q6(2.0 * tri / (nb.length.toDouble * (nb.length - 1))) else 0.0
      assert(math.abs(r.getDouble(3) - expCc) < 2e-6)
    }
  }

  // ------------------------------------------------------------ retrieval

  test("q_pr_auc replays the quantized precision@k sum per source") {
    val rows = SparkEntry.queries("q_pr_auc")(spark, sfDir).collect()
    val bySource = docs.groupBy(_._4)
    rows.foreach { r =>
      val src = r.getString(0)
      val ranked = bySource(src).sortBy(d => (-d._5, d._1))
      var cum = 0L; var k = 0L; var sp = BigInt(0); var np = 0L
      ranked.foreach { d =>
        k += 1
        val pos = d._3 == "en"
        if (pos) {
          cum += 1; np += 1
          sp += BigInt(1000000L) * cum / k
        }
      }
      assert(r.getLong(1) == np)
      assert(r.getLong(2) == (sp / np).toLong)
    }
  }

  test("q_lorenz replays decile boundaries on exact cents") {
    val revs = {
      val byCust = Tables.orders(spark, sfDir)
        .select(col("o_custkey"), col("o_totalprice")).collect()
        .map(r => (r.getLong(0),
          math.floor(r.getDouble(1) * 100.0 + 0.5).toLong))
        .groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).sum }
      Tables.customer(spark, sfDir).select(col("c_custkey")).collect()
        .map(r => r.getLong(0))
        .map(c => (c, byCust.getOrElse(c, 0L)))
    }
    val sorted = revs.sortBy(t => (t._2, t._1))
    val n = sorted.length
    val tr = sorted.map(_._2).sum
    case class D(cumN: Long, cumRev: Long)
    var cumRev = 0L
    val per = scala.collection.mutable.Map[Long, D]()
    sorted.zipWithIndex.foreach { case ((_, rev), i) =>
      cumRev += rev
      val dec = i.toLong * 10 / n + 1
      per(dec) = D(i.toLong + 1, cumRev)
    }
    val rows = SparkEntry.queries("q_lorenz")(spark, sfDir).collect()
    rows.foreach { r =>
      val d = per(r.getLong(0))
      assert(r.getLong(1) == d.cumN)
      assert(math.abs(r.getDouble(2) - q6(d.cumN.toDouble / n)) < 2e-6)
      assert(math.abs(r.getDouble(3) - q6(d.cumRev.toDouble / tr)) < 2e-6)
    }
  }

  // ----------------------------------------------------------------- text

  test("q_pii_scrub finds the planted PII and fingerprints the scrub") {
    val rows = SparkEntry.queries("q_pii_scrub")(spark, sfDir).collect()
    assert(rows.length == docs.length)
    val byId = docs.map(d => d._1 -> d._2).toMap
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phoneRe = "\\+1-555-[0-9]{4}"
    val ipRe = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
    rows.take(50).foreach { r =>
      val id = r.getLong(0)
      val t = byId(id) + " contact user" + id + "@example.com or call " +
        "+1-555-" + "%04d".format(id % 10000) + " from 10." +
        (id % 256) + ".0.1"
      assert(r.getLong(1) == emailRe.r.findAllMatchIn(t).size.toLong)
      assert(r.getLong(2) == phoneRe.r.findAllMatchIn(t).size.toLong)
      assert(r.getLong(3) == ipRe.r.findAllMatchIn(t).size.toLong)
      assert(r.getLong(1) >= 1 && r.getLong(2) >= 1 && r.getLong(3) >= 1)
      val scrub = t.replaceAll(emailRe, "[EMAIL]")
        .replaceAll(phoneRe, "[PHONE]").replaceAll(ipRe, "[IP]")
      assert(r.getLong(4) == scrub.length.toLong)
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(scrub.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(r.getString(5) == hex)
    }
  }

  test("q_script_profile ratios come from exact class counts") {
    val rows = SparkEntry.queries("q_script_profile")(spark, sfDir)
      .collect()
    val byLang = docs.groupBy(_._3)
    assert(rows.map(_.getString(0)).toSet == byLang.keys.toSet)
    rows.foreach { r =>
      val ds = byLang(r.getString(0))
      assert(r.getLong(1) == ds.length.toLong)
      val tn = ds.map(_._2.length.toLong).sum
      val ta = ds.map(_._2.count(c =>
        (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')).toLong).sum
      val td = ds.map(_._2.count(c => c >= '0' && c <= '9').toLong).sum
      val tsp = ds.map(_._2.count(_ == ' ').toLong).sum
      assert(math.abs(r.getDouble(2) - q6(ta.toDouble / tn)) < 2e-6)
      assert(math.abs(r.getDouble(3) - q6(td.toDouble / tn)) < 2e-6)
      assert(math.abs(r.getDouble(4) - q6(tsp.toDouble / tn)) < 2e-6)
      assert(math.abs(r.getDouble(5) -
        q6((tn - ta - td - tsp).toDouble / tn)) < 2e-6)
    }
  }

  test("q_url_normalize strips tracking state and keys by domain") {
    val rows = SparkEntry.queries("q_url_normalize")(spark, sfDir)
      .collect()
    val bySource = docs.groupBy(_._4)
    assert(rows.length == bySource.size)
    rows.foreach { r =>
      val domain = r.getString(0)
      assert(domain.endsWith(".example.com") && !domain.contains("www"))
      val src = domain.stripSuffix(".example.com")
      val ds = bySource(src)
      assert(r.getLong(1) == ds.length.toLong)
      // normalized URLs differ in /p/<doc_id> so all are distinct
      assert(r.getLong(2) == ds.length.toLong)
    }
  }

  test("q_curriculum interleaves deciles round-robin") {
    val rows = SparkEntry.queries("q_curriculum")(spark, sfDir).collect()
    assert(rows.length == docs.length)
    val sorted = docs.sortBy(d => (d._5, d._1))
    val n = sorted.length
    val expect = sorted.zipWithIndex.map { case (d, i) =>
      d._1 -> (i.toLong * 10 / n + 1)
    }.toMap
    rows.foreach { r =>
      assert(r.getLong(1) == expect(r.getLong(0)))
      assert(r.getLong(3) == (r.getLong(2) - 1) * 10 + r.getLong(1))
    }
    // the first 10 seq values cover each decile exactly once
    val head = rows.sortBy(_.getLong(3)).take(10).map(_.getLong(1)).toSet
    assert(head == (1L to 10L).toSet)
  }

  // -------------------------------------------------------------- vectors

  test("q_random_projection coordinates are exact integer dots") {
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val rows = SparkEntry.queries("q_random_projection")(spark, sfDir)
      .collect()
    assert(rows.length == vecs.length * 16)
    val got = rows.map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    vecs.take(25).foreach { case (id, emb) =>
      val q = emb.map(x => math.floor(
        (math.max(x.toDouble, -1.0) + 1.0) * 1000000.0).toLong)
      for (k <- 0 until 16) {
        val y = q.indices.map { j =>
          val h = NativeExpressions.splitmix64Long(k.toLong * 4096L + j)
          val sg = if ((h & 1L) == 0L) 1L else -1L
          sg * q(j)
        }.sum
        assert(got((id, k.toLong)) == y)
      }
    }
  }

  // ------------------------------------------------------------ relational

  test("q_nullsafe_join matches NULL keys and counts per nation") {
    val cn = Tables.customer(spark, sfDir)
      .select(col("c_nationkey").cast("long"))
      .collect().map(_.getLong(0))
    val sn = Tables.supplier(spark, sfDir)
      .select(col("s_nationkey").cast("long"))
      .collect().map(_.getLong(0))
    val rows = SparkEntry.queries("q_nullsafe_join")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nations = (cn ++ sn).distinct
    nations.foreach { nk =>
      val key = if (nk == 0) -1L else nk
      val expected = cn.count(_ == nk).toLong * sn.count(_ == nk)
      if (expected > 0) assert(rows(key) == expected)
    }
    // the NULL partition is present iff nation 0 has both sides
    assert(rows.contains(-1L) ==
      (cn.contains(0L) && sn.contains(0L)))
  }

  test("q_session_stats buckets replay the gap sessionization") {
    case class Sess(n: Long, dur: Long)
    val sessions = events.groupBy(_._2).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._1, e._5))
      val out = scala.collection.mutable.ArrayBuffer[Sess]()
      var start = -1L; var last = -1L; var cnt = 0L
      sorted.foreach { e =>
        if (start < 0 || e._1 - last >= 1800000000L) {
          if (start >= 0) out += Sess(cnt, last - start)
          start = e._1; cnt = 0
        }
        last = e._1; cnt += 1
      }
      if (start >= 0) out += Sess(cnt, last - start)
      out
    }.toSeq
    def bucket(n: Long) =
      if (n == 1) "1" else if (n <= 4) "2-4" else if (n <= 9) "5-9"
      else "10+"
    val exp = sessions.groupBy(s => bucket(s.n))
    val rows = SparkEntry.queries("q_session_stats")(spark, sfDir)
      .collect()
    assert(rows.map(_.getString(0)).toSet == exp.keys.toSet)
    rows.foreach { r =>
      val ss = exp(r.getString(0))
      assert(r.getLong(1) == ss.length.toLong)
      assert(r.getLong(2) == ss.map(_.n).sum)
      val avg = q6(ss.map(_.dur).sum.toDouble / ss.length / 1e6)
      assert(math.abs(r.getDouble(3) - avg) < 2e-6)
      assert(math.abs(r.getDouble(4) - ss.map(_.dur).max / 1000000.0)
        < 1e-9)
    }
  }

  // -------------------------------------------------- round-11 third leg

  test("q_ccf at lag 0 replays the direct cross-correlation") {
    val clicks = dailyByType("click").withDefaultValue(0L)
    val purch = dailyByType("purchase").withDefaultValue(0L)
    val days = dailyCounts.keys.toSeq.sorted
    val xs = days.map(clicks); val ys = days.map(purch)
    val n = days.length.toDouble
    val mx = xs.sum / n; val my = ys.sum / n
    val rows = SparkEntry.queries("q_ccf")(spark, sfDir).collect()
    assert(rows.length == 15)
    val at0 = rows.find(_.getLong(0) == 0L).get
    assert(at0.getLong(1) == days.length.toLong)
    val num = xs.zip(ys).map { case (x, y) =>
      (x - mx) * (y - my) }.sum
    val den = math.sqrt(xs.map(x => (x - mx) * (x - mx)).sum *
      ys.map(y => (y - my) * (y - my)).sum)
    assert(math.abs(at0.getDouble(2) - num / den) < 1e-4)
    // lag symmetry of the overlap count
    rows.foreach { r =>
      assert(r.getLong(1) == days.length - math.abs(r.getLong(0)))
    }
  }

  test("q_bollinger band math replays the rolling moments") {
    val ys = dailyCounts.toSeq.sortBy(_._1)
    val rows = SparkEntry.queries("q_bollinger")(spark, sfDir).collect()
    assert(rows.length == ys.length)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) == ys(i)._1 && r.getLong(1) == ys(i)._2)
      if (i < 6) {
        assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
        assert(!r.getBoolean(5))
      } else {
        val w = ys.slice(i - 6, i + 1).map(_._2)
        val mid = w.sum.toDouble / 7
        val vr = (w.map(y => y.toDouble * y).sum -
          w.sum.toDouble * w.sum / 7) / 6
        assert(math.abs(r.getDouble(2) - q6(mid)) < 2e-6)
        assert(math.abs(r.getDouble(3) - q6(mid + 2 * math.sqrt(vr)))
          < 2e-6)
        assert(math.abs(r.getDouble(4) - q6(mid - 2 * math.sqrt(vr)))
          < 2e-6)
        assert(r.getBoolean(5) ==
          (ys(i)._2 > mid + 2 * math.sqrt(vr) ||
            ys(i)._2 < mid - 2 * math.sqrt(vr)))
      }
    }
  }

  test("q_hurst replays the R/S fold and stays in (0, 1.5)") {
    val ys = dailyCounts.toSeq.sortBy(_._1).map(_._2)
    val rows = SparkEntry.queries("q_hurst")(spark, sfDir).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(5L, 10L, 15L))
    rows.foreach { r =>
      val w = r.getLong(0).toInt
      val nSegs = ys.length / w
      assert(r.getLong(1) == nSegs.toLong)
      val rs6s = (0 until nSegs).flatMap { g =>
        val seg = ys.slice(g * w, g * w + w)
        val s = seg.sum
        val ss = seg.map(y => BigInt(y) * y).sum
        var c = 0L
        val zs = seg.zipWithIndex.map { case (y, k) =>
          c += y; w * c - (k + 1) * s
        }
        val den2 = (BigInt(w) * ss - BigInt(s) * s).toDouble
        if (den2 > 0)
          Some(math.floor((zs.max - zs.min).toDouble /
            math.sqrt(den2) * 1e6 + 0.5).toLong)
        else None
      }
      val meanU = rs6s.sum / rs6s.length
      assert(math.abs(r.getDouble(2) - meanU.toDouble / 1e6) < 1e-9)
      val h = r.getDouble(3)
      assert(h > 0.0 && h < 1.5)
    }
  }

  test("q_silhouette separates labels against brute-force centroids") {
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label").cast("long"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Float](2).toArray))
    def quant(x: Float): Long =
      math.floor((math.max(x.toDouble, -1.0) + 1.0) * 1000000.0).toLong
    val labels = vecs.map(_._2).distinct.sorted
    val cent = labels.map { l =>
      val vs = vecs.filter(_._2 == l)
      l -> Array.tabulate(64) { j =>
        val sq = vs.map(v => quant(v._3(j))).sum
        (math.floor(sq.toDouble / vs.length + 0.5) - 1000000.0).toLong
      }
    }.toMap
    val sums = scala.collection.mutable.Map[Long, (Long, Long)]()
      .withDefaultValue((0L, 0L))
    vecs.foreach { case (_, l, emb) =>
      val qc = emb.map(x => quant(x) - 1000000L)
      val ssv = qc.map(v => v * v).sum
      val cos = labels.map { l2 =>
        val c = cent(l2)
        val dot = qc.indices.map(j => qc(j) * c(j)).sum
        val ssc = c.map(v => v * v).sum
        l2 -> dot.toDouble / (math.sqrt(ssv.toDouble) *
          math.sqrt(ssc.toDouble))
      }.toMap
      val cown = cos(l)
      val cmax = cos.filter(_._1 != l).values.max
      val g = math.max(1.0 - cown, 1.0 - cmax)
      if (g > 0) {
        val s6 = math.floor((cown - cmax) / g * 1e6 + 0.5).toLong
        val (n, t) = sums(l); sums(l) = (n + 1, t + s6)
      }
    }
    val rows = SparkEntry.queries("q_silhouette")(spark, sfDir).collect()
    rows.foreach { r =>
      val (n, t) = sums(r.getLong(0))
      assert(r.getLong(1) == n)
      assert(r.getLong(2) == t / n)
    }
  }

  test("q_mahalanobis top-20 replays the integer z-term distance") {
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label").cast("long"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Float](2).toArray))
    def quant(x: Float): Long =
      math.floor((math.max(x.toDouble, -1.0) + 1.0) * 1000000.0).toLong
    val n = vecs.length
    val stats = Array.tabulate(64) { j =>
      val qs = vecs.map(v => quant(v._3(j)))
      val s1 = qs.sum; val s2 = qs.map(q => BigInt(q) * q).sum
      val mu = s1.toDouble / n
      val sd = math.sqrt((s2.toDouble - s1.toDouble * s1 / n) / n + 1e-12)
      (mu, sd)
    }
    val scores = vecs.map { case (id, l, emb) =>
      val md2 = emb.indices.map { j =>
        val (mu, sd) = stats(j)
        val z3 = math.floor((quant(emb(j)) - mu) / sd * 1000.0 + 0.5)
          .toLong
        z3 * z3
      }.sum
      (id, l, md2)
    }.sortBy(t => (-t._3, t._1)).take(20)
    val rows = SparkEntry.queries("q_mahalanobis")(spark, sfDir).collect()
    assert(rows.length == 20)
    rows.zip(scores).foreach { case (r, (id, l, md2)) =>
      assert(r.getLong(0) == id && r.getLong(1) == l &&
        r.getLong(2) == md2)
    }
  }
}
