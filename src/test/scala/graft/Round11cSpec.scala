package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Tables

/** Round-11 third-leg additions — each cross-checked against an
  * independent driver-side brute-force recomputation on the sf0.001
  * corpus (the DuckDB hash gate is the second, engine-external check):
  * Bartlett, Cochran's Q, Mood's median, AR(2) Yule–Walker, the
  * quantized-basis periodogram, Bayesian A/B, Adamic–Adar, sampled
  * eccentricity, TPC-H Q18, RAKE keywords, the leakage-safe split, and
  * the schema-drift audit.
  */
class Round11cSpec extends AnyFunSuite {
  import SparkFixture.{spark, sfDir}

  private def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  private lazy val events: Array[(Long, Long, String, Double, Long)] =
    Tables.eventsWithTime(spark, sfDir)
      .select(col("ts_us"), col("user_id"), col("event_type"),
        col("value"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3), r.getLong(4)))

  private lazy val docs: Array[(Long, String, Long)] =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("n_chars"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

  private def dayOf(tsUs: Long): Long = tsUs / 86400000000L

  private def vq(value: Double): Long =
    math.floor(value * 1000.0 + 0.5).toLong

  private def norm(s: String): String =
    s.trim.toLowerCase.replaceAll("[ \\t\\n\\f\\r\\u000B]+", " ")

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // ---------------------------------------------------------- statistics

  test("q_bartlett replays the quantized-ln pooled-variance statistic") {
    val r = SparkEntry.queries("q_bartlett")(spark, sfDir).collect().head
    val groups = events.groupBy(_._3).values.toSeq
      .map(_.map(e => vq(e._4)))
    val k = groups.size.toLong
    val n = groups.map(_.length.toLong).sum
    var sumLj = 0L
    var sswU = BigInt(0)
    var sumRj = 0L
    groups.foreach { g =>
      val nj = g.length.toLong
      val sj = BigInt(g.sum)
      val qj = g.map(v => BigInt(v) * v).sum
      val vjD = (qj.toDouble - sj.toDouble * sj.toDouble / nj) / (nj - 1)
      assert(vjD > 0, "no degenerate groups in the corpus")
      sumLj += (nj - 1) * math.floor(math.log(vjD) * 1e6 + 0.5).toLong
      sswU += qj - (sj * sj) / nj
      sumRj += 1000000000000L / (nj - 1)
    }
    val sp2 = sswU.toDouble / (n - k)
    val lp = math.floor(math.log(sp2) * 1e6 + 0.5)
    val tU = (n - k).toDouble * lp - sumLj.toDouble
    val c = 1.0 + (sumRj / 1e12 - 1.0 / (n - k)) / (3.0 * (k - 1))
    assert(r.getLong(0) == k && r.getLong(1) == n && r.getLong(2) == k - 1)
    assert(math.abs(r.getDouble(3) - q6(tU / 1e6 / c)) < 2e-6)
  }

  test("q_cochran_q replays the binary repeated-measures statistic") {
    val r = SparkEntry.queries("q_cochran_q")(spark, sfDir).collect().head
    val pairs = events.map(e => (e._2, dayOf(e._1), e._3)).distinct
    val k = pairs.map(_._3).distinct.length.toLong
    val ri = pairs.groupBy(p => (p._1, p._2)).map(_._2.length.toLong)
    val cj = pairs.groupBy(_._3).map(_._2.length.toLong)
    val nTot = ri.sum
    val num = (k - 1).toDouble *
      (k.toDouble * cj.map(c => c * c).sum - nTot.toDouble * nTot)
    val den = k.toDouble * nTot - ri.map(x => x * x).sum.toDouble
    assert(r.getLong(0) == k && r.getLong(1) == ri.size.toLong)
    assert(r.getLong(2) == k - 1)
    assert(math.abs(r.getDouble(3) - q6(num / den)) < 2e-6)
  }

  test("q_mood_median replays the lower median and integer chi-square") {
    val r = SparkEntry.queries("q_mood_median")(spark, sfDir)
      .collect().head
    val vs = events.map(e => vq(e._4)).sorted
    val n = vs.length.toLong
    val med = vs(((n + 1) / 2 - 1).toInt)
    assert(r.getDouble(2) == med.toDouble / 1000.0)
    val byType = events.groupBy(_._3)
    val nn = BigInt(n)
    val ca = BigInt(events.count(e => vq(e._4) > med))
    var chiU = BigInt(0)
    byType.values.foreach { es =>
      val rt = BigInt(es.length)
      val above = BigInt(es.count(e => vq(e._4) > med))
      val devA = above * nn - rt * ca
      val devB = (rt - above) * nn - rt * (nn - ca)
      chiU += (devA * devA * 1000000) / (rt * ca * nn) +
        (devB * devB * 1000000) / (rt * (nn - ca) * nn)
    }
    assert(r.getLong(0) == byType.size.toLong && r.getLong(1) == n)
    assert(math.abs(r.getDouble(4) - chiU.toDouble / 1e6) < 1e-9)
  }

  test("q_ar_fit replays the Yule-Walker closed forms on the dq frame") {
    val r = SparkEntry.queries("q_ar_fit")(spark, sfDir).collect().head
    val byDay = events.groupBy(e => dayOf(e._1))
      .map { case (d, es) => d -> es.length.toLong }.toSeq.sortBy(_._1)
    val nD = byDay.length.toLong
    val sy = byDay.map(_._2).sum
    val dq = byDay.map { case (_, y) =>
      math.floor((y.toDouble / (sy.toDouble / nD) - 1.0) * 1e6 + 0.5)
        .toLong
    }
    val den = dq.map(x => x * x).sum
    def num(k: Int) =
      dq.dropRight(k).zip(dq.drop(k)).map { case (a, b) => a * b }.sum
    val r1 = num(1).toDouble / den
    val r2 = num(2).toDouble / den
    val phi1 = r1 * (1.0 - r2) / (1.0 - r1 * r1)
    val phi2 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    assert(r.getLong(0) == nD)
    assert(math.abs(r.getDouble(1) - q6(r1)) < 2e-6)
    assert(math.abs(r.getDouble(2) - q6(r2)) < 2e-6)
    assert(math.abs(r.getDouble(3) - q6(phi1)) < 2e-6)
    assert(math.abs(r.getDouble(4) - q6(phi2)) < 2e-6)
    assert(math.abs(r.getDouble(5) -
      q6(1.0 - phi1 * r1 - phi2 * r2)) < 2e-6)
  }

  test("q_periodogram replays the integer DFT exactly (all-integer rows)") {
    val rows = SparkEntry.queries("q_periodogram")(spark, sfDir)
      .collect().sortBy(_.getLong(0))
    assert(rows.length == 8)
    val byDay = events.groupBy(e => dayOf(e._1))
      .map { case (d, es) => d -> es.length.toLong }
    val d0 = byDay.keys.min
    val frame = byDay.toSeq.map { case (d, y) => (d - d0, y) }
      .filter(_._1 < 64)
    val cq = (0 until 64).map(m =>
      math.floor(math.cos(2.0 * math.Pi * m / 64) * 1e6 + 0.5).toLong)
    val sq = (0 until 64).map(m =>
      math.floor(math.sin(2.0 * math.Pi * m / 64) * 1e6 + 0.5).toLong)
    rows.foreach { r =>
      val k = r.getLong(0)
      val re = frame.map { case (t, y) => y * cq(((k * t) % 64).toInt) }
        .sum
      val im = frame.map { case (t, y) => y * sq(((k * t) % 64).toInt) }
        .sum
      val power =
        ((BigInt(re) * re + BigInt(im) * im) / BigInt(1000000000000L))
          .toLong
      assert(r.getDouble(1) == 64.0 / k)
      assert(r.getLong(2) == re && r.getLong(3) == im)
      assert(r.getLong(4) == power)
    }
  }

  test("q_bayes_ab replays the posterior-moment probit closed form") {
    val r = SparkEntry.queries("q_bayes_ab")(spark, sfDir).collect().head
    val perUser = events.groupBy(e => e._2).toSeq
      .map { case (u, es) => (u % 2, es.exists(_._3 == "purchase")) }
    def cnt(arm: Long) = perUser.count(_._1 == arm).toLong
    def cv(arm: Long) = perUser.count(p => p._1 == arm && p._2).toLong
    val (na, xa, nb, xb) = (cnt(0), cv(0), cnt(1), cv(1))
    def mu(n: Long, x: Long) = (1.0 + x) / (2.0 + n)
    def va(n: Long, x: Long) =
      (1.0 + x) * (1.0 + n - x) / ((2.0 + n) * (2.0 + n) * (3.0 + n))
    val z = (mu(nb, xb) - mu(na, xa)) / math.sqrt(va(na, xa) + va(nb, xb))
    val az = math.abs(z)
    val t = 1.0 / (1.0 + 0.2316419 * az)
    val poly = t * (0.319381530 + t * (-0.356563782 + t * (1.781477937 +
      t * (-1.821255978 + t * 1.330274429))))
    val phiPos = 1.0 - 0.3989422804014327 * math.exp(az * az / -2.0) * poly
    val p = if (z >= 0) phiPos else 1.0 - phiPos
    assert(r.getLong(0) == na && r.getLong(1) == xa)
    assert(r.getLong(2) == nb && r.getLong(3) == xb)
    assert(math.abs(r.getDouble(4) - q6(mu(na, xa))) < 2e-6)
    assert(math.abs(r.getDouble(5) - q6(mu(nb, xb))) < 2e-6)
    assert(math.abs(r.getDouble(6) - q6(p)) < 2e-6)
    assert(r.getDouble(6) >= 0.0 && r.getDouble(6) <= 1.0)
  }

  // --------------------------------------------------------------- graph

  private lazy val coPairs: Map[(Long, Long), Int] = {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    li.groupBy(_._1).values.flatMap { b =>
      val ps = b.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.toSeq.groupBy(identity).map { case (p, xs) => p -> xs.length }
      .filter(_._2 >= 2)
  }

  test("q_adamic_adar matches the brute-force wedge scoring") {
    val rows = SparkEntry.queries("q_adamic_adar")(spark, sfDir).collect()
    val edges = coPairs.keySet
    val adj = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).toSeq }
    val aw = adj.map { case (v, nbs) =>
      v -> (if (nbs.length >= 2)
        math.floor(1e6 / math.log(nbs.length.toDouble) + 0.5).toLong
      else 0L)
    }
    val scored = adj.toSeq.flatMap { case (v, nbs) =>
      val srt = nbs.sorted
      for (i <- srt.indices; j <- (i + 1) until srt.length)
        yield ((srt(i), srt(j)), aw(v))
    }.groupBy(_._1).map { case (p, xs) =>
      (p, xs.length.toLong, xs.map(_._2).sum)
    }.filterNot { case (p, _, _) => edges.contains(p) }
      .toSeq
      .sortBy { case ((u, w), cn, aa) => (-aa, -cn, u, w) }.take(20)
    assert(rows.length == scored.length)
    rows.zip(scored).foreach { case (r, ((u, w), cn, aa)) =>
      assert(r.getLong(0) == u && r.getLong(1) == w)
      assert(r.getLong(2) == cn && r.getLong(3) == aa)
    }
  }

  test("q_eccentricity matches a brute-force 3-hop BFS per root") {
    val rows = SparkEntry.queries("q_eccentricity")(spark, sfDir)
      .collect()
    val lo = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_suppkey")).collect()
      .map(r => (r.getLong(0) * 2, r.getLong(1) * 2 + 1)).distinct
    val adj = (lo ++ lo.map(p => (p._2, p._1))).groupBy(_._1)
      .map { case (v, xs) => v -> xs.map(_._2).toSet }
    val roots = Tables.customer(spark, sfDir)
      .select(col("c_custkey")).collect().map(_.getLong(0))
      .filter(_ % 50 == 0).sorted.take(200).map(_ * 2)
    assert(rows.length == roots.length)
    rows.zip(roots.sorted).foreach { case (r, root) =>
      var dist = Map(root -> 0L)
      for (h <- 1 to 3) {
        val next = dist.keys
          .flatMap(v => adj.getOrElse(v, Set.empty).map(_ -> (dist(v) + 1)))
          .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).min }
        dist = (dist.toSeq ++ next.toSeq).groupBy(_._1)
          .map { case (v, xs) => v -> xs.map(_._2).min }
      }
      assert(r.getLong(0) == root)
      assert(r.getLong(1) == dist.count(_._2 > 0).toLong)
      assert(r.getLong(2) == dist.values.max)
    }
  }

  // --------------------------------------------------------------- joins

  test("q18_big_orders: HAVING threshold and ordering replay") {
    val rows = SparkEntry.queries("q18_big_orders")(spark, sfDir)
      .collect()
    val qty = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_quantity")).collect()
      .map(r => (r.getLong(0), math.floor(r.getDouble(1) + 0.5).toLong))
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sum }
    val big = qty.filter(_._2 > 250)
    assert(rows.length == math.min(big.size, 100))
    rows.foreach { r =>
      assert(big(r.getLong(2)) == r.getLong(5),
        "total_qty must match the per-order integer sum")
    }
    val prices = rows.map(_.getDouble(4))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b },
      "o_totalprice desc total order")
  }

  // ----------------------------------------------------------- text/pipe

  test("q_rake_keywords replays the degree/frequency phrase scores") {
    val rows = SparkEntry.queries("q_rake_keywords")(spark, sfDir)
      .collect()
    assert(rows.length == 20)
    val stop = Set("the", "a", "")
    val phrases = docs.flatMap { case (_, text, _) =>
      val ws = norm(text).split(" ", -1)
      val out = scala.collection.mutable.ArrayBuffer[Seq[String]]()
      var cur = scala.collection.mutable.ArrayBuffer[String]()
      ws.foreach { w =>
        if (stop(w)) {
          if (cur.nonEmpty) { out += cur.toSeq; cur.clear() }
        } else cur += w
      }
      if (cur.nonEmpty) out += cur.toSeq
      out
    }
    val dg = scala.collection.mutable.Map[String, Long]()
    val fq = scala.collection.mutable.Map[String, Long]()
    phrases.foreach { p =>
      p.foreach { w =>
        dg(w) = dg.getOrElse(w, 0L) + p.length
        fq(w) = fq.getOrElse(w, 0L) + 1L
      }
    }
    val scoreOf = (p: Seq[String]) =>
      p.map(w => (BigInt(dg(w)) * 1000000 / fq(w)).toLong).sum
    val byPhrase = phrases.groupBy(_.mkString(" ")).toSeq
      .map { case (txt, xs) => (txt, xs.length.toLong, scoreOf(xs.head)) }
      .sortBy { case (txt, n, sc) => (-sc, -n, txt) }.take(20)
    rows.zip(byPhrase).foreach { case (r, (txt, n, sc)) =>
      assert(r.getString(0) == txt)
      assert(r.getLong(1) == n && r.getLong(2) == sc)
      assert(r.getDouble(3) == sc.toDouble / 1e6)
    }
  }

  test("q_train_split: leakage-free partition with replayed counts") {
    val rows = SparkEntry.queries("q_train_split")(spark, sfDir)
      .collect()
    assert(rows.map(_.getString(0)).sorted.toSeq ==
      Seq("test", "train", "val"))
    val assigned = docs.map { case (id, text, nc) =>
      val gid = md5Hex(text)
      val h = java.lang.Long.parseLong(gid.substring(0, 8), 16) % 10
      val split = if (h < 8) "train" else if (h == 8) "val" else "test"
      (split, gid, nc)
    }
    val n = assigned.length.toLong
    rows.foreach { r =>
      val s = r.getString(0)
      val mine = assigned.filter(_._1 == s)
      assert(r.getLong(1) == mine.length.toLong)
      assert(r.getLong(2) == mine.map(_._2).distinct.length.toLong)
      assert(r.getLong(3) == mine.map(_._3).sum)
      assert(r.getLong(4) == 1000000L * mine.length / n)
      assert(r.getLong(5) == 0L, "exact-dup groups can never leak " +
        "across splits: assignment is a function of the group key")
    }
    assert(rows.map(_.getLong(1)).sum == n, "splits partition the corpus")
  }

  test("q_schema_drift replays the value-domain audit on orders") {
    val rows = SparkEntry.queries("q_schema_drift")(spark, sfDir)
      .collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("o_orderpriority", "o_orderstatus", "price_bucket"))
    val os = Tables.orders(spark, sfDir)
      .select(datediff(to_date(col("o_orderdate")),
          lit("1970-01-01").cast("date")).cast("long").as("dd"),
        col("o_orderstatus"), col("o_orderpriority"),
        col("o_totalprice"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getDouble(3)))
    val mid = (os.map(_._1).min + os.map(_._1).max) / 2
    def audit(vals: Array[(String, Boolean)]) = {
      val cells = vals.groupBy(_._1).toSeq.map { case (_, xs) =>
        (xs.count(!_._2).toLong, xs.count(_._2).toLong)
      }
      val ta = cells.map(_._1).sum
      val tb = cells.map(_._2).sum
      val tv = cells.map { case (na, nb) =>
        math.abs(na * 1000000L / ta - nb * 1000000L / tb)
      }.sum / 2
      (ta, tb, cells.count(_._1 > 0).toLong, cells.count(_._2 > 0).toLong,
        cells.count(c => c._1 == 0 && c._2 > 0).toLong,
        cells.count(c => c._1 > 0 && c._2 == 0).toLong, tv)
    }
    val byCol = Map(
      "o_orderstatus" -> os.map(o => (o._2, o._1 > mid)),
      "o_orderpriority" -> os.map(o => (o._3, o._1 > mid)),
      "price_bucket" -> os.map(o =>
        (math.floor(o._4 / 50000.0).toLong.toString, o._1 > mid)))
    rows.foreach { r =>
      val (ta, tb, ndvA, ndvB, nv, gv, tv) = audit(byCol(r.getString(0)))
      assert(r.getLong(1) == ta && r.getLong(2) == tb)
      assert(r.getLong(3) == ndvA && r.getLong(4) == ndvB)
      assert(r.getLong(5) == nv && r.getLong(6) == gv)
      assert(r.getLong(7) == tv)
    }
  }

  // ------------------------------------------------------------ leg 5

  test("q_croston replays the intermittent-demand rate per type") {
    val rows = SparkEntry.queries("q_croston")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = r.getString(0)
      val byDay = events.filter(_._3 == t).groupBy(e => dayOf(e._1))
        .map { case (d, es) => d -> es.length.toLong }
      val nAct = byDay.size.toLong
      val sy = byDay.values.sum
      val (d1, dn) = (byDay.keys.min, byDay.keys.max)
      assert(r.getLong(1) == nAct && r.getLong(2) == sy)
      assert(r.getLong(3) == 1000000L * sy / nAct)
      assert(r.getLong(4) == 1000000L * (dn - d1) / (nAct - 1))
      assert(r.getLong(5) ==
        1000000L * sy * (nAct - 1) / (nAct * (dn - d1)))
    }
  }

  test("q_kn_bigram replays the discount/continuation closed form") {
    val rows = SparkEntry.queries("q_kn_bigram")(spark, sfDir).collect()
    assert(rows.length == 20)
    val bg = docs.flatMap { case (_, text, _) =>
      val ws = norm(text).split(" ", -1)
      ws.zip(ws.tail).filter(p => p._1.nonEmpty && p._2.nonEmpty)
    }
    val c12 = bg.groupBy(identity).map { case (p, xs) =>
      p -> xs.length.toLong
    }
    val c1 = c12.toSeq.groupBy(_._1._1)
      .map { case (w, xs) => w -> xs.map(_._2).sum }
    val n1pFw = c12.toSeq.groupBy(_._1._1)
      .map { case (w, xs) => w -> xs.length.toLong }
    val n1pBw = c12.toSeq.groupBy(_._1._2)
      .map { case (w, xs) => w -> xs.length.toLong }
    val bb = c12.size.toLong
    val expect = c12.toSeq
      .sortBy { case ((w1, w2), c) => (-c, w1, w2) }.take(20)
    rows.zip(expect).foreach { case (r, ((w1, w2), c)) =>
      assert(r.getString(0) == w1 && r.getString(1) == w2)
      assert(r.getLong(2) == c)
      assert(r.getLong(3) == c1(w1) && r.getLong(4) == n1pFw(w1))
      assert(r.getLong(5) == n1pBw(w2))
      val p = (c - 0.75) / c1(w1) + 0.75 * n1pFw(w1) / c1(w1) *
        (n1pBw(w2).toDouble / bb)
      assert(math.abs(r.getDouble(6) - q6(p)) < 2e-6)
      assert(r.getDouble(6) > 0.0 && r.getDouble(6) <= 1.0)
    }
  }

  test("q_ppr replays the seed-teleport fixed point and tops at seeds") {
    val rows = SparkEntry.queries("q_ppr")(spark, sfDir).collect()
    assert(rows.length == 20)
    val lo = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_suppkey")).collect()
      .map(r => (r.getLong(0) * 2, r.getLong(1) * 2 + 1)).distinct
    val edges = lo ++ lo.map(p => (p._2, p._1))
    val custs = Tables.customer(spark, sfDir)
      .select(col("c_custkey")).collect().map(_.getLong(0) * 2)
    val supps = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey")).collect().map(_.getLong(0) * 2 + 1)
    val nodes = custs ++ supps
    val seeds = custs.filter(c => (c / 2) % 100 == 0).toSet
    val ns = seeds.size.toLong
    val outdeg = edges.groupBy(_._1).map { case (v, xs) =>
      v -> xs.length.toLong
    }
    val scale = 1000000000000L
    var pr: Map[Long, Long] = nodes.map(id =>
      id -> (if (seeds(id)) scale / ns else 0L)).toMap
    for (_ <- 1 to 3) {
      val contrib = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) =>
          pr.getOrElse(src, 0L) / outdeg(src)
        }.sum
      }
      pr = nodes.map { id =>
        val tele = if (seeds(id)) (15 * scale) / (100 * ns) else 0L
        id -> (tele + (85 * contrib.getOrElse(id, 0L)) / 100)
      }.toMap
    }
    val expect = pr.toSeq.sortBy { case (id, p) => (-p, id) }.take(20)
    rows.zip(expect).foreach { case (r, (id, p)) =>
      assert(r.getLong(0) == id)
      assert(r.getLong(2) == (if (seeds(id)) 1L else 0L))
      assert(r.getLong(3) == p)
    }
  }

  test("q_kcenter_seed replays farthest-point traversal; radii decrease") {
    val rows = SparkEntry.queries("q_kcenter_seed")(spark, sfDir)
      .collect()
    assert(rows.length == 5)
    val pts = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map { r =>
        val v = r.getSeq[Float](1).toArray
        (r.getLong(0), v.map(x => math.floor(
          (math.max(x.toDouble, -1.0) + 1.0) * 1000000.0).toLong))
      }.sortBy(_._1)
    def sq(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var chosen = List(pts.head)
    var md = pts.map(p => (p, sq(p._2, pts.head._2)))
    val expect = scala.collection.mutable.ArrayBuffer(
      (0L, pts.head._1, 0L))
    for (r <- 1 to 4) {
      val far = md.minBy { case ((id, _), dist) => (-dist, id) }
      expect += ((r.toLong, far._1._1, far._2))
      chosen = chosen :+ far._1
      md = md.map { case (p, dist) =>
        (p, math.min(dist, sq(p._2, far._1._2)))
      }
    }
    rows.zip(expect).foreach { case (r, (rank, id, dist)) =>
      assert(r.getLong(0) == rank && r.getLong(1) == id)
      assert(r.getLong(2) == dist)
    }
    val radii = rows.drop(1).map(_.getLong(2))
    assert(radii.zip(radii.tail).forall { case (a, b) => a >= b },
      "k-center selection radii are non-increasing")
  }

  test("q_mm_spectrogram replays the integer DFT over the decoded PCM") {
    val rows = SparkEntry.queries("q_mm_spectrogram")(spark, sfDir)
      .collect()
    assert(rows.length == docs.length * 8 * 4)
    val cq = (0 until 64).map(m =>
      math.floor(math.cos(2.0 * math.Pi * m / 64) * 1000 + 0.5).toLong)
    val sq = (0 until 64).map(m =>
      math.floor(math.sin(2.0 * math.Pi * m / 64) * 1000 + 0.5).toLong)
    val sample = rows.filter(_.getLong(0) == docs.head._1)
    sample.foreach { r =>
      val (id, f, k) = (r.getLong(0), r.getLong(1), r.getLong(2))
      var re = 0L
      var im = 0L
      for (j <- 0 until 64) {
        val sv = (org.apache.spark.sql.graft.NativeExpressions
          .splitmix64Long(id * 1024L + f * 64 + j) & 0xffL).toInt - 128
        val m = ((k * j) % 64).toInt
        re += sv * cq(m)
        im += sv * sq(m)
      }
      assert(r.getLong(3) == re && r.getLong(4) == im)
      assert(r.getLong(5) == re * re + im * im)
    }
  }

  // ------------------------------------------------------------ leg 6

  test("q_mcc replays the binary confusion closed forms") {
    val r = SparkEntry.queries("q_mcc")(spark, sfDir).collect().head
    val langs = Tables.documents(spark, sfDir)
      .select(col("lang"), col("text")).collect()
      .map { row =>
        val text = row.getString(1)
        val vowels = "[aeiou]".r.findAllIn(text).length
        val vr = math.round(vowels.toDouble / text.length * 1e6) / 1e6
        val cjk = text.exists(c => c >= '一' && c <= '鿿')
        val guess =
          if (cjk) "zh"
          else if (vr >= 0.32) "en"
          else if (vr >= 0.28) "es"
          else "other"
        (row.getString(0), guess)
      }
    val tp = langs.count(p => p._1 == "en" && p._2 == "en").toLong
    val fp = langs.count(p => p._1 != "en" && p._2 == "en").toLong
    val fn = langs.count(p => p._1 == "en" && p._2 != "en").toLong
    val tn = langs.count(p => p._1 != "en" && p._2 != "en").toLong
    assert(r.getLong(0) == tp && r.getLong(1) == fp)
    assert(r.getLong(2) == fn && r.getLong(3) == tn)
    assert(r.getLong(4) == (tp + tn) * 1000000L / (tp + fp + fn + tn))
    val mcc = (tp.toDouble * tn - fp.toDouble * fn) /
      math.sqrt((tp + fp).toDouble * (tp + fn) * (tn + fp) * (tn + fn))
    assert(math.abs(r.getDouble(5) - q6(mcc)) < 2e-6)
    assert(r.getDouble(5) >= -1.0 && r.getDouble(5) <= 1.0)
  }

  test("q_cohort_ltv: monotone curves that replay the cell sums") {
    val rows = SparkEntry.queries("q_cohort_ltv")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val ev = events.map(e =>
      (e._2, dayOf(e._1) / 7, vq(e._4)))
    val cohort = ev.groupBy(_._1).map { case (u, xs) =>
      u -> xs.map(_._2).min
    }
    val sizes = cohort.groupBy(_._2).map { case (w, xs) =>
      w -> xs.size.toLong
    }
    val cells = ev.groupBy(e => (cohort(e._1), e._2 - cohort(e._1)))
      .map { case (k, xs) => k -> xs.map(_._3).sum }
    rows.groupBy(_.getLong(0)).foreach { case (cw, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      var cum = 0L
      sorted.foreach { r =>
        cum += cells((cw, r.getLong(1)))
        assert(r.getLong(2) == sizes(cw))
        assert(r.getLong(3) == cum)
        assert(r.getLong(4) == cum / sizes(cw))
      }
      val curve = sorted.map(_.getLong(3))
      assert(curve.zip(curve.tail).forall { case (a, b) => a <= b },
        "cumulative value never decreases")
    }
  }

  test("q_sql_identifier binds names at analysis time, same as literals") {
    val viaIdent = SparkEntry.queries("q_sql_identifier")(spark, sfDir)
      .collect()
    val literal = spark.sql(
      """SELECT l_returnflag, count(*) AS n,
        |  round(sum(l_extendedprice), 2) AS revenue
        |FROM lineitem
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
      .collect()
    assert(viaIdent.map(_.toString).toSeq ==
      literal.map(_.toString).toSeq)
  }

  test("q_bpe_train replays three greedy merge rounds exactly") {
    val rows = SparkEntry.queries("q_bpe_train")(spark, sfDir).collect()
    assert(rows.length == 3)
    var words: Seq[(String, Long)] = docs
      .flatMap(d => norm(d._2).split(" ", -1)).filter(_.length >= 2)
      .groupBy(identity).toSeq.map { case (w, xs) =>
        (" " + w.toSeq.mkString(" ") + " ", xs.length.toLong)
      }
    for (r <- 1 to 3) {
      val counts = scala.collection.mutable.Map[String, Long]()
      words.foreach { case (ct, n) =>
        val arr = ct.trim.split(" ")
        arr.zip(arr.tail).foreach { case (a, b) =>
          counts(s"$a $b") = counts.getOrElse(s"$a $b", 0L) + n
        }
      }
      val (bp, bc) = counts.toSeq.minBy { case (p, c) => (-c, p) }
      val row = rows(r - 1)
      assert(row.getLong(0) == r.toLong)
      assert(row.getString(1) == bp, s"round $r best pair")
      assert(row.getString(2) == bp.replace(" ", ""))
      assert(row.getLong(3) == bc)
      words = words.map { case (ct, n) =>
        (ct.replace(s" $bp ", " " + bp.replace(" ", "") + " "), n)
      }
    }
  }

  test("q_negative_sampling: exact ranges that partition the table") {
    val rows = SparkEntry.queries("q_negative_sampling")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val wc = docs.flatMap(d => norm(d._2).split(" ", -1))
      .filter(_.nonEmpty).groupBy(identity).toSeq
      .map { case (w, xs) =>
        val c = xs.length.toLong
        (w, c,
          math.floor(math.pow(c.toDouble, 0.75) * 1e6 + 0.5).toLong)
      }
    val tot = wc.map(_._3).sum
    val expect = wc.sortBy { case (w, _, wt) => (-wt, w) }
    var cum = 0L
    rows.zip(expect.take(rows.length)).foreach {
      case (r, (w, c, wt)) =>
        assert(r.getString(0) == w && r.getLong(1) == c)
        assert(r.getLong(2) == wt)
        assert(r.getLong(3) == cum, "ranges are contiguous")
        cum += wt
        assert(r.getLong(4) == cum)
        assert(r.getLong(5) == wt * 1000000L / tot)
    }
  }

  private lazy val docMeta: Array[(String, String)] =
    Tables.documents(spark, sfDir).select(col("lang"), col("source"))
      .collect().map(r => (r.getString(0), r.getString(1)))

  test("q_ipf_rake replays four integer margin scalings; margins converge") {
    val rows = SparkEntry.queries("q_ipf_rake")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val cells = docMeta.groupBy(identity).map { case (k, xs) =>
      k -> xs.length.toLong
    }
    val nn = cells.values.sum
    val nr = cells.keys.map(_._1).toSet.size.toLong
    val nc = cells.keys.map(_._2).toSet.size.toLong
    val trU = BigInt(nn) * 1000000 / nr
    val tcU = BigInt(nn) * 1000000 / nc
    var w: Map[(String, String), BigInt] = cells.map { case (k, n) =>
      k -> BigInt(n) * 1000000
    }
    def scale(byRow: Boolean): Unit = {
      val ms = w.toSeq.groupBy(p => if (byRow) p._1._1 else p._1._2)
        .map { case (g, xs) => g -> xs.map(_._2).sum }
      val t = if (byRow) trU else tcU
      w = w.map { case (k, v) =>
        k -> v * t / ms(if (byRow) k._1 else k._2)
      }
    }
    scale(byRow = true); scale(byRow = false)
    scale(byRow = true); scale(byRow = false)
    rows.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      assert(r.getLong(2) == cells(k))
      assert(BigInt(r.getLong(3)) == w(k), s"cell $k weight")
    }
    // after two iterations the column margins are exact by construction
    // (last scaling) and row margins are near-target
    val rowMargins = w.toSeq.groupBy(_._1._1)
      .map(_._2.map(_._2).sum.toDouble)
    rowMargins.foreach { m =>
      assert(math.abs(m - trU.toDouble) / trU.toDouble < 0.05,
        "row margins within 5% of target after 2 IPF iterations")
    }
  }

  test("q_stream_dau: exact distinct users per decided day window") {
    val rows = SparkEntry.queries("q_stream_dau")(spark, sfDir).collect()
    assert(rows.nonEmpty, "at least one day window is watermark-decided")
    val wmUs = events.map(_._1 / 1000).max * 1000 - 600000000L
    val expect = events.map(e => (dayOf(e._1), e._2)).distinct
      .groupBy(_._1).map { case (d, xs) => d -> xs.length.toLong }
      .filter { case (d, _) => (d + 1) * 86400000000L <= wmUs }
    assert(rows.length == expect.size)
    rows.foreach { r =>
      assert(expect(r.getLong(0) / 86400) == r.getLong(1))
    }
  }

  test("q_assoc_rules replays directed confidence/lift over the pairs") {
    val rows = SparkEntry.queries("q_assoc_rules")(spark, sfDir)
      .collect()
    assert(rows.length == 20)
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val sItem = li.groupBy(_._2).map { case (i, xs) =>
      i -> xs.length.toLong
    }
    val nB = li.map(_._1).distinct.length.toLong
    val rules = coPairs.toSeq.flatMap { case ((a, b), s2) =>
      Seq((a, b, s2.toLong), (b, a, s2.toLong))
    }.map { case (a, b, s2) =>
      val conf = s2 * 1000000L / sItem(a)
      val lift = (BigInt(s2) * nB * 1000000 /
        (BigInt(sItem(a)) * sItem(b))).toLong
      (a, b, s2, conf, lift)
    }.sortBy { case (a, b, _, conf, lift) => (-lift, -conf, a, b) }
      .take(20)
    rows.zip(rules).foreach { case (r, (a, b, s2, conf, lift)) =>
      assert(r.getLong(0) == a && r.getLong(1) == b)
      assert(r.getLong(2) == s2)
      assert(r.getLong(3) == conf && r.getLong(4) == lift)
    }
  }

  test("q_effective_diameter: CDF partitions and flags exactly one level") {
    val rows = SparkEntry.queries("q_effective_diameter")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val nn = rows.head.getLong(3)
    assert(rows.map(_.getLong(1)).sum == nn,
      "per-distance counts partition the reach pairs")
    assert(rows.count(_.getBoolean(5)) == 1,
      "exactly one distance level carries the 90th percentile")
    val cums = rows.sortBy(_.getLong(0)).map(_.getLong(2))
    assert(cums.zip(cums.tail).forall { case (a, b) => a < b })
    assert(cums.last == nn)
  }

  test("q_sql_exec: EXECUTE IMMEDIATE binds params, equals the literal") {
    val viaExec = SparkEntry.queries("q_sql_exec")(spark, sfDir).collect()
    val literal = spark.sql(
      """SELECT o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS revenue
        |FROM orders WHERE o_totalprice > 100000
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
      .collect()
    assert(viaExec.nonEmpty)
    assert(viaExec.map(_.toString).toSeq ==
      literal.map(_.toString).toSeq)
  }

  test("q_markov_steady replays the integer power iteration") {
    val rows = SparkEntry.queries("q_markov_steady")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val byUser = events.groupBy(_._2).values
    val trans = byUser.flatMap { es =>
      val srt = es.sortBy(e => (e._1, e._5)).map(_._3)
      srt.zip(srt.tail)
    }.toSeq.groupBy(identity).map { case (p, xs) =>
      p -> xs.length.toLong
    }
    val states = trans.keys.map(_._1).toSeq.distinct
    assert(trans.keys.map(_._2).toSet.subsetOf(states.toSet),
      "every observed state has outgoing transitions (no absorber)")
    val rt = trans.toSeq.groupBy(_._1._1).map { case (f, xs) =>
      f -> xs.map(_._2).sum
    }
    var v: Map[String, BigInt] = states.map(s2 =>
      s2 -> BigInt(1000000000000L) / states.length).toMap
    for (_ <- 1 to 10) {
      v = trans.toSeq.groupBy(_._1._2).map { case (to, xs) =>
        to -> xs.map { case ((f, _), cnt) =>
          v(f) * cnt / rt(f)
        }.sum
      }
    }
    rows.foreach { r =>
      assert(BigInt(r.getLong(1)) == v(r.getString(0)))
    }
    val mass = rows.map(_.getLong(1)).sum
    assert(mass > 999000000000L && mass <= 1000000000000L,
      "steady mass conserved up to integer truncation")
  }

  test("q_bitmap_distinct: popcount sums equal exact distinct counts") {
    val rows = SparkEntry.queries("q_bitmap_distinct")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    def bucket(v: Long): Long =
      if (v > 0) (v - 1) / 32768 + 1 else v / 32768
    rows.foreach { r =>
      val t = r.getString(0)
      val users = events.filter(_._3 == t).map(_._2).distinct
      assert(r.getLong(1) == users.length.toLong,
        "bitmap popcount sum must equal count(DISTINCT)")
      assert(r.getLong(2) == users.map(bucket).distinct.length.toLong)
    }
  }
}
