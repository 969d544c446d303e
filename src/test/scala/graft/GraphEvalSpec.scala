package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavioral checks for the r10 graph/eval/stats batch (exact values are
  * pinned by the DuckDB oracle gate; these pin the ALGEBRA): brute-force
  * recomputations of the triangle counts and the k-core peel on the tiny
  * corpus, metric bounds for AUC/NDCG/Gini/hazard, and the structural
  * contracts (anti-join property of link prediction, life-table
  * conservation) that hash equality alone would not explain.
  */
class GraphEvalSpec extends AnyFunSuite {
  import SparkFixture.{spark, sfDir}

  /** Driver-side co-purchase edge set (support >= 2, p1 < p2) — the
    * brute-force twin of AnalyticsQueries.coEdges at sf0.001 scale. */
  private lazy val edges: Set[(Long, Long)] = {
    val baskets = spark.read
      .parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1)
      .values.map(_.map(_._2).distinct.sorted)
    val cnt = scala.collection.mutable.Map[(Long, Long), Int]()
    for (ps <- baskets; i <- ps.indices; j <- (i + 1) until ps.length)
      cnt((ps(i), ps(j))) = cnt.getOrElse((ps(i), ps(j)), 0) + 1
    cnt.filter(_._2 >= 2).keySet.toSet
  }

  test("q_triangle_count matches a brute-force count on the tiny graph") {
    val nbrs = scala.collection.mutable.Map[Long, Set[Long]]()
    for ((a, b) <- edges) {
      nbrs(a) = nbrs.getOrElse(a, Set.empty) + b
      nbrs(b) = nbrs.getOrElse(b, Set.empty) + a
    }
    val triPerNode = scala.collection.mutable.Map[Long, Long]()
    for ((a, b) <- edges; c <- nbrs(a) intersect nbrs(b); if c > b)
      for (n <- Seq(a, b, c))
        triPerNode(n) = triPerNode.getOrElse(n, 0L) + 1L
    // engine counts each triangle once via the (deg, id) orientation;
    // the brute force above counts (a,b,c) with a<b<c via c>b on sorted
    // edge pairs — same multiset when restricted to a<b edges
    val got = SparkEntry.queries("q_triangle_count")(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("part"), r.getAs[Long]("n_tri")))
    assert(got.nonEmpty)
    got.foreach { case (node, n) =>
      assert(triPerNode.getOrElse(node, 0L) == n,
        s"node $node: engine $n vs brute ${triPerNode.getOrElse(node, 0L)}")
    }
  }

  test("q_link_predict never scores an existing edge (anti-join contract)") {
    val rows = SparkEntry.queries("q_link_predict")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (u, w) = (r.getAs[Long]("u"), r.getAs[Long]("w"))
      assert(u < w, s"pair not canonical: ($u, $w)")
      assert(!edges.contains((u, w)), s"predicted pair ($u, $w) is an edge")
      assert(r.getAs[Long]("cn") >= 1)
    }
  }

  test("q_kcore equals a brute-force 4-round peel at k = 3") {
    var e = edges
    for (_ <- 1 to 4) {
      val deg = (e.toSeq.map(_._1) ++ e.toSeq.map(_._2))
        .groupBy(identity).map { case (k, v) => k -> v.size }
      val keep = deg.filter(_._2 >= 3).keySet
      e = e.filter { case (a, b) => keep(a) && keep(b) }
    }
    val wantDeg = (e.toSeq.map(_._1) ++ e.toSeq.map(_._2))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = SparkEntry.queries("q_kcore")(spark, sfDir)
      .collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("core_deg"))
      .toMap
    assert(got == wantDeg,
      s"engine ${got.size} nodes vs brute ${wantDeg.size}")
  }

  test("q_auc_roc matches a brute-force pairwise AUC per source") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("source"), col("n_chars"), col("lang"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val got = SparkEntry.queries("q_auc_roc")(spark, sfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val src = r.getAs[String]("source")
      val pos = docs.filter(d => d._1 == src && d._3 == "en").map(_._2)
      val neg = docs.filter(d => d._1 == src && d._3 != "en").map(_._2)
      if (pos.nonEmpty && neg.nonEmpty) {
        // Mann-Whitney: wins + half-ties over all pos x neg pairs
        val twoU = pos.iterator.map { p =>
          neg.count(_ < p) * 2L + neg.count(_ == p)
        }.sum
        val want = (1000000L * twoU) / (2L * pos.length * neg.length)
        assert(r.getAs[Long]("auc_u") == want,
          s"$src: engine ${r.getAs[Long]("auc_u")} vs brute $want")
      } else assert(r.isNullAt(r.fieldIndex("auc_u")))
    }
  }

  test("q_rank_ndcg: bounds and the perfect-prefix identity") {
    val rows = SparkEntry.queries("q_rank_ndcg")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val hits = r.getAs[Long]("hits")
      assert(hits >= 0 && hits <= 10)
      if (hits > 0) {
        val ndcg = r.getAs[Long]("ndcg_u")
        val mrr = r.getAs[Long]("mrr_u")
        assert(ndcg >= 0 && ndcg <= 1000000, s"ndcg_u $ndcg out of range")
        assert(mrr >= 100000 && mrr <= 1000000)
        // all-relevant top-10 means DCG == IDCG exactly
        if (hits == 10) assert(ndcg == 1000000L)
        // mrr_u == 1e6 iff the first retrieved item is relevant, which
        // forces the ideal prefix to start paying at rank 1 too
        if (mrr == 1000000L) assert(ndcg > 0)
      } else {
        assert(r.isNullAt(r.fieldIndex("ndcg_u")))
        assert(r.isNullAt(r.fieldIndex("mrr_u")))
      }
    }
  }

  test("q_gini matches the sorted-vector formula on one nation") {
    val rows = SparkEntry.queries("q_gini")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val spend = spark.read.parquet(s"$sfDir/customer.parquet")
      .join(spark.read.parquet(s"$sfDir/orders.parquet"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_nationkey"), col("c_custkey"))
      .agg(coalesce(sum(floor(col("o_totalprice") * 100.0 + 0.5)
        .cast("long")), lit(0L)).as("sp"))
      .collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
        r.getAs[Number](2).longValue))
    rows.foreach { r =>
      val nk = r.getAs[Number]("c_nationkey").longValue
      val xs = spend.filter(_._1 == nk).sortBy(t => (t._3, t._2)).map(_._3)
      val n = xs.length.toLong
      val tot = xs.sum
      assert(r.getAs[Long]("n_cust") == n)
      if (tot > 0) {
        val rs = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
        val want = BigDecimal(
          (2.0 * rs - (n + 1.0) * tot) / (n.toDouble * tot))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(r.getAs[Double]("gini") - want) < 1e-9,
          s"nation $nk: ${r.getAs[Double]("gini")} vs $want")
      }
    }
  }

  test("q_hazard_curve conserves the population through the life table") {
    val rows = SparkEntry.queries("q_hazard_curve")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val nUsers = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("user_id")).distinct().count()
    // at-risk at the earliest t is the whole population, and it only
    // ever shrinks by exactly the rows that exit at each t
    val byT = rows.sortBy(_.getAs[Long]("t"))
    assert(byT.head.getAs[Long]("n_risk") == nUsers)
    byT.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("n_risk") ==
          a.getAs[Long]("n_risk") - a.getAs[Long]("d_events") -
            a.getAs[Long]("c_censored"))
      case _ =>
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("hazard_u") >= 0 &&
        r.getAs[Long]("hazard_u") <= 1000000)
    }
  }

  test("q_churn_label covers every active user exactly once") {
    val rows = SparkEntry.queries("q_churn_label")(spark, sfDir).collect()
    val total = rows.map(_.getAs[Long]("n_users")).sum
    val want = spark.read.parquet(s"$sfDir/events.parquet")
      .filter(col("ts") < lit("2024-01-21").cast("timestamp"))
      .select(col("user_id")).distinct().count()
    assert(total == want, s"histogram covers $total users, expected $want")
  }

  test("q_entity_match scores are canonical, thresholded and weighted") {
    val rows = SparkEntry.queries("q_entity_match")(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getAs[String]("na") < r.getAs[String]("nb"))
      val s = r.getAs[Long]("score_q")
      assert(s >= 600000 && s < 1000000,
        s"score $s out of (distinct names can never hit 1e6)")
      assert(r.getAs[Long]("ca") >= 1 && r.getAs[Long]("cb") >= 1)
    }
  }

  test("q_benford_audit: shares sum to one and digits are canonical") {
    val rows = SparkEntry.queries("q_benford_audit")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val digits = rows.map(_.getAs[Long]("digit"))
    assert(digits.forall(d => d >= 1 && d <= 9))
    assert(digits.distinct.length == digits.length)
    // observed micro shares sum to 1e6 up to one truncation unit per row
    val share = rows.map(_.getAs[Long]("p_obs_u")).sum
    assert(share <= 1000000L && share > 1000000L - rows.length,
      s"observed shares sum to $share")
    assert(rows.map(_.getAs[Long]("p_exp_u")).sum == 1000000L)
  }

  test("q_decile_lift partitions the corpus and averages to unit lift") {
    val rows = SparkEntry.queries("q_decile_lift")(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("decile")).sorted
      .sameElements(0L until 10L))
    val n = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("n_rows")).sum == n)
    // row-weighted mean lift is 1e6 by construction, up to integer
    // truncation in each decile's lift
    val wsum = rows.map(r =>
      r.getAs[Long]("lift_u") * r.getAs[Long]("n_rows")).sum
    assert(math.abs(wsum - 1000000L * n) < n * 10,
      s"weighted lift $wsum vs ${1000000L * n}")
  }

  test("q_weighted_median matches the direct single-sort computation") {
    val rows = SparkEntry.queries("q_weighted_median")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_returnflag"),
        floor(col("l_extendedprice") * 100.0 + 0.5).cast("long"),
        col("l_quantity").cast("long"),
        col("l_orderkey") * 16L + col("l_linenumber").cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.foreach { r =>
      val fl = r.getAs[String]("l_returnflag")
      val xs = li.filter(_._1 == fl).sortBy(t => (t._2, t._4))
      val wAll = xs.map(_._3).sum
      var cum = 0L
      val med = xs.find { t => cum += t._3; cum * 2 >= wAll }.get._2
      assert(r.getAs[Long]("w_all") == wAll)
      assert(r.getAs[Long]("wmedian_c") == med,
        s"$fl: engine ${r.getAs[Long]("wmedian_c")} vs brute $med")
    }
  }

  test("q_growth_accounting: weekly identities hold") {
    val rows = SparkEntry.queries("q_growth_accounting")(spark, sfDir)
      .collect()
      .map(r => r.getAs[Long]("wk") ->
        (r.getAs[Long]("n_new"), r.getAs[Long]("n_retained"),
         r.getAs[Long]("n_resurrected"), r.getAs[Long]("n_churned")))
      .toMap
    val uw = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("user_id"),
        expr("datediff(to_date(ts), DATE '2024-01-01') div 7").as("wk"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val actives = uw.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    for ((wk, (nw, nr, ns, _)) <- rows if actives.contains(wk))
      assert(nw + nr + ns == actives(wk),
        s"week $wk: $nw+$nr+$ns != ${actives(wk)} actives")
    // churn(wk) = actives(wk-1) - retained(wk), for weeks present in both
    for ((wk, (_, nr, _, _)) <- rows if actives.contains(wk - 1) &&
        rows.contains(wk))
      assert(rows(wk)._4 == actives(wk - 1) - nr,
        s"week $wk: churned ${rows(wk)._4} != ${actives(wk - 1)} - $nr")
  }

  test("q_theilsen equals the brute-force median pairwise slope") {
    val got = SparkEntry.queries("q_theilsen")(spark, sfDir).collect().head
    val day = spark.read.parquet(s"$sfDir/events.parquet")
      .filter(col("event_type") === "purchase")
      .groupBy(expr("datediff(to_date(ts), DATE '2024-01-01')")
        .cast("long").as("di"))
      .agg(sum(floor(col("value")).cast("long")).as("rd"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val slopes = (for {
      i <- day.indices; j <- (i + 1) until day.length
    } yield {
      val (d1, r1) = day(i); val (d2, r2) = day(j)
      // truncating division: Spark `div` and DuckDB `//` both
      // truncate toward zero on negatives (checked)
      (1000000L * (r2 - r1)) / (d2 - d1)
    }).sorted
    val want = slopes((slopes.length + 1) / 2 - 1)
    assert(got.getAs[Long]("n_pairs") == slopes.length)
    assert(got.getAs[Long]("slope_med_u") == want,
      s"engine ${got.getAs[Long]("slope_med_u")} vs brute $want")
  }

  test("q_abc_class partitions all parts and shares sum to one") {
    val rows = SparkEntry.queries("q_abc_class")(spark, sfDir).collect()
    val nParts = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_partkey")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_parts")).sum == nParts)
    val shares = rows.map(_.getAs[Double]("share")).sum
    assert(math.abs(shares - 1.0) < 1e-5, s"shares sum to $shares")
    assert(rows.map(_.getAs[String]("abc")).sorted
      .sameElements(Array("A", "B", "C")))
  }

  test("q_cuped: both arms present; adjustment preserves the grand mean") {
    val rows = SparkEntry.queries("q_cuped")(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("arm")).sorted.sameElements(Array(0L, 1L)))
    // CUPED is mean-preserving over the pooled population: the
    // user-weighted averages of raw and adjusted means agree (the
    // theta correction sums to ~zero by construction of gm)
    val n = rows.map(_.getAs[Long]("n_users").toDouble)
    val raw = rows.map(_.getAs[Double]("raw_mean"))
    val adj = rows.map(_.getAs[Double]("adj_mean"))
    val pooledRaw = raw.zip(n).map { case (m, w) => m * w }.sum / n.sum
    val pooledAdj = adj.zip(n).map { case (m, w) => m * w }.sum / n.sum
    assert(math.abs(pooledRaw - pooledAdj) < 1e-3,
      s"pooled raw $pooledRaw vs adjusted $pooledAdj")
  }
}
