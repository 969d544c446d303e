package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavioral checks for the analytics pack (exact values are pinned by the
  * DuckDB oracle gate): funnel ordering invariants, cohort grid sanity,
  * EWMA recurrence cross-checked against a driver-side recomputation, and
  * the OLS slope's algebraic identity with the population co-moments.
  */
class AnalyticsSpec extends AnyFunSuite {
  import SparkFixture.{spark, sfDir}

  test("q_funnel: stage timestamps are strictly ordered") {
    val rows = SparkEntry.queries("q_funnel")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val stage = r.getAs[Int]("stage")
      assert(stage >= 1 && stage <= 3)
      if (stage >= 2)
        assert(r.getAs[Long]("view_us") < r.getAs[Long]("click_us"))
      if (stage == 3)
        assert(r.getAs[Long]("click_us") < r.getAs[Long]("buy_us"))
      if (stage < 3) assert(r.isNullAt(r.fieldIndex("buy_us")))
      if (stage < 2) assert(r.isNullAt(r.fieldIndex("click_us")))
    }
  }

  test("q_cohort_retention: offset-0 activity equals cohort membership") {
    val df = SparkEntry.queries("q_cohort_retention")(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("week_offset") >= 0))
    // every user is active in their own cohort's week 0, so the offset-0
    // cell is exactly the cohort size, and no later offset exceeds it
    val byCohort = rows.groupBy(_.getAs[String]("cohort_day"))
    byCohort.foreach { case (_, rs) =>
      val zero = rs.find(_.getAs[Long]("week_offset") == 0L)
      assert(zero.isDefined)
      val size0 = zero.get.getAs[Long]("n_active")
      assert(rs.forall(_.getAs[Long]("n_active") <= size0))
    }
  }

  test("q_ewma matches a driver-side recomputation of the 16-tap kernel") {
    val out = SparkEntry.queries("q_ewma")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("ts_us"),
        r.getAs[Long]("event_id"), r.getAs[Double]("value"),
        r.getAs[Double]("ewma")))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (_, rs) =>
      val ordered = rs.sortBy(r => (r._2, r._3))
      val values = ordered.map(_._4)
      ordered.zipWithIndex.foreach { case (r, i) =>
        val expect = (0 until 16).map { k =>
          if (i - k >= 0) math.pow(0.85, k) * values(i - k) else 0.0
        }.sum
        // the query evaluates in Horner order, the recomputation in sum
        // order — identical up to float noise far below the 4dp rounding
        assert(math.abs(r._5 - expect) < 1e-3,
          s"ewma mismatch at row $i: got ${r._5}, want $expect")
      }
    }
  }

  test("q_stats_moments: slope equals covar_pop/var_pop; corr bounded") {
    val rows = SparkEntry.queries("q_stats_moments")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val check = graft.engine.Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg((covar_pop(col("l_extendedprice"), col("l_quantity")) /
        var_pop(col("l_quantity"))).as("slope_pop"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("slope_pop"))
      .toMap
    rows.foreach { r =>
      val corr = r.getAs[Double]("corr_pq")
      assert(corr >= -1.0 && corr <= 1.0)
      assert(r.getAs[Double]("var_qty") >= 0.0)
      val slope = r.getAs[Double]("slope")
      val want = check(r.getAs[String]("l_returnflag"))
      assert(math.abs(slope - want) < 1e-3,
        s"regr_slope $slope != covar_pop/var_pop $want")
    }
  }

  test("q_dedup_editdist: thresholds hold and levenshtein is exact") {
    val rows = SparkEntry.queries("q_dedup_editdist")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lev = r.getAs[Long]("lev")
      val sim = r.getAs[Double]("sim")
      assert(sim >= 0.7 - 1e-6, s"pair below threshold: sim=$sim")
      assert(lev >= 0)
    }
    // ground-truth DP on one reported pair (classic Wagner–Fischer)
    def levDp(a: String, b: String): Int = {
      val prev = Array.tabulate(b.length + 1)(identity)
      val cur = new Array[Int](b.length + 1)
      for (i <- 1 to a.length) {
        cur(0) = i
        for (j <- 1 to b.length) {
          val sub = prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
          cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), sub)
        }
        Array.copy(cur, 0, prev, 0, cur.length)
      }
      prev(b.length)
    }
    val sample = rows.head
    val docs = graft.engine.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = levDp(docs(sample.getAs[Long]("d1")),
      docs(sample.getAs[Long]("d2")))
    assert(sample.getAs[Long]("lev") == want.toLong)
  }

  test("q_pagerank: ranks form a near-stochastic vector and isolated nodes keep the base rank") {
    val rows = SparkEntry.queries("q_pagerank")(spark, sfDir).collect()
    val n = rows.length
    assert(n == graft.engine.Tables.customer(spark, sfDir).count() +
      graft.engine.Tables.supplier(spark, sfDir).count())
    // fixed-point ranks sum to ~1.0 (integer floor-division leaks at
    // most a few units per node per iteration, never gains)
    val scale = 1000000000000L
    val total = rows.map(_.getAs[Long]("pr_fp")).sum
    assert(total <= scale && total > (scale * 0.98).toLong,
      s"rank mass $total out of range")
    // customers with no orders receive exactly the damping base
    val custWithOrders = graft.engine.Tables.orders(spark, sfDir)
      .select(col("o_custkey")).distinct().collect()
      .map(_.getLong(0)).toSet
    val base = 15L * scale / (100L * n)
    val isolated = rows.filter(r =>
      r.getAs[String]("node_type") == "customer" &&
        !custWithOrders.contains(r.getAs[Long]("id") / 2))
    isolated.foreach(r => assert(r.getAs[Long]("pr_fp") == base))
    // suppliers aggregate many customers' mass: every supplier should
    // outrank the isolated-customer base
    rows.filter(_.getAs[String]("node_type") == "supplier")
      .foreach(r => assert(r.getAs[Long]("pr_fp") > base))
  }

  test("q_scd2: intervals tile each user's timeline with no no-op changes") {
    val rows = SparkEntry.queries("q_scd2")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) Long.MaxValue else r.getLong(3),
        r.getBoolean(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (u, ivs) =>
      val sorted = ivs.sortBy(_._3)
      // exactly one open (current) interval per user, and it's the last
      assert(sorted.count(_._5) == 1, s"user $u: open intervals != 1")
      assert(sorted.last._5, s"user $u: current interval is not last")
      // intervals chain: each valid_to equals the next valid_from
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 == b._3, s"user $u: gap/overlap at ${a._4}")
          // consecutive intervals always change state (no no-op rows)
          assert(a._2 != b._2, s"user $u: adjacent equal states")
        case _ =>
      }
    }
  }

  test("q_upsert_merge: deletes vanish, updates reprice, inserts land, rest untouched") {
    val base = graft.engine.Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val out = SparkEntry.queries("q_upsert_merge")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    base.keys.foreach { k =>
      if (k % 7 == 0) assert(out(k) == base(k) + 100.0, s"update missed $k")
      else if (k % 13 == 5) assert(!out.contains(k), s"delete kept $k")
      else assert(out(k) == base(k), s"pass-through row $k changed")
      if (k % 17 == 2) assert(out(k + 100000000L) == base(k),
        s"insert missing for $k")
    }
    // no rows besides base survivors + inserts
    assert(out.size == base.count(k => k._1 % 13 != 5 || k._1 % 7 == 0) +
      base.keys.count(_ % 17 == 2))
  }
}
