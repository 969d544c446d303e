package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-15 additions: the persist-lifecycle gate (VERDICT r14 item 2 —
  * every query-lambda pin must leave the block manager once the harness
  * releases it), plus replay specs for the r15 operators.
  */
class Round15Spec extends AnyFunSuite {
  import SparkFixture.{spark, sfDir}

  test("Pins: block manager returns to baseline after pin-heavy queries") {
    // Two queries whose lambdas pin frames consumed by the returned lazy
    // plan (the sweep-line boundary frame; the pagerank adjacency).
    // Materialize through the same noop write Bench uses, release, and
    // assert no persistent RDD from the query survives — the exact
    // leak-accumulation mode the r14 driver artifact's mid-run sick
    // window pointed at.
    graft.engine.Pins.releaseAll()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Seq("q_concurrency", "q_pagerank").foreach { q =>
      SparkEntry.queries(q)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      assert(graft.engine.Pins.pending > 0,
        s"$q pinned nothing — the pin site regressed to a leaky persist")
      graft.engine.Pins.releaseAll()
      val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
      assert(leaked.isEmpty,
        s"$q left persistent RDDs ${leaked.mkString(",")} after release")
    }
  }

  test("q_stream_state_ttl: TTL state resets per batch, total persists") {
    val rows = SparkEntry.queries("q_stream_state_ttl")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    // the TTL pin itself: every key's per-batch sums reconciled with its
    // persistent total (false anywhere = the 1 ms TTL state survived a
    // batch boundary, or the TTL-free state lost history)
    rows.foreach { r =>
      assert(r.getBoolean(4), s"ttl_reset_ok false for user ${r.getLong(0)}")
      val (nb, tot, mx) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nb >= 1 && nb <= 3, s"n_batches $nb outside the 3-file fixture")
      assert(mx <= tot && tot <= 3 * mx,
        s"batch/total inconsistent: max=$mx total=$tot over $nb batches")
    }
    // cross-pin vs the batch corpus: totals must sum to events + the
    // marker file's duplicated max-ts row(s)
    val ev = graft.engine.Tables.eventsWithTime(spark, sfDir)
    val mx = ev.agg(max(col("ts_us"))).head().getLong(0)
    val nMarker = ev.filter(col("ts_us") === mx).count()
    val total = rows.map(_.getLong(2)).sum
    assert(total == ev.count() + nMarker,
      s"emitted totals $total != corpus rows + marker")
  }

  test("Pins: releaseAll is idempotent and tolerates lambda-side release") {
    import graft.engine.Pins
    val df = spark.range(10).toDF("x")
    val p = Pins.pin(df)
    p.count()
    p.unpersist(blocking = false) // lambda released it eagerly
    assert(Pins.releaseAll() >= 1) // registry entry still drains, no throw
    assert(Pins.pending == 0)
    assert(Pins.releaseAll() == 0)
  }
}
