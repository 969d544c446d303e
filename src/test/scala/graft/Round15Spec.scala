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
