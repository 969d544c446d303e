package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.RankStats

/** Pins the RankStats NDV dispatcher (VERDICT r12 item 2): both branches
  * — the Limit-bounded global window (small NDV) and the
  * Dist.globalPrefixSums route (large NDV) — must produce IDENTICAL
  * cumulative sums and midranks on the same frame. The synthetic frame is
  * deliberately high-NDV (50k distinct values, far above the forced
  * ceiling) with adversarial weights (skewed, including zeros) so the
  * distributed branch's seeded-sample ranges actually engage.
  */
class RankStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def synthetic(n: Int) = {
    // deterministic scattered values: bijective affine scramble of the
    // index mod a large prime keeps values unique but unsorted on disk
    spark.range(n.toLong)
      .select(((col("id") * 48271L) % 1000003L).as("v"),
        (pmod(col("id") * 2654435761L, lit(97L)) + lit(0L)).as("w1"),
        pmod(col("id"), lit(13L)).as("w2"))
  }

  test("cumulative: window branch == Dist branch on a 50k-NDV frame") {
    val df = synthetic(50000)
    val small = RankStats.cumulative(df, "v", Seq("w1", "w2"),
      Seq("c1", "c2"), ndvCeiling = Long.MaxValue)
    val large = RankStats.cumulative(df, "v", Seq("w1", "w2"),
      Seq("c1", "c2"), ndvCeiling = 1L)
    val a = small.orderBy("v").collect().map(r =>
      (r.getLong(0), r.getLong(3), r.getLong(4)))
    val b = large.orderBy("v").collect().map(r =>
      (r.getLong(0), r.getLong(3), r.getLong(4)))
    assert(a.length == 50000)
    assert(a.sameElements(b))
    // the cumulative really is the prefix sum: last row carries totals
    val (tw1, tw2) = {
      val t = df.agg(sum("w1"), sum("w2")).head
      (t.getLong(0), t.getLong(1))
    }
    assert(a.last._2 == tw1 && a.last._3 == tw2)
  }

  test("doubledMidranks: branch equality + exact midrank identity") {
    // tie groups: 5k distinct values, each with a different multiplicity
    val df = spark.range(5000L)
      .select(((col("id") * 7919L) % 100003L).as("v"),
        (pmod(col("id"), lit(9L)) + lit(1L)).as("cnt"))
    val small = RankStats.doubledMidranks(df, "v", "cnt", "r2",
      ndvCeiling = Long.MaxValue)
    val large = RankStats.doubledMidranks(df, "v", "cnt", "r2",
      ndvCeiling = 1L)
    val a = small.orderBy("v").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val b = large.orderBy("v").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(a.sameElements(b))
    // r2 = 2*below + cnt + 1, verified independently via a driver-side
    // replay over the sorted frame
    val rows = df.orderBy("v").collect().map(r => (r.getLong(0), r.getLong(1)))
    var below = 0L
    val expect = rows.map { case (v, c) =>
      val r2 = 2L * below + c + 1L; below += c; (v, r2)
    }
    assert(a.sameElements(expect))
  }

  test("small branch bounds the window with an in-plan Limit") {
    import org.apache.spark.sql.catalyst.plans.logical.{
      GlobalLimit, LocalLimit, Window => LWindow}
    // parquet-backed frame: a statically-sized source (Range, local
    // relation) has a known maxRows and Catalyst ELIMINATES a limit it
    // can prove redundant — which is fine (a provably-bounded window is
    // bounded), but the gate-relevant shape is the file-scan one, where
    // maxRows is unknown and the Limit must survive into the plan
    val df = spark.read.parquet(s"${SparkFixture.sfDir}/documents.parquet")
      .groupBy(col("n_chars").cast("long").as("v"))
      .agg(count(lit(1)).as("w1"))
    val out = RankStats.cumulative(df, "v", Seq("w1"), Seq("c1"))
    val unbounded = out.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty &&
        w.child.collectFirst {
          case _: GlobalLimit => (); case _: LocalLimit => ()
        }.isEmpty => w
    }
    assert(unbounded.isEmpty,
      "small branch must carry its NDV bound as a Limit in the plan")
  }
}
