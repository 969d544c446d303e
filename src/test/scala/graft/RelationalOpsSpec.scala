package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Exact-row semantics for the core relational operators on tiny literal
  * inputs (join null-handling, semi/anti, set ops with duplicates), plus
  * algebraic invariants over the corpus (SURVEY.md §5.2).
  */
class RelationalOpsSpec extends AnyFunSuite {
  import SparkFixture.{spark, sfDir}
  import spark.implicits._

  private lazy val l = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "lv")
  private lazy val r = Seq((2, "x"), (3, "y"), (4, "z")).toDF("k2", "rv")

  test("left outer join fills null for unmatched left rows") {
    val out = l.join(r, $"k" === $"k2", "left_outer")
      .select($"k", $"rv").orderBy($"k").as[(Int, Option[String])].collect()
    assert(out.toSeq == Seq((1, None), (2, Some("x")), (3, Some("y"))))
  }

  test("full outer join keeps both dangling sides") {
    val out = l.join(r, $"k" === $"k2", "full_outer")
      .select(coalesce($"k", $"k2").as("kk")).orderBy($"kk")
      .as[Int].collect()
    assert(out.toSeq == Seq(1, 2, 3, 4))
  }

  test("semi join filters, anti join complements") {
    val semi = l.join(r, $"k" === $"k2", "left_semi").select($"k")
      .as[Int].collect().sorted
    val anti = l.join(r, $"k" === $"k2", "left_anti").select($"k")
      .as[Int].collect().sorted
    assert(semi.toSeq == Seq(2, 3) && anti.toSeq == Seq(1))
    assert((semi ++ anti).sorted.toSeq == Seq(1, 2, 3))
  }

  test("exceptAll and intersectAll respect multiplicity") {
    val a = Seq(1, 1, 2, 3).toDF("v")
    val b = Seq(1, 2, 2).toDF("v")
    assert(a.exceptAll(b).as[Int].collect().sorted.toSeq == Seq(1, 3))
    assert(a.intersectAll(b).as[Int].collect().sorted.toSeq == Seq(1, 2))
  }

  test("rollup adds per-level subtotals") {
    val df = Seq(("g1", 1), ("g1", 2), ("g2", 3)).toDF("g", "v")
    val out = df.rollup($"g").agg(sum($"v").as("s"))
      .select($"g", $"s").as[(Option[String], Long)].collect().toSet
    assert(out == Set((Some("g1"), 3L), (Some("g2"), 3L), (None, 6L)))
  }

  test("window running sum is prefix-monotone per partition") {
    import org.apache.spark.sql.expressions.Window
    val df = Seq(("p", 1), ("p", 2), ("p", 3), ("q", 5)).toDF("g", "v")
    val w = Window.partitionBy($"g").orderBy($"v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = df.withColumn("rs", sum($"v").over(w))
      .orderBy($"g", $"v").as[(String, Int, Long)].collect()
    assert(out.toSeq ==
      Seq(("p", 1, 1L), ("p", 2, 3L), ("p", 3, 6L), ("q", 5, 5L)))
  }

  // -- algebraic invariants over the corpus --------------------------------

  test("invariant: filter result is a subset; union counts add") {
    val li = graft.engine.Tables.lineitem(spark, sfDir)
    val f = li.filter($"l_quantity" > 25)
    assert(f.count() <= li.count())
    assert(f.exceptAll(li).isEmpty)
    val o = graft.engine.Tables.orders(spark, sfDir)
    assert(o.union(o).count() == 2 * o.count())
  }

  test("invariant: dropDuplicates is idempotent") {
    val d = graft.engine.Tables.documents(spark, sfDir)
      .select($"lang", $"source")
    val once = d.dropDuplicates()
    assert(once.count() == once.dropDuplicates().count())
  }

  test("invariant: orderBy is a permutation") {
    val c = graft.engine.Tables.customer(spark, sfDir)
    assert(c.orderBy($"c_acctbal").count() == c.count())
  }

  // -- percentile buffering twin -------------------------------------------
  // The declared q_percentile ships the spill-safe rank-window plan; this
  // cross-check proves it row-identical to Spark's buffering
  // `percentile()` aggregate (the formulation that would OOM at 100 TB
  // group sizes and therefore stays spec-only).
  test("hll sketch union of partials equals the single-pass sketch") {
    // the mergeability property q_hll_merge relies on: sketch state is
    // deterministic in the input SET, so unioning per-cell partials must
    // give the identical estimate as one sketch over all rows — this is
    // what makes persisted fine-grained sketches re-aggregatable to any
    // coarser rollup without rescanning history
    val li = graft.engine.Tables.lineitem(spark, sfDir)
    val viaUnion = li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(hll_sketch_agg(col("l_partkey")).as("sk"))
      .groupBy(col("l_returnflag"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .orderBy(col("l_returnflag"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val onePass = li.groupBy(col("l_returnflag"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("l_partkey"))).as("est"))
      .orderBy(col("l_returnflag"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(viaUnion.toSeq == onePass.toSeq)
  }

  test("q_mode_median oracle precondition: mode is unique per group") {
    // mode() breaks ties arbitrarily on both engines, so the hash gate
    // is only deterministic while every group's top status count is
    // strictly ahead of the runner-up — pin that fixture property.
    val counts = graft.engine.Tables.orders(spark, sfDir)
      .groupBy($"o_orderpriority", $"o_orderstatus").count()
      .collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(2)).sortBy(-_).toSeq).toMap
    counts.foreach { case (grp, cs) =>
      assert(cs.length < 2 || cs(0) > cs(1),
        s"group $grp has tied mode counts $cs — q_mode_median hash unstable")
    }
  }

  test("percentile buffering twin matches the spill-safe default") {
    val buffering = graft.engine.Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 6).as("p50_qty"),
        round(expr("percentile(l_extendedprice, 0.25)"), 6).as("p25_price"),
        round(expr("percentile(l_extendedprice, 0.75)"), 6).as("p75_price"))
      .orderBy($"l_returnflag")
    val spillSafe = SparkEntry.queries("q_percentile")(spark, sfDir)
    assert(buffering.collect().toSeq == spillSafe.collect().toSeq)
  }
}
