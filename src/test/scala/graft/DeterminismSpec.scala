package graft

import org.scalatest.funsuite.AnyFunSuite

/** Partitioning-invariance canary: the repo's core determinism claim is
  * that NO query's answer depends on physical partitioning — prefix sums
  * ride seeded-sample ranges (Dist), every FP aggregation is either
  * exact-integer or a sorted fold, and every output carries a total
  * order. This spec executes the most order-sensitive queries under a
  * deliberately different shuffle-partition count and asserts the
  * collected results are IDENTICAL — the failure mode it guards is a
  * helper quietly keying on a physical partition id or an unquantized
  * double sneaking into a comparison.
  */
class DeterminismSpec extends AnyFunSuite {
  import SparkFixture.{spark, sfDir}

  /** Queries whose construction is most at risk of partition-count
    * sensitivity: distributed prefix sums/ranks (token_budget,
    * histogram_eqdepth, vocab_coverage, drift_ks, skyline), the
    * sweep line (concurrency: prefix sum + global lead), the SPRT
    * walk, and a sorted-fold FP aggregate (lm_perplexity). */
  private val canaries = Seq(
    "q_token_budget", "q_histogram_eqdepth", "q_vocab_coverage",
    "q_drift_ks", "q_skyline", "q_concurrency", "q_ab_sprt",
    "q_lm_perplexity")

  private def rows(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, sfDir)
      .collect().map(_.toString).toSeq

  canaries.foreach { name =>
    test(s"$name is invariant to the shuffle-partition count") {
      val key = "spark.sql.shuffle.partitions"
      val old = spark.conf.get(key)
      val base = rows(name)
      try {
        spark.conf.set(key, "7")
        val alt = rows(name)
        assert(alt == base,
          s"$name changed under $key=7 (baseline $old): " +
            alt.diff(base).take(3).mkString("; "))
      } finally spark.conf.set(key, old)
    }
  }

  test("Canon.normalizeNegZero collapses -0.0 and preserves everything else") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, -0.0, -0.0f, "a"),
      (2L, 0.0, 0.0f, "b"),
      (3L, -1.5, 2.5f, "c"),
      (4L, Double.NaN, Float.NaN, "d"))
      .toDF("id", "d", "f", "s")
    val out = graft.engine.Canon.normalizeNegZero(df)
      .orderBy(col("id")).collect()
    // row 1: both signed zeros become unsigned (+Inf reciprocal)
    assert(1.0 / out(0).getDouble(1) > 0, "-0.0 double survived")
    assert(1.0f / out(0).getFloat(2) > 0, "-0.0 float survived")
    // rows 2-4: values untouched (incl. NaN), schema/order preserved
    assert(out(1).getDouble(1) == 0.0 && out(1).getFloat(2) == 0.0f)
    assert(out(2).getDouble(1) == -1.5 && out(2).getFloat(2) == 2.5f)
    assert(out(3).getDouble(1).isNaN && out(3).getFloat(2).isNaN)
    assert(out.map(_.getString(3)).toSeq == Seq("a", "b", "c", "d"))
    assert(graft.engine.Canon.normalizeNegZero(df).schema == df.schema)
  }
}
