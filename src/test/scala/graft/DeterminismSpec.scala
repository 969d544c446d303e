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
}
