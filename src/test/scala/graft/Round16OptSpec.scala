package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.functions.{ConnectedComponents, TextDedup}

/** Round-16 OPTIMIZATION round, focused result-identity specs: every new
  * session memo (tradeEdges / cohortCdf / dupLabels / coTriangles) and
  * the q_hits degree-identity normalization must be bit-identical to the
  * direct per-query computation they replaced. The DuckDB oracle gate
  * re-proves this end to end at sf0.01; these specs pin the identity at
  * the artifact level so a future edit that breaks determinism fails
  * HERE with a named cause, not as an opaque oracle hash mismatch.
  */
class Round16OptSpec extends AnyFunSuite {
  import SparkFixture.{spark, sfDir}

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("tradeEdges memo equals direct lineitem⋈orders distinct mining") {
    val direct = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("ck"), col("l_suppkey").as("sk"))
      .distinct()
    val memo = graft.operators.AnalyticsQueries.tradeEdges(spark, sfDir)
    assert(rowsOf(memo) == rowsOf(direct))
    // second call returns the same cached frame (no rebuild per query)
    assert(memo eq graft.operators.AnalyticsQueries.tradeEdges(spark, sfDir))
  }

  test("dupLabels memo equals a direct largeSmallStar over the pair list") {
    val pairs = TextDedup.exactJaccardPairs(
        Tables.documents(spark, sfDir)
          .select(col("doc_id"), col("text")), 0.7)
      .select(col("d1"), col("d2"))
    val direct = ConnectedComponents.largeSmallStar(pairs)
    val viaQuery = SparkEntry.queries("q_dup_clusters")(spark, sfDir)
    val directClusters = direct
      .groupBy(col("lbl").as("cluster_id"))
      .agg(count(lit(1)).as("n_members"),
        array_join(sort_array(collect_list(col("v"))), ",").as("members"))
      .orderBy(col("cluster_id"))
    assert(rowsOf(viaQuery) == rowsOf(directClusters))
  }

  test("coTriangles memo: triangle_count and clustering_coef agree per node") {
    // the two consumers must read the SAME counts: every top-20 row of
    // q_triangle_count appears in q_clustering_coef with identical
    // (degree, n_tri)
    val top = SparkEntry.queries("q_triangle_count")(spark, sfDir)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
    val cc = SparkEntry.queries("q_clustering_coef")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    top.foreach { case (node, dt) =>
      assert(cc.get(node).contains(dt),
        s"node $node: triangle_count says $dt, clustering_coef says ${cc.get(node)}")
    }
  }

  test("q_hits degree-identity L1 totals match the direct half-step sums") {
    // ta = Σ_ck h·outdeg(ck) must equal Σ_sk (Σ_edges h) — the identity
    // the r16-opt loop folds back as a literal. Checked on round 1 with
    // uniform h = 1: both sides are then just |E|.
    val e0 = graft.operators.AnalyticsQueries.tradeEdges(spark, sfDir)
    val viaDeg = e0.groupBy(col("ck")).agg(count(lit(1)).as("odeg"))
      .agg(sum(col("odeg"))).head().getLong(0)
    val viaHalfStep = e0.groupBy(col("sk")).agg(count(lit(1)).as("araw"))
      .agg(sum(col("araw"))).head().getLong(0)
    assert(viaDeg == viaHalfStep && viaDeg == e0.count())
  }

  test("cohortCdf memo is cached and carries exact cumulative cohorts") {
    val c1 = graft.operators.DriftQueries.cohortCdf(spark, sfDir)
    val c2 = graft.operators.DriftQueries.cohortCdf(spark, sfDir)
    assert(c1 eq c2, "cohortCdf must be the session-cached frame")
    val last = c1.orderBy(col("vq").desc).limit(1)
      .select(col("cum_a"), col("cum_b")).head()
    val tot = c1.agg(sum(col("na")), sum(col("nb"))).head()
    assert(last.getLong(0) == tot.getLong(0) &&
      last.getLong(1) == tot.getLong(1),
      "final cumulative counts must equal the cohort totals")
  }
}
