package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.ConnectedComponents

/** Convergence + equivalence invariants for the large-star/small-star CC
  * (the q_dup_clusters backbone). The DuckDB oracle pins the exact labels
  * on the real dup graph; these pin the scale claim the oracle can't: a
  * diameter-Θ(n) graph must converge in O(log n) rounds, not O(n).
  */
class ConnectedComponentsSpec extends AnyFunSuite {
  import SparkFixture.spark
  import spark.implicits._

  private def labelsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain graph of 1024 nodes converges in <= 2*log2(n) + 2 rounds") {
    // path 0-1-2-...-1023: diameter 1023, the shape that blows any
    // per-hop propagation cap (templated near-dup spam)
    val n = 1024
    val chain = spark.range(0, n - 1)
      .select(col("id").as("a"), (col("id") + 1).as("b"))
    val (labels, rounds) =
      ConnectedComponents.largeSmallStarWithRounds(chain)
    val bound = 2 * (math.log(n.toDouble) / math.log(2.0)).ceil.toInt + 2
    assert(rounds <= bound, s"took $rounds rounds, bound $bound")
    val got = labelsOf(labels)
    assert(got.size == n)
    assert(got.values.forall(_ == 0L), "single component labeled by min")
  }

  test("chain with shuffled vertex ids still labels by component minimum") {
    // splitmix-style id scramble: min id lands mid-chain, so correctness
    // can't fall out of positional luck
    val n = 257
    val ids = (0 until n).map(i => ((i * 2654435761L) % 100003L) + 5L)
    val chain = ids.sliding(2).map(p => (p(0), p(1))).toSeq
      .toDF("a", "b")
    val (labels, rounds) =
      ConnectedComponents.largeSmallStarWithRounds(chain)
    assert(rounds <= 2 * (math.log(n.toDouble) / math.log(2.0)).ceil.toInt + 2)
    val got = labelsOf(labels)
    assert(got.size == n)
    assert(got.values.toSet == Set(ids.min))
  }

  test("matches min-label propagation on a multi-component random graph") {
    // deterministic pseudo-random graph: 400 vertices, ~300 edges drawn
    // from a LCG — several components of varied shape, some singleton-free
    val edges = (0 until 300).map { i =>
      val a = (i * 48271L) % 400L
      val b = (i * 69621L + 7L) % 400L
      (a, b)
    }.filter { case (a, b) => a != b }
    val df = edges.toDF("a", "b")
    val star = labelsOf(ConnectedComponents.largeSmallStar(df))
    val flood = labelsOf(ConnectedComponents.minLabelPropagation(df, 60))
    assert(star == flood)
  }

  test("two disjoint cliques stay disjoint and keep their own minima") {
    val k1 = for (a <- 10L to 14L; b <- 10L to 14L if a < b) yield (a, b)
    val k2 = for (a <- 20L to 25L; b <- 20L to 25L if a < b) yield (a, b)
    val got = labelsOf(
      ConnectedComponents.largeSmallStar((k1 ++ k2).toDF("a", "b")))
    assert((10L to 14L).forall(got(_) == 10L))
    assert((20L to 25L).forall(got(_) == 20L))
  }
}
