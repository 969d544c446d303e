package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.AsOfJoin

/** AsOfJoin semantics (graft/plans/AsOfJoin.scala): nearest-earlier match
  * per key, equal-timestamp rows visible, left-outer nulls when no earlier
  * right row exists, keys never cross.
  */
class AsOfJoinSpec extends AnyFunSuite {
  import SparkFixture.spark
  import spark.implicits._

  private lazy val left = Seq(
    (1L, 10L, "l-a"), (1L, 20L, "l-b"), (2L, 15L, "l-c"), (3L, 5L, "l-d")
  ).toDF("k", "t", "lv")

  private lazy val right = Seq(
    (1L, 5L, "r-early"), (1L, 20L, "r-tie"), (1L, 30L, "r-late"),
    (2L, 1L, "r-two")
  ).toDF("rk", "rt", "rv")

  private lazy val out = AsOfJoin.asofBackward(
    left, right,
    leftKey = col("k"), rightKey = col("rk"),
    leftTs = col("t"), rightTs = col("rt"))
    .select($"k", $"t", $"rv").orderBy($"k", $"t")
    .as[(Long, Long, Option[String])].collect().toSeq

  test("picks the latest right row with rt <= t per key") {
    assert(out.contains((1L, 10L, Some("r-early"))))
    assert(out.contains((2L, 15L, Some("r-two"))))
  }

  test("equal timestamps match (right sorts before left)") {
    assert(out.contains((1L, 20L, Some("r-tie"))))
  }

  test("no earlier right row -> null (left-outer)") {
    assert(out.contains((3L, 5L, None)))
  }

  test("every left row survives exactly once") {
    assert(out.size == 4)
    assert(out.map(r => (r._1, r._2)).distinct.size == 4)
  }

  private lazy val fwd = AsOfJoin.asofForward(
    left, right,
    leftKey = col("k"), rightKey = col("rk"),
    leftTs = col("t"), rightTs = col("rt"))
    .select($"k", $"t", $"rv").orderBy($"k", $"t")
    .as[(Long, Long, Option[String])].collect().toSeq

  test("forward: picks the earliest right row with rt >= t per key") {
    assert(fwd.contains((1L, 10L, Some("r-tie"))))
  }

  test("forward: equal timestamps match (frame starts at the left row)") {
    assert(fwd.contains((1L, 20L, Some("r-tie"))))
  }

  test("forward: no later right row -> null (left-outer)") {
    assert(fwd.contains((2L, 15L, None)))
    assert(fwd.contains((3L, 5L, None)))
  }

  test("forward: every left row survives exactly once") {
    assert(fwd.size == 4)
    assert(fwd.map(r => (r._1, r._2)).distinct.size == 4)
  }
}
