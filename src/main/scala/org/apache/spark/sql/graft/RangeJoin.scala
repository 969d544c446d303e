package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, UnspecifiedDistribution}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Whole-operator extension tier (SURVEY.md §4.2): a custom logical plan +
  * planner strategy + physical operator, exercising the one Catalyst
  * extension point the engine had not yet used (`injectPlannerStrategy` /
  * `experimental.extraStrategies`). The other tiers — native expressions,
  * generator, declarative and imperative aggregates, optimizer rule, DSv2
  * catalog — are covered in NativeExpressions/NativeAggregates/
  * GraftExtensions/WorkspaceCatalog.
  *
  * The operator is a broadcast POINT-IN-INTERVAL range join: every left
  * row carrying a numeric `point` is matched against the (small) right
  * table of `[lo, hi)` intervals. Spark's built-in plan for the same
  * predicate (`p >= lo AND p < hi` with no equi-key) is
  * BroadcastNestedLoopJoin, which probes every interval for every row —
  * O(|L|·|R|) comparisons. This exec sorts the broadcast intervals by `lo`
  * once per partition and probes with binary search + a prefix-max(hi)
  * bounded walk-back: O(|L|·(log |R| + matches)). At 100 TB the left side
  * is the fact table (never shuffled, never sorted — the operator is
  * embarrassingly parallel over existing partitions) and the interval side
  * rides the standard BroadcastExchange (IdentityBroadcastMode), so AQE
  * and EnsureRequirements treat it exactly like a built-in broadcast join.
  *
  * Semantics: INNER join on `lo <= point < hi`; NULL in any of the three
  * terms never matches (SQL three-valued logic). All three terms are cast
  * to DOUBLE by the public API below — the operator's contract is numeric
  * intervals. Attribute sets of the two inputs must be disjoint (same
  * requirement as graft.plans.AsOfJoin; self-join lineage needs an
  * explicit alias on one side).
  */
case class RangeJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    point: Expression,
    lo: Expression,
    hi: Expression) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): RangeJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[RangeJoinPlan]] as [[GraftRangeJoinExec]]; everything else falls
  * through to the built-in strategies. */
object RangeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RangeJoinPlan(l, r, point, lo, hi) =>
      GraftRangeJoinExec(planLater(l), planLater(r), point, lo, hi) :: Nil
    case _ => Nil
  }
}

case class GraftRangeJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    point: Expression,
    lo: Expression,
    hi: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  /** The interval side is broadcast through the standard exchange: the
    * planner inserts BroadcastExchangeExec(IdentityBroadcastMode), the
    * same machinery BroadcastNestedLoopJoin uses, so the broadcast is
    * built once per query (not per partition) and reused across stages. */
  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): GraftRangeJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val broadcastRel = right.executeBroadcast[Array[InternalRow]]()
    val pointExpr = point
    val loExpr = lo
    val hiExpr = hi
    val leftOutput = left.output
    val rightOutput = right.output
    val allOutput = output
    left.execute().mapPartitionsInternal { iter =>
      val intervals = broadcastRel.value
      val loEval = BindReferences.bindReference(loExpr, rightOutput)
      val hiEval = BindReferences.bindReference(hiExpr, rightOutput)
      val pointEval = BindReferences.bindReference(pointExpr, leftOutput)
      // Build the sorted probe structure once per partition: intervals
      // sorted ascending by lo, plus prefixMaxHi[i] = max(hi[0..i]) so the
      // walk-back from the binary-search upper bound stops as soon as no
      // earlier interval can still cover the point — output-sensitive even
      // when interval lengths vary wildly. O(|R| log |R|) per partition on
      // a broadcast-small |R|.
      val triples = intervals.iterator.flatMap { r =>
        val lv = loEval.eval(r)
        val hv = hiEval.eval(r)
        if (lv == null || hv == null) Iterator.empty
        else Iterator.single((lv.asInstanceOf[Double], hv.asInstanceOf[Double], r))
      }.toArray.sortBy(_._1)
      val m = triples.length
      val loArr = new Array[Double](m)
      val hiArr = new Array[Double](m)
      val prefixMaxHi = new Array[Double](m)
      var i = 0
      var runMax = Double.NegativeInfinity
      while (i < m) {
        loArr(i) = triples(i)._1
        hiArr(i) = triples(i)._2
        runMax = math.max(runMax, hiArr(i))
        prefixMaxHi(i) = runMax
        i += 1
      }
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(allOutput, leftOutput ++ rightOutput)
      iter.flatMap { lrow =>
        val pv = pointEval.eval(lrow)
        if (pv == null || m == 0) Iterator.empty
        else {
          val p = pv.asInstanceOf[Double]
          // rightmost index with lo <= p (exclusive upper bound)
          var a = 0
          var b = m
          while (a < b) {
            val mid = (a + b) >>> 1
            if (loArr(mid) <= p) a = mid + 1 else b = mid
          }
          // every j < a has lo <= p; stop once prefixMaxHi says no earlier
          // interval can still have hi > p
          ((a - 1) to 0 by -1).iterator
            .takeWhile(j => prefixMaxHi(j) > p)
            .filter(j => hiArr(j) > p)
            .map { j =>
              numOutputRows += 1
              proj(joined(lrow, triples(j)._3))
            }
        }
      }
    }
  }
}

/** Public construction API for the custom plans (the `Dataset.ofRows` /
  * `logicalPlan` bridges are `private[sql]`, hence this file's package). */
object GraftPlans {
  /** Inner point-in-interval range join: one output row per (left row,
    * interval) pair with `lo <= point < hi`. `point` must resolve against
    * `left`, `lo`/`hi` against `right`; all three are cast to DOUBLE. The
    * right side is broadcast — it must be dimension-sized. */
  def rangeJoinPoint(left: DataFrame, right: DataFrame,
      point: Column, lo: Column, hi: Column): DataFrame = {
    // A Column built through the Spark 4 column-node API only becomes a
    // catalyst Expression during analysis of a KNOWN node — inside a
    // custom plan node it would surface as an unevaluable
    // ColumnNodeExpression. Pre-projecting the three terms as real
    // columns lets the stock analyzer do that conversion, and the node
    // then references plain resolved attributes.
    import org.apache.spark.sql.functions.col
    val l = left.select(point.cast("double").as("__graft_point"), col("*"))
      .asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    val r = right.select(lo.cast("double").as("__graft_lo"),
        hi.cast("double").as("__graft_hi"), col("*"))
      .asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    val lp = l.queryExecution.analyzed
    val rp = r.queryExecution.analyzed
    val node = RangeJoinPlan(lp, rp, lp.output.head,
      rp.output.head, rp.output(1))
    org.apache.spark.sql.classic.Dataset.ofRows(l.sparkSession, node)
      .drop("__graft_point", "__graft_lo", "__graft_hi")
  }

  /** Idempotent strategy registration on a live session (mirrors
    * GraftFunctions.register; the builder-extensions path is
    * GraftExtensions). */
  def register(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(RangeJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ RangeJoinStrategy
    }
  }
}
