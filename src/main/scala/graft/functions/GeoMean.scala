package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY.md §2.2 "UDF / UDAF / UDTF surface"): geometric mean
  * via sum-of-logs, the standard numerically-stable formulation.
  *
  * Implemented as an `Aggregator` so Catalyst runs it as a proper two-phase
  * (partial + final) aggregate: each partition reduces locally and only the
  * (sumLog, n) buffer crosses the shuffle — the 100 TB-safe shape.
  */
case class GeoMeanBuffer(var sumLog: Double, var n: Long)

object GeoMean extends Aggregator[Double, GeoMeanBuffer, Double] {
  override def zero: GeoMeanBuffer = GeoMeanBuffer(0.0, 0L)
  override def reduce(b: GeoMeanBuffer, x: Double): GeoMeanBuffer = {
    b.sumLog += math.log(x); b.n += 1; b
  }
  override def merge(a: GeoMeanBuffer, b: GeoMeanBuffer): GeoMeanBuffer = {
    a.sumLog += b.sumLog; a.n += b.n; a
  }
  override def finish(b: GeoMeanBuffer): Double =
    if (b.n == 0) Double.NaN else math.exp(b.sumLog / b.n)
  override def bufferEncoder: Encoder[GeoMeanBuffer] = Encoders.product
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
