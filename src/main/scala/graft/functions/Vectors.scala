package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from Spark's
  * higher-order functions so everything stays inside codegen (no UDFs).
  * SURVEY.md §2.2 "Similarity search".
  *
  * All arithmetic is done in double (after an explicit cast) with
  * sequential left-to-right folds, which makes results bit-reproducible
  * across engines and partitionings — required for the DuckDB oracle.
  */
object Vectors {

  /** Cast to array<double> (float math would drift vs the oracle). */
  def asDouble(a: Column): Column = a.cast("array<double>")

  /** Sequential-fold dot product of two equal-length vectors. Backed by a
    * codegen'd native expression (NativeExpressions.DotProductDouble): the
    * HOF formulation `aggregate(zip_with(...))` evaluates interpreted at
    * ~50µs/call, which dominates any pairwise similarity join. Same
    * left-to-right FP order, so results are unchanged bit-for-bit. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.NativeExpressions.dot(a, b)

  /** Squared L2 norm. */
  def sqNorm(a: Column): Column = dot(a, a)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(sqNorm(a))

  /** Cosine similarity (not assuming unit-normalized inputs). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Deterministic ±1 pseudo-random hyperplane component for LSH:
    * sign derived from murmur3 of (plane, dim). */
  def hyperplaneSign(plane: Int, dim: Column): Column =
    when(pmod(hash(lit(plane), dim), lit(2)) === 0, lit(1.0))
      .otherwise(lit(-1.0))

  /** `bits`-bit random-hyperplane LSH signature of a vector: bit k is the
    * sign of the projection onto deterministic hyperplane k. */
  def rhpSignature(v: Column, bits: Int): Column = {
    val proj = (0 until bits).map { k =>
      // sum_j v[j] * sign(k, j), via a fold over dimension indices
      val p = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1),
          (x, j) => x * when(pmod(hash(lit(k), j), lit(2)) === 0, lit(1.0))
            .otherwise(lit(-1.0))),
        lit(0.0), (acc, x) => acc + x)
      when(p > 0, lit(1L << k)).otherwise(0L)
    }
    proj.reduce(_.bitwiseOR(_))
  }
}
