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

  /** All-pairs cosine mining over a points table that has an `id` column,
    * a `v` array<double> column, and any extra per-point columns. Norms
    * are computed once per point BEFORE the pair join (recomputing them
    * per pair triples the fold work — measured 3× slower). Output: every
    * input column twice, suffixed `_1`/`_2` (id_1 < id_2), plus raw
    * `cos_raw >= threshold`. Intentionally O(n²): this is the exactness
    * baseline; LSH/IVF are the scale paths. */
  def cosinePairs(points: org.apache.spark.sql.DataFrame,
                  threshold: Double): org.apache.spark.sql.DataFrame = {
    val n = points.withColumn("nrm", norm(col("v")))
    def side(suffix: String) =
      n.select(n.columns.map(c => col(c).as(s"$c$suffix")).toSeq: _*)
    side("_1").join(side("_2"), col("id_1") < col("id_2"))
      .withColumn("cos_raw",
        dot(col("v_1"), col("v_2")) / (col("nrm_1") * col("nrm_2")))
      .filter(col("cos_raw") >= threshold)
  }

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
