package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** Output canonicalization for the oracle gate.
  *
  * IEEE-754 has a signed zero but the comparison harness hashes the two
  * representations differently, and the engines disagree on which one a
  * rounded tiny-negative lands on: DuckDB's `round(-3.5e-7, 6)` keeps the
  * sign (`-0.0`) while Spark's BigDecimal-based `round` cannot represent
  * it (`+0.0`). CORRECTNESS_r10 caught exactly this on one of
  * q_embed_gram's 2080 cells. Numerically the values are equal
  * (`-0.0 == 0.0`), so collapsing to the unsigned representation loses
  * nothing and removes the whole mismatch class at the gate.
  *
  * Queries emit scalar top-level columns only (QueryCorpusSpec pins
  * this — the driver's pandas canonicalizer cannot hash composites), so
  * normalizing the top-level Float/Double columns covers the corpus.
  */
object Canon {

  /** `-0.0 → 0.0` for one floating column; everything else (including
    * NaN, which compares false to 0.0) passes through untouched. Java
    * `==` on doubles treats the zeros as equal, so the single comparison
    * catches both and stays inside whole-stage codegen. */
  private def unsignZero(c: Column, isFloat: Boolean): Column = {
    val zero = if (isFloat) lit(0.0f) else lit(0.0)
    when(c === zero, zero).otherwise(c)
  }

  /** Rewrite every top-level Float/Double column so no `-0.0` survives
    * into the verify dump. Column order, names, and non-floating types
    * are preserved exactly. */
  def normalizeNegZero(df: DataFrame): DataFrame = {
    val hasFloating = df.schema.fields.exists(f =>
      f.dataType == DoubleType || f.dataType == FloatType)
    if (!hasFloating) df
    else df.select(df.schema.fields.map { f =>
      f.dataType match {
        case DoubleType => unsignZero(col(f.name), isFloat = false).as(f.name)
        case FloatType  => unsignZero(col(f.name), isFloat = true).as(f.name)
        case _          => col(f.name)
      }
    }.toIndexedSeq: _*)
  }
}
