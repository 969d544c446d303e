package org.apache.spark.sql.graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Expression, ExpressionInfo, LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Engine extension surface (SURVEY.md §4.2 "custom work"):
  *
  *  - `GraftFunctions.register` exposes the native expressions to SQL
  *    (`graft_dot`, `graft_sorted_intersect_count`, `graft_trigram_codes`,
  *    `graft_shingle_hashes`, `graft_splitmix64`, and the
  *    `graft_sentences` generator for `LATERAL VIEW`) on a live session;
  *  - `NativeDotProductRewrite` is a `Rule[LogicalPlan]` that rewrites the
  *    interpreted higher-order formulation
  *    `aggregate(zip_with(a, b, (x, y) -> x * y), 0.0d, (acc, v) -> acc + v)`
  *    into the codegen'd `DotProductDouble` — identical FP fold order, so
  *    results are bit-equal while per-call cost drops ~100×;
  *  - `GraftExtensions` bundles both for the
  *    `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`
  *    config path (cluster deployments); `Tables.ensureConf` applies the
  *    same registrations to locally-built sessions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
    ext.injectOptimizerRule(_ => NativeDotProductRewrite)
    ext.injectPlannerStrategy(_ => RangeJoinStrategy)
  }
}

object GraftFunctions {
  private def info(name: String, usage: String) =
    new ExpressionInfo("org.apache.spark.sql.graft.NativeExpressions",
      null, name, usage, "")

  private def binary(f: (Expression, Expression) => Expression)(
      args: Seq[Expression]): Expression = {
    require(args.length == 2, s"expected 2 arguments, got ${args.length}")
    f(args(0), args(1))
  }

  val all: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      info("graft_dot", "_FUNC_(a, b) - sequential-fold dot product of two array<double>"),
      binary(NativeExpressions.DotProductDouble) _),
    (FunctionIdentifier("graft_sorted_intersect_count"),
      info("graft_sorted_intersect_count", "_FUNC_(a, b) - intersection size of two sorted int arrays"),
      binary(NativeExpressions.SortedIntersectCount) _),
    (FunctionIdentifier("graft_trigram_codes"),
      info("graft_trigram_codes", "_FUNC_(bin) - sorted distinct byte-trigram codes"),
      args => {
        require(args.length == 1, s"expected 1 argument, got ${args.length}")
        NativeExpressions.SortedDistinctTrigramCodes(args.head)
      }),
    (FunctionIdentifier("graft_shingle_hashes"),
      info("graft_shingle_hashes", "_FUNC_(bin, n) - sorted distinct n-word shingle hashes"),
      binary(NativeExpressions.SortedDistinctShingleHashes) _),
    (FunctionIdentifier("graft_splitmix64"),
      info("graft_splitmix64", "_FUNC_(x) - splitmix64 finalizer of a 64-bit value"),
      args => {
        require(args.length == 1, s"expected 1 argument, got ${args.length}")
        NativeExpressions.SplitMix64(args.head)
      }),
    (FunctionIdentifier("graft_jaro_winkler"),
      info("graft_jaro_winkler", "_FUNC_(a, b) - Jaro-Winkler similarity (DuckDB-bit-exact)"),
      binary(NativeExpressions.JaroWinkler) _),
    (FunctionIdentifier("graft_topk"),
      info("graft_topk", "_FUNC_(v, k) - aggregate: k largest bigints, descending (bounded-heap partial agg)"),
      binary(TopKLongs(_, _)) _),
    (FunctionIdentifier("graft_sentences"),
      info("graft_sentences", "_FUNC_(text) - UDTF: one (pos, sentence) row per sentence"),
      args => {
        require(args.length == 1, s"expected 1 argument, got ${args.length}")
        NativeExpressions.SentenceSplit(args.head)
      })
  )

  /** Idempotent registration on a live session (the builder-extensions
    * path only applies to sessions constructed with the config). Cheap
    * on repeat calls: bails on the registry probe — this is invoked from
    * every table load (Tables.ensureConf). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(all.head._1)) {
      all.foreach { case (ident, i, builder) =>
        registry.registerFunction(ident, i, builder)
      }
    }
    if (!spark.experimental.extraOptimizations.contains(NativeDotProductRewrite)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ NativeDotProductRewrite
    }
  }
}

/** Rewrites `aggregate(zip_with(a, b, (x, y) -> x * y), 0.0d,
  * (acc, v) -> acc + v)` (and the same shape with an identity finish
  * lambda) to `DotProductDouble(a, b)`. Matching is structural on the
  * lambda bodies — only the exact multiply/add fold with a 0.0 seed is
  * rewritten, anything else is left untouched.
  */
object NativeDotProductRewrite extends Rule[LogicalPlan] {

  private def isIdentityFinish(finish: LambdaFunction): Boolean =
    finish match {
      case LambdaFunction(v: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
        v.exprId == arg.exprId
      case _ => false
    }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(mx: NamedLambdaVariable,
                my: NamedLambdaVariable, _),
                Seq(zx: NamedLambdaVariable, zy: NamedLambdaVariable), _)),
            Literal(zero, DoubleType),
            LambdaFunction(Add(acc: NamedLambdaVariable,
              el: NamedLambdaVariable, _),
              Seq(la: NamedLambdaVariable, le: NamedLambdaVariable), _),
            finish: LambdaFunction)
          // raw-bits check: -0.0 == 0.0 numerically, but a -0.0 seed
          // changes the advertised bit-equality on empty arrays
          // (fold over [] returns the seed itself)
          if zero != null &&
            java.lang.Double.doubleToRawLongBits(
              zero.asInstanceOf[Double]) == 0L &&
            mx.exprId == zx.exprId && my.exprId == zy.exprId &&
            acc.exprId == la.exprId && el.exprId == le.exprId &&
            isIdentityFinish(finish) &&
            isDoubleArray(a) && isDoubleArray(b) =>
        NativeExpressions.DotProductDouble(a, b)
    }
}
