package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{GraftFunctions, NativeDotProductRewrite}

/** The extension surface: native expressions callable from SQL, and the
  * optimizer rule that swaps the interpreted HOF dot-product shape for
  * the codegen'd expression without changing results.
  */
class ExtensionsSpec extends AnyFunSuite {
  import SparkFixture.spark
  import spark.implicits._

  GraftFunctions.register(spark)

  test("native expressions are callable from SQL") {
    val r = spark.sql(
      """SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |  graft_sorted_intersect_count(array(1, 2, 5), array(2, 5, 9)) AS c,
        |  size(graft_trigram_codes(encode('abcd', 'UTF-8'))) AS t,
        |  size(graft_shingle_hashes(encode('a b c d e f', 'UTF-8'), 5)) AS s
        |""".stripMargin).as[(Double, Int, Int, Int)].head()
    assert(r == ((11.0, 2, 2, 2)))
  }

  test("optimizer rule rewrites the HOF dot-product shape") {
    // parquet-backed input so constant folding can't collapse the plan
    // before the rewrite is observable
    val e = graft.engine.Tables.embeddings(spark, SparkFixture.sfDir)
      .withColumn("v", $"embedding".cast("array<double>"))
    val df = e.select(aggregate(zip_with($"v", $"v", (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("d"))
    val optimized = df.queryExecution.optimizedPlan
    assert(optimized.toString.contains("graft_dot"),
      s"rule did not fire:\n$optimized")
    // rewritten plan computes the same values as the native formulation
    val native = e.select(
      org.apache.spark.sql.graft.NativeExpressions.dot($"v", $"v").as("d"))
    assert(df.exceptAll(native).isEmpty && native.exceptAll(df).isEmpty)
  }

  test("rule leaves non-dot aggregate shapes untouched") {
    val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
      .select(
        // max-fold, not a dot product — must NOT be rewritten
        aggregate(zip_with($"a", $"b", (x, y) => x * y),
          lit(0.0), (acc, x) => greatest(acc, x)).as("m"),
        // different seed — must NOT be rewritten
        aggregate(zip_with($"a", $"b", (x, y) => x * y),
          lit(1.0), (acc, x) => acc + x).as("s1"))
    val opt = df.queryExecution.optimizedPlan.toString
    assert(!opt.contains("graft_dot"), opt)
    val (m, s1) = df.as[(Double, Double)].head()
    assert(m == 8.0 && s1 == 12.0)
  }

  test("rule does not fire on a -0.0 seed (raw-bits zero check)") {
    // -0.0 == 0.0 numerically, but fold over an empty array returns the
    // seed — rewriting would turn -0.0 into +0.0 and break advertised
    // bit-equality. The guard compares raw bits, so this stays HOF.
    val df = Seq((Seq.empty[Double], Seq.empty[Double])).toDF("a", "b")
      .select(aggregate(zip_with($"a", $"b", (x, y) => x * y),
        lit(-0.0), (acc, x) => acc + x).as("d"))
    val opt = df.queryExecution.optimizedPlan.toString
    assert(!opt.contains("graft_dot"), opt)
    val d = df.as[Double].head()
    assert(java.lang.Double.doubleToRawLongBits(d) ==
      java.lang.Double.doubleToRawLongBits(-0.0))
  }
}
