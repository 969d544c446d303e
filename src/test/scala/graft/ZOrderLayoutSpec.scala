package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SourceQueries

/** The z-order layout's two contracts: (1) the bit-interleave expression
  * computes the Morton code, (2) range-partitioning on the z-value makes a
  * two-dimensional box predicate land in a small fraction of the written
  * files — the data-skipping property a single-column sort cannot give
  * both dimensions.
  */
class ZOrderLayoutSpec extends AnyFunSuite {
  import SparkFixture.{spark, sfDir}
  import spark.implicits._

  private def morton(x: Long, y: Long): Long =
    (0 until 8).map { i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }.sum

  test("zValue matches a reference Morton implementation") {
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (255L, 255L), (5L, 3L),
      (170L, 85L), (129L, 64L))
    val got = pts.toDF("x", "y")
      .withColumn("z", SourceQueries.zValue(col("x"), col("y")))
      .select($"x", $"y", $"z").as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z == morton(x, y), s"zValue($x,$y)=$z != ${morton(x, y)}")
    }
    // spot values: interleave(5=101b, 3=011b) = x bits at even positions
    // (1,0,1 -> 10001b) + y bits at odd (1,1,0 -> 01010b) = 27
    assert(morton(5L, 3L) == 27L)
  }

  test("box predicate touches a minority of z-ordered files") {
    val dir = java.nio.file.Files.createTempDirectory("zorder_spec")
      .toString
    graft.engine.Tables.lineitem(spark, sfDir)
      .select(pmod(col("l_partkey"), lit(256L)).as("px"),
        pmod(col("l_suppkey"), lit(256L)).as("sx"))
      .withColumn("zval", SourceQueries.zValue(col("px"), col("sx")))
      .repartitionByRange(16, col("zval"))
      .sortWithinPartitions(col("zval"))
      .write.mode("overwrite").parquet(dir)
    val files = spark.read.parquet(dir)
      .select(input_file_name().as("f"), col("px"), col("sx"))
    val total = files.select("f").distinct().count()
    // the px half of the box covers [32,64)∪[64,96), i.e. two contiguous
    // z-curve segments (z bit 10 / bit 12); with files holding disjoint
    // z ranges (repartitionByRange), the box must concentrate in a
    // minority of files. An unclustered layout spreads it across ~all.
    val touched = files
      .filter(col("px").between(32, 95) && col("sx").between(2, 5))
      .select("f").distinct().count()
    assert(total >= 4, s"expected several output files, got $total")
    assert(touched * 2 <= total,
      s"box touched $touched of $total files — layout not clustering")
  }
}
