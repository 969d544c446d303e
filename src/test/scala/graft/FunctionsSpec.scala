package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.GeoMean

/** Custom aggregate (GeoMean) and multimodal decode consistency. */
class FunctionsSpec extends AnyFunSuite {
  import SparkFixture.{spark, sfDir}
  import spark.implicits._

  test("GeoMean UDAF: geomean(2, 8) == 4; merge across partitions") {
    val gm = udaf(GeoMean)
    val one = Seq(2.0, 8.0).toDF("v").agg(gm($"v")).as[Double].head()
    assert(math.abs(one - 4.0) < 1e-12)
    // 8 partitions forces non-trivial buffer merges
    val many = spark.range(1, 101).repartition(8)
      .select($"id".cast("double").as("v")).agg(gm($"v")).as[Double].head()
    val expected = math.exp((1 to 100).map(i => math.log(i.toDouble)).sum / 100)
    assert(math.abs(many - expected) < 1e-9)
  }

  test("multimodal decode agrees with metadata byte counts") {
    val meta = SparkEntry.queries("q_mm_metadata")(spark, sfDir)
      .select($"doc_id", $"n_bytes").as[(Long, Long)].collect().toMap
    val dec = SparkEntry.queries("q_mm_decode")(spark, sfDir)
      .select($"doc_id", $"n_bytes", $"avg_byte", $"byte_entropy")
      .as[(Long, Int, Double, Double)].collect()
    assert(dec.length == meta.size)
    dec.foreach { case (id, nb, avg, ent) =>
      assert(meta(id) == nb.toLong)
      // ASCII word soup: printable range, nonzero entropy
      assert(avg > 32.0 && avg < 127.0)
      assert(ent > 0.0 && ent <= 8.0)
    }
  }
}
