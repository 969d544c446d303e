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

  test("corpus text is single-byte UTF-8 (q_mm_resize oracle precondition)") {
    // The resize oracle compares Spark's byte-based substring(blob,1,128)
    // against DuckDB's character-based substr(text,1,128); they agree
    // only while every document is pure ASCII. Pin that assumption —
    // this fails loudly if the corpus generator ever emits multi-byte
    // text, instead of the oracle hash silently mismatching.
    val bad = graft.engine.Tables.documents(spark, sfDir)
      .filter(octet_length(encode($"text", "UTF-8")) =!= length($"text"))
      .count()
    assert(bad == 0, s"$bad documents contain multi-byte characters")
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
