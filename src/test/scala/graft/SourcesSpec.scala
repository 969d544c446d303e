package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Source/sink robustness the corpus roundtrips can't exercise: CSV
  * quoting/escaping of adversarial values, JSON null/unicode handling,
  * and schema-pinned reads (no inference pass).
  */
class SourcesSpec extends AnyFunSuite {
  import SparkFixture.spark
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_src_$name").toString

  test("CSV roundtrip preserves embedded commas, quotes, and newlines") {
    val rows = Seq(
      (1L, "plain"),
      (2L, "comma, inside"),
      (3L, "\"quoted\""),
      (4L, "line\nbreak"),
      (5L, "both,\"\n end"),
      (6L, ""))
    val out = tmp("csv_escape")
    rows.toDF("id", "s").write.mode("overwrite")
      .option("header", "true").csv(out)
    val back = spark.read
      .option("header", "true")
      .option("multiLine", "true") // embedded newlines span lines
      .schema("id LONG, s STRING")
      .csv(out)
      .as[(Long, String)].collect().sortBy(_._1)
    // empty string reads back as null in Spark CSV (documented default)
    val expected = rows.map { case (i, s) => (i, if (s.isEmpty) null else s) }
    assert(back.toSeq == expected)
  }

  test("JSON roundtrip preserves nulls and non-ASCII text") {
    val rows = Seq((1L, Some("héllo wörld"), Some(1.5)),
                   (2L, None, None),
                   (3L, Some("tab\tand\\slash"), Some(-0.25)))
    val out = tmp("json_escape")
    rows.toDF("id", "s", "v").write.mode("overwrite").json(out)
    val back = spark.read.schema("id LONG, s STRING, v DOUBLE").json(out)
      .as[(Long, Option[String], Option[Double])].collect().sortBy(_._1)
    assert(back.toSeq == rows)
  }

  test("roundtrip scratch dirs are namespaced by applicationId") {
    // two JVMs (Bench + Verify) running the same roundtrip query on the
    // same corpus must not race on the same /tmp files — the scratch path
    // carries the Spark applicationId
    graft.operators.SourceQueries.queries("q_csv_roundtrip")(
      spark, SparkFixture.sfDir).collect()
    val appDir = new java.io.File(
      s"/tmp/graft_io/${spark.sparkContext.applicationId}")
    assert(appDir.isDirectory,
      s"expected per-application scratch dir at $appDir")
  }

  test("explicit-schema reads never run an inference scan") {
    // schema-pinned read of a CSV with a wrong-looking column still uses
    // the declared type (inference would have picked int)
    val out = tmp("csv_schema")
    Seq(("1", "2")).toDF("a", "b").write.mode("overwrite")
      .option("header", "true").csv(out)
    val df = spark.read.option("header", "true")
      .schema("a STRING, b STRING").csv(out)
    assert(df.schema.map(_.dataType.simpleString) == Seq("string", "string"))
  }

  test("q_compact collapses the fragmented table to 4 files on disk") {
    import SparkFixture.sfDir
    val row = SparkEntry.queries("q_compact")(spark, sfDir).collect().head
    assert(row.getAs[Long]("n_files") == 4L)
    // the fragmented input really was fragmented, and both layouts exist
    def parquetFiles(name: String): Int = {
      val dir = new java.io.File(
        graft.operators.SourceQueries.scratch(spark, sfDir, name))
      dir.listFiles((_, f) => f.endsWith(".parquet")).length
    }
    assert(parquetFiles("lineitem_fragmented") == 64)
    assert(parquetFiles("lineitem_compacted") == 4)
  }
}
