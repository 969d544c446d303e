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
    // same base resolution as SourceQueries.scratch (tmpfs when present)
    val base = sys.env.getOrElse("SPARK_GRAFT_SCRATCH",
      if (new java.io.File("/dev/shm").isDirectory) "/dev/shm" else "/tmp")
    val appDir = new java.io.File(
      s"$base/graft_io/${spark.sparkContext.applicationId}")
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

  test("q_dynamic_overwrite replaces only the restated partition's files") {
    import SparkFixture.sfDir
    def files(dir: String): Set[String] = {
      val f = new java.io.File(dir)
      Option(f.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    }
    // replay the write sequence directly so the file-level claim is
    // observable between the two writes (the query fn does both
    // internally): base static write, snapshot the untouched partition's
    // file names, dynamic-overwrite ONLY 1-URGENT, re-snapshot
    val out = s"/tmp/graft_io/${spark.sparkContext.applicationId}/" +
      "dynpart_spec"
    val base = graft.engine.Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice"),
        col("o_orderpriority"))
    base.write.mode("overwrite").partitionBy("o_orderpriority").parquet(out)
    val mediumBefore = files(s"$out/o_orderpriority=3-MEDIUM")
    val urgentBefore = files(s"$out/o_orderpriority=1-URGENT")
    assert(mediumBefore.nonEmpty && urgentBefore.nonEmpty)
    val modeKey = "spark.sql.sources.partitionOverwriteMode"
    val oldMode = spark.conf.getOption(modeKey)
    try {
      spark.conf.set(modeKey, "dynamic")
      base.filter(col("o_orderpriority") === "1-URGENT")
        .withColumn("o_totalprice", col("o_totalprice") * lit(0.9))
        .write.mode("overwrite").partitionBy("o_orderpriority")
        .parquet(out)
    } finally oldMode match {
      case Some(v) => spark.conf.set(modeKey, v)
      case None    => spark.conf.unset(modeKey)
    }
    // untouched partition: identical files (no rewrite happened at all);
    // restated partition: fresh task-UUID file names
    assert(files(s"$out/o_orderpriority=3-MEDIUM") == mediumBefore,
      "dynamic overwrite must not touch partitions absent from the batch")
    assert(files(s"$out/o_orderpriority=1-URGENT") != urgentBefore,
      "restated partition must have been replaced")
    // and the oracle-checked query itself returns rows for EVERY
    // priority — a static (truncating) overwrite could not
    val q = SparkEntry.queries("q_dynamic_overwrite")(spark, sfDir)
      .collect()
    assert(q.length == 5, s"expected all 5 priorities, got ${q.length}")
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
