package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: write `.explain("formatted")` output for declared queries to
  * files — the optimization-round evidence trail (plans/r16/<q>_<tag>.txt).
  *
  *   sbt "Test/runMain graft.ExplainDump -tag before q_hits q_pagerank"
  *
  * `-sf <dir>` overrides the corpus (default sf0.1 — the bench corpus, so
  * plan shapes match what the bench measures); `-out <dir>` the output dir
  * (default plans/r16). No query names = every declared query.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    def flagVal(f: String, dflt: String): String =
      args.sliding(2).collectFirst { case Array(`f`, v) => v }.getOrElse(dflt)
    val sfDir = flagVal("-sf", "/root/testdata/sf0.1")
    val outDir = flagVal("-out", "plans/r16")
    val tag = flagVal("-tag", "before")
    val flagVals = Set(sfDir, outDir, tag)
    val names = args.filterNot(a => a.startsWith("-") || flagVals(a))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    val picked =
      if (names.isEmpty) SparkEntry.queries.keys.toSeq.sorted else names.toSeq
    picked.foreach { q =>
      SparkEntry.queries.get(q) match {
        case Some(fn) =>
          val out = new java.io.File(outDir, s"${q}_$tag.txt")
          val w = new java.io.PrintWriter(out)
          try {
            try {
              val df = fn(spark, sfDir)
              w.println(df.queryExecution.explainString(
                org.apache.spark.sql.execution.FormattedMode))
            } catch {
              case e: Throwable => w.println(s"PLAN FAILED: $e")
            }
          } finally w.close()
          println(s"wrote $out")
          graft.engine.Pins.releaseAll()
        case None => println(s"unknown query: $q")
      }
    }
    spark.stop()
  }
}
