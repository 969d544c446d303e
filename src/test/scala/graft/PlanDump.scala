package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the executed physical plan of declared queries.
  *
  *   sbt "Test/runMain graft.PlanDump q_funnel q_dedup_editdist"
  *
  * No args = every declared query. Second use: `-sf <dir>` overrides the
  * corpus (default sf0.01 — big enough that AQE/broadcast decisions match
  * the correctness-gate runs, small enough to plan instantly).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val (flags, names) = args.partition(_.startsWith("-"))
    val sfDir = flags.sliding(2).collectFirst {
      case Array("-sf", v) => v
    }.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val picked =
      if (names.isEmpty) SparkEntry.queries.keys.toSeq.sorted else names.toSeq
    picked.foreach { q =>
      println(s"\n======== $q ========")
      SparkEntry.queries.get(q) match {
        case Some(fn) =>
          try println(fn(spark, sfDir).queryExecution.executedPlan.toString)
          catch { case e: Throwable => println(s"PLAN FAILED: $e") }
        case None => println("unknown query")
      }
    }
    spark.stop()
  }
}
