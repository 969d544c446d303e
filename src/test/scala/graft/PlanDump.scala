package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the executed physical plan of declared queries.
  *
  *   sbt "Test/runMain graft.PlanDump q_funnel q_dedup_editdist"
  *
  * No args = every declared query. `-sf <dir>` overrides the corpus
  * (default sf0.01 — big enough that AQE/broadcast decisions match the
  * correctness-gate runs, small enough to plan instantly). `-time` also
  * EXECUTES each query (noop write, twice — cold then warm) and prints
  * both wall times.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.sliding(2).collectFirst {
      case Array("-sf", v) => v
    }.getOrElse("/root/testdata/sf0.01")
    // drop flags AND the -sf value from the query-name list
    val names = args.zipWithIndex.filterNot { case (a, i) =>
      a.startsWith("-") || (i > 0 && args(i - 1) == "-sf")
    }.map(_._1)
    val time = args.contains("-time")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // ad-hoc conf sweeps for floor experiments, e.g.
    // SPARK_GRAFT_EXTRA_CONF="spark.sql.streaming.stateStore.providerClass=...RocksDBStateStoreProvider"
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";;").foreach {
      kv => kv.split("=", 2) match {
        case Array(k, v) if k.nonEmpty => spark.conf.set(k, v)
        case _ => ()
      }
    })
    val picked =
      if (names.isEmpty) SparkEntry.queries.keys.toSeq.sorted else names.toSeq
    picked.foreach { q =>
      println(s"\n======== $q ========")
      SparkEntry.queries.get(q) match {
        case Some(fn) =>
          try {
            println(fn(spark, sfDir).queryExecution.executedPlan.toString)
            if (time) {
              def once(): Double = {
                val t0 = System.nanoTime()
                fn(spark, sfDir).write.format("noop")
                  .mode("overwrite").save()
                (System.nanoTime() - t0) / 1e9
              }
              println(f"[time] $q cold ${once()}%.2f s, warm ${once()}%.2f s")
            }
          } catch { case e: Throwable => println(s"PLAN FAILED: $e") }
        case None => println("unknown query")
      }
    }
    spark.stop()
  }
}
