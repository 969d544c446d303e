package graft

import org.apache.spark.sql.SparkSession

/** Dev-only probe runner (test scope — not part of the engine): times one
  * named corpus query warm on each given data dir, for the PERF.md 10×
  * scale probes. Usage:
  *   sbt 'Test/runMain graft.ProbeMain q_name dir1 dir2 ...'
  */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val name = args.head
    val dirs = args.tail
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    dirs.foreach { d =>
      (1 to 3).foreach { rep =>
        val t0 = System.nanoTime
        val n = SparkEntry.queries(name)(spark, d).count()
        val dt = (System.nanoTime - t0) / 1e9
        println(f"PROBE $name $d rep=$rep rows=$n sec=$dt%.2f")
      }
    }
    spark.stop()
  }
}
