package graft
import org.apache.spark.sql.SparkSession
import java.util.concurrent.{Executors, TimeUnit, TimeoutException}
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val timeoutSec =
      sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT", "240").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pool = Executors.newCachedThreadPool()
    // One hung query must not lose the whole round's bench artifact:
    // run each count under a job group with a hard timeout; on timeout
    // cancel the group's jobs and record -2 for that query.
    def timedCount(name: String,
                   fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Long = {
      val task = pool.submit(new java.util.concurrent.Callable[Long] {
        override def call(): Long = {
          spark.sparkContext.setJobGroup(name, name, interruptOnCancel = true)
          try fn(spark, sfDir).count()
          finally spark.sparkContext.clearJobGroup()
        }
      })
      try task.get(timeoutSec, TimeUnit.SECONDS)
      catch {
        case _: TimeoutException =>
          spark.sparkContext.cancelJobGroup(name)
          task.cancel(true)
          System.err.println(s"[bench] $name TIMED OUT after ${timeoutSec}s")
          -2L
        case _: Throwable => -1L
      }
    }
    // Untimed warmup: JIT + codegen + parquet footer caches, so the first
    // timed query measures the operator rather than JVM warmup.
    timedCount("warmup", SparkEntry.queries("q_scan_project"))
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      timedCount(name, fn)
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-24s $dt%8.2f s")
      name -> dt
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
    pool.shutdownNow()
    ()
  }
}
