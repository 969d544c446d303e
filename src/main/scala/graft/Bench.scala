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
    // One hung query must not lose the whole round's bench artifact: run
    // each count under a job group with a hard timeout. On timeout,
    // cancel the group AND stop any active streaming query — streams run
    // their micro-batches on their own thread under their own job group,
    // so cancelJobGroup alone would leave an orphaned stream burning
    // cores under every subsequent query. Returns true on success.
    def timedCount(name: String,
                   fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Boolean = {
      val task = pool.submit(new java.util.concurrent.Callable[Long] {
        override def call(): Long = {
          spark.sparkContext.setJobGroup(name, name, interruptOnCancel = true)
          try fn(spark, sfDir).count()
          finally spark.sparkContext.clearJobGroup()
        }
      })
      try { task.get(timeoutSec, TimeUnit.SECONDS); true }
      catch {
        case _: TimeoutException =>
          spark.sparkContext.cancelJobGroup(name)
          spark.streams.active.foreach { q =>
            try q.stop() catch { case _: Throwable => () }
          }
          task.cancel(true)
          System.err.println(s"[bench] $name TIMED OUT after ${timeoutSec}s")
          false
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: " +
            Option(e.getCause).getOrElse(e).getMessage)
          false
      }
    }
    // Untimed warmup: JIT + codegen + parquet footer caches, so the first
    // timed query measures the operator rather than JVM warmup. Guarded:
    // a missing warmup query must not sink the whole artifact.
    try timedCount("warmup", SparkEntry.queries("q_scan_project"))
    catch { case _: Throwable => () }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = timedCount(name, fn)
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-24s $dt%8.2f s" +
        (if (ok) "" else "  [FAILED/TIMEOUT]"))
      // failures are recorded as negative sentinels so a timeout ceiling
      // can never masquerade as a measurement in round-over-round diffs
      name -> (if (ok) dt else -dt)
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ > 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
    pool.shutdownNow()
    ()
  }
}
