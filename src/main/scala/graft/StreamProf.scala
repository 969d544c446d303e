package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

// Dev-only streaming profiler: runs named streaming queries with a global
// progress listener and dumps each micro-batch's durationMs breakdown
// (addBatch / getBatch / queryPlanning / walCommit / commitOffsets /
// triggerExecution) plus state-operator commit times — the evidence for
// where the streaming family's cpu≪wall floor actually lives.
object StreamProf {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    s.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit =
        println(s"[prof] started ${e.name} at ${System.nanoTime() / 1000000}")
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit =
        println(s"[prof] ${e.progress.json}")
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        println(s"[prof] terminated at ${System.nanoTime() / 1000000}")
    })
    val qs = if (args.nonEmpty) args.toSeq else Seq("q_stream_stream_join")
    for (q <- qs; i <- 1 to 2) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(s, d).write.format("noop").mode("overwrite").save()
      println(f"[prof] $q run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      graft.engine.Pins.releaseAll()
    }
  }
}
