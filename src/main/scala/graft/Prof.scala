package graft
import org.apache.spark.sql.SparkSession
object Prof {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // pinned like Bench so a calendar-keyed probe can never silently
      // differ from the bench path (VERDICT r15 minor #3); the forked-JVM
      // -D flag covers sbt runs, this covers any other launcher
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val qs = if (args.nonEmpty) args.toSeq
      else Seq("q_dedup_ngram", "q_repetition_ratio", "q_dup_clusters", "q_heavy_hitters")
    for (q <- qs; i <- 1 to 2) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(s, d).write.format("noop").mode("overwrite").save()
      println(f"$q run$i: ${(System.nanoTime()-t0)/1e9}%.2f s")
      // mirror Bench's per-query pin release so each run measures the
      // full operator (codec pass included), not a cache-reuse artifact
      graft.engine.Pins.releaseAll()
    }
  }
}
// Dev-only profiling main: times named queries (default: the historical
// hotspots) twice each with the same session confs + noop-write
// materialization Bench uses, so cold/warm costs are separable without
// running the full 100+-query bench.
