package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LocalLimit, Window => LWindow}

/** Dev-only plan scanner (VERDICT r11 item 2/5): finds corpus queries whose
  * OPTIMIZED logical plan contains a Window with an EMPTY partitionSpec and
  * no Limit anywhere beneath it — the "moves all data to one task" shape
  * that cannot survive an unbounded frame at 100 TB. Output feeds the
  * PlanSpec allowlist of NDV/domain-bounded frames; anything not on that
  * list must either take a Limit first or ride Dist.globalPrefixSum.
  *
  * Known blind spot (ADVICE r12): auto-dispatch rows (q_dedup_auto,
  * q_dedup_ngram_auto, q_knn_triangles_auto, q_rank_stat family) run an
  * eager cardinality probe inside the query constructor and return
  * whichever branch the probe picks AT THE SCAN'S SF — so this gate only
  * ever audits that branch (the small/exact one at sf0.001). The large
  * branch of each dispatcher is separately pinned by its own spec
  * (TextDedupSpec / VectorsSpec / StatsSpec equality-of-branches tests),
  * which is where its window/shuffle shape is enforced.
  */
object WindowScan {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val sel = only match {
      case Some(ns) => SparkEntry.queries.filter(kv => ns(kv._1))
      case None     => SparkEntry.queries
    }
    sel.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(s, d)
        val bad = df.queryExecution.optimizedPlan.collect {
          case w: LWindow if w.partitionSpec.isEmpty &&
            w.child.collectFirst {
              case _: GlobalLimit => (); case _: LocalLimit => ()
            }.isEmpty => w
        }
        if (bad.nonEmpty)
          println(s"[windowscan] $name UNLIMITED_GLOBAL_WINDOW x${bad.size}")
      } catch {
        case e: Throwable =>
          println(s"[windowscan] $name ERR ${e.getClass.getSimpleName}")
      }
    }
    println("[windowscan] done")
  }
}
