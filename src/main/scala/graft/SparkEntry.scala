package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.engine.QueryPack
import graft.operators._
import graft.streaming.StreamingQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full declared operator inventory (SURVEY.md §2.2),
  * assembled from per-category packs; `oracleSql` carries the DuckDB twin
  * for every hash-checkable query (approximate / hash-seeded operators are
  * deliberately oracle-less and are instead cross-checked in ScalaTest
  * against their exact counterparts).
  */
object SparkEntry {
  // private[graft]: QueryCorpusSpec pins that pack name sets are pairwise
  // disjoint — a colliding name silently shadows an operator (the map
  // merge is last-wins), which once cost a real query
  private[graft] val packs: Seq[QueryPack] = Seq(
    RelationalQueries,
    AnalyticsQueries,
    DriftQueries,
    StatsQueries,
    JoinQueries,
    WindowQueries,
    FunctionQueries,
    SourceQueries,
    EventQueries,
    TextQueries,
    PipelineQueries,
    VectorQueries,
    CustomAggQueries,
    MultimodalQueries,
    WorkspaceQueries,
    StreamingQueries
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracle).toMap
}
