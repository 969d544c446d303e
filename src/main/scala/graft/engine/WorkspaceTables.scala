package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import graft.core.Workspace._

/** Layer A → Layer B bridge (SURVEY.md §3.3 entry point 2): a
  * version-pinned table read — `workspace(name).version(v).table(path)`
  * as a DataFrame. Version resolution happens BEFORE the scan is built
  * (named ref first, then id prefix — reference semantics,
  * /root/reference/src/http_server.rs:154-165), so the DataFrame is
  * bound to one immutable snapshot: Spark's determinism assumption holds
  * across retries and re-reads, exactly like a Delta `versionAsOf` pin.
  * Schemas are explicit — no inference scan.
  */
object WorkspaceTables {

  /** Version-pinned CSV table read; Left carries the reference's error
    * classes (unknown workspace / unresolvable version). */
  def csv(spark: SparkSession, store: SnapshotStore, workspace: String,
          version: String, path: String,
          schema: StructType): Either[QueryError, DataFrame] =
    // existence first, so an unknown workspace reports RepoNotFound (as
    // SnapshotStore.query does) instead of a misleading VersionNotFound
    if (!store.workspaceExists(workspace)) Left(RepoNotFound(workspace))
    else store.resolve(workspace, version).map { vid =>
      val file = store.snapshotDir(workspace, vid)
        .resolve(WorkspacePath(path).value)
      spark.read.option("header", "true").schema(schema).csv(file.toString)
    }
}
