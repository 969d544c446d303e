package graft.sources

import java.nio.file.{Files, Path}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.core.Workspace.{SnapshotStore, WorkspacePath}

/** SQL entry point for the workspace catalog (SURVEY.md §7 step 5): a
  * DataSource V2 `TableCatalog` over the snapshot store, so the
  * version-pinned table read (`WorkspaceTables.csv`) is also reachable
  * from plain SQL with Spark's NATIVE time-travel syntax:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.ws", classOf[WorkspaceCatalog].getName)
  *   spark.conf.set("spark.sql.catalog.ws.root", store.mountPath.toString)
  *   spark.sql("SELECT * FROM ws.demo.`data.csv` VERSION AS OF 'stable'")
  * }}}
  *
  * No parser extension needed: Spark's SQL grammar already parses
  * `VERSION AS OF <v>` into a time-travel relation and routes the version
  * string to `TableCatalog.loadTable(ident, version)` — this class only
  * has to resolve it the way the reference does (named ref → exact id →
  * unique id-prefix, /root/reference/src/http_server.rs:154-165, via
  * `SnapshotStore.resolve`). An unqualified read (`FROM ws.demo.
  * \`data.csv\``) defaults to the `latest` ref — reference default,
  * http_server.rs:105-115.
  *
  * Identifier mapping: namespace = workspace name, table name = file path
  * inside the snapshot (backticks allow the dot: `data.csv`); the path
  * goes through the same `WorkspacePath` sanitization as the HTTP route.
  * Version resolution happens at analysis time, so the scan binds to one
  * immutable snapshot id — Spark's retry/determinism assumption holds,
  * exactly like a Delta `versionAsOf` pin.
  *
  * Scale/IO shape: workspace tables are the reference's config-sized CSV
  * artifacts (the whole store is served over one HTTP process there), so
  * one file = one partition is the honest layout; the read happens on the
  * executor. On a real cluster the store root is shared storage. The CSV
  * dialect is the store's own (header row, comma split, no quoting —
  * matching the bytes the reference serves verbatim); schema is
  * header-derived, all STRING, cast in SQL.
  */
class WorkspaceCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
  }

  override def name(): String = catalogName

  /** Root is re-read from the session conf on every access (not cached
    * from initialize): Spark caches catalog instances per name, and the
    * test fixtures mount a fresh store per invocation. */
  private def store: SnapshotStore = {
    val root = SQLConf.get.getConfString(s"spark.sql.catalog.$catalogName.root")
    new SnapshotStore(java.nio.file.Paths.get(root))
  }

  private def resolveFile(ident: Identifier,
                          version: String): (Path, String) = {
    val ws = ident.namespace() match {
      case Array(one) => one
      case _          => throw new NoSuchTableException(ident)
    }
    val st = store
    if (!st.workspaceExists(ws)) throw new NoSuchTableException(ident)
    st.resolve(ws, version) match {
      case Left(_) => throw new NoSuchTableException(ident)
      case Right(vid) =>
        val file = st.snapshotDir(ws, vid)
          .resolve(WorkspacePath(ident.name()).value)
        if (!Files.isRegularFile(file)) throw new NoSuchTableException(ident)
        (file, vid)
    }
  }

  override def loadTable(ident: Identifier): Table =
    loadTable(ident, "latest")

  override def loadTable(ident: Identifier, version: String): Table = {
    val (file, vid) = resolveFile(ident, version)
    new CsvSnapshotTable(s"$catalogName.${ident.namespace().mkString(".")}" +
      s".${ident.name()}@$vid", file)
  }

  // The reference's list route is an explicit stub (http_server.rs:30-33);
  // table enumeration mirrors that: namespaces list, tables don't.
  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array.empty

  override def listNamespaces(): Array[Array[String]] = {
    val root = store.mountPath
    if (!Files.isDirectory(root)) Array.empty
    else {
      val st = Files.list(root)
      try st.iterator().asScala.filter(Files.isDirectory(_))
        .map(p => Array(p.getFileName.toString)).toArray
      finally st.close()
    }
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else throw new NoSuchNamespaceException(namespace)

  override def loadNamespaceMetadata(
      namespace: Array[String]): util.Map[String, String] =
    if (namespace.length == 1 && store.workspaceExists(namespace(0)))
      util.Collections.emptyMap()
    else throw new NoSuchNamespaceException(namespace)

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException("read-only catalog")

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("read-only catalog")

  override def dropNamespace(namespace: Array[String],
                             cascade: Boolean): Boolean =
    throw new UnsupportedOperationException("read-only catalog")

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException("read-only catalog")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("read-only catalog")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException("read-only catalog")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("read-only catalog")
}

/** One immutable snapshot file as a batch-readable table: header-derived
  * all-STRING schema, one partition (config-sized artifacts), executor-side
  * line parse with the store's dialect (comma split, no quoting).
  */
private[sources] class CsvSnapshotTable(tableName: String, file: Path)
  extends Table with SupportsRead {

  private val headerAndSchema: (Array[String], StructType) = {
    val head = {
      val in = Files.newBufferedReader(file)
      try Option(in.readLine()).getOrElse("")
      finally in.close()
    }
    val cols = head.split(",", -1).map(_.trim)
    (cols, StructType(cols.map(c => StructField(c, StringType))))
  }

  override def name(): String = tableName
  override def schema(): StructType = headerAndSchema._2
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder = {
    val path = file.toString
    val schema = headerAndSchema._2
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = schema
        override def toBatch: Batch = new Batch {
          override def planInputPartitions(): Array[InputPartition] =
            Array(CsvSnapshotPartition(path, schema.length))
          override def createReaderFactory(): PartitionReaderFactory =
            new CsvSnapshotReaderFactory
        }
      }
    }
  }
}

private[sources] case class CsvSnapshotPartition(path: String, nCols: Int)
  extends InputPartition

private[sources] class CsvSnapshotReaderFactory
  extends PartitionReaderFactory {

  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[CsvSnapshotPartition]
    new PartitionReader[InternalRow] {
      private val lines = Files.readAllLines(
        java.nio.file.Paths.get(p.path)).asScala.iterator.drop(1)
      private var current: InternalRow = _
      override def next(): Boolean = {
        val hasNext = lines.hasNext
        if (hasNext) {
          val parts = lines.next().split(",", -1)
          current = InternalRow.fromSeq((0 until p.nCols).map { i =>
            if (i < parts.length) UTF8String.fromString(parts(i)) else null
          })
        }
        hasNext
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
