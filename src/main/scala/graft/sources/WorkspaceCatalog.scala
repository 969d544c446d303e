package graft.sources

import java.nio.file.{Files, Path}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
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
class WorkspaceCatalog extends TableCatalog with SupportsNamespaces
    with FunctionCatalog {

  /** V2 catalog FUNCTIONS (r16): the remaining FunctionCatalog surface of
    * the DSv2 catalog API — how Iceberg ships `bucket()`/`truncate()` to
    * SQL without session-level registration. One function, `content_id`,
    * exposes the store's own content-addressing digest (SHA-256, first 8
    * bytes as 16 hex chars — Workspace.scala commitFile) so SQL can
    * derive the id a value contributes to a snapshot hash. Bound form is
    * a ScalarFunction with the `invoke` magic method — Spark plans a
    * direct method call (codegen), with produceResult as the interpreted
    * fallback. Namespace-agnostic: `<catalog>.fn.content_id(v)`. */
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(namespace, "content_id"))

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    if (ident.name == "content_id") ContentIdFunction
    else throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchFunctionException(ident)

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
    // `<path>@changes` is the table-valued CHANGE FEED over the commit
    // log (r16): batch read = full version history of the file;
    // MICRO_BATCH_READ streams it one version per micro-batch. The feed
    // is the history itself, so time travel over it is refused the same
    // way a missing table is.
    if (ident.name().endsWith("@changes")) {
      if (version != "latest") throw new NoSuchTableException(ident)
      val relPath = ident.name().stripSuffix("@changes")
      val base = Identifier.of(ident.namespace(), relPath)
      val (file, _) = resolveFile(base, "latest")
      val root =
        SQLConf.get.getConfString(s"spark.sql.catalog.$catalogName.root")
      return new CsvChangesTable(
        s"$catalogName.${ident.namespace().mkString(".")}.${ident.name()}",
        file, root, ident.namespace()(0), relPath)
    }
    val (file, vid) = resolveFile(ident, version)
    val root = SQLConf.get.getConfString(s"spark.sql.catalog.$catalogName.root")
    new CsvSnapshotTable(s"$catalogName.${ident.namespace().mkString(".")}" +
      s".${ident.name()}@$vid", file,
      SnapshotWriteCtx(root, ident.namespace()(0), ident.name(), vid))
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

  /** DDL CREATE (r16): a new table lands as a header-only file in a NEW
    * content-addressed version (the CTAS write then appends the query
    * rows through the plain SupportsWrite path — two commits, both
    * versioned, priors immutable). Store constraint surfaces honestly:
    * the snapshot dialect is all-STRING, so non-string columns are
    * refused — CAST in the query. Partition transforms have no physical
    * meaning in a one-file-per-table store and are refused likewise. */
  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    if (partitions.nonEmpty) {
      throw new UnsupportedOperationException(
        "workspace tables are single CSV files; partitioning not supported")
    }
    if (schema.fields.exists(_.dataType != StringType)) {
      throw new UnsupportedOperationException(
        "the snapshot store dialect is all-STRING; CAST columns to STRING")
    }
    val ws = ident.namespace() match {
      case Array(one) => one
      case _          => throw new NoSuchTableException(ident)
    }
    val st = store
    if (!st.workspaceExists(ws)) throw new NoSuchNamespaceException(
      ident.namespace())
    val rel = WorkspacePath(ident.name()).value
    val base = st.resolve(ws, "latest")
      .getOrElse(throw new NoSuchNamespaceException(ident.namespace()))
    if (Files.isRegularFile(st.snapshotDir(ws, base).resolve(rel))) {
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(
          ident.namespace().toSeq :+ ident.name())
    }
    val vid = st.commitFile(ws, base, ident.name(),
      schema.fieldNames.mkString(",") + "\n")
    val root = SQLConf.get.getConfString(s"spark.sql.catalog.$catalogName.root")
    new CsvSnapshotTable(
      s"$catalogName.${ident.namespace().mkString(".")}.${ident.name()}@$vid",
      st.snapshotDir(ws, vid).resolve(rel),
      SnapshotWriteCtx(root, ws, ident.name(), vid))
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("read-only catalog")

  /** DDL DROP (r16): commits a new version with the file REMOVED — prior
    * versions keep it (time travel still reads the dropped table at a
    * pinned version; only `latest` moves). */
  override def dropTable(ident: Identifier): Boolean = {
    val ws = ident.namespace() match {
      case Array(one) => one
      case _          => return false
    }
    val st = store
    if (!st.workspaceExists(ws)) return false
    st.resolve(ws, "latest") match {
      case Left(_) => false
      case Right(base) =>
        val rel = WorkspacePath(ident.name()).value
        if (!Files.isRegularFile(st.snapshotDir(ws, base).resolve(rel)))
          false
        else {
          st.removeFile(ws, base, ident.name())
          true
        }
    }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("read-only catalog")
}

/** `content_id(s STRING) -> STRING`: first 8 bytes of SHA-256(s) as hex —
  * the store's id convention applied to one value. DuckDB-replayable as
  * `substr(sha256(s), 1, 16)`. */
private[graft] object ContentIdFunction
  extends org.apache.spark.sql.connector.catalog.functions.UnboundFunction {
  import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction}

  override def name(): String = "content_id"
  override def description(): String =
    "content_id(s) - first 8 bytes of sha256(s) as 16 hex chars"

  override def bind(inputType: StructType): BoundFunction = {
    if (inputType.fields.length != 1 ||
        inputType.fields(0).dataType != StringType) {
      throw new UnsupportedOperationException(
        s"content_id expects one STRING argument, got $inputType")
    }
    new ContentIdBound
  }

  private[graft] def digest(s: UTF8String): UTF8String = {
    if (s == null) return null
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hex = md.digest(s.getBytes).take(8).map(b => f"$b%02x").mkString
    UTF8String.fromString(hex)
  }
}

/** Bound form of content_id: a NAMED public class so Spark's reflective
  * magic-method lookup (`invoke`) resolves for the codegen path;
  * produceResult is the interpreted fallback. */
class ContentIdBound
  extends org.apache.spark.sql.connector.catalog.functions.ScalarFunction[UTF8String] {
  override def inputTypes(): Array[org.apache.spark.sql.types.DataType] =
    Array(StringType)
  override def resultType(): org.apache.spark.sql.types.DataType = StringType
  override def name(): String = "content_id"
  override def canonicalName(): String = "graft.content_id"
  def invoke(s: UTF8String): UTF8String = ContentIdFunction.digest(s)
  override def produceResult(input: InternalRow): UTF8String =
    if (input.isNullAt(0)) null
    else ContentIdFunction.digest(input.getUTF8String(0))
}

/** Everything the write path needs to commit a new snapshot version,
  * serializable-by-value (strings only — the executor side never touches
  * it; commit happens on the driver). */
private[sources] case class SnapshotWriteCtx(root: String, workspace: String,
                                             relPath: String,
                                             baseVersion: String)

/** One immutable snapshot file as a batch-readable table: header-derived
  * all-STRING schema, one partition (config-sized artifacts), executor-side
  * line parse with the store's dialect (comma split, no quoting).
  *
  * r13: also the write half — [[SupportsRowLevelOperations]], so Spark's
  * native `MERGE INTO` / `UPDATE` / `DELETE` SQL work against the catalog.
  * The operation is GROUP-BASED copy-on-write at the only granularity this
  * store has (one file = one group): Spark's RewriteMergeIntoTable /
  * RewriteUpdateTable / RewriteDelete plan a ReplaceData over the
  * operation's scan, hand the COMPLETE post-image rows to the write, and
  * [[SnapshotStore.commitFile]] lands them as a NEW content-addressed
  * version with `latest` advanced — versions are never mutated in place,
  * which is precisely the reference's declared "versioning control for
  * data transformations" (reference/README.md:8) and the immutability the
  * time-travel reads pin against. Rows serialize back in the store's own
  * dialect (comma join, no quoting) sorted lexicographically, so a given
  * logical table state always lands as byte-identical file content and
  * the content-addressed id is deterministic.
  */
private[sources] class CsvSnapshotTable(tableName: String, file: Path,
                                        writeCtx: SnapshotWriteCtx)
  extends Table with SupportsRead with SupportsWrite
  with SupportsRowLevelOperations {

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
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.STREAMING_WRITE)

  /** Read path with scan pushdown (r16): column pruning, V2 predicate
    * pushdown, and limit pushdown all reach the executor-side line parse.
    * On this store a file is config-sized, so the wins are honest but
    * small (narrower InternalRows, no post-scan FilterExec, early-exit on
    * limit); the point is the ENGINE shape — the same three interfaces
    * are what a petabyte-scale DSv2 source implements, and the plan pins
    * in Round16Spec assert Catalyst actually routes all three through
    * (`V2ScanRelationPushDown`). */
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder = {
    val path = file.toString
    val header = headerAndSchema._1
    val schema = headerAndSchema._2
    new ScanBuilder
        with SupportsPushDownRequiredColumns
        with SupportsPushDownV2Filters
        with SupportsPushDownLimit
        with SupportsPushDownAggregates {
      private var required: StructType = schema
      private var pushed: Array[
        org.apache.spark.sql.connector.expressions.filter.Predicate] =
        Array.empty
      private var limit: Int = -1
      private var aggPushed: Option[(Array[Int], Seq[CsvAggOp], StructType)] =
        None

      override def pruneColumns(requiredSchema: StructType): Unit =
        // Spark hands back a subset of the table schema (possibly empty
        // for count(*) — zero-column rows still count). After a complete
        // aggregate pushdown the scan's schema IS the agg output — leave
        // it alone.
        if (aggPushed.isEmpty) required = requiredSchema

      // Complete aggregate pushdown (single-partition scan => partial
      // and final values coincide): COUNT(*) / COUNT(col) / MIN / MAX
      // with optional GROUP BY on table columns. MIN/MAX use UTF8String
      // binary order — the same order Spark's own Min/Max compute on the
      // STRING columns this schema surfaces, so pushing cannot change
      // results.
      override def supportCompletePushDown(
          agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
          : Boolean = compileAgg(agg).isDefined

      override def pushAggregation(
          agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
          : Boolean =
        compileAgg(agg) match {
          case Some(t) => aggPushed = Some(t); true
          case None    => false
        }

      private def compileAgg(
          agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
          : Option[(Array[Int], Seq[CsvAggOp], StructType)] = {
        import org.apache.spark.sql.connector.expressions.aggregate._
        import org.apache.spark.sql.connector.expressions.NamedReference
        def idx(e: AnyRef): Option[Int] = e match {
          case r: NamedReference if r.fieldNames.length == 1 =>
            val i = header.indexOf(r.fieldNames.head)
            if (i >= 0) Some(i) else None
          case _ => None
        }
        val groups = agg.groupByExpressions.map(idx)
        if (groups.exists(_.isEmpty)) return None
        val ops = agg.aggregateExpressions.toSeq.map {
          case _: CountStar => Some(CsvAggOp.Cnt(-1))
          case c: Count if !c.isDistinct => idx(c.column).map(CsvAggOp.Cnt)
          case m: Min => idx(m.column).map(CsvAggOp.Mn)
          case m: Max => idx(m.column).map(CsvAggOp.Mx)
          case _ => None
        }
        if (ops.exists(_.isEmpty)) return None
        val gIdx = groups.map(_.get)
        val oSeq = ops.map(_.get)
        // output schema convention (mirrors the built-in JDBC pushdown):
        // group-by columns first, then aggregate columns
        val fields =
          gIdx.map(i => StructField(header(i), StringType)) ++
            oSeq.zipWithIndex.map {
              case (CsvAggOp.Cnt(_), i) =>
                StructField(s"agg_$i", org.apache.spark.sql.types.LongType)
              case (_, i) => StructField(s"agg_$i", StringType)
            }
        Some((gIdx, oSeq, StructType(fields.toSeq)))
      }

      override def pushPredicates(
          predicates: Array[
            org.apache.spark.sql.connector.expressions.filter.Predicate]):
          Array[org.apache.spark.sql.connector.expressions.filter.Predicate] = {
        val (sup, unsup) =
          predicates.partition(p => CsvPred.compile(p, header).isDefined)
        pushed = sup
        unsup // Spark keeps a post-scan Filter ONLY for these
      }

      override def pushedPredicates(): Array[
          org.apache.spark.sql.connector.expressions.filter.Predicate] =
        pushed

      // single-partition scan applies the limit AFTER the pushed
      // predicates, so it is exact (not partial). Refused once an
      // aggregate is pushed: the agg scan does not apply limits, and
      // claiming a pushed limit there would let Spark drop its own
      // Limit over a scan that ignores it.
      override def pushLimit(l: Int): Boolean =
        if (aggPushed.isDefined) false else { limit = l; true }
      override def isPartiallyPushed(): Boolean = false

      override def build(): Scan = aggPushed match {
        case Some((gIdx, ops, aggSchema)) =>
          CsvSnapshotAggScan(path, aggSchema,
            pushed.flatMap(p => CsvPred.compile(p, header)).toSeq,
            pushed.map(_.toString).toSeq, gIdx, ops)
        case None =>
          CsvSnapshotScan(path, header, required,
            pushed.flatMap(p => CsvPred.compile(p, header)).toSeq,
            pushed.map(_.toString).toSeq, limit)
      }
    }
  }

  /** Pushdown-FREE scan for the row-level operation path below: a
    * group-based ReplaceData scan must return ENTIRE groups (here: the
    * whole file) — if the UPDATE/DELETE condition were row-filtered into
    * the scan, the non-matching rows would silently vanish from the
    * rewritten post-image. */
  private[sources] def plainScanBuilder(): ScanBuilder = {
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

  /** Plain-write half (r16 — the SECOND DSv2 write shape next to the
    * row-level ReplaceData): `INSERT INTO` appends rows to the pinned
    * base version's contents, `INSERT OVERWRITE` (SupportsTruncate)
    * replaces them — either way [[SnapshotStore.commitFile]] lands the
    * post-image as a NEW content-addressed version with `latest`
    * advanced; the base version stays readable (same immutability the
    * time-travel reads pin against). Lines sort lexicographically so a
    * given logical state is byte-deterministic regardless of task
    * parallelism or commit order. */
  override def newWriteBuilder(lwi: LogicalWriteInfo): WriteBuilder = {
    // map each header column to its position in the incoming rows (an
    // INSERT with a reordered column list arrives in the DECLARED query
    // schema, not table order)
    val positions = headerAndSchema._1.map(lwi.schema().fieldIndex)
    new WriteBuilder with SupportsTruncate {
      private var replace = false
      override def truncate(): WriteBuilder = { replace = true; this }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new SnapshotAppendWrite(writeCtx, headerAndSchema._1, positions,
            replace)
        // streaming half (r16): writeStream.toTable lands each epoch as
        // a new content-addressed version REBASED on the current latest
        // (appends accumulate across epochs — unlike the batch write's
        // pinned base)
        override def toStreaming
            : org.apache.spark.sql.connector.write.streaming.StreamingWrite =
          new SnapshotStreamingWrite(writeCtx, headerAndSchema._1, positions)
      }
    }
  }

  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder = {
    val outer = this
    new RowLevelOperationBuilder {
      override def build(): RowLevelOperation = new RowLevelOperation {
        override def command(): RowLevelOperation.Command = info.command()
        // the target read of the row-level plan: the whole-file scan —
        // one file is the one (and only) rewrite group. Deliberately the
        // pushdown-free builder: V2ScanRelationPushDown also runs on the
        // rewrite plan, and a row-filtered scan would drop the
        // non-matching rows from the ReplaceData post-image.
        override def newScanBuilder(
            options: CaseInsensitiveStringMap): ScanBuilder =
          outer.plainScanBuilder()
        override def newWriteBuilder(
            lwi: LogicalWriteInfo): WriteBuilder = new WriteBuilder {
          override def build(): Write = new Write {
            // the ReplaceData row layout is the OPERATION's schema, which
            // Spark may extend beyond the table columns (e.g. metadata /
            // provenance attributes) — map each header column to its
            // position in the incoming rows instead of assuming identity
            override def toBatch: BatchWrite =
              new SnapshotReplaceDataWrite(writeCtx, headerAndSchema._1,
                headerAndSchema._1.map(lwi.schema().fieldIndex))
          }
        }
      }
    }
  }
}

/** Append/overwrite batch write: executors serialize their rows to CSV
  * lines (same dialect + factory as the row-level write — for a plain
  * INSERT the rows carry exactly the table columns, so the factory's
  * right-alignment offset is 0); the driver merges with the base
  * version's lines (append) or discards them (truncate/overwrite),
  * sorts for byte-determinism, and commits ONE new content-addressed
  * version. abort() is a no-op: nothing is visible until commitFile
  * writes the new version dir and ref. */
private[sources] class SnapshotAppendWrite(ctx: SnapshotWriteCtx,
                                           header: Array[String],
                                           colPositions: Array[Int],
                                           replace: Boolean)
  extends BatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new CsvLinesWriterFactory(colPositions)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val newLines = messages.iterator.flatMap {
      case CsvLinesCommit(ls) => ls
      case _                  => Seq.empty[String]
    }.toSeq
    val store = new SnapshotStore(java.nio.file.Paths.get(ctx.root))
    val baseLines =
      if (replace) Seq.empty[String]
      else {
        val base = store.snapshotDir(ctx.workspace, ctx.baseVersion)
          .resolve(WorkspacePath(ctx.relPath).value)
        Files.readAllLines(base).asScala.toSeq.drop(1).filter(_.nonEmpty)
      }
    val contents = (header.mkString(",") +:
      (baseLines ++ newLines).sorted).mkString("", "\n", "\n")
    store.commitFile(ctx.workspace, ctx.baseVersion, ctx.relPath, contents)
    ()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

/** Group-based ReplaceData write: executors serialize their slice of the
  * post-image to CSV lines (tiny, config-sized artifacts — the store's
  * contract), the driver sorts the union for byte-determinism and commits
  * ONE new content-addressed snapshot version. abort() is a no-op: nothing
  * is visible until commitFile writes the new version dir and ref. */
private[sources] class SnapshotReplaceDataWrite(ctx: SnapshotWriteCtx,
                                                header: Array[String],
                                                colPositions: Array[Int])
  extends BatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new CsvLinesWriterFactory(colPositions)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val lines = messages.iterator.flatMap {
      case CsvLinesCommit(ls) => ls
      case _                  => Seq.empty[String]
    }.toArray.sorted
    val contents = (header.mkString(",") +: lines)
      .mkString("", "\n", "\n")
    val store = new SnapshotStore(java.nio.file.Paths.get(ctx.root))
    store.commitFile(ctx.workspace, ctx.baseVersion, ctx.relPath, contents)
    ()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

/** Streaming write (r16 — the DSv2 streaming-sink half next to the CDC
  * streaming source): each epoch's rows append to the CURRENT latest
  * version and land as one new content-addressed version per non-empty
  * epoch. Content addressing makes an epoch replay after a commit-side
  * failure idempotent when it carries the same rows (same bytes → same
  * id → same version); the sorted-lines dialect keeps task parallelism
  * out of the bytes. */
private[sources] class SnapshotStreamingWrite(ctx: SnapshotWriteCtx,
                                              header: Array[String],
                                              colPositions: Array[Int])
  extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
    new CsvLinesWriterFactory(colPositions)

  override def commit(epochId: Long,
                      messages: Array[WriterCommitMessage]): Unit = {
    val newLines = messages.iterator.flatMap {
      case CsvLinesCommit(ls) => ls
      case _                  => Seq.empty[String]
    }.toSeq
    if (newLines.nonEmpty) {
      val store = new SnapshotStore(java.nio.file.Paths.get(ctx.root))
      // rebase on the live latest so successive epochs accumulate
      val base = store.resolve(ctx.workspace, "latest").toOption
        .getOrElse(ctx.baseVersion)
      val baseFile = store.snapshotDir(ctx.workspace, base)
        .resolve(WorkspacePath(ctx.relPath).value)
      val baseLines = Files.readAllLines(baseFile).asScala.toSeq
        .drop(1).filter(_.nonEmpty)
      val contents = (header.mkString(",") +:
        (baseLines ++ newLines).sorted).mkString("", "\n", "\n")
      store.commitFile(ctx.workspace, base, ctx.relPath, contents)
      ()
    }
  }

  override def abort(epochId: Long,
                     messages: Array[WriterCommitMessage]): Unit = ()
}

private[sources] case class CsvLinesCommit(lines: Seq[String])
  extends WriterCommitMessage

private[sources] class CsvLinesWriterFactory(colPositions: Array[Int])
  extends DataWriterFactory
  with org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  // streaming tasks carry an epoch id; the row serialization is identical
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    createWriter(partitionId, taskId)
  override def createWriter(partitionId: Int,
                            taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      override def write(record: InternalRow): Unit = {
        // The physical post-image rows carry the table columns
        // RIGHT-ALIGNED: Spark's group-based rewrite plans prepend
        // plan-internal attributes (observed on 4.1: one leading extra
        // field on MERGE/UPDATE/DELETE rows while LogicalWriteInfo
        // still declares the bare table schema), so the table columns
        // are the LAST schema-length fields in declared order.
        val off = record.numFields - colPositions.length
        // store dialect: comma join, no quoting (a value containing a
        // comma is not representable — same constraint the reference's
        // naive split imposes on the read side); null folds to empty
        buf += colPositions.map { i =>
          if (record.isNullAt(off + i)) ""
          else record.getUTF8String(off + i).toString
        }.mkString(",")
      }
      override def commit(): WriterCommitMessage = CsvLinesCommit(buf.toSeq)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}

private[sources] case class CsvSnapshotPartition(path: String, nCols: Int)
  extends InputPartition

/** Compiled, executor-serializable form of a pushed V2 predicate over the
  * all-STRING snapshot schema. Comparison semantics are UTF8String binary
  * order — exactly what Spark's post-scan Filter would have computed, so
  * pushing can never change results. A column index of -1 (header column
  * missing from a short row) evaluates as SQL NULL: comparisons false,
  * IS_NULL true. */
private[graft] sealed trait CsvPred extends Serializable {
  def eval(parts: Array[String]): Boolean
}

private[graft] object CsvPred {
  import org.apache.spark.sql.connector.expressions.{Literal, NamedReference}
  import org.apache.spark.sql.connector.expressions.filter.Predicate

  private final case class Cmp(col: Int, op: String, lit: String)
    extends CsvPred {
    override def eval(parts: Array[String]): Boolean = {
      if (col >= parts.length) return false // NULL operand
      val c = UTF8String.fromString(parts(col))
        .binaryCompare(UTF8String.fromString(lit))
      op match {
        case "="  => c == 0
        case "<>" => c != 0
        case "<"  => c < 0
        case "<=" => c <= 0
        case ">"  => c > 0
        case ">=" => c >= 0
      }
    }
  }

  private final case class StartsWith(col: Int, lit: String) extends CsvPred {
    override def eval(parts: Array[String]): Boolean =
      col < parts.length && parts(col).startsWith(lit)
  }

  private final case class In(col: Int, lits: Set[String]) extends CsvPred {
    override def eval(parts: Array[String]): Boolean =
      col < parts.length && lits.contains(parts(col))
  }

  private final case class NullCheck(col: Int, isNull: Boolean)
    extends CsvPred {
    override def eval(parts: Array[String]): Boolean =
      (col >= parts.length) == isNull
  }

  private def colIdx(e: AnyRef, header: Array[String]): Option[Int] =
    e match {
      case r: NamedReference if r.fieldNames.length == 1 =>
        val i = header.indexOf(r.fieldNames.head)
        if (i >= 0) Some(i) else None
      case _ => None
    }

  // the Java-facing Literal interface (LiteralValue's Scala pickle is not
  // readable under this build's scalac — the interface sees the same
  // objects)
  private def strLit(e: AnyRef): Option[String] = e match {
    case l: Literal[_] if l.dataType == StringType && l.value != null =>
      Some(l.value.toString)
    case _ => None
  }

  /** None = cannot push (Spark keeps its post-scan Filter for it). Only
    * column-vs-string-literal shapes compile; everything else stays in
    * the engine. */
  def compile(p: Predicate, header: Array[String]): Option[CsvPred] = {
    val kids = p.children()
    p.name() match {
      case op @ ("=" | "<>" | "<" | "<=" | ">" | ">=")
          if kids.length == 2 =>
        (colIdx(kids(0), header), strLit(kids(1))) match {
          case (Some(c), Some(v)) => Some(Cmp(c, op, v))
          case _ =>
            // literal-on-the-left mirror: flip the comparison
            (strLit(kids(0)), colIdx(kids(1), header)) match {
              case (Some(v), Some(c)) =>
                val flipped = op match {
                  case "<" => ">" case "<=" => ">="
                  case ">" => "<" case ">=" => "<=" case other => other
                }
                Some(Cmp(c, flipped, v))
              case _ => None
            }
        }
      case "STARTS_WITH" if kids.length == 2 =>
        for (c <- colIdx(kids(0), header); v <- strLit(kids(1)))
          yield StartsWith(c, v)
      case "IN" if kids.length >= 2 =>
        colIdx(kids(0), header).flatMap { c =>
          val vs = kids.drop(1).map(strLit)
          if (vs.forall(_.isDefined)) Some(In(c, vs.flatten.toSet)) else None
        }
      case "IS_NULL" if kids.length == 1 =>
        colIdx(kids(0), header).map(NullCheck(_, isNull = true))
      case "IS_NOT_NULL" if kids.length == 1 =>
        colIdx(kids(0), header).map(NullCheck(_, isNull = false))
      case _ => None
    }
  }
}

/** Pushdown-aware scan over one snapshot file: pruned columns, compiled
  * predicates, and an exact limit all execute inside the partition
  * reader. `description()` surfaces the pushed state in `explain`. */
private[graft] case class CsvSnapshotScan(path: String,
                                          header: Array[String],
                                          required: StructType,
                                          preds: Seq[CsvPred],
                                          pushedDesc: Seq[String],
                                          limit: Int)
  extends Scan {
  override def readSchema(): StructType = required
  override def description(): String =
    s"CsvSnapshotScan pushedFilters=[${pushedDesc.mkString(", ")}], " +
      s"limit=${if (limit >= 0) limit.toString else "none"}, " +
      s"columns=[${required.fieldNames.mkString(", ")}]"
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      Array(CsvSnapshotScanPartition(path,
        required.fieldNames.map(n => header.indexOf(n)), preds, limit))
    override def createReaderFactory(): PartitionReaderFactory =
      new CsvSnapshotScanReaderFactory
  }
}

/** Compiled pushed aggregate ops: col = header index, -1 = star. */
private[graft] sealed trait CsvAggOp extends Serializable
private[graft] object CsvAggOp {
  final case class Cnt(col: Int) extends CsvAggOp
  final case class Mn(col: Int) extends CsvAggOp
  final case class Mx(col: Int) extends CsvAggOp
}

/** Completely-pushed aggregate scan: one output row per group computed
  * inside the partition reader (exact — single partition), after the
  * pushed predicates. */
private[graft] case class CsvSnapshotAggScan(path: String,
                                             aggSchema: StructType,
                                             preds: Seq[CsvPred],
                                             pushedDesc: Seq[String],
                                             groupIdx: Array[Int],
                                             ops: Seq[CsvAggOp])
  extends Scan {
  override def readSchema(): StructType = aggSchema
  override def description(): String =
    s"CsvSnapshotAggScan pushedFilters=[${pushedDesc.mkString(", ")}], " +
      s"pushedAggregates=[${ops.mkString(", ")}], " +
      s"groupBy=[${groupIdx.mkString(", ")}]"
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      Array(CsvSnapshotAggPartition(path, preds, groupIdx, ops))
    override def createReaderFactory(): PartitionReaderFactory =
      new CsvSnapshotAggReaderFactory
  }
}

private[sources] case class CsvSnapshotAggPartition(path: String,
                                                    preds: Seq[CsvPred],
                                                    groupIdx: Array[Int],
                                                    ops: Seq[CsvAggOp])
  extends InputPartition

private[sources] class CsvSnapshotAggReaderFactory
  extends PartitionReaderFactory {

  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[CsvSnapshotAggPartition]
    // state per group: (counts per op, min/max strings per op)
    final class G {
      val cnt = new Array[Long](p.ops.length)
      val str = new Array[String](p.ops.length)
    }
    val groups = scala.collection.mutable.LinkedHashMap.empty[Seq[String], G]
    Files.readAllLines(java.nio.file.Paths.get(p.path)).asScala.iterator
      .drop(1).foreach { line =>
        val parts = line.split(",", -1)
        if (p.preds.forall(_.eval(parts))) {
          def at(i: Int): String = if (i < parts.length) parts(i) else null
          val key = p.groupIdx.toSeq.map(at)
          val g = groups.getOrElseUpdate(key, new G)
          p.ops.zipWithIndex.foreach {
            case (CsvAggOp.Cnt(c), i) =>
              if (c < 0 || at(c) != null) g.cnt(i) += 1
            case (CsvAggOp.Mn(c), i) =>
              val v = at(c)
              if (v != null && (g.str(i) == null ||
                  UTF8String.fromString(v).binaryCompare(
                    UTF8String.fromString(g.str(i))) < 0)) g.str(i) = v
            case (CsvAggOp.Mx(c), i) =>
              val v = at(c)
              if (v != null && (g.str(i) == null ||
                  UTF8String.fromString(v).binaryCompare(
                    UTF8String.fromString(g.str(i))) > 0)) g.str(i) = v
          }
        }
      }
    // global aggregate with zero matching rows still yields one row
    // (count 0, null min/max) — SQL semantics
    if (p.groupIdx.isEmpty && groups.isEmpty) groups(Seq.empty) = new G
    val it = groups.iterator
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean = {
        val has = it.hasNext
        if (has) {
          val (key, g) = it.next()
          val cells = key.map(v =>
            if (v == null) null else UTF8String.fromString(v)) ++
            p.ops.zipWithIndex.map {
              case (CsvAggOp.Cnt(_), i) => java.lang.Long.valueOf(g.cnt(i))
              case (_, i) =>
                if (g.str(i) == null) null
                else UTF8String.fromString(g.str(i))
            }
          current = InternalRow.fromSeq(cells)
        }
        has
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}

private[sources] case class CsvSnapshotScanPartition(path: String,
                                                     projIdx: Array[Int],
                                                     preds: Seq[CsvPred],
                                                     limit: Int)
  extends InputPartition

private[sources] class CsvSnapshotScanReaderFactory
  extends PartitionReaderFactory {

  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[CsvSnapshotScanPartition]
    new PartitionReader[InternalRow] {
      private val lines = Files.readAllLines(
        java.nio.file.Paths.get(p.path)).asScala.iterator.drop(1)
      private var current: InternalRow = _
      private var emitted = 0L
      override def next(): Boolean = {
        if (p.limit >= 0 && emitted >= p.limit) return false
        while (lines.hasNext) {
          val parts = lines.next().split(",", -1)
          if (p.preds.forall(_.eval(parts))) {
            current = InternalRow.fromSeq(p.projIdx.toSeq.map { i =>
              if (i >= 0 && i < parts.length)
                UTF8String.fromString(parts(i))
              else null
            })
            emitted += 1
            return true
          }
        }
        false
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}

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

/** Change feed over a workspace file's version history (r16): one row per
  * (version, data row), with `seq` = 1-based position in the store's
  * commit log and `version_id` = the content-addressed snapshot id.
  *
  * Two read shapes off the same partition layout (one version = one
  * partition — versions are the store's config-sized artifacts):
  *
  *  - BATCH_READ: the full history in one scan — the audit/diff shape
  *    (`SELECT ... FROM ws.demo.`data.csv@changes``).
  *  - MICRO_BATCH_READ ([[ChangesMicroBatchStream]]): a Structured
  *    Streaming source that replays the log ONE VERSION PER MICRO-BATCH
  *    through `SupportsAdmissionControl` (offset = log position), then
  *    keeps tailing — new commits become new batches, the Delta/Iceberg
  *    CDF pattern on this store's model. `SupportsTriggerAvailableNow`
  *    freezes the end so a bounded `Trigger.AvailableNow` run drains
  *    exactly the versions that existed at start.
  *
  * The feed is append-only history: no write/truncate/row-level
  * capabilities, and time travel over it is refused (the feed IS the
  * history).
  */
private[sources] class CsvChangesTable(tableName: String, latestFile: Path,
                                       root: String, workspace: String,
                                       relPath: String)
  extends Table with SupportsRead {

  private val dataSchema: StructType = {
    val head = {
      val in = Files.newBufferedReader(latestFile)
      try Option(in.readLine()).getOrElse("")
      finally in.close()
    }
    StructType(head.split(",", -1).map(_.trim)
      .map(c => StructField(c, StringType)))
  }

  override def name(): String = tableName
  override def schema(): StructType = StructType(
    StructField("seq", org.apache.spark.sql.types.LongType,
      nullable = false) +:
    StructField("version_id", StringType, nullable = false) +:
    dataSchema.fields.toSeq)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)

  private def partitionsFor(seqs: Range): Array[InputPartition] = {
    val store = new SnapshotStore(java.nio.file.Paths.get(root))
    val log = store.commitLog(workspace)
    seqs.collect {
      case i if i < log.length =>
        val vid = log(i)
        val file = store.snapshotDir(workspace, vid)
          .resolve(WorkspacePath(relPath).value)
        ChangesPartition(file.toString, (i + 1).toLong, vid,
          dataSchema.length): InputPartition
    }.toArray
  }

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder = {
    val outer = this
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = outer.schema()
        override def toBatch: Batch = new Batch {
          override def planInputPartitions(): Array[InputPartition] = {
            val store = new SnapshotStore(java.nio.file.Paths.get(root))
            outer.partitionsFor(0 until store.commitLog(workspace).length)
          }
          override def createReaderFactory(): PartitionReaderFactory =
            new ChangesReaderFactory
        }
        override def toMicroBatchStream(
            checkpointLocation: String): org.apache.spark.sql.connector
              .read.streaming.MicroBatchStream =
          new ChangesMicroBatchStream(outer, root, workspace)
      }
    }
  }

  private[sources] def partitionsBetween(startSeq: Long,
      endSeq: Long): Array[InputPartition] =
    partitionsFor(startSeq.toInt until endSeq.toInt)
}

/** Offset = number of log versions already emitted. */
private[sources] case class ChangeOffset(seq: Long)
  extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json: String = seq.toString
}

private[sources] class ChangesMicroBatchStream(table: CsvChangesTable,
                                               root: String,
                                               workspace: String)
  extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming
    .SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  private def currentEnd: Long = {
    val store = new SnapshotStore(java.nio.file.Paths.get(root))
    store.commitLog(workspace).length.toLong
  }

  // set by prepareForTriggerAvailableNow: an AvailableNow run drains the
  // versions that existed when the trigger started, then stops — later
  // commits belong to the next run
  @volatile private var frozenEnd: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    frozenEnd = Some(currentEnd)

  override def initialOffset(): Offset = ChangeOffset(0L)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Admission control: advance AT MOST ONE VERSION per micro-batch
    * regardless of the limit — a version is this source's atomic unit
    * (one content-addressed snapshot), so per-version batching is what
    * makes the feed's batch boundaries meaningful downstream. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val end = frozenEnd.getOrElse(currentEnd)
    ChangeOffset(math.min(start.asInstanceOf[ChangeOffset].seq + 1, end))
  }

  override def reportLatestOffset(): Offset =
    ChangeOffset(frozenEnd.getOrElse(currentEnd))

  // MicroBatchStream requires the no-arg form; with SupportsAdmissionControl
  // Spark drives the two-arg one, so this is only a safety net
  override def latestOffset(): Offset =
    ChangeOffset(frozenEnd.getOrElse(currentEnd))

  override def planInputPartitions(start: Offset,
                                   end: Offset): Array[InputPartition] =
    table.partitionsBetween(start.asInstanceOf[ChangeOffset].seq,
      end.asInstanceOf[ChangeOffset].seq)

  override def createReaderFactory(): PartitionReaderFactory =
    new ChangesReaderFactory

  override def deserializeOffset(json: String): Offset =
    ChangeOffset(json.trim.toLong)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] case class ChangesPartition(path: String, seq: Long,
                                             versionId: String, nCols: Int)
  extends InputPartition

private[sources] class ChangesReaderFactory extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ChangesPartition]
    new PartitionReader[InternalRow] {
      // a version that predates the file simply contributes no rows
      private val lines = {
        val f = java.nio.file.Paths.get(p.path)
        if (Files.isRegularFile(f))
          Files.readAllLines(f).asScala.iterator.drop(1)
        else Iterator.empty
      }
      private var current: InternalRow = _
      override def next(): Boolean = {
        val hasNext = lines.hasNext
        if (hasNext) {
          val parts = lines.next().split(",", -1)
          current = InternalRow.fromSeq(
            p.seq +: UTF8String.fromString(p.versionId) +:
            (0 until p.nCols).map { i =>
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
