package graft.operators

import java.nio.file.{Files, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Workspace._
import graft.engine.QueryPack

/** Layer-A declared queries: exercise the reference's single end-to-end
  * operator (workspace point lookup, SURVEY.md §2.1 A1–A9 + A13) over a
  * deterministic fixture, exposed as a DataFrame so the driver's gate can
  * hash it. The oracle is a literal VALUES table — valid because every
  * output byte is a pure function of the fixed fixture.
  */
object WorkspaceQueries extends QueryPack {

  /** Build the deterministic two-version fixture workspace and return the
    * store mount. Layout:
    *   v1 (id aaaa1111…): data.csv, docs/readme.txt
    *   v2 (id bbbb2222…): data.csv (changed), docs/readme.txt, docs/extra.txt
    * refs: latest→v2, stable→v1
    */
  def fixture(): SnapshotStore = {
    val mount = Files.createTempDirectory("graft_ws")
    // the fixture tree is per-invocation scratch: delete it on JVM exit
    // so repeated Verify/Bench rounds don't accumulate /tmp litter
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def del(f: java.io.File): Unit = {
        val cs = f.listFiles(); if (cs != null) cs.foreach(del)
        f.delete(); ()
      }
      del(mount.toFile)
    }))
    val ws = mount.resolve("demo")
    def write(dir: Path, rel: String, contents: String): Unit = {
      val p = dir.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.writeString(p, contents)
    }
    val v1 = ws.resolve("objects").resolve("aaaa1111c0ffee")
    val v2 = ws.resolve("objects").resolve("bbbb2222c0ffee")
    write(v1, "data.csv", "k,v\n1,10\n2,20\n")
    write(v1, "docs/readme.txt", "version one readme")
    write(v2, "data.csv", "k,v\n1,10\n2,20\n3,30\n")
    write(v2, "docs/readme.txt", "version two readme")
    write(v2, "docs/extra.txt", "extra file")
    Files.writeString(ws.resolve("refs"),
      "latest\tbbbb2222c0ffee\nstable\taaaa1111c0ffee\n")
    new SnapshotStore(mount)
  }

  /** Run a scripted set of lookups covering: file read, recursive dir
    * listing, default version, named ref, id-prefix resolution, path
    * sanitization rewrite, and all four error classes.
    */
  private def run(s: SparkSession): DataFrame = {
    import s.implicits._
    val store = fixture()
    def row(c: String, r: Either[QueryError, QueryResult])
        : (String, String, String) = r match {
      case Right(FileResult(n, contents)) => (c, "file", contents)
      case Right(DirectoryResult(n, items)) =>
        (c, "directory", items.mkString(";"))
      case Left(e) => (c, "error", e.getClass.getSimpleName)
    }
    Seq(
      row("file_latest", store.query("demo", "latest", "data.csv")),
      row("file_stable", store.query("demo", "stable", "data.csv")),
      row("file_prefix", store.query("demo", "aaaa", "docs/readme.txt")),
      row("dir_listing", store.query("demo", "latest", "docs")),
      row("root_listing", store.query("demo")),
      row("sanitized", store.query("demo", "latest", "../docs/./readme.txt")),
      row("err_repo", store.query("nope", "latest", "data.csv")),
      row("err_version", store.query("demo", "zzz", "data.csv")),
      row("err_path", store.query("demo", "latest", "missing.txt")),
      row("err_ambiguous", store.query("demo", "", "data.csv"))
    ).toDF("case", "kind", "payload").orderBy("case")
  }

  def declared: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q_workspace_lookup" -> ((s, _) => run(s)),

    // time-travel table read: the same table at two pinned versions,
    // united and tagged — the workspace analog of `versionAsOf`
    "q_workspace_table" -> ((s, _) => {
      import org.apache.spark.sql.functions._
      val store = fixture()
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.IntegerType)))
      def at(version: String): DataFrame =
        graft.engine.WorkspaceTables
          .csv(s, store, "demo", version, "data.csv", schema)
          .fold(e => sys.error(e.message), identity)
          .withColumn("version", lit(version))
      at("stable").unionByName(at("latest"))
        .select(col("version"), col("k"), col("v"))
        .orderBy(col("version"), col("k"))
    }),

    // -- version diff: what changed between two pinned snapshots -----------
    // The relational half of the reference's declared "versioning
    // control for data transformations" (reference README.md:5-8): the
    // same version-pinned reads q_workspace_table makes, full-outer
    // joined on the key to classify every row added / removed / changed
    // / unchanged between the 'stable' and 'latest' refs — the audit a
    // data team runs before promoting a ref. Both sides are immutable
    // snapshots (resolution happens before the scan), so the diff is
    // deterministic by construction; the join keys on k like any
    // equi-join at scale.
    "q_workspace_diff" -> ((s, _) => {
      import org.apache.spark.sql.functions._
      val store = fixture()
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.IntegerType)))
      def at(version: String): DataFrame =
        graft.engine.WorkspaceTables
          .csv(s, store, "demo", version, "data.csv", schema)
          .fold(e => sys.error(e.message), identity)
      val old = at("stable").select(col("k"), col("v").as("v_stable"))
      val neu = at("latest").select(col("k").as("k2"),
        col("v").as("v_latest"))
      old.join(neu, col("k") === col("k2"), "full_outer")
        .select(
          when(col("k").isNull, lit("added"))
            .when(col("k2").isNull, lit("removed"))
            .when(col("v_stable") =!= col("v_latest"), lit("changed"))
            .otherwise(lit("unchanged")).as("change"),
          coalesce(col("k"), col("k2")).as("k"),
          col("v_stable"), col("v_latest"))
        .orderBy(col("k"))
    }),

    // SQL time travel through the DSv2 catalog (WorkspaceCatalog): the
    // same store, reached with Spark's NATIVE `VERSION AS OF` grammar —
    // named ref ('stable'), id prefix ('aaaa', reference resolution
    // order), and the unqualified read defaulting to the latest ref.
    // Strings cast in SQL (the catalog serves header-derived STRING
    // columns, matching the bytes the reference serves verbatim).
    "q_workspace_sql" -> ((s, _) => {
      val store = fixture()
      s.conf.set("spark.sql.catalog.ws",
        classOf[graft.sources.WorkspaceCatalog].getName)
      s.conf.set("spark.sql.catalog.ws.root", store.mountPath.toString)
      s.sql(
        """SELECT 'default_latest' AS pin, CAST(k AS INT) AS k,
          |       CAST(v AS INT) AS v
          |FROM ws.demo.`data.csv`
          |UNION ALL
          |SELECT 'ref_stable', CAST(k AS INT), CAST(v AS INT)
          |FROM ws.demo.`data.csv` VERSION AS OF 'stable'
          |UNION ALL
          |SELECT 'id_prefix_aaaa', CAST(k AS INT), CAST(v AS INT)
          |FROM ws.demo.`data.csv` VERSION AS OF 'aaaa'
          |ORDER BY pin, k""".stripMargin)
    }),

    // DSv2 scan pushdown through the catalog (r16): comparison, IN, and
    // prefix predicates all compile into the snapshot scan
    // (SupportsPushDownV2Filters) — the post-scan FilterExec disappears
    // (Round16Spec pins the plan) — and the projection prunes the read
    // schema (SupportsPushDownRequiredColumns). Results are what the
    // un-pushed plan computes; the oracle replays the fixture literally.
    "q_workspace_pushdown" -> ((s, _) => {
      val store = fixture()
      s.conf.set("spark.sql.catalog.wsp",
        classOf[graft.sources.WorkspaceCatalog].getName)
      s.conf.set("spark.sql.catalog.wsp.root", store.mountPath.toString)
      s.sql(
        """SELECT 'cmp_ge' AS leg, k, v
          |FROM wsp.demo.`data.csv` WHERE k >= '2'
          |UNION ALL
          |SELECT 'in_13', k, v
          |FROM wsp.demo.`data.csv` WHERE k IN ('1', '3')
          |UNION ALL
          |SELECT 'prefix_1', k, v
          |FROM wsp.demo.`data.csv` WHERE startswith(v, '1')
          |ORDER BY leg, k""".stripMargin)
    }),

    // DDL CREATE TABLE AS SELECT through the DSv2 catalog (r16 —
    // completes the verb matrix: SELECT / time travel / INSERT /
    // OVERWRITE / MERGE / UPDATE / DELETE / streaming write / CREATE /
    // DROP). CTAS lands twice, both versioned: a header-only file
    // (createTable), then the query rows through the plain append write;
    // the result reads the derived table AND the untouched base back
    // through the same catalog.
    "q_workspace_ctas" -> ((s, _) => {
      val store = fixture()
      s.conf.set("spark.sql.catalog.wct",
        classOf[graft.sources.WorkspaceCatalog].getName)
      s.conf.set("spark.sql.catalog.wct.root", store.mountPath.toString)
      s.sql(
        """CREATE TABLE wct.demo.`derived.csv` AS
          |SELECT k, CAST(CAST(v AS INT) * 2 AS STRING) AS v
          |FROM wct.demo.`data.csv`""".stripMargin)
      s.sql(
        """SELECT 'derived' AS leg, k, v FROM wct.demo.`derived.csv`
          |UNION ALL
          |SELECT 'base', k, v FROM wct.demo.`data.csv`
          |ORDER BY leg, k""".stripMargin)
    }),

    // V2 FunctionCatalog (r16): a catalog-scoped SQL function
    // (`<catalog>.fn.content_id`) resolved through
    // FunctionCatalog.loadFunction — no session registration, the
    // Iceberg-`bucket()` shape. The bound ScalarFunction's `invoke` magic
    // method gives Spark a direct codegen call; the digest is the store's
    // own content-addressing convention (SHA-256 first 8 bytes as hex),
    // so SQL can derive the id a value contributes to a snapshot hash.
    "q_catalog_function" -> ((s, _) => {
      val store = fixture()
      s.conf.set("spark.sql.catalog.wcf",
        classOf[graft.sources.WorkspaceCatalog].getName)
      s.conf.set("spark.sql.catalog.wcf.root", store.mountPath.toString)
      s.sql(
        """SELECT k, v, wcf.fn.content_id(v) AS vid
          |FROM wcf.demo.`data.csv` ORDER BY k""".stripMargin)
    }),

    // DSv2 COMPLETE aggregate pushdown (r16): COUNT/MIN/MAX (global and
    // grouped, on top of pushed predicates) compute inside the partition
    // reader — the HashAggregate disappears from the plan entirely
    // (Round16Spec pins it). This is the DSv2 shape behind
    // metadata-answered aggregates at scale (Iceberg/Delta stats reads):
    // a 100 TB COUNT(*) never moves a row.
    "q_workspace_agg_pushdown" -> ((s, _) => {
      val store = fixture()
      s.conf.set("spark.sql.catalog.wag",
        classOf[graft.sources.WorkspaceCatalog].getName)
      s.conf.set("spark.sql.catalog.wag.root", store.mountPath.toString)
      s.sql(
        """SELECT 'global' AS leg, '' AS k, count(*) AS n,
          |       min(v) AS mn, max(v) AS mx
          |FROM wag.demo.`data.csv`
          |UNION ALL
          |SELECT 'by_k', k, count(*), min(v), max(v)
          |FROM wag.demo.`data.csv` WHERE v >= '20'
          |GROUP BY k
          |ORDER BY leg, k""".stripMargin)
    }),

    // Native SQL MERGE INTO through the DSv2 catalog (r13 —
    // SupportsRowLevelOperations, group-based copy-on-write): the write
    // half of the reference's declared "versioning control for data
    // transformations" (reference/README.md:8). The merge source derives
    // from the driver's nation table (keys 2..6: 2/3 match and update,
    // 4/5/6 insert, seed row 1 carries over), the MERGE commits a NEW
    // content-addressed snapshot with `latest` advanced — prior pins
    // stay readable (Round13Spec pins that invariant) — and the query
    // returns the post-merge table read back through the same catalog.
    // q_upsert_merge (RelationalQueries) remains the batch full-outer
    // shape; this row is the native-SQL-surface exemplar.
    "q_merge_native" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val store = fixture()
      s.conf.set("spark.sql.catalog.wsq",
        classOf[graft.sources.WorkspaceCatalog].getName)
      s.conf.set("spark.sql.catalog.wsq.root", store.mountPath.toString)
      graft.engine.Tables.nation(s, d)
        .filter(col("n_nationkey") >= 2 && col("n_nationkey") <= 6)
        .select(col("n_nationkey").cast("string").as("k"),
          (col("n_regionkey") * lit(100)).cast("string").as("v"))
        .createOrReplaceTempView("ws_merge_src")
      s.sql(
        """MERGE INTO wsq.demo.`data.csv` t USING ws_merge_src s
          |ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET v = s.v
          |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)
          |""".stripMargin)
      s.sql("SELECT k, v FROM wsq.demo.`data.csv` ORDER BY k")
    }),

    // Native SQL INSERT INTO through the DSv2 catalog (r16 — the plain
    // SupportsWrite append shape next to q_merge_native's row-level
    // ReplaceData): appends nation-derived rows to the fixture's latest
    // data.csv as a NEW content-addressed version, then reads back BOTH
    // the post-image (latest advanced) and the 'stable' pin — proving
    // the append landed AND prior versions stayed immutable, in one
    // hashable result.
    "q_workspace_insert" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val store = fixture()
      s.conf.set("spark.sql.catalog.wsi",
        classOf[graft.sources.WorkspaceCatalog].getName)
      s.conf.set("spark.sql.catalog.wsi.root", store.mountPath.toString)
      graft.engine.Tables.nation(s, d)
        .filter(col("n_nationkey") >= 7 && col("n_nationkey") <= 9)
        .select(col("n_nationkey").cast("string").as("k"),
          (col("n_regionkey") * lit(1000)).cast("string").as("v"))
        .createOrReplaceTempView("ws_insert_src")
      s.sql("INSERT INTO wsi.demo.`data.csv` SELECT k, v FROM ws_insert_src")
      s.sql(
        """SELECT 'post_insert' AS pin, CAST(k AS INT) AS k,
          |       CAST(v AS INT) AS v
          |FROM wsi.demo.`data.csv`
          |UNION ALL
          |SELECT 'ref_stable', CAST(k AS INT), CAST(v AS INT)
          |FROM wsi.demo.`data.csv` VERSION AS OF 'stable'
          |ORDER BY pin, k""".stripMargin)
    }),

    // Native SQL INSERT OVERWRITE (r16 — the SupportsTruncate half):
    // replaces the table's contents wholesale as a new version; the
    // readback again pairs the post-image with the untouched 'stable'
    // pin.
    "q_workspace_overwrite" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val store = fixture()
      s.conf.set("spark.sql.catalog.wso",
        classOf[graft.sources.WorkspaceCatalog].getName)
      s.conf.set("spark.sql.catalog.wso.root", store.mountPath.toString)
      graft.engine.Tables.nation(s, d)
        .filter(col("n_nationkey") < 3)
        .select(col("n_nationkey").cast("string").as("k"),
          (col("n_regionkey") + lit(700)).cast("string").as("v"))
        .createOrReplaceTempView("ws_overwrite_src")
      s.sql("INSERT OVERWRITE wso.demo.`data.csv` " +
        "SELECT k, v FROM ws_overwrite_src")
      s.sql(
        """SELECT 'post_overwrite' AS pin, CAST(k AS INT) AS k,
          |       CAST(v AS INT) AS v
          |FROM wso.demo.`data.csv`
          |UNION ALL
          |SELECT 'ref_stable', CAST(k AS INT), CAST(v AS INT)
          |FROM wso.demo.`data.csv` VERSION AS OF 'stable'
          |ORDER BY pin, k""".stripMargin)
    }),

    // Native SQL UPDATE through the DSv2 catalog (r16 — completes the
    // DML verb matrix next to MERGE/INSERT/OVERWRITE/DELETE): Spark's
    // RewriteUpdateTable turns the statement into a group-based
    // ReplaceData over the whole-file rewrite group — matched rows take
    // the SET expression, unmatched rows carry over verbatim — and the
    // commit lands as a NEW content-addressed version with `latest`
    // advanced. Readback pairs the post-image with the untouched
    // 'stable' pin, same shape as the other write rows.
    "q_workspace_update" -> ((s, _) => {
      val store = fixture()
      s.conf.set("spark.sql.catalog.wsu",
        classOf[graft.sources.WorkspaceCatalog].getName)
      s.conf.set("spark.sql.catalog.wsu.root", store.mountPath.toString)
      s.sql(
        """UPDATE wsu.demo.`data.csv`
          |SET v = CAST(CAST(v AS INT) + 7 AS STRING)
          |WHERE CAST(k AS INT) >= 2""".stripMargin)
      s.sql(
        """SELECT 'post_update' AS pin, CAST(k AS INT) AS k,
          |       CAST(v AS INT) AS v
          |FROM wsu.demo.`data.csv`
          |UNION ALL
          |SELECT 'ref_stable', CAST(k AS INT), CAST(v AS INT)
          |FROM wsu.demo.`data.csv` VERSION AS OF 'stable'
          |ORDER BY pin, k""".stripMargin)
    }),

    // Native SQL DELETE FROM through the DSv2 catalog (r16 — the last
    // DML verb): RewriteDeleteFromTable keeps only the rows the
    // predicate does NOT match and commits them as the post-image via
    // the same group-based ReplaceData write — a new version, priors
    // immutable (the 'stable' pin in the readback still carries the
    // deleted key).
    "q_workspace_delete" -> ((s, _) => {
      val store = fixture()
      s.conf.set("spark.sql.catalog.wsd",
        classOf[graft.sources.WorkspaceCatalog].getName)
      s.conf.set("spark.sql.catalog.wsd.root", store.mountPath.toString)
      s.sql("DELETE FROM wsd.demo.`data.csv` WHERE k = '2'")
      s.sql(
        """SELECT 'post_delete' AS pin, CAST(k AS INT) AS k,
          |       CAST(v AS INT) AS v
          |FROM wsd.demo.`data.csv`
          |UNION ALL
          |SELECT 'ref_stable', CAST(k AS INT), CAST(v AS INT)
          |FROM wsd.demo.`data.csv` VERSION AS OF 'stable'
          |ORDER BY pin, k""".stripMargin)
    }),

    // Change feed, batch shape (r16): `<path>@changes` reads the file's
    // FULL version history off the store's commit log — one row per
    // (version, data row) with seq = log position. The history here is
    // fixture v1/v2 plus an INSERT (v3) and a DELETE (v4) made through
    // the same catalog: the feed sees every DML verb as the post-image
    // snapshot it committed — the audit/diff surface over the
    // reference's declared versioning model.
    "q_workspace_changes" -> ((s, _) => {
      val store = fixture()
      s.conf.set("spark.sql.catalog.wsc",
        classOf[graft.sources.WorkspaceCatalog].getName)
      s.conf.set("spark.sql.catalog.wsc.root", store.mountPath.toString)
      s.sql("INSERT INTO wsc.demo.`data.csv` VALUES ('4', '40')")
      s.sql("DELETE FROM wsc.demo.`data.csv` WHERE k = '2'")
      s.sql(
        """SELECT seq, CAST(k AS INT) AS k, CAST(v AS INT) AS v
          |FROM wsc.demo.`data.csv@changes`
          |ORDER BY seq, k""".stripMargin)
    }),

    // Change feed, STREAMING shape (r16): the same `@changes` table read
    // through readStream — a custom DSv2 MicroBatchStream whose offset
    // is the commit-log position, replaying ONE VERSION PER MICRO-BATCH
    // via SupportsAdmissionControl (Round16Spec pins the batch count and
    // checkpoint-resume tailing). Per-version rollup in complete mode:
    // the CDC consumer's "what did each commit look like" view.
    "q_stream_workspace_cdc" -> ((s, _) => {
      val store = fixture()
      s.conf.set("spark.sql.catalog.wscs",
        classOf[graft.sources.WorkspaceCatalog].getName)
      s.conf.set("spark.sql.catalog.wscs.root", store.mountPath.toString)
      s.sql("INSERT INTO wscs.demo.`data.csv` VALUES ('9', '90')")
      s.sql(
        """UPDATE wscs.demo.`data.csv`
          |SET v = CAST(CAST(v AS INT) + 5 AS STRING)
          |WHERE CAST(k AS INT) >= 3""".stripMargin)
      import org.apache.spark.sql.functions._
      val feed = s.readStream.table("wscs.demo.`data.csv@changes`")
        .groupBy(col("seq"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("v").cast("long")).as("sum_v"))
      graft.streaming.StreamRunner
        .runToTable(s, feed, "ws_cdc_sink", "complete")
        .orderBy(col("seq"))
    }),

    // DSv2 STREAMING WRITE into the catalog (r16 — completes the DSv2
    // matrix: batch read/write, streaming read (CDC), streaming write):
    // writeStream.toTable drains a bounded events slice through the
    // table's StreamingWrite; each epoch commits one new
    // content-addressed version rebased on the live latest, so the
    // stream's appends accumulate while every prior version stays
    // pinned. Result = the post-image read back through the same
    // catalog (seed rows + streamed rows).
    "q_stream_workspace_sink" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val store = fixture()
      s.conf.set("spark.sql.catalog.wsk",
        classOf[graft.sources.WorkspaceCatalog].getName)
      s.conf.set("spark.sql.catalog.wsk.root", store.mountPath.toString)
      val ev = graft.streaming.StreamRunner.eventsStream(s, d)
        .filter(col("event_id") % 500 === 0)
        .select(col("event_id").cast("string").as("k"),
          col("event_type").as("v"))
      graft.streaming.StreamRunner
        .runToCatalogTable(s, ev, "wsk.demo.`data.csv`")
      s.sql(
        """SELECT k, v FROM wsk.demo.`data.csv`
          |ORDER BY CAST(k AS BIGINT), v""".stripMargin)
    })
  )

  def declaredOracle: Seq[(String, String)] = Seq(
    "q_workspace_lookup" ->
      """SELECT * FROM (VALUES
        |  ('dir_listing', 'directory',
        |   'docs;docs/extra.txt;docs/readme.txt'),
        |  ('err_ambiguous', 'error', 'VersionNotFound'),
        |  ('err_path', 'error', 'PathNotFound'),
        |  ('err_repo', 'error', 'RepoNotFound'),
        |  ('err_version', 'error', 'VersionNotFound'),
        |  ('file_latest', 'file', 'k,v
        |1,10
        |2,20
        |3,30
        |'),
        |  ('file_prefix', 'file', 'version one readme'),
        |  ('file_stable', 'file', 'k,v
        |1,10
        |2,20
        |'),
        |  ('root_listing', 'directory',
        |   ';data.csv;docs;docs/extra.txt;docs/readme.txt'),
        |  ('sanitized', 'file', 'version two readme')
        |) AS t("case", kind, payload)
        |ORDER BY "case"""".stripMargin,

    "q_workspace_table" ->
      """SELECT * FROM (VALUES
        |  ('latest', 1, 10), ('latest', 2, 20), ('latest', 3, 30),
        |  ('stable', 1, 10), ('stable', 2, 20)
        |) AS t(version, k, v)
        |ORDER BY version, k""".stripMargin,

    // stable = v1 {1:10, 2:20}; latest = v2 {1:10, 2:20, 3:30} — rows
    // 1/2 unchanged, 3 added (the fixture's only delta)
    "q_workspace_diff" ->
      """SELECT * FROM (VALUES
        |  ('unchanged', 1, 10, 10),
        |  ('unchanged', 2, 20, 20),
        |  ('added', 3, NULL, 30)
        |) AS t(change, k, v_stable, v_latest)
        |ORDER BY k""".stripMargin,

    // v1 = {1:10, 2:20}; v2 adds 3:30; latest->v2, stable->v1, and the
    // id prefix 'aaaa' resolves to v1 (fixture ids aaaa1111c0ffee /
    // bbbb2222c0ffee)
    "q_workspace_sql" ->
      """SELECT * FROM (VALUES
        |  ('default_latest', 1, 10), ('default_latest', 2, 20),
        |  ('default_latest', 3, 30),
        |  ('id_prefix_aaaa', 1, 10), ('id_prefix_aaaa', 2, 20),
        |  ('ref_stable', 1, 10), ('ref_stable', 2, 20)
        |) AS t(pin, k, v)
        |ORDER BY pin, k""".stripMargin,

    // literal replay of the three pushed-predicate legs over the fixture's
    // latest data.csv {1:10, 2:20, 3:30}
    "q_workspace_pushdown" ->
      """SELECT * FROM (VALUES
        |  ('cmp_ge', '2', '20'), ('cmp_ge', '3', '30'),
        |  ('in_13', '1', '10'), ('in_13', '3', '30'),
        |  ('prefix_1', '1', '10')
        |) AS t(leg, k, v)
        |ORDER BY leg, k""".stripMargin,

    // CTAS replay: derived = seed with doubled v, base untouched
    "q_workspace_ctas" ->
      """SELECT leg, k, v FROM (
        |  SELECT 'derived' AS leg, k, CAST(CAST(v AS INT) * 2 AS VARCHAR)
        |    AS v
        |  FROM (VALUES ('1','10'),('2','20'),('3','30')) d(k, v)
        |  UNION ALL
        |  SELECT 'base', k, v
        |  FROM (VALUES ('1','10'),('2','20'),('3','30')) b(k, v))
        |ORDER BY leg, k""".stripMargin,

    // streamed slice + fixture seed, replayed relationally
    "q_stream_workspace_sink" ->
      """SELECT k, v FROM (
        |  SELECT CAST(event_id AS VARCHAR) AS k, event_type AS v
        |  FROM events WHERE event_id % 500 = 0
        |  UNION ALL
        |  SELECT * FROM (VALUES ('1','10'),('2','20'),('3','30')) s(k, v))
        |ORDER BY CAST(k AS BIGINT), v""".stripMargin,

    // DuckDB's sha256 over the same UTF-8 bytes, truncated to the store's
    // 8-byte id width
    "q_catalog_function" ->
      """SELECT k, v, substr(sha256(v), 1, 16) AS vid
        |FROM (VALUES ('1','10'),('2','20'),('3','30')) t(k, v)
        |ORDER BY k""".stripMargin,

    // literal replay of the pushed aggregates over the fixture's latest
    // data.csv {1:10, 2:20, 3:30}
    "q_workspace_agg_pushdown" ->
      """SELECT leg, k, CAST(n AS BIGINT) AS n, mn, mx FROM (VALUES
        |  ('global', '', 3, '10', '30'),
        |  ('by_k', '2', 1, '20', '20'),
        |  ('by_k', '3', 1, '30', '30')
        |) AS t(leg, k, n, mn, mx)
        |ORDER BY leg, k""".stripMargin,

    // MERGE semantics replayed relationally: seed {1:10,2:20,3:30} from
    // the fixture's latest data.csv, source = nation keys 2..6 with
    // v = n_regionkey*100; matched rows take the source value, unmatched
    // source rows insert, unmatched seed rows carry over. (DuckDB's own
    // MERGE INTO would need a writable table; the oracle only has to
    // reproduce the post-image.)
    "q_merge_native" ->
      """WITH seed(k, v) AS (VALUES ('1','10'),('2','20'),('3','30')),
        |src AS (SELECT CAST(n_nationkey AS VARCHAR) AS k,
        |    CAST(n_regionkey * 100 AS VARCHAR) AS v
        |  FROM nation WHERE n_nationkey BETWEEN 2 AND 6)
        |SELECT coalesce(s.k, t.k) AS k, coalesce(s.v, t.v) AS v
        |FROM seed t FULL OUTER JOIN src s ON t.k = s.k
        |ORDER BY k""".stripMargin,

    // append semantics replayed relationally: post-image = fixture seed
    // {1:10,2:20,3:30} plus nation keys 7..9 at regionkey*1000; stable
    // pin untouched at {1:10,2:20}
    "q_workspace_insert" ->
      """WITH seed(k, v) AS (VALUES (1,10),(2,20),(3,30)),
        |src AS (SELECT CAST(n_nationkey AS INT) AS k,
        |    CAST(n_regionkey * 1000 AS INT) AS v
        |  FROM nation WHERE n_nationkey BETWEEN 7 AND 9),
        |post AS (SELECT * FROM seed UNION ALL SELECT * FROM src)
        |SELECT 'post_insert' AS pin, k, v FROM post
        |UNION ALL
        |SELECT 'ref_stable', k, v FROM seed WHERE k <= 2
        |ORDER BY pin, k""".stripMargin,

    // overwrite semantics: post-image = ONLY the source rows (nation
    // keys 0..2 at regionkey+700); stable pin untouched
    "q_workspace_overwrite" ->
      """WITH src AS (SELECT CAST(n_nationkey AS INT) AS k,
        |    CAST(n_regionkey + 700 AS INT) AS v
        |  FROM nation WHERE n_nationkey < 3)
        |SELECT 'post_overwrite' AS pin, k, v FROM src
        |UNION ALL
        |SELECT 'ref_stable', k, v FROM (VALUES (1,10),(2,20)) s(k, v)
        |ORDER BY pin, k""".stripMargin,

    // UPDATE semantics replayed relationally: fixture latest seed
    // {1:10,2:20,3:30}; rows with k >= 2 take v+7, row 1 carries over;
    // stable pin untouched at {1:10,2:20}
    "q_workspace_update" ->
      """WITH seed(k, v) AS (VALUES (1,10),(2,20),(3,30))
        |SELECT 'post_update' AS pin, k,
        |       CASE WHEN k >= 2 THEN v + 7 ELSE v END AS v FROM seed
        |UNION ALL
        |SELECT 'ref_stable', k, v FROM seed WHERE k <= 2
        |ORDER BY pin, k""".stripMargin,

    // DELETE semantics: post-image = seed minus key 2; stable pin still
    // carries the deleted key (immutability of prior versions)
    "q_workspace_delete" ->
      """WITH seed(k, v) AS (VALUES (1,10),(2,20),(3,30))
        |SELECT 'post_delete' AS pin, k, v FROM seed WHERE k <> 2
        |UNION ALL
        |SELECT 'ref_stable', k, v FROM seed WHERE k <= 2
        |ORDER BY pin, k""".stripMargin,

    // full history replay: v1/v2 from the fixture, v3 = +{4:40} insert,
    // v4 = v3 minus key 2 — each seq is that commit's post-image
    "q_workspace_changes" ->
      """SELECT CAST(seq AS BIGINT) AS seq, k, v FROM (VALUES
        |  (1, 1, 10), (1, 2, 20),
        |  (2, 1, 10), (2, 2, 20), (2, 3, 30),
        |  (3, 1, 10), (3, 2, 20), (3, 3, 30), (3, 4, 40),
        |  (4, 1, 10), (4, 3, 30), (4, 4, 40)
        |) AS t(seq, k, v)
        |ORDER BY seq, k""".stripMargin,

    // per-version rollup of the streamed feed: v3 = +{9:90} insert,
    // v4 = UPDATE k>=3 SET v=v+5 → {1:10,2:20,3:35,9:95}
    "q_stream_workspace_cdc" ->
      """SELECT CAST(seq AS BIGINT) AS seq, CAST(n_rows AS BIGINT) AS n_rows,
        |  CAST(sum_v AS BIGINT) AS sum_v FROM (VALUES
        |  (1, 2, 30), (2, 3, 60), (3, 4, 150), (4, 4, 160)
        |) AS t(seq, n_rows, sum_v)
        |ORDER BY seq""".stripMargin
  )
}
