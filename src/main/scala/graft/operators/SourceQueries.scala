package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.{QueryPack, Tables}

/** Source/sink surface (SURVEY.md §2.2 "Scans / sources / sinks"): CSV,
  * JSON-lines, and text scans plus their sinks, exercised as write→read
  * roundtrips against the parquet corpus so every query stays DuckDB
  * hash-checkable (the roundtrip is the identity on the projected data,
  * so the oracle is plain SQL over the original table). The reference's
  * declared input format is CSV (/root/reference/README.md:7); its file
  * reads are whole-file text (/root/reference/src/http_server.rs:249-253).
  *
  * Scale notes: the sink/scan pair is the same `DataFrameWriter`/
  * `DataFrameReader` API that targets distributed storage on a cluster —
  * only the path changes. Each roundtrip writes with the parallelism of
  * the source (no coalesce(1)): at 100 TB the write fans out per
  * partition and the read lists/splits files in parallel. CSV/JSON scans
  * get explicit schemas (no inference pass over the data — inference
  * reads the whole input once, a full extra scan at scale).
  */
object SourceQueries extends QueryPack {

  /** Scratch dir per (application, sfDir, name); /tmp is the stand-in for
    * the warehouse path a cluster deployment would use. The applicationId
    * segment keeps concurrent JVMs (Bench + Verify on the same corpus)
    * from racing on the same roundtrip files; a shutdown hook deletes the
    * application's own subtree so repeated rounds don't accumulate
    * per-appId copies under /tmp (stale dirs from killed JVMs are the
    * only leak left, same as any temp-dir scheme). */
  // keyed by appRoot, not a single flag: one JVM can run several
  // SparkSessions (different applicationIds) and each needs its own hook
  private val cleanupRegistered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  // private[graft]: the streaming foreachBatch sink reuses the same
  // per-application scratch scheme (and its shutdown-hook cleanup)
  private[graft] def scratch(s: SparkSession, d: String, name: String): String = {
    // Memory-backed scratch when the box has tmpfs (VERDICT r11 item 1c):
    // the write-maintenance ops (q_compact's two parquet writes × reps,
    // the roundtrip sources) were dominated by the shared box's disk
    // queue, not their plans — q_compact read 2.77 → 14.35 s across two
    // driver runs of IDENTICAL code. Scratch is by construction
    // throwaway (per-application, shutdown-hook deleted), so tmpfs
    // changes nothing about the queries' semantics; a real deployment
    // writes maintenance output to its object store, and what this
    // bench should measure is the plan + serialization cost.
    // SPARK_GRAFT_SCRATCH overrides for boxes where /dev/shm is small.
    val base = sys.env.get("SPARK_GRAFT_SCRATCH").getOrElse {
      if (new java.io.File("/dev/shm").isDirectory) "/dev/shm" else "/tmp"
    }
    val appRoot = s"$base/graft_io/${s.sparkContext.applicationId}"
    if (cleanupRegistered.add(appRoot)) {
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def del(f: java.io.File): Unit = {
          val cs = f.listFiles(); if (cs != null) cs.foreach(del)
          f.delete(); ()
        }
        del(new java.io.File(appRoot))
      }))
    }
    s"$appRoot/${d.replaceAll("[^a-zA-Z0-9]", "_")}/$name"
  }

  def declared: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    // -- CSV sink + CSV scan (header, explicit schema) ----------------------
    "q_csv_roundtrip" -> ((s, d) => {
      val out = scratch(s, d, "nation_csv")
      Tables.nation(s, d)
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        .write.mode("overwrite").option("header", "true").csv(out)
      val schema = StructType(Seq(
        StructField("n_nationkey", IntegerType),
        StructField("n_name", StringType),
        StructField("n_regionkey", IntegerType)))
      s.read.option("header", "true").schema(schema).csv(out)
        .orderBy(col("n_nationkey"))
    }),

    // -- CSV PERMISSIVE parse: malformed-ingest resilience ------------------
    // Real feeds carry broken lines; the ingest contract is "never drop
    // silently, never fail the job": PERMISSIVE mode parses what it can
    // and lands the raw text of each malformed line in the corrupt-record
    // column for quarantine. The fixture injects the malformation
    // deterministically (every key ≡ 0 mod 7 writes a junk line), so the
    // DuckDB twin reconstructs the expected parse outcome exactly.
    // FAILFAST/DROPMALFORMED are the same reader one option away.
    "q_csv_permissive" -> ((s, d) => {
      val out = scratch(s, d, "nation_malformed")
      Tables.nation(s, d)
        .select(when(pmod(col("n_nationkey"), lit(7)) === 0,
            concat(lit("badline-"), col("n_nationkey")))
          .otherwise(concat_ws("|", col("n_nationkey"), col("n_name")))
          .as("value"))
        .write.mode("overwrite").text(out)
      val schema = StructType(Seq(
        StructField("n_nationkey", IntegerType),
        StructField("n_name", StringType),
        StructField("_bad", StringType)))
      s.read.option("sep", "|").option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .schema(schema).csv(out)
        .select(col("n_nationkey"), col("n_name"),
          col("_bad").as("bad_line"),
          col("_bad").isNotNull.as("quarantined"))
        .orderBy(coalesce(col("bad_line"), col("n_name")))
    }),

    // -- CSV scan with SCHEMA INFERENCE -------------------------------------
    // The one place inference is exercised (SURVEY §2.2 "CSV scan (header,
    // schema, inference)"): a real user's first CSV read infers. Inference
    // costs a full extra pass over the input, so it stays out of every
    // other scan — this query IS the documentation of that trade-off. The
    // inferred schema itself is part of the checked result: it's emitted
    // as a literal column the DuckDB twin hard-codes, so a regression to
    // all-strings inference fails the hash gate, not just a type warning.
    // -- JSON PERMISSIVE parse: corrupt-record quarantine --------------------
    // The JSON-lines twin of q_csv_permissive: every key ≡ 0 mod 5
    // writes a TRUNCATED object (deterministic malformation), and the
    // PERMISSIVE reader lands those lines in the corrupt-record column
    // with every schema field null — parse what you can, quarantine the
    // rest, never fail the 100 TB ingest job. The oracle reconstructs
    // the expected outcome from the nation table directly.
    "q_json_corrupt" -> ((s, d) => {
      val out = scratch(s, d, "nation_json_corrupt")
      Tables.nation(s, d)
        .select(when(pmod(col("n_nationkey"), lit(5)) === 0,
            concat(lit("{\"n_nationkey\":"), col("n_nationkey"),
              lit(",\"n_name\":")))
          .otherwise(concat(lit("{\"n_nationkey\":"), col("n_nationkey"),
            lit(",\"n_name\":\""), col("n_name"), lit("\"}")))
          .as("value"))
        .write.mode("overwrite").text(out)
      val schema = StructType(Seq(
        StructField("n_nationkey", IntegerType),
        StructField("n_name", StringType),
        StructField("_bad", StringType)))
      s.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .schema(schema).json(out)
        .select(col("n_nationkey"), col("n_name"),
          col("_bad").isNotNull.as("quarantined"))
        .orderBy(col("n_nationkey"), col("n_name"))
    }),

    // -- multi-line CSV: quoted embedded newlines ----------------------------
    // Real CSV feeds quote fields that CONTAIN the record terminator;
    // a line-splitting reader shreds them. Roundtrip a field with an
    // embedded newline through the CSV writer (which quotes it) and the
    // multiLine reader (which must NOT split on it), then prove the
    // payload survived: exact length, first physical line, line count.
    // Scale note: multiLine parsing sacrifices intra-file split
    // parallelism (a quoted newline makes split boundaries ambiguous) —
    // at 100 TB you keep files small and parallelize ACROSS files, which
    // is how this scratch layout writes them.
    "q_csv_multiline" -> ((s, d) => {
      val out = scratch(s, d, "nation_multiline")
      Tables.nation(s, d)
        .select(col("n_nationkey"),
          concat(col("n_name"), lit("\nsecond line of "), col("n_name"))
            .as("note"))
        .write.mode("overwrite").option("header", "true").csv(out)
      val schema = StructType(Seq(
        StructField("n_nationkey", IntegerType),
        StructField("note", StringType)))
      s.read.option("header", "true").option("multiLine", "true")
        .schema(schema).csv(out)
        .select(col("n_nationkey"),
          length(col("note")).cast("long").as("note_len"),
          substring_index(col("note"), "\n", 1).as("first_line"),
          (size(split(col("note"), "\n")) === 2).as("two_lines"))
        .orderBy(col("n_nationkey"))
    }),

    "q_csv_infer" -> ((s, d) => {
      val out = scratch(s, d, "nation_csv_infer")
      Tables.nation(s, d)
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        .write.mode("overwrite").option("header", "true").csv(out)
      val df = s.read.option("header", "true")
        .option("inferSchema", "true").csv(out)
      val inferred = df.schema.fields
        .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")
      df.select(col("n_nationkey").cast("int").as("n_nationkey"),
        col("n_name"),
        col("n_regionkey").cast("int").as("n_regionkey"),
        lit(inferred).as("inferred_schema"))
        .orderBy(col("n_nationkey"))
    }),

    // -- JSON-lines sink + scan (explicit schema, no inference pass) --------
    "q_json_roundtrip" -> ((s, d) => {
      val out = scratch(s, d, "supplier_json")
      Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
          col("s_acctbal"))
        .write.mode("overwrite").json(out)
      val schema = StructType(Seq(
        StructField("s_suppkey", LongType),
        StructField("s_name", StringType),
        StructField("s_nationkey", IntegerType),
        StructField("s_acctbal", DoubleType)))
      s.read.schema(schema).json(out)
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
          round(col("s_acctbal"), 2).as("s_acctbal"))
        .orderBy(col("s_suppkey"))
    }),

    // -- text sink + whole-line text scan (the reference's read model) ------
    "q_text_scan" -> ((s, d) => {
      val out = scratch(s, d, "region_text")
      Tables.region(s, d)
        .select(concat_ws("|", col("r_regionkey"), col("r_name")).as("value"))
        .write.mode("overwrite").text(out)
      s.read.text(out)
        .select(col("value"),
          length(col("value")).cast("bigint").as("line_len"),
          split(col("value"), "\\|").getItem(0).cast("int").as("key"))
        .orderBy(col("key"))
    }),

    // -- binaryFile source: raw-file ingest for multimodal corpora ---------
    // The front door of an image/audio pipeline: a directory of opaque
    // files scanned as (path, length, content) rows with NO decode —
    // Spark's `binaryFile` format. The fixture stage writes one .bin per
    // document from the executors (distributed side-effect IO, the same
    // scaffolding class as q_compact); the OPERATOR under test is the
    // scan: filename-keyed identity (doc_id parsed from the path),
    // length from file metadata, content integrity via md5. At 100 TB
    // this is a listing-parallel narrow scan; small-file pressure is
    // q_compact's territory.
    "q_binary_source" -> ((s, d) => {
      val out = scratch(s, d, "bin_docs")
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
      Tables.documents(s, d).filter(col("doc_id") < 100)
        .select(col("doc_id"), col("text"))
        .foreachPartition { (rows: java.util.Iterator[
            org.apache.spark.sql.Row]) =>
          rows.forEachRemaining { r =>
            java.nio.file.Files.write(
              java.nio.file.Paths.get(out, s"${r.getLong(0)}.bin"),
              r.getString(1).getBytes(
                java.nio.charset.StandardCharsets.UTF_8))
          }
        }
      s.read.format("binaryFile").load(out)
        .select(
          regexp_extract(col("path"), "(\\d+)\\.bin", 1).cast("long")
            .as("doc_id"),
          col("length"), md5(col("content")).as("content_md5"))
        .orderBy(col("doc_id"))
    }),

    // -- hidden file-metadata columns (_metadata) ---------------------------
    // Row-level lineage for free: every file-based scan exposes
    // _metadata.{file_name,row_index,...} computed from the reader state —
    // no shuffle, no join, no extra I/O. This is how a 100 TB pipeline
    // stamps provenance (which file, which row) onto derived datasets so
    // bad upstream shards can be traced and surgically reprocessed later.
    // The oracle knows the fixture layout (single file, rows in s_suppkey
    // order — asserted against DuckDB's file_row_number at build time) and
    // re-derives both columns relationally.
    "q_metadata_cols" -> ((s, d) => {
      s.read.parquet(s"$d/supplier.parquet")
        .select(
          col("s_suppkey"),
          col("_metadata.file_name").as("file_name"),
          col("_metadata.row_index").as("row_idx"))
        .filter(col("s_suppkey") % 3 === 0)
        .orderBy(col("s_suppkey"))
    }),

    // -- parquet sink + scan: pushdown survives the roundtrip ---------------
    "q_parquet_roundtrip" -> ((s, d) => {
      val out = scratch(s, d, "orders_pq")
      Tables.orders(s, d)
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .write.mode("overwrite").parquet(out)
      s.read.parquet(out)
        .filter(col("o_totalprice") > 100000.0)
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // -- hive-partitioned write + partition-pruned read ---------------------
    // THE first-order scan optimization on a real lake: data written as
    // one directory per partition value, so a filter on the partition
    // column prunes whole directories at PLANNING time — the scan never
    // lists, opens, or reads the other partitions' files. PlanSpec pins
    // the filter landing in PartitionFilters (metadata pruning), not
    // PushedFilters (row-group pruning). The partition column is
    // low-cardinality by design (5 priorities): at 100 TB you partition
    // by date/tenant-grade keys and keep file counts per partition sane.
    "q_partitioned_write" -> ((s, d) => {
      val out = scratch(s, d, "orders_part")
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
        .write.mode("overwrite").partitionBy("o_orderpriority").parquet(out)
      s.read.parquet(out)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"),
          col("o_orderpriority"))
        .orderBy(col("o_orderkey"))
    }),

    // -- dynamic partition overwrite: partition-scoped restatement ----------
    // The daily-restatement write shape: a batch that restates ONE
    // partition must replace exactly that partition and leave every
    // other directory untouched — static overwrite mode would truncate
    // the whole table. partitionOverwriteMode=dynamic scopes the commit
    // to the partitions present in the batch; the readback aggregates in
    // exact integer cents, so the result proves both effects at once
    // (1-URGENT carries the restated 0.9× prices, all other partitions
    // their originals — a full truncate or a double-write cannot match
    // the oracle). SourcesSpec additionally pins the file-level claim:
    // untouched partition files survive byte-identical.
    "q_dynamic_overwrite" -> ((s, d) => {
      val out = scratch(s, d, "orders_dynpart")
      val base = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderpriority"))
      base.write.mode("overwrite").partitionBy("o_orderpriority")
        .parquet(out)
      val restated = base.filter(col("o_orderpriority") === "1-URGENT")
        .withColumn("o_totalprice", col("o_totalprice") * lit(0.9))
      val modeKey = "spark.sql.sources.partitionOverwriteMode"
      val oldMode = s.conf.getOption(modeKey)
      try {
        s.conf.set(modeKey, "dynamic")
        restated.write.mode("overwrite").partitionBy("o_orderpriority")
          .parquet(out)
      } finally oldMode match {
        case Some(v) => s.conf.set(modeKey, v)
        case None    => s.conf.unset(modeKey)
      }
      s.read.parquet(out)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5))
            .cast("long")).as("sum_cents"))
        .orderBy(col("o_orderpriority"))
    }),

    // -- parquet bloom filters: point-lookup row-group skipping (r13) -------
    // The needle-in-haystack read shape min/max stats can't serve: the
    // layout is sorted by l_partkey, so every row group's l_orderkey
    // min/max spans nearly the full key range and zone-map pruning is
    // useless — exactly when parquet's split-block bloom filters earn
    // their bytes. The writer enables a bloom on l_orderkey (declared
    // NDV sizes the filter) with small row groups so skipping is real;
    // the point-lookup readback then skips row groups whose bloom
    // excludes the probed keys. At 100 TB this is the difference
    // between a full-column decode and touching a handful of pages.
    // The oracle pins the values; SourcesSpec pins the file-level claim
    // (bloom offsets present in the parquet footer).
    "q_parquet_bloom" -> ((s, d) => {
      val out = scratch(s, d, "lineitem_bloom")
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
        .sort(col("l_partkey"))
        .coalesce(1)
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#l_orderkey", "true")
        .option("parquet.bloom.filter.expected.ndv#l_orderkey", "200000")
        // parquet-mr silently DROPS the bloom when the chunk ends up
        // fully dictionary-encoded (the dictionary already gives exact
        // membership); at bench SFs the key set is small enough to
        // dictionary-encode, so disable dictionary on the bloom column
        // to exercise the 100 TB-shaped path (huge NDV → plain encoding
        // → bloom is the only membership structure)
        .option("parquet.enable.dictionary#l_orderkey", "false")
        .option("parquet.block.size", (1 << 20).toString)
        .parquet(out)
      s.read.parquet(out)
        .filter(col("l_orderkey").isin(1L, 7L, 4242L))
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_lines"),
          floor(sum(col("l_quantity")) * lit(100.0) + lit(0.5))
            .cast("long").as("qty_c"))
        .orderBy(col("l_orderkey"))
    }),

    // -- dynamic partition pruning: join-driven runtime pruning -------------
    // The static-pruning sibling above needs the partition value in the
    // query text; real star joins filter on a DIMENSION attribute. DPP
    // covers that: the dim side is broadcast for the join anyway, so
    // Spark re-uses the broadcast results as a runtime IN-filter on the
    // fact's partition column — whole directories are skipped without
    // the user ever naming them. At 100 TB this is the difference
    // between scanning 2 of 365 date partitions and scanning the year.
    // PlanSpec pins `dynamicpruningexpression` in the fact scan's
    // PartitionFilters.
    "q_dpp_join" -> ((s, d) => {
      import s.implicits._
      val out = scratch(s, d, "orders_part_dpp")
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
        .write.mode("overwrite").partitionBy("o_orderpriority").parquet(out)
      val fact = s.read.parquet(out)
      // the dim must be a SCANNED relation with a surviving Filter node:
      // a literal in-memory frame gets constant-folded into a
      // LocalRelation, which the PartitionPruning rule does not treat as
      // a selective predicate — so land the dim on the lake (where real
      // dims live) and read it back
      val dimPath = scratch(s, d, "prio_dim")
      Seq(("1-URGENT", "hot"), ("2-HIGH", "hot"),
        ("3-MEDIUM", "warm"), ("4-NOT SPECIFIED", "cold"), ("5-LOW", "cold"))
        .toDF("prio", "klass")
        .write.mode("overwrite").parquet(dimPath)
      val dim = s.read.parquet(dimPath)
      fact.join(broadcast(dim.filter(col("klass") === "hot")),
          fact("o_orderpriority") === col("prio"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("sum_price"))
        .orderBy(col("o_orderpriority"))
    }),

    // -- ORC sink + scan: the second columnar format Spark ships ------------
    // Same roundtrip shape as parquet: write a projection, read it back
    // with a filter that must push into the ORC reader (predicate
    // pushdown via ORC's min/max/bloom row-group stats works exactly
    // like parquet's — at 100 TB the filter skips stripes, not rows).
    "q_orc_roundtrip" -> ((s, d) => {
      val out = scratch(s, d, "customer_orc")
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
        .write.mode("overwrite").orc(out)
      s.read.orc(out)
        .filter(col("c_acctbal") > 5000.0)
        .select(col("c_custkey"), col("c_mktsegment"),
          round(col("c_acctbal"), 2).as("c_acctbal"))
        .orderBy(col("c_custkey"))
    }),

    // -- XML sink + scan (Spark 4 native XML data source) -------------------
    // Third-party feeds still arrive as XML; Spark 4 ships the (former
    // spark-xml) reader/writer in core. Same roundtrip discipline as
    // CSV/JSON: explicit schema on the read (XML inference is a full
    // extra pass over the input at scale), element-per-column layout via
    // rowTag. XML is a row-wise text format — no columnar pushdown —
    // so the projection/filter run post-scan; at 100 TB XML is an
    // ingest-once format that lands in parquet (q_parquet_roundtrip),
    // never a query-time storage layout.
    "q_xml_roundtrip" -> ((s, d) => {
      val out = scratch(s, d, "supplier_xml")
      Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))
        .write.mode("overwrite").option("rowTag", "supplier")
        .format("xml").save(out)
      val schema = StructType(Seq(
        StructField("s_suppkey", LongType),
        StructField("s_name", StringType),
        StructField("s_nationkey", IntegerType)))
      s.read.option("rowTag", "supplier").schema(schema)
        .format("xml").load(out)
        .filter(col("s_suppkey") % 2 === 0)
        .orderBy(col("s_suppkey"))
    }),

    // -- bucketed write + co-located join (zero shuffle on either side) -----
    // Both sides are written bucketed (and bucket-sorted) on the join key
    // with the same bucket count, so the sort-merge join reads co-located
    // buckets and needs NO exchange — the idiom that turns a repeated
    // fact-dim join from a per-query shuffle into a one-time layout cost.
    // The downstream groupBy keys start with the bucket key, so the
    // aggregation reuses the same partitioning too (PlanSpec pins the
    // no-hash-exchange property). The merge hint only forces SMJ over a
    // broadcast at test scale; it adds nothing at real scale.
    "q_bucketed_join" -> ((s, d) => {
      val tag = d.replaceAll("[^a-zA-Z0-9]", "_")
      val ordT = s"b_orders_$tag"
      val custT = s"b_customer_$tag"
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .write.mode("overwrite")
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", scratch(s, d, "orders_bucketed"))
        .saveAsTable(ordT)
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"))
        .write.mode("overwrite")
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .option("path", scratch(s, d, "customer_bucketed"))
        .saveAsTable(custT)
      s.table(ordT).hint("merge")
        .join(s.table(custT), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("sum_price"))
        .orderBy(col("c_custkey"))
    }),

    // -- range-partitioned sorted layout (zone-map-friendly writes) ---------
    // The write-side idiom that makes min/max row-group stats effective:
    // repartitionByRange clusters each shipdate range into one output
    // partition and sortWithinPartitions orders rows inside it, so a
    // date-filtered re-read skips whole row groups on parquet min/max
    // (at 100 TB: the difference between reading one week's row groups
    // and sampling every file that interleaves the year). The re-read
    // filter's pushdown is PlanSpec-pinned.
    "q_sorted_layout" -> ((s, d) => {
      val out = scratch(s, d, "lineitem_sorted")
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_shipdate"),
          col("l_extendedprice"))
        .repartitionByRange(8, col("l_shipdate"))
        .sortWithinPartitions(col("l_shipdate"))
        .write.mode("overwrite").parquet(out)
      s.read.parquet(out)
        .filter(col("l_shipdate") >= lit("1995-03-01").cast("timestamp") &&
          col("l_shipdate") < lit("1995-04-01").cast("timestamp"))
        .groupBy(date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_day"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_extendedprice")), 2).as("sum_price"))
        .orderBy(col("ship_day"))
    }),

    // -- observed metrics: data-quality counters with NO extra pass ---------
    // Dataset.observe piggybacks aggregate metrics on the query's own
    // action: one scan produces both the written output and the quality
    // counters (row count, bad-row count, mean) — at 100 TB the
    // alternative is a second full scan per metric batch. The observed
    // values are returned as the query result so the oracle can check
    // the metrics themselves.
    "q_observe_metrics" -> ((s, d) => {
      import s.implicits._
      val obs = new org.apache.spark.sql.Observation("ev_quality")
      val observed = Tables.events(s, d).observe(obs,
        count(lit(1)).as("n_rows"),
        sum(when(col("value") <= 0, 1L).otherwise(0L)).as("n_nonpos"),
        round(avg(col("value")), 6).as("avg_value"))
      // the action that both "ships" the data and populates the metrics
      observed.write.format("noop").mode("overwrite").save()
      val m = obs.get
      Seq((m("n_rows").asInstanceOf[Long],
        m("n_nonpos").asInstanceOf[Long],
        m("avg_value").asInstanceOf[Double]))
        .toDF("n_rows", "n_nonpos", "avg_value")
    }),

    // -- in-memory table (literal rows) joined to a scanned dim -------------
    "q_inmem_table" -> ((s, d) => {
      val schema = StructType(Seq(
        StructField("r_regionkey", LongType, nullable = false),
        StructField("bloc", StringType, nullable = false)))
      val rows = java.util.Arrays.asList(
        Row(0L, "old-world"), Row(1L, "new-world"), Row(2L, "new-world"),
        Row(3L, "old-world"), Row(4L, "old-world"))
      val blocs = s.createDataFrame(rows, schema)
      Tables.nation(s, d).alias("n")
        .join(broadcast(blocs).alias("b"),
          col("b.r_regionkey") === col("n.n_regionkey"))
        .groupBy(col("b.bloc").as("bloc"))
        .agg(count(lit(1)).as("n_nations"),
          min(col("n_name")).as("first_nation"))
        .orderBy(col("bloc"))
    }),

    // -- small-file compaction (table maintenance) -------------------------
    // Streaming ingest and per-partition writers leave thousands of tiny
    // files; every scan then pays a task + open + footer-read per file,
    // and the NameNode/listing pays the metadata. Compaction = read the
    // fragmented table, repartition to the target file count (round-
    // robin, so sizes balance), rewrite. Here 64 shards → 4 files;
    // content equality is the oracle, the file counts are pinned in
    // SourcesSpec. At 100 TB you compact per table-partition and size
    // the target by bytes (repartition(n) per partition dir), not a
    // global constant.
    "q_compact" -> ((s, d) => {
      val fragged = scratch(s, d, "lineitem_fragmented")
      val compacted = scratch(s, d, "lineitem_compacted")
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"))
      li.repartition(64).write.mode("overwrite").parquet(fragged)
      s.read.parquet(fragged)
        .repartition(4)
        .write.mode("overwrite").parquet(compacted)
      s.read.parquet(compacted)
        .withColumn("fn", input_file_name())
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("fn")).as("n_files"),
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_price"),
          sum(col("l_orderkey") * 31 + col("l_linenumber"))
            .as("key_checksum"))
    }),

    // -- schema evolution: mergeSchema over heterogeneous parquet epochs ----
    // A lake table's schema grows over time; old files simply lack the new
    // columns. Epoch 1 writes (orderkey, totalprice), epoch 2 appends the
    // same table WITH o_orderpriority; mergeSchema=true reads both epochs
    // as one relation, NULL-filling the missing column — the aggregate
    // keyed on the evolved column then groups every epoch-1 row under
    // NULL. mergeSchema costs a footer read per file at planning time
    // (why it's opt-in, not the default): at 100 TB you pay it once and
    // persist the merged schema in the catalog, and the scan itself stays
    // one pass — pushdown/pruning behave identically on both epochs.
    "q_schema_merge" -> ((s, d) => {
      val out = scratch(s, d, "orders_evolved")
      val o = Tables.orders(s, d)
      o.filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_totalprice"))
        .write.mode("overwrite").parquet(out)
      o.filter(col("o_orderstatus") === "O")
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderpriority"))
        .write.mode("append").parquet(out)
      s.read.option("mergeSchema", "true").parquet(out)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("o_totalprice")), 2).as("sum_price"))
        .orderBy(col("o_orderpriority").asc_nulls_first)
    }),

    // -- z-order clustered layout: multi-dimensional data skipping ----------
    // Interleaving the bits of two filter dimensions gives a 1-D sort key
    // whose ranges are 2-D locality boxes: range-partition + sort on the
    // z-value and BOTH a partkey-box and a suppkey-box predicate skip most
    // files/row-groups via parquet min/max stats (a single-column sort
    // only skips on that one column). ZOrderLayoutSpec pins the clustering
    // property; this query verifies the z computation itself through the
    // write→read roundtrip. The Spark bit expression and the oracle SQL
    // are generated by the same loop, so they cannot drift.
    "q_zorder_layout" -> ((s, d) => {
      val out = scratch(s, d, "lineitem_zorder")
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          pmod(col("l_partkey"), lit(256L)).as("px"),
          pmod(col("l_suppkey"), lit(256L)).as("sx"))
        .withColumn("zval", zValue(col("px"), col("sx")))
        .repartitionByRange(8, col("zval"))
        .sortWithinPartitions(col("zval"))
        .write.mode("overwrite").parquet(out)
      s.read.parquet(out)
        // sx box stays low: the smallest corpus has 10 suppliers, so
        // sx > 10 never occurs there and a higher box would be empty
        .filter(col("px").between(32, 95) && col("sx").between(2, 5))
        .groupBy(col("px"))
        .agg(count(lit(1)).as("n"), min(col("zval")).as("min_z"),
          max(col("zval")).as("max_z"))
        .orderBy(col("px"))
    })
  )

  /** 16-bit Morton code: interleave the low [[zOrderBits]] bits of two
    * non-negative keys (even positions ← x, odd ← y). The companion
    * [[zValueSql]] emits the same formula as DuckDB SQL from the same
    * loop — one source of truth for both engines. */
  private val zOrderBits = 8
  private[graft] def zValue(x: Column, y: Column): Column =
    (0 until zOrderBits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  private def zValueSql(x: String, y: String): String =
    (0 until zOrderBits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")

  def declaredOracle: Seq[(String, String)] = Seq(
    "q_csv_roundtrip" ->
      """SELECT n_nationkey, n_name, n_regionkey
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    "q_csv_infer" ->
      """SELECT n_nationkey, n_name, n_regionkey,
        |  'n_nationkey:int,n_name:string,n_regionkey:int'
        |    AS inferred_schema
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    "q_json_roundtrip" ->
      """SELECT s_suppkey, s_name, s_nationkey,
        |  round(s_acctbal, 2) AS s_acctbal
        |FROM supplier ORDER BY s_suppkey""".stripMargin,

    // the oracle reconstructs the deterministic malformation outcome:
    // junk lines parse to (NULL, NULL, raw) under PERMISSIVE
    "q_csv_permissive" ->
      """SELECT
        |  CASE WHEN n_nationkey % 7 = 0 THEN NULL
        |       ELSE n_nationkey END AS n_nationkey,
        |  CASE WHEN n_nationkey % 7 = 0 THEN NULL ELSE n_name END
        |    AS n_name,
        |  CASE WHEN n_nationkey % 7 = 0 THEN 'badline-' || n_nationkey
        |       ELSE NULL END AS bad_line,
        |  (n_nationkey % 7 = 0) AS quarantined
        |FROM nation ORDER BY coalesce(bad_line, n_name)""".stripMargin,

    // corrupt rows null every schema field; quarantine flag mirrors
    "q_json_corrupt" ->
      """SELECT
        |  CASE WHEN n_nationkey % 5 = 0 THEN NULL
        |       ELSE n_nationkey END AS n_nationkey,
        |  CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_name END
        |    AS n_name,
        |  (n_nationkey % 5 = 0) AS quarantined
        |FROM nation
        |ORDER BY n_nationkey NULLS FIRST, n_name""".stripMargin,

    // the quoted newline survives the roundtrip byte-for-byte
    "q_csv_multiline" ->
      """SELECT n_nationkey,
        |  CAST(length(n_name || chr(10) || 'second line of ' || n_name)
        |    AS BIGINT) AS note_len,
        |  n_name AS first_line,
        |  true AS two_lines
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    // ASCII corpus: char length == octet length, md5(text) == md5(bytes)
    "q_binary_source" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS length,
        |  md5(text) AS content_md5
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin,

    "q_text_scan" ->
      """SELECT concat(r_regionkey, '|', r_name) AS value,
        |  length(concat(r_regionkey, '|', r_name)) AS line_len,
        |  r_regionkey AS key
        |FROM region ORDER BY key""".stripMargin,

    "q_metadata_cols" ->
      """SELECT s_suppkey, 'supplier.parquet' AS file_name,
        |  s_suppkey AS row_idx
        |FROM supplier WHERE s_suppkey % 3 = 0
        |ORDER BY s_suppkey""".stripMargin,

    "q_parquet_roundtrip" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
        |FROM orders WHERE o_orderstatus = 'F' AND o_totalprice > 100000.0
        |ORDER BY o_orderkey""".stripMargin,

    "q_partitioned_write" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice,
        |  o_orderpriority
        |FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY o_orderkey""".stripMargin,

    "q_dynamic_overwrite" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
        |    THEN CAST(floor(o_totalprice * 0.9 * 100.0 + 0.5) AS BIGINT)
        |    ELSE CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) END)
        |    AS BIGINT) AS sum_cents
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q_dpp_join" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS sum_price
        |FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_parquet_bloom" ->
      """SELECT l_orderkey, count(*) AS n_lines,
        |  CAST(floor(sum(l_quantity) * 100.0 + 0.5) AS BIGINT) AS qty_c
        |FROM lineitem WHERE l_orderkey IN (1, 7, 4242)
        |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,

    "q_orc_roundtrip" ->
      """SELECT c_custkey, c_mktsegment, round(c_acctbal, 2) AS c_acctbal
        |FROM customer WHERE c_acctbal > 5000.0
        |ORDER BY c_custkey""".stripMargin,

    "q_xml_roundtrip" ->
      """SELECT s_suppkey, s_name, s_nationkey
        |FROM supplier WHERE s_suppkey % 2 = 0
        |ORDER BY s_suppkey""".stripMargin,

    "q_bucketed_join" ->
      """SELECT c_custkey, c_name, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin,

    "q_sorted_layout" ->
      """SELECT strftime(l_shipdate, '%Y-%m-%d') AS ship_day,
        |  count(*) AS n, round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-03-01'
        |  AND l_shipdate < TIMESTAMP '1995-04-01'
        |GROUP BY 1 ORDER BY ship_day""".stripMargin,

    "q_observe_metrics" ->
      """SELECT count(*) AS n_rows,
        |  CAST(sum(CASE WHEN value <= 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_nonpos,
        |  round(avg(value), 6) AS avg_value
        |FROM events""".stripMargin,

    "q_inmem_table" ->
      """SELECT bloc, count(*) AS n_nations, min(n_name) AS first_nation
        |FROM nation JOIN (VALUES (0, 'old-world'), (1, 'new-world'),
        |  (2, 'new-world'), (3, 'old-world'), (4, 'old-world'))
        |  AS b(r_regionkey, bloc) ON b.r_regionkey = nation.n_regionkey
        |GROUP BY bloc ORDER BY bloc""".stripMargin,

    // n_files = 4 is the compaction contract (explicit repartition(4)
    // is exempt from AQE coalescing); content columns prove the rewrite
    // is lossless
    "q_compact" ->
      """SELECT count(*) AS n_rows, CAST(4 AS BIGINT) AS n_files,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_price,
        |  CAST(sum(l_orderkey * 31 + l_linenumber) AS BIGINT)
        |    AS key_checksum
        |FROM lineitem""".stripMargin,

    // epoch-1 rows (status F, written before the column existed) group
    // under NULL priority; NULLS FIRST matches Spark's asc_nulls_first
    "q_schema_merge" ->
      """SELECT CASE WHEN o_orderstatus = 'O' THEN o_orderpriority END
        |    AS o_orderpriority,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
        |FROM orders WHERE o_orderstatus IN ('F', 'O')
        |GROUP BY 1 ORDER BY o_orderpriority NULLS FIRST""".stripMargin,

    // same generated bit-interleave formula as the Spark side (zValueSql)
    "q_zorder_layout" ->
      s"""WITH z AS (SELECT l_partkey % 256 AS px, l_suppkey % 256 AS sx
         |  FROM lineitem),
         |zz AS (SELECT px, sx, ${zValueSql("px", "sx")} AS zval FROM z)
         |SELECT px, count(*) AS n, min(zval) AS min_z, max(zval) AS max_z
         |FROM zz WHERE px BETWEEN 32 AND 95 AND sx BETWEEN 2 AND 5
         |GROUP BY 1 ORDER BY px""".stripMargin
  )
}
