package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{QueryPack, Tables}

/** Scalar-function surface: string, date/time, math, array (higher-order),
  * JSON, cast/null handling. SURVEY.md §2.2 "Scalar functions".
  *
  * `functions._` everywhere except q_udf_scalar, which exists to cover
  * the vanilla `udf()` registration path (SURVEY §2.2 UDF row, first
  * branch). Most of the surface is whole-stage-codegen'd; the EXCEPTIONS
  * are that udf (boxed, codegen fence) and the higher-order functions in
  * q_array_funcs (transform/filter/aggregate), which Spark evaluates
  * interpreted (~50 µs/call — see PERF.md). That is acceptable in a
  * once-per-row projection and is exactly why the hot similarity loops
  * use native expressions instead (NativeExpressions).
  *
  * Cross-engine gotchas handled here (vs the DuckDB oracle):
  *  - Spark `log` is natural log; DuckDB `log` is log10 → oracle uses `ln`.
  *  - double→int CAST truncates in Spark but rounds in DuckDB → always
  *    `floor`/`round` explicitly before casting.
  *  - Spark `split` is regex-based; a literal separator works identically
  *    to DuckDB `string_split`.
  */
object FunctionQueries extends QueryPack {

  def declared: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    // -- string functions --------------------------------------------------
    "q_string_funcs" -> ((s, d) => {
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
          upper(col("p_name")).as("uname"),
          substring(col("p_name"), 1, 8).as("prefix8"),
          length(col("p_name")).cast("bigint").as("name_len"),
          lpad(col("p_size").cast("string"), 4, "0").as("size_pad"),
          regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
          regexp_replace(col("p_name"), "[aeiou]", "").as("no_vowels"),
          size(split(col("p_name"), " ")).cast("bigint").as("n_words"),
          levenshtein(col("p_brand"), col("p_type")).cast("bigint").as("lev"))
        .orderBy(col("p_partkey"))
    }),

    // -- vanilla scalar UDF (SURVEY §2.2 UDF row, first branch) ------------
    // The extension path a user reaches for FIRST: a plain Scala udf(),
    // used both through the Column API and (via spark.udf.register)
    // from SQL text. Fine for business logic off the hot path; it boxes
    // every input and fences whole-stage codegen, which is why the
    // per-pair similarity kernels are custom codegen'd Catalyst
    // expressions instead (NativeExpressions.scala). Both call paths
    // are emitted as columns so the oracle hash pins their equivalence
    // to the built-in CASE expression.
    "q_udf_scalar" -> ((s, d) => {
      val tier = udf((bal: Double, seg: String) =>
        if (bal < 0.0) "debit"
        else if (bal >= 5000.0 && seg == "BUILDING") "prime"
        else if (bal >= 5000.0) "high"
        else "standard")
      s.udf.register("g_acct_tier", tier)
      Tables.customer(s, d)
        .select(col("c_custkey"),
          tier(col("c_acctbal"), col("c_mktsegment")).as("tier_api"),
          call_udf("g_acct_tier", col("c_acctbal"), col("c_mktsegment"))
            .as("tier_sql"))
        .orderBy(col("c_custkey"))
    }),

    // -- hand-written UDTF (SURVEY §2.2 UDTF row, dedicated exemplar) ------
    // The table-generating counterpart of q_udaf_geomean: a custom
    // Catalyst `Generator` (NativeExpressions.SentenceSplit) splitting
    // each document into (pos, sentence) rows, invoked through the SQL
    // registration path (LATERAL VIEW + graft_sentences from
    // GraftFunctions) so the query pins both the generator semantics and
    // the FunctionRegistry wiring. `explode`-composition covers this
    // surface elsewhere; this row exists to exercise the real Generator
    // SPI — elementSchema, per-row streaming emit, GenerateExec. The
    // synthetic corpus has no sentence punctuation, so boundaries are
    // injected first (' the ' → '. ') — a deterministic preprocessing
    // both engines share — giving 1-8 sentences per document.
    "q_udtf_gen" -> ((s, d) => {
      Tables.documents(s, d).createOrReplaceTempView("g_udtf_docs")
      s.sql("""SELECT doc_id, t.pos, t.sentence
              |FROM (SELECT doc_id,
              |        regexp_replace(text, ' the ', '. ') AS text
              |      FROM g_udtf_docs) p
              |LATERAL VIEW graft_sentences(text) t AS pos, sentence
              |ORDER BY doc_id, pos""".stripMargin)
    }),

    // -- sentence-boundary-aware chunking (RAG prep over the UDTF) ---------
    // q_doc_chunk slices fixed token windows; retrieval pipelines want
    // chunks that respect SENTENCE boundaries. Sentences come from the
    // same custom Generator as q_udtf_gen; a doc-keyed running character
    // offset assigns each sentence to the chunk its START offset falls
    // in (concat-and-chunk at a 200-char budget — no sequential reset
    // state, so the assignment is one keyed window, not a per-doc scan).
    // Sentences are never split; a long sentence overflows its chunk,
    // which is the standard greedy contract.
    "q_sentence_chunks" -> ((s, d) => {
      Tables.documents(s, d).createOrReplaceTempView("g_chunk_docs")
      s.sql("""WITH sent AS (
              |  SELECT doc_id, t.pos, t.sentence,
              |    length(t.sentence) AS n_chars
              |  FROM (SELECT doc_id,
              |          regexp_replace(text, ' the ', '. ') AS text
              |        FROM g_chunk_docs) p
              |  LATERAL VIEW graft_sentences(text) t AS pos, sentence),
              |c AS (
              |  SELECT doc_id, pos, n_chars,
              |    sum(n_chars) OVER (PARTITION BY doc_id ORDER BY pos)
              |      - n_chars AS off
              |  FROM sent)
              |SELECT doc_id, CAST(off DIV 200 AS BIGINT) AS chunk_id,
              |  count(*) AS n_sents,
              |  CAST(sum(n_chars) AS BIGINT) AS chunk_chars,
              |  CAST(min(pos) AS BIGINT) AS first_pos
              |FROM c GROUP BY doc_id, off DIV 200
              |ORDER BY doc_id, chunk_id""".stripMargin)
    }),

    // -- URL parsing (crawl-corpus curation surface) -----------------------
    // parse_url is how a 100 TB web corpus derives its per-domain keys
    // (dedup by host, robots filtering, domain mixing). DuckDB has no
    // parse_url, so — q_phonetic_schema pattern — the inputs are
    // literals and the twin hard-codes the expected components
    // (java.net.URI semantics: HOST strips port and userinfo, QUERY's
    // third argument extracts one parameter).
    "q_url_funcs" -> ((s, d) => {
      import s.implicits._
      Seq(
        "https://data.example.com:8443/corpus/shard-01/part.parquet?fmt=parquet&rev=7#meta",
        "http://user:pw@mirror.example.net/data?rev=12&x=1",
        "ftp://files.example.org/dir/file.txt")
        .toDF("url")
        .select(col("url"),
          parse_url(col("url"), lit("PROTOCOL")).as("proto"),
          parse_url(col("url"), lit("HOST")).as("host"),
          parse_url(col("url"), lit("PATH")).as("path"),
          parse_url(col("url"), lit("QUERY")).as("query"),
          parse_url(col("url"), lit("REF")).as("anchor"),
          parse_url(col("url"), lit("QUERY"), lit("rev")).as("rev"))
        .orderBy(col("url"))
    }),

    // -- soundex + schema_of_json (SURVEY §2.2 surface completion) ---------
    // Neither function exists in DuckDB, so the inputs are literals and
    // the twin hard-codes the expected outputs: the published US-census
    // soundex values (Robert/Rupert collapse to R163; Ashcraft's h is
    // transparent so s,c merge → A261) and Spark's documented DDL schema
    // string. The VALUES are gated, not just non-null — a soundex or
    // inference regression flips the hash.
    "q_phonetic_schema" -> ((s, d) => {
      import s.implicits._
      Seq("Robert", "Rupert", "Ashcraft", "Tymczak", "Pfister", "Honeyman")
        .toDF("name")
        .select(col("name"), soundex(col("name")).as("sx"),
          schema_of_json(lit("""{"a":1,"b":[1.5],"c":"x"}"""))
            .as("json_schema"))
        .orderBy(col("name"))
    }),

    // -- date/time functions ----------------------------------------------
    "q_date_funcs" -> ((s, d) => {
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("bigint").as("y"),
          month(col("o_orderdate")).cast("bigint").as("m"),
          dayofmonth(col("o_orderdate")).cast("bigint").as("dom"),
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
          datediff(col("o_orderdate").cast("date"),
            lit("1995-01-01").cast("date")).cast("bigint")
            .as("days_since_epoch0"),
          date_format(date_add(col("o_orderdate").cast("date"), 30), "yyyy-MM-dd")
            .as("due_date"))
        .orderBy(col("o_orderkey"))
    }),

    // -- math functions ----------------------------------------------------
    // -- bitwise scalar + aggregate functions ------------------------------
    // bit_count / shifts per row; bit_and / bit_or / bit_xor as grouped
    // aggregates (commutative+associative → map-side combine like any
    // hash agg). xor-aggregation is the classic set-reconciliation /
    // checksum primitive.
    "q_bitwise" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          expr("bit_and(l_orderkey)").as("key_and"),
          expr("bit_or(l_orderkey)").as("key_or"),
          expr("bit_xor(l_orderkey * 31 + l_linenumber)").as("key_xor"),
          sum(bit_count(col("l_orderkey"))).as("popcount_sum"),
          max(expr("shiftleft(l_orderkey, 2)")).as("max_shl"),
          min(expr("shiftright(l_orderkey, 1)")).as("min_shr"))
        .orderBy(col("l_returnflag"))
    }),

    "q_math_funcs" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_linenumber") === 1)
        .select(
          col("l_orderkey"),
          abs(col("l_discount") - 0.05).as("abs_d"),
          round(col("l_extendedprice"), 1).as("round1"),
          floor(col("l_extendedprice")).as("flr"),
          ceil(col("l_extendedprice")).as("cl"),
          round(pow(col("l_quantity"), 2.0), 6).as("qty_sq"),
          round(sqrt(col("l_extendedprice")), 6).as("sqrt_p"),
          round(exp(col("l_discount")), 6).as("exp_d"),
          round(log(col("l_extendedprice")), 6).as("ln_p"),
          pmod(col("l_orderkey"), lit(7)).as("key_mod"))
        .orderBy(col("l_orderkey"))
    }),

    // -- array / higher-order functions over embeddings --------------------
    // -- bitmap-accelerated exact distinct counting --------------------------
    // Spark 4's roaring-style bitmap aggregate surface: user ids bucket
    // into fixed 32768-bit bitmaps (bitmap_bucket_number /
    // bitmap_bit_position), each (group, bucket) folds to ONE binary
    // value via bitmap_construct_agg, and popcounts sum to the EXACT
    // distinct count — the scale pattern that replaces shuffling raw
    // ids with shuffling fixed-size mergeable bitmaps (the same shape
    // HLL gives approximately, exact here). At 100 TB the shuffle
    // volume is groups × touched-buckets × 4 KiB, independent of row
    // count. Oracle: the definitionally-equal count(DISTINCT).
    "q_bitmap_distinct" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("event_type"),
          bitmap_bucket_number(col("user_id")).as("bucket"))
        .agg(bitmap_count(bitmap_construct_agg(
          bitmap_bit_position(col("user_id")))).as("cnt"))
        .groupBy(col("event_type"))
        .agg(sum(col("cnt")).as("n_distinct"),
          count(lit(1)).as("n_buckets"))
        .orderBy(col("event_type"))
    }),

    "q_array_funcs" -> ((s, d) => {
      Tables.embeddings(s, d)
        .withColumn("vd", col("embedding").cast("array<double>"))
        .select(
          col("vec_id"),
          size(col("embedding")).cast("bigint").as("n_dims"),
          round(aggregate(col("vd"), lit(0.0), (acc, x) => acc + x), 6)
            .as("sum_all"),
          round(aggregate(slice(col("vd"), 1, 5), lit(0.0), (acc, x) => acc + x), 6)
            .as("sum_first5"),
          size(filter(col("vd"), x => x > 0.0)).cast("bigint").as("n_pos"),
          round(aggregate(transform(col("vd"), x => x * x), lit(0.0),
            (acc, x) => acc + x), 6).as("sq_norm"),
          round(array_min(col("vd")), 6).as("min_v"),
          round(array_max(col("vd")), 6).as("max_v"))
        .orderBy(col("vec_id"))
    }),

    // -- JSON functions over events.props ----------------------------------
    "q_json_funcs" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          round(avg(col("k")), 6).as("avg_k"),
          max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    }),

    // -- structured JSON: from_json / json_tuple / to_json ------------------
    // Canonical re-serialization keeps the oracle engine-agnostic: both
    // sides emit {"k":<int>} with no whitespace.
    "q_json_struct" -> ((s, d) => {
      import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
      val schema = StructType(Seq(StructField("k", IntegerType)))
      Tables.events(s, d)
        .withColumn("j", from_json(col("props"), schema))
        .withColumn("kt", json_tuple(col("props"), "k"))
        .filter(col("j.k") > 80)
        .select(
          col("event_id"),
          col("j.k").as("k"),
          col("kt").cast("int").as("k_tuple"),
          // Spark serializes {"k":<n>} with no whitespace; the oracle
          // string-builds the same canonical form
          to_json(struct(col("j.k").as("k"))).as("json_out"))
        .orderBy(col("event_id"))
    }),

    // -- ANSI-safe arithmetic (try_add / try_subtract / try_multiply /
    // try_divide) -----------------------------------------------------------
    // Spark 4 runs ANSI mode: raw overflow/÷0 THROWS, killing a 100 TB job
    // at the one poisoned row. The try_* family returns NULL instead —
    // per-row damage containment, the dirty-data posture a pipeline wants.
    // Operand constants are chosen so the overflow boundary is exact
    // integer arithmetic (null iff key > threshold); DuckDB has no try_*,
    // so the oracle guards the same expressions with the derived CASE
    // thresholds — which also PINS that the null set is exactly the
    // overflow set, not a row more or less.
    "q_try_arith" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") < 3000)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          try_add(col("l_orderkey"), lit(Long.MaxValue - 1000L))
            .as("add_ovf"),
          try_subtract(lit(Long.MinValue + 500L), col("l_orderkey"))
            .as("sub_ovf"),
          try_multiply(col("l_partkey") + 1L, lit(Long.MaxValue / 100L))
            .as("mul_ovf"),
          (floor(try_divide(col("l_extendedprice"),
            (col("l_linenumber") - 1).cast("double")) * 1e6 + 0.5) / 1e6)
            .as("div_safe"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // -- timezone conversion (convert_timezone) -----------------------------
    // Event-time localization: storage stays UTC (the only sane cluster
    // invariant); wall-clock rendering happens at the edge. Both engines
    // resolve the same IANA zone database; January fixture dates sit on
    // stable offsets (EST −5, JST +9) on any tzdata vintage.
    "q_timezone" -> ((s, d) => {
      Tables.eventsWithTime(s, d)
        .filter(col("event_id") < 500)
        .select(
          col("event_id"),
          date_format(col("ts_t"), "yyyy-MM-dd HH:mm:ss").as("utc_str"),
          date_format(convert_timezone(lit("UTC"),
            lit("America/New_York"), col("ts_t")),
            "yyyy-MM-dd HH:mm:ss").as("nyc_str"),
          date_format(convert_timezone(lit("UTC"), lit("Asia/Tokyo"),
            col("ts_t")), "yyyy-MM-dd HH:mm:ss").as("tokyo_str"),
          hour(convert_timezone(lit("UTC"), lit("Asia/Tokyo"), col("ts_t")))
            .cast("bigint").as("tokyo_hour"))
        .orderBy(col("event_id"))
    }),

    // -- collations (Spark 4 collated string comparison) --------------------
    // Case-insensitive semantics IN the type system: comparisons, grouping
    // and DISTINCT under UTF8_LCASE need no lower() wrapping, and unlike
    // an expression-level normalize the collation survives into hash
    // partitioning (shuffle keys agree with compare semantics — the thing
    // a lower()-wrapped groupBy loses when a later join compares raw).
    // The corpus is mono-case, so mixed-case copies are derived
    // deterministically first (initcap on even keys). Every output is a
    // count/boolean — representative-value ambiguity under collation ties
    // (which variant "wins") never reaches the hash.
    "q_collation" -> ((s, d) => {
      Tables.customer(s, d)
        .withColumn("seg_mixed",
          when(pmod(col("c_custkey"), lit(2)) === 0,
            initcap(lower(col("c_mktsegment"))))
            .otherwise(col("c_mktsegment")))
        .groupBy(col("c_nationkey"))
        .agg(
          countDistinct(col("seg_mixed")).as("n_binary"),
          countDistinct(collate(col("seg_mixed"), "UTF8_LCASE"))
            .as("n_lcase"),
          sum(when(collate(col("seg_mixed"), "UTF8_LCASE") === "building", 1L)
            .otherwise(0L)).as("n_building"))
        .orderBy(col("c_nationkey"))
    }),

    // -- VARIANT (Spark 4 semi-structured type) -----------------------------
    // The open-schema ingestion path: heterogeneous JSON is parsed ONCE
    // into the binary VARIANT encoding, then fields are extracted with
    // typed paths — at scale this beats per-field get_json_object (one
    // parse per row instead of one per extraction) and the encoding is
    // columnar-shreddable in parquet. The doc is built per-row so it has
    // nested objects, an array, and a JSON null to exercise the type
    // surface; DuckDB has no VARIANT, so the oracle recomputes every
    // extracted scalar from the base columns (the values, not the
    // encoding, are the contract).
    "q_variant_funcs" -> ((s, d) => {
      val doc = concat(
        lit("{\"id\":"), col("event_id"),
        lit(",\"ty\":\""), col("event_type"), lit("\""),
        lit(",\"m\":{\"k\":"), get_json_object(col("props"), "$.k"),
        lit(",\"ok\":true,\"nul\":null}"),
        lit(",\"arr\":["), col("user_id"), lit(","),
        (col("event_id") + col("user_id")), lit("]}"))
      Tables.events(s, d)
        .withColumn("v", parse_json(doc))
        .select(
          col("event_id"),
          variant_get(col("v"), "$.ty", "string").as("ty"),
          variant_get(col("v"), "$.m.k", "int").as("k"),
          variant_get(col("v"), "$.m.ok", "boolean").as("ok"),
          variant_get(col("v"), "$.arr[1]", "bigint").as("arr1"),
          try_variant_get(col("v"), "$.missing", "int").as("missing"),
          is_variant_null(variant_get(col("v"), "$.m.nul", "variant"))
            .as("is_nul"),
          schema_of_variant(col("v")).as("v_schema"))
        .filter(col("k") > 90)
        .orderBy(col("event_id"))
    }),

    // -- map functions ------------------------------------------------------
    // The map itself can't be hash-compared across engines (Spark maps are
    // unordered), so every output column is a scalar/array DERIVED from the
    // map — the oracle recomputes the same values from the base columns.
    "q_map_funcs" -> ((s, d) => {
      Tables.customer(s, d)
        .withColumn("m", map(
          lit("seg"), col("c_mktsegment"),
          lit("name"), col("c_name"),
          lit("nk"), col("c_nationkey").cast("string")))
        .select(
          col("c_custkey"),
          element_at(col("m"), "seg").as("seg"),
          element_at(col("m"), "missing").as("missing_key"),
          size(col("m")).as("m_size"),
          // joined to a string — raw array cells crash the driver's
          // pandas-based canonical sort (unhashable ndarray)
          array_join(array_sort(map_keys(col("m"))), ",").as("keys_sorted"),
          array_contains(map_values(col("m")), col("c_name")).as("has_name"))
        .orderBy(col("c_custkey"))
    }),

    // -- casts, try_cast, NaN/null handling --------------------------------
    "q_cast_null" -> ((s, d) => {
      Tables.customer(s, d)
        .select(
          col("c_custkey"),
          col("c_acctbal").cast("string").as("bal_str"),
          col("c_name").try_cast("int").as("name_as_int"),
          regexp_extract(col("c_name"), "([0-9]+)", 1).try_cast("bigint")
            .as("name_num"),
          floor(col("c_acctbal")).cast("bigint").as("bal_floor"),
          // ANSI mode (Spark 4 default): plain / by zero throws;
          // try_divide → NULL matches DuckDB's division-by-zero → NULL.
          try_divide(col("c_acctbal"),
            col("c_acctbal") - col("c_acctbal")).as("div0"),
          isnan(lit(Double.NaN) * col("c_acctbal")).as("nan_flag"),
          nanvl(lit(Double.NaN) * col("c_acctbal"), lit(-9.0)).as("nan_fixed"),
          coalesce(col("c_mktsegment").try_cast("double"), lit(-1.0))
            .as("seg_num"))
        .orderBy(col("c_custkey"))
    })
  )

  def declaredOracle: Seq[(String, String)] = Seq(
    // the CASE twin of the Scala closure — both udf call paths must
    // equal the declarative expression
    "q_udf_scalar" ->
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal < 0 THEN 'debit'
        |       WHEN c_acctbal >= 5000 AND c_mktsegment = 'BUILDING'
        |         THEN 'prime'
        |       WHEN c_acctbal >= 5000 THEN 'high'
        |       ELSE 'standard' END AS tier_api,
        |  CASE WHEN c_acctbal < 0 THEN 'debit'
        |       WHEN c_acctbal >= 5000 AND c_mktsegment = 'BUILDING'
        |         THEN 'prime'
        |       WHEN c_acctbal >= 5000 THEN 'high'
        |       ELSE 'standard' END AS tier_sql
        |FROM customer ORDER BY c_custkey""".stripMargin,

    // same sentence pipeline as the q_udtf_gen twin + the identical
    // windowed start-offset chunk assignment
    "q_sentence_chunks" ->
      """WITH s AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(
        |        regexp_replace(text, ' the ', '. ', 'g'),
        |        '[.!?]+[ \t\n\r]+'),
        |      x -> x <> '') AS ss
        |  FROM documents),
        |sent AS (SELECT doc_id,
        |    CAST(generate_subscripts(ss, 1) - 1 AS BIGINT) AS pos,
        |    unnest(ss) AS sentence
        |  FROM s),
        |c AS (SELECT doc_id, pos, length(sentence) AS n_chars,
        |    sum(length(sentence)) OVER (PARTITION BY doc_id ORDER BY pos)
        |      - length(sentence) AS off
        |  FROM sent)
        |SELECT doc_id, CAST(off // 200 AS BIGINT) AS chunk_id,
        |  count(*) AS n_sents,
        |  CAST(sum(n_chars) AS BIGINT) AS chunk_chars,
        |  CAST(min(pos) AS BIGINT) AS first_pos
        |FROM c GROUP BY doc_id, off // 200
        |ORDER BY doc_id, chunk_id""".stripMargin,

    // the regex twin of the SentenceSplit char scan: split on
    // punct-run + whitespace-run, drop empty segments, number the kept
    // ones 0-based (list_filter BEFORE generate_subscripts — the
    // generator numbers kept segments only)
    "q_udtf_gen" ->
      """WITH s AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(
        |        regexp_replace(text, ' the ', '. ', 'g'),
        |        '[.!?]+[ \t\n\r]+'),
        |      x -> x <> '') AS ss
        |  FROM documents)
        |SELECT doc_id, CAST(generate_subscripts(ss, 1) - 1 AS BIGINT)
        |    AS pos,
        |  unnest(ss) AS sentence
        |FROM s ORDER BY doc_id, pos""".stripMargin,

    // hard-coded expected components (DuckDB has no parse_url); NULLs
    // where the URL lacks the part
    "q_url_funcs" ->
      """SELECT * FROM (VALUES
        |  ('ftp://files.example.org/dir/file.txt', 'ftp',
        |   'files.example.org', '/dir/file.txt', NULL, NULL, NULL),
        |  ('http://user:pw@mirror.example.net/data?rev=12&x=1', 'http',
        |   'mirror.example.net', '/data', 'rev=12&x=1', NULL, '12'),
        |  ('https://data.example.com:8443/corpus/shard-01/part.parquet?fmt=parquet&rev=7#meta',
        |   'https', 'data.example.com', '/corpus/shard-01/part.parquet',
        |   'fmt=parquet&rev=7', 'meta', '7')
        |) AS t(url, proto, host, path, query, anchor, rev)
        |ORDER BY url""".stripMargin,

    // hard-coded expected values: DuckDB has neither soundex nor
    // schema_of_json (see the query comment for the provenance of each)
    "q_phonetic_schema" ->
      """SELECT name, sx,
        |  'STRUCT<a: BIGINT, b: ARRAY<DOUBLE>, c: STRING>' AS json_schema
        |FROM (VALUES ('Ashcraft','A261'), ('Honeyman','H555'),
        |  ('Pfister','P236'), ('Robert','R163'), ('Rupert','R163'),
        |  ('Tymczak','T522')) AS t(name, sx)
        |ORDER BY name""".stripMargin,

    "q_string_funcs" ->
      """SELECT p_partkey,
        |  concat_ws('|', p_brand, p_type) AS brand_type,
        |  upper(p_name) AS uname,
        |  substring(p_name, 1, 8) AS prefix8,
        |  length(p_name) AS name_len,
        |  lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
        |  regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
        |  regexp_replace(p_name, '[aeiou]', '', 'g') AS no_vowels,
        |  len(string_split(p_name, ' ')) AS n_words,
        |  levenshtein(p_brand, p_type) AS lev
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_date_funcs" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS y,
        |  month(o_orderdate) AS m,
        |  dayofmonth(o_orderdate) AS dom,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |  datediff('day', DATE '1995-01-01',
        |           CAST(o_orderdate AS DATE)) AS days_since_epoch0,
        |  strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS due_date
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    // DuckDB's bit_count takes BIT/TINYINT-ish types for ints it works on
    // BIGINT directly; shifts use the same <<//>> operators
    "q_bitwise" ->
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(bit_and(l_orderkey) AS BIGINT) AS key_and,
        |  CAST(bit_or(l_orderkey) AS BIGINT) AS key_or,
        |  CAST(bit_xor(l_orderkey * 31 + l_linenumber) AS BIGINT)
        |    AS key_xor,
        |  CAST(sum(bit_count(l_orderkey)) AS BIGINT) AS popcount_sum,
        |  CAST(max(l_orderkey << 2) AS BIGINT) AS max_shl,
        |  CAST(min(l_orderkey >> 1) AS BIGINT) AS min_shr
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,

    "q_math_funcs" ->
      """SELECT l_orderkey,
        |  abs(l_discount - 0.05) AS abs_d,
        |  round(l_extendedprice, 1) AS round1,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS flr,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS cl,
        |  round(pow(l_quantity, 2.0), 6) AS qty_sq,
        |  round(sqrt(l_extendedprice), 6) AS sqrt_p,
        |  round(exp(l_discount), 6) AS exp_d,
        |  round(ln(l_extendedprice), 6) AS ln_p,
        |  l_orderkey % 7 AS key_mod
        |FROM lineitem WHERE l_linenumber = 1
        |ORDER BY l_orderkey""".stripMargin,

    // popcount-sum over fixed bitmaps == count(DISTINCT) by definition;
    // bucket formula pinned by probe: v>0 → (v-1)//32768+1, else v//32768
    "q_bitmap_distinct" ->
      """WITH b AS (SELECT event_type, user_id,
        |    CASE WHEN user_id > 0 THEN (user_id - 1) // 32768 + 1
        |      ELSE 0 END AS bucket
        |  FROM events)
        |SELECT event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct,
        |  CAST(count(DISTINCT bucket) AS BIGINT) AS n_buckets
        |FROM b GROUP BY 1 ORDER BY event_type""".stripMargin,

    "q_array_funcs" ->
      """SELECT vec_id,
        |  len(embedding) AS n_dims,
        |  round(list_sum(vd), 6) AS sum_all,
        |  round(list_sum(vd[1:5]), 6) AS sum_first5,
        |  len(list_filter(vd, x -> x > 0.0)) AS n_pos,
        |  round(list_sum(list_transform(vd, x -> x * x)), 6) AS sq_norm,
        |  round(list_min(vd), 6) AS min_v,
        |  round(list_max(vd), 6) AS max_v
        |FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vd, embedding
        |      FROM embeddings) t
        |ORDER BY vec_id""".stripMargin,

    "q_json_funcs" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(k) AS BIGINT) AS sum_k,
        |  round(avg(k), 6) AS avg_k,
        |  max(k) AS max_k
        |FROM (SELECT event_type,
        |        CAST(props->>'$.k' AS INT) AS k FROM events) t
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_json_struct" ->
      """SELECT event_id,
        |  CAST(props->>'$.k' AS INT) AS k,
        |  CAST(props->>'$.k' AS INT) AS k_tuple,
        |  concat('{"k":', CAST(props->>'$.k' AS INT), '}') AS json_out
        |FROM events WHERE CAST(props->>'$.k' AS INT) > 80
        |ORDER BY event_id""".stripMargin,

    // the CASE guards derive the exact overflow boundary (no try_* in
    // DuckDB) — pinning that Spark's null set IS the overflow set
    "q_try_arith" ->
      """SELECT l_orderkey, l_linenumber,
        |  CASE WHEN l_orderkey > 1000 THEN NULL
        |       ELSE l_orderkey + 9223372036854774807 END AS add_ovf,
        |  CASE WHEN l_orderkey > 500 THEN NULL
        |       ELSE (-9223372036854775308) - l_orderkey END AS sub_ovf,
        |  CASE WHEN l_partkey + 1 > 100 THEN NULL
        |       ELSE (l_partkey + 1) * 92233720368547758 END AS mul_ovf,
        |  CASE WHEN l_linenumber = 1 THEN NULL
        |       ELSE floor(l_extendedprice
        |              / CAST(l_linenumber - 1 AS DOUBLE) * 1e6 + 0.5) / 1e6
        |  END AS div_safe
        |FROM lineitem WHERE l_orderkey < 3000
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_timezone" ->
      """SELECT event_id,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS utc_str,
        |  strftime(timezone('America/New_York', ts AT TIME ZONE 'UTC'),
        |    '%Y-%m-%d %H:%M:%S') AS nyc_str,
        |  strftime(timezone('Asia/Tokyo', ts AT TIME ZONE 'UTC'),
        |    '%Y-%m-%d %H:%M:%S') AS tokyo_str,
        |  CAST(hour(timezone('Asia/Tokyo', ts AT TIME ZONE 'UTC'))
        |    AS BIGINT) AS tokyo_hour
        |FROM events WHERE event_id < 500
        |ORDER BY event_id""".stripMargin,

    "q_collation" ->
      """SELECT c_nationkey,
        |  count(DISTINCT seg_mixed) AS n_binary,
        |  count(DISTINCT lower(seg_mixed)) AS n_lcase,
        |  CAST(sum(CASE WHEN lower(seg_mixed) = 'building'
        |       THEN 1 ELSE 0 END) AS BIGINT) AS n_building
        |FROM (SELECT c_nationkey,
        |        CASE WHEN c_custkey % 2 = 0
        |          THEN concat(upper(substr(lower(c_mktsegment), 1, 1)),
        |                      substr(lower(c_mktsegment), 2))
        |          ELSE c_mktsegment END AS seg_mixed
        |      FROM customer) t
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "q_variant_funcs" ->
      """SELECT event_id,
        |  event_type AS ty,
        |  CAST(props->>'$.k' AS INT) AS k,
        |  true AS ok,
        |  event_id + user_id AS arr1,
        |  CAST(NULL AS INT) AS missing,
        |  true AS is_nul,
        |  'OBJECT<arr: ARRAY<BIGINT>, id: BIGINT, m: OBJECT<k: BIGINT, nul: VOID, ok: BOOLEAN>, ty: STRING>' AS v_schema
        |FROM events WHERE CAST(props->>'$.k' AS INT) > 90
        |ORDER BY event_id""".stripMargin,

    "q_map_funcs" ->
      """SELECT c_custkey,
        |  c_mktsegment AS seg,
        |  CAST(NULL AS VARCHAR) AS missing_key,
        |  3 AS m_size,
        |  'name,nk,seg' AS keys_sorted,
        |  true AS has_name
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_cast_null" ->
      """SELECT c_custkey,
        |  CAST(c_acctbal AS VARCHAR) AS bal_str,
        |  TRY_CAST(c_name AS INT) AS name_as_int,
        |  TRY_CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT)
        |    AS name_num,
        |  CAST(floor(c_acctbal) AS BIGINT) AS bal_floor,
        |  c_acctbal / (c_acctbal - c_acctbal) AS div0,
        |  isnan('nan'::DOUBLE * c_acctbal) AS nan_flag,
        |  CASE WHEN isnan('nan'::DOUBLE * c_acctbal) THEN -9.0
        |       ELSE 'nan'::DOUBLE * c_acctbal END AS nan_fixed,
        |  coalesce(TRY_CAST(c_mktsegment AS DOUBLE), -1.0) AS seg_num
        |FROM customer ORDER BY c_custkey""".stripMargin
  )
}
