package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{QueryPack, Tables}
import graft.functions.TextDedup

/** Text-analysis + deduplication operators over `documents`
  * (SURVEY.md §2.2 "LLM-data-pipeline operators"):
  * exact dedup, n-gram/word-set Jaccard near-dup, MinHash-LSH and SimHash
  * candidate generation (in TextDedup), language-ID heuristic, quality
  * scoring, token counting, document fingerprinting.
  *
  * Oracle policy: everything with engine-independent arithmetic (md5
  * fingerprints, Jaccard over word sets, ratios) has a DuckDB twin.
  * MinHash/SimHash use Spark's hash functions (murmur3/xxhash64) whose
  * exact outputs are engine-specific by design → no SQL oracle; instead
  * TextDedupSpec asserts candidate recall == 1.0 against the exact-Jaccard
  * query on the corpus.
  */
object TextQueries extends QueryPack {

  /** Normalized text: lowercase, trimmed, whitespace collapsed. */
  private def norm(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** Distinct word set of a document. */
  private def tokens(c: Column): Column = array_distinct(split(c, " "))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- per-document text statistics / quality scoring --------------------
    "q_text_stats" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .select(
          col("doc_id"),
          col("lang"),
          length(col("text")).cast("bigint").as("n_chars_calc"),
          (col("n_chars") === length(col("text"))).as("n_chars_ok"),
          size(col("toks")).cast("bigint").as("n_tokens"),
          size(array_distinct(col("toks"))).cast("bigint").as("n_distinct_tokens"),
          round(size(array_distinct(col("toks"))).cast("double") /
            size(col("toks")), 6).as("ttr"),
          round((length(col("text")) - (size(col("toks")) - 1))
            .cast("double") / size(col("toks")), 6).as("avg_word_len"))
        .orderBy(col("doc_id"))
    }),

    // -- quality score: composite, filterable --------------------------------
    "q_quality_score" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("n_tok", size(split(col("text"), " ")))
        .withColumn("uniq_ratio",
          size(array_distinct(split(col("text"), " "))).cast("double") /
            col("n_tok"))
        .withColumn("len_score",
          least(col("n_tok").cast("double") / 50.0, lit(1.0)))
        .withColumn("score", round((col("uniq_ratio") + col("len_score")) / 2.0, 6))
        .filter(col("score") > 0.5)
        .select(col("doc_id"), col("score"),
          round(col("uniq_ratio"), 6).as("uniq_ratio"),
          round(col("len_score"), 6).as("len_score"))
        .orderBy(col("doc_id"))
    }),

    // -- token counting: whitespace + BPE-ish regex ------------------------
    "q_token_count" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("ws_tokens", size(split(col("text"), " ")))
        .withColumn("bpe_tokens",
          regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]")))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("ws_tokens")).as("sum_ws_tokens"),
          sum(col("bpe_tokens")).as("sum_bpe_tokens"),
          round(avg(col("ws_tokens")), 6).as("avg_ws_tokens"))
        .orderBy(col("lang"))
    }),

    // -- language-ID heuristic (deterministic char-class profile) ----------
    "q_lang_id" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("vr", round(
          regexp_count(col("text"), lit("[aeiou]")).cast("double") /
            length(col("text")), 6))
        .withColumn("guess",
          when(regexp_count(col("text"), lit("[\\u4e00-\\u9fff]")) > 0, "zh")
            .when(col("vr") >= 0.32, "en")
            .when(col("vr") >= 0.28, "es")
            .otherwise("other"))
        .select(col("doc_id"), col("lang"), col("vr"), col("guess"),
          (col("guess") === col("lang")).as("agrees"))
        .orderBy(col("doc_id"))
    }),

    // -- document fingerprint: md5 + min-shingle rolling fingerprint -------
    "q_fingerprint" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("toks", split(norm(col("text")), " "))
        .select(
          col("doc_id"),
          md5(norm(col("text"))).as("doc_md5"),
          array_min(transform(
            sequence(lit(0), size(col("toks")) - 5),
            i => md5(concat_ws(" ", slice(col("toks"), i + 1, lit(5))))))
            .as("min_shingle_md5"))
        .orderBy(col("doc_id"))
    }),

    // -- exact dedup by normalized-text hash -------------------------------
    "q_dedup_exact" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("fp", sha2(norm(col("text")), 256))
        .groupBy(col("fp"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy(col("keep_id"))
    }),

    // -- near-dup: exact word-set Jaccard (ground truth for LSH variants) --
    "q_dedup_jaccard" -> ((s, d) => {
      TextDedup.exactJaccardPairs(
          Tables.documents(s, d).select(col("doc_id"), col("text")), 0.7)
        .orderBy(col("d1"), col("d2"))
    }),

    // -- near-dup: character 3-gram Jaccard --------------------------------
    // Prefix-filter similarity join (SSJoin/PPJoin family): under ANY
    // global total order on grams, two sets with J >= t must share an
    // element within their first sz - ceil(t*sz) + 1 grams. We order by
    // xxhash64(gram) (deterministic, near-uniform), join on prefix grams
    // only, then verify candidates exactly. Lossless, and avoids the
    // O(n²) cross join — the scale path for char-gram dedup (3-grams are
    // too common for a plain inverted index).
    "q_dedup_ngram" -> ((s, d) => {
      val thr = 0.8
      val docs = Tables.documents(s, d)
        .withColumn("nt", norm(col("text")))
        .withColumn("grams", array_distinct(transform(
          sequence(lit(0), length(col("nt")) - 3),
          i => col("nt").substr(lit(1) + i, lit(3)))))
        .select(col("doc_id"), col("grams"), size(col("grams")).as("sz"))
      // Lossless prefix length sz - ceil(t*sz) + 1; the 1e-9 guards the
      // FP product (e.g. floor(5 * (1-0.8)) = 0 in doubles).
      val prefixLen =
        (col("sz") - ceil(col("sz") * thr - lit(1e-9)) + 1).cast("int")
      val prefixed = docs.withColumn("sorted",
          array_sort(transform(col("grams"),
            g => struct(xxhash64(g).as("h"), g.as("g")))))
        .withColumn("prefix", transform(
          slice(col("sorted"), lit(1), prefixLen),
          x => x.getField("g")))
      val ex = prefixed.select(col("doc_id"), col("sz"),
        explode(col("prefix")).as("pg"))
      val cand = ex.alias("a")
        .join(ex.alias("b"),
          col("a.pg") === col("b.pg") && col("a.doc_id") < col("b.doc_id") &&
            // size prune: J >= t requires min/max size ratio >= t
            least(col("a.sz"), col("b.sz")).cast("double") /
              greatest(col("a.sz"), col("b.sz")) >= thr)
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .distinct()
      cand
        .join(docs.select(col("doc_id").as("d1"), col("grams").as("g1"),
          col("sz").as("sz1")), "d1")
        .join(docs.select(col("doc_id").as("d2"), col("grams").as("g2"),
          col("sz").as("sz2")), "d2")
        .withColumn("inter", size(array_intersect(col("g1"), col("g2"))))
        .withColumn("jacc", round(col("inter").cast("double") /
          (col("sz1") + col("sz2") - col("inter")), 6))
        .filter(col("jacc") >= thr)
        .select(col("d1"), col("d2"), col("jacc"))
        .orderBy(col("d1"), col("d2"))
    }),

    // -- near-dup: MinHash + LSH banding (no oracle: murmur3-seeded) -------
    "q_dedup_minhash" -> ((s, d) => {
      TextDedup.minHashLshPairs(
          Tables.documents(s, d).select(col("doc_id"), col("text")),
          numPerms = 16, bands = 4, threshold = 0.7)
        .orderBy(col("d1"), col("d2"))
    }),

    // -- near-dup: SimHash + chunk blocking (no oracle: xxhash64-based) ----
    "q_dedup_simhash" -> ((s, d) => {
      TextDedup.simHashPairs(
          Tables.documents(s, d).select(col("doc_id"), col("text")),
          maxHamming = 3)
        .orderBy(col("d1"), col("d2"))
    })
  )

  def oracle: Map[String, String] = {
    val normSql = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
    Map(
      "q_text_stats" ->
        """SELECT doc_id, lang,
          |  length(text) AS n_chars_calc,
          |  n_chars = length(text) AS n_chars_ok,
          |  len(string_split(text, ' ')) AS n_tokens,
          |  len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
          |  round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
          |    / len(string_split(text, ' ')), 6) AS ttr,
          |  round(CAST(length(text) - (len(string_split(text, ' ')) - 1)
          |    AS DOUBLE) / len(string_split(text, ' ')), 6) AS avg_word_len
          |FROM documents ORDER BY doc_id""".stripMargin,

      "q_quality_score" ->
        """SELECT doc_id, round((uniq_ratio + len_score) / 2.0, 6) AS score,
          |  round(uniq_ratio, 6) AS uniq_ratio,
          |  round(len_score, 6) AS len_score
          |FROM (SELECT doc_id,
          |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
          |      / len(string_split(text, ' ')) AS uniq_ratio,
          |    least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 50.0, 1.0)
          |      AS len_score
          |  FROM documents) t
          |WHERE round((uniq_ratio + len_score) / 2.0, 6) > 0.5
          |ORDER BY doc_id""".stripMargin,

      "q_token_count" ->
        """SELECT lang, count(*) AS n_docs,
          |  CAST(sum(len(string_split(text, ' '))) AS BIGINT)
          |    AS sum_ws_tokens,
          |  CAST(sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')))
          |    AS BIGINT) AS sum_bpe_tokens,
          |  round(avg(len(string_split(text, ' '))), 6) AS avg_ws_tokens
          |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

      "q_lang_id" ->
        """SELECT doc_id, lang, vr,
          |  CASE WHEN has_cjk THEN 'zh'
          |       WHEN vr >= 0.32 THEN 'en'
          |       WHEN vr >= 0.28 THEN 'es'
          |       ELSE 'other' END AS guess,
          |  (CASE WHEN has_cjk THEN 'zh'
          |        WHEN vr >= 0.32 THEN 'en'
          |        WHEN vr >= 0.28 THEN 'es'
          |        ELSE 'other' END) = lang AS agrees
          |FROM (SELECT doc_id, lang,
          |    round(CAST(len(regexp_extract_all(text, '[aeiou]')) AS DOUBLE)
          |      / length(text), 6) AS vr,
          |    len(regexp_extract_all(text, '[一-鿿]')) > 0 AS has_cjk
          |  FROM documents) t
          |ORDER BY doc_id""".stripMargin,

      "q_fingerprint" ->
        s"""SELECT doc_id, md5($normSql) AS doc_md5,
           |  list_min(list_transform(
           |    range(0, len(string_split($normSql, ' ')) - 4),
           |    i -> md5(array_to_string(
           |      string_split($normSql, ' ')[i+1:i+5], ' '))))
           |    AS min_shingle_md5
           |FROM documents ORDER BY doc_id""".stripMargin,

      "q_dedup_exact" ->
        s"""SELECT sha256($normSql) AS fp, min(doc_id) AS keep_id,
           |  count(*) AS n_copies
           |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin,

      "q_dedup_jaccard" ->
        """WITH t AS (SELECT doc_id,
          |    list_distinct(list_transform(
          |      range(0, greatest(len(string_split(text, ' ')) - 4, 1)),
          |      i -> array_to_string(string_split(text, ' ')[i+1:i+5], ' ')))
          |      AS toks
          |  FROM documents)
          |SELECT a.doc_id AS d1, b.doc_id AS d2,
          |  round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
          |    (len(a.toks) + len(b.toks)
          |     - len(list_intersect(a.toks, b.toks))), 6) AS jacc
          |FROM t a JOIN t b ON a.doc_id < b.doc_id
          |WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
          |    (len(a.toks) + len(b.toks)
          |     - len(list_intersect(a.toks, b.toks))) >= 0.7
          |ORDER BY d1, d2""".stripMargin,

      "q_dedup_ngram" ->
        """WITH n AS (SELECT doc_id,
          |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS nt
          |  FROM documents),
          |g AS (SELECT doc_id,
          |    list_distinct(list_transform(range(0, length(nt) - 2),
          |      i -> substring(nt, i + 1, 3))) AS grams
          |  FROM n)
          |SELECT d1, d2, jacc FROM (
          |  SELECT a.doc_id AS d1, b.doc_id AS d2,
          |    round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
          |      (len(a.grams) + len(b.grams)
          |       - len(list_intersect(a.grams, b.grams))), 6) AS jacc
          |  FROM g a JOIN g b ON a.doc_id < b.doc_id) t
          |WHERE jacc >= 0.8 ORDER BY d1, d2""".stripMargin
    )
  }
}
