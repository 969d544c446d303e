package graft.engine

/** DuckDB SQL text generators for the engine's portable hash family
  * (FNV-1a-64 shingle hashes, splitmix64 — see
  * org.apache.spark.sql.graft.NativeExpressions.mix64), letting the
  * MinHash/SimHash/RHP-LSH oracles regenerate bit-identical signatures.
  *
  * DuckDB integers trap on overflow, so every wrapping 64-bit op is
  * emulated in HUGEINT and reduced mod 2^64; the wrapping multiply splits
  * the left operand at 2^32 so no intermediate exceeds ~2^97. The
  * splitmix64 chain is staged across subquery projections (z1 → z2 → z3)
  * rather than one nested expression — textual inlining of the full chain
  * would repeat each stage's operand twice per stage (8× blowup).
  *
  * Generated text is deliberately oracle-only: the Spark side uses the
  * native codegen'd expressions; this exists so CORRECTNESS rows for the
  * LSH family are hash-checked instead of `no_oracle`.
  */
object OracleHash {

  /** (a * b) mod 2^64 over UBIGINT-typed SQL expressions. */
  def u64mul(a: String, b: String): String =
    s"CAST(((($a)::HUGEINT % 4294967296) * ($b)::HUGEINT" +
      s" + ((($a)::HUGEINT // 4294967296) * ($b)::HUGEINT % 4294967296)" +
      s" * 4294967296) % 18446744073709551616 AS UBIGINT)"

  /** (a + b) mod 2^64 over UBIGINT-typed SQL expressions. */
  def u64add(a: String, b: String): String =
    s"CAST((($a)::HUGEINT + ($b)::HUGEINT) % 18446744073709551616 AS UBIGINT)"

  /** splitmix64's golden-gamma constant, as UBIGINT SQL. */
  val golden = "11400714819323198485::UBIGINT"

  /** FNV-1a-64 of an ASCII string expression `s` (matches
    * SortedDistinctShingleHashes' per-shingle byte hash — the corpus is
    * ASCII, so ord(char) == byte). `j` is the byte-index lambda variable:
    * callers nesting this inside another lambda must not reuse `j`. */
  def fnv1a64(s: String): String =
    s"list_reduce(list_prepend(14695981039346656037::UBIGINT," +
      s" list_transform(range(1, length($s)+1)," +
      s" j -> ord(substring($s, j, 1))::UBIGINT))," +
      s" (h, c) -> ${u64mul("xor(h, c)", "1099511628211::UBIGINT")})"

  /** CTE fragment `w, sh` producing (doc_id, toks): distinct FNV-1a-64
    * hashes of each document's 5-word shingles over normalized text —
    * the DuckDB twin of `TextDedup.toks`. Compose as
    * s"WITH $shingleCtes, ...". */
  /** [[shingleCtes]] over an arbitrary source CTE/table with (doc_id,
    * text) — the panel-restricted recall monitors shingle a sampled
    * subset instead of the whole `documents` table. */
  def shingleCtesFrom(src: String): String = {
    // explicit class (== Java \s incl. VT \x0B): RE2's \s excludes VT,
    // Java's includes it — spelling the class keeps both engines identical
    val norm =
      "regexp_replace(lower(trim(text)), '[ \\t\\n\\f\\r\\x0B]+', ' ', 'g')"
    val shingleHash = fnv1a64("array_to_string(ws[(i+1):(i+5)], ' ')")
    s"""w AS (SELECT doc_id, string_split($norm, ' ') AS ws FROM $src),
       |sh AS (SELECT doc_id,
       |    list_distinct(list_transform(range(0, greatest(len(ws) - 4, 1)),
       |      i -> $shingleHash)) AS toks
       |  FROM w)""".stripMargin
  }

  val shingleCtes: String = shingleCtesFrom("documents")

  /** CTE fragment `w_, u, f, b, sc` — the hashed-linear-classifier
    * inference chain over `documents` (the SQL twin of
    * TextDedup.classifierScored): distinct-unigram FNV → bucket →
    * integer weight → per-`keep` (n_feats, score). Shared by the
    * q_quality_classifier and q_calibration oracles so the bucket/weight
    * formula cannot drift between them. */
  def classifierScoreCtes(keep: String): String = {
    val norm =
      "regexp_replace(lower(trim(text)), '[ \\t\\n\\f\\r\\x0B]+', ' ', 'g')"
    s"""w_ AS (SELECT $keep, string_split($norm, ' ') AS ws
       |  FROM documents),
       |u AS (SELECT $keep, list_distinct(list_transform(ws,
       |    tk -> ${fnv1a64("tk")})) AS toks
       |  FROM w_),
       |f AS (SELECT $keep, unnest(toks) AS h FROM u),
       |b AS (SELECT $keep,
       |    CAST((h >> 8) % 64::UBIGINT AS BIGINT) AS bkt FROM f),
       |sc AS (SELECT $keep, count(*) AS n_feats,
       |    CAST(sum(bkt % 13 - 6) AS BIGINT) AS score
       |  FROM b GROUP BY $keep)""".stripMargin
  }

  /** Scalar subquery for the derived IVF list count (the SQL twin of
    * Vectors.deriveNlist over the embeddings table). */
  val nlistSql: String =
    "(SELECT greatest(16, least(65536, (count(*) + 63) // 64))" +
      " FROM embeddings)"

  /** CTE fragment for the TWO-LEVEL IVF index (the SQL twin of
    * Vectors.ivfIndex2): fine centroids `c2_`, level-1 cells `l1_`, and
    * the fine→level-1 map `fl1_`, all derived from CTE `src` with
    * columns (`id`, vd, nrm). Compose with [[ivf2AssignCte]]. */
  def ivf2IndexCtes(src: String, id: String): String =
    s"""c2_ AS (SELECT $id AS cid, vd AS cv, nrm AS cnrm FROM (
       |    SELECT $id, vd, nrm, row_number() OVER (ORDER BY $id) AS crn
       |    FROM $src) t
       |  WHERE crn <= $nlistSql),
       |l1_ AS (SELECT $id AS l1, vd AS l1v, nrm AS l1nrm FROM (
       |    SELECT $id, vd, nrm, row_number() OVER (ORDER BY $id) AS crn
       |    FROM $src) t
       |  WHERE crn <= CAST(ceil(sqrt($nlistSql)) AS BIGINT)),
       |fl1_ AS (SELECT l1, cid, cv, cnrm FROM (
       |    SELECT l.l1, c.cid, c.cv, c.cnrm,
       |      row_number() OVER (PARTITION BY c.cid
       |        ORDER BY list_dot_product(c.cv, l.l1v) / (c.cnrm * l.l1nrm)
       |          DESC, l.l1 ASC) AS frn
       |    FROM c2_ c CROSS JOIN l1_ l) t WHERE frn = 1)""".stripMargin

  /** CTE pair assigning the rows of `src` (optionally filtered by
    * `pred`, e.g. " WHERE p.vec_id < 10") through the two-level index:
    * nearest level-1 cell first, then the top-`nprobe` fine centroids
    * WITHIN that cell — the SQL twin of Vectors.ivfAssign2. Emits
    * `pl1$name` and `$name` ($id, cid$extraCols); pass e.g.
    * `", vd, nrm, csim"` as `extraCols` to keep the point payload and
    * centroid similarity (the twin of Vectors.ivfAssign2Sim). */
  def ivf2AssignCte(name: String, src: String, id: String, pred: String,
                    nprobe: Int, extraCols: String = ""): String =
    s"""pl1$name AS (SELECT $id, vd, nrm, l1 FROM (
       |    SELECT p.$id, p.vd, p.nrm, l.l1,
       |      row_number() OVER (PARTITION BY p.$id
       |        ORDER BY list_dot_product(p.vd, l.l1v) / (p.nrm * l.l1nrm)
       |          DESC, l.l1 ASC) AS prn
       |    FROM $src p CROSS JOIN l1_ l$pred) t WHERE prn = 1),
       |$name AS (SELECT $id, cid$extraCols FROM (
       |    SELECT p.$id, p.vd, p.nrm, f.cid,
       |      list_dot_product(p.vd, f.cv) / (p.nrm * f.cnrm) AS csim,
       |      row_number() OVER (PARTITION BY p.$id
       |        ORDER BY list_dot_product(p.vd, f.cv) / (p.nrm * f.cnrm)
       |          DESC, f.cid ASC) AS arn
       |    FROM pl1$name p JOIN fl1_ f USING (l1)) t
       |  WHERE arn <= $nprobe)""".stripMargin

  /** CTE fragment staging splitmix64 of a seed expression available in
    * CTE `from` (with columns `keep`); emits CTEs `p1_, p2_, p3_` and the
    * final value is `xor(z3, z3 >> 31)` computed by the caller from p3_.
    */
  def splitmixStages(from: String, keep: String, seedExpr: String,
                     prefix: String = "p"): String = {
    val s1 = u64mul("xor(z1, z1 >> 30)", "13787848793156543929::UBIGINT")
    val s2 = u64mul("xor(z2, z2 >> 27)", "10723151780598845931::UBIGINT")
    s"""${prefix}1_ AS (SELECT $keep, ${u64add(seedExpr, golden)} AS z1
       |  FROM $from),
       |${prefix}2_ AS (SELECT $keep, $s1 AS z2 FROM ${prefix}1_),
       |${prefix}3_ AS (SELECT $keep, $s2 AS z3 FROM ${prefix}2_)""".stripMargin
  }
}
