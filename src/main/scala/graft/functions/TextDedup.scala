package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection primitives for document corpora:
  * exact word-set Jaccard (ground truth), MinHash+LSH banding, SimHash with
  * pigeonhole chunk blocking. SURVEY.md §2.2 "LLM-data-pipeline operators".
  *
  * Scale design:
  *  - `exactJaccardPairs` is the only O(n²) path and exists as the
  *    correctness oracle / last-mile verifier; its cross join carries a
  *    size-ratio pre-filter that is implied by the Jaccard threshold, so
  *    most pairs are discarded before any array intersection.
  *  - `minHashLshPairs` is the 100 TB path: cost is O(n · perms) for
  *    signatures plus a shuffle join on (band, bandHash) buckets — no
  *    quadratic blow-up. Candidates are verified with exact Jaccard, so
  *    precision is 1.0 and only recall depends on the band/row choice.
  *  - `simHashPairs` blocks on 16-bit chunks of the 64-bit signature: by
  *    pigeonhole, any pair within Hamming distance 3 shares at least one
  *    of the 4 chunks, so the blocked join is lossless for maxHamming <= 3.
  */
object TextDedup {

  /** Distinct 5-word shingles — the discriminative unit for near-dup
    * detection (unigram sets saturate on a small vocabulary). Represented
    * as sorted 64-bit hashes (NativeExpressions.SortedDistinctShingleHashes)
    * rather than strings: one native pass per doc instead of an
    * interpreted transform/slice/concat pipeline, and every downstream
    * join/intersection compares longs. Set cardinalities — and therefore
    * every Jaccard value — are unchanged barring a 64-bit collision
    * inside a single pair's union (~1e-14). */
  private def toks(c: Column): Column =
    org.apache.spark.sql.graft.NativeExpressions
      // normalize BEFORE shingling (lowercase, trim, collapse whitespace):
      // dedup must treat case/spacing variants as duplicates, and the
      // DuckDB twin (OracleHash.shingleCtes) shingles normalized text —
      // hashing raw bytes here would only coincidentally agree on a
      // pre-normalized corpus
      // explicit whitespace class (== Java's \s): Java \s matches VT
      // (U+000B) but RE2's \s does not, so a bare \s+ here would diverge
      // from the DuckDB twin on any corpus containing a VT character
      .shingleHashes(
        encode(regexp_replace(lower(trim(c)), "[ \\t\\n\\f\\r\\x0B]+", " "),
          "UTF-8"), lit(5))

  /** Public accessor for the 5-word shingle hash set — shared with the
    * decontamination / dup-cluster pipeline operators so every shingle
    * consumer agrees on one representation. */
  def wordShingles(c: Column): Column = toks(c)

  /** Exact all-pairs word-set Jaccard >= threshold. Columns: d1, d2, jacc.
    *
    * Implemented as an inverted-index join, NOT a cross join: explode
    * shingles, self-join on the shingle, count shared shingles per pair.
    * Only pairs with >= 1 common shingle are ever materialized — pairs
    * with zero intersection have Jaccard 0 and can't pass any positive
    * threshold, so the result is exactly the all-pairs answer. Cost is
    * sum over shingles of (docs-per-shingle choose 2): near-linear on
    * real corpora where 5-word shingles are discriminative, vs O(n²)
    * for the cross join. The size-ratio prune (implied by J >= t)
    * discards most candidates before the per-pair aggregate.
    */
  def exactJaccardPairs(docs: DataFrame, threshold: Double): DataFrame = {
    // Pairs with zero shared shingles are never materialized, so the
    // inverted-index rewrite equals all-pairs only for positive thresholds
    // (and the size-ratio prune divides meaningfully only then).
    require(threshold > 0, "threshold must be positive")
    // Repartition before shingling: the corpus is often a single parquet
    // split locally, and the per-doc shingle transform must parallelize.
    val t = docs.repartition(
      docs.sparkSession.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), toks(col("text")).as("toks"))
      .withColumn("sz", size(col("toks")))
    val ex = t.select(col("doc_id"), col("sz"),
      explode(col("toks")).as("tok"))
    val jaccRaw = col("inter").cast("double") /
      (col("sz1") + col("sz2") - col("inter"))
    ex.alias("a")
      .join(ex.alias("b"),
        col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
      // implied by J >= t: min/max size ratio must reach t — cheap prune
      .filter(least(col("a.sz"), col("b.sz")).cast("double") /
        greatest(col("a.sz"), col("b.sz")) >= threshold)
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        col("a.sz").as("sz1"), col("b.sz").as("sz2"))
      .agg(count(lit(1)).as("inter"))
      .filter(jaccRaw >= threshold)
      .select(col("d1"), col("d2"), round(jaccRaw, 6).as("jacc"))
  }

  /** MinHash signatures (`numPerms` murmur3 permutations) + LSH banding,
    * then exact-Jaccard verification of candidates (precision 1.0).
    * Columns: d1, d2, jacc.
    */
  def minHashLshPairs(docs: DataFrame, numPerms: Int, bands: Int,
                      threshold: Double): DataFrame = {
    require(numPerms % bands == 0, "bands must divide numPerms")
    val rows = numPerms / bands
    // whole signature in one narrow pass per doc (no explode, no
    // numPerms-column min aggregate)
    val sigs = docs.repartition(
      docs.sparkSession.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"),
        org.apache.spark.sql.graft.NativeExpressions
          .minHashSignature(toks(col("text")), lit(numPerms)).as("sig"))
    // band j's bucket key is its `rows` consecutive minhashes verbatim —
    // raw-slice equality is what xxhash64(slice) approximated, and it is
    // oracle-replicable (the DuckDB twin regenerates the same slices).
    // At cluster scale the wider key costs rows*8 bytes per bucket row in
    // the shuffle; hash it back down only if that ever dominates.
    val bandCols = (0 until bands).map { j =>
      struct(lit(j).as("band"),
        slice(col("sig"), j * rows + 1, rows).as("bh"))
    }
    val buckets = sigs
      .select(col("doc_id"), explode(array(bandCols: _*)).as("b"))
      .select(col("doc_id"), col("b.band"), col("b.bh"))
    val cand = buckets.alias("x")
      .join(buckets.alias("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
      .distinct()
    // verify candidates with exact Jaccard → zero false positives
    val t = docs.repartition(
      docs.sparkSession.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), toks(col("text")).as("toks"))
      .withColumn("sz", size(col("toks")))
    val jaccRaw = col("inter").cast("double") /
      (col("sz1") + col("sz2") - col("inter"))
    cand
      .join(t.select(col("doc_id").as("d1"), col("toks").as("t1"),
        col("sz").as("sz1")), "d1")
      .join(t.select(col("doc_id").as("d2"), col("toks").as("t2"),
        col("sz").as("sz2")), "d2")
      .withColumn("inter", size(array_intersect(col("t1"), col("t2"))))
      .filter(jaccRaw >= threshold)
      .select(col("d1"), col("d2"), round(jaccRaw, 6).as("jacc"))
  }

  /** 64-bit SimHash per document over xxhash64(token), candidate pairs with
    * Hamming distance <= maxHamming found via 4×16-bit chunk blocking
    * (lossless for maxHamming <= 3). Columns: d1, d2, hamming.
    */
  def simHashPairs(docs: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming <= 3, "chunk blocking is lossless only for <= 3")
    // per-doc signature in one narrow pass (no explode, no 64-column
    // conditional aggregate)
    val sigs = docs.repartition(
      docs.sparkSession.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), org.apache.spark.sql.graft.NativeExpressions
        .simHash64(toks(col("text"))).as("sh"))
    // block on 16-bit chunks: hamming<=3 pairs share >=1 exact chunk
    val chunks = sigs.select(col("doc_id"), col("sh"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("c"),
          expr(s"(sh >> ${c * 16}) & 65535").as("cv"))): _*)).as("ch"))
      .select(col("doc_id"), col("sh"), col("ch.c"), col("ch.cv"))
    chunks.alias("x")
      .join(chunks.alias("y"),
        col("x.c") === col("y.c") && col("x.cv") === col("y.cv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
        bit_count(col("x.sh").bitwiseXOR(col("y.sh"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
