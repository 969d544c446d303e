package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from Spark's
  * higher-order functions so everything stays inside codegen (no UDFs).
  * SURVEY.md §2.2 "Similarity search".
  *
  * All arithmetic is done in double (after an explicit cast) with
  * sequential left-to-right folds, which makes results bit-reproducible
  * across engines and partitionings — required for the DuckDB oracle.
  */
object Vectors {

  /** Cast to array<double> (float math would drift vs the oracle). */
  def asDouble(a: Column): Column = a.cast("array<double>")

  /** Sequential-fold dot product of two equal-length vectors. Backed by a
    * codegen'd native expression (NativeExpressions.DotProductDouble): the
    * HOF formulation `aggregate(zip_with(...))` evaluates interpreted at
    * ~50µs/call, which dominates any pairwise similarity join. Same
    * left-to-right FP order, so results are unchanged bit-for-bit. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.NativeExpressions.dot(a, b)

  /** Squared L2 norm. */
  def sqNorm(a: Column): Column = dot(a, a)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(sqNorm(a))

  /** Cosine similarity (not assuming unit-normalized inputs). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** All-pairs cosine mining over a points table that has an `id` column,
    * a `v` array<double> column, and any extra per-point columns. Norms
    * are computed once per point BEFORE the pair join (recomputing them
    * per pair triples the fold work — measured 3× slower). Output: every
    * input column twice, suffixed `_1`/`_2` (id_1 < id_2), plus raw
    * `cos_raw >= threshold`. Intentionally O(n²): kept ONLY as the
    * recall baseline for [[ivfBlockedPairs]] in VectorSpec — no declared
    * query uses it (a full-corpus cross join cannot ship at 100 TB). */
  def cosinePairs(points: org.apache.spark.sql.DataFrame,
                  threshold: Double): org.apache.spark.sql.DataFrame = {
    val n = points.withColumn("nrm", norm(col("v")))
    def side(suffix: String) =
      n.select(n.columns.map(c => col(c).as(s"$c$suffix")).toSeq: _*)
    side("_1").join(side("_2"), col("id_1") < col("id_2"))
      .withColumn("cos_raw",
        dot(col("v_1"), col("v_2")) / (col("nrm_1") * col("nrm_2")))
      .filter(col("cos_raw") >= threshold)
  }

  /** IVF-blocked threshold pair mining — the scale path that replaces the
    * all-pairs cross join. Every vector is assigned to its `nprobe`
    * nearest of `nlist` deterministic centroids (the nlist lowest-id
    * vectors; no iterative k-means, so a SQL oracle replicates the
    * blocking bit-for-bit — same trick as q_sim_ivf); only pairs sharing
    * a cell become candidates, and each candidate is verified with the
    * exact cosine, so precision is 1.0. Cost: O(n·nlist) assignment (the
    * centroid table broadcasts) + per-cell quadratic candidate work —
    * at scale nlist grows with the corpus (cells stay bounded), keeping
    * per-task work flat; cells shuffle-partition across the cluster.
    * Approximate by design: a qualifying pair sharing no probed cell is
    * missed. Recall vs [[cosinePairs]] is asserted in VectorSpec;
    * near-identical vectors (the dedup regime) rank their centroids
    * near-identically, so true near-dups share their top cell a.s.
    * Output: every input column twice (`_1`/`_2`, id_1 < id_2) + cos_raw.
    */
  /** The `nlist` deterministic centroids of a (id, v, nrm) frame: the
    * nlist lowest-id vectors (no iterative k-means, so a SQL oracle
    * replicates the set exactly). Output: (cid, cv, cnrm). */
  def ivfCentroids(n: org.apache.spark.sql.DataFrame, nlist: Int)
      : org.apache.spark.sql.DataFrame =
    n.orderBy(col("id")).limit(nlist)
      .select(col("id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))

  /** Assign each (id, v, nrm) row to its `nprobe` nearest centroids
    * (cosine, tie-break cid asc — the order the oracles replicate).
    * ONE implementation shared by [[ivfBlockedPairs]] and q_sim_ivf so
    * the oracle-pinned blocking cannot drift between the two paths.
    * Output: (id, cid). */
  def ivfAssign(pts: org.apache.spark.sql.DataFrame,
                cents: org.apache.spark.sql.DataFrame, nprobe: Int)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wAssign = Window.partitionBy(col("id"))
      .orderBy(col("csim").desc, col("cid").asc)
    pts.select(col("id"), col("v"), col("nrm"))
      .crossJoin(broadcast(cents))
      .withColumn("csim",
        dot(col("v"), col("cv")) / (col("nrm") * col("cnrm")))
      .withColumn("arn", row_number().over(wAssign))
      .filter(col("arn") <= nprobe)
      .select(col("id"), col("cid"))
  }

  /** TWO-LEVEL coarse-quantized assignment — the scale replacement for
    * the flat [[ivfAssign]] scan. A flat scan costs O(nlist) dots per
    * point, and with nlist = n/64 (bounded cells) that is O(n²/64)
    * asymptotically — the r8 audit flagged it on q_semdedup and the r9
    * probe measured the fix at 9.4× → 1.9× per 10× corpus. Structure:
    * the ceil(√nlist) lowest-id vectors form level-1 cells; each fine
    * centroid belongs to its nearest level-1 cell; a point finds its
    * nearest level-1 cell (√nlist dots) and argmins over that cell's
    * fine centroids (~√nlist on average) — O(√nlist) per point, and
    * deriveNlist's 65536 cap bounds per-point work at 2·256 dots ever.
    * Every level-1 cell is nonempty (a level-1 centroid is its own
    * nearest fine centroid). `nprobe` > 1 takes the top-nprobe fine
    * centroids WITHIN the point's level-1 cell (the cross-cell
    * runner-up is sacrificed — that is the approximation the oracles
    * replicate). Deterministic throughout: lowest-id centroid sets,
    * csim-desc/cid-asc tie-breaks, same left-to-right FP dot fold.
    * Output: (id, cid). */
  /** The two-level index: level-1 cells plus the fine-centroid→cell map,
    * both derived from the CORPUS (so probing a query subset still
    * searches the corpus's cells). Both tables broadcast downstream. */
  case class Ivf2Index(l1C: org.apache.spark.sql.DataFrame,
                       fineWithL1: org.apache.spark.sql.DataFrame)

  def ivfIndex2(corpus: org.apache.spark.sql.DataFrame, nlist: Int)
      : Ivf2Index = {
    import org.apache.spark.sql.expressions.Window
    // Session-memoized (SharedArtifacts): the whole ANN family
    // (q_sim_ivf/q_hard_negatives/q_semdedup/q_ann_recall/q_ivf_balance/
    // q_knn_triangles_ann) searches ONE index — build its tables once
    // per (corpus plan, nlist) per session, as a production deployment
    // would, instead of once per query. Deterministic build (lowest-id
    // centroid sets, fixed tie-breaks), so a hit is bit-identical.
    val kb = graft.engine.SharedArtifacts.keyFor(corpus, "ivf2", nlist)
    val m1 = math.ceil(math.sqrt(nlist.toDouble)).toInt
    val l1C = graft.engine.SharedArtifacts.memo(kb + "|l1") {
      ivfCentroids(corpus, m1)
        .select(col("cid").as("l1"), col("cv").as("l1v"),
          col("cnrm").as("l1nrm"))
    }
    val fineWithL1 = graft.engine.SharedArtifacts.memo(kb + "|fine") {
      val fineC = ivfCentroids(corpus, nlist)
      val wF = Window.partitionBy(col("cid"))
        .orderBy(col("l1sim").desc, col("l1").asc)
      fineC.crossJoin(broadcast(l1C))
        .withColumn("l1sim",
          dot(col("cv"), col("l1v")) / (col("cnrm") * col("l1nrm")))
        .withColumn("frn", row_number().over(wF))
        .filter(col("frn") === 1)
        .select(col("l1"), col("cid"), col("cv"), col("cnrm"))
    }
    Ivf2Index(l1C, fineWithL1)
  }

  def ivfAssign2(pts: org.apache.spark.sql.DataFrame, idx: Ivf2Index,
                 nprobe: Int): org.apache.spark.sql.DataFrame =
    ivfAssign2Sim(pts, idx, nprobe).select(col("id"), col("cid"))

  /** As [[ivfAssign2]] but keeps the point payload and the fine-centroid
    * similarity — output (id, v, nrm, cid, csim) — for consumers whose
    * keep rule needs the centroid distance (q_semdedup's
    * keep-least-central) or that verify pairs right after assignment.
    * ONE implementation (ivfAssign2 is a projection of this) so the
    * oracle-pinned two-level blocking cannot drift between callers. */
  def ivfAssign2Sim(pts: org.apache.spark.sql.DataFrame, idx: Ivf2Index,
                    nprobe: Int): org.apache.spark.sql.DataFrame =
    // Memoized like the index itself: the corpus-side assignment is the
    // expensive half (n × O(√nlist) dots) and is identical across every
    // family member that assigns the same frame at the same nprobe.
    graft.engine.SharedArtifacts.memo(
      graft.engine.SharedArtifacts.keyFor(pts, "asg2", nprobe,
        idx.fineWithL1.semanticHash())) {
      ivfAssign2SimBuild(pts, idx, nprobe)
    }

  private def ivfAssign2SimBuild(pts: org.apache.spark.sql.DataFrame,
                                 idx: Ivf2Index, nprobe: Int)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wL1 = Window.partitionBy(col("id"))
      .orderBy(col("l1sim").desc, col("l1").asc)
    val ptsL1 = pts.select(col("id"), col("v"), col("nrm"))
      .crossJoin(broadcast(idx.l1C))
      .withColumn("l1sim",
        dot(col("v"), col("l1v")) / (col("nrm") * col("l1nrm")))
      .withColumn("prn", row_number().over(wL1))
      .filter(col("prn") === 1)
      .select(col("id"), col("v"), col("nrm"), col("l1"))
    val wA = Window.partitionBy(col("id"))
      .orderBy(col("csim").desc, col("cid").asc)
    ptsL1.join(broadcast(idx.fineWithL1), "l1")
      .withColumn("csim",
        dot(col("v"), col("cv")) / (col("nrm") * col("cnrm")))
      .withColumn("arn", row_number().over(wA))
      .filter(col("arn") <= nprobe)
      .select(col("id"), col("v"), col("nrm"), col("cid"), col("csim"))
  }

  /** IVF list count derived from corpus size: ceil(n/64) clamped to
    * [16, 65536] — cells hold a BOUNDED ~64 vectors, so in-cell
    * quadratic candidate work is ~32·n pairs, linear in the corpus.
    *
    * The previous ceil(√n) derivation made cells themselves √n-sized:
    * total candidates n^1.5, measured as 38× runtime at 10× corpus in
    * the sf1 probe (PERF.md "sf1 scale probe") — exactly the 10^1.5
    * prediction. A fixed cell target trades a little recall headroom
    * (denser centroid grid, same nprobe=2 boundary coverage) for the
    * linear scan path; VectorsSpec's precision/recall gates still hold.
    * Integer arithmetic only, so the DuckDB twins derive the identical
    * value with (count(*) + 63) // 64 in SQL. */
  def deriveNlist(n: Long): Int =
    math.max(16L, math.min(65536L, (n + 63L) / 64L)).toInt

  /** Corpus-cardinality ceiling for EXACT blocked kNN (the
    * q_knn_triangles path). Exact kNN is O(n²) dot products BY CONTRACT
    * — at/below the ceiling that is ~1.7e10 dots (minutes on one node,
    * seconds on a cluster) and exactness is worth it (ground truth,
    * recall gates); above it the sanctioned path is the recall-gated
    * two-level IVF graph (q_knn_triangles_ann), whose candidate volume
    * is ~2·celldepth per vector — linear in n. Same promoted-dispatch
    * discipline as [[graft.functions.TextDedup.ExactPairsMaxDocs]]:
    * one constant, one pure chooser, one dispatcher
    * (q_knn_triangles_auto), pinned by VectorsSpec. */
  val ExactKnnMaxVectors: Long = 131072L

  /** Pure path chooser (spec-pinned): "exact" at or under
    * [[ExactKnnMaxVectors]] vectors, "ivf-ann" above. */
  def knnPathFor(n: Long): String =
    if (n <= ExactKnnMaxVectors) "exact" else "ivf-ann"

  def ivfBlockedPairs(points: org.apache.spark.sql.DataFrame,
                      threshold: Double, nlist: Int, nprobe: Int)
      : org.apache.spark.sql.DataFrame = {
    val n = points.withColumn("nrm", norm(col("v")))
    // two-level assignment (r9): O(√nlist) dots per point, not O(nlist)
    val asg = ivfAssign2(n, ivfIndex2(n, nlist), nprobe)
    // pairs sharing >= 1 probed cell; distinct because a pair can share 2
    val cand = asg.alias("x")
      .join(asg.alias("y"),
        col("x.cid") === col("y.cid") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_1"), col("y.id").as("id_2"))
      .distinct()
    def side(suffix: String) =
      n.select(n.columns.map(c => col(c).as(s"$c$suffix")).toSeq: _*)
    cand.join(side("_1"), "id_1").join(side("_2"), "id_2")
      .withColumn("cos_raw",
        dot(col("v_1"), col("v_2")) / (col("nrm_1") * col("nrm_2")))
      .filter(col("cos_raw") >= threshold)
  }

  /** Deterministic ±1 pseudo-random hyperplane component for LSH: parity
    * of splitmix64(plane*4096 + dim) — pure 64-bit arithmetic, so a SQL
    * oracle regenerates identical signs (murmur3 would be
    * engine-specific). Assumes dim < 4096 (embedding dims here are 64). */
  def hyperplaneSign(plane: Int, dim: Column): Column =
    when(org.apache.spark.sql.graft.NativeExpressions
        .splitmix64(lit(plane.toLong * 4096L) + dim.cast("long"))
        .bitwiseAND(lit(1L)) === 0, lit(1.0))
      .otherwise(lit(-1.0))

  /** `bits`-bit random-hyperplane LSH signature of a vector: bit k is the
    * sign of the projection onto deterministic hyperplane k.
    *
    * The signs depend only on (plane, dim), so they are precomputed
    * driver-side (same splitmix64 parity as [[hyperplaneSign]]) and each
    * projection is one codegen'd native dot product against a constant
    * array — the previous HOF fold evaluated ~bits×dims interpreted
    * expressions per row (~1 ms/row at 16×64). The native dot uses the
    * same left-to-right FP fold, so signatures are bit-unchanged and the
    * DuckDB oracle still regenerates them exactly. `maxDims` bounds the
    * sign table; vectors longer than it fail the dot's length check. */
  def rhpSignature(v: Column, bits: Int, maxDims: Int = 64): Column = {
    val proj = (0 until bits).map { k =>
      val signs = Array.tabulate(maxDims) { j =>
        val h = org.apache.spark.sql.graft.NativeExpressions
          .splitmix64Long(k.toLong * 4096L + j)
        if ((h & 1L) == 0L) 1.0 else -1.0
      }
      val p = dot(v, slice(typedlit(signs.toSeq), lit(1), size(v)))
      when(p > 0, lit(1L << k)).otherwise(0L)
    }
    proj.reduce(_.bitwiseOR(_))
  }
}
