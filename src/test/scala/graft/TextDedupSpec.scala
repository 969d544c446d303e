package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextDedup

/** Near-dup primitives (graft/functions/TextDedup.scala) on a corpus with
  * planted duplicates: exact Jaccard is the ground truth; MinHash-LSH must
  * have precision 1.0 (verified candidates) and catch exact copies;
  * SimHash chunk blocking must catch hamming-0 pairs.
  */
class TextDedupSpec extends AnyFunSuite {
  import SparkFixture.spark
  import spark.implicits._

  // 12-word docs: 0 and 1 identical; 2 shares a 7-word prefix with 0
  // (near-dup); 3 unrelated.
  private val base = "alpha bravo charlie delta echo foxtrot golf " +
    "hotel india juliet kilo lima"
  private lazy val docs = Seq(
    (0L, base),
    (1L, base),
    (2L, "alpha bravo charlie delta echo foxtrot golf mike november " +
      "oscar papa quebec"),
    (3L, "one two three four five six seven eight nine ten eleven twelve")
  ).toDF("doc_id", "text")

  private lazy val exact =
    TextDedup.exactJaccardPairs(docs, 0.2)
      .select($"d1", $"d2", $"jacc").as[(Long, Long, Double)]
      .collect().toSeq

  test("exact Jaccard: identical docs score 1.0") {
    assert(exact.contains((0L, 1L, 1.0)))
  }

  test("exact Jaccard: near-dup found, unrelated doc excluded") {
    // docs 0 and 2 share shingles from the 7-word common prefix
    assert(exact.exists(p => p._1 == 0L && p._2 == 2L && p._3 > 0.2))
    assert(!exact.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("MinHash-LSH: subset of exact pairs (precision 1.0) incl. the copy") {
    val lsh = TextDedup.minHashLshPairs(docs, numPerms = 16, bands = 4,
      threshold = 0.2)
      .select($"d1", $"d2").as[(Long, Long)].collect().toSet
    val exactKeys = exact.map(p => (p._1, p._2)).toSet
    assert(lsh.subsetOf(exactKeys), s"false positives: ${lsh -- exactKeys}")
    // identical docs have identical signatures -> always a candidate
    assert(lsh.contains((0L, 1L)))
  }

  test("scale dispatcher: exact at/under the ceiling, MinHash-LSH above; auto equals exact here") {
    // The PERF.md dispatch rule as code (TextDedup.dedupPathFor): the
    // switchover constant and the chooser are pinned so the rule can't
    // silently drift, and jaccardPairsAuto on a small corpus must emit
    // the exact miner's answer bit-for-bit.
    assert(TextDedup.dedupPathFor(1L) == "exact")
    assert(TextDedup.dedupPathFor(TextDedup.ExactPairsMaxDocs) == "exact")
    assert(TextDedup.dedupPathFor(TextDedup.ExactPairsMaxDocs + 1)
      == "minhash-lsh")
    val auto = TextDedup.jaccardPairsAuto(docs, 0.2)
      .select($"d1", $"d2", $"jacc").as[(Long, Long, Double)]
      .collect().toSeq.sorted
    assert(auto == exact.sorted,
      s"auto (exact branch) diverged from exactJaccardPairs: $auto")
  }

  test("q_dedup_substr: brute-force span replay on the real corpus (sf0.001)") {
    // Independent replay of the gaps-and-islands stitch: take the SAME
    // positional shingle hashes (the kernel is pinned by
    // NativeExpressionsSpec), recompute recurring-set membership and
    // maximal runs in plain Scala, and compare all four per-doc stats.
    import org.apache.spark.sql.functions.col
    val d = SparkFixture.sfDir
    val hs = graft.engine.Tables.documents(spark, d)
      .select(col("doc_id"), TextDedup.wordShinglesSeq(col("text")).as("hs"))
      .as[(Long, Seq[Long])].collect().toSeq
    val docCount = hs.flatMap { case (id, s) => s.distinct.map(h => (h, id)) }
      .groupBy(_._1).map { case (h, xs) => (h, xs.map(_._2).distinct.size) }
    val recurring = docCount.filter(_._2 >= 2).keySet
    val expected = hs.flatMap { case (id, s) =>
      val marked = s.zipWithIndex.collect {
        case (h, p) if recurring(h) => p.toLong
      }
      // maximal runs of consecutive positions
      val runs = marked.foldLeft(List.empty[(Long, Long)]) {
        case ((st, en) :: rest, p) if p == en + 1 => (st, p) :: rest
        case (acc, p) => (p, p) :: acc
      }.map { case (st, en) => (st, en - st + 1 + 4) }
        .filter(_._2 >= 15L)
      if (runs.isEmpty) Nil
      else Seq((id, runs.size.toLong, runs.map(_._2).sum,
        runs.map(_._2).max, runs.map(_._1).min))
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_dedup_substr")(spark, d)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected, s"span replay mismatch:\n$got\nvs\n$expected")
    assert(got.nonEmpty, "corpus has planted copies; spans expected")
  }

  test("ngram scale dispatcher: auto equals the exact size-banded miner here") {
    // VERDICT r11 item 3: q_dedup_ngram_auto rides the same
    // dedupPathFor chooser (pinned above); on a corpus under the
    // ceiling it must emit q_dedup_ngram's exact answer bit-for-bit.
    val d = SparkFixture.sfDir
    val auto = SparkEntry.queries("q_dedup_ngram_auto")(spark, d)
      .as[(Long, Long, Double)].collect().toSeq
    val exactNg = SparkEntry.queries("q_dedup_ngram")(spark, d)
      .as[(Long, Long, Double)].collect().toSeq
    assert(auto == exactNg,
      "auto (exact branch) diverged from q_dedup_ngram")
  }

  test("native 3-shingle distinct count equals the interpreted trigram pipeline") {
    // q_repetition_ratio's rewrite contract: size(shingleHashes(text, 3))
    // must agree with the transform/slice/concat trigram formulation,
    // including the clamped trailing partials and sub-3-word docs
    import org.apache.spark.sql.functions._
    val norm = regexp_replace(lower(trim(col("text"))), "\\s+", " ")
    val toks = split(norm, " ")
    val tris = transform(
      sequence(lit(0), greatest(size(toks) - 3, lit(0))),
      i => concat_ws(" ", slice(toks, i + 1, lit(3))))
    val mismatches = graft.engine.Tables.documents(spark, SparkFixture.sfDir)
      .select(col("doc_id"),
        size(array_distinct(tris)).as("hof"),
        size(org.apache.spark.sql.graft.NativeExpressions
          .shingleHashes(encode(norm, "UTF-8"), lit(3))).as("native"))
      .filter(col("hof") =!= col("native"))
      .count()
    assert(mismatches == 0)
  }

  test("prefix filter is lossless: equals brute-force all-pairs on the corpus") {
    // the prefix-filter lemma (see exactJaccardPairs doc) claims NO
    // qualifying pair is pruned; compare against an O(n²) cross-join
    // ground truth on the real sf0.001 corpus, not just planted dups
    import org.apache.spark.sql.functions._
    val corpus = graft.engine.Tables.documents(spark, SparkFixture.sfDir)
      .select($"doc_id", $"text")
    val got = TextDedup.exactJaccardPairs(corpus, 0.3)
      .select($"d1", $"d2", $"jacc").as[(Long, Long, Double)]
      .collect().toSet
    val t = corpus.select($"doc_id",
      TextDedup.wordShingles($"text").as("toks"))
    val brute = t.alias("a").crossJoin(t.alias("b"))
      .filter($"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"),
        (size(array_intersect($"a.toks", $"b.toks")).cast("double") /
          size(array_union($"a.toks", $"b.toks"))).as("raw"))
      .filter($"raw" >= 0.3)
      .select($"d1", $"d2", round($"raw", 6).as("jacc"))
      .as[(Long, Long, Double)].collect().toSet
    assert(got == brute,
      s"missing: ${brute -- got}; extra: ${got -- brute}")
  }

  test("containment: planted quote found, one-sided prefix filter lossless on the corpus") {
    import org.apache.spark.sql.functions._
    // planted: doc 11 is a verbatim 20-word excerpt of doc 10 — its
    // symmetric Jaccard vs the 60-word source is far below any dedup
    // threshold, but containment(11 in 10) must be ~1
    val words = (0 until 60).map(i => s"w$i")
    val quote = docs.sparkSession.createDataFrame(java.util.Arrays.asList(
      org.apache.spark.sql.Row(10L, words.mkString(" ")),
      org.apache.spark.sql.Row(11L, words.slice(20, 40).mkString(" ")),
      org.apache.spark.sql.Row(12L, (0 until 30).map(i => s"z$i").mkString(" "))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType, nullable = false))))
    val planted = TextDedup.containmentPairs(quote, 0.8)
      .select($"d_in", $"d_of", $"containment")
      .as[(Long, Long, Double)].collect().toSet
    assert(planted.exists(p => p._1 == 11L && p._2 == 10L && p._3 == 1.0),
      s"planted quote not found: $planted")
    assert(!planted.exists(p => p._1 == 12L || p._2 == 12L))
    assert(!planted.exists(p => p._1 == 10L && p._2 == 11L),
      "the 60-word source cannot be contained in its 20-word excerpt")
    // losslessness on the real corpus: equals brute-force ordered pairs
    val corpus = graft.engine.Tables.documents(spark, SparkFixture.sfDir)
      .select($"doc_id", $"text")
    val got = TextDedup.containmentPairs(corpus, 0.8)
      .select($"d_in", $"d_of", $"containment")
      .as[(Long, Long, Double)].collect().toSet
    val t = corpus.select($"doc_id", TextDedup.wordShingles($"text").as("toks"))
    val brute = t.alias("a").crossJoin(t.alias("b"))
      .filter($"a.doc_id" =!= $"b.doc_id")
      .select($"a.doc_id".as("d_in"), $"b.doc_id".as("d_of"),
        (size(array_intersect($"a.toks", $"b.toks")).cast("double") /
          size($"a.toks")).as("raw"))
      .filter($"raw" >= 0.8)
      .select($"d_in", $"d_of", round($"raw", 6).as("containment"))
      .as[(Long, Long, Double)].collect().toSet
    assert(got == brute, s"missing: ${brute -- got}; extra: ${got -- brute}")
  }

  test("q_contain_keep verdicts are consistent with the q_dedup_contain pair set") {
    import SparkFixture.sfDir
    val verdicts = SparkEntry.queries("q_contain_keep")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    val total = graft.engine.Tables.documents(spark, sfDir).count()
    assert(verdicts.length == total, "every doc needs a verdict")
    val pairs = SparkEntry.queries("q_dedup_contain")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sz = verdicts.map(v => v._1 -> v._2).toMap
    // culled ⟺ some strictly-larger (or equal-size lower-id) container
    // exists in the mined pair set, and the witness is one of them
    verdicts.foreach { case (id, _, kept, witness) =>
      val containers = pairs.filter(_._1 == id).map(_._2)
        .filter(c => sz(c) > sz(id) || (sz(c) == sz(id) && c < id))
      assert(kept == containers.isEmpty, s"doc $id verdict inconsistent")
      witness.foreach(w => assert(containers.contains(w),
        s"doc $id witness $w not a valid container"))
    }
    assert(verdicts.exists(!_._3) && verdicts.exists(_._3),
      "fixture should contain both culled and kept docs")
  }

  test("SimHash: identical docs at hamming 0; self-pairs excluded") {
    val sh = TextDedup.simHashPairs(docs, maxHamming = 3)
      .select($"d1", $"d2", $"hamming").as[(Long, Long, Long)]
      .collect().toSeq
    assert(sh.contains((0L, 1L, 0L)))
    assert(sh.forall(p => p._1 < p._2))
    assert(sh.forall(_._3 <= 3))
  }

  test("q_dedup_lines: kept chunks are globally unique and an in-order subset of each doc") {
    import SparkFixture.sfDir
    val out = SparkEntry.queries("q_dedup_lines")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_kept"),
        r.getAs[String]("text_dedup")))
    assert(out.nonEmpty)
    val originals = graft.engine.Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    // every chunk survives at most once across the whole corpus
    val allKept = out.flatMap { case (_, _, t) =>
      t.split(" ").grouped(10).map(_.mkString(" "))
    }
    assert(allKept.distinct.length == allKept.length)
    // per doc: the kept text is the original's chunk sequence with
    // duplicates deleted (order preserved), and n_kept counts them
    out.foreach { case (id, nKept, t) =>
      val origChunks = originals(id).split(" ").grouped(10)
        .map(_.mkString(" ")).toSeq
      val kept = t.split(" ").grouped(10).map(_.mkString(" ")).toSeq
      assert(kept.size == nKept)
      assert(kept.forall(origChunks.contains),
        s"doc $id kept a chunk it never had")
      // order preserved: kept appears as a subsequence of origChunks
      val it = origChunks.iterator
      assert(kept.forall(c => it.contains(c)), s"doc $id chunk order broken")
    }
  }
}
