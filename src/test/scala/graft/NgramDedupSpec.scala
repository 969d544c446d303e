package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.NativeExpressions

/** Exactness of the size-banded 3-gram Jaccard join (q_dedup_ngram,
  * dictionary-bitmap AND+popcount verify) against a brute-force all-pairs
  * computation on an adversarial synthetic corpus: a dense gram universe
  * (6-letter alphabet), heavy near-dup clusters, and document sizes spread
  * across geometric band boundaries — the cases where the blocking would
  * lose pairs if the adjacent-band/tie-break logic or the bitmap encoding
  * were wrong.
  */
class NgramDedupSpec extends AnyFunSuite {
  import SparkFixture.spark
  import spark.implicits._

  private val dir = java.nio.file.Files
    .createTempDirectory("graft_ngram_synth").toString

  private def buildCorpus(): Unit = {
    val rnd = new scala.util.Random(42)
    def randDoc(len: Int): String =
      (0 until len).map { i =>
        if (i % 6 == 5) ' ' else ('a' + rnd.nextInt(6)).toChar
      }.mkString
    // sizes sweep the band range; step chosen so some adjacent docs land
    // at size ratios right around the 0.8 banding threshold
    val base = (0 until 60).map(i => randDoc(40 + i * 3))
    // near-dup clusters: single-char mutations of a subset
    val mutated = base.take(20).zipWithIndex.map { case (t, i) =>
      val pos = rnd.nextInt(t.length)
      t.updated(pos, if (t(pos) == 'a') 'b' else 'a')
    }
    val docs = (base ++ mutated).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("inverted-index word-shingle Jaccard equals brute force on synthetic corpus") {
    buildCorpus()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val viaIndex = graft.functions.TextDedup
      .exactJaccardPairs(docs.select($"doc_id", $"text"), 0.3)
      .select($"d1", $"d2", $"jacc").as[(Long, Long, Double)]
      .collect().toSet

    val t = docs.withColumn("toks",
        NativeExpressions.shingleHashes(encode($"text", "UTF-8"), lit(5)))
      .withColumn("sz", size($"toks"))
    val brute = t.alias("a").crossJoin(t.alias("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .withColumn("inter", size(array_intersect(col("a.toks"), col("b.toks"))))
      .withColumn("jacc", round($"inter".cast("double") /
        (col("a.sz") + col("b.sz") - $"inter"), 6))
      .filter($"jacc" >= 0.3)
      .select(col("a.doc_id"), col("b.doc_id"), $"jacc")
      .as[(Long, Long, Double)].collect().toSet

    assert(brute.nonEmpty, "synthetic corpus produced no qualifying pairs — test is vacuous")
    assert(viaIndex == brute,
      s"missing: ${brute -- viaIndex}; extra: ${viaIndex -- brute}")
  }

  test("open-universe fallback (dict > 4096) equals brute force too") {
    // the bitmap path only covers dense small universes; corpora with
    // more than 4096 distinct trigrams take the sorted-array
    // bounded-merge branch — exercise it on a wide-alphabet corpus
    // (36-char alphabet → tens of thousands of possible trigrams)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ngram_wide").toString
    val rnd = new scala.util.Random(7)
    val alpha = ('a' to 'z') ++ ('0' to '9')
    def doc(len: Int): String =
      (0 until len).map { i =>
        if (i % 9 == 8) ' ' else alpha(rnd.nextInt(alpha.length))
      }.mkString
    val base = (0 until 50).map(_ => doc(420))
    val mutated = base.take(15).map { t =>
      val p = rnd.nextInt(t.length)
      t.updated(p, if (t(p) == 'a') 'b' else 'a')
    }
    (base ++ mutated).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // precondition: this corpus really is open-universe
    val dictSize = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(NativeExpressions.trigramCodes(
        encode(regexp_replace(lower(trim($"text")),
          "[ \\t\\n\\f\\r\\x0B]+", " "), "UTF-8"))).as("g"))
      .distinct().count()
    assert(dictSize > 4096,
      s"fixture universe $dictSize too small to hit the fallback path")
    val got = SparkEntry.queries("q_dedup_ngram")(spark, dir)
      .select($"d1", $"d2", $"jacc").as[(Long, Long, Double)]
      .collect().toSet
    val g = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("gids", NativeExpressions.trigramCodes(
        encode(regexp_replace(lower(trim($"text")), "\\s+", " "), "UTF-8")))
      .withColumn("sz", size($"gids"))
    val brute = g.alias("a").crossJoin(g.alias("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .withColumn("inter", NativeExpressions.sortedIntersectCount(
        col("a.gids"), col("b.gids")))
      .withColumn("jacc", round(col("inter").cast("double") /
        (col("a.sz") + col("b.sz") - col("inter")), 6))
      .filter($"jacc" >= 0.8)
      .select(col("a.doc_id"), col("b.doc_id"), $"jacc")
      .as[(Long, Long, Double)].collect().toSet
    assert(brute.nonEmpty, "wide fixture produced no qualifying pairs")
    assert(got == brute, s"missing: ${brute -- got}; extra: ${got -- brute}")
  }

  test("banded bitmap q_dedup_ngram equals brute-force all-pairs on synthetic corpus") {
    buildCorpus()
    val banded = SparkEntry.queries("q_dedup_ngram")(spark, dir)
      .select($"d1", $"d2", $"jacc").as[(Long, Long, Double)]
      .collect().toSet

    val g = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("gids", NativeExpressions.trigramCodes(
        encode(regexp_replace(lower(trim($"text")), "\\s+", " "), "UTF-8")))
      .withColumn("sz", size($"gids"))
    val brute = g.alias("a").crossJoin(g.alias("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .withColumn("inter", NativeExpressions.sortedIntersectCount(
        col("a.gids"), col("b.gids")))
      .withColumn("jacc", round(col("inter").cast("double") /
        (col("a.sz") + col("b.sz") - col("inter")), 6))
      .filter($"jacc" >= 0.8)
      .select(col("a.doc_id"), col("b.doc_id"), $"jacc")
      .as[(Long, Long, Double)].collect().toSet

    assert(brute.nonEmpty, "synthetic corpus produced no qualifying pairs — test is vacuous")
    assert(banded == brute,
      s"missing: ${brute -- banded}; extra: ${banded -- brute}")
  }
}
