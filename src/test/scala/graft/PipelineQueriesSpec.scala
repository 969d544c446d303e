package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextDedup
import graft.engine.Tables
import graft.operators.PipelineQueries

/** Invariants for the training-data curation operators; exact values are
  * pinned by the DuckDB oracle gate, these pin the semantic claims the
  * oracles can't express (cluster transitivity, two-phase-rank
  * equivalence, determinism).
  */
class PipelineQueriesSpec extends AnyFunSuite {
  import SparkFixture.{spark, sfDir}

  private def run(name: String) =
    PipelineQueries.queries(name)(spark, sfDir)

  test("q_dup_clusters: every mined pair lands in one cluster, labeled by its min member") {
    val clusters = run("q_dup_clusters").collect()
    val members = clusters.map(r =>
      r.getAs[Long]("cluster_id") ->
        r.getAs[String]("members").split(",").map(_.toLong).toSet).toMap
    // cluster_id is the min member and members are disjoint
    members.foreach { case (cid, ms) =>
      assert(ms.min == cid, s"cluster $cid not labeled by min member")
      assert(ms.size >= 2, s"cluster $cid has no duplicate partner")
    }
    val all = members.values.flatten.toSeq
    assert(all.distinct.size == all.size, "clusters overlap")
    // transitivity: both endpoints of every edge share a cluster
    val pairs = TextDedup.exactJaccardPairs(
        Tables.documents(spark, sfDir).select(col("doc_id"), col("text")),
        0.7)
      .select(col("d1"), col("d2")).collect()
    val owner = members.flatMap { case (cid, ms) => ms.map(_ -> cid) }
    pairs.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(owner(a) == owner(b), s"pair ($a,$b) split across clusters")
    }
  }

  test("q_dup_clusters matches an independent union-find over the same edges") {
    val pairs = TextDedup.exactJaccardPairs(
        Tables.documents(spark, sfDir).select(col("doc_id"), col("text")),
        0.7)
      .select(col("d1"), col("d2")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // third, independent implementation: classic path-compressed union-find
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.toSeq.groupBy(find)
      .map { case (_, vs) => vs.min -> vs.sorted.mkString(",") }
    val got = run("q_dup_clusters").collect()
      .map(r => r.getAs[Long]("cluster_id") -> r.getAs[String]("members"))
      .toMap
    assert(got == expected)
  }

  test("q_dedup_keep: one survivor per cluster, the longest (ties to min id)") {
    val rows = run("q_dedup_keep").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_id"),
        r.getAs[Boolean]("keep")))
    // every doc verdicted exactly once
    val total = graft.engine.Tables.documents(spark, sfDir).count()
    assert(rows.length == total)
    // exactly one keeper per cluster
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (cid, ms) =>
      assert(ms.count(_._3) == 1, s"cluster $cid keeps ${ms.count(_._3)}")
    }
    // the keeper is the longest member (ties to min doc_id)
    val chars = graft.engine.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    byCluster.filter(_._2.length > 1).foreach { case (cid, ms) =>
      val kept = ms.find(_._3).get._1
      val best = ms.map(_._1).minBy(id => (-chars(id), id))
      assert(kept == best, s"cluster $cid kept $kept, expected $best")
    }
    // culled set is consistent with q_dup_clusters membership
    val clustered = run("q_dup_clusters").collect()
      .flatMap(_.getAs[String]("members").split(",").map(_.toLong)).toSet
    rows.filterNot(_._3).foreach { case (id, _, _) =>
      assert(clustered.contains(id), s"culled $id not in any dup cluster")
    }
  }

  test("q_curate_pipeline stages agree with the standalone queries") {
    val pipe = run("q_curate_pipeline").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("quality_pass"), r.getAs[Boolean]("dedup_keep"),
          r.getAs[Boolean]("contaminated"), r.getAs[Boolean]("kept")))
      .toMap
    // q_quality_score lives in TextQueries — go through the full map
    val qualityPassed = SparkEntry.queries("q_quality_score")(spark, sfDir)
      .collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val dedupKeep = run("q_dedup_keep").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    val contaminated = run("q_decontaminate").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Boolean]("contaminated")).toMap
    pipe.foreach { case (id, (q, k, c, kept)) =>
      assert(q == qualityPassed.contains(id), s"quality drift doc $id")
      assert(k == dedupKeep(id), s"dedup drift doc $id")
      assert(c == contaminated(id), s"contamination drift doc $id")
      assert(kept == (q && k && !c), s"kept flag inconsistent doc $id")
    }
    // pipeline domain = the training side only
    assert(pipe.keySet == contaminated.keySet)
  }

  test("q_decontaminate: flags exactly the docs sharing a shingle with the benchmark set") {
    val flagged = run("q_decontaminate").collect()
      .filter(_.getAs[Boolean]("contaminated"))
      .map(_.getAs[Long]("doc_id")).toSet
    val sh = Tables.documents(spark, sfDir)
      .select(col("doc_id"), TextDedup.wordShingles(col("text")).as("t"))
    val bench = sh.filter(pmod(col("doc_id"), lit(40)) === 0)
      .select(explode(col("t")).as("h")).collect().map(_.getLong(0)).toSet
    val expected = sh.filter(pmod(col("doc_id"), lit(40)) =!= 0)
      .collect()
      .filter(_.getAs[Seq[Long]]("t").exists(bench.contains))
      .map(_.getAs[Long]("doc_id")).toSet
    assert(flagged == expected)
  }

  test("q_sample_consistent: exactly the 5 smallest masked splitmix keys per stratum") {
    import org.apache.spark.sql.graft.NativeExpressions
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expect = docs.map { case (id, lang) =>
      (lang, NativeExpressions.splitmix64Long(id * 389L + 17L)
        & Long.MaxValue, id)
    }.groupBy(_._1).toSeq.flatMap { case (lang, xs) =>
      xs.sortBy(x => (x._2, x._3)).take(5).zipWithIndex.map {
        case ((_, key, id), i) => (lang, i + 1L, id, key)
      }
    }.sortBy(x => (x._1, x._2))
    val got = SparkEntry.queries("q_sample_consistent")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expect)
    // bottom-k stability: the panel is invariant to dropping any doc NOT
    // in it (consistent-sampling property) — simulate by re-ranking a
    // corpus without the largest-keyed docs
    val kept = got.map(_._3).toSet
    val shrunk = docs.filter { case (id, lang) =>
      kept.contains(id) ||
        NativeExpressions.splitmix64Long(id * 389L + 17L) % 2 == 0
    }
    val replay = shrunk.map { case (id, lang) =>
      (lang, NativeExpressions.splitmix64Long(id * 389L + 17L)
        & Long.MaxValue, id)
    }.groupBy(_._1).toSeq.flatMap { case (lang, xs) =>
      xs.sortBy(x => (x._2, x._3)).take(5).map(_._3)
    }.toSet
    assert(kept.subsetOf(replay), "panel must survive corpus shrinkage")
  }

  test("q_sample_stratified: deterministic across reruns and bounded by the stratum rate") {
    val a = run("q_sample_stratified").collect().map(_.toString).sorted
    val b = run("q_sample_stratified").collect().map(_.toString).sorted
    assert(a.sameElements(b), "sampling not deterministic")
    run("q_sample_stratified").collect().foreach { r =>
      assert(r.getAs[Long]("n_sampled") <= r.getAs[Long]("n_total"))
    }
  }

  test("q_rebalance: two-phase selection equals a single per-language rank") {
    run("q_rebalance").collect().foreach { r =>
      val (before, after) = (r.getAs[Long]("n_before"), r.getAs[Long]("n_after"))
      assert(after == math.min(before, 60L),
        s"lang ${r.getString(0)}: kept $after of $before (cap 60)")
    }
  }

  test("q_pack_sequences: bins partition the corpus and are contiguous per shard") {
    val rows = run("q_pack_sequences").collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total == Tables.documents(spark, sfDir).count())
    rows.groupBy(r => (r.getString(0), r.getAs[Long]("shard")))
      .foreach { case (shard, rs) =>
        val bins = rs.map(_.getAs[Long]("bin")).sorted
        assert(bins.head == 0L, s"$shard does not start at bin 0")
        assert(bins.sameElements(bins.head to bins.last),
          s"$shard has gaps in bins")
      }
  }

  test("q_anonymize: no digits survive redaction and pseudonyms stay unique") {
    val rows = run("q_anonymize").collect()
    assert(rows.forall(!_.getAs[String]("name_redacted").exists(_.isDigit)))
    val ids = rows.map(_.getAs[String]("pseudo_id"))
    assert(ids.distinct.length == ids.length)
  }

  test("q_novelty: first doc is fully novel and novel counts partition the shingle universe") {
    val rows = SparkEntry.queries("q_novelty")(spark, sfDir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // novelty is a fraction and the lowest doc_id can only contain
    // first-occurrence shingles
    rows.foreach { case (id, n, novel, frac) =>
      assert(novel >= 0 && novel <= n, s"doc $id novel count out of range")
      assert(frac >= 0.0 && frac <= 1.0, s"doc $id novelty out of [0,1]")
    }
    val firstDoc = rows.minBy(_._1)
    assert(firstDoc._3 == firstDoc._2 && firstDoc._4 == 1.0,
      "lowest doc_id must be 100% novel")
    // every distinct shingle is novel in exactly one doc: sum of novel
    // counts == corpus-wide distinct shingle count
    val distinctShingles = Tables.documents(spark, sfDir)
      .select(explode(TextDedup.wordShingles(col("text"))).as("t"))
      .distinct().count()
    assert(rows.map(_._3).sum == distinctShingles,
      "novel counts must partition the distinct-shingle universe")
  }

  test("q_dsir: target-like docs outscore off-target docs on a separable corpus") {
    // The driver corpus's sources are slices of ONE distribution (no DSIR
    // signal by construction), so the estimator's discriminative property
    // is pinned on a corpus where it must hold: src0 (the target) writes
    // from vocabulary A, other sources from vocabulary B, and a few raw
    // docs also use vocabulary A. DSIR must rank every A-doc above every
    // B-doc.
    val dir = java.nio.file.Files.createTempDirectory("graft_dsir").toString
    val vocabA = Seq("alpine", "butter", "cobalt", "dune", "ember", "fjord")
    val vocabB = Seq("gravel", "hollow", "iris", "jasper", "kiln", "lumen")
    def doc(v: Seq[String], seed: Int): String =
      (0 until 30).map(i => v((i * 7 + seed) % v.length)).mkString(" ")
    val rows = (0 until 10).map(i => (i.toLong, doc(vocabA, i), "src0")) ++
      (10 until 40).map(i => (i.toLong, doc(vocabB, i), s"src${1 + i % 3}")) ++
      (40 until 45).map(i => (i.toLong, doc(vocabA, i), s"src${1 + i % 3}"))
    import spark.implicits._
    rows.toDF("doc_id", "text", "source").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_dsir")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    val aDocs = (0 until 10).map(_.toLong).toSet ++
      (40 until 45).map(_.toLong).toSet
    val minA = out.filter(r => aDocs.contains(r._1)).map(_._2).min
    val maxB = out.filterNot(r => aDocs.contains(r._1)).map(_._2).max
    assert(minA > maxB,
      s"every target-vocabulary doc (min $minA) must outscore every " +
      s"off-target doc (max $maxB)")
    // deterministic on the real corpus too
    val r1 = SparkEntry.queries("q_dsir")(spark, sfDir).collect().toSeq
    val r2 = SparkEntry.queries("q_dsir")(spark, sfDir).collect().toSeq
    assert(r1 == r2, "importance weights must be deterministic")
  }

  test("q_source_temp_mix: closed-form weights on a known-counts corpus") {
    // sources with 2 / 8 / 32 docs: term_s = n_s^0.7, weight_s = term/Σ,
    // multiplier_s = weight/share — checked against the closed form, plus
    // the flattening property w_max/w_min = (n_max/n_min)^0.7
    val dir = java.nio.file.Files.createTempDirectory("graft_mix").toString
    val rows = (0 until 2).map(i => (i.toLong, s"t $i", "small")) ++
      (2 until 10).map(i => (i.toLong, s"t $i", "mid")) ++
      (10 until 42).map(i => (i.toLong, s"t $i", "big"))
    import spark.implicits._
    rows.toDF("doc_id", "text", "source").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_source_temp_mix")(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val ns = Map("small" -> 2.0, "mid" -> 8.0, "big" -> 32.0)
    val z = ns.values.map(n => math.pow(n, 0.7)).sum
    val total = ns.values.sum
    ns.foreach { case (s, n) =>
      val (gotN, share, w, mult) = out(s)
      assert(gotN == n.toLong)
      assert(math.abs(share - n / total) < 1e-6, s"$s share")
      assert(math.abs(w - math.pow(n, 0.7) / z) < 1e-6, s"$s weight")
      assert(math.abs(mult - (math.pow(n, 0.7) / z) / (n / total)) < 1e-6,
        s"$s multiplier")
    }
    // flattening: tempered ratio = raw ratio^0.7 < raw ratio; small is
    // up-sampled, big down-sampled
    assert(out("big")._3 / out("small")._3 < 32.0 / 2.0)
    assert(out("small")._4 > 1.0 && out("big")._4 < 1.0)
  }

  test("q_token_budget: distributed prefix sum equals the single-window global scan") {
    // The operator computes the cumulative token count via
    // repartitionByRange + per-partition offsets; the test recomputes it
    // with one global window (fine at test scale) — they must agree
    // bit-for-bit, which is exactly the claim that offset + local prefix
    // is the global prefix under the total order.
    val out = SparkEntry.queries("q_token_budget")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getBoolean(4)))
    val docs = Tables.documents(spark, sfDir)
      .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
      .withColumn("uniq_ratio",
        size(array_distinct(split(col("text"), " "))).cast("double") /
          col("n_tok"))
      .withColumn("len_score",
        least(col("n_tok").cast("double") / 50.0, lit(1.0)))
      .withColumn("score",
        round((col("uniq_ratio") + col("len_score")) / 2.0, 6))
      .select(col("doc_id"), col("n_tok"), col("score"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = docs.sortBy(r => (-r._3, r._1))
      .scanLeft((0L, 0L, 0.0, 0L)) { case ((_, _, _, cum), (id, n, s)) =>
        (id, n, s, cum + n) }.drop(1)
      .map { case (id, n, s, cum) => (id, n, s, cum, cum <= 20000L) }
      .sortBy(_._1)
    assert(out.toSeq == expected.toSeq)
    // the budget actually cuts: both kept and culled docs exist
    assert(out.exists(_._5) && out.exists(!_._5))
  }

  test("q_mlm_mask: deterministic, rate-sane, and invertible outside masks") {
    val out = SparkEntry.queries("q_mlm_mask")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val again = SparkEntry.queries("q_mlm_mask")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == again.toSeq, "masking must be deterministic")
    // corpus-wide mask rate near the nominal 15%
    val rate = out.map(_._3).sum.toDouble / out.map(_._2).sum
    assert(rate > 0.10 && rate < 0.20, s"mask rate $rate far from 0.15")
    // outside masked positions the text is unchanged, token count is
    // preserved, and n_masked counts exactly the [MASK] tokens
    val orig = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        split(regexp_replace(lower(trim(col("text"))),
          "[ \\t\\n\\f\\r\\x0B]+", " "), " ").as("ws"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    out.foreach { case (id, n, masked, text) =>
      val got = text.split(" ", -1)
      val ws = orig(id)
      assert(got.length == n && n == ws.length, s"doc $id token count drift")
      assert(got.count(_ == "[MASK]") == masked, s"doc $id mask count drift")
      got.zip(ws).foreach { case (g, w) =>
        assert(g == "[MASK]" || g == w, s"doc $id altered unmasked token") }
    }
  }

  test("q_t5_spans: splicing each target span back into the input reproduces the original") {
    val out = SparkEntry.queries("q_t5_spans")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getString(4)))
    val orig = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        regexp_replace(lower(trim(col("text"))),
          "[ \\t\\n\\f\\r\\x0B]+", " ").as("nt"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val sentinel = "<extra_id_(\\d+)>".r
    assert(out.exists(_._3 > 0), "corpus should produce at least one span")
    out.foreach { case (id, nTok, nSpans, input, target) =>
      // parse the target into span_id -> tokens
      val spans = scala.collection.mutable.Map.empty[Int, Vector[String]]
      var cur = -1
      target.split(" ").filter(_.nonEmpty).foreach {
        case sentinel(k) => cur = k.toInt; spans(cur) = Vector.empty
        case tok => assert(cur >= 0, s"doc $id target starts without sentinel")
                    spans(cur) = spans(cur) :+ tok
      }
      assert(spans.size == nSpans, s"doc $id span count drift")
      assert(spans.keySet == (0 until nSpans.toInt).toSet,
        s"doc $id sentinels not consecutive from 0")
      // splice spans back into the input
      val rebuilt = input.split(" ").filter(_.nonEmpty).flatMap {
        case sentinel(k) => spans(k.toInt)
        case tok => Vector(tok)
      }.mkString(" ")
      assert(rebuilt == orig(id), s"doc $id reconstruction drift")
      assert(rebuilt.split(" ").length == nTok)
    }
  }

  test("q_bloom_decontaminate: Bloom prefilter + exact verify equals the broadcast-exact answer") {
    // The sketch only decides who pays for the verify join; the declared
    // result must be bit-identical to q_decontaminate's exact flags.
    val bloom = run("q_bloom_decontaminate").collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val exact = run("q_decontaminate").collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(bloom == exact)
    assert(bloom.values.exists(identity) && bloom.values.exists(!_),
      "fixture should contain both contaminated and clean docs")
  }
}
