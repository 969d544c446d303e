package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 additions: (1) the verification the r13 `q_mm_image_dedup`
  * shipped without (VERDICT r13 items 2–4) — quad replay, pigeonhole
  * recall, equi-join pin; (2) replay/consistency specs for every r14
  * operator — rater agreement (fleiss/krippendorff cross-pin),
  * calibration (hosmer), heteroscedasticity + portmanteau +
  * seasonal-strength + concordance time-series rows, NDCG ideal replay,
  * binary-quantization and ADC recall (with the dominance pin),
  * perceptual pHash/audio-fingerprint/scene-cut planted-ground-truth
  * replays, the multimodal curation verdict partition, split leakage,
  * streaming late-data accounting, recursive-walk depth replay, GPD and
  * Chao1 algebra replays, and the brute-force matrix-profile replay.
  */
class Round14Spec extends AnyFunSuite {
  import SparkFixture.{spark, sfDir}

  private def dedup() =
    SparkEntry.queries("q_mm_image_dedup")(spark, sfDir)

  test("q_mm_image_dedup recovers exactly the planted quads") {
    // the corpus plants quads: docs d with equal d/4 share a base image,
    // each perturbing ~7 of 256 pixels — so ALL C(4,2)=6 within-quad
    // pairs must surface (500 docs → 125 quads → 750 pairs) and NO
    // cross-quad pair may (those hashes differ by ~128 bits ≫ τ=24)
    val rows = dedup().collect()
    assert(rows.length == 750)
    rows.foreach { r =>
      val (d1, d2, h) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(d1 / 4 == d2 / 4, s"cross-quad pair surfaced: $d1, $d2")
      assert(d1 < d2)
      assert(h >= 0 && h <= 24, s"hamming out of band: $h")
    }
    val quads = rows.groupBy(r => r.getLong(0) / 4)
    assert(quads.size == 125)
    assert(quads.values.forall(_.length == 6),
      "a quad lost a within-quad pair (recall hole)")
  }

  test("q_mm_image_dedup within-quad distances sit far below τ") {
    // the bimodal-gap premise: perturbing ~7/256 pixels flips ≤ ~20
    // aHash bits, so every surfaced distance should clear τ=24 with
    // margin — a distance AT the threshold would mean the planted
    // perturbation and τ drifted together and the test lost its power
    val hs = dedup().select(col("hamming")).collect().map(_.getLong(0))
    assert(hs.max <= 22, s"within-quad max hamming ${hs.max} too close to τ")
  }

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q_fleiss_kappa algebra replays from its own outputs") {
    val r = run("q_fleiss_kappa").collect().head
    val (n, m, t1) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(m == 3 && t1 >= 0 && t1 <= 3 * n)
    val (pbar, pe, k) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
    val p1 = t1.toDouble / (3 * n)
    assert(math.abs(pe - (p1 * p1 + (1 - p1) * (1 - p1))) < 1e-5)
    assert(pbar >= 0.0 && pbar <= 1.0)
    assert(math.abs(k - (pbar - pe) / (1 - pe)) < 1e-4)
    assert(k > -1.0 && k < 1.0)
  }

  test("q_krippendorff_alpha shares the rater frame with fleiss") {
    val kr = run("q_krippendorff_alpha").collect().head
    val fl = run("q_fleiss_kappa").collect().head
    // same three gates, same corpus → identical positive-rating mass
    assert(kr.getLong(2) == fl.getLong(2), "n_pos != fleiss t1")
    val (n, nRat, nPos, nNeg, o2) = (kr.getLong(0), kr.getLong(1),
      kr.getLong(2), kr.getLong(3), kr.getLong(4))
    assert(nRat == 3 * n && nPos + nNeg == nRat)
    val alpha = kr.getDouble(5)
    val expect = 1.0 - (3.0 * n - 1) * o2 / (2.0 * nPos * nNeg)
    assert(math.abs(alpha - expect) < 1e-5)
    assert(alpha > -1.0 && alpha <= 1.0)
  }

  test("q_hosmer_lemeshow deciles partition the corpus") {
    val rows = run("q_hosmer_lemeshow").collect()
    assert(rows.map(_.getLong(0)).toSeq == (0L to 9L))
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(rows.map(_.getLong(1)).sum == nDocs)
    val nPos = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("n_chars") >= 300).count()
    assert(rows.map(_.getLong(2)).sum == nPos)
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= r.getLong(1))
      if (!r.isNullAt(4)) assert(r.getDouble(4) >= -1e-9)
    }
  }

  test("q_breusch_pagan LM stat is coherent with its decision flag") {
    val r = run("q_breusch_pagan").collect().head
    assert(r.getLong(1) == 1) // df
    val lm = r.getDouble(2)
    assert(lm >= 0.0)
    assert(r.getBoolean(3) == (lm > 3.841459))
  }

  test("q_ndcg is a normalized gain in (0, 1] with dcg <= idcg") {
    val r = run("q_ndcg").collect().head
    assert(r.getLong(0) == 20)
    val (dcg, idcg, ndcg) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(dcg >= 0.0 && idcg > 0.0 && dcg <= idcg + 1e-9)
    assert(math.abs(ndcg - dcg / idcg) < 1e-4)
    assert(ndcg > 0.0 && ndcg <= 1.0)
    // the ideal top-20 replays from the corpus-wide relevance grades:
    // idcg must equal the DCG of the 20 highest grades in rank order
    val nrm = regexp_replace(lower(trim(col("text"))),
      "[ \\t\\n\\f\\r\\x0B]+", " ")
    val grades = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(((col("n_chars") >= 300L).cast("int") +
        (size(split(nrm, " ")) >= 56).cast("int")).cast("long").as("rel"))
      .collect().map(_.getLong(0)).sorted.reverse.take(20)
    val idcgU = grades.zipWithIndex.map { case (g, i) =>
      val gain = if (g == 0) 0.0 else if (g == 1) 1.0 else 3.0
      math.floor(gain / (math.log(i + 2.0) / math.log(2.0)) * 1e6 + 0.5)
        .toLong
    }.sum
    assert(math.abs(idcg - idcgU / 1e6) < 1e-5)
  }

  test("q_binary_quantize: panel recall readout is structurally sound") {
    val rows = run("q_binary_quantize").collect()
    assert(rows.length == 10) // the q_ann_recall probe panel
    rows.foreach { r =>
      val (hits, rec) = (r.getLong(1), r.getDouble(2))
      assert(hits >= 0 && hits <= 5)
      assert(math.abs(rec - hits / 5.0) < 1e-9)
      val ham = r.getLong(3)
      assert(ham >= 0 && ham <= 5L * 64) // 5 neighbors × 64-dim codes
    }
  }

  test("q_binary_asym: ADC recall dominates the symmetric hamming row") {
    val asym = run("q_binary_asym").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sym = run("q_binary_quantize").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(asym.keySet == sym.keySet)
    // the full-precision query strictly adds information per
    // comparison, so aggregate recall must not be WORSE — this is the
    // operator's whole argument
    assert(asym.values.sum >= sym.values.sum,
      s"ADC recall ${asym.values.sum} < symmetric ${sym.values.sum}")
  }

  test("q_mm_phash: within-quad DCT-hash distances stay far below 64/2") {
    val rows = run("q_mm_phash").collect()
    assert(rows.length == 750) // 125 quads × C(4,2)
    rows.foreach { r =>
      assert(r.getLong(0) / 4 == r.getLong(1) / 4)
      val h = r.getLong(2)
      // planted ~7-pixel perturbations: aHash pairs measured 1..22
      // (q_mm_image_dedup); the DCT hash must concentrate at or below
      // that band — random 64-bit pairs sit at ~32
      assert(h >= 0 && h <= 24, s"within-quad phash hamming $h")
    }
  }

  test("q_stream_late_data: the watermark drops late rows, measurably") {
    val r = run("q_stream_late_data").collect().head
    val (onTime, late, dropped, kept, emitted) = (r.getLong(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val total = spark.read.parquet(s"$sfDir/events.parquet").count()
    assert(onTime + late == total)
    // the 18-day delay against a ~30-day corpus leaves a ~3-day grace
    // band: a real mix of dropped and kept late rows, or the test has
    // no power
    assert(dropped > 0, "watermark dropped nothing — fixture broken")
    assert(kept > 0, "grace band empty — fixture cut in the wrong place")
    assert(dropped + kept == late)
    // metric-vs-sink consistency: everything not dropped was emitted
    assert(emitted == onTime + kept)
  }

  test("q_mm_audio_fp: within-quad fingerprints sit inside τ=26") {
    val rows = run("q_mm_audio_fp").collect()
    assert(rows.length == 750) // 125 quads × C(4,2)
    rows.foreach { r =>
      assert(r.getLong(0) / 4 == r.getLong(1) / 4)
      val h = r.getLong(2)
      // design-time separation: within-quad 2..25 measured on this
      // corpus (cross-quad 33..74); 30 leaves regeneration margin
      assert(h >= 0 && h <= 30, s"within-quad audio hamming $h")
      assert(r.getBoolean(3) == (h <= 26))
    }
    // the bulk must sit FAR below τ or the τ margin is illusory
    val below = rows.count(_.getLong(2) <= 20)
    assert(below >= rows.length * 9 / 10,
      "within-quad hamming mass crept toward τ")
  }

  test("q_mm_video_scenecut recovers every planted cut exactly") {
    val rows = run("q_mm_video_scenecut").collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val id = r.getLong(0)
      val planted = 2 + java.lang.Long.remainderUnsigned(
        org.apache.spark.sql.graft.NativeExpressions
          .splitmix64Long(id * 31L + 5L), 5L)
      assert(r.getLong(3) == 1, s"doc $id: ${r.getLong(3)} cuts != 1")
      assert(r.getLong(1) == planted,
        s"doc $id: detected ${r.getLong(1)} != planted $planted")
      assert(r.getLong(2) >= 16 && r.getLong(2) <= 64)
    }
  }

  test("q_split_leakage cells partition the dup-pair set") {
    val rows = run("q_split_leakage").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b, leaked) = (r.getString(0), r.getString(1),
        r.getBoolean(3))
      assert(a <= b) // unordered cell canonicalization
      assert(leaked == (a != b))
      assert(r.getLong(2) > 0)
    }
  }

  test("q_recursive_walk depths replay floor(log2) over the key range") {
    val rows = run("q_recursive_walk").collect()
    val keys = spark.read.parquet(s"$sfDir/supplier.parquet")
      .select(col("s_suppkey")).collect().map(_.getLong(0))
    val expected = keys.groupBy { k =>
      if (k <= 1) 0L else (63 - java.lang.Long.numberOfLeadingZeros(k)).toLong
    }.view.mapValues(_.length.toLong).toMap
    assert(rows.map(r => r.getLong(0) -> r.getLong(1)).toMap == expected)
  }

  test("q_seasonal_strength replays from the STL decomposition frame") {
    val stl = run("q_stl_decompose").collect()
      .filter(r => !r.isNullAt(4) && !r.isNullAt(5))
      .map(r => (r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    def popVar(xs: Array[Double]): Double = {
      val m = xs.sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum / xs.length
    }
    val rem = stl.map { case (x, t, sv) => x - t - sv }
    val sPlusR = stl.map { case (x, t, _) => x - t }
    val tPlusR = stl.map { case (x, _, sv) => x - sv }
    val r = run("q_seasonal_strength").collect().head
    assert(r.getLong(0) == stl.length)
    val fT = math.max(0.0, 1.0 - popVar(rem) / popVar(tPlusR))
    val fS = math.max(0.0, 1.0 - popVar(rem) / popVar(sPlusR))
    assert(math.abs(r.getDouble(1) - fT) < 1e-4)
    assert(math.abs(r.getDouble(2) - fS) < 1e-4)
  }

  test("q_kendall_w is a [0,1] concordance over the full rater grid") {
    val r = run("q_kendall_w").collect().head
    assert(r.getLong(1) == 5) // the five event types
    assert(r.getLong(0) > 0)
    val w = r.getDouble(2)
    assert(w >= 0.0 && w <= 1.0)
  }

  test("q_ljung_box aggregates the ACF it claims to test") {
    val acf = run("q_acf").collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    val lb = run("q_ljung_box").collect().head
    val n = lb.getLong(0).toDouble
    assert(lb.getLong(1) == 7)
    // replay Q from q_acf's own r_k readout (both are 6dp-rounded, so
    // compare with a tolerance matched to 7 accumulated roundings)
    val q = n * (n + 2) * acf.map { case (k, r) => r * r / (n - k) }.sum
    assert(math.abs(lb.getDouble(2) - q) < 0.05)
    assert(lb.getBoolean(3) == (lb.getDouble(2) > 14.067140))
  }

  test("q_optimal_threshold picks genuinely maximal operating points") {
    val rows = run("q_optimal_threshold").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("f1", "youden"))
    rows.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(3) >= 0) // tp, fp
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
    // brute-force replay: no other threshold beats the reported F1
    val sc = graft.functions.TextDedup.classifierScored(
      spark.read.parquet(s"$sfDir/documents.parquet"),
      Seq(col("doc_id"), col("n_chars")))
      .select(col("score"), (col("n_chars") >= 300L).cast("long").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val p = sc.map(_._2).sum
    val f1Best = sc.map(_._1).distinct.map { th =>
      val tp = sc.count { case (s0, y) => s0 >= th && y == 1 }.toLong
      val pp = sc.count { case (s0, _) => s0 >= th }.toLong
      (2 * tp * 1000000L) / (pp + p)
    }.max
    assert(rows.head.getDouble(4) == f1Best / 1e6)
  }

  test("q_chao1 is a richness lower bound consistent with its own parts") {
    val r = run("q_chao1").collect().head
    val (n, sObs, f1, f2) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))
    assert(n >= sObs && sObs >= f1 + f2)
    val expect =
      if (f2 > 0) sObs + f1.toDouble * f1 / (2.0 * f2)
      else sObs + f1.toDouble * (f1 - 1) / (2.0 * (f2 + 1))
    assert(math.abs(r.getDouble(4) - expect) < 1e-4)
    assert(r.getDouble(4) >= sObs.toDouble)
  }

  test("q_gpd_tail replays from the raw quantized values") {
    val vq = spark.read.parquet(s"$sfDir/events.parquet")
      .select(floor(col("value") * lit(1000.0) + lit(0.5)).cast("long")
        .as("vq"))
      .collect().map(_.getLong(0)).sorted
    val n = vq.length
    val u = vq((19 * n + 19) / 20 - 1) // min vq with cum >= ceil(0.95n)
    val exc = vq.filter(_ > u).map(_ - u)
    val r = run("q_gpd_tail").collect().head
    assert(r.getDouble(0) == u / 1000.0)
    assert(r.getLong(1) == exc.length)
    val m = exc.sum.toDouble / exc.length
    val v = exc.map(y => (y - m) * (y - m)).sum / exc.length
    assert(math.abs(r.getDouble(2) - 0.5 * (1 - m * m / v)) < 1e-3)
    assert(math.abs(r.getDouble(3) - 0.5 * (m / 1000.0) * (1 + m * m / v))
      < 1e-3)
  }

  test("q_mm_curate verdicts partition the corpus; canonicals survive") {
    val rows = run("q_mm_curate").collect()
    val byVerdict = rows.groupBy(_.getString(1))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(byVerdict.values.sum == 500)
    assert(byVerdict.keySet.subsetOf(
      Set("keep", "cull_image", "cull_audio")))
    // the dominated-by-smaller rule can never cull a quad's minimum
    // doc_id, so at least the 125 canonicals survive
    assert(byVerdict.getOrElse("keep", 0L) >= 125)
    // both modalities must actually fire — distinct thresholds bisect
    // distinct hamming bands, or the composition is degenerate
    assert(byVerdict.getOrElse("cull_image", 0L) > 0)
    assert(byVerdict.getOrElse("cull_audio", 0L) > 0)
  }

  test("q_matrix_profile replays by brute force from the day counts") {
    val days = spark.read.parquet(s"$sfDir/events.parquet")
      .groupBy(expr("CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS LONG)")
        .as("dd"))
      .agg(count(lit(1)).as("y"))
      .orderBy(col("dd")).collect().map(_.getLong(1))
    val n = days.length
    val wins = (0 to n - 7).map { i =>
      val s7 = days.slice(i, i + 7).sum
      days.slice(i, i + 7).map(_ * 7 - s7)
    }
    def d2(a: Int, b: Int): Long =
      wins(a).zip(wins(b)).map { case (x, y) => (x - y) * (x - y) }.sum
    val expect = wins.indices.map { a =>
      val cands = wins.indices.filter(b => math.abs(a - b) >= 4)
        .map(b => (d2(a, b), b + 1L)).min
      (a + 1L, cands._2, cands._1)
    }
    val got = run("q_matrix_profile").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect)
    val flags = run("q_matrix_profile").collect()
    assert(flags.count(_.getBoolean(3)) >= 1) // motif
    assert(flags.count(_.getBoolean(4)) >= 1) // discord
  }

  test("q_mm_image_dedup candidate join stays equi — no NL/cartesian") {
    // the r13 defect was candidate volume, not candidate mechanism; pin
    // the mechanism too: banding must reach the executor as a keyed
    // equi-join, never a nested-loop/cartesian fallback
    val plan = dedup().queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "cartesian in dedup plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "BNLJ in dedup plan")
  }
}
