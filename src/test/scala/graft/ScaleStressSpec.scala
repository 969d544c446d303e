package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** 100-TB-envelope stress for the exact-integer fold helpers (VERDICT
  * r15 item 5, generalizing the q_breusch_pagan overflow-bug class):
  * drive the SHARED fold implementations the drift/stats queries run —
  * K-rescaled CDF gaps (q_wasserstein), squared gaps
  * (q_cramer_von_mises), signed placement variances (q_brunner_munzel,
  * the abs-before-div case), value-sum prefix weights
  * (q_energy_distance), and the plain decimal dominance fold
  * (q_cliffs_delta) — with SYNTHETIC magnitudes no test corpus reaches:
  * per-value counts ~10¹⁰ (cohort totals ~10¹²·, i.e. trillion-row
  * cohorts) and |vq| up to 10⁹ (|value| ~10⁶ milli-quantized).
  *
  * Each statistic is checked against an exact BigInt replay of the SAME
  * integer discipline (DuckDB's `//` on the abs'd operand == Spark's
  * `div` — both truncate toward zero on non-negative operands, which is
  * WHY the queries abs before dividing), so the asserts cover both
  * failure modes the class has produced:
  *   - silent overflow (a Long prefix sum wrapping, a decimal(38,0)
  *     fold going NULL) → the value assert fails loudly;
  *   - trunc-vs-floor sign divergence → the BigInt replay (flooring on
  *     the abs'd operand) would disagree with Spark's result.
  *
  * The frames are tiny (101 distinct values) — the ENVELOPE lives in
  * the magnitudes, not the row count, exactly like the folds at 100 TB
  * where the distinct-value frame stays bounded while counts explode.
  */
class ScaleStressSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  // --- synthetic envelope frame -------------------------------------------
  // 101 distinct milli-quantized values spanning ±10⁹ (negative values
  // included ON PURPOSE: they exercise the sign-split rescale and the
  // signed placement terms), counts ~10¹⁰ per value with deterministic
  // asymmetry so every gap/placement term is nonzero.
  private val rows: Seq[(Long, Long, Long)] = (0 until 101).map { i =>
    val vq = (i - 50).toLong * 20000000L // -1e9 .. 1e9 step 2e7
    val na = 9000000000L + 137000000L * (i % 7)   // ~9-9.8e9
    val nb = 9500000000L - 113000000L * (i % 11)  // ~8.4-9.5e9
    (vq, na, nb)
  }

  private def groupedDf: DataFrame =
    rows.toDF("vq", "na", "nb")

  // exact cumulative frames (BigInt), ascending vq
  private val sorted = rows.sortBy(_._1)
  private val ta = sorted.map(r => BigInt(r._2)).sum
  private val tb = sorted.map(r => BigInt(r._3)).sum
  private val cumA =
    sorted.scanLeft(BigInt(0))((acc, r) => acc + BigInt(r._2)).tail
  private val cumB =
    sorted.scanLeft(BigInt(0))((acc, r) => acc + BigInt(r._3)).tail

  test("envelope sanity: cohort totals are at the 100-TB scale") {
    assert(ta > BigInt("900000000000") && tb > BigInt("900000000000"))
    // and the UNrescaled value-sum prefix would NOT fit a Long:
    val rawAbsSum = sorted.map(r => BigInt(r._2) * BigInt(r._1).abs).sum
    assert(rawAbsSum > BigInt(Long.MaxValue),
      "fixture too small to stress the Long prefix path")
  }

  test("wasserstein K-rescaled gap fold matches BigInt replay at envelope") {
    val out = graft.operators.DriftQueries.wassersteinFrom(groupedDf)
      .collect()
    graft.engine.Pins.releaseAll()
    assert(out.length == 1)
    val r = out.head
    assert(!r.isNullAt(r.fieldIndex("w1")), "w1 is NULL - silent overflow")
    // BigInt replay of the same discipline
    val k = (ta * tb / BigInt("1000000000000")).max(BigInt(1))
    var sw = BigInt(0)
    for (i <- 0 until sorted.length - 1) {
      val gap = (cumA(i) * tb - cumB(i) * ta).abs / k
      sw += gap * BigInt(sorted(i + 1)._1 - sorted(i)._1)
    }
    val expected = (BigDecimal(k) * BigDecimal(sw) /
      (BigDecimal(ta) * BigDecimal(tb) * 1000)).toDouble
    val got = r.getAs[Double]("w1")
    assert(math.abs(got - expected) <= math.abs(expected) * 1e-9 + 1e-6,
      s"w1=$got expected=$expected")
    assert(r.getAs[Long]("n_a") == ta.toLong)
  }

  test("cramer-von-mises squared gap fold matches BigInt replay at envelope") {
    val cdf = graft.operators.DriftQueries.cdfFromGrouped(groupedDf)
    val out = graft.operators.DriftQueries.cramerVonMisesFrom(cdf).collect()
    graft.engine.Pins.releaseAll()
    val r = out.head
    assert(!r.isNullAt(r.fieldIndex("t_stat")),
      "t_stat is NULL - silent overflow")
    val k = (ta * tb / BigInt("1000000000000")).max(BigInt(1))
    var sq = BigInt(0)
    for (i <- sorted.indices) {
      val g = (cumA(i) * tb - cumB(i) * ta).abs / k
      sq += g * g * (BigInt(sorted(i)._2) + BigInt(sorted(i)._3))
    }
    val expected = (BigDecimal(k) * BigDecimal(k) * BigDecimal(sq) /
      (BigDecimal(ta) * BigDecimal(tb) *
        BigDecimal(ta + tb) * BigDecimal(ta + tb))).toDouble
    val got = r.getAs[Double]("t_stat")
    assert(math.abs(got - expected) <= math.abs(expected) * 1e-9 + 1e-6,
      s"t_stat=$got expected=$expected")
  }

  test("cliffs-delta plain decimal dominance fold is exact at envelope") {
    val cdf = graft.operators.DriftQueries.cdfFromGrouped(groupedDf)
    val out = graft.operators.DriftQueries.cliffsDeltaFrom(cdf).collect()
    graft.engine.Pins.releaseAll()
    val r = out.head
    var gt = BigInt(0); var lt = BigInt(0)
    for (i <- sorted.indices) {
      gt += BigInt(sorted(i)._3) * (ta - cumA(i))
      lt += BigInt(sorted(i)._3) * (cumA(i) - BigInt(sorted(i)._2))
    }
    val expected =
      ((BigDecimal(gt) - BigDecimal(lt)) /
        (BigDecimal(ta) * BigDecimal(tb))).toDouble
    val got = r.getAs[Double]("delta")
    assert(!r.isNullAt(r.fieldIndex("delta")))
    assert(math.abs(got - expected) < 1e-5, s"delta=$got expected=$expected")
    assert(r.getAs[Double]("n_gt") == BigDecimal(gt).toDouble)
  }

  test("brunner-munzel abs-before-div variance fold matches replay at envelope") {
    val cdf = graft.operators.DriftQueries.cdfFromGrouped(groupedDf)
    val out = graft.operators.DriftQueries.brunnerMunzelFrom(cdf).collect()
    graft.engine.Pins.releaseAll()
    val r = out.head
    assert(!r.isNullAt(r.fieldIndex("w_stat")),
      "w_stat is NULL - silent overflow or degenerate gate misfire")
    // replay: qa2 = 2*cumB - nb, da = sum(na*qa2); inner terms ta*qa2-da
    // are SIGNED -> abs before the flooring division (this is the
    // trunc-vs-floor agreement the discipline exists for)
    val qa2 = sorted.indices.map(i => 2 * cumB(i) - BigInt(sorted(i)._3))
    val qb2 = sorted.indices.map(i => 2 * cumA(i) - BigInt(sorted(i)._2))
    val da = sorted.indices.map(i => BigInt(sorted(i)._2) * qa2(i)).sum
    val db = sorted.indices.map(i => BigInt(sorted(i)._3) * qb2(i)).sum
    val ka = (2 * ta * (ta + tb) / BigInt("1000000000000")).max(BigInt(1))
    val kb = (2 * tb * (ta + tb) / BigInt("1000000000000")).max(BigInt(1))
    val tta = sorted.indices.map { i =>
      val s = (ta * qa2(i) - da).abs / ka
      BigInt(sorted(i)._2) * s * s
    }.sum
    val ttb = sorted.indices.map { i =>
      val s = (tb * qb2(i) - db).abs / kb
      BigInt(sorted(i)._3) * s * s
    }.sum
    val taD = BigDecimal(ta); val tbD = BigDecimal(tb)
    val s2a = (BigDecimal(ka) * BigDecimal(ka) * BigDecimal(tta) /
      (4 * taD * taD * (taD - 1))).toDouble
    val s2b = (BigDecimal(kb) * BigDecimal(kb) * BigDecimal(ttb) /
      (4 * tbD * tbD * (tbD - 1))).toDouble
    val rdiff = (BigDecimal(db) / (2 * tbD) - BigDecimal(da) / (2 * taD) +
      (tbD - taD) / 2).toDouble
    val den = taD.toDouble * s2a + tbD.toDouble * s2b
    val expected = taD.toDouble * tbD.toDouble * rdiff /
      ((taD + tbD).toDouble * math.sqrt(den))
    val got = r.getAs[Double]("w_stat")
    assert(math.abs(got - expected) <= math.abs(expected) * 1e-6 + 1e-5,
      s"w_stat=$got expected=$expected")
    val pHat = r.getAs[Double]("p_hat")
    val pExp = (BigDecimal(db) / (2 * taD * tbD)).toDouble
    assert(math.abs(pHat - pExp) < 1e-5)
  }

  test("energy-distance K-rescaled value-sum weights survive the envelope") {
    val out = graft.operators.DriftQueries.energyDistanceFrom(groupedDf)
      .collect()
    graft.engine.Pins.releaseAll()
    val r = out.head
    for (c <- Seq("e_xy", "e_xx", "e_yy", "energy_d"))
      assert(!r.isNullAt(r.fieldIndex(c)), s"$c is NULL - silent overflow")
    // replay with the SAME K (sign-split flooring on the abs'd operand)
    val maxAbs = sorted.map(v => BigInt(v._1).abs).max
    val n = ta + tb
    val k = (n * maxAbs / BigInt("1000000000000000")).max(BigInt(1))
    assert(k > BigInt(1),
      "fixture must actually engage the rescale (K > 1)")
    def resc(w: BigInt, vq: Long): BigInt =
      if (vq >= 0) w * BigInt(vq) / k else -(w * BigInt(-vq) / k)
    val sa = sorted.map(v => resc(BigInt(v._2), v._1))
    val sb = sorted.map(v => resc(BigInt(v._3), v._1))
    // rescaled prefix sums must fit a Long (that is the CONTRACT the
    // rescale exists to guarantee for Dist's Long-typed weights)
    val csa = sa.scanLeft(BigInt(0))(_ + _).tail
    val csb = sb.scanLeft(BigInt(0))(_ + _).tail
    assert((csa ++ csb).forall(v => v.abs < BigInt(Long.MaxValue)),
      "rescaled prefix sums exceed Long - the K bound is wrong")
    val sta = sa.sum; val stb = sb.sum
    def cross(w: Int => BigInt, cc: Seq[BigInt], cs: Seq[BigInt],
              st: BigInt, to: BigInt): BigInt =
      sorted.indices.map { i =>
        w(i) * (BigInt(sorted(i)._1) * (2 * cc(i) - to) +
          k * (st - 2 * cs(i)))
      }.sum
    val sxy = cross(i => BigInt(sorted(i)._2), cumB, csb, stb, tb)
    val sxx = cross(i => BigInt(sorted(i)._2), cumA, csa, sta, ta)
    val syy = cross(i => BigInt(sorted(i)._3), cumB, csb, stb, tb)
    val eXy = (BigDecimal(sxy) / (BigDecimal(ta) * BigDecimal(tb) * 1000))
      .toDouble
    val eXx = (BigDecimal(sxx) / (BigDecimal(ta) * BigDecimal(ta) * 1000))
      .toDouble
    val eYy = (BigDecimal(syy) / (BigDecimal(tb) * BigDecimal(tb) * 1000))
      .toDouble
    def close(got: Double, exp: Double, name: String): Unit =
      assert(math.abs(got - exp) <= math.abs(exp) * 1e-9 + 1e-5,
        s"$name=$got expected=$exp")
    close(r.getAs[Double]("e_xy"), eXy, "e_xy")
    close(r.getAs[Double]("e_xx"), eXx, "e_xx")
    close(r.getAs[Double]("e_yy"), eYy, "e_yy")
    close(r.getAs[Double]("energy_d"), 2 * eXy - eXx - eYy, "energy_d")
    // the approximation the rescale introduces must stay negligible
    // relative to the exact (unrescaled, BigInt) statistic
    def crossExact(w: Int => BigInt, cc: Seq[BigInt], csE: Seq[BigInt],
                   stE: BigInt, to: BigInt): BigInt =
      sorted.indices.map { i =>
        w(i) * (BigInt(sorted(i)._1) * (2 * cc(i) - to) + (stE - 2 * csE(i)))
      }.sum
    val saE = sorted.map(v => BigInt(v._2) * BigInt(v._1))
    val sbE = sorted.map(v => BigInt(v._3) * BigInt(v._1))
    val csaE = saE.scanLeft(BigInt(0))(_ + _).tail
    val csbE = sbE.scanLeft(BigInt(0))(_ + _).tail
    val sxyE = crossExact(i => BigInt(sorted(i)._2), cumB, csbE, sbE.sum, tb)
    val eXyExact =
      (BigDecimal(sxyE) / (BigDecimal(ta) * BigDecimal(tb) * 1000)).toDouble
    assert(math.abs(eXy - eXyExact) <= math.abs(eXyExact) * 1e-9,
      s"rescale error visible at 1e-9: rescaled=$eXy exact=$eXyExact")
  }

  test("sign discipline: spark div on abs'd operands == flooring division") {
    // the class' root hazard in one row: Spark `div` truncates toward
    // zero, DuckDB `//` floors - they DISAGREE on negative operands
    // ((-7) div 2 = -3 vs -4) and agree after abs. Pin both facts so a
    // future fold that drops the abs fails here, not in a driver run.
    val r = spark.sql(
      "SELECT (-7) div 2 AS trunc_neg, abs(-7) div 2 AS abs_first").head()
    assert(r.getLong(0) == -3L, "Spark div no longer truncates")
    assert(r.getLong(1) == 3L)
    assert(BigInt(-7) / BigInt(2) == BigInt(-3)) // BigInt truncates too
    // DuckDB floors: (-7)//2 = -4 (checked in tools/check_oracle runs);
    // after abs both engines compute 3 - the discipline under test.
  }
}
