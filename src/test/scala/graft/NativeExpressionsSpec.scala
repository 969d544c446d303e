package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.NativeExpressions

/** The native codegen expressions must agree exactly with the interpreted
  * Spark formulations they replace — including FP summation order for the
  * dot product (bit-identical, not approximately equal), since oracle
  * hashes compare exact doubles. Batched property runs: Spark jobs are
  * too slow for per-case round trips, so each property collects its
  * random cases into ONE DataFrame and compares columns.
  */
class NativeExpressionsSpec extends AnyFunSuite {
  import SparkFixture.spark
  import spark.implicits._

  test("dot == interpreted aggregate(zip_with(...)) bit-for-bit") {
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-1e3, 1e3))
    val cases = Gen.listOfN(50, Gen.zip(vecGen, vecGen)).sample.get
    val df = cases.toDF("a", "b")
    val rows = df.select(
        NativeExpressions.dot(col("a"), col("b")),
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x))
      .as[(Double, Double)].collect()
    rows.foreach { case (native, hof) =>
      assert(java.lang.Double.doubleToLongBits(native) ==
        java.lang.Double.doubleToLongBits(hof))
    }
  }

  test("dot handles empty and null arrays") {
    val df = Seq((Some(Seq.empty[Double]), Some(Seq.empty[Double])),
                 (None, Some(Seq(1.0)))).toDF("a", "b")
    val out = df.select(NativeExpressions.dot(col("a"), col("b")))
      .as[Option[Double]].collect()
    assert(out(0).contains(0.0) && out(1).isEmpty)
  }

  test("dot matches HOF semantics on unequal lengths and null elements") {
    // aggregate(zip_with(...)) null-pads shorter arrays and propagates
    // null elements to a NULL result; the native expression must agree
    // (the rewrite rule advertises bit-equal behavior on ALL inputs)
    val df = spark.sql(
      """SELECT a, b FROM VALUES
        |  (array(1.0d, 2.0d), array(3.0d)),
        |  (array(1.0d, cast(null AS double)), array(3.0d, 4.0d)),
        |  (array(), array(1.0d))
        |AS t(a, b)""".stripMargin)
    val rows = df.select(
        NativeExpressions.dot(col("a"), col("b")),
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x))
      .as[(Option[Double], Option[Double])].collect()
    rows.foreach { case (native, hof) => assert(native == hof) }
    assert(rows.forall(_._1.isEmpty), "all edge rows must be NULL")
  }

  test("sortedIntersectCount == size(array_intersect) on sorted distinct") {
    val listGen = Gen.listOf(Gen.chooseNum(-100, 100))
    val cases = Gen.listOfN(100, Gen.zip(listGen, listGen)).sample.get
      .map { case (a, b) => (a.distinct.sorted, b.distinct.sorted) }
    val df = cases.toDF("a", "b")
    val rows = df.select(
        NativeExpressions.sortedIntersectCount(col("a"), col("b")),
        size(array_intersect(col("a"), col("b"))))
      .as[(Int, Int)].collect()
    rows.foreach { case (native, builtin) => assert(native == builtin) }
  }

  test("sortedIntersectCountBounded == exact count gated on the threshold") {
    val listGen = Gen.listOf(Gen.chooseNum(-100, 100))
    val cases = Gen.listOfN(200,
        Gen.zip(listGen, listGen, Gen.chooseNum(0, 40))).sample.get
      .map { case (a, b, n) => (a.distinct.sorted, b.distinct.sorted, n) }
    val df = cases.toDF("a", "b", "need")
    val rows = df.select(
        NativeExpressions.sortedIntersectCountBounded(
          col("a"), col("b"), col("need")),
        size(array_intersect(col("a"), col("b"))), col("need"))
      .as[(Int, Int, Int)].collect()
    rows.foreach { case (bounded, exact, need) =>
      assert(bounded == (if (exact >= need) exact else -1),
        s"need=$need exact=$exact bounded=$bounded")
    }
  }

  test("sortedIntersectCountLongBounded == exact count gated on the threshold") {
    val listGen = Gen.listOf(Gen.oneOf(
      Gen.chooseNum(-100L, 100L), Gen.chooseNum(Long.MinValue, Long.MaxValue)))
    val cases = Gen.listOfN(200,
        Gen.zip(listGen, listGen, Gen.chooseNum(0, 40))).sample.get
      .map { case (a, b, n) => (a.distinct.sorted, b.distinct.sorted, n) }
    val df = cases.toDF("a", "b", "need")
    val rows = df.select(
        NativeExpressions.sortedIntersectCountLongBounded(
          col("a"), col("b"), col("need")),
        size(array_intersect(col("a"), col("b"))), col("need"))
      .as[(Int, Int, Int)].collect()
    rows.foreach { case (bounded, exact, need) =>
      assert(bounded == (if (exact >= need) exact else -1),
        s"need=$need exact=$exact bounded=$bounded")
    }
  }

  test("sortedIntersectCountLong == size(array_intersect) on sorted distinct") {
    // long extremes included: the merge compares signed longs, and the
    // shingle hashes it serves routinely have the top bit set
    val listGen = Gen.listOf(Gen.oneOf(
      Gen.chooseNum(-100L, 100L), Gen.chooseNum(Long.MinValue, Long.MaxValue)))
    val cases = Gen.listOfN(100, Gen.zip(listGen, listGen)).sample.get
      .map { case (a, b) => (a.distinct.sorted, b.distinct.sorted) }
    val df = cases.toDF("a", "b")
    val rows = df.select(
        NativeExpressions.sortedIntersectCountLong(col("a"), col("b")),
        size(array_intersect(col("a"), col("b"))))
      .as[(Int, Int)].collect()
    rows.foreach { case (native, builtin) => assert(native == builtin) }
  }

  test("trigramCodes == distinct sorted substring trigrams (ASCII)") {
    val asciiText = Gen.listOf(Gen.frequency(
      8 -> Gen.alphaLowerChar, 2 -> Gen.const(' '))).map(_.mkString)
    val cases = Gen.listOfN(100, asciiText).sample.get
    val df = cases.toDF("t")
    val rows = df.select(col("t"), NativeExpressions.trigramCodes(
        encode(col("t"), "UTF-8"))).as[(String, Seq[Int])].collect()
    rows.foreach { case (t, native) =>
      val expected = t.getBytes("UTF-8").sliding(3).filter(_.length == 3)
        .map(b => ((b(0) & 0xff) << 16) | ((b(1) & 0xff) << 8) | (b(2) & 0xff))
        .toSeq.distinct.sorted
      assert(native == expected, s"input: '$t'")
    }
  }

  test("trigramCodes: empty and short input yield empty arrays") {
    val df = Seq("", "ab").toDF("t")
    val out = df.select(NativeExpressions.trigramCodes(
        encode(col("t"), "UTF-8"))).as[Seq[Int]].collect()
    assert(out.forall(_.isEmpty))
  }

  test("SentenceSplit generator: delimiter, numbering, and edge semantics") {
    val cases = Seq(
      // plain sentences: delimiter consumed, pos numbers kept segments
      "One. Two! Three? Four" ->
        Seq((0L, "One"), (1L, "Two"), (2L, "Three"), (3L, "Four")),
      // punct run collapses to one delimiter; trailing punct w/o ws kept
      "Wait... really?! Yes." ->
        Seq((0L, "Wait"), (1L, "really"), (2L, "Yes.")),
      // punct not followed by whitespace does not split (a.b, $3.50)
      "Pay $3.50 now. Version a.b ships" ->
        Seq((0L, "Pay $3.50 now"), (1L, "Version a.b ships")),
      // leading delimiter yields an empty first segment — dropped,
      // numbering starts at the first kept segment
      ". Lead gone. Tail" -> Seq((0L, "Lead gone"), (1L, "Tail")),
      // back-to-back delimiters produce an empty mid segment — dropped
      "A. ! B" -> Seq((0L, "A"), (1L, "B")),
      // CRLF and tabs count as whitespace
      "Line one.\r\n\tLine two" -> Seq((0L, "Line one"), (1L, "Line two")),
      // no delimiter at all: one segment, pos 0
      "no punctuation here" -> Seq((0L, "no punctuation here")),
      // empty text: no rows
      "" -> Seq.empty)
    cases.foreach { case (text, expected) =>
      val got = Seq(text).toDF("t")
        .select(NativeExpressions.sentences(col("t"))
          .as(Seq("pos", "sentence")))
        .as[(Long, String)].collect().toSeq
      assert(got == expected, s"input: '$text'")
    }
    // null text emits no rows (matches unnest(NULL) in the oracle)
    val nullGot = Seq[Option[String]](None).toDF("t")
      .select(NativeExpressions.sentences(col("t"))
        .as(Seq("pos", "sentence"))).collect()
    assert(nullGot.isEmpty)
  }

  test("graft_sentences SQL registration: LATERAL VIEW path matches Column API") {
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    val df = Seq((1L, "Alpha. Beta! Gamma"), (2L, "Solo")).toDF("id", "t")
    df.createOrReplaceTempView("ne_sent_docs")
    val sql = spark.sql(
      """SELECT id, s.pos, s.sentence FROM ne_sent_docs
        |LATERAL VIEW graft_sentences(t) s AS pos, sentence
        |ORDER BY id, pos""".stripMargin)
      .as[(Long, Long, String)].collect().toSeq
    val api = df.select(col("id"), NativeExpressions.sentences(col("t"))
        .as(Seq("pos", "sentence")))
      .orderBy(col("id"), col("pos"))
      .as[(Long, Long, String)].collect().toSeq
    assert(sql == api)
    assert(sql == Seq((1L, 0L, "Alpha"), (1L, 1L, "Beta"),
      (1L, 2L, "Gamma"), (2L, 0L, "Solo")))
  }

  test("minHashSignature rejects non-positive perms with a clear message") {
    val df = Seq("a b c d e f g").toDF("t")
    val bad = df.select(NativeExpressions.minHashSignature(
      NativeExpressions.shingleHashes(encode(col("t"), "UTF-8"), lit(5)),
      lit(0)))
    val e = intercept[Exception](bad.collect())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("perms must be > 0")),
      s"unexpected failure: $e")
  }
}
