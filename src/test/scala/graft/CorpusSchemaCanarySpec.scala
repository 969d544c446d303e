package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

/** Corpus schema canary: the driver regenerates /root/testdata between
  * rounds, and a silent re-encoding of a column the engine depends on is
  * a whole-family outage (r8: events.ts flipped INT64-nanos →
  * timestamp[us] and killed all 30 event-time/streaming queries at
  * analysis time). EventTimeCanarySpec covers the ts fix specifically;
  * this spec names every OTHER load-bearing dtype assumption so the next
  * drift fails as ONE diagnostic test naming the column, not as dozens
  * of cryptic downstream analysis errors.
  *
  * Each assertion lists the dtypes the engine genuinely handles — widen
  * the set (and the consuming code) rather than pinning the current
  * corpus byte-for-byte.
  */
class CorpusSchemaCanarySpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private def schema(t: String) =
    spark.read.parquet(s"${SparkFixture.sfDir}/$t.parquet").schema

  private def assertType(t: String, c: String, ok: Set[DataType]): Unit = {
    val dt = schema(t)(c).dataType
    assert(ok.contains(dt),
      s"CORPUS DRIFT: $t.$c is $dt; engine handles ${ok.mkString("/")} — " +
      "audit every consumer before widening this set")
  }

  test("documents: ids are long, text/lang/source are strings") {
    assertType("documents", "doc_id", Set(LongType))
    assertType("documents", "text", Set(StringType))
    assertType("documents", "lang", Set(StringType))
    assertType("documents", "source", Set(StringType))
    assertType("documents", "n_chars", Set(LongType))
  }

  test("embeddings: vec_id long, embedding array<float|double>, label int") {
    assertType("embeddings", "vec_id", Set(LongType))
    assertType("embeddings", "label", Set(IntegerType, LongType))
    val dt = schema("embeddings")("embedding").dataType
    assert(dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }, s"CORPUS DRIFT: embeddings.embedding is $dt; engine casts " +
       "array<float|double> via Vectors.asDouble")
  }

  test("events: the non-ts columns the 30 event-time queries read") {
    // ts itself is covered (both encodings) by EventTimeCanarySpec
    assertType("events", "event_id", Set(LongType))
    assertType("events", "user_id", Set(LongType))
    assertType("events", "event_type", Set(StringType))
    assertType("events", "value", Set(DoubleType))
    assertType("events", "props", Set(StringType))
  }

  test("orders/lineitem: the date columns stay timestamp-family") {
    // q_date_funcs / windows / DPP compare these against DuckDB as NTZ;
    // a silent flip to DATE would change arithmetic semantics
    val okDate: Set[DataType] = Set(TimestampNTZType, TimestampType, DateType)
    assertType("orders", "o_orderdate", okDate)
    assertType("lineitem", "l_shipdate", okDate)
    assertType("orders", "o_orderkey", Set(LongType))
    assertType("orders", "o_custkey", Set(LongType))
    assertType("orders", "o_totalprice", Set(DoubleType))
    assertType("lineitem", "l_quantity", Set(LongType, DoubleType))
  }
}
