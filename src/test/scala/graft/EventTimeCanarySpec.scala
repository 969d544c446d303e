package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Tables

/** Fixture-schema canary (VERDICT r8 punch-list #2): the driver has shipped
  * `events.ts` under two encodings across corpus regenerations — bigint
  * epoch-nanoseconds (Parquet INT64 TIMESTAMP(NANOS) + nanosAsLong) and
  * native timestamp[us] (TIMESTAMP_NTZ in Spark). A silent re-encode broke
  * all 30 event-time/streaming queries in round 8. This spec pins that
  * `Tables.withEventTime` accepts BOTH encodings and derives identical
  * canonical `ts_us`/`ts_t` from each, and that the live corpus parses.
  */
class EventTimeCanarySpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  // one value each side of a microsecond boundary, plus epoch and a
  // far-future value — micros chosen so ns = us*1000 round-trips exactly
  private val micros = Seq(0L, 1L, 1755108000000000L, 4102444800123456L)

  private def roundTrip(df: org.apache.spark.sql.DataFrame,
                        dir: String): org.apache.spark.sql.DataFrame = {
    df.write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  test("withEventTime: bigint-ns and timestamp-us fixtures agree") {
    val tmp = java.nio.file.Files.createTempDirectory("canary").toString

    // encoding 1: bigint nanoseconds (legacy corpus)
    val nsDf = micros.map(_ * 1000L).toDF("ts")
    val nsRead = roundTrip(nsDf, s"$tmp/ns")
    assert(nsRead.schema("ts").dataType == LongType)

    // encoding 2: native timestamp[us] (current corpus; NTZ like the
    // driver's pyarrow writer produces)
    val usDf = micros.toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
    val usRead = roundTrip(usDf, s"$tmp/us")
    assert(usRead.schema("ts").dataType.isInstanceOf[TimestampNTZType.type]
        || usRead.schema("ts").dataType == TimestampType)

    val fromNs = Tables.withEventTime(nsRead)
      .select($"ts_us", $"ts_t".cast("string").as("t"))
      .orderBy($"ts_us").collect()
    val fromUs = Tables.withEventTime(usRead)
      .select($"ts_us", $"ts_t".cast("string").as("t"))
      .orderBy($"ts_us").collect()

    assert(fromNs.map(_.getLong(0)).toSeq == micros.sorted)
    assert(fromUs.map(_.getLong(0)).toSeq == micros.sorted)
    assert(fromNs.map(_.getString(1)).toSeq ==
           fromUs.map(_.getString(1)).toSeq)
  }

  test("live corpus events.parquet parses through withEventTime") {
    val df = Tables.eventsWithTime(spark, SparkFixture.sfDir)
    // analysis must succeed and ts_us must be micros-scale (year 2000+
    // epochs are > 9.4e14 us but < 9.4e17 ns — catches a unit mixup)
    val r = df.agg(min("ts_us"), max("ts_us")).collect().head
    assert(r.getLong(0) > 9e14.toLong && r.getLong(1) < 9e16.toLong,
      s"ts_us out of micros range: $r")
    assert(df.schema("ts_t").dataType == TimestampType)
  }
}
