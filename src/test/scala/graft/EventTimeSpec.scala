package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.EventTime

/** The events table has shipped `ts` as int64-nanos (BIGINT under
  * nanosAsLong) and as timestamp[µs] (TIMESTAMP_NTZ) across testdata
  * generations; the round-6 regression was nine temporal queries assuming
  * the long layout against µs data. EventTime must produce identical
  * epoch-ms for the same instant under every layout. */
class EventTimeSpec extends SparkSpec {
  import spark.implicits._

  // instants with sub-ms precision to prove floor semantics, plus the
  // epoch boundary and a value above 2^53 µs (double-precision trap zone)
  private val micros = Seq(0L, 999L, 1000L, 1749000000123456L,
    1749000000999999L, (1L << 53) + 777123L)

  test("long-nanos layout and timestamp[µs] layout agree on epoch ms") {
    val nanosDf = micros.map(_ * 1000L).toDF("ts") // BIGINT nanos
    // timestamp_micros builds the LTZ instant; the NTZ cast under the UTC
    // session renders it as the UTC wall clock — the parquet µs layout
    val tsDf = micros.toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
    assert(tsDf.schema("ts").dataType == TimestampNTZType)
    val fromNanos = EventTime.withEpochMs(nanosDf).select("ts_ms")
      .as[Long].collect().toSeq
    val fromTs = EventTime.withEpochMs(tsDf).select("ts_ms")
      .as[Long].collect().toSeq
    val expected = micros.map(_ / 1000L) // floor, exact integer arithmetic
    assert(fromNanos == expected)
    assert(fromTs == expected)
  }

  test("plain TIMESTAMP (LTZ) layout also projects exactly") {
    val df = micros.toDF("us")
      .select(timestamp_micros(col("us")).as("ts"))
    val got = EventTime.withEpochMs(df).select("ts_ms").as[Long].collect().toSeq
    assert(got == micros.map(_ / 1000L))
  }

  test("unsupported layout fails loud, not silently wrong") {
    val df = Seq("2024-01-01").toDF("ts")
    val e = intercept[IllegalArgumentException](EventTime.withEpochMs(df))
    assert(e.getMessage.contains("unsupported type"))
  }
}
