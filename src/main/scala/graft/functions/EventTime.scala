package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Exact epoch-millisecond projection for the event-time column, adaptive to
  * the physical layout the data shipped with. The testdata has used two
  * encodings for `events.ts` across generations:
  *
  *   - parquet int64 **nanoseconds**, surfaced as BIGINT under
  *     `spark.sql.legacy.parquet.nanosAsLong=true` (Spark has no ns
  *     timestamp type) — epoch ms is integer division by 10⁶ (`/` on longs
  *     would round-trip through double and lose precision above 2^53);
  *   - parquet timestamp[**µs**], surfaced as TIMESTAMP_NTZ — epoch ms is
  *     `unix_millis` after an NTZ→LTZ cast. The NTZ wall clock IS the UTC
  *     instant and every session in this project pins
  *     `spark.sql.session.timeZone=UTC`, so the cast is identity on the
  *     instant; `unix_millis` truncates sub-ms exactly like the DuckDB
  *     oracle's `epoch_ms` (both floor, so the engines agree bit-for-bit).
  *
  * A library must read both without the caller knowing which generation of
  * data is underneath — this is the single place that knows the rule.
  */
object EventTime {

  /** Column expression computing exact epoch millis from `tsCol` of the
    * given type. Fails loud on a type this projection cannot make exact. */
  def epochMs(tsCol: String, dt: DataType): Column = dt match {
    case LongType                          =>
      // floor division (DIV truncates toward zero; pre-epoch instants must
      // floor to agree with unix_millis and DuckDB's epoch_ms)
      expr(s"$tsCol DIV 1000000 - (CASE WHEN $tsCol % 1000000 < 0 THEN 1 ELSE 0 END)")
    case TimestampNTZType | TimestampType  => expr(s"unix_millis(cast($tsCol as timestamp))")
    case other => throw new IllegalArgumentException(
      s"EventTime.epochMs: unsupported type $other for column $tsCol " +
      "(expected BIGINT nanos or a timestamp)")
  }

  /** `df` plus `outCol` = exact epoch millis of `tsCol` (schema-adaptive). */
  def withEpochMs(df: DataFrame, tsCol: String = "ts",
                  outCol: String = "ts_ms"): DataFrame =
    df.withColumn(outCol, epochMs(tsCol, df.schema(tsCol).dataType))
}
