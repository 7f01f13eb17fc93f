package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream correlation joins.
  *
  * The reference processes one event at a time per pipeline, so
  * cross-stream correlation ("purchases attributed to the views that
  * preceded them") has no counterpart there; on Spark it is a first-class
  * Structured Streaming capability and a training-data pipeline needs it
  * (joining impression and interaction streams, correlating log sources).
  *
  * State stays bounded because BOTH sides carry a watermark and the join
  * condition bounds event-time distance: Spark can discard buffered left
  * rows once `watermark > leftTs + upper` and right rows once
  * `watermark > rightTs - lower`, so at 100 TB/day the state store holds
  * only the interval's worth of data per key, not the stream history.
  */
object StreamJoins {

  /** Interval join: rows pair when they share `keyCol` and
    * `rightTs ∈ [leftTs + lowerMs, leftTs + upperMs)` (half-open, event
    * time). Works identically on batch frames (`withWatermark` is defined
    * as a no-op in batch queries) — the correctness gate runs the batch
    * twins through this exact code path while the live path is spec-driven
    * with MemoryStreams.
    *
    * `joinType` may be `inner`, `left_outer`, `right_outer`, or
    * `full_outer` (the types Structured Streaming supports for
    * stream-stream joins). Outer results for unmatched rows emit only once
    * the watermark passes the row's join window — the stream must keep
    * moving for the NULL-padded rows to flush, which is inherent to the
    * model, not a graft choice.
    *
    * Both timestamp columns must be TIMESTAMP-typed (use
    * `timestamp_millis` to lift epoch-ms longs). The duplicate right-side
    * key column is dropped from the output (coalesced into the left name
    * for outer types, so right-only rows keep their key). */
  def intervalJoin(left: DataFrame, leftTsCol: String, leftDelay: String,
                   right: DataFrame, rightTsCol: String, rightDelay: String,
                   keyCol: String, lowerMs: Long, upperMs: Long,
                   joinType: String = "inner"): DataFrame = {
    require(lowerMs < upperMs,
      s"empty interval: lowerMs=$lowerMs must be < upperMs=$upperMs")
    require(Set("inner", "left_outer", "right_outer", "full_outer")(joinType),
      s"unsupported stream-stream join type: $joinType")
    val l = left.withWatermark(leftTsCol, leftDelay)
    // EVERY right-side column whose name also exists on the left is
    // renamed: two streams sharing a schema (the common case — joining a
    // topic with itself, or two topics with the same event envelope) would
    // otherwise die with AMBIGUOUS_REFERENCE at the first downstream
    // reference, or produce duplicate output names no sink can write. The
    // key and timestamp get internal names (restored/merged below); other
    // collisions keep a `_r` suffix in the output.
    val otherCollisions = (right.columns.toSet intersect left.columns.toSet) -
      keyCol - rightTsCol
    otherCollisions.foreach(c => require(
      !left.columns.contains(c + "_r") && !right.columns.contains(c + "_r"),
      s"cannot disambiguate shared column '$c': '${c}_r' is also taken"))
    val r = otherCollisions.foldLeft(
        right.withWatermark(rightTsCol, rightDelay)
          .withColumnRenamed(keyCol, "__graft_rkey")
          .withColumnRenamed(rightTsCol, "__graft_rts")) {
      (df, c) => df.withColumnRenamed(c, c + "_r")
    }
    val joined = l.join(r,
        col(keyCol) === col("__graft_rkey") &&
        col("__graft_rts") >= col(leftTsCol) +
          expr(s"INTERVAL $lowerMs MILLISECONDS") &&
        col("__graft_rts") < col(leftTsCol) +
          expr(s"INTERVAL $upperMs MILLISECONDS"),
        joinType)
      .withColumn(keyCol, coalesce(col(keyCol), col("__graft_rkey")))
      .drop("__graft_rkey")
    // restore the right timestamp's name; whenever the LEFT side also
    // carries a column of that name (its own timestamp, or any other
    // left column that happens to share it) the right one comes back
    // suffixed `_r` like every other collision
    val rtsOut =
      if (left.columns.contains(rightTsCol)) rightTsCol + "_r" else rightTsCol
    require(rtsOut == rightTsCol ||
      (!left.columns.contains(rtsOut) && !right.columns.contains(rtsOut)),
      s"cannot disambiguate right timestamp '$rightTsCol': '$rtsOut' is also taken")
    joined.withColumnRenamed("__graft_rts", rtsOut)
  }
}
