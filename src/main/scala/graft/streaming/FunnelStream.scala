package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time conversion funnel over a live stream — the streaming twin of
  * [[graft.operators.Analytics.funnel]]. Events may arrive out of order, and
  * the greedy first-touch chaining is order-sensitive, so per-user events
  * buffer in state and replay in event-time order only once the user goes
  * quiet: an event-time timeout at (user's latest event + `quiesceMs`)
  * fires when the watermark passes it, emitting one [[FunnelStream.StepReach]]
  * row per step the user reached, then dropping the state.
  *
  * Scale shape: only events whose type is a funnel step enter state (the
  * pre-filter runs before the shuffle), state is partitioned by user like
  * every other per-user stage, and a user's buffer is bounded by their
  * step-event volume inside one quiesce horizon — the same bound any
  * funnel-on-stream system carries. Exactly-once: emission happens once per
  * user per quiesce window, keyed by the state lifecycle, so the downstream
  * aggregate sees each user once.
  */
object FunnelStream {

  /** One funnel step reached by one user. */
  case class StepReach(user_id: Long, step: Int, step_name: String)

  /** Buffered (event_type, ts_ms) step events for one in-flight user. */
  case class FunnelBuf(events: Seq[(String, Long)])

  /** `events` must carry (user_id, event_type, ts_ms); may be streaming or
    * batch (in batch every group replays immediately — same answer, no
    * state). */
  def reaches(events: DataFrame, steps: Seq[String],
              windowMs: Option[Long], quiesceMs: Long): Dataset[StepReach] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .select(col("user_id").cast("long").as("user_id"), col("event_type"),
              col("ts_ms").cast("long").as("ts_ms"))
      .where(col("event_type").isin(steps: _*))
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withWatermark("ts", "0 seconds")
      // the event-time column must stay in the grouped Dataset — dropping
      // it here would drop the watermark and event-time timeouts with it
      .as[(Long, String, Long, java.sql.Timestamp)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[FunnelBuf, StepReach](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, it: Iterator[(Long, String, Long, java.sql.Timestamp)],
         state: GroupState[FunnelBuf]) =>
          if (state.hasTimedOut) {
            val buf = state.get.events
            state.remove()
            replay(user, buf, steps, windowMs)
          } else {
            val buf = state.getOption.map(_.events).getOrElse(Seq.empty) ++
              it.map(e => (e._2, e._3))
            state.update(FunnelBuf(buf))
            state.setTimeoutTimestamp(buf.iterator.map(_._2).max + quiesceMs)
            Iterator.empty
          }
      }
  }

  /** Greedy first-touch replay — the exact batch semantics of
    * `Analytics.funnel` applied to one user's buffered events: reach time
    * of step i+1 is the MINIMUM qualifying ts strictly after step i's
    * (within the window when bounded). */
  private def replay(user: Long, events: Seq[(String, Long)],
                     steps: Seq[String],
                     windowMs: Option[Long]): Iterator[StepReach] = {
    val out = Seq.newBuilder[StepReach]
    var tPrev = Long.MinValue
    var alive = true
    steps.zipWithIndex.foreach { case (st, i) =>
      if (alive) {
        val cand = events.collect { case (t, ts) if t == st &&
          (i == 0 || (ts > tPrev && windowMs.forall(w => ts <= tPrev + w))) => ts }
        if (cand.isEmpty) alive = false
        else { tPrev = cand.min; out += StepReach(user, i + 1, st) }
      }
    }
    out.result().iterator
  }
}
