package graft.streaming

import org.apache.spark.sql.streaming.GroupState

/** Streaming first/last-touch attribution — the live twin of
  * [[graft.operators.Analytics.attribution]]: per-user touch state carried
  * across micro-batches with `flatMapGroupsWithState`, conversions credited
  * the moment they arrive. The pipeline shape the reference's
  * interceptor/sink chain would feed (atiesh routes the event stream;
  * attribution is the stateful analytics consumer on top —
  * `semantics/src/main/scala/atiesh/sink/BatchSinkSemantics.scala:79-118`
  * is the nearest reference analogue of per-key carried state).
  *
  * Ordering contract: micro-batches must arrive in event-time order
  * (time-sliced ingestion — the normal shape of a replayed log), and each
  * batch's per-user slice is sorted in memory here before folding, so the
  * emitted credits are IDENTICAL to the batch operator over the
  * concatenated input. Per-user state is two touch-type strings — KBs per
  * million users in the state store; the in-memory sort is bounded by one
  * user's events within one micro-batch (never the whole history).
  */
object Attribution {

  /** Input record (column names match the gate's parquet chunks). */
  case class In(user_id: Long, event_id: Long, ts_ms: Long,
                event_type: String, value_cents: Long)

  /** Carried per-user state: first and most recent touch type seen so
    * far; null = no touch yet (Option would be cleaner Scala but null
    * keeps the state-store encoder flat). */
  case class TouchState(first: String, last: String)

  /** One emitted credit per attributable conversion. */
  case class Credit(user_id: Long, first_touch: String, last_touch: String,
                    cents: Long)

  /** The per-group fold: touches update state, conversions with a prior
    * touch emit a credit carrying the CURRENT first/last attribution. */
  def creditsPerGroup(touches: Set[String], conversion: String)(
      user: Long, rows: Iterator[In],
      st: GroupState[TouchState]): Iterator[Credit] = {
    var s = st.getOption.getOrElse(TouchState(null, null))
    val out = scala.collection.mutable.ArrayBuffer.empty[Credit]
    rows.toSeq.sortBy(r => (r.ts_ms, r.event_id)).foreach { r =>
      if (touches(r.event_type)) {
        s = TouchState(if (s.first == null) r.event_type else s.first,
                       r.event_type)
      } else if (r.event_type == conversion && s.last != null) {
        out += Credit(user, s.first, s.last, r.value_cents)
      }
    }
    st.update(s)
    out.iterator
  }
}
