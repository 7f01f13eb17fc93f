package graft.streaming

import org.apache.spark.sql.streaming.GroupState

/** Streaming cohort-LTV feed — the live twin of
  * [[graft.operators.Analytics.cohortLtv]]: each user's first-seen cohort
  * bucket is carried as per-key state across micro-batches
  * (`flatMapGroupsWithState`), a membership record is emitted the moment a
  * user first appears, and every purchase is emitted against the carried
  * cohort as it arrives — so the downstream (cohort, age) rollup equals
  * the batch triangle over the concatenated input, bit for bit.
  *
  * Ordering contract (same as [[Attribution]]): micro-batches arrive in
  * event-time order (a replayed log's natural shape) and each batch's
  * per-user slice is sorted in memory before folding, so "first seen" is
  * exact. State is ONE long per user; the in-memory sort is bounded by one
  * user's events within one micro-batch.
  */
object CohortLtv {

  /** Input record (column names match the gate's parquet chunks). */
  case class In(user_id: Long, event_id: Long, ts_ms: Long,
                event_type: String, value_cents: Long)

  /** Carried state: the user's first-seen cohort bucket. */
  case class CohortState(cohort: Long)

  /** Emitted record: `kind` = "new" (one per user, at first sight) or
    * "buy" (one per purchase, carrying the purchase's own time bucket). */
  case class Emit(user_id: Long, kind: String, cohort: Long, bucket: Long,
                  cents: Long)

  /** Per-user fold: assign the cohort on first sight, emit purchases
    * against the carried cohort. `/` on the non-negative ts matches the
    * batch operator's `DIV`. */
  def perGroup(purchaseType: String, bucketMs: Long)(
      user: Long, rows: Iterator[In],
      st: GroupState[CohortState]): Iterator[Emit] = {
    val sorted = rows.toSeq.sortBy(r => (r.ts_ms, r.event_id))
    if (sorted.isEmpty) Iterator.empty
    else {
      val out = scala.collection.mutable.ArrayBuffer.empty[Emit]
      val coh = st.getOption.map(_.cohort).getOrElse {
        val c = sorted.head.ts_ms / bucketMs
        out += Emit(user, "new", c, c, 0L)
        c
      }
      sorted.foreach { r =>
        if (r.event_type == purchaseType)
          out += Emit(user, "buy", coh, r.ts_ms / bucketMs, r.value_cents)
      }
      st.update(CohortState(coh))
      out.iterator
    }
  }
}
