package graft.streaming

import org.apache.spark.sql.streaming.GroupState

/** Live CUSUM drift monitor — the streaming twin of
  * [[graft.operators.Analytics.cusumChangepoints]] in its deployed
  * (fixed-baseline) form: the two accumulators, alarm counters, and peaks
  * are carried as per-group state across micro-batches, so the monitor
  * fires the moment a sustained shift accumulates instead of at
  * end-of-day batch time. Self-calibrating CUSUM (target = the series'
  * own mean) is inherently batch — the fixed target is exactly what makes
  * the fold streamable, and production monitors use a historical baseline
  * anyway.
  *
  * Ordering contract (same as [[Attribution]]/[[CohortLtv]]): micro-batch
  * boundaries are bucket-aligned and arrive in event-time order; each
  * batch's per-group rows are bucketed and sorted in memory before
  * folding, bounded by one group's events within one micro-batch.
  */
object CusumMonitor {

  /** Raw input event (only the group key and its time bucket matter for
    * volume monitoring). */
  case class In(group: String, bucket: Long)

  /** Carried accumulator state; `first` = -1 until the first alarm. */
  case class St(sp: Long, sn: Long, nup: Long, ndn: Long, first: Long,
                msp: Long, msn: Long, n: Long)

  /** Snapshot emitted after each batch; the rollup keeps the row with the
    * largest `n_buckets` per group (the latest state). */
  case class Out(group: String, n_buckets: Long, n_up_alarms: Long,
                 n_down_alarms: Long, first_alarm: Long, max_sp_fp: Long,
                 max_sn_fp: Long)

  /** Per-group fold: bucket-count the batch, then run the same integer
    * recurrence as the batch operator against the FIXED target. */
  def perGroup(targetFp: Long, slackDiv: Long, scaleBits: Int)(
      group: String, rows: Iterator[In],
      st: GroupState[St]): Iterator[Out] = {
    val q = 1L << scaleBits
    val slack = targetFp / slackDiv // non-negative: same floor as DIV
    val h = targetFp
    val counts = rows.toSeq.groupBy(_.bucket).view
      .mapValues(_.size.toLong).toSeq.sortBy(_._1)
    if (counts.isEmpty) Iterator.empty
    else {
      var s = st.getOption.getOrElse(St(0L, 0L, 0L, 0L, -1L, 0L, 0L, 0L))
      counts.foreach { case (bucket, y) =>
        val yfp = y * q
        val spRaw = math.max(0L, s.sp + yfp - targetFp - slack)
        val snRaw = math.max(0L, s.sn + targetFp - slack - yfp)
        val up = spRaw > h
        val dn = snRaw > h
        s = St(
          sp = if (up) 0L else spRaw,
          sn = if (dn) 0L else snRaw,
          nup = s.nup + (if (up) 1L else 0L),
          ndn = s.ndn + (if (dn) 1L else 0L),
          first = if (s.first == -1L && (up || dn)) bucket else s.first,
          msp = math.max(s.msp, spRaw),
          msn = math.max(s.msn, snRaw),
          n = s.n + 1L)
      }
      st.update(s)
      Iterator.single(Out(group, s.n, s.nup, s.ndn, s.first, s.msp, s.msn))
    }
  }
}
