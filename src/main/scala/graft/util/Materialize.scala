package graft.util

import java.lang.ref.WeakReference
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.graftbridge.RddBridge
import org.apache.spark.storage.StorageLevel

/** Deterministic lifecycle for eager materialization cuts.
  *
  * Several operators (the dedup family, `connectedComponents`, sequence
  * packing) end in an eager cut — `localCheckpoint` by default, reliable
  * `checkpoint` under `spark.graft.dedup.materialize = reliable` — so their
  * persisted intermediates can be unpersisted immediately (SURVEY.md §7
  * phase 5; the CollapseProject blowup makes a lazy return unsafe). The cut
  * blocks themselves, however, live OUTSIDE the CacheManager: Spark frees
  * them only when the result Dataset is GC'd and the ContextCleaner gets
  * scheduled. In a long-lived driver session that runs thousands of jobs
  * (the 100 TB production shape — and the bench/gate harness), dead
  * checkpoint blocks pile up in the block manager and throttle later
  * queries (round-3 measured: warm pass SLOWER than cold, q1_agg 1.5s →
  * 14.2s sixty queries into the session).
  *
  * The fix is to make release explicit: every cut is registered here, and
  * the harness (Bench / Verify / any driver loop) calls `release()` between
  * jobs, freeing the blocks the moment the consuming job has materialized
  * — no GC dependence. Registration holds only a WeakReference, so callers
  * that never release still get the old GC+ContextCleaner behavior; the
  * registry can never leak what Spark would have freed.
  */
object Materialize {

  /** Session conf selecting the cut strategy (shared with the dedup ops):
    * `local` (default) eager localCheckpoint; `reliable` eager checkpoint
    * to `SparkContext.setCheckpointDir` (executor-loss-safe, the
    * cluster-mode setting); `none` lazy passthrough where iteration allows. */
  val ConfKey = "spark.graft.dedup.materialize"

  // Each cut is tagged with the registering thread so `release()` is scoped:
  // a driver running queries on several threads (Spark supports concurrent
  // jobs) frees only its OWN dead cuts — a release() issued after query A
  // must never destroy query B's in-flight localCheckpoint blocks, which
  // are unrecoverable. Single-threaded harnesses (Bench/Verify) see the
  // old drain-everything behavior unchanged.
  private final case class Entry(owner: Long, ref: WeakReference[RDD[_]])
  private val tracked = new ConcurrentLinkedQueue[Entry]()

  /** Eagerly cut `df` per `ConfKey` and register the blocks for release.
    * `none` is mapped to `local` — callers that can return a lazy plan
    * handle that mode themselves before calling. */
  def cut(df: DataFrame): DataFrame =
    df.sparkSession.conf.get(ConfKey, "local") match {
      case "reliable" => track(df.checkpoint(true))
      case _          => track(df.localCheckpoint(true))
    }

  /** Register an already-cut DataFrame's backing blocks for release. The
    * cut is owned by the CURRENT thread — only a `release()` from this
    * same thread (or GC + ContextCleaner) will free it. */
  def track(df: DataFrame): DataFrame = {
    RddBridge.backingRdd(df).foreach(r =>
      tracked.add(Entry(Thread.currentThread().getId, new WeakReference(r))))
    df
  }

  /** Free the blocks of one cut NOW (the consumer has materialized and the
    * caller knows this exact result is dead — e.g. the previous round's
    * labels inside an iterative loop). Safe on non-cut frames (no-op). */
  def releaseNow(df: DataFrame): Unit =
    RddBridge.backingRdd(df).foreach(unpersistRdd)

  /** Free the blocks of every cut REGISTERED BY THE CALLING THREAD that is
    * still alive. Call between driver jobs — after the query consuming the
    * cuts has run. Cuts created by other threads (concurrent queries) are
    * left untouched; dead entries whose RDD was already GC-collected are
    * pruned regardless of owner. Returns the number of RDDs unpersisted
    * (instrumentation). */
  def release(): Int = {
    val self = Thread.currentThread().getId
    var n = 0
    // in-place iterator removal, never drain-and-requeue: a drain would
    // make OTHER threads' entries momentarily invisible, so a concurrent
    // release() on the owning thread would free nothing and its dead
    // blocks would linger — exactly the multi-threaded-driver case the
    // ownership tag exists for. ConcurrentLinkedQueue's iterator is
    // weakly consistent and supports safe concurrent remove().
    val it = tracked.iterator()
    while (it.hasNext) {
      val entry = it.next()
      val rdd = entry.ref.get
      if (rdd == null) it.remove() // collected — drop for any owner
      else if (entry.owner == self) { unpersistRdd(rdd); n += 1; it.remove() }
    }
    n
  }

  private def unpersistRdd(rdd: RDD[_]): Unit =
    if (rdd.getStorageLevel != StorageLevel.NONE)
      rdd.unpersist(blocking = false)

  /** (cached RDD count, memory bytes, disk bytes) in the block manager —
    * the session-age instrumentation the bench logs per query. */
  def storageSummary(spark: SparkSession): (Int, Long, Long) = {
    val infos = spark.sparkContext.getRDDStorageInfo
    (infos.length, infos.map(_.memSize).sum, infos.map(_.diskSize).sum)
  }
}
