package graft.util

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.lit

/** Per-invocation cache isolation — the class fix for the cross-query
  * CacheManager race (round 10, commit 50fdb3e).
  *
  * Spark's CacheManager keys cached plans by canonicalized-plan equality
  * (`sameResult` on the ANALYZED plan): two concurrent queries that build
  * plan-equal intermediates — the same operator over the same input with
  * the same params, exactly what Verify's 4-thread gate pool does when two
  * gate queries share a dedup/similarity kernel — silently SHARE one cache
  * entry. Each invocation then ends with `materializeAndRelease`
  * unpersisting "its" intermediates, which drops the shared entry
  * mid-flight for every other query still consuming it. Observed
  * corruption (1 in ~7 full sweeps): a verified-dedup output materialized
  * as the PRE-dedup band-collision multiset — partial cached reads mixed
  * with recomputation after the entry vanished under the running job.
  *
  * The fix is to make plan-equal sharing impossible instead of patching
  * consumers: every operator-internal persist goes through
  * [[SaltedPersistOps.saltedPersist]], which inserts an always-true filter
  * on a process-unique literal (`lit("__graft_cache_salt_N").isNotNull`)
  * BEFORE persisting. Cache registration and lookup both run on the
  * analyzed plan, where the literal is compared verbatim — so no two
  * invocations' persisted subtrees are ever plan-equal, CacheManager never
  * cross-shares them, and an unpersist can only drop blocks its own
  * invocation created. Inside the cached plan's one-time materialization
  * the optimizer constant-folds the predicate to TRUE and eliminates the
  * filter, so the salt costs nothing at runtime; the schema is unchanged
  * and the returned frame IS the persisted frame, so existing
  * `.unpersist()` bookkeeping works untouched.
  *
  * The boundary re-dedup in `Dedup.verifyExactJaccard` predates this and
  * is kept as redundant defense in depth, not as the fix.
  *
  * What is deliberately NOT salted: user-facing results (they are never
  * persisted by the operators) and `Materialize`'s localCheckpoint cuts
  * (checkpoint blocks live outside the CacheManager keyed by RDD identity,
  * which is already per-invocation).
  */
object CacheSalt {
  private val counter = new AtomicLong(0L)

  /** A process-unique salt literal (monotonic counter — uniqueness within
    * one driver process is all the CacheManager keys on). */
  def next(): String = "__graft_cache_salt_" + counter.incrementAndGet()

  // One cost of per-invocation salting: pre-salt, an invocation that DIED
  // between persist and unpersist left an entry the next plan-equal
  // invocation would reuse and then free (accidental self-healing);
  // post-salt every failure would leak its own entry for the session.
  // So each salted persist is also registered here, thread-tagged and
  // STRONGLY held (a WeakReference would let a GC between the failure and
  // the sweep clear the ref and strand the cache entry untracked — Bench
  // forces a gc every 16 queries, so that window is real), and the harness
  // calls [[releaseLeaked]] after each query — a no-op on the normal path
  // (operators unpersist their own frames; the sweep then just drops the
  // already-unpersisted registry rows), a deterministic free after an
  // exception. Entry lifetime is therefore one query: registered at
  // persist, removed at the owner's post-query sweep (or by ANY thread's
  // sweep once the frame is no longer cached — an unpersisted entry is
  // dead weight whoever owns it, which also bounds the registry when an
  // owner thread never sweeps). Ownership discipline as in
  // [[Materialize.release]]: only the owner — or the explicitly
  // no-query-in-flight [[releaseAll]] — frees a still-cached frame.
  private final case class Entry(owner: Long, df: DataFrame)
  private val live = new java.util.concurrent.ConcurrentLinkedQueue[Entry]()

  private def isCached(df: DataFrame): Boolean =
    df.storageLevel != org.apache.spark.storage.StorageLevel.NONE

  /** Unpersist any still-cached salted frames created BY THE CALLING
    * THREAD — call after a query completes (normal completions already
    * unpersisted; whatever remains is a failure leak). Also drops
    * registry rows whose frame is no longer cached, regardless of owner.
    * Returns the number of frames actually unpersisted. */
  def releaseLeaked(): Int = {
    val self = Thread.currentThread().getId
    var n = 0
    val it = live.iterator()
    while (it.hasNext) {
      val e = it.next()
      if (!isCached(e.df)) it.remove()
      else if (e.owner == self) {
        e.df.unpersist(blocking = false)
        n += 1
        it.remove()
      }
    }
    n
  }

  /** Owner-agnostic sweep: unpersist EVERY registered salted frame still
    * cached, whatever thread created it. Only call when no query is in
    * flight (end of a sweep / before session stop) — at that point the
    * per-thread ownership discipline is vacuous, and this closes the
    * dead-thread corner: a pool thread that failed a query and was then
    * replaced never runs its own [[releaseLeaked]], so its entries wait
    * here. Returns the number of frames actually unpersisted. */
  def releaseAll(): Int = {
    var n = 0
    val it = live.iterator()
    while (it.hasNext) {
      val e = it.next()
      if (isCached(e.df)) {
        e.df.unpersist(blocking = false)
        n += 1
      }
      it.remove()
    }
    n
  }

  /** Registered salted frames still actually cached — the leak detector
    * specs assert this returns to zero after every normal MATERIALIZING
    * operator path (the default), i.e. the sweeps above are a no-op unless
    * a query genuinely failed. Plan-inspection paths are the deliberate
    * exception: `materialize = false` arms (and most conf
    * `spark.graft.dedup.materialize=none` arms) return with their persists
    * LIVE, because the printed plan must still show the InMemoryTableScan
    * substitution the pin asserts — there the CALLER owns the release
    * (PlanSpec's clearCache()/unpersist), with the failure sweep as
    * backstop. `videoSharedFrames` is the one none-arm that releases
    * eagerly (its cache would otherwise accumulate across composed-
    * pipeline calls — see its note). */
  def liveCachedCount(): Int = {
    var n = 0
    val it = live.iterator()
    while (it.hasNext) if (isCached(it.next().df)) n += 1
    n
  }

  implicit final class SaltedPersistOps(private val df: DataFrame) extends AnyVal {
    /** `persist()` behind a per-invocation plan salt — see [[CacheSalt]]. */
    def saltedPersist(): DataFrame = {
      val p = df.where(lit(CacheSalt.next()).isNotNull).persist()
      live.add(Entry(Thread.currentThread().getId, p))
      p
    }
  }
}
