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

  implicit final class SaltedPersistOps(private val df: DataFrame) extends AnyVal {
    /** `persist()` behind a per-invocation plan salt — see [[CacheSalt]]. */
    def saltedPersist(): DataFrame =
      df.where(lit(CacheSalt.next()).isNotNull).persist()
  }
}
