package graft.sources

import java.util.concurrent.{ConcurrentHashMap, Executors, ScheduledExecutorService, TimeUnit}
import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession

/** Slowly-changing reference-data side input — the Spark re-expression of
  * the reference's `CachedProxy` extension
  * (`utils/http/src/main/scala/atiesh/utils/http/CachedProxy.scala`):
  * a process-wide cache of externally-fetched reference data, refreshed on
  * a schedule, kept stale on refresh failure, and readable from hot paths
  * without blocking.
  *
  * Spark shape: the driver fetches on the schedule and re-publishes a
  * `Broadcast` snapshot; tasks read `current()` inside `foreachBatch` /
  * transformations — each micro-batch sees one consistent snapshot, and a
  * refresh costs one broadcast, not a per-row lookup. (The reference's
  * promise-deduplicated cache fill, `CachedProxy.scala:166-230`, is
  * unnecessary here: the scheduler is the only writer.)
  */
final class CachedSideInput[T: scala.reflect.ClassTag](
    spark: SparkSession,
    fetch: () => T,
    refreshEveryMillis: Long) extends AutoCloseable {

  private val current0 = new AtomicReference[Broadcast[T]]()
  @volatile private var lastError: Option[Throwable] = None

  private def publish(): Unit =
    try {
      val value = fetch()
      val old = current0.get()
      current0.set(spark.sparkContext.broadcast(value))
      lastError = None
      // unpersist the stale snapshot lazily; running tasks keep their copy
      if (old != null) old.unpersist(blocking = false)
    } catch {
      case e: Throwable => lastError = Some(e) // keep stale value (reference :118-128)
    }

  publish() // initial blocking fill, like validateCache on first read
  require(current0.get() != null,
    s"initial side-input fetch failed: ${lastError.map(_.toString).getOrElse("")}")

  private val scheduler: ScheduledExecutorService =
    Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "graft-side-input-refresh"); t.setDaemon(true); t
    })
  scheduler.scheduleAtFixedRate(() => publish(),
    refreshEveryMillis, refreshEveryMillis, TimeUnit.MILLISECONDS)

  /** The current snapshot; use `.value` inside tasks. */
  def current(): Broadcast[T] = current0.get()

  def lastRefreshError: Option[Throwable] = lastError

  override def close(): Unit = scheduler.shutdownNow()
}

object CachedSideInput {
  private val registry =
    new ConcurrentHashMap[String, (Class[_], CachedSideInput[_])]()

  /** Process-wide singleton per name (reference CachedProxy.scala:49-58).
    * Reusing a name with a DIFFERENT value type fails here, at
    * registration, instead of as a ClassCastException inside a running
    * micro-batch far from the misuse (erasure limits the check to the
    * top-level class — `Map[A,B]` type args are not distinguished). */
  def getOrCreate[T: scala.reflect.ClassTag](
      name: String, spark: SparkSession,
      fetch: () => T, refreshEveryMillis: Long): CachedSideInput[T] = {
    val cls = implicitly[scala.reflect.ClassTag[T]].runtimeClass
    val entry = registry.computeIfAbsent(name,
      _ => (cls, new CachedSideInput[T](spark, fetch, refreshEveryMillis)))
    require(entry._1 == cls,
      s"side input '$name' is registered with value type " +
      s"${entry._1.getName}; requested ${cls.getName} — use a distinct name")
    entry._2.asInstanceOf[CachedSideInput[T]]
  }

  def remove(name: String): Unit =
    Option(registry.remove(name)).foreach(_._2.close())
}
