package graft.metrics

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Pipeline observability (SURVEY.md §2.6). The reference runs kamon
  * counters per component (events accepted/intercepted/discarded, publish
  * success/fail, offsets, queue depth — `core/src/main/scala/atiesh/
  * metrics/Metrics.scala:26-146` and per-component metric traits). Spark
  * gives the equivalents natively:
  *
  *  - per-batch dataflow counters → `Dataset.observe()` (aggregates are
  *    computed inside the running plan, no extra pass);
  *  - offsets / rates / batch durations → `StreamingQueryProgress` (free);
  *  - this module routes both into one process-wide registry that tests,
  *    dashboards, or a metrics sink can read.
  */
object Metrics {

  /** Latest observed value per (query, metric) — the kamon-gauge analogue. */
  private val gauges = new ConcurrentHashMap[(String, String), Long]()

  def gauge(query: String, metric: String): Option[Long] =
    Option(gauges.get((query, metric)))

  def snapshot(): Map[(String, String), Long] = {
    import scala.jdk.CollectionConverters._
    gauges.asScala.toMap
  }

  /** Attach the standard event-flow counters to a pipeline stage. The
    * returned Dataset reports `n_events` and `n_bytes` per micro-batch
    * through the observation channel named `name`. */
  def observed(df: DataFrame, name: String): DataFrame =
    df.observe(name,
      count(lit(1)).as("n_events"),
      // octet_length: n_bytes must count BYTES (length() counts chars —
      // CJK bodies would report ~1/3 of the true volume)
      sum(octet_length(col("body"))).as("n_bytes"))

  /** Install once per session: captures both custom observations and the
    * engine's own progress numbers into the registry. */
  def install(spark: SparkSession): StreamingQueryListener = {
    val listener = new StreamingQueryListener {
      import StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val q = Option(e.progress.name).getOrElse(e.progress.id.toString)
        gauges.put((q, "inputRowsPerSecond"),
          math.round(e.progress.inputRowsPerSecond))
        gauges.put((q, "numInputRows"), e.progress.numInputRows)
        gauges.put((q, "batchId"), e.progress.batchId)
        import scala.jdk.CollectionConverters._
        e.progress.observedMetrics.asScala.foreach { case (obsName, row) =>
          row.schema.fieldNames.foreach { f =>
            val v = row.getAs[Any](f) match {
              case null       => 0L
              case l: Long    => l
              case i: Int     => i.toLong
              case d: Double  => math.round(d)
              case n: Number  => n.longValue()
              case _          => 0L
            }
            gauges.put((q, s"$obsName.$f"), v)
          }
        }
      }
    }
    spark.streams.addListener(listener)
    listener
  }
}
