package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** A Dataset returned by `checkpoint()`/`localCheckpoint()` is a thin
  * wrapper over a materialized `RDD[InternalRow]` (a `LogicalRDD` leaf).
  * Spark frees those blocks only when the wrapper is GC'd AND the
  * ContextCleaner drains — in a long driver session running thousands of
  * jobs that is far too late (measured: a 58-query × 2-pass bench run
  * degraded 70% from accumulated checkpoint blocks). This bridge exposes
  * the backing RDD so the library can release the blocks deterministically
  * the moment the consuming job has materialized (see
  * `graft.util.Materialize`). Read-only access; no Spark internals are
  * modified.
  */
object RddBridge {

  /** The materialized RDD backing `df`, if `df` is (a projection of) a
    * checkpointed Dataset; None for ordinary lazy plans. */
  def backingRdd(df: DataFrame): Option[RDD[_]] =
    df.queryExecution.analyzed.collectFirst { case lr: LogicalRDD => lr.rdd }
}
