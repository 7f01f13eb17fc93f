package org.apache.spark.sql.graftbridge

import scala.annotation.tailrec

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, SubqueryAlias}
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

  /** The materialized RDD backing `df`, if `df` IS (a column-pruning
    * projection / alias of) a checkpointed Dataset — i.e. the `LogicalRDD`
    * sits at the plan ROOT under only `Project`/`SubqueryAlias` wrappers.
    * None for ordinary lazy plans AND for composite plans (joins/unions)
    * that merely CONTAIN checkpointed inputs: releasing through such a
    * frame would free an arbitrary input the caller may not own. */
  def backingRdd(df: DataFrame): Option[RDD[_]] = rootRdd(df.queryExecution.analyzed)

  @tailrec private def rootRdd(plan: LogicalPlan): Option[RDD[_]] = plan match {
    case lr: LogicalRDD     => Some(lr.rdd)
    case p: Project         => rootRdd(p.child)
    case sa: SubqueryAlias  => rootRdd(sa.child)
    case _                  => None
  }
}
