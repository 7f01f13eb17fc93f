package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.{ArrayType, DataType, NullType}

/** Analysis-time input-type validation for the native expressions. Spark's
  * `ImplicitCastInputTypes`/`inputTypes` signature uses the
  * `private[sql]` `AbstractDataType`, so expressions outside that package
  * validate through `checkInputDataTypes` instead — same effect: a wrong
  * argument type (e.g. `graft_simhash(array(1, 2))`, ARRAY<INT> where
  * ARRAY<BIGINT> is required) fails AT ANALYSIS with a message naming the
  * argument, never mid-job as a ClassCastException or silently-wrong
  * codegen read. */
object GraftTypeCheck {

  def expect(fn: String, args: (Expression, DataType)*): TypeCheckResult =
    args.zipWithIndex.collectFirst {
      case ((e, want), i) if !accepts(want, e) =>
        TypeCheckResult.TypeCheckFailure(
          s"$fn: argument ${i + 1} expects ${want.simpleString}, " +
          s"got ${e.dataType.simpleString} — add an explicit CAST")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)

  private def accepts(want: DataType, e: Expression): Boolean =
    e.dataType match {
      // a FOLDABLE NullType argument constant-folds to NULL before codegen,
      // like every Spark builtin (the null-safe eval paths never touch the
      // value; the SQL builders additionally lift NullType literals to typed
      // nulls). A NON-foldable NullType child would survive into codegen as
      // an Object-typed value the generated code cannot compile against
      // (silent interpreted-fallback cliff), so it keeps the analysis error.
      case NullType => e.foldable
      case got      => acceptsType(want, got)
    }

  private def acceptsType(want: DataType, got: DataType): Boolean = (want, got) match {
    case (_, NullType)                      => true // null array elements etc.
    case (ArrayType(w, _), ArrayType(g, _)) => acceptsType(w, g) // any nullability
    case (w, g)                             => w == g
  }
}
