package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** SplitMix64 finalizer over a seeded counter stream — the engine's cheap
  * deterministic per-key selector (MLM masking, span-corruption starts).
  *
  * `mix64(key, seed)` returns the `key`-th element of the splitmix64
  * sequence seeded at `seed`: `mix(seed + key * GOLDEN_GAMMA)` with
  * Steele/Lea/Vigna's public 3-multiply avalanche (the `SplittableRandom`
  * / splitmix64.c mixer). Properties that matter here:
  *
  *  - pure 64-bit wrap arithmetic → one codegen'd expression, no state,
  *    embarrassingly parallel at any corpus size;
  *  - cross-engine replayable with ~1 KB of direct HUGEINT arithmetic
  *    (see `OracleXX.mix64Pmod`) — the previous xxhash64-based selector
  *    needed a ~60 KB `list_reduce` replica per call whose evaluation
  *    cost made the driver's DuckDB gate blow its wall-clock budget
  *    (round-9 `text_mlm_*` oracles: 82 s EACH at sf0.01);
  *  - statistically sound for fractional selection: the mixer is the
  *    standard full-avalanche finalizer, equidistributed over the stream.
  *
  * Wrap semantics are explicit Java long arithmetic in both eval paths, so
  * the expression is immune to `spark.sql.ansi.enabled` overflow checks.
  */
case class Mix64(child: Expression, seed: Long) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    GraftTypeCheck.expect(prettyName, child -> LongType)
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    graft.util.SplitMix64.at(seed, v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val z = ctx.freshName("z")
      s"""
         |long $z = ${seed}L + $c * ${Mix64.Gamma}L;
         |$z = ($z ^ ($z >>> 30)) * ${Mix64.C1}L;
         |$z = ($z ^ ($z >>> 27)) * ${Mix64.C2}L;
         |${ev.value} = $z ^ ($z >>> 31);
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Mix64 =
    copy(child = c)
  override def prettyName: String = "mix64"
}

object Mix64 {
  /** Single source of truth for the constants and the mixer is
    * [[graft.util.SplitMix64]] (shared with the driver-side derived-
    * constant streams); re-exposed here for the codegen template. */
  val Gamma: Long = graft.util.SplitMix64.Gamma
  val C1: Long = graft.util.SplitMix64.C1
  val C2: Long = graft.util.SplitMix64.C2

  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
  /** `key`-th draw of the splitmix64 stream seeded at `seed` (LONG). */
  def mix64(key: Column, seed: Long): Column =
    column(Mix64(expression(key), seed))
}
