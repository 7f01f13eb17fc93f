package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The BPE merge table compiled into an executor-side encoder — the
  * production-vocab replacement for building the encode as a
  * `numMerges`-deep `foldLeft` of `replace` expressions (correct at the
  * gate's 8 merges, but expression depth grows linearly in the merge
  * count: a real 32-50k-merge vocabulary blows up analysis and codegen).
  * Here the ordered merge table rides to executors as ONE codegen
  * reference object (the `VocabEncode` pattern) and the plan holds a
  * single projection node regardless of vocabulary size.
  *
  * Semantics are BIT-EXACT with the expression chain it replaces (the
  * cross-engine contract `TextAnalysis.bpeEncode` pins with its md5
  * stream): each word is char-split and space-joined, then every merge
  * applies IN RANK ORDER as one leftmost-non-overlapping literal
  * string replacement of `"l r" -> "lr"` — Java `String.replace`, Spark
  * `replace` and DuckDB `replace` all implement exactly that scan, so
  * the three engines agree byte for byte (including the documented
  * string-level quirk that a pattern may match with `l` as the SUFFIX
  * of a longer token — the oracle replays the same string semantics).
  *
  * Per-word cost is O(merges × word length) worst case, but two things
  * bound it in practice: `String.replace` no-ops in O(len) when the
  * pattern is absent (the common case — most merges touch few words),
  * and a bounded per-task memo caches the encoding of each DISTINCT
  * word (Zipf: the top few thousand words cover most tokens). The memo
  * is value-deterministic (key fully determines value) so concurrent
  * tasks sharing one codec instance stay correct.
  */
final class BpeCodec(pats: Array[String], reps: Array[String])
    extends Serializable {
  require(pats.length == reps.length,
    s"merge table arity mismatch: ${pats.length} patterns vs ${reps.length} replacements")

  /** Bounded distinct-word memo; inserts stop at the cap (no eviction —
    * determinism needs no invalidation, the value is pure in the key). */
  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val MemoCap = 1 << 16

  /** Char-split + space-join by CODE POINT — exactly Spark's
    * `substr(i, 1)` / DuckDB's `w[i]` indexing (post-normText words are
    * ASCII `[a-z0-9]`, where code points and chars agree; this stays
    * exact even if a caller feeds wider text). */
  private def charJoin(w: String): String = {
    val sb = new java.lang.StringBuilder(w.length * 2)
    var i = 0
    var first = true
    while (i < w.length) {
      val cp = w.codePointAt(i)
      if (!first) sb.append(' ')
      sb.appendCodePoint(cp)
      first = false
      i += Character.charCount(cp)
    }
    sb.toString
  }

  def encodeWord(w: String): String = {
    if (w.isEmpty) return ""
    val hit = memo.get(w)
    if (hit != null) return hit
    var s = charJoin(w)
    var i = 0
    while (i < pats.length) {
      // String.replace is leftmost-non-overlapping replace-all — the
      // same scan as Spark's `replace` and DuckDB's `replace`
      s = s.replace(pats(i), reps(i))
      i += 1
    }
    if (memo.size < MemoCap) memo.put(w, s)
    s
  }

  /** Encode every word of an ARRAY<STRING>; null elements stay null
    * (matching `transform(tk, encWord)` under the replaced chain, where
    * a null word nulls through `replace`). */
  def encodeArray(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[AnyRef](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val w = arr.getUTF8String(i)
        out(i) = UTF8String.fromString(encodeWord(w.toString))
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `bpe_apply(tokens)` — encode an ARRAY<STRING> of words with a learned
  * BPE merge table carried as a codegen reference object. One projection
  * node whatever the merge count; see [[BpeCodec]] for the exact-parity
  * contract with the `replace`-chain formulation and the oracle. */
case class BpeApply(child: Expression, pats: Array[String],
                    reps: Array[String]) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    GraftTypeCheck.expect(prettyName, child -> ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  @transient private lazy val codec = new BpeCodec(pats, reps)
  override protected def nullSafeEval(v: Any): Any =
    codec.encodeArray(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeCodec", codec, "graft.functions.BpeCodec")
    defineCodeGen(ctx, ev, c => s"$ref.encodeArray($c)")
  }
  override protected def withNewChildInternal(c: Expression): BpeApply =
    copy(child = c)
  override def prettyName: String = "bpe_apply"
  // case-class equality on Array fields is REFERENCE equality, under which
  // two structurally-identical bpe_apply nodes (e.g. encode + fertility
  // columns built from the same collected merge table) never compare
  // equal — semanticEquals, subexpression elimination, and plan reuse all
  // evaluate the encoder twice. Compare the tables by content.
  override def equals(other: Any): Boolean = other match {
    case BpeApply(c, p, r) => c == child &&
      java.util.Arrays.equals(pats.asInstanceOf[Array[AnyRef]],
                              p.asInstanceOf[Array[AnyRef]]) &&
      java.util.Arrays.equals(reps.asInstanceOf[Array[AnyRef]],
                              r.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child,
      Integer.valueOf(java.util.Arrays.hashCode(pats.asInstanceOf[Array[AnyRef]])),
      Integer.valueOf(java.util.Arrays.hashCode(reps.asInstanceOf[Array[AnyRef]])))
}
