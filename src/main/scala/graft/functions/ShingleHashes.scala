package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct 64-bit hashes of the word n-gram shingles of a *normalized*
  * text (single-space separated — the output of `TextFunctions.normText`).
  *
  * One pass over the UTF-8 bytes: because tokens are single-space
  * separated, shingle i is exactly the byte range [start(i), end(i+n-1)) of
  * the input, so each shingle is hashed in place (xxhash64, seed 42 — the
  * same function as Spark's `xxhash64()`) with no per-shingle string
  * allocation. Result order is ascending (sort-based dedup).
  *
  * Exists as a native expression because the equivalent higher-order-
  * function composition re-evaluates the tokenization per shingle (HOF
  * arguments re-run per enclosing-lambda element) — measured ~30× slower
  * on the dedup corpus.
  */
object ShingleHashUtil {
  val Seed = 42L

  def shingleHashes(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    // token start offsets (single-space separated input)
    var m = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' ') m += 1; i += 1 }
    val starts = new Array[Int](m + 1)
    var ti = 1
    i = 0
    while (i < len) { if (bytes(i) == ' ') { starts(ti) = i + 1; ti += 1 }; i += 1 }
    starts(m) = len + 1 // sentinel: start of virtual token m

    val out =
      if (m < n) Array(XXH64.hashUnsafeBytes(bytes,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len, Seed))
      else {
        val k = m - n + 1
        val hs = new Array[Long](k)
        var j = 0
        while (j < k) {
          val from = starts(j)
          val until = starts(j + n) - 1 // strip trailing space
          hs(j) = XXH64.hashUnsafeBytes(bytes,
            org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + from,
            until - from, Seed)
          j += 1
        }
        java.util.Arrays.sort(hs)
        // in-place dedup
        var w = 0
        var r = 0
        while (r < k) {
          if (r == 0 || hs(r) != hs(r - 1)) { hs(w) = hs(r); w += 1 }
          r += 1
        }
        if (w == k) hs else java.util.Arrays.copyOf(hs, w)
      }
    ArrayData.toArrayData(out)
  }

  /** POSITIONAL window hashes: element i = hash of the n-token window at
    * token index i — no sort, no dedup, EMPTY when the text has fewer than
    * n tokens (a partial window is not a span). Same in-place byte-range
    * hashing as `shingleHashes`; feeds `Dedup.duplicateSpans`, where the
    * position is the payload (the first HOF-composed version re-ran the
    * tokenizer per window — measured 22 s for the sf0.1 span query vs ~1 s
    * native). */
  def positionalShingleHashes(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    var m = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' ') m += 1; i += 1 }
    if (m < n) ArrayData.toArrayData(Array.emptyLongArray)
    else {
      val starts = new Array[Int](m + 1)
      var ti = 1
      i = 0
      while (i < len) { if (bytes(i) == ' ') { starts(ti) = i + 1; ti += 1 }; i += 1 }
      starts(m) = len + 1
      val k = m - n + 1
      val hs = new Array[Long](k)
      var j = 0
      while (j < k) {
        val from = starts(j)
        val until = starts(j + n) - 1
        hs(j) = XXH64.hashUnsafeBytes(bytes,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + from,
          until - from, Seed)
        j += 1
      }
      ArrayData.toArrayData(hs)
    }
  }
}

/** `positionalShingleHashes` as a codegen'd expression (see [[ShingleHashes]]
  * for why a native expression and not a HOF composition). */
case class PositionalShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    GraftTypeCheck.expect(prettyName, child -> StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    ShingleHashUtil.positionalShingleHashes(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleHashUtil.positionalShingleHashes($c, $n)")
  override protected def withNewChildInternal(c: Expression): PositionalShingleHashes =
    copy(child = c)
  override def prettyName: String = "positional_shingle_hashes"
}

case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    GraftTypeCheck.expect(prettyName, child -> StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    ShingleHashUtil.shingleHashes(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleHashUtil.shingleHashes($c, $n)")
  override protected def withNewChildInternal(c: Expression): ShingleHashes =
    copy(child = c)
  override def prettyName: String = "shingle_hashes"
}
