package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM (SentencePiece-style) word segmentation against a fixed
  * piece vocabulary — the Viterbi DP at the heart of
  * [[graft.operators.TextAnalysis]]'s `unigramVocab` / `unigramEncode`
  * (reference behavior class: tokenizer-model application over a learned
  * vocabulary; cf. Kudo 2018).
  *
  * Objective — the determinism contract that lets a DuckDB oracle replay
  * the DP bit-exactly: instead of float log-likelihood (whose `ln` is not
  * bit-stable cross-engine), segmentations are ranked by the integer
  * triple **(piece count ASC, total piece frequency DESC, space-joined
  * segmentation string ASC)**. Under a unigram model this is the
  * max-likelihood order whenever pieces have comparable log-probs (fewer
  * pieces dominate), with frequency mass as the monotone surrogate within
  * equal piece counts; the final lexicographic leg makes the argmin
  * unique. Any single character is always a valid piece (frequency 0 when
  * absent from the vocabulary), so every word segments; pieces of length
  * ≥ 2 must be in the vocabulary. Words longer than `maxWordLen` bypass
  * as one opaque piece (the documented OOV contract); empty input yields
  * the empty segmentation.
  *
  * DP optimality under the lexicographic objective: states at position j
  * cover the same prefix, so no surviving segmentation string is a proper
  * prefix of a competitor (equal stripped chars, no trailing separators),
  * and first-difference comparison is preserved under common-suffix
  * append — keeping one best triple per position is globally optimal.
  *
  * The vocabulary rides `addReferenceObj` (a plan-literal HashMap, ≤
  * `vocabSize` entries — a broadcast-sized artifact, same shipping story
  * as the BPE merge table) and the generated code calls the static
  * [[UnigramSegment.segment]], so the expression stays inside whole-stage
  * codegen. Alphabet note: tie-break compares Java/UTF8String orders,
  * identical for the `[a-z0-9]` post-`normText` alphabet this targets.
  *
  * Overflow bound: `mass ≤ maxWordLen · max piece freq`; at BIGINT piece
  * frequencies up to ~10^17 the sum stays well inside 2^63. */
case class UnigramSegmentExpr(child: Expression, vocab: Map[String, Long],
                              maxPieceLen: Int, maxWordLen: Int)
    extends UnaryExpression {
  require(maxPieceLen >= 1 && maxPieceLen <= 32,
    s"maxPieceLen must be in [1, 32], got $maxPieceLen")
  require(maxWordLen >= maxPieceLen && maxWordLen <= 64,
    s"maxWordLen must be in [$maxPieceLen, 64], got $maxWordLen")
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    GraftTypeCheck.expect(prettyName, child -> StringType)
  override def dataType: DataType = StringType

  @transient private lazy val jmap: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](vocab.size * 2)
    vocab.foreach { case (p, f) => m.put(p, java.lang.Long.valueOf(f)) }
    m
  }

  override protected def nullSafeEval(v: Any): Any =
    UnigramSegment.segment(v.asInstanceOf[UTF8String], jmap,
      maxPieceLen, maxWordLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("uniVocab", jmap, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UnigramSegment.segment(" +
      s"$c, $mapRef, $maxPieceLen, $maxWordLen);")
  }
  override protected def withNewChildInternal(c: Expression): UnigramSegmentExpr =
    copy(child = c)
  override def prettyName: String = "unigram_segment"
}

object UnigramSegment {
  /** Viterbi DP over one word (see [[UnigramSegmentExpr]] for the
    * objective and contracts). Called from generated code. */
  def segment(word: UTF8String,
              vocab: java.util.HashMap[String, java.lang.Long],
              maxPieceLen: Int, maxWordLen: Int): UTF8String = {
    val w = word.toString
    val n = w.length
    if (n == 0) return UTF8String.fromString("")
    if (n > maxWordLen) return word
    val np = new Array[Int](n + 1)
    val mass = new Array[Long](n + 1)
    val seg = new Array[String](n + 1)
    seg(0) = ""
    var j = 1
    while (j <= n) {
      var bestNp = Int.MaxValue
      var bestMass = Long.MinValue
      var bestSeg: String = null
      var i = math.max(0, j - maxPieceLen)
      while (i < j) {
        val p = w.substring(i, j)
        val f = vocab.get(p)
        if (j - i == 1 || f != null) {
          val cNp = np(i) + 1
          val cMass = mass(i) + (if (f != null) f.longValue else 0L)
          lazy val cSeg = if (i == 0) p else seg(i) + " " + p
          if (cNp < bestNp ||
              (cNp == bestNp && cMass > bestMass) ||
              (cNp == bestNp && cMass == bestMass &&
               cSeg.compareTo(bestSeg) < 0)) {
            bestNp = cNp; bestMass = cMass; bestSeg = cSeg
          }
        }
        i += 1
      }
      np(j) = bestNp; mass(j) = bestMass; seg(j) = bestSeg
      j += 1
    }
    UTF8String.fromString(seg(n))
  }
}
