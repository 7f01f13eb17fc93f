package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (UAX #15) as native codegen'd expressions — the
  * first transform of any web-scale text pipeline: crawled text mixes
  * precomposed and combining-mark encodings of the same grapheme ("é" as
  * U+00E9 vs "e"+U+0301), and every downstream operator keyed on bytes or
  * codepoints (exact dedup fingerprints, shingle hashes, token ids,
  * stopword tables) silently splits classes unless the corpus is
  * canonicalized first. NFC is the storage/dedup form (canonical
  * composition — what the W3C mandates for the web); NFKC additionally
  * folds compatibility variants (ligatures, full-width forms, superscript
  * digits) and is the aggressive pre-tokenization form most LM tokenizers
  * (e.g. SentencePiece's default) apply.
  *
  * `java.text.Normalizer` implements the same frozen UAX #15 algorithm
  * DuckDB's `nfc_normalize` does (composition tables are stabilized by
  * the Unicode standard), which is what makes the gate's cross-engine
  * hash compare possible. Stays out of whole-stage codegen breaks: a
  * plain unary call, no state. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    GraftTypeCheck.expect(prettyName, child -> StringType)
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      v.asInstanceOf[UTF8String].toString, java.text.Normalizer.Form.NFC))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"""UTF8String.fromString(java.text.Normalizer.normalize(
         |  $c.toString(), java.text.Normalizer.Form.NFC))""".stripMargin)
  override protected def withNewChildInternal(c: Expression): NfcNormalize = copy(c)
  override def prettyName: String = "nfc_normalize"
}

case class NfkcNormalize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    GraftTypeCheck.expect(prettyName, child -> StringType)
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      v.asInstanceOf[UTF8String].toString, java.text.Normalizer.Form.NFKC))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"""UTF8String.fromString(java.text.Normalizer.normalize(
         |  $c.toString(), java.text.Normalizer.Form.NFKC))""".stripMargin)
  override protected def withNewChildInternal(c: Expression): NfkcNormalize = copy(c)
  override def prettyName: String = "nfkc_normalize"
}

object UnicodeFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
  /** UAX #15 canonical composition (NFC) of a STRING column. */
  def nfc(c: Column): Column = column(NfcNormalize(expression(c)))
  /** UAX #15 compatibility composition (NFKC). */
  def nfkc(c: Column): Column = column(NfkcNormalize(expression(c)))
}
