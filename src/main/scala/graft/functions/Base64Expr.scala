package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 4648 basic base64 (no line wrapping). Spark's builtin `base64()`
  * emits MIME-chunked output (a line break every 76 chars), which breaks
  * both the reference dump format (`HttpLimitRequestSinkSemantics.scala:
  * 321-334` uses `java.util.Base64.getEncoder` = basic) and cross-engine
  * comparison. These expressions use the basic codec and stay codegen'd. */
case class B64Encode(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    GraftTypeCheck.expect(prettyName, child -> BinaryType)
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any =
    UTF8String.fromBytes(
      java.util.Base64.getEncoder.encode(v.asInstanceOf[Array[Byte]]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromBytes(java.util.Base64.getEncoder().encode($c))")
  override protected def withNewChildInternal(c: Expression): B64Encode = copy(c)
  override def prettyName: String = "b64_encode"
}

case class B64Decode(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    GraftTypeCheck.expect(prettyName, child -> StringType)
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(v: Any): Any =
    java.util.Base64.getDecoder.decode(v.asInstanceOf[UTF8String].getBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"java.util.Base64.getDecoder().decode($c.getBytes())")
  override protected def withNewChildInternal(c: Expression): B64Decode = copy(c)
  override def prettyName: String = "b64_decode"
}

object Base64Functions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
  /** Basic (unchunked) base64 of a BINARY column → STRING. */
  def b64(c: Column): Column = column(B64Encode(expression(c)))
  /** Inverse of [[b64]]: STRING → BINARY. */
  def unb64(c: Column): Column = column(B64Decode(expression(c)))
}
