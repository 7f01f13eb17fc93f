package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType}

/** gzip column codec. The reference gzips/gunzips HTTP bodies
  * (`core/src/main/scala/atiesh/utils/Compressor.scala:16-43`, used by
  * `HttpSource.scala:100-115` and `HttpSink.scala:129-130`). Spark has no
  * built-in gzip scalar function, so this is one of the few places a custom
  * Catalyst `Expression` is genuinely required (SURVEY.md §4). Implemented
  * as `UnaryExpression` (not a Scala UDF) so null handling and type
  * coercion stay inside Catalyst; the eval itself is JVM `java.util.zip`.
  */
object Compressor {
  def gzipCompress(input: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(input.length max 32)
    val gz  = new GZIPOutputStream(bos)
    gz.write(input)
    gz.close()
    bos.toByteArray
  }

  def gzipDecompress(input: Array[Byte]): Array[Byte] = {
    val in  = new GZIPInputStream(new ByteArrayInputStream(input))
    val out = new ByteArrayOutputStream(input.length * 4 max 64)
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) {
      if (n > 0) out.write(buf, 0, n)
      n = in.read(buf)
    }
    in.close()
    out.toByteArray
  }
}

case class GzipCompress(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    GraftTypeCheck.expect(prettyName, child -> BinaryType)
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(v: Any): Any =
    Compressor.gzipCompress(v.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): GzipCompress = copy(c)
  override def prettyName: String = "gzip"
}

case class GzipDecompress(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    GraftTypeCheck.expect(prettyName, child -> BinaryType)
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(v: Any): Any =
    Compressor.gzipDecompress(v.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): GzipDecompress = copy(c)
  override def prettyName: String = "gunzip"
}

object GzipFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.column
  /** gzip a BINARY column. */
  def gzip(c: Column): Column = column(GzipCompress(expr(c)))
  /** gunzip a BINARY column. */
  def gunzip(c: Column): Column = column(GzipDecompress(expr(c)))

  private[functions] def expr(c: Column): Expression =
    org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)
}
