package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Split a file's raw bytes into lines, each with the BYTE offset of its
  * start within the file — the reference directory source's per-line `off`
  * header (`DirectoryWatchSourceSemantics.scala:50-53,219-223`), which a
  * line-oriented file source cannot reconstruct after the fact.
  *
  * One pass over the bytes: '\n' terminates a line ('\r\n' is normalized by
  * stripping the trailing '\r', like Spark's text source); a trailing
  * newline does NOT produce an empty final line. Offsets are byte positions
  * (resume-seekable), not character counts. */
object LineOffsetUtil {
  def linesWithOffsets(bytes: Array[Byte], maxLineBytes: Int): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    val n = bytes.length
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == '\n') {
        if (i < n || i > start) { // skip the empty segment after a final \n
          var end = i
          if (end > start && bytes(end - 1) == '\r') end -= 1
          // over-length guard in BYTES (the same unit as max-line-length
          // config and the `off` header), never cutting a UTF-8 char in
          // half: if the byte at the cut is a continuation byte, back up to
          // the straddling char's lead byte and exclude the whole char
          if (maxLineBytes > 0 && end - start > maxLineBytes) {
            var cut = start + maxLineBytes
            while (cut > start && (bytes(cut) & 0xC0) == 0x80) cut -= 1
            end = cut
          }
          out += InternalRow(
            UTF8String.fromBytes(bytes, start, end - start), start.toLong)
        }
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }
}

case class LinesWithOffsets(child: Expression, maxLineBytes: Int = 0)
    extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    GraftTypeCheck.expect(prettyName, child -> BinaryType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("line", StringType, nullable = false),
                   StructField("off", LongType, nullable = false))),
    containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    LineOffsetUtil.linesWithOffsets(v.asInstanceOf[Array[Byte]], maxLineBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LineOffsetUtil.linesWithOffsets($c, $maxLineBytes)")
  override protected def withNewChildInternal(c: Expression): LinesWithOffsets =
    copy(child = c)
  override def prettyName: String = "lines_with_offsets"
}
