package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.{Charset, CodingErrorAction}

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
  * (resume-seekable), not character counts.
  *
  * `charset` is the reference's `file-charset` option
  * (`DirectoryWatchSourceSemantics.scala:40-41,335,372`): non-UTF-8 files
  * are decoded per line with `CodingErrorAction.IGNORE`-style malformed
  * handling (undecodable byte sequences are silently dropped, mirroring the
  * reference's coding-error configuration). Only ASCII-compatible charsets
  * are supported — the line scan is byte-level, so 0x0A must never occur
  * inside a multi-byte character (true for latin-1, UTF-8, Shift_JIS,
  * EUC-JP, GBK; NOT for UTF-16/32, rejected loudly at construction). */
object LineOffsetUtil {
  /** Validated, ASCII-compatible charset lookup (see scaladoc). */
  def checkCharset(name: String): Charset = {
    val cs = Charset.forName(name)
    val nl = "\n".getBytes(cs)
    require(nl.length == 1 && nl(0) == '\n',
      s"lines_with_offsets: charset $name is not ASCII-compatible " +
        "(newline must encode as the single byte 0x0A)")
    cs
  }

  def linesWithOffsets(bytes: Array[Byte], maxLineBytes: Int,
                       charsetName: String = "UTF-8"): ArrayData = {
    val utf8 = charsetName.equalsIgnoreCase("UTF-8")
    // One decoder per file call (not per line). DELIBERATE DIVERGENCE from
    // the reference's Codec, which sets only onMalformedInput(IGNORE) and
    // leaves unmappable at REPORT (raising mid-stream): this pipeline also
    // IGNOREs decode-unmappable sequences, because at ingest scale one
    // exotic byte sequence in one file must degrade to a dropped character,
    // never kill the task. Decode-unmappable is vanishingly rare anyway
    // (it needs a well-formed source sequence with no Unicode mapping).
    val decoder = if (utf8) null else {
      val d = checkCharset(charsetName).newDecoder()
      d.onMalformedInput(CodingErrorAction.IGNORE)
      d.onUnmappableCharacter(CodingErrorAction.IGNORE)
      d
    }
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
          // config and the `off` header). UTF-8: never cut a char in half —
          // if the byte at the cut is a continuation byte, back up to the
          // straddling char's lead byte and exclude the whole char. Other
          // charsets: cut at the byte bound and let the IGNORE decoder drop
          // any partial trailing character.
          // raw_len = the line's UNTRUNCATED content bytes in the file's
          // own encoding (post-\r-strip) — the unit the max-line-length
          // drop mode is specified in. The decoded string's UTF-8
          // re-encoding can be LONGER than the original (latin-1 'é' is
          // 1 byte on disk, 2 re-encoded), so callers must never bound
          // drop mode by octet_length of the output.
          val rawLen = (end - start).toLong
          if (maxLineBytes > 0 && end - start > maxLineBytes) {
            var cut = start + maxLineBytes
            if (utf8) while (cut > start && (bytes(cut) & 0xC0) == 0x80) cut -= 1
            end = cut
          }
          val line =
            if (utf8) UTF8String.fromBytes(bytes, start, end - start)
            else UTF8String.fromString(
              decoder.decode(ByteBuffer.wrap(bytes, start, end - start)).toString)
          out += InternalRow(line, start.toLong, rawLen)
        }
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }
}

case class LinesWithOffsets(child: Expression, maxLineBytes: Int = 0,
                            charset: String = "UTF-8")
    extends UnaryExpression {
  // fail at plan time, not per-task, on a bad or non-ASCII-compatible name
  LineOffsetUtil.checkCharset(charset)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    GraftTypeCheck.expect(prettyName, child -> BinaryType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("line", StringType, nullable = false),
                   StructField("off", LongType, nullable = false),
                   StructField("raw_len", LongType, nullable = false))),
    containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    LineOffsetUtil.linesWithOffsets(v.asInstanceOf[Array[Byte]], maxLineBytes,
      charset)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cs = ctx.addReferenceObj("charset", charset, "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LineOffsetUtil.linesWithOffsets($c, $maxLineBytes, $cs)")
  }
  override protected def withNewChildInternal(c: Expression): LinesWithOffsets =
    copy(child = c)
  override def prettyName: String = "lines_with_offsets"
}
