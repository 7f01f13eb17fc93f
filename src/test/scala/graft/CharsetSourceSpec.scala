package graft

import graft.event.Event

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

/** The reference's `file-charset` option on the directory source
  * (`DirectoryWatchSourceSemantics.scala:40-41,335,372`): non-UTF-8 files
  * decode through the configured charset with IGNORE-style malformed
  * handling, both in the plain watch and the `off`-header variant. */
class CharsetSourceSpec extends SparkSpec {

  private def drain(events: org.apache.spark.sql.Dataset[_], work: java.nio.file.Path,
                    name: String): Array[org.apache.spark.sql.Row] = {
    val q = events.toDF.writeStream.format("memory").queryName(name)
      .option("checkpointLocation", work.resolve(s"ck-$name").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(30000)
    spark.table(name).collect()
  }

  test("directoryWatch: latin-1 fixture decodes through file-charset") {
    val work = Files.createTempDirectory("graft-charset")
    val in = work.resolve("in"); Files.createDirectories(in)
    // "café\nnaïve façade\n" in latin-1: é=0xE9 ï=0xEF ç=0xE7 — all invalid
    // as UTF-8 lead/continuation sequences
    Files.write(in.resolve("a.log"),
      "café\nnaïve façade\n".getBytes("ISO-8859-1"))
    val rows = drain(
      graft.sources.Sources.directoryWatch(spark, in.toString,
        charset = "ISO-8859-1"), work, "cs_latin1")
    val bodies = rows.map(_.getAs[String]("body")).sorted
    assert(bodies.toSeq == Seq("café", "naïve façade"), bodies.mkString("|"))
  }

  test("directoryWatch: the same latin-1 bytes read as UTF-8 lose the accents (the bug file-charset exists to fix)") {
    val work = Files.createTempDirectory("graft-charset")
    val in = work.resolve("in"); Files.createDirectories(in)
    Files.write(in.resolve("a.log"), "café\n".getBytes("ISO-8859-1"))
    val rows = drain(
      graft.sources.Sources.directoryWatch(spark, in.toString), work, "cs_wrong")
    val body = rows.head.getAs[String]("body")
    assert(body != "café", s"UTF-8 decode of latin-1 bytes cannot equal café")
  }

  test("directoryWatchWithOffsets: latin-1 lines keep byte-accurate offsets") {
    val work = Files.createTempDirectory("graft-charset")
    val in = work.resolve("in"); Files.createDirectories(in)
    val bytes = "über\nmaß\nok\n".getBytes("ISO-8859-1") // ü=0xFC ß=0xDF
    Files.write(in.resolve("b.log"), bytes)
    val rows = drain(
      graft.sources.Sources.directoryWatchWithOffsets(spark, in.toString,
        charset = "ISO-8859-1"), work, "cs_off")
    val got = rows.map { r =>
      val h = r.getAs[Map[String, String]]("headers")
      h(Event.Headers.FileOffset).toLong -> r.getAs[String]("body")
    }.toMap
    // offsets are BYTE positions in the original (latin-1) file: über=5
    // bytes incl \n, maß=4
    assert(got == Map(0L -> "über", 5L -> "maß", 9L -> "ok"), got.toString)
  }

  test("IGNORE malformed handling: undecodable bytes drop, the line survives") {
    // 0x81 is unassigned in ISO-8859-1? (it maps in latin-1; use a charset
    // with real holes) — windows-1252 leaves 0x81/0x8D/0x8F/0x90/0x9D
    // unmapped, the classic smart-quote-mojibake hole
    val arr = graft.functions.LineOffsetUtil.linesWithOffsets(
      Array[Byte]('a', 0x81.toByte, 'b', '\n', 'c'), 0, "windows-1252")
    assert(arr.numElements() == 2)
    assert(arr.getStruct(0, 3).getUTF8String(0).toString == "ab")
    assert(arr.getStruct(1, 3).getUTF8String(0).toString == "c")
  }

  test("non-ASCII-compatible charsets are rejected loudly at plan time") {
    val e = intercept[IllegalArgumentException] {
      graft.functions.LineOffsetUtil.checkCharset("UTF-16")
    }
    assert(e.getMessage.contains("ASCII-compatible"))
  }

  test("byte-bound truncation under a non-UTF-8 charset cuts at the bound") {
    val arr = graft.functions.LineOffsetUtil.linesWithOffsets(
      "abcdef\n".getBytes("ISO-8859-1"), 4, "ISO-8859-1")
    assert(arr.numElements() == 1)
    assert(arr.getStruct(0, 3).getUTF8String(0).toString == "abcd")
    // raw_len reports the UNTRUNCATED original length
    assert(arr.getStruct(0, 3).getLong(2) == 6L)
  }

  test("drop mode bounds ORIGINAL-encoding bytes, not the UTF-8 re-encoding") {
    val work = Files.createTempDirectory("graft-charset")
    val in = work.resolve("in"); Files.createDirectories(in)
    // 6 accented chars = 6 latin-1 bytes on disk but 12 bytes re-encoded
    // as UTF-8: with maxLineLength=8 and drop mode, an octet_length guard
    // would wrongly drop the line; the raw_len guard keeps it
    Files.write(in.resolve("a.log"), "éééééé\nlongerline\n".getBytes("ISO-8859-1"))
    val rows = drain(
      graft.sources.Sources.directoryWatch(spark, in.toString,
        maxLineLength = 8, truncateOverLength = false,
        charset = "ISO-8859-1"), work, "cs_drop")
    val bodies = rows.map(_.getAs[String]("body")).toSet
    assert(bodies == Set("éééééé"), s"drop-mode bodies: $bodies")
  }
}
