package graft

import graft.functions.AviHeader

import org.scalatest.funsuite.AnyFunSuite

/** The pure AVI container parser against its writer and against adversarial
  * bytes. Unlike PNG (ImageIO) and WAV (javax.sound) the JDK ships no AVI
  * codec to cross-check, so this spec leans on (a) exact round-trips across
  * layout shapes — including the stride-padding case a 4-byte-aligned width
  * never exercises, (b) the clamp-to-present truncation contract, and
  * (c) parse totality under prefix truncation and crafted chunk sizes (the
  * WavHeader overflow lesson, applied from day one). */
class AviHeaderSpec extends AnyFunSuite {

  private def grid(w: Int, h: Int, seed: Int): Array[Int] =
    Array.tabulate(w * h)(i => Math.floorMod(i * 31 + seed * 17, 256))

  test("write → parse round-trip: header fields, frame count, exact pixel decode") {
    for ((w, h, nf) <- Seq((36, 32, 1), (36, 32, 8), (33, 5, 2), (1, 1, 3))) {
      val frames = Array.tabulate(nf)(f => grid(w, h, f))
      val bytes = AviHeader.write(40000L, w, h, frames)
      val info = AviHeader.parse(bytes).getOrElse(fail(s"${w}x$h x$nf did not parse"))
      assert(info.usPerFrame == 40000L && info.declaredFrames == nf.toLong)
      assert(info.width == w && info.height == h && info.bitCount == 24)
      assert(info.framesPresent == nf)
      // (v,v,v) BGR samples: BT.601 luma is exactly v — the decode must
      // reproduce every grid value through the bottom-up padded-row layout
      for (f <- 0 until nf) {
        val g = AviHeader.frameGray(bytes, info, f)
          .getOrElse(fail(s"frame $f not decodable"))
        for (y <- 0 until h; x <- 0 until w)
          assert(g(x, y) == frames(f)(y * w + x),
            s"(${w}x$h) frame $f pixel ($x,$y)")
      }
      assert(AviHeader.frameGray(bytes, info, nf).isEmpty, "index past end")
      assert(AviHeader.frameGray(bytes, info, -1).isEmpty)
    }
  }

  test("stride padding: width 33 rows occupy 100 bytes, pad bytes ignored by decode") {
    val info = AviHeader.parse(AviHeader.write(1L, 33, 2, Array(grid(33, 2, 0))))
      .getOrElse(fail("pad-width file did not parse"))
    assert(info.stride == 100) // 33*3 = 99 → padded to 100
    assert(info.frames.head.size == 200)
  }

  test("truncation clamps to fully-present frames; every byte prefix parses totally") {
    val full = AviHeader.write(33333L, 12, 4, Array.tabulate(5)(f => grid(12, 4, f)))
    val frameBytes = ((12 * 3 + 3) / 4 * 4) * 4 // stride 36 × h 4 = 144
    // cut mid-way into the LAST frame: present = 4, declared stays 5
    val cut = AviHeader.parse(java.util.Arrays.copyOf(full, full.length - frameBytes / 2))
      .getOrElse(fail("truncated file did not parse"))
    assert(cut.declaredFrames == 5L && cut.framesPresent == 4)
    // cut exactly the last frame chunk (data + 8-byte header): present = 4
    val cut2 = AviHeader.parse(java.util.Arrays.copyOf(full, full.length - frameBytes - 8))
      .getOrElse(fail("chunk-aligned truncation did not parse"))
    assert(cut2.framesPresent == 4)
    // parse TOTALITY: every prefix either parses or returns None — never throws
    (0 until full.length).foreach { n =>
      AviHeader.parse(java.util.Arrays.copyOf(full, n)) // must not throw
    }
    // and single-byte corruption anywhere must not throw either
    (0 until full.length).foreach { i =>
      val b = full.clone()
      b(i) = (b(i) ^ 0x55).toByte
      AviHeader.parse(b)
    }
  }

  test("crafted 32-bit chunk sizes near Int.MaxValue terminate the walk, no wrap") {
    val full = AviHeader.write(1L, 8, 8, Array(grid(8, 8, 0), grid(8, 8, 1)))
    // find the first movi frame chunk's size field and forge sizes that
    // would wrap an Int position accumulator negative
    val moviAt = full.indexOfSlice("movi".getBytes("US-ASCII").toSeq)
    val sizeAt = moviAt + 4 + 4 // first '00db' tag, then its size field
    for (forged <- Seq(0x7FFFFFF0L, 0x7FFFFFFFL, 0xFFFFFFFFL, 0x80000000L)) {
      val b = full.clone()
      b(sizeAt) = (forged & 0xFF).toByte
      b(sizeAt + 1) = ((forged >> 8) & 0xFF).toByte
      b(sizeAt + 2) = ((forged >> 16) & 0xFF).toByte
      b(sizeAt + 3) = ((forged >> 24) & 0xFF).toByte
      val r = AviHeader.parse(b) // must not throw
      // the forged frame overruns the buffer → clamp drops it and ends the walk
      assert(r.forall(_.framesPresent == 0), s"forged size $forged kept a frame")
    }
  }

  test("MJPEG container: write → parse round-trip, frame bytes verbatim, odd sizes padded") {
    // odd/even/odd payload lengths exercise the RIFF pad byte both ways
    val frames = Array(Array[Byte](1, 2, 3), Array[Byte](4, 5, 6, 7), Array[Byte](8))
    val bytes = AviHeader.writeMjpeg(40000L, 36, 32, frames)
    val info = AviHeader.parse(bytes).getOrElse(fail("mjpeg file did not parse"))
    assert(info.codec == "mjpg" && info.framesPresent == 3)
    assert(info.width == 36 && info.height == 32 && info.usPerFrame == 40000L)
    assert(info.declaredFrames == 3L)
    for ((f, i) <- frames.zipWithIndex) {
      val fr = info.frames(i)
      assert(fr.size == f.length, s"frame $i size")
      assert(java.util.Arrays.equals(
          java.util.Arrays.copyOfRange(bytes, fr.offset, fr.offset + fr.size), f),
        s"frame $i bytes not verbatim")
    }
    // mjpg frames are JPEG streams — the DIB pixel accessor must refuse
    assert(AviHeader.frameGray(bytes, info, 0).isEmpty, "mjpg has no DIB decode")
    // totality under prefix truncation holds for this layout too
    for (cut <- 0 until bytes.length)
      AviHeader.parse(java.util.Arrays.copyOf(bytes, cut)) // must not throw
  }

  test("codec comes from the VIDEO strl: audio strl ahead is skipped; auds-only rejects") {
    val orig = AviHeader.write(1L, 8, 8, Array(grid(8, 8, 0)))
    // an interleaved-layout file: splice a complete audio strl (strh
    // 'auds' + a 40-byte format block whose fields would misread as a
    // BITMAPINFOHEADER) BEFORE the video strl inside hdrl
    val audioStrl = {
      def chunk(t: String, b: Array[Byte]): Array[Byte] = {
        val o = new java.io.ByteArrayOutputStream()
        o.write(t.getBytes("US-ASCII"))
        o.write(Array[Byte]((b.length & 0xFF).toByte,
          ((b.length >> 8) & 0xFF).toByte, ((b.length >> 16) & 0xFF).toByte,
          ((b.length >> 24) & 0xFF).toByte))
        o.write(b); o.toByteArray
      }
      val strh = new Array[Byte](56)
      "auds".getBytes("US-ASCII").copyToArray(strh, 0)
      val strf = new Array[Byte](40) // WAVEFORMATEX-ish — junk is fine
      strf(16) = 1 // the would-be "compression" field: must not claim codec
      val chunks = new java.io.ByteArrayOutputStream()
      chunks.write("strl".getBytes("US-ASCII"))
      chunks.write(chunk("strh", strh)); chunks.write(chunk("strf", strf))
      chunk("LIST", chunks.toByteArray)
    }
    val strlAt = orig.indexOfSlice("strl".getBytes("US-ASCII").toSeq) - 8
    val spliced = new Array[Byte](orig.length + audioStrl.length)
    System.arraycopy(orig, 0, spliced, 0, strlAt)
    System.arraycopy(audioStrl, 0, spliced, strlAt, audioStrl.length)
    System.arraycopy(orig, strlAt, spliced, strlAt + audioStrl.length,
      orig.length - strlAt)
    def bumpLe32(b: Array[Byte], at: Int, by: Int): Unit = {
      val v = (b(at) & 0xFF) | ((b(at + 1) & 0xFF) << 8) |
              ((b(at + 2) & 0xFF) << 16) | ((b(at + 3) & 0xFF) << 24)
      val n = v + by
      b(at) = (n & 0xFF).toByte; b(at + 1) = ((n >> 8) & 0xFF).toByte
      b(at + 2) = ((n >> 16) & 0xFF).toByte; b(at + 3) = ((n >> 24) & 0xFF).toByte
    }
    bumpLe32(spliced, 4, audioStrl.length) // RIFF size
    bumpLe32(spliced, // hdrl LIST size field sits 4 bytes before "hdrl"
      spliced.indexOfSlice("hdrl".getBytes("US-ASCII").toSeq) - 4,
      audioStrl.length)
    // a real muxer numbers movi chunks by strl ordinal: with the audio
    // strl spliced ahead, the video stream is ordinal 1 and its frame
    // chunks are '01db' — renumber like the muxer would
    val renumbered = spliced.clone()
    var at = renumbered.indexOfSlice("00db".getBytes("US-ASCII").toSeq)
    while (at >= 0) {
      renumbered(at + 1) = '1'.toByte
      at = renumbered.indexOfSlice("00db".getBytes("US-ASCII").toSeq, at + 1)
    }
    val info = AviHeader.parse(renumbered)
      .getOrElse(fail("audio-strl-first file must still parse"))
    assert(info.codec == "rgb24" && info.framesPresent == 1)
    assert(AviHeader.frameGray(renumbered, info, 0).nonEmpty, "video decode intact")
    // a NON-renumbered spliced file is malformed (its '00db' chunks claim
    // to belong to the audio stream): the codec parses but stream 0's
    // bytes must never reach the frame decoder — zero frames, not garbage
    val misNumbered = AviHeader.parse(spliced)
      .getOrElse(fail("mis-numbered file still parses (degraded)"))
    assert(misNumbered.codec == "rgb24" && misNumbered.framesPresent == 0,
      "audio-stream-numbered chunks must not be decoded as video frames")
    // and a file whose ONLY stream is audio must reject: patch the video
    // strh fccType to 'auds' in the original
    val strhAt = orig.indexOfSlice("strh".getBytes("US-ASCII").toSeq)
    val audsOnly = orig.clone()
    "auds".getBytes("US-ASCII").copyToArray(audsOnly, strhAt + 8)
    assert(AviHeader.parse(audsOnly).isEmpty, "auds-only file must reject")
  }

  test("first video strl's strf LATCHES: unrecognized first video stream poisons") {
    // two video strls: stream 0 declares BI_RGB 16-bpp (unrecognized),
    // stream 1 is a valid MJPG strl — the documented single-video-stream
    // strictness means the file must parse to None, never adopt stream 1's
    // codec and then decode stream 0's chunks with it
    val base = AviHeader.writeMjpeg(1L, 8, 8,
      Array(Array.fill(64)(0x41.toByte)))
    // build a 16-bpp BI_RGB video strl and splice it BEFORE the MJPG strl
    val badVideoStrl = {
      def chunk(t: String, b: Array[Byte]): Array[Byte] = {
        val o = new java.io.ByteArrayOutputStream()
        o.write(t.getBytes("US-ASCII"))
        o.write(Array[Byte]((b.length & 0xFF).toByte,
          ((b.length >> 8) & 0xFF).toByte, ((b.length >> 16) & 0xFF).toByte,
          ((b.length >> 24) & 0xFF).toByte))
        o.write(b); o.toByteArray
      }
      val strh = new Array[Byte](56)
      "vids".getBytes("US-ASCII").copyToArray(strh, 0)
      val strf = new Array[Byte](40)
      strf(0) = 40                      // biSize
      strf(14) = 16                     // biBitCount = 16 (unrecognized)
      // biCompression stays 0 = BI_RGB
      val chunks = new java.io.ByteArrayOutputStream()
      chunks.write("strl".getBytes("US-ASCII"))
      chunks.write(chunk("strh", strh)); chunks.write(chunk("strf", strf))
      chunk("LIST", chunks.toByteArray)
    }
    val strlAt = base.indexOfSlice("strl".getBytes("US-ASCII").toSeq) - 8
    val spliced = new Array[Byte](base.length + badVideoStrl.length)
    System.arraycopy(base, 0, spliced, 0, strlAt)
    System.arraycopy(badVideoStrl, 0, spliced, strlAt, badVideoStrl.length)
    System.arraycopy(base, strlAt, spliced, strlAt + badVideoStrl.length,
      base.length - strlAt)
    def bumpLe32(b: Array[Byte], at: Int, by: Int): Unit = {
      val v = (b(at) & 0xFF) | ((b(at + 1) & 0xFF) << 8) |
              ((b(at + 2) & 0xFF) << 16) | ((b(at + 3) & 0xFF) << 24)
      val n = v + by
      b(at) = (n & 0xFF).toByte; b(at + 1) = ((n >> 8) & 0xFF).toByte
      b(at + 2) = ((n >> 16) & 0xFF).toByte; b(at + 3) = ((n >> 24) & 0xFF).toByte
    }
    bumpLe32(spliced, 4, badVideoStrl.length)
    bumpLe32(spliced,
      spliced.indexOfSlice("hdrl".getBytes("US-ASCII").toSeq) - 4,
      badVideoStrl.length)
    assert(AviHeader.parse(spliced).isEmpty,
      "unrecognized FIRST video stream must poison the parse (latched strf)")
  }

  test("adversarial dims: dwWidth ~715M rejects at parse; frameGray guard holds in Long") {
    // a positive-Int width whose stride computation overflows Int negative
    // (715M * 3 > 2^31): parse must reject via the MaxDim cap, never admit
    // an info whose downstream pixel math would wrap
    val full = AviHeader.write(1L, 8, 8, Array(grid(8, 8, 0)))
    val avihAt = full.indexOfSlice("avih".getBytes("US-ASCII").toSeq)
    def patched(width: Long, height: Long): Array[Byte] = {
      val b = full.clone()
      for ((v, off) <- Seq((width, 32), (height, 36)); k <- 0 until 4)
        b(avihAt + 8 + off + k) = ((v >> (8 * k)) & 0xFF).toByte
      b
    }
    assert(AviHeader.parse(patched(715000000L, 8L)).isEmpty, "overflow width")
    assert(AviHeader.parse(patched(8L, 715000000L)).isEmpty, "overflow height")
    assert(AviHeader.parse(patched(AviHeader.MaxDim + 1L, 8L)).isEmpty, "cap + 1")
    // the guard must ALSO hold for a hand-built info that bypasses parse:
    // Int stride math would be negative here, Long math sees the frame is
    // far too small and degrades to None instead of indexing out of bounds
    val crafted = AviHeader.AviInfo(1L, 1L, width = 715000000, height = 480,
      bitCount = 24, frames = Vector(AviHeader.FrameRef(0, full.length)))
    assert(AviHeader.frameGray(full, crafted, 0).isEmpty,
      "lying dims must degrade, not throw")
  }

  test("strictness: junk, WAV, PNG fixture, compressed or non-24bpp files reject") {
    assert(AviHeader.parse(null).isEmpty)
    assert(AviHeader.parse(Array.emptyByteArray).isEmpty)
    assert(AviHeader.parse("RIFFxxxxWAVEfmt ".getBytes("US-ASCII")).isEmpty)
    val wav = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("fixtures/audio",
        graft.tools.MakeAudioFixtures.spec.head._1))
    assert(AviHeader.parse(wav).isEmpty, "a WAV is RIFF but not 'AVI '")
    val png = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("fixtures/images/img0_rgb.png"))
    assert(AviHeader.parse(png).isEmpty)
    val full = AviHeader.write(1L, 8, 8, Array(grid(8, 8, 0)))
    // patch biCompression (strf data offset +16) to non-BI_RGB
    val strfAt = full.indexOfSlice("strf".getBytes("US-ASCII").toSeq)
    val comp = full.clone(); comp(strfAt + 8 + 16) = 1
    assert(AviHeader.parse(comp).isEmpty, "compressed stream must reject")
    val bpp = full.clone(); bpp(strfAt + 8 + 14) = 8
    assert(AviHeader.parse(bpp).isEmpty, "non-24bpp must reject")
  }
}
