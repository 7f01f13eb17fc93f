package graft

import java.io.ByteArrayInputStream

import graft.functions.WavHeader
import graft.tools.MakeAudioFixtures

import org.scalatest.funsuite.AnyFunSuite

/** The pure WAV parser cross-checked against the JDK's own audio stack on
  * real encoder output — the ImageHeaderSpec pattern: `javax.sound` is the
  * independent implementation; agreement on every committed fixture means
  * the byte-level chunk walk reads the same format the real codec wrote. */
class WavHeaderSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("fixtures/audio", name))

  test("parser agrees with javax.sound on every committed fixture") {
    MakeAudioFixtures.spec.foreach { case (name, ch, rate, frames) =>
      val bytes = fixture(name)
      val got = WavHeader.parse(bytes).getOrElse(fail(s"$name did not parse"))
      // against the fixture declaration
      assert(got.channels == ch && got.sampleRateHz == rate &&
             got.bitsPerSample == 16 && got.nFrames == frames.toLong,
        s"$name: $got != spec ($ch ch, $rate Hz, $frames frames)")
      // against the JDK's independent decoder
      val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new ByteArrayInputStream(bytes))
      assert(aff.getFormat.getChannels == got.channels)
      assert(aff.getFormat.getSampleRate.toInt == got.sampleRateHz)
      assert(aff.getFormat.getSampleSizeInBits == got.bitsPerSample)
      assert(aff.getFrameLength.toLong == got.nFrames)
      // duration arithmetic
      assert(got.durationMs == frames.toLong * 1000L / rate)
    }
  }

  test("truncated data chunk clamps to the bytes present; junk and non-PCM reject") {
    val full = fixture("aud0_mono16k.wav")
    val info = WavHeader.parse(full).get
    // cut 100 PCM frames (200 bytes, mono 16-bit) off the end: the header
    // still CLAIMS 2000 frames; the parser must report what is really there
    val truncated = full.take(full.length - 200)
    val t = WavHeader.parse(truncated).get
    assert(t.nFrames == info.nFrames - 100,
      s"expected clamped ${info.nFrames - 100} frames, got ${t.nFrames}")
    // non-WAV bytes reject
    assert(WavHeader.parse("not a wav at all, just text".getBytes).isEmpty)
    assert(WavHeader.parse(Array.empty[Byte]).isEmpty)
    assert(WavHeader.parse(null).isEmpty)
    // PNG magic rejects (wrong container)
    assert(WavHeader.parse(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("fixtures/images/img0_rgb.png"))).isEmpty)
    // flip the fmt audioFormat field to 3 (IEEE float): PCM-only parser rejects
    val nonPcm = full.clone()
    // RIFF(12) + "fmt "(4) + size(4) → audioFormat at offset 20
    nonPcm(20) = 3
    assert(WavHeader.parse(nonPcm).isEmpty, "non-PCM must reject")
  }

  test("fuzz: random single-byte corruptions never throw — parse is total") {
    val base = fixture("aud1_stereo8k.wav")
    val rnd = graft.util.SplitMix64.generator(7L)
    for (_ <- 1 to 500) {
      val mutated = base.clone()
      val i = (rnd().abs % mutated.length).toInt
      mutated(i) = rnd().toByte
      WavHeader.parse(mutated) // Option out, never an exception
    }
    for (len <- Seq(0, 1, 11, 12, 43, 44, 45, 100)) {
      WavHeader.parse(base.take(len))
      WavHeader.parse(Array.fill[Byte](len)(0x52))
    }
    succeed
  }

  test("fuzz: crafted chunk sizes near Int.MaxValue never wrap the walk negative") {
    val base = fixture("aud0_mono16k.wav")
    def withSizeAt(off: Int, size: Long): Array[Byte] = {
      val b = base.clone()
      var v = size
      for (k <- 0 until 4) { b(off + k) = (v & 0xFF).toByte; v >>= 8 }
      b
    }
    // the first chunk header after RIFF/WAVE sits at pos=12; its size field
    // is at 16. Sizes in [MaxValue-pos-9, MaxValue-16] used to wrap an Int
    // pos negative and index the array at a negative offset (AIOOBE).
    val crafted = Seq(0x7FFFFFF0L, 0x7FFFFFE0L, 0x7FFFFFFFL,
                      Int.MaxValue - 12L - 9L, Int.MaxValue - 16L,
                      0x80000000L, 0xFFFFFFFFL, 0xFFFFFFF7L)
    for (s <- crafted; off <- Seq(16, 20)) {
      val out = WavHeader.parse(withSizeAt(off, s)) // must not throw
      // a bogus size on the fmt chunk walks past the end → None
      if (off == 16) assert(out.isEmpty)
    }
    succeed
  }

  test("oversized declared data size clamps to bytes present when fmt already parsed") {
    val base = fixture("aud0_mono16k.wav")
    val info = WavHeader.parse(base).get
    // locate the data chunk: RIFF walk, find "data" tag
    var pos = 12
    def le32(b: Array[Byte], i: Int): Long =
      (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)
    while (!(base(pos) == 'd' && base(pos + 1) == 'a' &&
             base(pos + 2) == 't' && base(pos + 3) == 'a'))
      pos += 8 + le32(base, pos + 4).toInt + (le32(base, pos + 4).toInt & 1)
    // corrupt the data size to 0xFFFFFFFF (common truncation artifact):
    // fmt parsed earlier in the walk, so the parser must CLAMP to the
    // bytes actually present, not reject
    val corrupt = base.clone()
    for (k <- 0 until 4) corrupt(pos + 4 + k) = 0xFF.toByte
    val got = WavHeader.parse(corrupt).get
    assert(got.nFrames == info.nFrames,
      s"clamp-to-present: expected ${info.nFrames} frames, got ${got.nFrames}")
  }

  test("pcmMono16 agrees with javax.sound's decoded samples on every fixture") {
    MakeAudioFixtures.spec.foreach { case (name, ch, _, frames) =>
      val bytes = fixture(name)
      val got = WavHeader.pcmMono16(bytes)
        .getOrElse(fail(s"$name did not decode"))
      assert(got.length == frames, s"$name: ${got.length} frames != $frames")
      // independent decode: javax.sound streams the PCM payload
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(bytes))
      val raw = ais.readAllBytes()
      (0 until frames).foreach { i =>
        var sum = 0L
        (0 until ch).foreach { c =>
          val off = (i * ch + c) * 2
          sum += (((raw(off) & 0xFF) | (raw(off + 1) << 8)).toShort).toInt
        }
        val want = Math.floorDiv(sum, ch.toLong).toInt
        assert(got(i) == want, s"$name sample $i: ${got(i)} != $want")
      }
      // and the generator formula itself (mono fixtures: direct equality)
      if (ch == 1) (0 until frames).foreach { i =>
        assert(got(i) == ((i * 2731) % 65536) - 32768)
      }
    }
    // non-16-bit and junk inputs decode to None, never throw
    assert(WavHeader.pcmMono16("plain text".getBytes).isEmpty)
    assert(WavHeader.pcmMono16(Array.empty[Byte]).isEmpty)
  }

  test("wavFrames operator: per-fixture frame grid matches the hand-computed manifest") {
    // spin the shared spec session lazily via SparkSpec would recreate a
    // suite; reuse a lightweight local session here
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").appName("WavHeaderSpec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val rows = graft.operators.Multimodal.wavFrames(
        spark.read.format("binaryFile")
          .load(new java.io.File("fixtures/audio").getAbsolutePath))
      .collect().map(r => r.name -> r).toMap
    assert(rows.keySet ==
      MakeAudioFixtures.spec.map(_._1).toSet)
    // (n - 400) / 160 + 1 over the REAL decoded sample counts
    assert(rows("aud0_mono16k.wav").n_frames == 11L)
    assert(rows("aud1_stereo8k.wav").n_frames == 6L)
    assert(rows("aud2_mono44k.wav").n_frames == 1L)
  }
}
