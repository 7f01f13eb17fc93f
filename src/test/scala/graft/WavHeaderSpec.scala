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
