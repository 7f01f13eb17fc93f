package graft.tools

import java.io.{ByteArrayInputStream, File}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** One-shot generator for the committed real-audio fixtures under
  * `fixtures/audio/` — encoded by the JDK's own `javax.sound` WAV writer
  * (a real RIFF/WAVE encoder, not hand-crafted bytes), parsed back by
  * `WavHeader` in specs and the `mm_wav_frames` gate query. The PCM
  * payload is a deterministic integer sawtooth, so fixture bytes are
  * reproducible; the expected (channels, rate, bits, frames) table lives
  * in the gate's VALUES-literal oracle. Re-run only if the fixture spec
  * changes: `sbt "runMain graft.tools.MakeAudioFixtures"`. */
object MakeAudioFixtures {
  // (file, channels, sampleRateHz, sample FRAMES) — 16-bit signed LE PCM
  val spec: Seq[(String, Int, Int, Int)] = Seq(
    ("aud0_mono16k.wav",   1, 16000, 2000),
    ("aud1_stereo8k.wav",  2,  8000, 1200),
    ("aud2_mono44k.wav",   1, 44100,  441))

  /** Deterministic 16-bit LE PCM: frame i, channel c carries the sawtooth
    * `((i * 2731 + c * 977) mod 65536) - 32768`. */
  def pcm(channels: Int, frames: Int): Array[Byte] = {
    val out = new Array[Byte](frames * channels * 2)
    var i = 0
    while (i < frames) {
      var c = 0
      while (c < channels) {
        val v = ((i * 2731 + c * 977) % 65536) - 32768
        val off = (i * channels + c) * 2
        out(off) = (v & 0xFF).toByte
        out(off + 1) = ((v >> 8) & 0xFF).toByte
        c += 1
      }
      i += 1
    }
    out
  }

  def main(args: Array[String]): Unit = {
    val dir = new File("fixtures/audio")
    dir.mkdirs()
    spec.foreach { case (name, ch, rate, frames) =>
      val fmt = new AudioFormat(rate.toFloat, 16, ch,
        /*signed*/ true, /*bigEndian*/ false)
      val bytes = pcm(ch, frames)
      val ais = new AudioInputStream(
        new ByteArrayInputStream(bytes), fmt, frames.toLong)
      val f = new File(dir, name)
      require(AudioSystem.write(ais, AudioFileFormat.Type.WAVE, f) > 0,
        s"no WAVE writer for $name")
      println(s"[fixtures] wrote $f (${f.length} bytes)")
    }
  }
}
