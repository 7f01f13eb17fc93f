package graft.functions

/** Pure byte-level WAV (RIFF/WAVE, PCM) metadata parser — the audio twin
  * of [[ImageHeader]]: walks the RIFF chunk list, reads the `fmt ` chunk's
  * channel/rate/width fields and the `data` chunk's payload size, and
  * derives the sample-frame count. No `javax.sound` on the hot path (the
  * spec cross-checks this parser against `AudioSystem` on real encoder
  * output, like ImageHeaderSpec does against ImageIO) — a plain function
  * of the bytes, callable per record inside `mapPartitions` with zero
  * codec state.
  *
  * Strictness: PCM only (`audioFormat == 1`); non-PCM, malformed chunk
  * lists, and non-RIFF bytes parse to None. A `data` size that overruns
  * the actual buffer (truncated upload) is CLAMPED to the bytes present —
  * byte-accurate truncation semantics, same policy as the directory
  * source's line guard: report what is really there, never invent
  * trailing samples. */
object WavHeader {

  /** channels, sample rate (Hz), bits per sample, PCM sample FRAMES
    * actually present (one frame = one sample across all channels). */
  final case class WavInfo(channels: Int, sampleRateHz: Int,
                           bitsPerSample: Int, nFrames: Long) {
    def durationMs: Long = nFrames * 1000L / sampleRateHz
  }

  def parse(bytes: Array[Byte]): Option[WavInfo] = {
    if (bytes == null || bytes.length < 44) return None
    def u8(i: Int): Int = bytes(i) & 0xFF
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) |
      (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    def tag(i: Int, s: String): Boolean =
      i + 4 <= bytes.length && (0 until 4).forall(k => u8(i + k) == s.charAt(k))
    if (!tag(0, "RIFF") || !tag(8, "WAVE")) return None

    // pos is a Long: a crafted 32-bit chunk size near 0x7FFFFFxx would wrap
    // an Int accumulator negative and re-enter the guard with a negative
    // index (AIOOBE — a task kill, violating parse totality). In Long
    // arithmetic pos is strictly increasing (size >= 0, step >= 8), so any
    // bogus size — including 0xFFFFFFFF truncation artifacts — just walks
    // past the end and the loop guard decides from what was already parsed.
    var pos = 12L
    var channels = 0
    var rate = 0
    var bits = 0
    var haveFmt = false
    var dataBytes = -1L
    while (pos + 8 <= bytes.length && !(haveFmt && dataBytes >= 0)) {
      val p = pos.toInt // pos + 8 <= bytes.length ⇒ fits an Int
      val size = le32(p + 4) // unsigned: 0 .. 0xFFFFFFFF, never negative
      if (tag(p, "fmt ")) {
        if (p + 8 + 16 > bytes.length) return None // truncated fmt
        if (le16(p + 8) != 1) return None          // PCM only
        channels = le16(p + 10)
        rate = le32(p + 12).toInt
        bits = le16(p + 22)
        haveFmt = true
      } else if (tag(p, "data")) {
        // clamp to the bytes actually present (truncated-upload policy);
        // an oversized declared size (e.g. corrupt 0xFFFFFFFF) still
        // clamps — the info present is reported, per the policy above
        dataBytes = math.min(size, (bytes.length - (p + 8)).toLong)
      }
      // chunks are word-aligned; a bogus size ends the walk via the guard
      pos += 8L + size + (size & 1L)
    }
    if (!haveFmt || dataBytes < 0 || channels <= 0 || rate <= 0 ||
        bits <= 0 || bits % 8 != 0) None
    else {
      val bytesPerFrame = channels.toLong * (bits / 8)
      Some(WavInfo(channels, rate, bits, dataBytes / bytesPerFrame))
    }
  }

  /** Decode the PCM payload to MONO samples: per frame, the floor-mean of
    * the channels (exact integer, so cross-engine replicable). 16-bit LE
    * only — the committed fixture/corpus format; anything else parses to
    * None like the header walk. Same truncation clamp as [[parse]]: only
    * frames whose bytes are fully present are returned. */
  def pcmMono16(bytes: Array[Byte]): Option[Array[Int]] = parse(bytes).flatMap { w =>
    if (w.bitsPerSample != 16) return None
    // locate the data chunk again (parse validated the walk already)
    var pos = 12L
    var dataAt = -1
    var nFrames = 0L
    while (dataAt < 0 && pos + 8 <= bytes.length) {
      val p = pos.toInt
      val size = (bytes(p + 4) & 0xFFL) | ((bytes(p + 5) & 0xFFL) << 8) |
                 ((bytes(p + 6) & 0xFFL) << 16) | ((bytes(p + 7) & 0xFFL) << 24)
      if (bytes(p) == 'd' && bytes(p + 1) == 'a' &&
          bytes(p + 2) == 't' && bytes(p + 3) == 'a') {
        dataAt = p + 8
        nFrames = math.min(size, (bytes.length - dataAt).toLong) /
                  (w.channels.toLong * 2L)
      } else pos += 8L + size + (size & 1L)
    }
    if (dataAt < 0) None
    else {
      val out = new Array[Int](nFrames.toInt)
      var i = 0
      while (i < out.length) {
        var sum = 0L
        var c = 0
        while (c < w.channels) {
          val off = dataAt + (i * w.channels + c) * 2
          sum += ((bytes(off) & 0xFF) | (bytes(off + 1) << 8)).toShort.toInt
          c += 1
        }
        out(i) = Math.floorDiv(sum, w.channels.toLong).toInt
        i += 1
      }
      Some(out)
    }
  }
}
