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

    var pos = 12
    var channels = 0
    var rate = 0
    var bits = 0
    var haveFmt = false
    var dataBytes = -1L
    while (pos + 8 <= bytes.length && !(haveFmt && dataBytes >= 0)) {
      val size = le32(pos + 4)
      if (tag(pos, "fmt ")) {
        if (pos + 8 + 16 > bytes.length) return None // truncated fmt
        if (le16(pos + 8) != 1) return None          // PCM only
        channels = le16(pos + 10)
        rate = le32(pos + 12).toInt
        bits = le16(pos + 22)
        haveFmt = true
      } else if (tag(pos, "data")) {
        // clamp to the bytes actually present (truncated-upload policy)
        dataBytes = math.min(size, (bytes.length - (pos + 8)).toLong)
      }
      // chunks are word-aligned; a bogus size ends the walk via the guard
      pos += 8 + size.toInt + (size.toInt & 1)
      if (size < 0 || size > Int.MaxValue - 16) return None
    }
    if (!haveFmt || dataBytes < 0 || channels <= 0 || rate <= 0 ||
        bits <= 0 || bits % 8 != 0) None
    else {
      val bytesPerFrame = channels.toLong * (bits / 8)
      Some(WavInfo(channels, rate, bits, dataBytes / bytesPerFrame))
    }
  }
}
