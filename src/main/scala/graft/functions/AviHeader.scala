package graft.functions

/** Pure byte-level AVI (RIFF/'AVI ') container parser — the video member
  * of the real-decode family beside [[ImageHeader]] (PNG/JPEG) and
  * [[WavHeader]] (RIFF/WAVE): walks the RIFF list tree, reads the `avih`
  * main header (frame period, declared frame count, dimensions), the
  * first video stream's `strf` BITMAPINFOHEADER (bit depth, compression),
  * and the `movi` list's frame chunks. Uncompressed 24-bpp BI_RGB frames
  * (`00db` device-independent bitmaps: bottom-up rows, BGR samples, rows
  * padded to 4 bytes) can then be pixel-decoded with zero codec state —
  * a plain function of the bytes, callable per record in `mapPartitions`.
  *
  * Strictness mirrors WavHeader: the FIRST video `strl`'s FIRST `strf`
  * decides the whole file — BI_RGB 24-bpp (codec "rgb24", pixel-decodable
  * here) or 'MJPG' (codec "mjpg" — each frame chunk is a standalone JPEG
  * stream for the caller's JPEG decoder); anything else parses to None
  * (the decision latches, so a later video stream can never re-claim).
  * Frame chunks are matched to the claiming stream's strl ORDINAL
  * ('NNdb'/'NNdc' — an interleaved file with audio as stream 0 carries
  * its video frames as '01..' chunks), so another stream's bytes are
  * never handed to the pixel decoder.
  * Truncated uploads follow the
  * clamp-to-present policy: a frame chunk whose declared bytes are not
  * fully present is DROPPED (unlike audio samples, a partial frame is not
  * a prefix of anything renderable) and the walk ends there — the frames
  * that ARE fully present are reported, never invented trailing ones.
  *
  * Totality: positions are Longs (a crafted 32-bit chunk size near
  * 0x7FFFFFxx must not wrap an Int accumulator negative and index out of
  * bounds — the WavHeader lesson), every read is bounds-guarded, and the
  * chunk step is strictly positive, so any adversarial byte string
  * terminates in None or a clamped parse, never a thrown task failure.
  *
  * Reference behavior modeled: the reference treats media payloads as
  * opaque bytes end-to-end (core/.../Event.scala body: Array[Byte]); the
  * container formats here are the public AVI/DIB specs (msdn AVIMAINHEADER
  * / BITMAPINFOHEADER layouts). */
object AviHeader {

  /** Dimension cap enforced by [[parse]] — see the totality note there. */
  val MaxDim: Int = 1 << 20

  /** One fully-present frame chunk: absolute payload offset + size. */
  final case class FrameRef(offset: Int, size: Int)

  /** usPerFrame/width/height/declaredFrames from `avih`; bitCount from the
    * video stream's `strf`; `frames` = the movi frame chunks actually
    * present in full (clamp policy above); `codec` = "rgb24" (BI_RGB
    * 24-bpp DIB frames, pixel-decodable by [[frameGray]]) or "mjpg"
    * (motion-JPEG: each frame chunk is a standalone JPEG stream the
    * caller hands to a JPEG decoder — [[frameGray]] returns None). */
  final case class AviInfo(usPerFrame: Long, declaredFrames: Long,
                           width: Int, height: Int, bitCount: Int,
                           frames: Vector[FrameRef],
                           codec: String = "rgb24") {
    def framesPresent: Int = frames.length
    /** DIB row stride: 24-bpp rows padded to 4-byte boundaries. */
    def stride: Int = ((width * 3 + 3) / 4) * 4
  }

  /** 'MJPG' biCompression fourcc as the little-endian u32 `strf` stores. */
  private val MjpgFourcc: Long =
    'M'.toLong | ('J'.toLong << 8) | ('P'.toLong << 16) | ('G'.toLong << 24)

  def parse(bytes: Array[Byte]): Option[AviInfo] = {
    if (bytes == null || bytes.length < 12) return None
    def u8(i: Int): Int = bytes(i) & 0xFF
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) |
      (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    def tag(i: Int, s: String): Boolean =
      i + 4 <= bytes.length && (0 until 4).forall(k => u8(i + k) == s.charAt(k))
    if (!tag(0, "RIFF") || !tag(8, "AVI ")) return None

    var usPerFrame = -1L
    var declaredFrames = -1L
    var width = 0
    var height = 0
    var bitCount = -1
    var codec: String = null
    // AVI stream chunk ids are numbered by strl ORDINAL ('01db' = stream 1's
    // DIB frame — a real muxer with audio ahead of video numbers the video
    // chunks '01..'), so the parse must remember WHICH strl claimed the
    // codec and only collect that stream's chunks; collecting '00d?'
    // unconditionally would hand stream 0's (possibly audio) bytes to the
    // frame decoder. movi chunks are collected stream-tagged and filtered
    // once the claiming ordinal is known (robust to any LIST order).
    var strlOrdinal = -1     // ordinal of the strl currently being walked
    var videoStreamIdx = -1  // ordinal of the strl whose strf decided codec
    // the FIRST video strl's FIRST strf decides the file, recognized or
    // not — a BI_RGB 16-bpp first video stream must poison the parse, not
    // defer to a later stream's format (single-video-stream strictness)
    var strfDecided = false
    val taggedFrames = Vector.newBuilder[(Int, FrameRef)]
    var haveMovi = false

    // one nested-walk helper: visits each (tagPos, dataPos, size) triple of
    // a chunk list in [from, until) of the buffer; Long arithmetic per the
    // totality note above, declared sizes never trusted past buffer end
    def walk(from: Long, until: Long)(visit: (Int, Int, Long) => Unit): Unit = {
      var pos = from
      val lim = math.min(until, bytes.length.toLong)
      while (pos + 8 <= lim) {
        val p = pos.toInt
        val size = le32(p + 4)
        visit(p, p + 8, size)
        pos += 8L + size + (size & 1L)
      }
    }

    // is this movi chunk a frame chunk of SOME stream? ('NNdb' raw DIB /
    // 'NNdc' compressed, NN = two decimal digits of the strl ordinal —
    // we index both, pixel decode requires BI_RGB). Returns the stream
    // ordinal, or -1 for non-frame chunks.
    def frameStreamIdx(p: Int): Int = {
      val d1 = u8(p) - '0'; val d2 = u8(p + 1) - '0'
      if (d1 >= 0 && d1 <= 9 && d2 >= 0 && d2 <= 9 &&
          u8(p + 2) == 'd' && (u8(p + 3) == 'b' || u8(p + 3) == 'c'))
        d1 * 10 + d2
      else -1
    }

    walk(12L, bytes.length.toLong) { (p, dp, size) =>
      if (tag(p, "LIST") && dp + 4 <= bytes.length) {
        val listEnd = dp + size // may exceed buffer; walk() clamps
        if (tag(dp, "hdrl")) {
          walk(dp + 4L, listEnd) { (hp, hdp, hsize) =>
            if (tag(hp, "avih") && hsize >= 40 && hdp + 40 <= bytes.length) {
              usPerFrame = le32(hdp)
              declaredFrames = le32(hdp + 16)
              width = le32(hdp + 32).toInt
              height = le32(hdp + 36).toInt
            } else if (tag(hp, "LIST") && tag(hdp, "strl")) {
              // only the FIRST VIDEO stream's FIRST strf may decide the
              // codec: an audio strl ahead of the video one (common
              // interleaved layout) has its own >= 40-byte format block
              // whose fields would otherwise be misread as a
              // BITMAPINFOHEADER — the strh fccType gates which strl's
              // strf counts, and the decision LATCHES (strfDecided) so a
              // first video stream with an unrecognized format poisons the
              // parse instead of deferring to a second video stream
              strlOrdinal += 1
              val thisStrl = strlOrdinal
              var isVideoStrl = false
              walk(hdp + 4L, hdp + hsize) { (sp, sdp, ssize) =>
                if (tag(sp, "strh") && ssize >= 4 && tag(sdp, "vids"))
                  isVideoStrl = true
                else if (tag(sp, "strf") && isVideoStrl && !strfDecided) {
                  // the latch engages on ANY strf of the first video strl
                  // — a short/truncated format block must poison the parse
                  // (codec stays null), not defer the decision to a later
                  // video stream's well-formed strf
                  strfDecided = true
                  if (ssize >= 40 && sdp + 40 <= bytes.length) {
                    val compression = le32(sdp + 16)
                    if (compression == 0L) {
                      bitCount = le16(sdp + 14)
                      if (bitCount == 24) codec = "rgb24"
                    } else if (compression == MjpgFourcc) {
                      // motion-JPEG: bit depth belongs to the per-frame JPEG
                      // streams, not the DIB header — record it as stated
                      bitCount = le16(sdp + 14)
                      codec = "mjpg"
                    }
                    if (codec != null) videoStreamIdx = thisStrl
                  }
                }
              }
            }
          }
        } else if (tag(dp, "movi")) {
          haveMovi = true
          walk(dp + 4L, listEnd) { (mp, mdp, msize) =>
            // clamp policy: only frames whose declared bytes are FULLY
            // present count (a truncated trailing frame is dropped)
            val si = frameStreamIdx(mp)
            if (si >= 0 && msize <= bytes.length - mdp)
              taggedFrames += ((si, FrameRef(mdp, msize.toInt)))
          }
        }
      }
    }

    // dimension cap (totality, not policy): a crafted avih with dwWidth
    // ~715M is a positive Int that passes width > 0, but width * 3 then
    // overflows stride negative — the frameGray guard would compare
    // against a negative product and admit out-of-bounds pixel math. Any
    // dim past 2^20 (far beyond real video) parses to None, which keeps
    // stride, stride.toLong * height, and every downstream Int pixel
    // index (cx * w in dhashFromGray) overflow-free.
    if (usPerFrame < 0 || declaredFrames < 0 || !haveMovi ||
        width <= 0 || height <= 0 || width > MaxDim || height > MaxDim ||
        codec == null) None
    else Some(AviInfo(usPerFrame, declaredFrames, width, height, bitCount,
                      taggedFrames.result().collect {
                        case (si, fr) if si == videoStreamIdx => fr
                      }, codec))
  }

  /** Integer BT.601 luma accessor over frame `idx`'s decoded DIB pixels
    * (top-down (x, y) coordinates; the DIB stores rows bottom-up, BGR).
    * None when the frame's pixel block is smaller than stride*height —
    * cannot happen for frames [[parse]] admitted from a well-formed file,
    * but guarded anyway (a lying biSizeImage must degrade, not throw). */
  def frameGray(bytes: Array[Byte], info: AviInfo, idx: Int): Option[(Int, Int) => Int] = {
    if (info.codec != "rgb24") return None // mjpg frames are JPEG streams
    if (idx < 0 || idx >= info.frames.length) return None
    val f = info.frames(idx)
    // Long arithmetic throughout the guard: parse's MaxDim cap already
    // bounds dims, but the guard must hold on its own terms even for a
    // hand-built AviInfo — an Int stride wraps negative at dwWidth ~715M
    // and a negative product would wave through a too-small frame, putting
    // the accessor's Int pixel math out of bounds
    val strideL = (info.width.toLong * 3 + 3) / 4 * 4
    if (f.size.toLong < strideL * info.height) return None
    // strideL * height <= f.size <= Int.MaxValue, so the Int narrowing
    // and every per-pixel index below are exact
    val stride = strideL.toInt
    Some { (x, y) =>
      val base = f.offset + (info.height - 1 - y) * stride + x * 3
      val b = bytes(base) & 0xFF
      val g = bytes(base + 1) & 0xFF
      val r = bytes(base + 2) & 0xFF
      (299 * r + 587 * g + 114 * b) / 1000
    }
  }

  /** Assemble a real single-stream uncompressed AVI: `frames` are gray
    * grids (row-major, top-down, length w*h) stored as (v,v,v) BGR
    * samples — BT.601 luma of (v,v,v) is exactly v, so a decode through
    * [[frameGray]] must reproduce the grid value-for-value. Every chunk
    * size is exact per the public AVI layout (RIFF/hdrl/avih/strl/strh/
    * strf/movi/00db); used by the rendered-corpus generators and the spec
    * fixtures (the JDK ships no AVI encoder, so unlike PNG/WAV the writer
    * is ours — the spec therefore leans on adversarial/truncation cases
    * and the formula-replica oracle rather than encoder independence). */
  def write(usPerFrame: Long, w: Int, h: Int,
            frames: Array[Array[Int]]): Array[Byte] = {
    require(w >= 1 && h >= 1, s"empty frame dims ${w}x$h")
    require(frames.forall(_.length == w * h), "frame grid length != w*h")
    val stride = ((w * 3 + 3) / 4) * 4
    val frameBytes = stride * h
    // sizes, inside out (all our chunk payloads are even — no pad bytes)
    val strhSize = 56
    val strfSize = 40
    val strlSize = 4 + 8 + strhSize + 8 + strfSize
    val avihSize = 56
    val hdrlSize = 4 + 8 + avihSize + 8 + strlSize
    val moviSize = 4 + frames.length * (8 + frameBytes)
    val riffSize = 4 + 8 + hdrlSize + 8 + moviSize
    val out = new Array[Byte](8 + riffSize)
    var pos = 0
    def putTag(s: String): Unit = { (0 until 4).foreach(i => out(pos + i) = s.charAt(i).toByte); pos += 4 }
    def putLe32(v: Long): Unit = {
      out(pos) = (v & 0xFF).toByte; out(pos + 1) = ((v >> 8) & 0xFF).toByte
      out(pos + 2) = ((v >> 16) & 0xFF).toByte; out(pos + 3) = ((v >> 24) & 0xFF).toByte
      pos += 4
    }
    def putLe16(v: Int): Unit = {
      out(pos) = (v & 0xFF).toByte; out(pos + 1) = ((v >> 8) & 0xFF).toByte; pos += 2
    }
    putTag("RIFF"); putLe32(riffSize); putTag("AVI ")
    putTag("LIST"); putLe32(hdrlSize); putTag("hdrl")
    putTag("avih"); putLe32(avihSize)
    putLe32(usPerFrame)                    // dwMicroSecPerFrame
    putLe32(0); putLe32(0); putLe32(0)     // maxBytesPerSec, padding, flags
    putLe32(frames.length)                 // dwTotalFrames
    putLe32(0); putLe32(1)                 // initialFrames, dwStreams
    putLe32(frameBytes)                    // suggestedBufferSize
    putLe32(w); putLe32(h)                 // dwWidth, dwHeight
    putLe32(0); putLe32(0); putLe32(0); putLe32(0) // dwReserved[4]
    putTag("LIST"); putLe32(strlSize); putTag("strl")
    putTag("strh"); putLe32(strhSize)
    putTag("vids"); putTag("DIB ")         // fccType, fccHandler
    putLe32(0); putLe16(0); putLe16(0)     // flags, priority, language
    putLe32(0)                             // initialFrames
    putLe32(usPerFrame); putLe32(1000000L) // dwScale / dwRate = frame period
    putLe32(0); putLe32(frames.length)     // start, length
    putLe32(frameBytes); putLe32(0); putLe32(0) // bufSize, quality, sampleSize
    putLe16(0); putLe16(0); putLe16(w); putLe16(h) // rcFrame
    putTag("strf"); putLe32(strfSize)
    putLe32(40); putLe32(w); putLe32(h)    // biSize, biWidth, biHeight (bottom-up)
    putLe16(1); putLe16(24)                // biPlanes, biBitCount
    putLe32(0); putLe32(frameBytes)        // biCompression = BI_RGB, biSizeImage
    putLe32(0); putLe32(0); putLe32(0); putLe32(0) // ppm dims, clr used/important
    putTag("LIST"); putLe32(moviSize); putTag("movi")
    frames.foreach { grid =>
      putTag("00db"); putLe32(frameBytes)
      var y = 0
      while (y < h) {
        val srcRow = h - 1 - y // bottom-up storage
        var x = 0
        while (x < w) {
          val v = grid(srcRow * w + x).toByte
          val base = pos + x * 3
          out(base) = v; out(base + 1) = v; out(base + 2) = v
          x += 1
        }
        pos += stride // padding bytes stay zero
        y += 1
      }
    }
    require(pos == out.length, s"writer layout bug: $pos != ${out.length}")
    out
  }

  /** Assemble a real single-stream MOTION-JPEG AVI: `frames` are complete
    * JPEG streams (one per frame, e.g. from an ImageIO JPEG encoder)
    * stored verbatim in `00dc` chunks with `strf.biCompression = 'MJPG'`.
    * Odd-length frames get the RIFF pad byte ([[parse]]'s walk already
    * steps `size & 1`). Unlike [[write]] the frame PIXELS here come from a
    * real third-party codec, so the decode spec is lossy-tolerance
    * (hamming bounds) rather than value-exact. */
  def writeMjpeg(usPerFrame: Long, w: Int, h: Int,
                 frames: Array[Array[Byte]]): Array[Byte] = {
    require(w >= 1 && h >= 1, s"empty frame dims ${w}x$h")
    require(frames.forall(_.nonEmpty), "empty JPEG frame")
    val strhSize = 56
    val strfSize = 40
    val strlSize = 4 + 8 + strhSize + 8 + strfSize
    val avihSize = 56
    val hdrlSize = 4 + 8 + avihSize + 8 + strlSize
    val chunk = frames.map(f => 8 + f.length + (f.length & 1))
    val moviSize = 4 + chunk.sum
    val riffSize = 4 + 8 + hdrlSize + 8 + moviSize
    val maxFrame = if (frames.isEmpty) 0 else frames.map(_.length).max
    val out = new Array[Byte](8 + riffSize)
    var pos = 0
    def putTag(s: String): Unit = { (0 until 4).foreach(i => out(pos + i) = s.charAt(i).toByte); pos += 4 }
    def putLe32(v: Long): Unit = {
      out(pos) = (v & 0xFF).toByte; out(pos + 1) = ((v >> 8) & 0xFF).toByte
      out(pos + 2) = ((v >> 16) & 0xFF).toByte; out(pos + 3) = ((v >> 24) & 0xFF).toByte
      pos += 4
    }
    def putLe16(v: Int): Unit = {
      out(pos) = (v & 0xFF).toByte; out(pos + 1) = ((v >> 8) & 0xFF).toByte; pos += 2
    }
    putTag("RIFF"); putLe32(riffSize); putTag("AVI ")
    putTag("LIST"); putLe32(hdrlSize); putTag("hdrl")
    putTag("avih"); putLe32(avihSize)
    putLe32(usPerFrame)
    putLe32(0); putLe32(0); putLe32(0)
    putLe32(frames.length)
    putLe32(0); putLe32(1)
    putLe32(maxFrame)
    putLe32(w); putLe32(h)
    putLe32(0); putLe32(0); putLe32(0); putLe32(0)
    putTag("LIST"); putLe32(strlSize); putTag("strl")
    putTag("strh"); putLe32(strhSize)
    putTag("vids"); putTag("MJPG")
    putLe32(0); putLe16(0); putLe16(0)
    putLe32(0)
    putLe32(usPerFrame); putLe32(1000000L)
    putLe32(0); putLe32(frames.length)
    putLe32(maxFrame); putLe32(0); putLe32(0)
    putLe16(0); putLe16(0); putLe16(w); putLe16(h)
    putTag("strf"); putLe32(strfSize)
    putLe32(40); putLe32(w); putLe32(h)
    putLe16(1); putLe16(24)
    putLe32(MjpgFourcc); putLe32(maxFrame) // biCompression = 'MJPG'
    putLe32(0); putLe32(0); putLe32(0); putLe32(0)
    putTag("LIST"); putLe32(moviSize); putTag("movi")
    frames.foreach { f =>
      putTag("00dc"); putLe32(f.length)
      System.arraycopy(f, 0, out, pos, f.length)
      pos += f.length + (f.length & 1) // pad byte stays zero
    }
    require(pos == out.length, s"mjpeg writer layout bug: $pos != ${out.length}")
    out
  }
}
