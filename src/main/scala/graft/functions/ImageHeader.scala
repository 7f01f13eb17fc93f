package graft.functions

/** Pure-JVM header-level image parsing: format, dimensions, channels and
  * bit depth straight from the container bytes — no codec libraries, no
  * pixel decode. This is the real bytes-to-metadata step of a multimodal
  * ingest pipeline (the pixel decode itself stays behind the
  * `Multimodal.StubCodec` seam because no image libraries exist in this
  * environment, but header metadata is what partitioning/filtering
  * decisions key on at scale, and that much IS implementable on plain JDK).
  *
  * Formats: PNG (IHDR chunk) and JPEG (SOF0/1/2/… frame header). Both
  * reads touch only the first few hundred bytes of the payload.
  */
object ImageHeader {

  /** Parsed container metadata. `channels` is the per-pixel component
    * count the container declares (PNG color type / JPEG Nf). */
  final case class Info(format: String, width: Int, height: Int,
                        channels: Int, bitDepth: Int)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def u16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def i32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  /** PNG: 8-byte signature, then the IHDR chunk (must be first per spec):
    * length(4) "IHDR"(4) width(4) height(4) bitDepth(1) colorType(1). */
  private def parsePng(b: Array[Byte]): Option[Info] = {
    if (b.length < 26) return None
    var i = 0
    while (i < 8) { if (u8(b, i) != PngSig(i)) return None; i += 1 }
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')) return None
    val colorType = u8(b, 25)
    val channels = colorType match {
      case 0 => 1 // grayscale
      case 2 => 3 // truecolor
      case 3 => 1 // palette index
      case 4 => 2 // gray + alpha
      case 6 => 4 // truecolor + alpha
      case _ => return None
    }
    Some(Info("png", i32(b, 16), i32(b, 20), channels, u8(b, 24)))
  }

  /** JPEG: SOI (FFD8), then marker segments; the SOF frame header carries
    * precision(1) height(2) width(2) components(1). All SOF variants
    * (baseline/extended/progressive/lossless, C0-CF minus C4/C8/CC)
    * share that layout. */
  private def parseJpeg(b: Array[Byte]): Option[Info] = {
    if (b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return None
    var i = 2
    while (i + 3 < b.length) {
      if (u8(b, i) != 0xff) return None // desynced: not a marker stream
      var m = u8(b, i + 1)
      // fill bytes: FF may repeat before the marker id
      while (m == 0xff && i + 2 < b.length) { i += 1; m = u8(b, i + 1) }
      m match {
        case 0xd8 | 0x01 => i += 2                         // standalone
        case x if x >= 0xd0 && x <= 0xd7 => i += 2         // RSTn
        case 0xd9 => return None                           // EOI before SOF
        case x if (x >= 0xc0 && x <= 0xcf) && x != 0xc4 && x != 0xc8 && x != 0xcc =>
          if (i + 9 >= b.length) return None
          return Some(Info("jpeg", u16(b, i + 7), u16(b, i + 5),
                           u8(b, i + 9), u8(b, i + 4)))
        case _ =>
          if (i + 3 >= b.length) return None
          i += 2 + u16(b, i + 2) // length includes its own 2 bytes
      }
    }
    None
  }

  /** Parse the header of a PNG or JPEG payload; None for anything else. */
  def parse(bytes: Array[Byte]): Option[Info] =
    if (bytes == null) None
    else parsePng(bytes).orElse(parseJpeg(bytes))
}
