package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ImageHeader
import graft.tools.MakeImageFixtures

/** `ImageHeader` parses container bytes produced by a REAL encoder (the
  * JDK's ImageIO) — round-trip generated images plus the committed
  * `fixtures/images/` files the `mm_image_headers` gate reads. */
class ImageHeaderSpec extends AnyFunSuite {

  private def encode(imgType: Int, fmt: String, w: Int, h: Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    require(ImageIO.write(MakeImageFixtures.render(imgType, w, h), fmt, bos),
      s"no ImageIO writer for $fmt")
    bos.toByteArray
  }

  test("PNG/JPEG headers round-trip against the JDK encoder across types and sizes") {
    val cases = Seq(
      (BufferedImage.TYPE_INT_RGB,   "png", "png",  3, 640, 480),
      (BufferedImage.TYPE_INT_ARGB,  "png", "png",  4,   1,   1),
      (BufferedImage.TYPE_BYTE_GRAY, "png", "png",  1, 257,   3),
      (BufferedImage.TYPE_INT_RGB,   "jpg", "jpeg", 3, 320, 200),
      (BufferedImage.TYPE_BYTE_GRAY, "jpg", "jpeg", 1,   7, 1031))
    cases.foreach { case (t, fmt, expFmt, ch, w, h) =>
      assert(ImageHeader.parse(encode(t, fmt, w, h))
               .contains(ImageHeader.Info(expFmt, w, h, ch, 8)),
             s"$fmt ${w}x$h type=$t")
    }
  }

  test("committed fixture files parse to the gate oracle's expected table") {
    val expected = Map(
      "img0_rgb.png"  -> ImageHeader.Info("png",  23, 17, 3, 8),
      "img1_rgba.png" -> ImageHeader.Info("png",  16, 16, 4, 8),
      "img2_gray.png" -> ImageHeader.Info("png",  31,  9, 1, 8),
      "img3_rgb.jpg"  -> ImageHeader.Info("jpeg", 40, 25, 3, 8),
      "img4_gray.jpg" -> ImageHeader.Info("jpeg", 12, 34, 1, 8))
    expected.foreach { case (name, info) =>
      val bytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("fixtures/images", name))
      assert(ImageHeader.parse(bytes).contains(info), name)
    }
  }

  test("non-image bytes parse to None, not garbage") {
    assert(ImageHeader.parse(null).isEmpty)
    assert(ImageHeader.parse(Array.emptyByteArray).isEmpty)
    assert(ImageHeader.parse("plain utf-8 text body".getBytes("UTF-8")).isEmpty)
    // PNG signature with a truncated IHDR must not throw
    assert(ImageHeader.parse(Array[Byte](0x89.toByte, 'P', 'N', 'G',
      0x0d, 0x0a, 0x1a, 0x0a, 0, 0)).isEmpty)
    // SOI then EOI: a marker stream with no frame header
    assert(ImageHeader.parse(Array[Byte](0xff.toByte, 0xd8.toByte,
      0xff.toByte, 0xd9.toByte)).isEmpty)
  }
}
