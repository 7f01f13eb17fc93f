package graft.tools

import java.awt.image.BufferedImage
import java.io.File
import javax.imageio.ImageIO

/** One-shot generator for the committed real-image fixtures under
  * `fixtures/images/` — encoded by the JDK's own ImageIO (a real PNG/JPEG
  * encoder, not hand-crafted bytes), parsed back by `ImageHeader` in specs
  * and the `mm_image_headers` gate query. Pixel pattern and sizes are
  * deterministic; the expected (format, width, height, channels) table
  * lives in the gate's VALUES-literal oracle. Re-run only if the fixture
  * spec changes: `sbt "runMain graft.tools.MakeImageFixtures"`. */
object MakeImageFixtures {
  // (file, BufferedImage type, ImageIO format, width, height)
  val spec: Seq[(String, Int, String, Int, Int)] = Seq(
    ("img0_rgb.png",  BufferedImage.TYPE_INT_RGB,   "png", 23, 17),
    ("img1_rgba.png", BufferedImage.TYPE_INT_ARGB,  "png", 16, 16),
    ("img2_gray.png", BufferedImage.TYPE_BYTE_GRAY, "png", 31, 9),
    ("img3_rgb.jpg",  BufferedImage.TYPE_INT_RGB,   "jpg", 40, 25),
    ("img4_gray.jpg", BufferedImage.TYPE_BYTE_GRAY, "jpg", 12, 34))

  def render(imgType: Int, w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, imgType)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 37 + y * 101) & 0xffffff) | 0xff000000)
    img
  }

  def main(args: Array[String]): Unit = {
    val dir = new File("fixtures/images")
    dir.mkdirs()
    spec.foreach { case (name, imgType, fmt, w, h) =>
      val f = new File(dir, name)
      require(ImageIO.write(render(imgType, w, h), fmt, f), s"no $fmt writer")
      println(s"[fixtures] wrote $f (${f.length} bytes)")
    }
  }
}
