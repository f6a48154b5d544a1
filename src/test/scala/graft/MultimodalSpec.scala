package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Real image decode through the partition-streamed multimodal path:
  * synthetic PNG/BMP payloads must yield TRUE dimensions from the pixel
  * data; non-image and corrupt payloads fall back to the deterministic
  * stub. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def imageBytes(w: Int, h: Int, format: String): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    (0 until w).foreach(x => (0 until h).foreach(y => img.setRGB(x, y, (x * 31 + y) & 0xffffff)))
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  test("PNG and BMP payloads decode to true width/height/channels") {
    import spark.implicits._
    val rows = Seq(
      (1L, "image/png", imageBytes(37, 21, "png")),
      (2L, "image/bmp", imageBytes(128, 64, "bmp")),
      (3L, "image/png", imageBytes(5, 400, "png")))
    val media = rows.toDF("doc_id", "media_type", "payload")
    val feats = Multimodal.decodeFeatures(spark, media).collect()
      .map(f => f.doc_id -> f).toMap
    assert(feats(1L).width == 37 && feats(1L).height == 21)
    assert(feats(2L).width == 128 && feats(2L).height == 64)
    assert(feats(3L).width == 5 && feats(3L).height == 400)
    assert(feats.values.forall(f => f.channels == 3 &&
      f.n_pixels == f.width.toLong * f.height * f.channels))
  }

  test("thumbnails sample true pixels from decodable images") {
    import spark.implicits._
    // 8x8 image: left half red, right half blue
    val img = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
    (0 until 8).foreach(x => (0 until 8).foreach(y =>
      img.setRGB(x, y, if (x < 4) 0xff0000 else 0x0000ff)))
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    val media = Seq((1L, "image/png", bos.toByteArray))
      .toDF("doc_id", "media_type", "payload")
    val t = graft.operators.Multimodal.thumbnails(spark, media, tw = 2, th = 2)
      .collect()(0)
    assert(t.width == 2 && t.height == 2 && t.pixels.length == 4)
    // nearest-neighbor at x=0 samples the red half, x=1 the blue half
    assert(t.pixels(0) == 0xff0000 && t.pixels(1) == 0x0000ff)
    assert(t.pixels(2) == 0xff0000 && t.pixels(3) == 0x0000ff)
    // non-image payloads produce the same SHAPE deterministically
    val fake = graft.operators.Multimodal.thumbnails(spark,
        Seq((2L, "audio/wav", Array.fill[Byte](10)(7))).toDF("doc_id", "media_type", "payload"),
        tw = 2, th = 2).collect()(0)
    assert(fake.pixels.length == 4 && fake.pixels.forall(_ == 0x070707))
  }

  test("non-image and corrupt payloads fall back to the deterministic stub") {
    val junk = Array.fill[Byte](100)(42)
    val stub = Multimodal.decodeStub(7L, "audio/wav", junk)
    assert(Multimodal.decode(7L, "audio/wav", junk) == stub)
    // declared image type but undecodable bytes -> stub, not a crash
    val corrupt = Multimodal.decode(8L, "image/png", junk)
    assert(corrupt == Multimodal.decodeStub(8L, "image/png", junk))
    // a REAL png header with truncated data makes ImageIO throw (not
    // return null) — must also fall back to the stub, not kill the task
    val truncated = imageBytes(32, 32, "png").take(40)
    val trunc = Multimodal.decode(9L, "image/png", truncated)
    assert(trunc == Multimodal.decodeStub(9L, "image/png", truncated))
  }
}
