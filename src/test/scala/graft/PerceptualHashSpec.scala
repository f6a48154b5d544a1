package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Perceptual (average-hash) image near-dup: real PNG fixtures pin the
  * guarantee — a lightly-perturbed copy of an image lands within the
  * hamming radius of its original, a structurally-opposite image lands far
  * outside it, and the banded candidate join has EXACT recall at
  * hamming <= 3 (pigeonhole over four disjoint 16-bit bands), verified
  * against an in-test brute-force twin on the corpus stub path. */
class PerceptualHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** A structured 32x32 PNG: left half dark, right half bright, with a
    * per-pixel deterministic jitter of amplitude `noise`. */
  private def pngBytes(noise: Int, invert: Boolean = false): Array[Byte] = {
    val img = new BufferedImage(32, 32, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 32; y <- 0 until 32) {
      val base = if ((x < 16) != invert) 40 else 215
      val v = (base + ((x * 7 + y * 13) % (noise + 1))) & 0xff
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def mediaDf(rows: Seq[(Long, Array[Byte])]) =
    rows.toDF("doc_id", "payload")
      .withColumn("media_type", lit("image/png"))
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))

  test("a perturbed copy is a near-dup; an inverted image is not") {
    val media = mediaDf(Seq(
      (1L, pngBytes(noise = 0)),
      (2L, pngBytes(noise = 3)),          // lightly-retouched copy of 1
      (3L, pngBytes(noise = 0, invert = true))))
    val pairs = Multimodal.perceptualDupPairs(spark, media)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)),
      s"expected exactly the (original, retouch) pair, got ${pairs.toSeq}")
    assert(pairs.head._3 <= 3)
    // the inverted image is ~maximally distant from both
    val h = Multimodal.aHash(spark, media).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val d13 = h(1L).zip(h(3L)).count { case (a, b) => a != b }
    assert(d13 > 32, s"inverted image unexpectedly close: $d13 bits")
  }

  test("aHash bits are the exact cross-multiplied mean comparison") {
    // uniform image: every cell equals the mean -> every bit set
    val img = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 8; y <- 0 until 8) img.setRGB(x, y, 0x808080)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    val h = Multimodal.aHash(spark, mediaDf(Seq((1L, bos.toByteArray))))
      .head()
    assert(h.getAs[Long]("popcount") == 64L)
    assert(h.getAs[Int]("band0") == 0xffff && h.getAs[Int]("band3") == 0xffff)
  }

  test("banding has exact recall at hamming <= 3 on the corpus stub path") {
    val media = Multimodal.asMediaTable(
      Tables.load(spark, TestSpark.sfDir, "documents"))
    val banded = Multimodal.perceptualDupPairs(spark, media)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hashes = Multimodal.aHash(spark, media).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val brute = (for {
      a <- hashes.keys; b <- hashes.keys if a < b
      if hashes(a).zip(hashes(b)).count { case (x, y) => x != y } <= 3
    } yield (a, b)).toSet
    assert(banded == brute,
      s"banding diverged from brute force: ${banded.diff(brute)} extra, " +
        s"${brute.diff(banded)} missed")
  }

  test("stub-path hashes are deterministic across runs") {
    val media = Multimodal.asMediaTable(
      Tables.load(spark, TestSpark.sfDir, "documents"))
    val a = Multimodal.aHash(spark, media).orderBy("doc_id")
      .select("doc_id", "band0", "band1", "band2", "band3").collect().toSeq
    val b = Multimodal.aHash(spark, media).orderBy("doc_id")
      .select("doc_id", "band0", "band1", "band2", "band3").collect().toSeq
    assert(a == b)
  }
}
