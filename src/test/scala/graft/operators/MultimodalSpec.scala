package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.gsheets.Fixtures.spark

/** The multimodal path uses the REAL in-JDK image codec: encodePng emits
  * genuine PNG bytes, decode* parse them with javax.imageio. These specs
  * pin the codec round-trip and the parquet persistence of the binary
  * asset column (the "fixture parquet" a production pipeline would
  * stage).
  */
class MultimodalSpec extends AnyFunSuite {

  test("encodePng emits a real PNG that ImageIO decodes to the derived dims") {
    val bytes = Multimodal.encodePng(docId = 7L, textLen = 100)
    // PNG signature: 89 50 4E 47 0D 0A 1A 0A
    assert(bytes.take(4).map(_ & 0xff).toSeq == Seq(0x89, 0x50, 0x4e, 0x47))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val (w, h) = Multimodal.dims(100)
    assert(img.getWidth == w && img.getHeight == h)
  }

  test("decodeMeta reads back exactly the generated pixels (lossless round-trip)") {
    val docId = 42L
    val n = 333
    val meta = Multimodal.decodeMeta(docId, Multimodal.encodePng(docId, n))
    val (w, h) = Multimodal.dims(n)
    assert(meta.width == w && meta.height == h && meta.n_pixels == w * h)
    // Independent recomputation from the pixel formula — if the codec
    // were lossy or the decode misread channels, this would diverge.
    val d = (docId % 256).toInt
    var expect = 0L
    var p = 0
    for (y <- 0 until h; x <- 0 until w) {
      expect += Multimodal.pixelWeight(x, y, d).toLong * (p % 97 + 1)
      p += 1
    }
    assert(meta.pix_checksum == expect)
  }

  test("frameSample keeps every 2nd row; resizeThumb is deterministic") {
    val docId = 5L
    val n = 200
    val bytes = Multimodal.encodePng(docId, n)
    val (w, h) = Multimodal.dims(n)
    val frames = Multimodal.frameSample(docId, bytes, every = 2).toSeq
    assert(frames.map(_.frame_idx) == (0 until h by 2))
    assert(frames.forall(_.n_px == w))
    val t1 = Multimodal.resizeThumb(docId, bytes, target = 16)
    val t2 = Multimodal.resizeThumb(docId, bytes, target = 16)
    assert(t1 == t2 && t1.width == w && t1.height == h)
  }

  test("binary asset column round-trips through parquet and decodes identically") {
    import spark.implicits._
    val docs = Seq((1L, 64), (2L, 150), (3L, 999))
    val assets = docs.toDF("doc_id", "text_len")
      .as[(Long, Int)]
      .map { case (id, n) => (id, Multimodal.encodePng(id, n)) }
      .toDF("doc_id", "bytes")
    val dir = java.nio.file.Files.createTempDirectory("mm-assets").toString
    assets.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir).as[(Long, Array[Byte])]
      .collect().sortBy(_._1)
    val metas = back.map { case (id, b) => Multimodal.decodeMeta(id, b) }
    val direct = docs.map { case (id, n) =>
      Multimodal.decodeMeta(id, Multimodal.encodePng(id, n)) }
    assert(metas.toSeq == direct)
  }

  test("undecodable bytes fail loudly, not silently") {
    val err = intercept[IllegalArgumentException] {
      Multimodal.decodeMeta(1L, Array[Byte](1, 2, 3, 4))
    }
    assert(err.getMessage.contains("undecodable"))
  }
}
