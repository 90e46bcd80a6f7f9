package graft

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import graft.multimodal.{MediaFeatures, MediaKernel, MediaRecord}

/** REAL codec kernel (test scope — round-11 verdict task 3): proves
  * the [[MediaKernel]] seam's claim that a real decoder drops in
  * without touching any Spark-side plumbing. `javax.imageio` is
  * JDK-built-in (public API), so the codec-less-container constraint
  * doesn't bind here; the REGISTERED queries keep the deterministic
  * stub as their default kernel, so oracle hashes are untouched —
  * PipelineSpec swaps this kernel through the same plans and pins
  * identical row counts and schemas.
  *
  * Semantics (the shapes a production kernel would have):
  *   - decode: real PNG/JPEG decode; width/height from pixels, not
  *     byte arithmetic; checksum over the decoded RGB raster.
  *   - resize: halve dimensions and re-encode until the payload fits
  *     `targetBytes` (bounded halvings — a 1×1 PNG has a floor size).
  *   - sampleFrames: horizontal bands of the raster re-encoded per
  *     band (a still image standing in for video frame extraction).
  *   - fingerprint: a REAL aHash — 8×8 luma downsample of the decoded
  *     pixels, bit = block above mean luma (the perceptual key the
  *     stub approximates with raw-byte strides).
  */
object ImageIoKernel extends MediaKernel {
  override def init(): Unit = ImageIO.setUseCache(false)

  private def img(r: MediaRecord): BufferedImage = {
    val im = ImageIO.read(new ByteArrayInputStream(r.payload))
    require(im != null, s"payload of doc ${r.doc_id} is not a decodable image")
    im
  }

  private def png(im: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(im, "png", bos)
    bos.toByteArray
  }

  private def pixelChecksum(im: BufferedImage): Long = {
    var cs = 0L
    var y = 0
    while (y < im.getHeight) {
      var x = 0
      while (x < im.getWidth) {
        cs = (cs * 31 + (im.getRGB(x, y) & 0xffffff)) % 1000000007L
        x += 1
      }
      y += 1
    }
    cs
  }

  override def decode(r: MediaRecord): MediaFeatures = {
    val im = img(r)
    MediaFeatures(r.doc_id, r.payload.length.toLong, pixelChecksum(im),
      im.getWidth, im.getHeight)
  }

  override def resize(r: MediaRecord, targetBytes: Int): MediaRecord = {
    var im = img(r)
    var out = r.payload
    var guard = 0
    while (out.length > targetBytes &&
        math.min(im.getWidth, im.getHeight) > 1 && guard < 16) {
      val w = math.max(1, im.getWidth / 2)
      val h = math.max(1, im.getHeight / 2)
      val sm = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val g = sm.createGraphics()
      g.drawImage(im.getScaledInstance(w, h,
        java.awt.Image.SCALE_AREA_AVERAGING), 0, 0, null)
      g.dispose()
      im = sm
      out = png(sm)
      guard += 1
    }
    r.copy(payload = out, n_bytes = out.length.toLong)
  }

  override def sampleFrames(r: MediaRecord,
                            nFrames: Int): Seq[(Int, Int, Long)] = {
    val im = img(r)
    val n = math.max(1, math.min(nFrames, im.getHeight))
    (0 until n).map { f =>
      val y0 = f * im.getHeight / n
      val h = math.max(1, (f + 1) * im.getHeight / n - y0)
      val band = im.getSubimage(0, y0, im.getWidth, h)
      (f, png(band).length, pixelChecksum(band))
    }
  }

  override def fingerprint(r: MediaRecord): Long = {
    val im = img(r)
    val lum = new Array[Double](64)
    var b = 0
    while (b < 64) {
      val bx = b % 8; val by = b / 8
      val x0 = bx * im.getWidth / 8
      val x1 = math.min(im.getWidth, math.max(x0 + 1, (bx + 1) * im.getWidth / 8))
      val y0 = by * im.getHeight / 8
      val y1 = math.min(im.getHeight, math.max(y0 + 1, (by + 1) * im.getHeight / 8))
      var s = 0.0; var c = 0
      var y = y0
      while (y < y1) {
        var x = x0
        while (x < x1) {
          val rgb = im.getRGB(x, y)
          s += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
            0.114 * (rgb & 0xff)
          c += 1
          x += 1
        }
        y += 1
      }
      lum(b) = if (c > 0) s / c else 0.0
      b += 1
    }
    val mean = lum.sum / 64
    lum.zipWithIndex.foldLeft(0L) { case (ph, (v, i)) =>
      if (v > mean) ph | (1L << i) else ph
    }
  }
}
