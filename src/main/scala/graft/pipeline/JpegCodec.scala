package graft.pipeline

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

/** Real JPEG codec over `javax.imageio` — pure-JDK (the baseline-JPEG
  * plugin ships inside every JDK; no native libraries involved), closing the
  * one image format [[Multimodal.ImageCodec]] could not cover with hand
  * bit-twiddling: JPEG's entropy coding (DCT + Huffman) is what genuinely
  * needs a library, and `ImageIO` IS that library, present in this JVM.
  *
  * Lifecycle contract (same as every codec in [[Multimodal]]): the
  * [[Reader]]/[[Writer]] wrap ONE `ImageReader`/`ImageWriter` instance and
  * are neither thread-safe nor serializable — construct them INSIDE a
  * `mapPartitions` closure, once per partition, and stream rows through.
  * `ImageIO.setUseCache(false)` keeps decode fully in-memory (no executor
  * tmp-file traffic on a 100 TB scan).
  *
  * Determinism: for a fixed JDK the encoder output and decoder pixels are
  * byte-for-byte reproducible (probed: double-encode of the same raster is
  * `Arrays.equals`-identical), so staged JPEG bytes hash-gate cross-engine
  * and decoded pixels are stable across the Verify/Bench runs.
  */
object JpegCodec {

  /** SOI marker check — JPEG streams begin FF D8 FF. */
  def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 4 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8 &&
      (b(2) & 0xFF) == 0xFF

  /** One `ImageReader` reused across a partition's rows. Poison-blob
    * tolerant: any decode failure (truncated stream, hostile header, wrong
    * format) yields None instead of killing the task — the same guard the
    * PNG path gets from `Try(decodeGrayPng)`.
    */
  final class Reader {
    ImageIO.setUseCache(false)
    private val reader = ImageIO.getImageReadersByFormatName("jpeg").next()

    /** (width, height, row-major gray8 pixels). Dims are read from the
      * header BEFORE the pixel decode so [[Multimodal.ImageCodec.MaxDecodePixels]]
      * can refuse an adversarial 40000×40000 header without allocating.
      * Color images are reduced to integer ITU-R 601 luma; grayscale JPEGs
      * (the fixture corpus) decode straight from band 0.
      */
    def decodeGray(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = scala.util.Try {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(b))
      try {
        reader.setInput(iis, true, true)
        val w = reader.getWidth(0)
        val h = reader.getHeight(0)
        require(w > 0 && h > 0 && w.toLong * h <= Multimodal.ImageCodec.MaxDecodePixels,
          s"refusing JPEG dims ${w}x$h (non-positive or > ${Multimodal.ImageCodec.MaxDecodePixels} pixels)")
        val img = reader.read(0)
        val raster = img.getRaster
        val bands = raster.getNumBands
        val px = new Array[Byte](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v =
              if (bands == 1) raster.getSample(x, y, 0)
              else (299 * raster.getSample(x, y, 0) + 587 * raster.getSample(x, y, 1) +
                114 * raster.getSample(x, y, 2)) / 1000
            px(y * w + x) = (v & 0xFF).toByte
            x += 1
          }
          y += 1
        }
        (w, h, px)
      } finally iis.close()
    }.toOption
  }

  /** One `ImageWriter` reused across a partition's rows (fixture side). */
  final class Writer(quality: Float = 0.9f) {
    ImageIO.setUseCache(false)
    private val writer = ImageIO.getImageWritersByFormatName("jpeg").next()

    /** Baseline grayscale JPEG from raw row-major gray8 pixels. */
    def encodeGray(w: Int, h: Int, pixels: Array[Byte]): Array[Byte] = {
      require(w > 0 && h > 0 && pixels.length == w * h,
        s"encodeGray: need $w*$h=${w * h} pixels, got ${pixels.length}")
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      img.getRaster.setDataElements(0, 0, w, h, pixels)
      val bos = new ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(bos)
      try {
        val param = writer.getDefaultWriteParam
        param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
        param.setCompressionQuality(quality)
        writer.setOutput(ios)
        writer.write(null, new IIOImage(img, null, null), param)
      } finally ios.close()
      bos.toByteArray
    }
  }
}
