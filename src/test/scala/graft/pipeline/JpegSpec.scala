package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The JPEG face: real `javax.imageio` encode/decode. The oracle gate
  * (`q_multimodal_jpeg`) cross-checks dims/bytes/hash words in DuckDB; this
  * spec pins the one layer SQL cannot reach — pixel-level decode fidelity —
  * plus the dedup property the face exists for and the poison-blob guard.
  */
class JpegSpec extends SparkSpec {
  import spark.implicits._

  test("encode∘decode roundtrip: dims exact, pixels within ~1 gray level on smooth rasters") {
    val (w, h) = (24, 16)
    // smooth gradient: JPEG's DCT quantization error is small and bounded
    val px = Array.tabulate(w * h)(i => (((i % w) * 8 + (i / w) * 4) & 0xFF).toByte)
    val writer = new JpegCodec.Writer()
    val jpeg = writer.encodeGray(w, h, px)
    assert(JpegCodec.isJpeg(jpeg))
    val Some((dw, dh, dpx)) = new JpegCodec.Reader().decodeGray(jpeg)
    assert(dw == w && dh == h)
    assert(dpx.length == w * h)
    val mae = px.indices.map(i => math.abs((px(i) & 0xFF) - (dpx(i) & 0xFF))).sum.toDouble / px.length
    assert(mae < 3.0, s"mean abs roundtrip error $mae — decoder not reading real pixels?")
  }

  test("determinism: same raster encodes to identical bytes, decodes to identical pixels") {
    val px = Array.tabulate(256)(i => ((i * 37 + 11) & 0xFF).toByte)
    val writer = new JpegCodec.Writer()
    val a = writer.encodeGray(16, 16, px)
    val b = writer.encodeGray(16, 16, px)
    assert(java.util.Arrays.equals(a, b))
    val reader = new JpegCodec.Reader()
    assert(reader.decodeGray(a).get._3.sameElements(reader.decodeGray(b).get._3))
  }

  test("poison blobs decode to None, not a task kill") {
    val reader = new JpegCodec.Reader()
    assert(reader.decodeGray(Array.empty[Byte]).isEmpty)
    assert(reader.decodeGray("not a jpeg at all".getBytes("UTF-8")).isEmpty)
    // real JPEG prefix, truncated mid-stream
    val jpeg = new JpegCodec.Writer().encodeGray(16, 16, Array.fill(256)(7.toByte))
    assert(reader.decodeGray(java.util.Arrays.copyOf(jpeg, jpeg.length / 3)).isEmpty)
  }

  test("identical texts yield identical JPEGs and identical ahash words (the dedup property)") {
    // ids 1 and 169 share fixture dims (w: id%24, h: (id/7)%24 both equal),
    // so the dup text yields the SAME raster → identical JPEG bytes →
    // identical decode → identical hash: the re-saved-copy collision the
    // perceptual face exists for
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (169L, "the quick brown fox jumps over the lazy dog"),
      (3L, "an entirely different document body here")).toDF("doc_id", "text")
    val out = Multimodal.jpegDecodeFace(docs).collect().map(r =>
      r.getLong(0) -> ((r.getLong(4), r.getLong(5)))).toMap
    assert(out(1L) == out(169L), "duplicate texts at equal dims must collide in ahash")
    assert(out(1L) != out(3L), "distinct texts must not collide here")
  }

  test("processMedia dispatches JPEG to the real decoder: dims + thumbnail from actual pixels") {
    val writer = new JpegCodec.Writer()
    val px = Array.tabulate(32 * 20)(i => ((i * 3) & 0xFF).toByte)
    val jpeg = writer.encodeGray(32, 20, px)
    val df = Seq((1L, jpeg)).toDF("id", "blob")
    val row = Multimodal.processMedia(df, "blob", thumbW = 4, thumbH = 4,
      nFrames = 2, dim = 2).collect()(0)
    assert(row.getInt(2) == 32 && row.getInt(3) == 20) // real dims, not stub 64+b0
    val thumb = row.getAs[Array[Byte]]("thumbnail")
    assert(thumb.length == 16)
    // thumbnail comes from decoded pixels: nearest-neighbor of the gradient,
    // so it must be close to the source raster's sampled values
    val expected = Multimodal.ImageCodec.resizeNearest(px, 32, 20, 4, 4)
    val mae = thumb.indices.map(i => math.abs((thumb(i) & 0xFF) - (expected(i) & 0xFF))).sum / 16.0
    assert(mae < 4.0, s"thumbnail mean error $mae vs source raster — stub path suspected")
  }
}
