package graft.pipeline

import java.security.MessageDigest
import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("withMediaMeta stamps byte length and content digest") {
    val payload = "hello blob".getBytes("UTF-8")
    val df = Seq((1L, payload)).toDF("id", "blob")
    val row = Multimodal.withMediaMeta(df, "blob", "image/png")
      .select("meta.media_type", "meta.byte_len", "meta.content_sha256")
      .collect()(0)
    assert(row.getString(0) == "image/png")
    assert(row.getLong(1) == payload.length.toLong)
    val expected = MessageDigest.getInstance("SHA-256").digest(payload)
      .map("%02x".format(_)).mkString
    assert(row.getString(2) == expected)
  }

  test("extractFeatures appends a fixed-dim feature vector per row, schema intact") {
    val df = Seq((1L, "abcdefgh".getBytes("UTF-8")), (2L, Array.empty[Byte]))
      .toDF("id", "blob")
    val out = Multimodal.extractFeatures(df, "blob", dim = 4)
    assert(out.columns.toSeq == Seq("id", "blob", "features"))
    val rows = out.orderBy("id").collect()
    val f1 = rows(0).getSeq[Float](2)
    assert(f1.size == 4)
    assert(f1 == Seq('a'.toFloat, 'c'.toFloat, 'e'.toFloat, 'g'.toFloat))
    assert(rows(1).getSeq[Float](2) == Seq(0f, 0f, 0f, 0f)) // empty blob guarded
  }

  test("processMedia: decode + resize + frame-sample in one partition pass") {
    val df = Seq(
      (1L, Array.tabulate(100)(_.toByte)),
      (2L, Array.empty[Byte])).toDF("id", "blob")
    val out = Multimodal.processMedia(df, "blob", thumbW = 4, thumbH = 4,
      nFrames = 3, dim = 2)
    assert(out.columns.toSeq == Seq("id", "blob", "width", "height", "thumbnail", "frames"))
    val rows = out.orderBy("id").collect()
    // decode: dims from the header bytes (0x00, 0x01 → 64+0, 64+1)
    assert(rows(0).getInt(2) == 64 && rows(0).getInt(3) == 65)
    // resize contract: output size depends only on (w, h)
    assert(rows(0).getAs[Array[Byte]]("thumbnail").length == 16)
    assert(rows(1).getAs[Array[Byte]]("thumbnail").length == 16) // empty blob too
    // frame-sample: nFrames frames of dim features each
    val frames = rows(0).getSeq[scala.collection.Seq[Float]](5).map(_.toList)
    assert(frames.size == 3 && frames.forall(_.size == 2))
    // frames come from distinct regions of the stream
    assert(frames.distinct.size == 3)
  }

  test("ImageCodec: encode∘decode is the identity on gray8 pixels") {
    val (w, h) = (23, 11)
    val px = Array.tabulate(w * h)(i => ((i * 37 + 5) & 0xFF).toByte)
    val png = Multimodal.ImageCodec.encodeGrayPng(w, h, px)
    assert(Multimodal.ImageCodec.isPng(png))
    assert(Multimodal.ImageCodec.headerDims(png).contains((w, h)))
    val (dw, dh, dpx) = Multimodal.ImageCodec.decodeGrayPng(png)
    assert((dw, dh) == (w, h))
    assert(dpx.toSeq == px.toSeq)
  }

  test("ImageCodec: decoder reverses all five PNG scanline filters") {
    // hand-build a PNG whose rows use filters 0..4, applying each filter
    // FORWARD here; the decoder must undo them back to the plain pixels
    val (w, h) = (7, 5)
    val px = Array.tabulate(w * h)(i => ((i * 11 + 3) & 0xFF).toByte)
    def p(x: Int, y: Int): Int =
      if (x < 0 || y < 0) 0 else px(y * w + x) & 0xFF
    val raw = new java.io.ByteArrayOutputStream()
    for (y <- 0 until h) {
      val ft = y % 5
      raw.write(ft)
      for (x <- 0 until w) {
        val (cur, left, up, ul) = (p(x, y), p(x - 1, y), p(x, y - 1), p(x - 1, y - 1))
        val pred = ft match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 =>
            val pr = left + up - ul
            val (pa, pb, pc) = (math.abs(pr - left), math.abs(pr - up), math.abs(pr - ul))
            if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
        }
        raw.write((cur - pred) & 0xFF)
      }
    }
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(Multimodal.ImageCodec.PngSig)
    def beInt(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def chunk(t: String, d: Array[Byte]): Unit = {
      bos.write(beInt(d.length)); val tb = t.getBytes("US-ASCII")
      bos.write(tb); bos.write(d)
      val crc = new java.util.zip.CRC32(); crc.update(tb); crc.update(d)
      bos.write(beInt(crc.getValue.toInt))
    }
    chunk("IHDR", java.nio.ByteBuffer.allocate(13).putInt(w).putInt(h)
      .put(8.toByte).put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte).array())
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw.toByteArray); defl.finish()
    val buf = new Array[Byte](4096); val idat = new java.io.ByteArrayOutputStream()
    while (!defl.finished()) idat.write(buf, 0, defl.deflate(buf))
    defl.end()
    // split IDAT across two chunks: decoders must concatenate payloads
    val ib = idat.toByteArray
    chunk("IDAT", ib.take(ib.length / 2)); chunk("IDAT", ib.drop(ib.length / 2))
    chunk("IEND", Array.emptyByteArray)
    val (dw, dh, dpx) = Multimodal.ImageCodec.decodeGrayPng(bos.toByteArray)
    assert((dw, dh) == (w, h))
    assert(dpx.toSeq == px.toSeq)
  }

  test("ImageCodec: BMP dimension probe reads the real DIB header") {
    // minimal BITMAPINFOHEADER prefix: 'BM', 14-byte file header, then DIB
    // with little-endian width 640 at 18 and height -480 at 22 (top-down)
    val b = new Array[Byte](26)
    b(0) = 'B'.toByte; b(1) = 'M'.toByte
    def le(v: Int, o: Int): Unit = {
      b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
      b(o + 2) = (v >> 16).toByte; b(o + 3) = (v >> 24).toByte
    }
    le(40, 14); le(640, 18); le(-480, 22)
    assert(Multimodal.ImageCodec.headerDims(b).contains((640, 480)))
    assert(Multimodal.ImageCodec.headerDims("not an image".getBytes).isEmpty)
  }

  test("processMedia decodes REAL PNGs: dims and thumbnail from actual pixels") {
    // 2×2 blocks image: nearest-neighbor 8×8 → 4×4 picks one byte per block
    val (w, h) = (8, 8)
    val px = Array.tabulate(w * h)(i => (((i % w) / 2 + 4 * ((i / w) / 2)) * 16).toByte)
    val png = Multimodal.ImageCodec.encodeGrayPng(w, h, px)
    val df = Seq((1L, png), (2L, "???not-an-image".getBytes("UTF-8")))
      .toDF("id", "blob")
    val rows = Multimodal.processMedia(df, "blob", thumbW = 4, thumbH = 4,
      nFrames = 2, dim = 2).orderBy("id").collect()
    assert(rows(0).getInt(2) == 8 && rows(0).getInt(3) == 8)
    val thumb = rows(0).getAs[Array[Byte]]("thumbnail")
    assert(thumb.length == 16)
    // each 2×2 source block is constant at ((x/2)+4*(y/2))*16, so the 4×4
    // nearest-neighbor picks block (x', y') → value (x' + 4*y')*16 = i*16
    assert(thumb.toSeq == Array.tabulate(16)(i => (i * 16).toByte).toSeq)
    // unknown format falls back to the deterministic stub (dims 64+b0, 64+b1)
    assert(rows(1).getInt(2) == 64 + ('?' & 0x3F))
  }

  test("poison PNGs error loudly in the codec and fall back in processMedia") {
    def beInt(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def chunk(t: String, d: Array[Byte], lenOverride: Option[Int] = None): Array[Byte] = {
      val tb = t.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32(); crc.update(tb); crc.update(d)
      beInt(lenOverride.getOrElse(d.length)) ++ tb ++ d ++ beInt(crc.getValue.toInt)
    }
    def ihdr(w: Int, h: Int) = java.nio.ByteBuffer.allocate(13).putInt(w).putInt(h)
      .put(8.toByte).put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte).array()
    val sig = Multimodal.ImageCodec.PngSig
    // zero width: decode refuses (and resize can never see an empty array)
    val zeroW = sig ++ chunk("IHDR", ihdr(0, 5))
    intercept[IllegalArgumentException](Multimodal.ImageCodec.decodeGrayPng(zeroW))
    // absurd dims: refused BEFORE allocating (Try can't catch an OOM)
    val huge = sig ++ chunk("IHDR", ihdr(40000, 40000))
    intercept[IllegalArgumentException](Multimodal.ImageCodec.decodeGrayPng(huge))
    // negative chunk length: the chunk walk must error, not spin forever
    val negLen = sig ++ chunk("IHDR", ihdr(1, 1)) ++
      chunk("IDAT", Array[Byte](1, 2, 3), lenOverride = Some(-12))
    intercept[IllegalArgumentException](Multimodal.ImageCodec.decodeGrayPng(negLen))
    // zlib stream demanding a preset dictionary: inflate loop must error,
    // not spin (FDICT flag set; 0x78 0x20 passes the zlib header check)
    val fdict = sig ++ chunk("IHDR", ihdr(1, 1)) ++
      chunk("IDAT", Array[Byte](0x78, 0x20, 0, 0, 0, 0)) ++ chunk("IEND", Array.emptyByteArray)
    intercept[RuntimeException](Multimodal.ImageCodec.decodeGrayPng(fdict))
    // the pipeline survives ALL of them via the deterministic stub fallback
    val df = Seq((1L, zeroW), (2L, huge), (3L, negLen), (4L, fdict)).toDF("id", "blob")
    assert(Multimodal.processMedia(df, "blob", 4, 4, 1, 2).count() == 4)
  }

  test("WAV codec round-trips PCM16 and survives hostile containers") {
    import Multimodal.AudioCodec
    val samples = Array.tabulate(777)(i => ((i * 131) % 30000 - 15000).toShort)
    val wav = AudioCodec.encodePcm16Wav(11025, samples)
    // encode∘decode identity on rate and every sample
    val Some((rate, back)) = AudioCodec.decodePcm16Wav(wav)
    assert(rate == 11025 && back.sameElements(samples))
    // chunk walk: an unknown chunk (odd length → padded) before data is skipped
    val le = java.nio.ByteOrder.LITTLE_ENDIAN
    val extra = java.nio.ByteBuffer.allocate(8 + 3 + 1).order(le)
      .put("LIST".getBytes("US-ASCII")).putInt(3)
      .put(Array[Byte](9, 9, 9, 0)).array()
    val withChunk = wav.take(36) ++ extra ++ wav.drop(36)
    // fix RIFF size field
    java.nio.ByteBuffer.wrap(withChunk).order(le).putInt(4, withChunk.length - 8)
    val Some((r2, b2)) = AudioCodec.decodePcm16Wav(withChunk)
    assert(r2 == 11025 && b2.sameElements(samples))
    // poison: truncated data chunk length, non-RIFF, stereo all → None
    val truncated = wav.clone()
    java.nio.ByteBuffer.wrap(truncated).order(le).putInt(40, Int.MaxValue - 7)
    assert(AudioCodec.decodePcm16Wav(truncated).isEmpty)
    assert(AudioCodec.decodePcm16Wav("nope".getBytes).isEmpty)
    val stereo = wav.clone(); stereo(22) = 2
    assert(AudioCodec.decodePcm16Wav(stereo).isEmpty)
  }

  test("feature extraction composes with the metadata stamp end-to-end") {
    val blobs = graft.analytics.Tables.documents(spark, sf())
      .limit(20)
      .select($"doc_id", $"text".cast("binary").as("blob"))
    val out = Multimodal.extractFeatures(
      Multimodal.withMediaMeta(blobs, "blob", "text/plain"), "blob", dim = 8)
    assert(out.count() == 20)
    assert(out.schema("features").dataType.typeName == "array")
    assert(out.filter(size($"features") =!= 8).count() == 0)
  }
}
