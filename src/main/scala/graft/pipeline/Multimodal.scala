package graft.pipeline

import graft.QueryDef
import graft.analytics.Tables
import graft.operators.Checkpoints.StableOps
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video travel as opaque `binary`
  * columns with typed metadata structs alongside. The Spark-side machinery —
  * schema, partition-preserving batch processing, per-partition decoder
  * lifecycle — is real, and so are the IMAGE and AUDIO paths:
  * [[ImageCodec]] encodes and fully decodes 8-bit grayscale PNG
  * (java.util.zip, no native deps) and probes BMP dimensions from the real
  * DIB header; [[JpegCodec]] decodes real JPEG via `javax.imageio` (the
  * baseline-JPEG plugin ships in this JDK — no native libs needed);
  * [[AudioCodec]] decodes PCM16-mono WAV by walking real RIFF chunks. So
  * `processMedia`'s width/height/thumbnail come from actual bytes for
  * PNG/BMP/JPEG and are oracle-gated (`q_multimodal_decode`,
  * `q_multimodal_jpeg`). Only VIDEO frame extraction remains behind the
  * deterministic [[StubCodec]] — container demuxing + inter-frame codecs
  * (H.264 et al.) genuinely have no pure-JDK implementation — swap it
  * without touching the plan.
  */
object Multimodal {

  /** Typed metadata carried next to every blob. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType, nullable = false),
    StructField("byte_len", LongType, nullable = false),
    StructField("content_sha256", StringType, nullable = false)))

  /** Deterministic stand-in for a media codec: "features" derived from the
    * bytes. In production this is the only symbol to replace (JNI/FFmpeg/
    * image lib), instantiated ONCE PER PARTITION — never per row.
    */
  object StubCodec {
    /** Pretend frame-sample: k evenly spaced bytes as floats. */
    def sampleFeatures(bytes: Array[Byte], k: Int): Array[Float] =
      if (bytes.isEmpty) Array.fill(k)(0f)
      else Array.tabulate(k)(i => bytes(((i.toLong * bytes.length) / k).toInt & Int.MaxValue).toFloat)

    /** Pretend decode: (width, height) read deterministically from the blob
      * header — stands in for an image decoder's dimension probe.
      */
    def decodeDims(bytes: Array[Byte]): (Int, Int) =
      if (bytes.length < 2) (0, 0)
      else (64 + (bytes(0) & 0x3F), 64 + (bytes(1) & 0x3F))

    /** Pretend resize: re-sample the blob to exactly `w*h` bytes (nearest-
      * neighbor over the byte stream) — stands in for a thumbnail op. The
      * contract production code must keep: output size depends only on
      * (w, h), never on the input size.
      */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
      if (bytes.isEmpty) Array.fill(w * h)(0.toByte)
      else Array.tabulate(w * h)(i => bytes(((i.toLong * bytes.length) / (w * h)).toInt & Int.MaxValue))

    /** Pretend video frame-sample: n evenly spaced "frames", each a k-dim
      * feature slice of its region of the stream.
      */
    def sampleFrames(bytes: Array[Byte], nFrames: Int, k: Int): Array[Array[Float]] =
      Array.tabulate(nFrames) { f =>
        val start = ((f.toLong * bytes.length) / nFrames).toInt
        val end = (((f + 1).toLong * bytes.length) / nFrames).toInt
        sampleFeatures(java.util.Arrays.copyOfRange(bytes, start, math.max(start, end)), k)
      }
  }

  /** Real, dependency-free image codec — the production slot
    * [[StubCodec.decodeDims]]/[[StubCodec.resize]] stood in for.
    *
    *  - PNG (ISO/IEC 15948): signature check; width/height big-endian at
    *    offsets 16/20 of the IHDR chunk; FULL decode of the 8-bit grayscale
    *    non-interlaced subset — IDAT chunks (arbitrarily split) inflated
    *    with `java.util.zip.Inflater`, then all five scanline filters
    *    (None/Sub/Up/Average/Paeth) reversed. The encoder emits the same
    *    subset with filter 0 rows, so encode∘decode is the identity on
    *    pixels.
    *  - BMP: 'BM' magic; width/height little-endian int32 at offsets 18/22
    *    of BITMAPINFOHEADER (height's sign encodes row order → abs).
    *
    * Everything is deterministic byte arithmetic — no JNI, no ImageIO — so
    * the decode is oracle-checkable: DuckDB independently parses the same
    * header bytes in `q_multimodal_decode`.
    */
  object ImageCodec {
    val PngSig: Array[Byte] =
      Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

    def isPng(b: Array[Byte]): Boolean =
      b.length >= 24 && PngSig.indices.forall(i => b(i) == PngSig(i))
    def isBmp(b: Array[Byte]): Boolean =
      b.length >= 26 && b(0) == 'B'.toByte && b(1) == 'M'.toByte

    private def beInt(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xFF) << 24) | ((b(o + 1) & 0xFF) << 16) |
        ((b(o + 2) & 0xFF) << 8) | (b(o + 3) & 0xFF)
    private def leInt(b: Array[Byte], o: Int): Int =
      (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
        ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)

    /** (width, height) parsed from a real PNG or BMP header; None for
      * formats this codec doesn't know.
      */
    def headerDims(b: Array[Byte]): Option[(Int, Int)] =
      if (isPng(b)) Some((beInt(b, 16), beInt(b, 20)))
      else if (isBmp(b)) Some((leInt(b, 18), math.abs(leInt(b, 22))))
      else None

    /** A valid 8-bit grayscale non-interlaced PNG (CRC'd chunks, zlib
      * stream, filter-0 scanlines) from raw row-major pixels.
      */
    def encodeGrayPng(w: Int, h: Int, pixels: Array[Byte]): Array[Byte] = {
      require(w > 0 && h > 0 && pixels.length == w * h,
        s"encodeGrayPng: need $w*$h=${w * h} pixels, got ${pixels.length}")
      val out = new java.io.ByteArrayOutputStream()
      def beWrite(v: Int): Unit = {
        out.write((v >>> 24) & 0xFF); out.write((v >>> 16) & 0xFF)
        out.write((v >>> 8) & 0xFF); out.write(v & 0xFF)
      }
      def chunk(typ: String, data: Array[Byte]): Unit = {
        val tb = typ.getBytes("US-ASCII")
        beWrite(data.length)
        out.write(tb); out.write(data)
        val crc = new java.util.zip.CRC32()
        crc.update(tb); crc.update(data)
        beWrite(crc.getValue.toInt)
      }
      out.write(PngSig)
      val ihdr = java.nio.ByteBuffer.allocate(13)
        .putInt(w).putInt(h)
        .put(8.toByte)  // bit depth
        .put(0.toByte)  // color type: grayscale
        .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, adaptive, no interlace
        .array()
      chunk("IHDR", ihdr)
      val raw = new Array[Byte]((w + 1) * h)
      var y = 0
      while (y < h) { // filter byte 0 already zero-initialized
        System.arraycopy(pixels, y * w, raw, y * (w + 1) + 1, w)
        y += 1
      }
      val deflater = new java.util.zip.Deflater()
      deflater.setInput(raw); deflater.finish()
      val buf = new Array[Byte](8192)
      val idat = new java.io.ByteArrayOutputStream()
      while (!deflater.finished()) idat.write(buf, 0, deflater.deflate(buf))
      deflater.end()
      chunk("IDAT", idat.toByteArray)
      chunk("IEND", Array.emptyByteArray)
      out.toByteArray
    }

    /** Full decode of the grayscale-8 non-interlaced subset:
      * (width, height, row-major pixels). Throws on anything else — callers
      * wanting poison-blob tolerance wrap in Try (processMedia does).
      */
    /** Pixel cap for decode allocations: header-declared dims are UNTRUSTED
      * bytes, and `Try` cannot catch the OutOfMemoryError an adversarial
      * 40000×40000 header would otherwise trigger — refuse loudly instead.
      */
    val MaxDecodePixels: Long = 1L << 26 // 64M gray8 pixels = 64 MB

    def decodeGrayPng(b: Array[Byte]): (Int, Int, Array[Byte]) = {
      require(isPng(b), "not a PNG")
      val w = beInt(b, 16); val h = beInt(b, 20)
      require(w > 0 && h > 0 && w.toLong * h <= MaxDecodePixels,
        s"refusing PNG dims ${w}x$h (non-positive or > $MaxDecodePixels pixels)")
      require(b(24) == 8 && b(25) == 0 && b(28) == 0,
        s"unsupported PNG variant (bitDepth=${b(24)} colorType=${b(25)} interlace=${b(28)}): " +
          "this pure-JVM codec decodes 8-bit grayscale non-interlaced only")
      // concatenate IDAT payloads (a writer may split them arbitrarily);
      // chunk lengths are untrusted — a negative or overlong length must
      // error, not spin the walk loop or read out of bounds
      val idat = new java.io.ByteArrayOutputStream()
      var o = 8
      var done = false
      while (!done && o + 8 <= b.length) {
        val len = beInt(b, o)
        require(len >= 0 && o + 12L + len <= b.length,
          s"corrupt PNG chunk at offset $o: length $len")
        val typ = new String(b, o + 4, 4, "US-ASCII")
        if (typ == "IDAT") idat.write(b, o + 8, len)
        if (typ == "IEND") done = true
        o += 12 + len // len + type + data + crc
      }
      val inflater = new java.util.zip.Inflater()
      inflater.setInput(idat.toByteArray)
      val raw = new Array[Byte]((w + 1) * h)
      var filled = 0
      while (filled < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, filled, raw.length - filled)
        // n == 0 without progress covers BOTH truncation (needsInput) and
        // zlib streams demanding a preset dictionary (needsDictionary) —
        // either would spin this loop forever if only needsInput errored
        if (n == 0) sys.error(
          if (inflater.needsDictionary()) "zlib preset dictionary unsupported"
          else "truncated IDAT stream")
        filled += n
      }
      inflater.end()
      require(filled == raw.length, s"short pixel data: $filled of ${raw.length}")
      // reverse scanline filters (bpp = 1 for gray8)
      val px = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        val ft = raw(y * (w + 1)) & 0xFF
        var x = 0
        while (x < w) {
          val cur = raw(y * (w + 1) + 1 + x) & 0xFF
          val left = if (x > 0) px(y * w + x - 1) & 0xFF else 0
          val up = if (y > 0) px((y - 1) * w + x) & 0xFF else 0
          val upLeft = if (x > 0 && y > 0) px((y - 1) * w + x - 1) & 0xFF else 0
          val v = ft match {
            case 0 => cur
            case 1 => cur + left
            case 2 => cur + up
            case 3 => cur + (left + up) / 2
            case 4 => // Paeth predictor
              val p = left + up - upLeft
              val (pa, pb, pc) = (math.abs(p - left), math.abs(p - up), math.abs(p - upLeft))
              cur + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else upLeft)
            case other => sys.error(s"unknown PNG filter type $other")
          }
          px(y * w + x) = (v & 0xFF).toByte
          x += 1
        }
        y += 1
      }
      (w, h, px)
    }

    /** Nearest-neighbor resample of real pixels — the thumbnail op. */
    def resizeNearest(px: Array[Byte], w: Int, h: Int, ow: Int, oh: Int): Array[Byte] =
      Array.tabulate(ow * oh) { i =>
        val x = i % ow; val y = i / ow
        px((y.toLong * h / oh).toInt * w + (x.toLong * w / ow).toInt)
      }
  }

  /** Attach metadata to a blob column — pure codegen'd expressions. */
  /** Real, dependency-free audio codec for the WAV/PCM16-mono subset —
    * the audio analogue of [[ImageCodec]]: RIFF container (chunk-walked,
    * not offset-assumed, so decoders survive extra chunks), 16-bit
    * little-endian PCM samples. Everything is integer byte arithmetic, so
    * the decode is oracle-checkable: DuckDB independently re-parses the
    * same staged bytes sample by sample in `q_audio_features`.
    */
  object AudioCodec {

    /** Canonical 44-byte-header mono PCM16 WAV from raw samples. */
    def encodePcm16Wav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
      val dataLen = samples.length * 2
      val out = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      out.put("WAVE".getBytes("US-ASCII"))
      out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      out.putShort(1).putShort(1) // PCM, mono
      out.putInt(sampleRate).putInt(sampleRate * 2)
      out.putShort(2).putShort(16) // block align, bits/sample
      out.put("data".getBytes("US-ASCII")).putInt(dataLen)
      samples.foreach(out.putShort)
      out.array()
    }

    /** (sampleRate, samples) from a PCM16-mono WAV, walking RIFF chunks
      * (fmt before data assumed, as RIFF requires; unknown chunks are
      * skipped, odd-length chunks padded per spec). None when the blob is
      * not this subset — the poison-blob guard a 100 TB scan needs.
      */
    def decodePcm16Wav(b: Array[Byte]): Option[(Int, Array[Short])] = {
      if (b.length < 12 || !(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F') ||
        !(b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
      val buf = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var pos = 12
      var rate = -1
      var ok = false
      var data: Array[Short] = null
      while (data == null && pos + 8 <= b.length) {
        val id = new String(b, pos, 4, "US-ASCII")
        val len = buf.getInt(pos + 4)
        // long arithmetic: a hostile length near Int.MaxValue overflows an
        // int sum and would sail past this bound check
        if (len < 0 || pos.toLong + 8 + len > b.length) return None
        id match {
          case "fmt " if len >= 16 =>
            ok = buf.getShort(pos + 8) == 1 && buf.getShort(pos + 10) == 1 &&
              buf.getShort(pos + 22) == 16 // PCM, mono, 16-bit
            rate = buf.getInt(pos + 12)
          case "data" if ok =>
            data = Array.tabulate(len / 2)(i => buf.getShort(pos + 8 + 2 * i))
          case _ => ()
        }
        pos += 8 + len + (len & 1) // chunks are word-aligned
      }
      if (data == null || rate <= 0) None else Some((rate, data))
    }
  }

  /** Deterministic REAL-WAV fixture generator: one valid PCM16-mono WAV
    * per doc — sample count and rate derived from doc_id, the waveform
    * cycled from the doc's UTF-8 bytes with every 4th 256-sample window
    * near-silent (so silence detection is non-vacuous). Same
    * `mapPartitions` shape as [[docPngs]].
    */
  def docWavs(docs: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("wav", BinaryType, nullable = false)))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    docs.select(col("doc_id"), col("text")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val tb = Option(r.getString(1)).getOrElse("").getBytes("UTF-8")
        val n = (512 + (id % 256)).toInt
        val rate = (8000 + (id % 8) * 1000).toInt
        val samples = Array.tabulate(n) { i =>
          if ((i / 256) % 4 == 3) ((i % 7) - 3).toShort // near-silent window
          else {
            val base = if (tb.isEmpty) i & 0xFF else tb(i % tb.length) & 0xFF
            ((base - 128) * 181 + (i % 64)).toShort
          }
        }
        Row(id, AudioCodec.encodePcm16Wav(rate, samples))
      }
    }
  }

  def withMediaMeta(df: DataFrame, blobCol: String, mediaType: String): DataFrame =
    df.withColumn("meta", struct(
      lit(mediaType).as("media_type"),
      octet_length(col(blobCol)).cast("long").as("byte_len"),
      sha2(col(blobCol), 256).as("content_sha256")))

  /** Per-partition feature extraction over binary blobs. `mapPartitions` (the
    * Scala analogue of mapInPandas batch processing) so the codec is set up
    * once per partition and rows stream through it — the shape that scales to
    * arbitrarily large blob tables because nothing is collected or grouped.
    */
  def extractFeatures(df: DataFrame, blobCol: String, dim: Int): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema.add(StructField("features", ArrayType(FloatType), nullable = false))
    val blobIdx = inSchema.fieldIndex(blobCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      // per-partition codec init goes here (once, not per row)
      rows.map { r =>
        val bytes = r.get(blobIdx) match {
          case b: Array[Byte] => b
          case null => Array.empty[Byte]
        }
        Row.fromSeq(r.toSeq :+ StubCodec.sampleFeatures(bytes, dim).toSeq)
      }
    }
  }

  /** Decode + resize + frame-sample in ONE partition pass: the full media
    * pipeline shape. One `mapPartitions` traversal adds (width, height),
    * a fixed-size thumbnail, and `nFrames`×`dim` frame features — the codec
    * is initialized once per partition and every output column is computed
    * from a single decode of each blob (production decoders are the
    * expensive step; decoding once per derived column would be the bug).
    *
    * Codec dispatch: grayscale PNGs get the REAL full decode (dims +
    * thumbnail from actual pixels, one decode feeding both); JPEGs get the
    * REAL `javax.imageio` decode through a [[JpegCodec.Reader]] instantiated
    * once per partition; other PNGs and BMPs get real header dims with the
    * stub thumbnail; unknown formats and poison blobs (bad zlib, truncated
    * chunks — `Try`-guarded so one bad blob can't kill a 100 TB job) keep
    * the deterministic stub end to end.
    */
  def processMedia(df: DataFrame, blobCol: String, thumbW: Int, thumbH: Int,
      nFrames: Int, dim: Int): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema
      .add(StructField("width", IntegerType, nullable = false))
      .add(StructField("height", IntegerType, nullable = false))
      .add(StructField("thumbnail", BinaryType, nullable = false))
      .add(StructField("frames", ArrayType(ArrayType(FloatType)), nullable = false))
    val blobIdx = inSchema.fieldIndex(blobCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      // per-partition codec init (once, not per row)
      lazy val jpegReader = new JpegCodec.Reader
      rows.map { r =>
        val bytes = r.get(blobIdx) match {
          case b: Array[Byte] => b
          case null => Array.empty[Byte]
        }
        val decoded = // the single real decode feeding dims AND thumbnail
          if (ImageCodec.isPng(bytes))
            scala.util.Try(ImageCodec.decodeGrayPng(bytes)).toOption
          else if (JpegCodec.isJpeg(bytes)) jpegReader.decodeGray(bytes)
          else None
        val (w, h) = decoded.map(d => (d._1, d._2))
          .orElse(ImageCodec.headerDims(bytes))
          .getOrElse(StubCodec.decodeDims(bytes))
        val thumb = decoded
          .map(d => ImageCodec.resizeNearest(d._3, d._1, d._2, thumbW, thumbH))
          .getOrElse(StubCodec.resize(bytes, thumbW, thumbH))
        Row.fromSeq(r.toSeq ++ Seq(w, h, thumb,
          StubCodec.sampleFrames(bytes, nFrames, dim).map(_.toSeq).toSeq))
      }
    }
  }

  /** Deterministic REAL-PNG fixture generator: one valid gray8 PNG per doc,
    * dims derived from doc_id, pixels cycled from the doc's UTF-8 bytes —
    * same `mapPartitions` shape as the decode side (encoder init once per
    * partition, rows stream through).
    */
  def docPngs(docs: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("png", BinaryType, nullable = false)))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    docs.select(col("doc_id"), col("text")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val tb = Option(r.getString(1)).getOrElse("").getBytes("UTF-8")
        val w = (8 + (id % 24)).toInt
        val h = (8 + ((id / 7) % 24)).toInt
        val px = Array.tabulate(w * h)(i =>
          if (tb.isEmpty) (i & 0xFF).toByte else tb(i % tb.length))
        Row(id, ImageCodec.encodeGrayPng(w, h, px))
      }
    }
  }

  /** Oracle-checked slices of the multimodal path: blob ingestion + metadata
    * stamping, and the real-codec decode (`q_multimodal_decode`: Spark
    * parses PNG headers + pixels from real bytes; DuckDB independently
    * parses the SAME staged bytes — as a hex string, because DuckDB 1.0's
    * substring/sha256 don't accept BLOBs — and the driver hash-compares).
    */
  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_multimodal_decode",
      s"""SELECT doc_id,
         |       CAST(('0x' || substring(png_hex, 33, 8)) AS BIGINT) AS width,
         |       CAST(('0x' || substring(png_hex, 41, 8)) AS BIGINT) AS height,
         |       CAST(length(png_hex) // 2 AS BIGINT) AS byte_len,
         |       sha256(png_hex) AS hex_sha256
         |FROM ${graft.OracleStage.pq("pngs_multimodal")}
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val pngs = docPngs(Tables.documents(s, d))
      val staged = graft.OracleStage.stage("pngs_multimodal",
        pngs.select(col("doc_id"), hex(col("png")).as("png_hex")))
      // decode from the STAGED bytes, so the Spark answer provably derives
      // from the exact rows the DuckDB oracle re-parses
      val blobs = staged.select(col("doc_id"), unhex(col("png_hex")).as("png"))
      // width/height cast LONG: the oracle's CAST(... AS BIGINT) must see
      // the same width on both sides of the driver's typed readers — the
      // r8 no-raw-narrow-types output rule (see hc_daily_revenue history)
      processMedia(blobs, "png", thumbW = 4, thumbH = 4, nFrames = 1, dim = 2)
        .select(col("doc_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          octet_length(col("png")).cast("long").as("byte_len"),
          sha2(hex(col("png")), 256).as("hex_sha256"))
        .orderBy("doc_id")
    },

    QueryDef(
      "q_multimodal_meta",
      """SELECT doc_id,
        |       octet_length(CAST(text AS BLOB)) AS byte_len,
        |       sha256(text) AS content_sha256
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val blobs = Tables.documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("blob"))
      withMediaMeta(blobs, "blob", "text/plain")
        .select(col("doc_id"),
          col("meta.byte_len").as("byte_len"),
          col("meta.content_sha256").as("content_sha256"))
        .orderBy("doc_id")
    },

    // ----- Audio features from real WAV bytes -----
    // The audio-modality pipeline end to end: real PCM16 WAVs (RIFF
    // chunk-walked decode, [[AudioCodec]]) → per-document duration,
    // total energy, peak amplitude, silent-window count. The CODEC only
    // decodes (mapPartitions, init once per partition); every feature is
    // then a Catalyst aggregate over the exploded sample stream, so the
    // analysis plan — windowing by `i DIV 256`, integer energy sums — is
    // the same distributed shape at any corpus size, keyed by doc_id.
    // All features are integer-exact (sample values are int16; energy
    // sums s², ≤ 2³¹ per sample, in BIGINT), so the DuckDB oracle can
    // re-derive every number from the SAME staged bytes: it parses the
    // RIFF header fields and each little-endian sample straight out of
    // the staged hex, sample by sample — a fully independent decoder.
    QueryDef(
      "q_audio_features",
      s"""WITH w AS (
         |  SELECT doc_id, wav_hex,
         |         CAST(('0x' || substr(wav_hex,55,2) || substr(wav_hex,53,2)
         |               || substr(wav_hex,51,2) || substr(wav_hex,49,2)) AS BIGINT) AS rate,
         |         CAST(('0x' || substr(wav_hex,87,2) || substr(wav_hex,85,2)
         |               || substr(wav_hex,83,2) || substr(wav_hex,81,2)) AS BIGINT) // 2 AS n
         |  FROM ${graft.OracleStage.pq("wavs_multimodal")}),
         |smp AS (SELECT doc_id, rate, n, wav_hex,
         |               unnest(generate_series(0, n - 1)) AS i
         |        FROM w),
         |sv AS (SELECT doc_id, i,
         |              CAST(('0x' || substr(wav_hex, 91 + 4*i, 2)
         |                    || substr(wav_hex, 89 + 4*i, 2)) AS BIGINT) AS v
         |       FROM smp),
         |ss AS (SELECT doc_id, i,
         |              CASE WHEN v >= 32768 THEN v - 65536 ELSE v END AS s
         |       FROM sv),
         |wins AS (SELECT doc_id, i // 256 AS wdw, MAX(ABS(s)) AS wmax
         |         FROM ss GROUP BY 1, 2),
         |sil AS (SELECT doc_id,
         |               CAST(SUM(CASE WHEN wmax < 512 THEN 1 ELSE 0 END) AS BIGINT) AS n_silent_windows
         |        FROM wins GROUP BY 1),
         |agg AS (SELECT doc_id,
         |               CAST(SUM(s * s) AS BIGINT) AS energy,
         |               CAST(MAX(ABS(s)) AS BIGINT) AS peak_amp
         |        FROM ss GROUP BY 1)
         |SELECT w.doc_id, w.rate AS sample_rate, w.n AS n_samples,
         |       (w.n * 1000) // w.rate AS duration_ms,
         |       agg.energy, agg.peak_amp, sil.n_silent_windows
         |FROM w JOIN agg USING (doc_id) JOIN sil USING (doc_id)
         |ORDER BY w.doc_id""".stripMargin) { (s, d) =>
      val wavs = docWavs(Tables.documents(s, d))
      val staged = graft.OracleStage.stage("wavs_multimodal",
        wavs.select(col("doc_id"), hex(col("wav")).as("wav_hex")))
      val blobs = staged.select(col("doc_id"), unhex(col("wav_hex")).as("wav"))
      // decode-only mapPartitions: (doc_id, rate, samples)
      val decSchema = StructType(Seq(
        StructField("doc_id", LongType, nullable = false),
        StructField("rate", LongType, nullable = false),
        StructField("samples", ArrayType(IntegerType), nullable = false)))
      implicit val enc = RowEncoder.encoderFor(decSchema)
      val decoded = blobs.mapPartitions { rows =>
        // per-partition codec init goes here (once, not per row)
        rows.flatMap { r =>
          val bytes = r.get(1) match {
            case b: Array[Byte] => b
            case null => Array.empty[Byte]
          }
          AudioCodec.decodePcm16Wav(bytes).map { case (rate, smp) =>
            Row(r.getLong(0), rate.toLong, smp.map(_.toInt).toSeq)
          }
        }
      }
      val ss = decoded.select(col("doc_id"), col("rate"),
          size(col("samples")).cast("long").as("n"),
          posexplode(col("samples")).as(Seq("i", "s0")))
        .select(col("doc_id"), col("rate"), col("n"), col("i"),
          col("s0").cast("long").as("s"))
      val wins = ss.groupBy(col("doc_id"), expr("i DIV 256").as("wdw"))
        .agg(max(abs(col("s"))).as("wmax"))
      val sil = wins.groupBy("doc_id")
        .agg(sum(when(col("wmax") < 512, 1L).otherwise(0L)).as("n_silent_windows"))
      val agg = ss.groupBy("doc_id", "rate", "n")
        .agg(sum(expr("s * s")).as("energy"), max(abs(col("s"))).as("peak_amp"))
      agg.join(sil, "doc_id")
        .select(col("doc_id"), col("rate").as("sample_rate"),
          col("n").as("n_samples"),
          expr("(n * 1000) DIV rate").as("duration_ms"),
          col("energy"), col("peak_amp"), col("n_silent_windows"))
        .orderBy("doc_id")
    },

    // ----- Perceptual-hash image near-dup (aHash + Hamming banding) -----
    // The image-modality dedup face: re-encoded / re-saved copies of an
    // image keep their pixels, so a 64-bit average hash over the decoded
    // 8×8 thumbnail (bit i = pixel i above the integer mean) collides for
    // copies and stays within a few bits for light edits. Fixture: one
    // REAL 16×16 gray PNG per document (pixels = the doc's UTF-8 bytes
    // cycled — exact-duplicate texts become exact-duplicate images, the
    // corpus's planted dup groups), decoded by [[ImageCodec]] and
    // thumbnailed through the same resize the decode gate exercises.
    //
    // Scale shape: hashing is map-side (decode once per row in
    // mapPartitions, then pure Catalyst array folds over the 64 staged
    // thumbnail bytes); candidate pairs come from 4×16-bit Hamming bands
    // (pigeonhole: Hamming ≤ 3 ⇒ some band equal; ≤ 6 caught with high
    // probability) through the SAME skew-guarded boundedBucketPairs the
    // LSH dedup family uses — never an n² self-join; the rescore is a
    // pair-keyed join + two popcounts. Thumbnails and candidates are
    // staged; the oracle recomputes px → mean → both hash words → the
    // Hamming rescore from the staged hex, so the whole perceptual
    // pipeline after the decode hash-gates cross-engine.
    QueryDef(
      "q_multimodal_ahash",
      s"""WITH px AS (SELECT doc_id,
         |             list_transform(generate_series(0, 63),
         |               i -> CAST(('0x' || substr(thumb_hex, 1 + 2*i, 2)) AS BIGINT)) AS px
         |      FROM ${graft.OracleStage.pq("thumbs_ahash")}),
         |hm AS (SELECT doc_id, px, CAST(list_sum(px) AS BIGINT) // 64 AS m FROM px),
         |h AS (SELECT doc_id,
         |             CAST(list_sum(list_transform(generate_series(0, 31),
         |               i -> CASE WHEN px[i+1] > m THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)) AS BIGINT) AS lo,
         |             CAST(list_sum(list_transform(generate_series(32, 63),
         |               i -> CASE WHEN px[i+1] > m THEN (CAST(1 AS BIGINT) << (i-32)) ELSE 0 END)) AS BIGINT) AS hi
         |      FROM hm),
         |c AS (SELECT doc_a, doc_b FROM ${graft.OracleStage.pq("cands_ahash")})
         |SELECT c.doc_a, c.doc_b,
         |       CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) AS BIGINT) AS hamming
         |FROM c JOIN h a ON a.doc_id = c.doc_a JOIN h b ON b.doc_id = c.doc_b
         |WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 6
         |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
      ahashPairs(Tables.documents(s, d))
    },

    // ----- Real JPEG decode (javax.imageio) + ahash from real pixels -----
    // The JPEG face of the image pipeline: REAL baseline-JPEG bytes
    // (encoded by [[JpegCodec.Writer]], one writer per partition) are
    // staged, then decoded by an independent per-partition
    // [[JpegCodec.Reader]] — dims + an 8×8 thumbnail from the actual DCT
    // decode — and hashed with the same aHash folds the PNG face uses.
    //
    // Cross-engine verification is split by what each engine can reach:
    // the DuckDB oracle INDEPENDENTLY re-derives width/height by walking
    // the real JFIF marker segments of the staged bytes in SQL (a
    // recursive CTE steps marker→marker to SOF0 and parses the big-endian
    // dims from its payload — a second JPEG header parser, not a readback
    // of Spark's answer), byte accounting from the staged hex, and both
    // hash words from the staged thumbnails. Pixel-level decode fidelity —
    // the one part SQL cannot reach (it has no Huffman/DCT decoder) — is
    // spec-gated instead: JpegSpec pins the encode∘decode roundtrip to
    // ≈1 gray-level mean error against the pre-encode raster.
    QueryDef(
      "q_multimodal_jpeg",
      s"""WITH RECURSIVE j AS (
         |  SELECT doc_id, upper(jpeg_hex) AS hx
         |  FROM ${graft.OracleStage.pq("jpegs_multimodal")}),
         |seg AS (
         |  SELECT doc_id, hx, CAST(5 AS BIGINT) AS pos FROM j
         |  UNION ALL
         |  SELECT doc_id, hx, pos + 4 + 2 * CAST(('0x' || substr(hx, pos + 4, 4)) AS BIGINT)
         |  FROM seg
         |  WHERE substr(hx, pos, 4) NOT IN ('FFC0', 'FFDA') AND pos + 18 <= length(hx)),
         |dims AS (
         |  SELECT doc_id,
         |         CAST(('0x' || substr(hx, pos + 10, 4)) AS BIGINT) AS height,
         |         CAST(('0x' || substr(hx, pos + 14, 4)) AS BIGINT) AS width
         |  FROM seg WHERE substr(hx, pos, 4) = 'FFC0'),
         |blen AS (SELECT doc_id, CAST(length(hx) // 2 AS BIGINT) AS byte_len FROM j),
         |px AS (SELECT doc_id,
         |         list_transform(generate_series(0, 63),
         |           i -> CAST(('0x' || substr(thumb_hex, 1 + 2*i, 2)) AS BIGINT)) AS px
         |       FROM ${graft.OracleStage.pq("thumbs_jpeg")}),
         |hm AS (SELECT doc_id, px, CAST(list_sum(px) AS BIGINT) // 64 AS m FROM px),
         |h AS (SELECT doc_id,
         |        CAST(list_sum(list_transform(generate_series(0, 31),
         |          i -> CASE WHEN px[i+1] > m THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)) AS BIGINT) AS ahash_lo,
         |        CAST(list_sum(list_transform(generate_series(32, 63),
         |          i -> CASE WHEN px[i+1] > m THEN (CAST(1 AS BIGINT) << (i-32)) ELSE 0 END)) AS BIGINT) AS ahash_hi
         |      FROM hm)
         |SELECT d.doc_id, d.width, d.height, b.byte_len, h.ahash_lo, h.ahash_hi
         |FROM dims d JOIN blen b USING (doc_id) JOIN h USING (doc_id)
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      jpegDecodeFace(Tables.documents(s, d))
    }
  )

  /** The JPEG decode+ahash pipeline over an explicit (doc_id, text) frame —
    * shared by the gate and the scale probe. One linear chain: fixture →
    * stage → per-partition ImageIO decode → stage thumbs → map-side hash
    * folds; no join, no shuffle beyond the final presentation sort.
    */
  private[graft] def jpegDecodeFace(docs: DataFrame): DataFrame = {
    val jpegs = docJpegs(docs)
    val staged = graft.OracleStage.stage("jpegs_multimodal",
      jpegs.select(col("doc_id"), hex(col("jpeg")).as("jpeg_hex")))
    val blobs = staged.select(col("doc_id"),
      unhex(col("jpeg_hex")).as("jpeg"),
      (length(col("jpeg_hex")) / 2).cast("long").as("byte_len"))
    val decSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("width", LongType, nullable = false),
      StructField("height", LongType, nullable = false),
      StructField("byte_len", LongType, nullable = false),
      StructField("thumb", BinaryType, nullable = false)))
    implicit val enc = RowEncoder.encoderFor(decSchema)
    val decoded = blobs.mapPartitions { rows =>
      val reader = new JpegCodec.Reader // once per partition
      rows.flatMap { r =>
        val bytes = r.get(1).asInstanceOf[Array[Byte]]
        reader.decodeGray(bytes).map { case (w, h, px) =>
          Row(r.getLong(0), w.toLong, h.toLong, r.getLong(2),
            ImageCodec.resizeNearest(px, w, h, 8, 8))
        }
      }
    }
    // dims travel WITH the staged thumbs so the final select is one pass
    // over one frame (the oracle ignores them — it re-parses dims from the
    // JPEG markers itself)
    val thumbsStaged = graft.OracleStage.stage("thumbs_jpeg",
      decoded.select(col("doc_id"), col("width"), col("height"),
        col("byte_len"), hex(col("thumb")).as("thumb_hex")))
    thumbsStaged
      .withColumn("px", expr(pxFromHexExpr("thumb_hex")))
      .withColumn("m", expr(AhashMeanExpr))
      .select(col("doc_id"), col("width"), col("height"), col("byte_len"),
        expr(AhashLoExpr).as("ahash_lo"),
        expr(AhashHiExpr).as("ahash_hi"))
      .orderBy("doc_id")
  }

  /** aHash word SQL fragments (shared by the PNG pair face and the JPEG
    * gate): `px` = 64 pixel bytes from a staged hex thumbnail, `m` = their
    * integer mean, lo/hi = the two 32-bit hash words (bit i set when pixel
    * i exceeds the mean). Pure Catalyst folds — map-side, codegen'd.
    */
  private def pxFromHexExpr(hexCol: String): String =
    s"transform(sequence(0, 63), i -> CAST(conv(substring($hexCol, 1 + 2*i, 2), 16, 10) AS BIGINT))"
  private val AhashMeanExpr = "aggregate(px, 0L, (a, x) -> a + x) DIV 64"
  private val AhashLoExpr =
    "aggregate(sequence(0, 31), 0L, (a, i) -> a + IF(element_at(px, i+1) > m, shiftleft(1L, i), 0L))"
  private val AhashHiExpr =
    "aggregate(sequence(32, 63), 0L, (a, i) -> a + IF(element_at(px, i+1) > m, shiftleft(1L, i-32), 0L))"

  /** The full perceptual-dedup pipeline over an explicit (doc_id, text)
    * frame — shared by the gate and the ×10 scale probe.
    */
  private[graft] def ahashPairs(docs: DataFrame): DataFrame = {
      val thumbs = ahashThumbs(fixedPngs16(docs))
      val staged = graft.OracleStage.stage("thumbs_ahash",
        thumbs.select(col("doc_id"), hex(col("thumb")).as("thumb_hex")))

      // hash words from the STAGED hex — pure Catalyst folds, map-side
      val hashed = staged.select(col("doc_id"),
          expr(pxFromHexExpr("thumb_hex")).as("px"))
        .withColumn("m", expr(AhashMeanExpr))
        .select(col("doc_id"),
          expr(AhashLoExpr).as("lo"),
          expr(AhashHiExpr).as("hi"))
        .stableCheckpoint() // banding + both rescore sides read it

      val banded = hashed.select(col("doc_id"), posexplode(expr(
          "array(lo & 65535, shiftright(lo, 16) & 65535, hi & 65535, shiftright(hi, 16) & 65535)"))
        .as(Seq("band_id", "band_key")))
      val cands = graft.OracleStage.stage("cands_ahash",
        LshBlocking.boundedBucketPairs(banded, Seq("band_id", "band_key"), "doc_id")
          .select(col("id_a").as("doc_a"), col("id_b").as("doc_b")))

      cands
        .join(hashed.select(col("doc_id").as("doc_a"),
          col("lo").as("lo_a"), col("hi").as("hi_a")), "doc_a")
        .join(hashed.select(col("doc_id").as("doc_b"),
          col("lo").as("lo_b"), col("hi").as("hi_b")), "doc_b")
        .withColumn("hamming",
          expr("CAST(bit_count(lo_a ^ lo_b) + bit_count(hi_a ^ hi_b) AS BIGINT)"))
        .filter(col("hamming") <= 6)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
  }

  /** Fixed-dim REAL-PNG fixture: a 16×16 gray8 PNG per doc, pixels = the
    * doc's UTF-8 bytes cycled — identical texts yield identical images.
    */
  private def fixedPngs16(docs: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("png", BinaryType, nullable = false)))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    docs.select(col("doc_id"), col("text")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val tb = Option(r.getString(1)).getOrElse("").getBytes("UTF-8")
        val px = Array.tabulate(256)(i =>
          if (tb.isEmpty) (i & 0xFF).toByte else tb(i % tb.length))
        Row(id, ImageCodec.encodeGrayPng(16, 16, px))
      }
    }
  }

  /** Deterministic REAL-JPEG fixture generator: one valid baseline grayscale
    * JPEG per doc via `javax.imageio` — dims derived from doc_id, pixels
    * cycled from the doc's UTF-8 bytes; the `ImageWriter` is instantiated
    * once per partition and rows stream through (the codec lifecycle every
    * media op here follows).
    */
  private[graft] def docJpegs(docs: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("jpeg", BinaryType, nullable = false)))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    docs.select(col("doc_id"), col("text")).mapPartitions { rows =>
      val writer = new JpegCodec.Writer() // once per partition
      rows.map { r =>
        val id = r.getLong(0)
        val tb = Option(r.getString(1)).getOrElse("").getBytes("UTF-8")
        val w = (8 + (id % 24)).toInt
        val h = (8 + ((id / 7) % 24)).toInt
        val px = Array.tabulate(w * h)(i =>
          if (tb.isEmpty) (i & 0xFF).toByte else tb(i % tb.length))
        Row(id, writer.encodeGray(w, h, px))
      }
    }
  }

  /** Real decode → 8×8 nearest thumbnail (decoder init once per partition;
    * rows stream through — the processMedia lifecycle).
    */
  private def ahashThumbs(pngs: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("thumb", BinaryType, nullable = false)))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    pngs.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, px) = ImageCodec.decodeGrayPng(r.get(1).asInstanceOf[Array[Byte]])
        Row(r.getLong(0), ImageCodec.resizeNearest(px, w, h, 8, 8))
      }
    }
  }
}
