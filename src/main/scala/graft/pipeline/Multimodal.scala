package graft.pipeline

import graft.QueryDef
import graft.analytics.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video travel as opaque `binary`
  * columns with typed metadata structs alongside. The Spark-side machinery —
  * schema, partition-preserving batch processing, per-partition decoder
  * lifecycle — is real; the actual codec call is stubbed deterministically
  * because no image/audio libraries ship in this container (see the builder
  * contract). Swap `StubCodec` for a real decoder without touching the plan.
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

  /** Attach metadata to a blob column — pure codegen'd expressions. */
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
      // per-partition codec init goes here (once, not per row)
      rows.map { r =>
        val bytes = r.get(blobIdx) match {
          case b: Array[Byte] => b
          case null => Array.empty[Byte]
        }
        val (w, h) = StubCodec.decodeDims(bytes)
        Row.fromSeq(r.toSeq ++ Seq(w, h,
          StubCodec.resize(bytes, thumbW, thumbH),
          StubCodec.sampleFrames(bytes, nFrames, dim).map(_.toSeq).toSeq))
      }
    }
  }

  /** Oracle-checked slice of the multimodal path: blob ingestion + metadata
    * stamping (byte length, content digest). Uses document text bytes as the
    * stand-in blob payload.
    */
  val defs: Seq[QueryDef] = Seq(
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
    }
  )
}
