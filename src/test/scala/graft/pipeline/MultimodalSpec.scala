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
