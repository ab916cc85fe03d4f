package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multimodal plumbing over synthesized binary payloads: decode/featurize
  * schema + determinism, resize dimensions, frame sampling. The decoder is
  * the documented deterministic stub (no media libs in this container). */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  /** media frame synthesized from documents: payload = utf8 bytes of text. */
  lazy val media = graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
    .select(col("doc_id").as("media_id"), lit("image").as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(lit("stub").as("format"), lit(0).as("width"), lit(0).as("height"),
        lit(0).as("sample_rate")).as("meta"))
    .cache()

  test("media frame conforms to the media schema shape") {
    assert(media.schema.fieldNames.toSeq === Multimodal.mediaSchema.fieldNames.toSeq)
    assert(media.schema("payload").dataType.typeName === "binary")
  }

  test("decodeFeatures: schema, one row per media, deterministic") {
    val f1 = Multimodal.decodeFeatures(media)
    assert(f1.schema === Multimodal.featureSchema)
    assert(f1.count() === media.count())
    val a = f1.orderBy("media_id").collect().toSeq
    val b = Multimodal.decodeFeatures(media).orderBy("media_id").collect().toSeq
    assert(a === b)
    // histogram bins sum to pixel count; mean intensity within byte range
    a.foreach { r =>
      assert(r.getAs[Seq[Long]]("histogram").sum === r.getAs[Int]("n_pixels").toLong)
      val m = r.getAs[Double]("mean_intensity")
      assert(m >= 0.0 && m <= 255.0)
    }
  }

  test("resize produces exactly w×h pixel buffers") {
    val out = Multimodal.resize(media, 4, 3).collect()
    out.foreach { r =>
      assert(r.getAs[Int]("width") === 4 && r.getAs[Int]("height") === 3)
      assert(r.getAs[Array[Byte]]("pixels").length === 12)
    }
  }

  test("frame sampling slices payloads and keeps every stride-th frame") {
    val one = media.filter(col("media_id") === 0)
    val payloadLen = one.select(length(col("payload"))).as[Int].collect().head
    val frames = Multimodal.sampleFrames(one, frameBytes = 16, stride = 2)
      .orderBy("frame_no").collect()
    val nFrames = (payloadLen + 15) / 16
    val expected = (0 until nFrames).count(_ % 2 == 0)
    assert(frames.length === expected)
    assert(frames.forall(_.getAs[Int]("frame_no") % 2 === 0))
    // all but possibly the last kept frame are full 16-byte slices
    frames.dropRight(1).foreach(r => assert(r.getAs[Array[Byte]]("frame").length === 16))
  }
}
