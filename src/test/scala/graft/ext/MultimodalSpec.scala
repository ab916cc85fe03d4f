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

  test("PNG roundtrip: encodeToPng → ImageIoDecoder reproduces the exact pixels") {
    // the real codec (javax.imageio) decodes the synthesized PNGs to the
    // SAME pixels the stub derives from the raw bytes — lossless 8-bit
    // grayscale, so the whole decode pipeline can run production-real
    // while a codec-free twin still predicts every byte
    val raw = media.filter(octet_length(col("payload")) > 0)
    val png = Multimodal.encodeToPng(raw)
    assert(png.schema.fieldNames.toSeq === Multimodal.mediaSchema.fieldNames.toSeq)
    assert(png.select("meta.format").distinct().as[String].collect().toSeq
      === Seq("png"))
    // payloads really are PNG on the wire (magic bytes)
    png.select("payload").as[Array[Byte]].take(5).foreach { b =>
      assert(b.take(8).toSeq ===
        Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    }
    val viaReal = Multimodal.decodeFeatures(png, Multimodal.ImageIoDecoder)
      .orderBy("media_id").collect().toSeq
    val viaStub = Multimodal.decodeFeatures(raw, Multimodal.StubDecoder)
      .orderBy("media_id").collect().toSeq
    assert(viaReal === viaStub)
    // resize through the real codec matches the stub path byte-for-byte
    val rReal = Multimodal.resize(png, 4, 4, Multimodal.ImageIoDecoder)
      .orderBy("media_id").collect().toSeq.map(_.getAs[Array[Byte]]("pixels").toSeq)
    val rStub = Multimodal.resize(raw, 4, 4, Multimodal.StubDecoder)
      .orderBy("media_id").collect().toSeq.map(_.getAs[Array[Byte]]("pixels").toSeq)
    assert(rReal === rStub)
  }

  test("corrupt bytes refuse loudly through the real decoder") {
    val e = intercept[IllegalArgumentException] {
      Multimodal.ImageIoDecoder.decode("definitely not a png".getBytes("UTF-8"))
    }
    assert(e.getMessage.contains("not a decodable image"))
    // and in a distributed frame the task fails visibly, never a fake row
    val corrupt = Seq((1L, "image", "garbage bytes".getBytes("UTF-8"),
      ("png", 0, 0, 0))).toDF("media_id", "kind", "payload", "meta")
    val err = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeFeatures(corrupt, Multimodal.ImageIoDecoder).collect()
    }
    assert(err.getMessage.contains("not a decodable image") ||
      Option(err.getCause).exists(_.getMessage.contains("not a decodable image")))
  }

  test("quarantine mode: a corrupt payload lands as an error row, the " +
      "batch survives, counts pinned (round-14 VERDICT item 5)") {
    val good = Multimodal.encodeToPng(media.limit(9))
    // one corrupt row: junk bytes no codec recognizes
    val corrupt = Seq((666L, "image",
      Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10)))
      .toDF("media_id", "kind", "payload")
      .withColumn("meta", struct(lit("png").as("format"), lit(0).as("width"),
        lit(0).as("height"), lit(0).as("sample_rate")))
    val batch = good.unionByName(corrupt)
    val out = Multimodal.decodeFeaturesOrQuarantine(batch).cache()
    assert(out.schema === Multimodal.quarantineSchema)
    // the batch SURVIVED: every row accounted for, exactly one quarantined
    assert(out.count() === 10L)
    val q = out.filter(col("decode_error").isNotNull)
    assert(q.count() === 1L)
    assert(q.select("media_id").as[Long].head() === 666L)
    assert(q.select("width").head().isNullAt(0), "quarantine rows carry null features")
    assert(q.select("decode_error").as[String].head().nonEmpty)
    // clean rows decode IDENTICALLY to the loud path
    val clean = out.filter(col("decode_error").isNull)
      .drop("decode_error").orderBy("media_id").collect().toSeq
    val loud = Multimodal.decodeFeatures(good, Multimodal.ImageIoDecoder)
      .orderBy("media_id").collect().toSeq
    assert(clean === loud)
    // the loud default still refuses the same batch — quarantine is opt-in
    intercept[org.apache.spark.SparkException] {
      Multimodal.decodeFeatures(batch, Multimodal.ImageIoDecoder).count()
    }
    out.unpersist(): Unit
  }

  test("JPEG roundtrip: encodeToJpeg → ImageIoDecoder (lossy: exact dims, " +
      "near-equal intensity)") {
    val raw = media.filter(octet_length(col("payload")) > 0).limit(10)
    val jpg = Multimodal.encodeToJpeg(raw)
    assert(jpg.select("meta.format").distinct().as[String].collect().toSeq
      === Seq("jpeg"))
    // payloads really are JFIF/JPEG on the wire (SOI marker FF D8)
    jpg.select("payload").as[Array[Byte]].take(5).foreach { b =>
      assert((b(0) & 0xff) === 0xff && (b(1) & 0xff) === 0xd8,
        "missing JPEG SOI marker")
    }
    val decoded = Multimodal.decodeFeatures(jpg, Multimodal.ImageIoDecoder)
      .orderBy("media_id").collect().toSeq
    val expected = Multimodal.decodeFeatures(raw) // stub twin on raw bytes
      .orderBy("media_id").collect().toSeq
    decoded.zip(expected).foreach { case (d, e) =>
      // container metadata is exact even through a lossy codec
      assert(d.getAs[Int]("width") === e.getAs[Int]("width"))
      assert(d.getAs[Int]("height") === e.getAs[Int]("height"))
      assert(d.getAs[Int]("n_pixels") === e.getAs[Int]("n_pixels"))
      // pixel VALUES are lossy — mean intensity stays near the source
      assert(math.abs(d.getAs[Double]("mean_intensity") -
        e.getAs[Double]("mean_intensity")) < 16.0,
        s"JPEG drifted too far: $d vs $e")
    }
  }

  test("color images collapse to deterministic integer luminance") {
    val img = new java.awt.image.BufferedImage(2, 1,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000) // pure red
    img.setRGB(1, 0, 0x4080c0) // mixed
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out): Unit
    val d = Multimodal.ImageIoDecoder.decode(out.toByteArray)
    assert(d.width === 2 && d.height === 1 && d.channels === 3)
    assert((d.pixels(0) & 0xff) === (299 * 255 + 500) / 1000)
    assert((d.pixels(1) & 0xff) ===
      (299 * 0x40 + 587 * 0x80 + 114 * 0xc0 + 500) / 1000)
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
