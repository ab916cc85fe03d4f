package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.Multimodal

/** Multimodal-column operators exercised over binary payloads synthesized
  * from `documents` (UTF-8 bytes of the text — deterministic, so the DuckDB
  * oracle can synthesize the identical payloads with encode()). The decode /
  * featurize path runs the stubbed codec ([[Multimodal.StubDecoder]]) and is
  * rows-only checked; the binary plumbing (lengths, hex slices, frame
  * slicing arithmetic) is oracle-checked. */
object MediaQueries {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  private def media(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id").as("media_id"),
      lit("image").as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(lit("stub").as("format"), lit(0).as("width"), lit(0).as("height"),
        lit(0).as("sample_rate")).as("meta"))

  val queries: Map[String, Q] = Map(
    // Binary column metadata: byte length + leading bytes as hex.
    "multimodal_meta" -> ((s, d) => media(s, d).select(
      col("media_id"),
      length(col("payload")).as("n_bytes"),
      upper(substring(hex(col("payload")), 1, 16)).as("head_hex"))
      .orderBy("media_id")),

    // Frame sampling: frames of 16 bytes, keep every 2nd → count per media.
    "multimodal_frames" -> ((s, d) =>
      Multimodal.sampleFrames(media(s, d), frameBytes = 16, stride = 2)
        .groupBy("media_id").agg(count(lit(1)).as("n_frames_kept"))
        .orderBy("media_id")),

    // Stubbed decode + featurize (rows-only: stub codec is Spark-side only).
    // The 8-bin histogram array is projected to scalar columns: the driver's
    // differential compare sorts columns through pandas, which cannot hash
    // array cells (round-1 correctness run crashed on this query).
    "multimodal_features" -> ((s, d) => {
      val f = Multimodal.decodeFeatures(media(s, d))
      f.select(Seq(col("media_id"), col("width"), col("height"),
          col("n_pixels"), col("mean_intensity")) ++
        (0 until 8).map(i => element_at(col("histogram"), i + 1).as(s"h$i")): _*)
        .orderBy("media_id")
    }),
  )

  val oracle: Map[String, String] = Map(
    "multimodal_meta" ->
      """SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
           upper(substring(hex(encode(text)), 1, 16)) AS head_hex
         FROM documents ORDER BY media_id""",
    "multimodal_frames" ->
      """SELECT doc_id AS media_id,
           (CAST(ceil(octet_length(encode(text)) / 16.0) AS BIGINT) + 1) // 2 AS n_frames_kept
         FROM documents ORDER BY media_id""",
  )
}
