package graft.model

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}

/** Typed row of the flat event table (SURVEY.md §1.3) — `Dataset[T]` surface
  * for the parts of a pipeline where compile-time field checks help; the
  * schema-dynamic `DataFrame` surface remains primary. Field order matches
  * [[graft.schema.EventSchema.event]]. */
final case class EarthquakeEvent(
    id: String,
    month: Option[Int],
    year: Option[Int],
    magnitude: Option[Double],
    latitude: Option[Double],
    longitude: Option[Double],
    depth: Option[Double],
    eventtime: Timestamp,
    updated: Option[Timestamp],
    place: Option[String],
    url: Option[String],
    detail: Option[String],
    felt: Option[Int],
    cdi: Option[Double],
    mmi: Option[Double],
    alert: Option[String],
    status: Option[String],
    tsunami: Option[Int],
    significance: Option[Int],
    network: Option[String],
    code: Option[String],
    ids: Option[String],
    sources: Option[String],
    types: Option[String],
    nst: Option[Int],
    dmin: Option[Double],
    rms: Option[Double],
    gap: Option[Double],
    magnitude_type: Option[String],
    `type`: Option[String],
    title: Option[String],
    geometry: Option[String])

object EarthquakeEvent {
  implicit val encoder: Encoder[EarthquakeEvent] = Encoders.product[EarthquakeEvent]

  /** Flat event frame → typed Dataset. */
  def typed(df: DataFrame): Dataset[EarthquakeEvent] = df.as[EarthquakeEvent]
}
