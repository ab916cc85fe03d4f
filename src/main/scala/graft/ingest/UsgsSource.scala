package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.schema.EventSchema
import scala.util.{Failure, Success, Try}

/** Paginated USGS FDSN event source (reference S1-S3), network-injectable.
  *
  * The reference fetches GeoJSON pages over HTTPS
  * (`fetch_earthquake_data_time_and_limit_offset`,
  * `usgs-earthquake-data-ingest-dynamic.py:96-128`) in a driver loop and
  * appends each page to bronze before the next fetch (`:332-355`), with
  * month-sized windows and week-sized retry windows (`:288-322`).
  *
  * Here the fetch function is injected (no network in tests — SURVEY.md §7.4);
  * each fetched page becomes a lazily-parsed DataFrame and pages are
  * accumulated with `unionByName` so the whole post-fetch pipeline is one
  * Catalyst plan. On a real cluster the per-page fetch would move into a
  * DataSource V2 `Batch` with one `InputPartition` per (window, page) so
  * executors fetch in parallel; the planning math is identical
  * ([[PagePlanner]]).
  */
final class UsgsSource(
    fetch: UsgsSource.Request => Try[String],
    limit: Int = 10000,
    maxPagesPerWindow: Int = 1000) {
  import UsgsSource._

  /** All pages of one window, stopping at the first short page (the
    * reference's `len(features) < limit` termination, dynamic.py:435-437).
    * A fetch failure throws, so [[backfill]] can retry the window weekly.
    * Page bodies are pulled eagerly (the network part); parsing stays lazy. */
  def fetchWindow(spark: SparkSession, w: PagePlanner.Window): Seq[DataFrame] = {
    val bodies = new scala.collection.mutable.ArrayBuffer[String]
    var offset = 1L
    var done = false
    var pages = 0
    while (!done && pages < maxPagesPerWindow) {
      val body = fetch(Request(w.startParam, w.endParam, limit, offset)).get
      bodies += body
      if (UsgsSource.countFeatures(body) < limit) done = true
      offset += limit
      pages += 1
    }
    bodies.toSeq.map(GeoJsonParser.parseBody(spark, _))
  }

  /** Year-range backfill: month windows, week-window retry on failure
    * (dynamic.py:288-322), all pages unioned into one DataFrame. */
  def backfill(spark: SparkSession, startYear: Int, endYear: Int): DataFrame = {
    val frames = PagePlanner.monthWindows(startYear, endYear).flatMap { m =>
      Try(fetchWindow(spark, m)) match {
        case Success(dfs) => dfs
        case Failure(_) => PagePlanner.weekWindows(m).flatMap(fetchWindow(spark, _))
      }
    }
    frames.reduceOption(_ unionByName _)
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], EventSchema.event))
  }
}

object UsgsSource {
  /** One API page request: `starttime`/`endtime`/`limit`/`offset` params of
    * the FDSN query endpoint (dynamic.py:96-128). */
  final case class Request(start: String, end: String, limit: Int, offset: Long)

  /** Cheap driver-side feature count to detect the terminal short page
    * without parsing the full document (the reference checks
    * `len(data["features"])`). Counts `"type":"Feature"` occurrences. */
  private[ingest] def countFeatures(body: String): Int = {
    var i = 0; var n = 0
    val needle = "\"type\""
    while ({ i = body.indexOf(needle, i); i >= 0 }) {
      val rest = body.substring(i + needle.length).dropWhile(c => c == ' ' || c == ':')
      if (rest.startsWith("\"Feature\"")) n += 1
      i += needle.length
    }
    n
  }
}
