package graft.ingest

import java.time.LocalDate

/** Pure, property-testable ingest window/page planning.
  *
  * Re-expresses the reference's driver-side date arithmetic
  * (`usgs-earthquake-data-ingest-dynamic.py:288-322`, prod
  * `usgs-earthquake-data-ingestion-prod.py:316-371`): a year range is walked in
  * month-sized windows; a failed month is retried as week-sized windows; within
  * a window, pages are fetched with `limit`/`offset` until a short page.
  *
  * At cluster scale these windows are the input partitions of the ingest
  * source: each (window, page) is independent and can be fetched by a separate
  * task (SURVEY.md §2.1 S2).
  */
object PagePlanner {

  /** A half-open [start, end) fetch window, formatted ISO for the API. */
  final case class Window(start: LocalDate, end: LocalDate) {
    require(!end.isBefore(start), s"window end $end before start $start")
    def startParam: String = start.toString
    def endParam: String = end.toString
  }

  /** Month-sized windows covering [Jan 1 startYear, Jan 1 endYear+1), each
    * clamped to the range end — the reference's
    * `min(current + relativedelta(months=1), end)` loop (dynamic.py:288-322). */
  def monthWindows(startYear: Int, endYear: Int): Seq[Window] = {
    require(endYear >= startYear, s"endYear $endYear < startYear $startYear")
    val end = LocalDate.of(endYear + 1, 1, 1)
    Iterator.iterate(LocalDate.of(startYear, 1, 1))(_.plusMonths(1))
      .takeWhile(_.isBefore(end))
      .map(d => Window(d, Seq(d.plusMonths(1), end).min[LocalDate](_ compareTo _)))
      .toSeq
  }

  /** Week-sized retry windows for one failed window (dynamic.py:303-318). */
  def weekWindows(w: Window): Seq[Window] =
    Iterator.iterate(w.start)(_.plusWeeks(1))
      .takeWhile(_.isBefore(w.end))
      .map(d => Window(d, Seq(d.plusWeeks(1), w.end).min[LocalDate](_ compareTo _)))
      .toSeq

  /** Offsets for pages 1..n given the API's 1-based offset convention
    * (dynamic.py:332-355: `offset = 1; ...; offset += limit`). The actual
    * page loop terminates on a short page; this enumerates the first
    * `maxPages` candidate offsets for planning. */
  def pageOffsets(limit: Int, maxPages: Int): Seq[Long] = {
    require(limit > 0 && maxPages >= 0)
    (0 until maxPages).map(i => 1L + i.toLong * limit)
  }
}
