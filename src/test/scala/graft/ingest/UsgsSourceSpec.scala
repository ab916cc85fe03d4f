package graft.ingest

import graft.{Fixtures, SparkSpec}
import scala.util.{Failure, Success, Try}

/** Paginated source with injected fetch: page termination on short page,
  * week-window retry on month failure, feature counting. */
class UsgsSourceSpec extends SparkSpec {

  def page(n: Int): String = {
    // a FeatureCollection with n features
    val f = """{"type":"Feature","id":"ev%d","properties":{"mag":1.0,"time":1389312000000,"tsunami":0,"sig":1},"geometry":{"type":"Point","coordinates":[1.0,2.0]}}"""
    s"""{"type":"FeatureCollection","features":[${(0 until n).map(i => f.format(i)).mkString(",")}]}"""
  }

  test("countFeatures counts only type:Feature entries") {
    assert(UsgsSource.countFeatures(page(3)) === 3)
    assert(UsgsSource.countFeatures(page(0)) === 0)
    assert(UsgsSource.countFeatures(Fixtures.featureCollection) === 2)
  }

  test("window fetch pages until the short page") {
    var calls = Vector.empty[Long]
    val src = new UsgsSource(req => {
      calls :+= req.offset
      // two full pages of 2, then a short page of 1
      Success(if (req.offset < 5) page(2) else page(1))
    }, limit = 2)
    val w = PagePlanner.monthWindows(2014, 2014).head
    val dfs = src.fetchWindow(spark, w)
    assert(calls === Vector(1L, 3L, 5L))
    assert(dfs.map(_.count()).sum === 5)
  }

  test("backfill retries failed month windows as week windows") {
    var monthCalls = 0; var weekCalls = 0
    val src = new UsgsSource(req => {
      val days = java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.parse(req.start), java.time.LocalDate.parse(req.end))
      if (days > 7) { monthCalls += 1; Failure(new RuntimeException("api error")) }
      else { weekCalls += 1; Success(page(1)) }
    }, limit = 10)
    val df = src.backfill(spark, 2014, 2014)
    assert(monthCalls === 12)       // every month window fails once
    assert(weekCalls >= 52)         // retried as weeks
    assert(df.count() === weekCalls)
    assert(df.columns.toSeq === graft.schema.EventSchema.event.fieldNames.toSeq)
  }

  test("empty backfill yields an empty frame with the event schema") {
    val src = new UsgsSource(_ => Success(page(0)), limit = 10)
    val df = src.backfill(spark, 2014, 2014)
    assert(df.isEmpty)
    assert(df.columns.toSeq === graft.schema.EventSchema.event.fieldNames.toSeq)
  }
}
