package graft.ingest

import java.time.LocalDate
import org.scalatest.funsuite.AnyFunSuite

/** Property-style tests (exhaustive over year/month ranges) for the pure
  * window/page planner (reference F8 date math). */
class PagePlannerSpec extends AnyFunSuite {

  test("month windows tile the year range exactly: contiguous, no overlap") {
    for (y0 <- 1990 to 2030 by 7; span <- 0 to 4) {
      val ws = PagePlanner.monthWindows(y0, y0 + span)
      assert(ws.head.start === LocalDate.of(y0, 1, 1))
      assert(ws.last.end === LocalDate.of(y0 + span + 1, 1, 1))
      ws.sliding(2).foreach {
        case Seq(a, b) => assert(a.end === b.start)
        case _ =>
      }
      assert(ws.size === 12 * (span + 1))
    }
  }

  test("week windows tile a month window exactly, each at most 7 days") {
    for (y <- Seq(1999, 2014, 2024); m <- 1 to 12) {
      val month = PagePlanner.monthWindows(y, y)(m - 1)
      val ws = PagePlanner.weekWindows(month)
      assert(ws.head.start === month.start)
      assert(ws.last.end === month.end)
      ws.sliding(2).foreach {
        case Seq(a, b) => assert(a.end === b.start)
        case _ =>
      }
      ws.foreach(w => assert(!w.end.isAfter(w.start.plusWeeks(1))))
    }
  }

  test("page offsets follow the API's 1-based offset convention") {
    assert(PagePlanner.pageOffsets(10000, 3) === Seq(1L, 10001L, 20001L))
    assert(PagePlanner.pageOffsets(15000, 0) === Seq())
  }

  test("invalid ranges are rejected") {
    intercept[IllegalArgumentException](PagePlanner.monthWindows(2020, 2019))
    intercept[IllegalArgumentException](
      PagePlanner.Window(LocalDate.of(2020, 2, 1), LocalDate.of(2020, 1, 1)))
  }

  test("ISO request params") {
    val w = PagePlanner.monthWindows(2014, 2014).head
    assert(w.startParam === "2014-01-01" && w.endParam === "2014-02-01")
  }
}
