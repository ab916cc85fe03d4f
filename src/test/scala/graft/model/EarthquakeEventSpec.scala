package graft.model

import graft.{Fixtures, SparkSpec}
import graft.ingest.GeoJsonParser

/** Typed Dataset surface round-trips the parsed event frame. */
class EarthquakeEventSpec extends SparkSpec {

  test("parsed events convert to Dataset[EarthquakeEvent] losslessly") {
    val df = GeoJsonParser.parseBody(spark, Fixtures.featureCollection)
    val ds = EarthquakeEvent.typed(df)
    val byId = ds.collect().map(e => e.id -> e).toMap
    assert(byId.keySet === Set("us7000abcd", "nc7200wxyz"))
    val full = byId("us7000abcd")
    assert(full.magnitude === Some(6.1))
    assert(full.tsunami === Some(1))
    assert(full.year === Some(2014))
    assert(full.network === Some("us"))
    val sparse = byId("nc7200wxyz")
    assert(sparse.depth === None)
    assert(sparse.updated === None)
    assert(sparse.place === None)
    // typed transformations compose
    import spark.implicits._
    val flagged = ds.filter(_.tsunami.contains(1)).map(_.id).collect().toSeq
    assert(flagged === Seq("us7000abcd"))
  }
}
