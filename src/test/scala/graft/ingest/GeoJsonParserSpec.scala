package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Golden tests for the GeoJSON flatten (FIXTURES.md §1/§2): renames, null
  * propagation, 2-vs-3-element coordinates, UTC year/month derivation,
  * geometry re-serialization, empty-input guard. */
class GeoJsonParserSpec extends SparkSpec {

  val fixture: String = graft.Fixtures.featureCollection

  lazy val parsed = GeoJsonParser.parseBody(spark, fixture).cache()

  test("schema matches the 32-column event table") {
    assert(parsed.schema.fieldNames.toSeq === graft.schema.EventSchema.event.fieldNames.toSeq)
  }

  test("full feature flattens with renames and UTC year/month") {
    val r = parsed.filter("id = 'us7000abcd'").collect().head
    def f(n: String) = r.get(r.fieldIndex(n))
    assert(f("year") === 2014)
    assert(f("month") === 1)
    assert(f("magnitude") === 6.1)       // mag → magnitude
    assert(f("significance") === 572)    // sig → significance
    assert(f("network") === "us")        // net → network
    assert(f("magnitude_type") === "mww")// magType → magnitude_type
    assert(f("latitude") === 36.12)
    assert(f("longitude") === -117.12)
    assert(f("depth") === 10.5)
    assert(f("tsunami") === 1)
    assert(f("eventtime").asInstanceOf[java.sql.Timestamp].getTime === 1389312000000L)
    assert(f("geometry").asInstanceOf[String].contains("\"coordinates\":[-117.12,36.12,10.5]"))
  }

  test("2-element coordinates yield NULL depth; missing props yield NULLs") {
    val r = parsed.filter("id = 'nc7200wxyz'").collect().head
    def f(n: String) = r.get(r.fieldIndex(n))
    assert(f("depth") === null)
    assert(f("updated") === null)
    assert(f("place") === null)
    assert(f("felt") === null)
    assert(f("url") === null)
    assert(f("tsunami") === 0)
    assert(f("latitude") === 37.2)
    assert(f("longitude") === -121.5)
  }

  test("empty features / absent features → empty DataFrame") {
    assert(GeoJsonParser.parseBody(spark, """{"type":"FeatureCollection","features":[]}""").isEmpty)
    assert(GeoJsonParser.parseBody(spark, """{"type":"FeatureCollection"}""").isEmpty)
  }

  test("multi-document parse explodes every page") {
    import spark.implicits._
    val two = GeoJsonParser.parse(spark, spark.createDataset(Seq(fixture, fixture)))
    assert(two.count() === 4)
  }
}
