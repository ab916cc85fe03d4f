package graft.sources

import graft.{Fixtures, SparkSpec}

/** DSv2 source in fixture mode: `spark.read.format("usgs")` over a directory
  * of FeatureCollection bodies — one input partition per page file, rows
  * identical to the DataFrame-level GeoJsonParser flatten. */
class UsgsDataSourceSpec extends SparkSpec {

  def fixtureDir(): String = {
    val dir = tmpDir("usgs_pages")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "page1.json"), Fixtures.featureCollection)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "page2.json"),
      """{"type":"FeatureCollection","features":[]}""")
    dir
  }

  test("format(\"usgs\") reads fixture pages into the event schema") {
    val df = spark.read.format("usgs").option("fixtureDir", fixtureDir()).load()
    assert(df.schema.fieldNames.toSeq === graft.schema.EventSchema.event.fieldNames.toSeq)
    assert(df.count() === 2)
    assert(df.rdd.getNumPartitions === 2) // one partition per page file
  }

  test("DSv2 rows match the DataFrame-level GeoJSON flatten exactly") {
    val viaSource = spark.read.format("usgs").option("fixtureDir", fixtureDir()).load()
    val viaParser = graft.ingest.GeoJsonParser.parseBody(spark, Fixtures.featureCollection)
    val a = viaSource.orderBy("id").collect().toSeq
    val b = viaParser.orderBy("id").collect().toSeq
    assert(a === b)
  }

  test("live-mode partition planning: one partition per month window") {
    // plan only (no network): builder must produce 24 partitions for 2 years
    val table = new UsgsTable(new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("startYear", "2013", "endYear", "2014")))
    val scan = table.newScanBuilder(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(java.util.Map.of())).build()
    assert(scan.toBatch.planInputPartitions().length === 24)
  }
}
