package graft.schema

import org.apache.spark.sql.types._

/** Schemas for the earthquake-event data model.
  *
  * The reference declares one flat, fixed, 32-column typed table of earthquake
  * events (Polars schema at `usgs-earthquake-data-ingest.py:40-73`, CQL twin at
  * `db-script.cql:4-38`) fed from the USGS GeoJSON FeatureCollection wire format
  * (`usgs-earthquake-data-ingest.py:104-170`), plus two derived silver fact
  * tables (`usgs_fact_tsunami_count_silver_dev.py:90-96,155-162`).
  *
  * Divergence (documented in SURVEY.md §1.2): `year`/`month`/`eventtime` are
  * derived in UTC (`spark.sql.session.timeZone=UTC`), not server-local time.
  */
object EventSchema {

  /** GeoJSON FeatureCollection read schema for `from_json` — the nested wire
    * shape consumed field-by-field by `parse_geojson_to_dataframe`
    * (`usgs-earthquake-data-ingest.py:104-170`). Permissive: absent fields
    * become NULL (reference `props.get(k)` null-defaulting, `:130-163`).
    */
  val properties: StructType = StructType(Seq(
    StructField("mag", DoubleType),
    StructField("place", StringType),
    StructField("time", LongType),      // epoch millis
    StructField("updated", LongType),   // epoch millis, nullable
    StructField("tz", IntegerType),
    StructField("url", StringType),
    StructField("detail", StringType),
    StructField("felt", IntegerType),
    StructField("cdi", DoubleType),
    StructField("mmi", DoubleType),
    StructField("alert", StringType),
    StructField("status", StringType),
    StructField("tsunami", IntegerType),
    StructField("sig", IntegerType),
    StructField("net", StringType),
    StructField("code", StringType),
    StructField("ids", StringType),
    StructField("sources", StringType),
    StructField("types", StringType),
    StructField("nst", IntegerType),
    StructField("dmin", DoubleType),
    StructField("rms", DoubleType),
    StructField("gap", DoubleType),
    StructField("magType", StringType),
    StructField("type", StringType),
    StructField("title", StringType),
  ))

  val geometry: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("coordinates", ArrayType(DoubleType)),
  ))

  val feature: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("id", StringType),
    StructField("properties", properties),
    StructField("geometry", geometry),
  ))

  val featureCollection: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("metadata", StructType(Seq(
      StructField("generated", LongType),
      StructField("count", IntegerType),
      StructField("status", IntegerType),
      StructField("title", StringType),
    ))),
    StructField("features", ArrayType(feature)),
  ))

  /** The flat bronze event table — column order matches the reference's
    * declaration order (`usgs-earthquake-data-ingest.py:40-73`). */
  val event: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("month", IntegerType),
    StructField("year", IntegerType),
    StructField("magnitude", DoubleType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("depth", DoubleType),
    StructField("eventtime", TimestampType, nullable = false),
    StructField("updated", TimestampType),
    StructField("place", StringType),
    StructField("url", StringType),
    StructField("detail", StringType),
    StructField("felt", IntegerType),
    StructField("cdi", DoubleType),
    StructField("mmi", DoubleType),
    StructField("alert", StringType),
    StructField("status", StringType),
    StructField("tsunami", IntegerType),
    StructField("significance", IntegerType),
    StructField("network", StringType),
    StructField("code", StringType),
    StructField("ids", StringType),
    StructField("sources", StringType),
    StructField("types", StringType),
    StructField("nst", IntegerType),
    StructField("dmin", DoubleType),
    StructField("rms", DoubleType),
    StructField("gap", DoubleType),
    StructField("magnitude_type", StringType),
    StructField("type", StringType),
    StructField("title", StringType),
    StructField("geometry", StringType), // GeoJSON geometry re-serialized to JSON
  ))

  /** fact_tsunami_yearly(year, tsunami_yearly_count) — partitioned by year. */
  val factTsunamiYearly: StructType = StructType(Seq(
    StructField("year", IntegerType),
    StructField("tsunami_yearly_count", LongType),
  ))

  /** fact_tsunami_monthly(year, month, tsunami_monthly_count). */
  val factTsunamiMonthly: StructType = StructType(Seq(
    StructField("year", IntegerType),
    StructField("month", IntegerType),
    StructField("tsunami_monthly_count", LongType),
  ))
}
