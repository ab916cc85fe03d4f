package graft.sources

import java.util
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.ingest.PagePlanner
import graft.schema.EventSchema
import scala.jdk.CollectionConverters._

/** DataSource V2 USGS FDSN event source: `spark.read.format("usgs")`.
  *
  * The reference fetches pages in a single-process driver loop (SURVEY.md
  * §2.1 S1-S3); here windowing is *partition planning*: each month window of
  * the requested year range becomes one `InputPartition`, and the
  * limit/offset page loop for that window runs inside the executor-side
  * `PartitionReader`. On a 1000-executor cluster the backfill fans out to
  * one task per window with no driver bottleneck, and the flatten
  * (`parse_geojson_to_dataframe` semantics, including the rename map and
  * null-defaulting — `usgs-earthquake-data-ingest.py:104-170`) happens where
  * the data lands.
  *
  * Options:
  *  - `startYear`, `endYear`: backfill range (live mode; one partition per
  *    month window).
  *  - `limit`: page size (default 10000).
  *  - `fixtureDir`: offline mode — a directory of `*.json` FeatureCollection
  *    bodies, one partition per file (this environment has no egress; the
  *    live HTTP path shares every line of parsing with fixture mode).
  *  - `baseUrl`: FDSN endpoint for live mode.
  */
class UsgsSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "usgs"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = EventSchema.event
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new UsgsTable(new CaseInsensitiveStringMap(properties))
}

final class UsgsTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = "usgs_events"
  override def schema(): StructType = EventSchema.event
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = EventSchema.event
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] = {
        val fixtureDir = options.get("fixtureDir")
        if (fixtureDir != null) {
          new java.io.File(fixtureDir).listFiles((_, n) => n.endsWith(".json"))
            .sortBy(_.getName)
            .map(f => UsgsPartition(fixturePath = f.getAbsolutePath, null, null, 0): InputPartition)
        } else {
          val start = options.getInt("startYear", 2014)
          val end = options.getInt("endYear", start)
          val limit = options.getInt("limit", 10000)
          val base = options.getOrDefault("baseUrl",
            "https://earthquake.usgs.gov/fdsnws/event/1/query")
          PagePlanner.monthWindows(start, end)
            .map(w => UsgsPartition(null, base,
              s"format=geojson&starttime=${w.startParam}&endtime=${w.endParam}", limit): InputPartition)
            .toArray
        }
      }
      override def createReaderFactory(): PartitionReaderFactory =
        new UsgsPartitionReaderFactory
    }
}

/** One unit of fetch work: either a fixture file or a (url, window) pair
  * whose pages are walked executor-side. */
final case class UsgsPartition(fixturePath: String, baseUrl: String,
    windowQuery: String, limit: Int) extends InputPartition

final class UsgsPartitionReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new UsgsPartitionReader(partition.asInstanceOf[UsgsPartition])
}

final class UsgsPartitionReader(p: UsgsPartition) extends PartitionReader[InternalRow] {
  private val mapper = new ObjectMapper()
  private var features: Iterator[JsonNode] = Iterator.empty
  private var current: InternalRow = _
  private var nextOffset = 1L
  private var exhausted = false

  private def fetchBody(): Option[String] =
    if (p.fixturePath != null) {
      if (exhausted) None
      else {
        exhausted = true
        Some(new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(p.fixturePath)), java.nio.charset.StandardCharsets.UTF_8))
      }
    } else if (exhausted) None
    else {
      val url = new java.net.URI(
        s"${p.baseUrl}?${p.windowQuery}&limit=${p.limit}&offset=$nextOffset").toURL
      val body = {
        val in = url.openStream()
        try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      }
      nextOffset += p.limit
      Some(body)
    }

  private def loadNextPage(): Boolean = fetchBody() match {
    case None => false
    case Some(body) =>
      val root = mapper.readTree(body)
      val fs = root.path("features")
      val page = if (fs.isArray) fs.elements().asScala.toVector else Vector.empty
      if (p.fixturePath == null && page.size < p.limit) exhausted = true
      features = page.iterator
      page.nonEmpty || loadNextPage()
  }

  override def next(): Boolean = {
    if (!features.hasNext && !loadNextPage()) return false
    current = toRow(features.next())
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()

  /** Flatten one GeoJSON Feature to the 32-column event row — the same
    * field map and null-defaulting as parse_geojson_to_dataframe
    * (reference `:125-168`), with UTC-derived year/month (SURVEY.md §1.2). */
  private def toRow(f: JsonNode): InternalRow = {
    val props = f.path("properties")
    val coords = f.path("geometry").path("coordinates")
    def str(n: JsonNode): Any = if (n.isMissingNode || n.isNull) null else UTF8String.fromString(n.asText())
    def i32(n: JsonNode): Any = if (n.isMissingNode || n.isNull) null else Int.box(n.asInt())
    def f64(n: JsonNode): Any = if (n.isMissingNode || n.isNull) null else Double.box(n.asDouble())
    def tsMicros(n: JsonNode): Any =
      if (n.isMissingNode || n.isNull) null else Long.box(n.asLong() * 1000L) // ms → µs
    val timeMs = props.path("time").asLong()
    val utc = java.time.Instant.ofEpochMilli(timeMs).atZone(java.time.ZoneOffset.UTC)
    val geometry =
      if (f.path("geometry").isMissingNode) null
      else UTF8String.fromString(mapper.writeValueAsString(f.path("geometry")))
    InternalRow(
      str(f.path("id")),
      Int.box(utc.getMonthValue),
      Int.box(utc.getYear),
      f64(props.path("mag")),
      if (coords.size() > 1) f64(coords.get(1)) else null,
      if (coords.size() > 0) f64(coords.get(0)) else null,
      if (coords.size() > 2) f64(coords.get(2)) else null,
      tsMicros(props.path("time")),
      tsMicros(props.path("updated")),
      str(props.path("place")),
      str(props.path("url")),
      str(props.path("detail")),
      i32(props.path("felt")),
      f64(props.path("cdi")),
      f64(props.path("mmi")),
      str(props.path("alert")),
      str(props.path("status")),
      i32(props.path("tsunami")),
      i32(props.path("sig")),
      str(props.path("net")),
      str(props.path("code")),
      str(props.path("ids")),
      str(props.path("sources")),
      str(props.path("types")),
      i32(props.path("nst")),
      f64(props.path("dmin")),
      f64(props.path("rms")),
      f64(props.path("gap")),
      str(props.path("magType")),
      str(props.path("type")),
      str(props.path("title")),
      geometry,
    )
  }
}
