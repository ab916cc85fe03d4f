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
    new UsgsScanBuilder(options)
}

/** Scan builder wired into Catalyst's pushdown negotiation:
  *
  *  - `SupportsPushDownFilters`: `year`/`month` comparison predicates prune
  *    FETCH WINDOWS — `filter($"year" === 2014)` over a 2010-2023 backfill
  *    plans 12 month-partitions instead of 168, the partition-pruning
  *    analogue for an HTTP source (no page is fetched just to be thrown
  *    away). Every filter is also returned as residual, so Spark still
  *    evaluates the exact predicate on the rows — pruning is pure fetch
  *    avoidance and can stay conservative.
  *  - `SupportsPushDownRequiredColumns`: the reader materializes ONLY the
  *    projected fields from each GeoJSON feature (the JSON tree is parsed
  *    either way, but per-field UTF8String/boxing work scales with the
  *    projection, and `ReadSchema` in explain shows the truth).
  *  - `SupportsPushDownLimit`: `.limit(n)` bounds the FETCH LOOP — each
  *    partition requests pages of at most n rows and stops fetching once it
  *    has emitted n, so `load().limit(5)` issues one 5-row request instead
  *    of walking 10000-row pages (the reference's single bounded fetch,
  *    `fetch_earthquake_data_by_limit`,
  *    usgs-earthquake-data-ingest-dynamic.py:131-141). The pushdown is
  *    PARTIAL (`isPartiallyPushed` stays true): every partition caps at n
  *    independently, and Spark's own Limit takes the global first-n.
  *  - `SupportsPushDownAggregates` (argless COUNT only): `load().count()`
  *    fetches COUNTS, not pages — the FDSN API has a `/count` endpoint
  *    beside `/query` (the API-frugal analogue of the reference's bounded
  *    fetch, `usgs-earthquake-data-ingest-dynamic.py:96-128`), so each
  *    month-window partition issues one count request and emits a single
  *    long; Spark sums the partials (partial pushdown, no complete-pushdown
  *    claim). Fixture mode reads a sibling `counts.json` (`{"count":N}`)
  *    instead; without one the pushdown declines and the row scan answers.
  *    Aggregates are only ever pushed over a bare scan — every filter stays
  *    residual, so Catalyst keeps a post-scan Filter and skips aggregate
  *    pushdown whenever a predicate exists (a window-level count cannot see
  *    row-level predicates).
  */
final class UsgsScanBuilder(options: CaseInsensitiveStringMap) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit with SupportsPushDownAggregates {
  import org.apache.spark.sql.sources.Filter
  import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}

  private var required: StructType = EventSchema.event
  private var pushed: Array[Filter] = Array.empty
  private var pushedLimit: Int = -1 // -1 = no limit pushed
  private var pushedCount = false

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(UsgsWindowPruning.prunable)
    filters // all residual: Spark re-applies exact predicates post-scan
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def pushLimit(limit: Int): Boolean = { pushedLimit = limit; true }
  override def pushAggregation(aggregation: Aggregation): Boolean = {
    val fixtureDir = options.get("fixtureDir")
    val countable = aggregation.groupByExpressions.isEmpty &&
      aggregation.aggregateExpressions.length == 1 &&
      aggregation.aggregateExpressions.head.isInstanceOf[CountStar] &&
      pushedLimit < 0 &&
      (fixtureDir == null ||
        new java.io.File(fixtureDir, "counts.json").isFile)
    if (countable) pushedCount = true
    countable
  }
  override def build(): Scan =
    new UsgsScan(options, required, pushed, pushedLimit, pushedCount)
}

final class UsgsScan(options: CaseInsensitiveStringMap, required: StructType,
    pushed: Array[org.apache.spark.sql.sources.Filter], pushedLimit: Int,
    countOnly: Boolean = false) extends Scan with Batch {
  override def readSchema(): StructType =
    if (countOnly) UsgsScan.CountSchema else required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val fixtureDir = options.get("fixtureDir")
    if (countOnly) {
      if (fixtureDir != null)
        // one partition reading the sibling counts.json — zero page fetches
        Array(UsgsPartition(
          Array(new java.io.File(fixtureDir, "counts.json").getAbsolutePath),
          null, null, 0, -1, countOnly = true))
      else {
        val start = options.getInt("startYear", 2014)
        val end = options.getInt("endYear", start)
        val base = options.getOrDefault("baseUrl",
          "https://earthquake.usgs.gov/fdsnws/event/1/query")
        // FDSN publishes /count beside /query with the same parameters
        val countBase =
          if (base.endsWith("/query")) base.dropRight("query".length) + "count"
          else base
        PagePlanner.monthWindows(start, end)
          .filter(w => UsgsWindowPruning.keep(w.start.getYear, w.start.getMonthValue, pushed))
          .map(w => UsgsPartition(null, countBase,
            s"format=geojson&starttime=${w.startParam}&endtime=${w.endParam}",
            0, -1, countOnly = true): InputPartition)
          .toArray
      }
    } else if (fixtureDir != null) {
      val pages = new java.io.File(fixtureDir).listFiles((_, n) => n.endsWith(".json"))
        .sortBy(_.getName).map(_.getAbsolutePath)
      if (options.getBoolean("fixturePaged", false))
        // one partition whose pages are walked sequentially, like the live
        // limit/offset loop — the shape the limit-pushdown spec exercises
        Array(UsgsPartition(pages, null, null, 0, pushedLimit): InputPartition)
      else pages.map(f =>
        UsgsPartition(Array(f), null, null, 0, pushedLimit): InputPartition)
    } else {
      val start = options.getInt("startYear", 2014)
      val end = options.getInt("endYear", start)
      val limit = options.getInt("limit", 10000)
      // a pushed .limit(n) bounds the page size too: no 10000-row body is
      // fetched to satisfy a 5-row query
      val pageLimit = if (pushedLimit >= 0) math.min(limit, math.max(pushedLimit, 1)) else limit
      val base = options.getOrDefault("baseUrl",
        "https://earthquake.usgs.gov/fdsnws/event/1/query")
      PagePlanner.monthWindows(start, end)
        .filter(w => UsgsWindowPruning.keep(w.start.getYear, w.start.getMonthValue, pushed))
        .map(w => UsgsPartition(null, base,
          s"format=geojson&starttime=${w.startParam}&endtime=${w.endParam}",
          pageLimit, pushedLimit): InputPartition)
        .toArray
    }
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new UsgsPartitionReaderFactory(required)
}

object UsgsScan {
  /** Output schema when an argless COUNT is pushed: one non-null long per
    * partition; Spark's final aggregation sums the partials. */
  val CountSchema: StructType = StructType(Seq(
    org.apache.spark.sql.types.StructField("count", org.apache.spark.sql.types.LongType,
      nullable = false)))
}

/** Conservative window-level predicate evaluation: a month window is kept
  * unless a pushed `year`/`month` filter definitively excludes it. Anything
  * unrecognized keeps the window (Spark re-applies all filters on rows). */
private[sources] object UsgsWindowPruning {
  import org.apache.spark.sql.sources._

  def prunable(f: Filter): Boolean = f match {
    case EqualTo(a, _: Number) => a == "year" || a == "month"
    case GreaterThan(a, _: Number) => a == "year" || a == "month"
    case GreaterThanOrEqual(a, _: Number) => a == "year" || a == "month"
    case LessThan(a, _: Number) => a == "year" || a == "month"
    case LessThanOrEqual(a, _: Number) => a == "year" || a == "month"
    case In(a, vs) => (a == "year" || a == "month") && vs.forall(_.isInstanceOf[Number])
    case And(l, r) => prunable(l) || prunable(r)
    case _ => false
  }

  def keep(year: Int, month: Int, filters: Seq[Filter]): Boolean =
    filters.forall(keepOne(year, month, _))

  private def keepOne(year: Int, month: Int, f: Filter): Boolean = {
    def dim(a: String): Option[Int] =
      if (a == "year") Some(year) else if (a == "month") Some(month) else None
    f match {
      case EqualTo(a, v: Number) => dim(a).forall(_ == v.intValue)
      case GreaterThan(a, v: Number) => dim(a).forall(_ > v.intValue)
      case GreaterThanOrEqual(a, v: Number) => dim(a).forall(_ >= v.intValue)
      case LessThan(a, v: Number) => dim(a).forall(_ < v.intValue)
      case LessThanOrEqual(a, v: Number) => dim(a).forall(_ <= v.intValue)
      case In(a, vs) => dim(a).forall(d => vs.exists {
        case v: Number => v.intValue == d
        case _ => true
      })
      case And(l, r) => keepOne(year, month, l) && keepOne(year, month, r)
      case _ => true
    }
  }
}

/** One unit of fetch work: a sequence of fixture page files, or a
  * (url, window) pair whose pages are walked executor-side. `pushedLimit`
  * (-1 = none) caps rows emitted AND pages fetched by this partition.
  * `countOnly = true` turns the partition into a single count fetch
  * (fixture `counts.json` or the FDSN `/count` endpoint) emitting one
  * long row. */
final case class UsgsPartition(fixturePaths: Array[String], baseUrl: String,
    windowQuery: String, limit: Int, pushedLimit: Int,
    countOnly: Boolean = false) extends InputPartition

/** Executor-side fetch accounting (one tick per page request, one per count
  * request). Exists so specs can assert the limit- and count-pushdown fetch
  * contracts without a network; local-mode executors share the JVM with the
  * suite. */
object UsgsFetchProbe {
  val pagesFetched = new java.util.concurrent.atomic.AtomicInteger(0)
  val countsFetched = new java.util.concurrent.atomic.AtomicInteger(0)
  def reset(): Unit = { pagesFetched.set(0); countsFetched.set(0) }
}

final class UsgsPartitionReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[UsgsPartition]
    if (p.countOnly) new UsgsCountReader(p) else new UsgsPartitionReader(p, required)
  }
}

/** Count-pushdown reader: ONE request per partition — the fixture
  * `counts.json` body or the FDSN `/count` endpoint for the partition's
  * window — parsed for its `count` field and emitted as a single long row.
  * No feature page is ever fetched. */
final class UsgsCountReader(p: UsgsPartition) extends PartitionReader[InternalRow] {
  private var emitted = false
  private var row: InternalRow = _

  override def next(): Boolean =
    if (emitted) false
    else {
      val body =
        if (p.fixturePaths != null)
          new String(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(p.fixturePaths(0))),
            java.nio.charset.StandardCharsets.UTF_8)
        else {
          val url = new java.net.URI(s"${p.baseUrl}?${p.windowQuery}").toURL
          val in = url.openStream()
          try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
          finally in.close()
        }
      UsgsFetchProbe.countsFetched.incrementAndGet()
      val n = new ObjectMapper().readTree(body).path("count").asLong()
      row = InternalRow.fromSeq(Seq(Long.box(n)))
      emitted = true
      true
    }

  override def get(): InternalRow = row
  override def close(): Unit = ()
}

final class UsgsPartitionReader(p: UsgsPartition, required: StructType)
    extends PartitionReader[InternalRow] {
  private val mapper = new ObjectMapper()
  private var features: Iterator[JsonNode] = Iterator.empty
  private var current: InternalRow = _
  private var nextOffset = 1L
  private var nextFixture = 0
  private var exhausted = false
  private var emitted = 0L

  private def fetchBody(): Option[String] =
    if (p.fixturePaths != null) {
      if (nextFixture >= p.fixturePaths.length) None
      else {
        val path = p.fixturePaths(nextFixture)
        nextFixture += 1
        UsgsFetchProbe.pagesFetched.incrementAndGet()
        Some(new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8))
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
      UsgsFetchProbe.pagesFetched.incrementAndGet()
      Some(body)
    }

  private def loadNextPage(): Boolean = fetchBody() match {
    case None => false
    case Some(body) =>
      val root = mapper.readTree(body)
      val fs = root.path("features")
      val page = if (fs.isArray) fs.elements().asScala.toVector else Vector.empty
      if (p.fixturePaths == null && page.size < p.limit) exhausted = true
      features = page.iterator
      page.nonEmpty || loadNextPage()
  }

  override def next(): Boolean = {
    // limit pushdown: stop BEFORE fetching page k+1 even if the consumer
    // keeps pulling (an exchange materializes whole partitions; laziness
    // alone would not bound the fetch loop there)
    if (p.pushedLimit >= 0 && emitted >= p.pushedLimit) return false
    if (!features.hasNext && !loadNextPage()) return false
    current = toRow(features.next())
    emitted += 1
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()

  /** Flatten one GeoJSON Feature to the PROJECTED event row — the same
    * field map and null-defaulting as parse_geojson_to_dataframe
    * (reference `:125-168`), with UTC-derived year/month (SURVEY.md §1.2).
    * Only the fields in `required` are materialized (column pruning); the
    * extractor map covers all 32 columns of [[EventSchema.event]]. */
  private def toRow(f: JsonNode): InternalRow = {
    val props = f.path("properties")
    val coords = f.path("geometry").path("coordinates")
    def str(n: JsonNode): Any = if (n.isMissingNode || n.isNull) null else UTF8String.fromString(n.asText())
    def i32(n: JsonNode): Any = if (n.isMissingNode || n.isNull) null else Int.box(n.asInt())
    def f64(n: JsonNode): Any = if (n.isMissingNode || n.isNull) null else Double.box(n.asDouble())
    def tsMicros(n: JsonNode): Any =
      if (n.isMissingNode || n.isNull) null else Long.box(n.asLong() * 1000L) // ms → µs
    lazy val utc = java.time.Instant.ofEpochMilli(props.path("time").asLong())
      .atZone(java.time.ZoneOffset.UTC)
    def value(name: String): Any = name match {
      case "id" => str(f.path("id"))
      case "month" => Int.box(utc.getMonthValue)
      case "year" => Int.box(utc.getYear)
      case "magnitude" => f64(props.path("mag"))
      case "latitude" => if (coords.size() > 1) f64(coords.get(1)) else null
      case "longitude" => if (coords.size() > 0) f64(coords.get(0)) else null
      case "depth" => if (coords.size() > 2) f64(coords.get(2)) else null
      case "eventtime" => tsMicros(props.path("time"))
      case "updated" => tsMicros(props.path("updated"))
      case "significance" => i32(props.path("sig"))
      case "network" => str(props.path("net"))
      case "magnitude_type" => str(props.path("magType"))
      case "geometry" =>
        if (f.path("geometry").isMissingNode) null
        else UTF8String.fromString(mapper.writeValueAsString(f.path("geometry")))
      case "felt" | "tsunami" | "nst" => i32(props.path(name))
      case "cdi" | "mmi" | "dmin" | "rms" | "gap" => f64(props.path(name))
      case other => str(props.path(other)) // place/url/detail/alert/status/code/ids/sources/types/type/title
    }
    InternalRow.fromSeq(required.fieldNames.toIndexedSeq.map(value))
  }
}
