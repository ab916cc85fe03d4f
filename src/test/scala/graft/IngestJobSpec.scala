package graft

import graft.ingest.UsgsSource
import scala.util.Success

/** Full pipeline run with an injected fetch: every sink materializes, silver
  * facts match the fixture goldens, re-running appends (bronze) while facts
  * overwrite idempotently. */
class IngestJobSpec extends SparkSpec {

  def source: UsgsSource = new UsgsSource(req =>
    // January window returns the fixture; everything else empty.
    Success(if (req.start.startsWith("2014-01"))
      Fixtures.featureCollection
    else """{"type":"FeatureCollection","features":[]}"""),
    limit = 10000)

  test("pipeline lands bronze, silver, csv/json, and serving outputs") {
    val root = tmpDir("pipeline")
    val cfg = IngestJob.Config(
      startYear = 2014, endYear = 2014,
      bronzePath = s"$root/bronze",
      yearlyFactPath = s"$root/fact_yearly",
      monthlyFactPath = s"$root/fact_monthly",
      csvDir = Some(s"$root/csv"),
      jsonDir = Some(s"$root/json"),
      servingPath = Some(s"$root/serving"))
    val s = IngestJob.run(spark, cfg, source)
    assert(s === IngestJob.Summary(2, 1, 1))
    assert(spark.read.parquet(cfg.bronzePath).count() === 2)
    assert(new java.io.File(s"$root/bronze/year=2014/month=1").exists())
    assert(spark.read.parquet(cfg.yearlyFactPath).select("tsunami_yearly_count").collect().head.getLong(0) === 1L)
    assert(new java.io.File(s"$root/serving/month=1/year=2014").exists())
    assert(new java.io.File(s"$root/csv").listFiles().nonEmpty)

    // second run: bronze appends, silver facts recompute (overwrite)
    val s2 = IngestJob.run(spark, cfg, source)
    assert(s2.eventsIngested === 2)
    assert(spark.read.parquet(cfg.bronzePath).count() === 4)
    assert(spark.read.parquet(cfg.yearlyFactPath).select("tsunami_yearly_count").collect().head.getLong(0) === 2L)
  }

  test("transactionalBronze lands versioned snapshots; silver reads committed data") {
    val root = tmpDir("pipeline_tx")
    val cfg = IngestJob.Config(2014, 2014,
      s"$root/bronze", s"$root/fy", s"$root/fm", transactionalBronze = true)
    val s = IngestJob.run(spark, cfg, source)
    assert(s === IngestJob.Summary(2, 1, 1))
    assert(graft.tx.CommitLog.latestVersion(cfg.bronzePath) === Some(1L))
    // second run appends as version 2; silver recomputes from the snapshot
    IngestJob.run(spark, cfg, source)
    assert(graft.tx.CommitLog.latestVersion(cfg.bronzePath) === Some(2L))
    assert(graft.tx.CommitLog.read(spark, cfg.bronzePath).count() === 4)
    assert(graft.tx.CommitLog.readAt(spark, cfg.bronzePath, 1).count() === 2)
    assert(spark.read.parquet(cfg.yearlyFactPath)
      .select("tsunami_yearly_count").collect().head.getLong(0) === 2L)
  }

  test("dedupeEvents drops duplicate ids before landing") {
    val root = tmpDir("pipeline_dedup")
    val dupSource = new UsgsSource(req =>
      Success(if (req.start.startsWith("2014-01") || req.start.startsWith("2014-02"))
        Fixtures.featureCollection // same two events served for two windows
      else """{"type":"FeatureCollection","features":[]}"""),
      limit = 10000)
    val cfg = IngestJob.Config(2014, 2014,
      s"$root/bronze", s"$root/fy", s"$root/fm", dedupeEvents = true)
    val s = IngestJob.run(spark, cfg, dupSource)
    assert(s.eventsIngested === 2) // 4 fetched, 2 after latest-revision dedup
  }
}
