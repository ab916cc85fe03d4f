package graft

import org.apache.spark.sql.SparkSession
import graft.bronze.BronzeWriter
import graft.cluster.ClusterWrite
import graft.ingest.UsgsSource
import graft.serve.KeyedSink
import graft.silver.TsunamiFacts
import graft.sinks.FileSinks
import org.apache.spark.sql.functions.col

/** End-to-end pipeline orchestration — the Spark shape of the reference's
  * `ETLIngestion` + `ETLSilverLayer` entry point
  * (`usgs-earthquake-data-ingestion-prod.py:458-575`, lifecycle in
  * SURVEY.md §3.1):
  *
  *   backfill (paged fetch, month windows, weekly retry)
  *     → one persisted DataFrame
  *     → fan-out: CSV + JSON + clustered bronze append + keyed serving write
  *       (the reference's four-sink loop, §2.10 — here one lazy plan reused
  *       across write actions instead of four materializations)
  *     → silver facts from bronze read-back (partition-pruned aggregates).
  *
  * Fixes folded in (documented divergences): append (not the prod
  * overwrite-per-page bug, `save_to_raw_delta_prod.py:143`), UTC time
  * derivation, and optional dedup of overlapping ingest windows.
  */
object IngestJob {

  final case class Config(
      startYear: Int,
      endYear: Int,
      bronzePath: String,
      yearlyFactPath: String,
      monthlyFactPath: String,
      csvDir: Option[String] = None,
      jsonDir: Option[String] = None,
      servingPath: Option[String] = None,
      dedupeEvents: Boolean = false,
      clusterBronze: Boolean = true,
      /** Route the bronze append through [[graft.tx.CommitLog]] — the
        * reference's actual Delta semantics (atomic commit, snapshot
        * isolation); silver then reads the committed snapshot, never a
        * half-written append. */
      transactionalBronze: Boolean = false)

  final case class Summary(eventsIngested: Long, yearlyRows: Long, monthlyRows: Long)

  def run(spark: SparkSession, cfg: Config, source: UsgsSource): Summary = {
    val raw = source.backfill(spark, cfg.startYear, cfg.endYear)
    val events0 =
      if (cfg.dedupeEvents)
        ext.Dedup.latestRevision(raw, col("id"), col("updated"))
      else raw
    val events = events0.persist()
    try {
      val n = events.count()

      // Multi-sink fan-out (reference §2.10: parse → CSV → JSON → Delta →
      // Cassandra per page; here per run, one cached frame, four writes).
      cfg.csvDir.foreach(FileSinks.saveCsv(events, _))
      cfg.jsonDir.foreach(FileSinks.saveJson(events, _))
      val clustered =
        if (cfg.clusterBronze)
          ClusterWrite.cluster(events,
            Seq(col("tsunami"), col("magnitude"), col("significance")))
        else events
      if (cfg.transactionalBronze)
        BronzeWriter.writeVersioned(clustered, cfg.bronzePath, "append")
      else
        BronzeWriter.write(clustered, cfg.bronzePath, "append")
      cfg.servingPath.foreach(KeyedSink.writeFiles(events, _))

      // Silver layer from bronze read-back (§3.2), one Catalyst plan per fact.
      val bronze =
        if (cfg.transactionalBronze) BronzeWriter.readSnapshot(spark, cfg.bronzePath)
        else BronzeWriter.read(spark, cfg.bronzePath)
      TsunamiFacts.writeYearly(bronze, cfg.yearlyFactPath)
      TsunamiFacts.writeMonthly(bronze, cfg.monthlyFactPath)

      Summary(n,
        spark.read.parquet(cfg.yearlyFactPath).count(),
        spark.read.parquet(cfg.monthlyFactPath).count())
    } finally events.unpersist()
  }
}
