package graft.tools

import org.apache.spark.sql.SparkSession

import graft.tx.CommitLog

/** One-call maintenance cycle for a commit-log table (round-5 VERDICT item
  * 6) — the operational analogue of the reference's hourly cron
  * (`.github/workflows/deploy.yml:53`): every periodic chore the engine
  * otherwise relies on a caller remembering, run in dependency order under
  * one policy object.
  *
  *  1. heal — [[CommitLog.repairMirror]] (insertion-feed gaps) and
  *     [[CommitLog.repairCdc]] (crashed change-row publishes); both
  *     idempotent, so running them every cycle costs nothing when healthy;
  *  2. compact — full [[CommitLog.compact]] (optionally Z-ordering) once
  *     the snapshot spans more commit dirs than the policy width; the
  *     inline auto-compaction bounds width between cycles, this resets it
  *     to minimal and re-clusters;
  *  3. index upkeep — [[graft.ext.IvfStore.refresh]] /
  *     [[graft.ext.PqStore.refresh]] for every registered index whose
  *     covered watermark lags the base (before vacuum, so the change-feed
  *     slice it folds still exists), a width-gated re-cluster of the
  *     index's artifact table on its gate column (refresh merges land
  *     unclustered and would otherwise erode cell-gated file skipping),
  *     and a drift-staleness flag when only a re-`build` will do;
  *  4. reclaim — [[CommitLog.pruneMirrorConsumed]] against the slowest
  *     subscriber's own checkpoint, releasing consumed feed bytes;
  *  5. vacuum — retention GC of unreachable versions (the explicit
  *     disk-vs-time-travel trade, Delta's VACUUM), stopping at any
  *     registered change-feed reader's cursor;
  *  6. sweep — [[CommitLog.fsckClean]] for crash leftovers, then a final
  *     read-only [[CommitLog.fsck]] audit returned to the operator —
  *     re-healed and re-audited once if it overlaps a live writer's
  *     publish window, so a cron never pages on a healthy mid-commit
  *     table.
  *
  * At 100 TB the cycle is driver-cheap except compaction (a data rewrite —
  * which is why it is threshold-gated) and vacuum's directory walk. */
object Maintenance {

  /** Cadence/threshold policy. `force`+`minAgeMillis = 0` are for tests and
    * decommissioned tables only — see [[CommitLog.vacuum]]'s retention
    * contract. `indexes` registers persisted indexes
    * ([[graft.ext.IvfStore]] / [[graft.ext.PqStore]], per
    * [[IndexRef.kind]]) BUILT OVER this table: each cycle refreshes any
    * whose covered watermark lags the base (replay-safe — an
    * already-covered index no-ops), and flags indexes whose
    * drift `staleFraction` crosses
    * `indexStaleThreshold` as needing an explicit re-`build` (centroid
    * drift is not refreshable — same operator decision as a Z-order
    * re-cluster). NOTE: an index is also a change-feed consumer — a table
    * vacuumed OUTSIDE this cycle should have its indexes registered via
    * [[CommitLog.registerCdcReader]] so retention can't outrun them;
    * inside a cycle the ordering (refresh before vacuum) already
    * protects them. */
  final case class Policy(
      compactWhenDirsExceed: Int = 32,
      zorderBy: Seq[String] = Nil,
      partitionBy: Seq[String] = Nil,
      targetBytes: Long = 128L * 1024 * 1024,
      vacuumKeepVersions: Int = 2,
      minAgeMillis: Long = CommitLog.DefaultVacuumRetentionMillis,
      force: Boolean = false,
      subscriberCheckpoint: Option[String] = None,
      indexes: Seq[IndexRef] = Nil,
      indexStaleThreshold: Double = 0.5,
      dropLaggingReaders: Boolean = false,
      /** Fold deletion vectors once the snapshot carries this many DV
        * dirs: merge-on-read trades read-time anti-joins for O(rows)
        * trickle writes, and the cycle is where that debt gets repaid
        * (Delta's OPTIMIZE on a DV table). deleteDv's own fold-at-32
        * bounds dir COUNT; this threshold repays the row debt itself. */
      compactWhenDvDirsExceed: Int = 8,
      /** Auto-[[graft.ext.DecontaminationStore.rebuild]] a registered
        * "decon" index once its [[graft.ext.DecontaminationStore.deleteDebt]]
        * (retired-shingle instances over inserted) or
        * [[graft.ext.DecontaminationStore.saturation]] crosses this —
        * unlike an IVF re-fit, a decon re-build is deterministic
        * data-derived state, so the cycle RUNS it instead of only
        * flagging (round-14 VERDICT item 7: a churning train corpus
        * otherwise accumulates stale positives silently forever). */
      deconRebuildDebtThreshold: Double = 0.25)

  /** A persisted index rooted at `indexRoot`, built over the maintained
    * table. `kind` selects the store: "ivf" ([[graft.ext.IvfStore]]),
    * "pq" ([[graft.ext.PqStore]]) or "dedup" ([[graft.ext.DedupStore]],
    * round-13 VERDICT item 2 — the MinHash band table has the identical
    * watermark contract, so the hourly cycle keeps "dedup today's crawl
    * against the corpus" O(delta) without a separate cron). For "dedup",
    * `idCol`/`textCol` name the base's document id and text columns and
    * `vecCol` is unused; a high staleFraction means merge-layout debt,
    * not wrong answers (no fitted model) — the width-gated artifact
    * compaction below repays most of it between builds. */
  final case class IndexRef(indexRoot: String,
      idCol: String = "vec_id", vecCol: String = "embedding",
      kind: String = "ivf", textCol: String = "text") {
    require(kind == "ivf" || kind == "pq" || kind == "dedup" || kind == "decon",
      s"unknown index kind: $kind")
    def refresh(spark: SparkSession, table: String): Long = kind match {
      case "pq" => graft.ext.PqStore.refresh(spark, table, indexRoot, idCol, vecCol)
      case "dedup" =>
        graft.ext.DedupStore.refresh(spark, table, indexRoot, idCol, textCol)
      case "decon" =>
        graft.ext.DecontaminationStore.refresh(spark, table, indexRoot, idCol, textCol)
      case _ => graft.ext.IvfStore.refresh(spark, table, indexRoot, idCol, vecCol)
    }
    /** For "decon" this is the [[graft.ext.DecontaminationStore.saturation]]
      * fill gauge (> threshold ⇒ the fpp contract needs a bigger
      * re-build) — the same alarm semantics, a different debt. */
    def staleFraction(): Double = kind match {
      case "pq" => graft.ext.PqStore.staleFraction(indexRoot)
      case "dedup" => graft.ext.DedupStore.staleFraction(indexRoot)
      case "decon" => graft.ext.DecontaminationStore.saturation(
        org.apache.spark.sql.SparkSession.active, indexRoot)
      case _ => graft.ext.IvfStore.staleFraction(indexRoot)
    }
    def artifactTable: String = kind match {
      case "pq" => graft.ext.PqStore.artifactTable(indexRoot)
      case "dedup" => graft.ext.DedupStore.artifactTable(indexRoot)
      case "decon" => graft.ext.DecontaminationStore.artifactTable(indexRoot)
      case _ => graft.ext.IvfStore.artifactTable(indexRoot)
    }
    /** Cluster key for the artifact re-cluster: `cell` wherever the
      * layout powers a gate (IVF probe reads filter on it; the gated
      * composite's file skipping depends on it); the dedup band table
      * clusters on the DOC ID — not for reads (its self-join carries no
      * static predicate) but for the refresh path's keyed mutations,
      * whose bounds pre-shrink needs tight per-file id ranges to stay
      * O(touched files) (DedupStore.build's layout note). The decon
      * sketch is one row and compacts unclustered. */
    def clusterBy: Seq[String] = kind match {
      case "pq" =>
        if (graft.ext.PqStore.isGated(indexRoot)) Seq("cell") else Nil
      case "dedup" => Seq(idCol)
      case "decon" => Nil
      case _ => Seq("cell")
    }
  }

  final case class Report(
      repairedCdc: Long,
      compactedTo: Option[Long],
      prunedMirrorLinks: Long,
      vacuumedFiles: Long,
      cleanedLeftovers: Long,
      fsck: CommitLog.FsckReport,
      refreshedIndexes: Seq[(String, Long)] = Nil,
      staleIndexes: Seq[String] = Nil,
      laggingReaderCursor: Option[Long] = None,
      rebuiltIndexes: Seq[String] = Nil,
      upgradedSidecars: Int = 0) {
    def healthy: Boolean = fsck.clean
  }

  def run(spark: SparkSession, table: String, policy: Policy = Policy()): Report = {
    // 1. heal (before anything widens the damage window)
    CommitLog.repairMirror(table)
    var repairedCdc = CommitLog.repairCdc(table)
    // 2. threshold-gated full compaction — triggered by commit-dir WIDTH
    // (plan-width debt) or accumulated DELETION VECTORS (merge-on-read
    // debt: every snapshot read pays the anti-join until a compact folds
    // the deaths into clean files)
    val latest = CommitLog.latestVersion(table).getOrElse(
      throw new IllegalArgumentException(s"$table has no committed versions"))
    val m0 = CommitLog.manifest(table, latest)
    // 2a. legacy stats-sidecar upgrade (round-15 ADVICE on FileStats):
    // CONVERT-imported foreign files recorded before the row-count field
    // existed keep pruning on grandfathered full-coverage bounds — a
    // stats-less row group could hide rows outside min/max. One footer
    // re-read per legacy file makes coverage a measured fact; cheap and
    // idempotent (a dir with no legacy lines is a sidecar read + no-op).
    val upgradedSidecars = m0.files.map(CommitLog.commitDirOf).distinct
      .map(d => graft.tx.FileStats.upgradeLegacySidecars(
        java.nio.file.Paths.get(table).resolve(d))).sum
    val dirs = m0.files.map(CommitLog.commitDirOf).distinct.size
    val compactedTo =
      if (dirs > policy.compactWhenDirsExceed ||
          m0.dvDirs.size > policy.compactWhenDvDirsExceed)
        Some(CommitLog.compact(spark, table, policy.partitionBy,
          policy.targetBytes, policy.zorderBy))
      else None
    // 3. registered indexes: fold the base's changes since each index's
    // covered watermark (BEFORE vacuum, so the feed slice still exists);
    // report — don't auto-run — the rebuild decision on drift
    val rebuilt = scala.collection.mutable.ArrayBuffer.empty[String]
    val refreshed = policy.indexes.map { ix =>
      var v = ix.refresh(spark, table)
      // decon stores rebuild IN-CYCLE: delete debt past the threshold
      // means enough stale positives across the whole sketch that a FULL
      // re-build reclaims precision (deterministic, one pass over the
      // current corpus); a SATURATED shard (fill > capacity — its fpp
      // contract is no longer honest) re-sizes ALONE via rebuildShards
      // (round-15 VERDICT item 1: capacity decisions go per-shard), the
      // refresh above having just brought the watermark to the base's
      // latest so the partial rebuild covers the same snapshot
      if (ix.kind == "decon") {
        if (graft.ext.DecontaminationStore.deleteDebt(spark, ix.indexRoot) >
            policy.deconRebuildDebtThreshold) {
          v = graft.ext.DecontaminationStore.rebuild(spark, table,
            ix.indexRoot, ix.textCol)
          rebuilt += ix.indexRoot
        } else {
          val sat = graft.ext.DecontaminationStore
            .saturatedShards(spark, ix.indexRoot)
          if (sat.nonEmpty) {
            graft.ext.DecontaminationStore.rebuildShards(spark, table,
              ix.indexRoot, sat, ix.textCol)
            rebuilt += s"${ix.indexRoot}#shards=${sat.mkString(",")}"
          }
        }
      }
      // the artifact table accumulates refresh-merge dirs like any hot
      // table — and each merge lands UNCLUSTERED, eroding the cell
      // gate's file skipping. Width-gate a re-cluster on the gate column
      // (compaction carries the txn watermark forward, so the covered
      // version survives the rewrite).
      val at = ix.artifactTable
      CommitLog.latestVersion(at).foreach { lv =>
        val dirs = CommitLog.manifest(at, lv).files
          .map(CommitLog.commitDirOf).distinct.size
        if (dirs > policy.compactWhenDirsExceed)
          CommitLog.compact(spark, at, targetBytes = policy.targetBytes,
            zorderBy = ix.clusterBy)
      }
      ix.indexRoot -> v
    }
    val stale = policy.indexes
      .filter(_.staleFraction() > policy.indexStaleThreshold)
      .map(_.indexRoot)
    // 4. subscriber-driven feed retention
    val pruned = policy.subscriberCheckpoint
      .map(CommitLog.pruneMirrorConsumed(table, _)).getOrElse(0L)
    // 5. version retention GC. A registered reader cursor that pins
    // retention below the policy's keepVersions is SURFACED in the report
    // (an abandoned reader would otherwise silently disable vacuum
    // forever — disk grows with healthy=true and no operator signal);
    // Policy.dropLaggingReaders is the one-shot cron override, and
    // CommitLog.deregisterCdcReader(table, id) is the durable fix for a
    // specific abandoned id (the override left on permanently would
    // unguard every FUTURE legitimate reader too).
    val latestNow = CommitLog.latestVersion(table).getOrElse(latest)
    val laggingCursor = CommitLog.minCdcReaderCursor(table)
      .filter(c => !policy.dropLaggingReaders &&
        latestNow - c + 1 > policy.vacuumKeepVersions)
    val vacuumed = CommitLog.vacuum(table, policy.vacuumKeepVersions,
      policy.minAgeMillis, policy.force, policy.dropLaggingReaders)
    // 6. crash-leftover sweep + final audit; the audit ignores leftovers
    // younger than the retention window — they are indistinguishable from
    // a concurrent writer's in-flight files, and an hourly cron must not
    // page on a healthy table mid-commit
    val cleaned = CommitLog.fsckClean(table, policy.minAgeMillis, policy.force)
    var audit = CommitLog.fsck(table, policy.minAgeMillis)
    if (audit.pendingCdc.nonEmpty || audit.unmirrored.nonEmpty) {
      // manifest-referenced damage is reported regardless of age, but a
      // LIVE writer's millisecond publish window (manifest linked, slot
      // move or mirror not yet run) can overlap the audit — that exact
      // state is what heal repairs, so re-heal and re-audit once instead
      // of paging the cron on a healthy mid-publish table (round-6
      // ADVICE, low; repairCdc is publish-race-safe as of this round)
      CommitLog.repairMirror(table)
      repairedCdc += CommitLog.repairCdc(table)
      audit = CommitLog.fsck(table, policy.minAgeMillis)
    }
    Report(repairedCdc, compactedTo, pruned, vacuumed, cleaned, audit,
      refreshed, stale, laggingCursor, rebuilt.toSeq, upgradedSidecars)
  }

  /** CLI: `Maintenance <table> [zorderCol,...] [subscriberCheckpoint]
    * [indexRoot,...]` — the shape a cron wires up (prefix a root with
    * `pq:` for a [[graft.ext.PqStore]] index, `dedup:` for a
    * [[graft.ext.DedupStore]] over (doc_id, text); bare roots are IVF).
    * Prints one summary line; exits non-zero when the final audit is not
    * clean. */
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: Maintenance <table> [zorderCols] [subscriberCheckpoint] [indexRoots]")
    val table = args(0)
    val zorder = if (args.length > 1) args(1).split(",").toSeq.filter(_.nonEmpty) else Nil
    val ck = if (args.length > 2) Some(args(2)).filter(_.nonEmpty) else None
    val ixs = if (args.length > 3)
      args(3).split(",").toSeq.filter(_.nonEmpty).map {
        case r if r.startsWith("pq:") => IndexRef(r.stripPrefix("pq:"), kind = "pq")
        case r if r.startsWith("dedup:") =>
          IndexRef(r.stripPrefix("dedup:"), idCol = "doc_id", kind = "dedup")
        case r if r.startsWith("decon:") =>
          IndexRef(r.stripPrefix("decon:"), idCol = "doc_id", kind = "decon")
        case r => IndexRef(r)
      } else Nil
    val spark = graft.GraftSession.local("graft-maintenance",
      Runtime.getRuntime.availableProcessors())
    spark.sparkContext.setLogLevel("WARN")
    try {
      val r = run(spark, table,
        Policy(zorderBy = zorder, subscriberCheckpoint = ck, indexes = ixs))
      println(s"maintenance $table: repairedCdc=${r.repairedCdc} " +
        s"compactedTo=${r.compactedTo.getOrElse(-1L)} prunedMirror=${r.prunedMirrorLinks} " +
        s"vacuumed=${r.vacuumedFiles} cleaned=${r.cleanedLeftovers} " +
        s"refreshedIndexes=${r.refreshedIndexes.map { case (p, v) => s"$p@$v" }.mkString(",")} " +
        s"staleIndexes=${r.staleIndexes.mkString(",")} " +
        s"rebuiltIndexes=${r.rebuiltIndexes.mkString(",")} " +
        s"laggingReaderCursor=${r.laggingReaderCursor.getOrElse(-1L)} " +
        s"healthy=${r.healthy}")
      if (!r.healthy) {
        System.err.println(s"fsck: ${r.fsck}")
        sys.exit(2)
      }
    } finally spark.stop()
  }
}
