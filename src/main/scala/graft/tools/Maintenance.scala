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
  *  3. reclaim — [[CommitLog.pruneMirrorConsumed]] against the slowest
  *     subscriber's own checkpoint, releasing consumed feed bytes;
  *  4. vacuum — retention GC of unreachable versions (the explicit
  *     disk-vs-time-travel trade, Delta's VACUUM);
  *  5. sweep — [[CommitLog.fsckClean]] for crash leftovers, then a final
  *     read-only [[CommitLog.fsck]] audit returned to the operator.
  *
  * At 100 TB the cycle is driver-cheap except compaction (a data rewrite —
  * which is why it is threshold-gated) and vacuum's directory walk. */
object Maintenance {

  /** Cadence/threshold policy. `force`+`minAgeMillis = 0` are for tests and
    * decommissioned tables only — see [[CommitLog.vacuum]]'s retention
    * contract. */
  final case class Policy(
      compactWhenDirsExceed: Int = 32,
      zorderBy: Seq[String] = Nil,
      partitionBy: Seq[String] = Nil,
      targetBytes: Long = 128L * 1024 * 1024,
      vacuumKeepVersions: Int = 2,
      minAgeMillis: Long = CommitLog.DefaultVacuumRetentionMillis,
      force: Boolean = false,
      subscriberCheckpoint: Option[String] = None)

  final case class Report(
      repairedCdc: Long,
      compactedTo: Option[Long],
      prunedMirrorLinks: Long,
      vacuumedFiles: Long,
      cleanedLeftovers: Long,
      fsck: CommitLog.FsckReport) {
    def healthy: Boolean = fsck.clean
  }

  def run(spark: SparkSession, table: String, policy: Policy = Policy()): Report = {
    // 1. heal (before anything widens the damage window)
    CommitLog.repairMirror(table)
    val repairedCdc = CommitLog.repairCdc(table)
    // 2. threshold-gated full compaction
    val latest = CommitLog.latestVersion(table).getOrElse(
      throw new IllegalArgumentException(s"$table has no committed versions"))
    val dirs = CommitLog.manifest(table, latest).files
      .map(CommitLog.commitDirOf).distinct.size
    val compactedTo =
      if (dirs > policy.compactWhenDirsExceed)
        Some(CommitLog.compact(spark, table, policy.partitionBy,
          policy.targetBytes, policy.zorderBy))
      else None
    // 3. subscriber-driven feed retention
    val pruned = policy.subscriberCheckpoint
      .map(CommitLog.pruneMirrorConsumed(table, _)).getOrElse(0L)
    // 4. version retention GC
    val vacuumed = CommitLog.vacuum(table, policy.vacuumKeepVersions,
      policy.minAgeMillis, policy.force)
    // 5. crash-leftover sweep + final audit; the audit ignores leftovers
    // younger than the retention window — they are indistinguishable from
    // a concurrent writer's in-flight files, and an hourly cron must not
    // page on a healthy table mid-commit
    val cleaned = CommitLog.fsckClean(table, policy.minAgeMillis, policy.force)
    Report(repairedCdc, compactedTo, pruned, vacuumed, cleaned,
      CommitLog.fsck(table, policy.minAgeMillis))
  }

  /** CLI: `Maintenance <table> [zorderCol,...] [subscriberCheckpoint]` —
    * the shape a cron wires up. Prints one summary line; exits non-zero
    * when the final audit is not clean. */
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Maintenance <table> [zorderCols] [subscriberCheckpoint]")
    val table = args(0)
    val zorder = if (args.length > 1) args(1).split(",").toSeq.filter(_.nonEmpty) else Nil
    val ck = if (args.length > 2) Some(args(2)) else None
    val spark = graft.GraftSession.local("graft-maintenance",
      Runtime.getRuntime.availableProcessors())
    spark.sparkContext.setLogLevel("WARN")
    try {
      val r = run(spark, table, Policy(zorderBy = zorder, subscriberCheckpoint = ck))
      println(s"maintenance $table: repairedCdc=${r.repairedCdc} " +
        s"compactedTo=${r.compactedTo.getOrElse(-1L)} prunedMirror=${r.prunedMirrorLinks} " +
        s"vacuumed=${r.vacuumedFiles} cleaned=${r.cleanedLeftovers} healthy=${r.healthy}")
      if (!r.healthy) {
        System.err.println(s"fsck: ${r.fsck}")
        sys.exit(2)
      }
    } finally spark.stop()
  }
}
