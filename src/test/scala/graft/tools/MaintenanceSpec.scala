package graft.tools

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.tx.CommitLog
import org.apache.spark.sql.functions._

/** The maintenance driver: one cycle over a mutated, mirrored, subscribed
  * table must heal, compact, reclaim, vacuum, and sweep WITHOUT losing a
  * live row, breaking the subscriber, or leaving the audit dirty. */
class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  test("a full cycle on a mutated table: nothing live lost, feed intact, width bounded, audit clean") {
    val t = Files.createTempDirectory("graft_maint").resolve("t").toString
    val ck = Files.createTempDirectory("graft_maint_ck").toString
    val out = Files.createTempDirectory("graft_maint_out").toString
    // 16 mirrored single-row appends (auto-compaction off so the WIDTH is
    // really there for the cycle to fix), then the full mutation family
    (0 until 16).foreach { i =>
      CommitLog.commit(Seq((i.toLong, s"s$i")).toDF("id", "s"), t, "append",
        mirror = true, autoCompactEvery = 0)
    }
    CommitLog.merge(spark, t,
      Seq((3L, "UPD3"), (100L, "NEW100")).toDF("id", "s"), Seq("id"))
    CommitLog.delete(spark, t, col("id") === 5L)
    CommitLog.update(spark, t, col("id") === 7L, Map("s" -> lit("s7!")))
    // a checkpointed subscriber consumes the whole insertion feed
    def drain(): Seq[Long] = {
      val q = CommitLog.readStream(spark, t)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      spark.read.parquet(out).select("id").as[Long].collect().sorted.toSeq
    }
    assert(drain().size === 16)
    val before = CommitLog.read(spark, t).as[(Long, String)].collect().toSet

    val report = Maintenance.run(spark, t, Maintenance.Policy(
      compactWhenDirsExceed = 4, zorderBy = Seq("id"),
      minAgeMillis = 0, force = true, subscriberCheckpoint = Some(ck)))

    // compaction fired and bounded the plan width to one commit dir
    assert(report.compactedTo.isDefined)
    val latest = CommitLog.latestVersion(t).get
    val dirs = CommitLog.manifest(t, latest).files
      .map(_.split("/").take(2).mkString("/")).distinct
    assert(dirs.size === 1)
    // consumed feed history reclaimed, old versions vacuumed, audit clean
    assert(report.prunedMirrorLinks > 0L)
    assert(report.vacuumedFiles > 0L)
    assert(report.healthy, s"fsck: ${report.fsck}")
    // nothing live lost (merge/delete/update results intact post-compact)
    val after = CommitLog.read(spark, t).as[(Long, String)].collect().toSet
    assert(after === before)
    assert(after.contains((3L, "UPD3")) && after.contains((7L, "s7!")))
    assert(!after.exists(_._1 == 5L))
    // the subscriber's checkpoint survives pruning: a restart sees no
    // duplicates and no losses, and a post-maintenance mirrored commit
    // still flows through the feed
    CommitLog.commit(Seq((200L, "late")).toDF("id", "s"), t, "append", mirror = true)
    val drained = drain()
    assert(drained.count(_ == 200L) === 1)
    assert(drained.size === 17)

    // a second cycle is an idempotent no-op on a healthy table
    val again = Maintenance.run(spark, t, Maintenance.Policy(
      compactWhenDirsExceed = 4, minAgeMillis = 0, force = true,
      subscriberCheckpoint = Some(ck)))
    assert(again.repairedCdc === 0L)
    assert(again.compactedTo.isEmpty)
    assert(again.healthy)
  }

  test("the cycle heals a crashed cdc publish before auditing") {
    val t = Files.createTempDirectory("graft_maint2").resolve("t").toString
    CommitLog.commit((0 until 10).map(i => (i.toLong, s"s$i")).toDF("id", "s"),
      t, "append")
    val v = CommitLog.delete(spark, t, col("id") === 1L)
    // simulate the crash window: slot move never happened
    val man = CommitLog.manifest(t, v)
    val cdcRoot = Paths.get(t).resolve("_cdc")
    Files.move(cdcRoot.resolve(f"$v%020d"), cdcRoot.resolve(man.cdcName.get))
    assert(CommitLog.fsck(t).pendingCdc === Seq(v))
    val report = Maintenance.run(spark, t, Maintenance.Policy(
      vacuumKeepVersions = 3, minAgeMillis = 0, force = true))
    assert(report.repairedCdc === 1L)
    assert(report.healthy)
    // the healed slot serves the feed normally
    assert(CommitLog.changeFeed(spark, t, v - 1, Some(v))
      .filter(col(CommitLog.ChangeTypeCol) === "delete").count() === 1L)
  }
}
