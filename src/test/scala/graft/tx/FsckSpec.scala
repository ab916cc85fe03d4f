package graft.tx

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Integrity tooling: fsck must see exactly the damage that exists,
  * repairMissing must make the latest snapshot readable again, and
  * fsckClean must remove only age-safe crash leftovers. */
class FsckSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("graft_fsck").resolve("t").toString

  private def seed(t: String): Unit = {
    CommitLog.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), t, "append")
    CommitLog.commit(Seq((3L, "c")).toDF("id", "s"), t, "append")
  }

  test("a healthy table is clean") {
    val t = freshTable()
    seed(t)
    CommitLog.delete(spark, t, col("id") === 1L) // leaves a _cdc dir too
    assert(CommitLog.fsck(t).clean)
  }

  test("fsck reports missing files; repairMissing heals the latest snapshot") {
    val t = freshTable()
    seed(t)
    val m = CommitLog.manifest(t, 2L)
    val victim = m.files.head
    Files.delete(Paths.get(t).resolve(victim))
    val report = CommitLog.fsck(t)
    assert(report.missingFiles.nonEmpty)
    assert(report.missingFiles.forall(_._2 == victim))
    intercept[Exception] { CommitLog.read(spark, t).count() }
    val v = CommitLog.repairMissing(t)
    assert(v === 3L)
    assert(CommitLog.fsck(t).missingFiles.forall(_._1 < v)) // history stays broken
    CommitLog.read(spark, t).count() // latest snapshot readable again
    assert(CommitLog.repairMissing(t) === v) // idempotent no-op when whole
  }

  test("fsck reports orphan commit dirs, orphan cdc dirs, and tmp manifests; fsckClean removes them") {
    val t = freshTable()
    seed(t)
    // crashed writer: a data dir no manifest references
    val orphan = Paths.get(t).resolve("data/deadbeef-orphan")
    Files.createDirectories(orphan)
    Files.write(orphan.resolve("part-0.parquet"), Array[Byte](1, 2, 3))
    // stray cdc dir for a non-mutation version
    val strayCdc = Paths.get(t).resolve("_cdc").resolve(f"${1L}%020d")
    Files.createDirectories(strayCdc)
    // crash-leftover tmp manifest
    val tmp = Paths.get(t).resolve("_graft_log").resolve(".tmp-crashed")
    Files.write(tmp, "junk".getBytes("UTF-8"))
    val report = CommitLog.fsck(t)
    assert(report.orphanDirs === Seq("data/deadbeef-orphan"))
    assert(report.orphanCdc === Seq(1L))
    assert(report.tmpManifests === Seq(".tmp-crashed"))
    // age window protects a possibly-in-flight writer...
    assert(CommitLog.fsckClean(t) === 0L)
    assert(Files.exists(orphan))
    // ...force asserts no writer is live (tests, decommissioned tables)
    assert(CommitLog.fsckClean(t, minAgeMillis = 0, force = true) === 3L)
    assert(!Files.exists(orphan) && !Files.exists(strayCdc) && !Files.exists(tmp))
    assert(CommitLog.fsck(t).clean)
    // the table itself was never touched
    assert(CommitLog.read(spark, t).count() === 3L)
  }
}
