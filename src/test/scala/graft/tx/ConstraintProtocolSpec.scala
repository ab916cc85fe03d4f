package graft.tx

import java.util.concurrent.{CountDownLatch, TimeUnit}

import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** CHECK constraints as LOG COMMITS (round-9 ADVICE, closed round 11):
  * add/drop publish versions through the optimistic commit protocol, so
  * concurrent changes serialize without lost updates, a write racing a
  * registration cannot publish violating rows, and restore/clone carry
  * the TARGET version's constraint set instead of a global config file
  * resurrecting pre-constraint rows under an active constraint. */
class ConstraintProtocolSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(prefix: String): String = {
    val t = tmpDir(prefix); new java.io.File(t).delete()
    CommitLog.commit(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "value"),
      t, "append")
    t
  }

  test("add and drop publish metadata-only versions carrying the set") {
    val t = freshTable("csp_versions")
    Constraints.add(spark, t, "pos", "id > 0")
    val m2 = CommitLog.manifest(t, 2L)
    assert(m2.constraints === Seq("pos" -> "id > 0"))
    assert(m2.files === CommitLog.manifest(t, 1L).files) // metadata-only
    Constraints.add(spark, t, "val_ok", "value >= 0")
    assert(Constraints.list(t).map(_._1) === Seq("pos", "val_ok"))
    Constraints.drop(t, "pos")
    assert(CommitLog.latestVersion(t).get === 4L)
    assert(Constraints.list(t).map(_._1) === Seq("val_ok"))
    // pre-drop versions still carry the dropped constraint (versioned)
    assert(CommitLog.manifest(t, 3L).constraints.map(_._1) ===
      Seq("pos", "val_ok"))
  }

  test("concurrent adds both survive the version race") {
    val t = freshTable("csp_race")
    val fs = Seq("c1" -> "id > 0", "c2" -> "value >= 0").map { case (n, e) =>
      Future(Constraints.add(spark, t, n, e))
    }
    fs.foreach(Await.result(_, 60.seconds))
    assert(Constraints.list(t).map(_._1).sorted === Seq("c1", "c2"))
    // two commits landed — one per add, the loser retried on the winner
    assert(CommitLog.latestVersion(t).get === 3L)
  }

  test("concurrent add and drop keep both effects") {
    val t = freshTable("csp_adddrop")
    Constraints.add(spark, t, "c1", "id > 0")
    val fs = Seq(
      Future(Constraints.drop(t, "c1")),
      Future(Constraints.add(spark, t, "c2", "value >= 0")))
    fs.foreach(Await.result(_, 60.seconds))
    assert(Constraints.list(t).map(_._1) === Seq("c2"))
  }

  test("a write racing a constraint registration re-validates and aborts on violation") {
    val t = freshTable("csp_writerace")
    val cdirsBefore = new java.io.File(t, "data").list().toSet
    // the write's rows VIOLATE the constraint registered mid-write: the
    // commit enforced the pre-registration (empty) set, so its in-loop
    // re-validation must catch the miss and abort instead of publishing
    // the blocking hook lives in the companion and is addressed
    // statically from inside the lambda — latches are not serializable
    val slow = udf((x: Long) => ConstraintProtocolSpec.block(x))
    val bad = spark.range(1).select(slow(lit(-5L)).as("id"),
      lit(-1.0).as("value"))
    val writer = Future(CommitLog.commit(bad, t, "append"))
    assert(ConstraintProtocolSpec.entered.await(60, TimeUnit.SECONDS),
      "write never started")
    Constraints.add(spark, t, "pos", "id > 0") // validates v1, commits v2
    ConstraintProtocolSpec.gate.countDown()
    val e = intercept[IllegalStateException] { Await.result(writer, 120.seconds) }
    assert(e.getMessage.contains("registered concurrently"), e.getMessage)
    // nothing published, the aborted write's data dir reclaimed
    assert(CommitLog.latestVersion(t).get === 2L)
    assert(CommitLog.read(spark, t).count() === 2L)
    assert(new java.io.File(t, "data").list().toSet === cdirsBefore)
  }

  test("the racing-write re-validation reads PHYSICAL names on a column-mapped table") {
    val t = freshTable("csp_colmaprace")
    // rename value -> amount: files store the physical name 'value'; the
    // re-validation must alias it back or the renamed column reads
    // all-NULL, NULL satisfies CHECK, and the violating rows publish
    // (round-11 review finding)
    CommitLog.renameColumn(t, "value", "amount")
    val slow = udf((x: Long) => ConstraintProtocolSpec.block2(x))
    val bad = spark.range(1).select(slow(lit(7L)).as("id"),
      lit(-1.0).as("amount"))
    val writer = Future(CommitLog.commit(bad, t, "append"))
    assert(ConstraintProtocolSpec.entered2.await(60, TimeUnit.SECONDS),
      "write never started")
    Constraints.add(spark, t, "amt_pos", "amount > 0")
    ConstraintProtocolSpec.gate2.countDown()
    val e = intercept[IllegalStateException] { Await.result(writer, 120.seconds) }
    assert(e.getMessage.contains("registered concurrently"), e.getMessage)
    assert(CommitLog.read(spark, t).count() === 2L)
  }

  test("restore brings back the target version's constraint set") {
    val t = freshTable("csp_restore")
    Constraints.add(spark, t, "pos", "id > 0") // v2
    // restoring to the pre-constraint snapshot visibly UNregisters it —
    // never an active constraint over resurrected violating rows
    CommitLog.restore(spark, t, 1L) // v3
    assert(Constraints.list(t).isEmpty)
    CommitLog.commit(Seq((-9L, 1.0)).toDF("id", "value"), t, "append")
    assert(CommitLog.read(spark, t).count() === 3L)
    // restoring forward re-registers with the snapshot
    CommitLog.restore(spark, t, 2L)
    assert(Constraints.list(t) === Seq("pos" -> "id > 0"))
  }

  test("a shallow clone carries the source's versioned constraints") {
    val t = freshTable("csp_clonesrc")
    Constraints.add(spark, t, "pos", "id > 0")
    val dst = tmpDir("csp_clonedst"); new java.io.File(dst).delete()
    CommitLog.cloneTable(t, dst)
    assert(Constraints.list(dst) === Seq("pos" -> "id > 0"))
    val e = intercept[Exception] {
      CommitLog.commit(Seq((-1L, 0.0)).toDF("id", "value"), dst, "append")
    }
    assert(e.getMessage.contains("pos") ||
      Option(e.getCause).exists(_.getMessage.contains("pos")), e.getMessage)
  }

  test("legacy _constraints file is honored and folded on the first change") {
    val t = freshTable("csp_legacy")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(t).resolve(Constraints.ConfigName),
      "old_pos\tid > 0".getBytes("UTF-8"))
    assert(Constraints.list(t) === Seq("old_pos" -> "id > 0"))
    // enforced like any registered constraint
    val e = intercept[Exception] {
      CommitLog.commit(Seq((-1L, 0.0)).toDF("id", "value"), t, "append")
    }
    assert(e.getMessage.contains("old_pos") ||
      Option(e.getCause).exists(_.getMessage.contains("old_pos")), e.getMessage)
    // first add folds the file into the manifest and removes it
    Constraints.add(spark, t, "val_ok", "value >= 0")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(t).resolve(Constraints.ConfigName)))
    assert(Constraints.list(t).map(_._1) === Seq("old_pos", "val_ok"))
    assert(CommitLog.manifest(t, CommitLog.latestVersion(t).get)
      .constraints.map(_._1) === Seq("old_pos", "val_ok"))
  }

  test("registration before the first commit stays on the config file until folded") {
    val t = tmpDir("csp_prev1"); new java.io.File(t).delete()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(t))
    Constraints.add(spark, t, "pos", "id > 0") // no versions: file path
    assert(Constraints.listFile(t) === Seq("pos" -> "id > 0"))
    val e = intercept[Exception] {
      CommitLog.commit(Seq((-1L, 0.0)).toDF("id", "value"), t, "append")
    }
    assert(e.getMessage.contains("pos") ||
      Option(e.getCause).exists(_.getMessage.contains("pos")), e.getMessage)
    CommitLog.commit(Seq((1L, 0.0)).toDF("id", "value"), t, "append")
    assert(Constraints.list(t) === Seq("pos" -> "id > 0"))
  }
}

object ConstraintProtocolSpec {
  val gate = new CountDownLatch(1)
  val entered = new CountDownLatch(1)
  def block(x: Long): Long = {
    entered.countDown()
    gate.await(60, TimeUnit.SECONDS)
    x
  }
  // second single-use pair for the column-mapped variant
  val gate2 = new CountDownLatch(1)
  val entered2 = new CountDownLatch(1)
  def block2(x: Long): Long = {
    entered2.countDown()
    gate2.await(60, TimeUnit.SECONDS)
    x
  }
}
