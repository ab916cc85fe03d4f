package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.tx.CommitLog

/** `spark.readStream.format("graft")` — the version-tailing CDF stream:
  * offsets are commit versions, micro-batches are changeFeed slices, every
  * row-level change arrives exactly once with `_change_type` +
  * `_commit_version` attached, in version order. */
class GraftStreamSourceSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(prefix: String): String = {
    val table = tmpDir(prefix)
    new java.io.File(table).delete()
    CommitLog.commit(
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
        .toDF("id", "typ", "value"),
      table, "append")
    table
  }

  private def startStream(table: String, name: String, opts: Map[String, String] = Map.empty) = {
    var reader = spark.readStream.format("graft")
    opts.foreach { case (k, v) => reader = reader.option(k, v) }
    reader.load(table).writeStream.format("memory")
      .queryName(name).outputMode("append").start()
  }

  test("earliest start serves the full history, then live mutations, version-ordered") {
    val t = freshTable("gss_hist")
    val q = startStream(t, "gss_hist_sink", Map("startingVersion" -> "earliest"))
    try {
      q.processAllAvailable()
      val v1 = spark.table("gss_hist_sink")
        .select("id", CommitLog.ChangeTypeCol, CommitLog.CommitVersionCol)
        .as[(Long, String, Long)].collect().sorted
      assert(v1.toSeq === Seq((1L, "insert", 1L), (2L, "insert", 1L), (3L, "insert", 1L)))

      CommitLog.deleteDv(spark, t, col("id") === 2L)
      q.processAllAvailable()
      val v2 = spark.table("gss_hist_sink")
        .filter(col(CommitLog.CommitVersionCol) === 2L)
        .select("id", CommitLog.ChangeTypeCol).as[(Long, String)].collect()
      assert(v2.toSeq === Seq((2L, "delete")))

      CommitLog.mergeDv(spark, t,
        Seq((3L, "c", 99.0), (4L, "d", 40.0)).toDF("id", "typ", "value"), Seq("id"))
      q.processAllAvailable()
      val v3 = spark.table("gss_hist_sink")
        .filter(col(CommitLog.CommitVersionCol) === 3L)
        .select(col("id"), col(CommitLog.ChangeTypeCol), col("value"))
        .as[(Long, String, Double)].collect().sortBy(r => (r._1, r._2))
      assert(v3.toSeq === Seq(
        (3L, "update_postimage", 99.0), (3L, "update_preimage", 30.0),
        (4L, "insert", 40.0)))
      // exactly once: no duplicates across the whole run
      // (3 history inserts + 1 delete + 2 update images + 1 insert)
      assert(spark.table("gss_hist_sink").count() === 7L)
    } finally q.stop()
  }

  test("default start is 'latest': only future changes stream") {
    val t = freshTable("gss_latest")
    val q = startStream(t, "gss_latest_sink")
    try {
      q.processAllAvailable()
      assert(spark.table("gss_latest_sink").count() === 0L)
      CommitLog.commit(Seq((9L, "z", 90.0)).toDF("id", "typ", "value"), t, "append")
      q.processAllAvailable()
      val got = spark.table("gss_latest_sink")
        .select("id", CommitLog.ChangeTypeCol, CommitLog.CommitVersionCol)
        .as[(Long, String, Long)].collect()
      assert(got.toSeq === Seq((9L, "insert", 2L)))
    } finally q.stop()
  }

  test("checkpoint restart resumes at the committed version offset") {
    val t = freshTable("gss_ckpt")
    val ckpt = tmpDir("gss_ckpt_dir")
    val sink = tmpDir("gss_ckpt_sink")
    // memory sinks refuse checkpoint recovery — a real (parquet) sink
    // exercises the actual resume path
    def run() = spark.readStream.format("graft")
      .option("startingVersion", "earliest").load(t)
      .writeStream.format("parquet")
      .option("checkpointLocation", ckpt).option("path", sink)
      .outputMode("append").start()
    val q1 = run()
    try { q1.processAllAvailable() } finally q1.stop()
    assert(spark.read.parquet(sink).count() === 3L)
    // progress the table while no stream is running…
    CommitLog.deleteDv(spark, t, col("id") === 1L)
    // …the restarted stream serves ONLY the missed version
    val q2 = run()
    try {
      q2.processAllAvailable()
      val got = spark.read.parquet(sink)
        .filter(col(CommitLog.CommitVersionCol) === 2L)
        .select(col("id"), col(CommitLog.ChangeTypeCol))
        .as[(Long, String)].collect()
      assert(got.toSeq === Seq((1L, "delete")))
      assert(spark.read.parquet(sink).count() === 4L) // no replays
    } finally q2.stop()
  }

  test("default-latest restart does NOT skip versions committed while down") {
    val t = freshTable("gss_downtime")
    val ckpt = tmpDir("gss_downtime_ck")
    val sink = tmpDir("gss_downtime_sink")
    // default startingVersion (latest): the FIRST run anchors at v1
    def run() = spark.readStream.format("graft").load(t)
      .writeStream.format("parquet")
      .option("checkpointLocation", ckpt).option("path", sink)
      .outputMode("append").start()
    val q1 = run()
    try { q1.processAllAvailable() } finally q1.stop()
    // two versions land while no stream is running; a restarted source
    // recomputes 'latest' — which must NOT gate the checkpointed offset
    CommitLog.commit(Seq((7L, "g", 70.0)).toDF("id", "typ", "value"), t, "append")
    CommitLog.deleteDv(spark, t, col("id") === 3L)
    val q2 = run()
    try {
      q2.processAllAvailable()
      val got = spark.read.parquet(sink)
        .select(col("id"), col(CommitLog.ChangeTypeCol), col(CommitLog.CommitVersionCol))
        .as[(Long, String, Long)].collect().sorted
      assert(got.toSeq === Seq((3L, "delete", 3L), (7L, "insert", 2L)))
    } finally q2.stop()
  }

  test("maxVersionsPerTrigger bounds catch-up batch width") {
    val t = freshTable("gss_maxv")
    CommitLog.commit(Seq((4L, "d", 40.0)).toDF("id", "typ", "value"), t, "append")
    CommitLog.commit(Seq((5L, "e", 50.0)).toDF("id", "typ", "value"), t, "append")
    val dst = tmpDir("gss_maxv_dst"); new java.io.File(dst).delete()
    // sink commits once per micro-batch, so the dst version count IS the
    // batch count: 3 source versions at cap 1 → 3 sink commits
    val q = spark.readStream.format("graft")
      .option("startingVersion", "earliest")
      .option("maxVersionsPerTrigger", "1").load(t)
      .filter(col(CommitLog.ChangeTypeCol) === "insert")
      .select("id", "typ", "value")
      .writeStream.format("graft")
      .option("checkpointLocation", tmpDir("gss_maxv_ck"))
      .start(dst)
    try {
      q.processAllAvailable()
      assert(CommitLog.read(spark, dst).count() === 5L)
      assert(CommitLog.versions(dst).size === 3)
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains a capped stream COMPLETELY, in steps") {
    val t = freshTable("gss_avnow")
    CommitLog.commit(Seq((4L, "d", 40.0)).toDF("id", "typ", "value"), t, "append")
    CommitLog.commit(Seq((5L, "e", 50.0)).toDF("id", "typ", "value"), t, "append")
    val dst = tmpDir("gss_avnow_dst"); new java.io.File(dst).delete()
    // a bare v1 source under AvailableNow gets SINGLE-batch semantics and
    // a capped stream would stop after one step, silently incomplete —
    // SupportsTriggerAvailableNow makes the engine drain to the prepared
    // target in capped steps (3 versions at cap 1 → 3 sink commits)
    val q = spark.readStream.format("graft")
      .option("startingVersion", "earliest")
      .option("maxVersionsPerTrigger", "1").load(t)
      .filter(col(CommitLog.ChangeTypeCol) === "insert")
      .select("id", "typ", "value")
      .writeStream.format("graft")
      .option("checkpointLocation", tmpDir("gss_avnow_ck"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(dst)
    try {
      assert(q.awaitTermination(120000L), "AvailableNow query did not finish")
      assert(CommitLog.read(spark, dst).count() === 5L)
      assert(CommitLog.versions(dst).size === 3)
    } finally q.stop()
  }

  test("a tail across the manifest-checkpoint boundary, a compaction, and a " +
      "vacuum stays exactly-once (round-11 VERDICT item 6)") {
    val t = freshTable("gss_ckpt") // v1: 3 rows
    val q = startStream(t, "gss_ckpt_sink", Map("startingVersion" -> "earliest"))
    try {
      q.processAllAvailable()
      // cross the CheckpointEvery boundary: v2..v21 delta-encode against
      // their predecessors except v17, which is a full checkpoint
      (1 to 20).foreach { i =>
        CommitLog.commit(
          Seq((100L + i, "z", i.toDouble)).toDF("id", "typ", "value"),
          t, "append", autoCompactEvery = 0)
      }
      q.processAllAvailable()
      assert(spark.table("gss_ckpt_sink").count() === 23L) // 3 + 20 inserts
      // a compaction rewrite mid-tail: the feed must SKIP it (no rows),
      // whatever encoding its manifest chose
      CommitLog.compact(spark, t)
      q.processAllAvailable()
      assert(spark.table("gss_ckpt_sink").count() === 23L)
      // vacuum consumed history: drops the delta chain below the kept
      // window and promotes the oldest survivor to a checkpoint in place —
      // the live tail, already past it, must not notice
      CommitLog.vacuum(t, keepVersions = 2, minAgeMillis = 0, force = true,
        dropLaggingReaders = true)
      CommitLog.commit(Seq((999L, "w", 9.0)).toDF("id", "typ", "value"),
        t, "append")
      q.processAllAvailable()
      val ids = spark.table("gss_ckpt_sink").select("id").as[Long].collect()
      assert(ids.length === 24 && ids.distinct.length === 24,
        s"duplicate or lost changes: ${ids.sorted.toSeq}")
      assert(ids.contains(999L))
    } finally q.stop()
  }

  test("a numeric startingVersion tails from that version (exclusive)") {
    val t = freshTable("gss_numstart")
    CommitLog.commit(Seq((4L, "d", 40.0)).toDF("id", "typ", "value"), t, "append")
    CommitLog.commit(Seq((5L, "e", 50.0)).toDF("id", "typ", "value"), t, "append")
    val q = startStream(t, "gss_numstart_sink", Map("startingVersion" -> "1"))
    try {
      q.processAllAvailable()
      val got = spark.table("gss_numstart_sink")
        .select("id", CommitLog.CommitVersionCol).as[(Long, Long)].collect().sorted
      assert(got.toSeq === Seq((4L, 2L), (5L, 3L)))
    } finally q.stop()
  }
}
