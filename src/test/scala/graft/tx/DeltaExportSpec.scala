package graft.tx

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** `_delta_log` export (round-11 VERDICT item 2): the spec plays the role
  * of a FOREIGN Delta reader — it re-reads the exported log with an
  * independent parser (Spark's JSON reader, not graft's manifest code),
  * proves file-set + schema equality with the graft snapshot, and
  * reconstructs the table the way `delta_scan`/`read_delta` would: scan
  * exactly the `add` paths, rebuild partition columns from
  * `partitionValues`. */
class DeltaExportSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("graft_dexp").resolve("t").toString

  private def logFile(t: String): String =
    Paths.get(t).resolve("_delta_log").resolve(f"${0L}%020d.json").toString

  test("exported log names exactly the snapshot's files, schema, and partition values") {
    val t = freshTable()
    CommitLog.commit(
      Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "a", 3.5), (4L, null, 4.5))
        .toDF("id", "k", "v"),
      t, "append", partitionBy = Seq("k"))
    CommitLog.commit(Seq((5L, "c", 5.5)).toDF("id", "k", "v"), t, "append")
    val exported = DeltaExport.writeDeltaLog(t)
    assert(exported === CommitLog.latestVersion(t).get)

    // independent parse: Spark's JSON reader over the action lines
    val actions = spark.read.json(logFile(t))
    assert(actions.filter(col("protocol").isNotNull).count() === 1L)
    val meta = actions.filter(col("metaData").isNotNull).select("metaData.*")
    assert(meta.count() === 1L)
    val m = CommitLog.manifest(t, exported)
    // schemaString round-trips to the exact snapshot schema
    val schemaStr = meta.select("schemaString").as[String].head()
    assert(DataType.fromJson(schemaStr).asInstanceOf[StructType] === m.schema)
    assert(meta.select("partitionColumns").as[Seq[String]].head() === Seq("k"))

    // add actions name EXACTLY the manifest's files (relative paths)
    val adds = actions.filter(col("add").isNotNull).select("add.*")
    // add.path is protocol-encoded: a conforming reader DECODES it back
    // onto the on-disk (hive-escaped) relative paths
    assert(adds.select("path").as[String].collect()
      .map(DeltaPaths.decode).toSet === m.files.toSet)
    assert(adds.filter(col("size") <= 0L).count() === 0L)

    // foreign-reader reconstruction: scan each add path, rebuild the
    // partition column from partitionValues (null for
    // __HIVE_DEFAULT_PARTITION__), union — must equal the graft snapshot
    val rebuilt = adds.select("path", "partitionValues.k").as[(String, String)]
      .collect().toSeq.map { case (path, kVal) =>
        spark.read.parquet(s"$t/${DeltaPaths.decode(path)}")
          .withColumn("k", lit(kVal).cast("string"))
          .select("id", "k", "v")
      }.reduce(_ unionByName _)
    val expect = CommitLog.read(spark, t).select("id", "k", "v")
      .as[(Long, String, Double)].collect().toSeq.sortBy(_._1)
    assert(rebuilt.as[(Long, String, Double)].collect().toSeq.sortBy(_._1)
      === expect)
    assert(expect.find(_._1 == 4L).get._2 === null) // default-partition row
  }

  test("exported adds carry per-file stats a foreign reader can skip with") {
    val t = freshTable()
    CommitLog.commit(
      Seq((1L, 1.5, "alpha", Some(10L)), (2L, 2.5, "bravo", None),
        (3L, -3.5, "charlie", Some(30L)))
        .toDF("id", "v", "name", "opt").coalesce(1),
      t, "append")
    CommitLog.commit(Seq((9L, 9.5, "zulu", Some(90L)))
      .toDF("id", "v", "name", "opt").coalesce(1), t, "append")
    DeltaExport.writeDeltaLog(t)
    val adds = spark.read.json(logFile(t))
      .filter(col("add").isNotNull).select("add.path", "add.stats")
      .as[(String, String)].collect().toMap
    assert(adds.size === 2)
    adds.values.foreach(s => assert(s != null, "every add must carry stats"))
    val parsed = adds.map { case (p, s) =>
      DeltaPaths.decode(p) -> new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(s)
    }
    // numRecords per file is exact, so a count-only foreign scan reads
    // zero data
    assert(parsed.values.map(_.path("numRecords").asLong()).toSeq.sorted
      === Seq(1L, 3L))
    val big = parsed.values.find(_.path("numRecords").asLong() == 3L).get
    assert(big.path("minValues").path("id").asLong() === 1L)
    assert(big.path("maxValues").path("id").asLong() === 3L)
    assert(big.path("minValues").path("v").asDouble() === -3.5)
    assert(big.path("maxValues").path("v").asDouble() === 2.5)
    // engine-written strings are proven untruncated → exported exactly
    assert(big.path("minValues").path("name").asText() === "alpha")
    assert(big.path("maxValues").path("name").asText() === "charlie")
    assert(big.path("nullCount").path("opt").asLong() === 1L)
    assert(big.path("nullCount").path("id").asLong() === 0L)
    // the skipping contract a foreign reader derives: only the small
    // file's [min,max] admits id = 9
    val smallOnly = parsed.filter { case (_, n) =>
      n.path("minValues").path("id").asLong() <= 9L &&
        n.path("maxValues").path("id").asLong() >= 9L
    }
    assert(smallOnly.size === 1)
    val skipped = spark.read.parquet(s"$t/${smallOnly.keys.head}")
      .select("id").as[Long].collect().toSeq
    assert(skipped === Seq(9L))
  }

  test("re-export appends an O(diff) Delta commit; full replay equals the snapshot") {
    val t = freshTable()
    CommitLog.commit(Seq((1L, 1.0)).toDF("id", "v"), t, "append")
    DeltaExport.writeDeltaLog(t)
    CommitLog.commit(Seq((2L, 2.0)).toDF("id", "v"), t, "append")
    // a compaction rewrites the file set — the re-export diff must carry
    // removes too, not just adds
    CommitLog.compact(spark, t)
    val v = DeltaExport.writeDeltaLog(t)
    assert(v === CommitLog.latestVersion(t).get)
    val logDir = Paths.get(t).resolve("_delta_log")
    // the incremental export wrote version 1, it did NOT rewrite version 0
    assert(Files.isRegularFile(logDir.resolve(f"${1L}%020d.json")))
    val v1 = spark.read.json(logDir.resolve(f"${1L}%020d.json").toString)
    assert(v1.filter(col("remove").isNotNull).count() >= 1L)
    // foreign replay across BOTH versions: adds minus removes == snapshot
    val all = spark.read.json(logDir.resolve("*.json").toString)
    val adds = all.filter(col("add").isNotNull).select("add.path").as[String]
      .collect().toSet
    val removes = all.filter(col("remove").isNotNull).select("remove.path")
      .as[String].collect().toSet
    assert((adds -- removes) === CommitLog.manifest(t, v).files.toSet)
    val marker = new String(Files.readAllBytes(
      logDir.resolve("_graft_export")), "UTF-8")
    assert(marker.contains(s"graft_version=$v") && marker.contains("delta_version=1"))
    // idempotent: re-exporting the same version writes nothing new
    DeltaExport.writeDeltaLog(t)
    assert(!Files.exists(logDir.resolve(f"${2L}%020d.json")))
    // and graft's own reader is undisturbed by the foreign log dir
    assert(CommitLog.read(spark, t).count() === 2L)
  }

  test("FORCE over a clean prior rebuilds a fresh v0-only log, never an " +
      "incremental append") {
    val t = freshTable()
    CommitLog.commit(Seq((1L, 1.0)).toDF("id", "v"), t, "append")
    DeltaExport.writeDeltaLog(t)
    CommitLog.commit(Seq((2L, 2.0)).toDF("id", "v"), t, "append")
    DeltaExport.writeDeltaLog(t) // incremental → delta v1
    val logDir = Paths.get(t).resolve("_delta_log")
    assert(Files.isRegularFile(logDir.resolve(f"${1L}%020d.json")))
    // FORCE with NO foreign commits (the clean-prior case): the contract
    // is a full rebuild — before the fix this silently fell through to an
    // incremental append at v2, leaving the caller's fresh baseline unmet
    CommitLog.commit(Seq((3L, 3.0)).toDF("id", "v"), t, "append")
    DeltaExport.writeDeltaLog(t, force = true)
    assert(Files.isRegularFile(logDir.resolve(f"${0L}%020d.json")))
    assert(!Files.exists(logDir.resolve(f"${1L}%020d.json")),
      "FORCE must sweep the stale incremental chain")
    assert(!Files.exists(logDir.resolve(f"${2L}%020d.json")))
    val marker = new String(Files.readAllBytes(
      logDir.resolve("_graft_export")), "UTF-8")
    assert(marker.contains("delta_version=0"))
    // the fresh v0 names exactly the latest snapshot
    val adds = spark.read.json(logDir.resolve(f"${0L}%020d.json").toString)
      .filter(col("add").isNotNull).select("add.path").as[String].collect().toSet
    assert(adds === CommitLog.manifest(t, CommitLog.latestVersion(t).get)
      .files.toSet)
    // and the incremental chain restarts cleanly on top of the rebuild
    CommitLog.commit(Seq((4L, 4.0)).toDF("id", "v"), t, "append")
    DeltaExport.writeDeltaLog(t)
    assert(Files.isRegularFile(logDir.resolve(f"${1L}%020d.json")))
  }

  test("an incrementally exported multi-version log re-imports exactly") {
    val src = freshTable()
    CommitLog.commit(Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v"), src, "append")
    DeltaExport.writeDeltaLog(src)
    CommitLog.commit(Seq((3L, 3.0)).toDF("id", "v"), src, "append")
    CommitLog.delete(spark, src, col("id") === 2L) // copy-on-write rewrite
    val v = DeltaExport.writeDeltaLog(src)
    // foreign-style copy: live files + the whole multi-version log
    val dst = Files.createTempDirectory("graft_dexp_inc").resolve("t")
    val srcDir = Paths.get(src)
    CommitLog.manifest(src, v).files.foreach { rel =>
      val d = dst.resolve(rel)
      Files.createDirectories(d.getParent)
      Files.copy(srcDir.resolve(rel), d)
    }
    Files.createDirectories(dst.resolve("_delta_log"))
    Seq(f"${0L}%020d.json", f"${1L}%020d.json").foreach { n =>
      Files.copy(srcDir.resolve("_delta_log").resolve(n),
        dst.resolve("_delta_log").resolve(n))
    }
    CommitLog.convert(spark, dst.toString)
    assert(CommitLog.read(spark, dst.toString).select("id").as[Long]
      .collect().sorted === Seq(1L, 3L))
  }

  test("the 10th incremental export writes a parquet checkpoint a foreign " +
      "reader (and our import) can load without the early JSON commits") {
    val src = freshTable()
    CommitLog.commit(Seq((0L, 0.0)).toDF("id", "v"), src, "append")
    DeltaExport.writeDeltaLog(src) // delta version 0
    (1 to DeltaExport.CheckpointInterval).foreach { i =>
      CommitLog.commit(Seq((i.toLong, i * 1.0)).toDF("id", "v"), src, "append")
      DeltaExport.writeDeltaLog(src) // delta versions 1..10
    }
    val logDir = Paths.get(src).resolve("_delta_log")
    val ckpt = logDir.resolve(
      f"${DeltaExport.CheckpointInterval.toLong}%020d.checkpoint.parquet")
    assert(Files.isRegularFile(ckpt), "10th export must checkpoint")
    assert(new String(Files.readAllBytes(logDir.resolve("_last_checkpoint")),
      "UTF-8").contains("\"version\":10"))
    // the checkpoint parquet carries MAP-typed partitionValues and the
    // full snapshot's adds
    val ck = spark.read.parquet(ckpt.toString)
    assert(ck.schema("add").dataType.asInstanceOf[
      org.apache.spark.sql.types.StructType]("partitionValues").dataType
      .isInstanceOf[org.apache.spark.sql.types.MapType])
    assert(ck.filter(col("add").isNotNull).count()
      === CommitLog.manifest(src, CommitLog.latestVersion(src).get).files.size.toLong)
    // foreign-style copy WITHOUT the pre-checkpoint JSON commits: the
    // import must reconstruct from checkpoint alone (a Delta reader's
    // cold load does exactly this after log cleanup)
    val dst = Files.createTempDirectory("graft_dexp_ck").resolve("t")
    val srcDir = Paths.get(src)
    val latest = CommitLog.latestVersion(src).get
    CommitLog.manifest(src, latest).files.foreach { rel =>
      val d = dst.resolve(rel)
      Files.createDirectories(d.getParent)
      Files.copy(srcDir.resolve(rel), d)
    }
    Files.createDirectories(dst.resolve("_delta_log"))
    Files.copy(ckpt, dst.resolve("_delta_log")
      .resolve(f"${10L}%020d.checkpoint.parquet"))
    Files.copy(logDir.resolve("_last_checkpoint"),
      dst.resolve("_delta_log").resolve("_last_checkpoint"))
    CommitLog.convert(spark, dst.toString)
    assert(CommitLog.read(spark, dst.toString).select("id").as[Long]
      .collect().sorted === (0L to 10L).toArray)
  }

  test("hive-escaped partition values survive export → foreign replay; " +
      "the codec is UTF-8-correct") {
    // unit level first: multi-byte runes decode byte-wise (delta-rs
    // encodes 'city=Zürich' as 'city=Z%C3%BCrich'; a char-wise decoder
    // yields mojibake 'ZÃ¼rich' and a spurious missing-file refusal) —
    // unit-only because this container's non-UTF8 filesystem locale
    // cannot CREATE non-ASCII file names to drive it end-to-end
    assert(DeltaPaths.decode("city=Z%C3%BCrich/part-0.parquet")
      === "city=Zürich/part-0.parquet")
    assert(DeltaPaths.decode(DeltaPaths.encode("k=a%3Db/p 1.parquet"))
      === "k=a%3Db/p 1.parquet")
    val t = freshTable()
    // 'a=b' hive-escapes to a%3Db on disk and 'a b' keeps a raw space —
    // the shapes that break a raw-path export (a conforming reader
    // percent-DECODES add.path, and a raw space breaks URI parsing)
    CommitLog.commit(
      Seq((1L, "a=b", 1.0), (2L, "a b", 2.0), (3L, "plain", 3.0))
        .toDF("id", "k", "v"),
      t, "append", partitionBy = Seq("k"))
    DeltaExport.writeDeltaLog(t)
    val adds = spark.read.json(logFile(t))
      .filter(col("add").isNotNull).select("add.path").as[String].collect().toSeq
    // protocol-encoded: the on-disk '%' of the hive escape must arrive
    // as %25, never verbatim
    assert(adds.exists(_.contains("%253D")), s"hive '%' not re-encoded: $adds")
    // a conforming reader's decode must land exactly on the on-disk files
    adds.foreach { p =>
      assert(Files.isRegularFile(Paths.get(t).resolve(DeltaPaths.decode(p))),
        s"decoded add.path does not resolve on disk: $p")
    }
    // and the full import roundtrip preserves the values byte-for-byte
    val dst = Files.createTempDirectory("graft_dexp_esc").resolve("t")
    val srcDir = Paths.get(t)
    CommitLog.manifest(t, 1L).files.foreach { rel =>
      val d = dst.resolve(rel)
      Files.createDirectories(d.getParent)
      Files.copy(srcDir.resolve(rel), d)
    }
    Files.createDirectories(dst.resolve("_delta_log"))
    Files.copy(srcDir.resolve("_delta_log").resolve(f"${0L}%020d.json"),
      dst.resolve("_delta_log").resolve(f"${0L}%020d.json"))
    CommitLog.convert(spark, dst.toString)
    assert(CommitLog.read(spark, dst.toString).select("id", "k")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
      === Seq((1L, "a=b"), (2L, "a b"), (3L, "plain")))
  }

  test("a DV-carrying snapshot exports by folding deletions into a COW " +
      "side dir (round-12 VERDICT item 5); column mapping composes") {
    val t = freshTable()
    // two files so the fold is provably SCOPED: only the death-carrying
    // file is rewritten, the clean one is shared as-is
    CommitLog.commit((1 to 20).map(i => (i.toLong, i * 1.0)).toDF("id", "v"),
      t, "append")
    CommitLog.commit((21 to 30).map(i => (i.toLong, i * 1.0)).toDF("id", "v"),
      t, "append")
    CommitLog.deleteDv(spark, t, col("id") <= 5L)
    val v = DeltaExport.writeDeltaLog(t)
    assert(v === CommitLog.latestVersion(t).get)
    // independent parse: death-carrying file replaced by a COW rewrite,
    // clean file shared under its original data/ path
    val adds = spark.read.json(logFile(t))
      .filter(col("add").isNotNull).select("add.path").as[String]
      .collect().toSeq.map(DeltaPaths.decode)
    assert(adds.exists(_.startsWith("_graft_export_cow/")),
      s"no COW add action in $adds")
    assert(adds.exists(_.startsWith("data/")),
      s"clean file not shared as-is in $adds")
    adds.foreach { p =>
      assert(Files.isRegularFile(Paths.get(t).resolve(p)),
        s"add.path does not resolve on disk: $p")
    }
    // foreign reconstruction hash-matches the graft snapshot — dead rows
    // do NOT resurrect
    val rebuilt = adds.map(p => spark.read.parquet(s"$t/$p"))
      .reduce(_ unionByName _)
    assert(rebuilt.select("id").as[Long].collect().sorted
      === CommitLog.read(spark, t).select("id").as[Long].collect().sorted)
    assert(rebuilt.select("id").as[Long].collect().sorted === (6L to 30L).toArray)
    // column mapping + DV COMPOSE: the rename exports natively (name
    // mode), and the COW rewrites store PHYSICAL names like every other
    // file the mapped log describes
    CommitLog.renameColumn(t, "v", "val")
    val vMapped = DeltaExport.writeDeltaLog(t)
    assert(vMapped === CommitLog.latestVersion(t).get)
    val actions3 = spark.read.json(logFile(t))
    assert(actions3.filter(col("metaData").isNotNull)
      .select("metaData.configuration.`delta.columnMapping.mode`")
      .as[String].head() === "name")
    val adds3 = actions3.filter(col("add").isNotNull).select("add.path")
      .as[String].collect().toSeq.map(DeltaPaths.decode)
    assert(adds3.exists(_.startsWith("_graft_export_cow/")))
    adds3.foreach { p =>
      assert(spark.read.parquet(s"$t/$p").columns.toSeq === Seq("id", "v"),
        s"exported file $p must store the PHYSICAL column name")
    }
    val rebuilt3 = adds3.map(p => spark.read.parquet(s"$t/$p"))
      .reduce(_ unionByName _)
      .select(col("id"), col("v").as("val")) // the mapping reader's move
    assert(rebuilt3.select("id").as[Long].collect().sorted === (6L to 30L).toArray)
    CommitLog.compact(spark, t) // rewrites under logical names, clears map
    val v2 = DeltaExport.writeDeltaLog(t)
    assert(v2 === CommitLog.latestVersion(t).get)
    // the full re-export reclaimed the superseded COW snapshot (compact
    // folded the DVs, so the fresh export needs none)
    assert(!Files.exists(Paths.get(t).resolve("_graft_export_cow")),
      "stale COW dir not reclaimed by the full re-export")
    val adds2 = spark.read.json(logFile(t))
      .filter(col("add").isNotNull).select("add.path").as[String].collect()
    val rebuilt2 = adds2.toSeq.map(p => spark.read.parquet(s"$t/$p"))
      .reduce(_ unionByName _)
    assert(rebuilt2.select("id").as[Long].collect().sorted === (6L to 30L).toArray)
  }

  test("vacuum refreshes the exported log first — a foreign reader of the " +
      "latest Delta view never sees a missing file (round-12 VERDICT item 1)") {
    val t = freshTable()
    CommitLog.commit(Seq((1L, 1.0)).toDF("id", "v"), t, "append")
    DeltaExport.writeDeltaLog(t) // exports graft v1
    CommitLog.commit(Seq((2L, 2.0)).toDF("id", "v"), t, "append")
    CommitLog.compact(spark, t) // rewrites the file set: v1's files become unreferenced
    val latest = CommitLog.latestVersion(t).get
    CommitLog.vacuum(t, keepVersions = 1, minAgeMillis = 0L, force = true)
    val logDir = Paths.get(t).resolve("_delta_log")
    // the marker moved to the surviving version BEFORE anything fell
    assert(new String(Files.readAllBytes(logDir.resolve("_graft_export")),
      "UTF-8").contains(s"graft_version=$latest"))
    // independent replay of the WHOLE foreign log: the latest view's
    // files (adds minus removes) must all resolve on disk post-vacuum
    val all = spark.read.json(logDir.resolve("*.json").toString)
    val adds = all.filter(col("add").isNotNull).select("add.path").as[String]
      .collect().toSet
    val removes = all.filter(col("remove").isNotNull).select("remove.path")
      .as[String].collect().toSet
    val live = (adds -- removes).map(DeltaPaths.decode)
    assert(live.nonEmpty)
    live.foreach { p =>
      assert(Files.isRegularFile(Paths.get(t).resolve(p)),
        s"vacuum deleted a file the exported log still lists: $p")
    }
    val rebuilt = live.toSeq.map(p => spark.read.parquet(s"$t/$p"))
      .reduce(_ unionByName _)
    assert(rebuilt.select("id").as[Long].collect().sorted === Seq(1L, 2L))
    // and tx roundtrip health: graft's own reader is untouched
    assert(CommitLog.read(spark, t).count() === 2L)
  }

  test("vacuum × DV export compose: refreshing a COW-bearing export " +
      "re-folds against the latest snapshot and the foreign view survives " +
      "the sweep") {
    val t = freshTable()
    CommitLog.commit((1 to 20).map(i => (i.toLong, i * 1.0)).toDF("id", "v"),
      t, "append")
    CommitLog.deleteDv(spark, t, col("id") <= 5L)
    DeltaExport.writeDeltaLog(t) // COW export of the DV snapshot
    CommitLog.commit((21 to 25).map(i => (i.toLong, i * 1.0)).toDF("id", "v"),
      t, "append")
    CommitLog.compact(spark, t) // folds DVs, rewrites the file set
    CommitLog.vacuum(t, keepVersions = 1, minAgeMillis = 0L, force = true)
    // the refresh was a FULL re-export (prior was COW), against the
    // folded snapshot: no COW needed anymore, old COW dir reclaimed
    assert(!Files.exists(Paths.get(t).resolve("_graft_export_cow")))
    val adds = spark.read.json(logFile(t))
      .filter(col("add").isNotNull).select("add.path").as[String]
      .collect().toSeq.map(DeltaPaths.decode)
    adds.foreach { p =>
      assert(Files.isRegularFile(Paths.get(t).resolve(p)),
        s"vacuum deleted a file the refreshed export lists: $p")
    }
    val rebuilt = adds.map(p => spark.read.parquet(s"$t/$p"))
      .reduce(_ unionByName _)
    assert(rebuilt.select("id").as[Long].collect().sorted === (6L to 25L).toArray)
  }

  test("a COLUMN-MAPPED snapshot exports as a name-mode Delta log: a " +
      "foreign reader serves logical names over physical files " +
      "(round-13 VERDICT item 1)") {
    val t = freshTable()
    CommitLog.commit(Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v"), t, "append")
    CommitLog.renameColumn(t, "v", "value") // schema-only: files store `v`
    val exported = DeltaExport.writeDeltaLog(t)
    assert(exported === CommitLog.latestVersion(t).get)

    // independent parse: protocol rose to the legacy mapping protocol,
    // metaData declares name mode, and the schema's field metadata maps
    // logical `value` to physical `v`
    val actions = spark.read.json(logFile(t))
    val proto = actions.filter(col("protocol").isNotNull)
      .select("protocol.minReaderVersion", "protocol.minWriterVersion")
      .as[(Long, Long)].head()
    assert(proto === ((2L, 5L)))
    val meta = actions.filter(col("metaData").isNotNull).select("metaData.*")
    val conf = meta.select("configuration.`delta.columnMapping.mode`")
      .as[String].head()
    assert(conf === "name")
    val schemaStr = meta.select("schemaString").as[String].head()
    val parsed = DataType.fromJson(schemaStr).asInstanceOf[StructType]
    assert(parsed.fieldNames.toSeq === Seq("id", "value"))
    val valueField = parsed.fields.find(_.name == "value").get
    assert(valueField.metadata.getString(
      "delta.columnMapping.physicalName") === "v")
    assert(parsed.fields.find(_.name == "id").get.metadata.getString(
      "delta.columnMapping.physicalName") === "id")

    // foreign-reader reconstruction: scan the add paths (physical
    // columns), serve them under the mapped logical names
    val adds = actions.filter(col("add").isNotNull).select("add.path")
      .as[String].collect().map(DeltaPaths.decode)
    assert(adds.toSet === CommitLog.manifest(t, exported).files.toSet)
    val rebuilt = adds.toSeq.map(p => spark.read.parquet(s"$t/$p"))
      .reduce(_ unionByName _)
      .select(col("id"), col("v").as("value")) // what a mapping reader does
    assert(rebuilt.as[(Long, Double)].collect().sorted
      === Seq((1L, 1.0), (2L, 2.0)))

    // VACUUM on the renamed+exported table succeeds — the export-refresh
    // guard no longer turns a rename into an O(table) OPTIMIZE
    CommitLog.commit(Seq((3L, 3.0)).toDF("id", "value"), t, "append")
    CommitLog.vacuum(t, keepVersions = 1, minAgeMillis = 0L, force = true)
    val liveAdds = {
      val all = spark.read.json(
        Paths.get(t).resolve("_delta_log").resolve("*.json").toString)
      val a = all.filter(col("add").isNotNull).select("add.path").as[String]
        .collect().toSet
      val r = if (!all.columns.contains("remove")) Set.empty[String]
        else all.filter(col("remove").isNotNull).select("remove.path")
          .as[String].collect().toSet
      (a -- r).map(DeltaPaths.decode)
    }
    liveAdds.foreach(p => assert(Files.isRegularFile(Paths.get(t).resolve(p)),
      s"vacuum deleted a file the mapped exported log still lists: $p"))
    assert(CommitLog.read(spark, t).count() === 3L)

    // ROUNDTRIP: a foreign-style copy of the exported mapped table
    // re-imports through our own name-mode import, logical names intact
    val dst = Files.createTempDirectory("graft_dexp_cm").resolve("t")
    val srcDir = Paths.get(t)
    val latestM = CommitLog.manifest(t, CommitLog.latestVersion(t).get)
    latestM.files.foreach { rel =>
      val d = dst.resolve(rel)
      Files.createDirectories(d.getParent)
      Files.copy(srcDir.resolve(rel), d)
    }
    Files.createDirectories(dst.resolve("_delta_log"))
    import scala.jdk.CollectionConverters._
    val st = Files.list(srcDir.resolve("_delta_log"))
    try st.iterator().asScala
      .filter(_.getFileName.toString.endsWith(".json"))
      .foreach(p => Files.copy(p,
        dst.resolve("_delta_log").resolve(p.getFileName.toString)))
    finally st.close()
    CommitLog.convert(spark, dst.toString)
    val back = CommitLog.read(spark, dst.toString)
    assert(back.schema.fieldNames.toSeq === Seq("id", "value"))
    assert(back.select("id", "value").as[(Long, Double)].collect().sorted
      === Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)))
  }

  test("export chain stays consistent across rename → incremental → " +
      "OPTIMIZE → incremental (protocol rises once, identity mapping after)") {
    val t = freshTable()
    CommitLog.commit(Seq((1L, 1.0)).toDF("id", "v"), t, "append")
    DeltaExport.writeDeltaLog(t) // delta v0: clean, reader v1
    CommitLog.renameColumn(t, "v", "value")
    CommitLog.commit(Seq((2L, 2.0)).toDF("id", "value"), t, "append")
    DeltaExport.writeDeltaLog(t) // delta v1: the mapping appears here
    val logDir = Paths.get(t).resolve("_delta_log")
    val v1 = new String(Files.readAllBytes(
      logDir.resolve(f"${1L}%020d.json")), "UTF-8")
    assert(v1.contains(""""minReaderVersion":2"""),
      "the protocol must RISE in the same commit the mapping first appears")
    assert(v1.contains("delta.columnMapping.mode"))
    // OPTIMIZE clears the map and rewrites files under logical names;
    // the next incremental export re-emits IDENTITY name-mode metadata
    // (protocol never downgrades mid-chain)
    CommitLog.compact(spark, t)
    DeltaExport.writeDeltaLog(t) // delta v2
    val v2 = new String(Files.readAllBytes(
      logDir.resolve(f"${2L}%020d.json")), "UTF-8")
    assert(!v2.contains(""""minReaderVersion":1"""))
    assert(v2.contains("delta.columnMapping.mode"))
    // the physicalName rides ESCAPED inside schemaString's JSON string
    assert(v2.contains("delta.columnMapping.physicalName\\\":\\\"value"))
    // full replay serves the final logical schema and all rows
    val all = spark.read.json(logDir.resolve("*.json").toString)
    val adds = all.filter(col("add").isNotNull).select("add.path").as[String]
      .collect().toSet
    val removes = all.filter(col("remove").isNotNull).select("remove.path")
      .as[String].collect().toSet
    val live = (adds -- removes).map(DeltaPaths.decode)
    val rebuilt = live.toSeq.map(p => spark.read.parquet(s"$t/$p"))
      .reduce(_ unionByName _)
    assert(rebuilt.columns.toSeq === Seq("id", "value")) // post-OPTIMIZE: logical
    assert(rebuilt.as[(Long, Double)].collect().sorted
      === Seq((1L, 1.0), (2L, 2.0)))
  }

  test("re-export refuses when the exported log gained foreign Delta " +
      "commits; FORCE deliberately discards them (round-12 ADVICE, medium)") {
    val t = freshTable()
    CommitLog.commit(Seq((1L, 1.0)).toDF("id", "v"), t, "append")
    DeltaExport.writeDeltaLog(t) // delta version 0
    val logDir = Paths.get(t).resolve("_delta_log")
    // a foreign Delta writer appends version 1 (the exported log IS a
    // valid writable Delta table)
    Files.write(logDir.resolve(f"${1L}%020d.json"),
      """{"commitInfo":{"operation":"FOREIGN WRITE"}}""".getBytes("UTF-8"))
    CommitLog.commit(Seq((2L, 2.0)).toDF("id", "v"), t, "append")
    val e = intercept[IllegalArgumentException](DeltaExport.writeDeltaLog(t))
    assert(e.getMessage.contains("foreign"))
    // the foreign commit survived the refusal
    assert(Files.isRegularFile(logDir.resolve(f"${1L}%020d.json")))
    // FORCE: full re-export, foreign commit deliberately discarded
    val v = DeltaExport.writeDeltaLog(t, force = true)
    assert(v === CommitLog.latestVersion(t).get)
    val adds = spark.read.json(logFile(t))
      .filter(col("add").isNotNull).select("add.path").as[String].collect()
    assert(adds.map(DeltaPaths.decode).toSet === CommitLog.manifest(t, v).files.toSet)
    assert(!Files.exists(logDir.resolve(f"${1L}%020d.json")))
    // and a _delta_log we NEVER wrote (no marker) refuses outright
    val t2 = freshTable()
    CommitLog.commit(Seq((1L, 1.0)).toDF("id", "v"), t2, "append")
    val logDir2 = Paths.get(t2).resolve("_delta_log")
    Files.createDirectories(logDir2)
    Files.write(logDir2.resolve(f"${0L}%020d.json"),
      """{"commitInfo":{"operation":"SOMEONE ELSES TABLE"}}""".getBytes("UTF-8"))
    val e2 = intercept[IllegalArgumentException](DeltaExport.writeDeltaLog(t2))
    assert(e2.getMessage.contains("did not write"))
  }

  test("the foreign guard sees CHECKPOINT-only logs, FORCE sweeps every " +
      "checkpoint form, and our own crashed commit self-heals via full " +
      "re-export instead of a false foreign diagnosis") {
    // (a) a foreign log readable via checkpoint ALONE (JSON commits
    // metadata-cleaned) must refuse — a *.json-only scan would miss it
    val t = freshTable()
    CommitLog.commit(Seq((1L, 1.0)).toDF("id", "v"), t, "append")
    val logDir = Paths.get(t).resolve("_delta_log")
    Files.createDirectories(logDir)
    Files.write(logDir.resolve(f"${7L}%020d.checkpoint.parquet"), Array[Byte]())
    Files.write(logDir.resolve("_last_checkpoint"),
      """{"version":7,"size":3}""".getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException](DeltaExport.writeDeltaLog(t))
    assert(e.getMessage.contains("did not write"))
    // (b) FORCE replaces it — and the sweep must also remove MULTI-PART
    // and v2 UUID checkpoint files, or a Delta reader would reconstruct
    // the discarded snapshot from a checkpoint above the fresh v0
    Files.write(logDir.resolve(
      f"${9L}%020d.checkpoint.0000000001.0000000002.parquet"), Array[Byte]())
    Files.write(logDir.resolve(
      f"${9L}%020d.checkpoint.3a0f5b0e-9c7d-4b6a-8f21-0123456789ab.parquet"),
      Array[Byte]())
    DeltaExport.writeDeltaLog(t, force = true)
    val leftovers = {
      val st = Files.list(logDir)
      try {
        import scala.jdk.CollectionConverters._
        st.iterator().asScala.map(_.getFileName.toString)
          .filter(_.contains(".checkpoint.")).toList
      } finally st.close()
    }
    assert(leftovers.isEmpty, s"stale checkpoints survived FORCE: $leftovers")
    assert(!Files.exists(logDir.resolve("_last_checkpoint")))
    // (c) crash window: an export that wrote its Delta commit but died
    // before the marker update must NOT lock later exports behind a
    // "foreign writer" refusal — the stamped commit is provably ours,
    // and the next export self-heals with a full re-export
    CommitLog.commit(Seq((2L, 2.0)).toDF("id", "v"), t, "append")
    Files.write(logDir.resolve(f"${1L}%020d.json"),
      ("""{"commitInfo":{"operation":"GRAFT EXPORT"}}""" + "\n")
        .getBytes("UTF-8")) // simulated crashed own commit beyond marker
    val v = DeltaExport.writeDeltaLog(t) // NO force needed
    assert(v === CommitLog.latestVersion(t).get)
    // full re-export: single fresh v0, the orphaned v1 swept
    assert(!Files.exists(logDir.resolve(f"${1L}%020d.json")))
    val adds = spark.read.json(logFile(t))
      .filter(col("add").isNotNull).select("add.path").as[String].collect()
    assert(adds.map(DeltaPaths.decode).toSet
      === CommitLog.manifest(t, v).files.toSet)
  }

  test("a large FULL export checkpoints immediately: a foreign cold load " +
      "(and our import) reads one parquet, not an O(table) JSON parse") {
    val t = freshTable()
    spark.conf.set("spark.graft.export.checkpointAt", "2")
    try {
      CommitLog.commit(Seq((1L, 1.0)).toDF("id", "v"), t, "append")
      CommitLog.commit(Seq((2L, 2.0)).toDF("id", "v"), t, "append")
      CommitLog.commit(Seq((3L, 3.0)).toDF("id", "v"), t, "append")
      DeltaExport.writeDeltaLog(t)
      val logDir = Paths.get(t).resolve("_delta_log")
      val ckpt = logDir.resolve(f"${0L}%020d.checkpoint.parquet")
      assert(Files.isRegularFile(ckpt), "full export above threshold must checkpoint")
      assert(new String(Files.readAllBytes(logDir.resolve("_last_checkpoint")),
        "UTF-8").contains("\"version\":0"))
      // a foreign-style copy with ONLY the checkpoint (no JSON) imports
      val dst = Files.createTempDirectory("graft_dexp_fullck").resolve("t")
      val srcDir = Paths.get(t)
      CommitLog.manifest(t, 3L).files.foreach { rel =>
        val d = dst.resolve(rel)
        Files.createDirectories(d.getParent)
        Files.copy(srcDir.resolve(rel), d)
      }
      Files.createDirectories(dst.resolve("_delta_log"))
      Files.copy(ckpt, dst.resolve("_delta_log")
        .resolve(f"${0L}%020d.checkpoint.parquet"))
      CommitLog.convert(spark, dst.toString)
      assert(CommitLog.read(spark, dst.toString).select("id").as[Long]
        .collect().sorted === Seq(1L, 2L, 3L))
    } finally spark.conf.unset("spark.graft.export.checkpointAt")
  }

  test("SQL surface: EXPORT <table> TO DELTA [VERSION AS OF]") {
    val t = freshTable()
    CommitLog.commit(Seq((1L, 1.0)).toDF("id", "v"), t, "append")
    CommitLog.commit(Seq((2L, 2.0)).toDF("id", "v"), t, "append")
    val out = spark.sql(s"EXPORT '$t' TO DELTA").as[Long].head()
    assert(out === 2L)
    assert(Files.exists(Paths.get(logFile(t))))
    // pinned-version export serves the OLD snapshot to foreign readers
    assert(spark.sql(s"EXPORT '$t' TO DELTA VERSION AS OF 1").as[Long].head() === 1L)
    val adds = spark.read.json(logFile(t))
      .filter(col("add").isNotNull).select("add.path").as[String].collect()
    assert(adds.toSet === CommitLog.manifest(t, 1L).files.toSet)
  }
}
