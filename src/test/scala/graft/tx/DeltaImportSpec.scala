package graft.tx

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** `CONVERT TO GRAFT` over a Delta table (the import half of the interop
  * story): the spec plays the FOREIGN WRITER — it handcrafts `_delta_log`
  * commits (and a parquet checkpoint) the way delta-rs lays them down,
  * with real parquet data files on disk, then proves the import
  * reconstructs exactly the log's snapshot: removed files' rows absent
  * (the resurrection bug a blind parquet convert would commit), partition
  * values preserved, txn watermarks carried, refusals loud. */
class DeltaImportSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): Path = Files.createTempDirectory("graft_dimp").resolve("t")

  /** Write `rows` as ONE parquet file at tableDir/relPath; returns size. */
  private def writeFile(tableDir: Path, relPath: String,
      rows: Seq[(Long, Double)]): Long = {
    val tmp = Files.createTempDirectory("dimp_part")
    rows.toDF("id", "v").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).iterator()
    val src = {
      var p: Path = null
      while (part.hasNext) {
        val c = part.next()
        if (c.getFileName.toString.endsWith(".parquet")) p = c
      }
      p
    }
    val dst = tableDir.resolve(relPath)
    Files.createDirectories(dst.getParent)
    Files.move(src, dst)
    Files.size(dst)
  }

  private def schemaJson: String =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.DoubleType))).json

  private def metaAction(partitionCols: Seq[String] = Nil,
      config: String = "{}"): String =
    s"""{"metaData":{"id":"11111111-1111-1111-1111-111111111111",""" +
      s""""format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":${jstr(schemaJson)},""" +
      s""""partitionColumns":[${partitionCols.map(jstr).mkString(",")}],""" +
      s""""configuration":$config,"createdTime":1700000000000}}"""

  private def jstr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def addAction(path: String, size: Long,
      pvals: Map[String, String] = Map.empty): String = {
    val pv = pvals.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString(",")
    s"""{"add":{"path":${jstr(path)},"partitionValues":{$pv},"size":$size,""" +
      """"modificationTime":1700000000000,"dataChange":true}}"""
  }

  private def writeCommit(tableDir: Path, v: Long, actions: Seq[String]): Unit = {
    val logDir = tableDir.resolve("_delta_log")
    Files.createDirectories(logDir)
    Files.write(logDir.resolve(f"$v%020d.json"),
      (actions.mkString("\n") + "\n").getBytes("UTF-8"))
  }

  private val protocolV1 = """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""

  test("import replays adds and removes: deleted files' rows never resurrect") {
    val t = freshDir()
    val s1 = writeFile(t, "part-0001.parquet", Seq((1L, 1.0), (2L, 2.0)))
    val s2 = writeFile(t, "part-0002.parquet", Seq((3L, 3.0)))
    val s3 = writeFile(t, "part-0003%20x.parquet", Seq((4L, 4.0))) // URL-encoded space
    writeCommit(t, 0L, Seq(protocolV1, metaAction(),
      addAction("part-0001.parquet", s1), addAction("part-0002.parquet", s2)))
    // commit 1: a Delta DELETE rewrote part-0002 away and added an
    // encoded-name file; part-0002 LINGERS on disk (pre-vacuum), plus a
    // txn watermark rides along
    Files.move(t.resolve("part-0003%20x.parquet"), t.resolve("part-0003 x.parquet"))
    writeCommit(t, 1L, Seq(
      """{"txn":{"appId":"writer-1","version":7}}""",
      addAction("part-0003%20x.parquet", s3),
      """{"remove":{"path":"part-0002.parquet","deletionTimestamp":1700000001000,"dataChange":true}}"""))

    val v = CommitLog.convert(spark, t.toString)
    assert(v === 1L)
    // rows: adds 1 and 3 only — part-0002's rows (id 3) must be ABSENT
    assert(CommitLog.read(spark, t.toString).select("id").as[Long]
      .collect().sorted === Seq(1L, 2L, 4L))
    // the dead file is preserved but invisible; the old log is retired
    assert(Files.isRegularFile(t.resolve("_graft_import_dead/part-0002.parquet")))
    assert(Files.isDirectory(t.resolve("_delta_log_imported")))
    assert(!Files.exists(t.resolve("_delta_log")))
    // txn continuity: the exactly-once watermark imported
    assert(CommitLog.txnVersion(t.toString, "writer-1") === Some(7L))
    // and the converted table is a full graft citizen (DML works)
    CommitLog.deleteDv(spark, t.toString, col("id") === 4L)
    assert(CommitLog.read(spark, t.toString).count() === 2L)
  }

  test("partitioned import rebuilds hive layout from partitionValues") {
    val t = freshDir()
    // delta-rs lays partitioned files under k=v dirs, but partitionValues
    // is the authoritative source — include one file NOT under a hive dir
    val s1 = writeFile(t, "k=a/part-0001.parquet", Seq((1L, 1.0)))
    val s2 = writeFile(t, "flat-0002.parquet", Seq((2L, 2.0)))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.StringType)))
    val meta =
      s"""{"metaData":{"id":"22222222-2222-2222-2222-222222222222",""" +
        s""""format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":${jstr(schema.json)},""" +
        s""""partitionColumns":["k"],"configuration":{},""" +
        s""""createdTime":1700000000000}}"""
    writeCommit(t, 0L, Seq(protocolV1, meta,
      addAction("k=a/part-0001.parquet", s1, Map("k" -> "a")),
      addAction("flat-0002.parquet", s2, Map("k" -> "b"))))
    CommitLog.convert(spark, t.toString)
    val rows = CommitLog.read(spark, t.toString).select("id", "k")
      .as[(Long, String)].collect().sortBy(_._1)
    assert(rows.toSeq === Seq((1L, "a"), (2L, "b")))
    val m = CommitLog.manifest(t.toString, 1L)
    assert(m.partitionBy === Seq("k"))
    assert(m.files.forall(f => f.contains("/k=")),
      s"hive layout not rebuilt: ${m.files}")
    // partition pruning works through the rebuilt layout + sidecars
    assert(CommitLog.readPruned(spark, t.toString, col("k") === "b")
      .count() === 1L)
  }

  test("checkpoint + suffix replay: checkpoint removes are tombstones, not deletes") {
    val t = freshDir()
    val s1 = writeFile(t, "part-0001.parquet", Seq((1L, 1.0)))
    val s2 = writeFile(t, "part-0002.parquet", Seq((2L, 2.0)))
    val s3 = writeFile(t, "part-0003.parquet", Seq((3L, 3.0)))
    val logDir = t.resolve("_delta_log")
    Files.createDirectories(logDir)
    // checkpoint at v1: live adds {1,2}, plus a TOMBSTONE remove of a
    // long-gone file (must not affect the snapshot); json commit v2 adds 3
    val ckpt = Seq(
      s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      metaAction(),
      addAction("part-0001.parquet", s1),
      addAction("part-0002.parquet", s2),
      """{"remove":{"path":"part-0000-ancient.parquet","deletionTimestamp":1,"dataChange":true}}""")
    val ds = spark.read.json(spark.createDataset(ckpt))
    ds.coalesce(1).write.mode("overwrite")
      .parquet(t.resolve("_ckpt_tmp").toString)
    val part = Files.list(t.resolve("_ckpt_tmp")).iterator()
    var src: Path = null
    while (part.hasNext) {
      val c = part.next()
      if (c.getFileName.toString.endsWith(".parquet")) src = c
    }
    Files.move(src, logDir.resolve(f"${1L}%020d.checkpoint.parquet"))
    CommitLog.deleteTree(t.resolve("_ckpt_tmp"))
    Files.write(logDir.resolve("_last_checkpoint"),
      """{"version":1,"size":5}""".getBytes("UTF-8"))
    writeCommit(t, 2L, Seq(addAction("part-0003.parquet", s3)))
    CommitLog.convert(spark, t.toString)
    assert(CommitLog.read(spark, t.toString).select("id").as[Long]
      .collect().sorted === Seq(1L, 2L, 3L))
  }

  test("refusals are loud and leave the directory untouched") {
    // a MALFORMED deletion vector refuses BEFORE anything moves (the
    // well-formed DV path now imports — round-15 VERDICT item 5)
    val t1 = freshDir()
    val s1 = writeFile(t1, "part-0001.parquet", Seq((1L, 1.0)))
    writeCommit(t1, 0L, Seq(protocolV1, metaAction(),
      s"""{"add":{"path":"part-0001.parquet","partitionValues":{},"size":$s1,""" +
        """"modificationTime":1,"dataChange":true,""" +
        """"deletionVector":{"storageType":"u","pathOrInlineDv":"x","offset":1,"sizeInBytes":10,"cardinality":2}}}"""))
    val e1 = intercept[IllegalArgumentException](CommitLog.convert(spark, t1.toString))
    assert(e1.getMessage.contains("unreadable deletionVector"), e1.getMessage)
    assert(Files.isRegularFile(t1.resolve("part-0001.parquet"))) // untouched
    assert(Files.isDirectory(t1.resolve("_delta_log")))
    assert(!Files.exists(t1.resolve("_graft_import_plan")),
      "a refused DV import must not leave a plan file")

    // reader protocol too new
    val t2 = freshDir()
    val s2 = writeFile(t2, "part-0001.parquet", Seq((1L, 1.0)))
    writeCommit(t2, 0L, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7}}""",
      metaAction(), addAction("part-0001.parquet", s2)))
    assert(intercept[IllegalArgumentException](
      CommitLog.convert(spark, t2.toString)).getMessage.contains("minReaderVersion"))

    // a NONCONFORMING id-mode log (fields lacking the mandated
    // delta.columnMapping.id metadata) refuses loudly; conforming id mode
    // imports — see the dedicated tests below
    val t3 = freshDir()
    val s3 = writeFile(t3, "part-0001.parquet", Seq((1L, 1.0)))
    writeCommit(t3, 0L, Seq(protocolV1,
      metaAction(config = """{"delta.columnMapping.mode":"id"}"""),
      addAction("part-0001.parquet", s3)))
    assert(intercept[IllegalArgumentException](
      CommitLog.convert(spark, t3.toString))
      .getMessage.contains("delta.columnMapping.id"))

    // a gap in the commit sequence
    val t4 = freshDir()
    val s4 = writeFile(t4, "part-0001.parquet", Seq((1L, 1.0)))
    writeCommit(t4, 0L, Seq(protocolV1, metaAction(),
      addAction("part-0001.parquet", s4)))
    writeCommit(t4, 2L, Seq(addAction("part-0001.parquet", s4)))
    assert(intercept[IllegalArgumentException](
      CommitLog.convert(spark, t4.toString)).getMessage.contains("gap"))
  }

  test("NAME-mode column mapping imports: physical file names become graft colMap") {
    // foreign writer laid down a renamed table: files store physical
    // column `val_phys`, the logical schema calls it `value`
    val t = freshDir()
    val tmp = Files.createTempDirectory("dimp_cm")
    Seq((1L, 1.5), (2L, 2.5)).toDF("id", "val_phys")
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val src = Files.list(tmp).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.createDirectories(t)
    Files.move(src, t.resolve("part-0001.parquet"))
    val sz = Files.size(t.resolve("part-0001.parquet"))
    import org.apache.spark.sql.types._
    val mappedSchema = StructType(Seq(
      StructField("id", LongType, nullable = true,
        new MetadataBuilder().putLong("delta.columnMapping.id", 1L)
          .putString("delta.columnMapping.physicalName", "id").build()),
      StructField("value", DoubleType, nullable = true,
        new MetadataBuilder().putLong("delta.columnMapping.id", 2L)
          .putString("delta.columnMapping.physicalName", "val_phys").build())))
    writeCommit(t, 0L, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      s"""{"metaData":{"id":"11111111-1111-1111-1111-111111111111",""" +
        s""""format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":${jstr(mappedSchema.json)},""" +
        s""""partitionColumns":[],""" +
        s""""configuration":{"delta.columnMapping.mode":"name",""" +
        s""""delta.columnMapping.maxColumnId":"2"},"createdTime":1}}""",
      addAction("part-0001.parquet", sz)))
    val v = CommitLog.convert(spark, t.toString)
    // graft serves LOGICAL names over the physically-named file
    val got = CommitLog.read(spark, t.toString)
    assert(got.schema.fieldNames.toSeq === Seq("id", "value"))
    assert(got.select("id", "value").as[(Long, Double)].collect().sorted
      === Seq((1L, 1.5), (2L, 2.5)))
    // the mapping landed as colMap, and the foreign metadata is stripped
    val m = CommitLog.manifest(t.toString, v)
    assert(m.colMap === Map("value" -> "val_phys"))
    assert(!m.schema.fields.exists(
      _.metadata.contains("delta.columnMapping.physicalName")))
    // OPTIMIZE rewrites to logical names and clears the map — the full
    // graft lifecycle works on the imported table
    CommitLog.compact(spark, t.toString)
    assert(CommitLog.manifest(t.toString,
      CommitLog.latestVersion(t.toString).get).colMap === Map.empty)
    assert(CommitLog.read(spark, t.toString).select("value").as[Double]
      .collect().sorted === Seq(1.5, 2.5))

    // a NESTED physical rename refuses loudly
    val t2 = freshDir()
    val s2 = writeFile(t2, "part-0001.parquet", Seq((1L, 1.0)))
    val nested = StructType(Seq(
      StructField("id", LongType),
      StructField("obj", StructType(Seq(
        StructField("inner", StringType, nullable = true,
          new MetadataBuilder()
            .putString("delta.columnMapping.physicalName", "col-xyz")
            .build()))))))
    writeCommit(t2, 0L, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      metaAction(config = """{"delta.columnMapping.mode":"name"}""")
        .replace(jstr(schemaJson), jstr(nested.json)),
      addAction("part-0001.parquet", s2)))
    assert(intercept[IllegalArgumentException](
      CommitLog.convert(spark, t2.toString)).getMessage.contains("NESTED"))

    // a physical rename on a struct nested inside a map KEY refuses too —
    // before the keyType recursion it escaped the guard and the imported
    // table would silently serve nulls for the field (round-14 ADVICE)
    val t3 = freshDir()
    val s3k = writeFile(t3, "part-0001.parquet", Seq((1L, 1.0)))
    val keyRenamed = StructType(Seq(
      StructField("id", LongType),
      StructField("m", MapType(
        StructType(Seq(
          StructField("inner", StringType, nullable = true,
            new MetadataBuilder()
              .putString("delta.columnMapping.physicalName", "col-abc")
              .build()))),
        DoubleType))))
    writeCommit(t3, 0L, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      metaAction(config = """{"delta.columnMapping.mode":"name"}""")
        .replace(jstr(schemaJson), jstr(keyRenamed.json)),
      addAction("part-0001.parquet", s3k)))
    val eKey = intercept[IllegalArgumentException](
      CommitLog.convert(spark, t3.toString))
    assert(eKey.getMessage.contains("NESTED") &&
      eKey.getMessage.contains("{key}"), eKey.getMessage)
  }

  /** One parquet file whose columns carry parquet FIELD IDS (what Delta
    * id-mode writers store), moved to tableDir/relPath; returns size. */
  private def writeFileWithIds(tableDir: Path, relPath: String,
      cols: Seq[(String, Int)], rows: Seq[(Long, Double)]): Long = {
    import org.apache.spark.sql.types._
    val tmp = Files.createTempDirectory("dimp_fid")
    val df0 = rows.toDF(cols.map(_._1): _*)
    val withIds = spark.createDataFrame(df0.rdd,
      StructType(df0.schema.fields.zip(cols).map { case (f, (_, fid)) =>
        f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
          .putLong("parquet.field.id", fid.toLong).build())
      }))
    withIds.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val src = Files.list(tmp).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    val dst = tableDir.resolve(relPath)
    Files.createDirectories(dst.getParent)
    Files.move(src, dst)
    Files.size(dst)
  }

  private def idModeMeta(fields: Seq[(String, Int, String)]): String = {
    import org.apache.spark.sql.types._
    val schema = StructType(fields.map { case (logical, fid, phys) =>
      StructField(logical,
        if (logical == "id") LongType else DoubleType, nullable = true,
        new MetadataBuilder().putLong("delta.columnMapping.id", fid.toLong)
          .putString("delta.columnMapping.physicalName", phys).build())
    })
    s"""{"metaData":{"id":"33333333-3333-3333-3333-333333333333",""" +
      s""""format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":${jstr(schema.json)},""" +
      s""""partitionColumns":[],""" +
      s""""configuration":{"delta.columnMapping.mode":"id",""" +
      s""""delta.columnMapping.maxColumnId":"9"},"createdTime":1}}"""
  }

  private val protocolMapping =
    """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}"""

  test("ID-mode column mapping imports when footer field ids agree with " +
      "the schema's mapping (round-14 VERDICT item 6)") {
    val t = freshDir()
    Files.createDirectories(t)
    // conforming id-mode writer: physically-named columns WITH field ids
    val sz = writeFileWithIds(t, "part-0001.parquet",
      Seq("id" -> 1, "val_phys" -> 2), Seq((1L, 1.5), (2L, 2.5)))
    writeCommit(t, 0L, Seq(protocolMapping,
      idModeMeta(Seq(("id", 1, "id"), ("value", 2, "val_phys"))),
      addAction("part-0001.parquet", sz)))
    val v = CommitLog.convert(spark, t.toString)
    val got = CommitLog.read(spark, t.toString)
    assert(got.schema.fieldNames.toSeq === Seq("id", "value"))
    assert(got.select("id", "value").as[(Long, Double)].collect().sorted
      === Seq((1L, 1.5), (2L, 2.5)))
    assert(CommitLog.manifest(t.toString, v).colMap
      === Map("value" -> "val_phys"))
  }

  test("ID-mode import refuses when a footer's field ids DISAGREE with the " +
      "mapping — an id-mode reader and a name reader would serve different " +
      "columns; nothing moves") {
    // (a) the mapped id binds a differently-named footer column
    val t1 = freshDir()
    Files.createDirectories(t1)
    val s1 = writeFileWithIds(t1, "part-0001.parquet",
      Seq("id" -> 1, "other" -> 2), Seq((1L, 1.5)))
    writeCommit(t1, 0L, Seq(protocolMapping,
      idModeMeta(Seq(("id", 1, "id"), ("value", 2, "val_phys"))),
      addAction("part-0001.parquet", s1)))
    val e1 = intercept[IllegalArgumentException](
      CommitLog.convert(spark, t1.toString))
    assert(e1.getMessage.contains("DIFFERENT columns"), e1.getMessage)
    assert(Files.isRegularFile(t1.resolve("part-0001.parquet"))) // untouched
    assert(Files.isDirectory(t1.resolve("_delta_log")))
    assert(!Files.exists(t1.resolve("_graft_import_plan")))

    // (b) the physical NAME is present but under a foreign field id
    val t2 = freshDir()
    Files.createDirectories(t2)
    val s2 = writeFileWithIds(t2, "part-0001.parquet",
      Seq("id" -> 1, "val_phys" -> 9), Seq((1L, 1.5)))
    writeCommit(t2, 0L, Seq(protocolMapping,
      idModeMeta(Seq(("id", 1, "id"), ("value", 2, "val_phys"))),
      addAction("part-0001.parquet", s2)))
    val e2 = intercept[IllegalArgumentException](
      CommitLog.convert(spark, t2.toString))
    assert(e2.getMessage.contains("bind it elsewhere"), e2.getMessage)
  }

  test("ID-mode import refuses a MIXED footer: the mapped physical name " +
      "present WITHOUT its field id in a footer that carries ids on other " +
      "columns (round-15 ADVICE — a strict id-mode reader serves NULL " +
      "where the name reader serves values)") {
    import org.apache.spark.sql.types._
    val t = freshDir()
    Files.createDirectories(t)
    // 'id' carries its parquet field id; 'val_phys' carries NONE — the
    // per-column fallback would accept it by name, but a footer that DOES
    // carry ids makes name resolution a binding disagreement
    val tmp = Files.createTempDirectory("dimp_mixed")
    val df0 = Seq((1L, 1.5)).toDF("id", "val_phys")
    val mixed = spark.createDataFrame(df0.rdd,
      StructType(df0.schema.fields.map { f =>
        if (f.name == "id")
          f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
            .putLong("parquet.field.id", 1L).build())
        else f
      }))
    mixed.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val src = Files.list(tmp).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.move(src, t.resolve("part-0001.parquet"))
    val sz = Files.size(t.resolve("part-0001.parquet"))
    writeCommit(t, 0L, Seq(protocolMapping,
      idModeMeta(Seq(("id", 1, "id"), ("value", 2, "val_phys"))),
      addAction("part-0001.parquet", sz)))
    val e = intercept[IllegalArgumentException](
      CommitLog.convert(spark, t.toString))
    assert(e.getMessage.contains("carries ids on other columns"), e.getMessage)
    assert(Files.isRegularFile(t.resolve("part-0001.parquet"))) // untouched
  }

  test("ID-mode import refuses a schema that reuses a field id — toMap " +
      "would silently skip one column's verification") {
    val t = freshDir()
    Files.createDirectories(t)
    val sz = writeFileWithIds(t, "part-0001.parquet",
      Seq("id" -> 1, "val_phys" -> 2), Seq((1L, 1.5)))
    writeCommit(t, 0L, Seq(protocolMapping,
      idModeMeta(Seq(("id", 1, "id"), ("value", 1, "val_phys"))), // dup id 1
      addAction("part-0001.parquet", sz)))
    val e = intercept[IllegalArgumentException](
      CommitLog.convert(spark, t.toString))
    assert(e.getMessage.contains("reuses field id"), e.getMessage)
    assert(Files.isRegularFile(t.resolve("part-0001.parquet")))
  }

  test("ID-mode import accepts files WITHOUT field ids by name resolution " +
      "(delta-spark's own id-mode fallback)") {
    val t = freshDir()
    // a plain Spark-written file: physical names, NO parquet field ids
    val tmp = Files.createTempDirectory("dimp_noid")
    Seq((1L, 1.5)).toDF("id", "val_phys").coalesce(1)
      .write.mode("overwrite").parquet(tmp.toString)
    val src = Files.list(tmp).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.createDirectories(t)
    Files.move(src, t.resolve("part-0001.parquet"))
    val sz = Files.size(t.resolve("part-0001.parquet"))
    writeCommit(t, 0L, Seq(protocolMapping,
      idModeMeta(Seq(("id", 1, "id"), ("value", 2, "val_phys"))),
      addAction("part-0001.parquet", sz)))
    CommitLog.convert(spark, t.toString)
    assert(CommitLog.read(spark, t.toString).select("id", "value")
      .as[(Long, Double)].collect().toSeq === Seq((1L, 1.5)))
  }

  test("a crashed import RESUMES from its recorded plan at every interruption point") {
    // state (a): plan written, one of two files already moved, log intact
    val t = freshDir()
    val s1 = writeFile(t, "part-0001.parquet", Seq((1L, 1.0)))
    val s2 = writeFile(t, "part-0002.parquet", Seq((2L, 2.0)))
    writeCommit(t, 0L, Seq(protocolV1, metaAction(),
      addAction("part-0001.parquet", s1), addAction("part-0002.parquet", s2)))
    val dataDir = "data/00000000-dead-beef-0000-000000000001"
    val plan = Seq(
      "part-0001.parquet" -> s"$dataDir/i0-part-0001.parquet",
      "part-0002.parquet" -> s"$dataDir/i1-part-0002.parquet")
    Files.write(t.resolve("_graft_import_plan"),
      plan.map { case (a, b) => s"$a\t$b" }.mkString("\n").getBytes("UTF-8"))
    Files.createDirectories(t.resolve(dataDir))
    Files.move(t.resolve("part-0001.parquet"),
      t.resolve(plan.head._2)) // the "crash" happened after this move
    CommitLog.convert(spark, t.toString)
    assert(CommitLog.read(spark, t.toString).select("id").as[Long]
      .collect().sorted === Seq(1L, 2L))
    assert(!Files.exists(t.resolve("_graft_import_plan")))
    assert(Files.isDirectory(t.resolve("_delta_log_imported")))
    // the recorded plan was REUSED (same commit dir, no second data dir)
    assert(CommitLog.manifest(t.toString, 1L).files.forall(_.startsWith(dataDir)))

    // state (b): all files moved and the log already renamed — only the
    // plan says this is a half-imported Delta table; the blind path would
    // have resurrected nothing here but must still be bypassed
    val t2 = freshDir()
    val s3 = writeFile(t2, "part-0001.parquet", Seq((7L, 7.0)))
    writeCommit(t2, 0L, Seq(protocolV1, metaAction(),
      addAction("part-0001.parquet", s3)))
    val dd2 = "data/00000000-dead-beef-0000-000000000002"
    Files.write(t2.resolve("_graft_import_plan"),
      s"part-0001.parquet\t$dd2/i0-part-0001.parquet".getBytes("UTF-8"))
    Files.createDirectories(t2.resolve(dd2))
    Files.move(t2.resolve("part-0001.parquet"),
      t2.resolve(s"$dd2/i0-part-0001.parquet"))
    Files.move(t2.resolve("_delta_log"), t2.resolve("_delta_log_imported"))
    CommitLog.convert(spark, t2.toString)
    assert(CommitLog.read(spark, t2.toString).select("id").as[Long]
      .collect().toSeq === Seq(7L))

    // state (c): published but the plan's cleanup was lost — idempotent
    Files.write(t2.resolve("_graft_import_plan"), "x\ty".getBytes("UTF-8"))
    assert(CommitLog.convert(spark, t2.toString) === 1L)
    assert(!Files.exists(t2.resolve("_graft_import_plan")))
  }

  test("export → import roundtrip: a graft snapshot re-imported elsewhere is identical") {
    // the two halves must agree on the protocol: export a graft table,
    // copy data + _delta_log to a new root, import there
    val src = freshDir().toString
    CommitLog.commit(Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "a", 3.0))
      .toDF("id", "k", "v"), src, "append", partitionBy = Seq("k"))
    DeltaExport.writeDeltaLog(src)
    val dst = freshDir()
    // copy the delta view: data files at their add paths + the log
    val srcDir = Paths.get(src)
    CommitLog.manifest(src, 1L).files.foreach { rel =>
      val d = dst.resolve(rel)
      Files.createDirectories(d.getParent)
      Files.copy(srcDir.resolve(rel), d)
    }
    Files.createDirectories(dst.resolve("_delta_log"))
    Files.copy(srcDir.resolve("_delta_log").resolve(f"${0L}%020d.json"),
      dst.resolve("_delta_log").resolve(f"${0L}%020d.json"))
    CommitLog.convert(spark, dst.toString)
    val got = CommitLog.read(spark, dst.toString).select("id", "k", "v")
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "a", 3.0)))
    assert(CommitLog.manifest(dst.toString, 1L).partitionBy === Seq("k"))
  }

  test("a malicious add.path can never move files from OUTSIDE the table " +
      "root into it (round-12 ADVICE, medium: validate the DECODED path)") {
    // victim file outside the table dir — a traversal bug would MOVE it
    val t = freshDir()
    Files.createDirectories(t)
    val victim = t.getParent.resolve("victim.parquet")
    val s = writeFile(t, "decoy.parquet", Seq((9L, 9.0)))
    Files.copy(t.resolve("decoy.parquet"), victim)
    def attempt(path: String): Unit = {
      val tt = freshDir()
      val ss = writeFile(tt, "ok.parquet", Seq((1L, 1.0)))
      writeCommit(tt, 0L, Seq(protocolV1, metaAction(),
        addAction("ok.parquet", ss), addAction(path, s)))
      val e = intercept[IllegalArgumentException](
        CommitLog.convert(spark, tt.toString))
      assert(e.getMessage.contains("add.path"), s"wrong refusal for $path: ${e.getMessage}")
      // refusal left the directory untouched — no graft log, no moves
      assert(CommitLog.latestVersion(tt.toString).isEmpty)
      assert(Files.isRegularFile(tt.resolve("ok.parquet")))
    }
    attempt("../victim.parquet")              // raw traversal
    attempt("%2E%2E%2Fvictim.parquet")        // ENCODED traversal — the hole:
                                              // raw-string checks see no '..'
    attempt("a/b/../../../victim.parquet")    // nested traversal
    attempt(DeltaPaths.encode(victim.toAbsolutePath.toString)) // encoded absolute
    attempt("/etc/passwd")                    // raw absolute
    // the victim was never touched by any refused attempt
    assert(Files.isRegularFile(victim))
  }

  test("an add missing a partitionValues entry for a partition column " +
      "refuses instead of silently nulling it (round-12 ADVICE, low)") {
    val t = freshDir()
    val s1 = writeFile(t, "k=a/part-0001.parquet", Seq((1L, 1.0)))
    // nonconforming add: the spec requires one entry per partition column
    writeCommit(t, 0L, Seq(protocolV1, metaAction(Seq("k")),
      addAction("k%3Da/part-0001.parquet", s1))) // pvals EMPTY
    val e = intercept[IllegalArgumentException](
      CommitLog.convert(spark, t.toString))
    assert(e.getMessage.contains("partitionValues") &&
      e.getMessage.contains("'k'"))
    // untouched: no plan, no moves, log still in place
    assert(!Files.exists(t.resolve("_graft_import_plan")))
    assert(Files.isRegularFile(t.resolve("k=a/part-0001.parquet")))
    assert(Files.isDirectory(t.resolve("_delta_log")))
    // a NULL value present under the key is fine (hive default partition)
    val t2 = freshDir()
    val s2 = writeFile(t2, "part-0001.parquet", Seq((1L, 1.0)))
    writeCommit(t2, 0L, Seq(protocolV1, metaAction(Seq("k")),
      s"""{"add":{"path":"part-0001.parquet","partitionValues":{"k":null},""" +
        s""""size":$s2,"modificationTime":1700000000000,"dataChange":true}}"""))
    // schema lacks k, so give the import the evolved schema via the log
    val e2 = scala.util.Try(CommitLog.convert(spark, t2.toString))
    // k isn't in the data schema — but the partition refusal must NOT be
    // what fires; either it converts (k rebuilt as default partition) or
    // fails on the schema, never on partitionValues conformance
    e2.failed.foreach(ex =>
      assert(!ex.getMessage.contains("lacks a partitionValues entry")))
  }

  test("an INCOMPLETE multi-part checkpoint refuses with an explicit " +
      "message, not a misleading 'log gap' (round-12 ADVICE, low)") {
    val t = freshDir()
    val s1 = writeFile(t, "part-0005.parquet", Seq((1L, 1.0)))
    val logDir = t.resolve("_delta_log")
    Files.createDirectories(logDir)
    // part 1 of 2 only (partial copy); JSON commits from v5 only — the
    // pre-checkpoint commits were cleaned up, as Delta does
    Files.write(logDir.resolve(
      f"${4L}%020d.checkpoint.0000000001.0000000002.parquet"), Array[Byte]())
    writeCommit(t, 5L, Seq(protocolV1, metaAction(),
      addAction("part-0005.parquet", s1)))
    val e = intercept[IllegalArgumentException](
      CommitLog.convert(spark, t.toString))
    assert(e.getMessage.contains("INCOMPLETE multi-part"),
      s"expected incomplete-checkpoint message, got: ${e.getMessage}")
    assert(!e.getMessage.contains("log gap"))
    // and a genuinely gapped log WITHOUT any checkpoint still says "gap"
    val t3 = freshDir()
    val s3 = writeFile(t3, "part-0005.parquet", Seq((1L, 1.0)))
    writeCommit(t3, 0L, Seq(protocolV1, metaAction(),
      addAction("part-0005.parquet", s3)))
    writeCommit(t3, 2L, Seq(addAction("part-0005.parquet", s3)))
    val e3 = intercept[IllegalArgumentException](
      CommitLog.convert(spark, t3.toString))
    assert(e3.getMessage.contains("log gap"))
  }

  test("a COMPLETE multi-part checkpoint imports: the parts partition the " +
      "action rows and read as one scan") {
    val t = freshDir()
    val n = 6
    val s1 = writeFile(t, "part-00000.parquet", Seq((0L, 0.0)))
    (1 until n).foreach { i =>
      Files.copy(t.resolve("part-00000.parquet"),
        t.resolve(f"part-$i%05d.parquet"))
    }
    val actions = Seq(protocolV1, metaAction()) ++
      (0 until n).map(i => addAction(f"part-$i%05d.parquet", s1))
    // ONE inferred schema across both parts (real multi-part checkpoints
    // are uniform), rows split arbitrarily between them
    val ds = spark.read.json(spark.createDataset(actions)).repartition(2)
    val tmp = t.resolve("_ckpt_tmp")
    ds.write.mode("overwrite").parquet(tmp.toString)
    val logDir = t.resolve("_delta_log")
    Files.createDirectories(logDir)
    val parts = {
      val st = Files.list(tmp)
      try st.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).toList.sortBy(_.toString)
      finally st.close()
    }
    assert(parts.size === 2)
    parts.zipWithIndex.foreach { case (p, i) =>
      Files.move(p, logDir.resolve(
        f"${4L}%020d.checkpoint.${i + 1}%010d.${2L}%010d.parquet"))
    }
    CommitLog.deleteTree(tmp)
    // one JSON commit above the checkpoint proves the replay stitches on
    val s7 = writeFile(t, "part-00007.parquet", Seq((7L, 7.0)))
    writeCommit(t, 5L, Seq(addAction("part-00007.parquet", s7)))
    val v = CommitLog.convert(spark, t.toString)
    assert(v === 1L)
    assert(CommitLog.read(spark, t.toString).count() === (n + 1).toLong)
    assert(CommitLog.read(spark, t.toString)
      .agg(max(col("id"))).as[Long].head() === 7L)
  }

  test("a checkpoint with thousands of adds imports through the " +
      "DISTRIBUTED typed parse (round-12 VERDICT item 2: no O(files) " +
      "action-JSON materialization on the driver)") {
    val t = freshDir()
    val n = 2048
    val s1 = writeFile(t, "part-00000.parquet", Seq((0L, 0.0)))
    (1 until n).foreach { i =>
      Files.copy(t.resolve("part-00000.parquet"),
        t.resolve(f"part-$i%05d.parquet"))
    }
    val actions = Seq(protocolV1, metaAction(),
      """{"txn":{"appId":"bulk-writer","version":42}}""") ++
      (0 until n).map(i => addAction(f"part-$i%05d.parquet", s1))
    val ds = spark.read.json(spark.createDataset(actions))
    val tmp = t.resolve("_ckpt_tmp")
    ds.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val logDir = t.resolve("_delta_log")
    Files.createDirectories(logDir)
    val part = {
      val st = Files.list(tmp)
      try st.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      finally st.close()
    }
    Files.move(part, logDir.resolve(f"${0L}%020d.checkpoint.parquet"))
    CommitLog.deleteTree(tmp)
    Files.write(logDir.resolve("_last_checkpoint"),
      s"""{"version":0,"size":${actions.size}}""".getBytes("UTF-8"))
    val v = CommitLog.convert(spark, t.toString)
    assert(v === 1L)
    assert(CommitLog.read(spark, t.toString).count() === n.toLong)
    assert(CommitLog.txnVersion(t.toString, "bulk-writer") === Some(42L))
  }

  /** Write action-JSON strings as ONE parquet file at `dest`. */
  private def writeActionsParquet(scratch: Path, actions: Seq[String],
      dest: Path): Unit = {
    val ds = spark.read.json(spark.createDataset(actions))
    val tmp = scratch.resolve("_v2_tmp")
    ds.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = {
      val st = Files.list(tmp)
      try st.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      finally st.close()
    }
    Files.createDirectories(dest.getParent)
    Files.move(part, dest)
    CommitLog.deleteTree(tmp)
  }

  private val protocolV2Ckpt =
    """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
      """"readerFeatures":["v2Checkpoint"],"writerFeatures":["v2Checkpoint"]}}"""

  test("a v2 UUID checkpoint with sidecars imports: file actions come from " +
      "_delta_log/_sidecars, the main file carries the non-file actions") {
    val t = freshDir()
    val s1 = writeFile(t, "part-0001.parquet", Seq((1L, 1.0)))
    val s2 = writeFile(t, "part-0002.parquet", Seq((2L, 2.0)))
    val s3 = writeFile(t, "part-0003.parquet", Seq((3L, 3.0)))
    val logDir = t.resolve("_delta_log")
    Files.createDirectories(logDir)
    // sidecar 1: two adds + a TOMBSTONE remove (already applied — ignored);
    // sidecar 2: one add — proves multiple sidecars scan together
    writeActionsParquet(t, Seq(
      addAction("part-0001.parquet", s1),
      addAction("part-0002.parquet", s2),
      """{"remove":{"path":"part-0000-ancient.parquet","deletionTimestamp":1,"dataChange":true}}"""),
      logDir.resolve("_sidecars/sc-1.parquet"))
    writeActionsParquet(t, Seq(addAction("part-0003.parquet", s3)),
      logDir.resolve("_sidecars/sc-2.parquet"))
    writeActionsParquet(t, Seq(
      protocolV2Ckpt, metaAction(),
      """{"txn":{"appId":"writer-v2","version":9}}""",
      """{"checkpointMetadata":{"version":1}}""",
      """{"sidecar":{"path":"sc-1.parquet","sizeInBytes":100,"modificationTime":1}}""",
      """{"sidecar":{"path":"sc-2.parquet","sizeInBytes":100,"modificationTime":1}}"""),
      logDir.resolve(
        f"${1L}%020d.checkpoint.3a0f5b0e-9c7d-4b6a-8f21-0123456789ab.parquet"))
    // one JSON commit above the checkpoint proves the replay stitches on
    val s4 = writeFile(t, "part-0004.parquet", Seq((4L, 4.0)))
    writeCommit(t, 2L, Seq(addAction("part-0004.parquet", s4)))
    val v = CommitLog.convert(spark, t.toString)
    assert(v === 1L)
    assert(CommitLog.read(spark, t.toString).select("id").as[Long]
      .collect().sorted === Seq(1L, 2L, 3L, 4L))
    assert(CommitLog.txnVersion(t.toString, "writer-v2") === Some(9L))
  }

  test("a self-contained v2 JSON checkpoint imports with no JSON commits " +
      "left (metadata-cleaned log, checkpoint is the whole snapshot)") {
    val t = freshDir()
    val s1 = writeFile(t, "part-0001.parquet", Seq((1L, 1.0)))
    val s2 = writeFile(t, "part-0002.parquet", Seq((2L, 2.0)))
    val logDir = t.resolve("_delta_log")
    Files.createDirectories(logDir)
    val lines = Seq(
      protocolV2Ckpt, metaAction(),
      """{"checkpointMetadata":{"version":3}}""",
      addAction("part-0001.parquet", s1),
      addAction("part-0002.parquet", s2))
    Files.write(logDir.resolve(
      f"${3L}%020d.checkpoint.00112233-4455-6677-8899-aabbccddeeff.json"),
      (lines.mkString("\n") + "\n").getBytes("UTF-8"))
    val v = CommitLog.convert(spark, t.toString)
    assert(v === 1L)
    assert(CommitLog.read(spark, t.toString).select("id").as[Long]
      .collect().sorted === Seq(1L, 2L))
  }

  test("v2 refusals: non-v2Checkpoint reader features, sidecar escape, " +
      "missing sidecar — all loud, nothing touched") {
    // reader v3 with a feature that changes how files must be read
    // (deletionVectors itself now imports — round-15 VERDICT item 5)
    val t1 = freshDir()
    val s1 = writeFile(t1, "part-0001.parquet", Seq((1L, 1.0)))
    writeCommit(t1, 0L, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["v2Checkpoint","timestampNtz"]}}""",
      metaAction(), addAction("part-0001.parquet", s1)))
    val e1 = intercept[IllegalArgumentException](
      CommitLog.convert(spark, t1.toString))
    assert(e1.getMessage.contains("timestampNtz"))
    assert(Files.isRegularFile(t1.resolve("part-0001.parquet")))
    // a reader-3 log declaring deletionVectors (with none live) converts
    val t1b = freshDir()
    val s1b = writeFile(t1b, "part-0001.parquet", Seq((1L, 1.0)))
    writeCommit(t1b, 0L, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["v2Checkpoint","deletionVectors"]}}""",
      metaAction(), addAction("part-0001.parquet", s1b)))
    CommitLog.convert(spark, t1b.toString)
    assert(CommitLog.read(spark, t1b.toString).count() === 1L)

    // sidecar path escaping _delta_log/_sidecars after decoding
    val t2 = freshDir()
    val victim = t2.getParent.resolve("victim.parquet")
    val s2 = writeFile(t2, "part-0001.parquet", Seq((1L, 1.0)))
    Files.copy(t2.resolve("part-0001.parquet"), victim)
    val logDir2 = t2.resolve("_delta_log")
    writeActionsParquet(t2, Seq(
      protocolV2Ckpt, metaAction(),
      """{"sidecar":{"path":"..%2F..%2F..%2Fvictim.parquet","sizeInBytes":1,"modificationTime":1}}"""),
      logDir2.resolve(
        f"${0L}%020d.checkpoint.3a0f5b0e-9c7d-4b6a-8f21-0123456789ab.parquet"))
    val e2 = intercept[IllegalArgumentException](
      CommitLog.convert(spark, t2.toString))
    assert(e2.getMessage.contains("escapes _delta_log/_sidecars"))
    assert(Files.isRegularFile(victim)) // never touched

    // sidecar referenced but missing: incomplete copy, loud
    val t3 = freshDir()
    writeFile(t3, "part-0001.parquet", Seq((1L, 1.0)))
    val logDir3 = t3.resolve("_delta_log")
    writeActionsParquet(t3, Seq(
      protocolV2Ckpt, metaAction(),
      """{"sidecar":{"path":"nope.parquet","sizeInBytes":1,"modificationTime":1}}"""),
      logDir3.resolve(
        f"${0L}%020d.checkpoint.3a0f5b0e-9c7d-4b6a-8f21-0123456789ab.parquet"))
    val e3 = intercept[IllegalArgumentException](
      CommitLog.convert(spark, t3.toString))
    assert(e3.getMessage.contains("missing"))
  }
}
