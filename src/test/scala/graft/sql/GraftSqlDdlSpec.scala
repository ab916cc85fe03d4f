package graft.sql

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.tx.CommitLog

/** Round-9 SQL DDL/utility surface: DESCRIBE DETAIL, RESTORE, SHALLOW
  * CLONE, TRUNCATE TABLE, ALTER TABLE ADD COLUMNS — each a transactional
  * [[CommitLog]] operation behind Delta's statement shapes. TRUNCATE and
  * ALTER are claimed ONLY for graft targets; other tables keep Spark's
  * own semantics. */
class GraftSqlDdlSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(prefix: String): String = {
    val table = tmpDir(prefix)
    new java.io.File(table).delete()
    CommitLog.commit(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "typ"),
      table, "append")
    table
  }

  test("DESCRIBE DETAIL summarizes the current snapshot") {
    val t = freshTable("sqlddl_detail")
    CommitLog.deleteDv(spark, t, col("id") === 2L)
    val r = spark.sql(s"DESCRIBE DETAIL '$t'").collect().head
    assert(r.getString(0) === "graft")
    assert(r.getString(1) === t)
    assert(r.getLong(2) === 2L)         // version after the DV delete
    assert(r.getInt(3) >= 1)            // num_files
    assert(r.getLong(4) > 0L)           // size_bytes
    assert(r.getInt(5) === 1)           // num_dv_dirs
    assert(r.getInt(6) === 2)           // num_versions
    assert(r.getInt(8) === 2)           // num_columns
    // by view name too
    spark.read.format("graft").load(t).createOrReplaceTempView("sqlddl_detail_v")
    assert(spark.sql("DESCRIBE DETAIL sqlddl_detail_v").collect()
      .head.getLong(2) === 2L)
  }

  test("RESTORE TO VERSION AS OF republishes a prior snapshot as a new version") {
    val t = freshTable("sqlddl_restore")
    CommitLog.commit(Seq((9L, "z")).toDF("id", "typ"), t, "append")
    assert(CommitLog.read(spark, t).count() === 4L)
    val r = spark.sql(s"RESTORE TABLE '$t' TO VERSION AS OF 1").collect().head
    assert(r.getLong(0) === 1L && r.getLong(1) === 3L)
    assert(CommitLog.read(spark, t).count() === 3L)
    // history intact: time travel still reads the pre-restore snapshot
    assert(spark.read.format("graft").option("versionAsOf", 2)
      .load(t).count() === 4L)
    // WITH CDC journals the restore diff for feed subscribers
    spark.sql(s"RESTORE '$t' TO VERSION AS OF 2 WITH CDC")
    val feed = CommitLog.changeFeed(spark, t, 3L)
      .select(col(CommitLog.ChangeTypeCol)).as[String].collect().toSeq
    assert(feed === Seq("insert"))
    // TIMESTAMP AS OF: a far-future instant resolves to the latest version
    val out = spark.sql(
      s"RESTORE '$t' TO TIMESTAMP AS OF '2100-01-01 00:00:00'").collect().head
    assert(out.getLong(0) === CommitLog.latestVersion(t).get)
  }

  test("CREATE TABLE SHALLOW CLONE materializes a zero-copy snapshot") {
    val t = freshTable("sqlddl_clonesrc")
    CommitLog.commit(Seq((9L, "z")).toDF("id", "typ"), t, "append")
    val dst = tmpDir("sqlddl_clonedst"); new java.io.File(dst).delete()
    assert(spark.sql(s"CREATE TABLE '$dst' SHALLOW CLONE '$t' VERSION AS OF 1")
      .collect().head.getLong(0) === 1L)
    assert(CommitLog.read(spark, dst).count() === 3L) // v1 snapshot
    // bare-name dst registers in the catalog (needs LOCATION)
    val dst2 = tmpDir("sqlddl_clonedst2"); new java.io.File(dst2).delete()
    spark.sql("DROP TABLE IF EXISTS sqlddl_clone_t")
    spark.sql(s"CREATE TABLE sqlddl_clone_t SHALLOW CLONE '$t' LOCATION '$dst2'")
    assert(spark.table("sqlddl_clone_t").count() === 4L) // latest snapshot
    spark.sql("DROP TABLE sqlddl_clone_t")
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE no_loc_clone SHALLOW CLONE '$t'")
    }
    assert(e.getMessage.contains("LOCATION"))
  }

  test("TRUNCATE TABLE on a graft target is a transactional empty overwrite") {
    val t = freshTable("sqlddl_trunc")
    spark.read.format("graft").load(t).createOrReplaceTempView("sqlddl_trunc_v")
    val v = spark.sql("TRUNCATE TABLE sqlddl_trunc_v").collect().head.getLong(0)
    assert(v === 2L)
    assert(CommitLog.read(spark, t).count() === 0L)
    assert(CommitLog.read(spark, t).schema.fieldNames.toSeq === Seq("id", "typ"))
    // history intact — the data is one time travel away, not deleted
    assert(spark.read.format("graft").option("versionAsOf", 1)
      .load(t).count() === 3L)
    // a quoted path claims too
    spark.sql(s"TRUNCATE TABLE '$t'")
    assert(CommitLog.latestVersion(t).get === 3L)
  }

  test("TRUNCATE on a partitioned table keeps the hive layout for later writes") {
    val t = tmpDir("sqlddl_truncpart"); new java.io.File(t).delete()
    CommitLog.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "typ"), t, "append",
      partitionBy = Seq("typ"))
    spark.sql(s"TRUNCATE TABLE '$t'")
    assert(CommitLog.read(spark, t).count() === 0L)
    // the next by-name/SQL write must re-derive typ as the layout from
    // the last FILE-CARRYING version, not the empty snapshot
    spark.read.format("graft").load(t).createOrReplaceTempView("sqlddl_tp_v")
    spark.sql("INSERT INTO sqlddl_tp_v VALUES (3, 'c')")
    val m = CommitLog.manifest(t, CommitLog.latestVersion(t).get)
    assert(m.files.nonEmpty && m.files.forall(_.contains("typ=c")), m.files)
  }

  test("CREATE TABLE refuses a non-empty directory without a commit log") {
    val dir = tmpDir("sqlddl_foreign")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "data.parquet"),
      Array[Byte](1, 2, 3))
    spark.sql("DROP TABLE IF EXISTS sqlddl_foreign_t")
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE sqlddl_foreign_t (id BIGINT) USING graft LOCATION '$dir'")
      spark.table("sqlddl_foreign_t").collect()
    }
    assert(e.getMessage.contains("not empty") ||
      Option(e.getCause).exists(_.getMessage.contains("not empty")), e.getMessage)
    spark.sql("DROP TABLE IF EXISTS sqlddl_foreign_t")
  }

  test("TRUNCATE TABLE on a non-graft table keeps Spark's own semantics") {
    spark.sql("DROP TABLE IF EXISTS sqlddl_plain")
    spark.sql(s"CREATE TABLE sqlddl_plain (id INT) USING parquet")
    spark.sql("INSERT INTO sqlddl_plain VALUES (1), (2)")
    spark.sql("TRUNCATE TABLE sqlddl_plain") // Spark's command, not ours
    assert(spark.table("sqlddl_plain").count() === 0L)
    spark.sql("DROP TABLE sqlddl_plain")
  }

  test("ALTER TABLE ADD COLUMNS is a schema-only commit; old files read NULL") {
    val t = freshTable("sqlddl_addcol")
    spark.read.format("graft").load(t).createOrReplaceTempView("sqlddl_addcol_v")
    val filesBefore = CommitLog.manifest(t, 1L).files
    val v = spark.sql(
      "ALTER TABLE sqlddl_addcol_v ADD COLUMNS (score DOUBLE, tag STRING)")
      .collect().head.getLong(0)
    assert(v === 2L)
    val m = CommitLog.manifest(t, v)
    assert(m.files === filesBefore) // not one byte rewritten
    assert(m.schema.fieldNames.toSeq === Seq("id", "typ", "score", "tag"))
    val g = spark.read.format("graft").load(t)
    assert(g.filter(col("score").isNull && col("tag").isNull).count() === 3L)
    // and the new column is writable
    CommitLog.commit(Seq((4L, "d", 1.5, "x")).toDF("id", "typ", "score", "tag"),
      t, "append")
    assert(spark.read.format("graft").load(t)
      .agg(sum(col("score"))).head().getDouble(0) === 1.5)
    // duplicate names refuse, case-insensitively
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE sqlddl_addcol_v ADD COLUMNS (TYP STRING)")
    }
    assert(e.getMessage.contains("already has a column"))
  }

  test("ALTER TABLE DROP COLUMNS narrows the schema without touching a byte") {
    val t = freshTable("sqlddl_dropcol")
    spark.read.format("graft").load(t).createOrReplaceTempView("sqlddl_dropcol_v")
    val filesBefore = CommitLog.manifest(t, 1L).files
    val v = spark.sql("ALTER TABLE sqlddl_dropcol_v DROP COLUMN typ")
      .collect().head.getLong(0)
    assert(v === 2L)
    val m = CommitLog.manifest(t, v)
    assert(m.files === filesBefore)
    assert(m.schema.fieldNames.toSeq === Seq("id"))
    assert(spark.read.format("graft").load(t).columns.toSeq === Seq("id"))
    // time travel still reads the dropped column
    assert(spark.read.format("graft").option("versionAsOf", 1).load(t)
      .select("typ").count() === 3L)
    // re-adding the name REFUSES while live files physically carry it
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE sqlddl_dropcol_v ADD COLUMNS (typ STRING)")
    }
    assert(e.getMessage.contains("would resurface"), e.getMessage)
    // OPTIMIZE rewrites the files without the column; re-add then works
    // and reads NULL everywhere (no resurrected values)
    spark.sql(s"OPTIMIZE '$t'")
    spark.sql("ALTER TABLE sqlddl_dropcol_v ADD COLUMNS (typ STRING)")
    val g = spark.read.format("graft").load(t)
    assert(g.filter(col("typ").isNull).count() === 3L)
  }

  test("DROP COLUMNS refuses hive-partition layout columns and full drops") {
    val t = tmpDir("sqlddl_droppart"); new java.io.File(t).delete()
    CommitLog.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "typ"), t, "append",
      partitionBy = Seq("typ"))
    val e = intercept[Exception] { spark.sql(s"ALTER TABLE '$t' DROP COLUMN typ") }
    assert(e.getMessage.contains("layout column"), e.getMessage)
    val e2 = intercept[Exception] {
      spark.sql(s"ALTER TABLE '$t' DROP COLUMNS (id, typ)")
    }
    assert(e2.getMessage.contains("layout column") ||
      e2.getMessage.contains("every column"), e2.getMessage)
  }

  test("CHECK constraints: validated on add, enforced scan-fused on every write") {
    val t = freshTable("sqlddl_check")
    spark.read.format("graft").load(t).createOrReplaceTempView("sqlddl_check_v")
    // existing rows violate → ADD refuses before registering anything
    val e0 = intercept[Exception] {
      spark.sql("ALTER TABLE sqlddl_check_v ADD CONSTRAINT pos CHECK (id > 1)")
    }
    assert(e0.getMessage.contains("existing rows"), e0.getMessage)
    assert(graft.tx.Constraints.list(t).isEmpty)
    spark.sql("ALTER TABLE sqlddl_check_v ADD CONSTRAINT pos CHECK (id > 0)")
    assert(spark.sql(s"DESCRIBE DETAIL '$t'").collect().head.getString(9)
      === "pos: CHECK (id > 0)")
    // a violating INSERT fails the WRITE and publishes nothing
    val vBefore = CommitLog.latestVersion(t).get
    val e1 = intercept[Exception] {
      spark.sql("INSERT INTO sqlddl_check_v VALUES (-5, 'bad')")
    }
    assert(e1.getMessage.contains("CHECK constraint pos") ||
      Option(e1.getCause).exists(_.getMessage.contains("CHECK constraint pos")),
      e1.getMessage)
    assert(CommitLog.latestVersion(t).get === vBefore)
    assert(CommitLog.read(spark, t).count() === 3L)
    // a satisfying write goes through; NULL satisfies (SQL CHECK)
    spark.sql("ALTER TABLE sqlddl_check_v ADD COLUMNS (score DOUBLE)")
    spark.sql("ALTER TABLE sqlddl_check_v ADD CONSTRAINT s_ok CHECK (score >= 0)")
    CommitLog.commit(Seq((7L, "g", null.asInstanceOf[java.lang.Double]))
      .toDF("id", "typ", "score"), t, "append")
    assert(CommitLog.read(spark, t).count() === 4L)
    // UPDATE post-images are constrained too (merge-on-read path)
    val e2 = intercept[Exception] {
      spark.sql("UPDATE sqlddl_check_v SET score = -1 WHERE id = 7")
    }
    assert(e2.getMessage.contains("CHECK constraint s_ok") ||
      Option(e2.getCause).exists(_.getMessage.contains("CHECK constraint s_ok")),
      e2.getMessage)
    // a constrained column cannot be dropped; drop the constraint first
    val e3 = intercept[Exception] {
      spark.sql("ALTER TABLE sqlddl_check_v DROP COLUMN score")
    }
    assert(e3.getMessage.contains("constraint"), e3.getMessage)
    spark.sql("ALTER TABLE sqlddl_check_v DROP CONSTRAINT s_ok")
    spark.sql("ALTER TABLE sqlddl_check_v DROP COLUMN score")
    assert(graft.tx.Constraints.list(t).map(_._1) === Seq("pos"))
  }

  test("CONVERT TO GRAFT wraps an existing parquet directory in place — no data rewrite") {
    val dir = tmpDir("sqlddl_convert"); new java.io.File(dir).delete()
    import spark.implicits._
    Seq((1L, "a", 1.5), (2L, "a", 2.5), (3L, "b", 3.5), (4L, "b", 4.5))
      .toDF("id", "typ", "value")
      .write.partitionBy("typ").parquet(dir)
    val v = spark.sql(s"CONVERT TO GRAFT '$dir' PARTITIONED BY (typ)")
      .collect().head.getLong(0)
    assert(v === 1L)
    // the directory IS a graft table now: snapshot read, hive layout,
    // stats-sidecar pruning, DML all work
    val g = spark.read.format("graft").load(dir)
    assert(g.count() === 4L)
    assert(g.filter(col("typ") === "a").select("id").as[Long].collect().sorted
      .toSeq === Seq(1L, 2L))
    val m = CommitLog.manifest(dir, 1L)
    assert(m.files.forall(_.startsWith("data/")))
    val pruned = CommitLog.pruneFiles(dir, m,
      Seq(org.apache.spark.sql.sources.EqualTo("typ", "a")))
    assert(pruned.size < m.files.size, "partition pruning must work post-convert")
    g.createOrReplaceTempView("sqlddl_conv_v")
    spark.sql("DELETE FROM sqlddl_conv_v WHERE id = 4")
    assert(CommitLog.read(spark, dir).count() === 3L)
    // re-converting refuses; a wrong PARTITIONED BY refuses up front
    val e = intercept[Exception] { spark.sql(s"CONVERT TO GRAFT '$dir'") }
    assert(e.getMessage.contains("already has a commit log"), e.getMessage)
    val dir2 = tmpDir("sqlddl_convert2"); new java.io.File(dir2).delete()
    Seq((1L, "x")).toDF("id", "s").write.parquet(dir2)
    val e2 = intercept[Exception] {
      spark.sql(s"CONVERT TO GRAFT '$dir2' PARTITIONED BY (nope)")
    }
    assert(e2.getMessage.contains("does not match"), e2.getMessage)
    // the refusal happened BEFORE any file moved: the directory is
    // untouched and a correct convert then succeeds over it
    assert(!new java.io.File(dir2, "data").exists())
    assert(spark.read.parquet(dir2).count() === 1L)
    assert(spark.sql(s"CONVERT TO GRAFT '$dir2'").collect().head.getLong(0) === 1L)
    assert(CommitLog.read(spark, dir2).count() === 1L)
  }

  test("round-10 regression: CONVERT unions divergent additive footers") {
    val dir = tmpDir("sqlddl_convevo"); new java.io.File(dir).delete()
    import spark.implicits._
    // a schema-evolved PLAIN parquet directory: the second writer added a
    // column, so the files carry DIVERGENT footers — CONVERT's inferred
    // schema must be the union (mergeSchema), not whichever footer the
    // inference happened to sample (round-10 fix, CommitLog.convert)
    Seq((1L, "a")).toDF("id", "s").write.parquet(dir)
    Seq((2L, "b", 9.0)).toDF("id", "s", "score").write.mode("append").parquet(dir)
    assert(spark.sql(s"CONVERT TO GRAFT '$dir'").collect().head.getLong(0) === 1L)
    val m = CommitLog.manifest(dir, 1L)
    assert(m.schema.fieldNames.toSet === Set("id", "s", "score"))
    def snapshot: Seq[(Long, String, Option[Double])] =
      CommitLog.read(spark, dir).select("id", "s", "score")
        .as[(Long, String, Option[Double])].collect().toSeq.sortBy(_._1)
    // pre-column files read NULL for the evolved column
    assert(snapshot === Seq((1L, "a", None), (2L, "b", Some(9.0))))
    // a post-convert OPTIMIZE keeps the evolved column and its values
    spark.sql(s"OPTIMIZE '$dir'")
    assert(snapshot === Seq((1L, "a", None), (2L, "b", Some(9.0))))
  }

  test("CONVERT resumes an interrupted attempt: relocated files picked up, junk excluded") {
    val dir = tmpDir("sqlddl_convres"); new java.io.File(dir).delete()
    import spark.implicits._
    (0L until 100L).map(i => (i, s"s$i")).toDF("id", "s")
      .repartitionByRange(4, col("id")).write.parquet(dir)
    // simulate a crashed attempt: one file already relocated under a
    // data dir (no sidecar written), plus stray non-parquet junk there
    val crashed = java.nio.file.Paths.get(dir, "data", "crashed-attempt")
    java.nio.file.Files.createDirectories(crashed)
    val src = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(src.toPath, crashed.resolve(src.getName))
    java.nio.file.Files.write(crashed.resolve("junk.txt"), Array[Byte](1))
    val v = spark.sql(s"CONVERT TO GRAFT '$dir'").collect().head.getLong(0)
    assert(v === 1L)
    // nothing lost, junk not published, BOTH halves carry sidecar stats
    assert(CommitLog.read(spark, dir).count() === 100L)
    val m = CommitLog.manifest(dir, 1L)
    assert(m.files.forall(_.endsWith(".parquet")))
    assert(m.files.exists(_.contains("crashed-attempt")))
    val pruned = CommitLog.pruneFiles(dir, m,
      Seq(org.apache.spark.sql.sources.EqualTo("id", 3L)))
    assert(pruned.size === 1, s"resumed files must prune too: $pruned")
  }

  test("a zero-file schema-changing overwrite resets the derived layout") {
    val t = tmpDir("sqlddl_layoutreset"); new java.io.File(t).delete()
    CommitLog.commit(Seq((1L, "a")).toDF("id", "typ"), t, "append",
      partitionBy = Seq("typ"))
    // empty overwrite whose NEW schema has no typ column
    CommitLog.commit(spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType)))), t, "overwrite")
    // the walk-back must NOT resurrect typ (it left the schema): the
    // next SQL INSERT plans unpartitioned instead of failing
    spark.read.format("graft").load(t).createOrReplaceTempView("sqlddl_lr_v")
    spark.sql("INSERT INTO sqlddl_lr_v VALUES (7)")
    val m = CommitLog.manifest(t, CommitLog.latestVersion(t).get)
    assert(m.files.nonEmpty && m.files.forall(!_.contains("typ=")), m.files)
  }

  test("ALTER TABLE on a non-graft table still reaches Spark's grammar") {
    spark.sql("DROP TABLE IF EXISTS sqlddl_plain2")
    spark.sql("CREATE TABLE sqlddl_plain2 (id INT) USING parquet")
    spark.sql("ALTER TABLE sqlddl_plain2 ADD COLUMNS (tag STRING)")
    assert(spark.table("sqlddl_plain2").schema.fieldNames.toSeq ===
      Seq("id", "tag"))
    spark.sql("DROP TABLE sqlddl_plain2")
  }
}
