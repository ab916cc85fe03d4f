package graft.sql

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.tx.CommitLog

/** Maintenance SQL ([[GraftSqlParser]]): VACUUM / OPTIMIZE / DESCRIBE
  * HISTORY parse ahead of Spark's grammar, execute as CommitLog calls,
  * and everything else still reaches Spark's parser verbatim. */
class GraftSqlMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(prefix: String): String = {
    val table = tmpDir(prefix)
    new java.io.File(table).delete()
    CommitLog.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "typ"), table, "append")
    CommitLog.commit(Seq((3L, "c")).toDF("id", "typ"), table, "append")
    table
  }

  test("VACUUM with retention/keep/force reclaims old versions") {
    val t = freshTable("sqlmaint_vac")
    CommitLog.commit(Seq((4L, "d")).toDF("id", "typ"), t, "overwrite")
    val out = spark.sql(s"VACUUM '$t' RETAIN 0 HOURS KEEP 1 VERSIONS FORCE")
      .collect()
    assert(out.head.getLong(0) > 0L) // the overwritten files fell
    assert(CommitLog.read(spark, t).count() === 1L)
    assert(CommitLog.versions(t) === Seq(3L))
  }

  test("VACUUM DRY RUN reports what would fall and touches nothing") {
    val t = freshTable("sqlmaint_dry")
    CommitLog.commit(Seq((4L, "d")).toDF("id", "typ"), t, "overwrite")
    val would = spark.sql(s"VACUUM '$t' RETAIN 0 HOURS KEEP 1 VERSIONS FORCE DRY RUN")
      .collect().head.getLong(0)
    assert(would > 0L)
    // nothing moved: all versions and rows still there
    assert(CommitLog.versions(t) === Seq(1L, 2L, 3L))
    assert(spark.read.format("graft").option("versionAsOf", 2).load(t).count() === 3L)
    // the real vacuum then deletes exactly that many files
    val real = spark.sql(s"VACUUM '$t' RETAIN 0 HOURS KEEP 1 VERSIONS FORCE")
      .collect().head.getLong(0)
    assert(real === would)
    assert(CommitLog.versions(t) === Seq(3L))
  }

  test("OPTIMIZE folds deletion vectors and compacts") {
    val t = freshTable("sqlmaint_opt")
    CommitLog.deleteDv(spark, t, col("id") === 2L)
    assert(CommitLog.manifest(t, CommitLog.latestVersion(t).get).dvDirs.nonEmpty)
    val v = spark.sql(s"OPTIMIZE '$t'").collect().head.getLong(0)
    assert(CommitLog.manifest(t, v).dvDirs.isEmpty)
    assert(CommitLog.read(spark, t).select("id").as[Long].collect().sorted
      .toSeq === Seq(1L, 3L))
  }

  test("OPTIMIZE WHERE compacts only the matching partition's files (round-8 item 7)") {
    val t = tmpDir("sqlmaint_optw"); new java.io.File(t).delete()
    val df = Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0), (4L, "b", 4.0))
      .toDF("id", "typ", "value")
    // two hive partitions, several small files each
    CommitLog.commit(df.filter(col("id") <= 2).repartition(2), t, "append",
      partitionBy = Seq("typ"))
    CommitLog.commit(df.filter(col("id") > 2).repartition(2), t, "append",
      partitionBy = Seq("typ"))
    CommitLog.deleteDv(spark, t, col("id") === 2L) // a death inside typ=a
    val before = CommitLog.manifest(t, CommitLog.latestVersion(t).get)
    val aBefore = before.files.filter(_.contains("typ=a"))
    val bBefore = before.files.filter(_.contains("typ=b"))
    val v = spark.sql(s"OPTIMIZE '$t' WHERE typ = 'a'").collect().head.getLong(0)
    val after = CommitLog.manifest(t, v)
    // typ=b files carried BY REFERENCE, typ=a files all rewritten
    assert(bBefore.forall(after.files.contains))
    assert(aBefore.forall(f => !after.files.contains(f)))
    // the rewrite folded typ=a's DV death; rows exact
    assert(CommitLog.read(spark, t).select("id").as[Long].collect().sorted
      .toSeq === Seq(1L, 3L, 4L))
    // a predicate matching nothing is a no-op version-wise
    assert(spark.sql(s"OPTIMIZE '$t' WHERE typ = 'zzz'")
      .collect().head.getLong(0) === v)
    // an UNTRANSLATABLE predicate must refuse, not silently rewrite the
    // whole table (round-9 review finding)
    val e = intercept[Exception] {
      spark.sql(s"OPTIMIZE '$t' WHERE id % 2 = 0")
    }
    assert(e.getMessage.contains("does not translate"), e.getMessage)
    // WHERE composes with ZORDER BY
    val v2 = spark.sql(s"OPTIMIZE '$t' WHERE typ = 'b' ZORDER BY (id)")
      .collect().head.getLong(0)
    assert(v2 === v + 1)
    assert(CommitLog.read(spark, t).count() === 3L)
  }

  test("OPTIMIZE ZORDER BY reclusters without losing rows") {
    val t = freshTable("sqlmaint_z")
    spark.sql(s"""OPTIMIZE "$t" ZORDER BY (id, typ)""")
    assert(CommitLog.read(spark, t).count() === 3L)
  }

  test("ZORDER BY date and timestamp_ntz dimensions analyzes and runs") {
    val table = tmpDir("sqlmaint_zdate")
    new java.io.File(table).delete()
    CommitLog.commit(
      spark.sql(
        """SELECT id, DATE'2024-01-01' + CAST(id AS INT) AS d,
             TIMESTAMP_NTZ'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0, id) AS tn
           FROM range(100)"""),
      table, "append")
    spark.sql(s"OPTIMIZE '$table' ZORDER BY (d, tn)")
    assert(CommitLog.read(spark, table).count() === 100L)
  }

  test("DESCRIBE HISTORY lists versions newest first") {
    val t = freshTable("sqlmaint_hist")
    CommitLog.deleteDv(spark, t, col("id") === 1L)
    val rows = spark.sql(s"DESCRIBE HISTORY '$t'")
      .select("version", "mode").as[(Long, String)].collect()
    assert(rows.map(_._1).toSeq === Seq(3L, 2L, 1L))
    assert(rows.head._2 === "delete")
    assert(rows.last._2 === "append")
  }

  test("everything else still parses through Spark") {
    assert(spark.sql("SELECT 'VACUUM' AS s").collect().head.getString(0) === "VACUUM")
    assert(spark.sql("SELECT 1 + 1").collect().head.getInt(0) === 2)
    intercept[Exception](spark.sql("VACUUM"))
  }
}
