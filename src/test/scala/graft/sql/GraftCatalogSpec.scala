package graft.sql

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.tx.CommitLog

/** Catalog-named graft tables (round-8 VERDICT item 1) + SQL time travel
  * (item 2): a SQL user addresses tables BY NAME — `CREATE TABLE …
  * USING graft LOCATION`, `spark.table`, INSERT/MERGE/DELETE by name,
  * `DESCRIBE HISTORY` by name, `FROM t VERSION AS OF n` — never touching
  * the Scala API or a hand-rolled temp view. */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  private def freshName(prefix: String): String = { n += 1; s"${prefix}_$n" }

  private def freshTable(prefix: String): String = {
    val table = tmpDir(prefix)
    new java.io.File(table).delete()
    val df = Seq(
      (1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0),
      (4L, "b", 40.0), (5L, "c", 50.0), (6L, "c", 60.0)
    ).toDF("id", "typ", "value")
    CommitLog.commit(df.repartition(3), table, "append")
    table
  }

  test("CREATE TABLE USING graft LOCATION registers an existing table by name") {
    val t = freshTable("cat_reg")
    val name = freshName("cat_events")
    spark.sql(s"CREATE TABLE $name USING graft LOCATION '$t'")
    assert(spark.table(name).count() === 6L)
    assert(spark.sql(s"SELECT sum(value) AS s FROM $name").collect()
      === Array(Row(210.0)))
  }

  test("CREATE TABLE with a schema on a fresh path creates an empty, INSERTable table") {
    val dir = tmpDir("cat_fresh"); new java.io.File(dir).delete()
    val name = freshName("cat_fresh_t")
    spark.sql(
      s"CREATE TABLE $name (id BIGINT, typ STRING, value DOUBLE) USING graft LOCATION '$dir'")
    assert(spark.table(name).count() === 0L)
    // the declared schema landed in the commit log, not just the catalog
    assert(CommitLog.manifest(dir, 1L).schema.fieldNames.toSeq
      === Seq("id", "typ", "value"))
    spark.sql(s"INSERT INTO $name VALUES (1, 'a', 1.5)")
    assert(spark.table(name).collect() === Array(Row(1L, "a", 1.5)))
  }

  test("DML by name routes through the commit log and refreshes the cached relation") {
    val t = freshTable("cat_dml")
    val name = freshName("cat_dml_t")
    spark.sql(s"CREATE TABLE $name USING graft LOCATION '$t'")
    assert(spark.table(name).count() === 6L) // prime the relation cache
    spark.sql(s"DELETE FROM $name WHERE typ = 'b'")
    // the catalog's memoized relation must NOT serve the pre-delete pin
    assert(spark.table(name).count() === 4L)
    spark.sql(s"UPDATE $name SET value = value + 1 WHERE typ = 'a'")
    assert(spark.sql(s"SELECT value FROM $name WHERE id = 1").collect()
      === Array(Row(11.0)))
    spark.sql(s"INSERT INTO $name VALUES (7, 'd', 70.0)")
    assert(spark.table(name).count() === 5L)
    assert(CommitLog.fsck(t).clean) // nothing written behind the manifest
  }

  test("MERGE INTO by name upserts; DESCRIBE HISTORY works by name") {
    val t = freshTable("cat_mrg")
    val name = freshName("cat_mrg_t")
    spark.sql(s"CREATE TABLE $name USING graft LOCATION '$t'")
    Seq((2L, "a", 999.0), (7L, "d", 70.0)).toDF("id", "typ", "value")
      .createOrReplaceTempView("cat_mrg_src")
    spark.sql(
      s"""MERGE INTO $name t USING cat_mrg_src s ON t.id = s.id
          WHEN MATCHED THEN UPDATE SET *
          WHEN NOT MATCHED THEN INSERT *""")
    val got = spark.table(name).orderBy("id").as[(Long, String, Double)].collect()
    assert(got.find(_._1 == 2L).get === ((2L, "a", 999.0)))
    assert(got.find(_._1 == 7L).get === ((7L, "d", 70.0)))
    assert(got.length === 7)
    val hist = spark.sql(s"DESCRIBE HISTORY $name").collect()
    assert(hist.map(_.getLong(0)).toSeq === Seq(2L, 1L))
    assert(hist.head.getString(1) === "merge")
  }

  test("OPTIMIZE and VACUUM accept a table name") {
    val t = freshTable("cat_maint")
    val name = freshName("cat_maint_t")
    spark.sql(s"CREATE TABLE $name USING graft LOCATION '$t'")
    spark.sql(s"DELETE FROM $name WHERE typ = 'c'")
    assert(CommitLog.manifest(t, 2L).dvDirs.nonEmpty)
    spark.sql(s"OPTIMIZE $name")
    val m3 = CommitLog.manifest(t, CommitLog.latestVersion(t).get)
    assert(m3.dvDirs.isEmpty) // folded
    spark.sql(s"VACUUM $name RETAIN 0 HOURS KEEP 1 VERSIONS FORCE")
    assert(CommitLog.versions(t) === Seq(3L))
    assert(spark.table(name).count() === 4L)
    // an unknown name refuses instead of vacuuming some path
    val e = intercept[Exception] { spark.sql("VACUUM cat_no_such_table") }
    assert(e.getMessage.contains("not a catalog table"))
  }

  test("saveAsTable registers a graft table; additive evolution outlives the stored schema") {
    val dir = tmpDir("cat_sat"); new java.io.File(dir).delete()
    val name = freshName("cat_sat_t")
    Seq((1L, "x")).toDF("id", "s").write.format("graft")
      .option("path", dir).saveAsTable(name)
    assert(spark.table(name).collect() === Array(Row(1L, "x")))
    // evolve BEHIND the catalog (Scala surface adds a column); the stored
    // catalog schema is now stale — the manifest must win
    CommitLog.commit(Seq((2L, "y", 3.5)).toDF("id", "s", "v"), dir, "append")
    spark.sql(s"REFRESH TABLE $name") // Scala-surface writes can't invalidate
    val got = spark.table(name).orderBy("id").collect()
    assert(got === Array(Row(1L, "x", null), Row(2L, "y", 3.5)))
  }

  test("CTAS: CREATE TABLE … USING graft LOCATION … AS SELECT is a transactional commit") {
    val dir = tmpDir("cat_ctas"); new java.io.File(dir).delete()
    val name = freshName("cat_ctas_t")
    spark.sql(s"""CREATE TABLE $name USING graft LOCATION '$dir'
                  AS SELECT id, id * 2 AS dbl FROM range(5)""")
    // the data landed THROUGH the commit log: a manifest exists and the
    // by-name read serves it
    assert(CommitLog.latestVersion(dir).contains(1L))
    assert(spark.table(name).count() === 5L)
    assert(spark.table(name).agg(sum(col("dbl"))).head().getLong(0) === 20L)
    // and the table stays DML-able by name
    spark.sql(s"INSERT INTO $name VALUES (9, 18)")
    assert(spark.table(name).count() === 6L)
    assert(CommitLog.latestVersion(dir).contains(2L))
  }

  test("SQL time travel: VERSION AS OF / TIMESTAMP AS OF on a named table") {
    val t = freshTable("cat_tt")
    val name = freshName("cat_tt_t")
    spark.sql(s"CREATE TABLE $name USING graft LOCATION '$t'")
    spark.sql(s"DELETE FROM $name WHERE typ = 'b'")
    assert(spark.table(name).count() === 4L)
    assert(spark.sql(s"SELECT count(*) AS n FROM $name VERSION AS OF 1")
      .collect() === Array(Row(6L)))
    // qualified columns still resolve through the alias
    assert(spark.sql(
      s"SELECT sum(x.value) AS s FROM $name VERSION AS OF 1 AS x")
      .collect() === Array(Row(210.0)))
    // TIMESTAMP AS OF after the last commit reads latest; before the first
    // commit refuses (Delta's contract)
    val afterAll = java.time.Instant.now().plusSeconds(3600).toString
    assert(spark.sql(
      s"SELECT count(*) AS n FROM $name TIMESTAMP AS OF '$afterAll'")
      .collect() === Array(Row(4L)))
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM $name TIMESTAMP AS OF '1999-01-01'").collect()
    }
    assert(e.getMessage.contains("no version committed at or before"))
  }

  test("SQL time travel works on a temp view over a graft path too") {
    val t = freshTable("cat_ttv")
    spark.read.format("graft").load(t).createOrReplaceTempView("cat_ttv_v")
    CommitLog.deleteDv(spark, t, col("typ") === "a")
    assert(spark.sql("SELECT count(*) AS n FROM cat_ttv_v VERSION AS OF 1")
      .collect() === Array(Row(6L)))
    assert(spark.sql("SELECT count(*) AS n FROM cat_ttv_v VERSION AS OF 2")
      .collect() === Array(Row(4L)))
    // a non-graft name keeps Spark's own refusal
    Seq((1, "x")).toDF("id", "s").createOrReplaceTempView("cat_plain_v")
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM cat_plain_v VERSION AS OF 1").collect()
    }
    assert(!e.getMessage.contains("graft"))
  }
}
