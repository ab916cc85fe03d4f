package graft.sql

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.tx.CommitLog

/** Conditional SQL MERGE (round-8 VERDICT item 4) —
  * [[CommitLog.mergeConditionalDv]] through [[GraftDmlRule]]: first-match-
  * wins matched clauses, conditional inserts, NOT MATCHED BY SOURCE
  * deletes, and the CDC-apply shape with a routing flag column that never
  * lands in the table. All merge-on-read: every pre-merge data file must
  * survive by reference. */
class GraftSqlMergeConditionalSpec extends SparkSpec {
  import spark.implicits._

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

  private def view(table: String, name: String): String = {
    spark.read.format("graft").load(table).createOrReplaceTempView(name)
    name
  }

  private def rows(table: String): Seq[(Long, String, Double)] =
    CommitLog.read(spark, table).select("id", "typ", "value")
      .as[(Long, String, Double)].collect().toSeq.sortBy(_._1)

  test("two-clause conditional merge routes first-match-wins; no file rewritten") {
    val t = freshTable("mrgc_two")
    val v = view(t, "mrgc_two_v")
    Seq((1L, "x", 500.0), (2L, "x", 5.0), (9L, "d", 90.0))
      .toDF("id", "typ", "value").createOrReplaceTempView("mrgc_two_src")
    spark.sql(
      s"""MERGE INTO $v t USING mrgc_two_src s ON t.id = s.id
          WHEN MATCHED AND s.value > 100 THEN DELETE
          WHEN MATCHED THEN UPDATE SET value = s.value
          WHEN NOT MATCHED THEN INSERT *""")
    // id 1: source value 500 > 100 → deleted; id 2: updated to 5.0 (typ
    // kept — partial SET); id 9: inserted
    assert(rows(t) === Seq((2L, "a", 5.0), (3L, "b", 30.0), (4L, "b", 40.0),
      (5L, "c", 50.0), (6L, "c", 60.0), (9L, "d", 90.0)))
    // merge-on-read: every v1 file carried by reference
    val m1 = CommitLog.manifest(t, 1L).files
    val m2 = CommitLog.manifest(t, 2L)
    assert(m1.forall(m2.files.contains))
    assert(m2.dvDirs.nonEmpty)
  }

  test("first-match-wins: an earlier broad clause shadows a later one") {
    val t = freshTable("mrgc_order")
    val v = view(t, "mrgc_order_v")
    Seq((1L, "x", 500.0)).toDF("id", "typ", "value")
      .createOrReplaceTempView("mrgc_order_src")
    // both conditions hold for the pair (500 > 10 and > 100); the FIRST
    // clause must claim it (Spark's grammar already forbids a non-last
    // UNconditional clause, so overlap only happens between conditionals)
    spark.sql(
      s"""MERGE INTO $v t USING mrgc_order_src s ON t.id = s.id
          WHEN MATCHED AND s.value > 10 THEN UPDATE SET value = s.value
          WHEN MATCHED AND s.value > 100 THEN DELETE""")
    assert(rows(t).find(_._1 == 1L).get === ((1L, "a", 500.0)))
    assert(rows(t).size === 6)
  }

  test("a matched pair no clause claims survives untouched") {
    val t = freshTable("mrgc_unclaimed")
    val v = view(t, "mrgc_unclaimed_v")
    Seq((1L, "x", 5.0), (2L, "x", 500.0)).toDF("id", "typ", "value")
      .createOrReplaceTempView("mrgc_unclaimed_src")
    spark.sql(
      s"""MERGE INTO $v t USING mrgc_unclaimed_src s ON t.id = s.id
          WHEN MATCHED AND s.value > 100 THEN UPDATE SET value = s.value""")
    // id 1's source value is 5 (≤ 100): pair matched but unclaimed — row
    // unchanged; id 2 updated
    assert(rows(t).find(_._1 == 1L).get === ((1L, "a", 10.0)))
    assert(rows(t).find(_._1 == 2L).get === ((2L, "a", 500.0)))
  }

  test("WHEN NOT MATCHED BY SOURCE THEN DELETE retires unmatched target rows") {
    val t = freshTable("mrgc_bysrc")
    val v = view(t, "mrgc_bysrc_v")
    Seq((1L, "a", 11.0), (2L, "a", 21.0)).toDF("id", "typ", "value")
      .createOrReplaceTempView("mrgc_bysrc_src")
    spark.sql(
      s"""MERGE INTO $v t USING mrgc_bysrc_src s ON t.id = s.id
          WHEN MATCHED THEN UPDATE SET *
          WHEN NOT MATCHED BY SOURCE AND t.typ <> 'c' THEN DELETE""")
    // ids 1,2 updated; ids 3,4 (typ b, unmatched) deleted; ids 5,6 (typ c)
    // survive the conditional by-source delete
    assert(rows(t) === Seq((1L, "a", 11.0), (2L, "a", 21.0),
      (5L, "c", 50.0), (6L, "c", 60.0)))
  }

  test("WHEN NOT MATCHED BY SOURCE THEN UPDATE rewrites unmatched target rows in place") {
    val t = freshTable("mrgc_bysrcupd")
    val v = view(t, "mrgc_bysrcupd_v")
    Seq((1L, "a", 11.0)).toDF("id", "typ", "value")
      .createOrReplaceTempView("mrgc_bysrcupd_src")
    spark.sql(
      s"""MERGE INTO $v t USING mrgc_bysrcupd_src s ON t.id = s.id
          WHEN MATCHED THEN UPDATE SET *
          WHEN NOT MATCHED BY SOURCE AND t.typ = 'b' THEN DELETE
          WHEN NOT MATCHED BY SOURCE AND t.value < 55 THEN UPDATE SET value = t.value + 1000""")
    // id 1 matched-updated; ids 3,4 (typ b) die on the FIRST by-source
    // clause; ids 2 and 5 (values 20, 50 < 55) take the second clause's
    // update; id 6 (typ c, value 60) matches no clause and survives
    assert(rows(t) === Seq((1L, "a", 11.0), (2L, "a", 1020.0),
      (5L, "c", 1050.0), (6L, "c", 60.0)))
    // still merge-on-read: the by-source update retires by position
    val m1 = CommitLog.manifest(t, 1L).files
    val m2 = CommitLog.manifest(t, CommitLog.latestVersion(t).get)
    assert(m1.forall(m2.files.contains))
    assert(m2.dvDirs.nonEmpty)
    // and the change feed journals it as a real update
    val feed = CommitLog.changeFeed(spark, t, 1L)
      .filter(col("id") === 5L)
      .select(col(CommitLog.ChangeTypeCol), col("value"))
      .as[(String, Double)].collect().toSeq.sorted
    assert(feed === Seq(("update_postimage", 1050.0), ("update_preimage", 50.0)))
  }

  test("NOT MATCHED BY SOURCE UPDATE SET * refuses (no source row to copy)") {
    val t = freshTable("mrgc_bysrcstar")
    val v = view(t, "mrgc_bysrcstar_v")
    Seq((1L, "a", 11.0)).toDF("id", "typ", "value")
      .createOrReplaceTempView("mrgc_bysrcstar_src")
    val e = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO $v t USING mrgc_bysrcstar_src s ON t.id = s.id
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED BY SOURCE THEN UPDATE SET value = s.value""")
    }
    // Spark's own resolver may reject the source reference first (the
    // by-source assignment scope is target-only) — either refusal is the
    // contract
    assert(e.getMessage.contains("may only reference the target") ||
      e.getMessage.contains("meaningless") ||
      e.getMessage.contains("cannot be resolved"), e.getMessage)
  }

  test("conditional INSERT gates unmatched source rows") {
    val t = freshTable("mrgc_condins")
    val v = view(t, "mrgc_condins_v")
    Seq((8L, "d", 5.0), (9L, "d", 95.0)).toDF("id", "typ", "value")
      .createOrReplaceTempView("mrgc_condins_src")
    spark.sql(
      s"""MERGE INTO $v t USING mrgc_condins_src s ON t.id = s.id
          WHEN MATCHED THEN UPDATE SET *
          WHEN NOT MATCHED AND s.value > 50 THEN INSERT *""")
    assert(rows(t).map(_._1) === Seq(1L, 2L, 3L, 4L, 5L, 6L, 9L))
  }

  test("insert-only merge (no WHEN MATCHED) appends unmatched source rows only") {
    val t = freshTable("mrgc_insonly")
    val v = view(t, "mrgc_insonly_v")
    Seq((1L, "x", 999.0), (8L, "d", 80.0)).toDF("id", "typ", "value")
      .createOrReplaceTempView("mrgc_insonly_src")
    spark.sql(
      s"""MERGE INTO $v t USING mrgc_insonly_src s ON t.id = s.id
          WHEN NOT MATCHED THEN INSERT *""")
    // id 1 matched → untouched (no matched clause); id 8 inserted
    assert(rows(t).find(_._1 == 1L).get === ((1L, "a", 10.0)))
    assert(rows(t).map(_._1) === Seq(1L, 2L, 3L, 4L, 5L, 6L, 8L))
  }

  test("CDC-apply shape: op flag routes deletes/updates/inserts and never lands in the table") {
    val t = freshTable("mrgc_cdc")
    val v = view(t, "mrgc_cdc_v")
    Seq((1L, "a", 0.0, "D"), (2L, "a", 22.0, "U"), (9L, "d", 90.0, "I"))
      .toDF("id", "typ", "value", "op").createOrReplaceTempView("mrgc_cdc_src")
    spark.sql(
      s"""MERGE INTO $v t USING mrgc_cdc_src s ON t.id = s.id
          WHEN MATCHED AND s.op = 'D' THEN DELETE
          WHEN MATCHED THEN UPDATE SET value = s.value, typ = s.typ
          WHEN NOT MATCHED AND s.op <> 'D' THEN INSERT *""")
    assert(rows(t) === Seq((2L, "a", 22.0), (3L, "b", 30.0), (4L, "b", 40.0),
      (5L, "c", 50.0), (6L, "c", 60.0), (9L, "d", 90.0)))
    // the routing column stayed out of the table schema
    assert(CommitLog.read(spark, t).columns.toSeq === Seq("id", "typ", "value"))
    // the change feed serves the typed routing
    val feed = CommitLog.changeFeed(spark, t, 1L)
      .groupBy(CommitLog.ChangeTypeCol).count()
      .as[(String, Long)].collect().toMap
    assert(feed === Map("delete" -> 1L, "update_preimage" -> 1L,
      "update_postimage" -> 1L, "insert" -> 1L))
  }

  test("conditional merge refuses copy-on-write mode instead of switching semantics") {
    val t = freshTable("mrgc_cow")
    val v = view(t, "mrgc_cow_v")
    Seq((1L, "x", 5.0)).toDF("id", "typ", "value")
      .createOrReplaceTempView("mrgc_cow_src")
    spark.conf.set("spark.graft.dml.deletionVectors", "false")
    try {
      val e = intercept[Exception] {
        spark.sql(
          s"""MERGE INTO $v t USING mrgc_cow_src s ON t.id = s.id
              WHEN MATCHED AND s.value > 1 THEN DELETE""")
      }
      assert(e.getMessage.contains("merge-on-read only"))
    } finally spark.conf.unset("spark.graft.dml.deletionVectors")
  }

  test("duplicate source keys still refuse in the conditional tier") {
    val t = freshTable("mrgc_dup")
    val v = view(t, "mrgc_dup_v")
    Seq((1L, "x", 1.0), (1L, "y", 2.0)).toDF("id", "typ", "value")
      .createOrReplaceTempView("mrgc_dup_src")
    val e = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO $v t USING mrgc_dup_src s ON t.id = s.id
            WHEN MATCHED AND s.value > 0 THEN UPDATE SET value = s.value""")
    }
    assert(e.getMessage.contains("multiple rows"))
  }

  test("Scala surface: mergeConditionalDv with txn idempotence") {
    val t = freshTable("mrgc_txn")
    val src = Seq((1L, "x", 111.0)).toDF("id", "typ", "value")
    val clause = Seq(CommitLog.MatchedClause(
      Some(col("__src_value") > 100), Some(Map("value" -> col("__src_value")))))
    val v2 = CommitLog.mergeConditionalDv(spark, t, src, Seq("id"), clause,
      txn = Some(("mrgc-app", 1L)))
    assert(v2 === 2L)
    // replayed batch re-applies nothing
    val v2b = CommitLog.mergeConditionalDv(spark, t, src, Seq("id"), clause,
      txn = Some(("mrgc-app", 1L)))
    assert(v2b === 2L)
    assert(CommitLog.latestVersion(t).get === 2L)
    assert(rows(t).find(_._1 == 1L).get === ((1L, "a", 111.0)))
  }

  test("round-10 regression: mixed-case SET key and ON key resolve to the schema column") {
    val t = freshTable("mrgc_case")
    val v = view(t, "mrgc_case_v")
    Seq((2L, "z", 21.0)).toDF("id", "typ", "value")
      .createOrReplaceTempView("mrgc_case_src")
    // `SET Value` against column `value`, `ON t.Id` against column `id`:
    // both must resolve case-insensitively (Spark's default resolution),
    // not refuse with "cannot add column" / "no key column"
    spark.sql(
      s"""MERGE INTO $v t USING mrgc_case_src s ON t.Id = s.id
          WHEN MATCHED AND s.value > 0 THEN UPDATE SET Value = s.value + 1""")
    assert(rows(t).find(_._1 == 2L).get === ((2L, "a", 22.0)))
  }

  test("conflicting SET assignments differing only by case refuse (no last-wins)") {
    val t = freshTable("mrgc_dupset")
    val v = view(t, "mrgc_dupset_v")
    Seq((2L, "z", 21.0)).toDF("id", "typ", "value")
      .createOrReplaceTempView("mrgc_dupset_src")
    val e = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO $v t USING mrgc_dupset_src s ON t.id = s.id
            WHEN MATCHED AND s.value > 0 THEN UPDATE SET Value = 1.0, value = 2.0""")
    }
    assert(e.getMessage.contains("conflicting SET assignments"), e.getMessage)
    // nothing committed
    assert(CommitLog.latestVersion(t).get === 1L)
  }

  test("a case-ambiguous schema refuses a case-insensitive SET instead of binding arbitrarily") {
    val t = tmpDir("mrgc_ambig"); new java.io.File(t).delete()
    // a table written under caseSensitive semantics CAN hold two fields
    // differing only by case — parquet and the manifest both allow it
    // (the default-conf write path refuses the duplicate up front)
    spark.conf.set("spark.sql.caseSensitive", "true")
    try CommitLog.commit(Seq((1L, 1.0, 2.0)).toDF("id", "value", "Value"),
      t, "append")
    finally spark.conf.unset("spark.sql.caseSensitive")
    val src = Seq((1L, 9.0)).toDF("id", "x")
    val clause = Seq(CommitLog.MatchedClause(None,
      Some(Map("VALUE" -> col("__src_x")))))
    val e = intercept[IllegalArgumentException] {
      CommitLog.mergeConditionalDv(spark, t, src, Seq("id"), clause)
    }
    assert(e.getMessage.contains("ambiguous"), e.getMessage)
    // the refusal happened before anything was written
    assert(CommitLog.latestVersion(t).get === 1L)
  }
}
