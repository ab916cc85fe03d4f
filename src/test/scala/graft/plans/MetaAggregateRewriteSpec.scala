package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.tx.CommitLog

/** [[MetaAggregateRewrite]]: whole-table COUNT/MIN/MAX over a graft view
  * collapse to a metadata-derived LocalRelation (no scan, no job); any
  * shape outside the airtight subset leaves the plan untouched and the
  * scan answers. */
class MetaAggregateRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(prefix: String): String = {
    val table = tmpDir(prefix)
    new java.io.File(table).delete()
    CommitLog.commit(
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, null.asInstanceOf[String], 30.0))
        .toDF("id", "typ", "value").repartition(2),
      table, "append")
    table
  }

  private def metaOnly(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectFirst { case l: LocalRelation => l }
      .isDefined &&
      df.queryExecution.optimizedPlan.collectFirst {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
      }.isEmpty

  test("whole-table COUNT/MIN/MAX collapse to metadata") {
    val t = freshTable("metaagg_basic")
    spark.read.format("graft").load(t).createOrReplaceTempView("metaagg_v")
    val df = spark.sql(
      """SELECT count(*) AS n, min(id) AS lo, max(id) AS hi, count(typ) AS nt
         FROM metaagg_v""")
    assert(metaOnly(df), df.queryExecution.optimizedPlan.toString)
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq === Seq((3L, 1L, 3L, 2L)))
  }

  test("constant label columns folded into the Aggregate still rewrite") {
    val t = freshTable("metaagg_lit")
    spark.read.format("graft").load(t).createOrReplaceTempView("metaagg_lit_v")
    // CollapseProject folds the literal into the Aggregate's output — the
    // exact shape a withColumn(lit(...)) produces (found live)
    val df = spark.sql(
      "SELECT count(*) AS n, 'tagged' AS tag, TRUE AS ok FROM metaagg_lit_v")
    assert(metaOnly(df), df.queryExecution.optimizedPlan.toString)
    val r = df.collect().head
    assert((r.getLong(0), r.getString(1), r.getBoolean(2)) === ((3L, "tagged", true)))
  }

  test("filters, grouping, and non-meta aggregates keep the scan") {
    val t = freshTable("metaagg_scan")
    spark.read.format("graft").load(t).createOrReplaceTempView("metaagg_scan_v")
    val filtered = spark.sql("SELECT count(*) AS n FROM metaagg_scan_v WHERE id > 1")
    assert(!metaOnly(filtered))
    assert(filtered.collect().head.getLong(0) === 2L)
    val grouped = spark.sql(
      "SELECT typ, count(*) AS n FROM metaagg_scan_v GROUP BY typ")
    assert(!metaOnly(grouped))
    assert(grouped.count() === 3L)
    val avg = spark.sql("SELECT avg(value) AS a, count(*) AS n FROM metaagg_scan_v")
    assert(!metaOnly(avg))
    assert(avg.collect().head.getDouble(0) === 20.0)
  }

  test("COUNT of partition-path and uncollected-type columns never answers 0") {
    val table = tmpDir("metaagg_guard")
    new java.io.File(table).delete()
    CommitLog.commit(
      Seq((1L, "a", BigDecimal("1.50")), (2L, "b", BigDecimal("2.25")))
        .toDF("id", "par", "dec"),
      table, "append", partitionBy = Seq("par"))
    spark.read.format("graft").load(table).createOrReplaceTempView("metaagg_guard_v")
    // partition-path column: footers never record it — must scan, not 0
    val p = spark.sql("SELECT count(par) AS n FROM metaagg_guard_v")
    assert(!metaOnly(p))
    assert(p.collect().head.getLong(0) === 2L)
    // decimal column: stats uncollected — must scan, not 0
    val d = spark.sql("SELECT count(dec) AS n FROM metaagg_guard_v")
    assert(!metaOnly(d))
    assert(d.collect().head.getLong(0) === 2L)
    // while a genuinely-evolved-in column still answers from metadata
    CommitLog.commit(Seq((3L, "c", BigDecimal("3.00"), "late"))
      .toDF("id", "par", "dec", "tag"), table, "append", partitionBy = Seq("par"))
    spark.read.format("graft").load(table).createOrReplaceTempView("metaagg_guard_v2")
    val t = spark.sql("SELECT count(*) AS n, count(tag) AS nt FROM metaagg_guard_v2")
    assert(metaOnly(t), t.queryExecution.optimizedPlan.toString)
    assert(t.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((3L, 1L)))
  }

  test("the conf kill-switch disables the rewrite") {
    val t = freshTable("metaagg_off")
    spark.read.format("graft").load(t).createOrReplaceTempView("metaagg_off_v")
    spark.conf.set("spark.graft.sql.metaAggregates", "false")
    try {
      val df = spark.sql("SELECT count(*) AS n FROM metaagg_off_v")
      assert(!metaOnly(df))
      assert(df.collect().head.getLong(0) === 3L)
    } finally spark.conf.unset("spark.graft.sql.metaAggregates")
  }

  test("a versionAsOf view answers for ITS version") {
    val t = freshTable("metaagg_tt")
    CommitLog.commit(Seq((9L, "z", 90.0)).toDF("id", "typ", "value"), t, "append")
    spark.read.format("graft").option("versionAsOf", 1).load(t)
      .createOrReplaceTempView("metaagg_tt_v1")
    val df = spark.sql("SELECT count(*) AS n, max(id) AS hi FROM metaagg_tt_v1")
    assert(metaOnly(df))
    assert(df.collect().head.getLong(0) === 3L)
    assert(df.collect().head.getLong(1) === 3L)
  }

  test("COUNT(*) and bounds stay metadata-exact under deletion vectors") {
    val t = freshTable("metaagg_dv")
    CommitLog.deleteDv(spark, t, col("id") === 2L)
    spark.read.format("graft").load(t).createOrReplaceTempView("metaagg_dv_v")
    val cnt = spark.sql("SELECT count(*) AS n FROM metaagg_dv_v")
    assert(cnt.collect().head.getLong(0) === 2L)
    // bounds under DVs re-aggregate the death-carrying files live (round-8
    // item 6) — whatever metaAggregate decides, the ANSWER must stay
    // correct (rewrite fires only when airtight)
    val mm = spark.sql("SELECT min(id) AS lo, max(id) AS hi FROM metaagg_dv_v")
    assert(mm.collect().head.getLong(0) === 1L)
    assert(mm.collect().head.getLong(1) === 3L)
    // and the dead extremum itself must not surface
    CommitLog.deleteDv(spark, t, col("id") === 3L)
    spark.read.format("graft").load(t).createOrReplaceTempView("metaagg_dv_v")
    val mm2 = spark.sql("SELECT min(id) AS lo, max(id) AS hi FROM metaagg_dv_v")
    assert(mm2.collect().head.getLong(1) === 1L)
  }
}
