package graft.sql

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.{ParserInterface, ParseException}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructType}

import graft.tx.CommitLog

/** Maintenance SQL for commit-log tables — Delta's utility-statement
  * surface, parsed by a DELEGATING parser (the standard extension
  * pattern: try the graft grammar first, hand everything else to Spark's
  * parser untouched):
  *
  *   - `VACUUM <table> [RETAIN <n> HOURS] [KEEP <k> VERSIONS] [FORCE]` →
  *     [[CommitLog.vacuum]] (returns files deleted). FORCE asserts no
  *     writer is in flight, required for sub-default retention, exactly
  *     the Scala surface's contract.
  *   - `OPTIMIZE <table> [WHERE <predicate>] [ZORDER BY (c1, c2, …)]` →
  *     [[CommitLog.compact]] / [[CommitLog.compactWhere]] (returns the new
  *     version) — folds deletion vectors, merges small files, optionally
  *     Z-orders; WHERE scopes the rewrite to the files the predicate's
  *     stats admit (partition-scoped compaction — at 100 TB a whole-table
  *     OPTIMIZE is not runnable).
  *   - `DESCRIBE HISTORY <table>` → one row per version (version, mode,
  *     file/DV-dir/column counts), newest first.
  *
  * `<table>` is either a quoted path literal ('…' or "…") — the
  * path-first addressing the rest of the graft SQL surface uses — or a
  * bare catalog table name (`CREATE TABLE t USING graft LOCATION …`),
  * resolved through the session catalog ([[GraftCatalog.resolveRoot]]).
  *
  * Plans from Spark's grammar additionally pass through
  * [[GraftTimeTravel.rewrite]]: `FROM t VERSION/TIMESTAMP AS OF …` on a
  * graft name must be claimed BEFORE analysis (Spark's own
  * ResolveRelations throws on v1 time travel ahead of any injected
  * resolution rule). */
final class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.parseMaintenance(sqlText).getOrElse(
      GraftTimeTravel.rewrite(session, delegate.parsePlan(sqlText)))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
}

object GraftSqlParser {
  // target: quoted path ('…' / "…") or a bare (possibly dotted) table name
  private val T = """(?:'([^']+)'|"([^"]+)"|([A-Za-z_][\w.]*))"""
  private val Vacuum =
    ("""(?is)\s*VACUUM\s+""" + T +
      """(?:\s+RETAIN\s+(\d+)\s+HOURS?)?(?:\s+KEEP\s+(\d+)\s+VERSIONS?)?(\s+FORCE)?\s*;?\s*""").r
  private val Optimize =
    ("""(?is)\s*OPTIMIZE\s+""" + T +
      """(?:\s+WHERE\s+(.+?))??(?:\s+ZORDER\s+BY\s*\(([^)]*)\))?\s*;?\s*""").r
  private val History =
    ("""(?is)\s*DESCRIBE\s+HISTORY\s+""" + T + """\s*;?\s*""").r

  /** (target text, wasQuoted) from the three alternation groups. */
  private def target(p1: String, p2: String, id: String): (String, Boolean) =
    Option(p1).map((_, true)).orElse(Option(p2).map((_, true)))
      .getOrElse((id, false))

  def parseMaintenance(sqlText: String): Option[LogicalPlan] = sqlText match {
    case Vacuum(p1, p2, id, retain, keep, force) =>
      val (t, q) = target(p1, p2, id)
      Some(GraftVacuumCommand(t, q,
        Option(keep).map(_.toInt).getOrElse(2),
        Option(retain).map(_.toLong * 3600L * 1000L),
        force != null))
    case Optimize(p1, p2, id, where, zorder) =>
      val (t, q) = target(p1, p2, id)
      Some(GraftOptimizeCommand(t, q, Option(where).map(_.trim),
        Option(zorder).toSeq.flatMap(_.split(",")).map(_.trim)
          .filter(_.nonEmpty)))
    case History(p1, p2, id) =>
      val (t, q) = target(p1, p2, id)
      Some(GraftHistoryCommand(t, q))
    case _ => None
  }
}

/** `VACUUM <table> …` — retention GC; returns the number of files
  * deleted. */
case class GraftVacuumCommand(table: String, quoted: Boolean,
    keepVersions: Int, retainMillis: Option[Long], force: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("deleted_files", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftCatalog.resolveRoot(spark, table, quoted)
    Seq(Row(CommitLog.vacuum(root, keepVersions,
      retainMillis.getOrElse(CommitLog.DefaultVacuumRetentionMillis), force)))
  }
}

/** `OPTIMIZE <table> [WHERE <pred>] [ZORDER BY (…)]` — compaction
  * (+ optional Z-ordering); returns the committed version. Re-derives the
  * table's hive layout so rewritten files keep their partition dirs.
  * WHERE scopes the rewrite: only files whose stats admit the predicate
  * are folded, everything else carries by reference
  * ([[CommitLog.compactWhere]]). */
case class GraftOptimizeCommand(table: String, quoted: Boolean,
    where: Option[String], zorderBy: Seq[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftCatalog.resolveRoot(spark, table, quoted)
    val v = where match {
      case Some(pred) =>
        CommitLog.compactWhere(spark, root,
          org.apache.spark.sql.functions.expr(pred),
          partitionBy = GraftDml.layoutCols(root), zorderBy = zorderBy)
      case None =>
        CommitLog.compact(spark, root,
          partitionBy = GraftDml.layoutCols(root), zorderBy = zorderBy)
    }
    GraftCatalog.invalidateRelationCache(spark)
    Seq(Row(v))
  }
}

/** `DESCRIBE HISTORY <table>` — the commit log, newest first. */
case class GraftHistoryCommand(table: String, quoted: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("mode", StringType, nullable = false)(),
    AttributeReference("n_files", IntegerType, nullable = false)(),
    AttributeReference("n_dv_dirs", IntegerType, nullable = false)(),
    AttributeReference("n_columns", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftCatalog.resolveRoot(spark, table, quoted)
    CommitLog.versions(root).sorted.reverse.map { v =>
      val m = CommitLog.manifest(root, v)
      Row(v, m.mode, m.files.size, m.dvDirs.size, m.schema.fields.length)
    }
  }
}
