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
  *   - `VACUUM '<table root>' [RETAIN <n> HOURS] [KEEP <k> VERSIONS]
  *     [FORCE]` → [[CommitLog.vacuum]] (returns files deleted). FORCE
  *     asserts no writer is in flight, required for sub-default
  *     retention, exactly the Scala surface's contract.
  *   - `OPTIMIZE '<table root>' [ZORDER BY (c1, c2, …)]` →
  *     [[CommitLog.compact]] (returns the new version) — folds deletion
  *     vectors, merges small files, optionally Z-orders.
  *   - `DESCRIBE HISTORY '<table root>'` → one row per version
  *     (version, mode, file/DV-dir/column counts), newest first.
  *
  * Table roots are quoted path literals ('…' or "…") — the same
  * path-first addressing the rest of the graft SQL surface uses. */
final class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.parseMaintenance(sqlText).getOrElse(delegate.parsePlan(sqlText))

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
  private val Vacuum =
    """(?is)\s*VACUUM\s+(?:'([^']+)'|"([^"]+)")(?:\s+RETAIN\s+(\d+)\s+HOURS?)?(?:\s+KEEP\s+(\d+)\s+VERSIONS?)?(\s+FORCE)?\s*;?\s*""".r
  private val Optimize =
    """(?is)\s*OPTIMIZE\s+(?:'([^']+)'|"([^"]+)")(?:\s+ZORDER\s+BY\s*\(([^)]*)\))?\s*;?\s*""".r
  private val History =
    """(?is)\s*DESCRIBE\s+HISTORY\s+(?:'([^']+)'|"([^"]+)")\s*;?\s*""".r

  private def path(a: String, b: String): String = Option(a).getOrElse(b)

  def parseMaintenance(sqlText: String): Option[LogicalPlan] = sqlText match {
    case Vacuum(p1, p2, retain, keep, force) =>
      Some(GraftVacuumCommand(path(p1, p2),
        Option(keep).map(_.toInt).getOrElse(2),
        Option(retain).map(_.toLong * 3600L * 1000L),
        force != null))
    case Optimize(p1, p2, zorder) =>
      Some(GraftOptimizeCommand(path(p1, p2),
        Option(zorder).toSeq.flatMap(_.split(",")).map(_.trim)
          .filter(_.nonEmpty)))
    case History(p1, p2) => Some(GraftHistoryCommand(path(p1, p2)))
    case _ => None
  }
}

/** `VACUUM '<root>' …` — retention GC; returns the number of files
  * deleted. */
case class GraftVacuumCommand(table: String, keepVersions: Int,
    retainMillis: Option[Long], force: Boolean) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("deleted_files", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(CommitLog.vacuum(table, keepVersions,
      retainMillis.getOrElse(CommitLog.DefaultVacuumRetentionMillis), force)))
}

/** `OPTIMIZE '<root>' [ZORDER BY (…)]` — compaction (+ optional
  * Z-ordering); returns the committed version. Re-derives the table's
  * hive layout so rewritten files keep their partition dirs. */
case class GraftOptimizeCommand(table: String, zorderBy: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(CommitLog.compact(spark, table,
      partitionBy = GraftDml.layoutCols(table), zorderBy = zorderBy)))
}

/** `DESCRIBE HISTORY '<root>'` — the commit log, newest first. */
case class GraftHistoryCommand(table: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("mode", StringType, nullable = false)(),
    AttributeReference("n_files", IntegerType, nullable = false)(),
    AttributeReference("n_dv_dirs", IntegerType, nullable = false)(),
    AttributeReference("n_columns", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    CommitLog.versions(table).sorted.reverse.map { v =>
      val m = CommitLog.manifest(table, v)
      Row(v, m.mode, m.files.size, m.dvDirs.size, m.schema.fields.length)
    }
}
