package graft.sql

import org.apache.spark.sql.{Column, Row, SparkSession, functions => F}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.LongType

import graft.sources.{GraftDvRelation, GraftFileIndex}
import graft.tx.CommitLog

/** SQL DML over commit-log tables — the half of the reference's lake
  * surface the `graft` source didn't yet cover. Reads went SQL-first in
  * round 8 (`spark.read.format("graft")` → temp view → `spark.sql`), and
  * `df.write.format("graft")` is a transactional commit; but mutations
  * (the delta-rs write surface the reference's serving layer implies:
  * upsert-by-PK, row retirement) still required the Scala API. This rule
  * closes the gap: `INSERT INTO` / `DELETE FROM` / `UPDATE` / `MERGE INTO`
  * in `spark.sql(...)` against any temp view over a graft relation execute
  * as commit-log transactions.
  *
  * Architecture — open-source Delta's pre-catalog design: an analyzer rule
  * (injected via [[graft.functions.GraftExtensions]]) rewrites the DML
  * logical plans (`DeleteFromTable`, `UpdateTable`, `MergeIntoTable`,
  * `InsertIntoStatement`) whose target resolves to a graft relation into
  * `LeafRunnableCommand`s backed by [[CommitLog]]'s mutation family.
  * Catalyst never plans these nodes for v1 relations (it would refuse with
  * "only supported with v2 tables"), so the rewrite adds a capability, it
  * doesn't shadow one.
  *
  * `INSERT` interception is a CORRECTNESS requirement, not a convenience:
  * the graft read relation is a real `HadoopFsRelation`, and Spark's own
  * post-hoc analysis would otherwise happily plan
  * `InsertIntoHadoopFsRelationCommand` against it — writing (or on
  * overwrite, DELETING) parquet files behind the commit log's back and
  * corrupting the table. This rule runs in the main resolution batch,
  * before that conversion can happen.
  *
  * Semantics: DML always mutates the table's LATEST snapshot — a temp view
  * created with `versionAsOf` still addresses the table, not the frozen
  * snapshot (same as Delta: time travel is a read concept). Mutations
  * default to merge-on-read deletion vectors (the steady-state trickle
  * shape); set `spark.graft.dml.deletionVectors=false` for copy-on-write.
  */
object GraftDmlRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case d: DeleteFromTable =>
      GraftDml.rootOf(d.table).map { root =>
        GraftDeleteCommand(root,
          GraftDml.toColumn(d.condition, GraftDml.aliasesOf(d.table)))
      }.getOrElse(d)

    case u: UpdateTable =>
      GraftDml.rootOf(u.table).map { root =>
        val aliases = GraftDml.aliasesOf(u.table)
        val names = u.assignments.map(a =>
          GraftDml.nameOf(a.key, "UPDATE SET target", aliases))
        require(names.distinct.size == names.size,
          s"duplicate UPDATE SET targets: ${names.mkString(", ")}")
        val set = u.assignments.map { a =>
          GraftDml.nameOf(a.key, "UPDATE SET target", aliases) ->
            GraftDml.toColumn(a.value, aliases)
        }.toMap
        val cond = u.condition.map(GraftDml.toColumn(_, aliases))
          .getOrElse(F.lit(true))
        GraftUpdateCommand(root, cond, set)
      }.getOrElse(u)

    case m: MergeIntoTable if m.childrenResolved =>
      GraftDml.rootOf(m.targetTable).map { root =>
        GraftDml.translateMerge(m, root)
      }.getOrElse(m)

    case i: InsertIntoStatement =>
      GraftDml.rootOf(i.table).map { root =>
        require(i.partitionSpec.isEmpty && !i.ifPartitionNotExists,
          "INSERT ... PARTITION is not supported on graft tables; the " +
            "hive layout is fixed per table — plain INSERT routes rows " +
            "into the existing partition directories automatically")
        GraftInsertCommand(root, i.query, i.overwrite,
          i.userSpecifiedCols, i.byName)
      }.getOrElse(i)
  }
}

private[graft] object GraftDml {

  /** The command result schema: the committed version, as Delta's DML
    * returns operation metrics. */
  def versionOutput: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  /** Unwrap view/alias layers down to a graft relation's table root.
    * Deliberately does NOT unwrap Project/Filter: DML through a projected
    * or filtered view is not table DML and must keep Spark's own error. */
  @annotation.tailrec
  def rootOf(plan: LogicalPlan): Option[String] = plan match {
    case SubqueryAlias(_, child) => rootOf(child)
    case v: View => rootOf(v.child)
    case lr: LogicalRelation => lr.relation match {
      case h: HadoopFsRelation => h.location match {
        case g: GraftFileIndex => Some(g.tableRoot)
        case _ => None
      }
      case g: GraftDvRelation => Some(g.tableRoot)
      case _ => None
    }
    case _ => None
  }

  /** Re-target a DML expression at a fresh snapshot read: resolved
    * attribute references (bound to the statement's view) become plain
    * name lookups, and STILL-UNRESOLVED names qualified by a known target
    * alias strip to the bare column (round-8 ADVICE, low: if the rule
    * fires mid-resolution, `t.typ` in `DELETE FROM v t WHERE t.typ = …`
    * would otherwise survive into the runtime `df.filter` against the
    * fresh snapshot read, where the alias does not exist). Everything
    * else (literals, functions, unqualified names) passes through — the
    * mutation's own resolution does the rest. */
  def toColumn(e: Expression, aliases: Set[String] = Set.empty): Column =
    ColumnBridge.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
      case u: UnresolvedAttribute if u.nameParts.size == 2 &&
          aliases.contains(u.nameParts.head.toLowerCase) =>
        UnresolvedAttribute.quoted(u.nameParts.last)
    })

  /** Column name of an assignment target / key reference. Multi-part
    * names are accepted ONLY when the qualifier is a known table alias —
    * `t.value` strips to `value`, but `s.x` on a table with a struct `s`
    * (a nested-field reference) and any unknown qualifier refuse loudly
    * instead of silently binding to whatever top-level column shares the
    * last segment (round-8 review finding). */
  def nameOf(e: Expression, what: String,
      allowedQualifiers: Set[String] = Set.empty): String = e match {
    case a: AttributeReference => a.name
    case u: UnresolvedAttribute if u.nameParts.size == 1 => u.nameParts.head
    case u: UnresolvedAttribute if u.nameParts.size == 2 &&
        allowedQualifiers.contains(u.nameParts.head.toLowerCase) =>
      u.nameParts.last
    case other => throw new IllegalArgumentException(
      s"$what must be a plain column (optionally qualified by a table " +
        s"alias), got: ${other.sql}")
  }

  /** The alias names a DML target/source plan answers to (SubqueryAlias
    * layers), lowercased. */
  def aliasesOf(plan: LogicalPlan): Set[String] = plan match {
    case SubqueryAlias(id, child) => aliasesOf(child) + id.name.toLowerCase
    case v: View => aliasesOf(v.child)
    case _ => Set.empty
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** MERGE translation. The commit log's merge is upsert-by-key (the
    * reference's serving semantics, `db-script.cql:37`) plus the key-set
    * delete; the supported SQL shapes are exactly those:
    *
    *  - `WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *`
    *    (or assignment lists that are verbatim `col = source.col` for the
    *    full source schema) → [[CommitLog.mergeDv]] / [[CommitLog.merge]];
    *  - `WHEN MATCHED THEN DELETE` (alone) → [[CommitLog.deleteKeys]].
    *
    * Conditional clauses, partial-column updates, and NOT MATCHED BY
    * SOURCE refuse loudly — silently approximating MERGE semantics would
    * be worse than not having them. */
  def translateMerge(m: MergeIntoTable, root: String): LogicalPlan = {
    val targetOut = m.targetTable.outputSet
    val sourceOut = m.sourceTable.outputSet
    val targetAliases = aliasesOf(m.targetTable)
    val sourceAliases = aliasesOf(m.sourceTable)
    val anyAlias = targetAliases ++ sourceAliases
    def side(e: Expression): Option[Boolean] = e match { // Some(true)=target
      case a: AttributeReference if targetOut.contains(a) => Some(true)
      case a: AttributeReference if sourceOut.contains(a) => Some(false)
      case _ => None
    }
    val keys = conjuncts(m.mergeCondition).map {
      case EqualTo(l, r) =>
        val (ln, rn) = (nameOf(l, "MERGE ON reference", anyAlias),
          nameOf(r, "MERGE ON reference", anyAlias))
        require(ln.equalsIgnoreCase(rn),
          s"MERGE ON must equate same-named key columns (upsert-by-key), got $ln = $rn")
        // when resolved, insist the two sides actually straddle the tables
        (side(l), side(r)) match {
          case (Some(a), Some(b)) => require(a != b,
            s"MERGE ON $ln = $rn compares one table with itself")
          case _ => ()
        }
        ln
      case other => throw new IllegalArgumentException(
        "MERGE ON must be a conjunction of key equalities " +
          s"(upsert-by-key), got: ${other.sql}")
    }

    def unconditional(c: Option[Expression], what: String): Unit =
      require(c.isEmpty, s"conditional $what clauses are not supported on graft tables")
    // `UPDATE SET a = s.a, …` written out longhand is still SET * iff every
    // assignment is the same-named SOURCE column — a target-qualified value
    // (`SET value = t.value`, intent: keep the target's) is NOT the star
    // shape and must refuse, resolved or not (round-8 review finding)
    def isIdentity(as: Seq[Assignment]): Boolean = as.forall { a =>
      a.value match {
        case v: AttributeReference =>
          side(v).forall(_ == false) &&
            nameOf(a.key, "SET", targetAliases).equalsIgnoreCase(v.name)
        case v: UnresolvedAttribute =>
          val fromSource = v.nameParts.size == 1 ||
            (v.nameParts.size == 2 &&
              sourceAliases.contains(v.nameParts.head.toLowerCase) &&
              !targetAliases.contains(v.nameParts.head.toLowerCase))
          fromSource &&
            nameOf(a.key, "SET", targetAliases).equalsIgnoreCase(v.nameParts.last)
        case _ => false
      }
    }

    require(m.notMatchedBySourceActions.isEmpty,
      "WHEN NOT MATCHED BY SOURCE is not supported on graft tables")

    (m.matchedActions, m.notMatchedActions) match {
      case (Seq(DeleteAction(cond)), Seq()) =>
        unconditional(cond, "DELETE")
        GraftMergeCommand(root, m.sourceTable, keys, delete = true)
      case (matched, notMatched) =>
        matched match {
          case Seq(UpdateStarAction(c)) => unconditional(c, "UPDATE")
          // the analyzer may have expanded SET * into an assignment list
          // already (fromStar = true) — still the star shape
          case Seq(UpdateAction(c, as, fromStar)) =>
            unconditional(c, "UPDATE")
            require(fromStar || isIdentity(as),
              "MERGE UPDATE must be SET * (or verbatim col = source.col) — " +
                "partial-column updates are not supported on graft tables")
          case Seq() => throw new IllegalArgumentException(
            "MERGE without WHEN MATCHED is not supported on graft tables " +
              "(insert-only merge: filter the source with an anti-join and INSERT)")
          case other => throw new IllegalArgumentException(
            s"unsupported MERGE matched clauses on graft table: $other")
        }
        notMatched match {
          case Seq(InsertStarAction(c)) => unconditional(c, "INSERT")
          case Seq(InsertAction(c, as)) =>
            unconditional(c, "INSERT")
            require(isIdentity(as),
              "MERGE INSERT must be * (or verbatim col = source.col)")
          case other => throw new IllegalArgumentException(
            s"unsupported MERGE not-matched clauses on graft table: $other")
        }
        GraftMergeCommand(root, m.sourceTable, keys, delete = false)
    }
  }

  /** The table's hive layout (partition columns parsed from the current
    * manifest's directory segments) — mutations re-write surviving rows in
    * the SAME layout, and inserts route new rows into it. */
  def layoutCols(table: String): Seq[String] =
    CommitLog.latestVersion(table).toSeq.flatMap { v =>
      CommitLog.manifest(table, v).files.headOption.toSeq.flatMap(
        _.split("/").dropRight(1).toSeq.filter(_.contains("="))
          .map(_.takeWhile(_ != '=')))
    }.distinct

  /** Merge-on-read (deletion vectors) unless the session opts into
    * copy-on-write. */
  def useDv(spark: SparkSession): Boolean =
    spark.conf.getOption("spark.graft.dml.deletionVectors").forall(_.toBoolean)
}

/** `DELETE FROM <graft view> WHERE cond` → [[CommitLog.deleteDv]] (or
  * copy-on-write [[CommitLog.delete]] under
  * `spark.graft.dml.deletionVectors=false`). Returns the committed
  * version. */
case class GraftDeleteCommand(table: String, condition: Column)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftDml.versionOutput
  override def run(spark: SparkSession): Seq[Row] = {
    val v =
      if (GraftDml.useDv(spark)) CommitLog.deleteDv(spark, table, condition)
      else CommitLog.delete(spark, table, condition, GraftDml.layoutCols(table))
    GraftCatalog.invalidateRelationCache(spark)
    Seq(Row(v))
  }
}

/** `UPDATE <graft view> SET a = expr, … [WHERE cond]` →
  * [[CommitLog.updateDv]] / [[CommitLog.update]]. */
case class GraftUpdateCommand(table: String, condition: Column,
    set: Map[String, Column]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftDml.versionOutput
  override def run(spark: SparkSession): Seq[Row] = {
    val v =
      if (GraftDml.useDv(spark)) CommitLog.updateDv(spark, table, condition, set)
      else CommitLog.update(spark, table, condition, set, GraftDml.layoutCols(table))
    GraftCatalog.invalidateRelationCache(spark)
    Seq(Row(v))
  }
}

/** `MERGE INTO <graft view> USING src ON t.k = s.k …` — the upsert
  * ([[CommitLog.mergeDv]] / [[CommitLog.merge]]) or key-set delete
  * ([[CommitLog.deleteKeys]]) shapes; see
  * [[GraftDml.translateMerge]] for the supported subset. The source plan
  * is carried unresolved-as-written and analyzed at run time. */
case class GraftMergeCommand(table: String, source: LogicalPlan,
    keys: Seq[String], delete: Boolean) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftDml.versionOutput
  override def run(spark: SparkSession): Seq[Row] = {
    val src = ColumnBridge.ofRows(spark, source)
    val v =
      if (delete)
        CommitLog.deleteKeys(spark, table,
          src.select(keys.map(F.col): _*), keys, GraftDml.layoutCols(table))
      else if (GraftDml.useDv(spark))
        CommitLog.mergeDv(spark, table, src, keys, GraftDml.layoutCols(table))
      else
        CommitLog.merge(spark, table, src, keys, GraftDml.layoutCols(table))
    GraftCatalog.invalidateRelationCache(spark)
    Seq(Row(v))
  }
}

/** `INSERT INTO / INSERT OVERWRITE <graft view>` →
  * [[CommitLog.commit]] append/overwrite — NEVER Spark's
  * `InsertIntoHadoopFsRelationCommand`, which would write files behind the
  * commit log (see [[GraftDmlRule]]). Positional semantics: query columns
  * map to the table schema (or the user-specified column list) in order
  * and are cast to the declared types; columns left unspecified read NULL
  * through the additive-evolution path. `byName` (DataFrame
  * `insertInto`/INSERT BY NAME) aligns by name instead. */
case class GraftInsertCommand(table: String, query: LogicalPlan,
    overwrite: Boolean, userCols: Seq[String], byName: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftDml.versionOutput
  override def run(spark: SparkSession): Seq[Row] = {
    val df0 = ColumnBridge.ofRows(spark, query)
    val targetSchema = CommitLog.latestVersion(table)
      .map(v => CommitLog.manifest(table, v).schema)
    val df =
      if (byName) targetSchema match {
        // BY NAME still validates: a misspelled column must error, not
        // silently become a new column via additive evolution
        // (round-8 review finding)
        case Some(schema) =>
          val unknown = df0.columns.filterNot(n =>
            schema.fields.exists(_.name.equalsIgnoreCase(n)))
          require(unknown.isEmpty,
            s"INSERT BY NAME columns not in $table: ${unknown.mkString(", ")} " +
              s"(schema: ${schema.fieldNames.mkString(", ")})")
          df0.select(df0.columns.toIndexedSeq.map { n =>
            val f = schema.fields.find(_.name.equalsIgnoreCase(n)).get
            F.col(n).cast(f.dataType).as(f.name)
          }: _*)
        case None => df0
      }
      else {
        val names =
          if (userCols.nonEmpty) userCols
          else targetSchema.map(_.fieldNames.toSeq).getOrElse(df0.columns.toSeq)
        require(df0.columns.length == names.length,
          s"INSERT column count mismatch: query produces ${df0.columns.length} " +
            s"columns, target expects ${names.length} (${names.mkString(", ")})")
        val renamed = df0.toDF(names: _*)
        targetSchema match {
          case Some(schema) => renamed.select(names.map { n =>
            schema.fields.find(_.name.equalsIgnoreCase(n)) match {
              case Some(f) => F.col(n).cast(f.dataType).as(f.name)
              case None => throw new IllegalArgumentException(
                s"INSERT column '$n' does not exist in $table " +
                  s"(schema: ${schema.fieldNames.mkString(", ")})")
            }
          }: _*)
          case None => renamed
        }
      }
    val v = CommitLog.commit(df, table,
      if (overwrite) "overwrite" else "append", GraftDml.layoutCols(table))
    // the catalog's memoized relation (spark.table) pins the pre-DML
    // manifest — drop it so by-name readers see this commit
    GraftCatalog.invalidateRelationCache(spark)
    Seq(Row(v))
  }
}
