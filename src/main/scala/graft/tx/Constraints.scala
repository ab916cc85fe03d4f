package graft.tx

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{coalesce, concat, expr, lit, raise_error}

/** Table-level CHECK constraints (Delta's `ALTER TABLE … ADD CONSTRAINT
  * name CHECK (expr)`): registered once, enforced on EVERY subsequent
  * write through the commit log — appends, copy-on-write rewrites,
  * merge/update post-images, compaction — as a codegen'd predicate FUSED
  * into the write's own scan ([[enforce]]), never a second pass. SQL
  * CHECK semantics: NULL satisfies; a strictly-FALSE row fails the write
  * with the constraint's name and expression.
  *
  * Storage follows [[BloomIndex]]'s table-config precedent: a
  * `_constraints` file at the table root (`name<TAB>expr` lines,
  * atomically replaced). Adding a constraint validates the EXISTING
  * snapshot first (one scan; Delta's contract) so a registered
  * constraint means the whole live table satisfies it — with one
  * documented exception: [[CommitLog.restore]]/[[CommitLog.cloneTable]]
  * republish old files verbatim and may resurrect pre-constraint rows
  * (Delta versions constraints in the log itself; a config file is
  * global across versions).
  *
  * Reference provenance: the reference pipeline has no constraint
  * system — this is engine breadth matching the lakehouse surface its
  * users would expect when switching. */
object Constraints {

  val ConfigName = "_constraints"

  private val NameRe = "[A-Za-z_][A-Za-z0-9_]*".r

  /** Registered constraints, insertion-ordered; empty for tables without
    * any. */
  def list(table: String): Seq[(String, String)] = {
    val p = Paths.get(table).resolve(ConfigName)
    if (!Files.isRegularFile(p)) Nil
    else new String(Files.readAllBytes(p), UTF_8).linesIterator
      .filter(_.nonEmpty).map { l =>
        val i = l.indexOf('\t')
        // a diagnosable refusal beats a StringIndexOutOfBounds from deep
        // inside a write plan (this is consulted on EVERY write)
        require(i > 0, s"malformed $ConfigName line in $table " +
          s"(expected name<TAB>expression): '$l'")
        (l.substring(0, i), l.substring(i + 1))
      }.toSeq
  }

  /** Register `name CHECK (exprSql)`. The expression must resolve
    * against the current schema and the EXISTING snapshot must satisfy
    * it (one scan, stats-pruned where the predicate allows); both
    * refusals happen before anything is written. */
  def add(spark: SparkSession, table: String, name: String, exprSql: String): Unit = {
    require(NameRe.matches(name), s"constraint name '$name' must be an identifier")
    require(!list(table).exists(_._1.equalsIgnoreCase(name)),
      s"$table already has a constraint named '$name'")
    require(!exprSql.contains("\t") && !exprSql.contains("\n"),
      "constraint expression must be single-line")
    val c = expr(exprSql)
    // the whole LIVE table must already satisfy the constraint — scan
    // once, stop at the first violation
    val bad = CommitLog.read(spark, table)
      .where(!coalesce(c, lit(true))).limit(1).count()
    require(bad == 0L,
      s"cannot add constraint '$name': existing rows of $table violate " +
        s"CHECK ($exprSql)")
    writeAll(table, list(table) :+ (name -> exprSql))
  }

  /** Unregister a constraint; unknown names refuse. */
  def drop(table: String, name: String): Unit = {
    val cur = list(table)
    require(cur.exists(_._1.equalsIgnoreCase(name)),
      s"$table has no constraint named '$name'")
    writeAll(table, cur.filterNot(_._1.equalsIgnoreCase(name)))
  }

  /** The write-side enforcement: wrap `df` so every row either satisfies
    * every registered constraint (NULL counts as satisfied) or THROWS
    * with the constraint's name — a single codegen predicate inside the
    * write plan, no extra pass over the data. Falls through untouched
    * for tables without constraints (the common case costs one file
    * stat). */
  private[tx] def enforce(df: DataFrame, tableDir: Path): DataFrame = {
    val cs = list(tableDir.toString)
    if (cs.isEmpty) df
    else df.where(cs.map { case (name, sql) =>
      // short-circuit OR: satisfied/NULL rows never evaluate the error
      coalesce(expr(sql), lit(true)) ||
        raise_error(concat(lit(s"CHECK constraint $name violated: ($sql)")))
          .cast("boolean")
    }.reduce(_ && _))
  }

  /** Column names referenced by registered constraints — the guard
    * [[CommitLog.dropColumns]] consults so a drop cannot strand an
    * unresolvable constraint. Best-effort parse: an unparsable stored
    * expression contributes nothing (it will fail loudly at write time
    * regardless). */
  private[tx] def referencedColumns(table: String): Map[String, Seq[String]] =
    list(table).map { case (name, sql) =>
      val cols =
        try org.apache.spark.sql.catalyst.parser.CatalystSqlParser
          .parseExpression(sql).collect {
            case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
              u.nameParts.head.toLowerCase
          }.distinct
        catch { case scala.util.control.NonFatal(_) => Nil }
      name -> cols
    }.toMap

  private def writeAll(table: String, cs: Seq[(String, String)]): Unit = {
    val dir = Paths.get(table)
    Files.createDirectories(dir)
    val tmp = dir.resolve(s".$ConfigName.tmp${ProcessHandle.current().pid()}")
    Files.write(tmp, cs.map { case (n, e) => s"$n\t$e" }.mkString("\n").getBytes(UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
      StandardOpenOption.WRITE)
    Files.move(tmp, dir.resolve(ConfigName),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }
}
