package graft.queries

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tx.CommitLog

/** Transactional-commit-log queries (round-2 VERDICT item 3 — the
  * reference's Delta semantics: atomic append, snapshot read, additive
  * schema evolution, time travel). The table is BUILT by the query itself —
  * two committed appends of disjoint halves of `events`, the second adding a
  * column — and then read back through the snapshot path, so the DuckDB
  * oracle over the original parquet certifies the whole
  * commit→manifest→snapshot pipeline end-to-end. */
object TxQueries {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** (tablePath, v1, v2) per sf dir; built once per session, wiped first so
    * reruns in a fresh JVM never double-append. The path carries a per-JVM
    * pid discriminator (round-3 ADVICE): two JVMs running these queries
    * concurrently (bench + verify in the same round) would otherwise race
    * one JVM's deleteRecursively against the other's commits and reads. */
  private val built = new ConcurrentHashMap[String, (String, Long, Long)]()

  private def ensureTable(s: SparkSession, d: String): (String, Long, Long) =
    built.computeIfAbsent(d, _ => {
      val tag = java.lang.Integer.toHexString(d.hashCode)
      val pid = ProcessHandle.current().pid()
      val table = s"${System.getProperty("java.io.tmpdir")}/graft_txlog_${tag}_$pid"
      deleteRecursively(new java.io.File(table))
      // pid-unique paths don't overwrite-clean across runs; reap on exit
      sys.addShutdownHook(deleteRecursively(new java.io.File(table)))
      val ev = events(s, d)
      val v1 = CommitLog.commit(
        ev.filter(pmod(col("event_id"), lit(2)) === 0), table, "append")
      // second batch adds a column — additive evolution; v1 rows read NULL
      val v2 = CommitLog.commit(
        ev.filter(pmod(col("event_id"), lit(2)) === 1)
          .withColumn("batch_tag", lit("late")), table, "append")
      (table, v1, v2)
    })

  /** (tablePath, vMerge, vDelete, vUpdate) for the MUTATION queries — a
    * separate table from [[ensureTable]] (whose queries pin the append-only
    * history). Built as: commit ALL events → MERGE an upsert source
    * (event_id%10==3 rows with `value` doubled = updates; event_id%10==4
    * rows re-keyed to id+100000000 with value+1000 = inserts) → DELETE
    * every 'error' row → UPDATE every 'signup' row's value by +0.5. All
    * three mutations are file-granular copy-on-write; the DuckDB oracles
    * re-derive each stage's final state from the source parquet, so a wrong
    * matched-set, a lost unmatched row in a rewritten file, or a dropped
    * untouched file flips the hash. */
  private val builtMut = new ConcurrentHashMap[String, (String, Long, Long, Long)]()
  private val builtIncrAgg = new ConcurrentHashMap[String, String]()
  private val builtIncrSums = new ConcurrentHashMap[String, String]()

  /** Shared bootstrap for the IVM rollup queries: wipe + reap-on-exit a
    * scratch aggregate table beside `baseTable`, seed it empty with
    * (event_type, aggCols…), and fold the base's full change feed in. */
  private def ensureScratchAgg(s: SparkSession,
      memo: ConcurrentHashMap[String, String], d: String, baseTable: String,
      suffix: String,
      aggCols: Seq[(String, org.apache.spark.sql.types.DataType)],
      apply: (String, DataFrame) => Unit): String =
    memo.computeIfAbsent(d, _ => {
      val agg = baseTable + suffix
      deleteRecursively(new java.io.File(agg))
      sys.addShutdownHook(deleteRecursively(new java.io.File(agg)))
      import org.apache.spark.sql.types._
      CommitLog.commit(
        s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(StructField("event_type", StringType) +:
            aggCols.map { case (n, t) => StructField(n, t) })),
        agg, "append")
      apply(agg, CommitLog.changeFeed(s, baseTable, 0L))
      agg
    })

  /** Table whose history spans a PLAIN OVERWRITE (the reference's prod
    * bronze path, `save_to_raw_delta_prod.py:143`): v1 appends the even-id
    * slice, v2 overwrites with the %3==0 slice — ids divisible by 6 survive
    * identically across the overwrite and must emit NO change row. */
  private val builtOvw = new ConcurrentHashMap[String, String]()
  private val builtJrn = new ConcurrentHashMap[String, String]()

  /** One scratch commit-log table per (sf dir, prefix): pid-unique path
    * (two JVMs in one round never race each other's files), wiped before
    * rebuild, reaped at JVM exit. `build` receives the path plus the
    * 3-column events projection every mutation harness starts from — THE
    * one copy of the lifecycle boilerplate (round-8 review finding). */
  private def scratchTable(s: SparkSession, memo: ConcurrentHashMap[String, String],
      d: String, prefix: String)(build: (String, DataFrame) => Unit): String =
    memo.computeIfAbsent(d, _ => {
      val tag = java.lang.Integer.toHexString(d.hashCode)
      val pid = ProcessHandle.current().pid()
      val table = s"${System.getProperty("java.io.tmpdir")}/graft_${prefix}_${tag}_$pid"
      deleteRecursively(new java.io.File(table))
      sys.addShutdownHook(deleteRecursively(new java.io.File(table)))
      build(table, events(s, d).select("event_id", "event_type", "value"))
      table
    })

  /** Table mutated by [[CommitLog.deleteDv]] — merge-on-read deletion
    * vectors (round-7 VERDICT item 3): commit all events, then retire the
    * ~1% trickle (event_id % 97 == 0) as dead POSITIONS. Every data file
    * carries by reference; readers anti-join the deaths away. */
  private val builtDv = new ConcurrentHashMap[String, String]()

  private def ensureDvTable(s: SparkSession, d: String): String =
    scratchTable(s, builtDv, d, "txdv") { (table, ev) =>
      CommitLog.commit(ev.repartition(8), table, "append")
      CommitLog.deleteDv(s, table, pmod(col("event_id"), lit(97)) === 0): Unit
    }

  /** Table mutated by [[CommitLog.updateDv]] — merge-on-read UPDATE layered
    * OVER a DV delete on one table, so the query exercises DV layering:
    * commit all events → deleteDv (% 97 == 0) → updateDv (+0.5 on every
    * surviving 'signup' row). Both mutations retire rows by POSITION;
    * nothing is ever rewritten. */
  private val builtUpdateDv = new ConcurrentHashMap[String, String]()

  private def ensureUpdateDvTable(s: SparkSession, d: String): String =
    scratchTable(s, builtUpdateDv, d, "txudv") { (table, ev) =>
      CommitLog.commit(ev.repartition(8), table, "append")
      CommitLog.deleteDv(s, table, pmod(col("event_id"), lit(97)) === 0)
      CommitLog.updateDv(s, table, col("event_type") === "signup",
        Map("value" -> (col("value") + lit(0.5)))): Unit
    }

  /** Table upserted by [[CommitLog.mergeDv]] — the merge-on-read CDC-apply
    * shape: commit all events, then one trickle upsert (event_id % 103 == 5
    * rows re-valued +1000 = updates; % 103 == 6 rows re-keyed +300000000 =
    * inserts) that retires matched rows by POSITION and rewrites no file. */
  private val builtMergeDv = new ConcurrentHashMap[String, String]()

  private def ensureMergeDvTable(s: SparkSession, d: String): String =
    scratchTable(s, builtMergeDv, d, "txmdv") { (table, ev) =>
      CommitLog.commit(ev.repartition(8), table, "append")
      val src = ev.filter(pmod(col("event_id"), lit(103)) === 5)
          .withColumn("value", col("value") + lit(1000.0))
        .unionByName(ev.filter(pmod(col("event_id"), lit(103)) === 6)
          .withColumn("event_id", col("event_id") + lit(300000000L)))
      CommitLog.mergeDv(s, table, src, Seq("event_id")): Unit
    }

  /** Table mutated ENTIRELY through `spark.sql` DML
    * ([[graft.sql.GraftDmlRule]]) — the reference's actual mutation surface
    * is SQL over the lake, and until round 8 ours was Scala-only. History:
    * commit all events → SQL `INSERT INTO` (re-keyed clones of every
    * 'click' row, +500000000 / value+5) → SQL `UPDATE` (+0.5 on every
    * 'signup' row) → SQL `DELETE` (every 'error' row). The INSERT must
    * route through the commit log (a raw file write behind the manifest
    * would flip fsck AND the hash), the UPDATE/DELETE through the
    * merge-on-read DV path. */
  private val builtSqlDml = new ConcurrentHashMap[String, String]()

  private def ensureSqlDmlTable(s: SparkSession, d: String): String =
    scratchTable(s, builtSqlDml, d, "txsqldml") { (table, ev) =>
      CommitLog.commit(ev.repartition(8), table, "append")
      val tag = java.lang.Integer.toHexString(table.hashCode)
      val (v, src) = (s"txsqldml_v_$tag", s"txsqldml_src_$tag")
      ev.createOrReplaceTempView(src)
      s.read.format("graft").load(table).createOrReplaceTempView(v)
      s.sql(s"""INSERT INTO $v
                SELECT event_id + 500000000, event_type, value + 5
                FROM $src WHERE event_type = 'click'""")
      s.sql(s"UPDATE $v SET value = value + 0.5 WHERE event_type = 'signup'")
      s.sql(s"DELETE FROM $v WHERE event_type = 'error'"): Unit
    }

  /** Table upserted through SQL `MERGE INTO` (UPDATE SET * / INSERT *) —
    * the upsert-by-PK serving shape issued from pure SQL; routes through
    * [[CommitLog.mergeDv]], so every pre-merge data file survives by
    * reference. */
  private val builtSqlMerge = new ConcurrentHashMap[String, String]()

  private def ensureSqlMergeTable(s: SparkSession, d: String): String =
    scratchTable(s, builtSqlMerge, d, "txsqlmrg") { (table, ev) =>
      CommitLog.commit(ev.repartition(8), table, "append")
      val tag = java.lang.Integer.toHexString(table.hashCode)
      val (v, src) = (s"txsqlmrg_v_$tag", s"txsqlmrg_src_$tag")
      ev.createOrReplaceTempView(src)
      s.read.format("graft").load(table).createOrReplaceTempView(v)
      s.sql(
        s"""MERGE INTO $v t
            USING (SELECT event_id, event_type, value + 2000 AS value
                     FROM $src WHERE event_id % 101 = 7
                   UNION ALL
                   SELECT event_id + 400000000, event_type, value
                     FROM $src WHERE event_id % 101 = 8) s
            ON t.event_id = s.event_id
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *"""): Unit
    }

  /** Table mutated by SQL `MERGE ... WHEN MATCHED THEN DELETE` — the
    * key-set retirement shape ([[CommitLog.deleteKeys]] under the hood). */
  private val builtSqlMergeDel = new ConcurrentHashMap[String, String]()

  private def ensureSqlMergeDelTable(s: SparkSession, d: String): String =
    scratchTable(s, builtSqlMergeDel, d, "txsqlmdel") { (table, ev) =>
      CommitLog.commit(ev.repartition(8), table, "append")
      val tag = java.lang.Integer.toHexString(table.hashCode)
      val (v, src) = (s"txsqlmdel_v_$tag", s"txsqlmdel_src_$tag")
      ev.createOrReplaceTempView(src)
      s.read.format("graft").load(table).createOrReplaceTempView(v)
      s.sql(
        s"""MERGE INTO $v t
            USING (SELECT event_id FROM $src WHERE event_id % 11 = 0) s
            ON t.event_id = s.event_id
            WHEN MATCHED THEN DELETE"""): Unit
    }

  /** Table with a registered Bloom index on `event_id`, committed
    * ROUND-ROBIN into 16 files so every file's [min,max] spans the whole
    * key domain — the exact layout where stats pruning is useless and only
    * the per-file Bloom sidecars can shrink a point lookup
    * ([[graft.tx.BloomIndex]]). */
  private val builtBloom = new ConcurrentHashMap[String, String]()

  private def ensureBloomTable(s: SparkSession, d: String): String =
    scratchTable(s, builtBloom, d, "txbloom") { (table, ev) =>
      graft.tx.BloomIndex.setColumns(table, Seq("event_id"))
      CommitLog.commit(ev.repartition(16), table, "append"): Unit
    }

  /** Table maintained ENTIRELY through SQL (round-8 GraftSqlParser):
    * commit all events → DV-delete the 'error' rows → `OPTIMIZE` (folds
    * the DVs) → `VACUUM … KEEP 1 VERSIONS FORCE` (drops the pre-compact
    * history) — Delta's utility statements end-to-end. */
  private val builtSqlMaint = new ConcurrentHashMap[String, String]()

  private def ensureSqlMaintTable(s: SparkSession, d: String): String =
    scratchTable(s, builtSqlMaint, d, "txsqlmnt") { (table, ev) =>
      CommitLog.commit(ev.repartition(8), table, "append")
      CommitLog.deleteDv(s, table, col("event_type") === "error")
      s.sql(s"OPTIMIZE '$table'")
      s.sql(s"VACUUM '$table' RETAIN 0 HOURS KEEP 1 VERSIONS FORCE"): Unit
    }

  /** Fully catalog-named lifecycle (round-8 VERDICT item 1): CREATE TABLE
    * … USING graft LOCATION on a fresh path, then INSERT / UPDATE /
    * DELETE / MERGE addressed purely BY NAME — the reference's addressing
    * model (named tables: `db-script.cql:4`). The catalog name derives
    * from the path so bench and verify JVMs never collide. */
  private val builtSqlCat = new ConcurrentHashMap[String, String]()

  private def catName(table: String): String =
    s"graft_cat_${java.lang.Integer.toHexString(table.hashCode)}"

  private def ensureSqlCatTable(s: SparkSession, d: String): String =
    scratchTable(s, builtSqlCat, d, "txsqlcat") { (table, ev) =>
      val name = catName(table)
      val src = s"${name}_src"
      ev.createOrReplaceTempView(src)
      s.sql(s"DROP TABLE IF EXISTS $name")
      s.sql(s"""CREATE TABLE $name (event_id BIGINT, event_type STRING,
                value DOUBLE) USING graft LOCATION '$table'""")
      s.sql(s"INSERT INTO $name SELECT event_id, event_type, value FROM $src")
      s.sql(s"UPDATE $name SET value = value + 0.5 WHERE event_type = 'signup'")
      s.sql(s"DELETE FROM $name WHERE event_type = 'error'")
      s.sql(
        s"""MERGE INTO $name t
            USING (SELECT event_id, event_type, value + 3000 AS value
                     FROM $src WHERE event_id % 113 = 9
                   UNION ALL
                   SELECT event_id + 600000000, event_type, value
                     FROM $src WHERE event_id % 113 = 10) s
            ON t.event_id = s.event_id
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *"""): Unit
    }

  /** Table created by `CREATE TABLE … USING graft PARTITIONED BY
    * (event_type)` and filled by a plain INSERT — the declared layout
    * must be RECORDED in the manifest and honored by the insert (hive
    * dirs + partition pruning), the silent-drop bug class of round-10
    * VERDICT item 1. */
  private val builtSqlCreatePart = new ConcurrentHashMap[String, String]()

  private def ensureSqlCreatePartTable(s: SparkSession, d: String): String =
    scratchTable(s, builtSqlCreatePart, d, "txsqlcpart") { (table, ev) =>
      val name = cpartName(table)
      val src = s"${name}_src"
      ev.createOrReplaceTempView(src)
      s.sql(s"DROP TABLE IF EXISTS $name")
      s.sql(s"""CREATE TABLE $name (event_id BIGINT, event_type STRING,
                value DOUBLE) USING graft PARTITIONED BY (event_type)
                LOCATION '$table'""")
      s.sql(s"INSERT INTO $name SELECT event_id, event_type, value FROM $src"): Unit
    }

  private def cpartName(table: String): String =
    s"graft_cpart_${java.lang.Integer.toHexString(table.hashCode)}"

  /** Table driven ENTIRELY through the v2 `TableCatalog`
    * ([[graft.sql.GraftSpaceCatalog]], round-10 VERDICT item 5) by
    * multi-part name: staged CTAS creates it, a staged `CREATE OR
    * REPLACE … AS SELECT` swaps in a WIDER schema as ONE overwrite
    * commit (history preserved — v2 catalogs are the only Spark path
    * where REPLACE TABLE is even expressible), and a name-addressed
    * INSERT appends through the V1Write commit path. Returns
    * (catalogTableName, tableRootDir). */
  private val builtV2Cat = new ConcurrentHashMap[String, (String, String)]()

  private def ensureV2CatalogTable(s: SparkSession, d: String): (String, String) =
    builtV2Cat.computeIfAbsent(d, _ => {
      val tag = java.lang.Integer.toHexString(d.hashCode)
      val pid = ProcessHandle.current().pid()
      // catalog NAME and root are dataset-scoped: a shared root would be
      // wiped by the next dataset's build (round-11 review finding), and
      // a catalog instance caches its root at first use
      val cat = s"graftcat_$tag"
      val rootDir =
        s"${System.getProperty("java.io.tmpdir")}/graft_catroot_${tag}_$pid"
      deleteRecursively(new java.io.File(rootDir))
      sys.addShutdownHook(deleteRecursively(new java.io.File(rootDir)))
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sql.GraftSpaceCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.root", rootDir)
      val name = s"$cat.lake.ev_$tag"
      val src = s"txv2cat_src_$tag"
      events(s, d).select("event_id", "event_type", "value")
        .createOrReplaceTempView(src)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.lake")
      s.sql(s"""CREATE TABLE $name USING graft AS
                SELECT * FROM $src WHERE event_id % 5 <> 2""")
      s.sql(s"""CREATE OR REPLACE TABLE $name USING graft AS
                SELECT event_id, event_type, value,
                  event_id % 5 = 2 AS sampled FROM $src""")
      s.sql(s"""INSERT INTO $name
                SELECT event_id + 900000000, event_type, value + 5, true
                FROM $src WHERE event_id % 131 = 7""")
      (name, s"$rootDir/lake/ev_$tag")
    })

  /** Table driven through `ALTER TABLE … RENAME COLUMN value TO amount`
    * (column mapping — zero data rewrite) and then an INSERT under the
    * NEW name: reads alias the old bytes, new files store the physical
    * old name, and v1 time travel still serves the pre-rename schema. */
  private val builtSqlRename = new ConcurrentHashMap[String, String]()

  private def ensureSqlRenameTable(s: SparkSession, d: String): String =
    scratchTable(s, builtSqlRename, d, "txsqlren") { (table, ev) =>
      CommitLog.commit(ev.repartition(8), table, "append")
      val tag = java.lang.Integer.toHexString(table.hashCode)
      val (v, src) = (s"txsqlren_v_$tag", s"txsqlren_src_$tag")
      ev.createOrReplaceTempView(src)
      s.read.format("graft").load(table).createOrReplaceTempView(v)
      s.sql(s"ALTER TABLE $v RENAME COLUMN value TO amount")
      s.sql(s"INSERT INTO $v SELECT event_id + 900000000, event_type, " +
        s"value + 7 FROM $src WHERE event_id % 131 = 5"): Unit
    }

  /** Table mutated by a CONDITIONAL SQL MERGE (round-8 VERDICT item 4):
    * first-match-wins matched routing (DELETE when the source value is
    * high, partial UPDATE otherwise), a conditional INSERT, and two
    * first-match-wins NOT MATCHED BY SOURCE clauses (DELETE 'error'
    * targets, in-place UPDATE low-value ones) — all in one statement,
    * all merge-on-read. */
  private val builtSqlMergeCond = new ConcurrentHashMap[String, String]()

  private def ensureSqlMergeCondTable(s: SparkSession, d: String): String =
    scratchTable(s, builtSqlMergeCond, d, "txsqlmcond") { (table, ev) =>
      CommitLog.commit(ev.repartition(8), table, "append")
      val tag = java.lang.Integer.toHexString(table.hashCode)
      val (v, src) = (s"txsqlmcond_v_$tag", s"txsqlmcond_src_$tag")
      ev.createOrReplaceTempView(src)
      s.read.format("graft").load(table).createOrReplaceTempView(v)
      s.sql(
        s"""MERGE INTO $v t
            USING (SELECT event_id, event_type, value
                     FROM $src WHERE event_id % 127 = 11
                   UNION ALL
                   SELECT event_id + 700000000, event_type, value
                     FROM $src WHERE event_id % 127 = 12) s
            ON t.event_id = s.event_id
            WHEN MATCHED AND s.value > 250 THEN DELETE
            WHEN MATCHED THEN UPDATE SET value = s.value + 4000
            WHEN NOT MATCHED AND s.event_type <> 'error' THEN INSERT *
            WHEN NOT MATCHED BY SOURCE AND t.event_type = 'error' THEN DELETE
            WHEN NOT MATCHED BY SOURCE AND t.value < 10 THEN UPDATE SET value = t.value + 100000"""): Unit
    }

  /** Table driven through the round-9 SQL LIFECYCLE statements: ALTER
    * TABLE ADD COLUMNS (schema-only commit), INSERT INTO the new column,
    * RESTORE TO VERSION AS OF 1 (back to the pristine events), then a
    * SHALLOW CLONE that is TRUNCATEd — proving the clone is independent
    * and the truncate transactional. The final snapshot must equal the
    * raw events table, which is exactly what the DuckDB twin states. */
  private val builtSqlLifecycle = new ConcurrentHashMap[String, String]()

  private def ensureSqlLifecycleTable(s: SparkSession, d: String): String =
    scratchTable(s, builtSqlLifecycle, d, "txsqllife") { (table, ev) =>
      CommitLog.commit(ev.repartition(8), table, "append")
      val tag = java.lang.Integer.toHexString(table.hashCode)
      val v = s"txsqllife_v_$tag"
      s.read.format("graft").load(table).createOrReplaceTempView(v)
      s.sql(s"ALTER TABLE $v ADD COLUMNS (flag DOUBLE)")
      s.sql(s"INSERT INTO $v SELECT event_id + 800000000, event_type, " +
        s"value, 1.0 FROM $v WHERE event_id % 127 = 13")
      s.sql(s"RESTORE TABLE '$table' TO VERSION AS OF 1")
      val clone = s"${table}_clone"
      deleteRecursively(new java.io.File(clone))
      s.sql(s"CREATE TABLE '$clone' SHALLOW CLONE '$table'")
      s.sql(s"TRUNCATE TABLE '$clone'"): Unit
    }

  /** Plain-parquet copy of events wrapped by CONVERT TO GRAFT, then
    * trickle-mutated — proving the converted table is a full citizen:
    * DML routes through the commit log, time travel reads the pristine
    * v1, stats sidecars (built at convert from one footer pass) prune. */
  private val builtConvert = new ConcurrentHashMap[String, String]()

  private def ensureConvertTable(s: SparkSession, d: String): String =
    scratchTable(s, builtConvert, d, "txconv") { (table, ev) =>
      // a PLAIN parquet dataset (no commit log), id-range-clustered so
      // the convert-built footer stats genuinely prune …
      ev.repartitionByRange(8, col("event_id")).sortWithinPartitions("event_id")
        .write.mode("overwrite").parquet(table)
      // … wrapped in place, then mutated like any graft table
      s.sql(s"CONVERT TO GRAFT '$table'")
      val v = s"txconv_v_${java.lang.Integer.toHexString(table.hashCode)}"
      s.read.format("graft").load(table).createOrReplaceTempView(v)
      s.sql(s"DELETE FROM $v WHERE event_type = 'error'"): Unit
    }

  /** Table carrying a CHECK constraint from birth: the constraint admits
    * every real event row, a violating INSERT is attempted and MUST
    * refuse without publishing, and the final snapshot equals the
    * original events plus one legal insert. */
  private val builtConstraint = new ConcurrentHashMap[String, String]()

  private def ensureConstraintTable(s: SparkSession, d: String): String =
    scratchTable(s, builtConstraint, d, "txcheck") { (table, ev) =>
      CommitLog.commit(ev.repartition(8), table, "append")
      val v = s"txcheck_v_${java.lang.Integer.toHexString(table.hashCode)}"
      s.read.format("graft").load(table).createOrReplaceTempView(v)
      s.sql(s"ALTER TABLE $v ADD CONSTRAINT val_floor CHECK (value >= 0)")
      val before = CommitLog.latestVersion(table).get
      // the refusal must BE the constraint's (an unrelated crash in the
      // insert path must not masquerade as enforcement): walk the cause
      // chain for the raise_error message
      def isConstraintRefusal(e: Throwable): Boolean =
        Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10)
          .exists(c => Option(c.getMessage).exists(_.contains("CHECK constraint val_floor")))
      val refused =
        try { s.sql(s"INSERT INTO $v VALUES (999999991, 'bad', -5.0)"); false }
        catch {
          case e: Exception if isConstraintRefusal(e) => true
          case e: Exception => throw new IllegalStateException(
            s"violating INSERT failed for the WRONG reason on $table", e)
        }
      require(refused && CommitLog.latestVersion(table).get == before,
        s"violating INSERT must refuse without publishing on $table")
      s.sql(s"INSERT INTO $v VALUES (999999992, 'ok', 1.25)"): Unit
    }

  /** Table read back through SQL time travel (round-8 VERDICT item 2):
    * commit all events (v1), DV-delete the 'error' rows (v2) — the query
    * joins `VERSION AS OF 1`, the latest snapshot, and a far-future
    * `TIMESTAMP AS OF` (≡ latest) in ONE statement. */
  private val builtSqlTt = new ConcurrentHashMap[String, String]()

  private def ensureSqlTtTable(s: SparkSession, d: String): String =
    scratchTable(s, builtSqlTt, d, "txsqltt") { (table, ev) =>
      CommitLog.commit(ev.repartition(8), table, "append")
      CommitLog.deleteDv(s, table, col("event_type") === "error"): Unit
    }

  /** Table mutated by [[CommitLog.deleteKeys]] — the CDC-apply delete shape
    * (`DELETE WHERE key IN (subquery)`): commit all events, then retire
    * every event_id divisible by 7 via a key-set frame. */
  private val builtDelKeys = new ConcurrentHashMap[String, String]()

  private def ensureDelKeysTable(s: SparkSession, d: String): String =
    scratchTable(s, builtDelKeys, d, "txdelk") { (table, ev) =>
      CommitLog.commit(ev.repartition(8), table, "append")
      CommitLog.deleteKeys(s, table,
        ev.filter(pmod(col("event_id"), lit(7)) === 0).select("event_id"),
        Seq("event_id")): Unit
    }

  private def ensureOvwTable(s: SparkSession, d: String): String =
    scratchTable(s, builtOvw, d, "txovw") { (table, ev) =>
      CommitLog.commit(ev.filter(pmod(col("event_id"), lit(2)) === 0), table, "append")
      CommitLog.commit(ev.filter(pmod(col("event_id"), lit(3)) === 0), table, "overwrite"): Unit
    }

  /** Same append→overwrite history as [[ensureOvwTable]], but the
    * overwrite is JOURNALED (`cdc = true`) and the PRE-overwrite manifest
    * is then vacuumed away — the exact state where read-time
    * reconstruction (`overwriteDiff`) is impossible and only the stored
    * journal can serve the slice (round-7: write-time CDC decouples
    * overwrite feeds from predecessor retention). */
  private def ensureJournaledTable(s: SparkSession, d: String): String =
    scratchTable(s, builtJrn, d, "txjrn") { (table, ev) =>
      CommitLog.commit(ev.filter(pmod(col("event_id"), lit(2)) === 0), table, "append")
      CommitLog.commit(ev.filter(pmod(col("event_id"), lit(3)) === 0), table,
        "overwrite", cdc = true)
      CommitLog.vacuum(table, keepVersions = 1, minAgeMillis = 0, force = true): Unit
    }

  /** Table whose history is append → DELETE → RESTORE(v1, cdc = true): the
    * undo story. The restore moves NO data (its manifest re-references
    * v1's files) and journals the row diff, so the feed shows exactly the
    * resurrected rows. */
  private val builtRestore = new ConcurrentHashMap[String, String]()

  private def ensureRestoreTable(s: SparkSession, d: String): String =
    builtRestore.computeIfAbsent(d, _ => {
      val tag = java.lang.Integer.toHexString(d.hashCode)
      val pid = ProcessHandle.current().pid()
      val table = s"${System.getProperty("java.io.tmpdir")}/graft_txrst_${tag}_$pid"
      deleteRecursively(new java.io.File(table))
      sys.addShutdownHook(deleteRecursively(new java.io.File(table)))
      val ev = events(s, d).select("event_id", "event_type", "value")
      CommitLog.commit(ev.repartition(4), table, "append")
      CommitLog.delete(s, table, col("event_type") === "error")
      CommitLog.restore(s, table, 1L, cdc = true)
      table
    })

  /** Table mutated by [[CommitLog.replaceWhere]] — the idempotent-backfill
    * shape: one predicate region (event_type = 'purchase') atomically
    * swapped for a recomputed slice (even ids only, value + 10000), every
    * other region's files carried by reference. */
  private val builtRepl = new ConcurrentHashMap[String, String]()

  private def ensureReplTable(s: SparkSession, d: String): String =
    builtRepl.computeIfAbsent(d, _ => {
      val tag = java.lang.Integer.toHexString(d.hashCode)
      val pid = ProcessHandle.current().pid()
      val table = s"${System.getProperty("java.io.tmpdir")}/graft_txrpl_${tag}_$pid"
      deleteRecursively(new java.io.File(table))
      sys.addShutdownHook(deleteRecursively(new java.io.File(table)))
      val ev = events(s, d).select("event_id", "event_type", "value")
      CommitLog.commit(ev.repartition(8), table, "append")
      val replacement = ev.filter(col("event_type") === "purchase" &&
          pmod(col("event_id"), lit(2)) === 0)
        .withColumn("value", col("value") + 10000)
      CommitLog.replaceWhere(s, table, replacement, col("event_type") === "purchase")
      table
    })

  /** (src, clone) pair for [[CommitLog.cloneTable]]: clone the committed
    * events, then mutate BOTH sides differently — the clone loses its
    * 'error' rows, the source its 'click' rows — so the query's per-side
    * counts certify full independence of the zero-copy clone. */
  private val builtClone = new ConcurrentHashMap[String, (String, String)]()

  private def ensureCloneTables(s: SparkSession, d: String): (String, String) =
    builtClone.computeIfAbsent(d, _ => {
      val tag = java.lang.Integer.toHexString(d.hashCode)
      val pid = ProcessHandle.current().pid()
      val src = s"${System.getProperty("java.io.tmpdir")}/graft_txcls_${tag}_$pid"
      val dst = s"${System.getProperty("java.io.tmpdir")}/graft_txclc_${tag}_$pid"
      Seq(src, dst).foreach { t =>
        deleteRecursively(new java.io.File(t))
        sys.addShutdownHook(deleteRecursively(new java.io.File(t)))
      }
      val ev = events(s, d).select("event_id", "event_type", "value")
      CommitLog.commit(ev.repartition(4), src, "append")
      CommitLog.cloneTable(src, dst)
      CommitLog.delete(s, dst, col("event_type") === "error")
      CommitLog.delete(s, src, col("event_type") === "click")
      (src, dst)
    })

  private def ensureMutTable(s: SparkSession, d: String): (String, Long, Long, Long) =
    builtMut.computeIfAbsent(d, _ => {
      val tag = java.lang.Integer.toHexString(d.hashCode)
      val pid = ProcessHandle.current().pid()
      val table = s"${System.getProperty("java.io.tmpdir")}/graft_txmut_${tag}_$pid"
      deleteRecursively(new java.io.File(table))
      sys.addShutdownHook(deleteRecursively(new java.io.File(table)))
      val ev = events(s, d)
      // many small files so the copy-on-write probe has real granularity to
      // preserve: most files contain no matched key and must survive by
      // reference (TxMutationSpec asserts exactly that on the manifests)
      CommitLog.commit(ev.repartition(8), table, "append")
      val updates = ev.filter(pmod(col("event_id"), lit(10)) === 3)
        .withColumn("value", col("value") * 2)
      val inserts = ev.filter(pmod(col("event_id"), lit(10)) === 4)
        .withColumn("event_id", col("event_id") + 100000000L)
        .withColumn("value", col("value") + 1000)
      val vMerge = CommitLog.merge(s, table, updates.union(inserts), Seq("event_id"))
      val vDelete = CommitLog.delete(s, table, col("event_type") === "error")
      val vUpdate = CommitLog.update(s, table, col("event_type") === "signup",
        Map("value" -> (col("value") + 0.5)))
      (table, vMerge, vDelete, vUpdate)
    })

  /** Delta-protocol ROUNDTRIP table (round-11 VERDICT item 2 + import
    * half): a hive-partitioned graft table built from events, EXPORTED as
    * a `_delta_log` view, its add-listed files + log hard-linked to a
    * sibling root (exactly what a foreign consumer would copy), and
    * re-IMPORTED there via the log-aware CONVERT. The query reads the
    * re-imported table; the DuckDB oracle recomputes from the source
    * parquet — any loss in either protocol direction (a dropped add, a
    * mangled partition value, a schema drift) flips the hash. */
  private val builtDelta = new ConcurrentHashMap[String, String]()
  private def ensureDeltaRoundtrip(s: SparkSession, d: String): String =
    builtDelta.computeIfAbsent(d, _ => {
      val tag = java.lang.Integer.toHexString(d.hashCode)
      val pid = ProcessHandle.current().pid()
      val base = s"${System.getProperty("java.io.tmpdir")}/graft_deltart_${tag}_$pid"
      deleteRecursively(new java.io.File(base))
      sys.addShutdownHook(deleteRecursively(new java.io.File(base)))
      val src = s"$base/src"
      val dst = s"$base/dst"
      CommitLog.commit(events(s, d).select("event_id", "event_type", "value"),
        src, "append", partitionBy = Seq("event_type"))
      graft.tx.DeltaExport.writeDeltaLog(src)
      val srcDir = java.nio.file.Paths.get(src)
      val dstDir = java.nio.file.Paths.get(dst)
      CommitLog.manifest(src, CommitLog.latestVersion(src).get).files.foreach { rel =>
        val to = dstDir.resolve(rel)
        java.nio.file.Files.createDirectories(to.getParent)
        try java.nio.file.Files.createLink(to, srcDir.resolve(rel))
        catch { case _: UnsupportedOperationException =>
          java.nio.file.Files.copy(srcDir.resolve(rel), to): Unit }
      }
      java.nio.file.Files.createDirectories(dstDir.resolve("_delta_log"))
      java.nio.file.Files.copy(
        srcDir.resolve("_delta_log").resolve(f"${0L}%020d.json"),
        dstDir.resolve("_delta_log").resolve(f"${0L}%020d.json"))
      CommitLog.convert(s, dst)
      dst
    })

  val queries: Map[String, Q] = Map(
    // Delta-protocol roundtrip: export → foreign-style copy → log-aware
    // import; the aggregate over the re-imported table must equal the
    // source-parquet oracle exactly (value sums through DECIMAL on both
    // sides — the suite's float-sum convention).
    "tx_delta_roundtrip" -> ((s, d) => {
      val table = ensureDeltaRoundtrip(s, d)
      CommitLog.read(s, table)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          graft.queries.Tables.dsum(col("value")).as("sum_value"))
        .orderBy("event_type")
    }),

    // Latest snapshot after two appends + schema evolution: per-type counts
    // must equal the source table's, and the evolved column must be non-null
    // exactly on the second batch's rows.
    "tx_snapshot_read" -> ((s, d) => {
      val (table, _, _) = ensureTable(s, d)
      CommitLog.read(s, table)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"), count(col("batch_tag")).as("n_late"))
        .orderBy("event_type")
    }),

    // Additive schema evolution pinned by the oracle (round-4 VERDICT item
    // 6, the reference's `schema_mode:"add"`): v1's files predate
    // `batch_tag`, so the snapshot read must back-fill NULL for exactly the
    // even-id rows — the query groups on that nullability itself, so a
    // wrong back-fill (missing column, wrong rows, non-null default)
    // changes the grouping and fails the hash gate.
    "tx_schema_evolution" -> ((s, d) => {
      val (table, _, _) = ensureTable(s, d)
      CommitLog.read(s, table)
        .groupBy(coalesce(col("batch_tag"), lit("null_backfilled")).as("tag"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("event_type")).as("n_types"))
        .orderBy("tag")
    }),

    // Time travel: version 1 must see exactly the first batch, current
    // schema additions and later appends invisible.
    "tx_time_travel" -> ((s, d) => {
      val (table, v1, _) = ensureTable(s, d)
      CommitLog.readAt(s, table, v1)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"))
        .orderBy("event_type")
    }),

    // MERGE upsert pinned at its own version (time travel INTO the merge,
    // before the later delete): per-type counts include the re-keyed
    // inserts, and min/max(value) pin the doubled update values exactly
    // (min/max are order-independent, so doubles hash stably — a sum
    // would not). A matched row surviving un-replaced, an unmatched row
    // lost from a rewritten file, or an untouched file dropped from the
    // manifest all flip the aggregate.
    "tx_merge_upsert" -> ((s, d) => {
      val (table, vMerge, _, _) = ensureMutTable(s, d)
      CommitLog.readAt(s, table, vMerge)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("event_id")).as("n_ids"),
          min(col("value")).as("v_min"), max(col("value")).as("v_max"))
        .orderBy("event_type")
    }),

    // DELETE WHERE pinned at its version: 'error' rows gone (the grouping
    // itself loses the row), everything else — including the merge's
    // updates/inserts — intact.
    "tx_delete_where" -> ((s, d) => {
      val (table, _, vDelete, _) = ensureMutTable(s, d)
      CommitLog.readAt(s, table, vDelete)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          min(col("value")).as("v_min"), max(col("value")).as("v_max"))
        .orderBy("event_type")
    }),

    // UPDATE WHERE on the latest snapshot: every surviving signup value
    // shifted by exactly +0.5 (IEEE-deterministic on both engines), no
    // cardinality change, all other rows byte-identical.
    "tx_update_where" -> ((s, d) => {
      val (table, _, _, _) = ensureMutTable(s, d)
      CommitLog.read(s, table)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          min(col("value")).as("v_min"), max(col("value")).as("v_max"))
        .orderBy("event_type")
    }),

    // Change data feed across the whole mutation history: appends derive
    // inserts from the manifest delta, delete/update/merge read the typed
    // change rows they wrote at commit time. The oracle recomputes every
    // (version, change_type) cardinality from the source parquet — a
    // missing pre-image, a double-written insert, or a feed row for an
    // untouched record all flip the hash.
    "tx_change_feed" -> ((s, d) => {
      val (table, _, _, _) = ensureMutTable(s, d)
      CommitLog.changeFeed(s, table, 0L)
        .groupBy(col(CommitLog.CommitVersionCol).as("v"),
          col(CommitLog.ChangeTypeCol).as("ct"))
        .agg(count(lit(1)).as("n"))
        .orderBy("v", "ct")
    }),

    // Incremental view maintenance from the change feed: a per-type count
    // rollup maintained ONLY from CDC rows (never rescanning the base)
    // across the table's whole mutation history — append, merge (with
    // re-keyed inserts), delete, update. The in-query verdict compares the
    // maintained rollup to a full recompute of the final snapshot, and the
    // DuckDB twin pins both the counts and the all-match boolean.
    "tx_incr_agg" -> ((s, d) => {
      val (table, _, _, _) = ensureMutTable(s, d)
      val aggTable = ensureScratchAgg(s, builtIncrAgg, d, table, "_agg",
        Seq(("n", org.apache.spark.sql.types.LongType)),
        (agg, feed) => graft.tx.ChangeApply.applyCounts(s, agg, feed,
          Seq("event_type")): Unit)
      val maintained = CommitLog.read(s, aggTable)
      val recomputed = CommitLog.read(s, table)
        .groupBy("event_type").agg(count(lit(1)).as("n_direct"))
      maintained.join(recomputed, Seq("event_type"), "full_outer")
        .select(col("event_type"), col("n"),
          coalesce(col("n") === col("n_direct"), lit(false)).as("matches_recompute"))
        .orderBy("event_type")
    }),

    // IVM beyond counts: SUM/COUNT(col) maintained per key from the same
    // change feed (ChangeApply.applyAggregates). Sums live as
    // DECIMAL(38,6) — incremental maintenance REQUIRES an associative
    // exact sum (a float fold depends on delta arrival order, and an
    // update's -pre/+post pair would leave residue forever), which is
    // also exactly what lets this oracle hash-match: the maintained
    // decimal equals DuckDB's from-scratch decimal sum bit-for-bit. The
    // in-query matches flag re-checks against a direct recompute of the
    // mutated table.
    "tx_incr_sums" -> ((s, d) => {
      val (table, _, _, _) = ensureMutTable(s, d)
      val aggTable = ensureScratchAgg(s, builtIncrSums, d, table, "_sums",
        Seq(("n", org.apache.spark.sql.types.LongType),
          ("sum_value", graft.tx.ChangeApply.SumType),
          ("cnt_value", org.apache.spark.sql.types.LongType)),
        (agg, feed) => graft.tx.ChangeApply.applyAggregates(s, agg, feed,
          Seq("event_type"), Seq("value")): Unit)
      val maintained = CommitLog.read(s, aggTable)
      // the SERVING rule the rollup's docstring requires: a group whose
      // values are all NULL stores sum 0 / cnt 0 and must serve SQL's
      // SUM = NULL; null-safe compare keeps the matches flag honest there
      val servedSum = when(col("cnt_value") === 0L, lit(null))
        .otherwise(col("sum_value"))
      val recomputed = CommitLog.read(s, table)
        .groupBy("event_type")
        .agg(sum(col("value").cast(graft.tx.ChangeApply.SumType))
          .as("sum_direct"))
      maintained.join(recomputed, Seq("event_type"), "full_outer")
        .select(col("event_type"), col("n"),
          servedSum.cast("double").as("sum_v"), col("cnt_value"),
          (servedSum <=> col("sum_direct")).as("matches_recompute"))
        .orderBy("event_type")
    }),

    // DELETE by key set — the APPLY shape for a change feed's delete rows
    // (a Column predicate can't express "key IN (frame)"): every %7 id
    // retired file-granularly; the snapshot aggregate AND the delete's own
    // change rows are both pinned (a key that survived, a non-matched row
    // lost from a rewritten file, or an over-wide CDC dump all flip it).
    "tx_delete_keys" -> ((s, d) => {
      val table = ensureDelKeysTable(s, d)
      val snap = CommitLog.read(s, table)
        .groupBy("event_type").agg(count(lit(1)).as("n_events"))
      val deleted = CommitLog.changeFeed(s, table, 1L)
        .filter(col(CommitLog.ChangeTypeCol) === "delete")
        .groupBy("event_type").agg(count(lit(1)).as("n_deleted"))
      snap.join(deleted, Seq("event_type"), "full_outer")
        .select(col("event_type"),
          coalesce(col("n_events"), lit(0L)).as("n_events"), // fully-retired type
          coalesce(col("n_deleted"), lit(0L)).as("n_deleted"))
        .orderBy("event_type")
    }),

    // CDC across a plain overwrite (round-5 VERDICT item 3): with
    // overwriteDiff the feed derives the overwrite as a snapshot diff —
    // rows gone emit delete, rows new emit insert, rows surviving
    // IDENTICALLY (ids % 6 == 0 here) emit nothing. The oracle recomputes
    // every (version, change_type) count from the source parquet, so an
    // over-wide diff (emitting unchanged rows) or a lost delete flips the
    // hash.
    "tx_change_feed_overwrite" -> ((s, d) => {
      val table = ensureOvwTable(s, d)
      CommitLog.changeFeed(s, table, 0L, overwriteDiff = true)
        .groupBy(col(CommitLog.CommitVersionCol).as("v"),
          col(CommitLog.ChangeTypeCol).as("ct"))
        .agg(count(lit(1)).as("n"))
        .orderBy("v", "ct")
    }),

    // CDC from a JOURNALED overwrite (round-7): commit(cdc = true) stored
    // the snapshot diff at write time, so the feed serves it WITHOUT the
    // overwriteDiff opt-in and — the point — WITHOUT the pre-overwrite
    // manifest, which this table's vacuum already deleted. The oracle
    // recomputes the (version, change_type) counts from the source
    // parquet: identical rows (ids % 6 == 0) must emit nothing, so an
    // over-wide journal or a lost delete flips the hash.
    "tx_change_feed_journaled" -> ((s, d) => {
      val table = ensureJournaledTable(s, d)
      CommitLog.changeFeed(s, table, 1L) // NO overwriteDiff; v1 is vacuumed
        .groupBy(col(CommitLog.CommitVersionCol).as("v"),
          col(CommitLog.ChangeTypeCol).as("ct"))
        .agg(count(lit(1)).as("n"))
        .orderBy("v", "ct")
    }),

    // Data-skipping snapshot read (the commit log's footer-stats sidecars):
    // readPruned drops whole files whose [min,max] exclude the predicate,
    // then filters row-level — the result must be EXACTLY the plain
    // filtered read, which the DuckDB twin pins. File-level prune
    // effectiveness itself is asserted in FileStatsSpec; this gate pins
    // that skipping never changes an answer.
    "tx_read_pruned" -> ((s, d) => {
      val (table, _, _) = ensureTable(s, d)
      CommitLog.readPruned(s, table,
          col("event_type") === "purchase" && col("value") > lit(500.0))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("event_id")).as("n_ids"),
          min(col("value")).as("v_min"), max(col("value")).as("v_max"))
    }),

    // Data skipping on a TIMESTAMP predicate (round-5 VERDICT item 1 — time
    // windows are the reference's dominant access pattern): the footer
    // sidecars render TIMESTAMP(MICROS) bounds as micros-since-epoch, so a
    // `WHERE ets >= …` prunes files exactly like a long key. The DuckDB
    // twin pins that skipping never changes the answer; 1-of-N pruning
    // effectiveness on a time-clustered layout is FileStatsSpec's assert.
    "tx_read_pruned_time" -> ((s, d) => {
      val (table, _, _) = ensureTable(s, d)
      CommitLog.readPruned(s, table,
          col("ets") >= lit(java.sql.Timestamp.from(
            java.time.Instant.parse("2024-01-25T00:00:00Z"))) &&
            col("event_type") === "click")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("event_id")).as("n_ids"),
          min(col("value")).as("v_min"), max(col("value")).as("v_max"))
    }),

    // Merge-on-read DELETE via deletion vectors (round-7 VERDICT item 3):
    // the trickle retirement (~1% of rows) writes O(rows) DV bytes and
    // rewrites NO data file — `files_untouched` pins the zero-rewrite
    // claim under the hash gate (the manifest file lists of v1 and the
    // delete version are compared verbatim), while the snapshot aggregate
    // and the feed's per-type death counts pin row-level exactness.
    "tx_delete_dv" -> ((s, d) => {
      val table = ensureDvTable(s, d)
      val m1 = CommitLog.manifest(table, 1L).files
      val mN = CommitLog.manifest(table, CommitLog.latestVersion(table).get).files
      val snap = CommitLog.read(s, table).groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          min(col("value")).as("v_min"), max(col("value")).as("v_max"))
      val dead = CommitLog.changeFeed(s, table, fromVersion = 1L)
        .filter(col(CommitLog.ChangeTypeCol) === "delete")
        .groupBy("event_type").agg(count(lit(1)).as("__nd"))
      snap.join(dead, Seq("event_type"), "left")
        .select(col("event_type"), col("n_events"),
          coalesce(col("__nd"), lit(0L)).as("n_deleted"),
          col("v_min"), col("v_max"),
          lit(m1 == mN).as("files_untouched"))
        .orderBy("event_type")
    }),

    // Merge-on-read UPDATE layered over a DV delete on ONE table: both
    // mutations retire positions (the update's post-images append), so
    // the snapshot must compose two DV generations plus an appended dir —
    // `files_kept` pins that the original commit's files all survived
    // both mutations by reference.
    "tx_update_dv" -> ((s, d) => {
      val table = ensureUpdateDvTable(s, d)
      val m1 = CommitLog.manifest(table, 1L).files
      val mN = CommitLog.manifest(table, CommitLog.latestVersion(table).get).files
      CommitLog.read(s, table).groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          min(col("value")).as("v_min"), max(col("value")).as("v_max"))
        .withColumn("files_kept", lit(m1.forall(mN.contains)))
        .orderBy("event_type")
    }),

    // Merge-on-read MERGE via deletion vectors: the trickle upsert retires
    // matched rows by POSITION (DV) and appends the source — `files_kept`
    // pins that every pre-upsert data file survives by reference, while
    // the per-type aggregate pins update/insert row-level exactness
    // against the DuckDB recompute.
    "tx_merge_dv" -> ((s, d) => {
      val table = ensureMergeDvTable(s, d)
      val m1 = CommitLog.manifest(table, 1L).files
      val mN = CommitLog.manifest(table, CommitLog.latestVersion(table).get).files
      CommitLog.read(s, table).groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("event_id")).as("n_ids"),
          min(col("value")).as("v_min"), max(col("value")).as("v_max"))
        .withColumn("files_kept", lit(m1.forall(mN.contains)))
        .orderBy("event_type")
    }),

    // The SQL front door (round-7 VERDICT item 2): the registered `graft`
    // source serves the commit-log snapshot to `spark.sql` — the
    // reference's actual consumption model (every silver job is SQL over
    // the lake, `usgs_fact_tsunami_count_silver_dev.py:59-84`). The
    // pushed predicate prunes files through the SAME footer-stats
    // machinery as readPruned automatically (GraftDataSourceSpec asserts
    // file-count agreement); `n_late` pins the additive-evolution NULL
    // semantics through the SQL path (v1 files predate `batch_tag`).
    "tx_sql_scan" -> ((s, d) => {
      val (table, _, _) = ensureTable(s, d)
      val view = s"graft_sql_scan_${java.lang.Integer.toHexString(table.hashCode)}"
      s.read.format("graft").load(table).createOrReplaceTempView(view)
      s.sql(
        s"""SELECT event_type, count(*) AS n_events,
              CAST(count(DISTINCT event_id) AS BIGINT) AS n_ids,
              count(batch_tag) AS n_late,
              min(value) AS v_min, max(value) AS v_max
            FROM $view
            WHERE event_type = 'purchase' AND value > 250.0
            GROUP BY event_type ORDER BY event_type""")
    }),

    // SQL DML end-to-end (round-8: GraftDmlRule): INSERT + UPDATE + DELETE
    // issued through spark.sql against a graft temp view, each a commit-log
    // transaction (the INSERT must NOT fall through to Spark's raw
    // InsertIntoHadoopFsRelationCommand — a file written behind the
    // manifest would flip fsck and the hash). The oracle recomputes the
    // final state from the source parquet.
    "tx_sql_dml" -> ((s, d) => {
      val table = ensureSqlDmlTable(s, d)
      CommitLog.read(s, table).groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("event_id")).as("n_ids"),
          min(col("value")).as("v_min"), max(col("value")).as("v_max"),
          dsum(col("value")).as("sum_v"))
        .orderBy("event_type")
    }),

    // SQL MERGE upsert (UPDATE SET * / INSERT *): the serving-layer
    // upsert-by-PK issued from pure SQL; `files_kept` pins the
    // merge-on-read routing (every pre-merge file carried by reference).
    "tx_sql_merge" -> ((s, d) => {
      val table = ensureSqlMergeTable(s, d)
      val m1 = CommitLog.manifest(table, 1L).files
      val mN = CommitLog.manifest(table, CommitLog.latestVersion(table).get).files
      CommitLog.read(s, table).groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("event_id")).as("n_ids"),
          min(col("value")).as("v_min"), max(col("value")).as("v_max"))
        .withColumn("files_kept", lit(m1.forall(mN.contains)))
        .orderBy("event_type")
    }),

    // SQL MERGE ... WHEN MATCHED THEN DELETE: key-set retirement
    // (DELETE WHERE key IN (subquery)) from pure SQL.
    "tx_sql_merge_delete" -> ((s, d) => {
      val table = ensureSqlMergeDelTable(s, d)
      CommitLog.read(s, table).groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("event_id")).as("n_ids"),
          min(col("value")).as("v_min"), max(col("value")).as("v_max"))
        .orderBy("event_type")
    }),

    // Catalog-named lifecycle end-to-end (round-8 VERDICT item 1): CREATE
    // TABLE USING graft on a fresh location, then INSERT/UPDATE/DELETE/
    // MERGE and the final SELECT all addressed purely BY NAME — no path,
    // no hand-rolled temp view. `history_len` pins that every statement
    // was a real commit (create-empty + 4 mutations = 5 versions, read
    // back via DESCRIBE HISTORY <name>); the DuckDB twin recomputes the
    // final state from the source parquet.
    "tx_sql_catalog" -> ((s, d) => {
      val table = ensureSqlCatTable(s, d)
      val name = catName(table)
      val hist = s.sql(s"DESCRIBE HISTORY $name").count()
      s.sql(
        s"""SELECT event_type, count(*) AS n_events,
              CAST(count(DISTINCT event_id) AS BIGINT) AS n_ids,
              min(value) AS v_min, max(value) AS v_max
            FROM $name GROUP BY event_type""")
        .withColumn("history_len", lit(hist))
        .orderBy("event_type")
    }),

    // CREATE TABLE … PARTITIONED BY honored end-to-end (round-10 VERDICT
    // item 1): the declared layout is recorded in the manifest at create,
    // the name-addressed INSERT routes rows into hive dirs WITHOUT
    // re-specifying it, and the layout prunes a partition predicate —
    // `hive_layout`/`files_pruned` pin all three under the hash gate (the
    // old silent-drop behavior flips both to false).
    "tx_sql_create_partitioned" -> ((s, d) => {
      val table = ensureSqlCreatePartTable(s, d)
      val m = CommitLog.manifest(table, CommitLog.latestVersion(table).get)
      val layoutOk = m.partitionBy == Seq("event_type") &&
        m.files.nonEmpty && m.files.forall(_.contains("event_type="))
      val pruned = CommitLog.pruneFiles(table, m,
        Seq(org.apache.spark.sql.sources.EqualTo("event_type", "purchase")))
      s.sql(
        s"""SELECT event_type, count(*) AS n_events,
              min(value) AS v_min, max(value) AS v_max
            FROM ${cpartName(table)}
            WHERE event_type IN ('purchase', 'signup')
            GROUP BY event_type""")
        .withColumn("hive_layout", lit(layoutOk))
        .withColumn("files_pruned", lit(pruned.size < m.files.size))
        .orderBy("event_type")
    }),

    // v2 TableCatalog end-to-end (round-10 VERDICT item 5): multi-part
    // name CTAS → staged CREATE OR REPLACE widening the schema as ONE
    // overwrite commit → name-addressed INSERT. `replace_kept_history`
    // pins that the replace preserved the log (the staged protocol's
    // whole point vs drop+create: v1 time travel still serves the CTAS
    // snapshot); `v1_scan` pins that the by-name read planned the same
    // GraftFileIndex scan every path-addressed read uses.
    "tx_sql_catalog_v2" -> ((s, d) => {
      val (name, root) = ensureV2CatalogTable(s, d)
      // v1 = the CTAS snapshot; the staged replace must have preserved it
      val v1Rows = CommitLog.readAt(s, root, 1L).count()
      val ctasRows = events(s, d)
        .filter(pmod(col("event_id"), lit(5)) =!= 2).count()
      s.sql(s"""SELECT event_type, count(*) AS n_events,
                  count(CASE WHEN sampled THEN 1 END) AS n_sampled,
                  min(value) AS v_min, max(value) AS v_max
                FROM $name GROUP BY event_type""")
        .withColumn("replace_kept_history",
          lit(CommitLog.latestVersion(root).exists(_ >= 3L) &&
            v1Rows == ctasRows))
        .withColumn("v1_scan", lit {
          val scans = s.table(name).queryExecution.optimizedPlan.collect {
            case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
              lr.relation match {
                case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                  h.location.isInstanceOf[graft.sources.GraftFileIndex]
                case _ => false
              }
          }
          scans.nonEmpty && scans.forall(identity)
        })
        .orderBy("event_type")
    }),

    // ALTER TABLE RENAME COLUMN via column mapping (round-10 VERDICT
    // item 4): the rename is a schema-only commit (`files_kept` pins the
    // zero-rewrite contract), the post-rename INSERT binds the NEW name,
    // reads alias the old bytes under it, and v1 time travel still
    // serves the OLD name (`v1_old_name` under the hash gate).
    "tx_sql_rename" -> ((s, d) => {
      val table = ensureSqlRenameTable(s, d)
      val m1 = CommitLog.manifest(table, 1L)
      val mN = CommitLog.manifest(table, CommitLog.latestVersion(table).get)
      val v1 = CommitLog.readAt(s, table, 1L)
      val v1OldName = v1.columns.contains("value") &&
        !v1.columns.contains("amount")
      CommitLog.read(s, table).groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          min(col("amount")).as("a_min"), max(col("amount")).as("a_max"))
        .withColumn("files_kept", lit(m1.files.forall(mN.files.contains)))
        .withColumn("v1_old_name", lit(v1OldName))
        .orderBy("event_type")
    }),

    // Conditional SQL MERGE (round-8 VERDICT item 4): one statement routes
    // matched pairs first-match-wins (high-value → DELETE, rest → partial
    // UPDATE keeping event_type), gates inserts on a source condition, and
    // routes unmatched targets through TWO first-match-wins by-source
    // clauses ('error' rows die, low-value rows take an in-place
    // UPDATE) — the
    // DuckDB twin recomputes the full routing from the source parquet, so
    // a clause claimed in the wrong order, a post-image computed on the
    // wrong side, or an over-wide by-source delete flips the hash;
    // `files_kept` pins the merge-on-read contract.
    "tx_sql_merge_conditional" -> ((s, d) => {
      val table = ensureSqlMergeCondTable(s, d)
      val m1 = CommitLog.manifest(table, 1L).files
      val mN = CommitLog.manifest(table, CommitLog.latestVersion(table).get).files
      CommitLog.read(s, table).groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("event_id")).as("n_ids"),
          min(col("value")).as("v_min"), max(col("value")).as("v_max"))
        .withColumn("files_kept", lit(m1.forall(mN.contains)))
        .orderBy("event_type")
    }),

    // CONVERT TO GRAFT under the gate (round 9): a plain-parquet dataset
    // wrapped in place must behave as a native table — the DELETE routed
    // through the commit log (non-error rows survive), v1 time travel
    // reads the pristine snapshot, and the convert-built sidecars prune
    // a point predicate (files_pruned under the hash gate; a convert
    // that skipped stats or rewrote data flips it).
    "tx_sql_convert" -> ((s, d) => {
      val table = ensureConvertTable(s, d)
      val m = CommitLog.manifest(table, CommitLog.latestVersion(table).get)
      // fixed probe key: deterministic across runs and free (an unordered
      // limit(1).collect() was a nondeterministic row choice plus an
      // extra Spark job inside the benched query — round-9 review
      // finding); pruning truth needs only the range-clustered layout,
      // not the key's existence
      val kept = CommitLog.pruneFiles(table, m,
        Seq(org.apache.spark.sql.sources.EqualTo("event_id", 777L)))
      CommitLog.read(s, table).groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          min(col("value")).as("v_min"), max(col("value")).as("v_max"))
        .withColumn("v1_total", lit(
          s.read.format("graft").option("versionAsOf", 1).load(table).count()))
        .withColumn("files_pruned", lit(kept.size < m.files.size))
        .orderBy("event_type")
    }),

    // CHECK constraints under the gate (round 9): the violating INSERT
    // refused inside the builder (version pinned unchanged there); the
    // oracle recomputes the final snapshot = events + the one legal
    // insert, so a constraint that blocked a legal write, or failed to
    // block the illegal one, flips counts or bounds.
    "tx_sql_constraints" -> ((s, d) => {
      val table = ensureConstraintTable(s, d)
      CommitLog.read(s, table).groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          min(col("value")).as("v_min"), max(col("value")).as("v_max"))
        .orderBy("event_type")
    }),

    // SQL time travel (round-8 VERDICT item 2): one statement joins
    // `VERSION AS OF 1` (pre-delete), the latest snapshot (post-DV-delete
    // — served through the merge-on-read fallback relation), and a
    // far-future `TIMESTAMP AS OF` (resolves to latest via commit-file
    // mtimes). A version pin that leaked the wrong snapshot, or a
    // timestamp resolution off by one version, flips the hash.
    "tx_sql_time_travel" -> ((s, d) => {
      val table = ensureSqlTtTable(s, d)
      val view = s"graft_sqltt_${java.lang.Integer.toHexString(table.hashCode)}"
      s.read.format("graft").load(table).createOrReplaceTempView(view)
      s.sql(
        s"""SELECT v1.event_type, v1.n AS n_v1,
              COALESCE(v2.n, 0) AS n_latest, COALESCE(v3.n, 0) AS n_ts
            FROM (SELECT event_type, count(*) AS n
                    FROM $view VERSION AS OF 1 GROUP BY event_type) v1
            LEFT JOIN (SELECT event_type, count(*) AS n
                    FROM $view GROUP BY event_type) v2
              ON v1.event_type = v2.event_type
            LEFT JOIN (SELECT event_type, count(*) AS n
                    FROM $view TIMESTAMP AS OF '2999-01-01' GROUP BY event_type) v3
              ON v1.event_type = v3.event_type
            ORDER BY v1.event_type""")
    }),

    // SQL lifecycle (round 9): ALTER ADD COLUMNS → INSERT into the new
    // column → RESTORE TO VERSION AS OF 1 → SHALLOW CLONE → TRUNCATE the
    // clone. The final snapshot must equal the raw events table exactly
    // (an ALTER that rewrote data, a RESTORE that kept the widened
    // schema, or an INSERT that survived the restore all flip the hash);
    // the clone pins — empty after truncate, v1 time travel intact,
    // source untouched — ride as boolean columns under the same gate.
    "tx_sql_lifecycle" -> ((s, d) => {
      val table = ensureSqlLifecycleTable(s, d)
      val clone = s"${table}_clone"
      val latest = CommitLog.read(s, table)
      val schemaRestored =
        latest.schema.fieldNames.toSeq == Seq("event_id", "event_type", "value")
      val cloneEmpty = CommitLog.read(s, clone).count() == 0L
      val cloneV1Intact = s.read.format("graft").option("versionAsOf", 1)
        .load(clone).count() == latest.count()
      latest.groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          min(col("value")).as("v_min"), max(col("value")).as("v_max"))
        .withColumn("schema_restored", lit(schemaRestored))
        .withColumn("clone_empty", lit(cloneEmpty))
        .withColumn("clone_v1_intact", lit(cloneV1Intact))
        .orderBy("event_type")
    }),

    // Maintenance SQL end-to-end: after the SQL OPTIMIZE + VACUUM, the
    // snapshot must hold exactly the non-error rows (a fold that resurrected
    // DV-dead rows or a vacuum that dropped live files flips the hash),
    // `dv_folded` pins that OPTIMIZE actually cleared the deletion vectors,
    // and `history_len` pins that VACUUM kept exactly one version.
    "tx_sql_maintenance" -> ((s, d) => {
      val table = ensureSqlMaintTable(s, d)
      val hist = s.sql(s"DESCRIBE HISTORY '$table'").count()
      val m = CommitLog.manifest(table, CommitLog.latestVersion(table).get)
      CommitLog.read(s, table).groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("event_id")).as("n_ids"))
        .withColumn("dv_folded", lit(m.dvDirs.isEmpty))
        .withColumn("history_len", lit(hist))
        .orderBy("event_type")
    }),

    // SQL aggregate pushdown to metadata (round-8 MetaAggregateRewrite):
    // a whole-table COUNT/MIN/MAX over the graft view collapses to a
    // LocalRelation answered from the footer-stats sidecars — no scan,
    // no job. `meta_only` pins FROM THE PLAN that the rewrite actually
    // fired (a LocalRelation and no surviving relation); count(batch_tag)
    // exercises the count-only path on a string column whose BOUNDS are
    // untrusted, across additive evolution (v1 files predate the column).
    "tx_sql_agg_meta" -> ((s, d) => {
      val (table, _, _) = ensureTable(s, d)
      val view = s"graft_aggmeta_${java.lang.Integer.toHexString(table.hashCode)}"
      s.read.format("graft").load(table).createOrReplaceTempView(view)
      // meta_only is judged on the RETURNED frame itself (the literal
      // column folds into the Aggregate, which the rewrite must tolerate
      // — found live: probing a pre-withColumn frame hid that the final
      // plan still scanned); its value doesn't affect rewritability, so
      // probe with `true` and swap on the (never-expected) decline
      val probe = s.sql(
        s"""SELECT count(*) AS n_rows, min(event_id) AS id_min,
              max(event_id) AS id_max, count(batch_tag) AS n_late,
              min(value) AS v_min, max(value) AS v_max,
              TRUE AS meta_only
            FROM $view""")
      val metaOnly = probe.queryExecution.optimizedPlan.collectFirst {
        case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
      }.isDefined && probe.queryExecution.optimizedPlan.collectFirst {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
      }.isEmpty
      if (metaOnly) probe
      else probe.drop("meta_only").withColumn("meta_only", lit(false))
    }),

    // Point lookup through the per-file Bloom sidecars (Delta's bloom
    // filter index): the table is committed round-robin, so every file's
    // [min,max] covers the whole id domain and stats pruning keeps ALL 16
    // files — the bloom pass plans only the files that might hold the
    // probed keys. `bloom_pruned` pins that the planned file count
    // actually shrank; the row values pin correctness (a false negative —
    // the one failure a Bloom must never have — would drop a row and flip
    // the hash).
    "tx_point_lookup_bloom" -> ((s, d) => {
      val table = ensureBloomTable(s, d)
      val m = CommitLog.manifest(table, CommitLog.latestVersion(table).get)
      val probe = Seq(11L, 222L, 777L)
      val planned = CommitLog.pruneFiles(table, m,
        Seq(org.apache.spark.sql.sources.In("event_id",
          probe.map(_.asInstanceOf[Any]).toArray))).size
      CommitLog.readPruned(s, table, col("event_id").isin(probe: _*))
        .select("event_id", "event_type", "value")
        .withColumn("bloom_pruned", lit(planned < m.files.size))
        .orderBy("event_id")
    }),

    // RESTORE as undo (Delta's RESTORE TABLE … VERSION AS OF): after a
    // DELETE of every 'error' row, restore(v1, cdc = true) brings the
    // snapshot back to the full source BY REFERENCE (the new manifest
    // re-lists v1's files — no data write; TxRestoreCloneSpec pins the
    // file identity) and journals the diff. The query reads the restored
    // snapshot AND the restore's feed slice: n_events must equal the
    // source counts, n_restored must be exactly the resurrected rows —
    // a restore that lost rows, resurrected too many, or journaled an
    // over-wide diff flips the hash.
    "tx_restore" -> ((s, d) => {
      val table = ensureRestoreTable(s, d)
      val snap = CommitLog.read(s, table)
        .groupBy("event_type").agg(count(lit(1)).as("n_events"))
      val restored = CommitLog.changeFeed(s, table, 2L)
        .filter(col(CommitLog.ChangeTypeCol) === "insert")
        .groupBy("event_type").agg(count(lit(1)).as("n_restored"))
      snap.join(restored, Seq("event_type"), "left_outer")
        .select(col("event_type"), col("n_events"),
          coalesce(col("n_restored"), lit(0L)).as("n_restored"))
        .orderBy("event_type")
    }),

    // Predicate-scoped atomic overwrite (Delta's replaceWhere — the
    // idempotent-backfill shape): the 'purchase' region is swapped for a
    // recomputed slice in ONE version while every other region's files
    // carry by reference. The oracle recomputes the final state from the
    // source parquet: a leaked out-of-region row, a lost survivor in a
    // rewritten file, or a dropped untouched file flips the hash.
    "tx_replace_where" -> ((s, d) => {
      val table = ensureReplTable(s, d)
      CommitLog.read(s, table)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_v"))
        .orderBy("event_type")
    }),

    // Zero-copy shallow CLONE: src and clone diverge after the clone (the
    // clone drops 'error' rows, the source drops 'click' rows) — the
    // per-side counts certify that hard-link sharing never couples the
    // two snapshots (a mutation bleeding across, or a clone that missed
    // files, flips the hash).
    "tx_clone" -> ((s, d) => {
      val (src, dst) = ensureCloneTables(s, d)
      CommitLog.read(s, src).groupBy("event_type")
        .agg(count(lit(1)).as("n_events")).withColumn("side", lit("src"))
        .unionByName(
          CommitLog.read(s, dst).groupBy("event_type")
            .agg(count(lit(1)).as("n_events")).withColumn("side", lit("clone")))
        .select("side", "event_type", "n_events")
        .orderBy("side", "event_type")
    }),

    // METADATA-ONLY aggregates: COUNT(*)/MIN/MAX/COUNT(col) answered from
    // the manifest's footer-stats sidecars with NO data scan and NO Spark
    // job (metaAggregate takes no SparkSession — it is O(files) driver
    // work, Delta's SELECT-COUNT(*) trick). Runs on the MUTATION table so
    // the evidence must survive merge/delete/update rewrites: the merge
    // re-keys ids past 100000000 (max moves), the delete removes every
    // 'error' row (count shrinks), the update shifts signup values by
    // +0.5 (double bounds move). The DuckDB oracle re-derives the same
    // final state from the source parquet and aggregates it with a full
    // scan — a stale sidecar, a carried-file accounting slip, or a
    // widened bound flips the hash.
    "tx_stats_meta" -> ((s, d) => {
      import s.implicits._
      val (table, _, _, _) = ensureMutTable(s, d)
      val agg = CommitLog.metaAggregate(table, Seq("event_id", "value"))
        .getOrElse(throw new IllegalStateException(
          s"$table: sidecar evidence incomplete - metadata aggregate must not fall back here"))
      val ids = agg.cols("event_id")
      val vals = agg.cols("value")
      Seq((agg.rowCount,
          ids.min.get.asInstanceOf[Long], ids.max.get.asInstanceOf[Long],
          ids.nonNull,
          vals.min.get.asInstanceOf[Double], vals.max.get.asInstanceOf[Double],
          vals.nonNull))
        .toDF("n_rows", "id_min", "id_max", "n_ids", "v_min", "v_max", "n_vals")
    }),

    // DV-EXACT metadata COUNT(*) + BOUNDS (round-8 VERDICT item 6):
    // a deletion-vector snapshot answers COUNT(*) from metadata alone —
    // stored-row footer sums corrected by a driver-side read of the DV
    // rows (capped; still no Spark job, no data scan) — across the whole
    // DV history: v1 full, v2 after the %97 trickle delete, v3 after the
    // signup updateDv (count-neutral: deaths + appended post-images).
    // MIN/MAX(value) at latest answer too: the few death-carrying files
    // re-aggregate their LIVE rows in a projected driver pass, every
    // clean file keeps its sidecar answer. `meta_equals_scan` pins
    // metadata == scan agreement in-run (count AND bounds); the DuckDB
    // oracle recomputes everything from the source parquet.
    "tx_meta_count_dv" -> ((s, d) => {
      import s.implicits._
      val table = ensureUpdateDvTable(s, d)
      def mc(v: Option[Long]): Long =
        CommitLog.metaRowCount(table, v).getOrElse(throw new IllegalStateException(
          s"$table: DV metadata count must not fall back here"))
      val latest = CommitLog.latestVersion(table).get
      val agg = CommitLog.metaAggregate(table, Seq("value"))
        .getOrElse(throw new IllegalStateException(
          s"$table: DV metadata bounds must not fall back here"))
      val vMin = agg.cols("value").min.get.asInstanceOf[Double]
      val vMax = agg.cols("value").max.get.asInstanceOf[Double]
      val scan = CommitLog.read(s, table)
        .agg(count(lit(1)), min(col("value")), max(col("value")))
        .as[(Long, Double, Double)].head()
      Seq((mc(Some(1L)), mc(Some(2L)), mc(Some(latest)), vMin, vMax,
          mc(None) == scan._1 && vMin == scan._2 && vMax == scan._3))
        .toDF("n_all", "n_after_delete", "n_after_update",
          "v_min", "v_max", "meta_equals_scan")
    }),

    // Metadata-answered TIMESTAMP bounds (round-8 VERDICT item 5): this
    // engine writes every file itself (INT64 micros), so MIN/MAX(ets) —
    // the reference's dominant column — answers from the sidecars with no
    // scan; files that predate the column are footer-PROVEN absent, and
    // foreign INT96 writes refuse (MetaAggregateSpec). Bounds surface as
    // epoch micros so the DuckDB twin compares exactly.
    // Metadata-answered STRING bounds (round-10 VERDICT item 6): string
    // footer stats can be writer-TRUNCATED (a valid bound, not the value),
    // so exactness is recorded at write time — the engine's own commit
    // path writes through Spark's untruncating writer and marks its
    // sidecar entries exact; CONVERT-imported foreign files refuse
    // (MetaAggregateSpec pins the refusal). Runs on the MUTATION table so
    // the marks must survive merge/delete/update rewrites; the 'error'
    // delete moves MIN off 'click'…'error' territory, and the DuckDB
    // oracle recomputes the final state with a full scan.
    "tx_stats_meta_string" -> ((s, d) => {
      import s.implicits._
      val (table, _, _, _) = ensureMutTable(s, d)
      val agg = CommitLog.metaAggregate(table, Seq("event_type"))
        .getOrElse(throw new IllegalStateException(
          s"$table: engine-written string bounds must not fall back here"))
      val e = agg.cols("event_type")
      val scan = CommitLog.read(s, table)
        .agg(min(col("event_type")), max(col("event_type")),
          count(col("event_type")))
        .as[(String, String, Long)].head()
      Seq((e.min.get.asInstanceOf[String], e.max.get.asInstanceOf[String],
          e.nonNull,
          e.min.get == scan._1 && e.max.get == scan._2 && e.nonNull == scan._3))
        .toDF("t_min", "t_max", "n_types", "meta_equals_scan")
    }),

    "tx_stats_meta_ts" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.catalyst.util.DateTimeUtils
      val (table, _, _) = ensureTable(s, d)
      val agg = CommitLog.metaAggregate(table, Seq("ets", "event_id"))
        .getOrElse(throw new IllegalStateException(
          s"$table: timestamp metadata bounds must not fall back here"))
      def us(v: Any): Long =
        DateTimeUtils.fromJavaTimestamp(v.asInstanceOf[java.sql.Timestamp])
      val e = agg.cols("ets")
      val scan = CommitLog.read(s, table)
        .agg(min(col("ets")), max(col("ets")), count(col("ets")))
        .as[(java.sql.Timestamp, java.sql.Timestamp, Long)].head()
      Seq((us(e.min.get), us(e.max.get), e.nonNull,
          agg.cols("event_id").min.get.asInstanceOf[Long],
          us(e.min.get) == DateTimeUtils.fromJavaTimestamp(scan._1) &&
            us(e.max.get) == DateTimeUtils.fromJavaTimestamp(scan._2) &&
            e.nonNull == scan._3))
        .toDF("ts_min_us", "ts_max_us", "n_ts", "id_min", "meta_equals_scan")
    }),
  )

  val oracle: Map[String, String] = Map(
    "tx_delta_roundtrip" ->
      """SELECT event_type, count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1 ORDER BY event_type""",
    "tx_snapshot_read" ->
      """SELECT event_type, count(*) AS n_events,
           CAST(count(*) FILTER (WHERE event_id % 2 = 1) AS BIGINT) AS n_late
         FROM events GROUP BY 1 ORDER BY event_type""",
    "tx_schema_evolution" ->
      """SELECT CASE WHEN event_id % 2 = 1 THEN 'late' ELSE 'null_backfilled' END AS tag,
           count(*) AS n_events,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
         FROM events GROUP BY 1 ORDER BY tag""",
    "tx_time_travel" ->
      """SELECT event_type, count(*) AS n_events
         FROM events WHERE event_id % 2 = 0
         GROUP BY 1 ORDER BY event_type""",
    "tx_merge_upsert" ->
      """WITH merged AS (
           SELECT event_id, event_type, value * 2 AS value
             FROM events WHERE event_id % 10 = 3
           UNION ALL
           SELECT event_id, event_type, value
             FROM events WHERE event_id % 10 <> 3
           UNION ALL
           SELECT event_id + 100000000 AS event_id, event_type, value + 1000 AS value
             FROM events WHERE event_id % 10 = 4)
         SELECT event_type, count(*) AS n_events,
           CAST(count(DISTINCT event_id) AS BIGINT) AS n_ids,
           min(value) AS v_min, max(value) AS v_max
         FROM merged GROUP BY 1 ORDER BY event_type""",
    "tx_delete_where" ->
      """WITH merged AS (
           SELECT event_id, event_type, value * 2 AS value
             FROM events WHERE event_id % 10 = 3
           UNION ALL
           SELECT event_id, event_type, value
             FROM events WHERE event_id % 10 <> 3
           UNION ALL
           SELECT event_id + 100000000 AS event_id, event_type, value + 1000 AS value
             FROM events WHERE event_id % 10 = 4)
         SELECT event_type, count(*) AS n_events,
           min(value) AS v_min, max(value) AS v_max
         FROM merged WHERE event_type <> 'error'
         GROUP BY 1 ORDER BY event_type""",
    "tx_update_where" ->
      """WITH merged AS (
           SELECT event_id, event_type, value * 2 AS value
             FROM events WHERE event_id % 10 = 3
           UNION ALL
           SELECT event_id, event_type, value
             FROM events WHERE event_id % 10 <> 3
           UNION ALL
           SELECT event_id + 100000000 AS event_id, event_type, value + 1000 AS value
             FROM events WHERE event_id % 10 = 4),
         updated AS (
           SELECT event_type,
             CASE WHEN event_type = 'signup' THEN value + 0.5 ELSE value END AS value
           FROM merged WHERE event_type <> 'error')
         SELECT event_type, count(*) AS n_events,
           min(value) AS v_min, max(value) AS v_max
         FROM updated GROUP BY 1 ORDER BY event_type""",
    "tx_incr_agg" ->
      """WITH merged AS (
           SELECT event_id, event_type FROM events WHERE event_id % 10 = 3
           UNION ALL
           SELECT event_id, event_type FROM events WHERE event_id % 10 <> 3
           UNION ALL
           SELECT event_id + 100000000, event_type FROM events WHERE event_id % 10 = 4)
         SELECT event_type, count(*) AS n, true AS matches_recompute
         FROM merged WHERE event_type <> 'error'
         GROUP BY 1 ORDER BY event_type""",
    "tx_incr_sums" ->
      """WITH merged AS (
           SELECT event_id, event_type, value * 2 AS value
             FROM events WHERE event_id % 10 = 3
           UNION ALL
           SELECT event_id, event_type, value
             FROM events WHERE event_id % 10 <> 3
           UNION ALL
           SELECT event_id + 100000000 AS event_id, event_type, value + 1000 AS value
             FROM events WHERE event_id % 10 = 4),
         updated AS (
           SELECT event_type,
             CASE WHEN event_type = 'signup' THEN value + 0.5 ELSE value END AS value
           FROM merged WHERE event_type <> 'error')
         SELECT event_type, count(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_v,
           CAST(count(value) AS BIGINT) AS cnt_value,
           true AS matches_recompute
         FROM updated GROUP BY 1 ORDER BY event_type""",
    "tx_change_feed" ->
      """SELECT CAST(v AS BIGINT) AS v, ct, n FROM (
           SELECT 1 AS v, 'insert' AS ct, count(*) AS n FROM events
           UNION ALL
           SELECT 2, 'update_preimage', count(*) FROM events WHERE event_id % 10 = 3
           UNION ALL
           SELECT 2, 'update_postimage', count(*) FROM events WHERE event_id % 10 = 3
           UNION ALL
           SELECT 2, 'insert', count(*) FROM events WHERE event_id % 10 = 4
           UNION ALL
           SELECT 3, 'delete',
             count(*) + count(*) FILTER (WHERE event_id % 10 = 4)
           FROM events WHERE event_type = 'error'
           UNION ALL
           SELECT 4, 'update_preimage',
             count(*) + count(*) FILTER (WHERE event_id % 10 = 4)
           FROM events WHERE event_type = 'signup'
           UNION ALL
           SELECT 4, 'update_postimage',
             count(*) + count(*) FILTER (WHERE event_id % 10 = 4)
           FROM events WHERE event_type = 'signup')
         ORDER BY v, ct""",
    "tx_delete_keys" ->
      """SELECT event_type,
           count(*) FILTER (WHERE event_id % 7 <> 0) AS n_events,
           count(*) FILTER (WHERE event_id % 7 = 0) AS n_deleted
         FROM events GROUP BY 1 ORDER BY event_type""",
    "tx_change_feed_overwrite" ->
      """SELECT CAST(v AS BIGINT) AS v, ct, n FROM (
           SELECT 1 AS v, 'insert' AS ct, count(*) AS n
             FROM events WHERE event_id % 2 = 0
           UNION ALL
           SELECT 2, 'delete', count(*)
             FROM events WHERE event_id % 2 = 0 AND event_id % 3 <> 0
           UNION ALL
           SELECT 2, 'insert', count(*)
             FROM events WHERE event_id % 3 = 0 AND event_id % 2 <> 0)
         ORDER BY v, ct""",
    "tx_change_feed_journaled" ->
      """SELECT CAST(v AS BIGINT) AS v, ct, n FROM (
           SELECT 2 AS v, 'delete' AS ct, count(*) AS n
             FROM events WHERE event_id % 2 = 0 AND event_id % 3 <> 0
           UNION ALL
           SELECT 2, 'insert', count(*)
             FROM events WHERE event_id % 3 = 0 AND event_id % 2 <> 0)
         ORDER BY v, ct""",
    "tx_read_pruned" ->
      """SELECT count(*) AS n_events,
           CAST(count(DISTINCT event_id) AS BIGINT) AS n_ids,
           min(value) AS v_min, max(value) AS v_max
         FROM events WHERE event_type = 'purchase' AND value > 500.0""",
    "tx_read_pruned_time" ->
      """SELECT count(*) AS n_events,
           CAST(count(DISTINCT event_id) AS BIGINT) AS n_ids,
           min(value) AS v_min, max(value) AS v_max
         FROM events
         WHERE ts >= TIMESTAMP '2024-01-25 00:00:00' AND event_type = 'click'""",
    "tx_update_dv" ->
      """WITH alive AS (
           SELECT event_id, event_type,
             CASE WHEN event_type = 'signup' THEN value + 0.5 ELSE value END AS value
           FROM events WHERE event_id % 97 <> 0)
         SELECT event_type, count(*) AS n_events,
           min(value) AS v_min, max(value) AS v_max,
           TRUE AS files_kept
         FROM alive GROUP BY event_type ORDER BY event_type""",
    "tx_merge_dv" ->
      """WITH merged AS (
           SELECT event_id, event_type, value + 1000 AS value
             FROM events WHERE event_id % 103 = 5
           UNION ALL
           SELECT event_id, event_type, value
             FROM events WHERE event_id % 103 <> 5
           UNION ALL
           SELECT event_id + 300000000 AS event_id, event_type, value
             FROM events WHERE event_id % 103 = 6)
         SELECT event_type, count(*) AS n_events,
           CAST(count(DISTINCT event_id) AS BIGINT) AS n_ids,
           min(value) AS v_min, max(value) AS v_max,
           TRUE AS files_kept
         FROM merged GROUP BY 1 ORDER BY event_type""",
    "tx_delete_dv" ->
      """SELECT event_type,
           count(*) FILTER (WHERE event_id % 97 <> 0) AS n_events,
           count(*) FILTER (WHERE event_id % 97 = 0) AS n_deleted,
           min(value) FILTER (WHERE event_id % 97 <> 0) AS v_min,
           max(value) FILTER (WHERE event_id % 97 <> 0) AS v_max,
           TRUE AS files_untouched
         FROM events GROUP BY event_type ORDER BY event_type""",
    // batch_tag = 'late' rode the second (odd-id) append only, so its
    // non-null count is the odd-id slice of the filtered rows
    "tx_sql_scan" ->
      """SELECT event_type, count(*) AS n_events,
           CAST(count(DISTINCT event_id) AS BIGINT) AS n_ids,
           count(*) FILTER (WHERE event_id % 2 = 1) AS n_late,
           min(value) AS v_min, max(value) AS v_max
         FROM events WHERE event_type = 'purchase' AND value > 250.0
         GROUP BY event_type ORDER BY event_type""",
    "tx_restore" ->
      """SELECT event_type, count(*) AS n_events,
           count(*) FILTER (WHERE event_type = 'error') AS n_restored
         FROM events GROUP BY 1 ORDER BY event_type""",
    "tx_replace_where" ->
      """WITH replaced AS (
           SELECT event_type, value FROM events WHERE event_type <> 'purchase'
           UNION ALL
           SELECT event_type, value + 10000 AS value
             FROM events WHERE event_type = 'purchase' AND event_id % 2 = 0)
         SELECT event_type, count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
         FROM replaced GROUP BY 1 ORDER BY event_type""",
    "tx_clone" ->
      """SELECT side, event_type, n_events FROM (
           SELECT 'src' AS side, event_type, count(*) AS n_events
             FROM events WHERE event_type <> 'click' GROUP BY 2
           UNION ALL
           SELECT 'clone', event_type, count(*)
             FROM events WHERE event_type <> 'error' GROUP BY 2)
         ORDER BY side, event_type""",
    "tx_stats_meta" ->
      """WITH merged AS (
           SELECT event_id, event_type, value * 2 AS value
             FROM events WHERE event_id % 10 = 3
           UNION ALL
           SELECT event_id, event_type, value
             FROM events WHERE event_id % 10 <> 3
           UNION ALL
           SELECT event_id + 100000000 AS event_id, event_type, value + 1000 AS value
             FROM events WHERE event_id % 10 = 4),
         updated AS (
           SELECT event_id,
             CASE WHEN event_type = 'signup' THEN value + 0.5 ELSE value END AS value
           FROM merged WHERE event_type <> 'error')
         SELECT CAST(count(*) AS BIGINT) AS n_rows,
           min(event_id) AS id_min, max(event_id) AS id_max,
           CAST(count(event_id) AS BIGINT) AS n_ids,
           min(value) AS v_min, max(value) AS v_max,
           CAST(count(value) AS BIGINT) AS n_vals
         FROM updated""",
    "tx_stats_meta_string" ->
      """WITH merged AS (
           SELECT event_type FROM events
           UNION ALL
           SELECT event_type FROM events WHERE event_id % 10 = 4)
         SELECT min(event_type) AS t_min, max(event_type) AS t_max,
           CAST(count(event_type) AS BIGINT) AS n_types,
           TRUE AS meta_equals_scan
         FROM merged WHERE event_type <> 'error'""",
    "tx_sql_maintenance" ->
      """SELECT event_type, count(*) AS n_events,
           CAST(count(DISTINCT event_id) AS BIGINT) AS n_ids,
           TRUE AS dv_folded, CAST(1 AS BIGINT) AS history_len
         FROM events WHERE event_type <> 'error'
         GROUP BY event_type ORDER BY event_type""",
    "tx_sql_agg_meta" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
           min(event_id) AS id_min, max(event_id) AS id_max,
           CAST(count(*) FILTER (WHERE event_id % 2 = 1) AS BIGINT) AS n_late,
           min(value) AS v_min, max(value) AS v_max,
           TRUE AS meta_only
         FROM events""",
    "tx_point_lookup_bloom" ->
      """SELECT event_id, event_type, value, TRUE AS bloom_pruned
         FROM events WHERE event_id IN (11, 222, 777)
         ORDER BY event_id""",
    // SQL DML pipeline recompute: + click clones (INSERT), signup values
    // +0.5 (UPDATE), error rows gone (DELETE)
    "tx_sql_dml" ->
      """WITH base AS (SELECT event_id, event_type, value FROM events),
           with_ins AS (
             SELECT event_id, event_type, value FROM base
             UNION ALL
             SELECT event_id + 500000000, event_type, value + 5
               FROM base WHERE event_type = 'click'),
           upd AS (
             SELECT event_id, event_type,
               CASE WHEN event_type = 'signup' THEN value + 0.5 ELSE value END AS value
             FROM with_ins),
           fin AS (SELECT * FROM upd WHERE event_type <> 'error')
         SELECT event_type, count(*) AS n_events,
           CAST(count(DISTINCT event_id) AS BIGINT) AS n_ids,
           min(value) AS v_min, max(value) AS v_max,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
         FROM fin GROUP BY event_type ORDER BY event_type""",
    "tx_sql_merge" ->
      """WITH merged AS (
           SELECT event_id, event_type, value + 2000 AS value
             FROM events WHERE event_id % 101 = 7
           UNION ALL
           SELECT event_id, event_type, value
             FROM events WHERE event_id % 101 <> 7
           UNION ALL
           SELECT event_id + 400000000 AS event_id, event_type, value
             FROM events WHERE event_id % 101 = 8)
         SELECT event_type, count(*) AS n_events,
           CAST(count(DISTINCT event_id) AS BIGINT) AS n_ids,
           min(value) AS v_min, max(value) AS v_max,
           TRUE AS files_kept
         FROM merged GROUP BY event_type ORDER BY event_type""",
    "tx_sql_merge_delete" ->
      """SELECT event_type, count(*) AS n_events,
           CAST(count(DISTINCT event_id) AS BIGINT) AS n_ids,
           min(value) AS v_min, max(value) AS v_max
         FROM events WHERE event_id % 11 <> 0
         GROUP BY event_type ORDER BY event_type""",
    "tx_sql_catalog_v2" ->
      """WITH final AS (
           SELECT event_id, event_type, value,
             event_id % 5 = 2 AS sampled FROM events
           UNION ALL
           SELECT event_id + 900000000, event_type, value + 5, TRUE
             FROM events WHERE event_id % 131 = 7)
         SELECT event_type, count(*) AS n_events,
           CAST(count(CASE WHEN sampled THEN 1 END) AS BIGINT) AS n_sampled,
           min(value) AS v_min, max(value) AS v_max,
           TRUE AS replace_kept_history, TRUE AS v1_scan
         FROM final GROUP BY event_type ORDER BY event_type""",
    "tx_sql_rename" ->
      """WITH renamed AS (
           SELECT event_id, event_type, value AS amount FROM events
           UNION ALL
           SELECT event_id + 900000000, event_type, value + 7 AS amount
             FROM events WHERE event_id % 131 = 5)
         SELECT event_type, count(*) AS n_events,
           min(amount) AS a_min, max(amount) AS a_max,
           TRUE AS files_kept, TRUE AS v1_old_name
         FROM renamed GROUP BY event_type ORDER BY event_type""",
    "tx_sql_create_partitioned" ->
      """SELECT event_type, count(*) AS n_events,
           min(value) AS v_min, max(value) AS v_max,
           TRUE AS hive_layout, TRUE AS files_pruned
         FROM events WHERE event_type IN ('purchase', 'signup')
         GROUP BY event_type ORDER BY event_type""",
    // catalog lifecycle recompute: insert all → signup +0.5 → error rows
    // gone → upsert (%113==9 re-valued from SOURCE values +3000 — error
    // rows among them RE-INSERT as unmatched; %113==10 re-keyed inserts)
    "tx_sql_catalog" ->
      """WITH base AS (SELECT event_id, event_type, value FROM events),
           upd AS (
             SELECT event_id, event_type,
               CASE WHEN event_type = 'signup' THEN value + 0.5 ELSE value END AS value
             FROM base),
           del AS (SELECT * FROM upd WHERE event_type <> 'error'),
           src AS (
             SELECT event_id, event_type, value + 3000 AS value
               FROM base WHERE event_id % 113 = 9
             UNION ALL
             SELECT event_id + 600000000, event_type, value
               FROM base WHERE event_id % 113 = 10),
           merged AS (
             SELECT * FROM del WHERE event_id NOT IN (SELECT event_id FROM src)
             UNION ALL SELECT * FROM src)
         SELECT event_type, count(*) AS n_events,
           CAST(count(DISTINCT event_id) AS BIGINT) AS n_ids,
           min(value) AS v_min, max(value) AS v_max,
           CAST(5 AS BIGINT) AS history_len
         FROM merged GROUP BY event_type ORDER BY event_type""",
    // conditional-merge routing recompute: matched (%127==11) high-value
    // rows deleted / rest value+4000 (type kept), unmatched 'error'
    // targets dropped (BY SOURCE), rekeyed non-error source rows inserted
    "tx_sql_merge_conditional" ->
      """WITH base AS (SELECT event_id, event_type, value FROM events),
           srcm AS (SELECT event_id, event_type, value
                      FROM base WHERE event_id % 127 = 11),
           srci AS (SELECT event_id + 700000000 AS event_id, event_type, value
                      FROM base WHERE event_id % 127 = 12),
           kept AS (
             SELECT b.event_id, b.event_type, b.value + 4000 AS value
               FROM base b JOIN srcm m ON b.event_id = m.event_id
              WHERE m.value <= 250
             UNION ALL
             SELECT b.event_id, b.event_type,
                    CASE WHEN b.value < 10 THEN b.value + 100000
                         ELSE b.value END AS value
               FROM base b
              WHERE b.event_id NOT IN (SELECT event_id FROM srcm)
                AND b.event_type <> 'error'
             UNION ALL
             SELECT event_id, event_type, value FROM srci
              WHERE event_type <> 'error')
         SELECT event_type, count(*) AS n_events,
           CAST(count(DISTINCT event_id) AS BIGINT) AS n_ids,
           min(value) AS v_min, max(value) AS v_max,
           TRUE AS files_kept
         FROM kept GROUP BY event_type ORDER BY event_type""",
    // converted-table recompute: DELETE dropped the error rows; v1 time
    // travel sees everything; sidecar pruning pinned true
    "tx_sql_convert" ->
      """SELECT event_type, count(*) AS n_events,
           min(value) AS v_min, max(value) AS v_max,
           CAST((SELECT count(*) FROM events) AS BIGINT) AS v1_total,
           TRUE AS files_pruned
         FROM events WHERE event_type <> 'error'
         GROUP BY event_type ORDER BY event_type""",
    // constraint recompute: all events admit value >= 0; the violating
    // insert refused in-builder; one legal insert landed
    "tx_sql_constraints" ->
      """WITH rows_ AS (
           SELECT event_type, value FROM events
           UNION ALL SELECT 'ok', 1.25)
         SELECT event_type, count(*) AS n_events,
           min(value) AS v_min, max(value) AS v_max
         FROM rows_ GROUP BY event_type ORDER BY event_type""",
    // lifecycle recompute: ALTER/INSERT fully undone by the restore, so
    // the snapshot is exactly the raw events; clone pins are invariants
    "tx_sql_lifecycle" ->
      """SELECT event_type, count(*) AS n_events,
           min(value) AS v_min, max(value) AS v_max,
           TRUE AS schema_restored, TRUE AS clone_empty,
           TRUE AS clone_v1_intact
         FROM events GROUP BY event_type ORDER BY event_type""",
    "tx_sql_time_travel" ->
      """SELECT event_type, count(*) AS n_v1,
           CAST(CASE WHEN event_type = 'error' THEN 0 ELSE count(*) END AS BIGINT) AS n_latest,
           CAST(CASE WHEN event_type = 'error' THEN 0 ELSE count(*) END AS BIGINT) AS n_ts
         FROM events GROUP BY event_type ORDER BY event_type""",
    "tx_meta_count_dv" ->
      """WITH alive AS (
           SELECT CASE WHEN event_type = 'signup' THEN value + 0.5 ELSE value END AS value
           FROM events WHERE event_id % 97 <> 0)
         SELECT CAST((SELECT count(*) FROM events) AS BIGINT) AS n_all,
           CAST(count(*) AS BIGINT) AS n_after_delete,
           CAST(count(*) AS BIGINT) AS n_after_update,
           min(value) AS v_min, max(value) AS v_max,
           TRUE AS meta_equals_scan
         FROM alive""",
    "tx_stats_meta_ts" ->
      """SELECT CAST(epoch_us(min(ts)) AS BIGINT) AS ts_min_us,
           CAST(epoch_us(max(ts)) AS BIGINT) AS ts_max_us,
           CAST(count(ts) AS BIGINT) AS n_ts,
           min(event_id) AS id_min,
           TRUE AS meta_equals_scan
         FROM events""",
  )

  /** Operator-only twins for the bench split (round-11 VERDICT item 3):
    * the metadata fast paths WITHOUT their in-query verification scans —
    * and, because Bench times these AFTER the full pass, without the
    * (memoized) scratch-table builds either — so BENCH shows the actual
    * metadata-path latency (milliseconds of driver-side sidecar reads, no
    * Spark job) that the full rows' 1-2 s harness cost hides.
    * Correctness of each path is certified by the full oracle query of
    * the same name. */
  val operatorOnly: Map[String, Q] = Map(
    // COUNT-only on purpose: the count correction reads just the (small)
    // DV parquet driver-side — the ms-scale metadata fast path. The full
    // query's MIN/MAX-under-DV additionally re-aggregates every
    // death-carrying file's live rows, which on this harness table (the
    // %97 trickle touches every file) is legitimately a capped scan, not
    // a metadata answer — timing it here would hide the fast path again.
    "tx_meta_count_dv" -> ((s, d) => {
      import s.implicits._
      val table = ensureUpdateDvTable(s, d)
      def mc(v: Option[Long]): Long =
        CommitLog.metaRowCount(table, v).getOrElse(throw new IllegalStateException(
          s"$table: DV metadata count must not fall back here"))
      val latest = CommitLog.latestVersion(table).get
      Seq((mc(Some(1L)), mc(Some(2L)), mc(Some(latest))))
        .toDF("n_all", "n_after_delete", "n_after_update")
    }),
    "tx_stats_meta_string" -> ((s, d) => {
      import s.implicits._
      val (table, _, _, _) = ensureMutTable(s, d)
      val agg = CommitLog.metaAggregate(table, Seq("event_type"))
        .getOrElse(throw new IllegalStateException(
          s"$table: engine-written string bounds must not fall back here"))
      val e = agg.cols("event_type")
      Seq((e.min.get.asInstanceOf[String], e.max.get.asInstanceOf[String],
          e.nonNull))
        .toDF("t_min", "t_max", "n_types")
    }),
    "tx_stats_meta_ts" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.catalyst.util.DateTimeUtils
      val (table, _, _) = ensureTable(s, d)
      val agg = CommitLog.metaAggregate(table, Seq("ets", "event_id"))
        .getOrElse(throw new IllegalStateException(
          s"$table: timestamp metadata bounds must not fall back here"))
      def us(v: Any): Long =
        DateTimeUtils.fromJavaTimestamp(v.asInstanceOf[java.sql.Timestamp])
      val e = agg.cols("ets")
      Seq((us(e.min.get), us(e.max.get), e.nonNull,
          agg.cols("event_id").min.get.asInstanceOf[Long]))
        .toDF("ts_min_us", "ts_max_us", "n_ts", "id_min")
    }),
  )
}
