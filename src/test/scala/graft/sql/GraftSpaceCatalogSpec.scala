package graft.sql

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.sources.GraftFileIndex
import graft.tx.CommitLog
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** The v2 `TableCatalog` ([[GraftSpaceCatalog]], round-10 VERDICT item 5):
  * CREATE / REPLACE / DROP by multi-part name, reads routed through the
  * SAME v1 [[GraftFileIndex]] scan, DML through [[GraftDmlRule]], native
  * v2 time travel, staged (history-preserving) REPLACE, namespaces. */
class GraftSpaceCatalogSpec extends SparkSpec {

  /** One catalog-enabled session for the suite (catalog instances are
    * cached per session at first use, so the conf must precede any use). */
  private lazy val cs: SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.graft",
      classOf[GraftSpaceCatalog].getName)
    s.conf.set("spark.sql.catalog.graft.root", tmpDir("graft_cat_root"))
    s
  }

  private def root(parts: String*): String =
    (Paths.get(cs.conf.get("spark.sql.catalog.graft.root")).toString +: parts)
      .mkString("/")

  test("CREATE by multi-part name; reads plan the v1 GraftFileIndex scan") {
    cs.sql("CREATE NAMESPACE graft.lake")
    cs.sql("CREATE NAMESPACE graft.lake.bronze")
    cs.sql("CREATE TABLE graft.lake.bronze.ev (id BIGINT, v DOUBLE) USING graft")
    cs.sql("INSERT INTO graft.lake.bronze.ev VALUES (1, 1.5), (2, 2.5), (3, 3.5)")
    val df = cs.sql("SELECT * FROM graft.lake.bronze.ev WHERE id >= 2")
    assert(df.count() === 2L)
    // the read is the v1 HadoopFsRelation over GraftFileIndex — the one
    // scan path that carries sidecar skipping and vectorized parquet
    val scans = df.queryExecution.optimizedPlan.collect {
      case LogicalRelation(h: HadoopFsRelation, _, _, _, _) => h.location
    }
    assert(scans.nonEmpty && scans.forall(_.isInstanceOf[GraftFileIndex]))
    // and the commit log lives at the namespace-mapped directory
    assert(CommitLog.latestVersion(root("lake", "bronze", "ev")).isDefined)
  }

  test("DML by catalog name routes through GraftDmlRule") {
    cs.sql("CREATE NAMESPACE IF NOT EXISTS graft.dml")
    cs.sql("CREATE TABLE graft.dml.t (id BIGINT, v DOUBLE) USING graft")
    cs.sql("INSERT INTO graft.dml.t VALUES (1, 1.0), (2, 2.0), (3, 3.0)")
    cs.sql("UPDATE graft.dml.t SET v = v + 10 WHERE id = 2")
    cs.sql("DELETE FROM graft.dml.t WHERE id = 3")
    cs.sql("""MERGE INTO graft.dml.t AS t
              USING (SELECT CAST(1 AS BIGINT) AS id, 100.0 AS v
                     UNION ALL SELECT CAST(9 AS BIGINT), 9.0) AS s
              ON t.id = s.id
              WHEN MATCHED THEN UPDATE SET v = s.v
              WHEN NOT MATCHED THEN INSERT *""")
    val rows = cs.sql("SELECT id, v FROM graft.dml.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rows === Seq((1L, 100.0), (2L, 12.0), (9L, 9.0)))
  }

  test("REPLACE TABLE is one staged overwrite commit — history survives") {
    cs.sql("CREATE NAMESPACE IF NOT EXISTS graft.rep")
    cs.sql("CREATE TABLE graft.rep.t (id BIGINT, v DOUBLE) USING graft")
    cs.sql("INSERT INTO graft.rep.t VALUES (1, 1.0), (2, 2.0)")
    val before = CommitLog.latestVersion(root("rep", "t")).get
    cs.sql("REPLACE TABLE graft.rep.t (id BIGINT, tag STRING) USING graft")
    // new schema, empty snapshot, SAME log (history preserved)
    val after = CommitLog.latestVersion(root("rep", "t")).get
    assert(after === before + 1)
    assert(cs.table("graft.rep.t").columns.toSeq === Seq("id", "tag"))
    assert(cs.table("graft.rep.t").count() === 0L)
    // time travel reaches the pre-replace snapshot
    assert(cs.sql(s"SELECT * FROM graft.rep.t VERSION AS OF $before").count() === 2L)

    cs.sql("""CREATE OR REPLACE TABLE graft.rep.t USING graft AS
              SELECT CAST(7 AS BIGINT) AS id, 'x' AS tag""")
    assert(cs.sql("SELECT tag FROM graft.rep.t").collect().map(_.getString(0)).toSeq
      === Seq("x"))
    assert(CommitLog.latestVersion(root("rep", "t")).get === after + 1)
  }

  test("CTAS stages the creating commit; INSERT OVERWRITE truncates") {
    cs.sql("CREATE NAMESPACE IF NOT EXISTS graft.ctas")
    cs.sql("""CREATE TABLE graft.ctas.t USING graft AS
              SELECT id, CAST(id * 1.5 AS DOUBLE) AS v FROM range(10)""")
    assert(cs.table("graft.ctas.t").count() === 10L)
    cs.sql("INSERT OVERWRITE graft.ctas.t SELECT id, CAST(0.0 AS DOUBLE) FROM range(3)")
    assert(cs.table("graft.ctas.t").count() === 3L)
  }

  test("PARTITIONED BY by catalog name: hive layout recorded and pruned") {
    cs.sql("CREATE NAMESPACE IF NOT EXISTS graft.part")
    cs.sql("""CREATE TABLE graft.part.t (id BIGINT, k STRING) USING graft
              PARTITIONED BY (k)""")
    cs.sql("INSERT INTO graft.part.t VALUES (1, 'a'), (2, 'b'), (3, 'a')")
    val r = root("part", "t")
    val m = CommitLog.manifest(r, CommitLog.latestVersion(r).get)
    assert(m.partitionBy === Seq("k"))
    assert(m.files.nonEmpty && m.files.forall(_.contains("k=")))
    val pruned = CommitLog.pruneFiles(r, m,
      Seq(org.apache.spark.sql.sources.EqualTo("k", "a")))
    assert(pruned.size < m.files.size)
    assert(cs.sql("SELECT count(*) FROM graft.part.t WHERE k = 'a'")
      .collect().head.getLong(0) === 2L)
  }

  test("v2 time travel: VERSION AS OF and TIMESTAMP AS OF by name") {
    cs.sql("CREATE NAMESPACE IF NOT EXISTS graft.tt")
    cs.sql("CREATE TABLE graft.tt.t (id BIGINT) USING graft")
    cs.sql("INSERT INTO graft.tt.t VALUES (1)")
    cs.sql("INSERT INTO graft.tt.t VALUES (2)")
    assert(cs.sql("SELECT * FROM graft.tt.t VERSION AS OF 2").count() === 1L)
    assert(cs.sql("SELECT * FROM graft.tt.t").count() === 2L)
    // TIMESTAMP AS OF a future instant = latest
    assert(cs.sql(
      "SELECT * FROM graft.tt.t TIMESTAMP AS OF '2999-01-01'").count() === 2L)
    // a pinned relation refuses writes
    val e = intercept[Exception] {
      cs.sql("INSERT INTO graft.tt.t VERSION AS OF 2 VALUES (9)")
    }
    assert(e.getMessage != null)
  }

  test("DESCRIBE HISTORY / OPTIMIZE accept the catalog name (maintenance path)") {
    cs.sql("CREATE NAMESPACE IF NOT EXISTS graft.mx")
    cs.sql("CREATE TABLE graft.mx.t (id BIGINT) USING graft")
    cs.sql("INSERT INTO graft.mx.t VALUES (1)")
    cs.sql("INSERT INTO graft.mx.t VALUES (2)")
    val hist = cs.sql("DESCRIBE HISTORY graft.mx.t")
    assert(hist.count() === 3L) // create + 2 inserts
    cs.sql("OPTIMIZE graft.mx.t")
    assert(cs.table("graft.mx.t").count() === 2L)
  }

  test("ALTER TABLE ADD/RENAME/DROP COLUMN through the v2 catalog") {
    cs.sql("CREATE NAMESPACE IF NOT EXISTS graft.alt")
    cs.sql("CREATE TABLE graft.alt.t (id BIGINT, v DOUBLE) USING graft")
    cs.sql("INSERT INTO graft.alt.t VALUES (1, 1.0)")
    cs.sql("ALTER TABLE graft.alt.t ADD COLUMNS (tag STRING)")
    assert(cs.table("graft.alt.t").columns.toSeq === Seq("id", "v", "tag"))
    cs.sql("ALTER TABLE graft.alt.t RENAME COLUMN v TO amount")
    assert(cs.table("graft.alt.t").columns.toSeq === Seq("id", "amount", "tag"))
    assert(cs.sql("SELECT amount FROM graft.alt.t").collect().head.getDouble(0) === 1.0)
    cs.sql("ALTER TABLE graft.alt.t DROP COLUMN tag")
    assert(cs.table("graft.alt.t").columns.toSeq === Seq("id", "amount"))
  }

  test("DROP managed deletes data; external LOCATION drops registration only") {
    cs.sql("CREATE NAMESPACE IF NOT EXISTS graft.dr")
    cs.sql("CREATE TABLE graft.dr.managed (id BIGINT) USING graft")
    cs.sql("INSERT INTO graft.dr.managed VALUES (1)")
    val mdir = root("dr", "managed")
    assert(Files.exists(Paths.get(mdir)))
    cs.sql("DROP TABLE graft.dr.managed")
    assert(!Files.exists(Paths.get(mdir)))

    val ext = tmpDir("graft_cat_ext") + "/t"
    cs.sql(s"CREATE TABLE graft.dr.ext (id BIGINT) USING graft LOCATION '$ext'")
    cs.sql("INSERT INTO graft.dr.ext VALUES (1), (2)")
    cs.sql("DROP TABLE graft.dr.ext")
    // the DATA survives the drop — only the registration went
    assert(CommitLog.latestVersion(ext).isDefined)
    assert(spark.read.format("graft").load(ext).count() === 2L)
    assert(!cs.catalog.tableExists("graft.dr.ext"))
  }

  test("namespaces list, nest, and refuse non-empty drops") {
    cs.sql("CREATE NAMESPACE IF NOT EXISTS graft.nsx.inner")
    cs.sql("CREATE TABLE graft.nsx.inner.t (id BIGINT) USING graft")
    val tables = cs.sql("SHOW TABLES IN graft.nsx.inner")
      .collect().map(_.getString(1)).toSeq
    assert(tables === Seq("t"))
    val inner = cs.sql("SHOW NAMESPACES IN graft.nsx")
      .collect().map(_.getString(0)).toSeq
    assert(inner.exists(_.endsWith("inner")))
    intercept[Exception] { cs.sql("DROP NAMESPACE graft.nsx.inner") }
    cs.sql("DROP NAMESPACE graft.nsx.inner CASCADE")
    assert(!Files.exists(Paths.get(root("nsx", "inner"))))
  }

  test("filtered INSERT OVERWRITE maps to replaceWhere: one atomic region swap") {
    cs.sql("CREATE NAMESPACE IF NOT EXISTS graft.rw")
    cs.sql("""CREATE TABLE graft.rw.t (id BIGINT, k STRING) USING graft
              PARTITIONED BY (k)""")
    cs.sql("INSERT INTO graft.rw.t VALUES (1, 'a'), (2, 'b'), (3, 'a')")
    val r = root("rw", "t")
    val before = CommitLog.manifest(r, CommitLog.latestVersion(r).get)
    // static-partition overwrite: only k='a' rows are replaced
    cs.sql("INSERT OVERWRITE graft.rw.t PARTITION (k = 'a') VALUES (10L), (11L), (12L)")
    val rows = cs.sql("SELECT id, k FROM graft.rw.t ORDER BY id")
      .collect().map(x => (x.getLong(0), x.getString(1))).toSeq
    assert(rows === Seq((2L, "b"), (10L, "a"), (11L, "a"), (12L, "a")))
    // ONE new version, and the untouched partition's files carried over
    val after = CommitLog.manifest(r, CommitLog.latestVersion(r).get)
    assert(after.version === before.version + 1 && after.mode === "replace")
    val bFiles = before.files.filter(_.contains("k=b"))
    assert(bFiles.nonEmpty && bFiles.forall(after.files.contains))
  }

  test("dynamic partition overwrite replaces exactly the written partitions") {
    cs.sql("CREATE NAMESPACE IF NOT EXISTS graft.dyn")
    cs.sql("""CREATE TABLE graft.dyn.t (id BIGINT, k STRING) USING graft
              PARTITIONED BY (k)""")
    cs.sql("INSERT INTO graft.dyn.t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    val prev = cs.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    cs.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // the incoming rows touch only k='a' and k='c' — k='b' must survive
      cs.sql("INSERT OVERWRITE graft.dyn.t VALUES (10L, 'a'), (30L, 'c')")
    } finally prev match {
      case Some(v) => cs.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => cs.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    val rows = cs.sql("SELECT id, k FROM graft.dyn.t ORDER BY id")
      .collect().map(x => (x.getLong(0), x.getString(1))).toSeq
    assert(rows === Seq((2L, "b"), (10L, "a"), (30L, "c")))
    // one atomic replace version
    val r = root("dyn", "t")
    assert(CommitLog.manifest(r, CommitLog.latestVersion(r).get).mode === "replace")
  }

  test("DataFrameWriterV2: writeTo(...).create/append/createOrReplace/overwritePartitions") {
    import cs.implicits._
    cs.sql("CREATE NAMESPACE IF NOT EXISTS graft.w2")
    Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v")
      .writeTo("graft.w2.t").using("graft").create()
    assert(cs.table("graft.w2.t").count() === 2L)
    Seq((3L, 3.0)).toDF("id", "v").writeTo("graft.w2.t").append()
    assert(cs.table("graft.w2.t").count() === 3L)
    // createOrReplace = staged replace: one commit, history preserved
    val r = root("w2", "t")
    val before = CommitLog.latestVersion(r).get
    Seq((9L, 9.0)).toDF("id", "v")
      .writeTo("graft.w2.t").using("graft").createOrReplace()
    assert(cs.table("graft.w2.t").count() === 1L)
    assert(CommitLog.latestVersion(r).get === before + 1)
    assert(CommitLog.readAt(cs, r, before).count() === 3L)
    // overwritePartitions on a partitioned table = dynamic overwrite
    cs.sql("""CREATE TABLE graft.w2.p (id BIGINT, k STRING) USING graft
              PARTITIONED BY (k)""")
    cs.sql("INSERT INTO graft.w2.p VALUES (1, 'a'), (2, 'b')")
    Seq((9L, "a")).toDF("id", "k").writeTo("graft.w2.p").overwritePartitions()
    val rows = cs.sql("SELECT id, k FROM graft.w2.p ORDER BY id")
      .collect().map(x => (x.getLong(0), x.getString(1))).toSeq
    assert(rows === Seq((2L, "b"), (9L, "a")))
  }

  test("self-referential INSERT: the write target stays v2, the read converts") {
    cs.sql("CREATE NAMESPACE IF NOT EXISTS graft.self")
    cs.sql("CREATE TABLE graft.self.t (id BIGINT, v DOUBLE) USING graft")
    cs.sql("INSERT INTO graft.self.t VALUES (1, 1.0), (2, 2.0)")
    // INSERT INTO t SELECT FROM t — the conversion rule must convert the
    // QUERY's relation instance while leaving the AppendData target v2
    cs.sql("INSERT INTO graft.self.t SELECT id + 10, v + 0.5 FROM graft.self.t")
    val ids = cs.sql("SELECT id FROM graft.self.t ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids === Seq(1L, 2L, 11L, 12L))
  }

  test("RESTORE and DESCRIBE DETAIL accept v2 catalog names") {
    cs.sql("CREATE NAMESPACE IF NOT EXISTS graft.rs")
    cs.sql("CREATE TABLE graft.rs.t (id BIGINT) USING graft")
    cs.sql("INSERT INTO graft.rs.t VALUES (1)")
    cs.sql("INSERT INTO graft.rs.t VALUES (2)")
    cs.sql("RESTORE TABLE graft.rs.t TO VERSION AS OF 2")
    assert(cs.table("graft.rs.t").count() === 1L)
    val detail = cs.sql("DESCRIBE DETAIL graft.rs.t")
    assert(detail.count() === 1L)
  }

  test("DV-carrying and column-mapped snapshots serve by catalog name too") {
    cs.sql("CREATE NAMESPACE IF NOT EXISTS graft.dv")
    cs.sql("CREATE TABLE graft.dv.t (id BIGINT, v DOUBLE) USING graft")
    cs.sql("INSERT INTO graft.dv.t VALUES (1, 1.0), (2, 2.0), (3, 3.0), (4, 4.0)")
    val r = root("dv", "t")
    // a merge-on-read DELETE leaves deletion vectors: the by-name read
    // must route through the DV fallback relation, not resurrect the row
    CommitLog.deleteDv(cs, r, org.apache.spark.sql.functions.col("id") === 2L)
    assert(cs.sql("SELECT id FROM graft.dv.t ORDER BY id")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 3L, 4L))
    // DML by name still works on the DV snapshot
    cs.sql("DELETE FROM graft.dv.t WHERE id = 3")
    assert(cs.table("graft.dv.t").count() === 2L)
    // a RENAME (column mapping, zero rewrites) keeps by-name reads exact
    cs.sql("ALTER TABLE graft.dv.t RENAME COLUMN v TO amount")
    assert(cs.sql("SELECT sum(amount) FROM graft.dv.t").collect()
      .head.getDouble(0) === 5.0)
  }

  test("concurrent INSERTs by catalog name serialize through the commit log") {
    cs.sql("CREATE NAMESPACE IF NOT EXISTS graft.cc")
    cs.sql("CREATE TABLE graft.cc.t (id BIGINT) USING graft")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val writes = (0 until 6).map { i =>
      Future { cs.sql(s"INSERT INTO graft.cc.t VALUES (${i}0), (${i}1)") }
    }
    Await.result(Future.sequence(writes), 120.seconds)
    assert(cs.table("graft.cc.t").count() === 12L)
    // 6 inserts = 6 serialized versions on top of the create
    assert(CommitLog.latestVersion(root("cc", "t")) === Some(7L))
  }

  test("streaming by catalog name: readStream.table tails, writeStream.toTable commits") {
    cs.sql("CREATE NAMESPACE IF NOT EXISTS graft.st")
    cs.sql("CREATE TABLE graft.st.src (id BIGINT, v DOUBLE) USING graft")
    cs.sql("INSERT INTO graft.st.src VALUES (1, 1.0), (2, 2.0)")
    // readStream.table: the V2TableWithV1Fallback routes to the same
    // version-tailing CDF source as path-addressed streams
    val q = cs.readStream.option("startingVersion", "earliest")
      .table("graft.st.src")
      .writeStream.format("memory").queryName("cat_tail")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(cs.table("cat_tail").count() === 2L)
      cs.sql("INSERT INTO graft.st.src VALUES (3, 3.0)")
      q.processAllAvailable()
      assert(cs.table("cat_tail").count() === 3L)
    } finally q.stop()

    // writeStream.toTable: micro-batches become commits on the catalog
    // table (checkpoint-scoped exactly-once identity, as by path)
    cs.sql("CREATE TABLE graft.st.dst (id BIGINT, v DOUBLE) USING graft")
    import cs.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = cs.sqlContext
    val src = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Double)]
    src.addData((10L, 1.5), (11L, 2.5))
    val w = src.toDF().toDF("id", "v").writeStream.format("graft")
      .option("checkpointLocation", tmpDir("cat_sink_ckpt"))
      .toTable("graft.st.dst")
    try {
      w.processAllAvailable()
      assert(cs.table("graft.st.dst").count() === 2L)
      src.addData((12L, 3.5))
      w.processAllAvailable()
      assert(cs.sql("SELECT id FROM graft.st.dst ORDER BY id")
        .collect().map(_.getLong(0)).toSeq === Seq(10L, 11L, 12L))
    } finally w.stop()
  }

  test("REPLACE and CTAS honor EXTERNAL locations (staged commits land at the pointer target)") {
    cs.sql("CREATE NAMESPACE IF NOT EXISTS graft.ext")
    // external CTAS: the data must commit at the declared LOCATION, not
    // the catalog registration dir (round-11 review finding)
    val extA = tmpDir("graft_ext_ctas") + "/t"
    cs.sql(s"""CREATE TABLE graft.ext.a USING graft LOCATION '$extA' AS
               SELECT CAST(1 AS BIGINT) AS id""")
    assert(CommitLog.latestVersion(extA).isDefined)
    assert(cs.table("graft.ext.a").count() === 1L)
    // DROP removes only the registration; the external data survives
    cs.sql("DROP TABLE graft.ext.a")
    assert(spark.read.format("graft").load(extA).count() === 1L)

    // REPLACE on an external table must commit THROUGH the pointer — the
    // old bug committed into the registration dir, making the replace
    // silently invisible behind the pointer
    val extB = tmpDir("graft_ext_rep") + "/t"
    cs.sql(s"CREATE TABLE graft.ext.b (id BIGINT) USING graft LOCATION '$extB'")
    cs.sql("INSERT INTO graft.ext.b VALUES (1), (2)")
    cs.sql("""CREATE OR REPLACE TABLE graft.ext.b USING graft AS
              SELECT CAST(9 AS BIGINT) AS id""")
    assert(cs.sql("SELECT id FROM graft.ext.b").collect().map(_.getLong(0)).toSeq
      === Seq(9L))
    // the replace is a version at the EXTERNAL root, history preserved
    assert(CommitLog.latestVersion(extB).exists(_ >= 3L))
    assert(CommitLog.readAt(cs, extB, 2L).count() === 2L)
    // relocating via REPLACE ... LOCATION refuses loudly
    intercept[Exception] {
      cs.sql(s"""REPLACE TABLE graft.ext.b (id BIGINT) USING graft
                 LOCATION '${tmpDir("graft_ext_other")}/t'""")
    }
  }

  test("the graft catalog refuses foreign providers; CREATE refuses dup names") {
    cs.sql("CREATE NAMESPACE IF NOT EXISTS graft.ref")
    intercept[Exception] {
      cs.sql("CREATE TABLE graft.ref.p (id BIGINT) USING parquet")
    }
    cs.sql("CREATE TABLE graft.ref.t (id BIGINT) USING graft")
    intercept[Exception] {
      cs.sql("CREATE TABLE graft.ref.t (id BIGINT) USING graft")
    }
    // RENAME TABLE moves the directory (the new name is catalog-relative)
    cs.sql("ALTER TABLE graft.ref.t RENAME TO ref.t2")
    assert(cs.catalog.tableExists("graft.ref.t2"))
    assert(!cs.catalog.tableExists("graft.ref.t"))
  }

  test("USE graft: a 2-part partitioned CREATE lands in the CURRENT v2 catalog " +
      "(round-11 ADVICE, low)") {
    cs.sql("CREATE NAMESPACE IF NOT EXISTS graft.usens")
    cs.sql("USE graft")
    try {
      // the parser-level PARTITIONED BY interception must NOT claim this
      // name for the session catalog: under `USE graft` the 2-part name
      // is graft's namespace.table, and GraftSpaceCatalog.createTable
      // honors the partitioning natively
      cs.sql("""CREATE TABLE usens.t (id BIGINT, k STRING) USING graft
                PARTITIONED BY (k)""")
      cs.sql("INSERT INTO usens.t VALUES (1, 'a'), (2, 'b')")
      assert(CommitLog.latestVersion(root("usens", "t")).isDefined)
      assert(CommitLog.manifest(root("usens", "t"),
        CommitLog.latestVersion(root("usens", "t")).get).partitionBy === Seq("k"))
      // and nothing leaked into the session catalog under a db named 'usens'
      assert(!spark.sessionState.catalog.databaseExists("usens"))
    } finally cs.sql("USE spark_catalog")
  }

  test("MERGE identity-insert: mode-agnostic alignment casts pass, lossy casts " +
      "refuse (round-11 ADVICE, low)") {
    cs.sql("CREATE NAMESPACE IF NOT EXISTS graft.castck")
    cs.sql("CREATE TABLE graft.castck.t (id BIGINT, v DOUBLE) USING graft")
    cs.sql("INSERT INTO graft.castck.t VALUES (1, 1.0)")
    // decimal literal into DOUBLE: the analyzer's store-assignment cast
    // can never fail and is mode-agnostic — identity, accepted
    cs.sql("""MERGE INTO graft.castck.t AS t
              USING (SELECT CAST(9 AS BIGINT) AS id, 9.5 AS v) AS s
              ON t.id = s.id
              WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)""")
    assert(cs.sql("SELECT v FROM graft.castck.t WHERE id = 9")
      .collect().map(_.getDouble(0)).toSeq === Seq(9.5))
    // BIGINT source into INT target: the planned ANSI cast can overflow —
    // dropping it for commit's by-name coercion would change overflow
    // semantics, so the insert refuses as non-identity
    cs.sql("CREATE TABLE graft.castck.n (id BIGINT, v INT) USING graft")
    cs.sql("INSERT INTO graft.castck.n VALUES (1, 1)")
    val e = intercept[Exception] {
      cs.sql("""MERGE INTO graft.castck.n AS t
                USING (SELECT CAST(9 AS BIGINT) AS id, CAST(7 AS BIGINT) AS v) AS s
                ON t.id = s.id
                WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)""")
    }
    assert(e.getMessage.contains("MERGE INSERT must be *"))
  }
}
