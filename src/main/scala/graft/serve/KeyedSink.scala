package graft.serve

import org.apache.spark.sql.{DataFrame, Row, SaveMode}
import org.apache.spark.sql.functions._

/** Serving-layer sink shaped like the reference's Cassandra table:
  * `PRIMARY KEY ((month, year), eventtime)` with `CLUSTERING ORDER BY
  * (eventtime DESC)` (`db-script.cql:37-38`), written by 20-way async
  * prepared inserts (`save_to_cassandra.py:123-192`).
  *
  * The connector is unavailable offline (SURVEY.md §7.4), so the sink is a
  * trait: the row-writer is injected and driven by `foreachPartition` — the
  * reference's driver-side `iter_rows` loop (`save_to_cassandra.py:140-176`)
  * becomes partition-parallel executor work, which is the 100 TB-correct
  * shape (concurrency = partition count, not one Python process).
  */
object KeyedSink {

  /** Abstract keyed writer: one call per partition with rows pre-grouped by
    * the serving partition key and pre-sorted by clustering key desc. */
  trait RowWriter extends Serializable {
    /** `options` carries the consistency level the batch variant mirrors
      * from `BatchStatement(consistency_level=QUORUM)`
      * (`save_to_cassandra.py:69`); connectors that care read it here. */
    def open(options: BatchOptions): Unit = open()
    def open(): Unit = ()
    def write(row: Row): Unit
    /** Called after each committed chunk (reference logs per batch,
      * `save_to_cassandra.py:115`); hooks/tests observe chunk boundaries. */
    def onBatchComplete(size: Int): Unit = ()
    def close(): Unit = ()
  }

  /** Knobs of the reference's batched writer (`save_to_cassandra.py:57-120`):
    * `batch_size=100` chunks, `time.sleep(timeout)` pacing between batches,
    * QUORUM consistency on the batch statement. `maxCapturedErrorsPerPartition`
    * bounds the failure samples shipped back to the driver. */
  final case class BatchOptions(
      batchSize: Int = 100,
      pacingMillis: Long = 0L,
      consistency: String = "QUORUM",
      maxCapturedErrorsPerPartition: Int = 20) {
    require(batchSize > 0 && pacingMillis >= 0)
  }

  /** Outcome of a batched write: exact written/failed row counts plus a
    * bounded sample of per-row failures (row rendering + error message). */
  final case class BatchReport(written: Long, failed: Long, errorSamples: Seq[String])

  /** Cluster the frame exactly like the serving table's layout: partition by
    * (month, year), order eventtime DESC within each partition. */
  def clustered(df: DataFrame): DataFrame =
    df.repartition(col("month"), col("year"))
      .sortWithinPartitions(col("eventtime").desc)

  /** Push every row through the injected writer, partition-parallel —
    * the Spark shape of `execute_concurrent_with_args(concurrency=20)`. */
  def write(df: DataFrame, writer: RowWriter): Unit =
    clustered(df).foreachPartition { (rows: Iterator[Row]) =>
      writer.open()
      try rows.foreach(writer.write) finally writer.close()
    }

  /** Batched variant with the reference's chunk/pacing/consistency behavior
    * (`save_to_cassandra.py:57-120`): rows stream through the writer in
    * `batchSize` chunks, each chunk boundary fires `onBatchComplete` and the
    * optional pacing sleep (the reference throttles Cassandra with
    * `time.sleep` between batches), and a failing row never aborts its
    * partition — it is counted and sampled per row (the reference's
    * row-level try/log), with exact totals returned to the driver via
    * accumulators. */
  def writeBatched(df: DataFrame, writer: RowWriter,
      options: BatchOptions = BatchOptions()): BatchReport = {
    val sc = df.sparkSession.sparkContext
    val written = sc.longAccumulator("keyedsink.written")
    val failed = sc.longAccumulator("keyedsink.failed")
    val samples = sc.collectionAccumulator[String]("keyedsink.errorSamples")
    clustered(df).foreachPartition { (rows: Iterator[Row]) =>
      writer.open(options)
      var captured = 0
      try {
        val batches = rows.grouped(options.batchSize)
        var first = true
        batches.foreach { batch =>
          if (!first && options.pacingMillis > 0) Thread.sleep(options.pacingMillis)
          first = false
          batch.foreach { r =>
            try { writer.write(r); written.add(1) }
            catch {
              case e: Exception =>
                failed.add(1)
                if (captured < options.maxCapturedErrorsPerPartition) {
                  samples.add(s"$r -> ${e.getClass.getSimpleName}: ${e.getMessage}")
                  captured += 1
                }
            }
          }
          writer.onBatchComplete(batch.size)
        }
      } finally writer.close()
    }
    import scala.jdk.CollectionConverters._
    BatchReport(written.value, failed.value, samples.value.asScala.toSeq)
  }

  /** Generate the serving table's CQL DDL from the frame's Spark schema —
    * the reference hand-maintains this file (`db-script.cql:4-38`); deriving
    * it keeps the serving schema in lockstep with the pipeline schema
    * instead of drifting. Type map follows the reference's choices
    * (double→FLOAT, int→INT, string→TEXT, timestamp→TIMESTAMP); key layout
    * mirrors `PRIMARY KEY ((month, year), eventtime) WITH CLUSTERING ORDER
    * BY (eventtime DESC)` (`db-script.cql:37-38`). */
  def cqlDdl(schema: org.apache.spark.sql.types.StructType, table: String,
      partitionKeys: Seq[String] = Seq("month", "year"),
      clusteringKey: String = "eventtime", descending: Boolean = true): String = {
    import org.apache.spark.sql.types._
    def cqlType(dt: DataType): String = dt match {
      case StringType => "TEXT"
      case IntegerType => "INT"
      case LongType => "BIGINT"
      case FloatType | DoubleType => "FLOAT" // reference stores doubles as FLOAT (db-script.cql:8)
      case TimestampType => "TIMESTAMP"
      case BooleanType => "BOOLEAN"
      case BinaryType => "BLOB"
      case other => throw new IllegalArgumentException(
        s"no CQL mapping for ${other.simpleString}")
    }
    val keyCols = (partitionKeys :+ clusteringKey).toSet
    require(keyCols.subsetOf(schema.fieldNames.toSet),
      s"key columns ${keyCols -- schema.fieldNames.toSet} missing from schema")
    val cols = schema.fields.map(f => s"    ${f.name} ${cqlType(f.dataType)},").mkString("\n")
    val order = if (descending) "DESC" else "ASC"
    s"""CREATE TABLE IF NOT EXISTS $table (
       |$cols
       |    PRIMARY KEY ((${partitionKeys.mkString(", ")}), $clusteringKey)
       |) WITH CLUSTERING ORDER BY ($clusteringKey $order);""".stripMargin
  }

  /** Layout-equivalent file fallback (SURVEY.md §2.10 K6): parquet
    * hive-partitioned by the serving key, rows sorted eventtime desc within
    * files — same point-lookup pruning a (month, year) PK gives. */
  def writeFiles(df: DataFrame, path: String): Unit =
    df.repartition(col("month"), col("year"))
      .sortWithinPartitions(col("eventtime").desc)
      .write.mode(SaveMode.Overwrite)
      .partitionBy("month", "year")
      .parquet(path)
}
