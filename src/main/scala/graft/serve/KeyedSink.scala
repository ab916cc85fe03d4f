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
    def open(): Unit = ()
    def write(row: Row): Unit
    def close(): Unit = ()
  }

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
