package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (SURVEY.md §2 parity ops over the
  * `events` table, star-schema relational breadth, and the north-star
  * text/dedup/similarity extensions); `oracleSql` holds the DuckDB twin for
  * every SQL-expressible query (column names and types aligned on both sides).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001 — the reference's
    * fact_tsunami_yearly shape (A3) over the events stand-in table;
    * driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    EventQueries.queries("a3_flag_yearly")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    EventQueries.queries ++ StarQueries.queries ++ TextQueries.queries ++
      DedupQueries.queries ++ VectorQueries.queries ++ MediaQueries.queries ++
      TxQueries.queries ++ StreamQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. Omitted keys (engine-specific hashing, ANN index
    * internals) get the driver's weaker rows-only check. */
  def oracleSql: Map[String, String] =
    EventQueries.oracle ++ StarQueries.oracle ++ TextQueries.oracle ++
      DedupQueries.oracle ++ VectorQueries.oracle ++ MediaQueries.oracle ++
      TxQueries.oracle ++ StreamQueries.oracle

  /** Operator-only twins of the property-oracle queries (round-4 VERDICT
    * item 2): the same engine path minus the in-query verification twin, so
    * [[Bench]] can time the operator separately from its harness. Keys are
    * a subset of [[queries]]; correctness of every path here is certified
    * by the full query of the same name. */
  def operatorQueries: Map[String, (SparkSession, String) => DataFrame] =
    StarQueries.operatorOnly ++ TextQueries.operatorOnly ++
      DedupQueries.operatorOnly ++ VectorQueries.operatorOnly ++
      MediaQueries.operatorOnly ++ StreamQueries.operatorOnly ++
      TxQueries.operatorOnly
}
