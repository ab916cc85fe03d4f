package graft.sinks

import org.apache.spark.sql.DataFrame
import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

/** CSV/JSON file sinks with timestamped names and skip-if-empty semantics
  * (`save_to_csv`/`save_to_json`, `usgs-earthquake-data-ingest.py:173-194`).
  *
  * The reference writes one local file per page; Spark writes a directory of
  * part-files per sink call — the distributed-correct equivalent (a single
  * file would force `coalesce(1)` through the driver, an anti-pattern at
  * scale). Timestamped directory naming is preserved (`:179,191`).
  */
object FileSinks {
  private val fmt = DateTimeFormatter.ofPattern("yyyyMMddHHmmss")

  private def stamped(dir: String, prefix: String, ext: String, now: LocalDateTime): String =
    s"$dir/${prefix}_${now.format(fmt)}.$ext"

  def saveCsv(df: DataFrame, dir: String, prefix: String = "earthquake_data",
      now: LocalDateTime = LocalDateTime.now()): Option[String] =
    if (df.isEmpty) None else {
      val path = stamped(dir, prefix, "csv", now)
      df.write.option("header", "true").csv(path)
      Some(path)
    }

  def saveJson(df: DataFrame, dir: String, prefix: String = "earthquake_data",
      now: LocalDateTime = LocalDateTime.now()): Option[String] =
    if (df.isEmpty) None else {
      val path = stamped(dir, prefix, "json", now)
      df.write.json(path)
      Some(path)
    }
}
