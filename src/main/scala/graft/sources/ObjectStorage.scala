package graft.sources

import org.apache.spark.sql.SparkSession

/** Object-storage access configuration + listing (reference S5/S7/K4).
  *
  * The reference configures DuckDB httpfs / delta-rs storage_options with an
  * S3 endpoint, path-style access, unsafe-rename, and static credentials
  * (`usgs_duckdb_s3.py:84-88`, `save_to_raw_delta_dev.py:29-36`,
  * `usgs_tsunami_fact_silver_object_storage.py:134-139`). The Spark-native
  * equivalent is Hadoop `fs.s3a.*` configuration — after [[configureS3a]],
  * every `spark.read`/`write` against `s3a://…` URIs uses the endpoint, and
  * the committer notes below replace the unsafe-rename trade-off.
  *
  * No object store exists in this offline environment; the helper is
  * configuration-only and unit-tested for conf effects (the same code path
  * a cluster run takes before its first S3 byte).
  */
object ObjectStorage {

  final case class S3Config(
      endpoint: String,
      accessKey: String,
      secretKey: String,
      pathStyleAccess: Boolean = true,
      region: Option[String] = None)

  /** Apply fs.s3a.* settings to the active Hadoop configuration. */
  def configureS3a(spark: SparkSession, cfg: S3Config): Unit = {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.s3a.endpoint", cfg.endpoint)
    hc.set("fs.s3a.access.key", cfg.accessKey)
    hc.set("fs.s3a.secret.key", cfg.secretKey)
    hc.set("fs.s3a.path.style.access", cfg.pathStyleAccess.toString)
    cfg.region.foreach(hc.set("fs.s3a.endpoint.region", _))
    // The reference sets AWS_S3_ALLOW_UNSAFE_RENAME (delta-rs needs renames;
    // S3 has none). Spark-side the equivalent decision is the committer:
    // directory committer semantics without O(data) copies.
    hc.set("fs.s3a.committer.name", "directory")
  }

  /** Recursive listing under a path (reference S7: boto3 list_objects_v2
    * walk — here the Hadoop FileSystem API, which works for any scheme the
    * classpath supports: file://, hdfs://, s3a://…). */
  def list(spark: SparkSession, path: String): Seq[(String, Long)] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Seq.empty
    val it = fs.listFiles(p, true)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    while (it.hasNext) {
      val s = it.next()
      out += ((s.getPath.toString, s.getLen))
    }
    out.toSeq
  }
}
