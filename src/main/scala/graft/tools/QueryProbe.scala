package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc runner for SparkEntry queries: show each named query's result on a
  * scale-factor dir. Usage:
  * scripts/run_class.sh graft.tools.QueryProbe <sfDir> <query> [query...]
  * With no query names, lists the inventory. */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = args.drop(1)
    if (names.isEmpty) graft.SparkEntry.queries.keys.toSeq.sorted.foreach(println)
    names.foreach { n =>
      println(s"== $n")
      val t0 = System.nanoTime()
      try graft.SparkEntry.queries(n)(spark, sfDir).show(30, truncate = false)
      catch { case e: Throwable => println(s"FAILED: $e") }
      println(f"   ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
