package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Component timings for the MinHash pipeline. Usage:
  * scripts/run_class.sh graft.tools.MicroProbe <docsParquetDir> */
object MicroProbe {
  def main(args: Array[String]): Unit = {
    val docsPath = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1/documents.parquet"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(docsPath)
    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s ($n)")
    }
    import graft.ext.{Dedup, TextStats}
    val spread = docs.repartition(cpus.toInt)
    timed("read+count")(docs.count())
    timed("repartition only")(spread.count())
    timed("tokens only")(spread.select(size(TextStats.tokens(col("text"))).as("n")).agg(sum("n")).count())
    timed("explode shingles")(spread.select(col("doc_id"), explode(Dedup.shingles(col("text"), 5)).as("s")).count())
    timed("explode + 1 md5")(spread.select(col("doc_id"), explode(Dedup.shingles(col("text"), 5)).as("s"))
      .select(md5(col("s"))).filter(col("md5(s)").isNotNull).count())
    timed("signature (groupBy 8 mins)")(
      Dedup.minhashSignature(docs, col("text"), col("doc_id"), 5, 8).count())
    timed("bands")(
      Dedup.lshBands(Dedup.minhashSignature(docs, col("text"), col("doc_id"), 5, 8), 4, 2).count())
    timed("candidates (full)")(
      Dedup.minhashCandidates(docs, col("text"), col("doc_id")).count())
    spark.stop()
  }
}
