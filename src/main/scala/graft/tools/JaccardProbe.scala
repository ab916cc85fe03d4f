package graft.tools

import org.apache.spark.sql.SparkSession

/** Cold/warm timings for the candidate-gated Jaccard query (bench's heaviest).
  * Usage: scripts/run_class.sh graft.tools.JaccardProbe <sfDir> */
object JaccardProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s ($n)")
    }
    timed("minhash_lsh run1")(graft.SparkEntry.queries("dedup_minhash_lsh")(spark, sfDir).count())
    timed("minhash_lsh run2")(graft.SparkEntry.queries("dedup_minhash_lsh")(spark, sfDir).count())
    timed("jaccard run1")(graft.SparkEntry.queries("dedup_ngram_jaccard")(spark, sfDir).count())
    timed("jaccard run2")(graft.SparkEntry.queries("dedup_ngram_jaccard")(spark, sfDir).count())
    timed("jaccard run3")(graft.SparkEntry.queries("dedup_ngram_jaccard")(spark, sfDir).count())
    spark.stop()
  }
}
