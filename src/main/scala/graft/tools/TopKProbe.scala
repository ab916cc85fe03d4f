package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Window-vs-TopKPerKey timing on a scaled orders table, two rounds each
  * (cold + warm). Usage: scripts/run_class.sh graft.tools.TopKProbe [path] */
object TopKProbe {
  def main(args: Array[String]): Unit = {
    val path = if (args.nonEmpty) args(0) else "/tmp/graft_scale/orders_x32"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val orders = spark.read.parquet(path)
    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $label%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s ($n)")
    }
    def window(): Long = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      orders.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3).count()
    }
    def topk(): Long =
      graft.plans.TopK.perKey(orders, Seq("o_custkey"),
        Seq(graft.plans.TopK.Sort("o_totalprice", desc = true),
          graft.plans.TopK.Sort("o_orderkey")), 3).count()
    timed("warmup scan")(orders.count())
    timed("topk run1")(topk())
    timed("topk run2")(topk())
    timed("window run1")(window())
    timed("window run2")(window())
    timed("topk run3")(topk())
    spark.stop()
  }
}
