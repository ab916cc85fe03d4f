package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan/runtime audit for a single SparkEntry query.
  *
  * Usage: PlanAudit <queryName> [sfDir]
  * Runs the query twice (cold, warm), prints wall-clock for each, then the
  * formatted physical plan — the loop used to check that filters are pushed,
  * joins broadcast where expected, and WholeStageCodegen spans are wide.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      // same extension surface as Bench/Verify, so the audited plan is the
      // plan the bench actually runs (round 16 — the injected optimizer
      // rules were previously absent here)
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val ms = m.executorRunTime
        if (ms > 200) println(
          f"[stage ${si.stageId}%3d] ${ms}%6d ms exec  ${si.numTasks}%3d tasks  " +
            f"in=${m.inputMetrics.recordsRead}%8d  shW=${m.shuffleWriteMetrics.recordsWritten}%8d  " +
            f"shR=${m.shuffleReadMetrics.recordsRead}%8d  ${si.name.takeWhile(_ != '(')}")
      }
    })
    val fn = graft.SparkEntry.queries(name)
    def timed(label: String): Unit = {
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[audit] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
    }
    timed("cold")
    timed("warm")
    fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
