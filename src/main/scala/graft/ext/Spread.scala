package graft.ext

import org.apache.spark.sql.{Column, DataFrame}

/** Scale-adaptive input spreading (optimization round 16, guide §2.4
  * "remove shuffles outright").
  *
  * Several linear operators (brute-force scoring, signature passes, codec
  * batches) used an unconditional `repartition(defaultParallelism)` so that
  * a SINGLE-FILE local corpus — which plans as one scan partition — does
  * not serialize the whole pass onto one core. That fix is right for the
  * small-input case but wrong at scale: a 100 TB corpus already arrives in
  * tens of thousands of scan partitions, and the unconditional repartition
  * becomes a full shuffle of the heaviest columns (vectors, payloads, raw
  * text) for nothing.
  *
  * [[toCores]] keeps the spread ONLY when it is needed: the input's own
  * planned partition count is compared to the session's parallelism once,
  * driver-side (no job — `toRdd` plans the scan without executing it), and
  * the repartition is inserted only when the scan is narrower. Local
  * single-file benches keep their exact previous plan; wide inputs skip
  * the exchange entirely.
  */
object Spread {

  /** Planned partition count of the frame's pre-AQE physical plan —
    * driver-side planning only, no job. */
  private def plannedPartitions(df: DataFrame): Int =
    df.queryExecution.toRdd.getNumPartitions

  /** `df.repartition(defaultParallelism)` when the input plans narrower
    * than the session's cores; `df` unchanged otherwise. */
  def toCores(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (plannedPartitions(df) >= p) df else df.repartition(p)
  }

  /** Keyed variant (`repartition(n, key)`) for callers that spread by a
    * column; same gate. */
  def toCoresBy(df: DataFrame, key: Column): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (plannedPartitions(df) >= p) df else df.repartition(p, key)
  }
}
