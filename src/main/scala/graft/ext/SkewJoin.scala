package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * When one join key dominates (hot key), the plain shuffle hash/sort-merge
  * join puts the whole hot partition on one task. Salting splits each key
  * into `buckets` sub-keys: the big side gets a deterministic per-row salt,
  * the small side is replicated once per salt value, and the join runs on
  * (key, salt) — spreading the hot key over `buckets` tasks at the cost of
  * replicating the small side. Results are identical to the unsalted join
  * (the oracle for the demo query is the plain join). AQE's skew-join
  * handles sort-merge cases adaptively; explicit salting still matters for
  * aggregate-after-join pipelines and for engines/plans AQE can't split.
  */
object SkewJoin {

  /** @param saltFrom big-side columns whose hash spreads rows across salts
    *                 (must be deterministic — any stable row attributes). */
  def saltedEquiJoin(big: DataFrame, small: DataFrame,
      bigKey: Column, smallKey: Column,
      saltFrom: Seq[Column], buckets: Int): DataFrame = {
    require(buckets > 0)
    val salted = big.withColumn("__salt", pmod(xxhash64(saltFrom: _*), lit(buckets)))
    val replicated = small.withColumn("__salt",
      explode(transform(sequence(lit(0), lit(buckets - 1)), i => i.cast("long"))))
    salted.join(replicated,
        bigKey === smallKey && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
