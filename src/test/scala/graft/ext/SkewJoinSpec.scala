package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Salted join: identical results to the plain join, hot key spread across
  * salt buckets. */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join result equals the plain join on skewed data") {
    // hot key: 90% of the big side hits key 7
    val big = spark.range(2000).select(
      when(col("id") % 10 =!= 0, 7L).otherwise(col("id") % 5).as("k"),
      col("id").as("payload"))
    val small = Seq((0L, "a"), (1L, "b"), (4L, "c"), (7L, "hot")).toDF("sk", "v")
    val plain = big.join(small, col("k") === col("sk"))
      .groupBy("v").agg(count(lit(1)).as("n"), sum(col("payload")).as("s"))
      .as[(String, Long, Long)].collect().toSet
    val salted = SkewJoin.saltedEquiJoin(big, small, col("k"), col("sk"),
        saltFrom = Seq(col("payload")), buckets = 8)
      .groupBy("v").agg(count(lit(1)).as("n"), sum(col("payload")).as("s"))
      .as[(String, Long, Long)].collect().toSet
    assert(salted === plain)
  }

  test("salt actually spreads the hot key across buckets") {
    val big = spark.range(1000).select(lit(7L).as("k"), col("id").as("payload"))
    val salts = big.select(pmod(xxhash64(col("payload")), lit(8)).as("salt"))
      .distinct().as[Long].collect().toSet
    assert(salts.size >= 6, s"expected most of 8 salt buckets used, got $salts")
  }
}
