package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bloom membership probe: the no-false-negative invariant (what the
  * decontaminate_bloom gate pins) and a bounded false-positive rate on a
  * disjoint probe set. */
class BloomColumnsSpec extends SparkSpec {
  import spark.implicits._

  test("mightContain: zero false negatives; fpp bounded on a disjoint set") {
    val members = (0L until 10000L).map(i => i * 2654435761L)
    val bf = members.toDF("v").stat.bloomFilter("v", 10000L, 0.01)
    // every inserted key probes true — serialization or hash drift between
    // build (util.sketch putLong) and probe (BloomFilterMightContain's
    // mightContainLong) would crater this
    val hits = members.toDF("v")
      .filter(BloomColumns.mightContain(bf, col("v"))).count()
    assert(hits === members.size.toLong)
    // a disjoint probe set false-positives near the configured fpp
    val memberSet = members.toSet
    val probes = (1L to 20000L).map(i => i * -7046029254386353131L + 13L)
      .filterNot(memberSet)
    val fp = probes.toDF("v")
      .filter(BloomColumns.mightContain(bf, col("v"))).count()
    assert(fp <= (probes.size * 0.05).toLong, s"false positives $fp of ${probes.size}")
  }

  test("bloom gate composes with an exact semi-join: same rows, fewer candidates") {
    val big = (0L until 5000L).toDF("k")
    val small = Seq(10L, 500L, 999L, 4321L).toDF("k")
    val bf = small.stat.bloomFilter("k", 100L, 0.001)
    val gated = big.filter(BloomColumns.mightContain(bf, col("k")))
      .join(small, Seq("k"), "left_semi")
      .as[Long].collect().sorted
    val exact = big.join(small, Seq("k"), "left_semi").as[Long].collect().sorted
    assert(gated === exact) // the gate never changes the answer
  }
}
