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

  test("buildLong sizes honestly past stat.bloomFilter's silent 2^26-bit " +
      "clamp (round-15: the 64x stanza caught a 41%-fpp sketch)") {
    // stat.bloomFilter routes through BloomFilterAggregate, whose bitmap is
    // clamped at spark.sql.optimizer.runtime.bloomFilter.maxNumBits
    // (67,108,864) no matter the requested capacity — right for runtime
    // join filters, silent poison for fpp-contract sketches
    val df = (0L until 2000L).toDF("v")
    val clamped = df.stat.bloomFilter("v", 10000000L, 1e-4)
    assert(clamped.bitSize() === 67108864L, "Spark clamp assumption changed")
    val honest = BloomColumns.buildLong(df, "v", 10000000L, 1e-4)
    assert(honest.bitSize() > 67108864L,
      s"buildLong must size for the requested capacity, got ${honest.bitSize()}")
    // probe compatibility: every inserted value answers true through the
    // SAME codegen predicate the stores use
    assert(df.filter(BloomColumns.mightContain(honest, col("v"))).count() === 2000L)
    // disjoint probes stay near the configured fpp
    val probes = (1L to 20000L).map(i => i * -7046029254386353131L + 13L)
      .filter(v => v < 0L || v >= 2000L)
    val fp = probes.toDF("v")
      .filter(BloomColumns.mightContain(honest, col("v"))).count()
    assert(fp <= (probes.size * 0.01).toLong, s"false positives $fp of ${probes.size}")
    // empty input builds a valid empty sketch
    val empty = BloomColumns.buildLong(df.filter(col("v") < 0L), "v", 100L, 1e-4)
    assert(!empty.mightContainLong(42L))
  }

  test("BloomBroadcastMightContain refuses a non-long child at ANALYSIS " +
      "time with a readable message (round-15 ADVICE — not a janino " +
      "compile error or a runtime ClassCastException)") {
    val bf = BloomColumns.buildLong((0L until 10L).toDF("v"), "v", 100L, 0.01)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val bcast = spark.sparkContext.broadcast(bos.toByteArray)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq("not-a-long").toDF("s")
        .filter(BloomColumns.mightContainBroadcast(bcast, col("s"))).collect()
    }
    assert(e.getMessage.contains("BIGINT"), e.getMessage)
    // the long path still analyzes and answers
    assert((0L until 10L).toDF("v")
      .filter(BloomColumns.mightContainBroadcast(bcast, col("v")))
      .count() === 10L)
  }

  test("mightContainAuto routes big sketches through a broadcast handle " +
      "with identical answers to the literal path") {
    // ~23 MB sketch — over the 8 MB literal cap, so Auto must pick the
    // broadcast expression; answers must be bit-identical to the literal
    val bf = BloomColumns.buildLong(
      (0L until 5000L).toDF("v"), "v", 10000000L, 1e-4)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    assert(bos.size() > BloomColumns.LiteralSketchMaxBytes)
    val probes = ((0L until 1000L) ++ (100000L until 101000L)).toDF("v")
    val viaAuto = probes
      .filter(BloomColumns.mightContainAuto(spark, bf, col("v")))
      .as[Long].collect().sorted
    val viaLiteral = probes
      .filter(BloomColumns.mightContain(bf, col("v")))
      .as[Long].collect().sorted
    assert(viaAuto === viaLiteral)
    assert((0L until 1000L).forall(viaAuto.contains), "no false negatives")
    // a small sketch stays on the literal path (plan-transparent for the
    // audit greps) — mightContainAuto must not change its answers either
    val small = BloomColumns.buildLong((0L until 100L).toDF("v"), "v", 1000L, 1e-4)
    val a2 = probes.filter(BloomColumns.mightContainAuto(spark, small, col("v")))
      .as[Long].collect().sorted
    val l2 = probes.filter(BloomColumns.mightContain(small, col("v")))
      .as[Long].collect().sorted
    assert(a2 === l2)
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
