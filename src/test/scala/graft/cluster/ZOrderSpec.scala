package graft.cluster

import graft.SparkSpec
import graft.functions.ZOrderExpression
import org.apache.spark.sql.functions._

/** Z-order clustering: Morton interleave correctness, dominance
  * monotonicity, and the payoff — z-clustered files have tighter per-file
  * bounding boxes than 1-D sorting on both dimensions. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("morton value interleaves bits (known patterns)") {
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 0L), (2L, 3L))
      .toDF("x", "y")
      .select(ZOrderExpression.zorderValue(4, col("x"), col("y")).as("z"))
      .as[Long].collect().toSeq
    // bit b of x lands at 2b, bit b of y at 2b+1
    assert(rows === Seq(0L, 1L, 2L, 3L, 0x5L, 0xEL))
  }

  test("dominance monotonicity: a ≤ b component-wise ⇒ z(a) ≤ z(b)") {
    val pts = for (x <- 0 to 15; y <- 0 to 15) yield (x.toLong, y.toLong)
    val zs = pts.toDF("x", "y")
      .select(col("x"), col("y"), ZOrderExpression.zorderValue(4, col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect().map { case (x, y, z) => (x, y) -> z }.toMap
    for ((ax, ay) <- pts; (bx, by) <- Seq((ax + 1, ay), (ax, ay + 1), (ax + 1, ay + 1))
         if bx <= 15 && by <= 15) {
      assert(zs((ax, ay)) <= zs((bx, by)))
    }
  }

  test("max-value rows bucket to the TOP bucket, not bucket 0 (ADVICE r1: width_bucket overflow)") {
    // A 0/1 flag dimension (the tsunami-flag shape the reference clusters
    // on): width_bucket(1.0, 0, 1, 256) = 257, so without the clamp every
    // flag=1 row masked to bucket 0 — the same clustering value as the
    // flag=0 class. Single dimension ⇒ z IS the bucket: flag=0 → 0,
    // flag=1 → 255. (Asserted on the z value itself, not on range-partition
    // placement — partitioner boundary sampling isn't deterministic across
    // a shared SparkContext.)
    val df = spark.range(1024).select((col("id") % 2).as("flag"))
    val zByFlag = df
      .select(col("flag"), ClusterWrite.zorderColumn(df, Seq(col("flag")), bits = 8).as("z"))
      .distinct().as[(Long, Long)].collect().toMap
    assert(zByFlag === Map(0L -> 0L, 1L -> 255L))
  }

  test("sizedWrite splits output into ~target-sized files") {
    val dir = tmpDir("sized_write")
    // ~100 bytes/row serialized; target 64 KB compressed ⇒ with the 4x
    // ratio assumption ≈ 2600 rows/file ⇒ 20k rows in 1 partition → ~8 files
    val df = spark.range(20000).select(col("id"),
      concat_ws("-", lit("x" * 80), col("id")).as("pad")).coalesce(1)
    ClusterWrite.sizedWrite(df, targetBytesPerFile = 64 * 1024)
      .mode("overwrite").parquet(dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length >= 4 && files.length <= 20, s"got ${files.length} files")
    assert(spark.read.parquet(dir).count() === 20000)
  }

  test("sizedWrite sampleFrom estimates from the pre-shuffle input (ADVICE r3)") {
    // Row width is order/partitioning-independent, so the pre-shuffle frame
    // must yield the same bytes/row decision as the clustered output — and
    // estimating from it never executes the clustering exchange's map stage.
    val df = spark.range(20000).select(col("id"),
      concat_ws("-", lit("x" * 80), col("id")).as("pad"))
    val clustered = ClusterWrite.cluster(df, Seq(col("id")), Some(4))
    val est = ClusterWrite.estimateBytesPerRow(df)
    val estClustered = ClusterWrite.estimateBytesPerRow(clustered)
    assert(math.abs(est - estClustered) / estClustered < 0.05,
      s"pre=$est post=$estClustered")
    val dir = tmpDir("sized_write_samplefrom")
    ClusterWrite.sizedWrite(clustered, targetBytesPerFile = 64 * 1024,
        sampleFrom = Some(df))
      .mode("overwrite").parquet(dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    // 4 range partitions × ~2 size splits each
    assert(files.length >= 4 && files.length <= 24, s"got ${files.length} files")
    assert(spark.read.parquet(dir).count() === 20000)
  }

  test("z-order clustering skips on the SECOND dimension too (1-D sort can't)") {
    val n = 4096
    val df = spark.range(n).select(
      (col("id") * 2654435761L % 1024).as("a"),
      (col("id") * 40503L % 1024).as("b")).cache()
    // average per-partition span of dimension `b` — a proxy for how much a
    // predicate on `b` alone can prune file-level min/max stats.
    def avgBSpan(clustered: org.apache.spark.sql.DataFrame): Double = {
      val parts = clustered.select("a", "b").as[(Long, Long)]
        .mapPartitions { it =>
          val v = it.toVector
          if (v.isEmpty) Iterator.empty
          else Iterator.single((v.map(_._2).max - v.map(_._2).min).toDouble)
        }.collect()
      parts.sum / parts.length
    }
    val zSpan = avgBSpan(ClusterWrite.zorder(df, Seq(col("a"), col("b")), bits = 8, Some(16)))
    val linSpan = avgBSpan(ClusterWrite.cluster(df, Seq(col("a"), col("b")), Some(16)))
    // 1-D range sort on (a, b): every partition spans ~the full `b` domain.
    // The space-filling curve keeps both dimensions bounded per partition.
    assert(zSpan < linSpan * 0.6, s"z b-span=$zSpan lin b-span=$linSpan")
  }
}
