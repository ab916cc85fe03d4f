package graft.ext

import graft.{Fixtures, SparkSpec}
import org.apache.spark.sql.functions._

/** Typed MinHash sketch aggregator: signature properties and Jaccard
  * estimation quality on planted near-duplicates. */
class MinHashAggregatorSpec extends SparkSpec {
  import spark.implicits._

  val agg = new MinHashAggregator(64)

  def signatures: Map[Long, Array[Long]] = {
    val docs = Fixtures.nearDupDocs.toDF("doc_id", "text")
    docs.select(col("doc_id"),
        explode(Dedup.shingles(col("text"), 3)).as("sh"))
      .withColumn("h", xxhash64(col("sh")))
      .as[(Long, String, Long)]
      .map { case (id, _, h) => (id, h) }
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.toColumn)
      .collect().toMap
  }

  test("signature: deterministic, slot count, merge == reduce order-free") {
    val a = signatures
    val b = signatures
    assert(a.keySet === b.keySet)
    a.foreach { case (k, sig) =>
      assert(sig.length === 64)
      assert(sig.toSeq === b(k).toSeq)
    }
    // merge semantics: element-wise min, commutative
    val x = agg.reduce(agg.zero, 42L)
    val y = agg.reduce(agg.zero, 7L)
    assert(agg.merge(x.clone(), y).toSeq === agg.merge(y.clone(), x).toSeq)
  }

  test("estimated Jaccard separates near-dups from unrelated docs") {
    val sig = signatures
    val nearDup = MinHashAggregator.estimate(sig(1L), sig(2L))   // 1-token edit
    val unrelated = MinHashAggregator.estimate(sig(1L), sig(5L)) // different text
    assert(nearDup > 0.5, s"near-dup estimate $nearDup")
    assert(unrelated < 0.2, s"unrelated estimate $unrelated")
    assert(MinHashAggregator.estimate(sig(3L), sig(3L)) === 1.0)
  }
}
