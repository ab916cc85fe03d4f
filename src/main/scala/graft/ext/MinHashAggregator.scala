package graft.ext

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** MinHash signature as a typed `Aggregator[IN, BUF, OUT]` (SURVEY.md §7.5 —
  * the sketch-aggregation form for `Dataset` pipelines and
  * `KeyValueGroupedDataset.agg`).
  *
  * Input: one 64-bit base hash per shingle (e.g. `xxhash64(shingle)`).
  * Each signature slot applies an independent avalanche mix (splitmix64 of
  * base ^ slot-seed) and keeps the minimum — equivalent to `numHashes`
  * independent permutations without rehashing the shingle text per slot.
  * The merge is element-wise min, so partial aggregation (map-side combine)
  * is exact — the property that makes sketch aggregation shuffle O(slots)
  * per group instead of O(shingles).
  */
final class MinHashAggregator(numHashes: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] with Serializable {
  require(numHashes > 0)

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], shingleHash: Long): Array[Long] = {
    var s = 0
    while (s < numHashes) {
      val h = MinHashAggregator.mix(shingleHash ^ (s * MinHashAggregator.SeedStep))
      if (h < buf(s)) buf(s) = h
      s += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var s = 0
    while (s < numHashes) { if (b(s) < a(s)) a(s) = b(s); s += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object MinHashAggregator {
  private val SeedStep: Long = 0x9E3779B97F4A7C15L // golden-ratio increment

  /** splitmix64 finalizer — full-avalanche 64-bit mix. */
  def mix(x0: Long): Long = {
    var x = x0 + SeedStep
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Estimated Jaccard similarity from two signatures: fraction of equal
    * slots. */
  def estimate(a: Array[Long], b: Array[Long]): Double = {
    require(a.length == b.length)
    a.indices.count(i => a(i) == b(i)).toDouble / a.length
  }
}
