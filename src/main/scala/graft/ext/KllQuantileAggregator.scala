package graft.ext

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** KLL/MRL-style mergeable quantile sketch buffer: a stack of compactor
  * buffers, level-h items carrying weight 2^h, plus per-level compaction
  * counters that drive the alternating keep-odd/keep-even offsets (so
  * compaction bias cancels deterministically instead of via RNG — the
  * sketch stays reproducible for a fixed reduction order). Total weight is
  * EXACTLY n: an odd buffer leaves its maximum behind at the same level, so
  * halving always promotes matched pairs. */
final case class KllSketch(levels: Seq[Seq[Double]], compactions: Seq[Long], n: Long)

/** Mergeable quantile sketch as a typed `Aggregator[Double, _, Seq[Double]]`
  * — the KLL/MRL (Karnin-Lang-Liberty / Manku-Rajagopalan-Lindsay) shape:
  * fixed-capacity-k compactors, compact = sort + promote every other
  * element one level up with doubled weight. `merge` is exact sketch
  * algebra (concatenate level-wise, re-compact), so map-side partials
  * combine and the shuffle carries O(k·log(n/k)) doubles per group instead
  * of the full column — the same mergeable-summaries contract as
  * [[HeavyHittersAggregator]].
  *
  * Rank-error guarantee: each compaction at level h perturbs any rank by at
  * most 2^h, and level h compacts at most n/(k·2^h) times, so the total
  * error is ≤ H·n/k over H ≈ log2(n/k) levels — with alternating offsets
  * the realized error is far smaller (asserted ≤ 2% in the spec, and the
  * `agg_quantile_sketch` query re-checks the bound inside the driver's
  * oracle gate on every run). `finish` returns the value at each requested
  * quantile of the weighted item multiset. */
final class KllQuantileAggregator(k: Int, probs: Seq[Double])
    extends Aggregator[Double, KllSketch, Seq[Double]] with Serializable {
  require(k >= 8, s"sketch capacity must be >= 8, got $k")
  require(probs.nonEmpty && probs.forall(p => p > 0 && p <= 1))

  override def zero: KllSketch = KllSketch(Seq(Vector.empty), Seq(0L), 0L)

  override def reduce(buf: KllSketch, x: Double): KllSketch =
    compactAll(KllSketch(
      buf.levels.updated(0, buf.levels.head :+ x), buf.compactions, buf.n + 1))

  override def merge(a: KllSketch, b: KllSketch): KllSketch = {
    val height = math.max(a.levels.size, b.levels.size)
    val levels = (0 until height).map { h =>
      a.levels.applyOrElse(h, (_: Int) => Seq.empty[Double]) ++
        b.levels.applyOrElse(h, (_: Int) => Seq.empty[Double])
    }
    val comps = (0 until height).map { h =>
      a.compactions.applyOrElse(h, (_: Int) => 0L) +
        b.compactions.applyOrElse(h, (_: Int) => 0L)
    }
    compactAll(KllSketch(levels, comps, a.n + b.n))
  }

  private def compactAll(s: KllSketch): KllSketch = {
    var levels = s.levels.map(_.toVector).toVector
    var comps = s.compactions.toVector
    var h = 0
    while (h < levels.size) {
      if (levels(h).size >= k) {
        val sorted = levels(h).sorted
        // odd buffer: park the max at this level so promoted items pair up
        // and Σ size·2^h stays exactly n
        val (pairs, leftover) =
          if (sorted.size % 2 == 0) (sorted, Vector.empty[Double])
          else (sorted.dropRight(1), Vector(sorted.last))
        val offset = (comps(h) % 2).toInt
        val promoted = pairs.indices.collect { case i if i % 2 == offset => pairs(i) }
        if (h + 1 >= levels.size) { levels = levels :+ Vector.empty; comps = comps :+ 0L }
        levels = levels.updated(h, leftover)
          .updated(h + 1, levels(h + 1) ++ promoted)
        comps = comps.updated(h, comps(h) + 1)
      }
      h += 1
    }
    KllSketch(levels, comps, s.n)
  }

  override def finish(buf: KllSketch): Seq[Double] = {
    val weighted = buf.levels.zipWithIndex
      .flatMap { case (l, h) => l.map(v => (v, 1L << h)) }
      .sortBy(_._1)
    if (weighted.isEmpty) return probs.map(_ => Double.NaN)
    val total = weighted.iterator.map(_._2).sum
    probs.map { p =>
      val target = math.max(1L, math.ceil(p * total).toLong)
      var cum = 0L
      var i = 0
      while (i < weighted.size - 1 && { cum += weighted(i)._2; cum < target }) i += 1
      weighted(i)._1
    }
  }

  override def bufferEncoder: Encoder[KllSketch] = ExpressionEncoder[KllSketch]()
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
}
