package graft.ext

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters sketch as a typed `Aggregator[IN, BUF, OUT]`:
  * at most `k` (item, weight) counters; an incoming item either increments
  * its counter, claims a free slot, or decrements every counter (evicting
  * zeros). Mergeable: merged counters are summed, then reduced back to k
  * counters by subtracting the (k+1)-largest weight — the classic
  * Agarwal et al. mergeable-summaries construction, so map-side partials
  * are exact sketch algebra and the shuffle carries O(k) per group, not
  * O(distinct items).
  *
  * Guarantee (any processing order, any partitioning): every item with true
  * frequency > n/(k+1) of n total rows SURVIVES in the sketch, and each
  * surviving weight underestimates the true count by at most n/(k+1).
  * The sketch is therefore a candidate GENERATOR: follow with an exact
  * count of the ≤ k candidates (broadcast semi-join) for exact heavy
  * hitters in two linear passes — the same sketch-then-verify shape as
  * MinHash→Jaccard. That composition is `Dedup`-style scale-correct: the
  * full-table groupBy over every distinct token never happens.
  */
final class HeavyHittersAggregator(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] with Serializable {
  require(k > 0)

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], item: String): Map[String, Long] =
    buf.get(item) match {
      case Some(w) => buf.updated(item, w + 1L)
      case None if buf.size < k => buf.updated(item, 1L)
      case None =>
        buf.flatMap { case (i, w) => if (w > 1L) Some(i -> (w - 1L)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (acc, (i, w)) =>
      acc.updated(i, acc.getOrElse(i, 0L) + w)
    }
    if (summed.size <= k) summed
    else {
      // subtract the (k+1)-largest weight from everything; ≤ k survive
      val cut = summed.valuesIterator.toArray.sortBy(-_).apply(k)
      summed.flatMap { case (i, w) => if (w > cut) Some(i -> (w - cut)) else None }
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder[Map[String, Long]]()
}
