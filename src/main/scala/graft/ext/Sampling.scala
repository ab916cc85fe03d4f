package graft.ext

import scala.reflect.ClassTag

import org.apache.spark.rdd.RDD

/** Shared bounded-sample primitive for driver-side quantizer fits
  * ([[IvfIndex.build]], [[PqIndex.fit]]). */
object Sampling {

  /** Seeded per-partition reservoir (Algorithm R) over at most `maxParts`
    * pruned partitions — uniform over each chosen partition whatever the
    * row order. Heads would NOT do: ClusterWrite/zorder layouts make
    * neighboring rows locally correlated, so a partition head is one
    * tight cluster of the space and a quantizer fit on it collapses.
    * Partition pruning keeps the sample pass from scanning the full
    * corpus: at 100 TB only ≤ `maxParts` input splits are read. The
    * collected result is bounded by construction (≈ `target` rows), so
    * driver-side materialization is safe. Fully deterministic: seeded
    * partition choice, seeded per-partition reservoirs. */
  def prunedReservoir[T: ClassTag](rdd: RDD[T], target: Int,
      maxParts: Int = 16, seed: Long = 42L): Array[T] = {
    val np = math.max(rdd.getNumPartitions, 1)
    val chosen = new scala.util.Random(seed).shuffle((0 until np).toList)
      .take(math.min(np, maxParts)).toSet
    val perPart = math.max(1, math.ceil(target.toDouble / chosen.size).toInt)
    org.apache.spark.rdd.PartitionPruningRDD.create(rdd, chosen.contains)
      .mapPartitionsWithIndex { (pi, it) =>
        val rnd = new scala.util.Random(seed ^ (pi.toLong * 0x9e3779b9L))
        val res = new Array[T](perPart)
        var n = 0L
        it.foreach { r =>
          if (n < perPart) res(n.toInt) = r
          else {
            val j = (rnd.nextDouble() * (n + 1)).toLong
            if (j < perPart) res(j.toInt) = r
          }
          n += 1
        }
        res.iterator.take(math.min(n, perPart.toLong).toInt)
      }.collect()
  }
}
