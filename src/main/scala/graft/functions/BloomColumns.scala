package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership as a Catalyst predicate — the engine primitive
  * behind Spark's own runtime row-group filtering (`InjectRuntimeFilter`'s
  * `BloomFilterMightContain`), exposed for query-level use.
  *
  * The intended shape at 100 TB: aggregate a bounded sketch of the SMALL
  * side's keys (`Dataset.stat.bloomFilter` — a distributed treeAggregate
  * whose driver result is the KB-MB bitmap, never the key set), then probe
  * it MAP-SIDE on the large side. Rows that fail the probe never reach a
  * shuffle; only the candidate sliver pays the exact semi-join that removes
  * the false positives. No false negatives by construction. */
object BloomColumns {

  /** `value MIGHT be in bf` as a codegen'd Column predicate. `value` must be
    * a LONG column holding exactly what was inserted into the sketch (e.g.
    * the fused 64-bit shingle hashes). */
  def mightContain(bf: BloomFilter, value: Column): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bos.toByteArray, BinaryType), ColumnBridge.expression(value)))
  }
}
