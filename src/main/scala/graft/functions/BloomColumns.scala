package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType}
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

  /** [[mightContain]] that routes LARGE sketches through a TorrentBroadcast
    * instead of a plan literal. A 100+ MB literal is plan poison — every
    * optimizer pass that hashes or copies the expression tree drags the
    * whole bitmap with it, and every task ships it in the task binary (the
    * round-15 64x stanza measured a 420 s map-side probe whose work was
    * seconds); Spark's own runtime join filters cap their literal at 8 MB
    * for exactly this reason. Above [[LiteralSketchMaxBytes]] the bytes
    * broadcast once per executor and the probe expression carries only the
    * handle, deserializing through a per-JVM cache. */
  def mightContainAuto(spark: org.apache.spark.sql.SparkSession,
      bf: BloomFilter, value: Column): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val bytes = bos.toByteArray
    if (bytes.length <= LiteralSketchMaxBytes)
      ColumnBridge.column(BloomFilterMightContain(
        Literal(bytes, BinaryType), ColumnBridge.expression(value)))
    else
      ColumnBridge.column(BloomBroadcastMightContain(
        ColumnBridge.expression(value), spark.sparkContext.broadcast(bytes)))
  }

  /** Largest serialized sketch embedded as a plan literal (Spark's own
    * runtime-filter literal cap — 8 MB). */
  val LiteralSketchMaxBytes: Int = 8 * 1024 * 1024

  /** Probe against an ALREADY-broadcast sketch — for callers that memoize
    * the broadcast across probes (e.g. a serving path probing the same
    * stored sketch repeatedly; re-broadcasting per call would leak a
    * bitmap-sized broadcast each time). */
  def mightContainBroadcast(bcast: Broadcast[Array[Byte]],
      value: Column): Column =
    ColumnBridge.column(BloomBroadcastMightContain(
      ColumnBridge.expression(value), bcast))

  /** Per-JVM deserialization cache for broadcast sketches: one
    * `BloomFilter.readFrom` per executor per broadcast, not per task —
    * at 130 MB the parse is the probe's whole cost otherwise. Small LRU
    * of SOFT references: an executor touches few distinct sketches per
    * job, but 8 strong 230 MB bitmaps would pin ~1.8 GB of heap for the
    * JVM's lifetime even after their broadcasts are destroyed (round-15
    * ADVICE) — soft refs let the GC reclaim an idle sketch under memory
    * pressure, and a reclaimed entry just re-parses on next probe. */
  private val filterCache =
    new java.util.LinkedHashMap[(String, Long), java.lang.ref.SoftReference[BloomFilter]](
        8, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Long),
            java.lang.ref.SoftReference[BloomFilter]]): Boolean = size() > 8
    }

  /** Cache key scoped by APPLICATION id, not just broadcast id: broadcast
    * ids are a per-SparkContext counter, so after a context restart in the
    * same JVM a fresh broadcast could collide with a stale entry and
    * silently answer membership from the WRONG sketch (false negatives
    * included). SparkEnv is present on driver and executors alike. */
  private[functions] def cachedFilter(bcast: Broadcast[Array[Byte]]): BloomFilter = {
    val key = (org.apache.spark.SparkEnv.get.conf.getAppId, bcast.id)
    filterCache.synchronized {
      val got = filterCache.get(key)
      if (got != null) {
        val f = got.get()
        if (f != null) return f
        filterCache.remove(key): Unit // GC-cleared: fall through and re-parse
      }
    }
    // deserialize OUTSIDE the lock (a 130 MB parse must not serialize
    // every task's first probe behind one thread)
    val f = BloomFilter.readFrom(new java.io.ByteArrayInputStream(bcast.value))
    filterCache.synchronized {
      val raced = Option(filterCache.get(key)).flatMap(r => Option(r.get()))
      raced match {
        case Some(r) => r
        case None =>
          filterCache.put(key, new java.lang.ref.SoftReference(f)): Unit
          f
      }
    }
  }
  /** Distributed Bloom build over a LONG column, sized HONESTLY for
    * `expectedItems` at `fpp` — the round-15 replacement for
    * `df.stat.bloomFilter`, which (Spark 4 routes it through
    * `BloomFilterAggregate`) silently CLAMPS the bitmap at
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumBits` (2^26 bits ≈
    * 8 MB ≈ 3.5M items at 1e-4). Past that the returned filter's real
    * false-positive rate explodes with no error — the 64x
    * decontamination-store stanza measured 41% on a filter whose gauge
    * claimed 0.25 fill. A clamp is the right default for Spark's own
    * runtime JOIN filters (an over-permissive filter only loses pruning)
    * but silent poison for sketches whose fpp is a CONTRACT.
    *
    * One filter per non-empty partition, then a merge reduce — the same
    * shape as Spark's partial aggregation, with `putLong` exactly matching
    * [[mightContain]]'s `mightContainLong` probe. Each live partition
    * allocates the FULL bitmap (~19.2 bits/item at 1e-4), so the partial
    * count is bounded: by `itemsHint` (≥ ~1M inserts per partial —
    * inserting is cheap, merging 100+ MB bitmaps is not: an incremental
    * store's SMALL delta must not pay scan-width × bitmap in allocation
    * and bit-or), and by a ~1 GiB transient budget. The bound repartitions
    * the hash longs (a shuffle of 8 bytes/item — noise next to the merge
    * it avoids). Callers past ~10^8 items should shard the sketch instead
    * (the stores' class docs say where). */
  def buildLong(df: org.apache.spark.sql.DataFrame, column: String,
      expectedItems: Long, fpp: Double, itemsHint: Long = -1L): BloomFilter = {
    // nulls never enter a sketch — parity with stat.bloomFilter's
    // skip-nulls behavior (a bare getLong would NPE the build instead)
    val c = org.apache.spark.sql.functions.col(column)
    val base = df.filter(c.isNotNull).select(c.cast("long"))
      .rdd.map(_.getLong(0))
    // bits = -n ln p / (ln 2)^2 (the standard optimal sizing — what
    // BloomFilter.create allocates), without allocating one to ask
    val bitmapBytes = math.max(8L,
      (-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong / 8L)
    val byBudget = math.max(1L, (1L << 30) / bitmapBytes)
    val byItems =
      if (itemsHint > 0) math.max(1L, itemsHint / 1000000L) else Long.MaxValue
    val k = math.min(base.getNumPartitions.toLong,
      math.min(byBudget, byItems)).toInt
    val rdd =
      if (k > 0 && k < base.getNumPartitions) base.repartition(k) else base
    val partials = rdd.mapPartitions { it =>
      if (it.isEmpty) Iterator.empty
      else {
        val f = BloomFilter.create(expectedItems, fpp)
        it.foreach(f.putLong(_))
        Iterator.single(f)
      }
    }
    // treeReduce throws on an all-empty RDD — an empty input is a valid
    // (empty) sketch
    try partials.treeReduce((a, b) => { a.mergeInPlace(b); a })
    catch {
      case e: UnsupportedOperationException
          if e.getMessage != null && e.getMessage.contains("empty") =>
        BloomFilter.create(expectedItems, fpp)
    }
  }
}

/** Bloom membership over a TorrentBroadcast sketch — the plan carries the
  * broadcast HANDLE (bytes ride Spark's broadcast machinery once per
  * executor), never the bitmap. Generated code calls back into the
  * expression object (plan-literal reference, the [[BpeEncode]] pattern),
  * so the probe stays inside whole-stage codegen. `child` must be the LONG
  * column whose values were `putLong`-inserted. */
case class BloomBroadcastMightContain(child: Expression,
    bcast: Broadcast[Array[Byte]]) extends UnaryExpression with Serializable {

  override def dataType: DataType = BooleanType
  // analysis-time type contract (round-15 ADVICE): a mistyped child fails
  // with a readable AnalysisException instead of a janino compile error
  // (codegen) or a ClassCastException (interpreted) at execution time —
  // parity with the literal path, where Spark's BloomFilterMightContain
  // checks its input types
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BIGINT child holding the putLong-inserted " +
          s"hash; got ${child.dataType.catalogString}")
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_broadcast_might_contain"

  def test(v: Long): Boolean =
    BloomColumns.cachedFilter(bcast).mightContainLong(v)

  override def nullSafeEval(input: Any): Any =
    test(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("bloomBcast", this,
        classOf[BloomBroadcastMightContain].getName)
      s"${ev.value} = $ref.test($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
