package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.tx.CommitLog

/** Bloom sketch of the TRAIN corpus's shingle hashes PERSISTED as a
  * commit-log table and maintained from the train table's change feed —
  * incremental test-set decontamination (round-13 VERDICT item 5). The
  * batch `decontaminate_bloom` query rebuilds the sketch from the whole
  * train corpus on EVERY run; at 100 TB the build is the cost, and it is
  * almost always spent re-sketching unchanged data. Here the sketch
  * lives on storage:
  *
  * {{{
  *   <root>/sketch   one row: (w INT, capacity LONG, fpp DOUBLE,
  *                             n_inserted LONG, n_deleted LONG,
  *                             sketch BINARY)
  * }}}
  *
  * and [[refresh]] folds newly arrived train docs by UNIONING a
  * delta-only sketch into the stored one — Bloom filters of equal
  * (capacity, fpp) are mergeable bit-or's, so the steady-state cost of
  * "did today's eval batch leak into train" is O(new train docs), never
  * O(train corpus). Any process probes from storage map-side
  * ([[flaggedDocs]] — the codegen'd BloomFilterMightContain over the
  * batch's shingles) without touching the train table at all.
  *
  * DIRECTION OF ERROR (what makes a Bloom the right store here): the
  * sketch can only OVER-flag. No false negatives by construction — a doc
  * sharing a shingle with train always flags; build→refresh union
  * preserves that (`dedup_incremental`-style oracle pins it). Deletes
  * and rewrites in the feed are deliberately folded ADD-ONLY: a Bloom
  * cannot retract bits, so a retired train doc's shingles keep flagging
  * — a conservative stale-positive, never a leak. Reclaim precision with
  * a periodic re-[[build]]: [[saturation]] says when the fpp contract
  * needs a bigger filter, and [[deleteDebt]] (retired shingle instances
  * over inserted — round-14 VERDICT item 7) says when a churning train
  * corpus (GDPR deletes, re-crawls) has accumulated enough stale
  * positives that precision is due a reclaim;
  * [[graft.tools.Maintenance]] auto-runs [[rebuild]] past its
  * `deconRebuildDebtThreshold` because a decon re-build is deterministic
  * data-derived state (unlike an IVF re-fit, it needs no operator
  * judgment).
  *
  * LOST-UPDATE guard (round-14 ADVICE): [[refresh]] is a
  * read-modify-write of the single sketch row, and two interleaved
  * refreshers would each union only their own delta — the later
  * overwrite silently dropping the other's bits, producing FALSE
  * NEGATIVES, the one direction this store promises never to err in.
  * The overwrite therefore publishes compare-and-set (expected sketch
  * version = the one the fold read); the losing refresher fails loudly
  * with ConcurrentModificationException instead of un-flagging leaked
  * docs. Re-run it: the re-read folds on top of the winner.
  *
  * Sizing honesty: `capacity` is frozen at build (merge compatibility
  * requires identical bit geometry), so build sizes it with headroom
  * (4× the measured distinct-shingle count by default) and [[refresh]]
  * tracks `n_inserted`; [[saturation]] > 1 means the fpp contract is no
  * longer honest and a re-build with a larger capacity is due — the same
  * threshold-alarm semantics as [[IvfStore.staleFraction]]. The sketch
  * ships to probes as a plan literal when small and a TorrentBroadcast
  * handle when production-size (round 15 — a 130 MB literal cost 420 s
  * in plan-side hashing/shipping), so capacity is bounded by executor
  * memory rather than plan size (~10⁸ items ≈ 230 MB at 1e-4); beyond
  * that, shard the store by shingle-hash prefix.
  *
  * Concurrency contract mirrors [[DedupStore]] where it applies, and is
  * SIMPLER: one table, one overwrite per refresh, watermark appId
  * [[AppId]] — a replayed or superseded-slice refresh is skipped whole
  * by the txn fast path (no delete/merge split to fence). Like the other
  * stores, live INTERLEAVED refreshers still want the single serialized
  * maintainer ([[graft.tools.Maintenance]]). */
object DecontaminationStore {

  /** Writer id for the version watermark on `sketch`. */
  val AppId = "graft-decon"

  /** Delete-debt estimate for a CDC delete row with a NULL pre-image text
    * when the slice offers no measured shingles-per-doc basis at all:
    * deliberately high (a typical document has hundreds of shingles), so
    * an estimate-heavy feed errs toward an EARLIER precision-reclaiming
    * rebuild, never a deferred one. */
  val NullTextShingleEstimate = 256L

  private def sketchTable(root: String) = s"$root/sketch"

  /** Sketch the FULL train snapshot and publish; returns the covered
    * train-table version. `expectedItems <= 0` sizes capacity as
    * 4 × the measured distinct shingle count (growth headroom for
    * refreshes), floored at 1000 so tiny corpora never allocate a
    * degenerate filter. */
  def build(spark: SparkSession, trainTable: String, indexRoot: String,
      w: Int = 8, expectedItems: Long = -1L, fpp: Double = 1e-4,
      textCol: String = "text"): Long = {
    val baseVersion = CommitLog.latestVersion(trainTable).getOrElse(
      throw new IllegalArgumentException(s"$trainTable has no committed versions"))
    // build/rebuild is compare-and-set like refresh: a rebuild racing a
    // concurrent refresh would otherwise overwrite the refresh's fold
    // while the txn watermark (which survives overwrites) still claims
    // the folded slice is covered — the slice would never re-fold, a
    // PERMANENT false negative. Pin the sketch version before the corpus
    // scan; the loser re-reads and re-runs.
    val sketchBase =
      CommitLog.latestVersion(sketchTable(indexRoot)).getOrElse(0L)
    val corpus = CommitLog.readAt(spark, trainTable, baseVersion)
    val sh = shingleFrame(corpus, w, textCol)
    val capacity =
      if (expectedItems > 0) expectedItems
      else math.max(1000L, 4L * sh.select("__sh").distinct().count())
    val (bf, n) = sketchOf(sh, capacity, fpp)
    val txn =
      if (coveredVersion(indexRoot).exists(_ >= baseVersion)) None
      else Some((AppId, baseVersion))
    commitSketch(spark, indexRoot, w, capacity, fpp, n, 0L, bf, txn,
      expectPrior = Some(sketchBase))
    baseVersion
  }

  /** Re-[[build]] reusing the stored sketch's (w, fpp) — what
    * [[graft.tools.Maintenance]] runs when [[deleteDebt]] or
    * [[saturation]] crosses its threshold: capacity re-sizes to the
    * CURRENT corpus (reclaiming both headroom debt and delete debt) and
    * the delete counter resets. */
  def rebuild(spark: SparkSession, trainTable: String, indexRoot: String,
      textCol: String = "text"): Long = {
    val row = CommitLog.read(spark, sketchTable(indexRoot))
      .select("w", "fpp").head()
    build(spark, trainTable, indexRoot, w = row.getInt(0),
      fpp = row.getDouble(1), textCol = textCol)
  }

  /** Train-table version the sketch currently covers (the txn watermark). */
  def coveredVersion(indexRoot: String): Option[Long] =
    CommitLog.txnVersion(sketchTable(indexRoot), AppId)

  /** The store's data table, for maintenance registration. */
  def artifactTable(indexRoot: String): String = sketchTable(indexRoot)

  /** Fill gauge: inserted shingle instances over frozen capacity. The
    * count is of INSERTIONS (delta slices are distinct-per-slice, not
    * vs. the stored set — a Bloom can't enumerate members), so it
    * overestimates distinct fill; > 1.0 means the fpp bound is no longer
    * honest and a re-[[build]] with a larger capacity is due. */
  def saturation(spark: SparkSession, indexRoot: String): Double = {
    val r = CommitLog.read(spark, sketchTable(indexRoot))
      .select("n_inserted", "capacity").head()
    r.getLong(0).toDouble / r.getLong(1)
  }

  /** Churn gauge: shingle instances of RETIRED train docs (deletes folded
    * add-only — their bits still flag) over inserted instances. > the
    * maintenance threshold means enough of the sketch is stale positives
    * that a precision-reclaiming [[rebuild]] is due. 0 for stores built
    * before the counter existed (their overwrites reset it on the next
    * refresh). Updates-in-place also strand old-version bits, but those
    * docs are still train members — only full retirements count. */
  def deleteDebt(spark: SparkSession, indexRoot: String): Double = {
    val df = CommitLog.read(spark, sketchTable(indexRoot))
    if (!df.columns.contains("n_deleted")) return 0.0
    val r = df.select("n_deleted", "n_inserted").head()
    if (r.getLong(1) <= 0L) 0.0 else r.getLong(0).toDouble / r.getLong(1)
  }

  /** Fold train docs that arrived since the covered watermark: the
    * change-feed slice reduces to one final action per doc, new/rewritten
    * docs' shingles union in as a delta-only sketch (identical bit
    * geometry — capacity/fpp come from the stored row), deletes fold
    * ADD-ONLY (class doc: conservative stale-positives, never a leak).
    * One overwrite commit carries the advanced watermark; a replayed or
    * stale-slice refresh is a txn no-op. */
  def refresh(spark: SparkSession, trainTable: String, indexRoot: String,
      idCol: String = "doc_id", textCol: String = "text"): Long = {
    val covered = coveredVersion(indexRoot).getOrElse(
      throw new IllegalStateException(s"$indexRoot has no built sketch; run build first"))
    val latest = CommitLog.latestVersion(trainTable).getOrElse(
      throw new IllegalArgumentException(s"$trainTable has no committed versions"))
    if (latest <= covered) return covered
    // pin the sketch version this fold is based on: the commit below is
    // compare-and-set against it, so an interleaved refresher can never
    // silently drop this union (class doc: lost updates here are false
    // NEGATIVES, the one forbidden error direction)
    val sketchBase = CommitLog.latestVersion(sketchTable(indexRoot)).getOrElse(0L)
    val df = CommitLog.readAt(spark, sketchTable(indexRoot), sketchBase)
    val hasDel = df.columns.contains("n_deleted")
    val row = (if (hasDel)
      df.select("w", "capacity", "fpp", "n_inserted", "sketch", "n_deleted")
    else df.select("w", "capacity", "fpp", "n_inserted", "sketch")).head()
    val (w, capacity, fpp, n0) =
      (row.getInt(0), row.getLong(1), row.getDouble(2), row.getLong(3))
    val d0 = if (hasDel) row.getLong(5) else 0L
    val stored = BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(row.getAs[Array[Byte]](4)))
    val feed = CommitLog.changeFeed(spark, trainTable, covered, Some(latest),
      overwriteDiff = true)
    val finals = IndexUpkeep.finalActions(feed, idCol)
    val fresh = finals
      .filter(col(CommitLog.ChangeTypeCol) =!= "delete")
      .select(col(textCol))
    val (delta, nDelta) = sketchOf(shingleFrame(fresh, w, textCol), capacity, fpp)
    // delete debt: retired docs' shingles stay in the sketch (add-only
    // fold) — count them so Maintenance knows when precision needs a
    // rebuild. O(deleted docs in the slice), the same cost class as the
    // delta sketch itself. A change feed whose delete rows carry a NULL
    // pre-image text (not all CDC producers ship one) would contribute 0
    // here and silently defer the precision-reclaiming rebuild forever
    // (round-15 ADVICE) — estimate those docs at the slice's measured
    // shingles-per-doc instead (text-carrying deletes first, the fresh
    // side next, then a deliberately HIGH default: over-counting debt
    // only schedules the rebuild earlier, the safe direction).
    val nRetired = {
      val dels = finals.filter(col(CommitLog.ChangeTypeCol) === "delete")
        .select(col(textCol))
      val withText = dels.filter(col(textCol).isNotNull)
      val nNull = dels.filter(col(textCol).isNull).count()
      val exact = shingleFrame(withText, w, textCol).count()
      if (nNull == 0L) exact
      else {
        val nWith = withText.count()
        val perDoc =
          if (nWith > 0 && exact > 0) math.ceil(exact.toDouble / nWith).toLong
          else {
            val nFresh = fresh.filter(col(textCol).isNotNull).count()
            if (nFresh > 0 && nDelta > 0)
              math.ceil(nDelta.toDouble / nFresh).toLong
            else NullTextShingleEstimate
          }
        exact + nNull * perDoc
      }
    }
    stored.mergeInPlace(delta): Unit
    commitSketch(spark, indexRoot, w, capacity, fpp, n0 + nDelta,
      d0 + nRetired, stored, Some((AppId, latest)),
      expectPrior = Some(sketchBase))
    latest
  }

  /** Batch doc ids that MIGHT share a shingle with the sketched train
    * corpus — the serving probe: shingle the batch (O(batch)), filter
    * map-side through the stored sketch as a codegen'd predicate, no
    * shuffle until the final distinct on flagged ids. Superset of the
    * exact contaminated set by the no-false-negative construction; chase
    * with an exact semi-join on the flagged sliver when precision
    * matters. */
  def flaggedDocs(spark: SparkSession, indexRoot: String, batch: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val table = sketchTable(indexRoot)
    val version = CommitLog.latestVersion(table).getOrElse(
      throw new IllegalStateException(
        s"$indexRoot has no built sketch; run build first"))
    // key includes the application id: a cached probe closure holds a
    // Broadcast of a PARTICULAR SparkContext — after a context restart in
    // the same JVM the handle is dead, and serving it would fail every
    // probe until eviction
    val key = (spark.sparkContext.applicationId,
      CommitLog.normalizeRoot(table), version)
    val (w, probeOf) = servingCache.synchronized(
      Option(servingCache.get(key))) match {
      case Some(hit) => hit
      case None =>
        val row = CommitLog.readAt(spark, table, version)
          .select("w", "sketch").head()
        val w0 = row.getInt(0)
        val bytes = row.getAs[Array[Byte]](1)
        // a production-size sketch (100+ MB) probes through a broadcast
        // handle, never a plan literal (round-15 64x stanza: the literal
        // path spent 420 s on plan-side bitmap hashing/shipping for a
        // probe whose real work is seconds)
        val probe: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
          if (bytes.length <= graft.functions.BloomColumns.LiteralSketchMaxBytes) {
            val bf = BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
            c => graft.functions.BloomColumns.mightContain(bf, c)
          } else {
            val bcast = spark.sparkContext.broadcast(bytes)
            c => graft.functions.BloomColumns.mightContainBroadcast(bcast, c)
          }
        servingCache.synchronized(servingCache.put(key, (w0, probe)): Unit)
        (w0, probe)
    }
    batch.select(col(idCol), explode(graft.functions.ShingleHashes
        .shingleHashes(TextStats.tokens(col(textCol)), w)).as("__sh"))
      .filter(probeOf(col("__sh")))
      .select(idCol).distinct()
  }

  /** Serving-probe state memoized per (root, sketch version): the probe
    * COLUMN builder plus the shingle width. Memoizing means a steady
    * stream of serving probes pays the 100+ MB sketch read and the
    * broadcast ONCE per version ([[DedupStore]]'s `checkedConfig`
    * pattern — version resolution is a file-metadata read, zero Spark
    * jobs per cached probe), and re-broadcasting per call would LEAK a
    * bitmap-sized broadcast per probe until session end. Evicted or
    * superseded entries just drop the handle; Spark's ContextCleaner
    * reclaims the broadcast once live plans release it. */
  private val servingCache =
    new java.util.LinkedHashMap[(String, String, Long),
        (Int, org.apache.spark.sql.Column => org.apache.spark.sql.Column)](
      4, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, String, Long),
            (Int, org.apache.spark.sql.Column => org.apache.spark.sql.Column)]): Boolean =
        size() > 4
    }

  /** Per-slice distinct shingle-hash rows of a document frame. */
  private def shingleFrame(docs: DataFrame, w: Int, textCol: String): DataFrame =
    docs.select(explode(graft.functions.ShingleHashes
      .shingleHashes(TextStats.tokens(col(textCol)), w)).as("__sh"))
      .distinct()

  /** (sketch, inserted-count) of a shingle frame — one distributed
    * partial-filter reduce ([[graft.functions.BloomColumns.buildLong]]);
    * the driver holds only the bitmap. NOT `stat.bloomFilter`: Spark 4
    * silently clamps that at 2^26 bits, which the 64x stanza caught as a
    * 41%-fpp sketch claiming 0.25 fill — the silent-poison failure for a
    * store whose fpp is the contract. */
  private def sketchOf(sh: DataFrame, capacity: Long,
      fpp: Double): (BloomFilter, Long) = {
    val pinned = sh.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = pinned.count()
      val bf =
        if (n == 0) BloomFilter.create(capacity, fpp)
        else graft.functions.BloomColumns.buildLong(pinned, "__sh", capacity,
          fpp, itemsHint = n)
      (bf, n)
    } finally pinned.unpersist(blocking = false): Unit
  }

  private def commitSketch(spark: SparkSession, indexRoot: String, w: Int,
      capacity: Long, fpp: Double, n: Long, nDeleted: Long, bf: BloomFilter,
      txn: Option[(String, Long)], expectPrior: Option[Long]): Unit = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    import spark.implicits._
    CommitLog.commit(
      Seq((w, capacity, fpp, n, nDeleted, bos.toByteArray))
        .toDF("w", "capacity", "fpp", "n_inserted", "n_deleted", "sketch"),
      sketchTable(indexRoot), "overwrite", txn = txn,
      expectPriorVersion = expectPrior): Unit
  }
}
