package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tx.CommitLog

/** MinHash-LSH band table PERSISTED as a commit-log table and maintained
  * from the base table's change feed — INCREMENTAL corpus dedup. At 100 TB
  * the expensive step of near-dup detection is shingling + signing the
  * corpus; a batch pipeline pays it on EVERY run, even when 99.9% of the
  * corpus is unchanged. Here the band table lives on storage:
  *
  * {{{
  *   <indexRoot>/config   (w INT, bands INT, rows_per_band INT, build_id STRING)
  *   <indexRoot>/bands    (<idCol>, band INT, bandkey STRING, build_id STRING)
  * }}}
  *
  * and [[refresh]] folds base changes through a delta-only
  * sign-and-band pass, so the steady-state cost of "dedup the day's crawl
  * against the whole corpus" is O(delta), never O(corpus).
  *
  * CONTRACT: the base table's `idCol` is a KEY — one row per document
  * (the same contract [[IvfStore]] places on `vec_id`); [[build]] refuses
  * a base with duplicate ids rather than banding rows the change feed's
  * per-id folding could never retire individually.
  *
  * Unlike [[IvfStore]]/[[PqStore]] there is NO fitted model to freeze:
  * the signature of a document depends on nothing but that document (the
  * md5 hash family is fixed), so an incrementally maintained band table
  * is EXACTLY equal to a full recompute — pinned by the `dedup_incremental`
  * oracle query, whose DuckDB twin re-derives the candidates of the whole
  * corpus from scratch. The same durability contract as the other stores:
  * the covered base version rides as a txn watermark (appId [[AppId]]), a
  * replayed or RACING refresh re-applies nothing — retirements are
  * idempotent key deletes and fresh bands land as a keyed (id, band)
  * MERGE upsert, so a stalled duplicate refresher that resumes after a
  * winner cannot destroy the winner's rows (the delete touches only
  * retired ids, the merge is skipped by the txn fast path) — and any
  * process answers from storage without re-signing the corpus.
  *
  * `build_id` is the banding-parameter fingerprint, stamped on BOTH
  * tables: a re-[[build]] with different parameters that crashes between
  * the config overwrite and the bands overwrite leaves a mismatch that
  * [[refresh]]/[[pairs]]/[[candidates]] REFUSE loudly (re-run build),
  * instead of silently probing old-parameter bands with new-parameter
  * keys — the watermark cannot catch this (a same-base-version re-build
  * leaves it valid). */
object DedupStore {

  /** Writer id for the version watermark on `bands`. */
  val AppId = "graft-dedup"

  private def configTable(root: String) = s"$root/config"
  private def bandsTable(root: String) = s"$root/bands"

  private def buildId(w: Int, bands: Int, rowsPerBand: Int): String =
    s"w${w}b${bands}r$rowsPerBand"

  /** Sign + band the FULL base snapshot and publish the band table;
    * returns the covered base version. Config commits FIRST (a first-build
    * crash leaves config without bands — [[pairs]] refuses on the missing
    * table; a RE-build crash leaves mismatched build_ids — every reader
    * refuses on the stamp, see the class doc); the watermark is attached
    * only when it ADVANCES, for the same reason [[IvfStore.build]]
    * documents — an unconditional txn would trip the exactly-once fast
    * path on a same-version re-build and silently skip the overwrite. */
  def build(spark: SparkSession, baseTable: String, indexRoot: String,
      w: Int = 5, bands: Int = 4, rowsPerBand: Int = 2,
      idCol: String = "doc_id", textCol: String = "text"): Long = {
    val baseVersion = CommitLog.latestVersion(baseTable).getOrElse(
      throw new IllegalArgumentException(s"$baseTable has no committed versions"))
    val corpus = CommitLog.read(spark, baseTable)
    val cnts = corpus
      .agg(count(lit(1)).as("n"), countDistinct(col(idCol)).as("nd")).head()
    require(cnts.getLong(0) == cnts.getLong(1),
      s"$baseTable holds duplicate $idCol values (${cnts.getLong(0)} rows, " +
        s"${cnts.getLong(1)} distinct) — the dedup store folds the change " +
        "feed per id and cannot represent multi-row ids; de-duplicate the " +
        "base first")
    import spark.implicits._
    val bid = buildId(w, bands, rowsPerBand)
    val txn =
      if (coveredVersion(indexRoot).exists(_ >= baseVersion)) None
      else Some((AppId, baseVersion))
    CommitLog.commit(
      Seq((w, bands, rowsPerBand, bid))
        .toDF("w", "bands", "rows_per_band", "build_id"),
      configTable(indexRoot), "overwrite")
    CommitLog.commit(
      bandRows(corpus, w, bands, rowsPerBand, idCol, textCol, bid),
      bandsTable(indexRoot), "overwrite", txn = txn)
    baseVersion
  }

  /** Base version the index currently covers (the txn watermark). */
  def coveredVersion(indexRoot: String): Option[Long] =
    CommitLog.txnVersion(bandsTable(indexRoot), AppId)

  /** Fold every base change since the covered watermark into the band
    * table: the change-feed slice reduces to one final action per doc
    * ([[IndexUpkeep.finalActions]]); retired docs leave the table
    * file-granularly via [[CommitLog.deleteKeys]] (idempotent — a replay
    * re-deletes nothing), and fresh docs' bands are signed delta-only and
    * MERGE-upserted on (id, band) — a rewritten doc emits the same band
    * indexes, so the upsert replaces its stale keys in place and a
    * replayed refresh is a txn no-op. O(delta) compute + O(touched files)
    * rewrite; the no-op-slice watermark pin mirrors [[IvfStore.refresh]]. */
  def refresh(spark: SparkSession, baseTable: String, indexRoot: String,
      idCol: String = "doc_id", textCol: String = "text"): Long = {
    val covered = coveredVersion(indexRoot).getOrElse(
      throw new IllegalStateException(s"$indexRoot has no built index; run build first"))
    val latest = CommitLog.latestVersion(baseTable).getOrElse(
      throw new IllegalArgumentException(s"$baseTable has no committed versions"))
    if (latest <= covered) return covered
    val (w, bands, rowsPerBand, bid) = checkedConfig(spark, indexRoot)
    val feed = CommitLog.changeFeed(spark, baseTable, covered, Some(latest),
      overwriteDiff = true)
    val finalActs = IndexUpkeep.finalActions(feed, idCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val retired = finalActs.filter(col(CommitLog.ChangeTypeCol) === "delete")
        .select(col(idCol))
      val fresh = finalActs.filter(col(CommitLog.ChangeTypeCol) =!= "delete")
        .select(col(idCol), col(textCol))
      val hasFresh = !fresh.isEmpty
      CommitLog.deleteKeys(spark, bandsTable(indexRoot), retired, Seq(idCol),
        txn = if (hasFresh) None else Some((AppId, latest)))
      if (hasFresh)
        CommitLog.merge(spark, bandsTable(indexRoot),
          bandRows(fresh, w, bands, rowsPerBand, idCol, textCol, bid),
          Seq(idCol, "band"), txn = Some((AppId, latest)))
      if (!coveredVersion(indexRoot).exists(_ >= latest))
        CommitLog.commit(
          CommitLog.read(spark, bandsTable(indexRoot)).limit(0),
          bandsTable(indexRoot), "append", txn = Some((AppId, latest)))
      latest
    } finally finalActs.unpersist(blocking = false): Unit
  }

  /** Candidate near-dup pairs (a < b) of the WHOLE indexed corpus — a
    * band-key self-join over the stored table, no signing, no text read.
    * Equal to [[Dedup.minhashCandidates]] over the base snapshot (the
    * signature is per-document, so incremental maintenance loses
    * nothing — the oracle pins this). */
  def pairs(spark: SparkSession, indexRoot: String,
      idCol: String = "doc_id"): DataFrame = {
    checkedConfig(spark, indexRoot): Unit
    val bd = CommitLog.read(spark, bandsTable(indexRoot))
    val a = bd.select(col("band").as("band_a"), col("bandkey").as("key_a"),
      col(idCol).as("a"))
    val b = bd.select(col("band").as("band_b"), col("bandkey").as("key_b"),
      col(idCol).as("b"))
    a.join(b, col("band_a") === col("band_b") &&
        col("key_a") === col("key_b") && col("a") < col("b"))
      .select("a", "b").distinct()
  }

  /** Candidates of a NEW batch against the indexed corpus — the serving
    * shape ("dedup today's crawl against everything"): the batch is
    * signed in-flight (O(batch)) and its bands probe the stored table;
    * the corpus is never re-signed and only band-matching rows are
    * touched. Output: (query_id, match_id), match ≠ query — a batch doc
    * already present in the index matches everything it collides with
    * EXCEPT itself. */
  def candidates(spark: SparkSession, indexRoot: String, batch: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val (w, bands, rowsPerBand, bid) = checkedConfig(spark, indexRoot)
    val qb = bandRows(batch, w, bands, rowsPerBand, idCol, textCol, bid)
      .select(col("band").as("band_q"), col("bandkey").as("key_q"),
        col(idCol).as("query_id"))
    val sb = CommitLog.read(spark, bandsTable(indexRoot))
      .select(col("band").as("band_s"), col("bandkey").as("key_s"),
        col(idCol).as("match_id"))
    qb.join(sb, col("band_q") === col("band_s") &&
        col("key_q") === col("key_s") && col("query_id") =!= col("match_id"))
      .select("query_id", "match_id").distinct()
  }

  /** Load the banding config AND verify the bands table carries the same
    * parameter fingerprint — a torn re-build (config overwritten, bands
    * overwrite crashed) must refuse loudly, never probe old-parameter
    * bands with new-parameter keys. One sampled row: refresh mixing is
    * impossible (it refuses here first), so any surviving row exposes a
    * tear. An EMPTY bands table has nothing to mismatch and passes. */
  private def checkedConfig(spark: SparkSession,
      indexRoot: String): (Int, Int, Int, String) = {
    val row = CommitLog.read(spark, configTable(indexRoot))
      .select("w", "bands", "rows_per_band", "build_id").head()
    val cfg = (row.getInt(0), row.getInt(1), row.getInt(2), row.getString(3))
    CommitLog.read(spark, bandsTable(indexRoot))
      .select("build_id").head(1).headOption.foreach { b =>
        require(b.getString(0) == cfg._4,
          s"$indexRoot: bands table carries build ${b.getString(0)} but " +
            s"config says ${cfg._4} — a re-build crashed between its " +
            "config and bands overwrites; run build again")
      }
    cfg
  }

  /** (idCol, band, bandkey, build_id) rows of a document frame — the
    * fused signature expression + banding, delta-sized input in the
    * refresh and serving paths. */
  private def bandRows(docs: DataFrame, w: Int, bands: Int, rowsPerBand: Int,
      idCol: String, textCol: String, bid: String): DataFrame =
    Dedup.lshBands(
        Dedup.minhashSignature(docs, col(textCol), col(idCol),
          w, bands * rowsPerBand), bands, rowsPerBand)
      .select(col("__id").as(idCol), col("__band").as("band"),
        col("__bandkey").as("bandkey"), lit(bid).as("build_id"))
}
