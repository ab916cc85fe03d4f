package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale corpus curation: exact,
  * latest-revision, MinHash+LSH near-dup, SimHash, n-gram Jaccard.
  *
  * Scale posture (SURVEY.md §7.5): nothing here is all-pairs. Exact dedup is
  * one hash-shuffle on the fingerprint; MinHash/SimHash candidate generation
  * shuffles on band keys (bucket join), so cost is O(n · signature) plus
  * within-bucket pairs only; verification (Jaccard) runs only on candidates.
  */
object Dedup {

  /** Keep one row per exact-duplicate group (lowest id wins) — hash-groupBy,
    * one shuffle on the 128-bit fingerprint. */
  def exact(df: DataFrame, text: Column, id: Column): DataFrame =
    df.withColumn("__fp", TextStats.fingerprint(text))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__fp")).orderBy(id)))
      .filter(col("__rn") === 1)
      .drop("__fp", "__rn")

  /** Latest-revision dedup — the reconciliation the reference lacks
    * (SURVEY.md §2.9): among rows sharing `key`, keep the one with the
    * greatest `revision` (reference: latest `updated` per event id). */
  def latestRevision(df: DataFrame, key: Column, revision: Column): DataFrame =
    df.withColumn("__rn", row_number().over(
        Window.partitionBy(key).orderBy(revision.desc)))
      .filter(col("__rn") === 1)
      .drop("__rn")

  /** w-token shingles of the token array (whole text if shorter than w). */
  def shingles(text: Column, w: Int): Column = {
    val ts = TextStats.tokens(text)
    array_distinct(
      when(size(ts) >= w,
        transform(sequence(lit(0), size(ts) - w),
          i => array_join(slice(ts, i + 1, lit(w)), " ")))
      .otherwise(array(array_join(ts, " "))))
  }

  /** MinHash signature matrix: (id, seed, minhash) with `seeds` independent
    * hash functions h_s(x) = md5(s || ':' || x). md5 keeps the signature
    * engine-portable (the DuckDB oracle computes the identical signature);
    * swap [[org.apache.spark.sql.functions.xxhash64]] in for raw speed when
    * oracle portability is not needed.
    */
  def minhashSignature(df: DataFrame, text: Column, id: Column, w: Int, seeds: Int): DataFrame = {
    val sh = df.select(id.as("__id"), explode(shingles(text, w)).as("__shingle"))
    val seedCol = explode(sequence(lit(0), lit(seeds - 1)))
    sh.select(col("__id"), seedCol.as("__seed"), col("__shingle"))
      .groupBy("__id", "__seed")
      .agg(min(md5(concat(col("__seed").cast("string"), lit(":"), col("__shingle")))).as("__mh"))
  }

  /** LSH banding over the signature: band key = md5 of the band's minhashes
    * joined in seed order. Returns (id, band, bandkey). */
  def lshBands(sig: DataFrame, rowsPerBand: Int): DataFrame =
    sig.withColumn("__band", (col("__seed") / rowsPerBand).cast("int"))
      .groupBy("__id", "__band")
      .agg(md5(array_join(array_sort(collect_list(struct(col("__seed"), col("__mh"))))
        .getField("__mh"), ":")).as("__bandkey"))

  /** Candidate near-duplicate pairs (a < b) sharing at least one LSH band —
    * a bucket self-join, never all-pairs. */
  def minhashCandidates(df: DataFrame, text: Column, id: Column,
      w: Int = 5, seeds: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    val bands = lshBands(minhashSignature(df, text, id, w, seeds), rowsPerBand)
    val a = bands.select(col("__band").as("band_a"), col("__bandkey").as("key_a"), col("__id").as("a"))
    val b = bands.select(col("__band").as("band_b"), col("__bandkey").as("key_b"), col("__id").as("b"))
    a.join(b, col("band_a") === col("band_b") && col("key_a") === col("key_b") && col("a") < col("b"))
      .select("a", "b").distinct()
  }

  /** Exact n-gram Jaccard similarity for pairs above `threshold` — the
    * verification stage after LSH candidate generation (or standalone on
    * small corpora). Shuffle is on shingles; pairs materialize only where
    * shingles are shared. */
  def ngramJaccardPairs(df: DataFrame, text: Column, id: Column,
      w: Int = 3, threshold: Double = 0.4): DataFrame = {
    val sh = df.select(id.as("__id"), explode(shingles(text, w)).as("__shingle"))
    val sizes = sh.groupBy("__id").agg(count(lit(1)).as("__n"))
    val inter = sh.as("x").join(sh.as("y"),
        col("x.__shingle") === col("y.__shingle") && col("x.__id") < col("y.__id"))
      .groupBy(col("x.__id").as("a"), col("y.__id").as("b"))
      .agg(count(lit(1)).as("__inter"))
    inter
      .join(sizes.withColumnRenamed("__id", "a").withColumnRenamed("__n", "__na"), "a")
      .join(sizes.withColumnRenamed("__id", "b").withColumnRenamed("__n", "__nb"), "b")
      .withColumn("jaccard",
        col("__inter").cast("double") / (col("__na") + col("__nb") - col("__inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** 32-bit SimHash over tokens: per-token hash from an md5 prefix, bit votes
    * summed, sign → bit. Near-dups = small Hamming distance. */
  def simhash(text: Column): Column = {
    val tokenHash = transform(TextStats.tokens(text),
      t => conv(substring(md5(t), 1, 8), 16, 10).cast("long"))
    val bits = (0 until 32).map { j =>
      val votes = aggregate(tokenHash, lit(0),
        (acc, h) => acc + when(shiftright(h, j).bitwiseAND(1) === 1, 1).otherwise(-1))
      when(votes > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** SimHash near-dup candidates: band the 32-bit simhash into 4 bytes; pairs
    * sharing any byte-band are candidates (Hamming ≤ 3 guaranteed found if
    * the ≤3 differing bits fall in ≤3 bands). */
  def simhashCandidates(df: DataFrame, text: Column, id: Column, maxHamming: Int = 3): DataFrame = {
    val withSh = df.select(id.as("__id"), simhash(text).as("__sh"))
    val banded = withSh.select(col("__id"), col("__sh"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"), shiftright(col("__sh"), b * 8).bitwiseAND(0xff).as("key"))): _*)).as("bk"))
    val a = banded.select(col("bk.band").as("band_a"), col("bk.key").as("key_a"),
      col("__id").as("a"), col("__sh").as("sha"))
    val b = banded.select(col("bk.band").as("band_b"), col("bk.key").as("key_b"),
      col("__id").as("b"), col("__sh").as("shb"))
    val hamming = (0 until 32).map(j =>
      shiftright(col("sha").bitwiseXOR(col("shb")), j).bitwiseAND(1)).reduce(_ + _)
    a.join(b, col("band_a") === col("band_b") && col("key_a") === col("key_b") && col("a") < col("b"))
      .withColumn("hamming", hamming)
      .filter(col("hamming") <= maxHamming)
      .select("a", "b", "hamming").distinct()
  }
}
