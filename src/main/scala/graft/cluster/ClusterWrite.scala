package graft.cluster

import org.apache.spark.sql.{Column, DataFrame}

/** Data-clustering write (reference O3): the reference sorts the frame on
  * `[tsunami, magnitude, significance]` before the bronze append to improve
  * scan locality ("z order and other ways to make it efficient",
  * `usgs-earthquake-data-ingest.py:281`; active sort at
  * `usgs-earthquake-data-ingest-dynamic-dev.py:289-292`).
  *
  * Spark-first mapping: `repartitionByRange` + `sortWithinPartitions` — range
  * partitioning co-locates key ranges per output file so parquet min/max
  * row-group stats actually skip, which is the benefit the reference was
  * after. (A faithful bit-interleaved Z-order only pays off with a clustering-
  * aware compactor; range-clustering is the idiomatic Spark equivalent.)
  */
object ClusterWrite {
  def cluster(df: DataFrame, keys: Seq[Column], numPartitions: Option[Int] = None): DataFrame = {
    val ranged = numPartitions match {
      case Some(n) => df.repartitionByRange(n, keys: _*)
      case None    => df.repartitionByRange(keys: _*)
    }
    ranged.sortWithinPartitions(keys: _*)
  }

  /** Faithful multi-dimensional Z-order clustering: equal-width bucket each
    * key into 2^bits buckets (one min/max aggregate over a sampled or full
    * scan — cheap relative to the write), interleave the bucket bits into a
    * Morton value ([[graft.functions.ZOrderValue]], codegen'd), then
    * range-partition + sort on it. Rows close in EVERY key dimension land in
    * the same files, so parquet min/max stats skip on any key — what the
    * reference's successive full sorts were reaching for (O3). */
  def zorder(df: DataFrame, keys: Seq[Column], bits: Int = 8,
      numPartitions: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.functions._
    val withZ = df.withColumn("__z", zorderColumn(df, keys, bits))
    val ranged = numPartitions match {
      case Some(n) => withZ.repartitionByRange(n, col("__z"))
      case None    => withZ.repartitionByRange(col("__z"))
    }
    ranged.sortWithinPartitions(col("__z")).drop("__z")
  }

  /** Target-sized parquet output — the small-files lever. Samples up to
    * `sampleRows` rows to estimate bytes/row (parquet compresses the
    * in-memory estimate; `compressionRatio` defaults to the ~4x typical for
    * snappy parquet over mixed columns), then writes with
    * `maxRecordsPerFile` so every task's output splits into
    * ~`targetBytesPerFile` files. Composes with [[cluster]]/[[zorder]]:
    * range-partition first, then size-bound the files — passing the
    * pre-shuffle frame as `sampleFrom` so the estimate never executes the
    * clustering exchange. At 100 TB the
    * difference between 128 MB files and a million 1 MB files is the
    * difference between a healthy scan and a NameNode/footer-fetch wall. */
  def sizedWrite(df: DataFrame, targetBytesPerFile: Long = 128L * 1024 * 1024,
      sampleRows: Int = 1000, compressionRatio: Double = 4.0,
      sampleFrom: Option[DataFrame] = None): org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row] = {
    // Row width is independent of row order and partitioning, so when df is
    // shuffle-rooted (cluster/zorder output — this function's documented
    // feed) callers should pass the PRE-shuffle frame as `sampleFrom`: the
    // head-of-partition sampling below can short-circuit a scan-rooted plan
    // after one row group per partition, but it cannot short-circuit
    // through an exchange — estimating from the shuffled df would execute
    // the full repartitionByRange map stage once for the estimate and again
    // for the actual write (round-3 ADVICE).
    val bytesPerRow = estimateBytesPerRow(
      sampleFrom.getOrElse(df), sampleRows, compressionRatio)
    val recordsPerFile = math.max((targetBytesPerFile / bytesPerRow).toLong, 1L)
    df.write.option("maxRecordsPerFile", recordsPerFile.toString)
  }

  /** Compressed-bytes-per-row estimate behind [[sizedWrite]]. Samples the
    * HEAD OF EVERY PARTITION, not limit(): the first N rows of
    * range-clustered input share one key range, so a single-partition head
    * badly biases the estimate (round-2 ADVICE), while a uniform sample()
    * or a count() would pay full extra passes over the input (round-3
    * review). Each task short-circuits after its quota, so on a scan-rooted
    * frame the whole estimate costs one first-row-group read per
    * partition. */
  def estimateBytesPerRow(df: DataFrame, sampleRows: Int = 1000,
      compressionRatio: Double = 4.0): Double = {
    import org.apache.spark.sql.functions._
    val widths = df.select(length(to_json(struct(df.columns.map(col): _*)))
        .cast("long").as("b"))
    val perPartition = math.max(1,
      sampleRows / math.max(1, widths.rdd.getNumPartitions))
    val sampled = widths.rdd.mapPartitions(_.take(perPartition).map(_.getLong(0)))
      .collect()
    if (sampled.isEmpty) 256.0
    else math.max(sampled.sum.toDouble / sampled.length / compressionRatio, 8.0)
  }

  /** The Morton clustering value for `df` over `keys`: equal-width bucket
    * each key into 2^bits buckets (min/max stats computed eagerly from `df`)
    * and bit-interleave the bucket ids. Exposed so callers (and tests) can
    * inspect or reuse the clustering key outside [[zorder]]'s write path. */
  def zorderColumn(df: DataFrame, keys: Seq[Column], bits: Int): Column = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    require(keys.nonEmpty && bits * keys.size <= 63)
    // orderable-numeric dimensions keep true range locality; everything
    // else (strings, binaries, …) hashes to a numeric first — equal
    // values still co-locate (the point-lookup win), range locality
    // doesn't apply, and an ANSI cast-to-double crash on 'abc' is
    // impossible
    val keys0 = keys.map { k =>
      df.select(k).schema.head.dataType match {
        case _: NumericType | BooleanType | TimestampType => k.cast("double")
        // DATE and TIMESTAMP_NTZ refuse a direct double cast (verified on
        // this Spark) — go through their epoch numerics, keeping true
        // range locality
        case DateType => unix_date(k).cast("double")
        case TimestampNTZType => unix_micros(k.cast("timestamp")).cast("double")
        case _ => xxhash64(k).cast("double")
      }
    }
    val aggs = keys0.zipWithIndex.flatMap { case (k, i) =>
      Seq(min(k).as(s"__min$i"), max(k).as(s"__max$i"))
    }
    val stats = df.agg(aggs.head, aggs.tail: _*).collect().head
    val nBuckets = 1 << bits
    val bucketCols = keys0.zipWithIndex.map { case (k, i) =>
      val lo = stats.getDouble(2 * i)
      val hi = stats.getDouble(2 * i + 1)
      if (lo == hi) lit(0L)
      // width_bucket returns nBuckets+1 for x == hi (the upper bound is an
      // overflow bucket), so rows holding a dimension's max would otherwise
      // wrap to bucket nBuckets, whose low `bits` bits interleave as 0 —
      // co-locating the max-value class with the min-value class. Clamp to
      // the top in-range bucket instead.
      else least(width_bucket(k, lit(lo), lit(hi), lit(nBuckets)) - 1,
        lit(nBuckets - 1L))
    }
    graft.functions.ZOrderExpression.zorderValue(bits, bucketCols: _*)
  }
}
