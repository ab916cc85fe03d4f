package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — a broadcast join of the (small) query
  * set against the corpus, linear in corpus size, no shuffle of the corpus.
  * Scale path: random-hyperplane LSH bucketing — candidates share a bucket,
  * so the join is bucket-co-located rather than all-pairs; recall/cost is
  * tuned by the number of hyperplanes. All arithmetic is double-precision
  * sequential folds (deterministic) built from higher-order functions
  * (`zip_with`/`aggregate`/`transform`) — codegen-friendly, no UDFs.
  */
object Similarity {

  private def fold(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  def dot(a: Column, b: Column): Column =
    fold(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  def norm(a: Column): Column =
    sqrt(fold(transform(a, x => x.cast("double") * x.cast("double"))))

  /** Composable (higher-order-function) cosine — kept as the reference
    * implementation; the hot paths use the codegen'd expression below. */
  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Codegen'd cosine similarity ([[graft.functions.CosineSimilarity]]) —
    * one fused primitive loop inside WholeStageCodegen. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.cosineSim(a, b)

  /** Exact top-k neighbors for each query row: broadcast the query set,
    * score the corpus linearly, per-query top-k via ranking window.
    * Ties broken by corpus id for determinism. */
  def topKExact(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    // Spread the corpus scan: a single parquet file plans as one partition,
    // which would serialize the whole scoring loop onto one core.
    val c = corpus.repartition(corpus.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
  }

  /** All near-duplicate pairs by cosine threshold (a < b). Brute-force shape
    * for modest corpora; at scale, gate with [[lshBucket]] first. */
  def nearDupPairs(corpus: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = corpus.repartition(corpus.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("a"), col(vecCol).as("__va"))
    val b = corpus.select(col(idCol).as("b"), col(vecCol).as("__vb"))
    a.join(broadcast(b), col("a") < col("b"))
      .withColumn("sim", cosine(col("__va"), col("__vb")))
      .filter(col("sim") > threshold)
      .select("a", "b")
  }

  /** Random-hyperplane LSH bucket id: `planes` sign-bits of dot products with
    * deterministic ±1 hyperplanes (plane j, dimension i sign derived from
    * xxhash64(j, i) — reproducible with no stored model). */
  def lshBucket(vec: Column, planes: Int): Column = {
    val bits = (0 until planes).map { j =>
      val d = fold(transform(vec, (x, i) =>
        x.cast("double") * when(pmod(xxhash64(lit(j), i), lit(2)) === 0, 1.0).otherwise(-1.0)))
      when(d > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Approximate top-k: score only corpus rows sharing the query's LSH
    * bucket. The corpus→bucket map is one linear pass; the join shuffles on
    * the bucket id (bounded fan-out), never all-pairs. */
  def topKLsh(corpus: DataFrame, queries: DataFrame, k: Int, planes: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.repartition(corpus.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
        lshBucket(col(vecCol), planes).as("__bucket"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      lshBucket(col(vecCol), planes).as("__bucket"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    c.join(broadcast(q), "__bucket")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
  }
}
