package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.Similarity

/** Similarity search over the `embeddings` table (64-dim float vectors).
  * Exact brute-force queries carry DuckDB oracles (`list_cosine_similarity`
  * over DOUBLE[] — both engines emit only integer ids, so float last-ulp
  * noise cannot flip the hash unless two similarities tie to ~1e-15, which
  * only happens for identical vectors and is then broken by id on both
  * sides). The LSH variant depends on Spark's xxhash64 → rows-only check. */
object VectorQueries {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Exact cosine top-5 for the first 20 vectors as queries.
    "ann_topk_exact" -> ((s, d) => Similarity.topKExact(
        embeddings(s, d), embeddings(s, d).filter(col("vec_id") < 20), k = 5)
      .select("query_id", "rank", "neighbor_id")
      .orderBy("query_id", "rank")),

    // Embedding near-duplicate pairs: cosine > 0.95.
    "embed_neardup" -> ((s, d) =>
      Similarity.nearDupPairs(embeddings(s, d), threshold = 0.95)
        .orderBy("a", "b")),

    // LSH-gated near-dup pairs (the scale path for embed_neardup): output is
    // always a subset of the exact pairs (the cosine filter is exact); the
    // oracle is the same exact SQL, matching whenever LSH recall is 1 —
    // recall on genuinely-near vectors is asserted in SimilaritySpec.
    "embed_neardup_lsh" -> ((s, d) =>
      Similarity.nearDupPairsLsh(embeddings(s, d), threshold = 0.95)
        .orderBy("a", "b")),

    // LSH-bucketed approximate top-5 (scale path; rows-only check, recall
    // asserted against the exact result in the test suite).
    "ann_topk_lsh" -> ((s, d) => Similarity.topKLsh(
        embeddings(s, d), embeddings(s, d).filter(col("vec_id") < 20), k = 5)
      .select("query_id", "rank", "neighbor_id")
      .orderBy("query_id", "rank")),

    // IVF (k-means cells, probe nearest) approximate top-5 (rows-only; the
    // index is memoized per sf dir so repeated calls don't refit).
    "ann_topk_ivf" -> ((s, d) => graft.ext.IvfIndex.topK(
        embeddings(s, d), embeddings(s, d).filter(col("vec_id") < 20), k = 5,
        cacheKey = Some(d))
      .select("query_id", "rank", "neighbor_id")
      .orderBy("query_id", "rank")),
  )

  val oracle: Map[String, String] = Map(
    "ann_topk_exact" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
             FROM embeddings WHERE vec_id < 20),
         c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
             FROM embeddings),
         scored AS (
           SELECT query_id, neighbor_id,
             list_cosine_similarity(qv, cv) AS sim
           FROM c CROSS JOIN q WHERE neighbor_id <> query_id)
         SELECT query_id,
           CAST(row_number() OVER (PARTITION BY query_id
             ORDER BY sim DESC, neighbor_id) AS INTEGER) AS rank,
           neighbor_id
         FROM scored
         QUALIFY rank <= 5
         ORDER BY query_id, rank""",
    "embed_neardup" ->
      """SELECT a.vec_id AS a, b.vec_id AS b
         FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
           CAST(b.embedding AS DOUBLE[])) > 0.95
         ORDER BY a, b""",
    "embed_neardup_lsh" ->
      """SELECT a.vec_id AS a, b.vec_id AS b
         FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
           CAST(b.embedding AS DOUBLE[])) > 0.95
         ORDER BY a, b""",
  )
}
