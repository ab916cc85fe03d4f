package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.Dedup

/** Near-duplicate detection over `documents`: MinHash+LSH banding, exact
  * n-gram Jaccard verification, SimHash. Implementations in
  * [[graft.ext.Dedup]]; MinHash/Jaccard use engine-portable md5 hashing so
  * the DuckDB oracle reproduces the exact same signatures and candidates.
  * SimHash hashing matches too (md5-prefix), but its banded self-join is kept
  * rows-only-checked — its oracle SQL would be a page of bit-twiddling. */
object DedupQueries {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // MinHash(8 seeds, 5-token shingles) + LSH(4 bands × 2 rows) candidates.
    "dedup_minhash_lsh" -> ((s, d) =>
      Dedup.minhashCandidates(documents(s, d), col("text"), col("doc_id"))
        .orderBy("a", "b")),

    // Exact 3-gram Jaccard pairs ≥ 0.4 (LSH verification stage).
    "dedup_ngram_jaccard" -> ((s, d) =>
      Dedup.ngramJaccardPairs(documents(s, d), col("text"), col("doc_id"))
        .orderBy("a", "b")),

    // SimHash(32-bit) banded candidates, Hamming ≤ 3 (rows-only check).
    "dedup_simhash" -> ((s, d) =>
      Dedup.simhashCandidates(documents(s, d), col("text"), col("doc_id"))
        .orderBy("a", "b")),
  )

  val oracle: Map[String, String] = Map(
    "dedup_minhash_lsh" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'),
             x -> x <> '') AS tokens
           FROM documents),
         sh AS (
           SELECT doc_id, unnest(list_distinct(CASE WHEN len(tokens) >= 5
             THEN list_transform(range(1, len(tokens) - 3),
               i -> array_to_string(tokens[i:i+4], ' '))
             ELSE [array_to_string(tokens, ' ')] END)) AS shingle
           FROM toks),
         mh AS (
           SELECT doc_id, s.seed,
             min(md5(CAST(s.seed AS VARCHAR) || ':' || shingle)) AS mh
           FROM sh CROSS JOIN (SELECT unnest(range(0, 8)) AS seed) s
           GROUP BY doc_id, s.seed),
         bands AS (
           SELECT doc_id, CAST(seed // 2 AS INTEGER) AS band,
             md5(string_agg(mh, ':' ORDER BY seed)) AS bandkey
           FROM mh GROUP BY doc_id, 2)
         SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.bandkey = b.bandkey AND a.doc_id < b.doc_id
         ORDER BY a, b""",
    "dedup_ngram_jaccard" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'),
             x -> x <> '') AS tokens
           FROM documents),
         sh AS (
           SELECT doc_id, unnest(list_distinct(CASE WHEN len(tokens) >= 3
             THEN list_transform(range(1, len(tokens) - 1),
               i -> array_to_string(tokens[i:i+2], ' '))
             ELSE [array_to_string(tokens, ' ')] END)) AS shingle
           FROM toks),
         sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         inter AS (
           SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
           FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
           GROUP BY 1, 2)
         SELECT a, b, CAST(i AS DOUBLE) / (na.n + nb.n - i) AS jaccard
         FROM inter
         JOIN sizes na ON na.doc_id = a
         JOIN sizes nb ON nb.doc_id = b
         WHERE CAST(i AS DOUBLE) / (na.n + nb.n - i) >= 0.4
         ORDER BY a, b""",
  )
}
