package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Text-analysis column functions: token counting, quality stats,
  * fingerprint canonicalization, language-ID heuristic. */
class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  test("token count: whitespace runs, leading/trailing space, empty") {
    val rows = Seq("a b  c", "  x ", "", "one\ttwo\nthree").toDF("t")
      .select(TextStats.tokenCount(col("t")).as("n")).as[Int].collect().toSeq
    assert(rows === Seq(3, 1, 0, 3))
  }

  test("avg token length and stopword ratio") {
    val r = Seq("the cat on the mat").toDF("t").select(
      TextStats.avgTokenLen(col("t")).as("avg"),
      TextStats.stopwordRatio(col("t")).as("sw")).as[(Double, Double)].collect().head
    assert(r._1 === (3 + 3 + 2 + 3 + 3) / 5.0)
    assert(r._2 === 2.0 / 5.0) // 'the' ×2
  }

  test("fingerprint is invariant to case and whitespace runs") {
    val fps = Seq("Hello  World", "hello world", "  hello\tworld ", "hello worlds")
      .toDF("t").select(TextStats.fingerprint(col("t")).as("f")).as[String].collect()
    assert(fps(0) === fps(1) && fps(1) === fps(2))
    assert(fps(3) !== fps(0))
  }

  test("language-ID picks the profile with most stopword hits; und when none") {
    val preds = Seq(
      "the cat is on the mat and it is warm",
      "der hund ist nicht zu hause und die katze",
      "el gato es un animal que vive en la casa",
      "le chat est un animal que nous avons pour la maison",
      "zzz qqq xxx www",
    ).toDF("t").select(TextStats.langId(col("t")).as("l")).as[String].collect().toSeq
    assert(preds === Seq("en", "de", "es", "fr", "und"))
  }

  test("unigram log-prob: rare-token docs score higher than common-token docs") {
    // corpus: 20 docs of the same common sentence + 1 doc of unique tokens
    val docs = ((1 to 20).map(i => (i.toLong, "the common words repeat here")) :+
      (99L, "zyzzyva qwertyuiop floccinaucinihilipilification")).toDF("doc_id", "text")
    val scores = TextStats.unigramLogProb(docs, col("text"), col("doc_id"))
      .select(col("__id"), col("neg_logp")).as[(Long, Double)].collect().toMap
    val commonScore = scores(1L)
    val rareScore = scores(99L)
    assert(rareScore > commonScore + 1.0,
      s"rare-token doc must score much higher: rare=$rareScore common=$commonScore")
    // every repeated doc scores identically (same tokens, same corpus stats)
    assert((2 to 20).forall(i => scores(i.toLong) == commonScore))
  }
}
