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

  test("chunk windows: overlap, short docs, empty doc, exact boundary") {
    def chunks(t: String, w: Int, s: Int): Seq[String] =
      Seq(t).toDF("t").select(TextStats.chunkWindows(col("t"), w, s).as("c"))
        .as[Seq[String]].collect().head
    // 7 tokens, window 4, stride 3: starts 0,3,6 — overlap of 1 token
    assert(chunks("a b c d e f g", 4, 3) === Seq("a b c d", "d e f g", "g"))
    // doc shorter than a window: one whole-doc chunk
    assert(chunks("x y", 4, 3) === Seq("x y"))
    // empty doc: exactly one empty chunk (sequence(0,-1) would DESCEND —
    // the greatest() guard pins start list to [0])
    assert(chunks("", 4, 3) === Seq(""))
    // stride == window: exact tiling, no overlap, no dropped tail
    assert(chunks("a b c d e f", 3, 3) === Seq("a b c", "d e f"))
    // every token appears in at least one chunk (no boundary loss)
    val toks = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10".split(" ").toSet
    assert(chunks("t1 t2 t3 t4 t5 t6 t7 t8 t9 t10", 4, 3)
      .flatMap(_.split(" ")).toSet === toks)
  }

  test("PII scrub redacts emails and phones, counts via the same regexes") {
    val r = Seq(
      "mail bob.smith+x@sub.example.co.uk and call 555-123-4567 twice",
      "no pii here 123-45 not-a-phone a@b", // a@b has no TLD → not an email
      "two mails a.b@c.org d_e@f.io").toDF("t")
      .select(TextStats.scrubPii(col("t")).as("s"),
        size(regexp_extract_all(col("t"), lit(TextStats.EmailRe), lit(0))).as("ne"),
        size(regexp_extract_all(col("t"), lit(TextStats.PhoneRe), lit(0))).as("np"))
      .as[(String, Int, Int)].collect().toSeq
    assert(r(0) === (("mail [EMAIL] and call [PHONE] twice", 1, 1)))
    assert(r(1) === (("no pii here 123-45 not-a-phone a@b", 0, 0)))
    assert(r(2) === (("two mails [EMAIL] [EMAIL]", 2, 0)))
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

  test("bigram log-prob: broken word ORDER scores higher than fluent text " +
      "even when unigrams are identical — the signal the unigram LM cannot see") {
    // 20 fluent docs of the same sentence + one doc with the SAME words
    // shuffled (every unigram count identical) + one too-short doc
    val fluent = "the quick brown fox jumps over the lazy dog again"
    val shuffled = "dog the over quick lazy jumps brown again fox the"
    val docs = ((1 to 20).map(i => (i.toLong, fluent)) ++
      Seq((99L, shuffled), (100L, "solo"))).toDF("doc_id", "text")
    val scores = TextStats.bigramLogProb(docs, col("text"), col("doc_id"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val fl = scores(1L).get
    val sh = scores(99L).get
    assert(sh > fl + 0.5,
      s"shuffled doc must score higher: shuffled=$sh fluent=$fl")
    // unigram LM is blind to the same difference
    val uni = TextStats.unigramLogProb(docs, col("text"), col("doc_id"))
      .select(col("__id"), col("neg_logp")).as[(Long, Double)].collect().toMap
    assert(uni(99L) === uni(1L))
    // every repeated doc scores identically; <2-token docs carry NULL
    assert((2 to 20).forall(i => scores(i.toLong).get == fl))
    assert(scores(100L) === None)
    // one row per input document, short docs included
    assert(scores.size === 22)
  }

  // reference md5-hex used by the hashedLinearScore tests
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def bucketOf(token: String, dim: Int): Int =
    (java.lang.Long.parseLong(md5hex(token).take(4), 16) % dim).toInt

  test("hashedLinearScore weights path: mean of looked-up bucket weights") {
    val dim = 8
    val ws = Array(0.5, -1.0, 2.0, 0.25, -0.75, 1.5, -2.0, 3.0)
    val text = "alpha beta gamma delta alpha"
    val expected = text.split(" ").map(t => ws(bucketOf(t, dim))).sum / 5.0
    val got = Seq(text).toDF("t")
      .select(TextStats.hashedLinearScore(col("t"), dim, Some(ws)).as("s"))
      .as[Double].head()
    assert(math.abs(got - expected) < 1e-12, s"got $got expected $expected")
  }

  test("hashedLinearScore fixture path: md5-derived integer weights, exact division") {
    val dim = 1024
    val text = "key agg row scan"
    val expected = {
      val sw = text.split(" ").map { t =>
        val b = bucketOf(t, dim)
        java.lang.Long.parseLong(md5hex(s"w:$b").take(4), 16) - 32768L
      }.sum
      sw.toDouble / (4 * 65536.0)
    }
    val got = Seq(text).toDF("t")
      .select(TextStats.hashedLinearScore(col("t"), dim).as("s"))
      .as[Double].head()
    assert(got === expected) // integer sums + one division — bit-exact
  }

  test("hashedLinearScore: empty text scores 0.0; bad args throw") {
    val got = Seq("", "   ").toDF("t")
      .select(TextStats.hashedLinearScore(col("t")).as("s")).as[Double].collect()
    assert(got.toSeq === Seq(0.0, 0.0))
    intercept[IllegalArgumentException] {
      TextStats.hashedLinearScore(col("t"), dim = 0)
    }
    intercept[IllegalArgumentException] {
      TextStats.hashedLinearScore(col("t"), dim = 4, weights = Some(Array(1.0)))
    }
  }
}
