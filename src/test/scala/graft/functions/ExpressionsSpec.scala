package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Native Catalyst expressions: rolling hash vs naive recompute, SQL
  * registration through GraftFunctions/GraftExtensions, codegen/interpreted
  * agreement. */
class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("rolling hash equals the naive per-window polynomial hash") {
    def naive(s: String, k: Int): Seq[Long] = {
      val b = s.getBytes("UTF-8")
      (0 to b.length - k).map { i =>
        var h = 0L
        for (j <- i until i + k) h = h * RollingHash.Base + (b(j) & 0xffL)
        h
      }
    }
    val texts = Seq("hello rolling world", "ab", "abcdefgh", "ααβγ unicode too")
    val got = texts.toDF("t")
      .select(TextExpressions.rollingHash(col("t"), 8).as("h"))
      .as[Seq[Long]].collect().toSeq
    assert(got === texts.map(naive(_, 8)))
  }

  test("rolling hash: shorter-than-k text yields empty array, null stays null") {
    val got = Seq(Some("abc"), None).toDF("t")
      .select(TextExpressions.rollingHash(col("t"), 8).as("h"))
      .collect().map(r => Option(r.get(0)))
    assert(got(0).get.asInstanceOf[scala.collection.Seq[_]].isEmpty)
    assert(got(1).isEmpty)
  }

  test("SQL registration: cosine_similarity, simhash32, rolling_hash callable from SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT
           cosine_similarity(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
                             array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c,
           simhash32(array('a','b')) AS sh,
           size(rolling_hash('hello world!', 4)) AS n
      """).collect().head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getLong(1) !== 0L)
    assert(r.getInt(2) === "hello world!".getBytes.length - 4 + 1)
  }

  test("SQL registration: minhash_sig and lsh_buckets callable from SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT
           minhash_sig(array('a','b','c'), 2, 8) AS sig,
           lsh_buckets(array(CAST(0.5 AS FLOAT), CAST(-0.5 AS FLOAT)), 4, 3, 2) AS b
      """).collect().head
    assert(r.getSeq[Long](0).size === 8)
    assert(r.getSeq[Long](1).size === 4)
    // same values as the column-API route
    val viaCol = Seq(Seq("a", "b", "c")).toDF("t")
      .select(MinHashSig.minhashSig(col("t"), 2, 8).as("sig"))
      .as[Seq[Long]].collect().head
    assert(r.getSeq[Long](0) === viaCol)
  }

  test("SQL registration: kll_quantiles and heavy_hitters UDAFs callable from SQL") {
    GraftFunctions.register(spark)
    spark.range(1, 401).selectExpr("CAST(id AS DOUBLE) AS x", "CAST(id % 3 AS STRING) AS s")
      .createOrReplaceTempView("kll_v")
    val q = spark.sql("SELECT kll_quantiles(x) AS q FROM kll_v")
      .collect().head.getSeq[Double](0)
    // n=400 < capacity 512 ⇒ no compaction ⇒ exact ceil-rank quantiles
    assert(q === Seq(200.0, 380.0, 396.0))
    val hh = spark.sql("SELECT heavy_hitters(s) AS m FROM kll_v")
      .collect().head.getMap[String, Long](0)
    assert(hh.keySet === Set("0", "1", "2"))
  }

  test("rolling_hash rejects non-literal k") {
    GraftFunctions.register(spark)
    intercept[Exception] {
      spark.sql("SELECT rolling_hash('abc', length('ab'))").collect()
    }
  }

  test("simhash is insensitive to token order (bag-of-words property)") {
    val a = Seq("one two three four five").toDF("t")
    val b = Seq("five four three two one").toDF("t")
    def sh(df: org.apache.spark.sql.DataFrame) =
      df.select(TextExpressions.simhash32(split(col("t"), " ")).as("s")).as[Long].collect().head
    assert(sh(a) === sh(b))
  }

  test("fused MinHashSig equals the reference md5-hex-slice formulation") {
    // Reference: per shingle (w consecutive tokens, space-joined; whole text
    // when shorter), slot s = min of hex-parsed substr(md5(s/4||':'||sh),
    // (s%4)*8+1, 8) — exactly the oracle SQL's mh CTE.
    def reference(text: String, w: Int, numHashes: Int): Seq[Long] = {
      val toks = text.split("\\s+").filter(_.nonEmpty).toSeq
      val shingles =
        if (toks.size >= w) (0 to toks.size - w).map(i => toks.slice(i, i + w).mkString(" "))
        else Seq(toks.mkString(" "))
      (0 until numHashes).map { s =>
        shingles.map { sh =>
          val md = java.security.MessageDigest.getInstance("MD5")
          val hex = md.digest(s"${s / 4}:$sh".getBytes("UTF-8"))
            .map(b => f"$b%02x").mkString
          java.lang.Long.parseLong(hex.substring((s % 4) * 8, (s % 4) * 8 + 8), 16)
        }.min
      }
    }
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "one two three four five six seven",
      "short",            // fewer tokens than w → whole-text shingle
      "  spaced   out  ", // tokenizer must drop empties
      "ααβγ unicode shingle content here today")
    val got = texts.toDF("t")
      .select(MinHashSig.minhashSig(graft.ext.TextStats.tokens(col("t")), 5, 8).as("sig"))
      .as[Seq[Long]].collect().toSeq
    assert(got === texts.map(reference(_, 5, 8)))
  }

  test("ShingleHashes: distinct count matches string shingles; edit-sensitive") {
    val texts = Seq(
      "a b c d e f g",
      "a b a b a b a b",   // duplicate shingles collapse
      "one two",           // shorter than w → single whole-text shingle
      "")
    val df = texts.toDF("t")
    val viaHash = df.select(size(ShingleHashes
      .shingleHashes(graft.ext.TextStats.tokens(col("t")), 3)).as("n")).as[Int].collect().toSeq
    val viaStr = df.select(size(graft.ext.Dedup.shingles(col("t"), 3)).as("n"))
      .as[Int].collect().toSeq
    assert(viaHash === viaStr)
    // changing one token changes exactly the w covering shingles
    val base = Seq("t0 t1 t2 t3 t4 t5").toDF("t")
      .select(ShingleHashes.shingleHashes(graft.ext.TextStats.tokens(col("t")), 3).as("h"))
      .as[Seq[Long]].collect().head.toSet
    val edited = Seq("t0 t1 t2 XX t4 t5").toDF("t")
      .select(ShingleHashes.shingleHashes(graft.ext.TextStats.tokens(col("t")), 3).as("h"))
      .as[Seq[Long]].collect().head.toSet
    assert((base intersect edited).size === 1) // only "t0 t1 t2" survives
  }

  test("MinHashSig: null text stays null; empty text hashes the empty shingle") {
    val got = Seq(Some(""), None).toDF("t")
      .select(MinHashSig.minhashSig(graft.ext.TextStats.tokens(col("t")), 5, 8).as("sig"))
      .collect()
    assert(got(0).getSeq[Long](0).size === 8) // md5("g:") minimums, not a crash
    assert(got(1).isNullAt(0))
  }
}
