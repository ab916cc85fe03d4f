package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Similarity search over real embeddings (sf0.001): expression-vs-HOF
  * cosine agreement, brute-force top-k against a driver-side oracle,
  * LSH recall against the exact result. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  lazy val emb = graft.queries.Tables.embeddings(spark, "/root/testdata/sf0.001").cache()

  test("codegen cosine agrees with the higher-order-function formulation") {
    val both = emb.as("a").crossJoin(emb.as("b")).limit(500)
      .select(
        Similarity.cosine(col("a.embedding"), col("b.embedding")).as("fast"),
        Similarity.cosineHof(col("a.embedding"), col("b.embedding")).as("ref"))
      .as[(Double, Double)].collect()
    both.foreach { case (f, r) => assert(math.abs(f - r) < 1e-9) }
  }

  test("cosine of a vector with itself is 1") {
    val ones = emb.select(Similarity.cosine(col("embedding"), col("embedding")).as("c"))
      .as[Double].collect()
    ones.foreach(c => assert(math.abs(c - 1.0) < 1e-12))
  }

  test("brute-force top-k matches a driver-side computation") {
    val vecs = emb.select("vec_id", "embedding").as[(Long, Array[Float])].collect().toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      d / math.sqrt(na * nb)
    }
    val expected = (for (q <- vecs.keys if q < 5) yield q -> vecs.keys
      .filter(_ != q)
      .map(n => (n, cos(vecs(q), vecs(n))))
      .toSeq.sortBy { case (n, s) => (-s, n) }.take(3).map(_._1).toList).toMap
    val got = Similarity.topKExact(emb, emb.filter(col("vec_id") < 5), k = 3)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).map { case (q, rs) => q -> rs.sortBy(_._2).map(_._3).toList }
    assert(got === expected)
  }

  test("multi-table LSH top-k achieves reasonable recall against exact") {
    val exact = Similarity.topKExact(emb, emb.filter(col("vec_id") < 20), k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.topKLsh(emb, emb.filter(col("vec_id") < 20), k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall > 0.4, s"LSH recall $recall too low")
    assert(approx.nonEmpty)
  }

  test("IVF top-k achieves reasonable recall against exact") {
    val exact = Similarity.topKExact(emb, emb.filter(col("vec_id") < 20), k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = IvfIndex.topK(emb, emb.filter(col("vec_id") < 20), k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall > 0.4, s"IVF recall $recall too low")
  }

  test("IVF recall floor holds on a zorder-clustered corpus (reservoir fit sample)") {
    // The engine's own encouraged layout: Z-order-cluster the embeddings by
    // their leading components, so rows within a partition are locally
    // CORRELATED — the adversarial case for a partition-head fit sample
    // (round-4 VERDICT item 3: heads of a clustered layout are one tight
    // region of the space and the quantizer collapses). The reservoir
    // sample must keep recall at the oracle's floor on this layout too.
    val dir = java.nio.file.Files.createTempDirectory("graft_zembed").toString
    graft.cluster.ClusterWrite.zorder(emb,
        Seq(element_at(col("embedding"), 1), element_at(col("embedding"), 2)),
        numPartitions = Some(8))
      .write.mode("overwrite").parquet(dir)
    val clustered = spark.read.parquet(dir)
    val exact = Similarity.topKExact(clustered, clustered.filter(col("vec_id") < 20), k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = IvfIndex.topK(clustered, clustered.filter(col("vec_id") < 20), k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= graft.queries.VectorQueries.IvfMinRecall,
      s"IVF recall $recall on a zorder-clustered corpus fell below the oracle floor")
  }

  test("LSH bucketing uses dimensions past 64 via derived dims (ADVICE r1)") {
    // Vectors identical on dims 0..63, opposite on the tail: with the old
    // hard-coded dims=64 they hashed to identical buckets in every table.
    val head = Array.tabulate(64)(i => (i % 7 - 3).toFloat)
    val tailA = Array.tabulate(32)(i => (i % 5 - 2).toFloat)
    val v1 = head ++ tailA
    val v2 = head ++ tailA.map(x => -x)
    val df = Seq((1L, v1), (2L, v2)).toDF("vec_id", "embedding")
    val b = df.select(graft.functions.LshBuckets
        .lshBuckets(col("embedding"), 8, 6, 96).as("b"))
      .as[Seq[Long]].collect()
    assert(b(0) !== b(1), "tail dims must influence buckets when dims covers them")
    // derived-dims default equals the explicit dims call end-to-end
    val corpus = (0L until 40L).map(i =>
      (i, Array.tabulate(96)(j => math.sin(i * 97.0 + j).toFloat))).toDF("vec_id", "embedding")
    val qs = corpus.filter(col("vec_id") < 5)
    val derived = Similarity.topKLsh(corpus, qs, k = 3)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    val explicit = Similarity.topKLsh(corpus, qs, k = 3, dims = 96)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    assert(derived === explicit)
  }

  test("LSH-gated near-dup finds every planted near-duplicate (recall 1 here)") {
    // Planted pairs: tiny perturbations of base vectors (cosine ≈ 0.999) —
    // genuinely-near pairs, which multi-table LSH must catch; the rest of
    // the corpus is pseudo-random noise (cosine ≈ 0).
    val rnd = new scala.util.Random(11)
    def vec(): Array[Float] = Array.fill(64)(rnd.nextGaussian().toFloat)
    def perturb(v: Array[Float]): Array[Float] = v.map(x => x + 0.01f * rnd.nextGaussian().toFloat)
    val bases = (0 until 5).map(_ => vec())
    val rows = bases.zipWithIndex.flatMap { case (v, i) =>
      Seq((i * 2L, v), (i * 2L + 1, perturb(v))) } ++
      (10 until 80).map(i => (i.toLong, vec()))
    val corpus = rows.toDF("vec_id", "embedding")
    val exact = Similarity.nearDupPairs(corpus, threshold = 0.95)
      .as[(Long, Long)].collect().toSet
    val gated = Similarity.nearDupPairsLsh(corpus, threshold = 0.95)
      .as[(Long, Long)].collect().toSet
    assert(exact.size >= 5, s"fixture must plant near-dups, got $exact")
    assert(gated === exact) // subset by construction; equality = full recall
  }

  test("int8 quantization: bounded round-trip error, code range, zero vector") {
    val rows = emb.limit(100)
      .select(col("embedding"),
        Similarity.quantizeInt8(col("embedding")).as("q"),
        Similarity.dequantizeInt8(Similarity.quantizeInt8(col("embedding"))).as("deq"))
      .as[(Seq[Float], (Float, Seq[Byte]), Seq[Float])].collect()
    rows.foreach { case (orig, (scale, codes), deq) =>
      assert(codes.forall(c => c >= -127 && c <= 127))
      // round-to-nearest: per-element error at most half a quantization step
      orig.zip(deq).foreach { case (o, d) =>
        assert(math.abs(o - d) <= scale / 2 + 1e-6, s"error ${math.abs(o - d)} vs step $scale")
      }
    }
    // all-zero vector: scale 0, zero codes, zero round-trip
    val z = Seq(Seq.fill(8)(0.0f)).toDF("embedding")
      .select(Similarity.quantizeInt8(col("embedding")).as("q"),
        Similarity.dequantizeInt8(Similarity.quantizeInt8(col("embedding"))).as("deq"))
      .as[((Float, Seq[Byte]), Seq[Float])].collect().head
    assert(z._1._1 === 0.0f && z._1._2.forall(_ === 0) && z._2.forall(_ === 0.0f))
  }

  test("near-dup pairs is symmetric-free (a < b) and thresholded") {
    val pairs = Similarity.nearDupPairs(emb, threshold = 0.8)
      .as[(Long, Long)].collect()
    pairs.foreach { case (a, b) => assert(a < b) }
  }

  test("semantic dedup with one cell equals exact global dedup; planted " +
      "near-dup clusters keep exactly their min ids") {
    // planted corpus: vectors 0/1/2 are tiny perturbations of one base
    // (cosine ≈ 1), 10/11 of another, 20 unrelated — two duplicate
    // components plus a singleton
    val rnd = new scala.util.Random(5)
    def perturb(base: Array[Float], eps: Float): Seq[Float] =
      base.map(x => x + eps * rnd.nextFloat())
    val baseA = Array.fill(16)(rnd.nextFloat() + 0.5f)
    val baseB = Array.fill(16)(rnd.nextFloat() - 1.5f)
    val baseC = Array.tabulate(16)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val docs = Seq(
      0L -> perturb(baseA, 0.001f), 1L -> perturb(baseA, 0.001f),
      2L -> perturb(baseA, 0.001f),
      10L -> perturb(baseB, 0.001f), 11L -> perturb(baseB, 0.001f),
      20L -> baseC.toSeq
    ).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    // nCells = 1: within-cell == all-pairs, so the result must equal the
    // brute-force composition exactly
    val kept1 = Similarity.semanticDedupKeep(docs, threshold = 0.95, nCells = 1)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(kept1 === Seq(0L, 10L, 20L),
      s"one-cell semantic dedup must keep min ids per component: $kept1")
    // multi-cell on the REAL corpus: kept+dropped partitions, no two kept
    // vectors are within-cell near-dups, and cell-pair recall vs brute
    // force clears the query's floor
    val assigned = IvfIndex.build(emb, 16)
      .assigned
    val cellPairs = Similarity.withinCellPairs(assigned, 0.95)
      .as[(Long, Long)].collect().toSet
    val exactPairs = Similarity.nearDupPairs(emb, 0.95)
      .as[(Long, Long)].collect().toSet
    assert(cellPairs.subsetOf(exactPairs),
      "cell-gated pairs must be a subset of the exact pairs")
    if (exactPairs.nonEmpty)
      assert(cellPairs.size.toDouble / exactPairs.size >=
        graft.queries.VectorQueries.SemDedupPairRecall)
    val kept = Similarity.semanticDedupKeep(emb, threshold = 0.95)
      .select("vec_id").as[Long].collect().toSet
    val dropped = emb.select("vec_id").as[Long].collect().toSet -- kept
    cellPairs.foreach { case (a, b) =>
      assert(!(kept(a) && kept(b)), s"kept near-dup pair ($a, $b)")
    }
    dropped.foreach { id =>
      assert(cellPairs.exists(p => p._1 == id || p._2 == id),
        s"doc $id dropped without a witnessing near-dup pair")
    }
  }
}
