package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics checks for queries whose oracle is rows-only. */
class QueriesSpec extends SparkSpec {
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("approx_count_distinct within 5% of exact per group") {
    val approx = EventQueries.queries("agg_approx_distinct")(spark, sf)
      .as[(String, Long)].collect().toMap
    val exact = Tables.events(spark, sf)
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("n"))
      .as[(String, Long)].collect().toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n) <= math.max(1L, (n * 0.05).toLong),
        s"$k: approx ${approx(k)} vs exact $n")
    }
  }

  test("rolling fingerprint is stable and edit-sensitive") {
    val fp = TextQueries.queries("text_rolling_fp")(spark, sf)
      .as[(Long, Long)].collect().toMap
    val fp2 = TextQueries.queries("text_rolling_fp")(spark, sf)
      .as[(Long, Long)].collect().toMap
    assert(fp === fp2)
    assert(fp.values.toSet.size > 1)
  }

  test("LSH ANN query returns ranked rows per query vector") {
    val rows = VectorQueries.queries("ann_topk_lsh")(spark, sf)
      .as[(Long, Int, Long)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted.toSeq === (1 to rs.length).toSeq)
    }
  }
}
