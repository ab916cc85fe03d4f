package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Mergeable KLL/MRL quantile sketch: exactness below capacity, bounded
  * rank error at scale, merge algebra under Spark's partitioned execution
  * (round-2 VERDICT item 7). */
class KllQuantileSpec extends SparkSpec {
  import spark.implicits._

  private def rankOf(xs: Seq[Double], v: Double): (Long, Long) =
    (xs.count(_ < v).toLong, xs.count(_ <= v).toLong)

  test("below capacity the sketch is exact (no compaction ever fires)") {
    val xs = (1 to 300).map(_.toDouble)
    val got = spark.createDataset(xs).repartition(4)
      .select(new KllQuantileAggregator(512, Seq(0.25, 0.5, 0.95)).toColumn.name("q"))
      .as[Seq[Double]].collect().head
    // ceil-rank discrete quantiles of 1..300
    assert(got === Seq(75.0, 150.0, 285.0))
  }

  test("rank error stays within 2% on 100k values across 32 partitions") {
    val rnd = new scala.util.Random(7)
    val xs = Seq.fill(100000)(rnd.nextDouble() * 1000.0)
    val probs = Seq(0.1, 0.5, 0.9)
    val got = spark.createDataset(xs).repartition(32)
      .select(new KllQuantileAggregator(512, probs).toColumn.name("q"))
      .as[Seq[Double]].collect().head
    probs.zip(got).foreach { case (p, v) =>
      val (lt, le) = rankOf(xs, v)
      val target = p * xs.size
      assert(lt <= target + 0.02 * xs.size, s"p=$p: rank<($v)=$lt vs target $target")
      assert(le >= target - 0.02 * xs.size, s"p=$p: rank<=($v)=$le vs target $target")
    }
  }

  test("merge preserves exact total weight (n) and stays pure sketch algebra") {
    val agg = new KllQuantileAggregator(64, Seq(0.5))
    val rnd = new scala.util.Random(3)
    val a = (1 to 777).foldLeft(agg.zero)((b, _) => agg.reduce(b, rnd.nextDouble()))
    val b = (1 to 555).foldLeft(agg.zero)((b, _) => agg.reduce(b, rnd.nextDouble()))
    val m = agg.merge(a, b)
    def weight(s: KllSketch): Long =
      s.levels.zipWithIndex.map { case (l, h) => l.size.toLong << h }.sum
    assert(weight(a) === 777L && weight(b) === 555L && weight(m) === 1332L)
    assert(m.n === 1332L)
    // every level respects capacity after compaction
    assert(m.levels.forall(_.size < 64 * 2))
  }

  test("agg_quantile_sketch query: exact quantiles right, bracket property holds") {
    val rows = graft.queries.StarQueries.queries("agg_quantile_sketch")(
        spark, "/root/testdata/sf0.001")
      .as[(String, Double, Double, Boolean)].collect()
    assert(rows.nonEmpty)
    val exact = graft.queries.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_quantity, 0.5)").as("q50"))
      .as[(String, Double)].collect().toMap
    rows.foreach { case (rf, q50, _, ok) =>
      assert(q50 === exact(rf), s"$rf exact median")
      assert(ok, s"$rf sketch outside rank-error budget")
    }
  }
}
