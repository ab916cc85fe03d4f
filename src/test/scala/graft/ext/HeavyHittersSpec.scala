package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Misra-Gries sketch: the frequency guarantee (every item above n/(k+1)
  * survives, weights underestimate by at most n/(k+1)), mergeability across
  * partitions, and the sketch-then-verify composition. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // Skewed corpus: item "hot-i" appears (10-i)*120 times (hot-0 → 1200),
  // plus 3000 singletons. n = 1200+1080+...+120 + 3000 = 9600.
  private def corpus: Seq[String] = {
    val hot = (0 until 10).flatMap(i => Seq.fill((10 - i) * 120)(s"hot-$i"))
    val noise = (0 until 3000).map(i => s"noise-$i")
    new scala.util.Random(3).shuffle(hot ++ noise)
  }

  test("every item above n/(k+1) survives, with bounded undercount") {
    val k = 50
    val data = corpus
    val n = data.size
    val sketch = data.toDF("t").repartition(8).as[String]
      .select(new HeavyHittersAggregator(k).toColumn.name("hh"))
      .collect().head
    val err = n.toDouble / (k + 1)
    val exact = data.groupBy(identity).map { case (i, xs) => i -> xs.size.toLong }
    exact.filter(_._2 > err).foreach { case (item, cnt) =>
      val w = sketch.getOrElse(item, fail(s"$item (count $cnt > $err) missing from sketch"))
      assert(w <= cnt, s"$item overcounted: $w > $cnt")
      assert(cnt - w <= err, s"$item undercounted beyond the bound: $cnt - $w > $err")
    }
    assert(sketch.size <= k)
  }

  test("sketch-then-verify equals the exact thresholded groupBy") {
    val data = corpus
    val toks = data.toDF("token").repartition(8)
    val cands = toks.as[String]
      .select(new HeavyHittersAggregator(50).toColumn.name("hh"))
      .select(explode(map_keys(col("hh"))).as("token"))
    val thresh = data.size / 50.0 // > n/(k+1) ⇒ candidate recall is 1
    val got = toks.join(broadcast(cands), "token")
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > thresh)
      .as[(String, Long)].collect().toSet
    val expect = data.groupBy(identity).map { case (i, xs) => i -> xs.size.toLong }
      .filter(_._2 > thresh).toSet
    assert(got === expect)
  }
}
