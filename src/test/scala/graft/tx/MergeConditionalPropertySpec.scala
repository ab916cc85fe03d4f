package graft.tx

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Property-style routing check for [[CommitLog.mergeConditionalDv]]:
  * across seeded random tables, sources, and clause thresholds, the
  * engine's final snapshot must equal a PLAIN-SCALA reference
  * implementation of Delta's routing semantics (first-match-wins matched
  * clauses, conditional insert, first-match-wins by-source clauses) —
  * computed over collected rows with no Spark involved, so the two
  * cannot share a bug. Merge-on-read contract rides along: every
  * pre-merge file must survive by reference in every iteration. */
object MergeConditionalPropertySpec {
  /** Top-level so Spark can synthesize an Encoder (inner classes can't). */
  case class R(id: Long, value: Double)
}

class MergeConditionalPropertySpec extends SparkSpec {
  import spark.implicits._
  import MergeConditionalPropertySpec.R

  /** The reference routing, straight from the contract's prose. */
  private def reference(target: Seq[R], source: Seq[R],
      delAbove: Double, updBelow: Double, insAbove: Double,
      bySrcDelAbove: Double): Seq[R] = {
    val srcByKey = source.map(r => r.id -> r).toMap
    val kept = target.flatMap { t =>
      srcByKey.get(t.id) match {
        case Some(s) =>
          // first-match-wins: DELETE when source value high, else partial
          // UPDATE when target value low, else untouched
          if (s.value > delAbove) None
          else if (t.value < updBelow) Some(R(t.id, s.value + 7.0))
          else Some(t)
        case None =>
          // by-source, first-match-wins: DELETE when high, else UPDATE
          // (value doubles) when below the update threshold, else
          // untouched
          if (t.value > bySrcDelAbove) None
          else if (t.value < updBelow) Some(R(t.id, t.value * 2.0))
          else Some(t)
      }
    }
    val targetKeys = target.map(_.id).toSet
    val inserts = source.filter(s => !targetKeys(s.id) && s.value > insAbove)
    kept ++ inserts
  }

  test("random routing across 8 seeded scenarios matches the plain-Scala reference") {
    (1 to 8).foreach { seed =>
      val rnd = new scala.util.Random(seed * 7919)
      val target = (0L until 30L).map(i => R(i, math.floor(rnd.nextDouble() * 100) / 1.0))
      val source = rnd.shuffle((10L until 40L).toList).take(18)
        .map(i => R(i, math.floor(rnd.nextDouble() * 100) / 1.0))
      val (delAbove, updBelow, insAbove, bySrcDelAbove) =
        (40 + rnd.nextInt(40), 20 + rnd.nextInt(40), rnd.nextInt(60), 60 + rnd.nextInt(30))

      val t = tmpDir(s"mrgprop_$seed"); new java.io.File(t).delete()
      CommitLog.commit(target.toDF().repartition(3), t, "append")
      val m1 = CommitLog.manifest(t, 1L).files

      CommitLog.mergeConditionalDv(spark, t, source.toDF(), Seq("id"),
        matched = Seq(
          CommitLog.MatchedClause(Some(col("__src_value") > delAbove), None),
          CommitLog.MatchedClause(Some(col("value") < updBelow),
            Some(Map("value" -> (col("__src_value") + 7.0))))),
        insert = Some(Some(col("value") > insAbove)),
        bySource = Seq(
          CommitLog.MatchedClause(Some(col("value") > bySrcDelAbove), None),
          CommitLog.MatchedClause(Some(col("value") < updBelow),
            Some(Map("value" -> (col("value") * 2.0))))))

      val got = CommitLog.read(spark, t).as[R].collect().toSeq.sortBy(r => (r.id, r.value))
      val want = reference(target, source, delAbove, updBelow, insAbove, bySrcDelAbove)
        .sortBy(r => (r.id, r.value))
      assert(got === want,
        s"seed $seed (del>$delAbove upd<$updBelow ins>$insAbove bysrc>$bySrcDelAbove)")
      // merge-on-read: no pre-merge file rewritten, in any scenario
      val mN = CommitLog.manifest(t, CommitLog.latestVersion(t).get).files
      assert(m1.forall(mN.contains), s"seed $seed rewrote files")
    }
  }
}
