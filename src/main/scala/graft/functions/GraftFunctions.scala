package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL registration for the engine's native expressions, so `spark.sql`
  * users get them as first-class functions:
  *
  *  - `cosine_similarity(array<float>, array<float>) -> double`
  *  - `simhash32(array<string>) -> bigint`
  *  - `rolling_hash(string, k) -> array<bigint>`
  *  - `minhash_sig(array<string> tokens, w, numHashes) -> array<bigint>`
  *  - `lsh_buckets(array<float>, tables, planes, dims) -> array<bigint>`
  *
  * Two entry points: [[GraftExtensions]] for
  * `SparkSession.builder.withExtensions` / the
  * `spark.sql.extensions` conf (cluster deployment), and
  * [[GraftFunctions.register]] for an already-built session (tests, REPL).
  * The sketch UDAFs (`kll_quantiles`, `heavy_hitters`) live on the
  * register() path only — UDAF registration needs a session's udf registry,
  * which the extensions injector doesn't expose. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.descriptors.foreach(e.injectFunction)
    e.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    e.injectOptimizerRule(_ => graft.plans.RewriteRankFilterToTopK)
    // SELECT COUNT(*)/MIN/MAX/COUNT(col) over a graft relation answered
    // from footer-stats sidecars — no scan, no job (honest fallback:
    // any doubt leaves the plan untouched)
    e.injectOptimizerRule(_ => graft.plans.MetaAggregateRewrite)
    // SQL DML over commit-log tables (INSERT/DELETE/UPDATE/MERGE via
    // spark.sql) — main-batch resolution rule, deliberately BEFORE Spark's
    // post-hoc DataSourceAnalysis would convert an INSERT over the graft
    // HadoopFsRelation into a raw file write behind the commit log
    e.injectResolutionRule(_ => graft.sql.GraftDmlRule)
    // v2-catalog reads ([[graft.sql.GraftSpaceCatalog]] names) fall back
    // to the SAME v1 HadoopFsRelation/GraftFileIndex scan — Delta's
    // DeltaTableV2 → v1-relation conversion; write commands keep their v2
    // shape and execute through the table's V1Write
    e.injectResolutionRule(_ => graft.sql.GraftV2ScanConversion)
    // maintenance SQL (VACUUM / OPTIMIZE [WHERE] … ZORDER BY / DESCRIBE
    // HISTORY, by path or catalog name) via the standard delegating-parser
    // pattern — graft statements are tried first, everything else reaches
    // Spark's parser verbatim (then `FROM t VERSION/TIMESTAMP AS OF` on
    // graft names is claimed at parse time: Spark's ResolveRelations
    // throws on v1 time travel before injected resolution rules run)
    e.injectParser((session, delegate) =>
      new graft.sql.GraftSqlParser(session, delegate))
  }
}

object GraftFunctions {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name expects a literal integer, got $other")
  }

  val descriptors: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))),
    (FunctionIdentifier("simhash32"),
      new ExpressionInfo(classOf[SimHash].getName, "simhash32"),
      (args: Seq[Expression]) => SimHash(args.head)),
    (FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (args: Seq[Expression]) => RollingHash(args(0), intArg(args(1), "rolling_hash k"))),
    (FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) => MinHashSig(args(0),
        intArg(args(1), "minhash_sig w"), intArg(args(2), "minhash_sig numHashes"))),
    (FunctionIdentifier("lsh_buckets"),
      new ExpressionInfo(classOf[LshBuckets].getName, "lsh_buckets"),
      (args: Seq[Expression]) => LshBuckets(args(0), intArg(args(1), "lsh_buckets tables"),
        intArg(args(2), "lsh_buckets planes"), intArg(args(3), "lsh_buckets dims"))),
    (FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (args: Seq[Expression]) => ShingleHashes(args(0), intArg(args(1), "shingle_hashes w"))),
  )

  /** Register into an existing session's function registry. Also registers
    * the mergeable-sketch UDAFs (udaf-wrapped typed Aggregators, usable from
    * `spark.sql`):
    *
    *  - `kll_quantiles(double) -> array<double>` (p50/p95/p99 by default)
    *  - `heavy_hitters(string) -> map<string, bigint>` (k = 200)
    */
  def register(spark: SparkSession): Unit = {
    val registry: FunctionRegistry = spark.sessionState.functionRegistry
    descriptors.foreach { case (ident, info, builder) =>
      registry.registerFunction(ident, info, builder)
    }
    spark.udf.register("kll_quantiles", org.apache.spark.sql.functions.udaf(
      new graft.ext.KllQuantileAggregator(512, Seq(0.5, 0.95, 0.99)),
      org.apache.spark.sql.Encoders.scalaDouble))
    spark.udf.register("heavy_hitters", org.apache.spark.sql.functions.udaf(
      new graft.ext.HeavyHittersAggregator(200),
      org.apache.spark.sql.Encoders.STRING))
    ()
  }
}
