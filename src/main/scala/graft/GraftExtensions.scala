package graft

import org.apache.spark.sql.{GraftInternal, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType
import graft.functions._

/** SQL surface for the engine's custom expressions.
  *
  * Two registration paths, one function list:
  *   - `spark.sql.extensions=graft.GraftExtensions` at session build
  *     (the `SparkSessionExtensions` path for clusters/spark-submit);
  *   - `GraftExtensions.register(spark)` on a live session.
  *
  * After either, the expressions are plain SQL:
  * {{{ SELECT murmur2(key), fingerprint64(text), vec_cosine(a, b) ... }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder))
    }
}

object GraftExtensions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** name -> builder for every registered function. */
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "murmur2" -> { args => Murmur2Expression(args.head) },
    "fingerprint64" -> { args => Fingerprint64Expression(args.head) },
    "lang_id" -> { args => LangIdExpression(args.head) },
    "simhash64" -> { args => SimHash64Expression(args.head) },
    "minhash" -> { args =>
      MinHashExpression(args.head, intArg(args(1), "minhash k")) },
    "minhash_bands" -> { args =>
      MinHashBandsExpression(args.head,
        intArg(args(1), "minhash k"), intArg(args(2), "bands")) },
    "char_shingles" -> { args =>
      CharShinglesExpression(args.head, intArg(args(1), "shingle size")) },
    "word_shingles" -> { args =>
      WordShinglesExpression(args.head, intArg(args(1), "shingle size")) },
    "vec_dot" -> { args => DotProductExpression(args.head, args(1)) },
    "vec_cosine" -> { args => CosineExpression(args.head, args(1)) },
    "srp_bucket" -> { args =>
      SrpBucketExpression(args.head, intArg(args(1), "nBits")) },
    "sorted_jaccard" -> { args => SortedJaccardExpression(args.head, args(1)) },
    "sorted_absent" -> { args => SortedAbsentExpression(args.head, args(1)) },
    "zvalue" -> { args =>
      ZValueExpression(args.head, args(1), intArg(args(2), "zvalue bits")) },
    // deterministic sketch suite — the aggregates return the raw sketch
    // (BinaryType); the analyzer wraps AggregateFunctions automatically
    "hll_sketch" -> { args =>
      HllSketchAgg(args.head, intArg(args(1), "hll p")) },
    "hll_merge" -> { args =>
      HllMergeAgg(args.head, intArg(args(1), "hll p")) },
    "hll_estimate" -> { args =>
      HllEstimate(args.head, intArg(args(1), "hll p")) },
    "hll_union" -> { args => HllUnion(args.head, args(1)) },
    "bloom_agg" -> { args =>
      BloomAgg(args.head, intArg(args(1), "bloom mBits"),
        intArg(args(2), "bloom k")) },
    "bloom_contains" -> { args =>
      BloomContainsExpr(args.head, args(1), intArg(args(2), "bloom k")) },
    "cms_agg" -> { args =>
      CmsAgg(args.head, intArg(args(1), "cms depth"),
        intArg(args(2), "cms width")) },
    "cms_estimate" -> { args =>
      CmsEstimateExpr(args.head, args(1),
        intArg(args(2), "cms depth"), intArg(args(3), "cms width")) })
  // Composite Column functions (tokenCount, qualityScore, ...) are NOT
  // registered here: in Spark 4 the Column→Expression conversion yields an
  // unresolved ColumnNode wrapper that a function-registry builder cannot
  // return (builders must produce resolvable expression trees). SQL users
  // reach those semantics through the oracle-checked queries/views instead;
  // only dedicated Catalyst expressions get SQL names.

  /** Register every function on a live session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      GraftInternal.registerFunction(spark, name, builder)
    }
}
