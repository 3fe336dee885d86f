package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** Trained discriminative quality filter — the fastText-classifier setup
  * used by the GPT-3/LLaMA data pipelines [Brown et al. 2020 §A;
  * Touvron et al. 2023]: label a seed set (positives from curated
  * sources, negatives from the raw crawl), train a linear model over
  * cheap row-local text features, score every document, keep the high
  * end. Completes the quality quartet next to the rule-based
  * [[Quality]] gates, the LM-perplexity tiers, and DSIR importance
  * weights — this one LEARNS its thresholds from provenance instead of
  * hand-tuning them.
  *
  * The model is a linear probability unit with a hard-sigmoid link,
  * p = clamp(0.25·(w·x) + 0.5, 0, 1), trained by full-batch gradient
  * descent on squared error — every operation is RATIONAL (no exp/log),
  * so the whole trainer is bit-deterministic and replays exactly in SQL
  * ([[graft.queries.QfilterSql]]):
  *
  *   - every quantization is the fixed-point form q_s(x) =
  *     floor(x·10^s + ½)/10^s — PURE IEEE primitives (multiply, add,
  *     floor, divide), so both engines compute the identical double by
  *     construction. Decimal `round` is deliberately NOT used here: the
  *     trainer rounds millions of intermediate doubles, and Spark's
  *     shortest-repr BigDecimal round and DuckDB's float-multiply round
  *     disagree on half-way boundary cases often enough to bite (one
  *     9-dp weight diverged at sf0.1 before this form);
  *   - features are q6 ratios in [0, 1] and per-row gradient terms are
  *     q6 (exact as DECIMAL(28,12), so gradient sums are
  *     order-independent);
  *   - the update w_j ← q9(w_j − lr·g_j/n) uses IEEE division, lr a
  *     power of two — bit-identical weights every iteration.
  *
  * 100 TB shape: FIT is `iters` map-side-combined global aggregates (7
  * decimal sums — partial rows per task, never data-scale; on a web
  * corpus you fit on a sampled frame and the math is unchanged). SCORE
  * is one row-local codegen'd projection — no joins, no shuffle, no
  * model table: the weights are 7 plan literals.
  */
object QualityClassifier {

  /** Feature count including the leading intercept. */
  val NumFeatures = 7

  final case class Model(weights: IndexedSeq[Double]) {
    require(weights.length == NumFeatures, s"need $NumFeatures weights")
  }

  /** Fixed-point quantization to `s` decimals: floor(x·10^s + ½)/10^s,
    * all IEEE primitive ops — the engine-identical form (see the object
    * doc). Spark's `floor` yields a long; the quotient re-promotes to
    * double exactly (|x·10^s| ≪ 2^53 for every trainer value). */
  def q(c: Column, s: Int): Column =
    floor(c * lit(math.pow(10, s)) + lit(0.5)).cast("double") / lit(math.pow(10, s))

  /** [[q]] on the driver — the same IEEE op sequence. */
  private def qd(d: Double, s: Int): Double =
    math.floor(d * math.pow(10, s) + 0.5) / math.pow(10, s)

  /** The fixed feature map over a text column: intercept + six q6
    * [0,1] ratios (length saturation, punctuation density, stopword
    * ratio, token density, uppercase ratio, digit ratio). The count
    * primitives are the oracle-proven [[T]] spellings. */
  def features(c: Column): Column = {
    val len = length(c).cast("double")
    val toks = T.tokenCount(c).cast("double")
    val puncts = T.punctCount(c).cast("double")
    val stops = T.stopwordCount(c, T.EnglishStopwords).cast("double")
    val uppers = (length(c) - length(regexp_replace(c, "[A-Z]", ""))).cast("double")
    val digits = (length(c) - length(regexp_replace(c, "[0-9]", ""))).cast("double")
    array(
      lit(1.0),
      q(least(len / 5000.0, lit(1.0)), 6),
      q(puncts / greatest(len, lit(1.0)), 6),
      q(stops / greatest(toks, lit(1.0)), 6),
      q(toks / greatest(len, lit(1.0)), 6),
      q(uppers / greatest(len, lit(1.0)), 6),
      q(digits / greatest(len, lit(1.0)), 6))
  }

  /** w·x as an unrolled left-associated sum — ascending feature order,
    * the exact fold the oracle spells out term by term. `getItem` (not
    * `element_at`): GetArrayItem over a literal ordinal collapses
    * against the [[features]] CreateArray in the optimizer
    * (SimplifyExtractValueOps), so the scoring projection carries the
    * six scalar ratios and NO array — `element_at` has no such rule and
    * its duplicated array tree trips a Janino codegen bug besides. */
  private def dotW(x: Column, w: IndexedSeq[Double]): Column =
    (0 until NumFeatures)
      .map(j => x.getItem(j) * lit(w(j)))
      .reduceLeft(_ + _)

  /** The hard-sigmoid score p = clamp(0.25·(w·x) + 0.5, 0, 1),
    * row-local, codegen'd, weights as plan literals. */
  def score(x: Column, model: Model): Column =
    least(greatest(dotW(x, model.weights) * 0.25 + 0.5, lit(0.0)), lit(1.0))

  /** Full-batch GD from w = 0: per iteration ONE aggregate of the 7
    * per-feature gradient sums (q6 terms through DECIMAL(28,12)) and
    * the count, then the driver update w_j ← q9(w_j − lr·g_j/n).
    * `x` must be the [[features]] array (or any 6-dp array of length
    * [[NumFeatures]] with x(0)=1); `y` the 0/1 label. */
  def fit(
      df: DataFrame,
      x: Column,
      y: Column,
      iters: Int = 30,
      lr: Double = 0.5): Model = {
    require(iters >= 0, s"iters=$iters")
    val f = df.select(x.as("x"), y.cast("double").as("y")).persist()
    try {
      var w: IndexedSeq[Double] = IndexedSeq.fill(NumFeatures)(0.0)
      for (_ <- 1 to iters) {
        // e projected ONCE (not inlined into all 7 sums: the duplicated
        // conditional tree trips codegen's subexpression elimination
        // into an uncompilable split — and recomputes 7x besides)
        val scored = f.select(col("x"),
          (score(col("x"), Model(w)) - col("y")).as("e"))
        val aggs = (0 until NumFeatures).map { j =>
          sum(q(col("e") * col("x").getItem(j), 6)
            .cast("decimal(28,12)")).as(s"g$j")
        } :+ count(lit(1)).as("n")
        val row = scored.agg(aggs.head, aggs.tail: _*).collect()(0)
        val n = row.getLong(NumFeatures)
        require(n > 0, "empty training frame")
        w = (0 until NumFeatures).map { j =>
          qd(w(j) - lr * (row.getDecimal(j).doubleValue / n), 9)
        }
      }
      Model(w)
    } finally f.unpersist()
  }
}
