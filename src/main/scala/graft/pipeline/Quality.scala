package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Gopher-style document quality rules [Rae et al., "Scaling Language
  * Models: Methods, Analysis & Insights from Training Gopher", 2021,
  * Appendix A] — the published heuristic filter set LLM corpora are
  * cleaned with.
  *
  * Every signal is a higher-order array function over the token list —
  * one codegen'd pass on the scan, row-local, no shuffle — which also
  * means the SAME operator runs unchanged on a streaming DataFrame
  * (spec-asserted batch≡streaming). Thresholds compare the 6-dp ROUNDED
  * ratios so any two engines (or a replay) decide boundaries on identical
  * doubles.
  */
object Quality {

  /** Stopword set for the presence rule (tiny on purpose — a quality
    * signal, not NLP). */
  val GopherStopwords: Seq[String] = Seq("the", "a", "of", "and", "in", "to", "is")

  /** The pass/fail verdict as ONE row-local boolean column over `text` —
    * the filter form of [[gopherSignals]] for pipelines that need only
    * the verdict: no join, no second scan, stays inside the scan's
    * codegen span. Boundary decisions are IDENTICAL to [[gopherSignals]]
    * (same expressions, same 6-dp rounding; spec-pinned equal). */
  def gopherPasses(
      text: Column,
      minTokens: Int = 50,
      maxTokens: Int = 100000,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      minAlphaFrac: Double = 0.8,
      minStopwords: Int = 2,
      stopwords: Seq[String] = GopherStopwords): Column = {
    val toks = TextFunctions.tokens(text)
    val n = size(toks)
    val meanLen = when(n === 0, lit(null).cast("double")).otherwise(
      round(aggregate(toks, lit(0L), (acc, x) => acc + length(x))
        .cast("double") / n.cast("double"), 6))
    val alphaFrac = when(n === 0, lit(null).cast("double")).otherwise(
      round(size(filter(toks, x => x.rlike("[a-z]"))).cast("double") /
        n.cast("double"), 6))
    val nStop = size(array_intersect(array_distinct(toks),
      array(stopwords.map(lit): _*)))
    coalesce(
      n.between(minTokens, maxTokens) &&
        meanLen.between(minMeanWordLen, maxMeanWordLen) &&
        alphaFrac >= minAlphaFrac &&
        nStop >= minStopwords, lit(false))
  }

  /** Per-document signals + pass flag: (id, n_tokens, mean_word_len,
    * alpha_frac, n_stopwords, passes).
    *
    * Defaults are the PUBLISHED Gopher thresholds (50–100,000 words,
    * mean word length 3–10, ≥ 80% alphabetic, ≥ 2 stopwords) — callers
    * filtering a corpus with atypical document lengths (e.g. the test
    * corpus's 10–99-token docs) must override explicitly rather than
    * inherit demo-tuned numbers from the library. */
  def gopherSignals(
      df: DataFrame,
      id: Column,
      text: Column,
      minTokens: Int = 50,
      maxTokens: Int = 100000,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      minAlphaFrac: Double = 0.8,
      minStopwords: Int = 2,
      stopwords: Seq[String] = GopherStopwords): DataFrame =
    df.select(id.as("id"), TextFunctions.tokens(text).as("toks"))
      .select(col("id"), col("toks"), size(col("toks")).as("n_tokens"))
      .select(
        col("id"), col("n_tokens"),
        // zero-token docs get null ratios (never NaN — 0/0 would poison
        // downstream comparisons nondeterministically across engines) and
        // always fail `passes` via the coalesce below
        when(col("n_tokens") === 0, lit(null).cast("double")).otherwise(
          round(aggregate(col("toks"), lit(0L), (acc, x) => acc + length(x))
            .cast("double") / col("n_tokens").cast("double"), 6))
          .as("mean_word_len"),
        when(col("n_tokens") === 0, lit(null).cast("double")).otherwise(
          round(size(filter(col("toks"), x => x.rlike("[a-z]"))).cast("double") /
            col("n_tokens").cast("double"), 6)).as("alpha_frac"),
        size(array_intersect(array_distinct(col("toks")),
          array(stopwords.map(lit): _*))).as("n_stopwords"))
      .withColumn("passes", coalesce(
        col("n_tokens").between(minTokens, maxTokens) &&
          col("mean_word_len").between(minMeanWordLen, maxMeanWordLen) &&
          col("alpha_frac") >= minAlphaFrac &&
          col("n_stopwords") >= minStopwords, lit(false)))
}
