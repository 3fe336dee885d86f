package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{DsirFunctions, TextFunctions => T}

/** DSIR — Data Selection via Importance Resampling [Xie et al., NeurIPS
  * 2023, arXiv:2302.03169]: select raw-corpus documents that look like a
  * target distribution (Wikipedia, curated text, a domain) by importance
  * weighting in a hashed-n-gram feature space.
  *
  * The published recipe, re-expressed Spark-first:
  *
  *   1. Features: unigrams + bigrams of the lowercased whitespace
  *      tokenization, hashed into `nBuckets` buckets (FNV-1a 64 mod B).
  *   2. Fit bag-of-words models of the target and raw distributions over
  *      buckets — here ONE aggregation over the gram stream producing
  *      `(bucket, rawCount, targetCount)`, i.e. a single map-side-combined
  *      shuffle of ≤ B rows per partition; the collected model is B rows
  *      (bounded, driver-safe), add-one smoothed.
  *   3. Per-document log importance weight
  *      `log w(d) = Σ_grams λ(bucket(g))` with
  *      `λ(b) = log p_target(b) − log p_raw(b)` — a row-local codegen'd
  *      fold ([[graft.functions.DsirFunctions.bucketLogSum]], table as a
  *      plan reference object, O(1) plan size in B) on the corpus scan: no
  *      shuffle, no join, the 100 TB path is one pass.
  *   4. Gumbel top-k resampling: keep the k documents maximizing
  *      `log w(d) + g(d)` with `g = −log(−log u)` and `u` the
  *      deterministic MINSTD hash unit of the id
  *      ([[Sampling.hashUnit]]) — sampling without replacement from the
  *      softmax of weights (the Gumbel-max trick), reproducible across
  *      runs, engines, and task retries because the noise is a pure
  *      function of the id. Selection is `orderBy(score).limit(k)` —
  *      Spark's TakeOrdered, per-partition top-k then a k-row driver
  *      merge, never a global sort.
  *
  * `nBuckets` must be a power of two: the oracle replays the bucket id as
  * the unsigned FNV value mod B in HUGEINT SQL, and signed-vs-unsigned
  * residues agree exactly when B divides 2^64.
  */
object Dsir {

  /** Fitted importance model: per-bucket λ = log p_target − log p_raw
    * (add-one smoothed), plus the gram totals it was fitted on. */
  case class Model(
      nBuckets: Int,
      lambda: Array[Double],
      rawGrams: Long,
      targetGrams: Long)

  /** Unigrams ++ adjacent bigrams ("w1 w2") of the lowercased whitespace
    * tokens, in document order (the fold order of the weight) — the
    * DECLARATIVE reference spelling of the gram stream. [[buckets]] fuses
    * this + FNV + mod into one codegen'd expression; the spec pins the
    * two paths equal. Empty tokens are dropped BEFORE bigram formation:
    * `split` keeps the empty fragments that leading/trailing non-space
    * whitespace produces (trim strips spaces only), and without the
    * filter those would hash a meaningless '' gram — and diverge from
    * DuckDB, whose `string_split_regex('')` yields [''] where Spark's
    * tokens('') yields []. */
  def grams(text: Column): Column = {
    val t = filter(T.tokens(lower(text)), x => x =!= lit(""))
    val bigrams = when(size(t) < 2, array().cast("array<string>"))
      .otherwise(zip_with(
        slice(t, lit(1), size(t) - 1),
        slice(t, lit(2), size(t) - 1),
        (a, b) => concat(a, lit(" "), b)))
    concat(t, bigrams)
  }

  /** Hashed-gram bucket ids (`array<int>`): FNV-1a 64 of each gram mod
    * `nBuckets` (power of two — see class doc), as ONE codegen'd pass —
    * Spark's higher-order functions (`transform`/`zip_with`) are
    * CodegenFallback and would drop the scoring projection out of
    * whole-stage codegen. */
  def buckets(text: Column, nBuckets: Int): Column = {
    require(nBuckets > 0 && Integer.bitCount(nBuckets) == 1,
      s"nBuckets must be a power of two for engine-agnostic modulo, got $nBuckets")
    DsirFunctions.gramBuckets(text, nBuckets)
  }

  /** [[buckets]] spelled with built-in higher-order functions — kept for
    * the equivalence spec only (CodegenFallback, not the hot path). */
  private[graft] def bucketsDeclarative(text: Column, nBuckets: Int): Column =
    transform(grams(text),
      g => pmod(T.fingerprint64(g), lit(nBuckets.toLong)).cast("int"))

  /** Fit λ from one corpus pass: `target` marks the rows whose grams form
    * the target distribution (e.g. `col("lang") === "en"` or a
    * quality-classifier verdict); all rows form the raw distribution. */
  def fit(
      df: DataFrame,
      text: Column,
      target: Column,
      nBuckets: Int = 256): Model = {
    // coalesce inside the sum: a null target (e.g. null lang under
    // lang === "en") must count as 0, not null out the whole bucket's
    // aggregate — and the oracle's CASE ... ELSE 0 does the same
    val rows = df
      .select(explode(buckets(text, nBuckets)).as("b"),
        coalesce(target.cast("int"), lit(0)).as("t"))
      .groupBy("b")
      .agg(count(lit(1)).as("raw"), sum(col("t")).cast("long").as("tgt"))
      .collect()
    val raw = new Array[Long](nBuckets)
    val tgt = new Array[Long](nBuckets)
    rows.foreach { r =>
      val b = r.getInt(0)
      raw(b) = r.getLong(1)
      tgt(b) = r.getLong(2)
    }
    val rTot = raw.sum
    val tTot = tgt.sum
    val lam = Array.tabulate(nBuckets) { b =>
      math.log((tgt(b) + 1.0) / (tTot + nBuckets.toDouble)) -
        math.log((raw(b) + 1.0) / (rTot + nBuckets.toDouble))
    }
    Model(nBuckets, lam, rTot, tTot)
  }

  /** Per-document log importance weight — a row-local codegen'd fold, no
    * shuffle (empty text folds to 0.0). */
  def logWeight(model: Model, text: Column): Column =
    DsirFunctions.bucketLogSum(buckets(text, model.nBuckets), model.lambda)

  /** Deterministic per-id Gumbel noise `−log(−log u)`, `u = hashUnit(id)`
    * — the Gumbel-max trick's noise as a pure function of the id. */
  def gumbelNoise(id: Column): Column =
    -log(-log(Sampling.hashUnit(id)))

  /** Gumbel top-k importance resample: the k rows maximizing
    * `round(log w + gumbel, 6)` (6-dp rounding BEFORE ranking so any two
    * engines rank identical doubles; ties break to the lower id). Adds the
    * rounded score as `score`. */
  def resample(
      df: DataFrame,
      id: Column,
      text: Column,
      model: Model,
      k: Int): DataFrame =
    df.withColumn("score", round(logWeight(model, text) + gumbelNoise(id), 6))
      .orderBy(col("score").desc, id)
      .limit(k)
}
