package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{LangModel, LangProfileFunctions}

/** Cavnar–Trenkle n-gram-based text categorization [Cavnar & Trenkle,
  * "N-Gram-Based Text Categorization", SDAIR 1994] as the language
  * identifier: fit per-language character-n-gram RANK profiles from a
  * labeled corpus, classify by the out-of-place distance between a
  * document's own rank profile and each language's.
  *
  * This replaces guessing with a published, trainable method while
  * staying fully oracle-able: ranking is pinned deterministic (count
  * descending, gram ascending in binary order) and the distance is
  * integer arithmetic — no float contract needed.
  *
  * Scale shape:
  *   - [[fit]] is ONE map-side-combined count aggregation over the corpus
  *     n-gram stream ([[LangProfileFunctions.charNgrams]], a one-pass
  *     codegen expression) plus a per-language top-`topK` window. The
  *     window partitions by language — parallelism is bounded by the
  *     number of languages, fine for real label sets (≤ hundreds), and
  *     the aggregated (lang, gram) table it sorts is bounded by
  *     |langs| × charset^n, NOT corpus size. The collected model is
  *     |langs| × topK rows — driver-safe.
  *   - [[classify]] is row-local: the profile tables ride inside the
  *     expression as one plan reference object, the generated code is a
  *     static call per row, whole-stage codegen intact, no shuffle — the
  *     100 TB path is one pass.
  *
  * Normalization (shared by both sides and the oracle): lowercase, trim,
  * every whitespace run → `_`, then pad with leading/trailing `_` —
  * Cavnar–Trenkle's word-boundary marker. */
object LangProfile {

  /** The normalized character stream both fit and classify see. */
  def norm(text: Column): Column =
    concat(lit("_"), regexp_replace(lower(trim(text)), "\\s+", "_"), lit("_"))

  /** Fit per-language rank profiles: the `topK` most frequent `n`-grams
    * of each language's normalized text, ranked 1..topK by (count desc,
    * gram asc in binary order). Runs 1 Spark job at construction (the
    * profile collect). Languages come out sorted ascending — the
    * classifier's tie-break order.
    *
    * Fitted-langs-only contract: the model's candidate set is the
    * languages that yielded AT LEAST ONE n-gram (some doc with normalized
    * length ≥ n). A label whose docs are all sub-`n`-gram produces no
    * profile and can never be predicted — oracles must derive their
    * candidate set from the fitted profiles, not from the raw label
    * column ([[graft.queries.LangIdSql]] does). */
  def fit(
      df: DataFrame,
      text: Column,
      lang: Column,
      n: Int = 3,
      topK: Int = 300): LangModel = {
    val ranked = df
      .select(lang.as("lang"),
        explode(LangProfileFunctions.charNgrams(norm(text), n)).as("g"))
      .groupBy("lang", "g").agg(count(lit(1)).as("c"))
      .withColumn("r", row_number().over(
        Window.partitionBy(col("lang"))
          .orderBy(col("c").desc, col("g").asc)))
      .filter(col("r") <= topK)
      .select("lang", "g", "r")
      .collect()
    val byLang = ranked.groupBy(_.getString(0))
    val langs = byLang.keys.toArray.sorted
    val profiles = langs.map(l =>
      byLang(l).map(r => (r.getString(1), r.getInt(2))).toArray)
    new LangModel(n, topK, langs, profiles)
  }

  /** Predicted language of `text` under `model` (`"und"` when the text
    * yields no n-grams) — row-local, codegen'd. */
  def classify(model: LangModel, text: Column): Column =
    LangProfileFunctions.classify(norm(text), model)
}
