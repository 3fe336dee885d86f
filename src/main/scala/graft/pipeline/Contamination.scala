package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/** Benchmark decontamination — flag training documents that share verbatim
  * word n-grams with an evaluation set, the standard guard against test-set
  * leakage in a pretraining corpus (GPT-3 used 13-grams; smaller corpora
  * use 5-8).
  *
  * Shape for 100 TB: the eval set is SMALL (benchmarks are thousands of
  * docs, not billions), so its distinct n-gram set broadcast-joins against
  * the corpus scan — the corpus is never shuffled, and each corpus document
  * contributes only its matched grams to the one aggregation shuffle
  * (hits are rare by construction, so that shuffle is near-empty). If the
  * eval side ever outgrew broadcast, dropping the hint degrades gracefully
  * to a hash join on the gram key.
  */
object Contamination {

  /** Per-document overlap report: (id, n_overlap) for every corpus doc
    * sharing at least one distinct word `n`-gram with `bench`, where
    * `n_overlap` counts the DISTINCT shared grams. Shingling is
    * [[TextFunctions.wordShingles]]: lowercase, whitespace tokens, distinct
    * n-grams (documents shorter than n tokens contribute their whole text
    * as one gram).
    */
  def overlapReport(
      corpus: DataFrame, corpusId: Column, corpusText: Column,
      bench: DataFrame, benchText: Column, n: Int): DataFrame = {
    val corpusGrams = corpus
      .select(corpusId.cast("long").as("id"),
        explode(T.wordShingles(corpusText, n)).as("g"))
    val benchGrams = bench
      .select(explode(T.wordShingles(benchText, n)).as("g"))
      .distinct()
    corpusGrams
      .join(broadcast(benchGrams), Seq("g"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_overlap")) // grams are distinct per doc already
  }

  /** Decontaminated corpus: drop every document whose overlap with `bench`
    * reaches `minOverlap` shared distinct n-grams. */
  def decontaminate(
      corpus: DataFrame, corpusId: Column, corpusText: Column,
      bench: DataFrame, benchText: Column, n: Int,
      minOverlap: Int = 1): DataFrame = {
    val flagged = overlapReport(corpus, corpusId, corpusText, bench, benchText, n)
      .filter(col("n_overlap") >= minOverlap)
      .select(col("id").as("__contaminated"))
    corpus.join(flagged, corpusId.cast("long") === col("__contaminated"), "left_anti")
  }
}
