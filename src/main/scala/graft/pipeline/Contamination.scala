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

  /** Fit a ROW-LOCAL contamination gate: the benchmark's distinct word
    * `n`-gram FNV-1a 64 fingerprints, collected once and carried as a
    * sorted long array inside a codegen'd expression (the BPE/DSIR
    * model-table pattern). This is the join-free form of
    * [[overlapReport]] for STREAMING composition: a benchmark is
    * thousands of documents (megabytes of fingerprints), so shipping the
    * set with the plan costs less than a per-micro-batch broadcast join,
    * and the resulting predicate is a pure per-row function of the
    * document — exactly what [[graft.streaming.CurationConfig.extraFilter]]
    * requires for the pipeline's exactly-once replay argument.
    * One Spark job (the fingerprint collect) at fit time. */
  def fitGate(bench: DataFrame, benchText: Column, n: Int): ContamGate = {
    val hs = bench
      .select(explode(T.wordShingles(benchText, n)).as("g"))
      .distinct()
      .select(T.fingerprint64(col("g")).as("h"))
      .collect().map(_.getLong(0))
    new ContamGate(n, hs.distinct.sorted)
  }

  /** Number of the document's DISTINCT word `n`-grams that appear in the
    * fitted benchmark set — [[overlapReport]]'s `n_overlap` as a
    * row-local codegen'd column (0 for clean docs). Compose
    * `overlapCount(text, gate) === 0` into a curation stream's
    * `extraFilter` to decontaminate at ingest. */
  def overlapCount(text: Column, gate: ContamGate): Column =
    graft.functions.ContamFunctions.overlapCount(text, gate)
}

/** A fitted benchmark gram set: sorted distinct FNV-1a 64 fingerprints of
  * the eval set's word `n`-grams ([[Contamination.fitGate]]). Membership
  * is a binary search per distinct doc gram — no per-row allocation
  * beyond the doc's own gram set. */
final class ContamGate(val n: Int, val hashes: Array[Long])
    extends Serializable {

  /** Distinct-gram overlap count of an (already lowercased) text — the
    * tokenization and sub-`n`-token whole-text fallback replicate
    * [[graft.functions.TextFunctions.wordShingleSet]] exactly, so the
    * count equals [[Contamination.overlapReport]]'s join result. */
  def overlap(s: org.apache.spark.unsafe.types.UTF8String): Int = {
    import graft.functions.{TextFunctions => TF}
    val toks = s.toString.trim.split("\\s+")
    var hits = 0
    val seen = new java.util.HashSet[String]()
    def check(g: String): Unit =
      if (seen.add(g) &&
        java.util.Arrays.binarySearch(hashes,
          TF.fnv1a64(org.apache.spark.unsafe.types.UTF8String.fromString(g))) >= 0)
        hits += 1
    if (toks.length < n) check(toks.mkString(" "))
    else {
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i + n <= toks.length) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        check(sb.toString)
        i += 1
      }
    }
    hits
  }
}
