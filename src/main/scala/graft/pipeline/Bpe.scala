package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained byte-pair-encoding (BPE) tokenizer.
  *
  * Every token budget in a training pipeline — chunking, packing, mixture
  * weighting — should be denominated in the tokens the model will actually
  * see, and those are SUBWORD merges, not whitespace splits (a whitespace
  * count is ~1.3–1.7× off on English prose and far worse on code). This is
  * the standard published algorithm (frequency-ranked pair merges,
  * Sennrich et al. 2016, without the end-of-word marker):
  *
  *   - '''train''': count word frequencies across the corpus (ONE shuffle
  *     of lowercase `[a-z]+` word occurrences — the only corpus-scale
  *     step), keep the top `maxWords` types driver-side (bounded,
  *     metadata-scale: the frequency head carries almost all pair mass),
  *     then run the published merge loop: `numMerges` times, count
  *     adjacent symbol pairs weighted by word frequency and merge the most
  *     frequent pair everywhere (left-to-right, non-overlapping), ties
  *     broken (count DESC, pair ASC) for determinism.
  *   - '''apply''': a trained [[BpeModel]] turns any word into subword
  *     pieces by replaying the merges in rank order. The implementation is
  *     a chain of built-in codegen'd `replace` calls over a
  *     separator-wrapped segmentation string (each symbol wrapped as
  *     `␟sym␟`, merges rewrite `␟a␟␟b␟ → ␟ab␟`), so application is pure
  *     whole-stage-codegen column arithmetic — no UDF, no shuffle, and
  *     bit-replayable by the DuckDB oracle ([[graft.queries.BpeSql]]).
  *
  * Merges-in-rank-order application is equivalent to the published
  * greedy lowest-rank-first loop because training ranks are topologically
  * consistent: a merge that produces symbol `s` always precedes any merge
  * that consumes `s`, so no later rewrite can create an earlier pair.
  * Left-to-right non-overlap within one rewrite matches `String.replace`
  * on BOTH engines (and the driver-side trainer mirrors it exactly).
  *
  * At 100 TB: training is one word-count shuffle (words, not documents,
  * and combiner-reduced map-side) plus a driver loop over ≤ `maxWords`
  * short strings; application is per-row compute on the scan. The model
  * itself is a few KB of merges — a literal in the plan, no broadcast
  * needed. */
object Bpe {

  /** Symbol separator — U+001F (unit separator), never present in
    * `[a-z]+` words by construction. */
  val Sep = "\u001f"

  /** Lowercase ASCII word occurrences — the tokenizer's pre-split.
    * `[a-z]+` keeps symbols collation-free so driver-side and SQL
    * tie-breaks agree byte-for-byte. */
  def words(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+"), lit(0))

  /** A trained merge table: `merges(k)` = the rank-k pair. */
  final case class BpeModel(merges: Seq[(String, String)]) {

    /** Wrapped segmentation of a word column after replaying all merges:
      * `"lower"` → `"␟l␟␟o␟␟w␟␟er␟"` (with (e,r) merged). */
    def segment(word: Column): Column = {
      val wrapped = regexp_replace(word, "(.)", Sep + "$1" + Sep)
      merges.foldLeft(wrapped) { case (seg, (l, r)) =>
        replace(seg, lit(Sep + l + Sep + Sep + r + Sep), lit(Sep + l + r + Sep))
      }
    }

    /** Subword pieces of one word: `"lower"` → `["l","o","w","er"]`. */
    def pieces(word: Column): Column =
      split(trim(segment(word), Sep), Sep + Sep)

    /** BPE token count of one word — `2×count(Sep)/2` arithmetic, no
      * split materialized. */
    def wordTokenCount(word: Column): Column = {
      val seg = segment(word)
      ((length(seg) - length(replace(seg, lit(Sep), lit("")))) / 2)
        .cast("int")
    }

    /** BPE token count of a whole text column (sum over its words) —
      * the drop-in replacement for
      * [[graft.functions.TextFunctions.tokenCount]] when budgets are
      * denominated in subword tokens. */
    def tokenCount(text: Column): Column =
      aggregate(transform(words(text), w => wordTokenCount(w)),
        lit(0), (acc, x) => acc + x)

    /** All subword pieces of a text column, in order. */
    def tokens(text: Column): Column =
      flatten(transform(words(text), w => pieces(w)))
  }

  /** Train on a corpus: one word-frequency shuffle, top-`maxWords` types
    * to the driver, then the published merge loop. Deterministic for a
    * fixed corpus (ties: frequency DESC, word ASC / pair ASC). */
  def train(
      corpus: DataFrame,
      text: Column,
      numMerges: Int = 32,
      maxWords: Int = 256): BpeModel = {
    val freqs = corpus
      .select(explode(words(text)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("w").asc)
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    trainFromFreqs(freqs, numMerges)
  }

  /** The driver-side merge loop over a (word, frequency) table — exactly
    * the semantics the SQL oracle unrolls: pair counts weighted by word
    * frequency (adjacent positions, overlaps counted), argmax with
    * (count DESC, left ASC, right ASC) tie-break, left-to-right
    * non-overlapping rewrite. */
  def trainFromFreqs(
      freqs: Seq[(String, Long)], numMerges: Int): BpeModel = {
    var segs: Vector[(Vector[String], Long)] =
      freqs.map { case (w, f) => (w.map(_.toString).toVector, f) }.toVector
    val merges = Vector.newBuilder[(String, String)]
    var done = false
    var k = 0
    while (k < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      for ((syms, f) <- segs; i <- 0 until syms.length - 1)
        counts.updateWith((syms(i), syms(i + 1)))(c => Some(c.getOrElse(0L) + f))
      if (counts.isEmpty) done = true
      else {
        val best = counts.keysIterator.reduceLeft { (a, b) =>
          val ca = counts(a); val cb = counts(b)
          if (cb > ca || (cb == ca &&
              (b._1 < a._1 || (b._1 == a._1 && b._2 < a._2)))) b else a
        }
        merges += best
        segs = segs.map { case (syms, f) => (mergeOnce(syms, best), f) }
        k += 1
      }
    }
    BpeModel(merges.result())
  }

  /** Left-to-right non-overlapping single-pair rewrite — the driver-side
    * mirror of `replace(seg, "␟a␟␟b␟", "␟ab␟")`. */
  private def mergeOnce(
      syms: Vector[String], pair: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += (pair._1 + pair._2); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }
}
