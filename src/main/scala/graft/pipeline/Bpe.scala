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
  *     pieces by replaying the merges in rank order over a
  *     separator-wrapped segmentation string (each symbol wrapped as
  *     `␟sym␟`, merges rewrite `␟a␟␟b␟ → ␟ab␟`). The implementation is
  *     ONE codegen'd expression carrying the whole ranked table as a plan
  *     reference object ([[graft.functions.BpeFunctions]]) — plan size is
  *     O(1) in the vocabulary, whole-stage codegen stays intact at 50k
  *     merges, and the replay is bit-identical to the unrolled
  *     `replace` chain the DuckDB oracle executes
  *     ([[graft.queries.BpeSql]]; equivalence property-checked).
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
  * short strings; application is per-row compute on the scan, costing
  * O(word-len × merges-APPLIED-to-it) with O(1) table lookups — the
  * vocabulary size never enters the plan or the per-row bound. The model
  * itself (≲ a few hundred KB at 50k merges) rides in the plan's
  * reference array, no broadcast needed. */
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
      * `"lower"` → `"␟l␟␟o␟␟w␟␟er␟"` (with (e,r) merged). ONE codegen'd
      * expression carrying the whole table as a plan reference object
      * ([[graft.functions.BpeFunctions]]) — plan size is O(1) in the
      * merge count, so a 30k-merge production vocabulary applies exactly
      * like the 32-merge demo (spec-pinned at 1,000+ merges with
      * codegen-fallback disabled). */
    def segment(word: Column): Column =
      graft.functions.BpeFunctions.segment(word, merges, Sep)

    /** The unrolled replace-chain form of [[segment]] — one built-in
      * `replace` per merge. Byte-identical output (the spec
      * property-checks it against [[segment]] on random trained tables);
      * kept as the executable mirror of the SQL oracle's rank-order
      * replay, and as a demonstration of why the expression form exists:
      * this plan grows linearly in merges and breaks whole-stage codegen
      * near ~1k. Do not use on production vocabularies. */
    private[graft] def segmentUnrolled(word: Column): Column = {
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
    * fixed corpus (ties: frequency DESC, word ASC / pair ASC).
    *
    * `maxWords` is the CORPUS-SAMPLING bound: the merge loop sees pair
    * statistics from the `maxWords` most frequent word types only. Under
    * a Zipfian word distribution the frequency head carries almost all
    * pair mass, so a few thousand types reproduce the head of a
    * full-corpus merge table; raise it with the target vocabulary (a
    * 30k-merge vocabulary wants ~100k types) — the cost is driver memory
    * O(maxWords × word-len) and merge-loop time
    * O(numMerges × maxWords × word-len), never an executor or shuffle
    * cost. Tail-word pair statistics outside the bound do not influence
    * the table; that is the standard trade every published trainer makes
    * via min-frequency cutoffs. */
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
