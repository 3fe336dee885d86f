package graft.functions

import org.apache.spark.sql.{Column, GraftInternal}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Text-analysis primitives for large-scale training-data pipelines: token
  * counting, quality scoring, language ID, document fingerprinting, shingling,
  * MinHash and SimHash signatures.
  *
  * Everything here is either a composition of built-in (codegen'd)
  * `org.apache.spark.sql.functions` or a custom Catalyst expression with
  * `doGenCode`, so the whole surface stays inside whole-stage codegen — no
  * UDF ser/deser on the 100 TB path. The signature expressions (fingerprint /
  * simhash / minhash) are deterministic pure functions of their input, so
  * recomputation on task retry is safe.
  */
object TextFunctions {

  /** Whitespace tokens of trimmed text; empty input → empty array. */
  def tokens(c: Column): Column =
    when(length(trim(c)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(c), "\\s+"))

  /** Number of whitespace-separated tokens. */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword count: every maximal alphanumeric run plus every
    * single non-alphanumeric character is a piece — the usual cheap proxy
    * for LLM token budgeting when no tokenizer is at hand (≈ GPT-2
    * pre-tokenizer regex, simplified). Counted by match extraction rather
    * than a lookaround split: the pattern is RE2-compatible, so the exact
    * semantics are DuckDB-oracle-checkable (and the two formulations are
    * provably identical — a string IS a sequence of alnum runs and
    * non-alnum chars). */
  def subwordCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Za-z0-9]+|[^A-Za-z0-9]"), lit(0)))

  /** Count of punctuation characters from the fixed set `.,!?;:`. */
  def punctCount(c: Column): Column =
    length(c) - length(regexp_replace(c, "[.,!?;:]", ""))

  /** Stopword hit count against a fixed lexicon. */
  def stopwordCount(c: Column, stopwords: Seq[String]): Column = {
    val lex = array(stopwords.map(lit): _*)
    size(filter(tokens(lower(c)), w => array_contains(lex, w)))
  }

  /** English stopword lexicon used by [[qualityScore]] (tiny on purpose —
    * a quality *signal*, not NLP). */
  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by", "be")

  /** Per-language stopword lexicons for [[langId]]. Public, standard lists
    * truncated to the highest-frequency function words. */
  val LangLexicons: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "no", "por"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "pas", "que", "pour", "dans"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有", "我", "他", "这"))

  /** Document quality score in [0, 1]: mean of three bounded signals —
    * length band (50..5000 chars), low punctuation density (≤ 0.1 is clean),
    * and presence of stopwords (natural language has them). */
  def qualityScore(c: Column): Column = {
    val len = length(c).cast("double")
    val lenScore = when(len >= 50 && len <= 5000, lit(1.0))
      .when(len < 50, len / 50.0)
      .otherwise(lit(5000.0) / len)
    val punctDensity = punctCount(c).cast("double") / greatest(len, lit(1.0))
    val punctScore = when(punctDensity <= 0.1, lit(1.0))
      .otherwise(greatest(lit(0.0), lit(1.0) - (punctDensity - 0.1) * 5.0))
    val stopRatio = stopwordCount(c, EnglishStopwords).cast("double") /
      greatest(tokenCount(c).cast("double"), lit(1.0))
    val stopScore = least(stopRatio * 5.0, lit(1.0))
    round((lenScore + punctScore + stopScore) / 3.0, 6)
  }

  /** N-gram-heuristic language ID: the language whose stopword lexicon hits
    * the most tokens; `und` (undetermined) when nothing hits. Deterministic
    * tie-break by language code (largest code wins: zh > fr > es > en > de).
    *
    * One-pass custom expression: the text is tokenized ONCE and every
    * lexicon scored in the same loop — the `filter(tokens(...), ...)`
    * composition re-derived the token array per language (5× the tokenize
    * cost; subexpression elimination does not reach into lambda bodies). */
  def langId(c: Column): Column =
    GraftInternal.column(LangIdExpression(GraftInternal.expression(c)))

  /** Character n-gram shingles (distinct, first-occurrence order) — the
    * standard near-dup unit for MinHash/Jaccard. Normalization (lower, trim,
    * whitespace collapse) runs as built-in column ops; the shingling itself
    * is a one-pass custom expression — the `transform`+`substring`
    * composition is O(len²) per document because UTF-8 `substring` seeks
    * from the start each call. */
  def charShingles(c: Column, n: Int): Column = {
    val s = regexp_replace(lower(trim(c)), "\\s+", " ")
    GraftInternal.column(
      CharShinglesExpression(GraftInternal.expression(s), n))
  }

  /** Word n-gram shingles (distinct, first-occurrence order). One-pass
    * custom expression — the `transform`+`slice` composition re-evaluates
    * the tokenizing `split` inside the lambda for every shingle position
    * (subexpression elimination does not reach into lambda bodies). */
  def wordShingles(c: Column, n: Int): Column =
    GraftInternal.column(
      WordShinglesExpression(GraftInternal.expression(lower(c)), n))

  /** Unicode NFC canonical normalization (java.text.Normalizer) as a
    * codegen'd expression — no Spark built-in exists. Engine-agnostic:
    * canonical composition is pinned by the Unicode standard, so ICU
    * (JVM) and utf8proc (DuckDB's `nfc_normalize`) agree. */
  def nfc(c: Column): Column =
    GraftInternal.column(NfcExpression(GraftInternal.expression(c)))

  /** Standard pre-dedup text normalization: NFC → strip control chars
    * (keeping ONLY \n and \t; \r goes too, so CRLF and LF spellings of
    * the same text normalize byte-identically) → collapse space/tab runs
    * to one space → trim. One row-local codegen'd chain on the scan;
    * byte-identical dedup inputs across crawls/engines is the point —
    * un-normalized text makes exact and near dedup silently miss
    * composed/decomposed variants. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(nfc(c), "[\\x00-\\x08\\x0B-\\x1F\\x7F]", ""),
      "[ \\t]+", " "))

  /** All adjacent word bigrams ("w1 w2") of the trimmed text, in order,
    * WITH multiplicity — the LM-counting stream ([[wordShingles]] is
    * DISTINCT, dedup semantics; counting models need every instance).
    * Lowercase upstream for case-folded models. */
  def wordBigrams(c: Column): Column = wordNgrams(c, 2)

  /** All adjacent word `n`-grams of the text, in order, WITH multiplicity
    * — [[wordBigrams]] generalized for higher-order LM counting (the
    * CCNet-style order-5 filter). Tokenization is pinned to the engine
    * convention shared with the DuckDB oracles: Spark-`trim` (spaces
    * only) → `\s+` split → drop empty fragments. */
  def wordNgrams(c: Column, n: Int): Column = {
    require(n >= 1, s"n=$n")
    GraftInternal.column(
      WordNgramsExpression(GraftInternal.expression(c), n))
  }

  /** Exact Jaccard similarity of two string-array columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0, lit(1.0)).otherwise(inter / uni)
  }

  /** Exact Jaccard of two SORTED distinct string arrays — O(|a|+|b|) merge
    * intersect with zero allocation, vs `array_intersect`/`array_union`
    * which build two hash sets (and hash every string) PER PAIR. In a
    * similarity join the pair side is the big side — millions of candidate
    * pairs each carrying ~100-element arrays — so verification is the hot
    * loop and the hash-set constant dominates the whole join. Sort each
    * doc's array once on the (small) document side with `array_sort`, then
    * verify pairs with this. Same value as [[jaccard]] on distinct arrays. */
  def jaccardSorted(a: Column, b: Column): Column =
    GraftInternal.column(SortedJaccardExpression(
      GraftInternal.expression(a), GraftInternal.expression(b)))

  /** Merge-intersect Jaccard over two sorted distinct UTF8 arrays (binary
    * order, the same ordering `array_sort` uses for strings). */
  def sortedJaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var inter = 0
    var nullA = 0
    var nullB = 0
    // null elements are unreachable from the internal shingle expressions
    // (containsNull = false) but CAN arrive via the SQL-registered
    // function; skip them (isNullAt is a bitset probe, negligible next to
    // the UTF8String compares)
    while (i < na && j < nb) {
      if (a.isNullAt(i)) { nullA += 1; i += 1 }
      else if (b.isNullAt(j)) { nullB += 1; j += 1 }
      else {
        val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
        if (c == 0) { inter += 1; i += 1; j += 1 }
        else if (c < 0) i += 1
        else j += 1
      }
    }
    while (i < na) { if (a.isNullAt(i)) nullA += 1; i += 1 }
    while (j < nb) { if (b.isNullAt(j)) nullB += 1; j += 1 }
    val va = na - nullA
    val vb = nb - nullB
    if (va == 0 && vb == 0) 1.0
    else inter.toDouble / (va + vb - inter)
  }

  /** Count of elements of sorted distinct string array `a` ABSENT from
    * sorted distinct string array `b` — the q-gram count filter's
    * left-hand side [Gravano et al., VLDB 2001]: `d` edits destroy at
    * most `d·q` of a string's distinct q-grams, so
    * `absentCount(G(a), G(b)) > d·q  ⇒  editDistance(a, b) > d`.
    * An O(|a|+|b|) merge walk (same discipline as [[jaccardSorted]]) —
    * the pre-verify reject that spares a candidate pair the full
    * Levenshtein DP. */
  def absentCount(a: Column, b: Column): Column =
    GraftInternal.column(SortedAbsentExpression(
      GraftInternal.expression(a), GraftInternal.expression(b)))

  /** Merge-walk |a \ b| over two sorted distinct UTF8 arrays (binary
    * order, as `sort_array` emits). Null elements never count. */
  def sortedAbsentCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var absent = 0
    while (i < na && j < nb) {
      if (a.isNullAt(i)) i += 1
      else if (b.isNullAt(j)) j += 1
      else {
        val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
        if (c == 0) { i += 1; j += 1 }
        else if (c < 0) { absent += 1; i += 1 }
        else j += 1
      }
    }
    while (i < na) { if (!a.isNullAt(i)) absent += 1; i += 1 }
    absent
  }

  /** Ed-Join location-based prefix [Xiao, Wang & Lin, VLDB 2008, §4]:
    * the distinct gram types of the SHORTEST rarity-ordered positional
    * q-gram prefix whose minimum edit errors exceed `d` — the minimal
    * inverted-index footprint that still guarantees any pair within
    * Levenshtein distance `d` shares a prefix gram type. vs the fixed
    * d·q+1-type prefix: position-disjoint rare grams let most names stop
    * at d+1–2q occurrences (measured 5.35 avg vs 7 on the part-name
    * corpus → ~3× fewer candidate-pair emissions), and the greedy
    * interval piercing ("an edit at text position t destroys grams
    * starting in [t−q+1, t]") is the standard minEditErrors lower bound.
    * Soundness is property-checked over random total orders and random
    * ≤d-edit pairs in `PropertySpec`. The corpus gram-frequency table is
    * bounded by the q-gram alphabet, so it ships as a PLAN REFERENCE
    * OBJECT and the whole prefix computation is one codegen'd row-local
    * pass — no frequency join, no per-name window function. */
  def edjoinPrefix(
      c: Column, freq: java.util.HashMap[String, Long],
      q: Int, d: Int): Column = {
    require(q >= 2 && d >= 1, s"q=$q d=$d")
    GraftInternal.column(
      EdJoinPrefixExpression(GraftInternal.expression(c), freq, q, d))
  }

  /** Row-local prefix computation (see [[edjoinPrefix]]); `freq` maps
    * gram → corpus document frequency (absent → 0, i.e. rarest). Strings
    * shorter than q index themselves whole (degenerate but total). */
  def edjoinPrefixEval(
      s: UTF8String, freq: java.util.HashMap[String, Long],
      q: Int, d: Int): ArrayData = {
    val str = s.toString
    val n = str.length - q + 1
    if (n <= 0)
      return new GenericArrayData(Array[Any](UTF8String.fromString(str)))
    // occurrences ordered by (corpus frequency asc, gram, position)
    val grams = Array.tabulate(n)(i => str.substring(i, i + q))
    val freqs = grams.map(g => freq.getOrDefault(g, 0L))
    val order = Array.tabulate(n)(Integer.valueOf)
    java.util.Arrays.sort(order, new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int = {
        val cf = java.lang.Long.compare(freqs(a), freqs(b))
        if (cf != 0) cf
        else {
          val cg = grams(a).compareTo(grams(b))
          if (cg != 0) cg else Integer.compare(a, b)
        }
      }
    })
    // shortest prefix whose greedy interval piercing exceeds d: an edit
    // at text position t destroys grams starting in [t-q+1, t], so the
    // min edits to destroy a position set is the greedy cover count
    val positions = new java.util.TreeSet[Integer]()
    def pierce(): Int = {
      var edits = 0
      var cover = Int.MinValue
      val it = positions.iterator()
      while (it.hasNext) {
        val p = it.next().intValue()
        if (p > cover) { edits += 1; cover = p + q - 1 }
      }
      edits
    }
    var k = 0
    var enough = false
    while (k < n && !enough) {
      positions.add(order(k))
      if (pierce() > d) enough = true
      k += 1
    }
    // distinct gram TYPES of the selected occurrences (if the whole
    // string never exceeds d errors, the prefix is everything — trivially
    // sound)
    val types = new java.util.LinkedHashSet[UTF8String]()
    var j = 0
    while (j < k) { types.add(UTF8String.fromString(grams(order(j)))); j += 1 }
    new GenericArrayData(types.toArray(Array.empty[AnyRef]))
  }

  /** 64-bit rolling polynomial fingerprint of a string (FNV-1a). */
  def fingerprint64(c: Column): Column =
    GraftInternal.column(Fingerprint64Expression(GraftInternal.expression(c)))

  /** 64-bit SimHash over an array of token strings. */
  def simhash64(tokensCol: Column): Column =
    GraftInternal.column(SimHash64Expression(GraftInternal.expression(tokensCol)))

  /** MinHash signature (array of `k` longs) over an array of token strings.
    * Hash family: murmur2(token) mixed with k fixed odd multipliers. */
  def minhash(tokensCol: Column, k: Int): Column =
    GraftInternal.column(MinHashExpression(GraftInternal.expression(tokensCol), k))

  /** LSH band bucket keys (array of `bands` longs) computed from the MinHash
    * signature in ONE pass — signature and band-folding fused into a single
    * expression so projection collapse cannot duplicate the k-hash signature
    * computation per band. */
  def minhashBands(tokensCol: Column, k: Int, bands: Int): Column =
    GraftInternal.column(
      MinHashBandsExpression(GraftInternal.expression(tokensCol), k, bands))

  // ---- static helpers callable from generated code ----

  /** NFC-normalize — see [[nfc]]. Already-normalized strings (the common
    * case) short-circuit through the isNormalized check, no allocation. */
  def nfcF(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** In-order, non-distinct adjacent word bigrams — see [[wordBigrams]]. */
  def wordBigramsF(s: UTF8String): ArrayData = wordNgramsF(s, 2)

  /** Adjacent word n-grams with multiplicity. Tokenization mirrors the
    * oracle convention exactly: `UTF8String.trim` (Spark's space-only
    * `trim()` — NOT `String.trim`, which also strips \t/\n and would
    * change the stream for leading-tab text), `\s+` split keeping empty
    * fragments (limit -1, Spark's `split()`), then drop empties — the
    * same non-empty-token stream as `list_filter(string_split_regex(...),
    * x -> x <> '')` on the DuckDB side. */
  def wordNgramsF(s: UTF8String, n: Int): ArrayData = {
    val t = s.trim()
    if (t.numBytes == 0) return new GenericArrayData(Array.empty[AnyRef])
    val toks = t.toString.split("\\s+", -1).filter(_.nonEmpty)
    if (toks.length < n) return new GenericArrayData(Array.empty[AnyRef])
    val out = new Array[AnyRef](toks.length - n + 1)
    var i = 0
    while (i < out.length) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** FNV-1a 64-bit over UTF-8 bytes. */
  def fnv1a64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** SimHash64: per-token 64-bit hash bit-votes, sign-aggregated. */
  def simhash64(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = fnv1a64(arr.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** One-pass distinct character n-grams of a UTF-8 string: code-point
    * offsets computed once, byte-sliced windows, LinkedHashSet dedup
    * (first-occurrence order — matches `array_distinct` semantics).
    * O(bytes × n) instead of O(chars²). */
  def charShingleSet(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    // code-point start offsets
    val starts = new Array[Int](s.numChars() + 1)
    var i = 0; var c = 0
    while (i < bytes.length) {
      starts(c) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      c += 1
    }
    starts(c) = bytes.length
    val nChars = c
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (nChars <= n) {
      out.add(s)
    } else {
      var j = 0
      while (j + n <= nChars) {
        out.add(UTF8String.fromBytes(
          java.util.Arrays.copyOfRange(bytes, starts(j), starts(j + n))))
        j += 1
      }
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  /** One-pass distinct word n-grams: whitespace-tokenize once, join each
    * window of n tokens with a single space, LinkedHashSet dedup. Fewer than
    * n tokens → one shingle of all tokens. */
  def wordShingleSet(s: UTF8String, n: Int): ArrayData = {
    val toks = s.toString.trim.split("\\s+")
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (toks.length < n) {
      out.add(UTF8String.fromString(toks.mkString(" ")))
    } else {
      var i = 0
      val sb = new java.lang.StringBuilder()
      while (i + n <= toks.length) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out.add(UTF8String.fromString(sb.toString))
        i += 1
      }
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  // langId one-pass scoring tables: langs in ascending code order so a
  // `>=` scan implements the largest-code tie-break; zh (no whitespace
  // tokens) is scored by lexicon-char containment over the raw text.
  private val LangIdLangs: Array[String] = Array("de", "en", "es", "fr", "zh")
  private val LangIdTokenLex: Array[java.util.HashSet[String]] =
    LangIdLangs.init.map { l =>
      val h = new java.util.HashSet[String]()
      LangLexicons(l).foreach(h.add)
      h
    }
  private val ZhChars: Array[String] = LangLexicons("zh").toArray

  /** One-pass language-ID eval: tokenize once (lower + space-trim + `\s+`
    * split — identical to `tokens(lower(c))`), score all lexicons per token. */
  def langIdEval(s: UTF8String): UTF8String = {
    val toks = s.toLowerCase.trim().toString.split("\\s+")
    val hits = new Array[Int](LangIdLangs.length)
    var i = 0
    while (i < toks.length) {
      var l = 0
      while (l < LangIdTokenLex.length) {
        if (LangIdTokenLex(l).contains(toks(i))) hits(l) += 1
        l += 1
      }
      i += 1
    }
    val raw = s.toString
    var z = 0
    while (z < ZhChars.length) {
      if (raw.contains(ZhChars(z))) hits(LangIdLangs.length - 1) += 1
      z += 1
    }
    var best = 0
    var bi = -1
    var l = 0
    while (l < hits.length) {
      if (hits(l) > 0 && hits(l) >= best) { best = hits(l); bi = l }
      l += 1
    }
    if (bi < 0) UTF8String.fromString("und")
    else UTF8String.fromString(LangIdLangs(bi))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  def hamming64Col(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Band bucket keys from a one-pass MinHash: FNV-fold each band's slice of
    * the signature with the band index. */
  def minhashBandKeys(arr: ArrayData, k: Int, bands: Int): ArrayData = {
    val sig = minhashSig(arr, k).asInstanceOf[GenericArrayData]
    val rows = k / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0xcbf29ce484222325L ^ b
      var j = 0
      while (j < rows) {
        h = (h ^ sig.getLong(b * rows + j)) * 0x100000001b3L
        j += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  /** MinHash signature: for hash i, min over tokens of
    * mix(murmur2(token), i). Universal-ish family, deterministic. */
  def minhashSig(arr: ArrayData, k: Int): ArrayData = {
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val base = fnv1a64(arr.getUTF8String(i))
        var j = 0
        while (j < k) {
          // xorshift-mix the base with a per-function odd constant
          var x = base ^ (0x9e3779b97f4a7c15L * (j + 1))
          x ^= x >>> 33; x *= 0xff51afd7ed558ccdL; x ^= x >>> 33
          if (x < sig(j)) sig(j) = x
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}

/** Codegen'd FNV-1a 64-bit fingerprint of a string column. */
case class Fingerprint64Expression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "fingerprint64"
  override def nullSafeEval(input: Any): Any =
    TextFunctions.fnv1a64(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextFunctions.fnv1a64($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd merge-intersect Jaccard over two sorted array<string> columns. */
case class SortedJaccardExpression(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  // analysis-time coercion for the SQL path: non-string arrays cast to
  // array<string> (or fail analysis with a type message) instead of
  // ClassCastException-ing in eval; nulls INSIDE arrays are skipped by
  // sortedJaccard itself
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sorted_jaccard"
  override def nullSafeEval(a: Any, b: Any): Any =
    TextFunctions.sortedJaccard(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.TextFunctions.sortedJaccard($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd merge-walk |a \ b| over two sorted distinct string arrays —
  * the q-gram count filter ([[TextFunctions.absentCount]]). */
case class SortedAbsentExpression(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_absent"
  override def nullSafeEval(a: Any, b: Any): Any =
    TextFunctions.sortedAbsentCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.TextFunctions.sortedAbsentCount($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd Ed-Join location-based prefix over StringType — the corpus
  * gram-frequency map rides as a plan reference object
  * ([[TextFunctions.edjoinPrefix]]). */
case class EdJoinPrefixExpression(
    child: Expression, freq: java.util.HashMap[String, Long], q: Int, d: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "edjoin_prefix"
  override def nullSafeEval(input: Any): Any =
    TextFunctions.edjoinPrefixEval(
      input.asInstanceOf[UTF8String], freq, q, d)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("edjoinFreq", freq,
      "java.util.HashMap<String, Long>")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextFunctions.edjoinPrefixEval($c, $ref, $q, $d)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd one-pass language ID over StringType. */
case class LangIdExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"
  override def nullSafeEval(input: Any): Any =
    TextFunctions.langIdEval(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextFunctions.langIdEval($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd 64-bit SimHash over array<string>. */
case class SimHash64Expression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override def nullSafeEval(input: Any): Any =
    TextFunctions.simhash64(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextFunctions.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd one-pass distinct char shingles over StringType. */
case class CharShinglesExpression(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_shingles"
  override def nullSafeEval(input: Any): Any =
    TextFunctions.charShingleSet(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextFunctions.charShingleSet($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd one-pass distinct word shingles over StringType. */
case class WordShinglesExpression(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"
  override def nullSafeEval(input: Any): Any =
    TextFunctions.wordShingleSet(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextFunctions.wordShingleSet($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd Unicode NFC normalization over StringType. */
case class NfcExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc"
  override def nullSafeEval(input: Any): Any =
    TextFunctions.nfcF(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextFunctions.nfcF($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd in-order non-distinct word bigrams over StringType. */
case class WordNgramsExpression(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"
  override def nullSafeEval(input: Any): Any =
    TextFunctions.wordNgramsF(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextFunctions.wordNgramsF($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd fused MinHash + LSH band fold over array<string>. */
case class MinHashBandsExpression(child: Expression, k: Int, bands: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_bands"
  override def nullSafeEval(input: Any): Any =
    TextFunctions.minhashBandKeys(input.asInstanceOf[ArrayData], k, bands)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextFunctions.minhashBandKeys($c, $k, $bands)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd MinHash signature (array of k longs) over array<string>. */
case class MinHashExpression(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash"
  override def nullSafeEval(input: Any): Any =
    TextFunctions.minhashSig(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextFunctions.minhashSig($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
