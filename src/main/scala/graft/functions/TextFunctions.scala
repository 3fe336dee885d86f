package graft.functions

import org.apache.spark.sql.{Column, GraftInternal}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
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

  /** BPE-ish subword count: splits on word boundaries AND digit/letter runs,
    * the usual cheap proxy for LLM token budgeting when no tokenizer is at
    * hand (≈ GPT-2 pre-tokenizer regex, simplified). */
  def subwordCount(c: Column): Column =
    size(filter(split(c, "(?=[^a-zA-Z0-9])|(?<=[^a-zA-Z0-9])"), x => length(x) > 0))

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
    * tie-break by language code. */
  def langId(c: Column): Column = {
    val toks = tokens(lower(c))
    val scored = LangLexicons.toSeq.sortBy(_._1).map { case (lang, lex) =>
      val lexArr = array(lex.map(lit): _*)
      // zh has no whitespace tokens: count lexicon chars contained in text
      val hits =
        if (lang == "zh")
          size(filter(lexArr, ch => instr(c, ch) > 0))
        else
          size(filter(toks, w => array_contains(lexArr, w)))
      struct(hits.as("hits"), lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Character n-gram shingles (distinct, order-free) — the standard
    * near-dup unit for MinHash/Jaccard. */
  def charShingles(c: Column, n: Int): Column = {
    val s = regexp_replace(lower(trim(c)), "\\s+", " ")
    array_distinct(
      transform(
        sequence(lit(0), greatest(length(s) - n, lit(0))),
        i => substring(s, lit(1) + i, lit(n)).cast("string")))
  }

  /** Word n-gram shingles (distinct). */
  def wordShingles(c: Column, n: Int): Column = {
    val toks = tokens(lower(c))
    array_distinct(
      when(size(toks) < n, array(concat_ws(" ", toks)))
        .otherwise(transform(
          sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
  }

  /** Exact Jaccard similarity of two string-array columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0, lit(1.0)).otherwise(inter / uni)
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

  // ---- static helpers callable from generated code ----

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

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  def hamming64Col(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

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
