package graft.functions

import org.apache.spark.sql.{Column, GraftInternal}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character n-gram machinery for the Cavnar–Trenkle language classifier
  * ([[graft.pipeline.LangProfile]]): an all-occurrences char n-gram
  * expression (the fit side's gram stream) and the rank-order classify
  * expression whose per-language profile tables ride as ONE plan
  * reference object — the [[BpeFunctions]]/[[DsirFunctions]] pattern, so
  * classification is a single static-shaped call per row inside
  * whole-stage codegen regardless of profile size.
  */
object LangProfileFunctions {

  /** ALL character grams of lengths 1..`n` of a (pre-normalized) string
    * column (length-major, position order within a length), as
    * `array<string>` — unlike [[TextFunctions.charShingles]] this keeps
    * duplicates (profile ranking needs occurrence COUNTS), and unlike a
    * single-length shingle it mixes lengths, which is what makes the
    * Cavnar–Trenkle profile work on scripts whose longer sequences
    * rarely repeat (CJK shares unigrams/bigrams across texts even when
    * trigrams are all distinct). Returns EMPTY when the string is
    * shorter than `n` code points — the classifier's und gate, replayed
    * by the oracle's `len(s) >= n` filter. Grams step by Unicode code
    * point, matching DuckDB's character slicing. */
  def charNgrams(c: Column, n: Int): Column =
    GraftInternal.column(CharNgramsExpression(GraftInternal.expression(c), n))

  /** Predicted language code of a (pre-normalized) string column under a
    * fitted [[LangModel]]; `"und"` when the text yields no n-grams. */
  def classify(c: Column, model: LangModel): Column =
    GraftInternal.column(
      LangClassifyExpression(GraftInternal.expression(c), model))
}

/** A fitted set of per-language n-gram rank profiles [Cavnar & Trenkle,
  * "N-Gram-Based Text Categorization", SDAIR 1994]: for each language the
  * `topK` most frequent character n-grams with their 1-based rank
  * (frequency-descending, gram-ascending in UTF-8 BINARY order — the
  * tie-break both engines replay). Shipped to executors once per task as
  * a plan reference object; callable from generated code.
  *
  * `langs` must be sorted ascending: prediction takes the FIRST language
  * at the minimum out-of-place distance, which implements the
  * smallest-code tie-break. */
final class LangModel(
    val n: Int,
    val topK: Int,
    val langs: Array[String],
    profiles: Array[Array[(String, Int)]]) extends Serializable {
  require(langs.length == profiles.length)

  @transient private lazy val rankMaps: Array[java.util.HashMap[String, Integer]] =
    profiles.map { p =>
      val m = new java.util.HashMap[String, Integer](p.length * 2)
      p.foreach { case (g, r) => m.put(g, r) }
      m
    }

  /** Cavnar–Trenkle classification of a pre-normalized text: build the
    * document's own top-`topK` rank profile (count n-grams in one pass,
    * order by count desc then gram asc in binary order), then sum the
    * out-of-place distance to each language profile (missing gram costs
    * `topK`) and take the first language at the minimum. */
  def classify(s: UTF8String): UTF8String = {
    if (langs.length == 0) return LangModel.Und
    val cp = s.toString.codePoints().toArray
    if (cp.length < n) return LangModel.Und
    // one-pass occurrence counts over gram lengths 1..n — String keys
    // (the rank maps' key type): ~3·|doc| gram occurrences per row, so a
    // per-occurrence UTF8String re-encode on top of the String would be
    // the hot path's dominant allocation
    val counts = new java.util.HashMap[String, Array[Int]]()
    var k = 1
    while (k <= n) {
      var i = 0
      while (i <= cp.length - k) {
        val g = new String(cp, i, k)
        val c = counts.get(g)
        if (c == null) counts.put(g, Array(1)) else c(0) += 1
        i += 1
      }
      k += 1
    }
    // doc profile: rank by (count desc, gram asc in UTF-8 BYTE order —
    // the oracle's varchar collation; LangModel.utf8Order adjusts UTF-16
    // surrogate ordering to match without materializing bytes)
    val grams = counts.keySet().toArray(new Array[String](counts.size()))
    java.util.Arrays.sort(grams, new java.util.Comparator[String] {
      def compare(a: String, b: String): Int = {
        val d = counts.get(b)(0) - counts.get(a)(0)
        if (d != 0) d else LangModel.compareUtf8Order(a, b)
      }
    })
    val m = math.min(grams.length, topK)
    // distances: Σ |rank_doc − rank_lang|, missing gram → topK
    var best = -1
    var bestDist = Long.MaxValue
    var l = 0
    while (l < langs.length) {
      val ranks = rankMaps(l)
      var dist = 0L
      var j = 0
      while (j < m) {
        val r = ranks.get(grams(j))
        dist += (if (r == null) topK.toLong else math.abs((j + 1).toLong - r.toLong))
        j += 1
      }
      if (dist < bestDist) { bestDist = dist; best = l }
      l += 1
    }
    UTF8String.fromString(langs(best))
  }
}

object LangModel {
  private val Und = UTF8String.fromString("und")

  /** Compare two Strings in UTF-8 BYTE order (= code-point order) without
    * encoding: at the first differing UTF-16 unit, surrogates (which
    * UTF-16 sorts below [0xE000, 0xFFFF]) are shifted above the BMP —
    * Lucene's `compareUTF16InUTF8SortOrder` adjustment. */
  def compareUtf8Order(a: String, b: String): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val ca = a.charAt(i)
      val cb = b.charAt(i)
      if (ca != cb) {
        if (ca >= 0xd800 || cb >= 0xd800)
          return utf8Order(ca) - utf8Order(cb)
        return ca - cb
      }
      i += 1
    }
    a.length - b.length
  }

  private def utf8Order(c: Char): Int =
    if (c >= 0xd800) { if (c >= 0xe000) c - 0x800 else c + 0x2000 } else c
}

/** Codegen'd all-occurrences char n-grams over a StringType column — see
  * [[LangProfileFunctions.charNgrams]]. */
case class CharNgramsExpression(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"n must be >= 1: $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams_all"

  override def nullSafeEval(input: Any): Any =
    CharNgramsExpression.evalGrams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CharNgramsExpression.evalGrams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharNgramsExpression {
  /** All grams of lengths 1..n by code point (length-major, position
    * order), duplicates kept; empty below n code points (the und gate). */
  def evalGrams(s: UTF8String, n: Int): GenericArrayData = {
    val cp = s.toString.codePoints().toArray
    if (cp.length < n) return new GenericArrayData(Array.empty[Any])
    var total = 0
    var k = 1
    while (k <= n) { total += cp.length - k + 1; k += 1 }
    val out = new Array[Any](total)
    var o = 0
    k = 1
    while (k <= n) {
      var i = 0
      while (i <= cp.length - k) {
        out(o) = UTF8String.fromString(new String(cp, i, k))
        o += 1
        i += 1
      }
      k += 1
    }
    new GenericArrayData(out)
  }
}

/** Codegen'd Cavnar–Trenkle classify over a StringType column — see
  * [[LangProfileFunctions.classify]]. */
case class LangClassifyExpression(child: Expression, model: LangModel)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "lang_profile_classify"

  override def nullSafeEval(input: Any): Any =
    model.classify(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langModel", model, classOf[LangModel].getName)
    defineCodeGen(ctx, ev, c => s"$ref.classify($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
