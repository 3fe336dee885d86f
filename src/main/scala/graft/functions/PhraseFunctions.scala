package graft.functions

import org.apache.spark.sql.{Column, GraftInternal}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-phrase substring matching for blocklist / policy filtering —
  * the C4/RefinedWeb "bad word list" curation step [Raffel et al. 2020
  * §2.2 drop pages containing listed phrases; Penedo et al. 2023].
  *
  * Matching is Aho–Corasick [Aho & Corasick, CACM 1975]: ONE automaton
  * over all phrases, built once and shipped to executors as a plan
  * reference object; each document is scanned in O(|text| + matches)
  * regardless of blocklist size. The naive spelling — one
  * `contains(text, p)` per phrase — is O(N·|text|) per row and a plan
  * tree linear in N: fine at 5 phrases, hopeless at the 10k-entry lists
  * real policy filters carry.
  *
  * Semantics are EXACTLY per-phrase `contains` (case-sensitive substring;
  * lowercase inputs upstream for case-insensitive matching), so the
  * result is SQL-oracle-checkable: the hit list equals
  * `list_sort(list_filter(phrases, p -> contains(text, p)))`.
  */
object PhraseFunctions {

  /** Distinct matched phrases, sorted lexicographically and joined with
    * `,` (empty string = no hits) — a flat scalar any engine can compare.
    * Phrases must not contain the separator. */
  def phraseHits(text: Column, phrases: Seq[String]): Column = {
    require(phrases.nonEmpty, "empty phrase list")
    require(phrases.forall(p => p.nonEmpty && !p.contains(",")),
      "phrases must be non-empty and comma-free (the join separator)")
    GraftInternal.column(PhraseHitsExpression(
      GraftInternal.expression(text), phrases.toIndexedSeq))
  }
}

/** The Aho–Corasick automaton, built lazily once per JVM from the phrase
  * list and shipped as a plan reference object. Callable from generated
  * code. */
final class PhraseAutomaton(phrases: Array[String]) extends Serializable {

  /** Sorted order of phrase indexes for deterministic output. */
  @transient private lazy val sortedIdx: Array[Int] =
    phrases.indices.sortBy(phrases).toArray

  // Flat automaton arrays, built by [[build]]: per-node transition maps,
  // fail links, and output phrase-index lists.
  @transient private lazy val (next, fail, out) = build()

  private def build(): (
      java.util.ArrayList[java.util.HashMap[Character, Integer]],
      java.util.ArrayList[Integer],
      java.util.ArrayList[java.util.ArrayList[Integer]]) = {
    val next = new java.util.ArrayList[java.util.HashMap[Character, Integer]]()
    val fail = new java.util.ArrayList[Integer]()
    val out = new java.util.ArrayList[java.util.ArrayList[Integer]]()
    def addNode(): Int = {
      next.add(new java.util.HashMap[Character, Integer]())
      fail.add(Integer.valueOf(0))
      out.add(new java.util.ArrayList[Integer]())
      next.size() - 1
    }
    addNode() // root
    // trie insertion
    var pi = 0
    while (pi < phrases.length) {
      val p = phrases(pi)
      var cur = 0
      var i = 0
      while (i < p.length) {
        val c = Character.valueOf(p.charAt(i))
        var nxt = next.get(cur).get(c)
        if (nxt == null) {
          nxt = Integer.valueOf(addNode())
          next.get(cur).put(c, nxt)
        }
        cur = nxt.intValue()
        i += 1
      }
      out.get(cur).add(Integer.valueOf(pi))
      pi += 1
    }
    // BFS fail links; merge fail outputs so suffix-phrases surface too
    val queue = new java.util.ArrayDeque[Integer]()
    next.get(0).forEach { (_, v) => fail.set(v.intValue(), 0); queue.add(v) }
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      next.get(u).forEach { (c, v) =>
        var f = fail.get(u).intValue()
        while (f != 0 && next.get(f).get(c) == null) f = fail.get(f).intValue()
        val target = next.get(f).get(c)
        val fv = if (target != null && target.intValue() != v.intValue())
          target.intValue() else 0
        fail.set(v.intValue(), fv)
        out.get(v.intValue()).addAll(out.get(fv))
        queue.add(v)
      }
    }
    (next, fail, out)
  }

  /** Sorted distinct matched phrases, comma-joined ("" = none). */
  def hits(text: UTF8String): UTF8String = {
    val s = text.toString
    val hit = new Array[Boolean](phrases.length)
    var cur = 0
    var i = 0
    while (i < s.length) {
      val c = Character.valueOf(s.charAt(i))
      while (cur != 0 && next.get(cur).get(c) == null)
        cur = fail.get(cur).intValue()
      val nxt = next.get(cur).get(c)
      cur = if (nxt == null) 0 else nxt.intValue()
      val o = out.get(cur)
      var j = 0
      while (j < o.size()) { hit(o.get(j).intValue()) = true; j += 1 }
      i += 1
    }
    val sb = new java.lang.StringBuilder()
    var k = 0
    while (k < sortedIdx.length) {
      val idx = sortedIdx(k)
      if (hit(idx)) {
        if (sb.length() > 0) sb.append(',')
        sb.append(phrases(idx))
      }
      k += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** Codegen'd multi-phrase matcher — see [[PhraseFunctions.phraseHits]]. */
case class PhraseHitsExpression(
    child: Expression,
    phrases: IndexedSeq[String]) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def prettyName: String = "phrase_hits"

  override def stringArgs: Iterator[Any] =
    Iterator(child, s"phrases[${phrases.length}]")

  @transient private lazy val automaton = new PhraseAutomaton(phrases.toArray)

  override def nullSafeEval(input: Any): Any =
    automaton.hits(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("phraseAutomaton", automaton,
      classOf[PhraseAutomaton].getName)
    defineCodeGen(ctx, ev, c => s"$ref.hits($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
