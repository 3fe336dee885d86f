package graft.functions

import org.apache.spark.sql.{Column, GraftInternal}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Vocab-scale BPE application: ONE codegen'd expression replays an entire
  * merge table, so plan size is O(1) in the vocabulary.
  *
  * The naive application — one `replace` call per merge
  * ([[graft.pipeline.Bpe.BpeModel.segmentUnrolled]]) — is a fine plan at a
  * demo's 32 merges but collapses at a production tokenizer's 30k–50k: a
  * 30k-deep expression tree breaks whole-stage codegen (the 64KB JVM
  * method limit) and quadratic-ish optimizer passes long before the data
  * is touched. Here the ranked merges ride along as ONE plan reference
  * object ([[CodegenContext.addReferenceObj]] — the same mechanism Spark
  * uses for regex patterns and literals), and the generated code is a
  * single static-shaped call per row regardless of table size.
  *
  * Replay semantics are EXACTLY the rank-order replace chain's (and the
  * DuckDB oracle's): merge rank 0 everywhere (left-to-right,
  * non-overlapping), then rank 1, … Implemented as
  * "merge the minimal-PRESENT rank, repeat", which is identical for any
  * trained table: processing an absent rank is a no-op, and merging rank k
  * can only create pairs involving the new symbol — whose consuming merges
  * were counted AFTER it existed during training, i.e. always rank > k —
  * so no pair with rank < k can (re)appear once passed
  * (rank-consistency; [[graft.pipeline.Bpe.trainFromFreqs]] constructs it,
  * and the spec property-checks the equivalence on random trained tables).
  * Per-word cost is O(len × merges-applied) with table lookups O(1) — the
  * vocabulary size never enters.
  */
object BpeFunctions {

  /** Separator-wrapped segmentation of a word column after replaying the
    * whole merge table: `"lower"` → `"␟l␟␟o␟␟w␟␟er␟"`. */
  def segment(word: Column, merges: Seq[(String, String)], sep: String): Column =
    GraftInternal.column(
      BpeSegmentExpression(GraftInternal.expression(word),
        merges.toIndexedSeq, sep))

  /** Model-token-budgeted chunks of a TEXT column, as ONE codegen'd pass:
    * array<struct<chunk_id int, n_tokens int, chunk_text string>> — see
    * [[graft.pipeline.Chunking.chunkBpe]] for the semantics. */
  def chunks(
      text: Column, merges: Seq[(String, String)], sep: String,
      budget: Int): Column =
    GraftInternal.column(
      BpeChunksExpression(GraftInternal.expression(text),
        merges.toIndexedSeq, sep, budget))
}

/** The rank table + replay loop, shipped to executors once per task as a
  * plan reference object (a few hundred KB at 50k merges — literal-sized,
  * no broadcast round-trip needed). Callable from generated code. */
final class BpeMergeTable(
    left: Array[String],
    right: Array[String],
    sep: String) extends Serializable {

  /** pair → rank; first (lowest) rank wins on duplicates, matching the
    * replay (a later duplicate merge finds nothing left to rewrite). */
  @transient private lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](left.length * 2)
    var i = 0
    while (i < left.length) {
      m.putIfAbsent(left(i) + "\u0000" + right(i), Integer.valueOf(i))
      i += 1
    }
    m
  }

  private def rankOf(l: String, r: String): Int = {
    val v = rank.get(l + "\u0000" + r)
    if (v == null) Int.MaxValue else v.intValue()
  }

  /** Wrapped segmentation of one word — the whole merge replay. */
  def segment(word: String): String = {
    val n = word.length
    if (n == 0) return ""
    val syms = new Array[String](n)
    var i = 0
    while (i < n) { syms(i) = String.valueOf(word.charAt(i)); i += 1 }
    var count = n
    var exhausted = false
    while (!exhausted && count > 1) {
      var best = Int.MaxValue
      var j = 0
      while (j < count - 1) {
        val r = rankOf(syms(j), syms(j + 1))
        if (r < best) best = r
        j += 1
      }
      if (best == Int.MaxValue) exhausted = true
      else {
        val l = left(best)
        val r = right(best)
        val merged = l + r
        // left-to-right non-overlapping sweep — Bpe.mergeOnce / String
        // .replace mirrored exactly
        var w = 0
        var k = 0
        while (k < count) {
          if (k < count - 1 && syms(k) == l && syms(k + 1) == r) {
            syms(w) = merged; k += 2
          } else { syms(w) = syms(k); k += 1 }
          w += 1
        }
        count = w
      }
    }
    val sb = new java.lang.StringBuilder(n * 3)
    var p = 0
    while (p < count) { sb.append(sep).append(syms(p)).append(sep); p += 1 }
    sb.toString
  }

  def segmentUtf8(u: UTF8String): UTF8String =
    UTF8String.fromString(segment(u.toString))

  /** Post-replay symbol count of one already-lowercased `[a-z]+` run —
    * [[segment]] without materializing the wrapped string. */
  private def pieceCount(run: String): Int = {
    val n = run.length
    if (n == 0) return 0
    val syms = new Array[String](n)
    var i = 0
    while (i < n) { syms(i) = String.valueOf(run.charAt(i)); i += 1 }
    var count = n
    var exhausted = false
    while (!exhausted && count > 1) {
      var best = Int.MaxValue
      var j = 0
      while (j < count - 1) {
        val r = rankOf(syms(j), syms(j + 1))
        if (r < best) best = r
        j += 1
      }
      if (best == Int.MaxValue) exhausted = true
      else {
        val l = left(best)
        val r = right(best)
        val merged = l + r
        var w = 0
        var k = 0
        while (k < count) {
          if (k < count - 1 && syms(k) == l && syms(k + 1) == r) {
            syms(w) = merged; k += 2
          } else { syms(w) = syms(k); k += 1 }
          w += 1
        }
        count = w
      }
    }
    count
  }

  /** Model-token cost of one whitespace token: sum of [[pieceCount]] over
    * the `[a-z]+` runs of its lowercase form — exactly
    * [[graft.pipeline.Bpe.BpeModel.tokenCount]]'s per-word contribution
    * (non-letter characters cost 0, the tokenizer's pre-split). */
  def tokenCost(word: String): Int = {
    val lower = word.toLowerCase(java.util.Locale.ROOT)
    var total = 0
    var i = 0
    val n = lower.length
    while (i < n) {
      val c = lower.charAt(i)
      if (c >= 'a' && c <= 'z') {
        var j = i + 1
        while (j < n && lower.charAt(j) >= 'a' && lower.charAt(j) <= 'z') j += 1
        total += pieceCount(lower.substring(i, j))
        i = j
      } else i += 1
    }
    total
  }

  /** Greedy model-token-budget chunking of a whole text — see
    * [[graft.pipeline.Chunking.chunkBpe]]. Returns one struct per chunk. */
  def chunksUtf8(text: UTF8String, budget: Int)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val t = text.trim().toString
    if (t.isEmpty) return new GenericArrayData(Array.empty[AnyRef])
    val words = t.split("\\s+", -1).filter(_.nonEmpty)
    if (words.isEmpty) return new GenericArrayData(Array.empty[AnyRef])
    val out = new java.util.ArrayList[AnyRef]()
    var cum = 0L
    var curId = -1L
    var curTokens = 0
    val sb = new java.lang.StringBuilder
    def flush(): Unit = if (curId >= 0) {
      out.add(new GenericInternalRow(Array[Any](
        curId.toInt, curTokens, UTF8String.fromString(sb.toString))))
      ()
    }
    var i = 0
    while (i < words.length) {
      val c = tokenCost(words(i))
      val id = cum / budget // the chunk this word STARTS in (Pack's rule)
      if (id != curId) {
        flush()
        curId = id; curTokens = 0; sb.setLength(0)
      }
      if (sb.length > 0) sb.append(' ')
      sb.append(words(i))
      curTokens += c
      cum += c
      i += 1
    }
    flush()
    new GenericArrayData(out.toArray)
  }
}

/** Codegen'd whole-table BPE segmentation over a StringType word column.
  * Generated code is one call via a reference object — whole-stage codegen
  * spans stay intact at any merge count. */
case class BpeSegmentExpression(
    child: Expression,
    merges: IndexedSeq[(String, String)],
    sep: String) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def prettyName: String = "bpe_segment"

  @transient private lazy val table =
    new BpeMergeTable(merges.map(_._1).toArray, merges.map(_._2).toArray, sep)

  override def nullSafeEval(input: Any): Any =
    table.segmentUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table,
      classOf[BpeMergeTable].getName)
    defineCodeGen(ctx, ev, c => s"$ref.segmentUtf8($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd model-token-budget chunking over a StringType text column —
  * see [[graft.pipeline.Chunking.chunkBpe]]. One reference-object call per
  * row; plan size O(1) in the merge count, like [[BpeSegmentExpression]]. */
case class BpeChunksExpression(
    child: Expression,
    merges: IndexedSeq[(String, String)],
    sep: String,
    budget: Int) extends UnaryExpression {

  override def dataType: DataType = {
    import org.apache.spark.sql.types._
    ArrayType(StructType(Seq(
      StructField("chunk_id", IntegerType, nullable = false),
      StructField("n_tokens", IntegerType, nullable = false),
      StructField("chunk_text", StringType, nullable = false))),
      containsNull = false)
  }

  override def prettyName: String = "bpe_chunks"

  /** Keep plans readable at production vocabulary sizes. */
  override def stringArgs: Iterator[Any] =
    Iterator(child, s"merges[${merges.length}]", budget)

  @transient private lazy val table =
    new BpeMergeTable(merges.map(_._1).toArray, merges.map(_._2).toArray, sep)

  override def nullSafeEval(input: Any): Any =
    table.chunksUtf8(input.asInstanceOf[UTF8String], budget)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table,
      classOf[BpeMergeTable].getName)
    defineCodeGen(ctx, ev, c => s"$ref.chunksUtf8($c, $budget)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
