package graft.functions

import org.apache.spark.sql.{Column, GraftInternal}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** The DSIR importance-weight fold: sum a per-bucket log-ratio table over a
  * document's hashed-gram bucket array, as ONE codegen'd expression whose
  * plan size is O(1) in the number of buckets.
  *
  * The published method [Xie et al., "Data Selection for Language Models
  * via Importance Resampling", NeurIPS 2023, arXiv:2302.03169] uses 10k
  * hashed-n-gram buckets; embedding a 10k-double table as a `CreateArray`
  * literal with per-gram `element_at` would bloat the generated code and
  * the optimizer's constant-folding passes. Like
  * [[BpeFunctions.segment]]'s merge table, the λ table instead rides along
  * as one plan reference object ([[CodegenContext.addReferenceObj]]), and
  * the generated code is a single static-shaped call per row — the fold
  * stays inside whole-stage codegen at any bucket count.
  *
  * The fold visits the bucket array in element order, so the result is a
  * deterministic IEEE double (replay/retry-safe, engine-replayable).
  */
object DsirFunctions {

  /** Σ table(b) over an `array<int>` bucket column, folded in element
    * order; null elements are skipped, a null array yields null. */
  def bucketLogSum(buckets: Column, table: Array[Double]): Column =
    GraftInternal.column(
      BucketLogSumExpression(GraftInternal.expression(buckets),
        table.toIndexedSeq))

  /** Hashed-gram bucket ids of a text column (`array<int>`): lowercase
    * whitespace unigrams then adjacent bigrams ("w1 w2"), FNV-1a 64 mod
    * `nBuckets`, in document order — ONE codegen'd pass. The declarative
    * spelling (`transform(grams, g => pmod(fingerprint64(g), B))`) is
    * semantically identical (spec-pinned) but Spark's higher-order
    * functions are CodegenFallback: they would drop the whole scoring
    * projection out of whole-stage codegen on the 100 TB path. */
  def gramBuckets(text: Column, nBuckets: Int): Column =
    GraftInternal.column(
      DsirBucketsExpression(GraftInternal.expression(text), nBuckets))
}

/** The tokenize → gram → FNV → bucket pass, shipped to executors as one
  * plan reference object. Callable from generated code. */
final class DsirHasher(nBuckets: Int) extends Serializable {
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  /** Bucket ids: unigrams in order, then bigrams in order — exactly the
    * gram stream of `concat(tokens, bigrams)` over NON-EMPTY tokens.
    *
    * Tokenization replicates the declarative reference path
    * ([[graft.pipeline.Dsir.grams]]) operator-for-operator so the two
    * bucket streams agree on EVERY input, not just the fixtures:
    * `UTF8String.toLowerCase` is Spark's own `lower()` (locale-
    * independent — `String.toLowerCase` would diverge under e.g. a
    * Turkish default locale), `UTF8String.trim` is Spark's `trim()`
    * (spaces only — `String.trim` also strips \t/\n, changing the token
    * stream for leading-tab text), and the limit=-1 split is Spark's
    * `split()`. Empty tokens (leading/trailing non-space whitespace) are
    * then dropped, matching the declarative filter and the oracle's
    * `list_filter(..., x -> x <> '')`. */
  def buckets(text: UTF8String): ArrayData = {
    val t = text.toLowerCase.trim
    if (t.numBytes == 0) return new GenericArrayData(Array.emptyIntArray)
    val toks = t.toString.split("\\s+", -1).filter(_.nonEmpty)
    val n = toks.length
    val out = new Array[Int](if (n < 2) n else 2 * n - 1)
    var i = 0
    while (i < n) { out(i) = bucket(toks(i)); i += 1 }
    i = 0
    while (i < n - 1) { out(n + i) = bucket(toks(i) + " " + toks(i + 1)); i += 1 }
    new GenericArrayData(out)
  }

  private def bucket(gram: String): Int =
    java.lang.Math.floorMod(
      TextFunctions.fnv1a64(UTF8String.fromString(gram)), nBuckets.toLong).toInt
}

/** Codegen'd hashed-gram bucket ids over a StringType column — see
  * [[DsirFunctions.gramBuckets]]. */
case class DsirBucketsExpression(
    child: Expression,
    nBuckets: Int) extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false)

  override def prettyName: String = "dsir_gram_buckets"

  @transient private lazy val hasher = new DsirHasher(nBuckets)

  override def nullSafeEval(input: Any): Any =
    hasher.buckets(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dsirHasher", hasher, classOf[DsirHasher].getName)
    defineCodeGen(ctx, ev, c => s"$ref.buckets($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The λ table + fold loop, shipped to executors once per task as a plan
  * reference object. Callable from generated code. */
final class DsirTable(table: Array[Double]) extends Serializable {
  /** Ordered fold of table values over the bucket ids in `arr`. */
  def fold(arr: ArrayData): Double = {
    var acc = 0.0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) acc += table(arr.getInt(i))
      i += 1
    }
    acc
  }
}

/** Codegen'd table-fold over an `array<int>` bucket column — see
  * [[DsirFunctions.bucketLogSum]]. */
case class BucketLogSumExpression(
    child: Expression,
    table: IndexedSeq[Double]) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "bucket_log_sum"

  /** Keep plans readable: a 10k-bucket λ table must not be printed
    * element-by-element into every explain/treeString. */
  override def stringArgs: Iterator[Any] =
    Iterator(child, s"λ[${table.length}]")

  @transient private lazy val t = new DsirTable(table.toArray)

  override def nullSafeEval(input: Any): Any =
    t.fold(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dsirTable", t, classOf[DsirTable].getName)
    defineCodeGen(ctx, ev, c => s"$ref.fold($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
