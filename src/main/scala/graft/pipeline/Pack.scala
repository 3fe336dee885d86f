package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.TextFunctions

/** Sequence packing for LLM training pipelines: assign documents, in a
  * deterministic corpus order, to fixed token-budget training sequences.
  *
  * The core is a DISTRIBUTED PREFIX SUM. The naive Spark spelling —
  * `sum(w).over(Window.orderBy(ord))` with no partition — funnels the whole
  * corpus through one task (the exact scale-killer
  * [[graft.core.log.LogWriter.assignOffsets]] exists to avoid). Instead the
  * same two-phase, single-lineage shape is used:
  *
  *   1. range-partition + sort by `ord` (one shuffle — tasks are globally
  *      ordered, rows sorted within each);
  *   2. job 1: per-task weight totals — numTasks longs to the driver
  *      (metadata-scale at any corpus size: 10k tasks = 10k longs);
  *   3. job 2: per-task running sum seeded by the exclusive scan of those
  *      totals, over the SAME RDD lineage — Spark reuses job 1's shuffle
  *      files (skipped stage), so both passes see the identical layout by
  *      construction. Two independent `repartitionByRange` plans would
  *      not: the RangePartitioner's sampling seed is RDD-id-dependent.
  */
object Pack {

  /** Running total of `weight` in `ord` order, as a new column `out`
    * (INCLUSIVE: a row's value covers itself). Null weights count 0.
    *
    * `ord` should be unique (ties land in one task and sort arbitrarily
    * among themselves, making their relative running totals
    * nondeterministic — totals after the tie group are unaffected).
    *
    * @param parallelism fixed range-task count (tests); None = session
    *                    shuffle partitions
    */
  def prefixSum(
      df: DataFrame,
      ord: Column,
      weight: Column,
      out: String,
      parallelism: Option[Int] = None): DataFrame = {
    val spark = df.sparkSession
    val in = df.withColumn("__graft_w", coalesce(weight.cast("long"), lit(0L)))
    val ranged = (parallelism match {
      case Some(k) => in.repartitionByRange(k, ord)
      case None => in.repartitionByRange(ord)
    }).sortWithinPartitions(ord)
    val schema = ranged.schema
    val wIdx = schema.fieldIndex("__graft_w")
    // One lineage over the UNSAFE rows (queryExecution.toRdd): the seeded
    // pass reuses the totals job's shuffle AND neither pass pays the
    // external-Row decode — `.rdd` would deserialize every column of every
    // record twice (totals + sum) and re-encode once; the identical switch
    // saved ~15% of the produce path in
    // [[graft.core.log.LogWriter.assignOffsets]].
    val rdd = ranged.queryExecution.toRdd
    val totals: Array[Long] = rdd
      .mapPartitionsWithIndex { (i, it) =>
        var s = 0L
        it.foreach(r => s += r.getLong(wIdx))
        Iterator((i, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val starts = totals.scanLeft(0L)(_ + _) // exclusive per-task offsets
    val bStarts = spark.sparkContext.broadcast(starts)
    val outSchema = schema.add(out, LongType, nullable = false)
    val summed = rdd.mapPartitionsWithIndex { (i, it) =>
      import org.apache.spark.sql.catalyst.expressions.{
        GenericInternalRow, JoinedRow, UnsafeProjection}
      var run = bStarts.value(i)
      // append the running total with an unsafe projection over
      // (row ++ [run]) — no per-row Seq/Row allocation; the projection's
      // reused buffer is safe for the immediate narrow consumer
      val proj = UnsafeProjection.create(outSchema)
      val extra = new GenericInternalRow(1)
      val joined = new JoinedRow()
      it.map { r =>
        run += r.getLong(wIdx)
        extra.update(0, run)
        proj(joined(r, extra)): org.apache.spark.sql.catalyst.InternalRow
      }
    }
    org.apache.spark.sql.GraftInternal
      .internalCreateDataFrame(spark, summed, outSchema)
      .drop("__graft_w")
  }

  /** Greedy in-order packing: document `d` joins the sequence in which it
    * STARTS — `seq_id = (cum_before d) div budget`. Documents are never
    * split, so a sequence may overflow past `budget` by (at most) its last
    * document's length; a document longer than `budget` owns its start
    * sequence outright. Deterministic given unique `id`, and embarrassingly
    * SQL-checkable: `seq_id = (sum(tokens) over (order by id) - tokens) //
    * budget`.
    *
    * Output: `doc_id`, `tokens` (by `tokenCount` — whitespace
    * [[TextFunctions.tokenCount]] by default; pass a trained
    * [[Bpe.BpeModel]]`.tokenCount` to budget in real subword tokens),
    * `cum_tokens` (inclusive running total), `seq_id`.
    */
  def packSequences(
      docs: DataFrame,
      id: Column,
      text: Column,
      budget: Long,
      parallelism: Option[Int] = None,
      tokenCount: Column => Column = TextFunctions.tokenCount): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val withTokens = docs.select(
      id.as("doc_id"), tokenCount(text).as("tokens"))
    prefixSum(withTokens, col("doc_id"), col("tokens"), "cum_tokens", parallelism)
      .withColumn("seq_id", expr(s"(cum_tokens - tokens) div $budget"))
  }
}
