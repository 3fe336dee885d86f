package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.catalog.Warehouse
import graft.core.log.LogReader
import graft.functions.TextFunctions

/** The END of the training-data pipeline: curated documents → global
  * shuffle → token-budget sequence packing → deterministic training-shard
  * files. Every training run needs this step after curation, and like the
  * curation composition it is where determinism bugs hide — so the whole
  * chain is one declarative plan with an exact DuckDB oracle
  * ([[graft.queries.TrainShardsSql]]).
  *
  * Order of operations is the standard pretraining one: shuffle FIRST
  * ([[Sampling.shuffleShards]] — destroying crawl/source locality so every
  * shard is an unbiased corpus sample), THEN pack greedily in the shuffled
  * order ([[Pack.packSequences]]' arithmetic, per shard). Packing per
  * shard rather than globally means sequences never span shard files and —
  * the scale point — there is NO global prefix sum at all:
  *
  *   - ONE hash exchange on `shard` covers everything: the within-shard
  *     `pos` ranking, the running-token window, and the sequence roll-up
  *     all reuse it (`HashPartitioning(shard)` satisfies the groupBy's
  *     `(shard, seq_id)` clustering — spec-pinned single-exchange plan);
  *   - per-shard sorts are shard-sized (thousands of shards at 100 TB ⇒
  *     memory-sized sorts) and a skewed shard is impossible by
  *     construction (ids hash uniformly);
  *   - the shard files are the write unit: one file per shard directory,
  *     rows in (seq_id) order — two runs over the same corpus produce
  *     byte-identical training data (spec-pinned).
  *
  * Budgets default to whitespace tokens; hand a trained
  * [[Bpe.BpeModel]]`.tokenCount` to denominate in real subword tokens
  * (the corrected pipeline — whitespace under-counts ~1.3–1.7× on
  * English). */
object TrainShards {

  /** Shard + sequence assignment: input columns plus `shard` (int),
    * `pos` (int, dense within shard), `n_tok`, and `seq_id` (long, dense
    * within shard) — document `d` joins the sequence in which it STARTS:
    * `seq_id = (cum_before d) div budget`, documents never split, exactly
    * [[Pack.packSequences]]' greedy rule applied per shard in shuffled
    * order. */
  def assign(
      df: DataFrame,
      id: Column,
      text: Column,
      budget: Long,
      numShards: Int,
      seed: Long,
      tokenCount: Column => Column = TextFunctions.tokenCount): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    require(numShards > 0, s"numShards must be positive: $numShards")
    val sharded = Sampling.shuffleShards(df, id, numShards, seed)
      .withColumn("n_tok", tokenCount(text))
    // same partitioning as the pos window — no second exchange
    val w = Window.partitionBy(col("shard")).orderBy(col("pos"))
    sharded
      .withColumn("__cum", sum(col("n_tok")).over(w))
      .withColumn("seq_id", expr(s"(__cum - n_tok) div $budget"))
      .drop("__cum")
  }

  /** Roll [[assign]] up into training sequences: one row per (shard,
    * seq_id) with the documents concatenated in shuffled order —
    * (shard, seq_id, n_docs, seq_tokens, seq_text). Runs in the SAME
    * exchange as the assignment (hash(shard) already clusters
    * (shard, seq_id)). */
  def sequences(
      df: DataFrame,
      id: Column,
      text: Column,
      budget: Long,
      numShards: Int,
      seed: Long,
      tokenCount: Column => Column = TextFunctions.tokenCount): DataFrame = {
    val textName = "__ts_text"
    val assigned = assign(df.withColumn(textName, text), id, col(textName),
      budget, numShards, seed, tokenCount)
    assigned
      .groupBy(col("shard"), col("seq_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("seq_tokens"),
        // collect_list order is nondeterministic; the (pos, text) struct
        // sort restores the shuffled order before the join
        concat_ws(" ",
          transform(
            array_sort(collect_list(struct(col("pos"), col(textName)))),
            s => s(textName))).as("seq_text"))
  }

  /** Write the training shards under `outDir`: `shard=N/` directories,
    * ONE file per shard (each shard lives wholly in one task of the hash
    * exchange), rows in `seq_id` order — rerunning over the same corpus
    * reproduces the files exactly. Returns the sequence count. */
  def emit(
      df: DataFrame,
      id: Column,
      text: Column,
      outDir: String,
      budget: Long,
      numShards: Int,
      seed: Long,
      tokenCount: Column => Column = TextFunctions.tokenCount): Long = {
    val seqs = sequences(df, id, text, budget, numShards, seed, tokenCount)
      .sortWithinPartitions(col("shard"), col("seq_id"))
      .persist()
    seqs.write.mode("overwrite").partitionBy("shard").parquet(outDir)
    val n = seqs.count()
    seqs.unpersist()
    n
  }

  /** The curated-topic form — the composition the streaming curation
    * pipeline feeds: every record of `topic` (the curated chunks) becomes
    * a document, identified by its stable log coordinate
    * ([[graft.streaming.Curation.docId]] packing — replay-stable), its
    * value the text. */
  def emitFromTopic(
      spark: SparkSession,
      wh: Warehouse,
      topic: String,
      outDir: String,
      budget: Long,
      numShards: Int,
      seed: Long,
      tokenCount: Column => Column = TextFunctions.tokenCount): Long = {
    val records = LogReader.scan(spark, wh, topic)
    emit(records,
      graft.streaming.Curation.docId(col("partition"), col("offset")),
      col("value"), outDir, budget, numShards, seed, tokenCount)
  }
}
