package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Document chunking for LLM training/retrieval pipelines: split each
  * document into fixed token-budget chunks with a fixed-token overlap
  * (the standard pre-tokenization step before sequence packing, and the
  * unit of retrieval indexing).
  *
  * Shape at 100 TB: pure per-row compute — tokenize, compute the chunk
  * count with integer arithmetic, explode one slice per chunk — all
  * codegen'd column expressions on the scan, NO shuffle (chunks inherit
  * their document's partition, which is what a downstream embedding or
  * packing stage wants anyway). Output size is input size × (1 +
  * overlap/stride) — the only data amplification is the overlapped
  * tokens themselves.
  */
object Chunking {

  /** Explode `text` into chunks of at most `chunkSize` whitespace tokens,
    * consecutive chunks sharing `overlap` tokens. Chunk starts step by
    * `stride = chunkSize - overlap`; the number of chunks is
    * `ceil(max(n - overlap, 1) / stride)` — computed with integer
    * arithmetic (`(x + stride - 1) div stride`), not double ceil, so no
    * rounding edge can add or drop a chunk. Documents with zero tokens
    * produce zero chunks. The final chunk may be shorter than `chunkSize`;
    * every token belongs to at least one chunk.
    *
    * Output: (id, chunk_id int, n_tokens int, chunk_text string).
    */
  def chunkTokens(
      df: DataFrame,
      id: Column,
      text: Column,
      chunkSize: Int,
      overlap: Int): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive: $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize): $overlap")
    val stride = chunkSize - overlap
    df.select(id.as("id"), TextFunctions.tokens(text).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") > 0)
      .withColumn("__k", // integer DIV: no double-rounding edge
        expr(s"CAST((greatest(__n - $overlap, 1) + ${stride - 1}) " +
          s"DIV $stride AS INT)"))
      .select(col("id"), posexplode(transform(
        sequence(lit(0), col("__k") - 1),
        i => slice(col("__toks"), i * stride + 1, lit(chunkSize)))))
      .select(col("id"), col("pos").cast("int").as("chunk_id"),
        size(col("col")).as("n_tokens"),
        array_join(col("col"), " ").as("chunk_text"))
  }

  /** [[chunkTokens]] with the budget denominated in REAL model tokens: a
    * trained [[Bpe.BpeModel]] prices every word (sum of BPE pieces over
    * its lowercase `[a-z]+` runs — exactly `BpeModel.tokenCount`'s
    * per-word contribution) and words fill chunks greedily under
    * `budget`: a word joins the chunk its CUMULATIVE cost starts in
    * ([[Pack.packSequences]]' rule at word granularity — words never
    * split, a chunk may overflow by its last word, a word pricier than
    * the whole budget owns its start chunk, so chunk ids can skip).
    * No overlap — a fixed-token overlap is ill-defined when word costs
    * vary; re-chunk with [[chunkTokens]] if overlap matters more than
    * exact model-token budgets.
    *
    * Whitespace-token budgets under-count model tokens ~1.3–1.7× on
    * English, so [[chunkTokens]] at `chunkSize` = the model context
    * OVERFILLS it; this is the corrected pipeline, and the
    * `CurationConfig` chunk budget should be read as model-token-
    * denominated when this chunker is in play.
    *
    * Same 100 TB shape as [[chunkTokens]]: ONE codegen'd row-local pass
    * (the merge table rides as a plan reference object), no shuffle.
    * Output: (id, chunk_id int, n_tokens int — model tokens, chunk_text).
    */
  def chunkBpe(
      df: DataFrame,
      id: Column,
      text: Column,
      model: Bpe.BpeModel,
      budget: Int): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    df.select(id.as("id"),
        explode(graft.functions.BpeFunctions.chunks(
          text, model.merges, Bpe.Sep, budget)).as("__c"))
      .select(col("id"), col("__c.chunk_id").as("chunk_id"),
        col("__c.n_tokens").as("n_tokens"),
        col("__c.chunk_text").as("chunk_text"))
  }
}
