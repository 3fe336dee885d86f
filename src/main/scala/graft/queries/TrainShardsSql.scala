package graft.queries

/** DuckDB oracle for the train-shard emitter
  * ([[graft.pipeline.TrainShards]]): the WHOLE terminal composition —
  * BPE-denominated token counts ([[BpeSql.perDocCtes]], the exact
  * rank-ordered replace-chain replay), xxhash64 shuffle-sharding
  * ([[XxHash64Sql.shuffleShardCtes]], exact HUGEINT arithmetic), per-shard
  * greedy packing (the `pack_sequences` window arithmetic partitioned by
  * shard), and the ordered sequence roll-up — replayed as ONE statement,
  * the same "compose the proven fragments" move as
  * [[CurateSql.curatePipelineSql]].
  *
  * All outputs are integers/strings, so no float-rounding contract is
  * needed; `string_agg(..., ' ' ORDER BY pos)` mirrors the Spark side's
  * sorted-struct concat exactly (pos is unique within a shard). */
object TrainShardsSql {

  /** Must match the `train_shards` query. */
  val Budget = 512
  val NumShards = 8
  val Seed = 7L

  lazy val trainShardsSql: String = {
    val (shardCtes, shardLast) =
      XxHash64Sql.shuffleShardCtes("ts", NumShards, Seed)
    // perDocCtes starts with WITH and leaves base (doc_id, n_words) and
    // cnt (doc_id, n_bpe — only docs with >=1 word) in scope
    s"""${BpeSql.perDocCtes},
       |$shardCtes,
       |tstok AS (
       |  SELECT base.doc_id, CAST(coalesce(n_bpe, 0) AS INTEGER) AS n_tok
       |  FROM base LEFT JOIN cnt USING (doc_id)),
       |tsrows AS (
       |  SELECT p.shard, p.pos, t.doc_id, t.n_tok, d.text
       |  FROM $shardLast p
       |  JOIN tstok t USING (doc_id)
       |  JOIN documents d USING (doc_id)),
       |tsseq AS (
       |  SELECT shard, pos, doc_id, n_tok, text,
       |    CAST((sum(n_tok) OVER (PARTITION BY shard ORDER BY pos)
       |          - n_tok) // $Budget AS BIGINT) AS seq_id
       |  FROM tsrows)
       |SELECT shard, seq_id,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_tok) AS BIGINT) AS seq_tokens,
       |  string_agg(text, ' ' ORDER BY pos) AS seq_text
       |FROM tsseq
       |GROUP BY shard, seq_id
       |ORDER BY shard, seq_id""".stripMargin
  }
}
