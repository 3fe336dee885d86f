package graft.queries

/** DuckDB oracle SQL for the corpus-trained BPE tokenizer
  * ([[graft.pipeline.Bpe]]).
  *
  * Training is replayed EXACTLY, round by round: the word-frequency
  * vocabulary (top `MaxWords` by count DESC, word ASC), then `NumMerges`
  * unrolled merge rounds. Each round's CTEs re-split every vocabulary
  * word's current segmentation (symbols joined as `␟sym␟` runs with
  * chr(31) separators — identical wrapping to the Spark side), count
  * adjacent pairs weighted by word frequency, pick the argmax with the
  * (count DESC, left ASC, right ASC) tie-break, and rewrite all
  * segmentations with a plain `replace` — whose left-to-right
  * non-overlapping semantics match Spark's `StringReplace` exactly (both
  * validated on the `aaa + (a,a) → [aa, a]` probe). A `coalesce(…,
  * chr(30))` guard turns the rewrite into a no-op if a round has no pairs
  * left, mirroring the driver loop's early stop.
  *
  * Application then replays the same `replace` chain in rank order over
  * every word occurrence. Symbols are `[a-z]` only (the tokenizer's
  * pre-split), so DuckDB's binary string ordering and Scala's UTF-16
  * comparison agree on every tie-break. */
object BpeSql {

  /** Pinned training parameters — must match the `bpe_vocab` /
    * `bpe_tokenize` queries. */
  val NumMerges = 32
  val MaxWords = 256

  private def wrap(w: String): String =
    s"regexp_replace($w, '(.)', chr(31) || '\\1' || chr(31), 'g')"

  /** Pattern / replacement for round r's winning pair, no-op when the
    * round produced none. */
  private def pat(r: Int): String =
    s"coalesce((SELECT chr(31)||lft||chr(31)||chr(31)||rgt||chr(31) FROM b$r), chr(30))"
  private def rep(r: Int): String =
    s"coalesce((SELECT chr(31)||lft||rgt||chr(31) FROM b$r), chr(30))"

  /** Shared CTE chain: vocabulary, then NumMerges unrolled merge rounds.
    * Leaves `b0..b{n-1}` (the ranked pairs) and `seg$n` in scope. The
    * per-round CTEs are `MATERIALIZED`: each `seg` round is referenced
    * multiple times downstream, and DuckDB's default inlining would
    * otherwise expand the chain exponentially (it exhausts file handles
    * re-opening the parquet before it exhausts memory). */
  private lazy val trainCtes: String = {
    val rounds = (0 until NumMerges).map { r =>
      s"""sy$r AS (SELECT f, string_split(trim(seg, chr(31)), chr(31)||chr(31)) AS sy FROM seg$r),
         |px$r AS (SELECT f, sy, unnest(range(len(sy)-1)) AS i FROM sy$r),
         |p$r AS (SELECT sy[CAST(i+1 AS BIGINT)] AS lft, sy[CAST(i+2 AS BIGINT)] AS rgt,
         |  sum(f) AS cnt FROM px$r GROUP BY lft, rgt),
         |b$r AS MATERIALIZED (SELECT lft, rgt FROM p$r ORDER BY cnt DESC, lft ASC, rgt ASC LIMIT 1),
         |seg${r + 1} AS MATERIALIZED (SELECT w, f, replace(seg, ${pat(r)}, ${rep(r)}) AS seg FROM seg$r)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH occ AS (
       |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
       |  FROM documents),
       |vocab AS (
       |  SELECT w, count(*) AS f FROM occ GROUP BY w
       |  ORDER BY f DESC, w ASC LIMIT $MaxWords),
       |seg0 AS (SELECT w, f, ${wrap("w")} AS seg FROM vocab),
       |$rounds""".stripMargin
  }

  /** The trained merge table: (rank, lft, rgt). */
  lazy val bpeVocabSql: String = {
    val union = (0 until NumMerges).map { r =>
      s"SELECT $r AS rank, lft, rgt FROM b$r"
    }.mkString("\nUNION ALL ")
    s"""$trainCtes
       |SELECT * FROM (
       |$union
       |) ORDER BY rank""".stripMargin
  }

  /** Training plus per-document application: leaves `base` (doc_id,
    * n_words) and `cnt` (doc_id, n_bpe for docs with ≥1 word) in scope —
    * every word occurrence pushed through the rank-ordered replace chain,
    * symbol count = chr(31)-count / 2, summed per document. */
  private[queries] lazy val perDocCtes: String = {
    val chain = (0 until NumMerges).foldLeft(wrap("w")) { (acc, r) =>
      s"replace($acc, ${pat(r)}, ${rep(r)})"
    }
    s"""$trainCtes,
       |app AS (SELECT doc_id, $chain AS seg FROM occ),
       |cnt AS (SELECT doc_id,
       |  CAST(sum((length(seg) - length(replace(seg, chr(31), ''))) // 2) AS INTEGER) AS n_bpe
       |  FROM app GROUP BY doc_id),
       |base AS (SELECT doc_id,
       |  CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS INTEGER) AS n_words
       |  FROM documents)""".stripMargin
  }

  /** Per-document token counts: (doc_id, n_words, n_bpe); documents with
    * no `[a-z]+` words keep n_bpe = 0 via the left join. */
  lazy val bpeTokenizeSql: String =
    s"""$perDocCtes
       |SELECT base.doc_id, n_words, CAST(coalesce(n_bpe, 0) AS INTEGER) AS n_bpe
       |FROM base LEFT JOIN cnt USING (doc_id)""".stripMargin

  /** Sequence packing with the budget denominated in BPE tokens —
    * [[graft.pipeline.Pack.packSequences]] with the trained model's
    * counter, budget 512. Same prefix-sum arithmetic as the
    * `pack_sequences` oracle, over n_bpe instead of whitespace counts. */
  lazy val packSequencesBpeSql: String =
    s"""$perDocCtes,
       |tok AS (SELECT base.doc_id, CAST(coalesce(n_bpe, 0) AS INTEGER) AS tokens
       |        FROM base LEFT JOIN cnt USING (doc_id))
       |SELECT doc_id, tokens,
       |  CAST(sum(tokens) OVER (ORDER BY doc_id) AS BIGINT) AS cum_tokens,
       |  CAST((sum(tokens) OVER (ORDER BY doc_id) - tokens) // 512 AS BIGINT) AS seq_id
       |FROM tok""".stripMargin

  /** Must match the `chunk_docs_bpe` query. */
  val ChunkBudget = 48

  /** Model-token-budgeted chunking ([[graft.pipeline.Chunking.chunkBpe]]):
    * whitespace tokens of each document priced by the replayed merge
    * chain over their lowercase [a-z]+ runs, then Pack's greedy rule per
    * document — word joins chunk (cum_before // budget); chunk rows are
    * the grouped words in order. */
  lazy val chunkDocsBpeSql: String = {
    val chain = (0 until NumMerges).foldLeft(wrap("r")) { (acc, k) =>
      s"replace($acc, ${pat(k)}, ${rep(k)})"
    }
    s"""$trainCtes,
       |dtoks AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(trim(text), '\\s+'),
       |                x -> x <> '') AS t
       |  FROM documents),
       |dwords AS (
       |  SELECT doc_id,
       |    unnest(range(1, len(t) + 1)) AS pos,
       |    unnest(t) AS word
       |  FROM dtoks),
       |druns AS (
       |  SELECT doc_id, pos,
       |    unnest(regexp_extract_all(lower(word), '[a-z]+')) AS r
       |  FROM dwords),
       |dseg AS (SELECT doc_id, pos, $chain AS seg FROM druns),
       |dcost0 AS (
       |  SELECT doc_id, pos,
       |    CAST(sum((length(seg) - length(replace(seg, chr(31), ''))) // 2)
       |      AS INTEGER) AS cost
       |  FROM dseg GROUP BY doc_id, pos),
       |dcost AS (
       |  SELECT w.doc_id, w.pos, w.word,
       |    coalesce(c.cost, 0) AS cost
       |  FROM dwords w LEFT JOIN dcost0 c ON w.doc_id = c.doc_id AND w.pos = c.pos),
       |dchunk AS (
       |  SELECT doc_id, pos, word, cost,
       |    CAST((sum(cost) OVER (PARTITION BY doc_id ORDER BY pos) - cost)
       |      // $ChunkBudget AS INTEGER) AS chunk_id
       |  FROM dcost)
       |SELECT doc_id, chunk_id,
       |  CAST(sum(cost) AS INTEGER) AS n_tokens,
       |  string_agg(word, ' ' ORDER BY pos) AS chunk_text
       |FROM dchunk
       |GROUP BY doc_id, chunk_id
       |ORDER BY doc_id, chunk_id""".stripMargin
  }
}
