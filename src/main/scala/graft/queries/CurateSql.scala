package graft.queries

/** DuckDB oracle for the COMPOSED curation pipeline
  * ([[graft.streaming.Curation.curateBatch]]) — gopher quality filter →
  * token-budget chunking → incremental LSH dedup against a standing
  * chunk index → surviving chunks.
  *
  * The replay stitches three already-validated oracle fragments into one
  * statement, in the exact order the Spark composition runs them:
  *
  *   1. `pass`: the gopher predicate of the `gopher_filters` oracle
  *      (corpus-overridden token band [30, 90], published ratios compared
  *      at 6 dp);
  *   2. `chunks`: the `chunk_docs` explode (64-token chunks, 16 overlap,
  *      integer-arithmetic chunk counts) with the packed chunk uid
  *      (`src·4096 + chunk`, [[graft.streaming.Curation.chunkUid]]);
  *   3. the [[LshSql]] MinHash chain over the chunk texts, split
  *      corpus/batch on the SOURCE doc id (`% 4`, the `dedup_incremental`
  *      convention): batch chunks with a verified near-dup in the corpus
  *      index drop first (probe), the remainder dedups within itself
  *      (keep-lowest-uid, bucket guard over the remainder only — the
  *      [[graft.pipeline.Dedup.minhashDedup]]-after-probe sequencing of
  *      [[graft.pipeline.LshIndex.ingestBatch]]).
  *
  * Output: (chunk_uid, doc_id, chunk_id, n_tokens, chunk_text) — the
  * curated survivors, ordered. */
object CurateSql {

  lazy val curatePipelineSql: String =
    s"""WITH gtok AS (
       |  SELECT doc_id, text,
       |    CASE WHEN len(trim(text)) = 0 THEN []
       |         ELSE string_split_regex(trim(text), '\\s+') END AS t
       |  FROM documents),
       |pass AS (
       |  SELECT doc_id, text, t FROM gtok
       |  WHERE len(t) BETWEEN 30 AND 90
       |    AND round(CAST(list_aggregate(list_transform(t, x -> len(x)), 'sum')
       |          AS DOUBLE) / CAST(len(t) AS DOUBLE), 6) BETWEEN 3.0 AND 10.0
       |    AND round(CAST(len(list_filter(t, x -> regexp_matches(x, '[a-z]')))
       |          AS DOUBLE) / CAST(len(t) AS DOUBLE), 6) >= 0.8
       |    AND len(list_intersect(list_distinct(t),
       |          ['the', 'a', 'of', 'and', 'in', 'to', 'is'])) >= 2),
       |cx AS (
       |  SELECT doc_id AS src, t,
       |    unnest(range((greatest(len(t) - 16, 1) + 47) // 48)) AS cid
       |  FROM pass),
       |chunks AS (
       |  SELECT src * 4096 + cid AS doc_id, src,
       |    CAST(cid AS INTEGER) AS chunk_id,
       |    CAST(len(t[cid*48 + 1 : cid*48 + 64]) AS INTEGER) AS n_tokens,
       |    array_to_string(t[cid*48 + 1 : cid*48 + 64], ' ') AS chunk_text
       |  FROM cx),
       |cdocs AS (SELECT doc_id, chunk_text AS text FROM chunks),
       |${LshSql.minhashKeysBody("cdocs")},
       |ok AS (
       |  SELECT band, key FROM keys WHERE (doc_id // 4096) % 4 <> 0
       |  GROUP BY band, key HAVING count(*) <= 2000),
       |ckept AS (
       |  SELECT k.* FROM keys k JOIN ok USING (band, key)
       |  WHERE (k.doc_id // 4096) % 4 <> 0),
       |cdup AS (
       |  SELECT DISTINCT b.doc_id AS bid
       |  FROM ckept c JOIN keys b
       |    ON c.band = b.band AND c.key = b.key AND (b.doc_id // 4096) % 4 = 0
       |  JOIN szs sb ON sb.doc_id = b.doc_id
       |  JOIN szs sc ON sc.doc_id = c.doc_id
       |  WHERE CAST(len(list_intersect(sb.shingles, sc.shingles)) AS DOUBLE) /
       |    CAST(sb.n + sc.n - len(list_intersect(sb.shingles, sc.shingles))
       |      AS DOUBLE) >= 0.6),
       |clean AS (
       |  SELECT doc_id FROM chunks
       |  WHERE (doc_id // 4096) % 4 = 0
       |    AND doc_id NOT IN (SELECT bid FROM cdup)),
       |wok AS (
       |  SELECT band, key FROM keys k JOIN clean USING (doc_id)
       |  GROUP BY band, key HAVING count(*) > 1 AND count(*) <= 2000),
       |wkept AS (
       |  SELECT k.* FROM keys k JOIN clean USING (doc_id)
       |  JOIN wok USING (band, key)),
       |losers AS (
       |  SELECT DISTINCT b.doc_id AS lid
       |  FROM wkept a JOIN wkept b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
       |  JOIN szs sa ON sa.doc_id = a.doc_id
       |  JOIN szs sb2 ON sb2.doc_id = b.doc_id
       |  WHERE CAST(len(list_intersect(sa.shingles, sb2.shingles)) AS DOUBLE) /
       |    CAST(sa.n + sb2.n - len(list_intersect(sa.shingles, sb2.shingles))
       |      AS DOUBLE) >= 0.6)
       |SELECT c.doc_id AS chunk_uid, c.src AS doc_id, c.chunk_id,
       |  c.n_tokens, c.chunk_text
       |FROM chunks c JOIN clean USING (doc_id)
       |WHERE c.doc_id NOT IN (SELECT lid FROM losers)
       |ORDER BY chunk_uid""".stripMargin
}
