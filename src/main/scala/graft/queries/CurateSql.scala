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

  /** Force every top-level CTE of a composed oracle to `AS MATERIALIZED`:
    * DuckDB inlines plain CTEs per reference, and the composed chains
    * reference `pass`/`keys`/`szs`/the weight CTEs several times each —
    * measured at sf0.01, materialization cuts `curate_pipeline_dsir`
    * 73.5 s → 8.3 s and `curate_pipeline_spans` 56.5 s → 7.8 s with
    * identical results (it is purely an evaluation-strategy hint). The
    * oracle suite's wall time is part of the deliverable (the round-10
    * driver gate died on oracle cost). */
  private def mat(sql: String): String = sql
    .replaceAll("(?m)^WITH ([a-zA-Z_][a-zA-Z0-9_]*) AS \\(",
      "WITH $1 AS MATERIALIZED (")
    .replaceAll("(?m)^([a-zA-Z_][a-zA-Z0-9_]*) AS \\(",
      "$1 AS MATERIALIZED (")

  /** The shared gopher prefix: `gtok` (tokens) and `pass` (gopher-passed
    * docs with their token lists), corpus-overridden band [30, 90]. */
  private val gopherCtes: String =
    s"""gtok AS (
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
       |          ['the', 'a', 'of', 'and', 'in', 'to', 'is'])) >= 2)""".stripMargin

  /** The shared LSH tail: chunk explode over a `ctoks` (doc_id, t)
    * relation, then the corpus-vs-batch probe + within-batch dedup and
    * the final survivor projection — identical machinery in both
    * composed oracles. */
  private val lshTail: String =
    s"""cx AS (
       |  SELECT doc_id AS src, t,
       |    unnest(range((greatest(len(t) - 16, 1) + 47) // 48)) AS cid
       |  FROM ctoks),
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
       |  -- both-empty shingle sets verify at jaccard 1 (Spark's
       |  -- sortedJaccard convention for sub-5-char chunks)
       |  WHERE (sb.n = 0 AND sc.n = 0)
       |    OR CAST(len(list_intersect(sb.shingles, sc.shingles)) AS DOUBLE) /
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
       |  WHERE (sa.n = 0 AND sb2.n = 0)
       |    OR CAST(len(list_intersect(sa.shingles, sb2.shingles)) AS DOUBLE) /
       |    CAST(sa.n + sb2.n - len(list_intersect(sa.shingles, sb2.shingles))
       |      AS DOUBLE) >= 0.6)
       |SELECT c.doc_id AS chunk_uid, c.src AS doc_id, c.chunk_id,
       |  c.n_tokens, c.chunk_text
       |FROM chunks c JOIN clean USING (doc_id)
       |WHERE c.doc_id NOT IN (SELECT lid FROM losers)
       |ORDER BY chunk_uid""".stripMargin

  lazy val curatePipelineSql: String = mat(
    s"""WITH $gopherCtes,
       |ctoks AS (SELECT doc_id, t FROM pass),
       |$lshTail""".stripMargin)

  /** The `extraFilter` hook's threshold in the DSIR-composed query: keep
    * batch docs whose 6-dp-rounded DSIR log importance weight (target =
    * `lang = 'en'`, 256 buckets, fitted on ALL documents) is ≥ 0 — "more
    * target-like than raw", the fitted model-driven selection the hook
    * exists for. Shared by the Spark query and this oracle so both sides
    * decide the boundary on identical doubles. */
  val DsirTau: Double = 0.0

  /** [[curatePipelineSql]] with a fitted DSIR importance filter composed
    * in via `CurationConfig.extraFilter`
    * ([[graft.streaming.Curation.curateBatch]]): batch docs must pass
    * gopher AND carry a rounded log weight ≥ [[DsirTau]] before they
    * chunk; the corpus (index seed) side is unchanged — the standing
    * index predates the model. The weight chain is the `dsir_weights`
    * oracle's CTEs verbatim ([[DsirSql.weightCtes]]); docs the weight
    * join misses (no grams) coalesce to 0.0 exactly as
    * [[graft.pipeline.Dsir.logWeight]]'s empty fold. */
  lazy val curatePipelineDsirSql: String = mat(
    s"""WITH $gopherCtes,
       |${DsirSql.weightCtes},
       |ctoks AS (
       |  SELECT doc_id, t FROM pass WHERE doc_id % 4 <> 0
       |  UNION ALL
       |  SELECT p.doc_id, p.t
       |  FROM pass p LEFT JOIN dw ON p.doc_id = dw.doc_id
       |  WHERE p.doc_id % 4 = 0
       |    AND round(coalesce(dw.logw_raw, 0.0), 6) >= $DsirTau),
       |$lshTail""".stripMargin)

  /** [[curatePipelineSql]] with benchmark DECONTAMINATION composed in via
    * `CurationConfig.extraFilter`: batch docs sharing ANY distinct word
    * 5-gram (lowercased tokens, sub-5-token whole-text fallback — the
    * `decontaminate` oracle's construction) with the `source = 'src0'`
    * benchmark slice drop after gopher, before chunking. Gram membership
    * replays on the gram STRINGS — the Spark gate compares FNV-1a 64
    * fingerprints, identical up to 64-bit hash collisions (none at any
    * tested scale). Corpus (index seed) side is unchanged. */
  lazy val curatePipelineDecontamSql: String = mat(
    s"""WITH $gopherCtes,
       |bg AS (
       |  SELECT DISTINCT unnest(list_distinct(list_transform(
       |    generate_series(0, greatest(len(bt) - 5, 0)),
       |    i -> array_to_string(bt[i + 1 : i + 5], ' ')))) AS g
       |  FROM (SELECT string_split_regex(trim(lower(text)), '\\s+') AS bt
       |        FROM documents WHERE source = 'src0')),
       |dirty AS (
       |  SELECT DISTINCT doc_id FROM (
       |    SELECT doc_id, unnest(list_distinct(list_transform(
       |      generate_series(0, greatest(len(lt) - 5, 0)),
       |      i -> array_to_string(lt[i + 1 : i + 5], ' ')))) AS g
       |    FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS lt
       |          FROM documents WHERE doc_id % 4 = 0))
       |  WHERE g IN (SELECT g FROM bg)),
       |ctoks AS (
       |  SELECT doc_id, t FROM pass WHERE doc_id % 4 <> 0
       |  UNION ALL
       |  SELECT doc_id, t FROM pass
       |  WHERE doc_id % 4 = 0
       |    AND doc_id NOT IN (SELECT doc_id FROM dirty)),
       |$lshTail""".stripMargin)

  /** The `extraFilter` hook's threshold in the trained-quality-filter
    * composed query: keep batch docs whose q6 classifier score is ≥ 0.5
    * (the `qfilter_score` keep convention). Shared by the Spark query
    * and the oracle so both sides decide the boundary on identical
    * doubles. */
  val QfTau: Double = 0.5

  /** [[curatePipelineSql]] with the TRAINED quality filter composed in
    * via `CurationConfig.extraFilter`: the [[QfilterSql]] GD chain
    * trains on the full corpus (provenance-seeded labels), and batch
    * docs must pass gopher AND score ≥ [[QfTau]] before they chunk; the
    * corpus (index seed) side is unchanged — the standing index
    * predates the model. The score is the row-local q6 hard-sigmoid
    * over the trained weights, replay-pure by construction (the hook's
    * exactly-once contract). */
  lazy val curatePipelineQfilterSql: String = mat(
    s"""WITH ${QfilterSql.chain},
       |qsc AS MATERIALIZED (
       |  SELECT b.doc_id,
       |    floor((${QfilterSql.pExpr("w.w")}) * 1000000.0 + 0.5) / 1000000.0 AS p
       |  FROM base b CROSS JOIN w${QfilterSql.Iters} w),
       |$gopherCtes,
       |ctoks AS (
       |  SELECT doc_id, t FROM pass WHERE doc_id % 4 <> 0
       |  UNION ALL
       |  SELECT p.doc_id, p.t
       |  FROM pass p JOIN qsc q ON q.doc_id = p.doc_id
       |  WHERE p.doc_id % 4 = 0 AND q.p >= $QfTau),
       |$lshTail""".stripMargin)

  /** The FNV-1a 64 fold over the space-joined 5-gram at `pos` of token
    * list `t` — identical arithmetic to the dedup_spans oracle (and
    * [[graft.functions.TextFunctions.fingerprint64]]). */
  private def spanFp: String =
    s"""list_reduce(
       |    list_concat([14695981039346656037::HUGEINT],
       |      list_transform(
       |        list_filter(string_split(array_to_string(t[pos+1 : pos+5], ' '), ''),
       |                    c -> c <> ''),
       |        c -> ord(c)::HUGEINT)),
       |    (h, b) -> ((h - h % 256 + xor((h % 256)::BIGINT, b::BIGINT)::HUGEINT)
       |               * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT
       |  )""".stripMargin

  /** [[curatePipelineSql]] with the SPAN-CUT stage composed in
    * ([[graft.streaming.Curation.curateBatch]] with `spanIndexPath`): the
    * gopher-passed batch docs lose every word 5-gram span the standing
    * span index has seen (grams of the gopher-passed CORPUS docs —
    * owner ids are disjoint from batch ids, so the owner guard never
    * masks a corpus hit) or that repeats within the batch, and the
    * SURVIVING token stream chunks and dedups against the standing chunk
    * index exactly as [[curatePipelineSql]]. Batch docs cut to nothing
    * chunk to nothing (the chunker's n > 0 guard). */
  /** The span-cut CTE block over a (doc_id, t) batch-source CTE: every
    * word 5-gram the gopher-passed CORPUS has seen (or that repeats
    * within the batch) is removed; `bspan` is the surviving token
    * stream. Shared by the spans-composed and the full composition. */
  private def spanCtes(batchSrc: String): String =
    s"""socc AS (
       |  SELECT doc_id, unnest(generate_series(0, len(t) - 5)) AS pos, t
       |  FROM $batchSrc),
       |sbg AS (SELECT doc_id, pos, $spanFp AS fp FROM socc),
       |scocc AS (
       |  SELECT doc_id, unnest(generate_series(0, len(t) - 5)) AS pos, t
       |  FROM pass WHERE doc_id % 4 <> 0),
       |scg AS (SELECT DISTINCT $spanFp AS fp FROM scocc),
       |sdup AS (SELECT fp FROM sbg GROUP BY fp HAVING count(*) >= 2),
       |shits AS (
       |  SELECT doc_id, pos FROM sbg WHERE fp IN (SELECT fp FROM scg)
       |  UNION
       |  SELECT sbg.doc_id, sbg.pos FROM sbg JOIN sdup USING (fp)),
       |scov AS (
       |  SELECT doc_id,
       |    list_distinct(flatten(list_transform(list(pos),
       |      p -> generate_series(p, p + 4)))) AS covered
       |  FROM shits GROUP BY doc_id),
       |bspan AS (
       |  SELECT p.doc_id,
       |    list_transform(
       |      list_filter(generate_series(1, len(t)),
       |        i -> covered IS NULL OR NOT list_contains(covered, i - 1)),
       |      i -> t[i]) AS t
       |  FROM $batchSrc p LEFT JOIN scov USING (doc_id))""".stripMargin

  lazy val curatePipelineSpansSql: String = mat(
    s"""WITH $gopherCtes,
       |bsrc AS (SELECT doc_id, t FROM pass WHERE doc_id % 4 = 0),
       |${spanCtes("bsrc")},
       |ctoks AS (
       |  SELECT doc_id, t FROM pass WHERE doc_id % 4 <> 0
       |  UNION ALL
       |  SELECT doc_id, t FROM bspan WHERE len(t) > 0),
       |$lshTail""".stripMargin)

  /** THE FULL COMPOSITION — every model-driven stage in one streaming
    * body ([[graft.streaming.Curation.curateBatch]] with `extraFilter` =
    * DSIR ∧ decontamination ∧ trained filter, plus `spanIndexPath`):
    * batch docs pass gopher, then must (a) carry a DSIR log weight ≥
    * [[DsirTau]], (b) share NO word 5-gram with the benchmark slice,
    * (c) score ≥ [[QfTau]] on the trained quality filter; survivors
    * lose every corpus-seen/batch-repeated 5-gram span, chunk, and
    * dedup against the standing chunk index. One statement replays
    * all of it: the oracle stitches the DSIR weight chain, the
    * benchmark gram set, the 30-iteration GD chain, the span block and
    * the LSH tail end to end. */
  lazy val curatePipelineFullSql: String = mat(
    s"""WITH ${QfilterSql.chain},
       |qsc AS MATERIALIZED (
       |  SELECT b.doc_id,
       |    floor((${QfilterSql.pExpr("w.w")}) * 1000000.0 + 0.5) / 1000000.0 AS p
       |  FROM base b CROSS JOIN w${QfilterSql.Iters} w),
       |$gopherCtes,
       |${DsirSql.weightCtes},
       |bg AS (
       |  SELECT DISTINCT unnest(list_distinct(list_transform(
       |    generate_series(0, greatest(len(bt) - 5, 0)),
       |    i -> array_to_string(bt[i + 1 : i + 5], ' ')))) AS g
       |  FROM (SELECT string_split_regex(trim(lower(text)), '\\s+') AS bt
       |        FROM documents WHERE source = 'src0')),
       |dirty AS (
       |  SELECT DISTINCT doc_id FROM (
       |    SELECT doc_id, unnest(list_distinct(list_transform(
       |      generate_series(0, greatest(len(lt) - 5, 0)),
       |      i -> array_to_string(lt[i + 1 : i + 5], ' ')))) AS g
       |    FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS lt
       |          FROM documents WHERE doc_id % 4 = 0))
       |  WHERE g IN (SELECT g FROM bg)),
       |bsrc AS (
       |  SELECT p.doc_id, p.t
       |  FROM pass p
       |    LEFT JOIN dw ON p.doc_id = dw.doc_id
       |    JOIN qsc q ON q.doc_id = p.doc_id
       |  WHERE p.doc_id % 4 = 0
       |    AND round(coalesce(dw.logw_raw, 0.0), 6) >= $DsirTau
       |    AND p.doc_id NOT IN (SELECT doc_id FROM dirty)
       |    AND q.p >= $QfTau),
       |${spanCtes("bsrc")},
       |ctoks AS (
       |  SELECT doc_id, t FROM pass WHERE doc_id % 4 <> 0
       |  UNION ALL
       |  SELECT doc_id, t FROM bspan WHERE len(t) > 0),
       |$lshTail""".stripMargin)
}
