package graft.queries

/** DuckDB oracle SQL for the DSIR queries ([[graft.pipeline.Dsir]]):
  * the hashed-n-gram importance-weight pipeline replayed in exact SQL.
  *
  * Bucket ids replay [[graft.functions.TextFunctions.fnv1a64]] in HUGEINT
  * (via [[LshSql.fnv]]) mod 256 — the unsigned residue equals Spark's
  * `pmod` of the signed long exactly because 256 divides 2^64. λ and the
  * per-document fold use `ln` on the same add-one-smoothed ratios; the
  * engines' sums differ only in fold order / final-ulp libm bits, so both
  * sides round to 6 dp (the repo's established float-oracle contract).
  * Documents with no grams keep weight 0.0 via the left join — the
  * `list_filter(x <> '')` makes that literal: DuckDB's
  * `string_split_regex('')` yields [''] where Spark's tokens('') yields
  * [], and unfiltered that '' gram would give empty docs a nonzero
  * weight on the oracle side only.
  */
object DsirSql {

  /** Shared CTE chain: tokens → unigrams+bigrams → FNV buckets →
    * bucket counts (raw + target) → smoothed λ → per-doc raw log-weight
    * (`dw`). CTE names are d-prefixed so the chain composes into other
    * oracles (the curate-pipeline DSIR variant stitches it next to the
    * MinHash chain, which owns `rows_`/`hashed`). */
  private[queries] val weightCtes: String =
    s"""dtoks AS (
       |  SELECT doc_id, lang,
       |    list_filter(string_split_regex(trim(lower(text)), '\\s+'),
       |                x -> x <> '') AS t
       |  FROM documents),
       |dgrams AS (
       |  SELECT doc_id, lang,
       |    list_concat(t,
       |      CASE WHEN len(t) < 2 THEN CAST([] AS VARCHAR[])
       |           ELSE list_transform(range(len(t) - 1),
       |             i -> t[CAST(i + 1 AS BIGINT)] || ' ' || t[CAST(i + 2 AS BIGINT)])
       |      END) AS g
       |  FROM dtoks),
       |drows AS (SELECT doc_id, lang, unnest(g) AS s FROM dgrams),
       |dhashed AS (
       |  SELECT doc_id, lang, CAST(${LshSql.fnv("s")} % 256 AS INTEGER) AS b
       |  FROM drows),
       |dcounts AS (
       |  SELECT b, count(*) AS raw,
       |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS tgt
       |  FROM dhashed GROUP BY b),
       |dtot AS (
       |  SELECT CAST(sum(raw) AS DOUBLE) AS rt, CAST(sum(tgt) AS DOUBLE) AS tt
       |  FROM dcounts),
       |dlam AS (
       |  SELECT b,
       |    ln((CAST(tgt AS DOUBLE) + 1.0) / (tt + 256.0)) -
       |    ln((CAST(raw AS DOUBLE) + 1.0) / (rt + 256.0)) AS lam
       |  FROM dcounts, dtot),
       |dw AS (
       |  SELECT h.doc_id, sum(l.lam) AS logw_raw
       |  FROM dhashed h JOIN dlam l USING (b) GROUP BY h.doc_id)""".stripMargin

  /** All-document importance weights — doc_id, lang, logw (6 dp). */
  lazy val dsirWeightsSql: String =
    s"""WITH $weightCtes
       |SELECT d.doc_id, d.lang,
       |  round(coalesce(dw.logw_raw, 0.0), 6) AS logw
       |FROM documents d LEFT JOIN dw ON d.doc_id = dw.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** Gumbel top-50 resample — the MINSTD hash-unit chain (the
    * cap_per_source oracle's Lehmer steps) feeds `−ln(−ln u)`, ranking by
    * the 6-dp-rounded score with id tie-break, exactly as
    * [[graft.pipeline.Dsir.resample]]. */
  lazy val dsirSampleSql: String =
    s"""WITH $weightCtes,
       |sc AS (
       |  SELECT d.doc_id, d.lang,
       |    coalesce(dw.logw_raw, 0.0) +
       |      (-ln(-ln(CAST(((d.doc_id + 1) % 2147483647)
       |          * 48271 % 2147483647
       |          * 48271 % 2147483647
       |          * 48271 % 2147483647 AS DOUBLE) / 2147483647.0))) AS s
       |  FROM documents d LEFT JOIN dw ON d.doc_id = dw.doc_id)
       |SELECT doc_id, lang, round(s, 6) AS score FROM sc
       |QUALIFY row_number() OVER (ORDER BY round(s, 6) DESC, doc_id) <= 50
       |ORDER BY score DESC, doc_id""".stripMargin
}
