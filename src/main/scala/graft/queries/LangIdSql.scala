package graft.queries

/** DuckDB oracle for the Cavnar–Trenkle language identifier
  * ([[graft.pipeline.LangProfile]]): the fit (per-language rank profiles
  * over character grams of lengths 1..N of the labeled corpus) AND the
  * classify (document rank profile → out-of-place distance → argmin)
  * replayed in one statement.
  *
  * Everything the two engines must agree on is integer or ordering:
  * ranks come from `row_number` over (count DESC, gram ASC — DuckDB's
  * default binary varchar collation = Spark's UTF8String byte order),
  * the distance is an integer sum with a `topK` penalty for grams
  * missing from a language profile, and the prediction takes the
  * smallest language code at the minimum distance. Gram slicing is by
  * character, matching the Spark side's code-point stepping.
  * Normalization is shared: lower, trim, whitespace runs → `_`, pad
  * with `_` (the Cavnar–Trenkle word-boundary marker). Docs with no
  * trigram (normalized length < 3) predict 'und' via the left join.
  * The candidate set is the FITTED languages (`DISTINCT lang FROM
  * lprof`), matching [[graft.pipeline.LangProfile.fit]]'s contract: a
  * label whose docs are all sub-trigram yields no profile and is not a
  * candidate on either side. */
object LangIdSql {

  /** Must match [[graft.pipeline.LangProfile.fit]]'s defaults. */
  val N = 3
  val TopK = 300

  lazy val langIdSql: String =
    s"""WITH nrm AS (
       |  SELECT doc_id, lang,
       |    '_' || regexp_replace(lower(trim(text)), '\\s+', '_', 'g') || '_' AS s
       |  FROM documents),
       |occ AS (
       |  SELECT doc_id, lang, s[CAST(i+1 AS BIGINT):CAST(i+k AS BIGINT)] AS g
       |  FROM (SELECT doc_id, lang, s, k, unnest(range(len(s) - k + 1)) AS i
       |        FROM nrm CROSS JOIN (SELECT unnest(range(1, $N + 1)) AS k) ks
       |        WHERE len(s) >= $N)),
       |lcnt AS (SELECT lang, g, count(*) AS c FROM occ GROUP BY lang, g),
       |lprof AS (
       |  SELECT lang, g, row_number() OVER (
       |    PARTITION BY lang ORDER BY c DESC, g ASC) AS r
       |  FROM lcnt QUALIFY r <= $TopK),
       |dcnt AS (SELECT doc_id, g, count(*) AS c FROM occ GROUP BY doc_id, g),
       |dprof AS (
       |  SELECT doc_id, g, row_number() OVER (
       |    PARTITION BY doc_id ORDER BY c DESC, g ASC) AS r
       |  FROM dcnt QUALIFY r <= $TopK),
       |langs AS (SELECT DISTINCT lang FROM lprof),
       |dist AS (
       |  SELECT dp.doc_id, l.lang,
       |    sum(CASE WHEN lp.r IS NULL THEN $TopK ELSE abs(dp.r - lp.r) END) AS dist
       |  FROM dprof dp CROSS JOIN langs l
       |  LEFT JOIN lprof lp ON lp.lang = l.lang AND lp.g = dp.g
       |  GROUP BY dp.doc_id, l.lang),
       |pred AS (
       |  SELECT doc_id, lang AS lang_pred FROM dist
       |  QUALIFY row_number() OVER (
       |    PARTITION BY doc_id ORDER BY dist ASC, lang ASC) = 1)
       |SELECT d.doc_id, coalesce(p.lang_pred, 'und') AS lang_pred
       |FROM documents d LEFT JOIN pred p USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
}
