package graft.queries

/** DuckDB oracle for the trained quality filter
  * ([[graft.pipeline.QualityClassifier]]): the full-batch GD trainer
  * unrolled iteration by iteration — per iteration a score CTE (hard
  * sigmoid over the unrolled w·x), a one-row gradient CTE (6-dp terms
  * through DECIMAL(28,12)) and a one-row weight-update CTE (IEEE
  * division, 9-dp round) — then the final weights or the corpus scores.
  * Every operation is rational, so the replay is bit-exact. */
object QfilterSql {

  /** Must match [[graft.queries.Queries]]'s `qfilter*` calls into
    * [[graft.pipeline.QualityClassifier.fit]]. */
  val Iters = 30
  val D = 7
  private val Lr = "0.5"

  /** The fixed stopword lexicon — the `quality_score` oracle's list
    * (= [[graft.functions.TextFunctions.EnglishStopwords]]). */
  private val Stopwords =
    """['the','a','an','and','or','of','to','in','is','it',
      |'that','for','on','with','as','was','at','by','be']""".stripMargin

  /** Features + provenance label: intercept and six 6-dp [0,1] ratios;
    * y = 1 for the curated seed sources src0..src9. */
  private val base =
    s"""base AS MATERIALIZED (
       |  SELECT doc_id,
       |    [1.0,
       |     floor((least(len / 5000.0, 1.0)) * 1000000.0 + 0.5) / 1000000.0,
       |     floor((puncts / greatest(len, 1.0)) * 1000000.0 + 0.5) / 1000000.0,
       |     floor((stops / greatest(toks, 1.0)) * 1000000.0 + 0.5) / 1000000.0,
       |     floor((toks / greatest(len, 1.0)) * 1000000.0 + 0.5) / 1000000.0,
       |     floor((uppers / greatest(len, 1.0)) * 1000000.0 + 0.5) / 1000000.0,
       |     floor((digits / greatest(len, 1.0)) * 1000000.0 + 0.5) / 1000000.0] AS x,
       |    CASE WHEN CAST(substr(source, 4) AS INTEGER) < 10
       |         THEN 1.0 ELSE 0.0 END AS y
       |  FROM (
       |    SELECT doc_id, source,
       |      CAST(length(text) AS DOUBLE) AS len,
       |      CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) AS toks,
       |      CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) AS puncts,
       |      CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
       |        w -> list_contains($Stopwords, w))) AS DOUBLE) AS stops,
       |      CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS DOUBLE) AS uppers,
       |      CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) AS digits
       |    FROM documents)),
       |w0 AS MATERIALIZED (SELECT [${Seq.fill(D)("0.0").mkString(", ")}] AS w)""".stripMargin

  private def dot(xa: String, wa: String): String =
    (1 to D).map(j => s"$xa[$j] * $wa[$j]").mkString(" + ")

  /** p = clamp(0.25·(w·x) + 0.5, 0, 1) over `base` with weights `wk`. */
  private[queries] def pExpr(wa: String): String =
    s"least(greatest((${dot("b.x", wa)}) * 0.25 + 0.5, 0.0), 1.0)"

  private def iteration(k: Int): String = {
    val grads = (1 to D).map(j =>
      s"sum(CAST(floor(((p - y) * x[$j]) * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(28,12))) AS g$j")
      .mkString(",\n       ")
    val upds = (1 to D).map(j =>
      s"floor((w.w[$j] - $Lr * (CAST(g.g$j AS DOUBLE) / g.n)) * 1000000000.0 + 0.5) / 1000000000.0")
      .mkString(",\n     ")
    s"""z$k AS MATERIALIZED (
       |  SELECT b.doc_id, b.y, b.x, ${pExpr("w.w")} AS p
       |  FROM base b CROSS JOIN w${k - 1} w),
       |g$k AS MATERIALIZED (
       |  SELECT $grads,
       |       count(*) AS n
       |  FROM z$k),
       |w$k AS MATERIALIZED (
       |  SELECT [$upds] AS w
       |  FROM g$k g CROSS JOIN w${k - 1} w)""".stripMargin
  }

  private[queries] lazy val chain: String =
    (base +: (1 to Iters).map(iteration)).mkString(",\n")

  /** The trained weights, one row per feature index (1-based). */
  lazy val qfilterWeightsSql: String =
    s"""WITH $chain
       |SELECT CAST(t.j AS INTEGER) AS j, w.w[CAST(t.j AS INTEGER)] AS weight
       |FROM w$Iters w, range(1, ${D + 1}) t(j)
       |ORDER BY j""".stripMargin

  /** Every document scored by the trained model; keep = score ≥ 0.5. */
  lazy val qfilterScoreSql: String =
    s"""WITH $chain,
       |zs AS MATERIALIZED (
       |  SELECT b.doc_id, ${pExpr("w.w")} AS p
       |  FROM base b CROSS JOIN w$Iters w)
       |SELECT doc_id, floor(p * 1000000.0 + 0.5) / 1000000.0 AS score,
       |  floor(p * 1000000.0 + 0.5) / 1000000.0 >= 0.5 AS keep
       |FROM zs ORDER BY doc_id""".stripMargin
}
