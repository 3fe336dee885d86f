package graft.queries

/** DuckDB oracle for the order-`N` stupid-backoff LM quality score
  * ([[graft.pipeline.Quality.lmScoreStupidBackoff]]): count tables of
  * every order (pruned at `MinCount` for order ≥ 2), scoring positions as
  * the order-N grams, and the backoff CASE replayed with bit-identical
  * arithmetic — α-power factors are embedded as the exact Scala doubles
  * (iterated multiplication, CAST from their shortest round-trip repr),
  * divisions run (factor · numerator) / context in the same
  * left-associated order, and the per-position −ln sums through
  * DECIMAL(28,18) before the 6-dp round (the repo float contract). */
object LmSql {

  /** Must match the `lm_score_5gram` query. */
  val N = 5
  val MinCount = 2L
  val Alpha = 0.4

  private def alphaPow: Array[Double] =
    Iterator.iterate(1.0)(_ * Alpha).take(N).toArray

  /** t[i+1] || ' ' || ... || t[i+k] — the order-k gram at offset i. */
  private def gramExpr(k: Int): String =
    (1 to k).map(j => s"t[CAST(i + $j AS BIGINT)]").mkString(" || ' ' || ")

  /** w[a] || ' ' || ... || w[b] — a sub-gram of the split position. */
  private def subExpr(a: Int, b: Int): String =
    (a to b).map(j => s"w[$j]").mkString(" || ' ' || ")

  lazy val lmScore5gramSql: String =
    s"""WITH $scoreCtes
       |SELECT d.doc_id, coalesce(sc.n, 0) AS n_grams,
       |  coalesce(sc.nll, 0.0) AS nll
       |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** CCNet-style perplexity terciles over the ORDER-5 score: per-lang
    * 33/67 percentiles of the stupid-backoff nll (docs with ≥ 1 scoring
    * position), 6-dp-rounded threshold compares — the `ppl_buckets`
    * bucketing re-based on the real-order filter. */
  lazy val pplBuckets5gramSql: String =
    s"""WITH $scoreCtes,
       |d AS (
       |  SELECT sc.doc_id, doc.lang, sc.nll
       |  FROM sc JOIN documents doc ON sc.doc_id = doc.doc_id),
       |th AS (
       |  SELECT lang,
       |    round(quantile_cont(nll, 0.33333), 6) AS p33,
       |    round(quantile_cont(nll, 0.66667), 6) AS p67
       |  FROM d GROUP BY lang)
       |SELECT d.doc_id, d.lang, d.nll,
       |  CASE WHEN d.nll <= th.p33 THEN 'head'
       |       WHEN d.nll <= th.p67 THEN 'middle'
       |       ELSE 'tail' END AS bucket
       |FROM d JOIN th USING (lang) ORDER BY d.doc_id""".stripMargin

  /** The shared score chain, ending in `sc` (doc_id, n, nll) — docs with
    * at least one order-N scoring position. */
  private lazy val scoreCtes: String = {
    val ap = alphaPow
    def f(j: Int): String = s"CAST('${ap(j)}' AS DOUBLE)"
    val countCtes = (1 to N).map { k =>
      val src =
        if (k == 1) "SELECT unnest(t) AS g FROM toks"
        else
          s"""SELECT unnest(list_transform(range(len(t) - ${k - 1}),
             |    i -> ${gramExpr(k)})) AS g FROM toks""".stripMargin
      val prune = if (k >= 2) s" HAVING count(*) >= $MinCount" else ""
      s"c$k AS (SELECT g, count(*) AS c FROM ($src) GROUP BY g$prune)"
    }.mkString(",\n")
    val subCols = ((2 to N).flatMap { k =>
      Seq(s"${subExpr(N - k + 1, N)} AS num$k",
        s"${subExpr(N - k + 1, N - 1)} AS ctx$k")
    } :+ s"w[$N] AS num1").mkString(",\n    ")
    val joins = ((N to 2 by -1).flatMap { k =>
      Seq(s"LEFT JOIN c$k n$k ON n$k.g = s.num$k",
        s"LEFT JOIN c${k - 1} x$k ON x$k.g = s.ctx$k")
    } :+ "LEFT JOIN c1 n1 ON n1.g = s.num1").mkString("\n  ")
    val score = (N to 2 by -1).map { k =>
      s"""WHEN n$k.c IS NOT NULL THEN
         |      ${f(N - k)} * CAST(n$k.c AS DOUBLE) / CAST(x$k.c AS DOUBLE)"""
        .stripMargin
    }.mkString("CASE ", "\n    ", s"""
      |    ELSE ${f(N - 1)} * CAST(n1.c AS DOUBLE) / nt END""".stripMargin)
    s"""toks AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(trim(lower(text)), '\\s+'),
       |                x -> x <> '') AS t
       |  FROM documents),
       |$countCtes,
       |ntot AS (SELECT CAST(sum(c) AS DOUBLE) AS nt FROM c1),
       |pos AS (
       |  SELECT doc_id, unnest(list_transform(range(len(t) - ${N - 1}),
       |    i -> ${gramExpr(N)})) AS g
       |  FROM toks),
       |subs AS (
       |  SELECT doc_id,
       |    $subCols
       |  FROM (SELECT doc_id, string_split(g, ' ') AS w FROM pos)),
       |sc AS (
       |  SELECT s.doc_id,
       |    count(*) AS n,
       |    round(CAST(sum(CAST(-ln($score) AS DECIMAL(28,18))) AS DOUBLE)
       |      / count(*), 6) AS nll
       |  FROM subs s
       |  $joins
       |  CROSS JOIN ntot
       |  GROUP BY s.doc_id)""".stripMargin
  }
}
