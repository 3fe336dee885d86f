package graft.queries

/** DuckDB oracle SQL for ann_ivf — the IVF trainer's driver-side Lloyd
  * iterations replayed EXACTLY in SQL.
  *
  * [[graft.pipeline.Similarity.ivfTopK]] is deterministic end to end: the
  * sample is orderBy(id)+limit, the seeds are the first nCells sample
  * vectors, and every floating-point accumulation happens in a fixed
  * order. The oracle replays all of it:
  *
  *   - each Lloyd iteration is three CTEs (assign by cosine argmax with
  *     first-max tie-break = ORDER BY sim DESC, cell; per-cell member
  *     lists collected in id order; centroid update as an index-order
  *     list_reduce fold per dimension, divided by the count — empty cells
  *     keep their centroid);
  *   - training runs on DOUBLE-cast vectors, and the trained centroids
  *     round to FLOAT before the corpus/probe phase, exactly as the
  *     engine materializes its centroid DataFrame as array<float>;
  *   - corpus assignment, nProbe probing, and the candidate re-rank use
  *     the identical ordered-fold cosine, so the unrounded doubles — and
  *     therefore every tie-break and rank — are IEEE-identical.
  *
  * Validated row-for-row against a Spark verify dump before wiring.
  */
object IvfSql {

  private val Dim = 64
  private val NCells = 8
  private val NProbe = 3
  private val Iterations = 5
  private val SampleSize = 2000
  private val K = 5

  private def fold(items: String): String =
    s"list_reduce(list_concat([CAST(0.0 AS DOUBLE)], $items), (a, x) -> a + x)"

  private def dotDD(a: String, b: String): String =
    fold(s"list_transform(range($Dim), i -> $a[CAST(i+1 AS BIGINT)] * $b[CAST(i+1 AS BIGINT)])")

  /** cosine over double lists; na over the centroid, nb over the vector —
    * the accumulator naming (and zero-guard) of VectorFunctions.nearest. */
  private def cosDD(v: String, c: String): String = {
    val (na, nb, dot) = (dotDD(c, c), dotDD(v, v), dotDD(v, c))
    s"(CASE WHEN $na = 0.0 OR $nb = 0.0 THEN 0.0 ELSE $dot / sqrt(($na) * ($nb)) END)"
  }

  private def dotFF(a: String, b: String): String =
    fold(s"list_transform(range($Dim), i -> CAST($a[CAST(i+1 AS BIGINT)] AS DOUBLE) * " +
      s"CAST($b[CAST(i+1 AS BIGINT)] AS DOUBLE))")

  private def cosFF(a: String, b: String): String = {
    val (na, nb, dot) = (dotFF(a, a), dotFF(b, b), dotFF(a, b))
    s"(CASE WHEN $na = 0.0 OR $nb = 0.0 THEN 0.0 ELSE $dot / sqrt(($na) * ($nb)) END)"
  }

  lazy val annIvfSql: String = {
    val iters = (0 until Iterations).map { k =>
      s"""a$k AS (
         |  SELECT s.id, s.vd, c.cell, ${cosDD("s.vd", "c.cvec")} AS sim
         |  FROM samp s CROSS JOIN c$k c),
         |asg$k AS (
         |  SELECT id, vd, cell FROM (
         |    SELECT id, vd, cell,
         |      row_number() OVER (PARTITION BY id ORDER BY sim DESC, cell) AS rn
         |    FROM a$k) WHERE rn = 1),
         |u$k AS (SELECT cell, count(*) AS cnt, list(vd ORDER BY id) AS members
         |        FROM asg$k GROUP BY cell),
         |c${k + 1} AS (
         |  SELECT c.cell,
         |    CASE WHEN u.cnt IS NULL THEN c.cvec
         |         ELSE list_transform(range($Dim), d ->
         |           ${fold("list_transform(u.members, m -> m[CAST(d+1 AS BIGINT)])")} / u.cnt) END AS cvec
         |  FROM c$k c LEFT JOIN u$k u USING (cell))""".stripMargin
    }.mkString(",\n")

    s"""WITH samp AS (
       |  SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd
       |  FROM embeddings ORDER BY vec_id LIMIT $SampleSize),
       |c0 AS (
       |  SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS INTEGER) AS cell, vd AS cvec
       |  FROM (SELECT id, vd FROM samp ORDER BY id LIMIT $NCells)),
       |$iters,
       |cf AS (SELECT cell, list_transform(cvec, x -> CAST(x AS REAL)) AS cvf
       |       FROM c$Iterations),
       |corp AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
       |casg AS (
       |  SELECT id, vec, cell FROM (
       |    SELECT c.id, c.vec, f.cell,
       |      row_number() OVER (PARTITION BY c.id
       |        ORDER BY ${cosFF("c.vec", "f.cvf")} DESC, f.cell) AS rn
       |    FROM corp c CROSS JOIN cf f) WHERE rn = 1),
       |probes AS (
       |  SELECT qid, qvec, cell FROM (
       |    SELECT q.vec_id AS qid, q.embedding AS qvec, f.cell,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${cosFF("q.embedding", "f.cvf")} DESC, f.cell) AS rn
       |    FROM embeddings q CROSS JOIN cf f WHERE q.vec_id < 5) WHERE rn <= $NProbe),
       |cand AS (
       |  SELECT p.qid, a.id, ${cosFF("p.qvec", "a.vec")} AS cos
       |  FROM probes p JOIN casg a USING (cell) WHERE p.qid <> a.id)
       |SELECT qid, id AS neighbor_id,
       |  CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id) AS INTEGER) AS rank,
       |  round(cos, 6) AS cosine
       |FROM cand QUALIFY rank <= $K""".stripMargin
  }
}
