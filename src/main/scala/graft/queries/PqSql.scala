package graft.queries

/** DuckDB oracle for product-quantization ANN ([[graft.pipeline.Pq]]):
  * per-subspace k-means fit (the `kmeans_clusters` conventions — 6-dp
  * inputs, DECIMAL-exact means rounded to 9 dp, first-minimum argmin,
  * empty-cluster carry-over), PQ encoding, per-query LUTs against the
  * final codebooks, and the ADC top-k, all in ONE statement.
  *
  * Unlike the unrolled `kmeans_clusters` SQL this replays ALL subspaces
  * at once: the subspace id `j` is a partition column and every Lloyd
  * step runs `PARTITION BY j` — the same two iterations, m codebooks.
  * Distance folds are element-ascending (`generate_series`), matching
  * the Scala while-loops, so the raw IEEE doubles agree and the rank can
  * order by the unrounded distance with the id tie-break (the ann_brute
  * convention). */
object PqSql {

  /** Must match [[graft.queries.Queries.annPq]]'s call into
    * [[graft.pipeline.Pq.fit]]. */
  val M = 8
  val Dsub = 8
  val Ksub = 256
  val TopK = 5

  private def dist(a: String, b: String): String =
    s"""list_sum(list_transform(generate_series(1, $Dsub),
       |      i -> ($a[i] - $b[i]) * ($a[i] - $b[i])))""".stripMargin

  /** One Lloyd iteration per subspace: assign to `prev`, DECIMAL-exact
    * means, carry empty clusters over. */
  private def lloyd(prev: String, it: Int): String =
    s"""d$it AS MATERIALIZED (
       |  SELECT se.j, se.vec_id, c.cid, ${dist("se.sv", "c.c")} AS d
       |  FROM se JOIN $prev c ON c.j = se.j),
       |a$it AS MATERIALIZED (
       |  SELECT j, vec_id, cid FROM (
       |    SELECT j, vec_id, cid,
       |      row_number() OVER (PARTITION BY j, vec_id ORDER BY d, cid) AS rn
       |    FROM d$it) WHERE rn = 1),
       |m$it AS MATERIALIZED (
       |  SELECT j, cid, list(m ORDER BY pos) AS c FROM (
       |    SELECT a.j, a.cid, u.pos,
       |      round(CAST(sum(CAST(u.val AS DECIMAL(28,12))) AS DOUBLE)
       |        / count(*), 9) AS m
       |    FROM a$it a JOIN
       |      (SELECT j, vec_id, unnest(sv) AS val,
       |         unnest(range(1, len(sv)+1)) AS pos FROM se) u
       |      ON u.j = a.j AND u.vec_id = a.vec_id
       |    GROUP BY a.j, a.cid, u.pos)
       |  GROUP BY j, cid),
       |c$it AS MATERIALIZED (
       |  SELECT j, cid, c FROM m$it
       |  UNION ALL
       |  SELECT j, cid, c FROM $prev p WHERE NOT EXISTS (
       |    SELECT 1 FROM m$it x WHERE x.j = p.j AND x.cid = p.cid))""".stripMargin

  lazy val annPqSql: String =
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> round(CAST(x AS DOUBLE), 6)) AS v
       |  FROM embeddings),
       |se AS MATERIALIZED (
       |  SELECT t.j, e.vec_id, e.v[t.j*$Dsub+1 : t.j*$Dsub+$Dsub] AS sv
       |  FROM e, range($M) t(j)),
       |c0 AS MATERIALIZED (
       |  SELECT j, CAST(rn - 1 AS INTEGER) AS cid, sv AS c FROM (
       |    SELECT j, sv, row_number() OVER (PARTITION BY j ORDER BY vec_id) AS rn
       |    FROM se) WHERE rn <= $Ksub),
       |${lloyd("c0", 1)},
       |${lloyd("c1", 2)},
       |enc AS MATERIALIZED (
       |  SELECT j, vec_id, cid FROM (
       |    SELECT se.j, se.vec_id, c.cid,
       |      row_number() OVER (PARTITION BY se.j, se.vec_id
       |        ORDER BY ${dist("se.sv", "c.c")}, c.cid) AS rn
       |    FROM se JOIN c2 c ON c.j = se.j) WHERE rn = 1),
       |codes AS MATERIALIZED (
       |  SELECT vec_id, list(cid ORDER BY j) AS cs FROM enc GROUP BY vec_id),
       |qs AS MATERIALIZED (
       |  SELECT vec_id AS qid,
       |    list_transform(embedding, x -> round(CAST(x AS DOUBLE), 6)) AS qv
       |  FROM embeddings WHERE vec_id < 5),
       |qlut AS MATERIALIZED (
       |  SELECT q.qid, c.j, c.cid,
       |    ${dist(s"(q.qv[c.j*$Dsub+1 : c.j*$Dsub+$Dsub])", "c.c")} AS d
       |  FROM qs q, c2 c),
       |flat AS (SELECT qid, list(d ORDER BY j, cid) AS lut FROM qlut GROUP BY qid),
       |s AS MATERIALIZED (
       |  SELECT f.qid, cd.vec_id AS id,
       |    list_sum(list_transform(generate_series(1, $M),
       |      j -> f.lut[(j-1)*$Ksub + cd.cs[j] + 1])) AS adc
       |  FROM flat f, codes cd WHERE f.qid <> cd.vec_id)
       |SELECT qid, id AS neighbor_id,
       |  CAST(row_number() OVER (PARTITION BY qid ORDER BY adc, id) AS INTEGER)
       |    AS rank
       |FROM s
       |QUALIFY rank <= $TopK""".stripMargin
}
