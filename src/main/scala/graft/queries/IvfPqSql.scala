package graft.queries

/** DuckDB oracle for IVF-PQ ANN ([[graft.pipeline.IvfPq]]): coarse
  * k-means over the full vector, 6-dp residuals, per-subspace residual
  * codebooks, probe-list selection, per-(query, cell) LUTs and the ADC
  * top-k — the entire IVFADC chain in ONE statement.
  *
  * Conventions are the proven ones: 6-dp inputs, DECIMAL(28,12) sums →
  * 9-dp means, first-minimum argmin (`ORDER BY d, cid`), empty-cluster
  * carry-over, element-ascending distance folds (`generate_series`), and
  * raw-IEEE rank order with id tie-break. The residual is `round(v[i] -
  * c[i], 6)` on the corpus side (the k-means float contract) and the
  * UNROUNDED `qv[i] - c[i]` on the query side — both engines subtract
  * identical doubles, so the LUT doubles agree bit-for-bit. */
object IvfPqSql {

  /** Must match [[graft.queries.Queries.annIvfPq]]'s call into
    * [[graft.pipeline.IvfPq.fit]]/[[graft.pipeline.IvfPq.adcTopK]]. */
  val Dim = 64
  val NCells = 16
  val NProbe = 4
  val M = 8
  val Dsub = 8
  val Ksub = 16
  val TopK = 5

  private def dist(n: Int, a: String, b: String): String =
    s"""list_sum(list_transform(generate_series(1, $n),
       |      i -> ($a[i] - $b[i]) * ($a[i] - $b[i])))""".stripMargin

  /** One full-dim coarse Lloyd iteration: assign to `prev`, DECIMAL-exact
    * means, empty-cell carry-over. */
  private def coarseLloyd(prev: String, it: Int): String =
    s"""gd$it AS (
       |  SELECT e.vec_id, c.cid, ${dist(Dim, "e.v", "c.c")} AS d
       |  FROM e CROSS JOIN $prev c),
       |ga$it AS MATERIALIZED (
       |  SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
       |    FROM gd$it) WHERE rn = 1),
       |gm$it AS MATERIALIZED (
       |  SELECT cid, list(m ORDER BY pos) AS c FROM (
       |    SELECT a.cid, u.pos,
       |      round(CAST(sum(CAST(u.val AS DECIMAL(28,12))) AS DOUBLE)
       |        / count(*), 9) AS m
       |    FROM ga$it a JOIN
       |      (SELECT vec_id, unnest(v) AS val,
       |         unnest(range(1, len(v)+1)) AS pos FROM e) u
       |      ON u.vec_id = a.vec_id
       |    GROUP BY a.cid, u.pos)
       |  GROUP BY cid),
       |g$it AS MATERIALIZED (
       |  SELECT cid, c FROM gm$it
       |  UNION ALL
       |  SELECT cid, c FROM $prev p WHERE NOT EXISTS (
       |    SELECT 1 FROM gm$it x WHERE x.cid = p.cid))""".stripMargin

  /** One residual-subspace Lloyd iteration, `PARTITION BY j` (the
    * [[PqSql]] pattern over the `sr` slice CTE). */
  private def pqLloyd(prev: String, it: Int): String =
    s"""pd$it AS (
       |  SELECT sr.j, sr.vec_id, c.cid, ${dist(Dsub, "sr.sv", "c.c")} AS d
       |  FROM sr JOIN $prev c ON c.j = sr.j),
       |pa$it AS MATERIALIZED (
       |  SELECT j, vec_id, cid FROM (
       |    SELECT j, vec_id, cid,
       |      row_number() OVER (PARTITION BY j, vec_id ORDER BY d, cid) AS rn
       |    FROM pd$it) WHERE rn = 1),
       |pm$it AS MATERIALIZED (
       |  SELECT j, cid, list(m ORDER BY pos) AS c FROM (
       |    SELECT a.j, a.cid, u.pos,
       |      round(CAST(sum(CAST(u.val AS DECIMAL(28,12))) AS DOUBLE)
       |        / count(*), 9) AS m
       |    FROM pa$it a JOIN
       |      (SELECT j, vec_id, unnest(sv) AS val,
       |         unnest(range(1, len(sv)+1)) AS pos FROM sr) u
       |      ON u.j = a.j AND u.vec_id = a.vec_id
       |    GROUP BY a.j, a.cid, u.pos)
       |  GROUP BY j, cid),
       |p$it AS MATERIALIZED (
       |  SELECT j, cid, c FROM pm$it
       |  UNION ALL
       |  SELECT j, cid, c FROM $prev p WHERE NOT EXISTS (
       |    SELECT 1 FROM pm$it x WHERE x.j = p.j AND x.cid = p.cid))""".stripMargin

  lazy val annIvfPqSql: String =
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> round(CAST(x AS DOUBLE), 6)) AS v
       |  FROM embeddings),
       |g0 AS MATERIALIZED (
       |  SELECT CAST(rn - 1 AS INTEGER) AS cid, v AS c FROM (
       |    SELECT v, row_number() OVER (ORDER BY vec_id) AS rn FROM e)
       |  WHERE rn <= $NCells),
       |${coarseLloyd("g0", 1)},
       |${coarseLloyd("g1", 2)},
       |casg AS MATERIALIZED (
       |  SELECT vec_id, cid AS cell FROM (
       |    SELECT e.vec_id, c.cid,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${dist(Dim, "e.v", "c.c")}, c.cid) AS rn
       |    FROM e CROSS JOIN g2 c) WHERE rn = 1),
       |res AS MATERIALIZED (
       |  SELECT e.vec_id, a.cell,
       |    list_transform(generate_series(1, $Dim),
       |      i -> round(e.v[i] - g.c[i], 6)) AS r
       |  FROM e JOIN casg a ON a.vec_id = e.vec_id
       |    JOIN g2 g ON g.cid = a.cell),
       |sr AS MATERIALIZED (
       |  SELECT t.j, res.vec_id, res.r[t.j*$Dsub+1 : t.j*$Dsub+$Dsub] AS sv
       |  FROM res, range($M) t(j)),
       |p0 AS MATERIALIZED (
       |  SELECT j, CAST(rn - 1 AS INTEGER) AS cid, sv AS c FROM (
       |    SELECT j, sv, row_number() OVER (PARTITION BY j ORDER BY vec_id) AS rn
       |    FROM sr) WHERE rn <= $Ksub),
       |${pqLloyd("p0", 1)},
       |${pqLloyd("p1", 2)},
       |enc AS MATERIALIZED (
       |  SELECT j, vec_id, cid FROM (
       |    SELECT sr.j, sr.vec_id, c.cid,
       |      row_number() OVER (PARTITION BY sr.j, sr.vec_id
       |        ORDER BY ${dist(Dsub, "sr.sv", "c.c")}, c.cid) AS rn
       |    FROM sr JOIN p2 c ON c.j = sr.j) WHERE rn = 1),
       |codes AS MATERIALIZED (
       |  SELECT x.vec_id, a.cell, x.cs
       |  FROM (SELECT vec_id, list(cid ORDER BY j) AS cs FROM enc
       |        GROUP BY vec_id) x
       |    JOIN casg a ON a.vec_id = x.vec_id),
       |qs AS MATERIALIZED (
       |  SELECT vec_id AS qid,
       |    list_transform(embedding, x -> round(CAST(x AS DOUBLE), 6)) AS qv
       |  FROM embeddings WHERE vec_id < 5),
       |probes AS MATERIALIZED (
       |  SELECT qid, qv, cell FROM (
       |    SELECT q.qid, q.qv, c.cid AS cell,
       |      row_number() OVER (PARTITION BY q.qid
       |        ORDER BY ${dist(Dim, "q.qv", "c.c")}, c.cid) AS rn
       |    FROM qs q CROSS JOIN g2 c) WHERE rn <= $NProbe),
       |qres AS MATERIALIZED (
       |  SELECT p.qid, p.cell,
       |    list_transform(generate_series(1, $Dim), i -> p.qv[i] - g.c[i]) AS qr
       |  FROM probes p JOIN g2 g ON g.cid = p.cell),
       |qlut AS MATERIALIZED (
       |  SELECT r.qid, r.cell, c.j, c.cid,
       |    ${dist(Dsub, s"(r.qr[c.j*$Dsub+1 : c.j*$Dsub+$Dsub])", "c.c")} AS d
       |  FROM qres r CROSS JOIN p2 c),
       |flat AS MATERIALIZED (
       |  SELECT qid, cell, list(d ORDER BY j, cid) AS lut
       |  FROM qlut GROUP BY qid, cell),
       |s AS MATERIALIZED (
       |  SELECT f.qid, cd.vec_id AS id,
       |    list_sum(list_transform(generate_series(1, $M),
       |      j -> f.lut[(j-1)*$Ksub + cd.cs[j] + 1])) AS adc
       |  FROM flat f JOIN codes cd ON cd.cell = f.cell
       |  WHERE f.qid <> cd.vec_id)
       |SELECT qid, id AS neighbor_id,
       |  CAST(row_number() OVER (PARTITION BY qid ORDER BY adc, id) AS INTEGER)
       |    AS rank
       |FROM s
       |QUALIFY rank <= $TopK""".stripMargin
}
