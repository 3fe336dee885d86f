package graft.queries

/** DuckDB replay of the Count–Min sketch query ([[graft.functions.Cms]]):
  * per distinct key, h1 = mix(fnv(k)) and h2 = mix(h1)|1 (two staged mix
  * chains); counter (i, bucket) = Σ occurrence counts of keys with
  * (h1 + i·h2) mod width = bucket; point estimate = min over the depth
  * rows. Integer arithmetic throughout — hash-exact by construction. */
object CmsSql {

  def cmsFreqSql(depth: Int, width: Int): String =
    s"""WITH cnt AS (
       |  SELECT CAST(l_orderkey AS VARCHAR) AS k, count(*) AS c
       |  FROM lineitem GROUP BY 1),
       |h0 AS MATERIALIZED (SELECT k, c, ${LshSql.fnv("k")} AS h FROM cnt),
       |${HllSql.mixStages("h0", Seq("k", "c"), "a", "am")},
       |h1t AS (SELECT k, c, h AS h1, h FROM am),
       |${HllSql.mixStages("h1t", Seq("k", "c", "h1"), "b", "bm")},
       |kh AS (
       |  SELECT k, c, h1,
       |    CASE WHEN h % 2 = 0 THEN h + 1 ELSE h END AS h2
       |  FROM bm),
       |counters AS (
       |  SELECT t.i, (h1 + t.i * h2) % $width AS b, SUM(c) AS total
       |  FROM kh, range($depth) t(i) GROUP BY 1, 2),
       |probes AS (
       |  SELECT DISTINCT l_orderkey, CAST(l_orderkey AS VARCHAR) AS k
       |  FROM lineitem WHERE l_orderkey % 1000 = 0),
       |ph AS (
       |  SELECT p.l_orderkey, kh.h1, kh.h2 FROM probes p JOIN kh ON kh.k = p.k)
       |SELECT ph.l_orderkey, CAST(min(ctr.total) AS BIGINT) AS est_freq
       |FROM ph, range($depth) t(i)
       |JOIN counters ctr
       |  ON ctr.i = t.i AND ctr.b = (ph.h1 + t.i * ph.h2) % $width
       |GROUP BY ph.l_orderkey""".stripMargin
}
