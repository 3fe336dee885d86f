package graft.queries

/** DuckDB oracle SQL for every SQL-expressible query in [[Queries]].
  *
  * Written against views named after the parquet tables. Conventions that
  * keep the driver's column-sorted hash compare exact:
  *   - aliases match the Spark side character-for-character;
  *   - double sums go through DECIMAL (exact, associative) then CAST to
  *     DOUBLE, so aggregation order cannot perturb low bits;
  *   - counts/lengths are cast to the Spark-side integer width;
  *   - FP-derived ranks drop the score column and carry deterministic
  *     tie-breaks.
  */
object Oracles {

  /** SQL for a Morton interleave of the low `bits` of two expressions —
    * mirrors [[graft.functions.ZOrderFunctions.interleave]] bit for bit. */
  private def interleaveSql(a: String, b: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($a) >> $i & 1) << ${2 * i + 1}) | ((($b) >> $i & 1) << ${2 * i})"
    }.mkString(" | ")

  private val revenueExpr =
    "CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
      "(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) " +
      "AS DECIMAL(28,4))) AS DOUBLE)"

  // The SAME two Lloyd iterations the Spark side runs, unrolled: 6-dp
  // inputs make the DECIMAL(28,12) sums exact (order-insensitive), means
  // round to 9 dp, distances fold in element order, argmin ties break to
  // the lowest cluster id — so the assignment is bit-for-bit reproducible
  // across engines. Standalone as `kmeans_clusters`; reused (as a nested
  // CTE) by `dedup_semantic`.
  private val kmeansClustersSql =
    """WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x -> round(CAST(x AS DOUBLE), 6)) AS v
      |  FROM embeddings),
      |c0 AS (
      |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid, v AS c
      |  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 10)),
      |d1 AS (
      |  SELECT e.vec_id, c.cid,
      |    list_sum(list_transform(generate_series(1, len(e.v)),
      |      i -> (e.v[i] - c.c[i]) * (e.v[i] - c.c[i]))) AS d
      |  FROM e, c0 c),
      |a1 AS (
      |  SELECT vec_id, cid FROM (
      |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
      |    FROM d1) WHERE rn = 1),
      |m1 AS (
      |  SELECT cid, list(m ORDER BY pos) AS c FROM (
      |    SELECT a.cid, u.pos,
      |      round(CAST(sum(CAST(u.val AS DECIMAL(28,12))) AS DOUBLE) / count(*), 9) AS m
      |    FROM a1 a JOIN
      |      (SELECT vec_id, unnest(v) AS val, unnest(range(1, len(v)+1)) AS pos FROM e) u
      |      USING (vec_id)
      |    GROUP BY a.cid, u.pos)
      |  GROUP BY cid),
      |c1 AS (
      |  SELECT cid, c FROM m1
      |  UNION ALL
      |  SELECT cid, c FROM c0 WHERE cid NOT IN (SELECT cid FROM m1)),
      |d2 AS (
      |  SELECT e.vec_id, c.cid,
      |    list_sum(list_transform(generate_series(1, len(e.v)),
      |      i -> (e.v[i] - c.c[i]) * (e.v[i] - c.c[i]))) AS d
      |  FROM e, c1 c),
      |a2 AS (
      |  SELECT vec_id, cid FROM (
      |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
      |    FROM d2) WHERE rn = 1),
      |m2 AS (
      |  SELECT cid, list(m ORDER BY pos) AS c FROM (
      |    SELECT a.cid, u.pos,
      |      round(CAST(sum(CAST(u.val AS DECIMAL(28,12))) AS DOUBLE) / count(*), 9) AS m
      |    FROM a2 a JOIN
      |      (SELECT vec_id, unnest(v) AS val, unnest(range(1, len(v)+1)) AS pos FROM e) u
      |      USING (vec_id)
      |    GROUP BY a.cid, u.pos)
      |  GROUP BY cid),
      |c2 AS (
      |  SELECT cid, c FROM m2
      |  UNION ALL
      |  SELECT cid, c FROM c1 WHERE cid NOT IN (SELECT cid FROM m2)),
      |d3 AS (
      |  SELECT e.vec_id, c.cid,
      |    list_sum(list_transform(generate_series(1, len(e.v)),
      |      i -> (e.v[i] - c.c[i]) * (e.v[i] - c.c[i]))) AS d
      |  FROM e, c2 c)
      |SELECT vec_id, CAST(cid AS INTEGER) AS cluster FROM (
      |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
      |  FROM d3) WHERE rn = 1""".stripMargin

  /** Shared by `decontaminate` (broadcast gram join) and
    * `decontaminate_gate` (row-local fingerprint gate): the two forms
    * must produce identical overlap reports. */
  private val decontaminateSql: String =
    """WITH sh AS (
      |  SELECT doc_id, source, list_distinct(list_transform(
      |    generate_series(0, greatest(len(t) - 5, 0)),
      |    i -> array_to_string(t[i + 1: i + 5], ' '))) AS grams
      |  FROM (SELECT doc_id, source,
      |          string_split_regex(trim(lower(text)), '\s+') AS t
      |        FROM documents)),
      |bench AS (SELECT DISTINCT unnest(grams) AS g FROM sh WHERE source = 'src0'),
      |corpus AS (SELECT doc_id, unnest(grams) AS g FROM sh WHERE source <> 'src0')
      |SELECT doc_id, count(*) AS n_overlap
      |FROM corpus JOIN bench USING (g)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val sql: Map[String, String] = Map(
    "ingest_offsets" ->
      """SELECT event_id,
        |  CAST(event_id % 4 AS INTEGER) AS partition,
        |  CAST(row_number() OVER (PARTITION BY event_id % 4 ORDER BY event_id) - 1 AS BIGINT) AS offset
        |FROM events""".stripMargin,

    "poll_slice" ->
      """WITH o AS (
        |  SELECT event_id,
        |    CAST(event_id % 4 AS INTEGER) AS partition,
        |    CAST(row_number() OVER (PARTITION BY event_id % 4 ORDER BY event_id) - 1 AS BIGINT) AS offset
        |  FROM events)
        |SELECT event_id, "offset" FROM o
        |WHERE "partition" = 2 AND "offset" >= 100 AND "offset" < 150
        |ORDER BY "offset"""".stripMargin,

    "offsets_for_times" ->
      """WITH o AS (
        |  SELECT event_id,
        |    CAST(epoch_ns(ts) // 1000000 AS BIGINT) AS ts_ms,
        |    CAST(event_id % 4 AS INTEGER) AS partition,
        |    CAST(row_number() OVER (PARTITION BY event_id % 4 ORDER BY event_id) - 1 AS BIGINT) AS offset
        |  FROM events),
        |b AS (SELECT min(ts_ms) + (max(ts_ms) - min(ts_ms)) // 2 AS thr FROM o)
        |SELECT "partition", CAST(min("offset") AS BIGINT) AS first_offset
        |FROM o, b WHERE ts_ms >= thr
        |GROUP BY "partition"""".stripMargin,

    "headers_last" ->
      """SELECT event_id, props AS last_src,
        |  CAST(2 AS INTEGER) AS n_headers,
        |  CAST(0 AS INTEGER) AS n_after_remove
        |FROM events""".stripMargin,

    "assign_range" ->
      """WITH m AS (
        |  SELECT r_name AS member, row_number() OVER (ORDER BY r_name) - 1 AS i FROM region),
        |p AS (SELECT CAST(n_nationkey AS INTEGER) AS partition FROM nation WHERE n_nationkey < 23)
        |SELECT m.member, p.partition FROM m JOIN p
        |ON (CASE WHEN p.partition < 15 THEN p.partition // 5
        |         ELSE 3 + (p.partition - 15) // 4 END) = m.i""".stripMargin,

    "assign_roundrobin" ->
      """WITH m AS (
        |  SELECT r_name AS member, row_number() OVER (ORDER BY r_name) - 1 AS i FROM region),
        |p AS (SELECT CAST(n_nationkey AS INTEGER) AS partition FROM nation WHERE n_nationkey < 23)
        |SELECT m.member, p.partition FROM m JOIN p ON p.partition % 5 = m.i""".stripMargin,

    "assign_sticky" ->
      """WITH m AS (
        |  SELECT r_name AS member, row_number() OVER (ORDER BY r_name) - 1 AS i FROM region),
        |p AS (SELECT CAST(n_nationkey AS INTEGER) AS partition FROM nation WHERE n_nationkey < 23)
        |SELECT m.member, p.partition FROM m JOIN p ON p.partition % 5 = m.i""".stripMargin,

    "liveness_snapshot" ->
      """WITH beats AS (
        |  SELECT CAST(user_id AS VARCHAR) AS member_id,
        |    CAST(epoch_ns(ts) // 1000000 AS BIGINT) AS ts_ms,
        |    event_id AS seq
        |  FROM events),
        |latest AS (
        |  SELECT member_id, ts_ms AS last_ts, seq AS last_seq
        |  FROM beats
        |  QUALIFY row_number() OVER (PARTITION BY member_id ORDER BY ts_ms DESC, seq DESC) = 1),
        |now_ms AS (SELECT max(ts_ms) AS v FROM beats)
        |SELECT member_id, last_ts, last_seq,
        |  (SELECT v FROM now_ms) - last_ts <= 24 * 3600 * 1000 AS alive
        |FROM latest""".stripMargin,

    "expire_ttl" ->
      """WITH ev AS (
        |  SELECT event_id, CAST(epoch_ns(ts) // 1000000 AS BIGINT) AS ts_ms FROM events),
        |h AS (SELECT max(ts_ms) - 7 * 24 * 3600 * 1000 AS cutoff FROM ev)
        |SELECT event_id, ts_ms FROM ev WHERE ts_ms >= (SELECT cutoff FROM h)""".stripMargin,

    "describe_topic" ->
      """SELECT CAST(event_id % 4 AS INTEGER) AS partition,
        |  count(*) AS n_records,
        |  CAST(0 AS BIGINT) AS base_offset,
        |  CAST(count(*) - 1 AS BIGINT) AS end_offset
        |FROM events
        |GROUP BY 1""".stripMargin,

    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q3_shipping" ->
      s"""SELECT l_orderkey, $revenueExpr AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |GROUP BY l_orderkey
         |ORDER BY revenue DESC, l_orderkey
         |LIMIT 10""".stripMargin,

    "q5_region" ->
      s"""SELECT n_name, $revenueExpr AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |GROUP BY n_name""".stripMargin,

    "q6_forecast" ->
      """SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |  CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.02 AND 0.09
        |  AND l_quantity < 24""".stripMargin,

    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rank
        |FROM orders
        |QUALIFY rank <= 3""".stripMargin,

    "q_events_hourly" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
        |  count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2""".stripMargin,

    "q_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, CAST(epoch_ns(ts) AS BIGINT) AS tsn
        |  FROM events),
        |u1 AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN tsn END) AS t1
        |  FROM e GROUP BY 1),
        |u2 AS (
        |  SELECT e.user_id,
        |    min(CASE WHEN event_type = 'click' AND tsn > t1 THEN tsn END) AS t2
        |  FROM e JOIN u1 USING (user_id) GROUP BY 1),
        |u3 AS (
        |  SELECT e.user_id,
        |    min(CASE WHEN event_type = 'purchase' AND tsn > t2 THEN tsn END) AS t3
        |  FROM e JOIN u2 USING (user_id) GROUP BY 1)
        |SELECT '1_view' AS stage, count(t1) AS users FROM u1
        |UNION ALL SELECT '2_click', count(t2) FROM u2
        |UNION ALL SELECT '3_purchase', count(t3) FROM u3""".stripMargin,

    "q_retention" ->
      """WITH e AS (
        |  SELECT user_id, event_type,
        |    CAST(epoch_ns(ts) AS BIGINT) // 86400000000000 AS day
        |  FROM events),
        |f AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'signup' THEN day END) AS d0
        |  FROM e GROUP BY 1)
        |SELECT d0 // 7 AS cohort_week, (day - d0) // 7 AS week,
        |  count(DISTINCT e.user_id) AS users
        |FROM e JOIN f USING (user_id)
        |WHERE day >= d0
        |GROUP BY 1, 2""".stripMargin,

    "q_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, CAST(epoch_ns(ts) // 1000000 AS BIGINT) AS ts_ms
        |  FROM events),
        |flagged AS (
        |  SELECT user_id, event_id, ts_ms,
        |    CASE WHEN lag(ts_ms) OVER w IS NULL
        |           OR ts_ms - lag(ts_ms) OVER w > 30 * 60 * 1000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)),
        |sessions AS (
        |  SELECT user_id, ts_ms,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id,
        |  count(*) AS n_events,
        |  min(ts_ms) AS session_start,
        |  max(ts_ms) - min(ts_ms) AS duration_ms
        |FROM sessions
        |GROUP BY user_id, session_id""".stripMargin,

    "q_interval_join" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type,
        |    CAST(epoch_ns(ts) // 1000000 AS BIGINT) AS ts_ms
        |  FROM events),
        |c AS (SELECT event_id AS click_id, user_id, ts_ms AS click_ts
        |      FROM e WHERE event_type = 'click'),
        |p AS (SELECT user_id, event_id AS purchase_id, ts_ms AS purchase_ts
        |      FROM e WHERE event_type = 'purchase')
        |SELECT click_id, purchase_id,
        |  CAST(purchase_ts - click_ts AS BIGINT) AS lag_ms
        |FROM c JOIN p USING (user_id)
        |WHERE purchase_ts >= click_ts
        |  AND purchase_ts <= click_ts + 3600 * 1000""".stripMargin,

    "q_asof_join" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type,
        |    CAST(epoch_ns(ts) // 1000000 AS BIGINT) AS ts_ms FROM events),
        |c AS (SELECT event_id, user_id, ts_ms FROM e WHERE event_type = 'click'),
        |p AS (SELECT event_id AS purchase_id, user_id, ts_ms AS purchase_ts
        |      FROM e WHERE event_type = 'purchase'),
        |j AS (
        |  SELECT c.event_id, c.user_id, c.ts_ms, p.purchase_id, p.purchase_ts,
        |    row_number() OVER (PARTITION BY c.event_id
        |      ORDER BY p.purchase_ts DESC, p.purchase_id DESC) AS rn
        |  FROM c LEFT JOIN p
        |    ON c.user_id = p.user_id AND p.purchase_ts <= c.ts_ms)
        |SELECT event_id, user_id, ts_ms,
        |  purchase_id AS asof_purchase_id, purchase_ts AS asof_purchase_ts
        |FROM j WHERE rn = 1""".stripMargin,

    "q_range_join" ->
      """WITH e AS (
        |  SELECT event_id, user_id,
        |    CAST(epoch_ns(ts) // 1000000 AS BIGINT) AS ts_ms FROM events)
        |SELECT a.event_id AS id_a, b.event_id AS id_b,
        |  abs(a.ts_ms - b.ts_ms) AS gap_ms
        |FROM e a JOIN e b
        |  ON a.user_id = b.user_id AND a.event_id < b.event_id
        |  AND abs(a.ts_ms - b.ts_ms) <= 60000""".stripMargin,

    "q_brand_stats" ->
      """SELECT p_brand,
        |  count(DISTINCT p_type) AS n_types,
        |  CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM part
        |GROUP BY p_brand
        |HAVING count(DISTINCT p_type) >= 1""".stripMargin,

    "q_priority_count" ->
      """SELECT o_orderpriority, count(*) AS n
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority""".stripMargin,

    "q_pivot" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_filled,
        |  count(*) FILTER (WHERE o_orderstatus = 'P') AS n_pending
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    "q_quantiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS p50,
        |  round(quantile_cont(l_quantity, 0.9), 6) AS p90,
        |  round(quantile_cont(l_quantity, 0.99), 6) AS p99
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q_setops" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""".stripMargin,

    "q_semijoin" ->
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)""".stripMargin,

    "q_antijoin" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')""".stripMargin,

    "q_rollup" ->
      """SELECT p_brand, p_size, count(*) AS n
        |FROM part GROUP BY ROLLUP (p_brand, p_size)""".stripMargin,

    // the gram-bucketed fuzzy join must equal the plain quadratic join
    "q_fuzzy_join" ->
      """WITH n AS (
        |  SELECT p_partkey AS id, p_name AS name FROM part
        |  WHERE p_size <= 3 AND length(p_name) >= 9)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  CAST(levenshtein(a.name, b.name) AS INTEGER) AS dist
        |FROM n a JOIN n b ON a.id < b.id
        |WHERE levenshtein(a.name, b.name) <= 2""".stripMargin,

    // the salted join must equal the plain join (salts only split work)
    "q_salted_join" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,

    // the salted two-phase aggregation must equal the plain GROUP BY
    "q_salted_agg" ->
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q_distinct_sketch" -> HllSql.distinctSketchSql(graft.functions.HllFunctions.DefaultP),
    "q_cms_freq" -> CmsSql.cmsFreqSql(
      graft.functions.CmsFunctions.DefaultDepth,
      graft.functions.CmsFunctions.DefaultWidth),
    "q_sketch_intersect" -> HllSql.sketchIntersectSql(graft.functions.HllFunctions.DefaultP),

    // the bloom only PRUNES (no false negatives); the exact joins confirm,
    // so the result must equal the plain semi/anti join
    "q_bloom_semijoin" ->
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |WHERE l_orderkey IN
        |  (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |GROUP BY l_returnflag""".stripMargin,

    "q_bloom_antijoin" ->
      """SELECT c_mktsegment, count(*) AS n
        |FROM customer
        |WHERE NOT EXISTS
        |  (SELECT 1 FROM orders
        |   WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment""".stripMargin,

    "q_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS INTEGER) AS gid
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,

    "dedup_exact" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1""".stripMargin,

    "dedup_fingerprint" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1""".stripMargin,

    "dedup_ngram_jaccard" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id AS id, list_distinct(list_transform(
        |    generate_series(0, greatest(len(t) - 3, 0)),
        |    i -> array_to_string(t[i + 1: i + 3], ' '))) AS shingles
        |  FROM tok),
        |inv AS (SELECT id, len(shingles) AS n, unnest(shingles) AS g FROM sh),
        |pairs AS (
        |  SELECT x.id AS id_a, y.id AS id_b,
        |    count(*) AS common, any_value(x.n) AS na, any_value(y.n) AS nb
        |  FROM inv x JOIN inv y ON x.g = y.g AND x.id < y.id
        |  GROUP BY x.id, y.id)
        |SELECT id_a, id_b,
        |  round(CAST(common AS DOUBLE) / CAST(na + nb - common AS DOUBLE), 6) AS jaccard
        |FROM pairs
        |WHERE CAST(common AS DOUBLE) / CAST(na + nb - common AS DOUBLE) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,

    "text_stats" ->
      """SELECT doc_id,
        |  CAST(length(text) AS INTEGER) AS chars,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER) AS tokens,
        |  CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS INTEGER) AS puncts,
        |  CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |    w -> list_contains(['the','a','an','and','or','of','to','in','is','it',
        |                        'that','for','on','with','as','was','at','by','be'], w))) AS INTEGER) AS stopwords
        |FROM documents""".stripMargin,

    "quality_score" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    CAST(length(text) AS DOUBLE) AS len,
        |    CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) AS puncts,
        |    CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      w -> list_contains(['the','a','an','and','or','of','to','in','is','it',
        |                          'that','for','on','with','as','was','at','by','be'], w))) AS DOUBLE) AS stops,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS toks
        |  FROM documents),
        |scored AS (
        |  SELECT doc_id,
        |    CASE WHEN len >= 50 AND len <= 5000 THEN 1.0
        |         WHEN len < 50 THEN len / 50.0
        |         ELSE 5000.0 / len END AS len_score,
        |    CASE WHEN puncts / greatest(len, 1.0) <= 0.1 THEN 1.0
        |         ELSE greatest(0.0, 1.0 - (puncts / greatest(len, 1.0) - 0.1) * 5.0) END AS punct_score,
        |    least(stops / greatest(toks, 1.0) * 5.0, 1.0) AS stop_score
        |  FROM base)
        |SELECT doc_id, round((len_score + punct_score + stop_score) / 3.0, 6) AS quality
        |FROM scored""".stripMargin,

    // NFC + control strip + whitespace collapse + trim, utf8proc vs ICU
    "normalize_text" ->
      """SELECT doc_id,
        |  trim(regexp_replace(
        |    regexp_replace(nfc_normalize(text),
        |      '[\x00-\x08\x0B-\x1F\x7F]', '', 'g'),
        |    '[ \t]+', ' ', 'g')) AS norm_text,
        |  CAST(length(trim(regexp_replace(
        |    regexp_replace(nfc_normalize(text),
        |      '[\x00-\x08\x0B-\x1F\x7F]', '', 'g'),
        |    '[ \t]+', ' ', 'g'))) AS INTEGER) AS n_chars_norm
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Aho-Corasick hits == per-phrase contains, sorted; empty list joins
    // to NULL in DuckDB, hence the coalesce
    "blocklist_hits" ->
      """SELECT doc_id,
        |  coalesce(array_to_string(list_sort(
        |    list_filter(['agg row scan','window merge','slow fast',
        |                 'the join','data window'],
        |      p -> contains(text, p))), ','), '') AS hits,
        |  len(list_filter(['agg row scan','window merge','slow fast',
        |                   'the join','data window'],
        |    p -> contains(text, p))) > 0 AS blocked
        |FROM documents ORDER BY doc_id""".stripMargin,

    // the Spark side writes documents to JSONL and reads them back with a
    // pinned-schema from_json parse — only a true parse of every line
    // reproduces the table the oracle reads from parquet
    "jsonl_roundtrip" ->
      """SELECT doc_id, lang, source,
        |  CAST(length(text) AS INTEGER) AS n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,

    // the quality_score per-row formula nested, means through DECIMAL
    // over the 6-dp-rounded scores (the pipeline_clean contract)
    "corpus_report" ->
      """WITH base AS (
        |  SELECT doc_id, lang, source, text,
        |    CAST(length(text) AS DOUBLE) AS len,
        |    CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) AS puncts,
        |    CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      w -> list_contains(['the','a','an','and','or','of','to','in','is','it',
        |                          'that','for','on','with','as','was','at','by','be'], w))) AS DOUBLE) AS stops,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS toks
        |  FROM documents),
        |scored AS (
        |  SELECT doc_id, lang, source, toks,
        |    round((
        |      (CASE WHEN len >= 50 AND len <= 5000 THEN 1.0
        |            WHEN len < 50 THEN len / 50.0
        |            ELSE 5000.0 / len END) +
        |      (CASE WHEN puncts / greatest(len, 1.0) <= 0.1 THEN 1.0
        |            ELSE greatest(0.0, 1.0 - (puncts / greatest(len, 1.0) - 0.1) * 5.0) END) +
        |      least(stops / greatest(toks, 1.0) * 5.0, 1.0)) / 3.0, 6) AS quality
        |  FROM base)
        |SELECT lang, source,
        |  count(*) AS n_docs,
        |  CAST(sum(CAST(toks AS BIGINT)) AS BIGINT) AS total_tokens,
        |  CAST((2 * sum(CAST(round(quality * 1000000) AS BIGINT)) + count(*))
        |       // (2 * count(*)) AS DOUBLE) / 1000000.0 AS avg_quality
        |FROM scored
        |GROUP BY lang, source
        |ORDER BY lang, source""".stripMargin,

    "lang_id" -> LangIdSql.langIdSql,

    "pipeline_clean" ->
      """WITH dedup AS (
        |  SELECT doc_id, text FROM documents
        |  QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1),
        |base AS (
        |  SELECT doc_id, text,
        |    CAST(length(text) AS DOUBLE) AS len,
        |    CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) AS puncts,
        |    CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      w -> list_contains(['the','a','an','and','or','of','to','in','is','it',
        |                          'that','for','on','with','as','was','at','by','be'], w))) AS DOUBLE) AS stops,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS toks
        |  FROM dedup),
        |scored AS (
        |  SELECT doc_id, text, toks,
        |    round((
        |      CASE WHEN len >= 50 AND len <= 5000 THEN 1.0
        |           WHEN len < 50 THEN len / 50.0
        |           ELSE 5000.0 / len END +
        |      CASE WHEN puncts / greatest(len, 1.0) <= 0.1 THEN 1.0
        |           ELSE greatest(0.0, 1.0 - (puncts / greatest(len, 1.0) - 0.1) * 5.0) END +
        |      least(stops / greatest(toks, 1.0) * 5.0, 1.0)) / 3.0, 6) AS quality
        |  FROM base),
        |kept AS (SELECT * FROM scored WHERE quality >= 0.5),
        |h AS (
        |  SELECT doc_id, text, toks, quality,
        |    len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      w -> list_contains(['the','a','and','of','to','in','is','it','that','for'], w))) AS h_en,
        |    len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      w -> list_contains(['der','die','das','und','ist','nicht','ein','zu','mit','auf'], w))) AS h_de,
        |    len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      w -> list_contains(['el','la','de','que','y','en','un','es','no','por'], w))) AS h_es,
        |    len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      w -> list_contains(['le','la','de','et','un','est','pas','que','pour','dans'], w))) AS h_fr,
        |    len(list_filter(['的','是','不','了','在','人','有','我','他','这'],
        |      ch -> instr(text, ch) > 0)) AS h_zh
        |  FROM kept),
        |labeled AS (
        |  SELECT toks, quality,
        |    CASE WHEN greatest(h_en, h_de, h_es, h_fr, h_zh) = 0 THEN 'und'
        |         WHEN h_zh = greatest(h_en, h_de, h_es, h_fr, h_zh) THEN 'zh'
        |         WHEN h_fr = greatest(h_en, h_de, h_es, h_fr, h_zh) THEN 'fr'
        |         WHEN h_es = greatest(h_en, h_de, h_es, h_fr, h_zh) THEN 'es'
        |         WHEN h_en = greatest(h_en, h_de, h_es, h_fr, h_zh) THEN 'en'
        |         ELSE 'de' END AS lang_pred
        |  FROM h)
        |SELECT lang_pred,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CAST(toks AS BIGINT)) AS BIGINT) AS total_tokens,
        |  round(CAST(sum(CAST(quality AS DECIMAL(18,6))) / count(*) AS DOUBLE), 6) AS avg_quality
        |FROM labeled GROUP BY lang_pred""".stripMargin,

    "rep_ratio" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents)
        |SELECT doc_id,
        |  CASE WHEN len(toks) < 3 THEN 0.0
        |       ELSE round(1.0 -
        |         CAST(len(list_distinct(list_transform(
        |           generate_series(1, len(toks) - 2),
        |           i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))) AS DOUBLE) /
        |         CAST(len(toks) - 2 AS DOUBLE), 6) END AS rep_ratio
        |FROM t""".stripMargin,

    "redact_pii" ->
      """SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(
        |      regexp_replace(text,
        |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\d{3}[-. ]\d{3}[-. ]\d{4}', '<PHONE>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS redacted
        |FROM documents""".stripMargin,

    "q_heavy_hitters" ->
      """WITH toks AS (
        |  SELECT lang, unnest(string_split_regex(trim(text), '\s+')) AS token
        |  FROM documents),
        |counts AS (
        |  SELECT lang, token, count(*) AS n FROM toks GROUP BY lang, token)
        |SELECT lang,
        |  CAST(row_number() OVER (PARTITION BY lang ORDER BY n DESC, token) AS INTEGER) AS rank,
        |  token, n
        |FROM counts
        |QUALIFY rank <= 10""".stripMargin,

    "quantize_int8" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |s AS (
        |  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS scale FROM e)
        |SELECT vec_id, CAST(pos AS INTEGER) AS pos,
        |  CAST(CASE WHEN scale = 0 THEN 0 ELSE round(x / scale * 127) END AS INTEGER) AS q
        |FROM (SELECT vec_id, scale, unnest(v) AS x, unnest(range(0, len(v))) AS pos FROM s)""".stripMargin,

    "kmeans_clusters" -> kmeansClustersSql,

    // diversity sample: the kmeans replay nested, then the cap_per_source
    // Lehmer rank applied per cluster
    "sample_diverse" ->
      s"""WITH assigned AS ($kmeansClustersSql),
         |h AS (
         |  SELECT vec_id, cluster,
         |    ((vec_id + 1) % 2147483647) * 48271 % 2147483647
         |      * 48271 % 2147483647
         |      * 48271 % 2147483647 AS x3
         |  FROM assigned)
         |SELECT vec_id, cluster FROM h
         |QUALIFY row_number() OVER (PARTITION BY cluster ORDER BY x3, vec_id) <= 12
         |ORDER BY vec_id""".stripMargin,

    // the Spark side groups grams by their FNV-1a fingerprint (8-byte
    // shuffle key, text never shuffles); the oracle folds the IDENTICAL
    // hash per gram so even a collision-induced false dup would reproduce
    "dedup_spans" ->
      """WITH d AS (
        |  SELECT doc_id, CASE WHEN len(trim(text)) = 0 THEN []
        |                      ELSE string_split_regex(trim(text), '\s+') END AS w
        |  FROM documents),
        |occ AS (
        |  SELECT doc_id, unnest(generate_series(0, len(w) - 5)) AS pos, w FROM d),
        |g AS (
        |  SELECT doc_id, pos, list_reduce(
        |    list_concat([14695981039346656037::HUGEINT],
        |      list_transform(
        |        list_filter(string_split(array_to_string(w[pos+1: pos+5], ' '), ''),
        |                    c -> c <> ''),
        |        c -> ord(c)::HUGEINT)),
        |    (h, b) -> ((h - h % 256 + xor((h % 256)::BIGINT, b::BIGINT)::HUGEINT)
        |               * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT
        |  ) AS fp
        |  FROM occ),
        |dup AS (SELECT fp FROM g GROUP BY fp HAVING count(*) >= 2),
        |cov AS (
        |  SELECT doc_id,
        |    list_distinct(flatten(list_transform(list(pos),
        |      p -> generate_series(p, p + 4)))) AS covered
        |  FROM g JOIN dup USING (fp)
        |  GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(len(w) AS INTEGER) AS n_words,
        |  CAST(coalesce(len(covered), 0) AS INTEGER) AS removed_words,
        |  -- coalesce: DuckDB's array_to_string([]) is NULL, Spark's
        |  -- array_join([]) is '' — a fully-removed doc keeps ''
        |  coalesce(array_to_string(
        |    list_transform(
        |      list_filter(generate_series(1, len(w)),
        |        i -> covered IS NULL OR NOT list_contains(covered, i - 1)),
        |      i -> w[i]), ' '), '') AS kept_text
        |FROM d LEFT JOIN cov USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // incremental span dedup: the batch (doc_id % 4 = 0) probes the
    // corpus gram set (doc_id % 4 <> 0) — same FNV fold as dedup_spans;
    // ids are disjoint so the index's owner guard never fires here
    "dedup_spans_incremental" ->
      """WITH d AS (
        |  SELECT doc_id, CASE WHEN len(trim(text)) = 0 THEN []
        |                      ELSE string_split_regex(trim(text), '\s+') END AS w
        |  FROM documents),
        |bocc AS (
        |  SELECT doc_id, unnest(generate_series(0, len(w) - 5)) AS pos, w
        |  FROM d WHERE doc_id % 4 = 0),
        |bg AS (
        |  SELECT doc_id, pos, list_reduce(
        |    list_concat([14695981039346656037::HUGEINT],
        |      list_transform(
        |        list_filter(string_split(array_to_string(w[pos+1: pos+5], ' '), ''),
        |                    c -> c <> ''),
        |        c -> ord(c)::HUGEINT)),
        |    (h, b) -> ((h - h % 256 + xor((h % 256)::BIGINT, b::BIGINT)::HUGEINT)
        |               * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT
        |  ) AS fp
        |  FROM bocc),
        |cocc AS (
        |  SELECT doc_id, unnest(generate_series(0, len(w) - 5)) AS pos, w
        |  FROM d WHERE doc_id % 4 <> 0),
        |cg AS (
        |  SELECT DISTINCT list_reduce(
        |    list_concat([14695981039346656037::HUGEINT],
        |      list_transform(
        |        list_filter(string_split(array_to_string(w[pos+1: pos+5], ' '), ''),
        |                    c -> c <> ''),
        |        c -> ord(c)::HUGEINT)),
        |    (h, b) -> ((h - h % 256 + xor((h % 256)::BIGINT, b::BIGINT)::HUGEINT)
        |               * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT
        |  ) AS fp
        |  FROM cocc),
        |bdup AS (SELECT fp FROM bg GROUP BY fp HAVING count(*) >= 2),
        |hits AS (
        |  SELECT doc_id, pos FROM bg WHERE fp IN (SELECT fp FROM cg)
        |  UNION
        |  SELECT bg.doc_id, bg.pos FROM bg JOIN bdup USING (fp)),
        |cov AS (
        |  SELECT doc_id,
        |    list_distinct(flatten(list_transform(list(pos),
        |      p -> generate_series(p, p + 4)))) AS covered
        |  FROM hits GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(len(w) AS INTEGER) AS n_words,
        |  CAST(coalesce(len(covered), 0) AS INTEGER) AS removed_words,
        |  coalesce(array_to_string(
        |    list_transform(
        |      list_filter(generate_series(1, len(w)),
        |        i -> covered IS NULL OR NOT list_contains(covered, i - 1)),
        |      i -> w[i]), ' '), '') AS kept_text
        |FROM d LEFT JOIN cov USING (doc_id)
        |WHERE d.doc_id % 4 = 0
        |ORDER BY doc_id""".stripMargin,

    // SemDeDup: the kmeans CTE is the exact kmeans_clusters statement
    // (nested WITH); pair cosines fold dot and norms in element order and
    // divide by sqrt-of-product, matching the Spark expression bit-for-bit
    "dedup_semantic" ->
      s"""WITH assigned AS ($kmeansClustersSql),
         |ee AS (
         |  SELECT vec_id, list_transform(embedding, x -> round(CAST(x AS DOUBLE), 6)) AS v
         |  FROM embeddings),
         |wc AS (SELECT ee.vec_id, v, cluster FROM ee JOIN assigned USING (vec_id)),
         |p AS (
         |  SELECT x.vec_id AS ia, y.vec_id AS ib,
         |    list_sum(list_transform(generate_series(1, len(x.v)), i -> x.v[i] * y.v[i])) /
         |    sqrt(list_sum(list_transform(generate_series(1, len(x.v)), i -> x.v[i] * x.v[i])) *
         |         list_sum(list_transform(generate_series(1, len(y.v)), i -> y.v[i] * y.v[i]))) AS cos
         |  FROM wc x JOIN wc y ON x.cluster = y.cluster AND x.vec_id < y.vec_id),
         |dropped AS (SELECT DISTINCT ib FROM p WHERE cos >= 0.35)
         |SELECT vec_id, cluster FROM wc
         |WHERE vec_id NOT IN (SELECT ib FROM dropped)
         |ORDER BY vec_id""".stripMargin,

    "pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER) AS tokens
        |  FROM documents)
        |SELECT doc_id, tokens,
        |  CAST(sum(tokens) OVER (ORDER BY doc_id) AS BIGINT) AS cum_tokens,
        |  CAST((sum(tokens) OVER (ORDER BY doc_id) - tokens) // 512 AS BIGINT) AS seq_id
        |FROM t""".stripMargin,

    "token_histogram" ->
      """SELECT token, count(*) AS n FROM (
        |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS token FROM documents)
        |GROUP BY token
        |ORDER BY n DESC, token
        |LIMIT 20""".stripMargin,

    "ann_brute" ->
      """WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 5),
        |c AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
        |s AS (
        |  SELECT qid, id,
        |    list_sum(list_transform(generate_series(1, len(qvec)),
        |      i -> CAST(qvec[i] AS DOUBLE) * CAST(vec[i] AS DOUBLE))) /
        |    sqrt(list_sum(list_transform(generate_series(1, len(qvec)),
        |      i -> CAST(qvec[i] AS DOUBLE) * CAST(qvec[i] AS DOUBLE))) *
        |      list_sum(list_transform(generate_series(1, len(vec)),
        |      i -> CAST(vec[i] AS DOUBLE) * CAST(vec[i] AS DOUBLE)))) AS cos
        |  FROM q, c WHERE qid <> id)
        |SELECT qid, id AS neighbor_id,
        |  CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id) AS INTEGER) AS rank
        |FROM s
        |QUALIFY rank <= 5""".stripMargin,

    // ann_brute's cosine recipe + the label-inequality pair predicate
    "hard_negatives" ->
      """WITH q AS (
        |  SELECT vec_id AS qid, embedding AS qvec, label AS qlabel
        |  FROM embeddings WHERE vec_id < 8),
        |c AS (SELECT vec_id AS id, embedding AS vec, label FROM embeddings),
        |s AS (
        |  SELECT qid, id,
        |    list_sum(list_transform(generate_series(1, len(qvec)),
        |      i -> CAST(qvec[i] AS DOUBLE) * CAST(vec[i] AS DOUBLE))) /
        |    sqrt(list_sum(list_transform(generate_series(1, len(qvec)),
        |      i -> CAST(qvec[i] AS DOUBLE) * CAST(qvec[i] AS DOUBLE))) *
        |      list_sum(list_transform(generate_series(1, len(vec)),
        |      i -> CAST(vec[i] AS DOUBLE) * CAST(vec[i] AS DOUBLE)))) AS cos
        |  FROM q, c WHERE qlabel <> label AND qid <> id)
        |SELECT qid, id AS neg_id,
        |  CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id) AS INTEGER) AS rank
        |FROM s
        |QUALIFY rank <= 5""".stripMargin,

    "multimodal_meta" ->
      """SELECT doc_id, 'text/plain' AS mime,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |FROM documents""".stripMargin,

    // the Spark side ENCODES a real PNG per doc (dims derived from doc_id)
    // and decodes it back with the real ImageIO decoder; the oracle
    // recomputes the dims arithmetically — only a true codec read matches
    "multimodal_decode_real" ->
      """SELECT doc_id,
        |  CAST(doc_id % 7 + 1 AS INTEGER) AS width,
        |  CAST(doc_id % 5 + 1 AS INTEGER) AS height,
        |  CAST(3 AS INTEGER) AS bands
        |FROM documents""".stripMargin,

    // the Spark side PNG-encodes doc_id-seeded pixels, ImageIO-decodes,
    // and nearest-neighbor-resamples to aspect-fit maxSide 4; the oracle
    // replays source dims, the integer aspect-fit, the floor-arithmetic
    // source-pixel lookup, and the position-weighted checksum of the
    // resized grid — only a byte-exact decode → resample chain matches
    "multimodal_resize_real" ->
      """WITH dims AS (
        |  SELECT doc_id AS id, doc_id % 7 + 1 AS w, doc_id % 5 + 1 AS h
        |  FROM documents),
        |dst AS (
        |  SELECT id, w, h,
        |    CASE WHEN greatest(w, h) <= 4 THEN w
        |         ELSE greatest(1, (w * 4) // greatest(w, h)) END AS dw,
        |    CASE WHEN greatest(w, h) <= 4 THEN h
        |         ELSE greatest(1, (h * 4) // greatest(w, h)) END AS dh
        |  FROM dims),
        |px AS (
        |  SELECT id, w, h, dw, dh, x, y,
        |    (x * w) // dw AS sx, (y * h) // dh AS sy
        |  FROM dst,
        |    LATERAL (SELECT unnest(range(dw)) AS x),
        |    LATERAL (SELECT unnest(range(dh)) AS y)),
        |chk AS (
        |  SELECT id, any_value(w) AS w, any_value(h) AS h, dw, dh,
        |    sum((1 + x + y * dw)
        |      * ((id * 2654435761 + sx * 7 + sy * 131) & 16777215)) AS c
        |  FROM px GROUP BY id, dw, dh)
        |SELECT id AS doc_id,
        |  CAST(w AS INTEGER) AS src_w, CAST(h AS INTEGER) AS src_h,
        |  CAST(dw AS INTEGER) AS resized_w, CAST(dh AS INTEGER) AS resized_h,
        |  CAST(c AS BIGINT) AS checksum
        |FROM chk""".stripMargin,

    // the Spark side synthesizes real binary payloads (byte j =
    // (doc_id + j*7) mod 256, length 64 + doc_id mod 192), slices them
    // with sampleSlices (4 evenly spaced 16-byte ranges), and checksums
    // each REAL slice with the codegen'd byte_sum expression; the oracle
    // replays positions and sums from the content formula
    "frame_sample" ->
      """WITH base AS (
        |  SELECT doc_id, CAST(64 + doc_id % 192 AS BIGINT) AS len
        |  FROM documents),
        |sl AS (
        |  SELECT doc_id, len, i AS slice_idx,
        |    CAST(floor(i * greatest(len - 16, 1) / 3.0) + 1 AS BIGINT)
        |      AS start_pos
        |  FROM base, LATERAL (SELECT unnest(range(4)) AS i)),
        |sl2 AS (
        |  SELECT doc_id, slice_idx, start_pos,
        |    greatest(0, least(16, len - start_pos + 1)) AS slice_len
        |  FROM sl),
        |sums AS (
        |  SELECT doc_id, slice_idx, start_pos, slice_len,
        |    coalesce(sum((doc_id + (start_pos - 1 + j) * 7) % 256), 0)
        |      AS byte_sum
        |  FROM sl2
        |    LEFT JOIN LATERAL (SELECT unnest(range(slice_len)) AS j) ON true
        |  GROUP BY 1, 2, 3, 4)
        |SELECT doc_id, CAST(slice_idx AS INTEGER) AS slice_idx,
        |  CAST(start_pos AS INTEGER) AS start_pos,
        |  CAST(slice_len AS INTEGER) AS slice_len,
        |  CAST(byte_sum AS BIGINT) AS byte_sum
        |FROM sums""".stripMargin,

    // the Spark side ENCODES a real WAV per doc (PCM synthesized from doc_id
    // arithmetic) and decodes it back with the real javax.sound decoder; the
    // oracle replays the synthesis — header fields AND exact PCM statistics
    // must survive the container round-trip to match
    "multimodal_decode_audio" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(8000 + (doc_id % 3) * 4000 AS INTEGER) AS sample_rate,
        |    CAST(doc_id % 2 + 1 AS INTEGER) AS channels,
        |    CAST(50 + doc_id % 151 AS BIGINT) AS n_frames
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, sample_rate, channels, n_frames,
        |    list_transform(
        |      generate_series(0, CAST(n_frames * channels AS INTEGER) - 1),
        |      i -> (doc_id * 2654435761 + i * 104729) % 65536 - 32768) AS samp
        |  FROM d)
        |SELECT doc_id, sample_rate, channels, n_frames,
        |  n_frames * 1000 // sample_rate AS duration_ms,
        |  CAST(list_sum(list_transform(samp, x -> abs(x))) AS BIGINT) AS amp_sum,
        |  CAST(list_sum(list_transform(samp, x -> x * x)) AS BIGINT) AS sq_sum
        |FROM s""".stripMargin,

    // the Spark side synthesizes a real headers-only MP4 per doc (box
    // layout from doc_id arithmetic) and walks it back with the real
    // ISO-BMFF parser; the oracle replays the arithmetic — brand list
    // indexing, integer-division duration, per-track codec rotation
    "multimodal_decode_video" ->
      """SELECT doc_id,
        |  ['isom','mp42','3gp4'][CAST(doc_id % 3 AS INTEGER) + 1] AS brand,
        |  CAST(600 + (doc_id % 4) * 300 AS BIGINT) AS timescale,
        |  (1000 + doc_id % 5000) * 1000
        |    // (600 + (doc_id % 4) * 300) AS duration_ms,
        |  CAST(1 + doc_id % 3 AS INTEGER) AS n_tracks,
        |  CAST(320 + (doc_id % 5) * 160 AS INTEGER) AS width,
        |  CAST(180 + (doc_id % 5) * 90 AS INTEGER) AS height,
        |  array_to_string(list_transform(
        |    generate_series(0, CAST(doc_id % 3 AS INTEGER)),
        |    t -> ['avc1','hvc1','mp4a'][CAST((doc_id + t) % 3 AS INTEGER) + 1]),
        |    ',') AS codecs
        |FROM documents""".stripMargin,

    // compaction survivor per key = the key's max-ord record (keyed routing
    // confines each key to one partition; offsets follow ord within it)
    "compact_topic" ->
      """SELECT user_id, max(event_id) AS event_id
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    // independent fixpoint formulation of connected components: recursive
    // transitive closure over the SAME oracle-verified jaccard edge list,
    // then min reachable id per node
    "dup_clusters" ->
      """WITH RECURSIVE tok AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id AS id, list_distinct(list_transform(
        |    generate_series(0, greatest(len(t) - 3, 0)),
        |    i -> array_to_string(t[i + 1: i + 3], ' '))) AS shingles
        |  FROM tok),
        |inv AS (SELECT id, len(shingles) AS n, unnest(shingles) AS g FROM sh),
        |pairs AS (
        |  SELECT id_a, id_b FROM (
        |    SELECT x.id AS id_a, y.id AS id_b,
        |      count(*) AS common, any_value(x.n) AS na, any_value(y.n) AS nb
        |    FROM inv x JOIN inv y ON x.g = y.g AND x.id < y.id
        |    GROUP BY x.id, y.id)
        |  WHERE CAST(common AS DOUBLE) / CAST(na + nb - common AS DOUBLE) >= 0.8),
        |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
        |          UNION SELECT id_b, id_a FROM pairs),
        |reach(id, lbl) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.id)
        |SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach
        |GROUP BY id ORDER BY doc_id""".stripMargin,

    "dedup_survivors" ->
      """WITH RECURSIVE tok AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id AS id, list_distinct(list_transform(
        |    generate_series(0, greatest(len(t) - 3, 0)),
        |    i -> array_to_string(t[i + 1: i + 3], ' '))) AS shingles
        |  FROM tok),
        |inv AS (SELECT id, len(shingles) AS n, unnest(shingles) AS g FROM sh),
        |pairs AS (
        |  SELECT id_a, id_b FROM (
        |    SELECT x.id AS id_a, y.id AS id_b,
        |      count(*) AS common, any_value(x.n) AS na, any_value(y.n) AS nb
        |    FROM inv x JOIN inv y ON x.g = y.g AND x.id < y.id
        |    GROUP BY x.id, y.id)
        |  WHERE CAST(common AS DOUBLE) / CAST(na + nb - common AS DOUBLE) >= 0.8),
        |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
        |          UNION SELECT id_b, id_a FROM pairs),
        |reach(id, lbl) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.id),
        |comp AS (SELECT id, min(lbl) AS lbl FROM reach GROUP BY id)
        |SELECT doc_id, lang FROM documents
        |WHERE doc_id NOT IN (SELECT id FROM comp WHERE id <> lbl)
        |ORDER BY doc_id""".stripMargin,

    "decontaminate" -> decontaminateSql,

    // identical three-step MINSTD arithmetic: x <- x*48271 mod (2^31-1),
    // iterated 3x from (doc_id + 1 mod M) — exact integer math on both
    // engines; the +1 dodges the Lehmer fixed point at 0 (see
    // graft.pipeline.Sampling.hashUnit)
    "sample_stratified" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE CAST(((doc_id + 1) % 2147483647) * 48271 % 2147483647
        |             * 48271 % 2147483647
        |             * 48271 % 2147483647 AS DOUBLE)
        |        / 2147483647.0 <
        |  CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 1.0 WHEN 'es' THEN 0.25
        |            WHEN 'fr' THEN 0.25 WHEN 'zh' THEN 0.75 ELSE 0.0 END
        |ORDER BY doc_id""".stripMargin,

    // same Lehmer chain as an integer ORDER key: rank within source by
    // (x3, doc_id), keep rank <= 10 — the deterministic per-domain cap
    "cap_per_source" ->
      """WITH h AS (
        |  SELECT doc_id, source,
        |    ((doc_id + 1) % 2147483647) * 48271 % 2147483647
        |      * 48271 % 2147483647
        |      * 48271 % 2147483647 AS x3
        |  FROM documents)
        |SELECT doc_id, source FROM h
        |QUALIFY row_number() OVER (PARTITION BY source ORDER BY x3, doc_id) <= 10
        |ORDER BY doc_id""".stripMargin,

    // DSIR hashed-n-gram importance weights + Gumbel top-k — see DsirSql
    "dsir_weights" -> DsirSql.dsirWeightsSql,
    "dsir_sample" -> DsirSql.dsirSampleSql,

    // Spark XXH64 hashLong chain replayed in HUGEINT SQL — see XxHash64Sql
    "shuffle_shards" -> XxHash64Sql.shuffleShardsSql,

    // target token counts are exact integers on both sides (no double→int
    // conversion in SQL)
    "mix_weights" ->
      """WITH agg AS (
        |  SELECT lang AS stratum,
        |    CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS tokens
        |  FROM documents GROUP BY 1)
        |SELECT stratum, tokens,
        |  CAST(CASE stratum WHEN 'en' THEN 20000 WHEN 'de' THEN 10000
        |       WHEN 'es' THEN 7500 WHEN 'fr' THEN 7500 WHEN 'zh' THEN 5000
        |       ELSE 0 END AS BIGINT) AS target_tokens,
        |  round(least(1.0, CAST(CASE stratum WHEN 'en' THEN 20000
        |       WHEN 'de' THEN 10000 WHEN 'es' THEN 7500 WHEN 'fr' THEN 7500
        |       WHEN 'zh' THEN 5000 ELSE 0 END AS DOUBLE)
        |     / greatest(CAST(tokens AS DOUBLE), 1.0)), 6) AS rate
        |FROM agg ORDER BY stratum""".stripMargin,

    // XLM-R temperature sampling: token-share^0.3 renormalized; q and
    // rate rounded at 6 dp after the double chain on both sides
    "mix_temperature" ->
      """WITH agg AS (
        |  SELECT lang AS stratum,
        |    CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS tokens
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(sum(tokens) AS DOUBLE) AS total FROM agg),
        |p AS (
        |  SELECT stratum, tokens,
        |    pow(CAST(tokens AS DOUBLE) / total, 0.3) AS qr
        |  FROM agg, tot),
        |s AS (SELECT sum(qr) AS qs FROM p)
        |SELECT stratum, tokens,
        |  round(qr / qs, 6) AS q,
        |  round(least(1.0, 50000.0 * (qr / qs) / CAST(tokens AS DOUBLE)), 6) AS rate
        |FROM p, s ORDER BY stratum""".stripMargin,

    "lm_score" ->
      """WITH terms AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |t2 AS (SELECT doc_id, term FROM terms WHERE term <> ''),
        |total AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM t2),
        |model AS (SELECT term, count(*) AS cnt FROM t2 GROUP BY 1)
        |SELECT doc_id,
        |  round(CAST(sum(CAST(-ln(CAST(cnt AS DOUBLE) / total.n)
        |      AS DECIMAL(28,18))) AS DOUBLE) / CAST(count(*) AS DOUBLE),
        |    6) AS nll
        |FROM t2 JOIN model USING (term) CROSS JOIN total
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // CCNet head/middle/tail: the lm_score NLL re-derived, then per-lang
    // tercile thresholds (quantile_cont == Spark's exact percentile,
    // both 6-dp-rounded before the <= boundary compare)
    "ppl_buckets" ->
      """WITH terms AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |t2 AS (SELECT doc_id, term FROM terms WHERE term <> ''),
        |total AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM t2),
        |model AS (SELECT term, count(*) AS cnt FROM t2 GROUP BY 1),
        |nllq AS (
        |  SELECT doc_id,
        |    round(CAST(sum(CAST(-ln(CAST(cnt AS DOUBLE) / total.n)
        |        AS DECIMAL(28,18))) AS DOUBLE) / CAST(count(*) AS DOUBLE),
        |      6) AS nll
        |  FROM t2 JOIN model USING (term) CROSS JOIN total
        |  GROUP BY doc_id),
        |d AS (
        |  SELECT n.doc_id, doc.lang, n.nll
        |  FROM nllq n JOIN documents doc USING (doc_id)),
        |th AS (
        |  SELECT lang,
        |    round(quantile_cont(nll, 0.33333), 6) AS p33,
        |    round(quantile_cont(nll, 0.66667), 6) AS p67
        |  FROM d GROUP BY lang)
        |SELECT d.doc_id, d.lang, d.nll,
        |  CASE WHEN d.nll <= th.p33 THEN 'head'
        |       WHEN d.nll <= th.p67 THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM d JOIN th USING (lang) ORDER BY d.doc_id""".stripMargin,

    // add-one bigram LM: the lm_score recipe at order 2 (DECIMAL sums,
    // 6-dp round); bigram stream keeps multiplicity
    // toks filters empty fragments so the bigram stream matches Spark's
    // wordNgramsF on hostile whitespace (leading \t/\n), not just fixtures
    "lm_score_bigram" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |                x -> x <> '') AS t
        |  FROM documents),
        |t2 AS (SELECT doc_id, unnest(t) AS term FROM toks),
        |t3 AS (SELECT doc_id, term FROM t2 WHERE term <> ''),
        |uni AS (SELECT term, count(*) AS cu FROM t3 GROUP BY 1),
        |v AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM uni),
        |bgs AS (
        |  SELECT doc_id, unnest(list_transform(range(len(t) - 1),
        |    i -> t[CAST(i + 1 AS BIGINT)] || ' ' || t[CAST(i + 2 AS BIGINT)])) AS bg
        |  FROM toks),
        |bi AS (SELECT bg, count(*) AS cb FROM bgs GROUP BY 1),
        |sc AS (
        |  SELECT doc_id,
        |    count(*) AS n,
        |    round(CAST(sum(CAST(-ln((cb + 1.0) / (cu + v.v)) AS DECIMAL(28,18))) AS DOUBLE)
        |      / count(*), 6) AS nll2
        |  FROM bgs JOIN bi USING (bg)
        |  JOIN uni ON uni.term = string_split(bg, ' ')[1]
        |  CROSS JOIN v GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(sc.n, 0) AS n_bigrams,
        |  coalesce(sc.nll2, 0.0) AS nll2
        |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // bit-exact Morton interleave, generated as 8 bit-pair terms
    "zorder_key" ->
      s"""SELECT l_orderkey, l_linenumber, l_partkey,
         |  CAST(${interleaveSql("l_orderkey % 256", "l_partkey % 256", 8)}
         |  AS BIGINT) AS zkey
         |FROM lineitem""".stripMargin,

    // constants mirror the Spark side literal-for-literal (see bm25Search)
    "bm25_search" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS dl,
        |    string_split_regex(trim(lower(text)), '\s+') AS toks
        |  FROM documents),
        |stats AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM d),
        |terms AS (SELECT doc_id, dl, unnest(toks) AS term FROM d),
        |tf AS (
        |  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf,
        |    any_value(dl) AS dl
        |  FROM terms WHERE term IN ('data', 'spark', 'query')
        |  GROUP BY 1, 2),
        |docfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1)
        |SELECT doc_id,
        |  round(sum(ln((n - df + 0.5) / (df + 0.5) + 1.0) * (tf * 2.2)
        |    / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 6) AS score
        |FROM tf JOIN docfreq USING (term) CROSS JOIN stats
        |GROUP BY doc_id
        |ORDER BY score DESC, doc_id
        |LIMIT 10""".stripMargin,

    "tfidf_topk" ->
      """WITH terms AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms
        |       WHERE term <> '' GROUP BY 1, 2),
        |docfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM terms
        |            WHERE term <> '' GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
        |scored AS (
        |  SELECT doc_id, term, round(tf * ln(n.n / df), 6) AS score
        |  FROM tf JOIN docfreq USING (term) CROSS JOIN n),
        |ranked AS (SELECT doc_id, term, score,
        |  row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rank
        |  FROM scored)
        |SELECT doc_id, CAST(rank AS INTEGER) AS rank, term, score
        |FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    // 64-token chunks, 16-token overlap, stride 48; chunk count uses the
    // same integer arithmetic as Chunking.chunkTokens ((x + 47) // 48),
    // and DuckDB's 1-based inclusive list slice mirrors Spark's
    // slice(toks, start, len) clamping
    "chunk_docs" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |  FROM documents WHERE len(trim(text)) > 0),
        |chunks AS (
        |  SELECT doc_id, t,
        |    unnest(range((greatest(len(t) - 16, 1) + 47) // 48)) AS cid
        |  FROM toks)
        |SELECT doc_id, CAST(cid AS INTEGER) AS chunk_id,
        |  CAST(len(t[cid*48 + 1 : cid*48 + 64]) AS INTEGER) AS n_tokens,
        |  array_to_string(t[cid*48 + 1 : cid*48 + 64], ' ') AS chunk_text
        |FROM chunks ORDER BY doc_id, chunk_id""".stripMargin,

    // Corpus-trained BPE: the frequency-ranked merge loop unrolled round
    // by round (vocab head, pair counts, argmax, replace rewrite), then
    // the rank-ordered replace chain applied to every word — see BpeSql
    "bpe_vocab" -> BpeSql.bpeVocabSql,
    "bpe_tokenize" -> BpeSql.bpeTokenizeSql,
    "pack_sequences_bpe" -> BpeSql.packSequencesBpeSql,
    "train_shards" -> TrainShardsSql.trainShardsSql,
    "lm_score_5gram" -> LmSql.lmScore5gramSql,
    "chunk_docs_bpe" -> BpeSql.chunkDocsBpeSql,
    "curate_pipeline_spans" -> CurateSql.curatePipelineSpansSql,
    "curate_pipeline_dsir" -> CurateSql.curatePipelineDsirSql,
    "curate_pipeline_decontam" -> CurateSql.curatePipelineDecontamSql,
    "curate_pipeline_qfilter" -> CurateSql.curatePipelineQfilterSql,
    // the full composition: DSIR + decontamination + trained filter +
    // span cut + LSH, one statement
    "curate_pipeline_full" -> CurateSql.curatePipelineFullSql,
    // the gate form must agree with the join form count-for-count — the
    // SAME oracle text checks both
    "decontaminate_gate" -> decontaminateSql,
    "ppl_buckets_5gram" -> LmSql.pplBuckets5gramSql,

    // IVF ANN: the deterministic Lloyd trainer replayed iteration by
    // iteration (assign / collect-in-id-order / fold-update), float-cast
    // centroids, ordered-fold cosines — see IvfSql
    "ann_ivf" -> IvfSql.annIvfSql,
    "ann_pq" -> PqSql.annPqSql,
    "ann_ivfpq" -> IvfPqSql.annIvfPqSql,
    // the persisted-index path must reproduce the one-shot ranking
    "ann_ivfpq_index" -> IvfPqSql.annIvfPqSql,
    // ...and so must the distributed (driver-free) serving path
    "ann_ivfpq_dist" -> IvfPqSql.annIvfPqSql,

    // trained quality filter: 30 GD iterations unrolled (rational
    // hard-sigmoid link, DECIMAL gradient sums, 9-dp weight updates) —
    // see QfilterSql
    "qfilter_weights" -> QfilterSql.qfilterWeightsSql,
    "qfilter_score" -> QfilterSql.qfilterScoreSql,

    // MinHash / SimHash LSH dedup: FNV-based signatures, band folds, and
    // bucket joins unrolled in exact HUGEINT SQL — see LshSql
    "dedup_incremental" -> LshSql.dedupIncrementalSql,
    // the composed curation pipeline replayed in one statement: gopher
    // predicate -> chunk explode + packed uids -> minhash chain over chunk
    // texts -> corpus probe then within-batch dedup -- see CurateSql
    "curate_pipeline" -> CurateSql.curatePipelineSql,
    "dedup_minhash" -> LshSql.dedupMinhashSql,
    "dedup_simhash" -> LshSql.dedupSimhashSql,

    // SRP-LSH surfaces: deterministic splitmix64 hyperplanes inlined as
    // literals (computed by VectorFunctions.plane itself), index-order
    // cosine folds, multi-probe as bit_count(xor) <= probe — see SrpSql
    "ann_srp" -> SrpSql.annSrpSql,
    "dedup_embedding" -> SrpSql.dedupEmbeddingSql,
    "dedup_embedding_incremental" -> SrpSql.dedupEmbeddingIncrementalSql,

    // Spark xxhash64 (standard XXH64, seed 42) + XxHash64.hashInt unrolled
    // in HUGEINT — see XxHash64Sql for the construction rules and
    // tools/gen_xxh64_oracle.py for the row-for-row validation harness
    "multimodal_decode" -> XxHash64Sql.multimodalDecodeSql,

    // Kafka MurmurHash2 (seed 0x9747b28c = 2538058380, M = 0x5bd1e995 =
    // 1540483477) unrolled in exact unsigned-mod-2^32 BIGINT arithmetic:
    // the chunk fold runs as list_reduce over 4-byte little-endian words,
    // Java's >>> becomes // 2^shift on the unsigned representation, the
    // tail xors are conditional identity (xor 0) to mirror the fall-through
    // switch, and (h & 0x7fffffff) % 8 is % 2^31 % 8. Max intermediate is
    // (2^32-1)*M < 2^63, so plain BIGINT never overflows. Verified against
    // the Murmur2Spec golden vectors.
    "route_murmur2" ->
      """WITH b AS (
        |  SELECT event_id,
        |    list_transform(list_filter(string_split(CAST(user_id AS VARCHAR), ''),
        |        c -> c <> ''), c -> ord(c)::BIGINT) AS bs
        |  FROM events),
        |r AS (SELECT event_id, bs, len(bs) AS n,
        |  list_reduce(
        |    list_concat([xor(2538058380::BIGINT, len(bs)::BIGINT)],
        |                range(len(bs) // 4)),
        |    (h, i) -> xor((h * 1540483477) % 4294967296,
        |      (xor((bs[4*i+1] + bs[4*i+2]*256 + bs[4*i+3]*65536
        |              + bs[4*i+4]*16777216) * 1540483477 % 4294967296,
        |           ((bs[4*i+1] + bs[4*i+2]*256 + bs[4*i+3]*65536
        |              + bs[4*i+4]*16777216) * 1540483477 % 4294967296)
        |             // 16777216)
        |       * 1540483477) % 4294967296)) AS h0
        |  FROM b),
        |t AS (SELECT event_id, n,
        |  xor(xor(xor(h0,
        |    CASE WHEN n % 4 = 3  THEN bs[n - n % 4 + 3] * 65536 ELSE 0 END),
        |    CASE WHEN n % 4 >= 2 THEN bs[n - n % 4 + 2] * 256   ELSE 0 END),
        |    CASE WHEN n % 4 >= 1 THEN bs[n - n % 4 + 1]         ELSE 0 END)
        |    AS ht
        |  FROM r),
        |m AS (SELECT event_id,
        |  CASE WHEN n % 4 >= 1 THEN (ht * 1540483477) % 4294967296 ELSE ht END
        |    AS h2 FROM t),
        |f AS (SELECT event_id,
        |  (xor(h2, h2 // 8192) * 1540483477) % 4294967296 AS f2 FROM m)
        |SELECT event_id,
        |  CAST(xor(f2, f2 // 32768) % 2147483648 % 8 AS INTEGER) AS partition
        |FROM f""".stripMargin,

    // FNV-1a 64 unrolled in exact HUGEINT arithmetic: xor of the low byte
    // (the only byte the xor can touch — inputs are ASCII, so code point =
    // UTF-8 byte) then multiply mod 2^64, folded over the characters from
    // the offset basis; the final CASE re-signs the unsigned result into
    // the Spark long. Verified char-for-char against fnv1a64 golden values.
    "fingerprints" ->
      """SELECT doc_id, CAST(
        |  CASE WHEN fp >= 9223372036854775808::HUGEINT
        |       THEN fp - 18446744073709551616::HUGEINT ELSE fp END
        |  AS BIGINT) AS fp
        |FROM (
        |  SELECT doc_id, list_reduce(
        |    list_concat([14695981039346656037::HUGEINT],
        |      list_transform(list_filter(string_split(text, ''), c -> c <> ''),
        |                     c -> ord(c)::HUGEINT)),
        |    (h, b) -> ((h - h % 256 + xor((h % 256)::BIGINT, b::BIGINT)::HUGEINT)
        |               * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT
        |  ) AS fp
        |  FROM documents)""".stripMargin,

    // identical RE2 pattern on both engines: every maximal alnum run or
    // single non-alnum char is one subword piece
    "subword_count" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9]'))
        |    AS INTEGER) AS subwords
        |FROM documents""".stripMargin,

    // thresholds compare the 6-dp ROUNDED ratios, exactly as the Spark
    // side does, so boundary decisions are made on identical doubles;
    // the empty-text guard mirrors Spark's tokens('') = [] (DuckDB's
    // string_split_regex('', '\s+') would return [''] — 1 token), with
    // NULL ratios and coalesced-false passes for zero-token docs
    "gopher_filters" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN len(trim(text)) = 0 THEN []
        |         ELSE string_split_regex(trim(text), '\s+') END AS t
        |  FROM documents),
        |sig AS (
        |  SELECT doc_id,
        |    CAST(len(t) AS INTEGER) AS n_tokens,
        |    CASE WHEN len(t) = 0 THEN NULL ELSE
        |      round(CAST(list_aggregate(list_transform(t, x -> len(x)), 'sum')
        |        AS DOUBLE) / CAST(len(t) AS DOUBLE), 6) END AS mean_word_len,
        |    CASE WHEN len(t) = 0 THEN NULL ELSE
        |      round(CAST(len(list_filter(t, x -> regexp_matches(x, '[a-z]')))
        |        AS DOUBLE) / CAST(len(t) AS DOUBLE), 6) END AS alpha_frac,
        |    CAST(len(list_intersect(list_distinct(t),
        |      ['the', 'a', 'of', 'and', 'in', 'to', 'is'])) AS INTEGER)
        |      AS n_stopwords
        |  FROM d)
        |SELECT doc_id, n_tokens, mean_word_len, alpha_frac, n_stopwords,
        |  coalesce(n_tokens BETWEEN 30 AND 90
        |    AND mean_word_len BETWEEN 3.0 AND 10.0
        |    AND alpha_frac >= 0.8
        |    AND n_stopwords >= 2, false) AS passes
        |FROM sig ORDER BY doc_id""".stripMargin)
}
