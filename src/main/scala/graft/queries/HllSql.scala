package graft.queries

/** DuckDB replays of the deterministic HLL sketch queries
  * ([[graft.functions.Hll]]): register = max rho per (group, top-p-bits
  * bucket) over FNV-1a 64 hashes, estimate = the identical IEEE fold
  * (ascending-bucket `list_sum` of exact 1/2^r terms, then
  * alpha·m²/S with the linear-counting branch).
  *
  * The oracle hashes DISTINCT keys only — registers are max-folds, so
  * hashing each key once yields the same sketch as Spark's single pass
  * over every row.
  */
object HllSql {

  /** rho = (64-p)+1 - bitlength(rem), as an exact integer CASE chain
    * (no float log2). `rem` = the low 64-p hash bits as HUGEINT. */
  private def rhoCase(p: Int): String = {
    val width = 64 - p
    val cases = (width - 1 to 1 by -1)
      .map(b => s"WHEN rem >= ${BigInt(1) << b}::HUGEINT THEN ${width - b}")
      .mkString(" ")
    s"CASE WHEN rem = 0 THEN ${width + 1} $cases ELSE $width END"
  }

  /** 64-bit xor of two HUGEINT values in [0, 2^64): hi/lo 32-bit split
    * (each half fits BIGINT for DuckDB's integer xor()). */
  private def xor64(a: String, b: String): String =
    s"(xor((($a) // 4294967296::HUGEINT)::BIGINT, (($b) // 4294967296::HUGEINT)::BIGINT)::HUGEINT" +
      s" * 4294967296::HUGEINT" +
      s" + xor((($a) % 4294967296::HUGEINT)::BIGINT, (($b) % 4294967296::HUGEINT)::BIGINT)::HUGEINT)"

  private val Mod64 = "18446744073709551616::HUGEINT"
  private val Prime = "1099511628211::HUGEINT"

  /** CTE chain applying [[graft.functions.Hll.mix]] to column `h` of CTE
    * `src`, carrying `carry` columns through, ending in CTE `mixed`.
    * Each xor stage references its input 4×, so every stage is
    * MATERIALIZED — inlining would expand the chain exponentially. */
  private[queries] def mixStages(src: String, carry: Seq[String],
      prefix: String = "x", out: String = "mixed"): String = {
    val cs = carry.map(_ + ", ").mkString
    s"""${prefix}1 AS MATERIALIZED (SELECT $cs${xor64("h", s"h // ${BigInt(1) << 33}::HUGEINT")} AS h FROM $src),
       |${prefix}2 AS MATERIALIZED (SELECT $cs(h * $Prime) % $Mod64 AS h FROM ${prefix}1),
       |${prefix}3 AS MATERIALIZED (SELECT $cs${xor64("h", s"h // ${BigInt(1) << 29}::HUGEINT")} AS h FROM ${prefix}2),
       |${prefix}4 AS MATERIALIZED (SELECT $cs(h * $Prime) % $Mod64 AS h FROM ${prefix}3),
       |$out AS MATERIALIZED (SELECT $cs${xor64("h", s"h // ${BigInt(1) << 32}::HUGEINT")} AS h FROM ${prefix}4)""".stripMargin
  }

  /** Shared CTE prefix: distinct (flag, orderkey-string) keys → fnv hash →
    * [[graft.functions.Hll.mix]] finalizer (staged MATERIALIZED CTEs — each
    * xor references its input 4×, inlining would blow up exponentially) →
    * (bucket, rho) → per-flag max registers. */
  private def regsCtes(p: Int): String = {
    val divisor = s"${BigInt(1) << (64 - p)}::HUGEINT"
    s"""keys AS (
       |  SELECT DISTINCT l_returnflag AS g, CAST(l_orderkey AS VARCHAR) AS k
       |  FROM lineitem),
       |h0 AS MATERIALIZED (SELECT g, ${LshSql.fnv("k")} AS h FROM keys),
       |${mixStages("h0", Seq("g"))},
       |br AS (SELECT g, CAST(h // $divisor AS INTEGER) AS idx,
       |              h % $divisor AS rem FROM mixed),
       |rr AS (SELECT g, idx, (${rhoCase(p)}) AS rho FROM br),
       |regs AS (SELECT g, idx, max(rho) AS rho FROM rr GROUP BY g, idx)""".stripMargin
  }

  /** The bias-correction constant as a SQL literal, mirroring
    * [[graft.functions.Hll.estimate]]'s small-m cases exactly (p=4/5/6
    * use the empirical constants; larger m the closed form). Computed in
    * the JVM and inlined — Double.toString round-trips, and DuckDB's
    * decimal→double parse is correctly rounded, so the oracle sees the
    * bit-identical alpha for EVERY p, not just p≥7. */
  private def alphaLit(p: Int): String = {
    val m = 1 << p
    val a =
      if (p == 4) 0.673
      else if (p == 5) 0.697
      else if (p == 6) 0.709
      else 0.7213 / (1.0 + 1.079 / m)
    a.toString
  }

  /** Unrounded estimate SELECT over a (g, regs LIST) relation named `lists`:
    * emits (g, est). Fold order and every IEEE op mirror
    * [[graft.functions.Hll.estimate]]. */
  private def estSelect(p: Int): String = {
    val m = 1 << p
    s"""est AS (
       |  SELECT g,
       |    list_sum(list_transform(regs, r -> 1.0 / CAST(1::BIGINT << r AS DOUBLE))) AS s,
       |    len(list_filter(regs, r -> r = 0)) AS zeros
       |  FROM lists),
       |unrounded AS (
       |  SELECT g, zeros,
       |    CAST(${alphaLit(p)} AS DOUBLE) * $m * $m / s AS raw
       |  FROM est),
       |final AS (
       |  SELECT g,
       |    CASE WHEN raw <= 2.5 * $m AND zeros > 0
       |         THEN $m * ln($m.0 / zeros) ELSE raw END AS est
       |  FROM unrounded)""".stripMargin
  }

  /** q_distinct_sketch: per-flag distinct-orderkey estimates plus the
    * merged-union '*ALL*' row. */
  def distinctSketchSql(p: Int): String = {
    val m = 1 << p
    s"""WITH ${regsCtes(p)},
       |allregs AS (
       |  SELECT g, idx, rho FROM regs
       |  UNION ALL
       |  SELECT '*ALL*' AS g, idx, max(rho) AS rho FROM regs GROUP BY idx),
       |groups AS (SELECT DISTINCT g FROM allregs),
       |lists AS (
       |  SELECT gr.g, list(coalesce(a.rho, 0) ORDER BY j.j) AS regs
       |  FROM groups gr
       |  CROSS JOIN (SELECT unnest(generate_series(0, ${m - 1})) AS j) j
       |  LEFT JOIN allregs a ON a.g = gr.g AND a.idx = j.j
       |  GROUP BY gr.g),
       |${estSelect(p)}
       |SELECT g AS l_returnflag, round(est, 6) AS est_distinct FROM final""".stripMargin
  }

  /** q_sketch_intersect: inclusion–exclusion |A∩B| over flag pairs (a<b):
    * est(A) + est(B) − est(A∪B), the union sketch = register-wise max. */
  def sketchIntersectSql(p: Int): String = {
    val m = 1 << p
    s"""WITH ${regsCtes(p)},
       |groups AS (SELECT DISTINCT g FROM regs),
       |buckets AS (SELECT unnest(generate_series(0, ${m - 1})) AS j),
       |lists AS (
       |  SELECT gr.g, list(coalesce(a.rho, 0) ORDER BY j.j) AS regs
       |  FROM groups gr CROSS JOIN buckets j
       |  LEFT JOIN regs a ON a.g = gr.g AND a.idx = j.j
       |  GROUP BY gr.g),
       |${estSelect(p)},
       |pairs AS (
       |  SELECT a.g AS ga, b.g AS gb FROM groups a JOIN groups b ON a.g < b.g),
       |ulists AS (
       |  SELECT p.ga AS g_a, p.gb AS g_b,
       |    list(greatest(coalesce(ra.rho, 0), coalesce(rb.rho, 0)) ORDER BY j.j) AS regs
       |  FROM pairs p CROSS JOIN buckets j
       |  LEFT JOIN regs ra ON ra.g = p.ga AND ra.idx = j.j
       |  LEFT JOIN regs rb ON rb.g = p.gb AND rb.idx = j.j
       |  GROUP BY p.ga, p.gb),
       |uest AS (
       |  SELECT g_a, g_b,
       |    list_sum(list_transform(regs, r -> 1.0 / CAST(1::BIGINT << r AS DOUBLE))) AS s,
       |    len(list_filter(regs, r -> r = 0)) AS zeros
       |  FROM ulists),
       |uunrounded AS (
       |  SELECT g_a, g_b, zeros,
       |    CAST(${alphaLit(p)} AS DOUBLE) * $m * $m / s AS raw
       |  FROM uest),
       |ufinal AS (
       |  SELECT g_a, g_b,
       |    CASE WHEN raw <= 2.5 * $m AND zeros > 0
       |         THEN $m * ln($m.0 / zeros) ELSE raw END AS est
       |  FROM uunrounded)
       |SELECT u.g_a AS flag_a, u.g_b AS flag_b,
       |  round(ea.est + eb.est - u.est, 6) AS est_common
       |FROM ufinal u
       |JOIN final ea ON ea.g = u.g_a
       |JOIN final eb ON eb.g = u.g_b""".stripMargin
  }
}
