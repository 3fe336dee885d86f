package graft.queries

/** DuckDB oracle SQL for the MinHash and SimHash LSH dedup surfaces.
  *
  * Both pipelines bottom out in FNV-1a per-shingle hashes plus fixed
  * mixing constants, i.e. pure mod-2^64 arithmetic — so the ENTIRE
  * candidate generation (signatures, band folding, bucket-size guards,
  * bucket joins) and verification (hamming / exact jaccard) unroll into
  * exact HUGEINT SQL:
  *
  *   - per-shingle work explodes to ROWS (doc x shingle, then x 128 hash
  *     functions for minhash) and mixes through staged CTE columns, so
  *     expressions stay linear and DuckDB executes them vectorized;
  *   - 64-bit xor is two 32-bit BIGINT xors; constant multiplication
  *     splits the constant into 32-bit halves (a 64x64 product overflows
  *     INT128); logical shifts are integer division on the unsigned rep;
  *   - the minhash min is taken over SIGNED values (Java long compare),
  *     so mixed hashes re-sign before MIN and re-unsign for the band fold;
  *   - iterative folds of data-dependent length (FNV over a shingle's
  *     chars, the 8-row band fold) use list_reduce, where the lambda body
  *     is written once and cannot blow up.
  *
  * Validated row-for-row against Spark verify dumps before wiring.
  */
object LshSql {

  private def mod(x: String): String =
    s"(($x) % 18446744073709551616::HUGEINT)"

  private def mulc(a: String, c: BigInt): String = {
    val hi = c >> 32
    val lo = c & BigInt("FFFFFFFF", 16)
    mod(s"($a) * $lo::HUGEINT + ((($a) * $hi::HUGEINT) % 4294967296) * 4294967296")
  }

  private def xor64(a: String, b: String): String =
    s"(xor(CAST(($a) // 4294967296 AS BIGINT), " +
      s"CAST(($b) // 4294967296 AS BIGINT))::HUGEINT * 4294967296 + " +
      s"xor(CAST(($a) % 4294967296 AS BIGINT), " +
      s"CAST(($b) % 4294967296 AS BIGINT))::HUGEINT)"

  /** FNV-1a 64 over the (ASCII) characters of string expression `s`. */
  private[queries] def fnv(s: String): String =
    s"list_reduce(list_concat([14695981039346656037::HUGEINT], " +
      s"list_transform(list_filter(string_split($s, ''), c -> c <> ''), " +
      s"c -> ord(c)::HUGEINT)), " +
      s"(h, b) -> ((h - h % 256 + xor((h % 256)::BIGINT, b::BIGINT)::HUGEINT) " +
      s"* 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT)"

  /** simhashPairs(word 2-shingles of lower(text), maxHamming = 3,
    * maxBucketSize = 2000) — output (id_a, id_b, hamming). */
  lazy val dedupSimhashSql: String = {
    val votes = (0 until 64).map(b =>
      s"sum(CASE WHEN (u // ${BigInt(1) << b}::HUGEINT) % 2 = 1 THEN 1 ELSE -1 END) AS v$b")
      .mkString(",\n  ")
    val simbits = (0 until 64).map(b =>
      s"CASE WHEN v$b > 0 THEN ${BigInt(1) << b}::HUGEINT ELSE 0::HUGEINT END")
      .mkString(" + ")
    s"""WITH sh AS (
       |  SELECT doc_id,
       |    CASE WHEN len(t) < 2 THEN [array_to_string(t, ' ')]
       |         ELSE list_distinct(list_transform(range(len(t) - 1),
       |                i -> t[CAST(i+1 AS BIGINT)] || ' ' || t[CAST(i+2 AS BIGINT)])) END AS shingles
       |  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t FROM documents)),
       |rows_ AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
       |hashed AS (SELECT doc_id, ${fnv("s")} AS u FROM rows_),
       |vts AS (SELECT doc_id,
       |  $votes
       |  FROM hashed GROUP BY doc_id),
       |sims AS (SELECT doc_id, ($simbits) AS sim FROM vts),
       |banded AS (SELECT doc_id, sim, unnest(range(4)) AS band FROM sims),
       |chunked AS (SELECT doc_id, sim, band,
       |  (sim // power(2, band*16)::HUGEINT) % 65536 AS chunk FROM banded),
       |ok AS (SELECT band, chunk FROM chunked GROUP BY band, chunk
       |       HAVING count(*) > 1 AND count(*) <= 2000),
       |kept AS (SELECT c.* FROM chunked c JOIN ok USING (band, chunk)),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |    CAST(bit_count(xor(CAST(a.sim // 4294967296 AS BIGINT),
       |                       CAST(b.sim // 4294967296 AS BIGINT))) +
       |         bit_count(xor(CAST(a.sim % 4294967296 AS BIGINT),
       |                       CAST(b.sim % 4294967296 AS BIGINT))) AS INTEGER) AS hamming
       |  FROM kept a JOIN kept b
       |    ON a.band = b.band AND a.chunk = b.chunk AND a.doc_id < b.doc_id)
       |SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3""".stripMargin
  }

  /** The shared MinHash signature chain (char 5-shingles, k = 128,
    * bands = 16) over source relation `src` (columns doc_id, text): every
    * doc's per-band bucket keys in `keys`, shingle sets + sizes in `szs`.
    * Emitted WITHOUT the leading `WITH` so callers can prepend their own
    * CTEs ([[CurateSql]] chains it after a gopher+chunk prefix). Tail
    * CTEs pick the join topology (self-join for [[dedupMinhashSql]],
    * corpus-vs-batch for [[dedupIncrementalSql]]).
    *
    * The 128-way mix runs over the DISTINCT shingle hashes only (`dbase`),
    * then hash-joins back onto the (doc, shingle) occurrences for the
    * per-(doc, j) signed min — the mix is a pure function of (base, j),
    * and HUGEINT multiplication is the dominant oracle cost, so mixing
    * every occurrence (docs × shingles × 128 rows) did ~50× redundant
    * work on a shared-vocabulary corpus (round 10's ~200 s oracles; ~6 s
    * after).  The per-j additive constant `(j+1)·mixC mod 2^64` is a
    * 128-row VALUES literal computed here in exact BigInt arithmetic
    * rather than re-derived per row in SQL. */
  private[queries] def minhashKeysBody(src: String): String = {
    val mixC = BigInt("9e3779b97f4a7c15", 16)
    val mixK = BigInt("ff51afd7ed558ccd", 16)
    val fnvP = BigInt("100000001b3", 16)
    val fnvBasis = BigInt("cbf29ce484222325", 16)
    val m = (BigInt(1) << 64)
    val jcVals = (0 until 128)
      .map(j => s"($j, ${(BigInt(j + 1) * mixC) % m}::HUGEINT)")
      .mkString(", ")
    s"""sh AS (
       |  SELECT doc_id,
       |    CASE WHEN len(text) >= 5 THEN list_distinct(list_transform(range(len(text) - 4),
       |           i -> text[CAST(i+1 AS BIGINT):CAST(i+5 AS BIGINT)])) ELSE [] END AS shingles
       |  FROM $src),
       |szs AS (SELECT doc_id, shingles, len(shingles) AS n FROM sh),
       |rows_ AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
       |based AS (SELECT doc_id, ${fnv("s")} AS base FROM rows_),
       |dbase AS (SELECT DISTINCT base FROM based),
       |jc(j, mc) AS (VALUES $jcVals),
       |m0 AS (SELECT base, j, ${xor64("base", "mc")} AS x0 FROM dbase CROSS JOIN jc),
       |m1 AS (SELECT base, j, ${xor64("x0", "x0 // 8589934592")} AS x1 FROM m0),
       |m2 AS (SELECT base, j, ${mulc("x1", mixK)} AS x2 FROM m1),
       |m3 AS (SELECT base, j, ${xor64("x2", "x2 // 8589934592")} AS x3 FROM m2),
       |mixd AS (SELECT base, j,
       |  CASE WHEN x3 >= 9223372036854775808::HUGEINT
       |       THEN x3 - 18446744073709551616::HUGEINT ELSE x3 END AS sx
       |  FROM m3),
       |mins AS (SELECT doc_id, j, min(sx) AS sj
       |  FROM based JOIN mixd USING (base) GROUP BY doc_id, j),
       |sigs AS (SELECT doc_id,
       |  list(CASE WHEN sj < 0 THEN sj + 18446744073709551616::HUGEINT ELSE sj END
       |       ORDER BY j) AS sigu
       |  FROM mins GROUP BY doc_id),
       |bnd AS (SELECT doc_id, unnest(range(16)) AS band, sigu FROM sigs),
       |keys0 AS (SELECT doc_id, band,
       |  list_reduce(
       |    list_concat([${xor64(s"$fnvBasis::HUGEINT", "band::HUGEINT")}],
       |                sigu[CAST(band*8+1 AS BIGINT):CAST(band*8+8 AS BIGINT)]),
       |    (h, s) -> ${mulc(xor64("h", "s"), fnvP)}) AS key
       |  FROM bnd),
       |-- docs with EMPTY shingle sets (< 5 chars after normalization)
       |-- never reach rows_/sigs, but Spark's minhash folds an all-
       |-- Long.MaxValue signature into CONSTANT per-band keys for them —
       |-- so all such docs collide in every band (and verify at jaccard 1
       |-- via the both-empty convention). The constants are replayed here
       |-- from the identical arithmetic.
       |keys AS (
       |  SELECT * FROM keys0
       |  UNION ALL
       |  SELECT s.doc_id, e.band, e.key
       |  FROM szs s CROSS JOIN (VALUES $emptyBandKeyValues) AS e(band, key)
       |  WHERE s.n = 0)""".stripMargin
  }

  /** Per-band keys of the EMPTY MinHash signature (all Long.MaxValue) —
    * the same fold as `TextFunctions.minhashBandKeys` over k=128/16 bands,
    * as unsigned HUGEINT literals. */
  private lazy val emptyBandKeyValues: String =
    (0 until 16).map { b =>
      var h = 0xcbf29ce484222325L ^ b.toLong
      var j = 0
      while (j < 8) { h = (h ^ Long.MaxValue) * 0x100000001b3L; j += 1 }
      val u = BigInt(h) & ((BigInt(1) << 64) - 1)
      s"($b, $u::HUGEINT)"
    }.mkString(", ")

  /** minhashPairs(char 5-shingles, k = 128, bands = 16, threshold = 0.6,
    * maxBucketSize = 2000) — output (id_a, id_b, jaccard). */
  lazy val dedupMinhashSql: String =
    s"""WITH ${minhashKeysBody("documents")},
       |ok AS (SELECT band, key FROM keys GROUP BY band, key
       |       HAVING count(*) > 1 AND count(*) <= 2000),
       |kept AS (SELECT k.* FROM keys k JOIN ok USING (band, key)),
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM kept a JOIN kept b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
       |verify AS (SELECT id_a, id_b,
       |    CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) /
       |    CAST(sa.n + sb.n - len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) AS jac
       |  FROM cand JOIN szs sa ON sa.doc_id = id_a JOIN szs sb ON sb.doc_id = id_b)
       |SELECT id_a, id_b, round(jac, 6) AS jaccard FROM verify WHERE jac >= 0.6""".stripMargin

  /** LshIndex.probe over a corpus/batch split of `documents`
    * (doc_id % 4 != 0 indexed, % 4 = 0 probed; same LSH parameters as
    * [[dedupMinhashSql]]). The bucket guard counts CORPUS entries only
    * and has no lower bound — a singleton corpus bucket is a valid probe
    * target — and pairs cross the split instead of self-joining.
    * Output (batch_id, corpus_id, jaccard). */
  lazy val dedupIncrementalSql: String =
    s"""WITH ${minhashKeysBody("documents")},
       |ok AS (SELECT band, key FROM keys WHERE doc_id % 4 <> 0
       |       GROUP BY band, key HAVING count(*) <= 2000),
       |ckept AS (SELECT k.* FROM keys k JOIN ok USING (band, key)
       |          WHERE k.doc_id % 4 <> 0),
       |cand AS (SELECT DISTINCT b.doc_id AS batch_id, c.doc_id AS corpus_id
       |  FROM ckept c JOIN keys b
       |    ON c.band = b.band AND c.key = b.key AND b.doc_id % 4 = 0),
       |verify AS (SELECT batch_id, corpus_id,
       |    CAST(len(list_intersect(sb.shingles, sc.shingles)) AS DOUBLE) /
       |    CAST(sb.n + sc.n - len(list_intersect(sb.shingles, sc.shingles)) AS DOUBLE) AS jac
       |  FROM cand JOIN szs sb ON sb.doc_id = batch_id
       |            JOIN szs sc ON sc.doc_id = corpus_id)
       |SELECT batch_id, corpus_id, round(jac, 6) AS jaccard
       |FROM verify WHERE jac >= 0.6""".stripMargin
}
