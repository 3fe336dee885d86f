package graft.queries

/** DuckDB oracle SQL for the multimodal_decode stub — Spark's `xxhash64`
  * (standard XXH64, seed 42) and `XxHash64.hashInt` unrolled in exact
  * HUGEINT arithmetic, so even the "engine-specific hash" stub is
  * oracle-checkable.
  *
  * Construction rules (mirrored by `tools/gen_xxh64_oracle.py`, which
  * validates the identical SQL row-for-row against a Spark verify dump):
  *
  *   - the 4-lane stripe state rides as a LIST(HUGEINT) through
  *     list_reduce over 32-byte stripes (the only data-dependent loop);
  *   - 64-bit xor is synthesized from two 32-bit BIGINT xors (DuckDB's
  *     xor() is BIGINT-only); rotation is
  *     (x % 2^(64-r)) * 2^r + x // 2^(64-r);
  *   - multiplication is always by a constant prime, split into 32-bit
  *     halves — a*c = a*lo + ((a*hi) mod 2^32)*2^32 (mod 2^64) — because a
  *     full 64x64 product overflows signed INT128;
  *   - merge, tails (0-3 eight-byte words, optional 4-byte word, 0-3
  *     bytes), and both avalanches expand to CASE-guarded CTE STAGES, and
  *     the 8 hashInt feature re-seeds unnest to rows, so no expression is
  *     ever substituted into itself (inline nesting grows exponentially
  *     through the avalanche).
  */
object XxHash64Sql {

  private val M64 = BigInt(1) << 64
  private val P1 = BigInt("9E3779B185EBCA87", 16)
  private val P2 = BigInt("C2B2AE3D27D4EB4F", 16)
  private val P3 = BigInt("165667B19E3779F9", 16)
  private val P4 = BigInt("85EBCA77C2B2AE63", 16)
  private val P5 = BigInt("27D4EB2F165667C5", 16)

  private def mod(x: String): String =
    s"(($x) % 18446744073709551616::HUGEINT)"

  private def mul(a: String, c: BigInt): String = {
    val hi = c >> 32
    val lo = c & BigInt("FFFFFFFF", 16)
    mod(s"($a) * $lo::HUGEINT + " +
      s"((($a) * $hi::HUGEINT) % 4294967296) * 4294967296")
  }

  private def add(a: String, b: String): String = mod(s"($a) + ($b)")

  private def rotl(x: String, r: Int): String = {
    val lo = BigInt(1) << (64 - r)
    s"((($x) % $lo::HUGEINT) * ${BigInt(1) << r}::HUGEINT + ($x) // $lo::HUGEINT)"
  }

  private def xor64(a: String, b: String): String =
    s"(xor(CAST(($a) // 4294967296 AS BIGINT), " +
      s"CAST(($b) // 4294967296 AS BIGINT))::HUGEINT * 4294967296 + " +
      s"xor(CAST(($a) % 4294967296 AS BIGINT), " +
      s"CAST(($b) % 4294967296 AS BIGINT))::HUGEINT)"

  private def word8(base: String): String =
    (0 until 8).map(t =>
      s"bs[CAST(($base) + $t AS BIGINT)] * ${BigInt(1) << (8 * t)}::HUGEINT")
      .mkString("(", " + ", ")")

  private def word4(base: String): String =
    (0 until 4).map(t =>
      s"bs[CAST(($base) + $t AS BIGINT)] * ${BigInt(1) << (8 * t)}::HUGEINT")
      .mkString("(", " + ", ")")

  private def lane(v: String, j: Int): String = {
    val w = word8(s"el[1]*32 + ${8 * j} + 1")
    mul(rotl(add(v, mul(w, P2)), 31), P1)
  }

  private def step8(idx: Int, hIn: String, hOut: String, base: String,
      guard: String): String = {
    val k = s"k8$idx"
    s"""w8$idx AS (SELECT *,
       |  ${mul(rotl(mul(word8(base), P2), 31), P1)} AS $k
       |  FROM pre8$idx),
       |s8$idx AS (SELECT *,
       |  CASE WHEN $guard THEN
       |    ${add(mul(rotl(xor64(hIn, k), 27), P1), s"$P4::HUGEINT")}
       |  ELSE $hIn END AS $hOut
       |  FROM w8$idx)""".stripMargin
  }

  private def step1(idx: Int, hIn: String, hOut: String, base: String,
      guard: String): String = {
    val inner = mul(s"bs[CAST($base AS BIGINT)]", P5)
    s"""s1$idx AS (SELECT *,
       |  CASE WHEN $guard THEN
       |    ${mul(rotl(xor64(hIn, inner), 11), P1)}
       |  ELSE $hIn END AS $hOut
       |  FROM pre1$idx)""".stripMargin
  }

  /** h ^= h>>33; h *= P2; h ^= h>>29; h *= P3; h ^= h>>32 — staged. */
  private def avalanche(tag: String, hIn: String, hOut: String,
      src: String): String = {
    val (a, b2, c, d) = (s"${tag}_a", s"${tag}_b", s"${tag}_c", s"${tag}_d")
    s"""${tag}1 AS (SELECT *, ${xor64(hIn, s"($hIn) // 8589934592")} AS $a FROM $src),
       |${tag}2 AS (SELECT *, ${mul(a, P2)} AS $b2 FROM ${tag}1),
       |${tag}3 AS (SELECT *, ${xor64(b2, s"$b2 // 536870912")} AS $c FROM ${tag}2),
       |${tag}4 AS (SELECT *, ${mul(c, P3)} AS $d FROM ${tag}3),
       |${tag}5 AS (SELECT *, ${xor64(d, s"$d // 4294967296")} AS $hOut FROM ${tag}4)""".stripMargin
  }

  /** Staged CTEs for Spark's `XXH64.hashLong(input, seed)`:
    * h = seed + P5 + 8; h ^= rotl(input·P2, 31)·P1;
    * h = rotl(h, 27)·P1 + P4; fmix(h) — `uCol`/`seedExpr` are HUGEINT
    * expressions valid in `src`'s scope, result lands in `outCol` of the
    * returned (ctes, lastCteName). */
  private def hashLongStages(tag: String, uCol: String, seedExpr: String,
      outCol: String, src: String): (String, String) = {
    val (a, b, c) = (s"${tag}_a", s"${tag}_b", s"${tag}_c")
    val k = mul(rotl(mul(uCol, P2), 31), P1)
    val head =
      s"""${tag}h1 AS (SELECT *,
         |  ${add(add(seedExpr, s"$P5::HUGEINT"), "8::HUGEINT")} AS $a FROM $src),
         |${tag}h2 AS (SELECT *, ${xor64(a, k)} AS $b FROM ${tag}h1),
         |${tag}h3 AS (SELECT *,
         |  ${add(mul(rotl(b, 27), P1), s"$P4::HUGEINT")} AS $c FROM ${tag}h2),
         |${avalanche(s"${tag}v", c, outCol, s"${tag}h3")}""".stripMargin
    (head, s"${tag}v5")
  }

  /** Parameterized CTE chain replaying `Sampling.shuffleShards(src,
    * doc_id, numShards, seed)`: shard = xxhash64(doc_id) mod numShards,
    * order = xxhash64(doc_id, seed) (seed chaining: hashLong(seed,
    * hashLong(doc_id, 42))), pos = dense rank within shard. All CTE names
    * carry `tag` so the chain composes with other oracle fragments (the
    * BPE chain also owns a `b0`). Returns (ctes — no leading WITH,
    * finalCteName) with the final CTE exposing (doc_id, shard, pos). */
  private[queries] def shuffleShardCtes(
      tag: String, numShards: Int, seed: Long,
      src: String = "documents"): (String, String) = {
    val uid = "((doc_id::HUGEINT % 18446744073709551616::HUGEINT) + " +
      "18446744073709551616::HUGEINT) % 18446744073709551616::HUGEINT"
    val (c1, last1) =
      hashLongStages(s"${tag}x1", "uid", "42::HUGEINT", "hu1", s"${tag}b0")
    val (c2, last2) =
      hashLongStages(s"${tag}x2", "useed", "hu1", "hu2", last1)
    val ctes =
      s"""${tag}b0 AS (
         |  SELECT doc_id, $uid AS uid, $seed::HUGEINT AS useed FROM $src),
         |$c1,
         |$c2,
         |${tag}signedh AS (SELECT doc_id,
         |  CASE WHEN hu1 >= 9223372036854775808::HUGEINT
         |       THEN hu1 - 18446744073709551616::HUGEINT ELSE hu1 END AS h1,
         |  CASE WHEN hu2 >= 9223372036854775808::HUGEINT
         |       THEN hu2 - 18446744073709551616::HUGEINT ELSE hu2 END AS h2
         |  FROM $last2),
         |${tag}sharded AS (SELECT doc_id,
         |  CAST(((h1 % $numShards) + $numShards) % $numShards AS INTEGER)
         |    AS shard, h2 FROM ${tag}signedh),
         |${tag}pos AS (SELECT doc_id, shard,
         |  CAST(row_number() OVER (PARTITION BY shard ORDER BY h2, doc_id) - 1
         |       AS INTEGER) AS pos
         |  FROM ${tag}sharded)""".stripMargin
    (ctes, s"${tag}pos")
  }

  /** shuffle_shards oracle: Sampling.shuffleShards(documents, doc_id,
    * numShards = 64, seed = 7) — output (doc_id, shard, pos). */
  lazy val shuffleShardsSql: String = {
    val (ctes, last) = shuffleShardCtes("ss", 64, 7L)
    s"""WITH $ctes
       |SELECT doc_id, shard, pos
       |FROM $last ORDER BY shard, pos""".stripMargin
  }

  /** The full multimodal_decode oracle query. */
  lazy val multimodalDecodeSql: String = {
    val init = Seq((42 + P1 + P2) % M64, (42 + P2) % M64, BigInt(42),
      ((BigInt(42) - P1) % M64 + M64) % M64)
    val stripeLambda = (0 until 4).map(j => lane(s"st[${j + 1}]", j))
      .mkString(", ")
    val accH0 = add(add(rotl("st[1]", 1), rotl("st[2]", 7)),
      add(rotl("st[3]", 12), rotl("st[4]", 18)))
    val mergeSql = (0 until 4).map { j =>
      val inner = mul(rotl(mul(s"st[${j + 1}]", P2), 31), P1)
      s"""mg${j + 1} AS (SELECT doc_id, bs, n, st,
         |  ${add(mul(xor64(s"m$j", inner), P1), s"$P4::HUGEINT")} AS m${j + 1}
         |  FROM mg$j)""".stripMargin
    }.mkString(",\n")

    s"""WITH b AS (
       |  SELECT doc_id,
       |    list_transform(list_filter(string_split(text, ''), c -> c <> ''),
       |                   c -> ord(c)::HUGEINT) AS bs
       |  FROM documents),
       |s AS (SELECT doc_id, bs, len(bs) AS n FROM b),
       |stripes AS (SELECT doc_id, bs, n,
       |  CASE WHEN n >= 32 THEN
       |    list_reduce(
       |      list_concat(
       |        [[${init(0)}::HUGEINT, ${init(1)}::HUGEINT,
       |          ${init(2)}::HUGEINT, ${init(3)}::HUGEINT]],
       |        list_transform(range(n // 32), i -> [i::HUGEINT])),
       |      (st, el) -> [$stripeLambda])
       |  ELSE NULL END AS st
       |  FROM s),
       |mg0 AS (SELECT doc_id, bs, n, st, $accH0 AS m0 FROM stripes),
       |$mergeSql,
       |lened AS (SELECT doc_id, bs, n, n - n % 32 AS off,
       |  ${add(s"CASE WHEN n >= 32 THEN m4 ELSE ${(42 + P5) % M64}::HUGEINT END", "n::HUGEINT")} AS h1
       |  FROM mg4),
       |pre81 AS (SELECT * FROM lened),
       |${step8(1, "h1", "h2", "off + 1", "n % 32 >= 8")},
       |pre82 AS (SELECT * FROM s81),
       |${step8(2, "h2", "h3", "off + 9", "n % 32 >= 16")},
       |pre83 AS (SELECT * FROM s82),
       |${step8(3, "h3", "h4", "off + 17", "n % 32 >= 24")},
       |w4x AS (SELECT *, n - n % 8 AS off4,
       |  ${mul(word4("n - n % 8 + 1"), P1)} AS k4 FROM s83),
       |s4x AS (SELECT *, n - n % 4 AS off1,
       |  CASE WHEN n % 8 >= 4 THEN
       |    ${add(mul(rotl(xor64("h4", "k4"), 23), P2), s"$P3::HUGEINT")}
       |  ELSE h4 END AS h5
       |  FROM w4x),
       |pre11 AS (SELECT * FROM s4x),
       |${step1(1, "h5", "h6", "off1 + 1", "n % 4 >= 1")},
       |pre12 AS (SELECT * FROM s11),
       |${step1(2, "h6", "h7", "off1 + 2", "n % 4 >= 2")},
       |pre13 AS (SELECT * FROM s12),
       |${step1(3, "h7", "h8", "off1 + 3", "n % 4 >= 3")},
       |${avalanche("av", "h8", "u", "s13")},
       |signedh AS (SELECT doc_id, u,
       |  CASE WHEN u >= 9223372036854775808::HUGEINT
       |       THEN u - 18446744073709551616::HUGEINT ELSE u END AS sh
       |  FROM av5),
       |dims AS (SELECT doc_id, u,
       |  CAST(((sh % 1920) + 1920) % 1920 + 1 AS INTEGER) AS width,
       |  CAST((((((sh - (((sh % 65536) + 65536) % 65536)) // 65536) % 1080) + 1080)
       |        % 1080) + 1 AS INTEGER) AS height
       |  FROM signedh),
       |fi0 AS (SELECT doc_id, u, unnest(range(8)) AS i FROM dims),
       |fi1 AS (SELECT *, ${add("u", s"${(P5 + 4) % M64}::HUGEINT")} AS fa FROM fi0),
       |fi2 AS (SELECT *, ${xor64("fa", mul("i::HUGEINT", P1))} AS fb FROM fi1),
       |fi3 AS (SELECT *,
       |  ${add(mul(rotl("fb", 23), P2), s"$P3::HUGEINT")} AS fc FROM fi2),
       |${avalanche("fv", "fc", "fu", "fi3")},
       |fsigned AS (SELECT doc_id, i, fu,
       |  CASE WHEN fu >= 9223372036854775808::HUGEINT
       |       THEN fu - 18446744073709551616::HUGEINT ELSE fu END AS fs
       |  FROM fv5),
       |fvals AS (SELECT doc_id, i,
       |  CAST(CAST(((fs % 1000) + 1000) % 1000 AS REAL) / CAST(1000.0 AS REAL)
       |       AS DOUBLE) AS fx
       |  FROM fsigned),
       |fsum AS (SELECT doc_id,
       |  round(list_reduce(list_concat([CAST(0.0 AS DOUBLE)],
       |          list(fx ORDER BY i)), (a, x) -> a + x), 6) AS feat_sum
       |  FROM fvals GROUP BY doc_id)
       |SELECT d.doc_id, d.width, d.height,
       |  CAST(least(d.width,
       |    CAST(ceil(CAST(d.width AS DOUBLE) *
       |      (256.0 / CAST(greatest(d.width, d.height) AS DOUBLE))) AS INTEGER))
       |    AS INTEGER) AS resized_w,
       |  CAST(least(d.height,
       |    CAST(ceil(CAST(d.height AS DOUBLE) *
       |      (256.0 / CAST(greatest(d.width, d.height) AS DOUBLE))) AS INTEGER))
       |    AS INTEGER) AS resized_h,
       |  f.feat_sum,
       |  4 AS n_slices
       |FROM dims d JOIN fsum f USING (doc_id)""".stripMargin
  }
}
