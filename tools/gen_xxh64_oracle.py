#!/usr/bin/env python3
"""Generate (and self-validate) the DuckDB oracle SQL for multimodal_decode.

The query's stub decode derives every output from Spark's xxhash64 of the
document bytes (standard XXH64, seed 42) and from Spark's XxHash64.hashInt
(the per-feature re-seed).  Both are pure mod-2^64 integer arithmetic, so
the oracle unrolls them in HUGEINT:

  - the 4-lane stripe state rides as a LIST(HUGEINT) through list_reduce
    over 32-byte stripes (the only data-dependent-length loop);
  - xor is synthesized from two 32-bit BIGINT xors (DuckDB xor() is
    BIGINT-only) and rotation is (x % 2^(64-r)) * 2^r + x // 2^(64-r);
  - everything else — merge, length add, the 0-3 tail 8-byte words, the
    optional 4-byte word, the 0-3 tail bytes, both avalanches, and the 8
    hashInt feature re-seeds (unnested to rows) — expands to CASE-guarded
    CTE STAGES so no expression is ever substituted into itself
    (inline nesting would grow exponentially through the avalanche).

Usage:
  python3 tools/gen_xxh64_oracle.py                 # print SQL
  python3 tools/gen_xxh64_oracle.py SF_DIR OUT_DIR  # validate vs Spark dump
"""
import sys

M64 = 1 << 64
P1, P2, P3, P4, P5 = (0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F,
                      0x165667B19E3779F9, 0x85EBCA77C2B2AE63,
                      0x27D4EB2F165667C5)


def mod(x):
    return f"(({x}) % 18446744073709551616::HUGEINT)"


def mul(a, c):
    """(a * c) mod 2^64 for a CONSTANT c, with c split into 32-bit halves:
    a*c = a*lo + ((a*hi) mod 2^32)*2^32 (mod 2^64). Both terms stay under
    2^96, inside signed INT128 — a naive full product of two 64-bit values
    overflows HUGEINT."""
    c = int(c)
    hi, lo = c >> 32, c & 0xFFFFFFFF
    return mod(f"({a}) * {lo}::HUGEINT + "
               f"((({a}) * {hi}::HUGEINT) % 4294967296) * 4294967296")


def add(a, b):
    return mod(f"({a}) + ({b})")


def rotl(x, r):
    lo = 1 << (64 - r)
    return f"((({x}) % {lo}::HUGEINT) * {1 << r}::HUGEINT + ({x}) // {lo}::HUGEINT)"


def xor64(a, b):
    return (f"(xor(CAST(({a}) // 4294967296 AS BIGINT), "
            f"CAST(({b}) // 4294967296 AS BIGINT))::HUGEINT * 4294967296 + "
            f"xor(CAST(({a}) % 4294967296 AS BIGINT), "
            f"CAST(({b}) % 4294967296 AS BIGINT))::HUGEINT)")


def word8(base):
    terms = " + ".join(f"bs[CAST(({base}) + {t} AS BIGINT)] * {1 << (8 * t)}::HUGEINT"
                       for t in range(8))
    return f"({terms})"


def word4(base):
    terms = " + ".join(f"bs[CAST(({base}) + {t} AS BIGINT)] * {1 << (8 * t)}::HUGEINT"
                       for t in range(4))
    return f"({terms})"


def lane(v, j):
    w = word8(f"el[1]*32 + {8 * j} + 1")
    y = add(v, mul(w, P2))
    return mul(rotl(y, 31), P1)


def build_sql():
    init = [(42 + P1 + P2) % M64, (42 + P2) % M64, 42, (42 - P1) % M64]
    stripe_lambda = ", ".join(lane(f"st[{j + 1}]", j) for j in range(4))
    acc_h0 = add(add(rotl("st[1]", 1), rotl("st[2]", 7)),
                 add(rotl("st[3]", 12), rotl("st[4]", 18)))

    # one merge round per lane, each as its own CTE stage (mK column refs
    # keep every expression linear in size)
    merge_stages = []
    prev = "m0"
    for j in range(4):
        inner = mul(rotl(mul(f"st[{j + 1}]", P2), 31), P1)
        nxt = f"m{j + 1}"
        merge_stages.append(
            f"mg{j + 1} AS (SELECT doc_id, bs, n, st,\n"
            f"  {add(mul(xor64(prev, inner), P1), f'{P4}::HUGEINT')} AS {nxt}\n"
            f"  FROM mg{j})")
        prev = nxt

    def step8_stages(idx, h_in, h_out, base, guard):
        k = f"k8{idx}"
        return (
            f"w8{idx} AS (SELECT *,\n"
            f"  {mul(rotl(mul(word8(base), P2), 31), P1)} AS {k}\n"
            f"  FROM pre8{idx}),\n"
            f"s8{idx} AS (SELECT *,\n"
            f"  CASE WHEN {guard} THEN\n"
            f"    {add(mul(rotl(xor64(h_in, k), 27), P1), f'{P4}::HUGEINT')}\n"
            f"  ELSE {h_in} END AS {h_out}\n"
            f"  FROM w8{idx})")

    def step1_stage(idx, h_in, h_out, base, guard):
        inner = mul(f"bs[CAST({base} AS BIGINT)]", P5)
        return (
            f"s1{idx} AS (SELECT *,\n"
            f"  CASE WHEN {guard} THEN\n"
            f"    {mul(rotl(xor64(h_in, inner), 11), P1)}\n"
            f"  ELSE {h_in} END AS {h_out}\n"
            f"  FROM pre1{idx})")

    def avalanche(tag, h_in, h_out, src):
        # h ^= h>>33; h *= P2; h ^= h>>29; h *= P3; h ^= h>>32
        a, b2, c, d = f"{tag}_a", f"{tag}_b", f"{tag}_c", f"{tag}_d"
        return (
            f"{tag}1 AS (SELECT *, {xor64(h_in, f'({h_in}) // 8589934592')} AS {a} FROM {src}),\n"
            f"{tag}2 AS (SELECT *, {mul(a, P2)} AS {b2} FROM {tag}1),\n"
            f"{tag}3 AS (SELECT *, {xor64(b2, f'{b2} // 536870912')} AS {c} FROM {tag}2),\n"
            f"{tag}4 AS (SELECT *, {mul(c, P3)} AS {d} FROM {tag}3),\n"
            f"{tag}5 AS (SELECT *, {xor64(d, f'{d} // 4294967296')} AS {h_out} FROM {tag}4)")

    merge_sql = ",\n".join(merge_stages)
    sql = f"""WITH b AS (
  SELECT doc_id,
    list_transform(list_filter(string_split(text, ''), c -> c <> ''),
                   c -> ord(c)::HUGEINT) AS bs
  FROM documents),
s AS (SELECT doc_id, bs, len(bs) AS n FROM b),
stripes AS (SELECT doc_id, bs, n,
  CASE WHEN n >= 32 THEN
    list_reduce(
      list_concat(
        [[{init[0]}::HUGEINT, {init[1]}::HUGEINT,
          {init[2]}::HUGEINT, {init[3]}::HUGEINT]],
        list_transform(range(n // 32), i -> [i::HUGEINT])),
      (st, el) -> [{stripe_lambda}])
  ELSE NULL END AS st
  FROM s),
mg0 AS (SELECT doc_id, bs, n, st, {acc_h0} AS m0 FROM stripes),
{merge_sql},
lened AS (SELECT doc_id, bs, n, n - n % 32 AS off,
  {add(f"CASE WHEN n >= 32 THEN m4 ELSE {(42 + P5) % M64}::HUGEINT END",
       "n::HUGEINT")} AS h1
  FROM mg4),
pre81 AS (SELECT * FROM lened),
{step8_stages(1, "h1", "h2", "off + 1", "n % 32 >= 8")},
pre82 AS (SELECT * FROM s81),
{step8_stages(2, "h2", "h3", "off + 9", "n % 32 >= 16")},
pre83 AS (SELECT * FROM s82),
{step8_stages(3, "h3", "h4", "off + 17", "n % 32 >= 24")},
w4x AS (SELECT *, n - n % 8 AS off4,
  {mul(word4("n - n % 8 + 1"), P1)} AS k4 FROM s83),
s4x AS (SELECT *, n - n % 4 AS off1,
  CASE WHEN n % 8 >= 4 THEN
    {add(mul(rotl(xor64("h4", "k4"), 23), P2), f"{P3}::HUGEINT")}
  ELSE h4 END AS h5
  FROM w4x),
pre11 AS (SELECT * FROM s4x),
{step1_stage(1, "h5", "h6", "off1 + 1", "n % 4 >= 1")},
pre12 AS (SELECT * FROM s11),
{step1_stage(2, "h6", "h7", "off1 + 2", "n % 4 >= 2")},
pre13 AS (SELECT * FROM s12),
{step1_stage(3, "h7", "h8", "off1 + 3", "n % 4 >= 3")},
{avalanche("av", "h8", "u", "s13")},
signedh AS (SELECT doc_id, u,
  CASE WHEN u >= 9223372036854775808::HUGEINT
       THEN u - 18446744073709551616::HUGEINT ELSE u END AS sh
  FROM av5),
dims AS (SELECT doc_id, u,
  CAST(((sh % 1920) + 1920) % 1920 + 1 AS INTEGER) AS width,
  CAST((((((sh - (((sh % 65536) + 65536) % 65536)) // 65536) % 1080) + 1080)
        % 1080) + 1 AS INTEGER) AS height
  FROM signedh),
-- per-feature hashInt(i, u), unnested to rows so the avalanche stages
-- stay linear, then re-assembled in index order for the ordered fold
fi0 AS (SELECT doc_id, u, unnest(range(8)) AS i FROM dims),
fi1 AS (SELECT *, {add("u", f"{(P5 + 4) % M64}::HUGEINT")} AS fa FROM fi0),
fi2 AS (SELECT *, {xor64("fa", mul("i::HUGEINT", P1))} AS fb FROM fi1),
fi3 AS (SELECT *,
  {add(mul(rotl("fb", 23), P2), f"{P3}::HUGEINT")} AS fc FROM fi2),
{avalanche("fv", "fc", "fu", "fi3")},
fsigned AS (SELECT doc_id, i, fu,
  CASE WHEN fu >= 9223372036854775808::HUGEINT
       THEN fu - 18446744073709551616::HUGEINT ELSE fu END AS fs
  FROM fv5),
fvals AS (SELECT doc_id, i,
  CAST(CAST(((fs % 1000) + 1000) % 1000 AS REAL) / CAST(1000.0 AS REAL)
       AS DOUBLE) AS fx
  FROM fsigned),
fsum AS (SELECT doc_id,
  round(list_reduce(list_concat([CAST(0.0 AS DOUBLE)],
          list(fx ORDER BY i)), (a, x) -> a + x), 6) AS feat_sum
  FROM fvals GROUP BY doc_id)
SELECT d.doc_id, d.width, d.height,
  CAST(least(d.width,
    CAST(ceil(CAST(d.width AS DOUBLE) *
      (256.0 / CAST(greatest(d.width, d.height) AS DOUBLE))) AS INTEGER))
    AS INTEGER) AS resized_w,
  CAST(least(d.height,
    CAST(ceil(CAST(d.height AS DOUBLE) *
      (256.0 / CAST(greatest(d.width, d.height) AS DOUBLE))) AS INTEGER))
    AS INTEGER) AS resized_h,
  f.feat_sum,
  4 AS n_slices
FROM dims d JOIN fsum f USING (doc_id)"""
    return sql


def main():
    sql = build_sql()
    if len(sys.argv) < 3:
        print(sql)
        return
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    import duckdb
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    oracle = con.execute(sql + " ORDER BY doc_id").fetchall()
    spark = con.execute(
        f"SELECT doc_id, width, height, resized_w, resized_h, feat_sum, "
        f"n_slices FROM '{out_dir}/multimodal_decode/*.parquet' "
        f"ORDER BY doc_id").fetchall()
    assert len(oracle) == len(spark), (len(oracle), len(spark))
    bad = 0
    for o, sp in zip(oracle, spark):
        if tuple(o) != tuple(sp):
            bad += 1
            if bad <= 5:
                print("MISMATCH", o, sp)
    print(f"{len(oracle)} rows, {bad} mismatches, sql {len(sql)} chars")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
