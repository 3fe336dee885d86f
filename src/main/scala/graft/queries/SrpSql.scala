package graft.queries

import graft.functions.VectorFunctions

/** DuckDB oracle SQL for the SRP-LSH surfaces (ann_srp, dedup_embedding).
  *
  * The sign-random-projection hyperplanes are deterministic splitmix64
  * values per (bit, dim) — so the oracle INLINES them as literals computed
  * by calling [[VectorFunctions.plane]] directly (bit-parity by
  * construction; `Double.toString` is shortest-round-trip, which DuckDB
  * parses back to the identical double). Dot products and cosines fold in
  * index order via list_reduce, mirroring the engine's sequential
  * accumulation, so the unrounded doubles — and therefore the sign tests
  * and the rank order — are IEEE-identical. Multi-probe candidacy
  * (bucket within hamming `probe` of the query's bucket) collapses to
  * `bit_count(xor(qb, cb)) <= probe`.
  *
  * Validated row-for-row against Spark verify dumps before wiring.
  */
object SrpSql {

  private val Dim = 64 // embeddings table vector length

  private def planesSql(nBits: Int): String =
    (0 until nBits).map { b =>
      (0 until Dim).map(d => VectorFunctions.plane(b, d).toString)
        .mkString("[", ", ", "]")
    }.mkString("[", ", ", "]")

  /** Ordered left fold of elementwise products — IEEE-identical to the
    * engine's index-order accumulation. */
  private def foldDot(a: String, b: String): String =
    s"list_reduce(list_concat([CAST(0.0 AS DOUBLE)], " +
      s"list_transform(range($Dim), i -> CAST($a[CAST(i+1 AS BIGINT)] AS DOUBLE) * " +
      s"CAST($b[CAST(i+1 AS BIGINT)] AS DOUBLE))), (x, y) -> x + y)"

  private def foldDotPlane(vec: String, planeRow: String): String =
    s"list_reduce(list_concat([CAST(0.0 AS DOUBLE)], " +
      s"list_transform(range($Dim), i -> CAST($vec[CAST(i+1 AS BIGINT)] AS DOUBLE) * " +
      s"$planeRow[CAST(i+1 AS BIGINT)])), (a, x) -> a + x)"

  private def bucketSql(vec: String, nBits: Int): String =
    (0 until nBits).map { b =>
      s"CASE WHEN ${foldDotPlane(vec, s"pl[${b + 1}]")} >= 0 THEN ${1L << b} ELSE 0 END"
    }.mkString("(", " + ", ")")

  private def cosSql(a: String, b: String): String = {
    val (dot, na, nb) = (foldDot(a, b), foldDot(a, a), foldDot(b, b))
    s"(CASE WHEN $na = 0.0 OR $nb = 0.0 THEN 0.0 ELSE $dot / sqrt(($na) * ($nb)) END)"
  }

  /** srpTopK(queries = vec_id < 5, k = 5, nBits = 6, probe = 2). */
  lazy val annSrpSql: String =
    s"""WITH planes AS (SELECT ${planesSql(6)} AS pl),
       |bkt AS (SELECT vec_id, embedding, ${bucketSql("embedding", 6)} AS bucket
       |        FROM embeddings CROSS JOIN planes),
       |q AS (SELECT vec_id AS qid, bucket AS qb, embedding AS qvec FROM bkt WHERE vec_id < 5),
       |c AS (SELECT vec_id AS id, bucket AS cb, embedding AS vec FROM bkt),
       |s AS (SELECT qid, id, ${cosSql("qvec", "vec")} AS cos
       |      FROM q JOIN c ON bit_count(CAST(xor(qb, cb) AS BIGINT)) <= 2 AND qid <> id)
       |SELECT qid, id AS neighbor_id,
       |  CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id) AS INTEGER) AS rank,
       |  round(cos, 6) AS cosine
       |FROM s QUALIFY rank <= 5""".stripMargin

  /** embeddingNearDupPairs(threshold = 0.35, nBits = 4). */
  lazy val dedupEmbeddingSql: String =
    s"""WITH planes AS (SELECT ${planesSql(4)} AS pl),
       |bkt AS (SELECT vec_id, embedding, ${bucketSql("embedding", 4)} AS bucket
       |        FROM embeddings CROSS JOIN planes),
       |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |        ${cosSql("a.embedding", "b.embedding")} AS cos
       |      FROM bkt a JOIN bkt b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
       |SELECT id_a, id_b, round(cos, 6) AS cosine FROM p WHERE cos >= 0.35""".stripMargin

  /** SrpIndex.probe over a corpus/batch split of `embeddings`
    * (vec_id % 4 != 0 indexed, % 4 = 0 probed; same planes/threshold as
    * [[dedupEmbeddingSql]]). The splits are disjoint, so pairs cross the
    * split instead of self-joining, and the probe's maxBucketSize = 2000
    * guard is mirrored (corpus-entry counts, no lower bound) so the
    * oracle stays exact at scales where a bucket overflows. Output
    * (batch_id, corpus_id, cosine), ordered. */
  lazy val dedupEmbeddingIncrementalSql: String =
    s"""WITH planes AS (SELECT ${planesSql(4)} AS pl),
       |bkt AS (SELECT vec_id, embedding, ${bucketSql("embedding", 4)} AS bucket
       |        FROM embeddings CROSS JOIN planes),
       |ok AS (SELECT bucket FROM bkt WHERE vec_id % 4 <> 0
       |       GROUP BY bucket HAVING count(*) <= 2000),
       |p AS (SELECT b.vec_id AS batch_id, c.vec_id AS corpus_id,
       |        ${cosSql("b.embedding", "c.embedding")} AS cos
       |      FROM bkt c JOIN ok USING (bucket) JOIN bkt b
       |        ON c.bucket = b.bucket
       |        AND c.vec_id % 4 <> 0 AND b.vec_id % 4 = 0)
       |SELECT batch_id, corpus_id, round(cos, 6) AS cosine FROM p
       |WHERE cos >= 0.35 ORDER BY batch_id, corpus_id""".stripMargin
}
