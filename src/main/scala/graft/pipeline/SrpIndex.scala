package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => V}

/** Persisted SRP-LSH index for INCREMENTAL embedding near-dup detection —
  * the embedding-side sibling of [[LshIndex]].
  *
  * [[Dedup.embeddingNearDupPairs]] re-hashes the whole corpus on every
  * call; a living corpus should pay the corpus-side pass ONCE:
  *
  *   - `build` computes each vector's sign-random-projection bucket and
  *     persists `path/buckets` (id, bucket — 16 B/row candidate surface)
  *     and `path/vectors` (id, v) for the exact-cosine verify.
  *   - `append` adds a batch's signatures — the steady-state ingest step,
  *     touching only the new vectors.
  *   - `probe` checks a new batch against the index: batch buckets
  *     BROADCAST against the corpus bucket table (no corpus shuffle),
  *     candidates carry only 8-byte ids, and corpus vectors re-attach
  *     solely for ids that appear in some candidate pair.
  *
  * `nBits` is stamped into `path/meta` at build time and read back on
  * probe/append, so a probe can never hash with a different plane family
  * than the index it queries (the planes themselves are deterministic
  * splitmix64 values per (bit, dim) — see
  * [[graft.functions.VectorFunctions.plane]]).
  *
  * Degenerate-bucket guard: same shape as [[LshIndex.probe]] — corpus
  * bucket sizes are counted only for buckets the batch actually hits
  * (broadcast semi-join prunes at the scan), and buckets larger than
  * `maxBucketSize` are dropped as non-discriminative. */
object SrpIndex {

  private def signatures(
      df: DataFrame, id: Column, vec: Column, nBits: Int): DataFrame =
    Dedup.spread(df.select(id.cast("long").as("id"), vec.as("v")))
      .withColumn("bucket", V.srpBucket(col("v"), nBits))

  private def writeSignatures(sig: DataFrame, path: String, mode: String): Unit = {
    sig.select("id", "bucket").write.mode(mode).parquet(s"$path/buckets")
    sig.select("id", "v").write.mode(mode).parquet(s"$path/vectors")
  }

  /** Build the index at `path` (overwrites). One pass over the corpus. */
  def build(
      corpus: DataFrame, id: Column, vec: Column, path: String,
      nBits: Int = 8): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    Seq(nBits).toDF("n_bits")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    writeSignatures(signatures(corpus, id, vec, nBits), path, "overwrite")
  }

  private def readMeta(spark: SparkSession, path: String): Int =
    spark.read.parquet(s"$path/meta").select("n_bits").head().getInt(0)

  /** Add a batch to the index — the steady-state ingest step. */
  def append(batch: DataFrame, id: Column, vec: Column, path: String): Unit =
    writeSignatures(
      signatures(batch, id, vec, readMeta(batch.sparkSession, path)),
      path, "append")

  /** Near-duplicate pairs between a new batch and the indexed corpus:
    * (batch_id, corpus_id, cosine) with cosine ≥ `threshold`. Bucket
    * equality generates candidates (identical recall to the one-shot
    * [[Dedup.embeddingNearDupPairs]]); exact cosine verifies. Id-equal
    * pairs are dropped so a replayed batch that already appended its
    * signatures cannot self-match. */
  def probe(
      spark: SparkSession,
      path: String,
      batch: DataFrame,
      id: Column,
      vec: Column,
      threshold: Double = 0.95,
      maxBucketSize: Long = 2000): DataFrame = {
    val nBits = readMeta(spark, path)
    val corpusKeys = spark.read.parquet(s"$path/buckets")
    val bsig = signatures(batch, id, vec, nBits)
    val okBuckets = corpusKeys
      .join(broadcast(bsig.select("bucket").distinct()), Seq("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= maxBucketSize)
      .select("bucket")
    val candidates = corpusKeys
      .join(okBuckets, Seq("bucket"))
      .select(col("bucket"), col("id").as("corpus_id"))
      .join(broadcast(bsig.select(col("bucket"), col("id").as("batch_id"))),
        Seq("bucket"))
      .filter(col("batch_id") =!= col("corpus_id"))
      .select("batch_id", "corpus_id")
      .distinct()
    candidates
      .join(spark.read.parquet(s"$path/vectors")
          .select(col("id").as("corpus_id"), col("v").as("__vc")),
        Seq("corpus_id"))
      .join(bsig.select(col("id").as("batch_id"), col("v").as("__vb")),
        Seq("batch_id"))
      .withColumn("cosine", V.cosine(col("__vb"), col("__vc")))
      .filter(col("cosine") >= threshold)
      .select(col("batch_id"), col("corpus_id"),
        round(col("cosine"), 6).as("cosine"))
  }
}
