package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T, VectorFunctions => V}

/** Deduplication operators for training-data pipelines, each shaped for the
  * 100 TB path:
  *
  *   - every candidate-generation step is an equi-join on a bucket key
  *     (shuffle-partitionable), never a cross join;
  *   - pair verification runs only within buckets, and duplicate candidate
  *     pairs from multiple bands are de-duplicated *before* verification;
  *   - all signatures are deterministic codegen'd expressions, so the
  *     signature pass is one whole-stage-codegen scan over the corpus.
  */
object Dedup {

  /** Exact dedup: keep the lowest-id row per distinct value of `on`.
    * One hash-aggregate shuffle; survivors keep all columns. */
  def exact(df: DataFrame, on: Column, id: Column): DataFrame = {
    val w = Window.partitionBy(on).orderBy(id)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Exact dedup at scale: groupBy a 64-bit fingerprint of the text rather
    * than the text itself, so the shuffle carries 8 bytes per row instead of
    * the document body. Collision probability at 2^64 is negligible for
    * dedup purposes (and acceptable: a collision only drops one extra doc). */
  def exactByFingerprint(df: DataFrame, text: Column, id: Column): DataFrame =
    exact(df.withColumn("__fp", T.fingerprint64(text)), col("__fp"), id)
      .drop("__fp")

  /** Candidate near-dup pairs by MinHash + LSH banding.
    *
    * shingle(n) → minhash(k) → split signature into `bands` bands → explode
    * → self-join on (band, band-signature) → verify exact Jaccard over
    * shingle sets ≥ `threshold`.
    *
    * Returns (id_a, id_b, jaccard) with id_a < id_b, one row per pair.
    */
  def minhashPairs(
      df: DataFrame,
      id: Column,
      text: Column,
      shingleSize: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.7): DataFrame = {
    val rows = numHashes / bands
    val sig = df.select(
      id.cast("long").as("id"),
      T.charShingles(text, shingleSize).as("shingles"))
      .withColumn("sig", T.minhash(col("shingles"), numHashes))
    // band key = (band index, hash of the band's slice of the signature)
    val banded = sig.select(
      col("id"), col("shingles"),
      posexplode(transform(
        sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("sig"), b * rows + 1, lit(rows)), b))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")
    val a = banded.select(col("band"), col("bucket"),
      col("id").as("id_a"), col("shingles").as("sh_a"))
    val b = banded.select(col("band"), col("bucket"),
      col("id").as("id_b"), col("shingles").as("sh_b"))
    val candidates = a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b")
      .dropDuplicates("id_a", "id_b") // bands often agree; verify once
    candidates
      .withColumn("jaccard", T.jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Near-dup survivors via MinHash-LSH: drop every doc that has a
    * near-duplicate with a smaller id (greedy, deterministic). */
  def minhashDedup(
      df: DataFrame,
      id: Column,
      text: Column,
      shingleSize: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.7): DataFrame = {
    val losers = minhashPairs(df, id, text, shingleSize, numHashes, bands, threshold)
      .select(col("id_b").as("__loser")).distinct()
    df.join(losers, id.cast("long") === col("__loser"), "left_anti")
  }

  /** SimHash near-dup candidate pairs: 64-bit simhash over word shingles,
    * banded into 4×16-bit chunks (two docs within hamming distance ≤ 3 of
    * each other agree on ≥ 1 chunk — pigeonhole), verified by exact hamming
    * distance ≤ `maxHamming`. */
  def simhashPairs(
      df: DataFrame,
      id: Column,
      text: Column,
      maxHamming: Int = 3): DataFrame = {
    val sig = df.select(id.cast("long").as("id"),
      T.simhash64(T.wordShingles(text, 2)).as("sim"))
    val banded = sig.select(col("id"), col("sim"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("sim"), b * 16).bitwiseAND(0xffffL)): _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "chunk")
    val a = banded.select(col("band"), col("chunk"), col("id").as("id_a"), col("sim").as("sim_a"))
    val b = banded.select(col("band"), col("chunk"), col("id").as("id_b"), col("sim").as("sim_b"))
    a.join(b, Seq("band", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sim_a", "sim_b")
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", T.hamming64Col(col("sim_a"), col("sim_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming").cast("int").as("hamming"))
  }

  /** N-gram Jaccard pairs via an inverted-index join (no LSH, exact): explode
    * shingles, equi-join docs sharing a shingle, count common shingles per
    * pair, compute |A∩B| / (|A| + |B| - |A∩B|). Exact but quadratic in the
    * worst case — the LSH variants are the scale path; this is the oracle-able
    * exact form. Hot shingles above `maxDocFreq` are dropped (standard
    * inverted-index stopword cut — they only generate candidate pairs that
    * cheaper shingles already generate). */
  def ngramJaccardPairs(
      df: DataFrame,
      id: Column,
      text: Column,
      shingleSize: Int = 3,
      threshold: Double = 0.5,
      maxDocFreq: Long = 10000): DataFrame = {
    val sh = df.select(id.cast("long").as("id"),
      T.charShingles(text, shingleSize).as("shingles"))
      .withColumn("n", size(col("shingles")))
    val inv = sh.select(col("id"), col("n"), explode(col("shingles")).as("g"))
    val freq = inv.groupBy("g").agg(count(lit(1)).as("df")).filter(col("df") <= maxDocFreq)
    val pruned = inv.join(freq.select("g"), Seq("g"))
    val pairs = pruned.as("x").join(pruned.as("y"), Seq("g"))
      .filter(col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .agg(count(lit(1)).as("common"), first(col("x.n")).as("na"), first(col("y.n")).as("nb"))
    pairs
      .withColumn("jaccard",
        col("common").cast("double") /
          (col("na") + col("nb") - col("common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Embedding near-dup pairs: SRP-LSH bucket join then exact cosine
    * verification ≥ `threshold`. `nBits` trades recall for bucket size. */
  def embeddingNearDupPairs(
      df: DataFrame,
      id: Column,
      vec: Column,
      threshold: Double = 0.95,
      nBits: Int = 8): DataFrame = {
    val sig = df.select(id.cast("long").as("id"), vec.as("v"))
      .withColumn("bucket", V.srpBucket(col("v"), nBits))
    val a = sig.select(col("bucket"), col("id").as("id_a"), col("v").as("va"))
    val b = sig.select(col("bucket"), col("id").as("id_b"), col("v").as("vb"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cosine", V.cosine(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }
}
