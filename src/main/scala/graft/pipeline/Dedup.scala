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

  /** Round-robin repartition to the session's shuffle parallelism before a
    * CPU-bound signature stage: testdata-sized inputs often arrive as ONE
    * parquet split, which would serialize all shingle/minhash compute on a
    * single core. The shuffled payload is the narrow (id, text) projection —
    * one pass of the raw bytes, the standard price for balanced compute. */
  private[pipeline] def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    df.repartition(p)
  }

  /** Exact dedup: keep the lowest-id row per distinct value of `on`.
    * One hash-aggregate shuffle; survivors keep all columns. */
  def exact(df: DataFrame, on: Column, id: Column): DataFrame = {
    val w = Window.partitionBy(on).orderBy(id)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Exact dedup at scale: groupBy a 128-bit fingerprint of the text rather
    * than the text itself, so the shuffle carries 16 bytes per row instead
    * of the document body. The key pairs two INDEPENDENT 64-bit hash
    * families (the repo's FNV-1a expression and Spark's codegen'd XXH64) —
    * a single 64-bit key would silently drop distinct documents by
    * birthday collision at multi-billion-document scale (~n²/2⁶⁵; near
    * certainty at 10B docs), while a colliding pair here requires both
    * families to collide on the same texts (~n²/2¹²⁹). */
  def exactByFingerprint(df: DataFrame, text: Column, id: Column): DataFrame =
    exact(
      df.withColumn("__fp",
        struct(T.fingerprint64(text).as("fnv"), xxhash64(text).as("xxh"))),
      col("__fp"), id)
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
      bands: Int = 8,
      threshold: Double = 0.7,
      maxBucketSize: Long = 2000): DataFrame = {
    // spread BEFORE the shingle pass so signature compute runs on all cores
    // sorted once per doc: minhash is order-independent and the final pair
    // verification gets the merge-intersect jaccard (see ngramJaccardPairs)
    val sh = spread(df.select(id.cast("long").as("id"), text.as("__text")))
      .select(col("id"),
        array_sort(T.charShingles(col("__text"), shingleSize)).as("shingles"))
    // Fused signature + band fold (one expression) — projection collapse
    // cannot duplicate the k-hash signature per band. Candidates carry ONLY
    // the 8-byte ids through the join + dedup — the shingle arrays re-attach
    // after candidate pairs are distinct, so the shuffle volume is
    // O(pairs × 16B), not O(pairs × document size).
    val banded = sh.select(
      col("id"),
      posexplode(T.minhashBands(col("shingles"), numHashes, bands)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")
    // degenerate-bucket guard: a band value shared by >maxBucketSize docs is
    // non-discriminative (would emit O(bucket²) candidates); drop it — at
    // LSH parameters matched to the threshold, true near-dups collide in
    // other bands with overwhelming probability.
    val bucketSizes = banded.groupBy("band", "bucket")
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") > 1 && col("bsz") <= maxBucketSize)
    val kept = banded.join(bucketSizes.select("band", "bucket"), Seq("band", "bucket"))
    val candidates = kept.select(col("band"), col("bucket"), col("id").as("id_a"))
      .join(kept.select(col("band"), col("bucket"), col("id").as("id_b")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    candidates
      .join(sh.select(col("id").as("id_a"), col("shingles").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("shingles").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard", T.jaccardSorted(col("sh_a"), col("sh_b")))
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
      maxHamming: Int = 3,
      maxBucketSize: Long = 2000): DataFrame = {
    val sig = spread(df.select(id.cast("long").as("id"), text.as("__text")))
      .select(col("id"), T.simhash64(T.wordShingles(col("__text"), 2)).as("sim"))
    val banded0 = sig.select(col("id"), col("sim"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("sim"), b * 16).bitwiseAND(0xffffL)): _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "chunk")
    // degenerate-chunk guard: on homogeneous corpora some 16-bit chunk
    // values are shared by a large fraction of docs (correlated bit votes);
    // those buckets emit O(bucket²) candidates while discriminating nothing.
    // Pairs whose only collision was a mega-bucket may be lost — the standard
    // SimHash-at-scale recall/cost trade.
    val okChunks = banded0.groupBy("band", "chunk")
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") > 1 && col("bsz") <= maxBucketSize)
      .select("band", "chunk")
    val banded = banded0.join(okChunks, Seq("band", "chunk"))
    // candidate pairs carry (id, sim) only — 16 bytes a side; hamming verify
    // runs pre-dedup (cheap bit math) so the distinct sees far fewer rows
    val a = banded.select(col("band"), col("chunk"), col("id").as("id_a"), col("sim").as("sim_a"))
    val b = banded.select(col("band"), col("chunk"), col("id").as("id_b"), col("sim").as("sim_b"))
    a.join(b, Seq("band", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming", T.hamming64Col(col("sim_a"), col("sim_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming").cast("int").as("hamming"))
      .dropDuplicates("id_a", "id_b")
  }

  /** N-gram Jaccard pairs via an inverted-index join (no LSH, exact): explode
    * shingles, equi-join docs sharing a shingle, count common shingles per
    * pair, compute |A∩B| / (|A| + |B| - |A∩B|). Exact, via PREFIX FILTERING
    * [Bayardo, Ma, Srikant: "Scaling Up All Pairs Similarity Search",
    * WWW 2007]: order grams globally by (document frequency, gram) and join
    * only each doc's ⌊(1−t)·n⌋+1 RAREST grams — any pair with jaccard ≥ t
    * shares at least one prefix gram (overlap ≥ ⌈t·max(|A|,|B|)⌉, so the
    * prefixes must intersect; longer prefixes only add candidates, never
    * lose them). A naive full inverted-index join explodes quadratically on
    * hot grams (a gram in half of a 10M-doc corpus alone generates 10^13
    * candidate rows); prefixes are by construction the rarest grams, so
    * bucket sizes stay small without any semantic cut. Candidates then
    * verify with an exact array-intersection jaccard. `maxDocFreq` remains
    * a safety valve (drops grams hotter than the cap from candidate
    * generation entirely — only reachable by a doc whose every gram is
    * hot); the default never fires below 10k-doc corpora.
    *
    * `shingler` picks the gram unit. This matters more than any join
    * strategy: candidate volume is Σ df(g)², so the unit must carry enough
    * entropy that document frequencies stay small. A corpus with a small
    * character alphabet (or short docs) degenerates char-3-grams to a
    * few-hundred-gram vocabulary where EVERY inverted-index scheme is
    * quadratic; word n-grams (vocab^n) restore discrimination. */
  def ngramJaccardPairs(
      df: DataFrame,
      id: Column,
      text: Column,
      shingleSize: Int = 3,
      threshold: Double = 0.5,
      maxDocFreq: Long = 10000,
      shingler: (Column, Int) => Column = T.charShingles): DataFrame = {
    // shingle arrays are sorted ONCE here (per doc) so pair verification can
    // run the allocation-free merge-intersect jaccard instead of per-pair
    // hash sets — the pair side is millions of rows, the doc side thousands
    val sh = spread(df.select(id.cast("long").as("id"), text.as("__text")))
      .select(col("id"),
        array_sort(shingler(col("__text"), shingleSize)).as("shingles"))
      .withColumn("n", size(col("shingles")))
    val inv = sh.select(col("id"), col("n"), explode(col("shingles")).as("g"))
    val freq = inv.groupBy("g").agg(count(lit(1)).as("df"))
    val wDoc = Window.partitionBy("id").orderBy(col("df"), col("g"))
    // epsilon before ceil: double rounding can push t*n past the exact
    // rational (t=0.07, n=100 → ceil 8, not 7), which would SHORTEN the
    // prefix and silently drop qualifying pairs from an exact join. A
    // longer prefix only adds candidates, so err on the long side.
    val prefix = inv.join(freq.filter(col("df") <= maxDocFreq), Seq("g"))
      .withColumn("__rk", row_number().over(wDoc))
      .filter(col("__rk") <=
        col("n") - ceil(lit(threshold) * col("n") - lit(1e-9)).cast("int") + 1)
      .select(col("id"), col("g"))
    val candidates = prefix.select(col("g"), col("id").as("id_a"))
      .join(prefix.select(col("g"), col("id").as("id_b")), Seq("g"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    candidates
      .join(sh.select(col("id").as("id_a"), col("shingles").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("shingles").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard", T.jaccardSorted(col("sh_a"), col("sh_b")))
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
    val sig = spread(df.select(id.cast("long").as("id"), vec.as("v")))
      .withColumn("bucket", V.srpBucket(col("v"), nBits))
    // one bucket per row → a pair can only collide once; no dedup needed
    val a = sig.select(col("bucket"), col("id").as("id_a"), col("v").as("va"))
    val b = sig.select(col("bucket"), col("id").as("id_b"), col("v").as("vb"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", V.cosine(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }
}
