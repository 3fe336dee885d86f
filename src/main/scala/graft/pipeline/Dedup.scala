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
    val sh0 = spread(df.select(id.cast("long").as("id"), text.as("__text")))
      .select(col("id"),
        array_sort(T.charShingles(col("__text"), shingleSize)).as("shingles"))
    // Fused signature + band fold (one expression) — projection collapse
    // cannot duplicate the k-hash signature per band. Candidates carry ONLY
    // the 8-byte ids through the join + dedup — the shingle arrays re-attach
    // after candidate pairs are distinct, so the shuffle volume is
    // O(pairs × 16B), not O(pairs × document size).
    //
    // NOTE (r19, tried and REVERTED on measurement): the lazy plan re-runs
    // the k-hash minhash fold 4x and the shingle pass 6x (pushdown
    // asymmetry de-canonicalizes the subtrees, so exchange reuse never
    // fires), and the signed frames are tiny — the most favorable
    // pin-economics in the suite. Graphs-style pins of sh + banded +
    // result STILL lost in an interleaved same-window A/B at sf0.1:
    // lazy 0.88-1.38 s / 8 jobs / 102 tasks / ~5-7 s CPU vs pinned
    // 1.17-1.65 s / 13 jobs / 122 tasks / ~7-11 s CPU. Recompute through
    // whole-stage codegen over page-cached parquet beats ANY
    // materialization machinery at this scale; see the
    // ngramJaccardPairs/repeatedSpanRemoval NOTEs for the two heavier
    // cases. Do not re-try pins on the one-shot dedup operators.
    val banded = sh0.select(
      col("id"),
      posexplode(T.minhashBands(col("shingles"), numHashes, bands)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")
    minhashPairsSigned(sh0, banded, threshold, maxBucketSize)
  }

  /** [[minhashPairs]] over a PRE-SIGNED frame: `sh` is (id, shingles —
    * sorted distinct) and `banded` its (id, band, bucket) LSH keys. The
    * entry point for callers that already paid the signature pass —
    * [[LshIndex.ingestBatch]] signs each crawl batch exactly once and
    * reuses the frames for corpus probe, within-batch dedup AND the index
    * append, instead of re-shingling raw text per stage. */
  private[pipeline] def minhashPairsSigned(
      sh: DataFrame,
      banded: DataFrame,
      threshold: Double,
      maxBucketSize: Long): DataFrame = {
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
    * quadratic; word n-grams (vocab^n) restore discrimination.
    *
    * Three further PPJoin-style cuts [Xiao, Wang, Lin, Yu: "Efficient
    * Similarity Joins for Near Duplicate Detection", WWW 2008], all
    * recall-exact:
    *
    *   - '''asymmetric prefixes''': orient each pair by (n, id); the
    *     smaller doc only ever partners with docs at least its size, so
    *     its required overlap is ≥ ⌈2t/(1+t)·n⌉ and its join prefix
    *     shrinks to `n − ⌈2t/(1+t)·n⌉ + 1` (the PROBE prefix; ~11% of n
    *     at t=0.8 vs the index prefix's ~20%) — candidate volume drops
    *     from Σ df_idx(g)² to Σ df_probe(g)·df_idx(g);
    *   - '''length filter''': jaccard ≤ n_s/n_l, so any pair with
    *     n_s < t·n_l is rejected before the pair ever reaches the
    *     distinct;
    *   - '''positional filter''': a candidate row joined on gram g at
    *     ranks (rk_s, rk_l) bounds the overlap by
    *     `c + min(n_s − rk_s, n_l − rk_l)` where c counts common grams at
    *     or before g. For the pair's FIRST common in-prefix gram, c = 1
    *     plus at most the valve-dropped in-prefix grams (counted per doc,
    *     0 unless `maxDocFreq` fires), so rows whose bound misses the
    *     required overlap ⌈t/(1+t)(n_s+n_l)⌉ are dropped PER ROW — a
    *     qualifying pair always survives through its first-gram row
    *     (later rows only ever have smaller bounds), and survivors
    *     verify exactly anyway.
    *
    * NOTE (r19, both tried and REVERTED on measurement — do not re-try
    * without new evidence): the scaffolding double-evaluation here (the
    * shingle table feeds the inverted index and both verify joins; the
    * ranked prefix table feeds the idx and probe join sides) was attacked
    * two ways and BOTH lost to this lazy shape at sf0.1:
    *   1. Graphs-style eager pin/release (persist unsafe rows of sh +
    *      ranked + result, release scaffolds after materializing):
    *      dup_clusters 16→20 jobs / 182→192 tasks and min-of-3 executor
    *      CPU 6.1→9.2 s — the InternalRow copy + deserialized block
    *      store/read and the lost whole-stage fusion cost more than the
    *      recompute they saved (the recompute is all codegen'd
    *      scan+sort+window over a few MB).
    *   2. Shared-exchange reuse (one repartition above each scaffold,
    *      both consumers reading the reused AQE stage; the probe prefix
    *      is a subset of the index prefix, so one g-keyed exchange of
    *      the index-prefix rows can serve both join sides): defeated by
    *      filter pushdown, exactly as the r18 analysis predicted — the
    *      inner join pushes isnotnull/key constraints below ONE copy of
    *      the exchange and not the other, the subtrees stop
    *      canonicalizing equal, and the executed plan shows zero reuse
    *      plus the extra exchange.
    * The remaining declarative fixes all lose a PPJoin bound or AQE skew
    * safety (r18 analysis, above). This shape stands. */
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
    val wDocAll = Window.partitionBy("id")
    // epsilon before ceil: double rounding can push t*n past the exact
    // rational (t=0.07, n=100 → ceil 8, not 7), which would SHORTEN the
    // prefix and silently drop qualifying pairs from an exact join. A
    // longer prefix only adds candidates, so err on the long side.
    def plen(frac: Double): Column =
      col("n") - ceil(lit(frac) * col("n") - lit(1e-9)).cast("int") + 1
    val probeFrac = 2.0 * threshold / (1.0 + threshold)
    // ranks run over the FULL gram list (the prefix lemma is about the
    // full set); the valve then drops hot grams from JOIN candidacy only,
    // and `__drop` counts how many in-index-prefix grams it took — the
    // positional filter's exactness slack (always 0 until the valve fires)
    val ranked = inv.join(freq, Seq("g"))
      .withColumn("__rk", row_number().over(wDoc))
      .withColumn("__pidx", plen(threshold))
      .withColumn("__drop", sum(when(
        col("df") > maxDocFreq && col("__rk") <= col("__pidx"), 1)
        .otherwise(0)).over(wDocAll))
      .filter(col("df") <= maxDocFreq)
    val idx = ranked.filter(col("__rk") <= col("__pidx"))
      .select(col("g"), col("id").as("id_l"), col("n").as("n_l"),
        col("__rk").as("rk_l"), col("__drop").as("drop_l"))
    val probe = ranked.filter(col("__rk") <= plen(probeFrac))
      .select(col("g"), col("id").as("id_s"), col("n").as("n_s"),
        col("__rk").as("rk_s"), col("__drop").as("drop_s"))
    val candidates = probe.join(idx, Seq("g"))
      // orientation: the probe (short-prefix) doc is the (n, id)-smaller
      // one, so each unordered pair is generated exactly once
      .filter(col("n_s") < col("n_l") ||
        (col("n_s") === col("n_l") && col("id_s") < col("id_l")))
      // length filter
      .filter(col("n_s").cast("double") >= lit(threshold) * col("n_l") - lit(1e-9))
      // positional filter (per row — see the scaladoc exactness argument)
      .filter((lit(1) + least(col("drop_s"), col("drop_l")) +
        least(col("n_s") - col("rk_s"), col("n_l") - col("rk_l"))).cast("double")
        >= lit(threshold / (1.0 + threshold)) * (col("n_s") + col("n_l")) - lit(1e-9))
      .select(least(col("id_s"), col("id_l")).as("id_a"),
        greatest(col("id_s"), col("id_l")).as("id_b"))
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

  /** Substring-level repeated-span removal — the hash-bucketed form of
    * suffix-array training-data dedup (Lee et al. 2022, arXiv:2107.06499):
    * instead of doc-granularity drop decisions, every word `k`-gram that
    * occurs `minCount`+ times ANYWHERE in the corpus marks its k word
    * positions for removal; overlapping marks merge (interval union), and
    * each document's surviving words re-join into `kept_text`.
    *
    * Returns (doc_id, n_words, removed_words, kept_text) — one row per
    * input document, including documents with nothing removed.
    *
    * Shape for 100 TB:
    *   - the gram stream carries (id, pos, 8-byte FNV fingerprint) — the
    *     gram TEXT never shuffles (the suffix array's "don't materialize
    *     the substrings" property, bought with a hash instead of an index);
    *   - duplicated-gram detection is ONE count-aggregate on the
    *     fingerprint (map-side partial combine absorbs hot grams), and the
    *     occurrence re-join is an equi-join on the same key, so both sides
    *     shuffle-partition cleanly;
    *   - interval merge + text reconstruction is per-document row-local
    *     array math (no window, no sort): positions collect per doc
    *     (bounded by doc length), coverage materializes as a distinct
    *     position array, survivors filter by index.
    * For multi-billion-gram corpora, pair the FNV key with `xxhash64` into
    * the 16-byte two-family struct [[exactByFingerprint]] uses — a 64-bit
    * family alone starts birthday-colliding (false dup marks) past ~10⁹
    * distinct grams. Single-family here keeps the oracle SQL one
    * list_reduce instead of two.
    *
    * NOTE (r19, tried and REVERTED on measurement — see the
    * [[ngramJaccardPairs]] NOTE for the two mechanisms): pin/release of
    * base+occ+result measured 10→13 jobs / 73→112 tasks and min-of-3
    * executor CPU 6.6→8.9 s at sf0.1; the shared-exchange variant split
    * on pushed isnotnull constraints (executed plan kept all 3 scans and
    * gained an exchange). The occ double-evaluation is cheaper than any
    * materialization of occ at this scale; the g-keyed alternatives stay
    * rejected for skew (map-side combine on the counting side is the
    * scale-correct shape).
    */
  def repeatedSpanRemoval(
      df: DataFrame,
      id: Column,
      text: Column,
      k: Int,
      minCount: Long = 2L): DataFrame = {
    require(k >= 1 && minCount >= 2, s"k=$k minCount=$minCount")
    val base = df.select(id.cast("long").as("id"), T.tokens(text).as("w"))
    // (id, pos, gram-fingerprint) — one row per k-gram occurrence
    val occ = spread(base)
      .select(col("id"),
        explode(
          when(size(col("w")) >= k,
            transform(sequence(lit(0), size(col("w")) - k),
              i => struct(i.as("pos"),
                T.fingerprint64(array_join(slice(col("w"), i + 1, lit(k)), " "))
                  .as("g"))))
            .otherwise(array().cast("array<struct<pos:int,g:bigint>>")))
          .as("o"))
      .select(col("id"), col("o.pos").as("pos"), col("o.g").as("g"))
    val dup = occ.groupBy("g").count()
      .filter(col("count") >= minCount).select("g")
    val starts = occ.join(dup, "g")
      .groupBy("id").agg(collect_list(col("pos")).as("starts"))
    // O(doc) reconstruction: sorted-interval merge in ONE codegen'd pass
    // (the covered-array + per-word array_contains spelling is O(doc²)
    // worst-case — see graft.functions.SpanFunctions)
    base.join(starts, Seq("id"), "left")
      .withColumn("__sp", graft.functions.SpanFunctions.spanRemove(
        col("w"), coalesce(col("starts"), array().cast("array<int>")), k))
      .select(
        col("id").as("doc_id"),
        size(col("w")).as("n_words"),
        col("__sp.removed_words").as("removed_words"),
        col("__sp.kept_text").as("kept_text"))
      .orderBy(col("doc_id"))
  }

  /** Semantic (embedding-space) dedup, SemDeDup-shaped (Abbas et al. 2023,
    * arXiv:2303.09540): k-means the corpus embeddings, then inside each
    * cluster drop every vector that has a LOWER-id cluster-mate with
    * cosine ≥ `tau` — the "keep one representative per semantic
    * duplicate group" rule with a deterministic (lowest-id) survivor.
    * Returns the survivors as (vec_id, cluster).
    *
    * Scale shape: the O(n²) cosine pass never happens globally — pairs
    * form only within a cluster (SemDeDup's point: k scales with corpus
    * size, so cluster populations stay bounded and the pairwise join is
    * k independent bounded problems). The clustering itself is
    * [[Clustering.kmeans]]: assignment is a codegen'd literal-centroid
    * expression, update shuffles only k×dim partials. At demo scale
    * k=10 under-parallelizes the pair join (10 shuffle keys); production
    * k (~n/1000) provides the parallelism by construction.
    *
    * Every arithmetic step (6-dp input rounding, fixed-order dot folds,
    * sqrt-of-product norm) matches the DuckDB oracle bit-for-bit, so the
    * drop set is exactly checkable. */
  def semanticDedup(
      df: DataFrame,
      id: Column,
      vec: Column,
      k: Int,
      iters: Int,
      tau: Double): DataFrame =
    semanticDedupWith(df, id, vec,
      Clustering.kmeansCentroids(df, id, vec, k, iters), tau)

  /** [[semanticDedup]] over PRE-FITTED centroids — for callers that hold
    * the k-means model as standing state (the fit is one model per corpus,
    * like the PQ/IVF-PQ codebooks; re-running Lloyd per query invocation
    * re-paid `iters` + 1 corpus passes for identical centroids). */
  def semanticDedupWith(
      df: DataFrame,
      id: Column,
      vec: Column,
      cs: Seq[Seq[Double]],
      tau: Double): DataFrame = {
    val e = df.select(id.cast("long").as("vec_id"),
      transform(vec, x => round(x.cast("double"), 6)).as("v"))
    // the FINAL assignment folds into this projection as the codegen'd
    // argmin — joining against kmeans' (vec_id, cluster) output would
    // shuffle the corpus-scale embedding table a second time for data the
    // scan already has in hand
    // the self-norm is pair-invariant: fold it ONCE per vector here (the
    // codegen'd sequential loop — bit-identical to the oracle's in-order
    // list_sum) instead of twice per pair inside the quadratic join
    val wc = e
      .withColumn("cluster", graft.functions.VectorFunctions.centroidArgmin(col("v"), cs))
      .withColumn("n2", V.dotD(col("v"), col("v")))
    val a = wc.select(col("cluster"), col("vec_id").as("id_a"),
      col("v").as("va"), col("n2").as("na"))
    val b = wc.select(col("cluster"), col("vec_id").as("id_b"),
      col("v").as("vb"), col("n2").as("nb"))
    val dropped = a.join(b, Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos",
        V.dotD(col("va"), col("vb")) / sqrt(col("na") * col("nb")))
      .filter(col("cos") >= tau)
      .select(col("id_b").as("vec_id")).distinct()
    wc.join(dropped, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("cluster"))
      .orderBy(col("vec_id"))
  }
}
