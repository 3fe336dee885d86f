package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling and mixture planning — the operators a
  * training-data pipeline uses to turn "we have 100 TB" into "we train on
  * THIS 10 TB, reproducibly".
  *
  * Sampling here is HASH-based, not `rand()`-based: `rand()` gives a
  * different corpus on every retry/backfill, which poisons both caching and
  * ablation comparisons. A multiplicative hash of the stable document id is
  * reproducible across runs, clusters, and engines (the same predicate is
  * one line of ANSI SQL — which is also what lets DuckDB oracle it).
  */
object Sampling {

  /** Three iterated MINSTD Lehmer steps: x ← (x · 48271) mod (2^31 − 1),
    * mapped to [0, 1). THREE steps, not one: document ids are typically
    * small and sequential, and a single multiplication maps them all near
    * zero (id < 44 000 ⇒ u < 0.001 — every row would pass every rate).
    * Iterating wraps the modulus thousands of times, decorrelating
    * consecutive ids. Every intermediate stays under 2^47, so 64-bit
    * arithmetic never overflows regardless of ANSI mode — and the whole
    * chain is exact integer math, reproducible in any engine (the DuckDB
    * oracle inlines the same three steps). The seed is `id + 1`: 0 is the
    * Lehmer fixed point (every step maps it to itself), so an unshifted
    * id ≡ 0 (mod 2^31−1) — notably doc_id 0 — would hash to u = 0.0 and
    * be kept at every nonzero rate, a small deterministic bias. Not
    * cryptographic; uniform enough for corpus subsampling.
    */
  /** The integer Lehmer chain under [[hashUnit]]: three MINSTD steps on
    * `id + 1`, returned as the raw long in [0, 2^31 − 1) — an exact,
    * engine-reproducible pseudo-random ORDER key (ordering by it is
    * ordering by hashUnit without ever comparing doubles). */
  def hashOrder(id: Column): Column = {
    val m = 2147483647L
    val x0 = pmod(id.cast("long") + lit(1L), lit(m))
    val x1 = x0 * 48271L % m
    val x2 = x1 * 48271L % m
    x2 * 48271L % m
  }

  def hashUnit(id: Column): Column =
    hashOrder(id).cast("double") / 2147483647.0

  /** Stratified deterministic sample: keep a row iff hashUnit(id) < the
    * sampling rate of its stratum. `rates` maps stratum value → rate;
    * strata absent from the map are dropped (rate 0). One scan, no shuffle:
    * the predicate is a codegen'd expression on the scan, so at 100 TB this
    * is I/O-bound and combines with partition pruning on the stratum
    * column when the table is so partitioned.
    */
  def stratifiedSample(
      df: DataFrame, id: Column, stratum: Column,
      rates: Map[String, Double]): DataFrame = {
    val rate = rates.foldLeft(lit(0.0)) { case (acc, (k, r)) =>
      when(stratum === k, lit(r)).otherwise(acc)
    }
    df.filter(hashUnit(id) < rate)
  }

  /** Deterministic global shuffle into `numShards` shards — the standard
    * pretraining step that destroys crawl/source locality before sequence
    * packing, so every training shard is an unbiased corpus sample and
    * data order is reproducible across reruns and engines.
    *
    * shard = xxhash64(id) mod numShards; within-shard order =
    * xxhash64(id, seed) with id as the tie-break. Both hashes are Spark's
    * codegen'd XXH64 builtin over the 8-byte id — no text is hashed, and
    * the DuckDB oracle replays the identical bit pattern in HUGEINT SQL.
    *
    * Scale shape: ONE hash shuffle (partition by shard) and an
    * independent per-shard sort for `row_number` — there is no global
    * sort and no driver involvement. Shards are the write unit: pick
    * numShards so a shard ≈ one output file (thousands at 100 TB), and
    * the per-shard sorts stay memory-sized regardless of corpus size.
    * A skewed shard is impossible by construction (ids hash uniformly).
    *
    * Returns the input columns plus (shard, pos); pos is dense 0..k-1
    * within each shard. */
  def shuffleShards(
      df: DataFrame, id: Column, numShards: Int, seed: Long): DataFrame = {
    val idL = id.cast("long")
    val w = Window.partitionBy(col("shard")).orderBy(col("__order"), idL)
    df.withColumn("shard",
        pmod(xxhash64(idL), lit(numShards.toLong)).cast("int"))
      .withColumn("__order", xxhash64(idL, lit(seed)))
      .withColumn("pos", (row_number().over(w) - 1).cast("int"))
      .drop("__order")
  }

  /** Per-stratum cap: keep at most `n` rows per stratum (the per-domain
    * cap every web-corpus pipeline applies so one giant domain cannot
    * dominate the training mix), selected deterministically — rows rank by
    * the [[hashOrder]] of their id (ties by id), so the kept subset is an
    * unbiased, reproducible sample of each stratum rather than its first
    * `n` ids.
    *
    * Scale shape: one shuffle keyed by the stratum, then an in-partition
    * rank — no global sort. Strata are typically plentiful (domains), so
    * parallelism comes from the key space; a single pathological hot
    * stratum sorts in one spill-backed task, and for WIDE payload rows the
    * caller can rank an (id, stratum) projection and semi-join survivors
    * back instead of shuffling document bodies. */
  def capPerStratum(
      df: DataFrame, id: Column, stratum: Column, n: Int): DataFrame = {
    require(n >= 1, s"n=$n")
    val w = Window.partitionBy(stratum).orderBy(hashOrder(id), id)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= n)
      .drop("__rk")
  }

  /** Diversity sample: a cluster-balanced subset of an embedding corpus —
    * k-means partitions the space ([[Clustering.kmeans]], deterministic),
    * then ≤ `perCluster` rows survive per cluster, picked by the Lehmer
    * hash order of the id ([[capPerStratum]]'s unbiased reproducible
    * pick). Rare regions keep their quota exactly like dense ones, so the
    * subset SPANS the embedding space instead of mirroring its density —
    * the coreset-flavored selection behind diverse eval sets and
    * balanced fine-tuning mixes. Returns the kept (vec_id, cluster).
    *
    * Cost: the k-means passes (per iteration: one codegen'd assignment
    * scan + a k×dim-row mean shuffle) plus one cluster-keyed cap shuffle.
    * k scales with the corpus (the SemDeDup discipline) without touching
    * plan size — assignment carries centroids as ONE plan reference. */
  def diverseSample(
      df: DataFrame, id: Column, vec: Column,
      k: Int, iters: Int, perCluster: Int): DataFrame =
    capPerStratum(
      Clustering.kmeans(df, id, vec, k, iters),
      col("vec_id"), col("cluster"), perCluster)

  /** Mixture plan: given per-stratum target WEIGHTS and a global token
    * budget, compute each stratum's sampling rate
    * `min(1, budget · weight / available_tokens)` — i.e. how hard each
    * stratum must be downsampled (or that it is exhausted, rate 1) to hit
    * the requested mixture. One metadata-scale aggregation over the corpus
    * (group by stratum, sum tokens); the output is a handful of rows that
    * feed [[stratifiedSample]].
    *
    * Returns (stratum, tokens, target_tokens, rate).
    */
  def mixturePlan(
      df: DataFrame, stratum: Column, tokensPerRow: Column,
      weights: Map[String, Double], budget: Long): DataFrame = {
    // target token counts are resolved to exact longs ON THE DRIVER so no
    // engine-dependent double→int conversion can perturb the plan
    val target = weights.foldLeft(lit(0L)) { case (acc, (k, w)) =>
      when(col("stratum") === k, lit(math.rint(w * budget).toLong)).otherwise(acc)
    }
    df.groupBy(stratum.as("stratum"))
      .agg(sum(tokensPerRow.cast("long")).as("tokens"))
      .withColumn("target_tokens", target)
      .withColumn("rate",
        round(least(lit(1.0),
          col("target_tokens").cast("double") /
            greatest(col("tokens").cast("double"), lit(1.0))), 6))
  }

  /** Temperature-based mixture plan [Conneau et al., "Unsupervised
    * Cross-lingual Representation Learning at Scale" (XLM-R), ACL 2020,
    * arXiv:1911.02116 §3]: sample stratum `l` with share
    * `q_l ∝ p_l^α` where `p_l` is the stratum's token share of the
    * corpus — α < 1 flattens the natural distribution, upweighting
    * low-resource strata without hand-tuned weights (α = 0.3 is the
    * published multilingual setting). Returns per-stratum `tokens`, the
    * temperature-adjusted share `q`, and the sampling `rate` that meets
    * `budget` tokens at those shares (capped at 1.0).
    *
    * Plan shape: ONE corpus aggregation (map-side combined); everything
    * after operates on #strata rows — metadata-scale cross joins, never a
    * second corpus pass. q and rate are 6-dp rounded for engine-agnostic
    * comparison. */
  def temperaturePlan(
      df: DataFrame, stratum: Column, tokensPerRow: Column,
      alpha: Double, budget: Long): DataFrame = {
    val agg = df.groupBy(stratum.as("stratum"))
      .agg(sum(tokensPerRow.cast("long")).as("tokens"))
    val tot = agg.select(sum(col("tokens")).cast("double").as("total"))
    val p = agg.crossJoin(broadcast(tot))
      .withColumn("qr", pow(col("tokens").cast("double") / col("total"), lit(alpha)))
    val qs = p.select(sum(col("qr")).as("qs"))
    p.crossJoin(broadcast(qs))
      .select(col("stratum"), col("tokens"),
        round(col("qr") / col("qs"), 6).as("q"),
        round(least(lit(1.0),
          lit(budget.toDouble) * (col("qr") / col("qs")) /
            col("tokens").cast("double")), 6).as("rate"))
  }
}
