package graft.pipeline

import org.apache.spark.sql.{DataFrame, GraftInternal}

/** Plan-shape utilities shared by the pipeline stages. */
object PlanUtil {

  /** Re-root `df` as a single-node logical plan (LogicalRDD over its
    * physical output), cutting the logical lineage.
    *
    * Why this exists: the composed curation pipeline chains index-ingest
    * stages whose plans are heavily SHARED DAGs (the signed frame feeds
    * probe, self-join and append; each verdict set feeds two anti-joins).
    * Execution handles sharing fine, but a downstream stage that embeds
    * the full upstream plan makes every Catalyst pass — and, far worse,
    * AQE's per-query-stage plan-string generation — walk the shared
    * subtrees once per PATH: tree-shaped exponential cost on a DAG. A
    * measured 2-document composed batch spent 160 s of driver CPU
    * stringifying plans versus 7 s running jobs. Truncating at each
    * stage boundary makes every stage's plan O(stage), not O(pipeline).
    *
    * The physical RDD lineage survives unchanged (recompute after cache
    * eviction still works); callers persist + materialize the truncated
    * frame exactly as they would the original. */
  def truncateLineage(df: DataFrame): DataFrame =
    GraftInternal.truncatedDataFrame(df)

  /** Run `body` with BATCH-LOCAL planning settings: adaptive execution
    * OFF and `defaultParallelism / 4` (min 8) shuffle partitions,
    * restored afterwards.
    *
    * The incremental index chains execute ~6-10 actions per micro-batch
    * whose shuffles are BATCH-scale (band keys, candidate ids, verdict
    * sets — thousands of rows). There AQE's per-exchange query-stage
    * materialization only adds driver round-trips: measured on the
    * composed pipeline, one fixed-size batch ran 25-40 extra jobs under
    * AQE, and at this box's 40-60 ms/job floor that is seconds of pure
    * scheduling; AQE-off with cores/4 partitions ran the same batch
    * 15-25% faster across interleaved A/B passes. Corpus-scale work is
    * UNAFFECTED: one-shot probes/builds and every non-index query keep
    * AQE (skew splitting, coalescing) — this scope covers only the
    * per-batch ingest chain, whose volumes are bounded by the crawl
    * batch, not the corpus, at any corpus size.
    *
    * Contract: session-conf toggle — the caller must be the only thread
    * PLANNING queries on this session for the duration (true inside
    * `foreachBatch` bodies, which serialize; the chains' internal write
    * futures plan cached single-task appends where these knobs are
    * irrelevant). */
  def withBatchLocalPlanning[T](
      spark: org.apache.spark.sql.SparkSession)(body: => T): T = {
    val conf = spark.conf
    val aqe = conf.get("spark.sql.adaptive.enabled", "true")
    val sp = conf.get("spark.sql.shuffle.partitions", "200")
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.shuffle.partitions",
      math.max(8, spark.sparkContext.defaultParallelism / 4))
    try body
    finally {
      conf.set("spark.sql.adaptive.enabled", aqe)
      conf.set("spark.sql.shuffle.partitions", sp)
    }
  }
}
