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
}
