package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over a pair list — the step that turns
  * near-duplicate PAIRS into duplicate CLUSTERS (one representative per
  * cluster is the usual keep-policy in a training-data dedup pass).
  *
  * Algorithm: iterative min-label propagation with pointer jumping
  * (path doubling). Each round does two shuffles:
  *
  *   1. neighbor-min — every node adopts the smallest label in its closed
  *      neighborhood (one `groupBy(node).min(label)` over the symmetric
  *      edge list);
  *   2. pointer jump — every node re-reads the label OF its label
  *      (`labels join labels on lbl = id`), which halves the depth of any
  *      label chain.
  *
  * Step 1 alone converges in O(diameter) rounds (a 1000-link chain of
  * near-dup docs — common in templated web text — would take 1000 shuffles
  * at 100 TB). The jump in step 2 gives the Hash-to-Min style O(log d)
  * bound [Rastogi et al., "Finding Connected Components in Map-Reduce in
  * Logarithmic Rounds", ICDE 2013], so even a pathological million-doc
  * template chain resolves in ~20 rounds. Each round materializes only
  * (id, lbl) pairs — 16 bytes/node — never the documents, and the edge
  * list is materialized once (localCheckpoint) and reused every round.
  */
object Graphs {

  /** Connected components of the undirected graph given by `pairs`
    * (columns `id_a`, `id_b`, both long). Returns one row per node that
    * appears in any pair: (id, component) where `component` is the SMALLEST
    * node id reachable from `id` — deterministic, so a downstream
    * keep-smallest-id dedup policy needs no extra ordering pass.
    *
    * `maxRounds` is a safety bound; with pointer jumping, 32 rounds covers
    * any graph up to diameter 2^32. Convergence is detected by a count of
    * changed labels (metadata-scale driver read, one long per round).
    */
  def connectedComponents(pairs: DataFrame, maxRounds: Int = 32): DataFrame = {
    // localCheckpoint (eager) rather than persist: an iterative plan that
    // only caches still GROWS its logical plan every round, and Catalyst
    // re-analysis of the nested join tree dominates wall-clock long before
    // the data does. Checkpointing truncates lineage to the materialized
    // blocks, so every round optimizes a constant-depth plan.
    val edges = pairs
      .select(col("id_a").cast("long").as("a"), col("id_b").cast("long").as("b"))
      .union(pairs.select(col("id_b").cast("long").as("a"), col("id_a").cast("long").as("b")))
      .localCheckpoint(true)

    var labels = edges.select(col("a").as("id")).distinct()
      .withColumn("lbl", col("id"))
      .localCheckpoint(true)

    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      // 1. closed-neighborhood min: min(own label, labels of all neighbors)
      val nbrMin = edges
        .join(labels.withColumnRenamed("id", "b"), Seq("b"))
        .groupBy(col("a").as("id"))
        .agg(min("lbl").as("nbr_lbl"))
      val stepped = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("lbl"), coalesce(col("nbr_lbl"), col("lbl"))).as("lbl"),
          col("lbl").as("prev"))
      // 2. pointer jump: follow the label one hop (label values are node
      // ids, so the self-join always resolves; coalesce guards roots)
      val jumped = stepped.as("x")
        .join(
          stepped.select(col("id").as("j_id"), col("lbl").as("j_lbl")),
          col("x.lbl") === col("j_id"), "left")
        .select(col("x.id").as("id"),
          coalesce(col("j_lbl"), col("x.lbl")).as("lbl"),
          col("x.prev").as("prev"))
        .localCheckpoint(true)

      val changed = jumped.filter(col("lbl") =!= col("prev")).count()
      labels = jumped.drop("prev")
      converged = changed == 0
      round += 1
    }
    labels
  }
}
