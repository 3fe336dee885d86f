package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus clustering over an embedding column — the curation op behind
  * topic balancing, domain mixing, and cluster-based dedup/filtering in
  * training-data pipelines.
  *
  * Lloyd's k-means, Spark-shaped for 100 TB:
  *
  *   - ASSIGNMENT is a pure codegen'd expression: the k centroids are plan
  *     literals (k × dim doubles), so each row computes k squared-L2
  *     distances and an argmin with no join, no shuffle, no UDF;
  *   - UPDATE is `posexplode` + partial-aggregated `groupBy(cluster, pos)`
  *     mean — the shuffle carries k × dim × tasks partial rows (KBs),
  *     never data-scale;
  *   - the DRIVER holds k × dim doubles per iteration, nothing else.
  *
  * Every step is bit-deterministic so the whole algorithm is exactly
  * SQL-checkable (the `kmeans_clusters` oracle unrolls the same iterations
  * in DuckDB):
  *
  *   - init: the k lowest-id vectors (no RNG);
  *   - inputs rounded to 6 dp — a 6-dp double casts to DECIMAL(28,12)
  *     exactly, so the mean's sum is EXACT decimal arithmetic and
  *     aggregation ORDER cannot perturb bits (same trick as
  *     `pipeline_clean`'s average);
  *   - means rounded to 9 dp; distance folds run in fixed element order;
  *   - argmin ties break to the lowest cluster id.
  */
object Clustering {

  /** Cluster `vec` (array<float/double>) into k groups; returns
    * (`vec_id`, `cluster`) after exactly `iters` Lloyd iterations.
    * Empty clusters keep their previous centroid. */
  def kmeans(
      df: DataFrame,
      id: Column,
      vec: Column,
      k: Int,
      iters: Int): DataFrame = {
    val e = rounded(df, id, vec)
    assign(e, fitCentroids(e, k, iters)).select(col("vec_id"), col("cluster"))
  }

  /** The fitted centroid table alone — for callers (SemDeDup) that want
    * to fold the final assignment into their OWN projection over the
    * vectors instead of paying a corpus-scale join against [[kmeans]]'s
    * output. Runs `iters` + 1 driver-collect jobs (k × dim doubles each,
    * metadata-scale). */
  def kmeansCentroids(
      df: DataFrame,
      id: Column,
      vec: Column,
      k: Int,
      iters: Int): Seq[Seq[Double]] =
    fitCentroids(rounded(df, id, vec), k, iters)

  /** The 6-dp-rounded (vec_id, v) projection every k-means step sees. */
  private def rounded(df: DataFrame, id: Column, vec: Column): DataFrame =
    df.select(
      id.as("vec_id"),
      transform(vec, x => round(x.cast("double"), 6)).as("v"))

  private def fitCentroids(e: DataFrame, k: Int, iters: Int): Seq[Seq[Double]] = {
    require(k > 0 && iters >= 0, s"k=$k iters=$iters")
    var centroids: Seq[Seq[Double]] = e.orderBy("vec_id").limit(k)
      .select("v").collect().map(_.getSeq[Double](0).toSeq).toSeq
    require(centroids.size == k, s"need at least $k vectors, got ${centroids.size}")
    for (_ <- 1 to iters) {
      val means = assign(e, centroids)
        .select(col("cluster"), posexplode(col("v")))
        .groupBy("cluster", "pos")
        .agg(round(
          sum(col("col").cast("decimal(28,12)")).cast("double") / count(lit(1)),
          9).as("m"))
        .collect()
      val byCluster = means.groupBy(_.getInt(0))
      centroids = centroids.zipWithIndex.map { case (prev, cid) =>
        byCluster.get(cid)
          .map(_.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq)
          .getOrElse(prev) // empty cluster: centroid carries over
      }
    }
    centroids
  }

  /** Nearest-centroid assignment: ONE codegen'd argmin expression with the
    * k×dim centroid table as a plan reference object
    * ([[graft.functions.VectorFunctions.centroidArgmin]]). Bit-identical
    * to the literal-tree spelling (spec-pinned) but with O(1) plan size in
    * k — at SemDeDup's k ∝ corpus discipline (k in the hundreds), the
    * literal tree spent MINUTES of single-threaded driver time in
    * analysis/optimization per iteration while the data work took
    * seconds. */
  private def assign(e: DataFrame, cs: Seq[Seq[Double]]): DataFrame =
    e.withColumn("cluster",
      graft.functions.VectorFunctions.centroidArgmin(col("v"), cs))

  /** [[assign]] spelled as the k-literal distance tree — kept for the
    * equivalence spec only (plan size linear in k, CodegenFallback). */
  private[graft] def assignDeclarative(
      e: DataFrame, cs: Seq[Seq[Double]]): DataFrame = {
    val dists = array(cs.map { c =>
      aggregate(
        zip_with(col("v"), typedlit(c), (a, b) => (a - b) * (a - b)),
        lit(0.0),
        (acc, x) => acc + x)
    }: _*)
    e.withColumn("__d", dists)
      .withColumn("cluster",
        (array_position(col("__d"), array_min(col("__d"))) - 1).cast("int"))
      .drop("__d")
  }

  /** Expose one assignment pass over (vec_id, v) for spec use. */
  private[graft] def assignOn(
      df: DataFrame, id: Column, vec: Column,
      cs: Seq[Seq[Double]], declarative: Boolean): DataFrame = {
    val e = df.select(
      id.as("vec_id"),
      transform(vec, x => round(x.cast("double"), 6)).as("v"))
    if (declarative) assignDeclarative(e, cs) else assign(e, cs)
  }
}
