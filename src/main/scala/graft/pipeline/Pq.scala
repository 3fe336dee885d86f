package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product quantization for memory-bounded similarity search [Jégou,
  * Douze & Schmid, "Product Quantization for Nearest Neighbor Search",
  * TPAMI 2011] — the ANN tier between the exact scan
  * ([[Similarity.bruteForceTopK]]) and the candidate-pruning indexes
  * (SRP buckets, IVF cells): compress each vector to `m` subspace
  * codebook ids, then answer top-k with an asymmetric distance
  * computation (ADC) — per-query lookup tables against the CODES, never
  * the vectors.
  *
  * Why this is the 100 TB shape: a 64-dim float corpus costs 256 B/vec;
  * the m=8 × 16-centroid code costs 8 B/vec (4 B packed) — the codes of
  * a trillion-vector corpus fit where the raw vectors never will, and
  * the ADC scan reads ONLY codes (one codegen'd expression per row, LUTs
  * as a plan reference object, no shuffle, no join). Fitting touches
  * vectors once per subspace (sampled in practice); encoding is one
  * row-local pass.
  *
  * Determinism/oracle contract: each subspace codebook is
  * [[Clustering.kmeansCentroids]] (6-dp inputs, DECIMAL-exact means,
  * first-minimum argmin) over the vector SLICE — so the whole fit +
  * encode + ADC chain replays bit-for-bit in SQL ([[graft.queries.PqSql]]).
  */
object Pq {

  /** A fitted PQ codebook: `centroids(j)(c)` is the `dsub`-dim centroid
    * `c` of subspace `j` (9-dp-rounded kmeans means — the exact doubles
    * the oracle's replay produces). */
  final case class Model(
      dim: Int,
      m: Int,
      ksub: Int,
      centroids: IndexedSeq[IndexedSeq[IndexedSeq[Double]]]) {
    require(dim % m == 0, s"dim $dim must split into $m subspaces")
    val dsub: Int = dim / m
  }

  /** The 6-dp-rounded double vector every PQ step sees (the k-means
    * float contract) — the codegen'd expression form: `transform` is a
    * CodegenFallback higher-order function, and encode is the
    * corpus-scale hot path. */
  private def rounded(vec: Column): Column =
    graft.functions.VectorFunctions.roundVec6(vec)

  /** Fit per-subspace codebooks: `ksub`-means over each `dsub`-dim slice
    * ([[Clustering.kmeansCentroids]] — deterministic init = first `ksub`
    * rows by id). `m` × (`iters`+1) metadata-scale driver jobs; the
    * corpus is scanned, never shuffled. */
  def fit(
      df: DataFrame,
      id: Column,
      vec: Column,
      dim: Int,
      m: Int,
      ksub: Int = 16,
      iters: Int = 2): Model = {
    require(dim % m == 0, s"dim $dim must split into $m subspaces")
    val dsub = dim / m
    val centroids = (0 until m).map { j =>
      Clustering.kmeansCentroids(
          df, id, slice(vec, j * dsub + 1, dsub), ksub, iters)
        .map(_.toIndexedSeq).toIndexedSeq
    }
    Model(dim, m, ksub, centroids)
  }

  /** Encode vectors to their PQ codes: (id, codes array<int> of length
    * `m`), one row-local pass (per-subspace first-minimum argmin via the
    * codegen'd centroid table — [[graft.functions.VectorFunctions
    * .centroidArgmin]]). */
  def encode(df: DataFrame, id: Column, vec: Column, model: Model): DataFrame = {
    val v = rounded(vec)
    val codes = array((0 until model.m).map { j =>
      graft.functions.VectorFunctions.centroidArgmin(
        slice(v, j * model.dsub + 1, model.dsub), model.centroids(j))
    }: _*)
    df.select(id.cast("long").as("id"), codes.as("codes"))
  }

  /** ADC top-k: for each (small) query set row, the `k` code rows with
    * the lowest asymmetric distance Σ_j lut(q)(j)(code_j), where
    * lut(q)(j)(c) = ‖q_sub(j) − centroid(j)(c)‖². The LUTs are computed
    * once on the driver (|q|·m·ksub doubles — metadata-scale) and ride
    * the scan as ONE plan reference object; the per-row work is `m`
    * array lookups and adds, whole-stage codegen intact. Output:
    * (qid, neighbor_id, rank), self-matches excluded, ties on the raw
    * IEEE distance break to the lower id (the ann_brute convention —
    * both engines fold element order, so the doubles agree exactly). */
  def adcTopK(
      queries: DataFrame,
      qid: Column,
      qvec: Column,
      codes: DataFrame,
      model: Model,
      k: Int): DataFrame = {
    val spark = codes.sparkSession
    val qs = queries
      .select(qid.cast("long").as("qid"), rounded(qvec).as("qv"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    require(qs.forall(_._2.length == model.dim),
      s"query dim must be ${model.dim}")
    // luts(q) is flat m*ksub: entry j*ksub + c, element-order fold
    val luts: Array[Array[Double]] = qs.map { case (_, qv) =>
      val flat = new Array[Double](model.m * model.ksub)
      var j = 0
      while (j < model.m) {
        var c = 0
        while (c < model.ksub) {
          val cen = model.centroids(j)(c)
          var s = 0.0
          var i = 0
          while (i < model.dsub) {
            val d = qv(j * model.dsub + i) - cen(i)
            s += d * d
            i += 1
          }
          flat(j * model.ksub + c) = s
          c += 1
        }
        j += 1
      }
      flat
    }
    val qids = qs.map(_._1)
    val adc = graft.functions.PqFunctions.pqAdc(col("codes"), model.ksub, luts)
    import org.apache.spark.sql.expressions.Window
    codes
      .select(col("id"), posexplode(adc).as(Seq("qpos", "adc")))
      .join(broadcast(spark.createDataFrame(
          qids.zipWithIndex.map { case (q, p) => (p, q) }.toIndexedSeq)
        .toDF("qpos", "qid")), Seq("qpos"))
      .filter(col("qid") =!= col("id"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("adc").asc, col("id").asc)))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id").as("neighbor_id"),
        col("rank").cast("int").as("rank"))
  }
}
