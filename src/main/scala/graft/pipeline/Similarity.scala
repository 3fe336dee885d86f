package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => V}

/** Approximate-nearest-neighbor search over embedding columns.
  *
  * Three tiers:
  *   - [[bruteForceTopK]] — exact; broadcast the (small) query set against
  *     the corpus, one codegen'd cosine per (query, row), per-query top-k via
  *     window rank. The baseline and the verifier for the approximate tiers.
  *   - [[srpTopK]] — sign-random-projection LSH: corpus and queries hash to
  *     `nBits`-bit buckets; candidates are rows whose bucket is within
  *     hamming distance `probe` of the query's bucket (multi-probe), exact
  *     cosine re-rank within candidates. Equi-join on bucket — scales to
  *     arbitrary corpus size with no cross join.
  *   - [[ivfTopK]] — inverted-file index: corpus is k-means-clustered
  *     (driver-side Lloyd's on a sample — centroid count is metadata-scale),
  *     each row assigned to its nearest centroid; queries probe the
  *     `nProbe` nearest centroids and re-rank exactly within those cells.
  */
object Similarity {

  /** Exact top-k by cosine. `queries` must be broadcast-small.
    * Output: (query_id, neighbor_id, rank, cosine). */
  def bruteForceTopK(
      queries: DataFrame, // (qid, qvec)
      corpus: DataFrame,  // (id, vec)
      k: Int): DataFrame = {
    val scored = corpus
      .join(broadcast(queries))
      .filter(col("qid") =!= col("id")) // a vector is trivially its own NN
      .withColumn("cosine", V.cosine(col("qvec"), col("vec")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id").as("neighbor_id"),
        col("rank").cast("int").as("rank"), round(col("cosine"), 6).as("cosine"))
  }

  /** Hard-negative mining for contrastive training: for each query, the
    * top-k corpus vectors MOST similar by cosine among those with a
    * DIFFERENT label — the highest-value negatives for metric-learning /
    * retriever training (they sit closest to the decision boundary).
    *
    * Same plan shape as [[bruteForceTopK]] (broadcast queries, row-local
    * cosine, per-query window top-k) with the label inequality pushed
    * BEFORE the cosine so mismatched pairs never pay the dot product. At
    * corpus scale, swap the brute candidate set for an ANN tier exactly
    * like search: probe [[srpTopK]]/[[ivfTopK]] for top-M (M ≫ k), then
    * apply the label filter and re-rank — the filter composes with any
    * candidate generator because it is a pure pair predicate. */
  def hardNegatives(
      queries: DataFrame, // (qid, qvec, qlabel)
      corpus: DataFrame,  // (id, vec, label)
      k: Int): DataFrame = {
    val scored = corpus
      .join(broadcast(queries))
      .filter(col("qlabel") =!= col("label") && col("qid") =!= col("id"))
      .withColumn("cosine", V.cosine(col("qvec"), col("vec")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id").as("neg_id"),
        col("rank").cast("int").as("rank"), round(col("cosine"), 6).as("cosine"))
  }

  /** SRP-LSH approximate top-k with multi-probe.
    * Recall rises with `probe` (hamming radius over bucket bits). */
  def srpTopK(
      queries: DataFrame, // (qid, qvec)
      corpus: DataFrame,  // (id, vec)
      k: Int,
      nBits: Int = 8,
      probe: Int = 1): DataFrame = {
    val bucketed = corpus.withColumn("bucket", V.srpBucket(col("vec"), nBits))
    // expand each query to all buckets within hamming radius `probe`
    val perturbations: Seq[Long] = {
      val singles = (0 until nBits).map(b => 1L << b)
      val base = Seq(0L)
      probe match {
        case 0 => base
        case 1 => base ++ singles
        case _ => base ++ singles ++ (for {
          i <- 0 until nBits; j <- (i + 1) until nBits
        } yield (1L << i) | (1L << j))
      }
    }
    val probes = queries
      .withColumn("qbucket", V.srpBucket(col("qvec"), nBits))
      .withColumn("flip", explode(array(perturbations.map(lit): _*)))
      .withColumn("bucket", col("qbucket").bitwiseXOR(col("flip")))
      .select("qid", "qvec", "bucket")
    val candidates = bucketed.join(broadcast(probes), Seq("bucket"))
      .filter(col("qid") =!= col("id"))
      .dropDuplicates("qid", "id")
      .withColumn("cosine", V.cosine(col("qvec"), col("vec")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("id"))
    candidates.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id").as("neighbor_id"),
        col("rank").cast("int").as("rank"), round(col("cosine"), 6).as("cosine"))
  }

  /** IVF approximate top-k: cluster on a sample, probe nearest cells.
    * Trains per call; [[IvfIndex]] persists the same centroids + cell
    * assignment on disk so the (expensive) build amortizes across queries
    * — its results are identical by construction for equal parameters. */
  def ivfTopK(
      queries: DataFrame, // (qid, qvec)
      corpus: DataFrame,  // (id, vec)
      k: Int,
      nCells: Int = 16,
      nProbe: Int = 2,
      sampleSize: Int = 2000,
      iterations: Int = 5): DataFrame = {
    val centroidDf = trainCentroidsDf(corpus, nCells, sampleSize, iterations)
    val assigned = assignCells(corpus, centroidDf)
    val probes = probeCells(queries, centroidDf, nProbe)
    val candidates = assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("qid") =!= col("id"))
      .withColumn("cosine", V.cosine(col("qvec"), col("vec")))
    rerank(candidates, k)
  }

  /** Train IVF centroids driver-side on a bounded sample (metadata-scale).
    * orderBy+limit compiles to TakeOrderedAndProject (per-partition top-k,
    * driver merge — no full sort), and pins the sample: a bare limit()
    * takes whatever partitions answer first, so centroids (and the whole
    * ANN output) would vary run to run. Deterministic for fixed input +
    * parameters. Returns (cell int, cvec array<float>). */
  private[pipeline] def trainCentroidsDf(
      corpus: DataFrame, // (id, vec)
      nCells: Int,
      sampleSize: Int,
      iterations: Int): DataFrame = {
    val spark = corpus.sparkSession
    val sample = corpus.select("id", "vec").orderBy("id").limit(sampleSize)
      .collect().map(_.getSeq[Float](1).toArray.map(_.toDouble))
    require(sample.nonEmpty, "empty corpus")
    val dim = sample.head.length
    var centroids = sample.take(nCells).map(_.clone())
    for (_ <- 0 until iterations) {
      val sums = Array.fill(centroids.length)(new Array[Double](dim))
      val counts = new Array[Long](centroids.length)
      sample.foreach { v =>
        val c = nearest(centroids, v)
        var i = 0
        while (i < dim) { sums(c)(i) += v(i); i += 1 }
        counts(c) += 1
      }
      centroids = centroids.indices.map { c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(_ / counts(c))
      }.toArray
    }
    spark.createDataFrame(
      centroids.toIndexedSeq.zipWithIndex.map { case (v, i) =>
        (i, v.map(_.toFloat).toSeq) }
    ).toDF("cell", "cvec")
  }

  /** Assign each corpus row to its nearest cell (broadcast centroids),
    * keeping the winning cosine. Returns (id, vec, cell, cdist). */
  private[pipeline] def assignCellsWithDist(
      corpus: DataFrame, centroidDf: DataFrame): DataFrame = {
    val wAssign = Window.partitionBy(col("id")).orderBy(col("cdist").desc, col("cell"))
    corpus.join(broadcast(centroidDf))
      .withColumn("cdist", V.cosine(col("vec"), col("cvec")))
      .withColumn("crank", row_number().over(wAssign))
      .filter(col("crank") === 1)
      .select("id", "vec", "cell", "cdist")
  }

  /** Assign each corpus row to its nearest cell (broadcast centroids).
    * Returns (id, vec, cell). */
  private[pipeline] def assignCells(
      corpus: DataFrame, centroidDf: DataFrame): DataFrame =
    assignCellsWithDist(corpus, centroidDf).select("id", "vec", "cell")

  /** Each query's `nProbe` nearest cells. Returns (qid, qvec, cell). */
  private[pipeline] def probeCells(
      queries: DataFrame, centroidDf: DataFrame, nProbe: Int): DataFrame = {
    val wProbe = Window.partitionBy(col("qid")).orderBy(col("cdist").desc, col("cell"))
    queries.join(broadcast(centroidDf))
      .withColumn("cdist", V.cosine(col("qvec"), col("cvec")))
      .withColumn("crank", row_number().over(wProbe))
      .filter(col("crank") <= nProbe)
      .select("qid", "qvec", "cell")
  }

  /** Exact cosine re-rank of candidate (qid, id, cosine) rows to top-k. */
  private[pipeline] def rerank(candidates: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("id"))
    candidates.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id").as("neighbor_id"),
        col("rank").cast("int").as("rank"), round(col("cosine"), 6).as("cosine"))
  }

  /** Symmetric int8 quantization with a per-vector max-abs scale — the
    * memory-bandwidth lever for ANN at corpus scale (4 bytes/dim → 1). The
    * mapping is `q = round(x / maxabs(v) * 127)` (zero vectors quantize to
    * zeros), fully deterministic: max is aggregation-order-insensitive and
    * the divide/multiply/round pipeline is fixed-order IEEE, so the result
    * is exactly SQL-checkable. Output is EXPLODED to integer rows
    * (`vec_id`, `pos` 0-based, `q`) — integers hash-compare across engines;
    * float payloads don't (same trick as ann_brute's rank-only output).
    */
  def quantizeInt8(df: DataFrame, id: Column, vec: Column): DataFrame = {
    val e = df.select(
      id.as("vec_id"),
      transform(vec, x => x.cast("double")).as("v"))
    e.withColumn("scale",
        aggregate(col("v"), lit(0.0), (a, x) => greatest(a, abs(x))))
      .select(col("vec_id"), col("scale"), posexplode(col("v")).as(Seq("pos", "x")))
      .select(
        col("vec_id"),
        col("pos").cast("int").as("pos"),
        when(col("scale") === 0.0, lit(0))
          .otherwise(round(col("x") / col("scale") * 127).cast("int"))
          .as("q"))
  }

  private def nearest(cs: Array[Array[Double]], v: Array[Double]): Int = {
    var best = 0; var bestSim = Double.MinValue
    var c = 0
    while (c < cs.length) {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < v.length) {
        dot += cs(c)(i) * v(i); na += cs(c)(i) * cs(c)(i); nb += v(i) * v(i)
        i += 1
      }
      val sim = if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
      if (sim > bestSim) { bestSim = sim; best = c }
      c += 1
    }
    best
  }
}
