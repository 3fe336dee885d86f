package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF-PQ: inverted-file coarse quantization composed with product
  * quantization over RESIDUALS — the IVFADC scheme of [Jégou, Douze &
  * Schmid, TPAMI 2011, §IV], the layout behind billion-vector FAISS
  * indexes. The coarse quantizer routes each vector to one of `nCells`
  * cells; PQ codes the residual `v − cell_centroid` (much lower variance
  * than the raw vector, so the same code budget quantizes far finer);
  * a query probes only its `nProbe` nearest cells and ADC-scans the
  * CODES of those cells alone.
  *
  * Why this is the trillion-vector shape: [[Pq]] already shrinks
  * storage 32× but still scans every code; [[graft.pipeline.IvfIndex]]
  * prunes the scan but re-ranks raw vectors. IVF-PQ does both — the
  * scan touches `nProbe/nCells` of the corpus and reads 8-byte codes,
  * never vectors. Persisted with `partitionBy(cell)` the probe is a
  * partition-directory prune, identical to [[IvfIndex]]'s layout.
  *
  * Determinism/oracle contract ([[graft.queries.IvfPqSql]] replays the
  * whole chain in ONE statement):
  *   - coarse codebook = [[Clustering.kmeansCentroids]] over the full
  *     vector (6-dp inputs, DECIMAL-exact means rounded 9 dp,
  *     first-minimum argmin, empty-cell carry-over);
  *   - residuals are raw IEEE subtractions of identical doubles on both
  *     engines, then 6-dp-rounded before every PQ step (the k-means
  *     float contract, [[graft.functions.VectorFunctions.roundVec6]]);
  *   - per-subspace codebooks = the [[Pq]] fit over residual slices;
  *   - query LUTs fold element-ascending against UNROUNDED query
  *     residuals (both engines subtract and square the same doubles);
  *   - ranks order by the raw IEEE ADC distance, id tie-break.
  */
object IvfPq {

  /** A fitted IVF-PQ model: `coarse(cell)` the full-dim cell centroids,
    * `pq` the residual-space product quantizer. */
  final case class Model(
      dim: Int,
      nCells: Int,
      coarse: IndexedSeq[IndexedSeq[Double]],
      pq: Pq.Model) {
    require(coarse.length == nCells, s"coarse size ${coarse.length} != $nCells")
  }

  private def rounded(vec: Column): Column =
    graft.functions.VectorFunctions.roundVec6(vec)

  /** Coarse cell of a (6-dp-rounded) vector — first-minimum squared-L2
    * argmin over the coarse table, codegen'd. */
  private def cellOf(v: Column, model: Model): Column =
    graft.functions.VectorFunctions.centroidArgmin(v, model.coarse)

  /** Fit coarse codebook, then per-subspace residual codebooks. The
    * corpus is scanned (`1 + m·(iters+1)` metadata-scale driver jobs),
    * never shuffled. */
  def fit(
      df: DataFrame,
      id: Column,
      vec: Column,
      dim: Int,
      nCells: Int,
      m: Int,
      ksub: Int = 16,
      iters: Int = 2): Model = {
    val coarse = Clustering
      .kmeansCentroids(df, id, vec, nCells, iters)
      .map(_.toIndexedSeq).toIndexedSeq
    val pre = Model(dim, nCells, coarse, Pq.Model(dim, m, ksub,
      IndexedSeq.fill(m)(IndexedSeq.empty))) // coarse-only, for cellOf
    val v = rounded(vec)
    val res = df.select(
      id.cast("long").as("id"),
      rounded(graft.functions.VectorFunctions.centroidResidual(
        v, cellOf(v, pre), coarse)).as("res"))
    val pq = Pq.fit(res, col("id"), col("res"), dim, m, ksub, iters)
    Model(dim, nCells, coarse, pq)
  }

  /** Encode to (id, cell, codes): one row-local pass — coarse argmin,
    * residual, per-subspace argmin, all inside one codegen span. */
  def encode(df: DataFrame, id: Column, vec: Column, model: Model): DataFrame = {
    val v = rounded(vec)
    val cell = cellOf(v, model)
    val res = rounded(graft.functions.VectorFunctions.centroidResidual(
      v, cell, model.coarse))
    val codes = array((0 until model.pq.m).map { j =>
      graft.functions.VectorFunctions.centroidArgmin(
        slice(res, j * model.pq.dsub + 1, model.pq.dsub), model.pq.centroids(j))
    }: _*)
    df.select(id.cast("long").as("id"), cell.as("cell"), codes.as("codes"))
  }

  /** [[adcTopK]] with the QUERY SIDE distributed — for query sets too
    * large to collect (batch ANN serving: millions of queries against
    * billions of codes). No driver round-trip at all: each query row
    * derives its own probe list (`centroid_topn`), explodes to
    * (qid, cell, lut) with the per-cell residual LUT computed
    * row-locally (`ivf_pq_lut` — both codebooks ride as ONE plan
    * reference), joins the codes on `cell` (broadcast when the probe
    * side is small, hash-join co-located with cell-bucketed codes when
    * it is not — Catalyst/AQE picks), folds the pair ADC
    * (`pq_adc_pair`), and ranks per query. The arithmetic is the
    * driver path's exactly (spec-asserted equal), so it shares the
    * oracle. */
  def adcTopKDistributed(
      queries: DataFrame,
      qid: Column,
      qvec: Column,
      codes: DataFrame,
      model: Model,
      nProbe: Int,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val V = graft.functions.VectorFunctions
    val P = graft.functions.PqFunctions
    val probed = queries
      .select(qid.cast("long").as("qid"), rounded(qvec).as("qv"))
      .withColumn("cell",
        explode(V.centroidTopN(col("qv"), model.coarse, nProbe)))
      .withColumn("lut",
        P.ivfPqLut(col("qv"), col("cell"), model.coarse, model.pq.centroids))
      .select("qid", "cell", "lut")
    probed.join(codes, Seq("cell"))
      .filter(col("qid") =!= col("id"))
      .withColumn("adc",
        P.pqAdcPair(col("lut"), col("codes"), model.pq.ksub))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("adc").asc, col("id").asc)))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id").as("neighbor_id"),
        col("rank").cast("int").as("rank"))
  }

  /** ADC top-k over probed cells only. Per query: the `nProbe` nearest
    * coarse cells (squared-L2 ascending, cell-id tie-break), one flat
    * residual LUT per probed cell — |q|·nProbe·m·ksub doubles on the
    * driver, riding the scan as ONE plan reference object. The scan
    * filters to the union of probed cells BEFORE the ADC projection
    * (partition prune when codes are cell-partitioned), reads codes
    * only, and stays in whole-stage codegen. Output: (qid, neighbor_id,
    * rank), self-matches excluded, raw-IEEE-distance order with id
    * tie-break. */
  def adcTopK(
      queries: DataFrame,
      qid: Column,
      qvec: Column,
      codes: DataFrame,
      model: Model,
      nProbe: Int,
      k: Int): DataFrame = {
    val spark = codes.sparkSession
    val qs = queries
      .select(qid.cast("long").as("qid"), rounded(qvec).as("qv"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    require(qs.forall(_._2.length == model.dim),
      s"query dim must be ${model.dim}")
    val (m, ksub, dsub) = (model.pq.m, model.pq.ksub, model.pq.dsub)
    // per query: nProbe nearest cells (L2 asc, cell tie-break), then a
    // flat LUT against the query's residual in each probed cell
    val lutByCell: IndexedSeq[IndexedSeq[IndexedSeq[Double]]] = qs.map {
      case (_, qv) =>
        val cellDist = model.coarse.zipWithIndex.map { case (cen, c) =>
          var s = 0.0
          var i = 0
          while (i < model.dim) {
            val d = qv(i) - cen(i); s += d * d; i += 1
          }
          (s, c)
        }
        val probed = cellDist.sortBy { case (s, c) => (s, c) }.take(nProbe)
          .map(_._2).toSet
        (0 until model.nCells).map { cell =>
          if (!probed(cell)) IndexedSeq.empty[Double]
          else {
            val cen = model.coarse(cell)
            val flat = new Array[Double](m * ksub)
            var j = 0
            while (j < m) {
              var c = 0
              while (c < ksub) {
                val sub = model.pq.centroids(j)(c)
                var s = 0.0
                var i = 0
                while (i < dsub) {
                  val off = j * dsub + i
                  val d = (qv(off) - cen(off)) - sub(i)
                  s += d * d
                  i += 1
                }
                flat(j * ksub + c) = s
                c += 1
              }
              j += 1
            }
            flat.toIndexedSeq
          }
        }
    }.toIndexedSeq
    val probedUnion = lutByCell.flatMap(_.zipWithIndex.collect {
      case (l, cell) if l.nonEmpty => cell
    }).distinct.sorted
    val qids = qs.map(_._1)
    val adc = graft.functions.PqFunctions.ivfPqAdc(
      col("codes"), col("cell"), ksub, lutByCell)
    import org.apache.spark.sql.expressions.Window
    codes
      .filter(col("cell").isin(probedUnion: _*))
      .select(col("id"), posexplode(adc).as(Seq("qpos", "adc")))
      .filter(col("adc").isNotNull)
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
