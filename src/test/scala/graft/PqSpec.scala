package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Pq, Similarity}

/** Product-quantization ANN ([[graft.pipeline.Pq]]): code integrity, ADC
  * arithmetic against a hand reconstruction, determinism across
  * partitionings, and retrieval quality against the exact scan. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")
  private lazy val model =
    Pq.fit(emb, col("vec_id"), col("embedding"), dim = 64, m = 8, ksub = 256)

  test("round_vec6 matches transform(round(cast)) exactly, incl. NaN/Inf") {
    import graft.functions.VectorFunctions
    val df = Seq(
      (1L, Seq(1.2345675, -0.0000005, 3.14159265, 0.0)),
      (2L, Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity, 1e-7)))
      .toDF("id", "v")
    val both = df.select(
        VectorFunctions.roundVec6($"v").as("a"),
        transform($"v", x => round(x.cast("double"), 6)).as("b"))
      .as[(Seq[Double], Seq[Double])].collect()
    both.foreach { case (a, b) =>
      a.zip(b).foreach { case (x, y) =>
        assert(java.lang.Double.compare(x, y) === 0, s"$x vs $y") // NaN-safe
      }
    }
  }

  test("fit: m codebooks of ksub centroids of dsub dims, 9-dp means") {
    assert(model.centroids.length === 8)
    assert(model.centroids.forall(_.length === 256))
    assert(model.centroids.forall(_.forall(_.length === 8)))
    // 9-dp rounding contract: scaled values are integral
    assert(model.centroids.flatten.flatten.forall(v =>
      (v * 1e9).round.toDouble / 1e9 == v))
  }

  test("encode: m in-range codes per vector, stable across partitionings") {
    val a = Pq.encode(emb.repartition(1), col("vec_id"), col("embedding"), model)
      .as[(Long, Seq[Int])].collect().sortBy(_._1)
    val b = Pq.encode(emb.repartition(13), col("vec_id"), col("embedding"), model)
      .as[(Long, Seq[Int])].collect().sortBy(_._1)
    assert(a.toSeq === b.toSeq)
    assert(a.forall { case (_, cs) => cs.length == 8 && cs.forall(c => c >= 0 && c < 256) })
    // codes must use the codebook, not collapse to one cell
    assert(a.map(_._2).distinct.length > 100,
      "500 vectors should spread over many code words")
  }

  test("ADC distance equals the hand-computed LUT reconstruction") {
    val codes = Pq.encode(emb, col("vec_id"), col("embedding"), model)
      .as[(Long, Seq[Int])].collect().toMap
    val vecs = emb.select(col("vec_id"),
        transform(col("embedding"), x => round(x.cast("double"), 6)))
      .as[(Long, Seq[Double])].collect().toMap
    val q = vecs(3L)
    val got = Pq.adcTopK(
        emb.filter(col("vec_id") === 3L), col("vec_id"), col("embedding"),
        Pq.encode(emb, col("vec_id"), col("embedding"), model), model, k = 500)
      .as[(Long, Long, Int)].collect()
    // hand ADC for a few neighbors: sum over subspaces of ||q_sub - cen||^2
    def handAdc(id: Long): Double = {
      val cs = codes(id)
      (0 until 8).map { j =>
        val cen = model.centroids(j)(cs(j))
        (0 until 8).map { i =>
          val d = q(j * 8 + i) - cen(i); d * d
        }.sum
      }.sum
    }
    val ranked = got.sortBy(_._3).map(_._2)
    val dists = ranked.map(handAdc)
    assert(dists.zip(dists.tail).forall { case (x, y) => x <= y },
      "rank order must be nondecreasing in the hand-computed ADC distance")
  }

  test("ADC top-5 recalls most of the exact L2 top-5") {
    val queries = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val codes = Pq.encode(emb, col("vec_id"), col("embedding"), model)
    val approx = Pq.adcTopK(emb.filter(col("vec_id") < 20), col("vec_id"),
        col("embedding"), codes, model, k = 5)
      .as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // exact squared-L2 top-5 (the metric PQ approximates)
    val vecs = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
    val exact = vecs.filter(_._1 < 20).map { case (qid, qv) =>
      qid -> vecs.filter(_._1 != qid).map { case (id, v) =>
        id -> qv.zip(v).map { case (a, b) =>
          val d = a.toDouble - b.toDouble; d * d
        }.sum
      }.sortBy { case (id, d) => (d, id) }.take(5).map(_._1).toSet
    }.toMap
    val recall = exact.keys.toSeq.map(q =>
      (approx(q) intersect exact(q)).size.toDouble / 5).sum / exact.size
    // this synthetic corpus is near-isotropic — quantization's worst
    // case (published PQ recall figures come from structured real
    // embeddings). The bar is a strong multiple of chance (5/499 ≈ 0.01
    // per slot), not the structured-data figure.
    assert(recall >= 0.25,
      f"mean recall@5 $recall%.2f too low for 8x256 codes on 64-dim data")
    assert(recall >= 25 * (5.0 / 499),
      f"recall $recall%.2f must beat chance by a wide margin")
  }

  test("ADC projection compiles into a whole-stage codegen span") {
    val codes = Pq.encode(emb, col("vec_id"), col("embedding"), model)
    val top = Pq.adcTopK(emb.filter(col("vec_id") < 3), col("vec_id"),
      col("embedding"), codes, model, k = 5)
    top.collect() // AQE: final stages (and codegen spans) exist only once executed
    val s = top.queryExecution.executedPlan.toString
    // the ADC generate runs INSIDE a codegen span (the "*(n)" marker),
    // fused with the encode projection on the same scan
    assert(s.contains("*(1) Generate posexplode(pq_adc"), s)
    assert(s.contains("round_vec6"), s)
    // no higher-order fallback anywhere on the scan side: rounding,
    // argmin, and the LUT fold are all codegen'd expressions
    assert(!s.contains("transform("), s)
  }
}
