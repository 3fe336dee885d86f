package graft

import org.apache.spark.sql.functions._

import graft.pipeline.IvfPq

/** IVF-PQ ANN ([[graft.pipeline.IvfPq]] — coarse cells + residual
  * product quantization): model shapes, encode integrity and
  * determinism, the probed-cells-only scan contract, retrieval quality
  * against the exact L2 scan, and the codegen span. */
class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")
  private lazy val model = IvfPq.fit(
    emb, col("vec_id"), col("embedding"),
    dim = 64, nCells = 16, m = 8, ksub = 16, iters = 2)

  test("fit: coarse 16x64 and residual codebooks 8x16x8, 9-dp means") {
    assert(model.coarse.length === 16)
    assert(model.coarse.forall(_.length === 64))
    assert(model.pq.centroids.length === 8)
    assert(model.pq.centroids.forall(_.length === 16))
    assert(model.pq.centroids.forall(_.forall(_.length === 8)))
    assert((model.coarse.flatten ++ model.pq.centroids.flatten.flatten)
      .forall(v => (v * 1e9).round.toDouble / 1e9 == v))
  }

  test("encode: in-range cell and codes, stable across partitionings") {
    val a = IvfPq.encode(emb.repartition(1), col("vec_id"), col("embedding"), model)
      .as[(Long, Int, Seq[Int])].collect().sortBy(_._1)
    val b = IvfPq.encode(emb.repartition(13), col("vec_id"), col("embedding"), model)
      .as[(Long, Int, Seq[Int])].collect().sortBy(_._1)
    assert(a.toSeq === b.toSeq)
    assert(a.forall { case (_, cell, cs) =>
      cell >= 0 && cell < 16 && cs.length == 8 && cs.forall(c => c >= 0 && c < 16)
    })
    // the corpus must spread over cells, not collapse into one
    assert(a.map(_._2).distinct.length >= 8,
      "500 vectors should occupy most of the 16 cells")
  }

  test("neighbors come ONLY from each query's nProbe nearest cells") {
    val codes = IvfPq.encode(emb, col("vec_id"), col("embedding"), model)
    val cellOf = codes.select("id", "cell").as[(Long, Int)].collect().toMap
    val got = IvfPq.adcTopK(emb.filter(col("vec_id") < 5), col("vec_id"),
        col("embedding"), codes, model, nProbe = 4, k = 25)
      .as[(Long, Long, Int)].collect()
    // recompute each query's probe list the model's way (L2 asc, cell tie)
    val qvs = emb.filter(col("vec_id") < 5)
      .select(col("vec_id"),
        transform(col("embedding"), x => round(x.cast("double"), 6)))
      .as[(Long, Seq[Double])].collect().toMap
    val probed = qvs.map { case (qid, qv) =>
      qid -> model.coarse.zipWithIndex.map { case (c, cid) =>
        (qv.zip(c).map { case (x, y) => val d = x - y; d * d }.sum, cid)
      }.sortBy { case (d, cid) => (d, cid) }.take(4).map(_._2).toSet
    }
    got.foreach { case (qid, id, _) =>
      assert(probed(qid).contains(cellOf(id)),
        s"neighbor $id of query $qid sits in unprobed cell ${cellOf(id)}")
    }
    // and each (query, neighbor) appears exactly once (one cell per id)
    assert(got.map(r => (r._1, r._2)).distinct.length === got.length)
  }

  test("rank order is nondecreasing in the hand-computed residual ADC") {
    val codes = IvfPq.encode(emb, col("vec_id"), col("embedding"), model)
    val codesMap = codes.as[(Long, Int, Seq[Int])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val got = IvfPq.adcTopK(emb.filter(col("vec_id") === 3L), col("vec_id"),
        col("embedding"), codes, model, nProbe = 4, k = 200)
      .as[(Long, Long, Int)].collect()
    val q = emb.filter(col("vec_id") === 3L)
      .select(transform(col("embedding"), x => round(x.cast("double"), 6)))
      .as[Seq[Double]].head()
    def handAdc(id: Long): Double = {
      val (cell, cs) = codesMap(id)
      val cen = model.coarse(cell)
      (0 until 8).map { j =>
        val sub = model.pq.centroids(j)(cs(j))
        (0 until 8).map { i =>
          val off = j * 8 + i
          val d = (q(off) - cen(off)) - sub(i); d * d
        }.sum
      }.sum
    }
    val dists = got.sortBy(_._3).map(r => handAdc(r._2))
    assert(dists.zip(dists.tail).forall { case (x, y) => x <= y },
      "rank order must be nondecreasing in the hand-computed ADC distance")
  }

  test("probed ADC top-5 recalls most of the exact L2 top-5") {
    val codes = IvfPq.encode(emb, col("vec_id"), col("embedding"), model)
    val approx = IvfPq.adcTopK(emb.filter(col("vec_id") < 20), col("vec_id"),
        col("embedding"), codes, model, nProbe = 4, k = 5)
      .as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
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
    // near-isotropic synthetic corpus = quantization's worst case, and
    // the probe prunes 12/16 cells on top; the bar is a strong multiple
    // of chance (5/499 per slot), not a structured-embedding figure
    assert(recall >= 0.2,
      f"mean recall@5 $recall%.2f too low for 4/16-probe 8x16 residual codes")
    assert(recall >= 20 * (5.0 / 499),
      f"recall $recall%.2f must beat chance by a wide margin")
  }

  test("nProbe = nCells degenerates to the full residual-ADC scan") {
    // probing every cell removes the prune; the ranking must equal an
    // exhaustive ADC pass over all codes — the recall-vs-probe dial's
    // upper endpoint
    val codes = IvfPq.encode(emb, col("vec_id"), col("embedding"), model)
    val full = IvfPq.adcTopK(emb.filter(col("vec_id") < 5), col("vec_id"),
        col("embedding"), codes, model, nProbe = 16, k = 10)
      .as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._3))
    val codesMap = codes.as[(Long, Int, Seq[Int])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val qvs = emb.filter(col("vec_id") < 5)
      .select(col("vec_id"),
        transform(col("embedding"), x => round(x.cast("double"), 6)))
      .as[(Long, Seq[Double])].collect()
    // exhaustive hand ADC per query
    val expect = qvs.flatMap { case (qid, q) =>
      codesMap.toSeq.filter(_._1 != qid).map { case (id, (cell, cs)) =>
        val cen = model.coarse(cell)
        val d = (0 until 8).map { j =>
          val sub = model.pq.centroids(j)(cs(j))
          (0 until 8).map { i =>
            val off = j * 8 + i
            val x = (q(off) - cen(off)) - sub(i); x * x
          }.sum
        }.sum
        (qid, id, d)
      }.sortBy { case (_, id, d) => (d, id) }.take(10)
        .zipWithIndex.map { case ((_, id, _), r) => (qid, id, r + 1) }
    }.sortBy(r => (r._1, r._3))
    assert(full.toSeq === expect.toSeq)
  }

  test("distributed serving path equals the driver-LUT path exactly") {
    val codes = IvfPq.encode(emb, col("vec_id"), col("embedding"), model)
    val queries = emb.filter(col("vec_id") < 12)
    val driver = IvfPq.adcTopK(queries, col("vec_id"), col("embedding"),
        codes, model, nProbe = 4, k = 5)
      .as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._3))
    val dist = IvfPq.adcTopKDistributed(queries, col("vec_id"),
        col("embedding"), codes, model, nProbe = 4, k = 5)
      .as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._3))
    assert(dist.toSeq === driver.toSeq)
  }

  test("distributed path probe/LUT/ADC all run inside whole-stage codegen") {
    val codes = IvfPq.encode(emb, col("vec_id"), col("embedding"), model)
    val top = IvfPq.adcTopKDistributed(emb.filter(col("vec_id") < 3),
      col("vec_id"), col("embedding"), codes, model, nProbe = 4, k = 5)
    top.collect()
    val s = top.queryExecution.executedPlan.toString
    assert(s.contains("centroid_topn") && s.contains("ivf_pq_lut")
      && s.contains("pq_adc_pair"), s)
    assert(s.linesIterator.exists(l =>
      l.matches(""".*\*\(\d+\) Project.*pq_adc_pair.*""")),
      "the pair-ADC projection must sit inside a '*(n)' codegen span\n" + s)
  }

  test("cell filter + ADC run inside whole-stage codegen on the codes scan") {
    val codes = IvfPq.encode(emb, col("vec_id"), col("embedding"), model)
    val top = IvfPq.adcTopK(emb.filter(col("vec_id") < 3), col("vec_id"),
      col("embedding"), codes, model, nProbe = 4, k = 5)
    top.collect() // AQE: codegen spans exist only once executed
    val s = top.queryExecution.executedPlan.toString
    assert(s.contains("ivf_pq_adc"), s)
    val gen = s.linesIterator.filter(_.contains("Generate posexplode")).toSeq
    assert(gen.nonEmpty && gen.forall(_.contains("ivf_pq_adc")), s)
    assert(s.linesIterator.exists(l =>
      l.matches(""".*\*\(\d+\) Generate posexplode\(ivf_pq_adc.*""")),
      "the ADC generate must sit inside a '*(n)' codegen span\n" + s)
  }
}
