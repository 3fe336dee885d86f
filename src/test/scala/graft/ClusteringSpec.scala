package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Clustering

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private def blob(center: Seq[Double], n: Int, idBase: Long): Seq[(Long, Seq[Float])] =
    (0 until n).map { i =>
      // deterministic "noise": small per-index offsets around the center
      val v = center.zipWithIndex.map { case (c, d) =>
        (c + 0.01 * ((i * 7 + d * 3) % 5 - 2)).toFloat
      }
      (idBase + i, v)
    }

  test("kmeans separates well-separated blobs; assignment is deterministic") {
    val pts = blob(Seq(0.0, 0.0, 0.0), 20, 0) ++
      blob(Seq(10.0, 10.0, 0.0), 20, 100) ++
      blob(Seq(-10.0, 5.0, 8.0), 20, 200)
    val df = pts.toDF("vec_id", "embedding")
    val out = Clustering.kmeans(df, col("vec_id"), col("embedding"), k = 3, iters = 4)
      .as[(Long, Int)].collect().toMap
    // every blob lands in ONE cluster, and the three clusters are distinct
    val c0 = (0L until 20L).map(out).toSet
    val c1 = (100L until 120L).map(out).toSet
    val c2 = (200L until 220L).map(out).toSet
    assert(c0.size === 1 && c1.size === 1 && c2.size === 1, "blobs stay whole")
    assert(Set(c0.head, c1.head, c2.head).size === 3, "blobs get distinct clusters")
    // bit-determinism: a second run reproduces the assignment exactly
    val again = Clustering.kmeans(df, col("vec_id"), col("embedding"), k = 3, iters = 4)
      .as[(Long, Int)].collect().toMap
    assert(again === out)
  }

  test("distributed kmeans equals sequential Lloyd's bit-for-bit on real embeddings") {
    // (the table's labels are random, not geometric — purity is ~1/k for ANY
    // clustering — so the correctness bar is exact agreement with a
    // sequential reference implementing the same determinism rules)
    def r(x: Double, scale: Int): Double =
      java.math.BigDecimal.valueOf(x).setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val data = emb.select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect().sortBy(_._1)
      .map { case (id, v) => id -> v.map(x => r(x.toDouble, 6)).toArray }
    val k = 10
    var cs = data.take(k).map(_._2.clone())
    def nearest(v: Array[Double]): Int = {
      val ds = cs.map { c =>
        var s = 0.0; var i = 0
        while (i < v.length) { val d = v(i) - c(i); s += d * d; i += 1 }
        s
      }
      ds.indexOf(ds.min) // first minimum = lowest cluster id
    }
    for (_ <- 1 to 2) {
      val byC = data.groupBy { case (_, v) => nearest(v) }
      cs = cs.zipWithIndex.map { case (prev, cid) =>
        byC.get(cid).map { members =>
          val dim = prev.length
          Array.tabulate(dim) { d =>
            // exact decimal sum of 6-dp values, then one double division
            val sum = members.map(m => java.math.BigDecimal.valueOf(m._2(d)))
              .reduce(_.add(_))
            r(sum.doubleValue() / members.length, 9)
          }
        }.getOrElse(prev)
      }
    }
    val expected = data.map { case (id, v) => id -> nearest(v) }.toMap
    val got = Clustering.kmeans(emb, col("vec_id"), col("embedding"), k, iters = 2)
      .as[(Long, Int)].collect().toMap
    assert(got === expected, "distributed assignment must equal the sequential truth")
  }

  test("empty clusters keep their previous centroid (k > natural clusters)") {
    // two tight blobs, k=4: at least one centroid goes empty on iteration 1
    val pts = blob(Seq(0.0, 0.0, 0.0), 10, 0) ++ blob(Seq(50.0, 0.0, 0.0), 10, 100)
    val df = pts.toDF("vec_id", "embedding")
    val out = Clustering.kmeans(df, col("vec_id"), col("embedding"), k = 4, iters = 3)
      .as[(Long, Int)].collect()
    assert(out.length === 20, "every vector still gets an assignment")
    assert(out.map(_._2).toSet.subsetOf(Set(0, 1, 2, 3)))
  }

  test("assignment plan is join-free codegen (centroid table rides as a plan reference)") {
    // parquet-backed so ConvertToLocalRelation cannot pre-evaluate the plan
    val dir = tmpDir("argmin-plan")
    blob(Seq(0.0, 0.0, 0.0), 10, 0).toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/pts")
    val df = spark.read.parquet(s"$dir/pts")
    val out = Clustering.kmeans(df, col("vec_id"), col("embedding"), k = 2, iters = 1)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"assignment must not join:\n$plan")
    assert(!plan.contains("Exchange"), s"assignment must not shuffle:\n$plan")
    assert(plan.contains("centroid_argmin"), s"fused argmin expression:\n$plan")
  }

  test("fused argmin ≡ the k-literal distance tree, including tie-to-lowest") {
    // centroids with an exact tie for one point: first minimum must win
    val cs = Seq(Seq(0.0, 0.0), Seq(2.0, 0.0), Seq(1.0, 5.0))
    val pts = Seq(
      (0L, Seq(1.0f, 0.0f)),   // equidistant to centroids 0 and 1 → 0
      (1L, Seq(0.1f, 0.0f)),
      (2L, Seq(1.9f, 0.1f)),
      (3L, Seq(1.0f, 4.0f)))
    val df = pts.toDF("vec_id", "embedding")
    def run(decl: Boolean) = Clustering
      .assignOn(df, col("vec_id"), col("embedding"), cs, declarative = decl)
      .select("vec_id", "cluster").as[(Long, Int)].collect().toMap
    val fused = run(false)
    assert(fused == run(true))
    assert(fused(0L) == 0, "exact tie breaks to the lowest cluster id")
  }
}
