package graft

import org.scalacheck.{Gen, Prop}

/** Distributed primitives checked against local reference implementations
  * over random inputs: connected components vs union-find, sorted-merge
  * jaccard vs the hash-set form. */
class GraphPropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(prop: Prop, minTests: Int): Unit = {
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(minTests), prop)
    assert(result.passed, result.status.toString)
  }

  /** Path-compressing union-find — the single-machine ground truth. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private val genEdges: Gen[Seq[(Long, Long)]] =
    for {
      n <- Gen.chooseNum(2, 40) // node universe
      m <- Gen.chooseNum(1, 60) // edge count
      edges <- Gen.listOfN(m, for {
        a <- Gen.chooseNum(0L, n.toLong)
        b <- Gen.chooseNum(0L, n.toLong) if b != a
      } yield (a, b))
    } yield edges

  test("connected components match union-find on random graphs (all tiers)") {
    // few Spark rounds per case — 30 random graphs, each vs local truth;
    // cutoff 0 forces the full distributed tier (contraction + label
    // loop), the default takes the driver-side union-find gate, and a
    // cutoff the RAW list blows exercises the middle tier: contract,
    // re-check the gate, and finish driver-side or loop depending on how
    // far the stars shrank — ALL must equal the reference
    check(Prop.forAll(genEdges) { edges =>
      val df = edges.toDF("id_a", "id_b")
      val truth = unionFind(edges)
      val dist = graft.pipeline.Graphs
        .connectedComponents(df, localEdgeCutoff = 0)
        .as[(Long, Long)].collect().toMap
      val local = graft.pipeline.Graphs
        .connectedComponents(df)
        .as[(Long, Long)].collect().toMap
      val mid = graft.pipeline.Graphs
        .connectedComponents(df, localEdgeCutoff = 10)
        .as[(Long, Long)].collect().toMap
      dist == truth && local == truth && mid == truth
    }, minTests = 30)
  }

  test("sorted-merge jaccard equals hash-set jaccard on random string sets") {
    val genSet: Gen[Seq[String]] =
      Gen.chooseNum(0, 30).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf("abcdefgh".map(_.toString))).map(_.distinct))
    check(Prop.forAll(genSet, genSet) { (a, b) =>
      import org.apache.spark.sql.functions._
      val df = Seq((a, b)).toDF("a", "b")
      val both = df.select(
        graft.functions.TextFunctions
          .jaccardSorted(array_sort(col("a")), array_sort(col("b"))).as("m"),
        graft.functions.TextFunctions.jaccard(col("a"), col("b")).as("h")).head()
      both.getDouble(0) == both.getDouble(1)
    }, minTests = 60)
  }
}
