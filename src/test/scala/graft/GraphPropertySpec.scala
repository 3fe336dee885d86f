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

  test("contraction rewrite joins: broadcast at/below the byte gate, shuffle above") {
    import org.apache.spark.sql.functions._
    // pin the decision to the GATE: no stats-driven auto-broadcast, no
    // AQE runtime conversion — production feeds pinned (statless) frames
    // where only the hint decides
    val s = org.apache.spark.sql.GraftInternal.cloneSession(spark)
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val raw = s.range(0, 1000)
      .select(col("id").as("a"), ((col("id") + 1) % 1000).as("b"))
    val l0 = s.range(0, 1000)
      .select(col("id"), (col("id") % 10).as("lbl"))
    def plan(maxBytes: Long): String = graft.pipeline.Graphs
      .rewriteToLabelSpace(raw, l0, 1000L, maxBytes)
      .queryExecution.executedPlan.toString
    val below = plan(16L * 1000) // payload == cutoff -> broadcast
    assert(below.contains("BroadcastHashJoin"),
      s"16B/node map at the byte cutoff must broadcast:\n$below")
    val above = plan(16L * 1000 - 1) // one byte over -> shuffled join
    assert(!above.contains("BroadcastHashJoin") &&
      (above.contains("SortMergeJoin") || above.contains("ShuffledHashJoin")),
      s"over-cutoff map must degrade to a shuffled join, not broadcast:\n$above")
  }

  test("distributed tiers release every pin except the returned result") {
    val sc = spark.sparkContext
    def newPins(body: => org.apache.spark.sql.DataFrame): Set[Int] = {
      val before = sc.getPersistentRDDs.keySet.toSet
      val res = body
      res.count() // caller materializes; pins were already released inside
      sc.getPersistentRDDs.keySet.toSet -- before
    }
    // forced loop tier: a 300-cycle survives contraction, so l0, edges
    // and the loop's final labels all pin along the way
    val cycle = (0L until 300L).map(i => (i, (i + 1) % 300)).toDF("id_a", "id_b")
    val loopPins = newPins(
      graft.pipeline.Graphs.connectedComponents(cycle, localEdgeCutoff = 0))
    assert(loopPins.size == 1,
      s"loop tier must leave exactly the result's blocks pinned: $loopPins")
    // mid tier: a clique blows a tiny cutoff raw but contracts to zero
    // edges, finishing driver-side — only l0 and the result pin
    val clique = (for {
      a <- 0L until 40L; b <- (a + 1) until 40L
    } yield (a, b)).toDF("id_a", "id_b")
    val midPins = newPins(
      graft.pipeline.Graphs.connectedComponents(clique, localEdgeCutoff = 10))
    assert(midPins.size == 1,
      s"mid tier must leave exactly the result's blocks pinned: $midPins")
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
