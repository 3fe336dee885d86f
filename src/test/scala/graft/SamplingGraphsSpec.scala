package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Contamination, Graphs, Sampling}

/** Connected components, decontamination, and deterministic sampling. */
class SamplingGraphsSpec extends SparkSpec {
  import spark.implicits._

  test("connected components: triangle + pair + chain resolve to min ids") {
    // triangle {1,2,3}, pair {10,11}, chain 20-21-22
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (20L, 21L), (21L, 22L))
      .toDF("id_a", "id_b")
    val cc = Graphs.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("connected components: 100-node path converges inside the round cap") {
    // a path needs O(diameter) rounds under plain neighbor-min propagation —
    // 99 rounds here, far over maxRounds = 32. Converging to the true
    // component proves the pointer-jumping step delivers the log-round bound.
    // localEdgeCutoff = 0 forces the DISTRIBUTED loop — that is the path
    // under test (the default gate would resolve 99 edges driver-side).
    val pairs = (0L until 99L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val cc = Graphs.connectedComponents(pairs, localEdgeCutoff = 0)
      .as[(Long, Long)].collect()
    assert(cc.length == 100)
    assert(cc.forall(_._2 == 0L))
  }

  test("connected components: small-graph gate returns a broadcast-sized local relation") {
    val pairs = Seq((5L, 2L), (2L, 8L), (30L, 31L)).toDF("id_a", "id_b")
    val cc = Graphs.connectedComponents(pairs)
    // under the cutoff the result is a LocalRelation — downstream
    // keep-one-per-cluster anti-joins broadcast it with no exchange
    val leaves = cc.queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.forall(_.isInstanceOf[
      org.apache.spark.sql.catalyst.plans.logical.LocalRelation]),
      leaves.map(_.getClass.getSimpleName).mkString(","))
    val got = cc.as[(Long, Long)].collect().toMap
    assert(got == Map(2L -> 2L, 5L -> 2L, 8L -> 2L, 30L -> 30L, 31L -> 30L))
  }

  test("connected components: edges arriving reversed still label by min") {
    val pairs = Seq((9L, 3L), (3L, 7L)).toDF("id_a", "id_b")
    val cc = Graphs.connectedComponents(pairs).as[(Long, Long)].collect().toMap
    assert(cc == Map(3L -> 3L, 7L -> 3L, 9L -> 3L))
  }

  test("decontamination flags planted verbatim overlap and drops it") {
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog tonight"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "completely unrelated sentence about spark partitions and shuffles"),
      (2L, "he said the quick brown fox jumps over the lazy dog tonight again"),
      (3L, "short doc")).toDF("doc_id", "text")
    val report = Contamination.overlapReport(
      corpus, col("doc_id"), col("text"), bench, col("text"), n = 5)
      .as[(Long, Long)].collect().toMap
    assert(report.keySet == Set(2L))
    assert(report(2L) >= 5) // sliding 5-grams of an 11-token verbatim span
    val clean = Contamination.decontaminate(
      corpus, col("doc_id"), col("text"), bench, col("text"), n = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(clean == Set(1L, 3L))
  }

  test("row-local contamination gate agrees with the join form exactly") {
    val bench = Seq(
      (100L, "the quick brown fox jumps over the lazy dog tonight"),
      (101L, "tiny"), // sub-5-token doc: whole text is its one gram
      (102L, "")) // empty doc: one empty gram
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "completely unrelated sentence about spark partitions and shuffles"),
      (2L, "he said The QUICK brown fox jumps over the lazy dog tonight again"),
      (3L, "tiny"), // whole-text gram hits the benchmark's whole-text gram
      (4L, ""),
      (5L, "the quick brown fox jumps over the lazy dog tonight"))
      .toDF("doc_id", "text")
    val gate = Contamination.fitGate(bench, col("text"), n = 5)
    val got = corpus
      .select(col("doc_id"),
        Contamination.overlapCount(col("text"), gate).as("n"))
      .as[(Long, Int)].collect().toMap
    val joined = Contamination.overlapReport(
        corpus, col("doc_id"), col("text"), bench, col("text"), n = 5)
      .as[(Long, Long)].collect().toMap
    // the join form reports only overlapping docs; the gate reports 0
    assert(got.filter(_._2 > 0).map { case (k, v) => k -> v.toLong } === joined)
    assert(got(1L) === 0)
    assert(got(2L) >= 5, "case-insensitive verbatim span must hit")
    assert(got(3L) === 1 && got(4L) === 1)
    // composable as a replay-pure extraFilter: a plain filter keeps
    // exactly the clean docs
    val kept = corpus
      .filter(Contamination.overlapCount(col("text"), gate) === 0)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L))
  }

  test("stratified sample is deterministic and respects rate 0 and 1") {
    val df = (0L until 1000L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "s")
    val keepAllA = Sampling.stratifiedSample(df, col("id"), col("s"),
      Map("a" -> 1.0)).select("id").as[Long].collect().toSet
    assert(keepAllA == (0L until 1000L by 2).toSet) // rate-1 keeps every a; b absent = rate 0
    val half = Sampling.stratifiedSample(df, col("id"), col("s"),
      Map("a" -> 0.5, "b" -> 0.5))
    val r1 = half.select("id").as[Long].collect().toSet
    val r2 = half.select("id").as[Long].collect().toSet
    assert(r1 == r2) // hash-based, not rand(): identical on re-run
    assert(r1.size > 300 && r1.size < 700) // roughly half of 1000
  }

  test("per-stratum cap keeps exactly n, deterministically, and is unbiased-ish") {
    val df = (0L until 900L).map(i => (i, s"dom${i % 3}")).toDF("id", "s")
    val capped = Sampling.capPerStratum(df, col("id"), col("s"), n = 50)
    val by = capped.groupBy("s").count().as[(String, Long)].collect().toMap
    assert(by === Map("dom0" -> 50L, "dom1" -> 50L, "dom2" -> 50L))
    // deterministic on re-run
    val r1 = capped.select("id").as[Long].collect().toSet
    val r2 = Sampling.capPerStratum(df, col("id"), col("s"), n = 50)
      .select("id").as[Long].collect().toSet
    assert(r1 === r2)
    // hash-order selection, not first-n-by-id: the kept set must not be
    // the 150 lowest ids
    assert(r1 !== (0L until 150L).toSet)
    // a stratum below the cap is kept whole
    val small = (0L until 10L).map(i => (i, "only")).toDF("id", "s")
    assert(Sampling.capPerStratum(small, col("id"), col("s"), 50).count() === 10L)
  }

  test("mixture plan computes min(1, budget*w/tokens) rates") {
    val df = Seq(("a", 10), ("a", 10), ("b", 5)).toDF("s", "toks")
    val plan = Sampling.mixturePlan(df, col("s"), col("toks"),
        Map("a" -> 0.5, "b" -> 0.5), budget = 10L)
      .orderBy("stratum")
      .as[(String, Long, Long, Double)].collect()
    // a: 20 tokens available, target 5 → rate 0.25; b: 5 available, target 5 → rate 1.0
    assert(plan.toSeq == Seq(("a", 20L, 5L, 0.25), ("b", 5L, 5L, 1.0)))
  }

  test("diverse sample: per-cluster quota, full cluster coverage, deterministic") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val full = graft.pipeline.Clustering.kmeans(
      emb, col("vec_id"), col("embedding"), k = 5, iters = 2)
      .as[(Long, Int)].collect()
    val kept = Sampling.diverseSample(
      emb, col("vec_id"), col("embedding"), k = 5, iters = 2, perCluster = 4)
      .as[(Long, Int)].collect()
    val quota = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(quota.values.forall(_ <= 4), s"quota respected: $quota")
    // every populated region is represented (quota < any cluster's size)
    assert(quota.keySet == full.map(_._2).toSet, "all clusters covered")
    // kept ids carry their true cluster, and the pick is reproducible
    val fullMap = full.toMap
    kept.foreach { case (id, c) => assert(fullMap(id) == c) }
    val again = Sampling.diverseSample(
      emb, col("vec_id"), col("embedding"), k = 5, iters = 2, perCluster = 4)
      .as[(Long, Int)].collect()
    assert(kept.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("temperature plan: α=1 is natural shares, α=0 uniform, α<1 upweights the tail") {
    val df = Seq.fill(80)(("hi", 10)) ++ Seq.fill(20)(("lo", 10))
    val d = df.toDF("s", "toks")
    def shares(alpha: Double): Map[String, Double] =
      Sampling.temperaturePlan(d, col("s"), col("toks"), alpha, budget = 100L)
        .select("stratum", "q").as[(String, Double)].collect().toMap
    val nat = shares(1.0)
    assert(math.abs(nat("hi") - 0.8) < 1e-6 && math.abs(nat("lo") - 0.2) < 1e-6)
    val uni = shares(0.0)
    assert(math.abs(uni("hi") - 0.5) < 1e-6 && math.abs(uni("lo") - 0.5) < 1e-6)
    val t = shares(0.3)
    assert(t("lo") > 0.2 && t("lo") < 0.5,
      "α=0.3 lifts the low-resource stratum toward — not past — uniform")
    assert(math.abs(t("hi") + t("lo") - 1.0) < 1e-5, "shares renormalize")
  }

  test("shuffle shards: deterministic permutation, dense pos, one exchange") {
    val df = (0L until 5000L).toDF("id")
    val out = Sampling.shuffleShards(df, col("id"), numShards = 16, seed = 7L)
      .select("id", "shard", "pos")
    val rows = out.as[(Long, Int, Int)].collect()
    assert(rows.map(_._1).toSet == (0L until 5000L).toSet) // a permutation: nothing lost
    val byShard = rows.groupBy(_._2)
    assert(byShard.keySet.subsetOf((0 until 16).toSet))
    byShard.foreach { case (_, rs) => // pos dense 0..k-1 within every shard
      assert(rs.map(_._3).sorted.toSeq == (0 until rs.length).toSeq)
    }
    // uniform hash: no shard more than 2x the mean
    assert(byShard.values.map(_.length).max < 2 * 5000 / 16)
    assert(out.as[(Long, Int, Int)].collect().toSet == rows.toSet) // re-run identical
    // scale shape: one hash exchange for the window, no global sort
    val plan = out.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1, plan)
    assert(!plan.contains("Exchange rangepartitioning"), plan)
  }
}
