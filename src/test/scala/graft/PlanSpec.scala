package graft

import graft.queries.Queries

/** Plan-shape regression tests — the 100 TB discipline enforced in CI:
  * predicates and projections must reach the parquet scans, small dims must
  * broadcast, and LSH candidate generation must never cross-join. */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)

  test("q1/q6: filter + projection pushdown reach the scan") {
    val p1 = plan(Queries.q1Pricing(spark, dir))
    assert(p1.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(!p1.contains("l_orderkey"), "unused columns must be pruned")
    val p6 = plan(Queries.q6Forecast(spark, dir))
    assert(p6.contains("GreaterThanOrEqual(l_shipdate") && p6.contains("LessThan(l_quantity"))
  }

  test("q3/q5: dimension joins broadcast") {
    assert(plan(Queries.q3Shipping(spark, dir)).contains("BroadcastHashJoin"))
    val p5 = plan(Queries.q5Region(spark, dir))
    assert(p5.contains("BroadcastHashJoin"))
    assert(p5.contains("EqualTo(r_name,ASIA)"), "region filter pushed to scan")
  }

  test("LSH dedup generates candidates via equi-joins, never cross joins") {
    Seq(
      Queries.dedupMinhash(spark, dir),
      Queries.dedupSimhash(spark, dir),
      Queries.dedupEmbedding(spark, dir)).foreach { df =>
      val p = plan(df)
      assert(!p.contains("CartesianProduct"), "no cartesian products in LSH")
      assert(!p.contains("BroadcastNestedLoopJoin"), "no nested-loop joins in LSH")
    }
  }

  test("pipeline_clean: one corpus scan, pruned projection, no joins at all") {
    val df = Queries.pipelineClean(spark, dir)
    val p = plan(df)
    assert(df.inputFiles.length === 1, "single documents scan feeds the whole pipeline")
    assert(!p.contains("Join"), "dedup+filter+rollup compose without any join")
    assert(!p.contains("CartesianProduct"))
    // only doc_id + text are read; corpus metadata columns must be pruned
    assert(!p.contains("n_chars"), "unused document columns pruned from the scan")
    // the dedup exchange must be keyed by the 128-bit fingerprint, not the
    // document body — a window partitioned by a multi-KB string is a sort
    // on the corpus itself at 100 TB
    assert(p.contains("hashpartitioning(__fp"),
      "dedup shuffle keyed by the 16-byte fingerprint")
    assert(!p.contains("hashpartitioning(text"),
      "document bodies must not be a shuffle key")
  }

  test("lm_score / tfidf_topk: model side broadcasts onto the Zipf-skewed term join") {
    Seq(Queries.lmScore(spark, dir), Queries.tfidfTopk(spark, dir)).foreach { df =>
      val p = plan(df)
      assert(p.contains("BroadcastHashJoin"),
        "vocab/df is metadata-scale after its agg and must broadcast")
      assert(!p.contains("SortMergeJoin"),
        "no shuffle join on the term key (stopword hot-spot at scale)")
    }
  }

  test("redact_pii / rep_ratio stay single-scan with pruned reads") {
    Seq(Queries.redactPii(spark, dir), Queries.repRatio(spark, dir)).foreach { df =>
      assert(df.inputFiles.length === 1)
      val p = plan(df)
      assert(!p.contains("Exchange"), "row-local transforms must not shuffle")
    }
  }

  test("pinned-partition offset assignment: no window funnel, many tasks") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // explicit_partition = lit(p) used to constant-fold the row_number
    // window's partition spec to EMPTY ("WindowExec: No Partition Defined"),
    // serializing the whole batch through one task — the two-pass range
    // numbering must keep a pinned batch parallel.
    val df = (0 until 20000).map(i => (i.toLong, s"v$i")).toDF("id", "value")
      .withColumn("explicit_partition", lit(3))
    val out = graft.core.log.LogWriter.assignOffsets(
      df, col("explicit_partition"), lit(null).cast("string"), col("id"),
      numPartitions = 8, bases = Map(3 -> 1000L), parallelism = Some(8))
    assert(!plan(out).contains("Window"), "no WindowExec anywhere in the plan")
    val tasks = out.select(spark_partition_id()).distinct().count()
    assert(tasks > 1, s"pinned batch must spread across tasks, got $tasks")
    val rows = out.select(col("id"), col("offset"))
      .orderBy("id").as[(Long, Long)].collect()
    assert(rows.length === 20000)
    assert(rows.zipWithIndex.forall { case ((id, off), i) =>
      id == i.toLong && off == 1000L + i
    }, "dense gapless numbering in ord order from the index base")
  }

  test("poll touches only index-selected files and pushes the offset filter") {
    import graft.core.catalog.{TopicCatalog, Warehouse}
    import graft.core.log.{LogReader, LogWriter}
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val wh = Warehouse(tmpDir("graft-planspec"))
    TopicCatalog.createTopic(spark, wh, "t", 1)
    (0 until 3).foreach { i =>
      LogWriter.append(spark, wh, "t",
        (i * 100 until i * 100 + 100).map(j => (j.toLong, 1L, s"k$j", s"v$j"))
          .toDF("id", "ts", "key", "value")
          .withColumn("explicit_partition", lit(0)), "id")
    }
    val polled = LogReader.poll(spark, wh, "t", 0, 150, 10)
    assert(polled.inputFiles.length === 1, "index pruning selects one file")
    val p = plan(polled)
    assert(p.contains("GreaterThanOrEqual(offset,150)"), "offset filter pushed")
  }

  test("sample_stratified: shuffle-free codegen'd filter on the scan") {
    val df = Queries.sampleStratified(spark, dir)
    // the hash predicate must evaluate inside the scan stage — a sample
    // that shuffles 100 TB to keep 10% of it is wrong by construction
    // (the final orderBy is the only exchange, for the oracle's sort)
    val shuffles = df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.size
    assert(shuffles <= 1,
      s"at most one exchange (the presentation sort), got $shuffles")
    assert(!plan(df).contains("text"), "text column pruned from the sample scan")
  }

  test("chunk_docs / gopher_filters: per-row transforms, no shuffle but the presentation sort") {
    Seq(Queries.chunkDocs(spark, dir), Queries.gopherFilters(spark, dir)).foreach { df =>
      assert(df.inputFiles.length === 1, "single documents scan")
      val shuffles = df.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }.size
      assert(shuffles <= 1,
        s"chunking/quality rules are scan-local; at most the final sort, got $shuffles")
    }
  }

  test("q_funnel: three chained window mins ride ONE user-keyed exchange") {
    val df = Queries.qFunnel(spark, dir)
    df.collect() // executedPlan under AQE needs the run
    // AQE wraps exchanges in query stages, so assert on the final plan text
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val userKeyed = "Exchange hashpartitioning\\(user_id".r.findAllIn(p).size
    assert(userKeyed == 1,
      s"funnel must sort/partition by user ONCE, found $userKeyed:\n$p")
    assert("(?m)^\\s*\\+?-? ?Window ".r.findAllIn(p).size == 3,
      s"three chained window mins expected:\n$p")
  }

  test("q_fuzzy_join: candidates via gram equi-join, never a cartesian product") {
    val p = plan(Queries.qFuzzyJoin(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"fuzzy join must bucket on grams, not cross-join:\n$p")
  }

  test("decontaminate: benchmark gram set broadcasts, corpus never shuffles whole rows") {
    val p = plan(Queries.decontaminate(spark, dir))
    assert(p.contains("BroadcastHashJoin"), "bench grams join by broadcast")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("dedup_spans: gram shuffles key on the 8-byte fingerprint, text never shuffles") {
    val df = Queries.dedupSpans(spark, dir)
    val p = plan(df)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    // duplicated-gram detection + occurrence re-join both exchange on the
    // FNV fingerprint, never on gram text or the document body
    assert(p.contains("hashpartitioning(g#"),
      "gram aggregate/join keyed by the 8-byte fingerprint")
    assert(!p.contains("hashpartitioning(text"),
      "document bodies must not be a shuffle key")
    assert(!p.contains("Window"),
      "interval merge is row-local array math, not a window pass")
    // only doc_id + text feed the operator; corpus metadata columns pruned
    assert(!p.contains("n_chars") && !p.contains("lang#"),
      "unused document columns pruned from the scan")
  }

  test("dedup_semantic: pairs form per cluster via equi-join, never globally") {
    val p = plan(Queries.dedupSemantic(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("hashpartitioning(cluster#") || p.contains("cluster#"),
      "pairwise cosine joins on the cluster key")
  }

  test("lm 5-gram backoff: count tables broadcast iff small, shuffle-join otherwise") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.execution.joins.{
      BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
    // the gate governs the NINE gram-key joins (num-k / ctx-k lookups);
    // the final doc_id restore join is corpus-scale on BOTH sides and is
    // SUPPOSED to shuffle at scale — classify joins by their keys instead
    // of grepping the whole plan string
    def gramJoins(df: org.apache.spark.sql.DataFrame): (Int, Int) = {
      def gramKeyed(ks: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =
        ks.exists(_.references.exists(a =>
          a.name.startsWith("__num") || a.name.startsWith("__ctx")))
      val p = df.queryExecution.sparkPlan
      val bcast = p.collect {
        case j: BroadcastHashJoinExec if gramKeyed(j.leftKeys) => j }.size
      val shuffled = p.collect {
        case j: SortMergeJoinExec if gramKeyed(j.leftKeys) => j
        case j: ShuffledHashJoinExec if gramKeyed(j.leftKeys) => j }.size
      (bcast, shuffled)
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // small-table path (this corpus): every count-table join broadcasts
    val small = graft.pipeline.Quality.lmScoreStupidBackoff(
      docs, col("doc_id"), col("text"), n = 5)
    try {
      assert(gramJoins(small.scores) === ((9, 0)),
        "all 9 gram-key joins broadcast when tables fit the byte cap")
      // the gate's inputs are measured, not guessed: every table reports
      // rows and a byte estimate that at least covers its per-row overhead
      assert(small.tableStats.keySet === (1 to 5).toSet)
      assert(small.tableStats.values.forall(s => s.estBytes >= 24L * s.rows))
      // big-table path (web corpus, simulated with a 0-byte cap): the hint
      // must NOT fire — an unconditional broadcast of a billions-row 5-gram
      // table is a driver OOM; the joins fall back to shuffled joins
      val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val big = graft.pipeline.Quality.lmScoreStupidBackoff(
          docs, col("doc_id"), col("text"), n = 5, maxBroadcastBytes = 0L)
        try {
          assert(gramJoins(big.scores) === ((0, 9)),
            "all 9 gram-key joins shuffle when tables exceed the byte cap")
          // and the two strategies score IDENTICALLY
          val a = small.scores.orderBy("doc_id").collect().toSeq
          val b = big.scores.orderBy("doc_id").collect().toSeq
          assert(a === b, "join strategy must not change scores")
        } finally big.unpersist()
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
    } finally small.unpersist()
  }

  test("lm 5-gram backoff: empty corpus scores empty without NPE") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") < 0)
    val out = graft.pipeline.Quality.lmScoreStupidBackoff(
      docs, col("doc_id"), col("text"), n = 5)
    try assert(out.scores.count() === 0L) finally out.unpersist()
  }

  test("lm 5-gram backoff: scores survive (recompute) after unpersist") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") < 50)
    val lm = graft.pipeline.Quality.lmScoreStupidBackoff(
      docs, col("doc_id"), col("text"), n = 5)
    val before = lm.scores.orderBy("doc_id").collect().toSeq
    lm.unpersist()
    val after = lm.scores.orderBy("doc_id").collect().toSeq
    assert(before === after,
      "unpersist releases cache only — the plan stays evaluable")
  }
}
