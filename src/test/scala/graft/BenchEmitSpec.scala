package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

/** Pins the bench's LAST-stdout-line contract: the driver archives only
  * the tail of stdout (2,000-char window — round 16's ~4 KB full line
  * overflowed it and BENCH_r16 recorded parsed:null), and BASELINE.md's
  * 2x throughput gate is denominated in records/s (round 17's compact
  * line dropped the four rate fields and the archived artifact could no
  * longer attest the baseline comparison). The spec builds the line from
  * a full-sized realistic payload — every headline query name, all stage
  * keys — and asserts it parses as JSON, carries the gate fields, and
  * stays under the window. */
class BenchEmitSpec extends AnyFunSuite {

  // the bench's actual headline set (names matter: they dominate line
  // length) — keep in sync with Bench.main's `headline` seq + ingest rows
  private val queryNames = Seq(
    "ingest_append", "ingest_bulk", "ingest_parallel", "poll_scan",
    "q1_pricing", "q3_shipping", "q5_region", "q6_forecast",
    "q_window_rank", "q_events_hourly", "dedup_exact", "dedup_minhash",
    "dedup_incremental", "dedup_simhash", "text_stats", "lang_id",
    "ann_brute", "ann_srp", "pipeline_clean", "rep_ratio", "dup_clusters",
    "tfidf_topk", "chunk_docs", "gopher_filters", "bpe_tokenize",
    "multimodal_decode_video", "dedup_fingerprint", "dedup_spans",
    "dedup_semantic", "dsir_sample", "curate_pipeline", "train_shards",
    "lm_score_5gram", "chunk_docs_bpe", "multimodal_resize_real",
    "frame_sample", "ann_pq", "ann_ivfpq", "qfilter_score",
    "curate_pipeline_full", "q_distinct_sketch", "q_bloom_semijoin")

  private val stageKeys = Seq("srp_embed", "span_cut", "front_plan",
    "lsh_sign_shards", "lsh_candgen", "lsh_cand_shards", "lsh_verdict",
    "lsh_selfgen", "lsh_append", "lsh_survgen", "lsh_survivors",
    "sink_surv", "sink_collect", "sink_mat")

  private def line(contended: Seq[String] = Nil): String = {
    val results = scala.collection.mutable.LinkedHashMap(
      queryNames.map(_ -> 12.345): _*) // worst-case 2-decimal width
    val stages = Bench.fullStagesJson(
      66.666, stageKeys.map(_ -> 12.345).toMap)
    Bench.compactLine(
      total = 444.888,
      results = results,
      sfDir = "/root/testdata/sf0.1",
      rates = (748415.0, 2068888.0, 1036890.0, 716790.0), // 10x r17 widths
      jobP50Ms = 172.9,
      timedJobs = 3290,
      contendedJson = contended.map("\"" + _ + "\"").mkString("[", ",", "]"),
      curateFullStagesJson = stages)
  }

  test("compact line parses as one JSON object") {
    val node = new ObjectMapper().readTree(line())
    assert(node.isObject)
    assert(node.get("metric").asText() === "total")
    assert(node.get("queries").size() === queryNames.size)
  }

  test("compact line carries the four baseline-gate rate fields") {
    val node = new ObjectMapper().readTree(line())
    for (f <- Seq("ingest_records_per_sec", "ingest_bulk_records_per_sec",
        "ingest_parallel_records_per_sec", "poll_records_per_sec")) {
      assert(node.has(f), s"missing $f")
      assert(node.get(f).asDouble() > 0)
    }
  }

  test("compact line carries the curate_full_stages split") {
    val node = new ObjectMapper().readTree(line())
    val st = node.get("curate_full_stages")
    assert(st != null && st.isObject)
    assert(st.get("wall").asDouble() === 66.666)
    stageKeys.foreach(k => assert(st.has(k), s"missing stage $k"))
  }

  test("compact line stays under the consumer's 2000-char tail window") {
    // worst realistic case: every query 5 chars wide, all stages present,
    // a few contended names — still needs slack for Spark's final
    // stdout newline handling, so gate at 1900
    val l = line(contended = Seq("curate_pipeline_full", "lm_score_5gram"))
    assert(l.length < 1900, s"compact line ${l.length} chars")
    assert(!l.contains("\n"))
  }

  test("cold-fit registry names every memoized model family") {
    // the BENCH.json honesty field (`cold_fit_sec`, round 19) must keep
    // covering the fits the warm-up pass absorbs — a fit added without a
    // registry entry would silently vanish from the artifact again
    val names = graft.queries.Queries
      .coldFits(null, "/nonexistent").map(_._1).toSet
    for (f <- Seq("bpe", "kmeans", "dsir", "pq", "ivfpq", "qfilter",
        "lang", "contam_gate"))
      assert(names.contains(f), s"cold-fit registry missing $f")
  }

  test("stage json omits absent keys instead of emitting nulls") {
    val j = Bench.fullStagesJson(1.5, Map("span_cut" -> 0.25))
    val node = new ObjectMapper().readTree("{" + j + "}")
    val st = node.get("curate_full_stages")
    assert(st.size() === 2) // wall + span_cut only
    assert(st.get("span_cut").asDouble() === 0.25)
  }
}
