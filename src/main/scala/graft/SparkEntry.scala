package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Oracles, Queries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` carries one entry per implemented operator (SURVEY.md §2 plus
  * the training-data pipeline extensions); `oracleSql` carries the DuckDB
  * equivalent for every SQL-expressible one. Queries without an oracle
  * (murmur2 routing, LSH/ANN approximations, stubbed multimodal decode) get
  * the driver's rows-only check; their semantics are covered by ScalaTest
  * specs instead.
  */
object SparkEntry {

  /** Flagship query on sf=0.001: the full produce-path transform — route +
    * dense offset assignment over the events table. Driver smoke-checks
    * rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.ingestOffsets(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // flux-core: log engine semantics
    "ingest_offsets" -> (Queries.ingestOffsets _),
    "poll_slice" -> (Queries.pollSlice _),
    "route_murmur2" -> (Queries.routeMurmur2 _),
    "headers_last" -> (Queries.headersLast _),
    "assign_range" -> (Queries.assignRange _),
    "assign_roundrobin" -> (Queries.assignRoundRobin _),
    "assign_sticky" -> (Queries.assignSticky _),
    "liveness_snapshot" -> (Queries.livenessSnapshot _),
    "expire_ttl" -> (Queries.expireTtl _),
    "describe_topic" -> (Queries.describeTopic _),
    // query layer over log tables
    "q1_pricing" -> (Queries.q1Pricing _),
    "q3_shipping" -> (Queries.q3Shipping _),
    "q5_region" -> (Queries.q5Region _),
    "q6_forecast" -> (Queries.q6Forecast _),
    "q_window_rank" -> (Queries.qWindowRank _),
    "q_events_hourly" -> (Queries.qEventsHourly _),
    "q_sessionize" -> (Queries.qSessionize _),
    "q_funnel" -> (Queries.qFunnel _),
    "q_retention" -> (Queries.qRetention _),
    "q_asof_join" -> (Queries.qAsofJoin _),
    "q_range_join" -> (Queries.qRangeJoin _),
    "q_brand_stats" -> (Queries.qBrandStats _),
    "q_setops" -> (Queries.qSetOps _),
    "q_semijoin" -> (Queries.qSemiJoin _),
    "q_antijoin" -> (Queries.qAntiJoin _),
    "q_rollup" -> (Queries.qRollup _),
    "q_cube" -> (Queries.qCube _),
    "q_salted_agg" -> (Queries.qSaltedAgg _),
    "q_salted_join" -> (Queries.qSaltedJoin _),
    "q_fuzzy_join" -> (Queries.qFuzzyJoin _),
    "q_distinct_sketch" -> (Queries.qDistinctSketch _),
    "q_sketch_intersect" -> (Queries.qSketchIntersect _),
    "q_bloom_semijoin" -> (Queries.qBloomSemijoin _),
    "q_bloom_antijoin" -> (Queries.qBloomAntijoin _),
    "q_cms_freq" -> (Queries.qCmsFreq _),
    "q_priority_count" -> (Queries.qPriorityCount _),
    "q_pivot" -> (Queries.qPivot _),
    "q_quantiles" -> (Queries.qQuantiles _),
    // training-data pipeline operators
    "dedup_exact" -> (Queries.dedupExact _),
    "dedup_fingerprint" -> (Queries.dedupFingerprint _),
    "dedup_ngram_jaccard" -> (Queries.dedupNgramJaccard _),
    "dedup_spans" -> (Queries.dedupSpans _),
    "dedup_spans_incremental" -> (Queries.dedupSpansIncremental _),
    "dedup_semantic" -> (Queries.dedupSemantic _),
    "dedup_incremental" -> (Queries.dedupIncremental _),
    "curate_pipeline" -> (Queries.curatePipeline _),
    "dedup_embedding_incremental" -> (Queries.dedupEmbeddingIncremental _),
    "dedup_minhash" -> (Queries.dedupMinhash _),
    "dedup_simhash" -> (Queries.dedupSimhash _),
    "dedup_embedding" -> (Queries.dedupEmbedding _),
    "text_stats" -> (Queries.textStats _),
    "quality_score" -> (Queries.qualityScore _),
    "qfilter_weights" -> (Queries.qfilterWeights _),
    "qfilter_score" -> (Queries.qfilterScore _),
    "lang_id" -> (Queries.langId _),
    "pipeline_clean" -> (Queries.pipelineClean _),
    "offsets_for_times" -> (Queries.offsetsForTimes _),
    "q_interval_join" -> (Queries.qIntervalJoin _),
    "rep_ratio" -> (Queries.repRatio _),
    "redact_pii" -> (Queries.redactPii _),
    "fingerprints" -> (Queries.fingerprints _),
    "quantize_int8" -> (Queries.quantizeInt8 _),
    "kmeans_clusters" -> (Queries.kmeansClusters _),
    "pack_sequences" -> (Queries.packSequences _),
    "token_histogram" -> (Queries.tokenHistogram _),
    "q_heavy_hitters" -> (Queries.qHeavyHitters _),
    "subword_count" -> (Queries.subwordCount _),
    "bpe_vocab" -> (Queries.bpeVocab _),
    "bpe_tokenize" -> (Queries.bpeTokenize _),
    "pack_sequences_bpe" -> (Queries.packSequencesBpe _),
    "train_shards" -> (Queries.trainShards _),
    "lm_score_5gram" -> (Queries.lmScore5gram _),
    "chunk_docs_bpe" -> (Queries.chunkDocsBpe _),
    "curate_pipeline_spans" -> (Queries.curatePipelineSpans _),
    "curate_pipeline_dsir" -> (Queries.curatePipelineDsir _),
    "curate_pipeline_decontam" -> (Queries.curatePipelineDecontam _),
    "curate_pipeline_qfilter" -> (Queries.curatePipelineQfilter _),
    "curate_pipeline_full" -> (Queries.curatePipelineFull _),
    "decontaminate_gate" -> (Queries.decontaminateGate _),
    "ppl_buckets_5gram" -> (Queries.pplBuckets5gram _),
    "ann_brute" -> (Queries.annBrute _),
    "ann_srp" -> (Queries.annSrp _),
    "ann_ivf" -> (Queries.annIvf _),
    "ann_pq" -> (Queries.annPq _),
    "ann_ivfpq" -> (Queries.annIvfPq _),
    "ann_ivfpq_index" -> (Queries.annIvfPqIndex _),
    "ann_ivfpq_dist" -> (Queries.annIvfPqDist _),
    "multimodal_meta" -> (Queries.multimodalMeta _),
    "multimodal_decode" -> (Queries.multimodalDecode _),
    "multimodal_decode_real" -> (Queries.multimodalDecodeReal _),
    "multimodal_resize_real" -> (Queries.multimodalResizeReal _),
    "frame_sample" -> (Queries.frameSample _),
    "multimodal_decode_audio" -> (Queries.multimodalDecodeAudio _),
    "multimodal_decode_video" -> (Queries.multimodalDecodeVideo _),
    "compact_topic" -> (Queries.compactTopic _),
    "dup_clusters" -> (Queries.dupClusters _),
    "decontaminate" -> (Queries.decontaminate _),
    "sample_stratified" -> (Queries.sampleStratified _),
    "sample_diverse" -> (Queries.sampleDiverse _),
    "cap_per_source" -> (Queries.capPerSource _),
    "hard_negatives" -> (Queries.hardNegatives _),
    "jsonl_roundtrip" -> (Queries.jsonlRoundtrip _),
    "blocklist_hits" -> (Queries.blocklistHits _),
    "normalize_text" -> (Queries.normalizeTextQ _),
    "corpus_report" -> (Queries.corpusReport _),
    "dsir_weights" -> (Queries.dsirWeights _),
    "dsir_sample" -> (Queries.dsirSample _),
    "shuffle_shards" -> (Queries.shuffleShards _),
    "mix_weights" -> (Queries.mixWeights _),
    "mix_temperature" -> (Queries.mixTemperature _),
    "tfidf_topk" -> (Queries.tfidfTopk _),
    "bm25_search" -> (Queries.bm25Search _),
    "dedup_survivors" -> (Queries.dedupSurvivors _),
    "zorder_key" -> (Queries.zorderKey _),
    "lm_score" -> (Queries.lmScore _),
    "lm_score_bigram" -> (Queries.lmScoreBigram _),
    "ppl_buckets" -> (Queries.pplBuckets _),
    "chunk_docs" -> (Queries.chunkDocs _),
    "gopher_filters" -> (Queries.gopherFilters _))

  /** DuckDB equivalents; keys without an entry get a rows-only check. */
  def oracleSql: Map[String, String] = Oracles.sql
}
