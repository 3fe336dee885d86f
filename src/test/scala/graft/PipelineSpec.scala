package graft

import graft.core.ProducerConfig
import graft.core.catalog.{TopicCatalog, Warehouse}
import graft.core.log.{LogReader, LogWriter}
import graft.pipeline.{Multimodal, Skew}
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("ppl_buckets: per-lang terciles are ordered and near-balanced") {
    val sf = "/root/testdata/sf0.001"
    val out = graft.queries.Queries.pplBuckets(spark, sf)
      .select("lang", "nll", "bucket").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getString(2)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (lang, rows) =>
      val byBucket = rows.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
      // every bucket's scores sit strictly below the next bucket's ceiling
      for {
        h <- byBucket.get("head"); m <- byBucket.get("middle")
      } assert(h.max <= m.min, s"$lang head <= middle")
      for {
        m <- byBucket.get("middle"); t <- byBucket.get("tail")
      } assert(m.max <= t.min, s"$lang middle <= tail")
      // tercile split: no bucket may hold more than half the language
      // (thresholds at 1/3 and 2/3 of the score distribution)
      val n = rows.size.toDouble
      if (n >= 9) byBucket.foreach { case (b, v) =>
        assert(v.size <= n * 0.55, s"$lang bucket $b holds ${v.size}/$n")
      }
    }
  }

  test("compression: every codec round-trips through the log (C1)") {
    // reference CompressionType: none/gzip/snappy/lz4/zstd — here the codec
    // is a storage property of the parquet segments
    Seq("none", "gzip", "snappy", "lz4", "zstd").foreach { codec =>
      val wh = Warehouse(tmpDir(s"graft-codec-$codec"))
      TopicCatalog.createTopic(spark, wh, "t", 2)
      val recs = (0 until 100).map(i => (i.toLong, 1L, s"k$i", s"value-$i-" + ("x" * 50)))
        .toDF("id", "ts", "key", "value")
      LogWriter.append(spark, wh, "t", recs, "id",
        conf = ProducerConfig(compression = codec))
      val back = LogReader.scan(spark, wh, "t")
      assert(back.count() === 100, codec)
      val sample = back.filter($"key" === "k7").select("value").head().getString(0)
      assert(sample === "value-7-" + ("x" * 50), codec)
    }
  }

  test("multimodal: meta plumbing + stub decode are deterministic") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val withBin = Multimodal.withMeta(docs, $"text".cast("binary"), "text/plain")
    val metas = withBin.select($"meta.n_bytes", length($"text").cast("long")).collect()
    // ascii-only docs: n_bytes == n_chars; multibyte docs: n_bytes > n_chars
    metas.foreach(r => assert(r.getLong(0) >= r.getLong(1)))

    val a = withBin.select($"doc_id", Multimodal.decodeStub($"content").as("d")).collect()
    val b = withBin.select($"doc_id", Multimodal.decodeStub($"content").as("d")).collect()
    assert(a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted))
  }

  test("multimodal: mapPartitions decode preserves rows and is deterministic") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("content", $"text".cast("binary"))
    val out = Multimodal.decodePartitions(docs, $"doc_id", $"content", featureDim = 4)
    assert(out.count() === docs.count())
    val row = out.filter(_.id == 7L).head()
    assert(row.features.length === 4)
    assert(row.width >= 1 && row.width <= 1920 && row.height >= 1 && row.height <= 1080)
    val again = Multimodal.decodePartitions(docs, $"doc_id", $"content", featureDim = 4)
      .filter(_.id == 7L).head()
    assert(row.features.toSeq === again.features.toSeq)
  }

  test("salted join equals plain join") {
    val left = (0 until 1000).map(i => (i % 7, s"l$i")).toDF("k", "lv")
    val right = (0 until 7).map(i => (i, s"r$i")).toDF("k", "rv")
    val plain = left.join(right, Seq("k")).select("k", "lv", "rv")
      .collect().map(_.toString).sorted
    val salted = Skew.saltedJoin(left, right, "k", salts = 4)
      .select("k", "lv", "rv").collect().map(_.toString).sorted
    assert(salted.sameElements(plain))
  }

  test("saltedJoin plans the shuffle join the salt exists for (no broadcast)") {
    // Catalyst sizes the explode-replicated right side at ~the
    // un-replicated child, so without the shuffle_hash hint the planner
    // auto-broadcasts it — and a broadcast join never exchanges on
    // (key, salt), leaving the probe side on its incoming partitioning
    // (round 14: one 500-second task at 32x while 31 cores idled).
    val left = (0 until 1000).map(i => (i % 7, s"l$i")).toDF("k", "lv")
    val right = (0 until 7).map(i => (i, s"r$i")).toDF("k", "rv")
    val joined = Skew.saltedJoin(left, right, "k", salts = 4)
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      s"salted join must shuffle on (key, salt): $plan")
    assert(!plan.contains("BroadcastHashJoin"),
      s"broadcast defeats the salt: $plan")
    // The hash map must build from the replicated-SMALL side: BuildLeft
    // would materialize the large skewed frame per task (the OOM the
    // utility exists to avoid) and is unplannable for outer/semi/anti.
    assert(plan.contains("BuildRight") && !plan.contains("BuildLeft"),
      s"expected BuildRight in the ShuffledHashJoin: $plan")
  }

  test("saltedJoin non-inner types still plan the salted shuffle join") {
    // canBuildShuffledHashJoinLeft is false for left_outer/semi/anti, so a
    // LEFT-side hint would be silently unhonorable and fall back to the
    // size-underestimated auto-broadcast. The right-side hint must hold.
    val left = (0 until 1000).map(i => (i % 7, s"l$i")).toDF("k", "lv")
    val right = (0 until 5).map(i => (i, s"r$i")).toDF("k", "rv")
    for (jt <- Seq("left_outer", "left_semi", "left_anti")) {
      val joined = Skew.saltedJoin(left, right, "k", salts = 4, joinType = jt)
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("ShuffledHashJoin"), s"$jt: expected ShuffledHashJoin: $plan")
      assert(plan.contains("BuildRight") && !plan.contains("BuildLeft"),
        s"$jt: expected BuildRight: $plan")
      assert(!plan.contains("BroadcastHashJoin"),
        s"$jt: broadcast defeats the salt: $plan")
    }
    // and semantics survive: left_anti against a key subset
    val anti = Skew.saltedJoin(left, right, "k", salts = 4, joinType = "left_anti")
      .select("k").distinct().collect().map(_.getInt(0)).sorted
    assert(anti.toSeq === Seq(5, 6))
  }

  test("salting splits a hot key's rows across tasks (the 100TB skew case)") {
    // one hot key carrying 100k rows + 100 cold keys: hash-partitioning by
    // key funnels the hot key through ONE task regardless of parallelism
    val left = ((0 until 100000).map(_ => 0) ++ (0 until 1000).map(i => 1 + i % 100))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "v")
    def maxPartRows(df: org.apache.spark.sql.DataFrame): Long =
      df.rdd.mapPartitions(it => Iterator(it.size.toLong)).collect().max
    val naive = maxPartRows(left.repartition(16, $"k"))
    assert(naive >= 100000, "unsalted: the whole hot key in one task")
    val salted = left.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(8)).cast("int"))
    val spread = maxPartRows(salted.repartition(16, $"k", $"__salt"))
    assert(spread <= 30000, s"salted 8 ways: hot key split across tasks, got max $spread")
  }

  test("AQE splits a skewed sort-merge join at runtime") {
    val tuned = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32768",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = tuned.keys.map(k => k -> spark.conf.getOption(k)).toMap
    tuned.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // hot key 0: ~200k rows with payload — one shuffle partition far past
      // the (lowered) skew threshold; the rest tiny
      val left = ((0 until 200000).map(_ => 0) ++ (0 until 2000).map(i => 1 + i % 50))
        .zipWithIndex.map { case (k, i) => (k, s"payload-$i-${"x" * 24}") }
        .toDF("k", "lv")
      val right = (0 until 51).map(i => (i, s"r$i")).toDF("k", "rv")
      val joined = left.join(right, Seq("k"))
      // execute THIS query execution (count() would build its own): AQE
      // only finalizes the plan it actually ran
      assert(joined.collect().length === 202000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        s"AQE must have split the skewed partition at runtime:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salted aggregation equals plain aggregation") {
    val df = (0 until 10000).map(i => (i % 3, 1L)).toDF("k", "v")
    val plain = df.groupBy($"k").agg(sum($"v").as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedAgg(df, $"k", salts = 8,
        partial = Seq(sum($"v").as("ps")),
        combine = Seq(sum($"ps").as("s")))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }
}
