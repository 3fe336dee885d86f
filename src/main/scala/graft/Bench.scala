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
  */
object Bench {

  private def time(body: => Unit): Double = {
    val t0 = System.nanoTime()
    body
    (System.nanoTime() - t0) / 1e9
  }

  private def materialize(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
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
    import org.apache.spark.sql.functions._

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    var ingestRecords = 0L
    var ingestRate = 0.0
    var pollRate = 0.0

    // --- log engine: produce path (reference's headline number) ---
    val whDir = java.nio.file.Files.createTempDirectory("graft-bench-wh").toString
    val wh = Warehouse(whDir)
    TopicCatalog.createTopic(spark, wh, "events", 8)
    val events = spark.read.parquet(s"$sfDir/events.parquet")
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
    results("ingest_append") = time {
      LogWriter.append(spark, wh, "events", events, "event_id")
    }
    ingestRate = ingestRecords / results("ingest_append")

    // --- bulk ingest: 6x the row count, where fixed job overhead amortizes ---
    TopicCatalog.createTopic(spark, wh, "bulk", 8)
    val bulk = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(
        monotonically_increasing_id().as("id"),
        lit(1700000000000L).as("ts"),
        col("l_orderkey").cast("string").as("key"),
        concat_ws("|", col("l_partkey"), col("l_suppkey"), col("l_quantity"),
          col("l_extendedprice")).as("value"))
    val bulkRecords = bulk.count()
    results("ingest_bulk") = time {
      LogWriter.append(spark, wh, "bulk", bulk, "id")
    }
    val bulkRate = bulkRecords / results("ingest_bulk")

    // --- concurrent disjoint-partition appends (cross-job per-partition
    // locks): four jobs write four partitions of ONE topic simultaneously ---
    TopicCatalog.createTopic(spark, wh, "par", 4)
    val partFrames = (0 until 4).map { p =>
      events.filter(col("event_id") % 4 === p).withColumn("explicit_partition", lit(p))
    }
    results("ingest_parallel") = time {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration._
      Await.result(
        Future.sequence(partFrames.zipWithIndex.map { case (df, p) =>
          Future(LogWriter.append(spark, wh, "par", df, "event_id",
            partitions = Some(Seq(p))))
        }), 10.minutes)
    }
    val parRate = ingestRecords / results("ingest_parallel")

    // --- log engine: consume path ---
    results("poll_scan") = time {
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
      "dedup_simhash" -> (Queries.dedupSimhash _),
      "text_stats" -> (Queries.textStats _),
      "lang_id" -> (Queries.langId _),
      "ann_brute" -> (Queries.annBrute _),
      "ann_srp" -> (Queries.annSrp _),
      "pipeline_clean" -> (Queries.pipelineClean _),
      "rep_ratio" -> (Queries.repRatio _),
      "dup_clusters" -> (Queries.dupClusters _),
      "tfidf_topk" -> (Queries.tfidfTopk _))
    headline.foreach { case (name, fn) =>
      materialize(fn(spark, sfDir)) // untimed warm-up pass
      results(name) = time(materialize(fn(spark, sfDir)))
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.values.sum
    val extra = f""""ingest_records":$ingestRecords,"ingest_records_per_sec":$ingestRate%.0f,"ingest_bulk_records":$bulkRecords,"ingest_bulk_records_per_sec":$bulkRate%.0f,"ingest_parallel_records_per_sec":$parRate%.0f,"poll_records_per_sec":$pollRate%.0f,"cores":$cpus"""
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs%s,"sf":"$sfDir%s",$extra%s}"""
    println(json)
    // sbt buries stdout under [info] prefixes; the file copy is the
    // machine-readable channel (driver falls back to parsing stdout).
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH.json"), json)
    spark.stop()
  }
}
