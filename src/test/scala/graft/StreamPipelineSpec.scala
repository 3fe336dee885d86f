package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Chunking, Quality}

/** The stateless curation operators (chunking, quality rules) are pure
  * row-local column pipelines, so the IDENTICAL library call runs on a
  * streaming DataFrame — no rewrite, no state store, partition-local at
  * any scale. These specs prove batch ≡ streaming on the same data,
  * delivered across multiple micro-batches.
  */
class StreamPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val docs: Seq[(Long, String)] = Seq(
    (0L, "the quick brown fox jumps over a lazy dog of unusual size"),
    (1L, (1 to 80).map(i => s"tok$i").mkString(" ")),
    (2L, "a b c"),
    (3L, (1 to 40).map(i =>
      if (i % 7 == 0) "the" else if (i % 11 == 0) "a" else s"word$i")
      .mkString(" ")),
    (4L, ""))

  test("Chunking.chunkTokens: streaming output equals batch output") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = Chunking.chunkTokens(input.toDF().toDF("doc_id", "text"),
        col("doc_id"), col("text"), chunkSize = 16, overlap = 4)
      .writeStream.format("memory").queryName("stream_chunks").start()
    try {
      docs.grouped(2).foreach { g => input.addData(g); q.processAllAvailable() }
      val streamed = spark.table("stream_chunks")
        .orderBy("id", "chunk_id")
        .as[(Long, Int, Int, String)].collect().toSeq
      val batch = Chunking.chunkTokens(docs.toDF("doc_id", "text"),
          col("doc_id"), col("text"), chunkSize = 16, overlap = 4)
        .orderBy("id", "chunk_id")
        .as[(Long, Int, Int, String)].collect().toSeq
      assert(streamed.nonEmpty)
      assert(streamed === batch)
    } finally q.stop()
  }

  test("Quality.gopherSignals: streaming output equals batch output") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = Quality.gopherSignals(input.toDF().toDF("doc_id", "text"),
        col("doc_id"), col("text"), minTokens = 30, maxTokens = 90)
      .writeStream.format("memory").queryName("stream_gopher").start()
    try {
      docs.grouped(2).foreach { g => input.addData(g); q.processAllAvailable() }
      val streamed = spark.table("stream_gopher").orderBy("id")
        .as[(Long, Int, Option[Double], Option[Double], Int, Boolean)]
        .collect().toSeq
      val batch = Quality.gopherSignals(docs.toDF("doc_id", "text"),
          col("doc_id"), col("text"), minTokens = 30, maxTokens = 90)
        .orderBy("id")
        .as[(Long, Int, Option[Double], Option[Double], Int, Boolean)]
        .collect().toSeq
      assert(streamed.length === docs.length)
      assert(streamed === batch)
      // sanity: the rule set discriminates on this input
      assert(streamed.count(_._6) >= 1)
      assert(streamed.count(!_._6) >= 1)
    } finally q.stop()
  }
}
