package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row
import graft.core.ProducerConfig
import graft.core.catalog.Warehouse
import graft.core.log.LogWriter

/** Structured-Streaming produce path: a file-source (or any) stream feeds
  * `foreachBatch(LogWriter.append)` with the micro-batch id as the
  * idempotence key.
  *
  * This is the reference's producer loop re-expressed on Spark's execution
  * model (reference: src/main/java/producer/FluxProducer.java:62-64 schedules
  * `flushBuffer` every linger.ms; :110-245 drains ready batches to the
  * broker): the linger interval becomes the processing-time trigger, the
  * accumulator/drain machinery becomes the micro-batch itself, and the
  * ack/retry protocol (FluxProducer.java:191-239) becomes exactly-once
  * delivery via (checkpoint + batchId-keyed skip in the index table) — a
  * replayed micro-batch after a crash hits `LogIndex.hasBatch` and no-ops.
  */
object StreamIngest {

  /** Wire a streaming DataFrame into a topic's log. Caller starts the query.
    *
    * @param records streaming frame with the LogWriter input columns
    *                (`ts`, `key`, `value`, optional headers/explicit_partition)
    * @param ordCol  intra-batch total-order column for offset assignment
    */
  def writer(
      spark: SparkSession,
      wh: Warehouse,
      topic: String,
      records: DataFrame,
      ordCol: String,
      checkpoint: String,
      lingerMs: Long = ProducerConfig().lingerMs,
      conf: ProducerConfig = ProducerConfig()): DataStreamWriter[Row] =
    records.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(lingerMs))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        LogWriter.append(spark, wh, topic, batch, ordCol,
          batchId = Some(batchId), conf = conf)
        ()
      }

  /** Start ingesting a directory of parquet files as they arrive. */
  def fromParquetDir(
      spark: SparkSession,
      wh: Warehouse,
      topic: String,
      srcDir: String,
      schema: org.apache.spark.sql.types.StructType,
      ordCol: String,
      checkpoint: String,
      maxFilesPerTrigger: Int = 16): StreamingQuery = {
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)
    writer(spark, wh, topic, stream, ordCol, checkpoint).start()
  }

  /** Checkpointed streaming consumer: the continuous form of `poll` —
    * a file-source stream over a topic's log directory. Progress persists in
    * the checkpoint (the Structured-Streaming analog of the reference's
    * unimplemented offset-commit API, SURVEY.md §2.7 Q6). */
  def consume(
      spark: SparkSession,
      wh: Warehouse,
      topic: String): DataFrame =
    spark.readStream
      .schema(graft.core.Schemas.record)
      .parquet(wh.logDir(topic))
}
