package graft.streaming

import java.util
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{
  MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.{LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A ZERO-ROW micro-batch source: Structured Streaming lifecycle, triggers,
  * and a checkpointed monotone `batchId` with no data generation at all.
  *
  * [[StreamIngest.consume]] is its own micro-batch loop (the read ranges come
  * from the log INDEX, not from a streaming source — see the scaladoc there),
  * so all it needs from the engine is a heartbeat: something that makes every
  * trigger "have new data" so `foreachBatch` fires with the next checkpointed
  * batch id. A rate source does that but drags along row generation
  * semantics; this source's offset is a bare pulse counter, its
  * `planInputPartitions` is empty (the engine schedules NO tasks and builds
  * NO rows — the batch frame is a zero-partition scan), and it implements
  * [[SupportsTriggerAvailableNow]] so `Trigger.AvailableNow` drains exactly
  * one pulse and terminates.
  *
  * Offset semantics: `latestOffset` bumps a per-query counter, so every
  * trigger sees a changed offset and runs a batch. After a restart the
  * counter resumes from the checkpointed offset (`deserializeOffset` raises
  * the floor) — offsets never go backwards, matching the engine's
  * expectation, though only CHANGE is ever load-bearing here.
  */
class PulseSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PulseSource.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = new PulseTable
}

object PulseSource {
  /** One never-populated column: a zero-field schema exercises odd corners
    * of the engine for no benefit, and no row is ever built regardless. */
  val schema: StructType = new StructType().add("pulse", LongType, nullable = false)

  private[streaming] case class PulseOffset(n: Long) extends Offset {
    override def json(): String = n.toString
  }
}

private class PulseTable extends Table with SupportsRead {
  override def name(): String = "pulse"
  override def schema(): StructType = PulseSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = PulseSource.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new PulseStream
      }
    }
}

private class PulseStream extends MicroBatchStream with SupportsTriggerAvailableNow {
  import PulseSource.PulseOffset

  private val counter = new AtomicLong(0L)
  // AvailableNow: drain exactly ONE pulse, then stop advancing so the run
  // terminates. The target is latched at the FIRST latestOffset call — one
  // past the run's actual start — NOT in prepare: the engine may call
  // prepare before deserializeOffset restores the checkpointed position,
  // and a stale target would read as "already drained".
  @volatile private var availableNow = false
  @volatile private var availableNowTarget: Option[Long] = None

  override def initialOffset(): Offset = PulseOffset(0L)

  override def deserializeOffset(json: String): Offset = {
    val o = PulseOffset(json.trim.toLong)
    counter.updateAndGet(c => math.max(c, o.n)) // restart: resume monotone
    o
  }

  // SupportsAdmissionControl variant — the engine calls this one.
  override def latestOffset(startOffset: Offset, limit: ReadLimit): Offset = {
    val start = startOffset.asInstanceOf[PulseOffset].n
    if (availableNow) {
      val t = availableNowTarget.getOrElse {
        val latched = start + 1
        availableNowTarget = Some(latched)
        counter.updateAndGet(c => math.max(c, latched))
        latched
      }
      PulseOffset(t) // constant: one batch (start→t), then start==t stops the run
    } else PulseOffset(counter.updateAndGet(c => math.max(c, start) + 1))
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "pulse implements SupportsAdmissionControl; use latestOffset(start, limit)")

  override def reportLatestOffset(): Offset = PulseOffset(counter.get())

  override def prepareForTriggerAvailableNow(): Unit =
    availableNow = true

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    Array.empty // zero tasks, zero rows — the pulse IS the batch

  override def createReaderFactory(): PartitionReaderFactory =
    (_: InputPartition) =>
      throw new IllegalStateException("pulse source plans no partitions")

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
