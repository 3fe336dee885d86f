package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import graft.functions.{TextFunctions => T}

/** Streaming exact deduplication — the continuous form of
  * `Dedup.exactByFingerprint`, for ingest-time cleaning of an unbounded
  * document stream.
  *
  * Keyed on the 64-bit content fingerprint, NOT the document body: state
  * carries 8 bytes per distinct document inside the horizon, so the state
  * store scales with distinct-docs-per-horizon, never with payload size —
  * the same shuffle-volume discipline as the batch path.
  *
  * Uses `dropDuplicatesWithinWatermark`: a duplicate arriving within the
  * watermark horizon of its first occurrence is dropped, and state older
  * than the horizon is evicted. Exact dedup over an UNBOUNDED stream is
  * inherently unbounded state — the horizon is the standard bound; pair
  * with a periodic batch `Dedup.exactByFingerprint` sweep for full-corpus
  * exactness.
  */
object StreamDedup {

  /** Drop records whose `text` content was already seen within the
    * watermark horizon. `events` must be a streaming DataFrame with an
    * event-time column `eventTime`; `delay` is the watermark delay
    * (e.g. "10 minutes"). */
  def dedupWithinWatermark(
      events: DataFrame,
      text: Column,
      eventTime: String,
      delay: String): DataFrame =
    events
      .withColumn("__fp", T.fingerprint64(text))
      .withWatermark(eventTime, delay)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")
}
