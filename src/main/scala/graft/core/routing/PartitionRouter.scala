package graft.core.routing

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.Murmur2

/** Partition selection, as a Column expression factory.
  *
  * Mirrors the reference's routing priority
  * (reference: src/main/java/commons/utils/PartitionSelector.java:22-51):
  *   1. explicit partition, when present and within the topic's range;
  *   2. else murmur2(key) positively masked into the range;
  *   3. else (null key) round-robin within the range.
  *
  * Unlike the reference — which mutates a per-producer counter for the
  * round-robin leg — the keyless leg here uses a deterministic value derived
  * from a caller-supplied ordering column, so routing is a pure function of
  * the data and replays/retries land records on the same partitions
  * (idempotent appends at 100 TB need that; a mutable counter does not
  * distribute).
  */
object PartitionRouter {

  /** Routed partition in [0, numPartitions).
    *
    * @param explicitPartition column with the record's explicit partition
    *                          (null when absent)
    * @param key               string key column (null when absent)
    * @param roundRobinOrd     any total-order column (e.g. a record id) used
    *                          to spread keyless records round-robin
    */
  def route(
      explicitPartition: Column,
      key: Column,
      roundRobinOrd: Column,
      numPartitions: Int): Column = {
    val n = lit(numPartitions)
    val inRange = explicitPartition.isNotNull &&
      explicitPartition >= 0 && explicitPartition < n
    // empty keys take the keyless leg, matching the reference's
    // `key != null && !key.isEmpty()` gate (PartitionSelector.java:22-51)
    when(inRange, explicitPartition.cast("int"))
      .when(key.isNotNull && length(key) > 0,
        Murmur2.murmur2Partition(key, numPartitions))
      .otherwise(pmod(roundRobinOrd.cast("long"), n.cast("long")).cast("int"))
  }

  /** Key-only routing — the hot path (reference PartitionSelector.java:79-101). */
  def routeByKey(key: Column, numPartitions: Int): Column =
    Murmur2.murmur2Partition(key, numPartitions)
}
