package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** Space-Saving heavy hitters as a typed [[Aggregator]] — top-k frequent
  * items with O(capacity) state per group instead of a full
  * groupBy(item).count() shuffle of every distinct item.
  *
  * Metwally et al., "Efficient Computation of Frequent and Top-k Elements in
  * Data Streams" (ICDT 2005). Guarantees: true count ≤ reported count ≤
  * true count + maxError; any item with true count > maxError of the
  * k-th reported item is present.
  *
  * Merge combines two summaries by summing counts (the standard mergeable
  * form), so partial aggregation (map-side combine) works — the shuffle
  * carries one bounded map per group per task.
  */
class HeavyHitters(capacity: Int)
    extends Aggregator[String, mutable.Map[String, (Long, Long)], Seq[(String, Long)]] {

  // item -> (count, maxError)
  override def zero: mutable.Map[String, (Long, Long)] = mutable.Map.empty

  override def reduce(
      buf: mutable.Map[String, (Long, Long)],
      item: String): mutable.Map[String, (Long, Long)] = {
    buf.get(item) match {
      case Some((c, e)) => buf(item) = (c + 1, e)
      case None if buf.size < capacity => buf(item) = (1L, 0L)
      case None =>
        // evict the minimum-count entry; its count bounds the new item's error
        val (minItem, (minCount, _)) = buf.minBy { case (k, (c, _)) => (c, k) }
        buf.remove(minItem)
        buf(item) = (minCount + 1, minCount)
    }
    buf
  }

  override def merge(
      a: mutable.Map[String, (Long, Long)],
      b: mutable.Map[String, (Long, Long)]): mutable.Map[String, (Long, Long)] = {
    b.foreach { case (item, (c, e)) =>
      a.get(item) match {
        case Some((c0, e0)) => a(item) = (c0 + c, e0 + e)
        case None => a(item) = (c, e)
      }
    }
    // trim back to capacity, dropping smallest counts (deterministic tiebreak)
    if (a.size > capacity) {
      val keep = a.toSeq.sortBy { case (k, (c, _)) => (-c, k) }.take(capacity)
      a.clear()
      keep.foreach { case (k, v) => a(k) = v }
    }
    a
  }

  /** Top items by estimated count, deterministic (count desc, item asc). */
  override def finish(buf: mutable.Map[String, (Long, Long)]): Seq[(String, Long)] =
    buf.toSeq.map { case (k, (c, _)) => (k, c) }
      .sortBy { case (k, c) => (-c, k) }

  override def bufferEncoder: Encoder[mutable.Map[String, (Long, Long)]] =
    Encoders.kryo[mutable.Map[String, (Long, Long)]]

  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
}

object HeavyHitters {
  /** Column form for use in typed groupBy-agg. */
  def topK(capacity: Int): Aggregator[String, mutable.Map[String, (Long, Long)], Seq[(String, Long)]] =
    new HeavyHitters(capacity)
}
