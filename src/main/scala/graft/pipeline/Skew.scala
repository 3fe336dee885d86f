package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for hot keys at scale.
  *
  * Spark's map-side partial aggregation already absorbs skew for algebraic
  * aggregates, and AQE's skew-join splitting handles sort-merge joins; the
  * two cases that still melt a 1000-executor job are (a) non-algebraic
  * aggregations (collect_list-style) on hot keys and (b) broadcast-infeasible
  * joins against a skewed build side. Both fix with salting: scatter the hot
  * key across `salts` sub-keys, do the heavy work per sub-key, then combine.
  */
object Skew {

  /** Two-phase salted aggregation: `df.groupBy(key)` where per-key state is
    * too large for one task. Phase 1 aggregates (key, salt) partials; phase 2
    * combines partials per key. `partial` and `combine` must compose (the
    * usual semigroup requirement).
    */
  def saltedAgg(
      df: DataFrame,
      key: Column,
      salts: Int,
      partial: Seq[Column],
      combine: Seq[Column]): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy(key.as("__key"), col("__salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col("__key"))
      .agg(combine.head, combine.tail: _*)
      .withColumnRenamed("__key", "key")

  /** Salted join of a large skewed-left frame against a small-but-not-
    * broadcastable right frame: left rows get a random salt in [0, salts),
    * right rows replicate once per salt, and the join key becomes
    * (key, salt) — splitting each hot key's row group across `salts` tasks.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int"))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    // Force the SHUFFLE hash join the salt exists for: Catalyst's size
    // estimate of the exploded right side is ~the un-replicated child,
    // so the planner happily auto-broadcasts `salts`x the real bytes —
    // and a broadcast join never exchanges on (key, salt), leaving the
    // probe side on its incoming partitioning (often AQE-coalesced to a
    // couple of tasks). If the right were genuinely broadcastable you
    // would not salt at all; given the caller chose salting, the
    // exchange on (key, salt) IS the skew fix. The hint goes on the
    // RIGHT (replicated-small) side: BuildRight keeps the per-task hash
    // map on the small side and is legal for inner/left_outer/left_semi/
    // left_anti — a left-side hint would build the map from the large
    // skewed frame (OOM risk) and is unplannable for the outer/semi/anti
    // types, silently falling back to the auto-broadcast this exists to
    // prevent.
    saltedLeft
      .join(saltedRight.hint("shuffle_hash"), Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
