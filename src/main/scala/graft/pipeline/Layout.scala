package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{ZOrderFunctions => Z}

/** Data-layout operators: cluster a table for multi-column file skipping.
  *
  * At 100 TB the scan is the query plan: a table laid out along one sort
  * key skips files only for that key's predicates. Z-order clustering
  * writes files that each cover a small rectangle of a 2-D key space, so
  * parquet min/max stats prune on EITHER column. `files` controls target
  * file count — one range exchange on the z-key, then a per-task sort, the
  * same shuffle budget as a plain sorted write.
  */
object Layout {

  /** Return `df` clustered by the Morton curve over (a, b): rows land in
    * `files` range partitions of the z-key, sorted within each, so a
    * subsequent write produces z-clustered files. `a` and `b` must already
    * be folded into [0, 2^bits) (e.g. `pmod(col, lit(1 << bits))` for
    * dense ids, or a rank bucket for arbitrary values). */
  def zorderBy(
      df: DataFrame, a: Column, b: Column, bits: Int, files: Int): DataFrame =
    df.withColumn("__zkey", Z.zvalue(a, b, bits))
      .repartitionByRange(files, col("__zkey"))
      .sortWithinPartitions(col("__zkey"))
      .drop("__zkey")
}
