package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins the built-in operator set lacks, composed Spark-first
  * (SURVEY.md §4: no custom physical operator needed — both reduce to
  * shuffle-friendly primitives).
  *
  *   - [[asOfJoin]]: for each left row, the latest right row with
  *     `rightTs <= leftTs` per key — one union + one window pass
  *     (sort-merge within key partitions), never a join explosion.
  *   - [[rangeJoin]]: pairs within `|lt - rt| <= tolerance` per key —
  *     time-bucket equi-join (each row joins its own and neighbor bucket)
  *     + exact refine, avoiding the O(n²) cross join a naive theta-join
  *     plans to.
  */
object Temporal {

  /** As-of join (backward): attach to every left row the payload columns of
    * the most recent right row at or before its timestamp, per key.
    * Right-side ties on ts break by the LAST row in `rightOrd` order.
    *
    * @param left     frame with `key` and `ts` columns (plus anything else)
    * @param right    frame with `key`, `ts`, and `payload` columns
    * @param payload  right columns to carry (attached as `asof_<name>`,
    *                 null when no prior right row exists)
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val lrowType = org.apache.spark.sql.types.StructType(
      leftCols.map(c => left.schema(c)))
    // tag and union: right rows sort BEFORE left rows at equal ts so a
    // same-instant right row is visible to the left row (<= semantics)
    val l = left.select(
      Seq(col(key).as("__key"), col(ts).as("__ts"), lit(1).as("__side"),
        struct(leftCols.map(col): _*).as("__lrow")) ++
        payload.map(p => lit(null).cast(right.schema(p).dataType).as(s"__p_$p")): _*)
    val r = right.select(
      Seq(col(key).as("__key"), col(ts).as("__ts"), lit(0).as("__side"),
        lit(null).cast(lrowType).as("__lrow")) ++
        payload.map(p => col(p).as(s"__p_$p")): _*)
    // deterministic tie-break among same-ts right rows: order by the first
    // payload column; left rows carry null there and sort via __side anyway
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__ts"), col("__side"),
        col(s"__p_${payload.head}").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = l.unionByName(r)
      .select(
        Seq(col("__side"), col("__lrow")) ++
          payload.map(p =>
            last(col(s"__p_$p"), ignoreNulls = true).over(w).as(s"asof_$p")): _*)
      .filter(col("__side") === 1)
    leftCols.foldLeft(joined) { (df, c) =>
      df.withColumn(c, col("__lrow").getField(c))
    }.select(leftCols.map(col) ++ payload.map(p => col(s"asof_$p")): _*)
  }

  /** Range self/two-stream join: (left, right) pairs with the same key and
    * `|leftTs - rightTs| <= tolerance`. Bucketed: both sides hash to
    * `floor(ts / tolerance)`; each left row probes its bucket and both
    * neighbors (any in-range pair differs by ≤ 1 bucket), then the exact
    * predicate refines. Equi-join shuffle on (key, bucket) — scales linearly
    * with data, quadratically only within (key, bucket) cells. */
  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      tolerance: Long): DataFrame = {
    require(tolerance > 0, "tolerance must be positive")
    val lb = left.withColumn("__bucket",
      explode(array((-1 to 1).map(d =>
        (col(leftTs).cast("long") / tolerance + d).cast("long")): _*)))
    val rb = right.withColumn("__bucket",
      (col(rightTs).cast("long") / tolerance).cast("long"))
    lb.join(rb, Seq(key, "__bucket"))
      .filter(abs(col(leftTs).cast("long") - col(rightTs).cast("long")) <= tolerance)
      .drop("__bucket")
  }
}
