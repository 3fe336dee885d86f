package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Layout

/** Z-order layout: files must cover small rectangles of BOTH key columns,
  * which is what makes parquet min/max stats prune on either axis. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zorderBy clusters both columns; plain sort clusters only one") {
    // 64×64 grid, 4 rows per cell, written as 16 z-ordered files. Each file
    // is a contiguous equal-count z-range (~256 cells ≈ a 16×16 block, up
    // to two blocks when a range straddles a quadtree boundary), so
    // per-file min/max rectangles stay SMALL on both axes and a point-range
    // predicate on either column skips most files. A plain x-sort leaves y
    // unclustered: every file spans the full y range, zero y-pruning.
    val grid = for { x <- 0 until 64; y <- 0 until 64; r <- 0 until 4 }
      yield (x, y, r)
    val df = grid.toDF("x", "y", "r")

    // per-file (min,max) of both columns; returns (avg x-span, avg y-span,
    // files skippable for x<=7, files skippable for y<=7, file count)
    def layoutStats(clustered: org.apache.spark.sql.DataFrame)
        : (Double, Double, Long, Long, Long) = {
      val dir = tmpDir("graft-layout")
      clustered.write.mode("overwrite").parquet(dir)
      val stats = spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg(min("x").as("nx"), max("x").as("mx"),
          min("y").as("ny"), max("y").as("my"))
        .agg(avg(col("mx") - col("nx")), avg(col("my") - col("ny")),
          sum(when(col("nx") > 7, 1L).otherwise(0L)),
          sum(when(col("ny") > 7, 1L).otherwise(0L)),
          count(lit(1))).head()
      (stats.getDouble(0), stats.getDouble(1), stats.getLong(2),
        stats.getLong(3), stats.getLong(4))
    }

    val (zxSpan, zySpan, zxSkip, zySkip, zn) =
      layoutStats(Layout.zorderBy(df, col("x"), col("y"), 6, 16))
    assert(zn === 16)
    assert(zxSpan <= 32 && zySpan <= 32,
      s"z-files must be small rectangles, got avg spans ($zxSpan, $zySpan) of 63")
    assert(zxSkip >= zn / 2 && zySkip >= zn / 2,
      s"a point-range predicate must skip most z-files on EITHER axis, " +
        s"skipped x:$zxSkip y:$zySkip of $zn")

    val (pxSpan, pySpan, _, pySkip, pn) = layoutStats(
      df.repartitionByRange(16, col("x")).sortWithinPartitions(col("x")))
    assert(pxSpan <= 16, s"x-sort clusters x, got avg span $pxSpan")
    assert(pySpan >= 60 && pySkip === 0,
      s"x-sort leaves y unclustered (the z-order win): " +
        s"avg y-span $pySpan, y-skippable $pySkip of $pn")
  }
}
