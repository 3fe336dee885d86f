package graft.tools

import graft.queries.Queries
import org.apache.spark.sql.SparkSession

/** Dev probe: one warm + N timed solo runs of curate_pipeline with the
  * StageTimers action split printed per run — aims the per-batch-overhead
  * grind (the composed chain is ONE lazy plan; these are its real wall
  * segments). Usage: runMain graft.tools.CurateProbe [sfDir] [n] */
object CurateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .appName("graft-curate-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("GRAFT_AQE", "true"))
      .getOrCreate()
    def once(): Unit = {
      val t0 = System.nanoTime()
      val (_, stages) = graft.pipeline.StageTimers.capture {
        Queries.curatePipeline(spark, sfDir).count()
      }
      val total = (System.nanoTime() - t0) / 1e9
      val split = stages.toSeq.sortBy(-_._2)
        .map { case (k, v) => f"$k=$v%.3f" }.mkString(" ")
      val rest = total - stages.values.sum
      println(f"== curate total=$total%.3f rest=$rest%.3f $split")
    }
    once() // warm
    (1 to n).foreach(_ => once())
    spark.stop()
  }
}
