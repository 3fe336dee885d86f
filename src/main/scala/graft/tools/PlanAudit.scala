package graft.tools
import org.apache.spark.sql.SparkSession
import graft.queries.Queries
/** Prints formatted physical plans of headline queries for plan review:
  * checks PushedFilters reach scans, small dims broadcast, codegen spans. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val targets = Seq(
      "q1_pricing" -> Queries.q1Pricing _,
      "q3_shipping" -> Queries.q3Shipping _,
      "q5_region" -> Queries.q5Region _,
      "q6_forecast" -> Queries.q6Forecast _,
      "dedup_minhash" -> Queries.dedupMinhash _,
      "ann_brute" -> Queries.annBrute _)
    targets.foreach { case (name, fn) =>
      println(s"########## $name ##########")
      println(fn(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
