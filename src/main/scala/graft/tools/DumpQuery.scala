package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev probe: dump NAMED SparkEntry queries to `outDir/<name>/` parquet —
  * a targeted slice of [[graft.Verify]] for re-checking just the queries a
  * change touched (point tools/selfcheck.py at an outDir whose
  * oracle_sql.json is current, overwrite the dirs this re-dumps).
  *
  * {{{ sbt "runMain graft.tools.DumpQuery <sfDir> <outDir> <query>..." }}}
  */
object DumpQuery {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val out = args(1)
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      SparkEntry.queries(name)(spark, dir)
        .coalesce(1).write.mode("overwrite").parquet(s"$out/$name")
      System.err.println(s"[dump] $name -> $out/$name")
    }
    spark.stop()
  }
}
