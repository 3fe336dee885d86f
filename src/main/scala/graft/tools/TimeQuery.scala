package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev probe: time named SparkEntry queries at a given sf dir.
  *
  * {{{ sbt "runMain graft.tools.TimeQuery /root/testdata/sf0.1 dup_clusters tfidf_topk" }}}
  *
  * Runs each query twice (warm-up + timed, same protocol as [[graft.Bench]])
  * against the noop sink and prints one `name seconds rows` line per query.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val names = args.tail.toSeq
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      val rows = fn(spark, dir).count()
      println(f"== $name%-24s $sec%8.3f sec  $rows%d rows")
    }
    spark.stop()
  }
}
