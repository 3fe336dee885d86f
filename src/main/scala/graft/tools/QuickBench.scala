package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.SparkEntry

/** Focused timing loop for iterating on one query's plan without paying the
  * full [[graft.Bench]] pass: `runMain graft.tools.QuickBench <sfDir>
  * <name,name,...> [passes]`. Same harness shape as Bench (noop sink,
  * untimed warm-up, best-of-N) so numbers are comparable. */
object QuickBench {

  private def time(body: => Unit): Double = {
    val t0 = System.nanoTime()
    body
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val passes = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def materialize(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val jobs = if (sys.env.contains("QUICKBENCH_JOBS")) {
      val buf =
        new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, String)]()
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            val desc = Option(e.properties.getProperty("spark.job.description"))
              .orElse(Option(e.properties.getProperty("callSite.short")))
              .getOrElse(e.stageInfos.map(_.name).lastOption.getOrElse("?"))
            starts.put(e.jobId, (e.time, desc)); ()
          }
          override def onJobEnd(
              e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val (t0, desc) =
              Option(starts.remove(e.jobId)).getOrElse((e.time, "?"))
            buf.add((e.jobId, t0, e.time, desc)); ()
          }
        })
      Some(buf)
    } else None
    names.foreach { name =>
      val fn: (SparkSession, String) => DataFrame = SparkEntry.queries(name)
      materialize(fn(spark, sfDir)) // warm-up
      jobs.foreach(_.clear())
      val best = (1 to passes).map(_ => time(materialize(fn(spark, sfDir)))).min
      println(f"[quickbench] $name%-24s $best%.2fs (best of $passes)")
      jobs.foreach { buf =>
        import scala.jdk.CollectionConverters._
        val js = buf.asScala.toSeq.sortBy(_._2)
        val jobSum = js.map(j => j._3 - j._2).sum / 1e3
        println(f"[quickbench]   ${js.size} jobs, sum ${jobSum}%.2fs")
        js.groupBy(_._4.take(70)).toSeq
          .map { case (d, g) => (g.size, g.map(j => j._3 - j._2).sum / 1e3, d) }
          .sortBy(-_._2).take(15)
          .foreach { case (n, s, d) =>
            println(f"[quickbench]   $n%3d x $s%6.2fs  $d")
          }
      }
    }
    spark.stop()
  }
}
