package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}
import graft.pipeline.{Dedup, Graphs}

/** Dev probe: decompose dup_clusters' wall into PAIR GENERATION vs the
  * connected-components tiers, against any documents dir (point it at a
  * ScaleStress scaled corpus to attribute the 32× growth).
  *
  * {{{ runMain graft.tools.CcProbe <docsDir> [passes] }}} */
object CcProbe {
  private def time(body: => Unit): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }
  private def noop(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val passes = args.lift(1).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def pairs = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
      shingleSize = 3, threshold = 0.8, shingler = T.wordShingles)
    println(f"== docs=${docs.count()}%d pairs=${pairs.count()}%d")
    def run(tag: String)(body: => Unit): Unit = {
      body // warm
      val ts = (1 to passes).map(_ => time(body))
      println(f"== $tag%-18s ${ts.map(t => f"$t%.1f").mkString(" ")} sec")
    }
    run("pairs_only") { noop(pairs) }
    run("cc_gated") { noop(Graphs.connectedComponents(pairs)) }
    run("cc_distributed") { noop(Graphs.connectedComponents(pairs, localEdgeCutoff = 0)) }
    spark.stop()
  }
}
