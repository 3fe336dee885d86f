package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.catalog.{TopicCatalog, Warehouse}
import graft.core.log.{LogReader, LogWriter}

/** Concurrent multi-JVM appender soak for the cross-job lock manager
  * ([[graft.core.Locks]]): the SIGKILL specs prove per-partition write
  * safety for one contended set; this runs `appenders` SEPARATE JVMs
  * (real processes — the exclusion under test is the O_EXCL lock FILE,
  * not the in-process stripe table) appending `rounds` batches each into
  * ONE topic, alternating between
  *
  *   - DISJOINT partition sets (worker w pins partitions {2w, 2w+1} via
  *     `explicit_partition` — these appends may run fully in parallel),
  *   - OVERLAPPING free-routed appends (every worker locks every
  *     partition — serialized by the per-partition locks, the reference's
  *     `PartitionWriteManager` semantics lifted across JVMs).
  *
  * Post-run, the parent oracle-checks the merged log:
  *
  *   - per-partition offsets are DENSE and GAPLESS from 0 (two appends
  *     racing one partition without exclusion would interleave offset
  *     assignment and collide or gap);
  *   - no (partition, offset) collision;
  *   - NO LOST BATCHES: every (worker, round) batch is fully present —
  *     exactly `perBatch` records each, totalling
  *     appenders × rounds × perBatch rows.
  *
  * {{{ runMain graft.tools.LockSoak [stateDir] [rounds] [appenders] }}}
  * Writes one JSON line and LOCK_SOAK.json. */
object LockSoak {

  private val Topic = "contest"
  private val PerBatch = 250

  def main(args: Array[String]): Unit =
    if (args.headOption.contains("--worker")) worker(args.drop(1))
    else parent(args)

  /** One appender JVM: `--worker <stateDir> <workerId> <rounds>`. */
  private def worker(args: Array[String]): Unit = {
    val stateDir = args(0)
    val wid = args(1).toInt
    val rounds = args(2).toInt
    val spark = SparkSession.builder()
      .appName(s"graft-lock-soak-w$wid").master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wh = Warehouse(stateDir)
    for (r <- 0 until rounds) {
      val base = (wid.toLong * 1000000L + r.toLong) * 10000L
      val df = spark.range(0, PerBatch.toLong).select(
        (col("id") + lit(base)).as("ord"),
        concat(lit(s"$wid:$r:"), col("id")).as("key"),
        concat(lit(s"$wid:$r:"), col("id")).as("value"))
      if (r % 2 == 0)
        // disjoint leg: pin this worker's partition pair; only those two
        // locks are taken, so the four workers append concurrently
        LogWriter.append(spark, wh, Topic,
          df.withColumn("explicit_partition",
            (lit(2 * wid) + pmod(col("ord"), lit(2L))).cast("int")),
          "ord", partitions = Some(Seq(2 * wid, 2 * wid + 1)))
      else
        // overlapping leg: free hash routing — every partition locked,
        // the full-contention shape
        LogWriter.append(spark, wh, Topic, df, "ord")
      ()
    }
    spark.stop()
    println(s"WORKER_DONE $wid")
  }

  private def parent(args: Array[String]): Unit = {
    val stateDir = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-lock-soak").toString)
    val rounds = args.lift(1).map(_.toInt).getOrElse(24)
    val appenders = args.lift(2).map(_.toInt).getOrElse(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .appName("graft-lock-soak").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wh = Warehouse(stateDir)
    TopicCatalog.createTopic(spark, wh, Topic, 2 * appenders)

    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    import scala.jdk.CollectionConverters._
    val t0 = System.nanoTime()
    val procs = (0 until appenders).map { wid =>
      val cmd = Seq(javaBin) ++ addOpens ++ Seq(
        "-Xmx4g", "-cp", System.getProperty("java.class.path"),
        "graft.tools.LockSoak", "--worker", stateDir, wid.toString,
        rounds.toString)
      wid -> new ProcessBuilder(cmd.asJava)
        .redirectErrorStream(true)
        .redirectOutput(new java.io.File(s"/tmp/lock_soak_w$wid.log"))
        .start()
    }
    val exits = procs.map { case (wid, p) =>
      val done = p.waitFor(30, java.util.concurrent.TimeUnit.MINUTES)
      if (!done) p.destroyForcibly()
      wid -> (if (done) p.exitValue() else -1)
    }.toMap
    val wallSec = (System.nanoTime() - t0) / 1e9

    // --- the offsets oracle over the merged log ---
    val scan = LogReader.scan(spark, wh, Topic)
      .select(col("partition"), col("offset"), col("value")).persist()
    val total = scan.count()
    val perPart = scan.groupBy("partition")
      .agg(count(lit(1)).as("n"), min("offset").as("lo"),
        max("offset").as("hi"),
        countDistinct("offset").as("distinct_offsets"))
      .collect()
    // columns: partition, n, lo, hi, distinct_offsets — dense gapless
    // from 0 means lo == 0, hi == n-1, and no (partition, offset) collision
    val dense = perPart.forall { r =>
      r.getLong(2) == 0L && r.getLong(3) == r.getLong(1) - 1 &&
        r.getLong(4) == r.getLong(1)
    }
    // batch completeness: every (worker, round) prefix appears PerBatch times
    val perBatchCounts = scan
      .select(substring_index(col("value"), ":", 2).as("batch"))
      .groupBy("batch").agg(count(lit(1)).as("n")).collect()
    val expectedBatches = appenders * rounds
    val complete = perBatchCounts.length == expectedBatches &&
      perBatchCounts.forall(_.getLong(1) == PerBatch.toLong)
    scan.unpersist()
    val expectedTotal = appenders.toLong * rounds * PerBatch
    val ok = exits.values.forall(_ == 0) && total == expectedTotal &&
      dense && complete
    val exitsJson = exits.toSeq.sortBy(_._1)
      .map { case (w, e) => s""""w$w":$e""" }.mkString("{", ",", "}")
    val json =
      s"""{"metric":"lock_soak","appenders":$appenders,"rounds":$rounds,""" +
        s""""per_batch":$PerBatch,"rows":$total,"expected_rows":$expectedTotal,""" +
        s""""dense_gapless":$dense,"batches_complete":$complete,""" +
        f""""wall_sec":$wallSec%.1f,"worker_exits":$exitsJson,"ok":$ok}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("LOCK_SOAK.json"),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
    println(json)
    if (!ok) sys.exit(1)
  }
}
