package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.core.LivenessConfig
import graft.streaming.Liveness

/** Scale soak of [[Liveness.track]] (mapGroupsWithState with
  * processing-time timeouts): `members` member heartbeat stream over
  * `batches` triggers with rotating silence churn — a tenth of the fleet
  * goes quiet each trigger (a different tenth every time), times out, and
  * revives with a REBALANCE directive when its cohort beats again.
  *
  * Pins the two scale claims a 10k-member control plane needs:
  *   - STATE SIZE IS BOUNDED: the state store holds exactly one row per
  *     member ever seen — churn must not leak rows;
  *   - PER-TRIGGER COST IS FLAT: the last third's median trigger wall
  *     stays within 1.5× the first third's (state growth, timeout sweep
  *     cost, or shuffle regression would all surface here).
  *
  * {{{ runMain graft.tools.GroupSoak [members] [batches] }}}
  * Prints one JSON line; writes LIVENESS_SOAK.json. */
object GroupSoak {
  def main(args: Array[String]): Unit = {
    val members = args.lift(0).map(_.toInt).getOrElse(10000)
    val batches = args.lift(1).map(_.toInt).getOrElse(24)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("graft-group-soak").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[Liveness.Heartbeat]
    // short timeout so silence converts to timed-out state WITHIN the run
    val cfg = LivenessConfig(heartbeatIntervalMs = 100, missedThreshold = 3)
    val q = Liveness.track(spark, input.toDS(), cfg)
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("liveness_soak")
      .start()

    val walls = scala.collection.mutable.ArrayBuffer.empty[Double]
    var stateRows = 0L
    try {
      for (b <- 0 until batches) {
        // rotating churn: cohort (b % 10) goes silent this trigger
        val beats = (0 until members)
          .filter(m => m % 10 != b % 10)
          .map(m => Liveness.Heartbeat(
            f"member-$m%05d", ts = b.toLong * 1000 + m, seq = b.toLong,
            partitionCount = m % 64))
        val t0 = System.nanoTime()
        input.addData(beats)
        q.processAllAvailable()
        walls += (System.nanoTime() - t0) / 1e9
        Option(q.lastProgress).foreach { p =>
          if (p.stateOperators.nonEmpty)
            stateRows = p.stateOperators(0).numRowsTotal
        }
        if (b % 5 == 0)
          println(f"== soak trigger=$b wall=${walls.last}%.2f stateRows=$stateRows")
        // give processing-time timeouts a chance to fire between triggers
        Thread.sleep(120)
      }
      // drain one empty trigger so pending timeouts surface
      input.addData(Seq(Liveness.Heartbeat("member-00000", 999999L, 999L, 0)))
      q.processAllAvailable()
      Option(q.lastProgress).foreach { p =>
        if (p.stateOperators.nonEmpty)
          stateRows = p.stateOperators(0).numRowsTotal
      }
    } finally q.stop()

    val out = spark.table("liveness_soak")
    val revived = out.filter($"revivals" > 0)
      .select("memberId").distinct().count()
    val timedOut = out.filter(!$"alive").select("memberId").distinct().count()
    val third = math.max(1, walls.size / 3)
    def median(xs: scala.collection.Seq[Double]): Double = {
      val s = xs.sorted; s(s.size / 2)
    }
    val early = median(walls.take(third))
    val late = median(walls.takeRight(third))
    val ok = stateRows == members.toLong && late <= 1.5 * early &&
      timedOut > 0 && revived > 0
    val json =
      s"""{"metric":"liveness_soak","members":$members,"triggers":${walls.size},""" +
        f""""early_median_sec":$early%.3f,"late_median_sec":$late%.3f,""" +
        s""""state_rows":$stateRows,"timed_out_members":$timedOut,""" +
        s""""revived_members":$revived,"ok":$ok}"""
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get("LIVENESS_SOAK.json"),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
