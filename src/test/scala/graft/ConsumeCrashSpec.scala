package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import graft.core.catalog.{TopicCatalog, Warehouse}
import graft.core.log.LogWriter

/** Crash-replay across a REAL process boundary: the consumer's exactly-once
  * story says a batch whose sink ran but whose commit never landed is
  * replayed with the IDENTICAL pinned range — even from a fresh JVM where no
  * in-memory state (IndexCache, stream instance, checkpoint caches)
  * survives, and even though the log grew in between. Same-JVM restarts are
  * covered in [[GroupsStreamingSpec]]; this drives [[graft.tools.ConsumeCrash]]
  * in two child JVMs against one shared warehouse + checkpoint.
  */
class ConsumeCrashSpec extends SparkSpec {

  private def records(n: Int, from: Int = 0) = {
    import spark.implicits._
    (from until from + n)
      .map(i => (i.toLong, s"k$i", s"v$i"))
      .toDF("ts", "key", "value")
      .withColumn("id", col("ts"))
  }

  private def runChild(mode: String, wh: String, ckpt: String, out: String): Int = {
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
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx2g", "-cp", System.getProperty("java.class.path"),
      "graft.tools.ConsumeCrash", mode, wh, ckpt, out)
    val p = new ProcessBuilder(cmd.asJava)
      .redirectErrorStream(true)
      .redirectOutput(new java.io.File(s"$out.log"))
      .start()
    assert(p.waitFor(180, java.util.concurrent.TimeUnit.SECONDS),
      s"$mode child JVM must finish")
    p.exitValue()
  }

  private def lines(path: String): Seq[(Long, Long, Long, Long)] =
    Files.readAllLines(Paths.get(path)).asScala.toSeq.filter(_.nonEmpty).map { l =>
      val Array(id, n, lo, hi) = l.trim.split(" ")
      (id.toLong, n.toLong, lo.toLong, hi.toLong)
    }

  test("a batch crashed after delivery is replayed from a NEW process with the identical range") {
    val whDir = tmpDir("graft-xjvm-consume")
    val wh = Warehouse(whDir)
    TopicCatalog.createTopic(spark, wh, "t", 2)
    LogWriter.append(spark, wh, "t", records(50), "id")
    val ckpt = tmpDir("graft-xjvm-ckpt")
    val out1 = s"${tmpDir("graft-xjvm-out")}/crash.txt"
    val out2 = s"${tmpDir("graft-xjvm-out")}/resume.txt"

    // JVM 1: delivers the 50 records, then the sink throws — the batch's
    // intent file is on disk, the engine's commit is not
    assert(runChild("crash", whDir, ckpt, out1) === 0,
      s"crash child must surface the injected failure (log: $out1.log)")
    val crashed = lines(out1)
    assert(crashed.size === 1)
    val (cid, cn, clo, chi) = crashed.head
    assert(cn === 50L, "crash run was handed the whole log")

    // the log grows between the crash and the restart
    LogWriter.append(spark, wh, "t", records(30, from = 50), "id")

    // JVM 2 (fresh process, cold caches): the engine replays the crashed
    // batchId first — same id, same 50 records, same offset range, NOT the
    // grown log — then a new batch delivers exactly the 30 appended since
    assert(runChild("resume", whDir, ckpt, out2) === 0,
      s"resume child must drain cleanly (log: $out2.log)")
    val resumed = lines(out2)
    assert(resumed.size === 2,
      s"replay + one new batch, got: $resumed")
    assert(resumed.head === ((cid, cn, clo, chi)),
      "replayed batch must match the crashed delivery exactly")
    val (nid, nn, _, _) = resumed(1)
    assert(nid === cid + 1)
    assert(nn === 30L, "post-replay batch delivers only the new slice")
  }
}
