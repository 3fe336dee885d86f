package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import graft.core.catalog.{TopicCatalog, Warehouse}
import graft.core.log.{LogReader, LogWriter}
import graft.pipeline.LshIndex
import graft.tools.CurateCrash

/** End-to-end exactly-once proof for the COMPOSED curation pipeline
  * ([[graft.streaming.Curation]]) across a REAL process boundary: a batch
  * that ran the entire body — consume → gopher → chunk → LSH ingest →
  * curated append — and crashed before the engine's commit is replayed
  * from a fresh JVM into a no-op: every curated chunk lands exactly once,
  * dedup verdicts are identical, and new data still flows afterwards.
  * Drives [[graft.tools.CurateCrash]] in child JVMs (the
  * [[ConsumeCrashSpec]] mold applied to the full composition). */
class CurateCrashSpec extends SparkSpec {
  import spark.implicits._

  // 20 tokens each — passes the harness's overridden gopher bands and
  // yields exactly 2 chunks at chunkSize=16/overlap=4 (ceil(16/12) = 2)
  private val textA =
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet " +
      "kilo lima mike november oscar papa quebec romeo sierra tango"
  private val textE =
    "apple banana cherry durian elder figs grape honey icecream jackfruit " +
      "kiwi lemon mango nectar orange peach quince raspberry strawberry tomato"

  private def records(rows: (Long, String)*) =
    rows.toDF("ts", "value")
      .withColumn("key", concat(lit("doc-"), col("ts")))
      .withColumn("explicit_partition", lit(0))
      .withColumn("id", col("ts"))

  private def runChild(mode: String, wh: String, ckpt: String,
      index: String, out: String, spanIndex: String = "-",
      srpIndex: String = "-", dsir: String = "-"): Int = {
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
      "graft.tools.CurateCrash", mode, wh, ckpt, index, out,
      spanIndex, srpIndex, dsir)
    val p = new ProcessBuilder(cmd.asJava)
      .redirectErrorStream(true)
      .redirectOutput(new java.io.File(s"$out.log"))
      .start()
    assert(p.waitFor(180, java.util.concurrent.TimeUnit.SECONDS),
      s"$mode child JVM must finish")
    p.exitValue()
  }

  private def outLines(path: String): Seq[(Long, Long)] =
    Files.readAllLines(Paths.get(path)).asScala.toSeq.filter(_.nonEmpty).map { l =>
      val Array(id, n) = l.trim.split(" ")
      (id.toLong, n.toLong)
    }

  private def curatedKeys(wh: Warehouse): Map[String, Long] =
    LogReader.scan(spark, wh, "curated")
      .groupBy("key").count()
      .as[(String, Long)].collect().toMap

  test("full pipeline batch crashed after ALL side effects replays to a no-op from a new JVM") {
    val whDir = tmpDir("graft-curate-xjvm")
    val wh = Warehouse(whDir)
    // raw topic single-partition: docId = offset, so curated keys are
    // predictable "offset/chunk"
    TopicCatalog.createTopic(spark, wh, "docs", 1)
    TopicCatalog.createTopic(spark, wh, "curated", 2)
    val index = s"${tmpDir("graft-curate-idx")}/lsh"
    LshIndex.build(
      // sentinel id OUTSIDE the packed chunk-uid space: ids must be
      // unique per index (uid packing guarantees it in the pipeline);
      // id 0 would collide with chunkUid(doc 0, chunk 0) = 0 and make
      // the verify join's shingle pick arbitrary
      Seq((999999999999L, "seed sentinel text unrelated to every real document body"))
        .toDF("doc_id", "text"),
      $"doc_id", $"text", index,
      shingleSize = 5, numHashes = 128, bands = 16)

    // batch 1: A curates to 2 chunks; B is an exact dup of A (loses the
    // within-batch tie); C fails the gopher token floor
    LogWriter.append(spark, wh, "docs",
      records(0L -> textA, 1L -> textA, 2L -> "too short"), "id")

    val ckpt = tmpDir("graft-curate-ckpt")
    val out1 = s"${tmpDir("graft-curate-out")}/crash.txt"
    val out2 = s"${tmpDir("graft-curate-out")}/resume.txt"

    assert(runChild("crash", whDir, ckpt, index, out1) === 0,
      s"crash child must surface the injected failure (log: $out1.log)")
    assert(outLines(out1) === Seq((0L, 3L)), "crash run saw the whole log")
    // the crashed batch's side effects DID land: A's chunks are curated
    assert(curatedKeys(wh) === Map("0/0" -> 1L, "0/1" -> 1L))

    // the raw log grows while the pipeline is down: D exact-dups A
    // (cross-batch — only the on-disk index can catch it), E is novel
    LogWriter.append(spark, wh, "docs",
      records(3L -> textA, 4L -> textE), "id")

    assert(runChild("resume", whDir, ckpt, index, out2) === 0,
      s"resume child must drain cleanly (log: $out2.log)")
    // replay of the crashed batch (same id, same 3 records), then the new 2
    assert(outLines(out2) === Seq((0L, 3L), (1L, 2L)))

    // THE claim: exactly-once end to end. The replayed batch re-derived
    // identical survivors and its curated append no-opped (batchId skip);
    // the new batch's dup-of-A was dropped by the INDEX (previous batch's
    // state), and only E's chunks appended
    assert(curatedKeys(wh) ===
      Map("0/0" -> 1L, "0/1" -> 1L, "4/0" -> 1L, "4/1" -> 1L))
  }

  test("fitted-DSIR extraFilter stage crash-replays to a no-op (model-driven selection)") {
    // textE IS the fit corpus's target doc (logw +3.04 at 16 buckets) and
    // textA its raw doc (−7.41): the filter keeps E, cuts A. textV is
    // vocabulary NEITHER side saw (+0.92 — unseen buckets inherit the
    // positive raw/target prior), so a genuinely novel doc still flows.
    // Values replayed outside Spark; both child JVMs re-fit identically.
    val textV =
      "asparagus broccoli cabbage daikon endive fennel garlic horseradish " +
        "iceberg jicama kale leek mushroom nappa onion parsnip quinoa " +
        "radish spinach turnip"
    val whDir = tmpDir("graft-curated-xjvm")
    val wh = Warehouse(whDir)
    TopicCatalog.createTopic(spark, wh, "docs", 1)
    TopicCatalog.createTopic(spark, wh, "curated", 2)
    val index = s"${tmpDir("graft-curated-idx")}/lsh"
    LshIndex.build(
      Seq((999999999999L, "seed sentinel text unrelated to every real document body"))
        .toDF("doc_id", "text"),
      $"doc_id", $"text", index,
      shingleSize = 5, numHashes = 128, bands = 16)

    // batch 1: E passes gopher AND the DSIR filter (2 chunks); A passes
    // gopher but the model cuts it; the short doc fails gopher
    LogWriter.append(spark, wh, "docs",
      records(0L -> CurateCrash.FitTarget, 1L -> CurateCrash.FitRaw,
        2L -> "too short"), "id")

    val ckpt = tmpDir("graft-curated-ckpt")
    val out1 = s"${tmpDir("graft-curated-out")}/crash.txt"
    val out2 = s"${tmpDir("graft-curated-out")}/resume.txt"

    assert(runChild("crash", whDir, ckpt, index, out1, dsir = "dsir") === 0,
      s"crash child must surface the injected failure (log: $out1.log)")
    assert(outLines(out1) === Seq((0L, 3L)))
    // only E curated: the fitted filter cut A BEFORE any index touched it
    assert(curatedKeys(wh) === Map("0/0" -> 1L, "0/1" -> 1L))

    // while down: another copy of A (must be cut AGAIN, by the replayed
    // filter, not by the index) and the novel V (must flow)
    LogWriter.append(spark, wh, "docs",
      records(3L -> CurateCrash.FitRaw, 4L -> textV), "id")

    assert(runChild("resume", whDir, ckpt, index, out2, dsir = "dsir") === 0,
      s"resume child must drain cleanly (log: $out2.log)")
    assert(outLines(out2) === Seq((0L, 3L), (1L, 2L)))
    // exactly-once THROUGH the model stage: the replayed batch re-derived
    // the identical keep set from the re-fit model (no dup of E, A still
    // absent), and V's chunks appended once
    assert(curatedKeys(wh) ===
      Map("0/0" -> 1L, "0/1" -> 1L, "4/0" -> 1L, "4/1" -> 1L))
  }

  test("FULL composition (embedding + span + LSH stages) crash-replays to a no-op") {
    val whDir = tmpDir("graft-curatef-xjvm")
    val wh = Warehouse(whDir)
    TopicCatalog.createTopic(spark, wh, "docs", 1)
    TopicCatalog.createTopic(spark, wh, "curated", 2)
    val sentinel =
      Seq((1000000L, "seed sentinel text unrelated to every real document body"))
        .toDF("doc_id", "text")
    val index = s"${tmpDir("graft-curatef-idx")}/lsh"
    LshIndex.build(sentinel, $"doc_id", $"text", index,
      shingleSize = 5, numHashes = 128, bands = 16)
    val spanIndex = s"${tmpDir("graft-curatef-idx")}/span"
    graft.pipeline.SpanIndex.build(sentinel, $"doc_id", $"text", spanIndex,
      k = 5)
    val srpIndex = s"${tmpDir("graft-curatef-idx")}/srp"
    graft.pipeline.SrpIndex.build(
      sentinel.withColumn("emb", CurateCrash.fakeEmbedding),
      $"doc_id", $"emb", srpIndex)

    // batch 1: A curates to 2 chunks (unique text — no span cut, no
    // embedding neighbor); the short doc fails gopher
    LogWriter.append(spark, wh, "docs",
      records(0L -> textA, 1L -> "too short"), "id")

    val ckpt = tmpDir("graft-curatef-ckpt")
    val out1 = s"${tmpDir("graft-curatef-out")}/crash.txt"
    val out2 = s"${tmpDir("graft-curatef-out")}/resume.txt"

    assert(runChild("crash", whDir, ckpt, index, out1, spanIndex, srpIndex)
      === 0, s"crash child must surface the injected failure (log: $out1.log)")
    assert(outLines(out1) === Seq((0L, 2L)))
    // the crashed batch's side effects landed across ALL THREE indexes
    assert(curatedKeys(wh) === Map("0/0" -> 1L, "0/1" -> 1L))

    // while down: an exact text dup of A (same embedding -> SRP drop;
    // were it to pass, the span index would cut every gram anyway), and
    // a novel doc E
    LogWriter.append(spark, wh, "docs",
      records(2L -> textA, 3L -> textE), "id")

    assert(runChild("resume", whDir, ckpt, index, out2, spanIndex, srpIndex)
      === 0, s"resume child must drain cleanly (log: $out2.log)")
    // replay of the crashed batch first: A must NOT self-match in any of
    // the three indexes it already appended to (id-equal/owner guards)
    assert(outLines(out2) === Seq((0L, 2L), (1L, 2L)))
    assert(curatedKeys(wh) ===
      Map("0/0" -> 1L, "0/1" -> 1L, "3/0" -> 1L, "3/1" -> 1L))
  }
}
