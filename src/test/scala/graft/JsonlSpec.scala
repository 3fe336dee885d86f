package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Jsonl

/** JSONL source: pinned-schema parse, corrupt-line quarantine, round-trip
  * fidelity, and the no-shuffle scan-side plan. */
class JsonlSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("text", StringType)))

  test("round-trips documents including escapes and unicode") {
    val dir = tmpDir("jsonl-rt")
    val docs = Seq(
      (0L, "plain text"),
      (1L, "quotes \" and \\ backslash"),
      (2L, "newline\nand\ttab"),
      (3L, "unicode 中文 émoji ✓"),
      (4L, "")).toDF("id", "text")
    Jsonl.write(docs, s"$dir/d.jsonl")
    val (good, bad) = Jsonl.split(Jsonl.read(spark, s"$dir/d.jsonl", schema))
    assert(bad.count() == 0)
    val got = good.as[(Long, String)].collect().toMap
    assert(got == docs.as[(Long, String)].collect().toMap)
  }

  test("corrupt lines land in quarantine, good lines still parse") {
    val dir = tmpDir("jsonl-bad")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "mixed.jsonl"),
      java.util.Arrays.asList(
        """{"id": 1, "text": "ok one"}""",
        """{"id": 2 "text": "missing comma"}""",
        """not json at all""",
        """{"id": 3, "text": "ok two"}"""))
    val (good, bad) = Jsonl.split(Jsonl.read(spark, s"$dir/mixed.jsonl", schema))
    assert(good.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    val quarantined = bad.as[String].collect()
    assert(quarantined.length == 2)
    assert(quarantined.contains("not json at all"))
  }

  test("parses-but-missing fields yield nulls, not quarantine") {
    val dir = tmpDir("jsonl-miss")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "m.jsonl"),
      java.util.Arrays.asList("""{"id": 7}""", """{"text": "no id"}"""))
    val (good, bad) = Jsonl.split(Jsonl.read(spark, s"$dir/m.jsonl", schema))
    assert(bad.count() == 0)
    val rows = good.collect()
    assert(rows.length == 2)
    assert(rows.count(_.isNullAt(1)) == 1, "one row has null text")
    assert(rows.count(_.isNullAt(0)) == 1, "one row has null id")
  }

  test("good-path plan: single text scan, row-local parse, no shuffle") {
    val dir = tmpDir("jsonl-plan")
    Jsonl.write(Seq((1L, "a"), (2L, "b")).toDF("id", "text"), s"$dir/p.jsonl")
    val (good, _) = Jsonl.split(Jsonl.read(spark, s"$dir/p.jsonl", schema))
    good.collect()
    val plan = good.queryExecution.executedPlan
    assert(plan.collectWithSubqueries {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.isEmpty, "parse + quarantine filter must stay on the scan")
  }
}
