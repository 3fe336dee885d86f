package graft

import org.apache.spark.sql.functions._

import graft.functions.PhraseFunctions

/** Aho–Corasick blocklist matching: contains-equivalence, overlap and
  * suffix-phrase cases, determinism, and codegen. */
class PhraseSpec extends SparkSpec {
  import spark.implicits._

  test("hits == per-phrase contains on the real corpus") {
    val phrases = Seq("agg row scan", "window merge", "slow fast",
      "the join", "data window", "zz never occurs zz")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = docs.select(col("doc_id"),
        PhraseFunctions.phraseHits(col("text"), phrases).as("hits"))
      .as[(Long, String)].collect().toMap
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect()
    assert(texts.nonEmpty)
    var anyHit = false
    texts.foreach { case (id, text) =>
      val expected = phrases.filter(text.contains).sorted.mkString(",")
      assert(got(id) == expected, s"doc $id")
      if (expected.nonEmpty) anyHit = true
    }
    assert(anyHit, "phrase set should actually fire on the corpus")
  }

  test("overlapping matches and phrases that are suffixes of others") {
    val phrases = Seq("aba", "ba", "abab", "xyz")
    val df = Seq(
      (0L, "ababa"),     // aba (twice, overlapping), ba, abab
      (1L, "ba"),        // ba only
      (2L, "abxyzab"),   // xyz only
      (3L, "")).toDF("id", "text")
    val got = df.select(col("id"),
        PhraseFunctions.phraseHits(col("text"), phrases).as("hits"))
      .as[(Long, String)].collect().toMap
    assert(got(0L) == "aba,abab,ba")
    assert(got(1L) == "ba")
    assert(got(2L) == "xyz")
    assert(got(3L) == "")
  }

  test("property: automaton == naive multi-contains on random phrase sets") {
    // small alphabet forces dense overlaps; generated sets deliberately
    // include phrases that are suffixes/prefixes/substrings of each other
    val rnd = new scala.util.Random(7)
    def randStr(maxLen: Int): String =
      Seq.fill(1 + rnd.nextInt(maxLen))("ab" (rnd.nextInt(2))).mkString
    (0 until 20).foreach { round =>
      val base = Seq.fill(3 + rnd.nextInt(4))(randStr(5)).distinct
      // add suffixes and prefixes of existing phrases to stress fail links
      val phrases = (base ++
        base.filter(_.length > 1).map(_.tail) ++
        base.filter(_.length > 1).map(_.init)).distinct
        .filter(_.nonEmpty)
      val texts = (0 until 40).map(i => (i.toLong, randStr(24)))
      val got = texts.toDF("id", "text")
        .select(col("id"),
          PhraseFunctions.phraseHits(col("text"), phrases).as("hits"))
        .as[(Long, String)].collect().toMap
      texts.foreach { case (id, t) =>
        val expected = phrases.filter(t.contains(_)).sorted.mkString(",")
        assert(got(id) === expected,
          s"round $round text='$t' phrases=${phrases.mkString("|")}")
      }
    }
  }

  test("scan plan: no shuffle, matcher inside whole-stage codegen") {
    val dir = tmpDir("phrase-plan")
    Seq((1L, "a window merge b")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/d")
    val docs = spark.read.parquet(s"$dir/d")
    val q = docs.select(
      PhraseFunctions.phraseHits(col("text"), Seq("window merge")).as("h"))
    q.collect()
    val plan = q.queryExecution.executedPlan
    assert(plan.collectWithSubqueries {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.isEmpty)
    assert(plan.collectWithSubqueries {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.nonEmpty)
  }

  test("rejects phrases the output encoding cannot carry") {
    intercept[IllegalArgumentException] {
      PhraseFunctions.phraseHits(col("text"), Seq("has,comma"))
    }
    intercept[IllegalArgumentException] {
      PhraseFunctions.phraseHits(col("text"), Seq(""))
    }
  }
}
