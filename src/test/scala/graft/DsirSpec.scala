package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.TextFunctions
import graft.pipeline.Dsir

/** DSIR importance resampling [Xie et al. 2023]: model fit, the codegen'd
  * weight fold, Gumbel top-k determinism, and the no-shuffle scoring plan. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // target docs speak vocab A, background vocab B, one mixed
  private val corpus = Seq(
    (0L, "alpha beta gamma alpha beta", true),
    (1L, "beta gamma alpha beta gamma alpha", true),
    (2L, "delta epsilon zeta delta epsilon", false),
    (3L, "epsilon zeta delta zeta delta zeta", false),
    (4L, "alpha delta alpha delta", false),
    (5L, "", false))

  private def df = corpus.toDF("id", "text", "is_target")

  /** The exact gram stream the Spark side builds: lowercase whitespace
    * unigrams then adjacent bigrams, document order. */
  private def gramsOf(text: String): Seq[String] = {
    val t = text.trim.toLowerCase
    if (t.isEmpty) Seq.empty
    else {
      val toks = t.split("\\s+").toSeq
      toks ++ toks.zip(toks.drop(1)).map { case (a, b) => s"$a $b" }
    }
  }

  private def bucketOf(gram: String): Int =
    java.lang.Math.floorMod(
      TextFunctions.fnv1a64(UTF8String.fromString(gram)), 256L).toInt

  test("fit counts grams per bucket with add-one smoothing") {
    val m = Dsir.fit(df, col("text"), col("is_target"), nBuckets = 256)
    val all = corpus.flatMap(c => gramsOf(c._2))
    val tgt = corpus.filter(_._3).flatMap(c => gramsOf(c._2))
    assert(m.rawGrams == all.size)
    assert(m.targetGrams == tgt.size)
    // replay λ for one bucket that target grams hit
    val b = bucketOf("alpha")
    val rawB = all.count(g => bucketOf(g) == b)
    val tgtB = tgt.count(g => bucketOf(g) == b)
    val expected =
      math.log((tgtB + 1.0) / (m.targetGrams + 256.0)) -
        math.log((rawB + 1.0) / (m.rawGrams + 256.0))
    assert(m.lambda(b) == expected)
  }

  test("logWeight is the ordered λ fold over the doc's gram buckets — bit-exact") {
    val m = Dsir.fit(df, col("text"), col("is_target"), nBuckets = 256)
    val got = df.select(col("id"), Dsir.logWeight(m, col("text")).as("w"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    corpus.foreach { case (id, text, _) =>
      var acc = 0.0
      gramsOf(text).foreach(g => acc += m.lambda(bucketOf(g)))
      assert(got(id) == acc, s"doc $id")
    }
    // empty doc folds to exactly 0.0
    assert(got(5L) == 0.0)
  }

  test("target-vocab docs outweigh background docs; mixed doc sits between") {
    // replicate the corpus so real counts dominate the +1/+B smoothing
    // (at 6 docs the smoothing term swamps every λ toward the prior)
    val big = (0 until 100).flatMap(r =>
      corpus.map { case (id, tx, tg) => (r * 10L + id, tx, tg) })
      .toDF("id", "text", "is_target")
    val m = Dsir.fit(big, col("text"), col("is_target"), nBuckets = 256)
    val w = big.filter(col("id") < 6)
      .select(col("id"), Dsir.logWeight(m, col("text")).as("w"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w(0L) > 0 && w(1L) > 0, "target-like docs should score positive")
    assert(w(2L) < 0 && w(3L) < 0, "background docs should score negative")
    assert(w(4L) < w(0L) && w(4L) > w(2L), "mixed doc between the clusters")
  }

  test("scoring plan: row-local — no shuffle, fold inside codegen") {
    // parquet-backed so ConvertToLocalRelation cannot pre-evaluate the fold
    val dir = tmpDir("dsir")
    df.write.mode("overwrite").parquet(s"$dir/docs")
    val docs = spark.read.parquet(s"$dir/docs")
    val m = Dsir.fit(docs, col("text"), col("is_target"), nBuckets = 256)
    val scored = docs.select(col("id"), Dsir.logWeight(m, col("text")).as("w"))
    scored.collect()
    val plan = scored.queryExecution.executedPlan
    assert(plan.collectWithSubqueries {
      case e: ShuffleExchangeExec => e
    }.isEmpty, "weight scoring must not shuffle")
    assert(plan.collectWithSubqueries {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.nonEmpty, "fold should stay inside whole-stage codegen")
  }

  test("resample: exactly k rows, deterministic, ranked by rounded score") {
    val m = Dsir.fit(df, col("text"), col("is_target"), nBuckets = 256)
    val a = Dsir.resample(df, col("id"), col("text"), m, k = 3)
      .select("id", "score").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val b = Dsir.resample(df, col("id"), col("text"), m, k = 3)
      .select("id", "score").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(a.length == 3)
    assert(a.toSeq == b.toSeq, "per-id Gumbel noise ⇒ identical reruns")
    val scores = a.map(_._2)
    assert(scores.sorted.reverse.toSeq == scores.toSeq, "descending by score")
  }

  test("fused bucket expression ≡ declarative transform/zip_with spelling") {
    val exprs = df.select(
      Dsir.buckets(col("text"), 256).as("fused"),
      Dsir.bucketsDeclarative(col("text"), 256).as("decl"))
      .collect()
    exprs.foreach { r =>
      assert(r.getSeq[Int](0) == r.getSeq[Int](1))
    }
  }

  test("fused ≡ declarative on hostile whitespace (tabs, newlines, empties)") {
    // trim() strips spaces only, so leading \t/\n survive into split and
    // produce empty fragments — the fused path must drop them exactly as
    // the declarative filter does, for EVERY spelling of emptiness
    import spark.implicits._
    val nasty = Seq(
      "\tTabbed lead", "\nNewline lead", "trailing tab\t", "",
      "   ", "\t", "\n \t ", "mid\t\ttabs here", "one",
      " \t Mixed nbsp lead", "UPPER case MiX").toDF("text")
    val rows = nasty.select(
      Dsir.buckets(col("text"), 256).as("fused"),
      Dsir.bucketsDeclarative(col("text"), 256).as("decl"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Int](0) == r.getSeq[Int](1))
    }
    // whitespace-only docs produce NO grams (so no importance weight)
    val empties = nasty.filter(length(trim(col("text"), " \t\n")) === 0)
      .select(Dsir.buckets(col("text"), 256).as("b")).collect()
    empties.foreach(r => assert(r.getSeq[Int](0).isEmpty))
  }

  test("buckets rejects a non-power-of-two bucket count") {
    intercept[IllegalArgumentException] {
      Dsir.buckets(col("text"), 100)
    }
  }
}
