package graft

import org.apache.spark.sql.functions._

import graft.pipeline.QualityClassifier

/** Trained quality filter ([[graft.pipeline.QualityClassifier]]):
  * learning on a planted signal, bit-determinism across partitionings,
  * score semantics, and the codegen-only contract on both the fit
  * aggregates and the scoring projection. */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def strict[A](f: => A): A = {
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try f finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
  }

  /** Synthetic corpus with a plantable signal: positives read like
    * prose (stopwords, sentence punctuation), negatives are digit
    * noise. Deterministic — no RNG. */
  private def planted(n: Int) = {
    val rows = (0 until n).map { i =>
      if (i % 2 == 0)
        (i.toLong, ("the quick brown fox is on the hill and it was " +
          s"a fine day for all of us, really. item $i.") * (1 + i % 3), 1.0)
      else
        (i.toLong, (s"4823${i}99 77${i} 0x1F ${i * 7919} 00 11 22 33 " +
          s"44556677 ${i} 8899 ") * (1 + i % 3), 0.0)
    }
    rows.toDF("id", "text", "y")
  }

  test("fit recovers the planted quality signal on held-out docs") {
    val train = planted(200).filter($"id" < 160)
    val test = planted(200).filter($"id" >= 160)
    val m = QualityClassifier.fit(
      train, QualityClassifier.features($"text"), $"y", iters = 30, lr = 0.5)
    val scored = test.select($"y",
        QualityClassifier.score(QualityClassifier.features($"text"), m).as("p"))
      .as[(Double, Double)].collect()
    val acc = scored.count { case (y, p) => (p >= 0.5) == (y == 1.0) }
      .toDouble / scored.length
    assert(acc >= 0.9, f"held-out accuracy $acc%.2f")
    // the signal-bearing ratios pull in the right direction
    assert(m.weights(3) > 0, s"stopword-ratio weight ${m.weights(3)}")
    assert(m.weights(6) < 0, s"digit-ratio weight ${m.weights(6)}")
  }

  test("weights are bit-identical across partitionings and reruns") {
    val docs = planted(300)
    def w(parts: Int) = QualityClassifier.fit(
      docs.repartition(parts), QualityClassifier.features($"text"), $"y",
      iters = 10, lr = 0.5).weights
    val a = w(1); val b = w(13); val c = w(13)
    assert(a === b)
    assert(b === c)
    // 9-dp rounding contract
    assert(a.forall(v => (v * 1e9).round.toDouble / 1e9 == v))
  }

  test("scores are clamped to [0,1] and keep tracks the 0.5 threshold") {
    val docs = planted(100)
    val m = QualityClassifier.Model(
      IndexedSeq(2.5, 1.0, -8.0, 3.0, -1.0, 0.5, -9.0)) // saturating weights
    val got = docs.select(
        QualityClassifier.score(QualityClassifier.features($"text"), m).as("p"))
      .as[Double].collect()
    assert(got.forall(p => p >= 0.0 && p <= 1.0))
    assert(got.exists(_ == 0.0) || got.exists(_ == 1.0),
      "saturating weights should clamp at least one score")
  }

  test("fit and score run codegen-only; the score plan carries no array") {
    val docs = planted(120)
    strict {
      val m = QualityClassifier.fit(
        docs, QualityClassifier.features($"text"), $"y", iters = 3, lr = 0.5)
      val q = docs.select($"id",
        QualityClassifier.score(QualityClassifier.features($"text"), m).as("p"))
      q.collect()
      // SimplifyExtractValueOps must have dissolved getItem(CreateArray):
      // the scoring projection reads six scalar ratios, never an array
      val plan = q.queryExecution.optimizedPlan.toString
      assert(!plan.contains("array("), plan)
    }
  }
}
