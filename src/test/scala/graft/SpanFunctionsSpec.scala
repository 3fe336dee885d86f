package graft

import org.apache.spark.sql.functions._
import graft.functions.{SpanFunctions, TextFunctions => T}

/** [[SpanFunctions.spanRemove]] — the O(doc) sorted-interval merge must
  * equal the declarative covered-array spelling on arbitrary inputs. */
class SpanFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("spanRemove ≡ declarative covered-array spelling on random inputs") {
    val rnd = new scala.util.Random(42)
    val k = 3
    val rows = (0 until 200).map { i =>
      val n = rnd.nextInt(30) // 0..29 words
      val text = Seq.tabulate(n)(j => s"w${rnd.nextInt(8)}_$j").mkString(" ")
      val m = if (n < k) 0 else rnd.nextInt(6)
      // duplicate, unordered, overlapping starts on purpose
      val starts = Seq.fill(m)(rnd.nextInt(n - k + 1))
      (i.toLong, text, starts)
    }
    val df = rows.toDF("id", "text", "starts")
      .withColumn("w", T.tokens(col("text")))
    val both = df
      .withColumn("__sp", SpanFunctions.spanRemove(col("w"), col("starts"), k))
      .withColumn("covered",
        array_distinct(flatten(transform(col("starts"),
          p => sequence(p, p + (k - 1))))))
      .select(
        col("id"),
        col("__sp.removed_words").as("fastRemoved"),
        col("__sp.kept_text").as("fastKept"),
        size(col("covered")).as("slowRemoved"),
        array_join(
          filter(col("w"), (_, i) => !array_contains(col("covered"), i)),
          " ").as("slowKept"))
      .collect()
    both.foreach { r =>
      assert(r.getInt(1) === r.getInt(3), s"removed mismatch id=${r.getLong(0)}")
      assert(r.getString(2) === r.getString(4), s"kept mismatch id=${r.getLong(0)}")
    }
  }

  test("spanRemove: full coverage, no coverage, empty doc") {
    val df = Seq(
      (1L, "a b c d e", Seq(0, 1, 2)), // covers everything (k=3)
      (2L, "a b c d e", Seq.empty[Int]),
      (3L, "", Seq.empty[Int])
    ).toDF("id", "text", "starts")
      .withColumn("w", T.tokens(col("text")))
      .withColumn("__sp", SpanFunctions.spanRemove(col("w"), col("starts"), 3))
      .select(col("id"), col("__sp.removed_words"), col("__sp.kept_text"))
      .orderBy("id").collect()
    assert(df(0).getInt(1) === 5 && df(0).getString(2) === "")
    assert(df(1).getInt(1) === 0 && df(1).getString(2) === "a b c d e")
    assert(df(2).getInt(1) === 0 && df(2).getString(2) === "")
  }
}
