package graft

import graft.functions.Murmur2
import org.apache.spark.sql.functions._

class Murmur2Spec extends SparkSpec {
  import spark.implicits._

  // Golden vectors generated from an independent Python implementation of
  // the public Kafka MurmurHash2 (seed 0x9747b28c). The empty-string value
  // 275646681 matches Kafka's own published test value.
  val vectors: Seq[(String, Int, Int)] = Seq(
    ("", 275646681, 1),
    ("a", -1563381124, 0),
    ("ab", 316155434, 2),
    ("abc", 479470107, 3),
    ("abcd", -1323649548, 0),
    ("key", -1079937367, 1),
    ("test-topic", -1581882085, 3),
    ("hello world", 1221641059, 3),
    ("The quick brown fox jumps over the lazy dog", 495243318, 2),
    ("こんにちは", 761101428, 0),
    ("naïve", 452640081, 1),
    ("0", 971027396, 0),
    ("42", 417700972, 0),
    ("click", -549450089, 3),
    ("error", 1496878425, 1),
    ("purchase", 1341667394, 2),
    ("signup", -2076255174, 2),
    ("view", -1415470846, 2))

  test("scala function matches golden vectors") {
    vectors.foreach { case (k, h, p) =>
      assert(Murmur2.hashString(k) === h, s"hash($k)")
      assert(Murmur2.partition(k, 4) === p, s"partition($k, 4)")
    }
  }

  test("catalyst expression matches golden vectors (codegen path)") {
    val df = vectors.map(_._1).toDF("k")
      .withColumn("h", Murmur2.murmur2($"k"))
      .withColumn("p", Murmur2.murmur2Partition($"k", 4))
    val got = df.collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSeq
    assert(got === vectors)
  }

  test("expression handles binary input and nulls") {
    val df = Seq(Some("abc"), None).toDF("k")
      .withColumn("h", Murmur2.murmur2($"k"))
      .withColumn("hb", Murmur2.murmur2(encode($"k", "utf-8")))
    val rows = df.orderBy($"k".desc_nulls_last).collect()
    assert(rows(0).getInt(1) === 479470107)
    assert(rows(0).getInt(2) === 479470107) // same bytes → same hash
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2))
  }

  test("interpreted (non-codegen) eval agrees") {
    vectors.foreach { case (k, h, _) =>
      val e = graft.functions.Murmur2Expression(
        org.apache.spark.sql.catalyst.expressions.Literal(k))
      assert(e.eval(null) === h)
    }
  }
}
