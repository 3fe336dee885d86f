package graft

import graft.functions.{Bloom, BloomFunctions => BF}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class BloomSpec extends SparkSpec {
  import spark.implicits._

  private def u(s: String) = UTF8String.fromString(s)

  private def bloomOf(keys: Seq[String], mBits: Int = 1 << 18, k: Int = 7): Array[Byte] = {
    val bits = new Array[Byte](mBits / 8)
    keys.foreach(s => Bloom.add(bits, u(s), k))
    bits
  }

  test("no false negatives, ever") {
    val keys = (0 until 20000).map(i => s"member-$i")
    val b = bloomOf(keys)
    assert(keys.forall(s => Bloom.contains(b, u(s), 7)))
  }

  test("false-positive rate near theory on a disjoint probe set") {
    val n = 20000
    val b = bloomOf((0 until n).map(i => s"in-$i"))
    val probes = (0 until 20000).map(i => s"out-$i")
    val fp = probes.count(s => Bloom.contains(b, u(s), 7))
    val expected = Bloom.expectedFpp(1 << 18, 7, n) * probes.size
    assert(fp <= 3 * expected + 10, s"fp=$fp expected≈$expected")
  }

  test("distributed build equals local build byte-for-byte (OR is order-free)") {
    val n = 15000
    val df = spark.range(n).select(concat(lit("d"), col("id")).as("key"))
      .repartition(32)
    val dist = df.agg(BF.bloomAgg(col("key")).as("b")).head.getAs[Array[Byte]](0)
    assert(dist.sameElements(bloomOf((0 until n).map(i => s"d$i"))))
  }

  test("mightContain prunes inside whole-stage codegen") {
    val b = bloomOf((0 until 100).map(i => s"k$i"), mBits = 1 << 12)
    val df = spark.range(10000)
      .select(concat(lit("k"), col("id")).as("key"))
      .filter(BF.mightContain(b, col("key")))
    val rows = df.collect()
    // all 100 members survive; false positives are few at this sizing
    assert(rows.length >= 100 && rows.length < 300, s"survivors=${rows.length}")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"),
      s"bloom filter fell out of whole-stage codegen:\n$plan")
  }

  test("anti-join split: definite-no ∪ exact-anti(maybe) equals plain anti") {
    val corpus = (0 until 5000).map(i => s"c$i")
    val seen = corpus.filter(_.hashCode % 3 == 0)
    val b = bloomOf(seen)
    val corpusDf = corpus.toDF("key").repartition(8)
    val seenDf = seen.toDF("seen")
    val definiteNo = corpusDf.filter(!BF.mightContain(b, col("key")))
    val maybe = corpusDf.filter(BF.mightContain(b, col("key")))
      .join(seenDf, col("key") === col("seen"), "left_anti")
    val split = definiteNo.unionByName(maybe).orderBy("key").as[String].collect()
    val plain = corpusDf.join(seenDf, col("key") === col("seen"), "left_anti")
      .orderBy("key").as[String].collect()
    assert(split.sameElements(plain))
    // and the bloom did real work: most non-members skipped the join
    assert(definiteNo.count() > (corpus.size - seen.size) * 8 / 10)
  }

  test("anti-join split keeps null-key rows (they are definite anti-join results)") {
    // mightContain(null) is null: a naive split drops null keys from BOTH
    // branches, while the plain anti join keeps them (null never matches
    // under null-unsafe equality). The query routes nulls to definite-no.
    val seen = Seq("k1", "k3")
    val b = bloomOf(seen)
    val corpusDf = Seq(Some("k1"), Some("k2"), None, Some("k4"))
      .toDF("key").repartition(2)
    val seenDf = seen.toDF("seen")
    val definiteNo = corpusDf.filter(
      col("key").isNull || !BF.mightContain(b, col("key")))
    val maybe = corpusDf.filter(BF.mightContain(b, col("key")))
      .join(seenDf, col("key") === col("seen"), "left_anti")
    val split = definiteNo.unionByName(maybe)
      .orderBy(col("key").asc_nulls_first).as[Option[String]].collect()
    val plain = corpusDf.join(seenDf, col("key") === col("seen"), "left_anti")
      .orderBy(col("key").asc_nulls_first).as[Option[String]].collect()
    assert(split.sameElements(plain))
    assert(split.contains(None))
  }

  test("merge across sketch-sized partials is associative") {
    val a = bloomOf(Seq("x1", "x2"), mBits = 1 << 10)
    val b2 = bloomOf(Seq("y1"), mBits = 1 << 10)
    val c = bloomOf(Seq("z1", "z2"), mBits = 1 << 10)
    val left = Bloom.mergeInto(Bloom.mergeInto(a.clone(), b2), c)
    val right = Bloom.mergeInto(a.clone(), Bloom.mergeInto(b2.clone(), c))
    assert(left.sameElements(right))
    assert(left.sameElements(bloomOf(Seq("x1", "x2", "y1", "z1", "z2"), mBits = 1 << 10)))
  }
}
