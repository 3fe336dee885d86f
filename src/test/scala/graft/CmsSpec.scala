package graft

import graft.functions.{Cms, CmsFunctions => CF}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class CmsSpec extends SparkSpec {
  import spark.implicits._

  private def u(s: String) = UTF8String.fromString(s)

  private def cmsOf(occurrences: Seq[String], d: Int = 4, w: Int = 16384): Array[Long] = {
    val c = new Array[Long](d * w)
    occurrences.foreach(s => Cms.add(c, u(s), d, w))
    c
  }

  test("estimate never undercounts and stays within epsilon*N") {
    // zipf-ish: key j appears 2000/j times
    val occ = (1 to 200).flatMap(j => Seq.fill(2000 / j)(s"key-$j"))
    val sk = cmsOf(occ)
    val exact = occ.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val epsN = math.E / 16384 * occ.size
    exact.foreach { case (k, n) =>
      val est = Cms.estimate(sk, u(k), 4, 16384)
      assert(est >= n, s"$k undercounted: $est < $n")
      assert(est <= n + 3 * epsN + 1, s"$k overcounted: $est vs $n (epsN=$epsN)")
    }
  }

  test("unseen keys estimate near zero") {
    val sk = cmsOf((0 until 5000).map(i => s"in-$i"))
    val ests = (0 until 1000).map(i => Cms.estimate(sk, u(s"out-$i"), 4, 16384))
    assert(ests.count(_ == 0) > 900, s"zeros=${ests.count(_ == 0)}")
    assert(ests.max <= 5)
  }

  test("merge is elementwise sum: split build equals whole build") {
    val occ = (0 until 8000).map(i => s"m${i % 300}")
    val (a, b) = occ.splitAt(3000)
    val merged = Cms.mergeInto(cmsOf(a), cmsOf(b))
    assert(merged.sameElements(cmsOf(occ)))
  }

  test("distributed sketch equals local across 32 partitions") {
    val occ = (0 until 20000).map(i => s"d${i % 777}")
    val sk = occ.toDF("k").repartition(32)
      .agg(CF.cmsAgg(col("k")).as("sk")).head.getAs[Array[Byte]](0)
    assert(Cms.deserialize(sk).sameElements(cmsOf(occ)))
  }

  test("serialize/deserialize round-trips") {
    val c = cmsOf(Seq("a", "b", "a"), d = 2, w = 64)
    assert(Cms.deserialize(Cms.serialize(c)).sameElements(c))
  }

  test("estimate expression over the collected sketch matches the local one") {
    val occ = (0 until 6000).map(i => s"e${i % 101}")
    val sk = occ.toDF("k").agg(CF.cmsAgg(col("k")).as("sk")).head.getAs[Array[Byte]](0)
    val out = Seq("e0", "e50", "e100", "absent").toDF("k")
      .select(col("k"), CF.cmsEstimate(sk, col("k")).as("est"))
      .as[(String, Long)].collect().toMap
    val counters = Cms.deserialize(sk)
    Seq("e0", "e50", "e100", "absent").foreach { k =>
      assert(out(k) === Cms.estimate(counters, u(k), 4, 16384))
    }
  }
}
