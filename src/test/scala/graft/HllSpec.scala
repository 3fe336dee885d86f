package graft

import graft.functions.{Hll, HllFunctions => HF}
import org.apache.spark.sql.functions._

class HllSpec extends SparkSpec {
  import spark.implicits._

  private def sketchOf(values: Seq[String], p: Int = 9): Array[Byte] = {
    val regs = new Array[Byte](1 << p)
    values.foreach { v =>
      val h = Hll.mix(graft.functions.TextFunctions.fnv1a64(
        org.apache.spark.unsafe.types.UTF8String.fromString(v)))
      val idx = Hll.bucket(h, p)
      val r = Hll.rho(h, p)
      if (r > (regs(idx) & 0xff)) regs(idx) = r.toByte
    }
    regs
  }

  test("hll estimate within 3 sigma of exact on 20k distinct keys") {
    val n = 20000
    val keys = (0 until n).map(i => s"key-$i")
    val est = Hll.estimate(sketchOf(keys), 9)
    val sigma = 1.04 / math.sqrt(512.0) * n
    assert(math.abs(est - n) <= 3 * sigma, s"est=$est exact=$n sigma=$sigma")
  }

  test("duplicates do not move the sketch (registers are max-folds)") {
    val keys = (0 until 5000).map(i => s"k$i")
    assert(sketchOf(keys).sameElements(sketchOf(keys ++ keys ++ keys.take(100))))
  }

  test("merge of split sketches equals sketch of the union, any split/order") {
    val keys = (0 until 9000).map(i => s"u$i")
    val whole = sketchOf(keys)
    val (a, b) = keys.splitAt(1234)
    val ab = Hll.mergeInto(sketchOf(a), sketchOf(b))
    val ba = Hll.mergeInto(sketchOf(b), sketchOf(a))
    assert(ab.sameElements(whole) && ba.sameElements(whole))
  }

  test("linear-counting branch on a small distinct set is near-exact") {
    val keys = (0 until 40).map(i => s"small-$i")
    val regs = sketchOf(keys)
    // branch must actually be taken: plenty of empty registers
    assert(regs.count(_ == 0) > 400)
    val est = Hll.estimate(regs, 9)
    assert(math.abs(est - 40) < 3, s"linear-counting est=$est for 40 keys")
  }

  test("distributed sketch equals local: partial merge across 32 partitions") {
    val n = 15000
    val df = spark.range(n).select(concat(lit("d"), col("id")).as("k"))
      .repartition(32)
    val sk = df.agg(HF.hllSketch(col("k")).as("sk"))
      .select(col("sk")).head.getAs[Array[Byte]](0)
    assert(sk.sameElements(sketchOf((0 until n).map(i => s"d$i"))))
    // and the estimate expression agrees with the local estimator
    val est = df.agg(HF.hllSketch(col("k")).as("sk"))
      .select(HF.hllEstimate(col("sk")).as("e")).head.getDouble(0)
    assert(est === Hll.estimate(sk, 9))
  }

  test("hllMerge of per-group sketches equals the global sketch; union expr matches") {
    val df = spark.range(12000)
      .select((col("id") % 3).cast("string").as("g"),
        concat(lit("m"), col("id")).as("k"))
      .repartition(16)
    val per = df.groupBy("g").agg(HF.hllSketch(col("k")).as("sk"))
    val merged = per.agg(HF.hllMerge(col("sk")).as("sk"))
      .head.getAs[Array[Byte]](0)
    assert(merged.sameElements(sketchOf((0 until 12000).map(i => s"m$i"))))
    // pairwise scalar union of the three group sketches = same registers
    val sks = per.orderBy("g").collect().map(_.getAs[Array[Byte]]("sk"))
    val u01 = Hll.mergeInto(sks(0).clone(), sks(1))
    val u = Hll.mergeInto(u01, sks(2))
    assert(u.sameElements(merged))
  }

  test("null inputs are ignored") {
    val df = Seq(Some("a"), None, Some("b"), None).toDF("k")
    val sk = df.agg(HF.hllSketch(col("k")).as("sk")).head.getAs[Array[Byte]](0)
    assert(sk.sameElements(sketchOf(Seq("a", "b"))))
  }

  test("intersection via inclusion-exclusion is sane on overlapping sets") {
    val a = (0 until 8000).map(i => s"x$i")
    val b = (4000 until 12000).map(i => s"x$i") // true overlap 4000
    val ska = sketchOf(a)
    val skb = sketchOf(b)
    val estCommon = Hll.estimate(ska, 9) + Hll.estimate(skb, 9) -
      Hll.estimate(Hll.mergeInto(ska.clone(), skb), 9)
    assert(math.abs(estCommon - 4000) < 1500, s"est overlap $estCommon vs 4000")
  }

  test("oracle SQL mirrors the small-m alpha constants (p=4/5/6)") {
    // Hll.estimate uses the empirical constants below the closed form's
    // validity range; the generated oracle must inline the same ones.
    assert(graft.queries.HllSql.distinctSketchSql(4).contains("0.673"))
    assert(graft.queries.HllSql.distinctSketchSql(5).contains("0.697"))
    assert(graft.queries.HllSql.sketchIntersectSql(6).contains("0.709"))
    assert(!graft.queries.HllSql.distinctSketchSql(9).contains("0.673"))
  }

  test("streaming: HLL sketch state carries across micro-batches (complete mode)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val agg = input.toDF().toDF("k")
      .agg(HF.hllSketch(col("k")).as("sk"))
      .select(HF.hllEstimate(col("sk")).as("est"))
    val q = agg.writeStream
      .format("memory").queryName("hll_stream")
      .outputMode(OutputMode.Complete())
      .start()
    try {
      input.addData((0 until 4000).map(i => s"s$i"): _*)
      q.processAllAvailable()
      input.addData((2000 until 8000).map(i => s"s$i"): _*)
      q.processAllAvailable()
      // state carried the registers across batches: estimate sees the
      // UNION of both batches (8000 distinct), not just the last one
      val est = spark.table("hll_stream").head.getDouble(0)
      assert(est === Hll.estimate(sketchOf((0 until 8000).map(i => s"s$i")), 9))
    } finally q.stop()
  }
}
