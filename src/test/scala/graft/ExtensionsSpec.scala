package graft

import graft.functions.{Murmur2, TextFunctions}

class ExtensionsSpec extends SparkSpec {

  test("custom expressions are callable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT murmur2('hello') AS m,
        |       fingerprint64('hello') AS f,
        |       simhash64(array('a','b','c')) AS s,
        |       size(minhash(array('a','b'), 16)) AS mh,
        |       size(minhash_bands(array('a','b'), 16, 4)) AS mb,
        |       char_shingles('abcd', 3) AS cs,
        |       word_shingles('a b c', 2) AS ws,
        |       vec_dot(array(1.0f, 2.0f), array(3.0f, 4.0f)) AS d,
        |       round(vec_cosine(array(1.0f, 0.0f), array(1.0f, 0.0f)), 6) AS c,
        |       srp_bucket(array(1.0f, 2.0f), 4) AS b,
        |       lang_id('the cat sat on the mat and it is that') AS l,
        |       sorted_jaccard(array('a','b','c'), array('b','c','d')) AS sj,
        |       zvalue(CAST(3 AS BIGINT), CAST(5 AS BIGINT), 4) AS z
        |""".stripMargin).head()
    assert(r.getAs[Int]("m") === Murmur2.hashString("hello"))
    assert(r.getAs[Long]("f") === TextFunctions.fnv1a64(
      org.apache.spark.unsafe.types.UTF8String.fromString("hello")))
    assert(r.getAs[Int]("mh") === 16)
    assert(r.getAs[Int]("mb") === 4)
    assert(r.getAs[Seq[String]]("cs") === Seq("abc", "bcd"))
    assert(r.getAs[Seq[String]]("ws") === Seq("a b", "b c"))
    assert(r.getAs[Double]("d") === 11.0)
    assert(r.getAs[Double]("c") === 1.0)
    assert(r.getAs[String]("l") === "en")
    assert(r.getAs[Double]("sj") === 0.5)
    // a=0011 interleaves to odd bits (0b00001010), b=0101 to even (0b00010001)
    assert(r.getAs[Long]("z") === (0x0AL | 0x11L))
  }

  test("sketch suite is callable from SQL: agg, merge, estimate, probes") {
    GraftExtensions.register(spark)
    import spark.implicits._
    (0 until 5000).map(i => s"k${i % 1200}").toDF("k")
      .createOrReplaceTempView("sketch_src")
    val est = spark.sql(
      """SELECT hll_estimate(hll_sketch(k, 9), 9) AS est FROM sketch_src"""
    ).head.getDouble(0)
    assert(math.abs(est - 1200) < 3 * 1.04 / math.sqrt(512) * 1200, s"est=$est")
    // merge of per-group sketches == global sketch
    val merged = spark.sql(
      """SELECT hll_estimate(hll_merge(sk, 9), 9) AS est FROM (
        |  SELECT hll_sketch(k, 9) AS sk FROM sketch_src GROUP BY length(k))
        |""".stripMargin).head.getDouble(0)
    assert(merged === est, "union of disjoint-group sketches = whole sketch")
    // bloom: member true, non-member overwhelmingly false
    val b = spark.sql(
      """SELECT bloom_contains(b, 'k7', 7) AS yes,
        |       bloom_contains(b, 'absent-key', 7) AS no
        |FROM (SELECT bloom_agg(k, 262144, 7) AS b FROM sketch_src)
        |""".stripMargin).head
    assert(b.getBoolean(0) && !b.getBoolean(1))
    // cms: point frequency of a key occurring ceil(5000/1200)-ish times
    val f = spark.sql(
      """SELECT cms_estimate(s, 'k3', 4, 16384) AS f
        |FROM (SELECT cms_agg(k, 4, 16384) AS s FROM sketch_src)
        |""".stripMargin).head.getLong(0)
    assert(f >= 4 && f <= 6, s"k3 occurs 4-5 times, est=$f")
  }

  test("non-literal arg to a literal parameter errors clearly") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT minhash(array('a'), 1 + 1)").head()
    }
    assert(e.getMessage.contains("integer literal") ||
      e.getMessage.toLowerCase.contains("foldable"))
  }
}
