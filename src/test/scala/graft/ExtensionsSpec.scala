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

  test("non-literal arg to a literal parameter errors clearly") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT minhash(array('a'), 1 + 1)").head()
    }
    assert(e.getMessage.contains("integer literal") ||
      e.getMessage.toLowerCase.contains("foldable"))
  }
}
