package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions._
import graft.pipeline.ContamGate

/** Loud-fallback regression gate for the `eval` static-forwarder bug
  * class (rounds 12-13: `RoundVec6Expression`, `CharNgramsExpression`,
  * `ByteSumExpression` each shipped a companion helper named `eval`,
  * whose static forwarder scalac drops because it clashes with the
  * inherited `Expression.eval(InternalRow)` — generated code then fails
  * to compile and the expression silently runs interpreted).
  *
  * Under `spark.sql.codegen.factoryMode=CODEGEN_ONLY` +
  * `spark.sql.codegen.fallback=false`, a generated-code compile failure
  * THROWS instead of falling back, so this spec fails loudly if any
  * registered custom expression regresses. Input rides on `spark.range`
  * (a `Range` leaf — not a `LocalRelation`, so `ConvertToLocalRelation`
  * cannot constant-fold the projection away from the codegen path).
  */
class CodegenOnlySpec extends SparkSpec {

  /** Every codegen'd expression class under graft.functions that this
    * spec must exercise — additions to the function library belong here
    * too (the coverage assertion fails if a listed class never appears
    * in an exercised plan). */
  private val Expected: Set[String] = Set(
    "Murmur2Expression", "PhraseHitsExpression", "SpanRemoveExpression",
    "ContamOverlapExpression", "Fingerprint64Expression",
    "SortedJaccardExpression", "SortedAbsentExpression",
    "EdJoinPrefixExpression",
    "LangIdExpression", "SimHash64Expression",
    "CharShinglesExpression", "WordShinglesExpression", "NfcExpression",
    "WordNgramsExpression", "MinHashBandsExpression", "MinHashExpression",
    "PqAdcExpression", "IvfPqLutExpression", "PqAdcPairExpression",
    "IvfPqAdcExpression", "ZValueExpression", "CharNgramsExpression",
    "LangClassifyExpression", "DotProductExpression",
    "DotProductDoubleExpression", "CosineExpression",
    "CentroidTopNExpression", "CentroidResidualExpression",
    "CentroidArgminExpression", "SrpBucketExpression",
    "RoundVec6Expression", "DsirBucketsExpression",
    "BucketLogSumExpression", "BpeSegmentExpression", "BpeChunksExpression",
    "ByteSumExpression", "BloomMightContain", "LongSetContainsExpression")

  /** The inventory derived MECHANICALLY from the compiled classpath:
    * every concrete `Expression` subclass in `graft.functions` that is
    * neither an aggregate (TypedImperativeAggregates never codegen a
    * projection) nor a deliberate `CodegenFallback` (one-row sketch
    * finalizers — cold paths by design). The hand list above must match
    * this scan exactly, so a newly added expression that nobody registers
    * here fails the suite instead of silently escaping the gate. */
  private def scannedInventory: Set[String] = {
    import org.apache.spark.sql.catalyst.expressions.Expression
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction
    val classesRoot = new java.io.File(classOf[Murmur2Expression]
      .getProtectionDomain.getCodeSource.getLocation.toURI)
    val dir = new java.io.File(classesRoot, "graft/functions")
    assert(dir.isDirectory, s"expected compiled class directory at $dir")
    dir.listFiles().toSeq
      .map(_.getName)
      .filter(n => n.endsWith(".class") && !n.contains("$"))
      .map(n => Class.forName("graft.functions." + n.stripSuffix(".class")))
      .filter(classOf[Expression].isAssignableFrom)
      .filterNot(c => java.lang.reflect.Modifier.isAbstract(c.getModifiers))
      .filterNot(classOf[AggregateFunction].isAssignableFrom)
      .filterNot(classOf[CodegenFallback].isAssignableFrom)
      .map(_.getSimpleName).toSet
  }

  test("the hand-maintained inventory matches the classpath scan") {
    val scanned = scannedInventory
    val unlisted = scanned -- Expected
    val stale = Expected -- scanned
    assert(unlisted.isEmpty,
      s"new codegen expressions outside the loud-fallback gate — add them " +
        s"to Expected AND exercise them: ${unlisted.toSeq.sorted.mkString(", ")}")
    assert(stale.isEmpty,
      s"Expected lists classes the classpath no longer has: " +
        stale.toSeq.sorted.mkString(", "))
  }

  private def graftExprClasses(df: DataFrame): Set[String] = {
    import org.apache.spark.sql.catalyst.expressions.Expression
    val out = scala.collection.mutable.Set[String]()
    df.queryExecution.analyzed.foreach { plan =>
      plan.expressions.foreach(_.foreach { e: Expression =>
        val n = e.getClass.getName
        if (n.startsWith("graft.")) out += e.getClass.getSimpleName
      })
    }
    out.toSet
  }

  test("every registered custom expression compiles under CODEGEN_ONLY") {
    val s = spark
    val prevFactory = s.conf.getOption("spark.sql.codegen.factoryMode")
    val prevFallback = s.conf.getOption("spark.sql.codegen.fallback")
    s.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    s.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val dim = 4
      val m = 2
      val ksub = 4
      val coarse = Seq(Seq(0.0, 0.1, 0.2, 0.3), Seq(1.0, 1.1, 1.2, 1.3))
      val pqBooks: IndexedSeq[IndexedSeq[IndexedSeq[Double]]] =
        IndexedSeq.tabulate(m, ksub, dim / m)((j, c, i) => j + c * 0.1 + i * 0.01)
      val luts = Array(Array.tabulate(m * ksub)(_ * 0.5))
      val merges = Seq(("l", "o"), ("lo", "w"))
      val langModel = new LangModel(2, 5, Array("en", "fr"),
        Array(Array(("th", 1), ("e", 2)), Array(("le", 1), ("e", 2))))
      val gate = new ContamGate(2, Array(123L, 456L).sorted)

      val base = s.range(8).select(
        col("id"),
        concat(lit("the quick brown fox lowers over "),
          col("id").cast("string")).as("text"),
        (col("id") % 2).cast("int").as("cell"),
        (col("id") % 4).cast("int").as("k4"))
        .withColumn("tokens", split(col("text"), " "))
        .withColumn("bin", col("text").cast("binary"))
        .withColumn("vecf", array(
          (col("id") % 3).cast("float"), lit(1.0f),
          col("cell").cast("float"), lit(0.5f)))
        .withColumn("vecd", array(
          (col("id") % 3).cast("double"), lit(1.0),
          col("cell").cast("double"), lit(0.25)))
        .withColumn("codes", array(col("k4"), lit(1).cast("int")))
        .withColumn("starts", array(lit(0).cast("int")))

      // One wide projection per thematic group; each `.collect()` forces
      // whole-stage codegen compilation of every expression in it.
      val textDf = base.select(
        Murmur2.murmur2(col("text")).as("m2"),
        PhraseFunctions.phraseHits(col("text"), Seq("quick brown")).as("ph"),
        SpanFunctions.spanRemove(col("tokens"), col("starts"), 2).as("span"),
        ContamFunctions.overlapCount(col("text"), gate).as("contam"),
        TextFunctions.fingerprint64(col("text")).as("fp"),
        TextFunctions.jaccardSorted(array_sort(col("tokens")),
          array_sort(col("tokens"))).as("jac"),
        TextFunctions.absentCount(array_sort(col("tokens")),
          array_sort(col("tokens"))).as("absent"),
        TextFunctions.langId(col("text")).as("lid"),
        TextFunctions.simhash64(col("tokens")).as("sh"),
        TextFunctions.charShingles(col("text"), 3).as("cs"),
        TextFunctions.wordShingles(col("text"), 2).as("ws"),
        TextFunctions.nfc(col("text")).as("nfc"),
        TextFunctions.wordNgrams(col("text"), 2).as("wn"),
        TextFunctions.minhashBands(col("tokens"), 8, 2).as("mhb"),
        TextFunctions.minhash(col("tokens"), 8).as("mh"),
        LangProfileFunctions.charNgrams(col("text"), 2).as("cn"),
        LangProfileFunctions.classify(col("text"), langModel).as("lang"),
        DsirFunctions.gramBuckets(col("text"), 64).as("db"),
        DsirFunctions.bucketLogSum(
          array(col("k4")), Array.fill(4)(0.5)).as("bls"),
        BpeFunctions.segment(col("text"), merges, "␟").as("seg"),
        BpeFunctions.chunks(col("text"), merges, "␟", 4).as("chunks"),
        BinaryFunctions.byteSum(col("bin")).as("bs"),
        BloomFunctions.mightContain(new Array[Byte](64), col("text"), 3)
          .as("bloom"),
        SetFunctions.inLongSet(col("id"), Array(1L, 3L, 7L)).as("inset"),
        TextFunctions.edjoinPrefix(col("text"), {
          val m = new java.util.HashMap[String, Long](); m.put("the", 9L); m
        }, 3, 2).as("edp"))

      val vecDf = base.select(
        VectorFunctions.dot(col("vecf"), col("vecf")).as("dot"),
        VectorFunctions.dotD(col("vecd"), col("vecd")).as("dotd"),
        VectorFunctions.cosine(col("vecf"), col("vecf")).as("cos"),
        VectorFunctions.centroidTopN(col("vecd"), coarse, 2).as("topn"),
        VectorFunctions.centroidResidual(col("vecd"), col("cell"), coarse)
          .as("resid"),
        VectorFunctions.centroidArgmin(col("vecd"), coarse).as("argmin"),
        VectorFunctions.srpBucket(col("vecf"), 8).as("srp"),
        VectorFunctions.roundVec6(col("vecd")).as("r6"),
        ZOrderFunctions.zvalue(col("k4"), col("cell"), 8).as("zv"),
        PqFunctions.pqAdc(col("codes"), ksub, luts).as("adc"),
        PqFunctions.ivfPqLut(col("vecd"), col("cell"),
          coarse.map(_.toIndexedSeq).toIndexedSeq, pqBooks).as("lut"),
        PqFunctions.ivfPqAdc(col("codes"), col("cell"), ksub,
          IndexedSeq.tabulate(1, 2)((_, c) =>
            if (c == 0) IndexedSeq.tabulate(m * ksub)(_ * 0.25)
            else IndexedSeq.empty[Double])).as("ivfadc"))
        .withColumn("pair",
          PqFunctions.pqAdcPair(col("lut"), array(lit(0), lit(1)), ksub))

      val dfs = Seq(textDf, vecDf)
      dfs.foreach { df => assert(df.collect().length == 8) }

      val covered = dfs.map(graftExprClasses).reduce(_ ++ _)
      val missing = Expected -- covered
      assert(missing.isEmpty,
        s"codegen-only gate never exercised: ${missing.toSeq.sorted.mkString(", ")}")
    } finally {
      def restore(key: String, v: Option[String]): Unit =
        v match { case Some(x) => s.conf.set(key, x); case None => s.conf.unset(key) }
      restore("spark.sql.codegen.factoryMode", prevFactory)
      restore("spark.sql.codegen.fallback", prevFallback)
    }
  }
}
