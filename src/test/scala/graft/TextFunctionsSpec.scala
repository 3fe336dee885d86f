package graft

import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  def one(c: org.apache.spark.sql.Column): Any =
    Seq("x").toDF("d").select(c).head().get(0)

  test("normalizeText: NFC composition, control strip, whitespace collapse") {
    val decomposed = "e\u0301clair"       // e + combining acute
    val composed = "\u00e9clair"          // é precomposed
    val df = Seq(
      (decomposed, composed),
      ("a\u0000b\u0007c", "abc"),          // control chars stripped
      ("a \t  b", "a b"),                  // space/tab runs collapse
      ("  padded  ", "padded"),
      ("line1\nline2", "line1\nline2"),    // newline survives
      ("", "")).toDF("text", "expected")
    df.select(T.normalizeText($"text").as("n"), $"expected").collect()
      .foreach(r => assert(r.getString(0) == r.getString(1), r.toString))
    // NFC makes composed and decomposed spellings dedup-identical
    val pair = Seq(decomposed, composed).toDF("text")
      .select(T.normalizeText($"text")).distinct().count()
    assert(pair == 1)
  }

  test("wordBigrams: in order, with multiplicity, whitespace-robust") {
    val df = Seq(
      ("a b a b", Seq("a b", "b a", "a b")),
      ("a  b\tc", Seq("a b", "b c")),
      ("single", Seq.empty[String]),
      ("", Seq.empty[String]),
      ("  x y  ", Seq("x y"))).toDF("text", "expected")
    df.select(T.wordBigrams($"text").as("bg"), $"expected").collect()
      .foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1), r.toString))
  }

  test("bigram LM: every doc scored, positive nll, n_bigrams = tokens - 1") {
    val out = graft.queries.Queries
      .lmScoreBigram(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Double)].collect()
    val toks = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", T.tokenCount(lower($"text")).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(out.length == toks.size)
    out.foreach { case (id, nbg, nll) =>
      assert(nbg == math.max(0, toks(id) - 1), s"doc $id")
      if (nbg > 0) assert(nll > 0, s"doc $id add-one smoothing ⇒ -ln p > 0")
    }
  }

  test("tokens and counts") {
    val df = Seq(
      ("hello world  foo", 3),
      ("  padded  ", 1),
      ("", 0),
      ("single", 1)).toDF("text", "expected")
    val got = df.select(T.tokenCount($"text").as("n"), $"expected").collect()
    got.foreach(r => assert(r.getInt(0) === r.getInt(1), r.toString))
  }

  test("subword pieces: alnum runs + single non-alnum chars (incl. spaces)") {
    val df = Seq(
      ("ab1 cd-ef", 5), // "ab1", " ", "cd", "-", "ef"
      ("hello", 1),
      ("a  b", 4),      // two space pieces
      ("", 0),
      ("!?", 2)).toDF("text", "expected")
    val got = df.select(T.subwordCount($"text").as("n"), $"expected").collect()
    got.foreach(r => assert(r.getInt(0) === r.getInt(1), r.toString))
  }

  test("punctuation counting is set-exact") {
    val df = Seq("a,b.c!d?e;f:g", "none here").toDF("text")
    val got = df.select(T.punctCount($"text")).as[Int].collect().toSeq
    assert(got === Seq(6, 0))
  }

  test("quality score bounded in [0,1] and favors natural text") {
    val natural = "The quick brown fox jumps over the lazy dog and runs to the hills. " * 3
    val junk = ";;;;;!!!???;;;;;....!!!"
    val df = Seq(natural, junk).toDF("text")
    val Seq(qNat, qJunk) = df.select(T.qualityScore($"text")).as[Double].collect().toSeq
    assert(qNat > qJunk)
    assert(qNat >= 0.0 && qNat <= 1.0 && qJunk >= 0.0 && qJunk <= 1.0)
  }

  test("langId picks the lexicon with most hits; und when none") {
    val df = Seq(
      "the cat sat on the mat and it is happy",
      "der hund ist nicht zu hause und das ist gut",
      "el perro es un animal y no es gato",
      "le chien est pour la maison et pas que",
      "这是一个人他有我的东西",
      "zzz qqq xxx").toDF("text")
    val got = df.select(T.langId($"text")).as[String].collect().toSeq
    assert(got === Seq("en", "de", "es", "fr", "zh", "und"))
  }

  test("charShingles produce distinct n-grams over normalized text") {
    val got = Seq("aab  aab").toDF("t")
      .select(T.charShingles($"t", 3)).as[Seq[String]].head()
    assert(got.toSet === Set("aab", "ab ", "b a", " aa"))
  }

  test("fingerprint64 is deterministic and spreads") {
    val got = Seq("a", "a", "b", "").toDF("t")
      .select(T.fingerprint64($"t")).as[Long].collect().toSeq
    assert(got(0) === got(1))
    assert(got(0) !== got(2))
    assert(got(3) === 0xcbf29ce484222325L) // FNV offset basis for empty input
  }

  test("simhash: similar token sets get close signatures, disjoint get far") {
    val base = (1 to 40).map(i => s"tok$i")
    val near = base.updated(0, "changed")
    val far = (1 to 40).map(i => s"other$i")
    val df = Seq(base, near, far).toDF("toks")
    val sigs = df.select(T.simhash64($"toks")).as[Long].collect()
    assert(T.hamming64(sigs(0), sigs(1)) < T.hamming64(sigs(0), sigs(2)))
  }

  test("minhash estimates jaccard") {
    val a = (1 to 100).map(_.toString)
    val b = (1 to 80).map(_.toString) // true J = 80/100 = 0.8
    val df = Seq(a, b).toDF("toks")
    val sigs = df.select(T.minhash($"toks", 128)).as[Seq[Long]].collect()
    val est = sigs(0).zip(sigs(1)).count { case (x, y) => x == y } / 128.0
    assert(math.abs(est - 0.8) < 0.15, s"estimate $est too far from 0.8")
  }

  test("heavy hitters: space-saving top-k matches exact counts when capacity suffices") {
    import graft.functions.HeavyHitters
    val items = (1 to 500).map(_ => "hot") ++ (1 to 200).map(_ => "warm") ++
      (1 to 50).map(i => s"cold$i")
    val ds = spark.createDataset(scala.util.Random.shuffle(items))(
      org.apache.spark.sql.Encoders.STRING)
    val agg = new HeavyHitters(64).toColumn
    val result = ds.select(agg).head()
    assert(result.take(2) === Seq(("hot", 500L), ("warm", 200L)))
  }

  test("heavy hitters: bounded capacity still surfaces the dominant item") {
    import graft.functions.HeavyHitters
    val items = (1 to 1000).map(_ => "dominant") ++ (1 to 300).map(i => s"noise$i")
    val ds = spark.createDataset(scala.util.Random.shuffle(items))(
      org.apache.spark.sql.Encoders.STRING)
    val result = ds.select(new HeavyHitters(16).toColumn).head()
    assert(result.head._1 === "dominant")
    assert(result.head._2 >= 1000L) // overestimate-only guarantee
  }

  test("jaccard column is exact") {
    val got = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
      .select(T.jaccard($"x", $"y")).as[Double].head()
    assert(got === 0.5)
  }
}
