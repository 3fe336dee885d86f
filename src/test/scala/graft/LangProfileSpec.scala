package graft

import org.apache.spark.sql.functions._

import graft.pipeline.LangProfile

/** Cavnar–Trenkle language ID ([[graft.pipeline.LangProfile]]): real
  * classification power on a mixed-language fixture (the synthetic
  * documents corpus has label-decorrelated text, so the oracle there
  * checks determinism — THIS spec checks the method actually identifies
  * languages), plus the und edge and held-out generalization. */
class LangProfileSpec extends SparkSpec {
  import spark.implicits._

  // genuinely different languages: English, accented French (non-ASCII
  // exercises the binary gram ordering), German, and CJK Chinese
  private val train = Seq(
    ("en", "the quick brown fox jumps over the lazy dog while the sun is shining on the green fields and the river flows"),
    ("en", "this is a simple english sentence with the usual words that the language uses all the time in writing"),
    ("en", "children were playing in the park and the birds sang through the warm summer afternoon air"),
    ("fr", "le renard brun saute par-dessus le chien paresseux pendant que le soleil brille sur les champs verts et la rivière coule"),
    ("fr", "ceci est une phrase française très simple avec les mots habituels que la langue utilise tout le temps à l'écrit"),
    ("fr", "les enfants jouaient dans le parc et les oiseaux chantaient dans l'air chaud de l'après-midi d'été"),
    ("de", "der schnelle braune fuchs springt über den faulen hund während die sonne über den grünen feldern scheint und der fluss fließt"),
    ("de", "dies ist ein einfacher deutscher satz mit den üblichen wörtern die die sprache beim schreiben ständig verwendet"),
    ("de", "die kinder spielten im park und die vögel sangen durch die warme sommerluft am nachmittag"),
    ("zh", "敏捷的棕色狐狸跳过了懒惰的狗太阳照耀着绿色的田野河水静静地流淌"),
    ("zh", "这是一个非常简单的中文句子包含语言在书写中一直使用的常用词"),
    ("zh", "孩子们在公园里玩耍鸟儿在温暖的夏日午后歌唱"))

  private lazy val model =
    LangProfile.fit(train.toDF("lang", "text"), col("text"), col("lang"))

  private def predict(texts: (String, String)*): Seq[(String, String)] =
    texts.toDF("expected", "text")
      .select(col("expected"), LangProfile.classify(model, col("text")).as("got"))
      .as[(String, String)].collect().toSeq

  test("training documents classify to their own language") {
    val preds = train.toDF("lang", "text")
      .select(col("lang"), LangProfile.classify(model, col("text")).as("got"))
      .as[(String, String)].collect()
    assert(preds.forall { case (l, g) => l == g },
      s"self-classification must be exact: ${preds.filterNot(p => p._1 == p._2).toSeq}")
  }

  test("held-out sentences classify correctly across all four languages") {
    val preds = predict(
      "en" -> "a completely different english text about music and the history of the world",
      "en" -> "the weather today is cold but the people in the town are happy",
      "fr" -> "un texte français différent sur la musique et l'histoire du monde entier",
      "fr" -> "aujourd'hui il fait froid mais les gens de la ville sont heureux",
      "de" -> "ein völlig anderer deutscher text über musik und die geschichte der welt",
      "de" -> "das wetter ist heute kalt aber die menschen in der stadt sind glücklich",
      "zh" -> "一段关于音乐和世界历史的完全不同的中文文字",
      "zh" -> "今天天气很冷但是城里的人们都很开心")
    assert(preds.forall { case (e, g) => e == g },
      s"held-out misclassifications: ${preds.filterNot(p => p._1 == p._2)}")
  }

  test("empty and sub-trigram texts predict und") {
    val preds = predict("und" -> "", "und" -> " ")
    // "" normalizes to "__" (2 chars < 3) and " " trims to "" likewise
    assert(preds.forall { case (e, g) => e == g }, preds.toString)
  }

  test("fit ranking is deterministic: two fits classify identically") {
    val m2 = LangProfile.fit(
      train.reverse.toDF("lang", "text"), col("text"), col("lang"))
    val texts = train.map(_._2) ++ Seq("mixed le the der 的")
    val a = texts.toDF("text")
      .select(LangProfile.classify(model, col("text"))).as[String].collect().toSeq
    val b = texts.toDF("text")
      .select(LangProfile.classify(m2, col("text"))).as[String].collect().toSeq
    assert(a === b, "row order of the fit input must not change the model")
  }

  test("compareUtf8Order matches UTF-8 byte order, including surrogates") {
    import graft.functions.LangModel.compareUtf8Order
    import java.nio.charset.StandardCharsets.UTF_8
    // supplementary char (surrogate pair) vs high-BMP char: UTF-16 unit
    // order would sort the pair FIRST (0xD83D < 0xFFFD); byte order must
    // sort it LAST
    val sup = new String(Character.toChars(0x1F600)) // U+1F600, surrogate pair
    val cases = Seq("a", "z", "\u00e9", "\ufffd", sup, "ab",
      "a\ufffd", "a" + sup, "", "\ue000", "\ud7ff")
    for (x <- cases; y <- cases) {
      val byBytes = {
        val ax = x.getBytes(UTF_8); val ay = y.getBytes(UTF_8)
        val n = math.min(ax.length, ay.length)
        var i = 0; var r = 0
        while (i < n && r == 0) { r = (ax(i) & 0xff) - (ay(i) & 0xff); i += 1 }
        if (r != 0) r else ax.length - ay.length
      }
      assert(Integer.signum(compareUtf8Order(x, y)) === Integer.signum(byBytes),
        s"order of '$x' vs '$y'")
    }
  }
}
