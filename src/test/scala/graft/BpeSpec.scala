package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("trainFromFreqs runs the published merge loop with deterministic ties") {
    // freqs: "low" x5, "lower" x2 — pairs round 1:
    //   (l,o) 7, (o,w) 7, (w,e) 2, (e,r) 2 → tie (l,o)/(o,w) broken ASC → (l,o)
    val m = Bpe.trainFromFreqs(Seq(("low", 5L), ("lower", 2L)), numMerges = 3)
    assert(m.merges.take(1) === Seq(("l", "o")))
    // round 2: (lo,w) 7, (w,e) 2, (e,r) 2 → (lo,w)
    assert(m.merges(1) === ("lo", "w"))
    // round 3: (low,e) 2, (e,r) 2 → lexicographic: ("e","r") < ("low","e")
    assert(m.merges(2) === ("e", "r"))
  }

  test("column-side segmentation replays the driver-side trainer exactly") {
    val words = Seq("low", "lower", "lowest", "slow", "wool")
    val m = Bpe.trainFromFreqs(words.map((_, 1L)), numMerges = 8)
    // driver-side reference segmentation: same mergeOnce loop
    def segRef(w: String): Seq[String] =
      m.merges.foldLeft(w.map(_.toString).toVector) { (syms, pair) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
            out += (pair._1 + pair._2); i += 2
          } else { out += syms(i); i += 1 }
        }
        out.result()
      }
    val got = words.toDF("w")
      .select($"w", m.pieces($"w").as("p"), m.wordTokenCount($"w").as("n"))
      .as[(String, Seq[String], Int)].collect()
    got.foreach { case (w, p, n) =>
      assert(p === segRef(w), s"word $w")
      assert(n === segRef(w).length, s"count for $w")
    }
  }

  test("left-to-right non-overlapping merge: aaa with (a,a) -> [aa, a]") {
    val m = Bpe.BpeModel(Seq(("a", "a")))
    val out = Seq("aaa", "aaaa", "aa").toDF("w")
      .select($"w", m.pieces($"w").as("p")).as[(String, Seq[String])]
      .collect().toMap
    assert(out("aaa") === Seq("aa", "a"))
    assert(out("aaaa") === Seq("aa", "aa"))
    assert(out("aa") === Seq("aa"))
  }

  test("tokenCount sums over words; empty and non-alpha text count 0") {
    val m = Bpe.BpeModel(Seq(("t", "h"), ("th", "e")))
    val out = Seq(
      ("the theme thesis", 1 + 3 + 4), // the | the+m+e | the+s+i+s
      ("", 0),
      ("1234 ...", 0),
      ("THE", 1) // lowercased before split
    ).toDF("text", "expected")
      .select($"expected", m.tokenCount($"text").as("n"))
      .as[(Int, Int)].collect()
    out.foreach { case (expected, n) => assert(n === expected) }
  }

  test("train on the documents table is deterministic and merges are ranked") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m1 = Bpe.train(docs, $"text", numMerges = 16, maxWords = 128)
    val m2 = Bpe.train(docs, $"text", numMerges = 16, maxWords = 128)
    assert(m1.merges === m2.merges)
    assert(m1.merges.length === 16)
    assert(m1.merges.distinct.length === 16, "no pair merged twice")
    // BPE counts sit between 1x and the character count: a sanity band,
    // and strictly fewer tokens than characters means merges actually fire
    val stats = docs.select(
        sum(m1.tokenCount($"text")).as("bpe"),
        sum(size(Bpe.words($"text"))).as("ws"),
        sum(length($"text")).as("chars"))
      .as[(Long, Long, Long)].head()
    assert(stats._1 >= stats._2, "BPE tokens >= whitespace words")
    assert(stats._1 < stats._3, "BPE tokens < characters (merges fired)")
  }

  test("chunkBpe ≡ declarative word-cost packing (Pack's rule per doc)") {
    import org.apache.spark.sql.expressions.Window
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(60)
    val m = Bpe.train(docs, $"text", numMerges = 16, maxWords = 128)
    val budget = 24
    val fused = graft.pipeline.Chunking
      .chunkBpe(docs, $"doc_id", $"text", m, budget)
      .collect()
      .map(r => ((r.getLong(0), r.getInt(1)), (r.getInt(2), r.getString(3))))
      .toMap
    // declarative recompute: explode words with position, price each via
    // the model's per-word counter, window-cumulate, group
    val w = Window.partitionBy("id").orderBy("pos")
    val decl = docs
      .select($"doc_id".as("id"),
        posexplode(graft.functions.TextFunctions.wordNgrams($"text", 1)))
      .withColumnRenamed("col", "word")
      .withColumn("cost",
        aggregate(transform(Bpe.words($"word"), x => m.wordTokenCount(x)),
          lit(0), (a, x) => a + x))
      .withColumn("chunk_id",
        ((sum($"cost").over(w) - $"cost") / budget).cast("int"))
      .groupBy($"id", $"chunk_id")
      .agg(sum($"cost").cast("int").as("n_tokens"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct($"pos", $"word"))),
          s => s("word"))).as("chunk_text"))
      .collect()
      .map(r => ((r.getLong(0), r.getInt(1)), (r.getInt(2), r.getString(3))))
      .toMap
    assert(fused === decl)
    // edge cases: empty doc -> no chunks; a giant word owns its chunk
    val edge = Seq((1L, ""), (2L, "   "), (3L, "a " * 200 + "zz"))
      .toDF("doc_id", "text")
    val chunks = graft.pipeline.Chunking
      .chunkBpe(edge, $"doc_id", $"text", m, budget).collect()
    assert(!chunks.exists(r => r.getLong(0) <= 2L), "blank docs chunk to nothing")
  }
}
