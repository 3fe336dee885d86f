package graft

import graft.pipeline.{Dedup, Similarity}
import graft.functions.{TextFunctions => T, VectorFunctions => V}
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of 0
    (2L, "completely different content about spark query engines and distributed joins"),
    (3L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 0
    (4L, "another unrelated document mentioning neither foxes nor dogs at all")
  ).toDF("doc_id", "text")

  test("exact dedup keeps lowest id per duplicate group") {
    val out = Dedup.exact(docs, $"text", $"doc_id").select("doc_id").as[Long].collect().sorted
    assert(out.toSeq === Seq(0L, 1L, 2L, 4L))
  }

  test("fingerprint dedup agrees with exact dedup") {
    val a = Dedup.exact(docs, $"text", $"doc_id").select("doc_id").as[Long].collect().sorted
    val b = Dedup.exactByFingerprint(docs, $"text", $"doc_id")
      .select("doc_id").as[Long].collect().sorted
    assert(a.toSeq === b.toSeq)
  }

  test("minhash LSH finds the near-dup pair and skips unrelated docs") {
    val pairs = Dedup.minhashPairs(docs, $"doc_id", $"text",
        shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 3L))) // exact dup → jaccard 1.0
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("minhashDedup drops near-dup losers, keeps the lowest id") {
    val kept = Dedup.minhashDedup(docs, $"doc_id", $"text",
        shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.6)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.head === 0L)
    assert(!kept.contains(3L))
  }

  test("simhash pairs find exact + near duplicates within hamming 3") {
    val pairs = Dedup.simhashPairs(docs, $"doc_id", $"text", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 3L)))
  }

  test("ngram jaccard pairs are exact") {
    val pairs = Dedup.ngramJaccardPairs(docs, $"doc_id", $"text",
        shingleSize = 3, threshold = 0.9)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
    val exact = pairs.find(p => p._1 == 0L && p._2 == 3L)
    assert(exact.exists(_._3 === 1.0))
  }

  test("ngram jaccard pairs equal brute force on random corpora (prefix/length/positional filters are recall-exact)") {
    // random short docs over a tiny vocab → dense similarity structure
    // that exercises every filter edge (n ties, jaccard exactly at t,
    // single-gram docs); the brute force mirrors wordShingles exactly
    val vocab = Vector("ant", "bee", "cat", "dog", "elk", "fox", "gnu", "hen")
    val rnd = new scala.util.Random(20260816L)
    def shingles(text: String, k: Int): Set[String] =
      text.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .sliding(k).filter(_.length == k).map(_.mkString(" ")).toSet
    def brute(cs: Seq[(Long, String)], k: Int, t: Double): Set[(Long, Long, Double)] =
      (for {
        Seq((ia, ta), (ib, tb)) <- cs.combinations(2)
        sa = shingles(ta, k); sb = shingles(tb, k)
        if sa.nonEmpty && sb.nonEmpty
        j = sa.intersect(sb).size.toDouble / sa.union(sb).size
        if j >= t
        (lo, hi) = if (ia < ib) (ia, ib) else (ib, ia)
      } yield (lo, hi, BigDecimal(j).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
    for (trial <- 1 to 8; t <- Seq(0.3, 0.5, 0.8)) {
      val corpus = (0L until (10 + rnd.nextInt(20)).toLong).map { i =>
        i -> Seq.fill(2 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" ")
      }
      val got = Dedup.ngramJaccardPairs(corpus.toDF("doc_id", "text"),
          $"doc_id", $"text", shingleSize = 2, threshold = t,
          shingler = T.wordShingles)
        .select("id_a", "id_b", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
      val want = brute(corpus, 2, t)
      assert(got == want,
        s"trial $trial t=$t: missing=${(want -- got).take(5)} " +
          s"extra=${(got -- want).take(5)} corpus=$corpus")
    }
  }

  test("ngram jaccard maxDocFreq valve stays sound (output is a subset of truth)") {
    val docsDf = docs
    val full = Dedup.ngramJaccardPairs(docsDf, $"doc_id", $"text",
        shingleSize = 3, threshold = 0.5, shingler = T.wordShingles)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val valved = Dedup.ngramJaccardPairs(docsDf, $"doc_id", $"text",
        shingleSize = 3, threshold = 0.5, maxDocFreq = 2,
        shingler = T.wordShingles)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(valved.subsetOf(full),
      s"valve emitted pairs the unvalved run did not: ${valved -- full}")
  }

  test("embedding near-dup via SRP-LSH finds planted duplicates") {
    val base = (0 until 32).map(i => math.sin(i * 1.7).toFloat)
    val nearly = base.updated(0, base(0) + 0.001f)
    val other = (0 until 32).map(i => math.cos(i * 3.1 + 1).toFloat)
    val df = Seq((0L, base), (1L, nearly), (2L, other)).toDF("id", "vec")
    val pairs = Dedup.embeddingNearDupPairs(df, $"id", $"vec", threshold = 0.99, nBits = 6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((0L, 1L)))
  }

  test("ANN: srp and ivf recall vs brute force on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val corpus = emb.select($"vec_id".as("id"), $"embedding".as("vec"))
    val truth = Similarity.bruteForceTopK(queries, corpus, 10)
      .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
    val srp = Similarity.srpTopK(queries, corpus, 10, nBits = 6, probe = 2)
      .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(queries, corpus, 10, nCells = 8, nProbe = 4)
      .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
    val srpRecall = (truth & srp).size.toDouble / truth.size
    val ivfRecall = (truth & ivf).size.toDouble / truth.size
    assert(srpRecall >= 0.3, s"srp recall $srpRecall")
    assert(ivfRecall >= 0.4, s"ivf recall $ivfRecall")
  }

  test("hard negatives: never share the query's label, equal brute over filtered corpus") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 6)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"), $"label".as("qlabel"))
    val corpus = emb.select($"vec_id".as("id"), $"embedding".as("vec"), $"label")
    val negs = Similarity.hardNegatives(queries, corpus, 5)
      .select("qid", "neg_id", "rank").as[(Long, Long, Int)].collect()
    val labels = emb.select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    assert(negs.nonEmpty)
    negs.foreach { case (q, n, _) =>
      assert(labels(q) != labels(n), s"negative $n shares label with query $q")
    }
    negs.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.size).toSeq,
        s"ranks of $q contiguous")
    }
    // equivalence: hardNegatives == bruteForceTopK against a corpus the
    // query's own label is removed from, per query
    queries.select("qid", "qlabel").as[(Long, Int)].collect().foreach {
      case (q, ql) =>
        val expected = Similarity.bruteForceTopK(
          queries.filter($"qid" === q).drop("qlabel"),
          corpus.filter($"label" =!= ql).drop("label"), 5)
          .select("neighbor_id").as[Long].collect().toSet
        val got = negs.filter(_._1 == q).map(_._2).toSet
        assert(got == expected, s"query $q")
    }
  }

  test("int8 quantization: max-abs hits ±127, zeros stay zero, cosine survives") {
    val df = Seq(
      (0L, Seq(1.0f, -2.0f, 0.5f, 0.0f)),   // maxabs 2 → q = 64, -127, 32, 0
      (1L, Seq(0.0f, 0.0f, 0.0f, 0.0f)),    // zero vector → all zeros, no NaN
      (2L, Seq(0.001f, -0.001f, 0.0005f, 0.0f)) // tiny scale still spans ±127
    ).toDF("id", "vec")
    val q = Similarity.quantizeInt8(df, $"id", $"vec")
      .as[(Long, Int, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(q(0L) === Seq(64, -127, 32, 0))
    assert(q(1L) === Seq(0, 0, 0, 0))
    assert(q(2L) === Seq(127, -127, 64, 0))
    // reconstruction: int8 cosine of real embeddings ≈ float cosine
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(50)
    val orig = emb.select($"vec_id", $"embedding").as[(Long, Seq[Float])]
      .collect().toMap
    val quant = Similarity.quantizeInt8(emb, $"vec_id", $"embedding")
      .as[(Long, Int, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val ids = orig.keys.toSeq.sorted.take(10)
    for (i <- ids; j <- ids if i < j) {
      val cf = cos(orig(i).map(_.toDouble).toArray, orig(j).map(_.toDouble).toArray)
      val cq = cos(quant(i), quant(j))
      assert(math.abs(cf - cq) < 0.02, s"cosine($i,$j): float $cf vs int8 $cq")
    }
  }

  test("minhash pairs are a subset of exact ngram-jaccard pairs; recall on planted dups") {
    // same shingle size + threshold as the driver-facing dedup_minhash query;
    // minhashPairs verifies candidates with EXACT jaccard, so its pairs must
    // be a subset of the exact inverted-index pairs — the only loss is LSH
    // candidate recall, asserted against the corpus's planted near-dups.
    val docs01 = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val exact = Dedup.ngramJaccardPairs(docs01, $"doc_id", $"text",
        shingleSize = 5, threshold = 0.6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val approx = Dedup.minhashPairs(docs01, $"doc_id", $"text",
        shingleSize = 5, numHashes = 128, bands = 16, threshold = 0.6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(approx.subsetOf(exact),
      s"LSH emitted non-duplicate pairs: ${approx.diff(exact).take(5)}")
    assert(exact.nonEmpty)
    val recall = (approx & exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"minhash recall $recall over ${exact.size} true pairs")
  }

  test("simhash pairs equal brute-force hamming<=3 truth at sf0.01 (banding is lossless here)") {
    // same parameters as the driver-facing dedup_simhash query. Soundness:
    // every emitted pair is verified by exact hamming, so pairs ⊆ truth.
    // Completeness: 4×16-bit chunk banding + pigeonhole means any pair with
    // ≤3 differing bits shares ≥1 chunk, and at 500 docs no bucket can
    // exceed the 2000-doc mega-bucket guard — so recall is exactly 1.
    val docs01 = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val sims = docs01
      .select($"doc_id", T.simhash64(T.wordShingles($"text", 2)).as("sim"))
      .as[(Long, Long)].collect().sortBy(_._1)
    val truth = (for {
      i <- sims.indices.iterator
      j <- (i + 1) until sims.length
      if java.lang.Long.bitCount(sims(i)._2 ^ sims(j)._2) <= 3
    } yield (sims(i)._1, sims(j)._1)).toSet
    val approx = Dedup.simhashPairs(docs01, $"doc_id", $"text", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(approx.subsetOf(truth),
      s"simhash emitted pairs beyond hamming 3: ${approx.diff(truth).take(5)}")
    assert(truth.nonEmpty)
    assert(approx === truth,
      s"missed ${truth.diff(approx).size} of ${truth.size} true pairs")
  }

  test("embedding near-dup pairs are a subset of brute-force cosine>=threshold truth") {
    // same threshold/nBits as the driver-facing dedup_embedding query.
    // Soundness: emitted pairs are verified by exact cosine, so every pair
    // must appear in the driver-side brute-force truth (tiny FP slack for
    // a different accumulation order). Recall is the documented SRP trade
    // (single bucket per vector): assert it is nonzero, not tight.
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val vecs = emb.select($"vec_id", $"embedding")
      .as[(Long, Seq[Float])].collect().sortBy(_._1)
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
        i += 1
      }
      if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val threshold = 0.35
    val truth = (for {
      i <- vecs.indices.iterator
      j <- (i + 1) until vecs.length
      if cos(vecs(i)._2, vecs(j)._2) >= threshold - 1e-9
    } yield (vecs(i)._1, vecs(j)._1)).toSet
    val approx = Dedup.embeddingNearDupPairs(emb, $"vec_id", $"embedding",
        threshold = threshold, nBits = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(approx.subsetOf(truth),
      s"SRP emitted pairs below the cosine threshold: ${approx.diff(truth).take(5)}")
    assert(truth.nonEmpty, "corpus has no true pairs at this threshold — spec is vacuous")
    assert(approx.nonEmpty, "SRP bucketing found no true pair at all")
  }

  test("IVF centroid training is deterministic: identical output across runs") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val corpus = emb.select($"vec_id".as("id"), $"embedding".as("vec"))
    def run() = Similarity.ivfTopK(queries, corpus, 5, nCells = 8, nProbe = 3)
      .collect().map(_.toSeq).toSeq
    assert(run() === run())
  }

  test("PII redaction replaces emails, phones, IPs with typed placeholders") {
    val df = Seq(
      (1L, "contact bob.smith+x@example.co.uk or call 555-123-4567 now"),
      (2L, "server at 192.168.1.254 responded"),
      (3L, "no pii here at all"))
      .toDF("doc_id", "text")
    // same projection as Queries.redactPii, over planted PII
    val redacted = df.select($"doc_id",
      regexp_replace(regexp_replace(regexp_replace($"text",
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
        "\\d{3}[-. ]\\d{3}[-. ]\\d{4}", "<PHONE>"),
        "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>").as("redacted"))
      .as[(Long, String)].collect().toMap
    assert(redacted(1L) === "contact <EMAIL> or call <PHONE> now")
    assert(redacted(2L) === "server at <IP> responded")
    assert(redacted(3L) === "no pii here at all")
  }

  test("repetition ratio: fully repeated text scores high, varied text scores 0") {
    val spam = ("buy now " * 20).trim // 40 tokens, 38 3-grams, 3 distinct
    val varied = "one two three four five six seven eight nine ten"
    val short = "too short"
    val df = Seq((1L, spam), (2L, varied), (3L, short)).toDF("doc_id", "text")
    import graft.functions.{TextFunctions => TF}
    val scored = df
      .select($"doc_id", TF.tokens($"text").as("toks"))
      .select($"doc_id",
        when(size($"toks") < 3, lit(0.0)).otherwise(
          round(lit(1.0) - size(array_distinct(transform(
            sequence(lit(0), size($"toks") - 3),
            i => concat_ws(" ", element_at($"toks", i + 1),
              element_at($"toks", i + 2), element_at($"toks", i + 3))))).cast("double") /
            (size($"toks") - 2).cast("double"), 6)).as("rep_ratio"))
      .as[(Long, Double)].collect().toMap
    assert(scored(1L) > 0.9, s"spam scored ${scored(1L)}")
    assert(scored(2L) === 0.0)
    assert(scored(3L) === 0.0, "shorter than one 3-gram")
  }

  test("vector expressions: cosine of identical/orthogonal vectors") {
    val df = Seq(
      (Seq(1f, 0f), Seq(1f, 0f), 1.0),
      (Seq(1f, 0f), Seq(0f, 1f), 0.0),
      (Seq(1f, 1f), Seq(-1f, -1f), -1.0),
      (Seq(0f, 0f), Seq(1f, 1f), 0.0) // zero-norm guard
    ).toDF("a", "b", "expected")
    df.select(V.cosine($"a", $"b").as("c"), $"expected").collect()
      .foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("repeated-span removal cuts every cross-doc k-gram span, merges overlaps") {
    val d = Seq(
      (0L, "x a b c y"),           // "a b c" repeats in doc 1 → positions 1-3 cut
      (1L, "z a b c w"),
      (2L, "p q r s t"),           // all grams unique → untouched
      (3L, "a b c a b c"),         // overlapping repeats of "a b c" → fully covered
      (4L, "aa bb"),               // shorter than k → no grams, untouched
      (5L, "")                     // empty text → zero words
    ).toDF("doc_id", "text")
    val out = Dedup.repeatedSpanRemoval(d, $"doc_id", $"text", k = 3)
      .as[(Long, Int, Int, String)].collect().map(r => r._1 -> r).toMap
    assert(out(0L) === ((0L, 5, 3, "x y")))
    assert(out(1L) === ((1L, 5, 3, "z w")))
    assert(out(2L) === ((2L, 5, 0, "p q r s t")))
    assert(out(3L) === ((3L, 6, 6, "")))
    assert(out(4L) === ((4L, 2, 0, "aa bb")))
    assert(out(5L) === ((5L, 0, 0, "")))
  }

  test("repeated-span removal: within-doc repeats alone reach minCount") {
    val d = Seq(
      (0L, "u v w m n u v w"), // "u v w" twice in ONE doc
      (1L, "q r s t x y z q")
    ).toDF("doc_id", "text")
    val out = Dedup.repeatedSpanRemoval(d, $"doc_id", $"text", k = 3)
      .as[(Long, Int, Int, String)].collect().map(r => r._1 -> r).toMap
    assert(out(0L) === ((0L, 8, 6, "m n")))
    assert(out(1L)._3 === 0)
  }

  test("semantic dedup drops higher-id near-identical cluster-mates only") {
    val d = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(0.999f, 0.001f)), // near-dup of 0 → dropped
      (2L, Seq(0.0f, 1.0f)),
      (3L, Seq(0.0f, 1.0f)),     // exact dup of 2 → dropped
      (4L, Seq(0.7f, 0.7f))      // same cluster as 2/3 but cos ≈ 0.707 → kept
    ).toDF("vec_id", "embedding")
    val out = Dedup.semanticDedup(d, $"vec_id", $"embedding",
        k = 2, iters = 2, tau = 0.99)
      .as[(Long, Int)].collect().toMap
    assert(out.keySet === Set(0L, 2L, 4L))
    // 2 and 4 must share a cluster (the drop decision was within-cluster)
    assert(out(2L) === out(4L))
    assert(out(0L) !== out(2L))
  }
}
