package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Gopher-style document quality rules [Rae et al., "Scaling Language
  * Models: Methods, Analysis & Insights from Training Gopher", 2021,
  * Appendix A] — the published heuristic filter set LLM corpora are
  * cleaned with.
  *
  * Every signal is a higher-order array function over the token list —
  * one codegen'd pass on the scan, row-local, no shuffle — which also
  * means the SAME operator runs unchanged on a streaming DataFrame
  * (spec-asserted batch≡streaming). Thresholds compare the 6-dp ROUNDED
  * ratios so any two engines (or a replay) decide boundaries on identical
  * doubles.
  */
object Quality {

  /** Stopword set for the presence rule (tiny on purpose — a quality
    * signal, not NLP). */
  val GopherStopwords: Seq[String] = Seq("the", "a", "of", "and", "in", "to", "is")

  /** The pass/fail verdict as ONE row-local boolean column over `text` —
    * the filter form of [[gopherSignals]] for pipelines that need only
    * the verdict: no join, no second scan, stays inside the scan's
    * codegen span. Boundary decisions are IDENTICAL to [[gopherSignals]]
    * (same expressions, same 6-dp rounding; spec-pinned equal). */
  def gopherPasses(
      text: Column,
      minTokens: Int = 50,
      maxTokens: Int = 100000,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      minAlphaFrac: Double = 0.8,
      minStopwords: Int = 2,
      stopwords: Seq[String] = GopherStopwords): Column = {
    val toks = TextFunctions.tokens(text)
    val n = size(toks)
    val meanLen = when(n === 0, lit(null).cast("double")).otherwise(
      round(aggregate(toks, lit(0L), (acc, x) => acc + length(x))
        .cast("double") / n.cast("double"), 6))
    val alphaFrac = when(n === 0, lit(null).cast("double")).otherwise(
      round(size(filter(toks, x => x.rlike("[a-z]"))).cast("double") /
        n.cast("double"), 6))
    val nStop = size(array_intersect(array_distinct(toks),
      array(stopwords.map(lit): _*)))
    coalesce(
      n.between(minTokens, maxTokens) &&
        meanLen.between(minMeanWordLen, maxMeanWordLen) &&
        alphaFrac >= minAlphaFrac &&
        nStop >= minStopwords, lit(false))
  }

  /** Per-document signals + pass flag: (id, n_tokens, mean_word_len,
    * alpha_frac, n_stopwords, passes).
    *
    * Defaults are the PUBLISHED Gopher thresholds (50–100,000 words,
    * mean word length 3–10, ≥ 80% alphabetic, ≥ 2 stopwords) — callers
    * filtering a corpus with atypical document lengths (e.g. the test
    * corpus's 10–99-token docs) must override explicitly rather than
    * inherit demo-tuned numbers from the library. */
  def gopherSignals(
      df: DataFrame,
      id: Column,
      text: Column,
      minTokens: Int = 50,
      maxTokens: Int = 100000,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      minAlphaFrac: Double = 0.8,
      minStopwords: Int = 2,
      stopwords: Seq[String] = GopherStopwords): DataFrame =
    df.select(id.as("id"), TextFunctions.tokens(text).as("toks"))
      .select(col("id"), col("toks"), size(col("toks")).as("n_tokens"))
      .select(
        col("id"), col("n_tokens"),
        // zero-token docs get null ratios (never NaN — 0/0 would poison
        // downstream comparisons nondeterministically across engines) and
        // always fail `passes` via the coalesce below
        when(col("n_tokens") === 0, lit(null).cast("double")).otherwise(
          round(aggregate(col("toks"), lit(0L), (acc, x) => acc + length(x))
            .cast("double") / col("n_tokens").cast("double"), 6))
          .as("mean_word_len"),
        when(col("n_tokens") === 0, lit(null).cast("double")).otherwise(
          round(size(filter(col("toks"), x => x.rlike("[a-z]"))).cast("double") /
            col("n_tokens").cast("double"), 6)).as("alpha_frac"),
        size(array_intersect(array_distinct(col("toks")),
          array(stopwords.map(lit): _*))).as("n_stopwords"))
      .withColumn("passes", coalesce(
        col("n_tokens").between(minTokens, maxTokens) &&
          col("mean_word_len").between(minMeanWordLen, maxMeanWordLen) &&
          col("alpha_frac") >= minAlphaFrac &&
          col("n_stopwords") >= minStopwords, lit(false)))

  /** Measured size of one persisted LM count table: exact row count plus
    * estimated in-memory bytes of the BROADCAST HASHED RELATION it would
    * become — (gram text bytes + 8 B count column + per-row UnsafeRow
    * overhead) × a hashed-relation expansion factor (hash table buckets,
    * pointer arrays, page rounding measured at ~3-4× raw row bytes). The
    * estimate is deliberately biased HIGH: the gate compares `estBytes`,
    * and admitting a table whose real footprint is several × the raw
    * bytes is the failure mode the factor exists to prevent. */
  final case class LmTableStat(rows: Long, estBytes: Long)

  /** An order-`n` stupid-backoff scoring plan plus the lifecycle of the
    * persisted count tables it joins against. The tables stay cached
    * until [[unpersist]] — the CALLER owns that call (repo convention:
    * sink or materialize `scores`, then `unpersist()` in a finally).
    * `scores` stays correct after `unpersist()` — the plan recomputes the
    * count aggregations instead of reading cache. */
  final case class LmScore(
      scores: DataFrame,
      tableStats: Map[Int, LmTableStat],
      private val persisted: Seq[DataFrame]) {
    def unpersist(): Unit = persisted.foreach(_.unpersist(false))
  }

  /** Order-`n` corpus language-model quality score with COUNT PRUNING and
    * STUPID BACKOFF [Brants et al., "Large Language Models in Machine
    * Translation", EMNLP 2007] — the CCNet-style filter at its real
    * order (the repo's `lm_score_bigram` is its order-2 on-ramp; this is
    * the filter itself).
    *
    * Per scoring position (each adjacent `n`-gram of the lowercased
    * non-empty token stream):
    * {{{ S(w_i | ctx) = c(ngram)/c(ctx)          if the n-gram survives
    *                    α · S(w_i | shorter ctx)  otherwise (recursively)
    *     S(w_i)       = c(w_i)/N                  at order 1 }}}
    * Count tables of order ≥ 2 keep only entries with count ≥ `minCount`
    * (the Zipf-head argument: pruning drops the exponentially-long tail
    * of singleton grams while the scores of real text barely move — the
    * lever that makes an order-5 web-corpus model broadcastable). A
    * surviving numerator's context ALWAYS survives too (count(ctx) ≥
    * count(ngram) ≥ minCount), and the order-1 fallback is total
    * (c(w_i) ≥ 1), so the score is never null/zero.
    *
    * Output: (doc_id, n_grams, nll) — n_grams = scoring positions, nll =
    * mean −ln S, DECIMAL(28,18)-summed then 6-dp rounded (the repo float
    * contract); docs with < n tokens score 0 with n_grams 0.
    *
    * Scale shape: n per-order count aggregations over the corpus (each
    * map-side combined; the pruned tables of order ≥ 2 are Zipf-
    * truncated) and a scoring pass of 2(n−1)+1 left joins. The
    * aggregations stay PER-ORDER — one tagged (k, g) aggregation was
    * measured and rejected: a single map-side agg hash table spanning
    * every order's key space spills where the per-order maps fit — but
    * they all materialize inside ONE Spark job: a union of n 1-row stats
    * aggregates (rows, gram bytes for the broadcast gate, count sum —
    * order 1's is the corpus token total) collects once, and its n
    * independent cache-filling subtrees run concurrently. EAGER AT
    * CONSTRUCTION: building the returned plan runs that one job up
    * front; callers that only wanted a lazy plan get it anyway. A table joins
    * BROADCAST iff its estimated in-memory size (gram bytes + 24 B/row
    * overhead) is ≤ `maxBroadcastBytes` — a BYTE gate, because broadcast
    * memory is bounded in bytes, not rows; larger tables fall back to a
    * shuffled join on the gram key (Catalyst picks sort-merge /
    * shuffled-hash) instead of forcing a driver OOM with an unconditional
    * hint. The UNIGRAM table is the known memory bound: it cannot be
    * count-pruned (the order-1 fallback must be total), so on a web
    * corpus its distinct-token footprint — hundreds of millions of tail
    * tokens — is what trips the fallback; cap the vocabulary upstream
    * (map tail tokens to an OOV symbol before scoring) if the broadcast
    * path is required. α-power factors are pinned literals computed by
    * iterated multiplication so the oracle embeds bit-identical
    * constants.
    *
    * Lifecycle: the count tables stay persisted (MEMORY_AND_DISK) until
    * the caller invokes [[LmScore.unpersist]] — materialize or sink
    * `scores` first, unpersist in a finally. */
  def lmScoreStupidBackoff(
      df: DataFrame,
      id: Column,
      text: Column,
      n: Int,
      minCount: Long = 2L,
      alpha: Double = 0.4,
      maxBroadcastBytes: Long = 64L << 20): LmScore = {
    require(n >= 2, s"order must be >= 2: $n")
    val low = lower(text)
    def table(k: Int): DataFrame = {
      val t = df.select(explode(TextFunctions.wordNgrams(low, k)).as("g"))
        .groupBy("g").agg(count(lit(1)).as("c"))
      if (k >= 2) t.filter(col("c") >= minCount) else t
    }
    // The n count tables stay PER-ORDER aggregations (a single tagged
    // (k, g) aggregation was tried in r18 and REVERTED on 32× evidence:
    // one map-side agg hash table spanning every order's key space spills
    // where the per-order maps did not — 13.7 → 46.7 s at 32×), but they
    // materialize in ONE job: each table's stats row (rows + gram bytes —
    // the broadcast gate's input — and the count sum, order 1's being the
    // corpus token total) is a 1-row aggregate over the persisted table,
    // and the UNION of those n rows collects once. The n cache-filling
    // chains are independent subtrees of that one action, so Spark runs
    // them CONCURRENTLY (guide §2.6) — the per-table form paid n + n
    // sequential jobs (persist-fill + stats each); this pays 1.
    //
    // NOTE (r19, tried and REVERTED — do not re-try without new evidence):
    // PREFIX-FUSED context counts. The order-k scoring position's context
    // is the (k−1)-word prefix of its numerator gram, so attaching
    // c(prefix) to each order-k table row (a table-scale join against
    // table k−1 at construction) collapses the scoring chain from
    // 2(n−1)+1 to n joins. Measured at sf0.1: 20 → 28 driver jobs and
    // 392 → 648 executed tasks per steady pass — the n−1 table-table
    // prefix joins cost ~8 extra AQE shuffle stages (the fills chain
    // through persisted table k−1, and neither exchange nor broadcast
    // reuse deduplicates them), which outweighs the n−1 saved broadcast
    // builds in the ≤gate regime the bench (and any pruned-table corpus)
    // runs in. The fusion only pays when the tables EXCEED the broadcast
    // gate — there it cuts corpus-stream shuffles 2(n−1)+1 → n — but that
    // regime starts at vocabularies past maxBroadcastBytes/≈40 B rows,
    // and the unconditional construction cost is the wrong trade for
    // every corpus below it.
    val persisted = (1 to n).map { k =>
      k -> table(k)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }.toMap
    val statsByK = persisted.toSeq.sortBy(_._1)
      .map { case (k, t) =>
        t.agg(count(lit(1)).as("rows"),
            coalesce(sum(octet_length(col("g"))), lit(0L)).as("gb"),
            coalesce(sum(col("c")), lit(0L)).as("cs"))
          .select(lit(k).as("k"), col("rows"), col("gb"), col("cs"))
      }
      .reduce(_ unionAll _)
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val tables = (1 to n).map { k =>
      val (rows, gramBytes, countSum) = statsByK.getOrElse(k, (0L, 0L, 0L))
      // raw row = gram bytes + 8 B count + 24 B UnsafeRow overhead; ×4
      // for the BroadcastHashRelation's in-memory expansion
      k -> (persisted(k),
        LmTableStat(rows, (gramBytes + 32L * rows) * 4L), countSum)
    }.toMap
    // broadcast-iff-small IN BYTES: an unconditional hint would OOM the
    // driver on web-corpus tables; an over-threshold table joins shuffled
    def joinSide(k: Int): DataFrame = {
      val (t, stat, _) = tables(k)
      if (stat.estBytes <= maxBroadcastBytes) broadcast(t) else t
    }
    // total token occurrences (from the unigram stats row — null-safe: an
    // empty corpus has no unigrams and every doc scores 0)
    val nTotal = math.max(1L, tables(1)._3).toDouble
    // α^j by iterated multiplication (pinned; math.pow could differ)
    val alphaPow = Iterator.iterate(1.0)(_ * alpha).take(n).toArray
    // scoring positions with their numerator/context sub-grams: order-k
    // numerator = words (n-k+1)..n of the position, context drops the
    // last word
    def sub(a: Int, b: Int): Column =
      array_join(slice(col("__w"), a, b - a + 1), " ")
    var pos = df.select(id.as("doc_id"),
        explode(TextFunctions.wordNgrams(low, n)).as("__g"))
      .withColumn("__w", split(col("__g"), " "))
    for (k <- 2 to n) {
      pos = pos.withColumn(s"__num$k", sub(n - k + 1, n))
        .withColumn(s"__ctx$k", sub(n - k + 1, n - 1))
    }
    pos = pos.withColumn("__num1", sub(n, n)).drop("__w", "__g")
    var joined = pos
    for (k <- n to 2 by -1) {
      joined = joined
        .join(joinSide(k)
            .select(col("g").as(s"__num$k"), col("c").as(s"__cnum$k")),
          Seq(s"__num$k"), "left")
        .join(joinSide(k - 1)
            .select(col("g").as(s"__ctx$k"), col("c").as(s"__cctx$k")),
          Seq(s"__ctx$k"), "left")
    }
    joined = joined.join(joinSide(1)
        .select(col("g").as("__num1"), col("c").as("__cnum1")),
      Seq("__num1"), "left")
    var score: Column =
      lit(alphaPow(n - 1)) * col("__cnum1").cast("double") / lit(nTotal)
    for (k <- 2 to n) {
      score = when(col(s"__cnum$k").isNotNull,
        lit(alphaPow(n - k)) * col(s"__cnum$k").cast("double") /
          col(s"__cctx$k").cast("double")).otherwise(score)
    }
    val scored = joined
      .withColumn("__nll", (-log(score)).cast("decimal(28,18)"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        round(sum(col("__nll")).cast("double") /
          count(lit(1)).cast("double"), 6).as("nll"))
    val out = df.select(id.as("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("nll"), lit(0.0)).as("nll"))
    LmScore(out,
      tables.map { case (k, (_, stat, _)) => k -> stat },
      persisted.values.toSeq)
  }
}
