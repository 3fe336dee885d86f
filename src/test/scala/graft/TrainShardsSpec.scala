package graft

import org.apache.spark.sql.functions._
import graft.pipeline.TrainShards

/** [[TrainShards]] — the terminal training-shard emitter: shuffle-shard →
  * per-shard greedy pack → ordered sequence roll-up → one file per shard. */
class TrainShardsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (0L until 400L).map { i =>
    (i, Seq.tabulate((i % 7 + 1).toInt)(j => s"w${i}_$j").mkString(" "))
  }.toDF("doc_id", "text")

  test("assign: per-shard greedy packing invariants + roll-up consistency") {
    val a = TrainShards.assign(docs, $"doc_id", $"text",
        budget = 16, numShards = 4, seed = 7L)
      .select($"shard", $"pos", $"doc_id", $"n_tok", $"seq_id", $"text")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getLong(4), r.getString(5)))
    assert(a.length === 400)
    // recompute the greedy rule per shard in pos order
    a.groupBy(_._1).foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_._2).foreach { case (_, _, _, n, seqId, _) =>
        assert(seqId === cum / 16, "doc joins the sequence it STARTS in")
        cum += n
      }
    }
    // sequences() is exactly the ordered roll-up of assign()
    val seqs = TrainShards.sequences(docs, $"doc_id", $"text",
        budget = 16, numShards = 4, seed = 7L)
      .collect()
      .map(r => ((r.getInt(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    val expected = a.groupBy(x => (x._1, x._5)).map { case (k, rows) =>
      val sorted = rows.sortBy(_._2)
      k -> (rows.length.toLong, rows.map(_._4.toLong).sum,
        sorted.map(_._6).mkString(" "))
    }
    assert(seqs === expected)
  }

  test("single-exchange plan: pos rank, pack window and roll-up share one shuffle") {
    val dir = tmpDir("trainshards")
    docs.write.mode("overwrite").parquet(s"$dir/docs")
    val seqs = TrainShards.sequences(spark.read.parquet(s"$dir/docs"),
      $"doc_id", $"text", budget = 16, numShards = 4, seed = 7L)
    seqs.collect()
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    def exchanges(p: SparkPlan): Seq[ShuffleExchangeExec] =
      p.collectWithSubqueries {
        case e: ShuffleExchangeExec => Seq(e)
        case q: QueryStageExec => exchanges(q.plan)
        case a: AdaptiveSparkPlanExec => exchanges(a.executedPlan)
      }.flatten
    val n = exchanges(seqs.queryExecution.executedPlan).length
    assert(n === 1,
      s"hash(shard) must carry ranking, packing AND roll-up; got $n exchanges")
  }

  test("emit: deterministic reruns, one file per shard directory") {
    val out1 = tmpDir("shards1")
    val out2 = tmpDir("shards2")
    val n1 = TrainShards.emit(docs, $"doc_id", $"text", out1,
      budget = 16, numShards = 4, seed = 7L)
    val n2 = TrainShards.emit(docs, $"doc_id", $"text", out2,
      budget = 16, numShards = 4, seed = 7L)
    assert(n1 === n2 && n1 > 0)
    def readAll(d: String) = spark.read.parquet(d)
      .select("shard", "seq_id", "n_docs", "seq_tokens", "seq_text")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(readAll(out1).toSeq === readAll(out2).toSeq)
    (0 until 4).foreach { s =>
      val files = new java.io.File(s"$out1/shard=$s")
        .listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length === 1, s"shard $s: one file per shard per emit")
    }
  }

  test("emitFromTopic: curated topic records become training shards") {
    import graft.core.catalog.{TopicCatalog, Warehouse}
    import graft.core.log.LogWriter
    val wh = Warehouse(tmpDir("tswh"))
    TopicCatalog.createTopic(spark, wh, "curated", 2)
    val recs = (0L until 50L).map(i =>
      (i, 1700000000000L + i, s"k$i", s"chunk text number $i with words"))
      .toDF("rid", "ts", "key", "value")
    LogWriter.append(spark, wh, "curated", recs, "rid")
    val out = tmpDir("tshards")
    val n = TrainShards.emitFromTopic(spark, wh, "curated", out,
      budget = 24, numShards = 2, seed = 3L)
    assert(n > 0)
    val back = spark.read.parquet(out)
    assert(back.agg(sum("n_docs")).head().getLong(0) === 50L)
  }
}
