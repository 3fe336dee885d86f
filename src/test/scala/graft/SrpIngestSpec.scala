package graft

import org.apache.spark.sql.functions._
import graft.pipeline.SrpIndex

/** [[SrpIndex.ingestBatch]] — the embedding-side steady-state curation
  * step, mirroring [[LshIngestSpec]]: per batch, vectors near-dupping the
  * standing corpus drop, the batch dedups within itself (keep-lowest-id),
  * survivors append, and a replayed batch re-derives identical survivors. */
class SrpIngestSpec extends SparkSpec {
  import spark.implicits._

  // axis-aligned unit-ish vectors: scaling preserves both the SRP bucket
  // and cosine (= 1.0 for same direction, 0.0 across axes)
  private def axis(i: Int, scale: Float): Seq[Float] =
    Seq.tabulate(8)(j => if (j == i) scale else 0.0f)

  private def df(rows: (Long, Seq[Float])*) = rows.toDF("vec_id", "embedding")

  test("per-batch: corpus dups drop, within-batch dups dedup, survivors append") {
    val path = tmpDir("graft-srp-ingest")
    SrpIndex.build(df(1L -> axis(0, 1f)), $"vec_id", $"embedding", path,
      nBits = 4)
    val batch = df(
      10L -> axis(0, 2f), // dup of corpus vector 1
      11L -> axis(1, 1f), // novel
      12L -> axis(1, 3f), // within-batch dup of 11
      13L -> axis(2, 1f)) // novel
    val out = SrpIndex.ingestBatch(spark, path, batch,
      $"vec_id", $"embedding", threshold = 0.95)
    assert(out.select("vec_id").as[Long].collect().toSet === Set(11L, 13L))
    out.unpersist()
    // survivors are corpus now: the next batch's dup of 11 drops
    val next = SrpIndex.ingestBatch(spark, path,
      df(20L -> axis(1, 5f)), $"vec_id", $"embedding", threshold = 0.95)
    assert(next.count() === 0L)
    next.unpersist()
  }

  test("replay after append re-derives the identical survivor set") {
    val path = tmpDir("graft-srp-ingest-replay")
    SrpIndex.build(df(1L -> axis(0, 1f)), $"vec_id", $"embedding", path,
      nBits = 4)
    val batch = df(10L -> axis(0, 4f), 11L -> axis(3, 1f))
    def run() = SrpIndex.curateInto(spark, path, batch,
      $"vec_id", $"embedding", threshold = 0.95) {
      _.select("vec_id").as[Long].collect().toSet
    }
    val first = run()
    val replay = run() // crash-after-append: own signatures already indexed
    assert(first === Set(11L))
    assert(replay === first)
  }
}
