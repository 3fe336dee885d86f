package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Chunking

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def chunk(docs: Seq[(Long, String)], size: Int, overlap: Int) =
    Chunking.chunkTokens(docs.toDF("id", "text"),
        col("id"), col("text"), size, overlap)
      .orderBy("id", "chunk_id")
      .select("id", "chunk_id", "n_tokens", "chunk_text")
      .as[(Long, Int, Int, String)].collect().toSeq

  test("chunk boundaries: short, exact, one-over, and empty docs") {
    val out = chunk(Seq(
      (0L, "a b c"),                       // 3 < size → one chunk
      (1L, (1 to 8).map("t" + _).mkString(" ")),  // exactly size → one chunk
      (2L, (1 to 9).map("t" + _).mkString(" ")),  // size+1 → two chunks
      (3L, ""),                            // empty → no chunks
      (4L, "   ")                          // whitespace-only → no chunks
    ), size = 8, overlap = 2)
    assert(out.map(_._1).distinct === Seq(0L, 1L, 2L))
    assert(out.filter(_._1 == 0L) === Seq((0L, 0, 3, "a b c")))
    assert(out.filter(_._1 == 1L).map(r => (r._2, r._3)) === Seq((0, 8)))
    // stride 6: chunk 0 = tokens 1-8, chunk 1 = tokens 7-9 (overlap 2)
    assert(out.filter(_._1 == 2L).map(r => (r._2, r._3, r._4)) === Seq(
      (0, 8, (1 to 8).map("t" + _).mkString(" ")),
      (1, 3, "t7 t8 t9")))
  }

  test("coverage property: every token appears; consecutive chunks overlap exactly") {
    val n = 157
    val text = (0 until n).map("w" + _).mkString(" ")
    val size = 32
    val overlap = 8
    val stride = size - overlap
    val out = chunk(Seq((7L, text)), size, overlap)
    // expected chunk count from the documented integer formula
    assert(out.length === (math.max(n - overlap, 1) + stride - 1) / stride)
    out.foreach { case (_, cid, nt, ct) =>
      val toks = ct.split(" ")
      assert(toks.length === nt)
      // chunk i covers tokens [i*stride, i*stride + size)
      assert(toks.head === s"w${cid * stride}")
      assert(nt === math.min(size, n - cid * stride))
    }
    // union of chunks = the document, in order, counting overlaps once
    val reconstructed = out.flatMap { case (_, cid, _, ct) =>
      val toks = ct.split(" ").toSeq
      if (cid == 0) toks else toks.drop(overlap)
    }
    assert(reconstructed === (0 until n).map("w" + _))
  }

  test("zero overlap degenerates to disjoint fixed-size windows") {
    val out = chunk(Seq((1L, (1 to 10).map("x" + _).mkString(" "))), 4, 0)
    assert(out.map(r => (r._2, r._3)) === Seq((0, 4), (1, 4), (2, 2)))
    assert(out.flatMap(_._4.split(" ")) === (1 to 10).map("x" + _))
  }
}
