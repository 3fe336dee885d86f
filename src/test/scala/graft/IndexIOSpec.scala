package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.Row

import graft.core.Schemas
import graft.core.log.IndexIO
import graft.core.log.IndexIO.IndexRow

/** Driver-side index parquet I/O (round-18 optimization: the per-append
  * index reload / delta write / batch-replay check stopped being Spark
  * jobs). Pins the two interop directions — Spark must read what IndexIO
  * writes, IndexIO must read what Spark writes — and the null handling of
  * `batch_id`, because a silent mismatch here would corrupt offset
  * assignment rather than crash. */
class IndexIOSpec extends SparkSpec {

  private val rows = Seq(
    IndexRow("t", 0, "f0.parquet", 0L, 99L, 100L, None),
    IndexRow("t", 1, "f1.parquet", 0L, 49L, 50L, Some(7L)),
    IndexRow("t", 0, "__hwm__", 100L, 99L, 0L, None))

  test("IndexIO round-trip: writeFile rows come back via readRows") {
    val dir = tmpDir("graft-indexio-rt")
    IndexIO.writeFile(new Path(s"$dir/delta-a.parquet"), rows)
    val back = IndexIO.readRows(dir).toSet
    assert(back === rows.toSet)
  }

  test("Spark reads an IndexIO-written delta under the pinned index schema") {
    val dir = tmpDir("graft-indexio-spark")
    IndexIO.writeFile(new Path(s"$dir/delta-a.parquet"), rows)
    val got = spark.read.schema(Schemas.index).parquet(dir)
      .collect()
      .map(r => IndexRow(r.getString(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5),
        if (r.isNullAt(6)) None else Some(r.getLong(6))))
      .toSet
    assert(got === rows.toSet)
  }

  test("IndexIO reads a Spark-written index file (legacy deltas, compacted indexes)") {
    val dir = tmpDir("graft-indexio-legacy")
    val sparkRows = rows.map(r => Row(r.topic, r.partition, r.file,
      r.baseOffset, r.endOffset, r.count, r.batchId.map(Long.box).orNull))
    spark.createDataFrame(java.util.Arrays.asList(sparkRows: _*), Schemas.index)
      .coalesce(1).write.mode("overwrite").parquet(dir)
    assert(IndexIO.readRows(dir).toSet === rows.toSet)
  }

  test("readRows skips dot/underscore files and handles a missing dir") {
    val dir = tmpDir("graft-indexio-skip")
    IndexIO.writeFile(new Path(s"$dir/delta-a.parquet"), rows.take(1))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/_SUCCESS"), "")
    assert(IndexIO.readRows(dir).length === 1)
    assert(IndexIO.readRows(s"$dir/never-created").isEmpty)
  }
}
