package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL (one JSON object per line) ingestion — the de-facto interchange
  * format of crawl dumps and training corpora — with schema-pinned
  * parsing and corrupt-line quarantine.
  *
  * Design: read lines with the TEXT source and parse with `from_json`
  * instead of `spark.read.json`:
  *
  *   - schema is PINNED, never inferred — inference is a full extra pass
  *     over 100 TB and can silently widen/narrow types between crawls;
  *   - `from_json` is a codegen'd expression on the scan: parse, project,
  *     and any downstream filter run in ONE whole-stage pass;
  *   - malformed lines become a NULL struct, so quarantine is a row-local
  *     predicate — no PERMISSIVE-mode `_corrupt_record` column, which
  *     requires caching the frame to filter on (Spark refuses the
  *     raw-column-only query) — a non-starter at corpus scale;
  *   - the raw line rides along for the quarantine sink, pruned away by
  *     column projection on the happy path.
  *
  * A JSON object that parses but is MISSING fields yields nulls in those
  * fields (standard JSON semantics), not quarantine; add a row predicate
  * for required fields when the distinction matters.
  */
object Jsonl {

  /** Parsed frame: the schema's fields plus `_raw` (the original line,
    * non-null ONLY for malformed lines — the quarantine marker).
    *
    * `_raw` is `from_json`'s corrupt-record column INSIDE the parsed
    * struct: a PARTIAL parse (e.g. a missing comma after a valid prefix)
    * yields a struct with some fields populated, never a null struct, so
    * "is the struct null" under-detects — the corrupt column is set for
    * any malformed line regardless of how far the parser got. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains("_raw"),
      "schema may not contain the reserved quarantine column _raw")
    val parseSchema = schema.add("_raw", org.apache.spark.sql.types.StringType)
    spark.read.text(path)
      .select(from_json(col("value"), parseSchema,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> "_raw")).as("j"))
      .select(col("j.*"))
  }

  /** Split a [[read]] frame into (good, quarantine): good drops the
    * marker column; quarantine is the raw bad lines. Two filters over one
    * scan — Spark reuses the shared subplan, and each side stays a
    * row-local codegen'd predicate. */
  def split(parsed: DataFrame): (DataFrame, DataFrame) =
    (parsed.filter(col("_raw").isNull).drop("_raw"),
      parsed.filter(col("_raw").isNotNull).select(col("_raw").as("line")))

  /** Write a frame as JSONL (Spark's JSON sink — one object per line,
    * strings escaped, so any text column round-trips). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
