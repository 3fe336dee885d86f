package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level operations on the `headers` array-of-struct column.
  *
  * Mirrors the reference's Headers multimap semantics
  * (reference: src/main/java/commons/headers/Headers.java:11-83): insertion
  * order preserved, duplicate keys allowed, `lastHeader` returns the most
  * recently added value for a key, `remove` drops every value for a key.
  * All pure built-in `functions` — array columns keep order, so the multimap
  * contract ports directly.
  */
object HeaderFunctions {

  def header(key: Column, value: Column): Column =
    struct(key.as("key"), value.cast("binary").as("value"))

  /** Append one header (duplicates allowed). Headers.add(k, v). */
  def addHeader(headers: Column, key: Column, value: Column): Column =
    array_append(coalesce(headers, array().cast("array<struct<key:string,value:binary>>")),
      header(key, value))

  /** All values for a key, in insertion order. Headers.headers(k). */
  def headersFor(headers: Column, key: String): Column =
    transform(filter(headers, h => h.getField("key") === key), h => h.getField("value"))

  /** Last-added value for a key, null when absent. Headers.lastHeader(k). */
  def lastHeader(headers: Column, key: String): Column =
    element_at(headersFor(headers, key), -1)

  /** Drop every header with this key. Headers.remove(k). */
  def removeHeader(headers: Column, key: String): Column =
    filter(headers, h => h.getField("key") =!= key)

  /** Number of header entries (duplicates counted). */
  def headerCount(headers: Column): Column =
    coalesce(size(headers), lit(0))
}
