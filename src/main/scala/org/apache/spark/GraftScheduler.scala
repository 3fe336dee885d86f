package org.apache.spark

/** Bridge into `private[spark]` scheduler internals (the core-side sibling
  * of [[org.apache.spark.sql.GraftInternal]]). */
object GraftScheduler {

  /** Block until the async listener bus has delivered every queued event
    * (`LiveListenerBus.waitUntilEmpty`, the hook Spark's own scheduler
    * tests use) — the deterministic alternative to sleeping a fixed beat
    * before reading listener-fed counters. Under load the bus can lag
    * longer than any fixed sleep, misattributing events across a
    * measurement boundary; a drain is exact at every load. */
  def drainListeners(sc: SparkContext, timeoutMs: Long = 30000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch {
      // best-effort: a 30 s-lagged bus means the box is in a steal window;
      // the read is then no worse than the fixed-sleep it replaces
      case _: java.util.concurrent.TimeoutException => ()
    }
}
