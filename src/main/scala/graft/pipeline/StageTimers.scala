package graft.pipeline

/** Opt-in wall-clock phase timers for the fused pipeline paths.
  *
  * The probe/dedup chain is deliberately ONE lazily-evaluated plan with a
  * single materializing action ([[LshIndex.ingestBatch]]), so "how long
  * did the probe take" cannot be answered by timing sub-frames without
  * forcing extra actions (which would change the measured thing). What IS
  * separable is the chain's real actions — the fused verdict count, the
  * concurrent table appends, the survivor materialization — and those are
  * what these timers record.
  *
  * Disabled by default (a hot path must not pay a map write per batch);
  * [[graft.Bench]] enables it around one solo invocation to emit the
  * per-stage breakdown next to the headline number. Not thread-safe
  * across concurrent BATCHES (last writer wins per key) — the bench's
  * solo invocation is single-batch by construction. */
object StageTimers {
  @volatile private var enabled = false
  private val times =
    new java.util.concurrent.ConcurrentHashMap[String, Double]()

  /** Innermost phase currently executing on the driver (diagnostics:
    * lets a SparkListener attribute jobs to phases). Best-effort — single
    * solo batch only, like the timers themselves. */
  @volatile var currentPhase: String = ""

  def timed[T](name: String)(body: => T): T =
    if (!enabled) body
    else {
      val prev = currentPhase
      currentPhase = name
      val t0 = System.nanoTime()
      try body
      finally {
        times.put(name, (System.nanoTime() - t0) / 1e9)
        currentPhase = prev
      }
    }

  /** Enable, run `body`, return (result, recorded phases), disable. */
  def capture[T](body: => T): (T, Map[String, Double]) = {
    times.clear()
    enabled = true
    try {
      val r = body
      (r, scala.jdk.CollectionConverters.MapHasAsScala(times).asScala.toMap)
    } finally {
      enabled = false
      times.clear()
    }
  }
}
