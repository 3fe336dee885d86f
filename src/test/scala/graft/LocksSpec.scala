package graft

import java.io.File
import java.nio.file.Files
import graft.core.Locks
import graft.core.catalog.Warehouse

class LocksSpec extends SparkSpec {

  private def lockFile(wh: Warehouse, name: String): File =
    new File(s"${wh.root}/_locks/$name.lock")

  test("stale lock from a crashed JVM is broken; acquirer proceeds") {
    val wh = Warehouse(tmpDir("graft-locks-stale"))
    val f = lockFile(wh, "topic-t")
    f.getParentFile.mkdirs()
    Files.writeString(f.toPath, "99999@deadhost 0\n")
    assert(f.setLastModified(System.currentTimeMillis() - 3600 * 1000L))
    val t0 = System.currentTimeMillis()
    val r = Locks.withLock(wh, "topic-t", timeoutMs = 30000, staleMs = 2000) { 42 }
    assert(r === 42)
    assert(System.currentTimeMillis() - t0 < 15000, "stale lock must be broken, not waited out")
    assert(!f.exists(), "lock released after body")
  }

  test("fresh lock held elsewhere blocks until timeout") {
    val wh = Warehouse(tmpDir("graft-locks-held"))
    val f = lockFile(wh, "topic-t")
    f.getParentFile.mkdirs()
    Files.writeString(f.toPath, "99999@otherhost 0\n") // current mtime = live holder
    intercept[IllegalStateException] {
      Locks.withLock(wh, "topic-t", timeoutMs = 1500, staleMs = 60000) { fail("must not enter") }
    }
    assert(f.exists(), "a live foreign lock is never broken")
  }

  test("reentrant within one thread") {
    val wh = Warehouse(tmpDir("graft-locks-reent"))
    val r = Locks.withLock(wh, "topic-t") {
      Locks.withLock(wh, "topic-t") { 7 }
    }
    assert(r === 7)
    assert(!lockFile(wh, "topic-t").exists())
  }

  test("mutual exclusion across threads of one JVM") {
    val wh = Warehouse(tmpDir("graft-locks-mutex"))
    var inside = 0
    var maxInside = 0
    var total = 0
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val fs = (0 until 8).map { _ =>
      Future {
        Locks.withLock(wh, "topic-t") {
          inside += 1
          maxInside = math.max(maxInside, inside)
          Thread.sleep(20)
          total += 1
          inside -= 1
        }
      }
    }
    Await.result(Future.sequence(fs), 60.seconds)
    assert(maxInside === 1, "never two holders at once")
    assert(total === 8)
  }

  test("cross-JVM: a lock held by another PROCESS excludes us; released lock acquires") {
    val wh = Warehouse(tmpDir("graft-locks-xjvm"))
    val p = spawnHolder(wh, holdMs = 4000)
    try {
      // exclusion comes from the lock FILE (the other JVM shares no striped lock)
      intercept[IllegalStateException] {
        Locks.withLock(wh, "topic-t", timeoutMs = 800, staleMs = 600000) { fail("must not enter") }
      }
      // once the holder releases, acquisition succeeds promptly
      assert(p.waitFor(30, java.util.concurrent.TimeUnit.SECONDS), "holder JVM must exit")
      val r = Locks.withLock(wh, "topic-t", timeoutMs = 10000, staleMs = 600000) { 1 }
      assert(r === 1)
    } finally p.destroyForcibly()
  }

  test("cross-JVM: SIGKILLed holder's lock is broken via the stale horizon") {
    val wh = Warehouse(tmpDir("graft-locks-kill"))
    // the holder stamps ITS OWN horizon into the lock file (waiters judge
    // staleness by the holder's declared cadence, not their own)
    val p = spawnHolder(wh, holdMs = 600000, staleMs = 1500) // would hold 10 min
    try {
      p.destroyForcibly() // the crash: no finally, no delete — lock file remains
      assert(p.waitFor(30, java.util.concurrent.TimeUnit.SECONDS))
      val f = lockFile(wh, "topic-t")
      assert(f.exists(), "crashed holder leaves its lock file")
      // age the file past the horizon (in production the heartbeat is dead,
      // so mtime stops advancing and real time does this)
      assert(f.setLastModified(System.currentTimeMillis() - 3600 * 1000L))
      val r = Locks.withLock(wh, "topic-t", timeoutMs = 30000, staleMs = 2000) { 2 }
      assert(r === 2, "stale lock of a dead process is broken, not waited out")
    } finally p.destroyForcibly()
  }

  /** Launch graft.tools.LockHold in a fresh JVM and wait for its HELD marker. */
  private def spawnHolder(
      wh: Warehouse, holdMs: Long,
      staleMs: Long = graft.core.Locks.DefaultStaleMs,
      name: String = "topic-t"): Process = {
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val cp = System.getProperty("java.class.path")
    val p = new ProcessBuilder(
      javaBin, "-cp", cp, "graft.tools.LockHold", wh.root, name,
      holdMs.toString, staleMs.toString)
      .redirectErrorStream(true).start()
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(p.getInputStream))
    val deadline = System.currentTimeMillis() + 30000
    var line = ""
    while (line != "HELD" && System.currentTimeMillis() < deadline) {
      line = reader.readLine()
      if (line == null) throw new IllegalStateException("holder JVM died before HELD")
    }
    assert(line === "HELD", "holder must acquire within 30s")
    p
  }

  test("jvm stripe table evicts entries on last release") {
    val wh = Warehouse(tmpDir("graft-locks-evict"))
    val before = Locks.jvmLockTableSize
    // per-partition lock names: the table would otherwise grow by
    // topics × partitions for the driver's lifetime
    (0 until 16).foreach { t =>
      Locks.withPartitionLocks(wh, s"evict$t", 0 until 4) { () }
    }
    assert(Locks.jvmLockTableSize === before,
      "released lock entries must be evicted, not retained forever")
  }

  test("withPartitionLocks spends ONE timeout budget across the whole set") {
    val wh = Warehouse(tmpDir("graft-locks-budget"))
    // p0 frees after 1.2s; p2 is held far past any deadline. A per-lock
    // timeout would grant p2 a fresh full budget AFTER the p0 wait; the
    // shared deadline fails the whole acquisition at ~timeoutMs total.
    val long = spawnHolder(wh, holdMs = 600000, name = "topic-t#p2")
    val short = spawnHolder(wh, holdMs = 1200, name = "topic-t#p0")
    try {
      val t0 = System.currentTimeMillis()
      intercept[IllegalStateException] {
        Locks.withPartitionLocks(wh, "t", Seq(0, 1, 2), timeoutMs = 2500) {
          fail("must not enter: p2 is held for the whole test")
        }
      }
      val elapsed = System.currentTimeMillis() - t0
      // per-lock timeouts would spend ~1200 (p0) + 2500 (p2) ≈ 3700ms;
      // the shared deadline caps the WHOLE set at ~2500ms
      assert(elapsed < 3200,
        s"one shared deadline (~2500ms), not per-partition accumulation: ${elapsed}ms")
    } finally { short.destroyForcibly(); long.destroyForcibly() }
  }

  test("release never deletes a lock re-acquired by another process") {
    val wh = Warehouse(tmpDir("graft-locks-fence"))
    val f = lockFile(wh, "topic-t")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val holder = Future {
      Locks.withLock(wh, "topic-t", staleMs = 1000) {
        // Simulate a stale-break + re-acquire while we (believe we) hold it:
        // the path now carries a FOREIGN owner's stamp.
        Files.writeString(f.toPath, "55555@usurper 1 600000\n")
        Thread.sleep(1200) // ≥ one heartbeat period: fencing notices too
        "ok"
      }
    }
    assert(Await.result(holder, 30.seconds) === "ok")
    assert(f.exists(), "release must not delete the new owner's lock file")
    assert(Files.readString(f.toPath).startsWith("55555@usurper"),
      "the foreign stamp must be untouched by our release")
  }

  test("held lock survives past the stale horizon (heartbeat refreshes mtime)") {
    val wh = Warehouse(tmpDir("graft-locks-beat"))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val holder = Future {
      Locks.withLock(wh, "topic-t", staleMs = 1000) { Thread.sleep(2500); "held" }
    }
    Thread.sleep(300) // let the holder acquire
    // A contender with the same short horizon must NOT break the live lock
    // (in-process it queues on the JVM lock; the file stays fresh throughout).
    val contender = Future {
      Locks.withLock(wh, "topic-t", timeoutMs = 10000, staleMs = 1000) { "after" }
    }
    assert(Await.result(holder, 30.seconds) === "held")
    assert(Await.result(contender, 30.seconds) === "after")
  }
}
