package graft.core

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{FileAlreadyExistsException, Files, Paths, StandardOpenOption}
import java.util.concurrent.{ConcurrentHashMap, Executors, ScheduledFuture, TimeUnit}
import java.util.concurrent.locks.ReentrantLock
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import graft.core.catalog.Warehouse

/** Cross-JVM mutual exclusion, scoped to a warehouse: an O_EXCL lock file
  * under `<root>/_locks/` plus a JVM-level striped lock. Serializes the
  * mutators of one topic's log + index (append, retention, compaction,
  * deletion) while leaving different topics fully parallel — the reference
  * locks per partition inside one broker process
  * (reference: src/main/java/commons/utils/PartitionWriteManager.java:33-84);
  * our write unit is the Spark job, so the lock unit is the topic (or, for
  * disjoint explicit-partition appends, the partition — see
  * [[withPartitionLocks]]).
  *
  * Two layers, because each covers the other's blind spot:
  *
  *   - '''In-process''': a striped [[ReentrantLock]] keyed by
  *     `(warehouse root, lock name)`. Hadoop's `LocalFileSystem` implements
  *     `create(overwrite = false)` as a non-atomic exists-then-open, so two
  *     threads of one JVM CAN both "win" the file — the JVM lock makes that
  *     race impossible where it is cheapest to prevent.
  *   - '''Cross-process''': the lock file, created atomically —
  *     `java.nio.file.Files` `CREATE_NEW` (true O_EXCL) for `file:`
  *     warehouses, `fs.create(overwrite = false)` elsewhere (atomic on real
  *     DFS implementations such as HDFS).
  *
  * Crash recovery: the holder stamps `owner pid@host, acquire epoch, and
  * its staleMs horizon` into the file, and a daemon heartbeat refreshes the
  * file's mtime every `staleMs / 3` while the body runs. A lock whose mtime
  * lags by more than the HOLDER's stamped horizon (waiters honor the
  * holder's declared cadence, not their own) can only belong to a dead JVM,
  * so the next acquirer breaks it — by renaming it to a unique tombstone
  * first and re-checking freshness on the tombstone, so that concurrent
  * breakers elect exactly one winner and a freshly re-acquired lock stolen
  * by a delayed breaker is restored, not deleted.
  */
object Locks {

  /** A lock file whose mtime lags now by more than this is presumed
    * abandoned by a crashed JVM and is broken by the next acquirer. Live
    * holders refresh mtime every [[heartbeatPeriod]], so only a crash (or a
    * multi-minute full-GC pause) lets a held lock cross the horizon. */
  val DefaultStaleMs: Long = 10 * 60 * 1000L

  private val jvmLocks = new ConcurrentHashMap[String, ReentrantLock]()

  // Small pool, not a single thread: one hung setTimes on a stalled mount
  // must not starve every OTHER held lock's mtime refresh into staleness.
  private val heartbeats = Executors.newScheduledThreadPool(4, { (r: Runnable) =>
    val t = new Thread(r, "graft-lock-heartbeat"); t.setDaemon(true); t
  })

  private def heartbeatPeriod(staleMs: Long): Long = math.max(staleMs / 3, 250L)

  private lazy val owner: String =
    s"${ProcessHandle.current().pid()}@${java.net.InetAddress.getLocalHost.getHostName}"

  def withLock[T](
      wh: Warehouse,
      name: String,
      timeoutMs: Long = 180000,
      staleMs: Long = DefaultStaleMs)(body: => T): T = {
    // ONE deadline spans both layers — queueing on the in-process lock must
    // not buy the file acquisition a fresh full timeout on top.
    val deadline = System.currentTimeMillis() + timeoutMs
    val jl = jvmLocks.computeIfAbsent(s"${wh.root}\u0000$name", _ => new ReentrantLock())
    if (!jl.tryLock(timeoutMs, TimeUnit.MILLISECONDS))
      throw new IllegalStateException(s"timed out acquiring lock '$name' (in-process)")
    try {
      // Re-entry within a thread: the file is already ours, don't re-acquire.
      if (jl.getHoldCount > 1) body
      else {
        val beat = acquireFile(wh, name, deadline, staleMs)
        try body
        finally {
          beat.cancel(false)
          releaseFile(wh, name)
        }
      }
    } finally jl.unlock()
  }

  /** Topic-wide mutations (retention, compaction, deletion, index rewrite)
    * run under this: the union of every partition's lock, so they exclude
    * both each other and any in-flight per-partition append. */
  def withTopicLock[T](wh: Warehouse, topic: String, numPartitions: Int)(body: => T): T =
    withPartitionLocks(wh, topic, 0 until numPartitions)(body)

  /** Per-partition write locks — the reference's unit of write serialization
    * (PartitionWriteManager.java:33-84 serializes writers per partition and
    * runs partitions in parallel): appends declaring disjoint partition sets
    * commit concurrently; overlapping sets serialize on their shared
    * partitions. Acquisition is in sorted partition order, so any two
    * overlapping sets (including the all-partitions topic lock) acquire
    * their common prefix in the same order — deadlock-free. `#` cannot
    * appear in a validated topic name, so partition lock names never collide
    * across topics.
    *
    * Cost note: a full-set acquisition materializes N lock files (~3N FS
    * metadata ops per append). At 1 ms/RPC on a real DFS that is ~0.1 s for
    * a 32-partition topic — noise against a multi-GB batch commit, and the
    * price of letting partition-scoped writers interleave with topic-wide
    * ones through one uniform, deadlock-free protocol. */
  def withPartitionLocks[T](wh: Warehouse, topic: String, parts: Seq[Int])(body: => T): T = {
    def go(ps: List[Int]): T = ps match {
      case Nil => body
      case p :: rest => withLock(wh, s"topic-$topic#p$p")(go(rest))
    }
    go(parts.distinct.sorted.toList)
  }

  private def lockPath(wh: Warehouse, name: String): Path =
    new Path(s"${wh.root}/_locks/$name.lock")

  private def acquireFile(
      wh: Warehouse, name: String, deadline: Long, staleMs: Long): ScheduledFuture[_] = {
    val lock = lockPath(wh, name)
    val fs = lock.getFileSystem(new Configuration())
    fs.mkdirs(lock.getParent)
    while (!tryCreate(fs, lock, staleMs)) {
      breakIfStale(fs, lock, staleMs)
      if (System.currentTimeMillis() > deadline)
        throw new IllegalStateException(s"timed out acquiring lock '$name'")
      Thread.sleep(100)
    }
    val failures = new java.util.concurrent.atomic.AtomicInteger(0)
    heartbeats.scheduleAtFixedRate(
      () =>
        try { fs.setTimes(lock, System.currentTimeMillis(), -1); failures.set(0) }
        catch {
          case e: Exception =>
            // Never swallow silently: if mtime refresh keeps failing (e.g. a
            // FileSystem without setTimes), the lock WILL cross the stale
            // horizon while legitimately held and a waiter will break it.
            val n = failures.incrementAndGet()
            System.err.println(
              s"[graft] lock heartbeat failed ($n consecutive) for $lock: $e" +
                (if (n.toLong * heartbeatPeriod(staleMs) > staleMs / 2)
                   " — exclusion at risk: a waiter may break this lock as stale"
                 else ""))
        },
      heartbeatPeriod(staleMs), heartbeatPeriod(staleMs), TimeUnit.MILLISECONDS)
  }

  /** Atomically create the lock file stamped with
    * `owner acquireEpoch staleMs`. The holder's staleMs rides in the file
    * so WAITERS judge staleness by the HOLDER's declared horizon (its
    * heartbeat cadence derives from it) — a waiter passing a smaller
    * staleMs must not break a live lock whose heartbeat is slower.
    * Returns false when someone else holds it. */
  private def tryCreate(fs: FileSystem, lock: Path, staleMs: Long): Boolean = {
    val stamp = s"$owner ${System.currentTimeMillis()} $staleMs\n".getBytes(UTF_8)
    if (fs.getUri.getScheme == "file") {
      // LocalFileSystem's create(overwrite=false) is exists-then-open, not
      // atomic; NIO CREATE_NEW is a real O_EXCL open.
      try {
        Files.write(Paths.get(lock.toUri.getPath), stamp,
          StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
        true
      } catch { case _: FileAlreadyExistsException => false }
    } else {
      try {
        val out = fs.create(lock, false)
        try out.write(stamp) finally out.close()
        true
      } catch { case _: java.io.IOException => false }
    }
  }

  /** Break a lock whose holder is presumed dead. Rename-first: of N waiters
    * seeing the same stale file, exactly one rename succeeds. The rename is
    * then RE-CHECKED on the tombstone before discarding: between this
    * waiter's staleness read and its rename, the lock may have been broken
    * by someone else and re-acquired — in that case the renamed file is a
    * LIVE lock (fresh mtime) and is put straight back instead of deleted.
    * Residual exposure is the restore window itself (two renames, metadata
    * ops) in a three-way race of two delayed breakers and a fresh acquirer
    * — accepted for a best-effort FS lock whose horizon is minutes. */
  /** The horizon a waiter must respect for this lock: the HOLDER's stamped
    * staleMs when readable (its heartbeat cadence is derived from it), the
    * waiter's own otherwise (unstamped/corrupt file — e.g. a pre-upgrade
    * or hand-made lock). */
  private def effectiveStaleMs(fs: FileSystem, p: Path, waiterStaleMs: Long): Long =
    try {
      val in = fs.open(p)
      val buf = new Array[Byte](256)
      val n = try in.read(buf) finally in.close()
      val fields = new String(buf, 0, math.max(n, 0), UTF_8).trim.split(" ")
      if (fields.length >= 3) fields(2).toLong else waiterStaleMs
    } catch { case _: Exception => waiterStaleMs }

  private def breakIfStale(fs: FileSystem, lock: Path, staleMs: Long): Unit = {
    val st =
      try fs.getFileStatus(lock)
      catch { case _: java.io.FileNotFoundException => return }
    val horizon = effectiveStaleMs(fs, lock, staleMs)
    if (System.currentTimeMillis() - st.getModificationTime > horizon) {
      val tomb = new Path(lock.getParent,
        s".${lock.getName}.broken-${java.util.UUID.randomUUID().toString.take(8)}")
      if (try fs.rename(lock, tomb) catch { case _: java.io.IOException => false }) {
        val tombStale =
          try System.currentTimeMillis() -
            fs.getFileStatus(tomb).getModificationTime > horizon
          catch { case _: java.io.FileNotFoundException => false }
        if (tombStale) fs.delete(tomb, false)
        else fs.rename(tomb, lock) // stole a live lock — restore it
      }
    }
  }

  private def releaseFile(wh: Warehouse, name: String): Unit = {
    val lock = lockPath(wh, name)
    lock.getFileSystem(new Configuration()).delete(lock, false)
  }
}
