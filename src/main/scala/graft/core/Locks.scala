package graft.core

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import graft.core.catalog.Warehouse

/** Best-effort cross-JVM mutual exclusion, scoped to a warehouse: atomic
  * create-no-overwrite of a lock file under `<root>/_locks/`. Serializes the
  * mutators of one topic's log + index (append, retention, compaction,
  * deletion) while leaving different topics fully parallel — the reference
  * locks per partition inside one broker process
  * (reference: src/main/java/commons/utils/PartitionWriteManager.java:33-84);
  * our write unit is the Spark job, so the lock unit is the topic.
  */
object Locks {

  def withLock[T](wh: Warehouse, name: String, timeoutMs: Long = 180000)(body: => T): T = {
    val lock = new Path(s"${wh.root}/_locks/$name.lock")
    val fs = lock.getFileSystem(new Configuration())
    fs.mkdirs(lock.getParent)
    val deadline = System.currentTimeMillis() + timeoutMs
    var acquired = false
    while (!acquired) {
      try { fs.create(lock, false).close(); acquired = true }
      catch {
        case _: java.io.IOException =>
          if (System.currentTimeMillis() > deadline)
            throw new IllegalStateException(s"timed out acquiring lock '$name'")
          Thread.sleep(100)
      }
    }
    try body finally fs.delete(lock, false)
  }

  /** All mutations of one topic's data files or index rows run under this. */
  def withTopicLock[T](wh: Warehouse, topic: String)(body: => T): T =
    withLock(wh, s"topic-$topic")(body)
}
