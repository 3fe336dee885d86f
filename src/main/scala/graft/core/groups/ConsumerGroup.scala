package graft.core.groups

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.catalog.{TopicCatalog, Warehouse}
import graft.core.log.{LogIndex, LogReader}

/** Consumer-group API: subscribe → deterministic assignment → incremental
  * poll → offset commit.
  *
  * The reference's coordinator round (reference:
  * src/main/java/consumer/FluxConsumer.java:52-128 join → sync → install;
  * grpc/services/GroupCoordinatorServiceImpl.java:47-148 leader election +
  * protocol choice) collapses to pure functions here — the driver owns group
  * membership, so `subscribe` is: negotiate protocol, run the assignor,
  * install the member's slice. The offset-commit surface the reference left
  * as a proto stub (SURVEY.md §2.7 Q6, src/main/proto/offset.proto:8-66)
  * is implemented as a committed-offsets table: last-commit-wins per
  * (group, topic, partition), read back with a max-by-commit-ts aggregation.
  */
object ConsumerGroup {

  val offsetsSchema: StructType = StructType(Seq(
    StructField("group_id", StringType, nullable = false),
    StructField("topic", StringType, nullable = false),
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false), // next offset to read
    StructField("commit_ts", LongType, nullable = false)))

  /** The committed-offsets table is SHARDED PER GROUP —
    * `_groups/offsets/<group>/` — with a per-group lock, so unrelated
    * groups' commits run fully in parallel; only a commit and a retention
    * sweep of the SAME group exclude each other (the one pair that must:
    * the sweep's snapshot-rewrite-swap would otherwise erase a commit that
    * landed after its snapshot). Layout v2: pre-shard warehouses (flat
    * parquet files directly under `_groups/offsets/`) are not read — this
    * engine has no cross-revision warehouse persistence contract; re-commit
    * offsets after upgrading a long-lived warehouse. */
  private def offsetsBase(wh: Warehouse): String = s"${wh.root}/_groups/offsets"

  private def groupDir(wh: Warehouse, groupId: String): String =
    s"${offsetsBase(wh)}/$groupId"

  private def groupLock(groupId: String): String = s"group-offsets-$groupId"

  /** Group ids become directory + lock-file names; one shared path-safety
    * policy with topic names ([[graft.core.Names]]). */
  private def validateGroupId(groupId: String): Unit =
    graft.core.Names.check(groupId).foreach(reason =>
      throw new IllegalArgumentException(s"group id '$groupId' $reason"))

  /** Finish a crashed [[retainCommits]] swap of one group's shard. */
  private def healOffsets(wh: Warehouse, groupId: String): Unit = {
    val dir = groupDir(wh, groupId)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    graft.core.Swap.heal(fs, dir)
  }

  case class Membership(
      groupId: String,
      memberId: String,
      protocol: String,
      assignment: Map[String, Seq[Int]]) // topic -> partitions

  /** Join + assign in one step: all members' subscriptions are known to the
    * driver, so the coordinator round is a pure function. Returns every
    * member's installed slice; deterministic for a fixed member set. */
  def subscribe(
      spark: SparkSession,
      wh: Warehouse,
      groupId: String,
      members: Seq[Negotiation.Member],
      topics: Seq[String],
      previous: Map[String, Map[String, Seq[Int]]] = Map.empty)
    : Seq[Membership] = {
    val (leader, protocol) = Negotiation.negotiate(members).getOrElse(
      throw new IllegalArgumentException(
        s"group '$groupId': no protocol supported by every member"))
    val counts = topics.map(t =>
      t -> TopicCatalog.numPartitions(spark, wh, t)).toMap
    val assignor = Assignors.byName(protocol)
    val full = assignor.assign(members.map(_.memberId).sorted, counts, previous)
    val _ = leader // leader identity is observable via Negotiation.negotiate
    members.map { m =>
      Membership(groupId, m.memberId, protocol,
        full.getOrElse(m.memberId, Map.empty))
    }
  }

  /** Committed next-read offsets for a group (last commit wins).
    *
    * Reads the shard unlocked; a concurrent [[retainCommits]] swap makes the
    * dir transiently missing between its two renames (two metadata ops).
    * Naively that window reads as "no commits" and a poll silently restarts
    * from the log beginning — so a missing dir whose `_rewrite`/`_old`
    * sibling exists is retried (heal + re-read) instead of trusted. */
  def committed(
      spark: SparkSession,
      wh: Warehouse,
      groupId: String,
      topic: String): Map[Int, Long] = {
    validateGroupId(groupId)
    val dir = groupDir(wh, groupId)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    def midSwap(): Boolean =
      fs.exists(new org.apache.hadoop.fs.Path(graft.core.Swap.rewriteDir(dir))) ||
        fs.exists(new org.apache.hadoop.fs.Path(graft.core.Swap.oldDir(dir)))
    var attempt = 0
    while (true) {
      healOffsets(wh, groupId)
      attempt += 1
      if (TopicCatalog.dirExists(dir)) {
        try {
          return spark.read.schema(offsetsSchema).parquet(dir)
            .filter(col("topic") === topic)
            .groupBy(col("partition"))
            .agg(max_by(col("offset"), col("commit_ts")).as("offset"))
            .collect()
            .map(r => r.getInt(0) -> r.getLong(1))
            .toMap
        } catch {
          // the swap deleted files under our read (list-then-read TOCTOU —
          // by the time the job fails, the swap may already be fully done,
          // so there is no state left to inspect): just re-list and re-read
          case _: Exception if attempt <= 3 =>
            Thread.sleep(10L * attempt)
        }
      } else if (!midSwap()) {
        return Map.empty // genuinely no commits
      } else if (attempt > 3) {
        // Swap markers still present after heal + retries: the shard EXISTS
        // but is unreadable, which a caller cannot distinguish from "no
        // commits" — returning Map.empty here would silently restart the
        // group from offset 0 and re-deliver everything. Fail loudly; the
        // genuinely-no-commits case returned above.
        throw new IllegalStateException(
          s"group '$groupId': offsets shard swap is stuck after $attempt " +
            s"attempts (markers under ${graft.core.Swap.rewriteDir(dir)} / " +
            s"${graft.core.Swap.oldDir(dir)}) — refusing to report 'no commits'")
      } else {
        Thread.sleep(10L * attempt) // mid-swap blink: heal + re-check
      }
    }
    Map.empty // unreachable
  }

  /** Append a commit row per partition (immutable log of commits; readers
    * take the latest — same append-only discipline as the data path). Runs
    * under THIS GROUP's lock so a concurrent [[retainCommits]] rewrite of
    * the same group can never erase a commit that landed after its
    * snapshot — while other groups commit in parallel. */
  def commit(
      spark: SparkSession,
      wh: Warehouse,
      groupId: String,
      topic: String,
      offsets: Map[Int, Long]): Unit =
    commitAll(spark, wh, groupId, Map(topic -> offsets))

  /** Commit a member's offsets across its WHOLE multi-topic assignment in
    * one locked append — one small file per call instead of one per topic
    * (the shape [[pollAll]] returns). */
  def commitAll(
      spark: SparkSession,
      wh: Warehouse,
      groupId: String,
      offsets: Map[String, Map[Int, Long]]): Unit = {
    validateGroupId(groupId)
    if (offsets.forall(_._2.isEmpty)) return
    graft.core.Locks.withLock(wh, groupLock(groupId)) {
      healOffsets(wh, groupId)
      val now = System.currentTimeMillis()
      val rows = for {
        (topic, perPart) <- offsets.toSeq
        (p, o) <- perPart.toSeq
      } yield Row(groupId, topic, p, o, now)
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), offsetsSchema)
        .coalesce(1)
        .write.mode("append").parquet(groupDir(wh, groupId))
    }
  }

  /** Offset-commit retention: drop superseded commit rows older than the
    * horizon, always keeping the LATEST commit per (group, topic, partition)
    * — `committed()` is unchanged by a sweep. The reference's offset proto
    * carries `retention_time_ms` and an expire timestamp per fetched offset
    * (reference: src/main/proto/offset.proto:30-66); the reference server
    * never implements the sweep, this is the intended lifecycle. Without it
    * the append-only commit log grows with every commit ever made — at one
    * commit per partition per second that is the difference between a
    * bounded metadata table and an unbounded scan on every `committed()`.
    * Same index-first swap discipline as the data path (tmp + rename,
    * healed on next read). */
  def retainCommits(
      spark: SparkSession,
      wh: Warehouse,
      retentionMs: Long,
      nowMs: Long = System.currentTimeMillis()): Unit = {
    val base = new org.apache.hadoop.fs.Path(offsetsBase(wh))
    val fs = base.getFileSystem(new org.apache.hadoop.conf.Configuration())
    if (!fs.exists(base)) return
    val names = fs.listStatus(base)
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filterNot(_.startsWith("."))
    // a group whose previous sweep crashed mid-swap exists ONLY as
    // <g>_rewrite — derive its name too, so the per-group heal below
    // reinstalls it instead of the group silently dropping out of every
    // sweep until some consumer touches it
    val groups = (names.filterNot(graft.core.Swap.isStagingName) ++
      names.filter(_.endsWith("_rewrite")).map(_.stripSuffix("_rewrite"))).distinct
    // one group at a time, each under ITS lock only: the sweep excludes that
    // group's commits (snapshot-rewrite-swap safety) without ever pausing
    // any other group's commit traffic
    groups.foreach { g =>
      graft.core.Locks.withLock(wh, groupLock(g)) {
        healOffsets(wh, g)
        val dir = groupDir(wh, g)
        if (TopicCatalog.dirExists(dir)) {
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col("group_id"), col("topic"), col("partition"))
            .orderBy(col("commit_ts").desc, col("offset").desc)
          val kept = spark.read.schema(offsetsSchema).parquet(dir)
            .withColumn("__rn", row_number().over(w))
            .filter(col("__rn") === 1 || col("commit_ts") >= nowMs - retentionMs)
            .drop("__rn")
          // reader-safe swap (graft.core.Swap): committed() probes from
          // OTHER threads see a missing shard only between two renames
          kept.coalesce(1).write.mode("overwrite")
            .parquet(graft.core.Swap.rewriteDir(dir))
          graft.core.Swap.install(fs, dir)
        }
      }
    }
  }

  /** Poll the next `max` records of each assigned partition past the last
    * commit; returns (records, nextOffsets-to-commit). */
  def poll(
      spark: SparkSession,
      wh: Warehouse,
      groupId: String,
      membership: Membership,
      topic: String,
      max: Long): (DataFrame, Map[Int, Long]) =
    pollFrom(spark, wh, membership, topic, max,
      committed(spark, wh, groupId, topic))

  /** Poll past an already-fetched committed-offset snapshot — lets callers
    * that have just read `committed()` (e.g. [[pollTimeout]]'s availability
    * probe) avoid a second offsets-table read. */
  private def pollFrom(
      spark: SparkSession,
      wh: Warehouse,
      membership: Membership,
      topic: String,
      max: Long,
      from: Map[Int, Long]): (DataFrame, Map[Int, Long]) = {
    val parts = membership.assignment.getOrElse(topic, Seq.empty)
    val frames = parts.map { p =>
      LogReader.poll(spark, wh, topic, p, from.getOrElse(p, 0L), max)
        .withColumn("partition", lit(p))
    }
    val all =
      if (frames.isEmpty)
        spark.createDataFrame(java.util.List.of[Row](), graft.core.Schemas.record)
      else frames.reduce(_ unionByName _)
    // next offsets come from the (already-consulted) index cache, not a
    // second Spark job over the polled frames: offsets are dense per
    // partition, so the highest polled offset is min(log end, from + max)
    // whenever the poll window intersects the committed range.
    val perPart = graft.core.log.IndexCache.entries(spark, wh, topic)
      .filter(_.isData).groupBy(_.partition)
    val next = parts.flatMap { p =>
      val start = from.getOrElse(p, 0L)
      perPart.get(p).flatMap { es =>
        val lo = es.map(_.baseOffset).min
        val hi = es.map(_.endOffset).max
        if (hi >= start && lo < start + max)
          Some(p -> (math.min(hi, start + max - 1) + 1))
        else None
      }
    }.toMap
    (all, from ++ next)
  }

  /** Poll every topic of the member's assignment in one call. The reference
    * installs a full `Map[topic -> partitions]` subscription
    * (reference: src/main/java/consumer/FluxConsumer.java:210-220) but its
    * poll path only ever reaches one topic — this is the union poll the
    * installed shape implies. Records carry a `topic` column; next offsets
    * come back per topic and advance independently (commit them in one
    * locked append via [[commitAll]]). */
  def pollAll(
      spark: SparkSession,
      wh: Warehouse,
      groupId: String,
      membership: Membership,
      max: Long): (DataFrame, Map[String, Map[Int, Long]]) = {
    val topics = membership.assignment.keys.toSeq.sorted
    val polled = topics.map { t =>
      val (df, next) = poll(spark, wh, groupId, membership, t, max)
      (df.withColumn("topic", lit(t)), t -> next)
    }
    val all = polled.map(_._1).reduceOption(_ unionByName _).getOrElse(
      spark.createDataFrame(java.util.List.of[Row](), graft.core.Schemas.record)
        .withColumn("topic", lit(null).cast("string")))
    (all, polled.map(_._2).toMap)
  }

  /** The reference's `poll(Duration)` contract
    * (reference: src/main/java/consumer/FluxConsumer.java:136-147): block up
    * to `timeout` for at least one record to become available past the
    * committed offsets, then poll; an empty result after the deadline means
    * "nothing arrived", never an error. The wait probes only the
    * fingerprint-cached index listing (driver-side metadata, no Spark job
    * per probe), so a long-polling consumer costs one cheap FS listing per
    * interval until data lands. */
  def pollTimeout(
      spark: SparkSession,
      wh: Warehouse,
      groupId: String,
      membership: Membership,
      topic: String,
      max: Long,
      timeout: java.time.Duration,
      probeIntervalMs: Long = 50): (DataFrame, Map[Int, Long]) = {
    val from = committed(spark, wh, groupId, topic)
    val parts = membership.assignment.getOrElse(topic, Seq.empty)
    def available(): Boolean = {
      val es = graft.core.log.IndexCache.entries(spark, wh, topic)
      parts.exists { p =>
        val start = from.getOrElse(p, 0L)
        es.exists(e => e.isData && e.partition == p && e.endOffset >= start)
      }
    }
    val deadline = System.nanoTime() + timeout.toNanos
    while (!available() && System.nanoTime() < deadline)
      Thread.sleep(math.min(probeIntervalMs,
        math.max(1, (deadline - System.nanoTime()) / 1000000)))
    pollFrom(spark, wh, membership, topic, max, from)
  }
}
