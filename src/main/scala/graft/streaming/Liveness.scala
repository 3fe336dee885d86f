package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.core.LivenessConfig

/** Broker/member liveness over a heartbeat stream, as stateful streaming.
  *
  * Re-expresses the reference's controller-side liveness tracker
  * (reference: src/main/java/server/internal/BrokerLivenessTracker.java:90-103
  * records heartbeats, :145-156 sweeps marking members offline after
  * `interval × missedThreshold` of silence, :96-99 revives a timed-out member
  * on a late heartbeat) as `mapGroupsWithState` keyed by member id with a
  * processing-time timeout — the reference uses wall-clock sweeps, so
  * processing-time (not event-time) is the faithful choice.
  *
  * Load tracking + least-loaded query (BrokerLivenessTracker.java:204-220)
  * rides along in the state value.
  */
object Liveness {

  case class Heartbeat(memberId: String, ts: Long, seq: Long, partitionCount: Int)

  /** Controller→member directives delivered with heartbeat responses
    * (reference: src/main/proto/heartbeat.proto:56-66; member-side handling
    * at server/internal/HeartbeatSender.java:216-238 — log-only there, and
    * the reference controller's `determineDirective` is a stub returning
    * none). Here the directive rides in the state row emitted for the
    * member's heartbeat — the response channel of this architecture. */
  object Directive {
    val None = "NONE"
    val Shutdown = "SHUTDOWN"
    val Rebalance = "REBALANCE"
    val UpdateConfig = "UPDATE_CONFIG"
  }

  case class MemberState(
      memberId: String,
      lastTs: Long,
      lastSeq: Long,
      partitionCount: Int,
      alive: Boolean,
      revivals: Int,
      directive: String = Directive.None)

  /** Transition function — pure, unit-testable without a stream.
    *
    * @param directives STANDING controller directives per member, fixed at
    *                   plan time: a member's directive is re-delivered on
    *                   every heartbeat it emits for the life of the query
    *                   (to change or clear directives, restart the query
    *                   with a new map — or source them from a small
    *                   warehouse table read per batch). A member reviving
    *                   from a timeout is always directed to REBALANCE — its
    *                   assignments may be stale — unless the controller set
    *                   something explicit. */
  def update(
      config: LivenessConfig,
      directives: Map[String, String] = Map.empty)(
      memberId: String,
      beats: Iterator[Heartbeat],
      state: GroupState[MemberState]): MemberState = {
    if (state.hasTimedOut) {
      // silence past interval × missedThreshold → mark offline, keep state
      // so a late heartbeat revives (reference :96-99)
      val s = state.get.copy(alive = false, directive = Directive.None)
      state.update(s)
      state.setTimeoutDuration(config.timeoutMs)
      s
    } else {
      val latest = beats.toSeq.maxBy(b => (b.ts, b.seq))
      val prev = state.getOption
      val revived = prev.exists(!_.alive)
      val s = MemberState(
        memberId = memberId,
        lastTs = latest.ts,
        lastSeq = latest.seq,
        partitionCount = latest.partitionCount,
        alive = true,
        revivals = prev.map(_.revivals).getOrElse(0) + (if (revived) 1 else 0),
        directive = directives.getOrElse(memberId,
          if (revived) Directive.Rebalance else Directive.None))
      state.update(s)
      state.setTimeoutDuration(config.timeoutMs)
      s
    }
  }

  /** Wire the operator over a heartbeat stream. Output: one row per state
    * change (append-mode compatible via update output). */
  def track(
      spark: SparkSession,
      heartbeats: Dataset[Heartbeat],
      config: LivenessConfig = LivenessConfig()): Dataset[MemberState] = {
    import spark.implicits._
    heartbeats
      .groupByKey(_.memberId)
      .mapGroupsWithState[MemberState, MemberState](
        GroupStateTimeout.ProcessingTimeTimeout)(update(config))
  }

  /** Batch analog for tests/queries: latest state per member from a static
    * heartbeat table, offline iff silent for longer than the timeout at
    * `nowMs`. */
  def snapshot(
      spark: SparkSession,
      heartbeats: Dataset[Heartbeat],
      nowMs: Long,
      config: LivenessConfig = LivenessConfig()): Dataset[MemberState] = {
    import spark.implicits._
    heartbeats
      .groupByKey(_.memberId)
      .mapGroups { (id, beats) =>
        val latest = beats.toSeq.maxBy(b => (b.ts, b.seq))
        MemberState(id, latest.ts, latest.seq, latest.partitionCount,
          alive = nowMs - latest.ts <= config.timeoutMs, revivals = 0)
      }
  }

  /** Least-loaded live member (reference :204-220). */
  def leastLoaded(states: Dataset[MemberState]): Option[String] = {
    import states.sparkSession.implicits._
    states.filter(_.alive)
      .orderBy($"partitionCount".asc, $"memberId".asc)
      .limit(1).collect().headOption.map(_.memberId)
  }
}
