package graft.core.groups

import scala.collection.mutable

/** Consumer-group partition assignment, as pure deterministic functions.
  *
  * The reference runs these inside a gRPC coordinator round (leader election,
  * protocol negotiation, SyncGroup); in Spark the driver owns assignment, so
  * the algorithms are kept 1:1 in semantics but stripped of the transport.
  *
  * Signature everywhere:
  * `(sorted members, topic -> partitionCount, previous) -> member -> topic -> partitions`.
  */
sealed trait Assignor {
  def name: String
  def assign(
      members: Seq[String],
      topicPartitions: Map[String, Int],
      previous: Map[String, Map[String, Seq[Int]]] = Map.empty)
    : Map[String, Map[String, Seq[Int]]]
}

/** Contiguous-range assignment, per topic.
  *
  * Reference: src/main/java/consumer/assignors/RangeAssignor.java:14-77 —
  * members are sorted; with P partitions over M members the first `P % M`
  * members receive `ceil(P/M)` contiguous partitions and the rest receive
  * `floor(P/M)` (base/extra math at :47-49).
  */
object RangeAssignor extends Assignor {
  val name = "range"
  def assign(
      members: Seq[String],
      topicPartitions: Map[String, Int],
      previous: Map[String, Map[String, Seq[Int]]] = Map.empty)
    : Map[String, Map[String, Seq[Int]]] = {
    if (members.isEmpty) return Map.empty
    val sorted = members.sorted
    val m = sorted.size
    val out = mutable.Map.empty[String, mutable.Map[String, Seq[Int]]]
    topicPartitions.toSeq.sortBy(_._1).foreach { case (topic, count) =>
      val base = count / m
      val extra = count % m
      var next = 0
      sorted.zipWithIndex.foreach { case (member, i) =>
        val take = base + (if (i < extra) 1 else 0)
        if (take > 0) {
          val ps = (next until next + take).toList
          out.getOrElseUpdate(member, mutable.Map.empty)(topic) = ps
          next += take
        }
      }
    }
    out.map { case (k, v) => k -> v.toMap }.toMap
  }
}

/** Cyclic deal over the flattened (topic, partition) universe.
  *
  * Reference: src/main/java/consumer/assignors/RoundRobinAssignor.java:15-75 —
  * sort topics, expand to (topic, partition) pairs, deal cyclically to the
  * sorted member list.
  */
object RoundRobinAssignor extends Assignor {
  val name = "roundrobin"
  def assign(
      members: Seq[String],
      topicPartitions: Map[String, Int],
      previous: Map[String, Map[String, Seq[Int]]] = Map.empty)
    : Map[String, Map[String, Seq[Int]]] = {
    if (members.isEmpty) return Map.empty
    val sorted = members.sorted
    val universe = topicPartitions.toSeq.sortBy(_._1).flatMap { case (t, n) =>
      (0 until n).map(p => (t, p))
    }
    val out = mutable.Map.empty[String, mutable.Map[String, mutable.ListBuffer[Int]]]
    universe.zipWithIndex.foreach { case ((t, p), i) =>
      val member = sorted(i % sorted.size)
      out.getOrElseUpdate(member, mutable.Map.empty)
        .getOrElseUpdate(t, mutable.ListBuffer.empty) += p
    }
    out.map { case (k, v) => k -> v.map { case (t, ps) => t -> ps.toList }.toMap }.toMap
  }
}

/** Sticky assignment: keep what members already own, then balance the rest.
  *
  * Reference: src/main/java/consumer/assignors/StickyAssignor.java:49-145 —
  * phase 1 preserves previous assignments that are still valid (member
  * present, topic present, partition in range), capped at `ceil(P/M)` per
  * member (:88); phase 2 deals the unassigned remainder through a min-heap
  * ordered by (current load, memberId) (:115-135).
  */
object StickyAssignor extends Assignor {
  val name = "sticky"
  def assign(
      members: Seq[String],
      topicPartitions: Map[String, Int],
      previous: Map[String, Map[String, Seq[Int]]] = Map.empty)
    : Map[String, Map[String, Seq[Int]]] = {
    if (members.isEmpty) return Map.empty
    val sorted = members.sorted
    val totalPartitions = topicPartitions.values.sum
    val cap = math.ceil(totalPartitions.toDouble / sorted.size).toInt

    val owned = mutable.Map.empty[String, mutable.ListBuffer[(String, Int)]]
    sorted.foreach(m => owned(m) = mutable.ListBuffer.empty)
    val taken = mutable.Set.empty[(String, Int)]

    // Phase 1: preserve still-valid previous claims, capped, members in
    // sorted order (deterministic when previous assignments overlap).
    sorted.foreach { member =>
      previous.getOrElse(member, Map.empty).toSeq.sortBy(_._1).foreach {
        case (topic, ps) =>
          val range = topicPartitions.getOrElse(topic, 0)
          ps.sorted.foreach { p =>
            if (p >= 0 && p < range && !taken((topic, p)) &&
                owned(member).size < cap) {
              owned(member) += ((topic, p))
              taken += ((topic, p))
            }
          }
      }
    }

    // Phase 2: min-heap by (load, memberId) over the unassigned remainder.
    val remaining = topicPartitions.toSeq.sortBy(_._1).flatMap { case (t, n) =>
      (0 until n).map(p => (t, p))
    }.filterNot(taken)
    implicit val ord: Ordering[(Int, String)] =
      Ordering.Tuple2(Ordering.Int.reverse, Ordering.String.reverse) // min-heap
    val heap = mutable.PriorityQueue.empty[(Int, String)]
    sorted.foreach(m => heap.enqueue((owned(m).size, m)))
    remaining.foreach { tp =>
      val (load, member) = heap.dequeue()
      owned(member) += tp
      heap.enqueue((load + 1, member))
    }

    owned.filter(_._2.nonEmpty).map { case (member, tps) =>
      member -> tps.groupBy(_._1).map { case (t, ps) =>
        t -> ps.map(_._2).toList.sorted
      }
    }.toMap
  }
}

object Assignors {
  val all: Map[String, Assignor] = Map(
    RangeAssignor.name -> RangeAssignor,
    RoundRobinAssignor.name -> RoundRobinAssignor,
    StickyAssignor.name -> StickyAssignor)

  def byName(name: String): Assignor =
    all.getOrElse(name, throw new IllegalArgumentException(s"unknown assignor '$name'"))
}

/** JoinGroup protocol negotiation, as a pure function.
  *
  * Reference: src/main/java/grpc/services/GroupCoordinatorServiceImpl.java:47-148 —
  * the first joiner becomes leader; the chosen protocol is the first of the
  * LEADER's preferences supported by every member. Returns None when the
  * intersection is empty (the coordinator rejects the group).
  */
object Negotiation {
  case class Member(memberId: String, protocols: Seq[String])

  def negotiate(joinOrder: Seq[Member]): Option[(String, String)] =
    joinOrder.headOption.flatMap { leader =>
      val everyone = joinOrder.map(_.protocols.toSet)
      leader.protocols.find(p => everyone.forall(_.contains(p)))
        .map(p => (leader.memberId, p))
    }
}
