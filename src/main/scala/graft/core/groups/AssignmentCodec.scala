package graft.core.groups

/** Wire codec for full group assignments — API parity with the reference's
  * working encoder (reference: src/main/java/consumer/ProtocolCodec.java:37-69,
  * format `member:topic=p1,p2;topic2=p3||member2:...`). The reference's
  * decode side is a stub returning empty (SURVEY.md §2.7 Q4); here decode is
  * implemented and round-trip-tested, which is the intent the SyncGroup flow
  * assumes.
  */
object AssignmentCodec {

  def encode(assignment: Map[String, Map[String, Seq[Int]]]): String =
    assignment.toSeq.sortBy(_._1).map { case (member, topics) =>
      val ts = topics.toSeq.sortBy(_._1).map { case (t, ps) =>
        s"$t=${ps.sorted.mkString(",")}"
      }.mkString(";")
      s"$member:$ts"
    }.mkString("||")

  def decode(s: String): Map[String, Map[String, Seq[Int]]] =
    if (s.isEmpty) Map.empty
    else s.split("\\|\\|").map { memberPart =>
      val colon = memberPart.indexOf(':')
      require(colon >= 0, s"malformed assignment segment: '$memberPart'")
      val member = memberPart.substring(0, colon)
      val topicsStr = memberPart.substring(colon + 1)
      val topics =
        if (topicsStr.isEmpty) Map.empty[String, Seq[Int]]
        else topicsStr.split(";").map { tp =>
          val eq = tp.indexOf('=')
          require(eq >= 0, s"malformed topic segment: '$tp'")
          val ps = tp.substring(eq + 1)
          tp.substring(0, eq) ->
            (if (ps.isEmpty) Seq.empty[Int] else ps.split(",").map(_.toInt).toSeq)
        }.toMap
      member -> topics
    }.toMap
}
