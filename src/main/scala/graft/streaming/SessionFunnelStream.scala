package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING session funnel — q_session_funnel live: sessionize each
  * user's click/view/purchase stream by a 30-minute inactivity gap and
  * emit the session's strict-contiguous funnel depth when it closes
  * (a later event past the gap, or the event-time timeout).
  *
  * Unlike plain sessionization (O(1) open-session state), the funnel
  * depends on the session's events in FINAL (t, id) order, and events
  * inside one session may arrive out of order within the watermark
  * delay — so the state buffers the open session's (t, id, step)
  * triples and sorts at close. State per user = one open session's
  * events (bounded by per-session activity, never stream length); the
  * step string is scored by the same cvp-substring probe as the batch
  * query, so both paths share the contract by construction.
  */
object SessionFunnelStream {

  final case class SfEv(user_id: Long, ts: Timestamp, event_id: Long,
                        event_type: String)
  final case class SessionLevel(user_id: Long, start_ms: Long, end_ms: Long,
                                n_events: Long, level: Long)
  final case class SfState(evs: Seq[(Long, Long, String)])

  val GapMs: Long = 30 * 60 * 1000L

  private def level(evs: Seq[(Long, Long, String)]): SessionLevel = {
    val sorted = evs.sorted
    val seq = sorted.map(_._3).mkString
    val lvl =
      if (seq.contains("cvp")) 3L
      else if (seq.contains("cv")) 2L
      else if (seq.contains("c")) 1L
      else 0L
    SessionLevel(0L, sorted.head._1, sorted.last._1, sorted.size.toLong, lvl)
  }

  def levels(events: DataFrame): Dataset[SessionLevel] = {
    import events.sparkSession.implicits._
    events
      .filter(F.col("event_type").isin("click", "view", "purchase"))
      .withWatermark("ts", "30 minutes")
      .select(F.col("user_id"), F.col("ts"), F.col("event_id"),
        F.col("event_type"))
      .as[SfEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SfState, SessionLevel](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[SfEv], state: GroupState[SfState]) =>
          val closed = Seq.newBuilder[SessionLevel]
          var open: Seq[(Long, Long, String)] =
            state.getOption.map(_.evs).getOrElse(Nil)
          def startMs = open.map(_._1).min
          def endMs = open.map(_._1).max
          val arrivals = it.toSeq.map { e =>
            val st = e.event_type match {
              case "click" => "c"; case "view" => "v"; case _ => "p"
            }
            (e.ts.getTime, e.event_id, st)
          }.sorted
          arrivals.foreach { ev =>
            if (open.isEmpty) open = Seq(ev)
            else if (ev._1 > endMs + GapMs) {
              // past the gap: the open session is complete
              closed += level(open).copy(user_id = user)
              open = Seq(ev)
            } else if (ev._1 < startMs - GapMs) {
              // out-of-order singleton BEFORE the open session's reach:
              // a distinct, already-ended session (sessionize's rule)
              closed += level(Seq(ev)).copy(user_id = user)
            } else open :+= ev
          }
          if (state.hasTimedOut && open.nonEmpty &&
              state.getCurrentWatermarkMs() > endMs + GapMs) {
            closed += level(open).copy(user_id = user)
            open = Nil
          }
          if (open.isEmpty) { if (state.exists) state.remove() }
          else {
            state.update(SfState(open))
            state.setTimeoutTimestamp(endMs + GapMs + 1)
          }
          closed.result().iterator
      }
  }
}
