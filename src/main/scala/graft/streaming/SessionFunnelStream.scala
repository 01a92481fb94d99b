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
  * delay — so the state buffers (t, id, step) triples and sorts at
  * close. A session is emitted ONLY once the watermark passes
  * `end + GapMs`: any still-admissible event has t > watermark, so
  * nothing can merge into (or extend) a session the watermark has
  * cleared, while an earlier "close on the first live event past the
  * gap" rule would let an admissible out-of-order event near a gap
  * boundary split one true session into two. Until then candidate
  * sessions stay buffered (state is bounded by the watermark delay +
  * gap of activity, never stream length); the step string is scored by
  * the same cvp-substring probe as the batch query, so both paths
  * share the contract by construction.
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
          val wm = state.getCurrentWatermarkMs()
          val arrivals = it.map { e =>
            val st = e.event_type match {
              case "click" => "c"; case "view" => "v"; case _ => "p"
            }
            (e.ts.getTime, e.event_id, st)
          }.toSeq
          val buf = (state.getOption.map(_.evs).getOrElse(Nil) ++ arrivals)
            .sorted
          val sessions =
            buf.foldLeft(Vector.empty[Vector[(Long, Long, String)]]) {
              (acc, ev) =>
                if (acc.nonEmpty && ev._1 - acc.last.last._1 <= GapMs)
                  acc.init :+ (acc.last :+ ev)
                else acc :+ Vector(ev)
            }
          // Final iff the watermark cleared end+gap: every admissible
          // future event has t > wm > end+gap, so it cannot merge here,
          // and anything before the session start is already below wm.
          val (done, pending) =
            sessions.partition(s => wm > s.last._1 + GapMs)
          if (pending.isEmpty) { if (state.exists) state.remove() }
          else {
            state.update(SfState(pending.flatten))
            // earliest pending close; > wm holds since wm <= end+gap
            state.setTimeoutTimestamp(pending.head.last._1 + GapMs + 1)
          }
          done.iterator.map(s => level(s).copy(user_id = user))
      }
  }
}
