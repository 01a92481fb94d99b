package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING session journeys — q_journey live: sessionize each user's
  * event stream by the 30-minute inactivity gap and emit the session's
  * journey path (its first three event types in final (t, id) order,
  * joined 'a>b>c') when the session closes.
  *
  * Emission follows SessionFunnelStream's watermark-gated rule: a
  * session is final ONLY once the watermark passes `end + GapMs` —
  * a close-on-live-arrival rule would let an admissible out-of-order
  * event near a gap boundary split one true session in two (and corrupt
  * its path prefix). Candidate sessions buffer in state bounded by the
  * watermark delay + gap of activity, never stream length.
  *
  * Composition: piping the emitted paths through TopKSink (termCol =
  * "path") maintains the stream-lifetime top journeys — the live
  * version of the q_journey top-20 — exact whenever lifetime distinct
  * paths ≤ the sketch capacity (journey alphabets are tiny: ≤ |types|³
  * distinct paths), Misra-Gries-bounded otherwise.
  */
object JourneyStream {

  final case class JEv(user_id: Long, ts: Timestamp, event_id: Long,
                       event_type: String)
  final case class SessionPath(user_id: Long, start_ms: Long, end_ms: Long,
                               n_events: Long, path: String)
  final case class JState(evs: Seq[(Long, Long, String)])

  val GapMs: Long = 30 * 60 * 1000L

  def paths(events: DataFrame): Dataset[SessionPath] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "30 minutes")
      .select(F.col("user_id"), F.col("ts"), F.col("event_id"),
        F.col("event_type"))
      .as[JEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[JState, SessionPath](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[JEv], state: GroupState[JState]) =>
          val wm = state.getCurrentWatermarkMs()
          val arrivals = it.map(e => (e.ts.getTime, e.event_id, e.event_type)).toSeq
          val buf = (state.getOption.map(_.evs).getOrElse(Nil) ++ arrivals).sorted
          val sessions =
            buf.foldLeft(Vector.empty[Vector[(Long, Long, String)]]) {
              (acc, ev) =>
                if (acc.nonEmpty && ev._1 - acc.last.last._1 <= GapMs)
                  acc.init :+ (acc.last :+ ev)
                else acc :+ Vector(ev)
            }
          // final iff the watermark cleared end+gap (see scaladoc)
          val (done, pending) =
            sessions.partition(s => wm > s.last._1 + GapMs)
          if (pending.isEmpty) { if (state.exists) state.remove() }
          else {
            state.update(JState(pending.flatten))
            state.setTimeoutTimestamp(pending.head.last._1 + GapMs + 1)
          }
          done.iterator.map { s =>
            SessionPath(user, s.head._1, s.last._1, s.size.toLong,
              s.take(3).map(_._3).mkString(">"))
          }
      }
  }
}
