package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING last-touch attribution — q_attribution's unbounded
  * sibling: every purchase credits the latest same-user touch (click/
  * view) in the strict `lookbackMs` window before it, live.
  *
  * State discipline (the piece the batch query gets for free): per user
  * the state holds ONLY the touches still inside the lookback horizon
  * relative to the watermark (tt ≥ W − lookback — anything older can
  * never be credited by a future conversion) plus the purchases waiting
  * for the watermark to finalize them (a purchase emits once W ≥ ct, so
  * earlier-timestamped touches arriving within the delay still count —
  * watermark-deterministic, like AsofStream). Per-key state is bounded
  * by the user's activity inside one lookback window, independent of
  * stream length; idle users evict entirely once nothing in their state
  * can matter again.
  */
object AttributionStream {

  /** side 0 = touch (id, kind = 'c'/'v'), 1 = purchase (id). */
  final case class AttrMsg(user: Long, side: Int, ts: Timestamp, id: Long,
                           kind: String)

  final case class Attribution(user: Long, purchase_id: Long, t_ms: Long,
                               touch_id: Option[Long], touch_kind: Option[String],
                               touch_ms: Option[Long], n_window: Long)

  // (tMs, id, kind) touches + (ctMs, cid) pending purchases
  final case class AttrState(touches: Seq[(Long, Long, String)],
                             pending: Seq[(Long, Long)])

  def lastTouch(events: DataFrame, delay: String,
                lookbackMs: Long): Dataset[Attribution] = {
    require(lookbackMs > 0, "lookbackMs must be positive")
    import events.sparkSession.implicits._
    val msgs = events
      .filter(F.col("event_type").isin("click", "view", "purchase"))
      .withWatermark("ts", delay)
      .select(F.col("user_id").as("user"),
        F.when(F.col("event_type") === "purchase", 1).otherwise(0).as("side"),
        F.col("ts"), F.col("event_id").as("id"),
        F.when(F.col("event_type") === "click", "c")
          .when(F.col("event_type") === "view", "v").otherwise("p").as("kind"))
      .as[AttrMsg]
    msgs.groupByKey(_.user)
      .flatMapGroupsWithState[AttrState, Attribution](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[AttrMsg], state: GroupState[AttrState]) =>
          val old = state.getOption.getOrElse(AttrState(Nil, Nil))
          var touches = old.touches
          var pending = old.pending
          it.foreach { m =>
            if (m.side == 0) touches :+= ((m.ts.getTime, m.id, m.kind))
            else pending :+= ((m.ts.getTime, m.id))
          }
          val w = state.getCurrentWatermarkMs()
          val (ready, stillPending) = pending.partition(_._1 <= w)
          val sorted = touches.sortBy(t => (t._1, t._2))
          val out = ready.sorted.map { case (ct, cid) =>
            val inWin = sorted.filter(t => t._1 < ct && t._1 >= ct - lookbackMs)
            val last = inWin.lastOption
            Attribution(user, cid, ct, last.map(_._2), last.map(_._3),
              last.map(_._1), inWin.size.toLong)
          }
          // evict touches no future conversion (ct > w) can reach
          val kept = sorted.filter(_._1 >= w - lookbackMs)
          if (kept.isEmpty && stillPending.isEmpty) {
            if (state.exists) state.remove()
          } else {
            state.update(AttrState(kept, stillPending))
            val next =
              if (stillPending.nonEmpty) stillPending.map(_._1).min
              else kept.map(_._1).max + lookbackMs // when the last touch ages out
            state.setTimeoutTimestamp(math.max(next, w + 1))
          }
          out.iterator
      }
  }
}
