package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STATEFUL stream-stream AS-OF join — the scale-complete sibling of
  * `EventStream.asofEnrich` (which broadcasts a dictionary-sized static
  * side): here BOTH sides are unbounded streams and the right side lives
  * in the per-key state store, so a reference stream of any cardinality
  * partitions across executors like any keyed state.
  *
  * Semantics (the batch q_asof contract): every left event matches the
  * LAST right row of its key with rt ≤ t, ties on rt broken by the
  * largest rid; unmatched lefts emit with a null right side.
  *
  * Mechanics — two-sided watermark discipline over one
  * flatMapGroupsWithState:
  *   - both inputs carry the same watermark delay; the union's watermark
  *     W is the min of the two, so when W passes a left event's time t,
  *     every right row with rt ≤ t has arrived (later ones are late
  *     beyond watermark, excluded by contract);
  *   - left events BUFFER until W ≥ t, then emit exactly once, in
  *     (t, id) order, against the rights seen so far — the value is
  *     watermark-deterministic: however triggers slice the input, the
  *     emitted match is the same;
  *   - right rows with rt ≤ W COMPACT to the single best (max rt, then
  *     max rid) row — any future left has t > W and prefers that row
  *     over every older one — so per-key state is the not-yet-final
  *     buffers (bounded by the watermark delay) plus ONE remembered row:
  *     the same O(1) steady-state per key as the batch exec's merge
  *     cursor, NOT a growing join buffer;
  *   - a key idle past `idleRetentionMs` evicts entirely (event-time
  *     timeout), dropping its remembered row — the retention horizon a
  *     100 TB deployment needs to bound |keys| state.
  *
  * Timeouts drive flushing too: with lefts pending, the timeout is set
  * to the earliest pending time, so buffered events emit as soon as the
  * watermark allows even if their key never sees another input row.
  */
object AsofStream {

  /** Union row: side 0 = left event (id = event id), 1 = right ref
    * (id = ref id). `ts` carries event time for the watermark. */
  final case class AsofMsg(k: Long, side: Int, ts: Timestamp, id: Long)

  /** One as-of match; ref fields None = no right row at or before t. */
  final case class AsofHit(k: Long, event_id: Long, t_ms: Long,
                           ref_ms: Option[Long], ref_id: Option[Long])

  // buffered (tMs, id) pairs per side + the key's last activity in event
  // time (idle retention counts from HERE, not from the watermark at arm
  // time — early in a stream the watermark still trails at 0, and a
  // timeout armed off it would fire, and evict, the moment the watermark
  // catches up). Not private: state encoder codegen.
  final case class AsofBufState(lefts: Seq[(Long, Long)],
                                rights: Seq[(Long, Long)],
                                lastMs: Long)

  /** Join `left` (k, ts, event_id) to `right` (k, rts, rid) as-of.
    * `delay` is each side's watermark delay (e.g. "30 minutes");
    * `idleRetentionMs` bounds how long an idle key keeps its remembered
    * right row. */
  def asofJoin(left: DataFrame, right: DataFrame, delay: String,
               idleRetentionMs: Long = 24 * 3600 * 1000L): Dataset[AsofHit] = {
    require(idleRetentionMs > 0, "idleRetentionMs must be positive")
    import left.sparkSession.implicits._
    val l = left.withWatermark("ts", delay)
      .select(F.col("k"), F.lit(0).as("side"), F.col("ts"),
        F.col("event_id").as("id"))
    val r = right.withWatermark("rts", delay)
      .select(F.col("k"), F.lit(1).as("side"), F.col("rts").as("ts"),
        F.col("rid").as("id"))
    l.unionByName(r).as[AsofMsg]
      .groupByKey(_.k)
      .flatMapGroupsWithState[AsofBufState, AsofHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (k: Long, it: Iterator[AsofMsg], state: GroupState[AsofBufState]) =>
          val old = state.getOption.getOrElse(AsofBufState(Nil, Nil, Long.MinValue))
          var lefts = old.lefts
          var rights = old.rights
          var lastMs = old.lastMs
          it.foreach { m =>
            lastMs = math.max(lastMs, m.ts.getTime)
            if (m.side == 0) lefts :+= ((m.ts.getTime, m.id))
            else rights :+= ((m.ts.getTime, m.id))
          }
          val w = state.getCurrentWatermarkMs()
          val (ready, pending) = lefts.partition(_._1 <= w)
          val sortedRights = rights.sorted
          val out = ready.sorted.map { case (t, eid) =>
            val best = sortedRights.takeWhile(_._1 <= t).lastOption
            AsofHit(k, eid, t, best.map(_._1), best.map(_._2))
          }
          // compact: among finalized rights keep only the best; future
          // lefts all have t > w and prefer it over every older row
          val (finalized, open) = sortedRights.partition(_._1 <= w)
          val kept = finalized.lastOption.toSeq ++ open
          if (state.hasTimedOut && pending.isEmpty && open.isEmpty &&
              out.isEmpty && w >= lastMs + idleRetentionMs) {
            // idle retention truly elapsed since the key's last event:
            // evict the remembered row (the key's LOCF horizon ends)
            state.remove()
          } else {
            state.update(AsofBufState(pending, kept, lastMs))
            // flush as soon as the watermark reaches the earliest pending
            // left; otherwise wake up once the idle retention elapses
            val next =
              if (pending.nonEmpty) pending.map(_._1).min
              else math.max(lastMs + idleRetentionMs, w + 1)
            state.setTimeoutTimestamp(next)
          }
          out.iterator
      }
  }
}
