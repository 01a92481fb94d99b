package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sequence packing — the online form of
  * [[graft.pipeline.PackQueries.dPack]]: documents arrive on a stream and
  * are laid into fixed-capacity context windows the moment they arrive.
  * Per-source state is ONE open bin (id + fill) — O(1) forever, however
  * long the stream — so a continuously-ingesting training pipeline can
  * emit (doc, bin, offset) placements online instead of re-packing the
  * corpus per snapshot.
  *
  * Order note: packing is order-sensitive by nature. The batch operator
  * orders by content hash for corpus-wide reproducibility; the streaming
  * form packs ARRIVAL order (the online trade-off), sorting by doc_id
  * within a micro-batch so a replay of the same batch sequence is
  * deterministic.
  */
object PackStream {
  final case class Doc(source: String, doc_id: Long, n: Long)
  final case class Slot(source: String, doc_id: Long, bin: Long, off: Long, n: Long)
  final case class BinState(bin: Long, fill: Long)

  def pack(docs: Dataset[Doc], cap: Long = 256L): Dataset[Slot] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.source)
      .flatMapGroupsWithState[BinState, Slot](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (src: String, ds: Iterator[Doc], state: GroupState[BinState]) =>
          var st = state.getOption.getOrElse(BinState(0L, 0L))
          val out = ds.toSeq.sortBy(_.doc_id).map { d =>
            if (st.fill > 0 && st.fill + d.n > cap) st = BinState(st.bin + 1, 0L)
            val slot = Slot(src, d.doc_id, st.bin, st.fill, d.n)
            st = BinState(st.bin, st.fill + d.n)
            slot
          }
          state.update(st)
          out.iterator
      }
  }
}
