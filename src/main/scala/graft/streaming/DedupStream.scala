package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{functions => F}

/** Streaming near-duplicate detection — the unbounded form of the
  * d_minhash_lsh → d_lsh_verified batch path (SURVEY §2D).
  *
  * Per document, one map-only pass computes the MinHash signature and its
  * LSH band keys (the same codegen'd WordShingleMinHash expression the
  * batch path uses — no shingle explode ever leaves the row). The ONLY
  * stateful shape is then `flatMapGroupsWithState` keyed on the (band,
  * bandhash) bucket, whose state is a single canonical doc id — the first
  * arrival. Every later document landing in the bucket emits a candidate
  * pair against the canonical, so a near-dup CLUSTER of size k emits k−1
  * star edges (connectivity-equivalent to the batch clique — exactly what
  * d_dup_groups' connected components consume) while bucket state stays
  * O(1) no matter how many duplicates stream in. Idle buckets are evicted
  * by event-time timeout once the watermark passes their horizon, so
  * total state is bounded by |recently-active buckets|, independent of
  * stream length — the property that makes corpus-scale streaming dedup
  * feasible at all.
  */
object DedupStream {

  // not private: state/row encoders generate code constructing these
  final case class BandRow(doc_id: Long, ts: Timestamp, band: Int, bh: Long)
  final case class Cand(a_id: Long, b_id: Long, band: Int)
  final case class BucketState(canon: Long)

  val IdleHorizonMs: Long = 30 * 60 * 1000L

  /** LSH candidate pairs over a streaming `(doc_id, ts, text)` frame.
    * Same banding as the batch d_minhash_lsh (k=64 hashes, 16 bands × 4
    * rows, 3-word shingles) so the two paths are directly comparable. */
  def lshCandidates(docs: DataFrame, minHashK: Int = 64, bands: Int = 16): Dataset[Cand] = {
    import docs.sparkSession.implicits._
    val rowsPerBand = minHashK / bands
    val sig = docs
      .withWatermark("ts", "30 minutes")
      .filter(F.size(F.split(F.col("text"), " ")) >= 3)
      .select(F.col("doc_id"), F.col("ts"),
        graft.functions.TextFunctions.wordShingleMinHash(F.col("text"), 3, minHashK).as("mh"))
    val bandCols = (0 until bands).map { b =>
      F.xxhash64((0 until rowsPerBand).map(r => F.col("mh").getItem(b * rowsPerBand + r)): _*)
    }
    sig.select(F.col("doc_id"), F.col("ts"),
      F.posexplode(F.array(bandCols: _*)).as(Seq("band", "bh")))
      .as[BandRow]
      .groupByKey(r => (r.band, r.bh))
      .flatMapGroupsWithState[BucketState, Cand](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (Int, Long), rows: Iterator[BandRow], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // deterministic intra-batch order: arrival = (ts, doc_id)
            val sorted = rows.toSeq.sortBy(r => (r.ts.getTime, r.doc_id))
            var canon = state.getOption.map(_.canon)
            val out = Seq.newBuilder[Cand]
            sorted.foreach { r =>
              canon match {
                case None => canon = Some(r.doc_id)
                case Some(c) if c != r.doc_id =>
                  out += Cand(math.min(c, r.doc_id), math.max(c, r.doc_id), key._1)
                case _ => () // the canonical doc re-appearing is not a pair
              }
            }
            canon.foreach { c =>
              state.update(BucketState(c))
              // evict once the watermark passes the bucket's last activity
              // plus the idle horizon (anchoring on the watermark instead
              // would mark batch-1 buckets with a pre-stream time and evict
              // them the moment the watermark reaches the data's timebase)
              val lastTs = sorted.map(_.ts.getTime).max
              state.setTimeoutTimestamp(
                math.max(lastTs + IdleHorizonMs, state.getCurrentWatermarkMs() + 1))
            }
            out.result().iterator
          }
      }
  }
}
