package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.{functions => F}

import graft.GraftFs

/** Incrementally-maintained CUSUM change-detection monitor — the streaming
  * form of q_cusum (OlapSeriesQueries.cusumOverDaily): an unbounded event
  * stream keeps per-(event_type, day) exact cents sums current, and the
  * monitor read runs the s ← max(0, s + x − k) fold over each type's
  * day-ordered series on demand.
  *
  * State design for unbounded streams: the micro-batch fold touches ONLY
  * the mergeable daily partial (one bigint per (type, day) — never raw
  * events), so a batch's work is one map-side-combined groupBy plus a
  * groupBy-merge against the previous snapshot, RollupSink-style. The
  * monitor's state is O(types × observed days) — the natural horizon knob
  * of a drift monitor (a production deployment ages out days beyond its
  * detection window with one filter on `d`). The CUSUM threshold k is the
  * observed mean daily sum (integer div), recomputed from the maintained
  * sums at read time, so monitor() over the maintained state is
  * plan-identical to the batch q_cusum over full history — the spec
  * proves equality and replay idempotence.
  *
  * Exactly-once follows the KVStreamSink scheme (KVStreamSink.scala:24):
  * versioned snapshots, `_SUCCESS` completeness gating, replayed batchIds
  * skipped, lineage always folding onto the latest complete snapshot with
  * version < batchId.
  */
object CusumSink {

  /** Start the maintenance query: events must carry (ts, event_type, value). */
  def start(events: DataFrame, dir: String): StreamingQuery =
    events.writeStream
      .foreachBatch((batch: DataFrame, batchId: Long) => applyBatch(batch, dir, batchId))
      .start()

  /** Fold one micro-batch of raw events into daily_v{batchId}. */
  def applyBatch(batch: DataFrame, dir: String, batchId: Long): Unit = {
    val s = batch.sparkSession
    val conf = s.sparkContext.hadoopConfiguration
    val target = GraftFs.child(dir, s"daily_v$batchId")
    if (GraftFs.complete(conf, target)) return // replayed batch
    val partial = batch
      .select(F.col("event_type"),
        F.expr("unix_micros(ts) div 86400000000").as("d"),
        F.expr("cast(cast(value as decimal(18,2)) * 100 as bigint)").as("vc"))
      .groupBy("event_type", "d").agg(F.sum("vc").as("x"))
    val merged = GraftFs.latest(conf, dir, "daily_v", batchId) match {
      case Some(p) => s.read.parquet(p).unionByName(partial)
        .groupBy("event_type", "d").agg(F.sum("x").as("x"))
      case None => partial
    }
    merged.write.mode("overwrite").parquet(target)
  }

  /** The maintained daily series: latest complete snapshot. */
  def read(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    GraftFs.latest(spark.sparkContext.hadoopConfiguration, dir, "daily_v",
        Long.MaxValue) match {
      case Some(p) => spark.read.parquet(p)
      case None => spark.emptyDataFrame
    }

  /** The monitor read: CUSUM per event_type over the maintained series —
    * the exact fold of the batch q_cusum, on state the stream keeps
    * current. */
  def monitor(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    graft.olap.OlapSeriesQueries.cusumOverDaily(read(spark, dir))
}
