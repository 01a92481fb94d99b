package graft.kv

import org.apache.hadoop.conf.Configuration

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{BinaryType, BooleanType, StructField, StructType}
import org.apache.spark.sql.{functions => F}

import graft.GraftFs

/** Streaming mutation ingestion for the KV store — the reference's
  * `mutateMany` (ClickhouseStoreManager.java:49) fed from an unbounded
  * stream instead of a batch call.
  *
  * Each micro-batch of `(k, c, v, is_delete)` mutations folds into a new
  * versioned snapshot via the SAME batch semantics (`KVStore.mutate`:
  * deletes strictly before adds, add upserts its own cell), so the
  * streaming path provably agrees with the batch path cell for cell
  * (the spec asserts it).
  *
  * Exactly-once across failures rides on two properties:
  *   - idempotence per batchId: a replayed batch finds its snapshot
  *     already complete (parquet `_SUCCESS`) and skips; an interrupted
  *     write left no `_SUCCESS`, is invisible to readers/lineage, and is
  *     overwritten by the replay;
  *   - lineage: batch N folds onto the latest COMPLETE snapshot with
  *     version < N, so a reordered/duplicated delivery cannot skip state.
  * Readers (`read`) always see the latest complete snapshot — a crash
  * mid-write never corrupts the readable view. At cluster scale the
  * snapshot dirs live on the shared store and old versions are retention
  * candidates, exactly like MergeTree part generations.
  */
object KVStreamSink {
  val MutationSchema: StructType = StructType(Seq(
    StructField("k", BinaryType), StructField("c", BinaryType),
    StructField("v", BinaryType), StructField("is_delete", BooleanType)))

  /** Start the ingestion query (micro-batch foreachBatch sink). */
  def start(mutations: DataFrame, dir: String): StreamingQuery =
    mutations.writeStream
      .foreachBatch((batch: DataFrame, batchId: Long) => applyBatch(batch, dir, batchId))
      .start()

  /** Fold one micro-batch into snapshot_v{batchId}. Idempotent. */
  def applyBatch(batch: DataFrame, dir: String, batchId: Long): Unit = {
    val s = batch.sparkSession
    val conf = s.sparkContext.hadoopConfiguration
    val target = GraftFs.child(dir, s"snapshot_v$batchId")
    if (GraftFs.complete(conf, target)) return // replayed batch
    val store = latestSnapshot(conf, dir, batchId) match {
      case Some(p) => s.read.parquet(p)
      case None => s.createDataFrame(
        s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(MutationSchema.fields.take(3)))
    }
    val adds = batch.filter(!F.col("is_delete")).select("k", "c", "v")
    val dels = batch.filter(F.col("is_delete")).select("k", "c")
    KVStore.mutate(store, adds, dels)
      .write.mode("overwrite").parquet(target)
  }

  /** The latest complete snapshot (strictly before `beforeId` when the
    * caller is batch `beforeId` computing its own input). */
  private def latestSnapshot(conf: Configuration, dir: String,
                             beforeId: Long): Option[String] =
    GraftFs.latest(conf, dir, "snapshot_v", beforeId)

  /** The current readable store: latest complete snapshot. */
  def read(spark: SparkSession, dir: String): DataFrame =
    latestSnapshot(spark.sparkContext.hadoopConfiguration, dir,
        Long.MaxValue) match {
      case Some(p) => spark.read.parquet(p)
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(MutationSchema.fields.take(3)))
    }

  // ---- delta-log mode ------------------------------------------------
  //
  // The snapshot mode above rewrites the WHOLE store every micro-batch
  // (KVStore.mutate folds onto the previous snapshot) — O(store) I/O per
  // batch, which at 100 TB makes the stream writer the bottleneck. Delta
  // mode appends each micro-batch as ONE KVDeltaStore delta part —
  // O(batch) I/O — and lets size-tiered maybeCompact bound the log depth;
  // readers go through the store's merge-on-read view, where compaction
  // is invisible by contract.
  //
  // Exactly-once across replays:
  //   - delta ids are derived from the batchId (seq = batchId + 1), so a
  //     replayed batch re-targets ITS OWN part: complete part → skip;
  //     incomplete part (crashed write) → deleted and rewritten;
  //   - compaction deletes folded parts, so part-presence alone cannot
  //     dedupe a replay whose delta was already folded — the high-water
  //     mark file (_stream_hwm, atomically renamed into place after each
  //     applied batch) records the last applied batchId and wins first.
  //   - a crash between the delta write and the hwm rename replays into
  //     the complete-part skip; a crash between hwm and maybeCompact
  //     only defers compaction, which is invisible anyway.

  /** Start delta-log ingestion into `warehouseDir/name` (micro-batch
    * foreachBatch sink over KVDeltaStore.appendMutationAt). */
  def startDelta(mutations: DataFrame, warehouseDir: String, name: String,
                 compactThreshold: Int = 8): StreamingQuery =
    mutations.writeStream
      .foreachBatch((batch: DataFrame, batchId: Long) =>
        applyBatchDelta(batch, warehouseDir, name, batchId, compactThreshold))
      .start()

  /** Append one micro-batch as delta_{batchId+1}. Idempotent by batchId. */
  def applyBatchDelta(batch: DataFrame, warehouseDir: String, name: String,
                      batchId: Long, compactThreshold: Int = 8): Unit = {
    val conf = batch.sparkSession.sparkContext.hadoopConfiguration
    if (readHwm(conf, warehouseDir, name) >= batchId)
      return // applied (maybe folded)
    val store = new KVDeltaStore(batch.sparkSession, warehouseDir)
    val seq = batchId + 1
    if (!store.deltaCompleteOrClear(name, seq)) {
      val adds = batch.filter(!F.col("is_delete")).select("k", "c", "v")
      val dels = batch.filter(F.col("is_delete")).select("k", "c")
      // wts derives from the batch id, NOT wall-clock: a replayed batch
      // re-stamps the SAME age, keeping the delta part byte-reproducible
      store.appendMutationAt(name, seq, adds, dels, wts = seq)
    }
    writeHwm(conf, warehouseDir, name, batchId)
    store.maybeCompact(name, compactThreshold): Unit
  }

  /** The current readable store in delta mode: the merge-on-read view. */
  def readDelta(spark: SparkSession, warehouseDir: String, name: String): DataFrame =
    new KVDeltaStore(spark, warehouseDir).openDatabase(name)

  /** Fold a graft-kv-log CDC micro-batch down to its mutation set: one
    * batch may span SEVERAL source log parts (admission control permits
    * it; AvailableNow without maxSeqsPerBatch drains the whole log as
    * one batch), and applyBatchDelta writes the whole batch under ONE
    * replica sequence — so cross-part ordering must resolve BEFORE the
    * fold or a cell added in part N and deleted in part N+1 would
    * resurrect (the replica's same-seq tie-break prefers additions).
    * Resolution is the store's own merge-on-read rule: latest
    * (seq, op) per (k, c), ties all kept. Output (k, c, v, is_delete) —
    * applyBatchDelta's input shape. */
  def foldCdc(batch: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k", "c").orderBy(F.col("seq").desc, F.col("op").desc)
    batch.withColumn("__rn", F.rank().over(w))
      .filter(F.col("__rn") === 1)
      .select(F.col("k"), F.col("c"), F.col("v"),
        (F.col("op") === 0).as("is_delete"))
  }

  private def hwmFile(warehouseDir: String, name: String): String =
    GraftFs.child(GraftFs.child(warehouseDir, name), "_stream_hwm")

  private def readHwm(conf: Configuration, warehouseDir: String,
                      name: String): Long =
    GraftFs.readText(conf, hwmFile(warehouseDir, name))
      .map(_.trim.toLong).getOrElse(-1L)

  private def writeHwm(conf: Configuration, warehouseDir: String,
                       name: String, batchId: Long): Unit =
    GraftFs.writeTextAtomic(conf, hwmFile(warehouseDir, name),
      batchId.toString)
}
