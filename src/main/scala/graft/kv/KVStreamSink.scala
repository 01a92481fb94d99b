package graft.kv

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{BinaryType, BooleanType, StructField, StructType}
import org.apache.spark.sql.{functions => F}

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
    val target = Paths.get(dir, s"snapshot_v$batchId")
    if (Files.exists(target.resolve("_SUCCESS"))) return // replayed batch
    val s = batch.sparkSession
    val store = latestSnapshot(dir, batchId) match {
      case Some(p) => s.read.parquet(p)
      case None => s.createDataFrame(
        s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(MutationSchema.fields.take(3)))
    }
    val adds = batch.filter(!F.col("is_delete")).select("k", "c", "v")
    val dels = batch.filter(F.col("is_delete")).select("k", "c")
    KVStore.mutate(store, adds, dels)
      .write.mode("overwrite").parquet(target.toString)
  }

  /** The latest complete snapshot (strictly before `beforeId` when the
    * caller is batch `beforeId` computing its own input). */
  private def latestSnapshot(dir: String, beforeId: Long): Option[String] = {
    val d = Paths.get(dir)
    if (!Files.exists(d)) return None
    val listing = Files.list(d)
    val versions =
      try listing.iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("snapshot_v"))
        .filter(p => Files.exists(p.resolve("_SUCCESS")))
        .map(p => p.getFileName.toString.stripPrefix("snapshot_v").toLong)
        .filter(_ < beforeId)
        .toSeq
      finally listing.close()
    if (versions.isEmpty) None
    else Some(Paths.get(dir, s"snapshot_v${versions.max}").toString)
  }

  /** The current readable store: latest complete snapshot. */
  def read(spark: SparkSession, dir: String): DataFrame =
    latestSnapshot(dir, Long.MaxValue) match {
      case Some(p) => spark.read.parquet(p)
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(MutationSchema.fields.take(3)))
    }
}
