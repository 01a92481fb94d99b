package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.{functions => F}

import graft.GraftFs

/** Incrementally-maintained event-type TRANSITION MATRIX — q_markov
  * live: an unbounded event stream keeps the per-(event_type,
  * next_type) consecutive-pair counts current without re-reading
  * history.
  *
  * State per snapshot = TWO mergeable tables: the pair counts (|types|²
  * rows) and each user's LAST event (one row per user — the carry that
  * stitches a pair across a batch boundary). A micro-batch folds as:
  * window-lead over (stored last ∪ batch) per user, keep pairs whose
  * SUCCESSOR arrived in this batch (for an in-order stream that is
  * exactly the within-batch pairs plus the boundary pair), add to the
  * counts, advance the per-user last rows. Contract: per-user arrival
  * order (the same in-order replay contract as CDC consumers; an
  * out-of-order event within a batch is handled by the sort, across
  * batches it is not — q_session_funnel's buffered-watermark pattern is
  * the fix if ever needed). Exactly-once follows the RollupSink scheme:
  * versioned snapshots with an EXPLICIT root `_SUCCESS` written (via
  * GraftFs, so it deploys on any Hadoop FileSystem) only after BOTH
  * state tables landed; replayed batchIds skip; lineage folds onto the
  * latest complete snapshot.
  */
object MarkovSink {

  private val pairSchema = StructType(Seq(
    StructField("event_type", StringType), StructField("next_type", StringType),
    StructField("n", LongType)))
  private val lastSchema = StructType(Seq(
    StructField("user_id", LongType), StructField("tu", LongType),
    StructField("event_id", LongType), StructField("event_type", StringType)))

  /** Start maintenance: events must carry (user_id, ts, event_id,
    * event_type). */
  def start(events: DataFrame, dir: String): StreamingQuery =
    events.writeStream
      .foreachBatch((batch: DataFrame, batchId: Long) => applyBatch(batch, dir, batchId))
      .start()

  /** Fold one micro-batch into markov_v{batchId}. Idempotent. */
  def applyBatch(batch: DataFrame, dir: String, batchId: Long): Unit = {
    val s = batch.sparkSession
    val conf = s.sparkContext.hadoopConfiguration
    val target = GraftFs.child(dir, s"markov_v$batchId")
    if (GraftFs.complete(conf, target)) return // replayed batch
    val arrivals = batch.select(F.col("user_id").cast("long"),
      F.unix_micros(F.col("ts")).as("tu"), F.col("event_id").cast("long"),
      F.col("event_type")).withColumn("is_new", F.lit(true))
    val (prevPairs, prevLast) = GraftFs.latest(conf, dir, "markov_v", batchId) match {
      case Some(p) => (
        s.read.schema(pairSchema).parquet(GraftFs.child(p, "pairs")),
        s.read.schema(lastSchema).parquet(GraftFs.child(p, "last"))
          .withColumn("is_new", F.lit(false)))
      case None => (
        s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row], pairSchema),
        s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row], lastSchema)
          .withColumn("is_new", F.lit(false)))
    }
    val union = arrivals.unionByName(prevLast).localCheckpoint()
    val w = Window.partitionBy("user_id").orderBy(F.col("tu").asc, F.col("event_id").asc)
    // pairs whose successor is NEW: within-batch consecutive pairs plus
    // the stored-last → first-new boundary pair per user
    val newPairs = union
      .withColumn("next_type", F.lead("event_type", 1).over(w))
      .withColumn("next_new", F.lead("is_new", 1).over(w))
      .filter(F.col("next_type").isNotNull && F.col("next_new"))
      .groupBy("event_type", "next_type").agg(F.count(F.lit(1)).as("n"))
    val pairs = prevPairs.unionByName(newPairs)
      .groupBy("event_type", "next_type").agg(F.sum("n").as("n"))
    val wLast = Window.partitionBy("user_id")
      .orderBy(F.col("tu").desc, F.col("event_id").desc)
    val last = union.withColumn("rn", F.row_number().over(wLast))
      .filter(F.col("rn") === 1)
      .select("user_id", "tu", "event_id", "event_type")
    pairs.write.mode("overwrite").parquet(GraftFs.child(target, "pairs"))
    last.write.mode("overwrite").parquet(GraftFs.child(target, "last"))
    // completeness marker AFTER both tables: a crash in between leaves
    // an incomplete version invisible to lineage and readers
    GraftFs.writeTextAtomic(conf, GraftFs.child(target, "_SUCCESS"), "")
  }

  /** The maintained matrix, row-normalized exactly like q_markov. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val pairs = GraftFs.latest(conf, dir, "markov_v", Long.MaxValue) match {
      case Some(p) => spark.read.schema(pairSchema)
        .parquet(GraftFs.child(p, "pairs"))
      case None => return spark.emptyDataFrame
    }
    val rowTot = pairs.groupBy("event_type").agg(F.sum("n").as("rt"))
    pairs.join(F.broadcast(rowTot), "event_type")
      .select(F.col("event_type"), F.col("next_type"), F.col("n"),
        F.expr("(1000000 * n) div rt").as("p_ppm"))
  }
}
