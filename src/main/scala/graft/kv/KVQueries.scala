package graft.kv

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

import graft.Tables
import graft.Tables.dec2
import KVStore._

/** Correctness-gate queries for the KCV store. The store is derived from
  * `events` with the same byte-ordered layout the reference keeps in
  * MergeTree ORDER BY (k,c):
  *   k = user_id  as 8-byte big-endian
  *   c = (epoch_us(ts), event_id) as 16-byte big-endian composite
  *   v = value    as DECIMAL(18,2) string bytes
  * Every query runs genuinely in the binary domain (range predicates and
  * ordering on BinaryType) and only decodes for the oracle-comparable
  * output projection.
  */
object KVQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Build the binary KCV store from the events table. */
  def eventStore(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events").select(
      encLong(F.col("user_id")).as("k"),
      F.concat(encLong(F.unix_micros(F.col("ts"))), encLong(F.col("event_id"))).as("c"),
      dec2(F.col("value")).cast("string").cast("binary").as("v"))

  private def decoded(df: DataFrame): DataFrame =
    df.select(
      decLong(F.col("k"), 1).as("user_id"),
      decLong(F.col("c"), 1).as("us"),
      decLong(F.col("c"), 9).as("event_id"),
      F.col("v").cast("string").as("v_str"))

  private val usLo = "epoch_us(TIMESTAMP '2024-01-10 00:00:00')"
  private val usHi = "epoch_us(TIMESTAMP '2024-01-20 00:00:00')"
  private def colBound(us: String): org.apache.spark.sql.Column =
    F.concat(encLong(F.unix_micros(F.lit(us).cast("timestamp"))), encLong(F.lit(0L)))

  /** kv_slice: getSlice for keys 0..9, columns in [Jan10, Jan20), limit 50. */
  def kvSlice(s: SparkSession, dir: String): DataFrame = {
    val keys = s.range(0, 10).select(encLong(F.col("id")).as("k"))
    decoded(slice(eventStore(s, dir), F.broadcast(keys),
      colBound("2024-01-10 00:00:00"), colBound("2024-01-20 00:00:00"), 50))
  }

  val kvSliceSql: String =
    s"""SELECT user_id, us, event_id, CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) AS v_str
       |FROM (
       |  SELECT user_id, epoch_us(ts) AS us, event_id, value,
       |   ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC) AS rn
       |  FROM events
       |  WHERE user_id < 10 AND epoch_us(ts) >= $usLo AND epoch_us(ts) < $usHi) x
       |WHERE rn <= 50""".stripMargin

  /** kv_multislice: getSlice over a computed key set (every 10th user),
    * one-day column range, per-key limit 20. */
  def kvMultiSlice(s: SparkSession, dir: String): DataFrame = {
    val keys = Tables(s, dir, "events")
      .select(F.col("user_id")).distinct()
      .filter(F.col("user_id") % 10 === 0)
      .select(encLong(F.col("user_id")).as("k"))
    // corpus-derived key set: no broadcast hint — it scales with users
    decoded(slice(eventStore(s, dir), keys,
      colBound("2024-01-10 00:00:00"), colBound("2024-01-11 00:00:00"), 20))
  }

  val kvMultiSliceSql: String =
    s"""SELECT user_id, us, event_id, CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) AS v_str
       |FROM (
       |  SELECT user_id, epoch_us(ts) AS us, event_id, value,
       |   ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC) AS rn
       |  FROM events
       |  WHERE user_id % 10 = 0
       |    AND epoch_us(ts) >= $usLo AND epoch_us(ts) < epoch_us(TIMESTAMP '2024-01-11 00:00:00')) x
       |WHERE rn <= 20""".stripMargin

  /** kv_dsv2_multi's oracle: kv_multislice's query with the same
    * first-64-keys cap the Spark side applies. */
  val kvDsv2MultiSql: String =
    s"""SELECT user_id, us, event_id, CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) AS v_str
       |FROM (
       |  SELECT user_id, epoch_us(ts) AS us, event_id, value,
       |   ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC) AS rn
       |  FROM events
       |  WHERE user_id IN (
       |    SELECT user_id FROM (
       |      SELECT DISTINCT user_id FROM events WHERE user_id % 10 = 0
       |      ORDER BY user_id LIMIT 64))
       |    AND epoch_us(ts) >= $usLo AND epoch_us(ts) < epoch_us(TIMESTAMP '2024-01-11 00:00:00')) x
       |WHERE rn <= 20""".stripMargin

  /** kv_getkeys: ordered distinct-key scan over key range [50, 100). */
  def kvGetKeys(s: SparkSession, dir: String): DataFrame =
    keyScan(eventStore(s, dir), encLong(F.lit(50L)), encLong(F.lit(100L)))
      .select(decLong(F.col("k"), 1).as("user_id"))

  val kvGetKeysSql: String =
    "SELECT DISTINCT user_id FROM events WHERE user_id >= 50 AND user_id < 100"

  /** kv_keyslices: getKeys(KeyRangeQuery) with per-key entries — key
    * range [20, 60) × column range [Jan10, Jan20), per-key limit 15: the
    * composition a JanusGraph OLAP scan consumes through the reference's
    * RowIterator (ClickhouseKeyColumnValueStore.java:175, :294). One
    * parquet scan carries both range predicates. */
  def kvKeySlices(s: SparkSession, dir: String): DataFrame =
    decoded(keySlices(eventStore(s, dir),
      encLong(F.lit(20L)), encLong(F.lit(60L)),
      colBound("2024-01-10 00:00:00"), colBound("2024-01-20 00:00:00"), 15))

  val kvKeySlicesSql: String =
    s"""SELECT user_id, us, event_id, CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) AS v_str
       |FROM (
       |  SELECT user_id, epoch_us(ts) AS us, event_id, value,
       |   ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC) AS rn
       |  FROM events
       |  WHERE user_id >= 20 AND user_id < 60
       |    AND epoch_us(ts) >= $usLo AND epoch_us(ts) < $usHi) x
       |WHERE rn <= 15""".stripMargin

  /** The shared mutation scenario (also replayed by kv_deltalog, which
    * shares kv_mutate's oracle — keep both paths in lockstep): delete all
    * 'error' events of users 0..4, upsert a sentinel entry per such
    * user. Returns (additions, deletions). */
  private def mutationScenario(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val ev = Tables(s, dir, "events")
    val deletions = ev
      .filter(F.col("user_id") < 5 && F.col("event_type") === "error")
      .select(
        encLong(F.col("user_id")).as("k"),
        F.concat(encLong(F.unix_micros(F.col("ts"))), encLong(F.col("event_id"))).as("c"))
    val additions = ev.select("user_id").distinct().filter(F.col("user_id") < 5)
      .select(
        encLong(F.col("user_id")).as("k"),
        F.concat(encLong(F.lit(0L)), encLong(F.lit(999999L))).as("c"),
        F.lit("upserted").cast("binary").as("v"))
    (additions, deletions)
  }

  /** Read back every cell of users 0..4 (the scenario's key range). */
  private def readBackMutated(s: SparkSession, store: DataFrame): DataFrame = {
    val keys = s.range(0, 5).select(encLong(F.col("id")).as("k"))
    decoded(slice(store, F.broadcast(keys), F.lit(Array.emptyByteArray),
      F.concat(encLong(F.lit(Long.MaxValue)), encLong(F.lit(Long.MaxValue))), Int.MaxValue))
  }

  /** kv_mutate: batch mutate, then read the keys back — exercises
    * delete-before-add (ref ClickhouseKeyColumnValueStore.java:133). */
  def kvMutate(s: SparkSession, dir: String): DataFrame = {
    val (additions, deletions) = mutationScenario(s, dir)
    readBackMutated(s, mutate(eventStore(s, dir), additions, deletions))
  }

  val kvMutateSql: String =
    """SELECT user_id, us, event_id, v_str FROM (
      |  SELECT user_id, epoch_us(ts) AS us, event_id,
      |   CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) AS v_str
      |  FROM events WHERE user_id < 5 AND event_type <> 'error'
      |  UNION ALL
      |  SELECT DISTINCT user_id, 0 AS us, 999999 AS event_id, 'upserted' AS v_str
      |  FROM events WHERE user_id < 5) x""".stripMargin

  /** kv_deltalog: the kv_mutate scenario replayed through the append-only
    * mutation log (KVDeltaStore): batch 1 = the full event store, batch 2
    * = the same deletions+upserts, then the SAME slice read against the
    * merge-on-read view. Shares kv_mutate's oracle — the log and the
    * snapshot path must agree cell-for-cell. */
  // this JVM's previous kv_deltalog warehouse — the only one it is safe
  // to sweep (another process's graft_kvdelta dir may still back a
  // lazily-read merged view)
  private var lastDeltaWarehouse: Option[java.nio.file.Path] = None

  def kvDeltaLog(s: SparkSession, dir: String): DataFrame =
    deltaScenario(s, dir, compactFirst = false)

  /** kv_compact: the SAME scenario, but the log is folded into a fresh
    * base snapshot (KVDeltaStore.compact — the MergeTree background-merge
    * analogue) before the read. Shares kv_mutate's oracle: compaction
    * must be invisible to readers, cell for cell. */
  def kvCompact(s: SparkSession, dir: String): DataFrame =
    deltaScenario(s, dir, compactFirst = true)

  private def deltaScenario(s: SparkSession, dir: String,
                            compactFirst: Boolean): DataFrame = synchronized {
    // The merged view reads its files lazily, so the CURRENT warehouse
    // must outlive this call; the previous invocation's (fully consumed
    // by now) is swept, bounding accumulation at one warehouse per JVM.
    val whPath = graft.ScenarioDirs.fresh("graft_kvdelta", lastDeltaWarehouse)
    lastDeltaWarehouse = Some(whPath)
    val ds = new KVDeltaStore(s, whPath.toString)
    val noDel = eventStore(s, dir).select("k", "c").limit(0)
    val (additions, deletions) = mutationScenario(s, dir)
    // both batches derive from the input frames only — append
    // concurrently at explicit seqs (guide §2.6)
    graft.Par.jobs(
      () => ds.appendMutationAt("events", 1L, eventStore(s, dir), noDel,
        wts = 1000L),
      () => ds.appendMutationAt("events", 2L, additions, deletions,
        wts = 2000L))
    if (compactFirst) ds.compact("events")
    // eager localCheckpoint: the returned DataFrame must stay re-evaluable
    // AFTER a later call sweeps this warehouse, so cut its lineage to the
    // parquet files now (blocks live in this JVM's block manager, not
    // under whPath)
    readBackMutated(s, ds.openDatabase("events")).localCheckpoint(true)
  }

  /** kv_streamdelta: the SAME scenario driven through the STREAMING
    * delta-log sink (KVStreamSink.applyBatchDelta — O(batch) I/O per
    * micro-batch instead of the snapshot mode's O(store) rewrite):
    * micro-batch 0 = the full event store as additions, micro-batch 1 =
    * the deletions+upserts, batch 1 REDELIVERED (replay must be a
    * no-op), and compactThreshold=2 forces a fold mid-stream (compaction
    * must be invisible). Shares kv_mutate's oracle — the streaming log
    * path, the batch log path, and the snapshot path all agree cell for
    * cell. */
  def kvStreamDelta(s: SparkSession, dir: String): DataFrame = synchronized {
    val whPath = graft.ScenarioDirs.fresh("graft_kvdelta", lastDeltaWarehouse)
    lastDeltaWarehouse = Some(whPath)
    val wh = whPath.toString
    def asMutations(adds: DataFrame, dels: DataFrame): DataFrame =
      adds.withColumn("is_delete", F.lit(false))
        .unionByName(dels
          .select(F.col("k"), F.col("c"),
            F.lit(null).cast("binary").as("v"), F.lit(true).as("is_delete")))
    val noDel = eventStore(s, dir).select("k", "c").limit(0)
    val b0 = asMutations(eventStore(s, dir), noDel)
    val (additions, deletions) = mutationScenario(s, dir)
    val b1 = asMutations(additions, deletions)
    KVStreamSink.applyBatchDelta(b0, wh, "events", 0L, compactThreshold = 2)
    KVStreamSink.applyBatchDelta(b1, wh, "events", 1L, compactThreshold = 2)
    KVStreamSink.applyBatchDelta(b1, wh, "events", 1L, compactThreshold = 2)
    readBackMutated(s, KVStreamSink.readDelta(s, wh, "events"))
      .localCheckpoint(true)
  }

  /** kv_stream_source: the delta log read BACK as a Structured
    * Streaming SOURCE (graft-kv-log — the store's change-data-feed,
    * completing the connector's streaming story: KVStreamSink writes
    * the log from a stream, this reads it as one). The kv_mutate
    * scenario lands as two delta parts; the stream drains them with
    * Trigger.AvailableNow at maxSeqsPerBatch=1 — so the log replays as
    * TWO offset-bounded micro-batches through the checkpoint, not one
    * lump — into a parquet sink; the CDC rows then reconstruct the
    * final store state with the exact merge-on-read rule (latest
    * (seq, op) per (k, c)) and the same slice reads back. Shares
    * kv_mutate's oracle: the feed must carry EVERYTHING the store
    * knows, cell for cell. */
  def kvStreamSource(s: SparkSession, dir: String): DataFrame = synchronized {
    val whPath = graft.ScenarioDirs.fresh("graft_kvdelta", lastDeltaWarehouse)
    lastDeltaWarehouse = Some(whPath)
    val wh = whPath.toString
    val ds = new KVDeltaStore(s, wh)
    val noDel = eventStore(s, dir).select("k", "c").limit(0)
    val (additions, deletions) = mutationScenario(s, dir)
    // frame-derived batches at explicit seqs — append concurrently
    graft.Par.jobs(
      () => ds.appendMutationAt("events", 1L, eventStore(s, dir), noDel,
        wts = 1000L),
      () => ds.appendMutationAt("events", 2L, additions, deletions,
        wts = 2000L))
    val out = s"$wh/cdc_out"
    val q = s.readStream.format("graft-kv-log")
      .option("maxSeqsPerBatch", "1")
      .load(s"$wh/events")
      .writeStream.format("parquet")
      .option("checkpointLocation", s"$wh/cdc_ckpt").option("path", out)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k", "c").orderBy(F.col("seq").desc, F.col("op").desc)
    val resolved = s.read.parquet(out)
      .withColumn("rn", F.rank().over(w))
      .filter(F.col("rn") === 1 && F.col("op") === 1)
      .select("k", "c", "v")
    readBackMutated(s, resolved).localCheckpoint(true)
  }

  /** kv_cdc_replica: LOG-SHIPPED REPLICATION — the CDC source composed
    * with the delta-log sink: a second store FOLLOWS the primary's
    * change feed (readStream graft-kv-log → foreachBatch
    * applyBatchDelta) and must resolve cell-for-cell identical. This is
    * the replication story every production KCV deployment runs
    * (ClickHouse replicas pull each other's part log the same way);
    * with graft it is ten lines of composition because both halves
    * already exist. Exactly-once end to end: the source's checkpoint
    * replays unacknowledged offsets, the sink's high-water mark + part
    * completeness dedupe them. Shares kv_mutate's oracle (read back off
    * the REPLICA). */
  def kvCdcReplica(s: SparkSession, dir: String): DataFrame = synchronized {
    val whPath = graft.ScenarioDirs.fresh("graft_kvdelta", lastDeltaWarehouse)
    lastDeltaWarehouse = Some(whPath)
    val wh = whPath.toString
    val ds = new KVDeltaStore(s, wh)
    val noDel = eventStore(s, dir).select("k", "c").limit(0)
    val (additions, deletions) = mutationScenario(s, dir)
    // frame-derived batches at explicit seqs — append concurrently
    graft.Par.jobs(
      () => ds.appendMutationAt("events", 1L, eventStore(s, dir), noDel,
        wts = 1000L),
      () => ds.appendMutationAt("events", 2L, additions, deletions,
        wts = 2000L))
    val q = s.readStream.format("graft-kv-log")
      .option("maxSeqsPerBatch", "1")
      .load(s"$wh/events")
      .writeStream
      // maxSeqsPerBatch=1: every micro-batch is exactly ONE source log
      // part, so the cross-part foldCdc rank window (a full shuffle+sort
      // of the store per batch) is unnecessary — the batch passes through
      // as mutations and the replica's own merge-on-read applies the
      // identical same-seq resolution (op desc: addition beats deletion),
      // so the resolved replica is cell-for-cell the same (oracle-gated).
      .foreachBatch((batch: DataFrame, batchId: Long) =>
        KVStreamSink.applyBatchDelta(
          batch.select(F.col("k"), F.col("c"), F.col("v"),
            (F.col("op") === 0).as("is_delete")), wh, "replica", batchId))
      .option("checkpointLocation", s"$wh/repl_ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    readBackMutated(s, KVStreamSink.readDelta(s, wh, "replica"))
      .localCheckpoint(true)
  }

  /** kv_mv_follow: a MAINTAINED VIEW FOLLOWING THE STORE LIVE — the
    * ClickHouse MATERIALIZED VIEW-over-MergeTree story (an MV's SELECT
    * runs on every inserted block and folds into an
    * AggregatingMergeTree), composed from two halves graft already has:
    * the store's change feed (graft-kv-log) drives RollupSink's
    * versioned fold via foreachBatch, so a per-user rollup (cell count +
    * exact cents sum) stays current as mutation batches land — the view
    * NEVER recomputes from store history. Insert-driven exactly like
    * ClickHouse MVs (the fold consumes op = 1 additions; tombstones do
    * not retract — the documented MV contract), so the scenario's second
    * batch is pure additions (one bonus cell per user < 5). Exactly-once
    * is proven in-gate: after the stream drains, the second batch is
    * RE-APPLIED under its original batchId and the sink's completeness
    * gate must skip it — a double-fold would break the oracle hash.
    * Scale: each micro-batch folds O(batch) plus one O(|keys|) snapshot
    * merge, independent of stream length. */
  def kvMvFollow(s: SparkSession, dir: String): DataFrame = synchronized {
    val whPath = graft.ScenarioDirs.fresh("graft_kvdelta", lastDeltaWarehouse)
    lastDeltaWarehouse = Some(whPath)
    val wh = whPath.toString
    val ds = new KVDeltaStore(s, wh)
    val noDel = eventStore(s, dir).select("k", "c").limit(0)
    // batch 2: pure additions — a 1.00-valued bonus cell per user < 5
    val bonus = Tables(s, dir, "events").select("user_id").distinct()
      .filter(F.col("user_id") < 5)
      .select(
        encLong(F.col("user_id")).as("k"),
        F.concat(encLong(F.lit(0L)), encLong(F.lit(888888L))).as("c"),
        F.lit("1.00").cast("binary").as("v"))
      .localCheckpoint(true)
    // frame-derived batches at explicit seqs — append concurrently
    graft.Par.jobs(
      () => ds.appendMutationAt("events", 1L, eventStore(s, dir), noDel,
        wts = 1000L),
      () => ds.appendMutationAt("events", 2L, bonus, noDel, wts = 2000L))
    val mvDir = s"$wh/mv"
    // CDC rows → RollupSink's (event_type, value) contract: the user id
    // keys the rollup, the cell value is the summed measure — the sink
    // is reused UNCHANGED, only this projection is new
    def fold(batch: DataFrame, batchId: Long): Unit =
      graft.streaming.RollupSink.applyBatch(
        batch.filter(F.col("op") === 1)
          .select(decLong(F.col("k"), 1).cast("string").as("event_type"),
            F.col("v").cast("string").as("value")),
        mvDir, batchId)
    val q = s.readStream.format("graft-kv-log")
      .option("maxSeqsPerBatch", "1")
      .load(s"$wh/events")
      .writeStream
      .foreachBatch((batch: DataFrame, batchId: Long) => fold(batch, batchId))
      .option("checkpointLocation", s"$wh/mv_ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // REPLAY batch 1 (the bonus additions) under its original batchId:
    // rollup_v1 is complete on disk, so the sink must skip the fold
    fold(bonus.withColumn("op", F.lit(1)), 1L)
    graft.streaming.RollupSink.read(s, mvDir)
      .select(F.col("event_type").cast("long").as("user_id"),
        F.col("n").as("n_cells"), F.col("sum_c"))
      .localCheckpoint(true)
  }

  val kvMvFollowSql: String =
    """SELECT user_id,
      | CAST(COUNT(*) + CASE WHEN user_id < 5 THEN 1 ELSE 0 END AS BIGINT) AS n_cells,
      | CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
      |   + CASE WHEN user_id < 5 THEN 100 ELSE 0 END AS BIGINT) AS sum_c
      |FROM events GROUP BY user_id""".stripMargin

  /** kv_bucket_join: store-to-store CO-LOCATED join driver-checked — the
    * payoff of writeBucketed's MergeTree ORDER BY (k,c) layout: the event
    * store and a per-key rollup store are both persisted bucketed by k,
    * and the cell⋈rollup equi-join plans with ZERO Exchange on either
    * side (KVBucketSpec asserts the no-shuffle plan property; this entry
    * hash-gates the joined VALUES against the plain SQL join). At 100 TB
    * this is the difference between a join that moves both stores and one
    * that moves nothing: both sides' bucket files are read co-located.
    * Read back: every cell of users < 50 enriched with that user's total
    * cell count. */
  def kvBucketJoin(s: SparkSession, dir: String): DataFrame = synchronized {
    val store = eventStore(s, dir)
    KVStore.writeBucketed(store, "graft_kvbj_cells", numBuckets = 8)
    val roll = store.groupBy("k").agg(F.count(F.lit(1)).as("n"))
      .select(F.col("k"), encLong(F.lit(0L)).as("c"), encLong(F.col("n")).as("v"))
    KVStore.writeBucketed(roll, "graft_kvbj_roll", numBuckets = 8)
    val cells = s.table("graft_kvbj_cells")
      .filter(F.col("k") < encLong(F.lit(50L)))
    val totals = s.table("graft_kvbj_roll")
      .select(F.col("k"), decLong(F.col("v"), 1).as("user_total"))
    val res = cells.join(totals, Seq("k"))
      .select(
        decLong(F.col("k"), 1).as("user_id"),
        decLong(F.col("c"), 1).as("us"),
        decLong(F.col("c"), 9).as("event_id"),
        F.col("v").cast("string").as("v_str"),
        F.col("user_total"))
      .localCheckpoint(true) // outlive the DROP TABLE below
    s.sql("DROP TABLE IF EXISTS graft_kvbj_cells")
    s.sql("DROP TABLE IF EXISTS graft_kvbj_roll")
    res
  }

  val kvBucketJoinSql: String =
    """SELECT e.user_id, epoch_us(e.ts) AS us, e.event_id,
      | CAST(CAST(e.value AS DECIMAL(18,2)) AS VARCHAR) AS v_str,
      | t.n AS user_total
      |FROM events e
      |JOIN (SELECT user_id, COUNT(*) AS n FROM events GROUP BY 1) t
      |  ON t.user_id = e.user_id
      |WHERE e.user_id < 50""".stripMargin

  // this JVM's previous kv_timetravel warehouse (same sweep lifecycle)
  private var lastTravelWarehouse: Option[java.nio.file.Path] = None

  /** kv_timetravel: version-pinned read of the mutation log
    * (KVDeltaStore.openDatabaseAsOf) — the capability the append-only log
    * buys over the reference's in-place MergeTree mutations: batch 1 =
    * the full event store, batch 2 = kv_mutate's deletions+upserts, then
    * the SAME key-range read **as of version 1**. The mutation batch is
    * in the log but must be invisible; the oracle is the PLAIN
    * pre-mutation event store, so the version pin is hash-gated cell for
    * cell (while kv_deltalog gates the post-mutation view of the very
    * same log). */
  def kvTimetravel(s: SparkSession, dir: String): DataFrame = synchronized {
    val whPath = graft.ScenarioDirs.fresh("graft_kvtravel", lastTravelWarehouse)
    lastTravelWarehouse = Some(whPath)
    val ds = new KVDeltaStore(s, whPath.toString)
    val noDel = eventStore(s, dir).select("k", "c").limit(0)
    val (additions, deletions) = mutationScenario(s, dir)
    // frame-derived batches at explicit seqs — append concurrently
    graft.Par.jobs(
      () => ds.appendMutationAt("events", 1L, eventStore(s, dir), noDel,
        wts = 1000L),
      () => ds.appendMutationAt("events", 2L, additions, deletions,
        wts = 2000L))
    readBackMutated(s, ds.openDatabaseAsOf("events", 1L)).localCheckpoint(true)
  }

  val kvTimetravelSql: String =
    """SELECT user_id, epoch_us(ts) AS us, event_id,
      | CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) AS v_str
      |FROM events WHERE user_id < 5""".stripMargin

  // this JVM's previous kv_ttl warehouse (same sweep lifecycle as
  // lastDeltaWarehouse)
  private var lastTtlWarehouse: Option[java.nio.file.Path] = None

  /** kv_ttl: MergeTree-style TTL (`TTL ts + INTERVAL ...`) as a
    * driver-checked query — the KVDeltaStore.expire path end-to-end.
    * Scenario: the event store lands in TWO ingestion batches split by
    * event time (pre-/post- Jan 15) with write-stamps 1000/2000; expire
    * (olderThan=1500) must delete exactly the first batch's cells via an
    * ordinary mutation batch; compact() then folds the log (ages survive
    * — KVTtlSpec proves that independently) and the slice read of users
    * 0..19 must see precisely the young half. Oracle = the plain time
    * filter, so expiry exactness is hash-gated cell for cell. */
  def kvTtl(s: SparkSession, dir: String): DataFrame = synchronized {
    val whPath = graft.ScenarioDirs.fresh("graft_kvttl", lastTtlWarehouse)
    lastTtlWarehouse = Some(whPath)
    val ds = new KVDeltaStore(s, whPath.toString)
    val es = eventStore(s, dir)
    val cut = colBound("2024-01-15 00:00:00")
    val noDel = es.select("k", "c").limit(0)
    // the two ingestion batches are frame-derived — append concurrently
    graft.Par.jobs(
      () => ds.appendMutationAt("events", 1L, es.filter(F.col("c") < cut),
        noDel, wts = 1000L),
      () => ds.appendMutationAt("events", 2L, es.filter(F.col("c") >= cut),
        noDel, wts = 2000L))
    ds.expire("events", olderThan = 1500L, wts = 3000L)
    ds.compact("events")
    val keys = s.range(0, 20).select(encLong(F.col("id")).as("k"))
    decoded(slice(ds.openDatabase("events"), F.broadcast(keys),
      F.lit(Array.emptyByteArray),
      F.concat(encLong(F.lit(Long.MaxValue)), encLong(F.lit(Long.MaxValue))),
      Int.MaxValue))
      .localCheckpoint(true) // outlive the warehouse sweep, like kv_deltalog
  }

  val kvTtlSql: String =
    """SELECT user_id, epoch_us(ts) AS us, event_id,
      | CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) AS v_str
      |FROM events
      |WHERE user_id < 20
      |  AND epoch_us(ts) >= epoch_us(TIMESTAMP '2024-01-15 00:00:00')""".stripMargin

  // this JVM's previous kv_dsv2 segment dir (same lifecycle as the delta
  // warehouse: sweep only our own previous, fully-consumed directory)
  private var lastSegmentDir: Option[java.nio.file.Path] = None

  /** kv_dsv2: the kv_slice read replayed through the graft-kv
    * DataSourceV2 connector — the store persisted as 8 key-range parquet
    * segments (graft.sources.kvconnector.KVSegmentStore), read back via
    * `spark.read.format("graft-kv")` with the key-range predicate pushed
    * to the segment manifest (plan-time segment pruning; the spec asserts
    * the pruned plan), then the identical slice. Shares kv_slice's
    * oracle: the connector path must reproduce the direct path cell for
    * cell. */
  def kvDsv2(s: SparkSession, dir: String): DataFrame = synchronized {
    val seg = graft.ScenarioDirs.fresh("graft_kvseg", lastSegmentDir)
    lastSegmentDir = Some(seg)
    graft.sources.kvconnector.KVSegmentStore.write(eventStore(s, dir), seg.toString, 8)
    val store = s.read.format("graft-kv").load(seg.toString)
      .filter(F.col("k") < encLong(F.lit(10L))) // pushed → manifest pruning
    val keys = s.range(0, 10).select(encLong(F.col("id")).as("k"))
    decoded(slice(store, F.broadcast(keys),
      colBound("2024-01-10 00:00:00"), colBound("2024-01-20 00:00:00"), 50))
      .localCheckpoint(true)
  }

  // previous kv_dsv2_multi segment dir (same sweep lifecycle)
  private var lastMultiSegDir: Option[java.nio.file.Path] = None

  /** kv_dsv2_multi: the kv_multislice key set driven through the DSv2
    * connector as an IN-set — the reference's multi-key getSlice takes an
    * EXPLICIT key list (ClickhouseKeyColumnValueStore.java:108), so the
    * keys are materialized driver-side and pushed as `In("k", keys)`,
    * which the manifest prunes segment-by-segment at plan time (a narrow
    * key list against a million-segment store schedules only the
    * segments that can hold those keys). The key list is CAPPED at the
    * first 64 keys by value — an explicit driver-side key list must be
    * driver-bounded at any SF (the reference's multi-key getSlice takes
    * whatever finite list the caller built; an UNBOUNDED collect would
    * scale with the table) — so the entry has its own oracle applying
    * the same cap. Scale note: the slice read itself still joins
    * against the key set as a DataFrame; the IN literal list exists
    * purely to carry the pushdown — both forms express the same SPI
    * call. */
  def kvDsv2Multi(s: SparkSession, dir: String): DataFrame = synchronized {
    val seg = graft.ScenarioDirs.fresh("graft_kvsegm", lastMultiSegDir)
    lastMultiSegDir = Some(seg)
    graft.sources.kvconnector.KVSegmentStore.write(eventStore(s, dir), seg.toString, 8)
    val keyIds = Tables(s, dir, "events")
      .select(F.col("user_id")).distinct()
      .filter(F.col("user_id") % 10 === 0)
      .orderBy("user_id").limit(64)
      .collect().map(_.getLong(0))
    val enc: Array[Array[Byte]] = keyIds.map(beLong)
    val store = s.read.format("graft-kv").load(seg.toString)
      .filter(F.col("k").isin(enc.toSeq: _*))
    val keys = s.createDataset(keyIds.toSeq)(org.apache.spark.sql.Encoders.scalaLong)
      .select(encLong(F.col("value")).as("k"))
    decoded(slice(store, F.broadcast(keys),
      colBound("2024-01-10 00:00:00"), colBound("2024-01-11 00:00:00"), 20))
      .localCheckpoint(true)
  }

  // previous kv_spj_join store dirs (same sweep lifecycle)
  private var lastSpjCells: Option[java.nio.file.Path] = None
  private var lastSpjRoll: Option[java.nio.file.Path] = None

  /** kv_spj_join: the STORAGE-PARTITIONED join (r11 verdict #5) —
    * kv_bucket_join's zero-exchange co-location made native to the DSv2
    * connector. Both stores persist hash-bucketed by k
    * (KVSegmentStore.writeBucketed, 8 buckets each), the scans REPORT
    * KeyGroupedPartitioning(bucket(8, k)) with per-segment bucket ids,
    * and the graftkv catalog supplies the shared bucket-function
    * identity — so the cells⋈totals equi-join plans with ZERO Exchange
    * on either side (KVSpjSpec asserts the plan property; this entry
    * hash-gates the joined values against the plain SQL join). At
    * 100 TB this is the story of two co-bucketed stores joining without
    * moving either — through the connector, not a parquet side-channel. */
  def kvSpjJoin(s: SparkSession, dir: String): DataFrame = synchronized {
    val cellsDir = graft.ScenarioDirs.fresh("graft_kvspjc", lastSpjCells)
    val rollDir = graft.ScenarioDirs.fresh("graft_kvspjr", lastSpjRoll)
    lastSpjCells = Some(cellsDir)
    lastSpjRoll = Some(rollDir)
    val store = eventStore(s, dir)
    graft.sources.kvconnector.KVSegmentStore.writeBucketed(
      store, cellsDir.toString, numBuckets = 8)
    val roll = store.groupBy("k").agg(F.count(F.lit(1)).as("n"))
      .select(F.col("k"), encLong(F.lit(0L)).as("c"), encLong(F.col("n")).as("v"))
    graft.sources.kvconnector.KVSegmentStore.writeBucketed(
      roll, rollDir.toString, numBuckets = 8)
    // snapshot-and-restore the SPJ planning confs: they apply to the
    // whole shared session, and leaking them would silently change the
    // planning environment of every LATER entry in a run (the bucketing
    // flags alter how any partition-reporting DSv2 scan joins). The
    // catalog registration is restored the same way — plans built below
    // are localCheckpoint-ed eagerly, so nothing re-resolves it later.
    val spjConfs = Seq("spark.sql.catalog.graftkv",
      "spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled")
    val saved = spjConfs.map(k => k -> s.conf.getOption(k))
    s.conf.set("spark.sql.catalog.graftkv",
      classOf[graft.sources.kvconnector.KVCatalog].getName)
    s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    s.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    try {
      val cells = s.table(s"graftkv.`$cellsDir`")
        .filter(F.col("k") < encLong(F.lit(50L)))
      val totals = s.table(s"graftkv.`$rollDir`")
        .select(F.col("k"), decLong(F.col("v"), 1).as("user_total"))
      cells.hint("merge").join(totals, Seq("k"))
        .select(
          decLong(F.col("k"), 1).as("user_id"),
          decLong(F.col("c"), 1).as("us"),
          decLong(F.col("c"), 9).as("event_id"),
          F.col("v").cast("string").as("v_str"),
          F.col("user_total"))
        .localCheckpoint(true)
    } finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  // previous kv_runtime_prune segment dir (same sweep lifecycle)
  private var lastRtSegDir: Option[java.nio.file.Path] = None

  /** kv_runtime_prune: runtime (join-key) segment pruning through the
    * DSv2 connector (r11 verdict #4) — the star-join shape: the event
    * store read via graft-kv with NO static key predicate, equi-joined
    * on k against a SELECTIVE dimension (per-user totals, users < 50).
    * Spark plans a dynamic-pruning subquery over the broadcast dim side
    * and hands its key set to the scan as a runtime In("k", ...) at
    * EXECUTION time (SupportsRuntimeFiltering), so segments + blooms
    * prune before any task is scheduled — without it, a selective
    * dim⋈store join scans every committed segment. The oracle is the
    * plain SQL join (kv_bucket_join's), so pruning exactness is
    * hash-gated cell for cell; KVRuntimeFilterSpec asserts the
    * scheduled-segment drop itself. */
  def kvRuntimePrune(s: SparkSession, dir: String): DataFrame = synchronized {
    val seg = graft.ScenarioDirs.fresh("graft_kvsegr", lastRtSegDir)
    lastRtSegDir = Some(seg)
    graft.sources.kvconnector.KVSegmentStore.write(eventStore(s, dir), seg.toString, 16)
    val cells = s.read.format("graft-kv").load(seg.toString)
    val totals = Tables(s, dir, "events")
      .filter(F.col("user_id") < 50)
      .groupBy("user_id").agg(F.count(F.lit(1)).as("user_total"))
      .select(encLong(F.col("user_id")).as("k"), F.col("user_total"))
    cells.join(totals, Seq("k"))
      .select(
        decLong(F.col("k"), 1).as("user_id"),
        decLong(F.col("c"), 1).as("us"),
        decLong(F.col("c"), 9).as("event_id"),
        F.col("v").cast("string").as("v_str"),
        F.col("user_total"))
      .localCheckpoint(true)
  }

  // previous kv_topn segment dir (same sweep lifecycle)
  private var lastTopnSegDir: Option[java.nio.file.Path] = None

  /** kv_topn: the smallest 100 cells of the whole store in (k, c) order
    * through the DSv2 connector's TopN PUSHDOWN — `ORDER BY k, c LIMIT
    * 100` rides the (k, c)-sorted segment layout (each reader returns
    * its first 100 rows, Spark merges: the read-in-order optimization),
    * so the scan decodes ≤ 100 rows per segment at any store size. */
  def kvTopn(s: SparkSession, dir: String): DataFrame = synchronized {
    val seg = graft.ScenarioDirs.fresh("graft_kvsegt", lastTopnSegDir)
    lastTopnSegDir = Some(seg)
    graft.sources.kvconnector.KVSegmentStore.write(eventStore(s, dir), seg.toString, 8)
    decoded(s.read.format("graft-kv").load(seg.toString)
        .orderBy(F.col("k").asc, F.col("c").asc).limit(100))
      .localCheckpoint(true)
  }

  val kvTopnSql: String =
    """SELECT user_id, epoch_us(ts) AS us, event_id,
      | CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) AS v_str
      |FROM events
      |ORDER BY user_id ASC, epoch_us(ts) ASC, event_id ASC
      |LIMIT 100""".stripMargin

  // previous kv_topn_zorder store dir (same sweep lifecycle)
  private var lastTopnZoDir: Option[java.nio.file.Path] = None

  /** kv_topn_zorder: kv_topn's ordered read OVER THE Z-ORDER LAYOUT
    * (r10 verdict #6) — `ORDER BY k, c LIMIT 100` against a store whose
    * segments are Morton curve runs. Segment membership follows the
    * curve (that is the pruning win kv_zorder gates); rows INSIDE each
    * segment are (k, c)-sorted by the write contract, so the TopN push
    * is accepted and each reader stops at 100 decoded rows — the
    * optimize_read_in_order analog now composes with the layout that
    * prunes best. Shares kv_topn's oracle: same rows, different layout,
    * pushed read-in-order on both (KVZOrderSpec asserts the push and
    * the per-segment decode bound). */
  def kvTopnZorder(s: SparkSession, dir: String): DataFrame = synchronized {
    val zo = graft.ScenarioDirs.fresh("graft_kvsegtz", lastTopnZoDir)
    lastTopnZoDir = Some(zo)
    val ev = Tables(s, dir, "events")
    graft.sources.kvconnector.KVZOrder.write(
      ev.select(
        encLong(F.col("user_id")).as("k"),
        F.concat(encLong(F.unix_micros(F.col("ts"))),
          encLong(F.col("event_id"))).as("c"),
        dec2(F.col("value")).cast("string").cast("binary").as("v"),
        F.col("user_id").as("zka"),
        F.unix_micros(F.col("ts")).as("zca")),
      F.col("zka"), F.col("zca"), zo.toString, 16)
    decoded(s.read.format("graft-kv").load(zo.toString)
        .orderBy(F.col("k").asc, F.col("c").asc).limit(100))
      .localCheckpoint(true)
  }

  // previous kv_dsv2_write segment dir (same sweep lifecycle)
  private var lastWriteSegDir: Option[java.nio.file.Path] = None

  /** kv_dsv2_write: the kv_slice scenario with the store persisted
    * through the connector's DSv2 WRITE path
    * (`df.write.format("graft-kv")` — RequiresDistributionAndOrdering
    * negotiates the range-by-k, (k,c)-sorted segment layout with Spark;
    * manifest assembled from task commit messages) and read back via the
    * same manifest-pruned DSv2 read. Shares kv_slice's oracle: the write
    * protocol is hash-gated end to end. */
  def kvDsv2Write(s: SparkSession, dir: String): DataFrame = synchronized {
    val seg = graft.ScenarioDirs.fresh("graft_kvsegw", lastWriteSegDir)
    lastWriteSegDir = Some(seg)
    eventStore(s, dir).write.format("graft-kv")
      .option("segments", 8).mode("overwrite").save(seg.toString)
    val store = s.read.format("graft-kv").load(seg.toString)
      .filter(F.col("k") < encLong(F.lit(10L)))
    val keys = s.range(0, 10).select(encLong(F.col("id")).as("k"))
    decoded(slice(store, F.broadcast(keys),
      colBound("2024-01-10 00:00:00"), colBound("2024-01-20 00:00:00"), 50))
      .localCheckpoint(true)
  }

  private var lastBloomDir: Option[java.nio.file.Path] = None

  /** kv_bloom_skip: the per-segment key BLOOM skip index end-to-end
    * under the HASH GATE — the store holds only EVEN user ids, and a
    * 20-key IN probe (10 present, 10 absent-but-inside-the-key-range —
    * the gap the minmax zone map cannot close) must return exactly the
    * even keys' rows with zero rows for the odd keys: a false-negative
    * bloom would zero a present key, an unsound prune would drop rows,
    * and either breaks the oracle hash. The odd keys' segments are
    * skipped at PLAN time (KVBloomSpec asserts kept.isEmpty on the
    * same shape). */
  def kvBloomSkip(s: SparkSession, dir: String): DataFrame = synchronized {
    val seg = graft.ScenarioDirs.fresh("graft_kvbloom", lastBloomDir)
    lastBloomDir = Some(seg)
    graft.sources.kvconnector.KVSegmentStore.write(
      Tables(s, dir, "events")
        .filter(F.pmod(F.col("user_id"), F.lit(2L)) === 0L)
        .select(encLong(F.col("user_id")).as("k"),
          F.concat(encLong(F.unix_micros(F.col("ts"))),
            encLong(F.col("event_id"))).as("c"),
          dec2(F.col("value")).cast("string").cast("binary").as("v")),
      seg.toString, 8)
    val hit = s.read.format("graft-kv").load(seg.toString)
      .filter(F.col("k").isin((0L until 20L).map(beLong): _*))
      .select(decLong(F.col("k"), 1).as("user_id"))
      .groupBy("user_id").agg(F.count(F.lit(1)).as("n_rows"))
    s.range(0, 20).select(F.col("id").as("user_id"))
      .join(hit, Seq("user_id"), "left")
      .na.fill(0L, Seq("n_rows"))
      .localCheckpoint(true)
  }

  private var lastZLinDir: Option[java.nio.file.Path] = None
  private var lastZOrdDir: Option[java.nio.file.Path] = None

  /** kv_zorder: the Z-ORDER segment layout end-to-end under the HASH
    * GATE (r9 verdict #5) — the SAME event rows written twice through
    * the DSv2 writer, linear (range-by-k, the MergeTree ORDER BY (k,c))
    * and Morton (layout=zorder via KVZOrder: width-bucketed (user_id,
    * µs) coordinates interleaved, curve-run segments). A (key-range ×
    * time-range) probe — the bottom half of the key space × ONE day of
    * thirty — must (a) return exactly the oracle's rows from the zorder
    * store (layout changes placement, never content: rows ride the
    * hash) and (b) schedule STRICTLY FEWER segments at plan time than
    * the linear layout (ok = 1): linear's key-stripes each span all
    * thirty days so the time predicate prunes nothing, while zorder's
    * rectangles cut both ways. */
  def kvZorder(s: SparkSession, dir: String): DataFrame = synchronized {
    val lin = graft.ScenarioDirs.fresh("graft_kvzlin", lastZLinDir)
    lastZLinDir = Some(lin)
    val zo = graft.ScenarioDirs.fresh("graft_kvzord", lastZOrdDir)
    lastZOrdDir = Some(zo)
    val ev = Tables(s, dir, "events")
    eventStore(s, dir).write.format("graft-kv")
      .option("segments", 16).mode("overwrite").save(lin.toString)
    graft.sources.kvconnector.KVZOrder.write(
      ev.select(
        encLong(F.col("user_id")).as("k"),
        F.concat(encLong(F.unix_micros(F.col("ts"))),
          encLong(F.col("event_id"))).as("c"),
        dec2(F.col("value")).cast("string").cast("binary").as("v"),
        F.col("user_id").as("zka"),
        F.unix_micros(F.col("ts")).as("zca")),
      F.col("zka"), F.col("zca"), zo.toString, 16)
    def usOf(t: String): Long =
      java.time.LocalDateTime.parse(t)
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
    val kHi = ev.agg(F.expr("max(user_id) div 2")).collect()(0).getLong(0)
    val cLo = beLong(usOf("2024-01-10T00:00:00")) ++ beLong(0L)
    val cHi = beLong(usOf("2024-01-11T00:00:00")) ++ beLong(0L)
    // ONE manifest read per store feeds both the probe and the tie gate
    // (r12 verdict #5 — the gate probes used to re-read zo's manifest)
    val linSegs = graft.sources.kvconnector.KVSegmentStore.readManifest(lin.toString)
    val zoSegs = graft.sources.kvconnector.KVSegmentStore.readManifest(zo.toString)
    val nLin = graft.sources.kvconnector.KVZOrder.scheduledSegmentsOf(
      linSegs, beLong(0L), beLong(kHi), cLo, cHi)
    val nZo = graft.sources.kvconnector.KVZOrder.scheduledSegmentsOf(
      zoSegs, beLong(0L), beLong(kHi), cLo, cHi)
    decoded(s.read.format("graft-kv").load(zo.toString)
        .filter(F.col("k") >= F.lit(beLong(0L)) &&
          F.col("k") <= F.lit(beLong(kHi)) &&
          F.col("c") >= F.lit(cLo) && F.col("c") < F.lit(cHi)))
      // strict win demanded only when linear schedules enough segments
      // for a win to be possible (r10 advice: at tiny SFs with few
      // distinct keys or near-empty segments the two 16-segment layouts
      // can tie at 1-2 scheduled segments — a tie there is not a
      // regression, it is the probe rectangle fitting one curve run).
      // The tie is accepted only when z-order actually pruned SOMETHING
      // (nZo < committed segments) or the store is a single segment
      // (nothing to prune) — a tie where z-order scheduled every
      // segment of a prunable store is a pruning regression to parity
      // and must fail the gate (r11 advice #5; the first cut wrote
      // `|| zoTotal <= 2`, which under nZo <= nLin <= 2 can never
      // reject anything — r12 review caught the vacuity)
      .withColumn("ok", F.lit {
        val zoTotal = zoSegs.size
        val tieOk = nZo <= nLin && nLin <= 2 && (nZo < zoTotal || zoTotal <= 1)
        if (nZo < nLin || tieOk) 1L else 0L
      })
      .localCheckpoint(true)
  }

  val kvZorderSql: String =
    """WITH mx AS (SELECT max(user_id) // 2 AS kh FROM events)
      |SELECT user_id, epoch_us(ts) AS us, event_id,
      | CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) AS v_str,
      | CAST(1 AS BIGINT) AS ok
      |FROM events, mx
      |WHERE user_id <= mx.kh
      |  AND epoch_us(ts) >= epoch_us(TIMESTAMP '2024-01-10 00:00:00')
      |  AND epoch_us(ts) <  epoch_us(TIMESTAMP '2024-01-11 00:00:00')""".stripMargin

  val kvBloomSkipSql: String =
    """WITH probes AS (
      |  SELECT CAST(UNNEST(generate_series(0, 19)) AS BIGINT) AS user_id)
      |SELECT p.user_id, CAST(COUNT(e.user_id) AS BIGINT) AS n_rows
      |FROM probes p
      |LEFT JOIN events e ON e.user_id = p.user_id AND e.user_id % 2 = 0
      |GROUP BY 1""".stripMargin

  val entries: Seq[(String, Q, Option[String])] = Seq(
    ("kv_zorder", kvZorder _, Some(kvZorderSql)),
    ("kv_topn_zorder", kvTopnZorder _, Some(kvTopnSql)),
    ("kv_bloom_skip", kvBloomSkip _, Some(kvBloomSkipSql)),
    ("kv_dsv2", kvDsv2 _, Some(kvSliceSql)),
    ("kv_dsv2_write", kvDsv2Write _, Some(kvSliceSql)),
    ("kv_topn", kvTopn _, Some(kvTopnSql)),
    ("kv_slice", kvSlice _, Some(kvSliceSql)),
    ("kv_multislice", kvMultiSlice _, Some(kvMultiSliceSql)),
    ("kv_dsv2_multi", kvDsv2Multi _, Some(kvDsv2MultiSql)),
    ("kv_getkeys", kvGetKeys _, Some(kvGetKeysSql)),
    ("kv_keyslices", kvKeySlices _, Some(kvKeySlicesSql)),
    ("kv_mutate", kvMutate _, Some(kvMutateSql)),
    ("kv_deltalog", kvDeltaLog _, Some(kvMutateSql)),
    ("kv_streamdelta", kvStreamDelta _, Some(kvMutateSql)),
    ("kv_stream_source", kvStreamSource _, Some(kvMutateSql)),
    ("kv_cdc_replica", kvCdcReplica _, Some(kvMutateSql)),
    ("kv_mv_follow", kvMvFollow _, Some(kvMvFollowSql)),
    ("kv_timetravel", kvTimetravel _, Some(kvTimetravelSql)),
    ("kv_bucket_join", kvBucketJoin _, Some(kvBucketJoinSql)),
    ("kv_runtime_prune", kvRuntimePrune _, Some(kvBucketJoinSql)),
    ("kv_spj_join", kvSpjJoin _, Some(kvBucketJoinSql)),
    ("kv_compact", kvCompact _, Some(kvMutateSql)),
    ("kv_ttl", kvTtl _, Some(kvTtlSql)))
}
