package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}

/** Shared micro-batch session-fold plumbing for the incrementally
  * maintained session surfaces (JourneyStream, SessionFunnelStream):
  * the q_sessionize µs spelling and the pooled-buffer + derived
  * watermark skeleton live HERE, once — the r8→r9 empty-pool watermark
  * underflow was fixed in exactly one of what were then two copies,
  * which is the divergence class this object removes. */
private[streaming] object SessionFold {

  val GapMs: Long = 30 * 60 * 1000L
  val GapUs: Long = GapMs * 1000L
  val DefaultDelayMs: Long = GapMs

  /** q_sessionize's exact spelling over a pooled (user_id, us,
    * event_id, ...) frame: per-user µs-exact (us, event_id) order,
    * 30-min gap fold, per-row sess_idx + the session's constant end_us
    * (so a closed/open split keeps sessions atomic). Payload columns
    * pass through untouched. */
  def sessionized(pool: DataFrame): DataFrame = {
    val byU = Window.partitionBy("user_id")
      .orderBy(F.col("us").asc, F.col("event_id").asc)
    pool
      .withColumn("prev_us", F.lag("us", 1).over(byU))
      .withColumn("new_sess",
        F.when(F.col("prev_us").isNull ||
          F.col("us") - F.col("prev_us") > GapUs, 1L).otherwise(0L))
      .withColumn("sess_idx", F.sum("new_sess").over(
        byU.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("end_us", F.max("us").over(
        Window.partitionBy("user_id", "sess_idx")))
  }

  /** Pool the batch's fresh arrivals (at or ahead of the PREVIOUS
    * watermark — older ones may belong to already-emitted sessions)
    * with the carried buffer, and derive the new watermark
    * wm = max(prevWm, max(us) − delay). An EMPTY pool KEEPS prevWm:
    * deriving from a defaulted Long.MinValue max would underflow to
    * ~+2⁶³ and seal the stream forever. One bounded MAX row reaches
    * the driver. */
  def poolAndWatermark(arrivals: DataFrame, prevBuf: DataFrame,
                       prevWm: Long, delayMs: Long): (DataFrame, Long) = {
    // lazy checkpoint: the max aggregate right below materializes the
    // cache — one job per micro-batch instead of two
    val pool = arrivals.filter(F.col("us") >= prevWm)
      .unionByName(prevBuf).localCheckpoint(false)
    val maxUsOpt = Option(pool.agg(F.max("us")).collect()(0).get(0))
      .map(_.asInstanceOf[Long])
    val wm = maxUsOpt.map(m => math.max(prevWm, m - delayMs * 1000L))
      .getOrElse(prevWm)
    (pool, wm)
  }
}
